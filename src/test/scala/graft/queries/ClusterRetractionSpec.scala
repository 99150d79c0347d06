package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Retraction semantics for the maintained dedup clusters (q181/q185)
  * and the survivor manifest (q182), pinned on inputs small enough to
  * verify by hand. The sf-scale oracle checks prove engine == closure
  * over the post-delete corpus; these pin the three behaviors that
  * matter for a forget-request: a cluster SPLITS when a cut vertex is
  * deleted, a cluster DISSOLVES when deletion leaves no edges, and a
  * deleted survivor is RE-ELECTED from the remainder by quality. */
class ClusterRetractionSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("retractedTouchedLabels: deleting a cut vertex splits the chain") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val deleted = Seq(3L).toDF("doc_id")
    val out = DedupQueries.retractedTouchedLabels(edges, deleted)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L),
      s"chain minus its cut vertex must split into two components, got $out")
  }

  test("retractedTouchedLabels: deleting a pair's member dissolves the cluster") {
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = DedupQueries.retractedTouchedLabels(edges, Seq(1L).toDF("doc_id"))
      .as[(Long, Long)].collect()
    assert(out.isEmpty, // the surviving member has no edges ⇒ no label row
      s"pair minus one member must leave NO labeled docs, got ${out.toSeq}")
  }

  /** Micro-corpus keyed to the fixture delete rule (doc_id % 13 == 3):
    * 3, 16, 29, 42 are deleted. Identical texts share a simhash
    * (hamming 0 ⇒ a pair); the double-spaced variant keeps the SAME
    * token stream (same simhash) but scores higher quality (longer raw
    * text), exactly the q174 fixture trick. */
  private def retractionCorpus(): String = {
    val t1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val t1hq = (1 to 30).map(i => s"alpha$i").mkString("  ") // same tokens, higher quality
    val t2 = (1 to 30).map(i => s"beta$i").mkString(" ")
    val t3 = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val dir = Files.createTempDirectory("graft_retraction_spec_").toString
    Seq(
      (1L, t1, "en", "src0"),   // cluster {1, 2, 16}; 16 is the quality survivor
      (2L, t1, "en", "src0"),
      (16L, t1hq, "en", "src0"), // 16 % 13 == 3 → deleted ⇒ re-elect 1
      (4L, t2, "en", "src0"),   // untouched pair {4, 5} — pure pass-through
      (5L, t2, "en", "src0"),
      (3L, "a lone deleted document about nothing shared", "en", "src0"), // deleted singleton
      (6L, "a lone surviving document about nothing shared here", "en", "src0"),
      (29L, t3, "en", "src0"),  // both members deleted ⇒ cluster dissolves
      (42L, t3, "en", "src0"))
      .map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q181/q185: deletes shrink, dissolve, and pass through — batch == streamed") {
    val dir = retractionCorpus()
    val expected = Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L)
    val batch = q("q181_components_retraction", dir)
      .as[(Long, Long)].collect().toMap
    assert(batch == expected, s"got $batch")
    val streamed = q("q185_stream_components_retraction", dir)
      .as[(Long, Long)].collect().toMap
    assert(streamed == expected, s"streamed fold diverged from batch: $streamed")
  }

  test("componentsCdcStep: bridge merge, orig-closure rebuild, bridge-delete split") {
    // Synthetic at-rest state: two HISTORY pair-clusters A = {1, 2}
    // (comp 1) and B = {10, 11} (comp 10). Arrival 21 (21 % 7 == 0) is
    // a BRIDGE: sig 1 is within hamming 3 of A's sig 0 and B's sig 3,
    // so batch 0 merges A ∪ B ∪ {21}. Batch 1 deletes history doc 2 —
    // the rebuild must cover BOTH original components (orig-closure)
    // plus the appended-pair ledger, and the bridge keeps the merge
    // alive. Batch 2 deletes the bridge itself — the merged cluster
    // must split back, doc 1 dropping out edge-less.
    val dir = Files.createTempDirectory("graft_cdc_step_spec_").toString
    Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)).toDF("id", "component")
      .write.parquet(s"$dir/labels")
    Seq((1L, 2L, 1L), (10L, 11L, 10L)).toDF("id_a", "id_b", "component")
      .withColumn("bucket",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("component"),
          org.apache.spark.sql.functions.lit(16)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/edges")
    val sigs = Seq((1L, 0L), (2L, 0L), (10L, 3L), (11L, 3L), (21L, 1L))
      .toDF("doc_id", "simhash")
    val root = Files.createTempDirectory("graft_cdc_step_root_").toString
    def step(id: Long, rows: Seq[(String, java.lang.Long, java.lang.Long)]): Map[Long, Long] = {
      val b = rows.toDF("op", "doc_id", "simhash")
        .select($"op", $"doc_id".cast("long"), $"simhash".cast("long"))
      DedupQueries.componentsCdcStep(dir, root, b, id, sigs)
      spark.read.parquet(s"$root/labels/gen-$id")
        .select("id", "component") // read by NAME — gen column order is storage detail
        .as[(Long, Long)].collect().toMap
    }
    assert(step(0, Seq(("I", 21L, 1L))) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 21L -> 1L),
      "the arrival must bridge both history clusters into one component")
    assert(step(1, Seq(("D", 2L, null))) ==
      Map(1L -> 1L, 10L -> 1L, 11L -> 1L, 21L -> 1L),
      "deleting a history member must keep the bridge-merged cluster connected")
    assert(step(2, Seq(("D", 21L, null))) ==
      Map(10L -> 10L, 11L -> 10L),
      "deleting the bridge must split the merge and drop the edge-less remnant")
  }

  test("componentsCdcStep: split, bridge into ANOTHER original, delete the far fragment") {
    // The round-15 review scenario: O1 = chain {1,2,3,4}, O2 = chain
    // {10,11,12}. Batch 0 deletes 2 (O1 splits, doc 1 strands). Batch 1
    // bridges the stranded 1 to O2's 10 via arrival 21 → merged comp M
    // spans BOTH originals. Batch 2 deletes 4 — touching only O1's far
    // fragment {3,4} — and the rebuild of M must still READ O2's
    // at-rest edges (the comp↔orig closure, not one hop), or docs 11
    // and 12 silently vanish from the labels.
    val dir = Files.createTempDirectory("graft_cdc_closure_state_").toString
    Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("id", "component").write.parquet(s"$dir/labels")
    Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (10L, 11L, 10L), (11L, 12L, 10L))
      .toDF("id_a", "id_b", "component")
      .withColumn("bucket",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("component"),
          org.apache.spark.sql.functions.lit(16)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/edges")
    // sigs: the bridge (2) is within hamming 3 of docs 1 (0) and 10 (1)
    // ONLY; everything else sits in DENSE far regions (20 set bits —
    // a sparse "far" sig is itself within hamming 3 of the bridge)
    val farA = ((1L << 20) - 1) << 20
    val farB = ((1L << 20) - 1) << 38
    val sigs = Seq((1L, 0L), (2L, farA), (3L, farA | 1L),
      (4L, farA | 2L), (10L, 1L), (11L, farB), (12L, farB | 1L),
      (21L, 2L)).toDF("doc_id", "simhash")
    val hist = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L)
    val root = Files.createTempDirectory("graft_cdc_closure_root_").toString
    def step(id: Long, rows: Seq[(String, java.lang.Long, java.lang.Long)]): Map[Long, Long] = {
      val b = rows.toDF("op", "doc_id", "simhash")
        .select($"op", $"doc_id".cast("long"), $"simhash".cast("long"))
      DedupQueries.componentsCdcStep(dir, root, b, id, sigs,
        historyPred = org.apache.spark.sql.functions.col("doc_id").isin(hist: _*))
      spark.read.parquet(s"$root/labels/gen-$id")
        .select("id", "component").as[(Long, Long)].collect().toMap
    }
    assert(step(0, Seq(("D", 2L, null))) ==
      Map(3L -> 3L, 4L -> 3L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    assert(step(1, Seq(("I", 21L, 2L))) ==
      Map(1L -> 1L, 21L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L, 3L -> 3L, 4L -> 3L))
    assert(step(2, Seq(("D", 4L, null))) ==
      Map(1L -> 1L, 21L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L),
      "the rebuild must cover the comp-orig CLOSURE: O2's edges feed M's rebuild")
  }

  test("survivorCdcStep replay: a re-delivered batch re-bases on the committed predecessor") {
    // crash-after-fold, before the checkpoint commit: the batch is
    // re-delivered with the SAME id, and the step must re-base on the
    // committed predecessor generation (below id) and land identical
    // state — q158's recovery discipline for the composed fold. Same
    // bridge fixture as the CDC step test, plus the survivor state.
    val dir = Files.createTempDirectory("graft_cdc_replay_state_").toString
    Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)).toDF("id", "component")
      .write.parquet(s"$dir/labels")
    Seq((1L, 2L, 1L), (10L, 11L, 10L)).toDF("id_a", "id_b", "component")
      .withColumn("bucket",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("component"),
          org.apache.spark.sql.functions.lit(16)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$dir/edges")
    val sdir = Files.createTempDirectory("graft_cdc_replay_surv_").toString
    val q = Map(1L -> 0.1, 2L -> 0.3, 10L -> 0.2, 11L -> 0.2, 21L -> 0.4)
    Seq((1L, 1L, 0.1), (2L, 1L, 0.3), (10L, 10L, 0.2), (11L, 10L, 0.2))
      .toDF("doc_id", "component", "quality")
      .withColumn("bucket",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("component"),
          org.apache.spark.sql.functions.lit(64)).cast("int"))
      .write.partitionBy("bucket").parquet(s"$sdir/membership")
    Seq((1L, 2L, 2L, 0.3), (10L, 10L, 2L, 0.2))
      .toDF("component", "survivor_id", "n_members", "quality")
      .write.parquet(s"$sdir/manifest")
    val sigs = Seq((1L, 0L), (2L, 0L), (10L, 3L), (11L, 3L), (21L, 1L))
      .toDF("doc_id", "simhash")
    val root = Files.createTempDirectory("graft_cdc_replay_root_").toString
    def step(id: Long, rows: Seq[(String, java.lang.Long)]): Unit = {
      val b = rows.map { case (op, d0) =>
        (op, d0,
          if (op == "I") java.lang.Long.valueOf(sigs.filter($"doc_id" === d0)
            .head.getLong(1)) else null.asInstanceOf[java.lang.Long],
          if (op == "I") java.lang.Double.valueOf(q(d0)) else null.asInstanceOf[java.lang.Double])
      }.toDF("op", "doc_id", "simhash", "quality")
        .select($"op", $"doc_id".cast("long"), $"simhash".cast("long"),
          $"quality".cast("double"))
      DedupQueries.survivorCdcStep(dir, sdir, root, b, id, sigs)
    }
    def manifestAt(g: Long): Map[Long, (Long, Long, Double)] =
      spark.read.parquet(s"$root/manifest/gen-$g")
        .select("component", "survivor_id", "n_members", "quality")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    step(0, Seq(("I", 21L)))
    assert(manifestAt(0) == Map(1L -> ((21L, 5L, 0.4))),
      "the bridge merge must elect the highest-quality arrival")
    step(1, Seq(("D", 2L)))
    val after1 = manifestAt(1)
    step(1, Seq(("D", 2L))) // the re-delivered batch
    assert(manifestAt(1) == after1,
      "a replayed batch must land byte-identical manifest state")
    assert(after1 == Map(1L -> ((21L, 4L, 0.4))), s"got $after1")
    step(2, Seq(("D", 21L)))
    assert(manifestAt(2) == Map(1L -> ((1L, 1L, 0.1)), 10L -> ((10L, 2L, 0.2))),
      "the bridge delete must split the manifest back and re-elect per remnant")
    val labels = spark.read.parquet(s"$root/labels/gen-2")
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert(labels == Map(10L -> 10L, 11L -> 10L))
  }

  test("componentsCdcStep property: random I/D scripts under random batching == closure") {
    // Batching-independence, pinned the way signedPartials was in r14:
    // random corpus sigs (clustered around a few bases ± bit flips),
    // random history/arrival split, random deletes, random batch
    // boundaries — the fold's final labels must equal the from-scratch
    // closure over exactly the surviving docs. The pair rule is
    // hamming ≤ 3 with NO band check: threshold 3 < 4 bands means the
    // pigeonhole guarantees banding full recall, so the reference can
    // use the pure rule.
    val rnd = new scala.util.Random(20250815L)
    val mask60 = (1L << 60) - 1
    for (trial <- 1 to 6) {
      val bases = Array.fill(3)(rnd.nextLong() & mask60)
      val n = 24 + rnd.nextInt(12)
      val ids = (1L to n.toLong).toArray
      // CHAIN-shaped clusters, not just cliques: position p in a base's
      // chain carries the cumulative 2p-low-bit mask, so hamming between
      // positions i and j is 2|i−j| — adjacent docs pair (ham 2),
      // distant ones don't. Chains SPLIT under interior deletes, which
      // is what surfaces orig-closure bugs (cliques never split — the
      // r15 review found exactly the case the all-clique corpus missed).
      // A position repeats with prob ½, giving clique links inside the
      // chain too.
      val basePos = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
      val sig = ids.map { id =>
        id -> (if (rnd.nextBoolean()) {
          val b = rnd.nextInt(bases.length)
          val pos = basePos(b) % 14
          if (rnd.nextBoolean()) basePos(b) += 1
          bases(b) ^ ((1L << (2 * pos)) - 1)
        } else rnd.nextLong() & mask60)
      }.toMap
      def pairsAmong(docs: Set[Long]): Seq[(Long, Long)] =
        (for {
          a <- docs.toSeq; b <- docs.toSeq if a < b
          if java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 3
        } yield (a, b)).sorted
      def closure(docs: Set[Long]): Map[Long, Long] = {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        pairsAmong(docs).foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keys.map(v => v -> find(v)).toMap
      }
      val hist = ids.filter(_ => rnd.nextDouble() < 0.6).toSet
      val arrivals = ids.filterNot(hist).toSeq
      // deletes target HISTORY only (the q187 fixture's contract — a
      // same-batch I+D of one id is rejected loudly by the step)
      val deleted = ids.filter(id => hist(id) && rnd.nextDouble() < 0.3).toSet
      // synthetic quality: 5 levels force ties (min-id tiebreak) while
      // staying the SAME doubles in the reference and the artifacts
      def quality(id0: Long): Double = (id0 % 5).toDouble / 10.0
      // stage the at-rest state from the reference closure over history
      val dir = Files.createTempDirectory(s"graft_cdc_prop_state_$trial").toString
      val histLabels = closure(hist)
      histLabels.toSeq.toDF("id", "component").write.parquet(s"$dir/labels")
      pairsAmong(hist)
        .map { case (a, b) => (a, b, histLabels(a)) }
        .toDF("id_a", "id_b", "component")
        .withColumn("bucket",
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("component"),
            org.apache.spark.sql.functions.lit(16)).cast("int"))
        .write.partitionBy("bucket").parquet(s"$dir/edges")
      // ... and the survivor state over the same history
      val sdir = Files.createTempDirectory(s"graft_cdc_prop_surv_$trial").toString
      val membership = hist.toSeq.map(h =>
        (h, histLabels.getOrElse(h, h), quality(h)))
      membership.toDF("doc_id", "component", "quality")
        .withColumn("bucket",
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("component"),
            org.apache.spark.sql.functions.lit(64)).cast("int"))
        .write.partitionBy("bucket").parquet(s"$sdir/membership")
      def electManifest(rows: Seq[(Long, Long, Double)]): Map[Long, (Long, Long, Double)] =
        rows.groupBy(_._2).map { case (c, ms) =>
          val pick = ms.minBy(m => (-m._3, m._1))
          c -> ((pick._1, ms.size.toLong, pick._3))
        }
      electManifest(membership).toSeq
        .map { case (c, (sid, n, qv)) => (c, sid, n, qv) }
        .toDF("component", "survivor_id", "n_members", "quality")
        .write.parquet(s"$sdir/manifest")
      val sigs = sig.toSeq.toDF("doc_id", "simhash")
      // script: arrivals as I and history deletes as D, interleaved in
      // one random order, then cut at random batch boundaries
      val script = new scala.util.Random(rnd.nextLong()).shuffle(
        arrivals.map(a => ("I", a)) ++ deleted.toSeq.map(del => ("D", del)))
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = Seq.fill(nBatches - 1)(rnd.nextInt(script.size + 1)).sorted
      val batches = (Seq(0) ++ cuts ++ Seq(script.size)).sliding(2).collect {
        case Seq(a, b) => script.slice(a, b)
      }.toSeq
      val root = Files.createTempDirectory(s"graft_cdc_prop_root_$trial").toString
      var lastGen: Option[Long] = None
      batches.zipWithIndex.foreach { case (rows, i) =>
        if (rows.nonEmpty) {
          val b = rows.map { case (op, id0) =>
            (op, id0,
              if (op == "I") java.lang.Long.valueOf(sig(id0)) else null.asInstanceOf[java.lang.Long],
              if (op == "I") java.lang.Double.valueOf(quality(id0)) else null.asInstanceOf[java.lang.Double])
          }.toDF("op", "doc_id", "simhash", "quality")
            .select($"op", $"doc_id".cast("long"), $"simhash".cast("long"),
              $"quality".cast("double"))
          // survivorCdcStep runs the label fold internally, so ONE
          // script exercises both maintained artifacts
          DedupQueries.survivorCdcStep(dir, sdir, root, b, i.toLong, sigs,
            historyPred = org.apache.spark.sql.functions.col("doc_id")
              .isin(hist.toSeq: _*))
          lastGen = Some(i.toLong)
        }
      }
      val got = lastGen match {
        case None => spark.read.parquet(s"$dir/labels")
          .select("id", "component").as[(Long, Long)].collect().toMap
        case Some(g) => spark.read.parquet(s"$root/labels/gen-$g")
          .select("id", "component").as[(Long, Long)].collect().toMap
      }
      val want = closure(ids.toSet -- deleted)
      assert(got == want,
        s"trial $trial (n=$n, |hist|=${hist.size}, |del|=${deleted.size}, " +
          s"batches=${batches.map(_.size).mkString("/")}): fold diverged\n" +
          s"  got  ${got.toSeq.sorted}\n  want ${want.toSeq.sorted}")
      // the maintained MANIFEST must equal the from-scratch election
      // over exactly the surviving docs under their final labels
      val present = (ids.toSet -- deleted).toSeq
      val wantManifest = electManifest(present.map(p =>
        (p, want.getOrElse(p, p), quality(p))))
      val gotManifest = (lastGen match {
        case None => spark.read.parquet(s"$sdir/manifest")
        case Some(g) => spark.read.parquet(s"$root/manifest/gen-$g")
      }).select("component", "survivor_id", "n_members", "quality")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(gotManifest == wantManifest,
        s"trial $trial: manifest fold diverged\n" +
          s"  got  ${gotManifest.toSeq.sortBy(_._1)}\n" +
          s"  want ${wantManifest.toSeq.sortBy(_._1)}")
    }
  }

  test("q182: a deleted survivor is re-elected; untouched manifest rows pass through") {
    val dir = retractionCorpus()
    val out = q("q182_survivor_reelection", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((1L, 2L)), // lost quality-survivor 16 → re-elected min-id 1 of {1, 2}
      4L -> ((4L, 2L)), // untouched cluster passes through
      6L -> ((6L, 1L))  // untouched singleton passes through
      // 3 (deleted singleton) and 29/42 (dissolved pair) have no rows
    ), s"got $out")
    // the STREAMED manifest fold (q188) must land on the same rows —
    // the deletes arrive in two ranged batches and each repairs only
    // its own touched originals
    val streamed = q("q188_stream_survivor_reelection", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed == out, s"streamed manifest diverged: $streamed")
  }
}
