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
  }
}
