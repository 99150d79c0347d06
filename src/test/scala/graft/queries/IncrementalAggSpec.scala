package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The q156/q158 view-maintenance contract, pinned without the oracle:
  * (1) merging any batching of the input's partials and finishing once
  * equals the from-scratch rollup — the maintenance invariant;
  * (2) partials must carry (n, sum), never the derived avg: averaging
  * partial averages weights BATCHES instead of rows and diverges
  * whenever group sizes differ across batches — the trap that makes
  * "store the finished row, merge by re-averaging" silently wrong;
  * (3) re-merging is idempotent in shape: the view's row count is the
  * key count, independent of how many batches folded into it. */
class IncrementalAggSpec extends SparkSpec {

  private def events: DataFrame = Tables.events(spark, sf)

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def recompute: DataFrame =
    EventQueries.finishDaily(EventQueries.dailyPartial(events))

  test("merge(base, delta) then finish == from-scratch rollup") {
    val base = EventQueries.dailyPartial(events.filter(col("event_id") % 10 =!= 0))
    val delta = EventQueries.dailyPartial(events.filter(col("event_id") % 10 === 0))
    val merged = EventQueries.finishDaily(EventQueries.mergeDailyRaw(base, delta))
    assert(asSet(merged) == asSet(recompute))
  }

  test("batching independence: any split of the input merges to the same view") {
    val parts = (0 to 2).map(i =>
      EventQueries.dailyPartial(events.filter(col("event_id") % 3 === i)))
    val merged = EventQueries.finishDaily(EventQueries.mergeDailyRaw(parts: _*))
    assert(asSet(merged) == asSet(recompute))
  }

  test("avg-of-partial-avgs diverges where group sizes differ — sums don't") {
    import spark.implicits._
    // one key, uneven batches: batch A = {2.0}, batch B = {4.0, 4.0, 4.0}
    // row-weighted avg = 3.5; batch-weighted avg-of-avgs = 3.0
    def mkBatch(vals: Seq[Double]): DataFrame =
      vals.map(v => ("click", 1L, v)).toDF("event_type", "day_num", "value")
        .groupBy("event_type", "day_num")
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    val a = mkBatch(Seq(2.0))
    val b = mkBatch(Seq(4.0, 4.0, 4.0))
    val merged = EventQueries.finishDaily(EventQueries.mergeDailyRaw(a, b))
    val mergedAvg = merged.select("avg_value").head.getDouble(0)
    assert(mergedAvg == 3.5, s"merged sums must give the row-weighted avg, got $mergedAvg")
    val avgOfAvgs = (2.0 / 1 + 12.0 / 3) / 2
    assert(avgOfAvgs == 3.0 && mergedAvg != avgOfAvgs,
      "the divergence this test exists to demonstrate vanished — fixture degenerate")
  }

  test("q158 merge step: replayed batch ids converge, recovery skips torn writes") {
    val root = java.nio.file.Files.createTempDirectory("graft_view_merge_spec_").toString
    val b0 = events.filter(col("event_id") % 2 === 0)
    val b1 = events.filter(col("event_id") % 2 =!= 0)
    EventQueries.viewMergeStep(root, b0, 0L)
    EventQueries.viewMergeStep(root, b1, 1L)
    def served: Set[String] = asSet(EventQueries.finishDaily(
      spark.read.parquet(EventQueries.latestViewGen(root).get)))
    val after = served
    assert(after == asSet(recompute), "two-batch maintenance != recompute")
    // foreachBatch's restart contract: after a crash the LAST batch id
    // replays — the step must re-base on the committed predecessor and
    // converge to the identical view, not double-count the batch
    EventQueries.viewMergeStep(root, b1, 1L)
    assert(served == after, "batch-1 replay changed the view — step not idempotent")
    // a torn write (no _SUCCESS) is never a merge base or a serve state
    val torn = new java.io.File(root, "gen-5")
    torn.mkdirs()
    assert(EventQueries.latestViewGen(root).exists(_.endsWith("gen-1")),
      "recovery picked a generation without a commit marker")
    assert(EventQueries.latestViewGen(root, below = Some(1L))
      .exists(_.endsWith("gen-0")))
    torn.delete()
    // the in-step vacuum: a third merge (base gen-1) supersedes gen-0 —
    // disk stays O(keys), not O(batches × keys) — while the replay
    // window (base + next) survives
    EventQueries.viewMergeStep(root, b1.limit(0), 2L)
    val gens = new java.io.File(root).listFiles().map(_.getName).sorted
    assert(gens.toSeq == Seq("gen-1", "gen-2"), s"vacuum kept: ${gens.mkString(",")}")
    assert(served == after, "vacuumed view diverged from the maintained state")
  }

  test("view size is |keys| however many batches fold in") {
    val p = EventQueries.dailyPartial(events)
    val keys = p.count()
    val folded = EventQueries.mergeDailyRaw(
      EventQueries.mergeDailyRaw(p, p.limit(0)), p)
    assert(folded.count() == keys)
    // and the double-fold doubled every partial, not the key set
    val doubled = EventQueries.finishDaily(folded)
      .join(recompute.withColumnRenamed("n", "n1")
        .select("event_type", "day_num", "n1"), Seq("event_type", "day_num"))
    assert(doubled.filter(col("n") =!= col("n1") * 2).isEmpty)
  }

  // ——— the q163 retraction contract: (n, sum) is an abelian GROUP ———

  private def toyPartial(df: DataFrame): DataFrame = df
    .groupBy("event_type", "day_num")
    .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  test("retraction fold (q163): I/U/D signed partials merge to the post-CDC recompute") {
    import spark.implicits._
    import graft.operators.IncrementalView
    val keys = Seq("event_type", "day_num")
    val base = Seq(("a", 1L, 1.0), ("a", 1L, 2.0), ("a", 1L, 3.0),
        ("b", 1L, 5.0), ("c", 1L, 7.0))
      .toDF("event_type", "day_num", "value")
    // update a's 2.0→9.0, delete a's 3.0, insert 6.0 into b, delete c
    // WHOLE (the group must leave the view, not linger as (0, ~0.0))
    val cdc = Seq(
        ("U", "a", 1L, Some(2.0), Some(9.0)),
        ("D", "a", 1L, Some(3.0), None),
        ("I", "b", 1L, None, Some(6.0)),
        ("D", "c", 1L, Some(7.0), None))
      .toDF("op", "event_type", "day_num", "value_old", "value_new")
    val merged = IncrementalView.dropEmptied(IncrementalView.mergePartials(
      keys, toyPartial(base), IncrementalView.signedPartials(keys, cdc)))
    val post = Seq(("a", 1L, 1.0), ("a", 1L, 9.0), ("b", 1L, 5.0), ("b", 1L, 6.0))
      .toDF("event_type", "day_num", "value")
    assert(asSet(merged) == asSet(toyPartial(post)),
      "signed fold != from-scratch aggregate over the post-CDC state")
    assert(!merged.select("event_type").as[String].collect().contains("c"),
      "fully-deleted group survived the fold")
  }

  test("retraction fold: deleting rows the base never held fails loudly") {
    import spark.implicits._
    import graft.operators.IncrementalView
    val keys = Seq("event_type", "day_num")
    val base = Seq(("a", 1L, 1.0)).toDF("event_type", "day_num", "value")
    val cdc = Seq(("D", "z", 1L, Some(9.0), Option.empty[Double]))
      .toDF("op", "event_type", "day_num", "value_old", "value_new")
    val merged = IncrementalView.dropEmptied(IncrementalView.mergePartials(
      keys, toyPartial(base), IncrementalView.signedPartials(keys, cdc)))
    val e = intercept[Exception](merged.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("retracted rows")),
      s"expected the negative-count guard, got: ${e.getMessage}")
  }

  test("q167 CDC merge step: base fallback, replay convergence, vacuum") {
    import spark.implicits._
    import graft.operators.IncrementalView
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_view_spec_").toString
    val baseDir = s"$root/base"
    toyPartial(Seq(("a", 1L, 1.0), ("a", 1L, 2.0), ("b", 1L, 5.0))
      .toDF("event_type", "day_num", "value"))
      .write.parquet(baseDir)
    def cdc(rows: (String, String, Long, Option[Double], Option[Double])*) =
      rows.toSeq.toDF("op", "event_type", "day_num", "value_old", "value_new")
    // batch 0 (no prior generation): MUST re-base on the materialized
    // base state, not an empty frame — a delete of a base row proves it
    EventQueries.cdcViewMergeStep(root, baseDir,
      cdc(("D", "a", 1L, Some(2.0), None), ("I", "c", 1L, None, Some(9.0))), 0L)
    // batch 1: update the remaining a-row
    EventQueries.cdcViewMergeStep(root, baseDir,
      cdc(("U", "a", 1L, Some(1.0), Some(4.0))), 1L)
    def served: Set[String] = asSet(IncrementalView.dropEmptied(
      spark.read.parquet(EventQueries.latestViewGen(root).get)))
    val post = toyPartial(Seq(("a", 1L, 4.0), ("b", 1L, 5.0), ("c", 1L, 9.0))
      .toDF("event_type", "day_num", "value"))
    assert(served == asSet(post), "two-batch CDC maintenance != post-CDC recompute")
    // replay of batch 1 (foreachBatch's restart contract) converges
    EventQueries.cdcViewMergeStep(root, baseDir,
      cdc(("U", "a", 1L, Some(1.0), Some(4.0))), 1L)
    assert(served == asSet(post), "replayed batch diverged the view")
    // vacuum: a third (empty) batch supersedes gen-0
    EventQueries.cdcViewMergeStep(root, baseDir, cdc(), 2L)
    val gens = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.startsWith("gen-")).sorted
    assert(gens.toSeq == Seq("gen-1", "gen-2"), s"vacuum kept: ${gens.mkString(",")}")
    assert(served == asSet(post))
  }

  test("property: ANY batching of ANY I/U/D script folds to the post-CDC recompute") {
    import spark.implicits._
    import graft.operators.IncrementalView
    val keys = Seq("event_type", "day_num")
    val rnd = new scala.util.Random(41)
    // 20 random scripts: rows live on 3 keys; each row is inserted, then
    // possibly updated (new value), then possibly deleted; the script's
    // CDC rows split into 1-4 random batches folded in order
    for (trial <- 1 to 20) {
      val keysPool = Seq(("a", 1L), ("a", 2L), ("b", 1L))
      case class RowState(k: (String, Long), v0: Double, v1: Option[Double], deleted: Boolean)
      val states = (1 to 12).map { _ =>
        val k = keysPool(rnd.nextInt(3))
        val v0 = math.rint(rnd.nextDouble() * 100) / 4
        val upd = if (rnd.nextBoolean()) Some(math.rint(rnd.nextDouble() * 100) / 4) else None
        RowState(k, v0, upd, rnd.nextInt(3) == 0)
      }
      // base = the inserts (pre-CDC state); CDC = updates + deletes
      val base = states.map(st => (st.k._1, st.k._2, st.v0))
        .toDF("event_type", "day_num", "value")
      val cdc = states.flatMap { st =>
        val upd = st.v1.map(v1 => ("U", st.k._1, st.k._2, Some(st.v0), Some(v1)))
        val cur = st.v1.getOrElse(st.v0)
        val del = if (st.deleted) Some(("D", st.k._1, st.k._2, Some(cur), Option.empty[Double])) else None
        upd.toSeq ++ del.toSeq
      }
      val nBatches = 1 + rnd.nextInt(3)
      val batches = cdc.zipWithIndex.groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      // batch assignment deliberately SCRAMBLES op order (index % n): a
      // delete may fold before the update it follows in the script —
      // irrelevant, because once each row carries its correct old/new
      // values the signed contributions are commutative sums
      var view = toyPartial(base)
      for (b <- batches if b.nonEmpty) {
        val bdf = b.toDF("op", "event_type", "day_num", "value_old", "value_new")
        view = IncrementalView.mergePartials(keys, view,
          IncrementalView.signedPartials(keys, bdf))
      }
      val post = states.filterNot(_.deleted)
        .map(st => (st.k._1, st.k._2, st.v1.getOrElse(st.v0)))
      val want =
        if (post.isEmpty) Set.empty[String]
        else asSet(toyPartial(post.toDF("event_type", "day_num", "value")))
      assert(asSet(IncrementalView.dropEmptied(view)) == want,
        s"trial $trial ($nBatches batches) diverged from the recompute")
    }
  }

  test("retraction fold: a known op missing its value fails at the row, never mis-folds") {
    import spark.implicits._
    import graft.operators.IncrementalView
    // a D without its before-image would decrement n while sum() skipped
    // the NULL — count moves, sum keeps the deleted value: silently wrong
    val keys = Seq("event_type", "day_num")
    val cdc = Seq(("D", "a", 1L, Option.empty[Double], Option.empty[Double]))
      .toDF("op", "event_type", "day_num", "value_old", "value_new")
    val e = intercept[Exception](
      IncrementalView.signedPartials(keys, cdc).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("NULL value_old")),
      s"expected the NULL-value guard, got: ${e.getMessage}")
  }

  test("retraction fold: an unknown op poisons the key instead of being ignored") {
    import spark.implicits._
    import graft.operators.IncrementalView
    val keys = Seq("event_type", "day_num")
    val base = Seq(("a", 1L, 1.0)).toDF("event_type", "day_num", "value")
    val cdc = Seq(("X", "a", 1L, Some(1.0), Some(2.0)))
      .toDF("op", "event_type", "day_num", "value_old", "value_new")
    val merged = IncrementalView.dropEmptied(IncrementalView.mergePartials(
      keys, toyPartial(base), IncrementalView.signedPartials(keys, cdc)))
    assertThrows[Exception](merged.collect())
  }
}
