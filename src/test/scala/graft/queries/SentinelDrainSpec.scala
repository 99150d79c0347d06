package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the watermark-sentinel drain's micro-batch contract after the
  * r19 optimization: wave A rides INSIDE the last data range (it only
  * advances the watermark for batches after the one that ingests it),
  * so a 2-range sentinel drain runs exactly THREE micro-batches —
  * 2 data (the second carrying wave A) + the trailing wave-B file —
  * not the four the two-wave-files layout used to cost. A regression
  * to per-wave files would show up here as a 4th batch; a broken
  * watermark push would show up as missing sessions vs the batch twin.
  */
class SentinelDrainSpec extends SparkSpec {

  test("q131 sentinel drain: 3 micro-batches, no sentinel rows served, equals its batch twin") {
    val q131 = graft.SparkEntry.queries("q131_stream_session")(spark, sf)
      .localCheckpoint(false)

    // exactly 2 data batches + 1 wave-B batch (wave A rides batch 2).
    // The engine MAY append one trailing zero-input batch to finalize
    // state after wave B advances the watermark — that batch is Spark's,
    // not the staging's, so the pinned invariant is the count of
    // INPUT-CONSUMING batches (a regression to per-wave sentinel files
    // would read 4 here).
    val batches = graft.streaming.StreamMetrics.progress("graft_stream_session")
    val consuming = batches.count(js =>
      "\"numInputRows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(js)
        .exists(_.group(1).toLong > 0))
    assert(consuming == 3,
      s"sentinel drain consumed input in $consuming micro-batches, expected 3 " +
        s"(${batches.size} total)")

    // the sentinel user never reaches the served output
    assert(q131.filter(col("user_id") < 0).isEmpty)

    // the streamed sessions equal the batch session_window twin (q69
    // emits the same (user_id, session_start, n_events, session_value)
    // columns under identical gap semantics) — the watermark push
    // finalized EVERY real session, including the last ones wave B exists
    // to flush
    val q69 = graft.SparkEntry.queries("q69_session_window")(spark, sf)
    assert(q131.exceptAll(q69).isEmpty && q69.exceptAll(q131).isEmpty,
      "streamed sessions diverge from the q69 batch twin")
  }
}
