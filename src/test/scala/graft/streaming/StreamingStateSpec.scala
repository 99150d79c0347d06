package graft.streaming

import graft.SparkSpec
import graft.dedup.TextDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded-state proof for the stateful streaming shapes (the q118 /
  * q74 / q81 patterns): drive each query across micro-batches whose
  * event time advances past the watermark horizon and assert, from
  * `StreamingQueryProgress.stateOperators`, that
  *   (a) expired state actually LEAVES the store (numRowsRemoved > 0) and
  *   (b) the store never accumulates stream history (final numRowsTotal
  *       ≪ keys seen, bounded by keys-per-watermark-horizon)
  * while the emitted rows still match their batch twin. This is the
  * assertion complete-mode drains cannot make — complete mode re-emits
  * and retains every group forever; update/append + watermark is the
  * 100 TB shape.
  */
class StreamingStateSpec extends SparkSpec {

  private val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli

  private def ts(minute: Long) = new java.sql.Timestamp(t0 + minute * 60000L)

  /** All state-operator progress entries a query has reported. */
  private def stateProgress(q: StreamingQuery) =
    q.recentProgress.toSeq.flatMap(_.stateOperators)

  test("near-dup verdicts (q118 shape, update mode): per-doc state expires behind the watermark") {
    val sqlc = spark.sqlContext
    import spark.implicits._

    // history = 10 docs; the stream re-sends half of them (dups) plus
    // fresh text per batch
    val histTexts = (0 until 10).map(i => s"history document number $i shared shingle payload")
    val history = histTexts.zipWithIndex
      .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
    val index = TextDedup.md5BandSigs(history, "text", "doc_id", 8, 4)
      .select("b", "sig").distinct()

    val input = MemoryStream[(Long, String, java.sql.Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "arrival")
    val q = NearDupStream.verdicts(docs, index, shingle = 8, bands = 4)
      .writeStream.format("memory").queryName("neardup_state")
      .outputMode("update").start()
    try {
      // 3 batches, arrivals 3h apart; watermark delay 1h, window 1h —
      // by batch N+1 the watermark has passed batch N's arrival window
      def batch(n: Int): Seq[(Long, String, java.sql.Timestamp)] =
        (0 until 10).map { i =>
          val id = n * 100L + i
          val text = if (i < 5) histTexts(i) // near-dup of history
                     else s"fresh never seen before text $n $i with enough length"
          (id, text, ts(n * 180L))
        }
      (0 until 3).foreach { n => input.addData(batch(n)); q.processAllAvailable() }

      val prog = stateProgress(q)
      assert(prog.nonEmpty, "no state operator progress reported")
      val removed = prog.map(_.numRowsRemoved).sum
      assert(removed >= 10L,
        s"watermark never evicted verdict state (removed=$removed)")
      val finalTotal = prog.last.numRowsTotal
      // 30 docs seen; only the last horizon's (≤ 2 batches) may be live
      assert(finalTotal <= 20L,
        s"state accumulates with stream history: numRowsTotal=$finalTotal")

      // emitted verdicts == batch twin (per-doc distinct-band hit count)
      val emitted = spark.table("neardup_state")
        .groupBy("doc_id").agg(max("hit_bands").as("hit_bands"))
        .as[(Long, Long)].collect().toMap
      val streamed = (0 until 3).flatMap(batch).map(r => (r._1, r._2))
        .toDF("doc_id", "text")
      val expected = TextDedup.md5BandSigs(streamed, "text", "doc_id", 8, 4)
        .join(index, Seq("b", "sig"), "leftsemi")
        .groupBy("doc_id").agg(countDistinct("b").as("hit_bands"))
        .as[(Long, Long)].collect().toMap
      assert(emitted == expected,
        s"update-mode verdicts diverge from batch twin: $emitted vs $expected")
      // and every dup doc was verdicted: 5 per batch share history text
      assert(expected.count(_._2 == 4L) == 15)
    } finally q.stop()
  }

  test("hourly agg (q74 shape, update mode): sealed windows leave the store") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventPipeline.Event](spark)
    val q = EventPipeline.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("hourly_state")
      .outputMode("update").start()
    try {
      // one window per batch, 3h apart; watermark delay is 30min
      (0 until 4).foreach { n =>
        input.addData(
          EventPipeline.Event(n * 10L, ts(n * 180L), 10, "click", 1.0),
          EventPipeline.Event(n * 10L + 1, ts(n * 180L + 5), 11, "view", 2.0))
        q.processAllAvailable()
      }
      val prog = stateProgress(q)
      val removed = prog.map(_.numRowsRemoved).sum
      assert(removed >= 4L,
        s"watermark never evicted window state (removed=$removed)")
      // 8 (window, type) groups seen over the run; at most the last
      // horizon's may still be live
      assert(prog.last.numRowsTotal <= 4L,
        s"window state accumulates: numRowsTotal=${prog.last.numRowsTotal}")
      // update mode still emitted every (window, type) count once
      val emitted = spark.table("hourly_state")
        .groupBy("hour_start", "event_type").agg(max("n").as("n"))
        .count()
      assert(emitted == 8L, s"expected 8 distinct window groups, got $emitted")
    } finally q.stop()
  }

  test("native CDC agg (q120 shape): state tracks live entities, not stream length") {
    // no watermark BY DESIGN: CDC state is one struct per live entity —
    // the contract's own bound — so the assertion is that numRowsTotal
    // equals the entity count and stays flat as more rows stream in
    val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Double)](spark)
    val state = input.toDF().toDF("entity", "sec", "value")
      .groupBy("entity")
      .agg(max(struct(col("sec"), col("value"))).as("m"))
    val q = state.writeStream.format("memory").queryName("cdc_native_state")
      .outputMode("update").start()
    try {
      // 3 batches × 40 rows over the SAME 10 entities
      (0 until 3).foreach { n =>
        input.addData((0 until 40).map(i =>
          ((i % 10).toLong, n * 100L + i, i / 7.0)): _*)
        q.processAllAvailable()
      }
      val prog = stateProgress(q)
      assert(prog.nonEmpty)
      assert(prog.forall(_.numRowsTotal <= 10L),
        s"CDC state grew past the live-entity bound: ${prog.map(_.numRowsTotal).toSeq}")
      assert(prog.last.numRowsTotal == 10L)
      // last-writer-wins: final merged value per entity = overall max
      val merged = spark.table("cdc_native_state")
        .groupBy("entity").agg(max("m").as("m"))
        .select(col("entity"), col("m.sec")).as[(Long, Long)].collect().toMap
      assert(merged == (0L until 10L).map(e => e -> (200L + 30 + e)).toMap)
    } finally q.stop()
  }

  test("stream-stream interval join (q130 shape): both buffers expire with the horizon") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    val clicksIn = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val buysIn = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val clicks = clicksIn.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "1 hour")
    val buys = buysIn.toDF().toDF("p_user", "p_ts", "p_value").withWatermark("p_ts", "1 hour")
    val q = clicks.join(buys,
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 10 minutes"))
      .writeStream.format("memory").queryName("ssj_state")
      .outputMode("append").start()
    try {
      // click n arrives in batch n; its matching purchase (5 min later
      // in EVENT time) arrives one batch LATER — every pair is matched
      // from the join buffer, the path a single-batch drain never runs.
      // Batches advance event time 3h per step against the 1h watermark
      // + 10min interval, so old buffered rows must leave the store.
      (0 until 4).foreach { n =>
        clicksIn.addData((n.toLong, ts(n * 180L)))
        if (n > 0) buysIn.addData((n - 1L, ts((n - 1) * 180L + 5), (n - 1) * 10.0))
        q.processAllAvailable()
      }
      val prog = stateProgress(q)
      val removed = prog.map(_.numRowsRemoved).sum
      assert(removed >= 3L,
        s"watermark never evicted join buffers (removed=$removed)")
      assert(prog.last.numRowsTotal <= 4L,
        s"join buffers accumulate with stream history: numRowsTotal=${prog.last.numRowsTotal}")
      // every cross-batch pair was emitted exactly once (click 3's
      // purchase never arrives, so 3 pairs)
      val pairs = spark.table("ssj_state").select("c_user", "p_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(pairs == Seq((0L, 0.0), (1L, 10.0), (2L, 20.0)), s"pairs: $pairs")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join (q135 shape): unmatched rows emit when the watermark closes their window") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    val clicksIn = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val buysIn = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val clicks = clicksIn.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "1 hour")
    val buys = buysIn.toDF().toDF("p_user", "p_ts", "p_value").withWatermark("p_ts", "1 hour")
    val q = clicks.join(buys,
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 10 minutes"),
        "leftOuter")
      .writeStream.format("memory").queryName("ssjo_state")
      .outputMode("append").start()
    try {
      // user 0's click converts (purchase arrives NEXT batch, within the
      // interval); user 1's never does. The null-padded row for user 1
      // may only appear after the watermark passes c_ts + 10 min — both
      // streams then jump event time twice so the window provably closes
      // and the buffers drain.
      clicksIn.addData((0L, ts(0)), (1L, ts(0))); q.processAllAvailable()
      buysIn.addData((0L, ts(5), 10.0)); q.processAllAvailable()
      clicksIn.addData((-9L, ts(360))); buysIn.addData((-9L, ts(360), 0.0))
      q.processAllAvailable()
      clicksIn.addData((-8L, ts(1440))); buysIn.addData((-8L, ts(1440), 0.0))
      q.processAllAvailable()

      val rows = spark.table("ssjo_state").filter(col("c_user") >= 0)
        .select(col("c_user"), col("p_value")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .sortBy(_._1).toSeq
      assert(rows == Seq((0L, Some(10.0)), (1L, None)),
        s"outer emissions wrong: $rows")
      val prog = stateProgress(q)
      assert(prog.map(_.numRowsRemoved).sum >= 2L,
        s"join buffers never drained (removed=${prog.map(_.numRowsRemoved).sum})")
    } finally q.stop()
  }

  test("chained join->window (q137 shape): both stateful operators hold and drain their own state") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    val clicksIn = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val buysIn = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val clicks = clicksIn.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "1 hour")
    val buys = buysIn.toDF().toDF("p_user", "p_ts", "p_value").withWatermark("p_ts", "1 hour")
    val q = clicks.join(buys,
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 10 minutes"))
      .groupBy(window(col("c_ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"), sum("p_value").as("attributed"))
      .select(col("w.start").cast("long").as("hour_epoch"), col("n_pairs"), col("attributed"))
      .writeStream.format("memory").queryName("jw_state")
      .outputMode("append").start()
    try {
      // two pairs in hour 0 (one cross-batch), then two big event-time
      // jumps so the join buffers expire AND the hour-0 window finalizes
      clicksIn.addData((1L, ts(0)), (2L, ts(30))); q.processAllAvailable()
      buysIn.addData((1L, ts(5), 10.0), (2L, ts(35), 20.0)); q.processAllAvailable()
      clicksIn.addData((-9L, ts(360))); buysIn.addData((-9L, ts(360), 0.0))
      q.processAllAvailable()
      clicksIn.addData((-8L, ts(1440))); buysIn.addData((-8L, ts(1440), 0.0))
      q.processAllAvailable()

      // TWO stateful operators must appear in progress, each evicting
      val lastOps = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.length).getOrElse(0)
      assert(lastOps == 2, s"expected join + window agg state operators, saw $lastOps")
      assert(stateProgress(q).map(_.numRowsRemoved).sum >= 2L,
        "neither operator drained state past the watermark")
      val hour0 = spark.table("jw_state").filter(col("hour_epoch") === t0 / 1000L)
        .select("n_pairs", "attributed").as[(Long, Double)].collect().toSeq
      assert(hour0 == Seq((2L, 30.0)), s"hour-0 window wrong or re-emitted: $hour0")
    } finally q.stop()
  }

  test("dedup within watermark (q81 shape): key state ages out past the horizon") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventPipeline.Event](spark)
    val q = EventPipeline.dedupWithinWatermark(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_state")
      .outputMode("append").start()
    try {
      // 10 fresh keys per batch, batches 2h apart, 30min watermark —
      // each batch's keys are expirable by the next
      (0 until 3).foreach { n =>
        input.addData((0 until 10).map(i =>
          EventPipeline.Event(n * 100L + i, ts(n * 120L), 10, "click", 1.0)): _*)
        q.processAllAvailable()
      }
      val prog = stateProgress(q)
      val removed = prog.map(_.numRowsRemoved).sum
      assert(removed >= 10L,
        s"watermark never evicted dedup key state (removed=$removed)")
      assert(prog.last.numRowsTotal <= 20L,
        s"dedup state accumulates: numRowsTotal=${prog.last.numRowsTotal}")
      // no survivors lost: all 30 distinct keys passed through
      assert(spark.table("dedup_state").count() == 30L)
    } finally q.stop()
  }

  test("session windows (q131 shape): sessions extend across batches, close past the watermark") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val q = input.toDF().toDF("user_id", "tsec", "value")
      .withWatermark("tsec", "1 hour")
      .groupBy(col("user_id"), session_window(col("tsec"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))
      .writeStream.format("memory").queryName("session_state")
      .outputMode("append").start()
    try {
      // session 1 (user 1) is built ACROSS batches — minutes 0/10 in
      // batch 0, minute 20 in batch 1 (gap 10 < 30 ⇒ same session: the
      // store must merge, not append). Batch 2 jumps event time 6 h, so
      // the watermark passes session 1's end (min 50) and it must be
      // emitted once, final, with all three events. Batch 3 jumps a
      // further day to close session 2 and evict its state.
      input.addData((1L, ts(0), 1.0), (1L, ts(10), 2.0)); q.processAllAvailable()
      input.addData((1L, ts(20), 3.0)); q.processAllAvailable()
      input.addData((1L, ts(360), 5.0)); q.processAllAvailable()
      input.addData((1L, ts(1440), 0.0)); q.processAllAvailable()
      input.addData((1L, ts(2880), 0.0)); q.processAllAvailable()

      val prog = stateProgress(q)
      assert(prog.map(_.numRowsRemoved).sum >= 2L,
        s"closed sessions never left the store (removed=${prog.map(_.numRowsRemoved).sum})")
      assert(prog.last.numRowsTotal <= 2L,
        s"session state accumulates with history: numRowsTotal=${prog.last.numRowsTotal}")
      val emitted = spark.table("session_state")
        .select(col("session_start").cast("long"), col("n_events"), col("session_value"))
        .as[(Long, Long, Double)].collect().sorted.toSeq
      // sessions 1 and 2 are certainly finalized; later ones depend on
      // no-data batches, so assert containment not equality
      val s1 = (t0 / 1000L, 3L, 6.0)
      val s2 = (t0 / 1000L + 360 * 60, 1L, 5.0)
      assert(emitted.contains(s1), s"cross-batch session not merged: $emitted")
      assert(emitted.contains(s2), s"second session missing: $emitted")
    } finally q.stop()
  }

  test("streaming CMS (q132 shape): sketch state is bounded by construction, not by watermark") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    val depth = 4
    val width = 16 // small width so the cell table saturates in-test
    def bucket(r: Int, c: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(s"$r:"), c)), 1, 8), 16, 10).cast("long") % width
    val input = MemoryStream[String](spark)
    val q = input.toDF().toDF("token")
      .select(col("token"),
        posexplode(array((0 until depth).map(r => bucket(r, col("token"))): _*))
          .as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
      .writeStream.format("memory").queryName("cms_state")
      .outputMode("update").start()
    try {
      // 200 FRESH tokens per batch — the vocabulary grows without bound
      // while the sketch's state may not exceed depth×width cells. No
      // watermark anywhere: boundedness comes from the sketch itself.
      (0 until 3).foreach { n =>
        input.addData((0 until 200).map(i => s"tok_${n}_$i"): _*)
        q.processAllAvailable()
      }
      val prog = stateProgress(q)
      assert(prog.nonEmpty && prog.forall(_.numRowsTotal <= depth.toLong * width),
        s"sketch state exceeded depth*width: ${prog.map(_.numRowsTotal).toSeq}")
      // saturated by 200 tokens x 4 rows over 16 buckets; stays flat as
      // 400 more distinct tokens stream in
      assert(prog.last.numRowsTotal == depth.toLong * width,
        s"cell table never saturated: ${prog.last.numRowsTotal}")
      // max-over-sink reconstruction equals the additive truth: each of
      // the 4 rows' cells sum to all 600 insertions
      val perRow = spark.table("cms_state").groupBy("r", "b").agg(max("c").as("c"))
        .groupBy("r").agg(sum("c").as("n")).select("n")
        .as[Long].collect().toSeq
      assert(perRow == Seq.fill(depth)(600L), s"per-row totals: $perRow")
    } finally q.stop()
  }

  test("transformWithState CDC (q133 shape): one ValueState cell per live entity, emit on change only") {
    val sqlc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.TwsCdc
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[TwsCdc.Op](spark)
    val q = input.toDS().groupByKey(_.entity)
      .transformWithState(new TwsCdc.LastWriterWins, TimeMode.None(), OutputMode.Update())
      .toDF().writeStream.format("memory").queryName("tws_state")
      .outputMode("update").start()
    try {
      // 10 entities; batch 0 writes sec=100+e, batch 1 UPDATES half with
      // sec=200+e and sends STALE ops (sec=50) for the rest — the stale
      // half must neither update state nor re-emit; batch 2 deletes e=0
      (0 until 10).foreach(e => input.addData(TwsCdc.Op(e, 100 + e, e, "U", e * 1.0)))
      q.processAllAvailable()
      (0 until 10).foreach { e =>
        if (e < 5) input.addData(TwsCdc.Op(e, 200 + e, 100 + e, "U", e * 2.0))
        else input.addData(TwsCdc.Op(e, 50, 200 + e, "U", -1.0))
      }
      q.processAllAvailable()
      input.addData(TwsCdc.Op(0, 300, 300, "D", 0.0))
      q.processAllAvailable()

      val prog = stateProgress(q)
      assert(prog.last.numRowsTotal == 10L,
        s"state is not one cell per live entity: ${prog.map(_.numRowsTotal).toSeq}")
      // emissions: 10 (batch 0) + 5 fresh (batch 1; stale half silent) + 1 delete
      assert(spark.table("tws_state").count() == 16L,
        s"emit-on-change violated: ${spark.table("tws_state").count()} rows")
      val last = spark.table("tws_state")
        .groupBy("entity").agg(max(struct(col("sec"), col("event_id"), col("op"), col("value"))).as("m"))
        .select(col("entity"), col("m.sec"), col("m.op")).as[(Long, Long, String)]
        .collect().map { case (e, s, o) => e -> ((s, o)) }.toMap
      assert(last(0L) == (300L, "D") && last(3L) == (203L, "U") && last(7L) == (107L, "U"),
        s"last-writer-wins violated: $last")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
