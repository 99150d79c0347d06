package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Exactly-once across a stream KILL + RESTART — the production
  * property none of the single-drain streaming queries exercise: a
  * stateful query stopped mid-stream and restarted from its checkpoint
  * must (a) carry its aggregation state forward, (b) not re-read input
  * it already committed, and (c) re-emit only what the new input
  * changed. This is what `checkpointLocation` buys and the reason every
  * production `writeStream` sets it. The sink is foreachBatch — the
  * memory sink is explicitly NOT checkpoint-recoverable (Spark refuses
  * to restart from its checkpoint), which is itself part of what this
  * suite documents: single-drain memory-sink queries cannot be restarted,
  * durable pipelines use foreachBatch/file sinks (the q97 pattern).
  */
class CheckpointRestartSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  /** Stage `rows` as ONE parquet part file under `in` — coalesce(1) so
    * the single `part-` pick below can never grab an empty shard (the
    * documented sentinel-loss pitfall), with an optional pinned mtime
    * for drains whose batch order matters. */
  private def stageFile(root: String, in: String, name: String,
      sch: StructType, rows: Seq[org.apache.spark.sql.Row],
      mtime: Option[Long]): Unit = {
    val tmp = s"$root/stage_$name"
    val l = new java.util.ArrayList[org.apache.spark.sql.Row](rows.size)
    rows.foreach(l.add)
    spark.createDataFrame(l, sch)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("part-")).head.toPath
    val dest = java.nio.file.Paths.get(s"$in/$name.parquet")
    java.nio.file.Files.copy(part, dest)
    mtime.foreach(dest.toFile.setLastModified(_))
    ()
  }

  test("stateful agg restarts from checkpoint: state carried, input not re-read") {
    val root = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    val in = s"$root/in"; val cp = s"$root/cp"
    new java.io.File(in).mkdirs()

    def writeFile(name: String, rows: Seq[(String, Long)]): Unit =
      stageFile(root, in, name, schema, rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)), mtime = None)

    def drain() = {
      CheckpointRestartSpec.emitted.clear()
      val q = spark.readStream.schema(schema).parquet(in)
        .groupBy("k").agg(sum("v").as("total"))
        .writeStream
        .option("checkpointLocation", cp)
        .outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r =>
            CheckpointRestartSpec.emitted.add((r.getString(0), r.getLong(1))))
          (): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q
    }
    def latest: Map[String, Long] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      CheckpointRestartSpec.emitted.forEach(e => m.update(e._1, e._2))
      m.toMap
    }

    // run 1: 10 rows for key x (sum 55), 1 row for y
    writeFile("a", (1L to 10L).map(v => ("x", v)) :+ ("y", 100L))
    val q1 = drain()
    assert(latest == Map("x" -> 55L, "y" -> 100L), s"run 1: $latest")
    val in1 = q1.recentProgress.map(_.numInputRows).sum
    assert(in1 == 11L, s"run 1 read $in1 rows")

    // run 2 (the restart): 5 more x rows. The checkpoint must carry
    // x's running 55 forward AND prevent file a from being re-read —
    // state loss would emit 65, a replay would read 16 rows.
    writeFile("b", (11L to 15L).map(v => ("x", v)))
    val q2 = drain()
    val in2 = q2.recentProgress.map(_.numInputRows).sum
    assert(in2 == 5L, s"restart re-read committed input ($in2 rows, expected 5)")
    assert(latest.get("x").contains((1L to 15L).sum),
      s"state not carried across restart: $latest")
    // y unchanged in run 2 ⇒ update mode must not re-emit it
    assert(!latest.contains("y"), s"unchanged group re-emitted: $latest")
  }

  test("parquet file sink restarts from checkpoint: windows append exactly once, input not re-read") {
    // the q131/q135 drain shape made durable: an append-mode windowed
    // aggregation into a PARQUET sink with a checkpoint, killed after
    // one drain and restarted on new input. The restart must re-read
    // nothing, and a window finalized in run 1 must appear in the sink
    // exactly once afterwards — the file sink's commit log is what
    // makes the appends exactly-once across restarts.
    import org.apache.spark.sql.types.{DoubleType, TimestampType}
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", DoubleType)))
    val root = java.nio.file.Files.createTempDirectory("graft_fsink_").toString
    val in = s"$root/in"; val cp = s"$root/cp"; val out = s"$root/out"
    new java.io.File(in).mkdirs()
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)

    var mtime = 1000000L
    def writeFile(name: String, rows: Seq[(java.sql.Timestamp, Double)]): Unit = {
      // the file source drains by mtime — pin the intended order
      mtime += 60000L
      stageFile(root, in, name, schema, rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)), mtime = Some(mtime))
    }

    def drain() = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), sum("v").as("total"))
        .select((col("w.start").cast("long") / 3600).cast("long").as("hour"),
          col("n"), col("total"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q
    }

    // run 1: three files — hour-0 data, then two event-time jumps so
    // the watermark provably passes hour 0's end (it lags one batch:
    // the batch ingesting file c runs with b's advanced watermark)
    writeFile("a", Seq((ts(5), 1.0), (ts(25), 2.0)))
    writeFile("b", Seq((ts(360), 10.0)))
    writeFile("c", Seq((ts(600), 20.0)))
    val q1 = drain()
    val run1 = spark.read.parquet(out).select("hour", "n", "total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val hour0 = t0 / 3600000L
    assert(run1.count(_._1 == hour0) == 1 && run1.contains((hour0, 2L, 3.0)),
      s"run 1 did not finalize hour 0 exactly once: $run1")
    assert(q1.recentProgress.map(_.numInputRows).sum == 4L)

    // run 2 (the restart): one new far-future file. Only IT may be
    // read, the +6h window must finalize now, and hour 0 must not be
    // re-appended.
    writeFile("d", Seq((ts(2880), 0.0)))
    val q2 = drain()
    assert(q2.recentProgress.map(_.numInputRows).sum == 1L,
      "restart re-read committed input")
    val run2 = spark.read.parquet(out).select("hour", "n", "total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run2.count(_._1 == hour0) == 1,
      s"hour-0 window duplicated across restart: $run2")
    assert(run2.contains((hour0 + 6, 1L, 10.0)),
      s"restart did not finalize the +6h window: $run2")
  }

  test("streamed tombstones (q164): delete arrives, stream restarts, compaction applies it — exactly once") {
    // the q164 changelog router made durable: a delete landing in one
    // run must survive a kill + restart as an at-rest tombstone dir (the
    // checkpoint prevents re-encoding its batch), keep its vector
    // unsearchable in the serve-side anti-join, and be physically
    // dropped by the eventual compaction. The index frames here carry
    // (vec_id, cell) only — the router and lifecycle are what's under
    // test, not PQ arithmetic (PqTombstoneSpec owns that).
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tomb_restart_").toString
    val in = s"$root/in"; val cp = s"$root/cp"; val segRoot = s"$root/segs"
    new java.io.File(in).mkdirs()
    val sch = StructType(Seq(StructField("op", StringType),
      StructField("vec_id", LongType), StructField("cell", LongType)))
    def writeFile(name: String, rows: Seq[(String, Long, Any)]): Unit =
      stageFile(root, in, name, sch, rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)), mtime = None)
    def drain(): Unit = {
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.filter(col("op") === "I").select("vec_id", "cell")
            .write.mode("overwrite").parquet(s"$segRoot/rows/seg-$id")
          b.filter(col("op") === "D").select("vec_id")
            .write.mode("overwrite").parquet(s"$segRoot/tombs/seg-$id")
          (): Unit
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val hist = Seq((100L, 0L), (101L, 1L)).toDF("vec_id", "cell")
    // run 1: appends 1..3; deletes of history row 100 AND of this very
    // batch's own append 2 (the within-batch delete)
    writeFile("a", Seq(("I", 1L, 0L), ("I", 2L, 1L), ("I", 3L, 0L),
      ("D", 100L, null), ("D", 2L, null)))
    drain() // AvailableNow terminates = the kill point, pre-compaction
    // run 2 (the restart): one more append, plus a delete of run 1's
    // append — the checkpoint must not re-route file a
    writeFile("b", Seq(("I", 4L, 1L), ("D", 3L, null)))
    drain()
    def segIds = new java.io.File(s"$segRoot/rows").listFiles().map(_.getName).sorted
    assert(segIds.toSeq == Seq("seg-0", "seg-1"),
      s"restart re-routed a committed batch: ${segIds.mkString(",")}")
    val segs = spark.read.option("recursiveFileLookup", "true").parquet(s"$segRoot/rows")
    val tombs = spark.read.option("recursiveFileLookup", "true").parquet(s"$segRoot/tombs")
    def ids(df: DataFrame): Set[Long] =
      df.select("vec_id").as[Long].collect().toSet
    val served = graft.ann.Pq.withoutTombstones(hist.unionByName(segs), tombs)
    assert(ids(served) == Set(101L, 1L, 4L),
      s"served set wrong across the restart boundary: ${ids(served)}")
    // compaction applies the same tombstones PHYSICALLY: identical set,
    // zero tombstoned rows at rest
    val compacted = graft.ann.Pq.compactIndex(Seq(hist, segs), tombstones = Some(tombs))
    assert(ids(compacted) == Set(101L, 1L, 4L))
    assert(compacted.join(tombs, Seq("vec_id"), "left_semi").isEmpty,
      "compaction left tombstoned rows at rest")
  }
}

object CheckpointRestartSpec {
  val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
}
