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

  test("stateful agg restarts from checkpoint: state carried, input not re-read") {
    val root = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    val in = s"$root/in"; val cp = s"$root/cp"
    new java.io.File(in).mkdirs()

    def writeFile(name: String, rows: Seq[(String, Long)]): Unit = {
      val tmp = s"$root/stage_$name"
      val l = new java.util.ArrayList[org.apache.spark.sql.Row](rows.size)
      rows.foreach(r => l.add(org.apache.spark.sql.Row(r._1, r._2)))
      spark.createDataFrame(l, schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).head.toPath
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }

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
}

object CheckpointRestartSpec {
  val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
}
