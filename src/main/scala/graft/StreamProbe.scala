package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev tool: isolates the streaming queries' overhead — state-store
  * partition count, micro-batch count, provider — so q74/q81 tuning is
  * measured, not guessed. Usage: runMain graft.StreamProbe <sfDir>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = graft.sources.Tables.eventsRawSchema(spark, d)

    def run(tag: String, parts: Int, dedup: Boolean): Unit = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val base = graft.sources.Tables.tsToNanos(
          s.readStream.schema(schema).parquet(s"$d/events.parque[t]"))
        .select(col("event_type"), (col("event_id") % 500).as("dup_key"),
          col("value"), timestamp_seconds(expr("CAST(ts DIV 1000000000 AS BIGINT)")).as("tsec"))
        .withWatermark("tsec", "1 hour")
      val stream =
        if (dedup)
          base.dropDuplicatesWithinWatermark("event_type", "dup_key")
            .groupBy("event_type").agg(count(lit(1)).as("n"))
        else
          base.groupBy(window(col("tsec"), "1 hour"), col("event_type"))
            .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("tv"))
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        // update mode through the foreachBatch parquet drain — the same
        // recipe the inventory's update-mode queries run, so the probe
        // prices the drain the production path actually pays
        val out = java.nio.file.Files.createTempDirectory(s"sp_${tag}_$i").toString
        val q = stream.writeStream.queryName(s"sp_${tag}_$i")
          .option("checkpointLocation", s"$out/cp")
          .outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$out/rows")
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val batches = q.recentProgress.length
        val secs = (System.nanoTime() - t0) / 1e9
        def rmr(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rmr)); f.delete(); ()
        }
        rmr(new java.io.File(out))
        println(f"[sprobe] $tag parts=$parts run$i ${secs}%.3f s batches=$batches")
      }
    }
    run("agg32", 32, dedup = false)
    run("agg4", 4, dedup = false)
    run("dedup32", 32, dedup = true)
    run("dedup4", 4, dedup = true)
    run("dedup1", 1, dedup = true)
    spark.stop()
  }
}
