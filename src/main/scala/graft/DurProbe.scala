package graft

import org.apache.spark.sql.SparkSession

/** Per-MICRO-BATCH duration attribution for one named streaming query
  * (dev tool): runs the query once at the target SF and prints every
  * drain's per-batch `durationMs` breakdown (triggerExecution,
  * queryPlanning, walCommit, commitOffsets, getBatch, addBatch, …) read
  * back from StreamMetrics — the decomposition JobProbe's job/gap view
  * cannot give, because WAL + state commits happen between jobs.
  *
  * Usage: runMain graft.DurProbe <query> [sfDir] [k=v ...]
  */
object DurProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"[warm] failed: ${e.getMessage}") }
    System.gc()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[durprobe] $name wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    graft.streaming.StreamMetrics.progressNames.foreach { sink =>
      println(s"[sink] $sink")
      graft.streaming.StreamMetrics.progress(sink).foreach { js =>
        // keep it dependency-free: print batchId + the durationMs map and
        // numInputRows verbatim off the progress JSON
        val batch = "\"batchId\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(js).map(_.group(1)).getOrElse("?")
        val rows = "\"numInputRows\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(js).map(_.group(1)).getOrElse("?")
        val dur = "\"durationMs\"\\s*:\\s*\\{([^}]*)\\}".r.findFirstMatchIn(js).map(_.group(1)).getOrElse("")
        println(s"[batch] id=$batch rows=$rows durationMs{$dur}")
      }
    }
    spark.stop()
  }
}
