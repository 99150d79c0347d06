package graft

import org.apache.spark.sql.SparkSession

/** Times one named query (warm run at sf0.001, then timed runs at the
  * target SF) with optional session conf overrides — the per-query
  * drill-down behind Bench's one-line totals.
  *
  * Usage: runMain graft.TimeOne <query> [sfDir] [k=v ...]
  */
object TimeOne {
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
      // BoundedTopK state is ~k rows per group, so the object-hash
      // aggregate can hold far more groups than the 128-group default
      // before its sort-based fallback (which would reintroduce the very
      // sort RewriteRankFilterToTopK removes)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"[warm] failed: ${e.getMessage}") }
    (1 to 2).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
