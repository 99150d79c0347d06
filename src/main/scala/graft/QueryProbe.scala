package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: times named queries N times each with the same noop-sink
  * materialization Bench uses, so a suspected regression can be separated
  * from run-to-run noise (±50% on sub-2s queries — see memory notes).
  * Usage: runMain graft.QueryProbe <sfDir> <reps> <query...>
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // reps is optional — a query name in its position just shifts right
    val repsOpt = args.drop(1).headOption.flatMap(a => scala.util.Try(a.toInt).toOption)
    val reps = repsOpt.getOrElse(3)
    val names = args.drop(if (repsOpt.isDefined) 2 else 1) match {
      case a if a.nonEmpty => a.toSeq
      case _ => SparkEntry.queries.keys.toSeq.sorted
    }
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$d/lineitem.parquet").count() // warm IO
    for (n <- names) {
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qprobe] $n min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f max=${times.max}%.3f")
    }
    spark.stop()
  }
}
