package graft

import graft.ann.{KMeans, Knn}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the recall-vs-nprobe tradeoff of trained IVF against the
  * brute-force ground truth (q37's baseline, q96's index) — the quality
  * axis plan-shape assertions cannot see. Prints recall@k and the
  * candidate fanout per probe count so the cost of each recall point is
  * visible next to it (probes/k_cells is the scan fraction a cluster
  * pays). Results are recorded in SCALING.md per round.
  *
  * Usage: runMain graft.RecallProbe [sfDir] [nQueries] [k]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nQ = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, d).localCheckpoint()
    val queries = emb.filter(col("vec_id") < nQ)
    val corpusN = emb.count()
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k)
      .localCheckpoint()
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    println(s"[recall] sf=$d corpus=$corpusN queries=$nQ k=$k cells=16")
    Seq(1, 2, 3, 4, 6, 8, 12, 16).foreach { p =>
      val approx = Knn.ivfTopK(emb, queries, "vec_id", "embedding", cents,
        k = k, probes = p).localCheckpoint()
      val r = Knn.recall(exact, approx)
      println(f"[recall] probes=$p%2d scan_frac=${p / 16.0}%.4f recall@$k=$r%.4f")
    }
    spark.stop()
  }
}
