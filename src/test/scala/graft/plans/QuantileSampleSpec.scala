package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Measured-quality gate for q122's sampled quantiles (the same
  * discipline as the KMV and ANN-recall gates): a bottom-k-by-hash
  * uniform sample of size k puts the p-quantile estimate's RANK error
  * within ~√(p(1-p)/k); assert the exact CDF at each estimate lands
  * inside three of those sigmas.
  */
class QuantileSampleSpec extends SparkSpec {

  test("q122 sampled quantiles: rank error within 3·sqrt(p(1-p)/k); rank filter never sorts the corpus") {
    val k = 256
    val sfDir = "/root/testdata/sf0.01" // every group holds ≥ k rows
    val df = graft.SparkEntry.queries("q122_quantile_sample")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounded_top_k_doubles"),
      s"hash-rank sample fell off the primitive-heap plan:\n$plan")

    val est = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v"))
      .cache()
    try {
      est.foreach { case (g, (n, p50, p90)) =>
        assert(n == k, s"group $g sampled $n of expected $k")
        val total = li.filter(col("grp") === g).count().toDouble
        def cdf(x: Double) =
          li.filter(col("grp") === g && col("v") <= x).count() / total
        val e50 = math.abs(cdf(p50) - 0.5)
        val e90 = math.abs(cdf(p90) - 0.9)
        assert(e50 <= 3 * math.sqrt(0.25 / k),
          f"group $g: p50 rank error $e50%.4f > ${3 * math.sqrt(0.25 / k)}%.4f")
        assert(e90 <= 3 * math.sqrt(0.09 / k),
          f"group $g: p90 rank error $e90%.4f > ${3 * math.sqrt(0.09 / k)}%.4f")
      }
    } finally li.unpersist()
  }
}
