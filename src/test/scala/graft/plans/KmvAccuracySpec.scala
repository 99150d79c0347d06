package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Measured-quality gate for the q119 KMV distinct sketch: the estimator
  * must land within 3/√k of the exact distinct count (the classic KMV
  * bound: relative stderr ≈ 1/√k, three sigmas ≈ 3/√k — at k=256 that is
  * 18.75%, with typical error ~6%). Plan-budget assertions cannot see
  * estimator QUALITY; this spec pins it the way the ANN recall gate pins
  * IVF recall.
  */
class KmvAccuracySpec extends SparkSpec {

  private val k = 256

  private def run(sfDir: String) = {
    val kmv = graft.SparkEntry.queries("q119_kmv_distinct")(spark, sfDir)
    // the widened k must still run the primitive-heap plan, not a sort
    val plan = kmv.queryExecution.executedPlan.toString
    assert(plan.contains("bounded_top_k_doubles"),
      s"KMV k=$k fell off the specialized plan:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Sort "),
      s"KMV sorts:\n$plan")
    val est = kmv.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    (est, exact)
  }

  test("q119 KMV estimate within 3/sqrt(k) of the exact distinct count per group") {
    // sf0.01: every returnflag group holds ≥ k distinct keys, so the
    // ESTIMATOR branch (not the exact-below-k branch) is what's measured
    val (est, exact) = run("/root/testdata/sf0.01")
    assert(exact.values.forall(_ >= k), s"fixture too small for k=$k: $exact")
    exact.foreach { case (g, n) =>
      val rel = math.abs(est(g) - n) / n.toDouble
      assert(rel <= 3.0 / math.sqrt(k),
        f"group $g: estimate ${est(g)}%.1f vs exact $n — rel err $rel%.4f > ${3.0 / math.sqrt(k)}%.4f")
    }
  }

  test("q119 KMV below-k groups report the exact distinct count") {
    // sf0.001: 200 distinct keys per group < k — the sketch must degrade
    // to an exact counter, not an extrapolation
    val (est, exact) = run(sf)
    assert(exact.values.forall(_ < k), s"fixture outgrew k=$k: $exact")
    exact.foreach { case (g, n) =>
      assert(est(g) == n.toDouble, s"group $g: below-k estimate ${est(g)} != exact $n")
    }
  }
}
