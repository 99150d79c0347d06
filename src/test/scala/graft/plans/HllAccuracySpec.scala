package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Measured-quality gate for the q128 HyperLogLog sketch, the fixed
  * 256-register twin of q119's KMV: the estimator must land within
  * 3·1.04/√m of the exact distinct count (HLL's relative stderr ≈
  * 1.04/√m — at m=256 three sigmas is 19.5%, typical error ~5%), and
  * the small-cardinality regime must route through the linear-counting
  * branch, whose own error bound is far tighter. Same discipline as
  * KmvAccuracySpec: plan assertions cannot see estimator quality.
  */
class HllAccuracySpec extends SparkSpec {

  private val m = 256

  private def run(sfDir: String) = {
    val est = graft.SparkEntry.queries("q128_hll_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    (est, exact)
  }

  test("q128 HLL estimate within 3*1.04/sqrt(m) of the exact count per group") {
    // sf0.01: ~2000 distinct keys per group — above the 2.5m linear
    // counting threshold, so the raw harmonic-mean branch is measured
    val (est, exact) = run("/root/testdata/sf0.01")
    assert(exact.values.forall(_ > 2.5 * m), s"fixture too small for the raw branch: $exact")
    exact.foreach { case (g, n) =>
      val rel = math.abs(est(g) - n) / n.toDouble
      assert(rel <= 3.0 * 1.04 / math.sqrt(m),
        f"group $g: estimate ${est(g)}%.1f vs exact $n — rel err $rel%.4f > ${3.0 * 1.04 / math.sqrt(m)}%.4f")
    }
  }

  test("q128 small groups route through linear counting and stay within its bound") {
    // sf0.001: 200 distinct keys per group — below 2.5m, where the raw
    // HLL estimator biases low and linear counting (m·ln(m/V)) takes
    // over; stderr there is √m·(e^t−t−1)^0.5/n with t=n/m — comfortably
    // inside 5% at n/m ≈ 0.8, so gate at 3× that
    val (est, exact) = run(sf)
    assert(exact.values.forall(_ < 2.5 * m), s"fixture outgrew the LC branch: $exact")
    exact.foreach { case (g, n) =>
      val rel = math.abs(est(g) - n) / n.toDouble
      assert(rel <= 0.15, f"group $g: LC estimate ${est(g)}%.1f vs exact $n — rel err $rel%.4f")
    }
  }
}
