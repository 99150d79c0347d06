package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0L until 500L).map(p => (p, p * 13 % 997)).toDF("pid", "pt")
  private def intervals = (0L until 40L).map { i =>
    val lo = i * 23 % 900
    (i, lo, lo + (i % 5) * 37 + 1)
  }.toDF("iid", "lo", "hi")

  test("bucketed range join equals the nested-loop oracle, at several widths") {
    val oracle = points.join(intervals, col("pt").between(col("lo"), col("hi")))
      .select("pid", "iid")
    for (w <- Seq(1L, 16L, 100L, 5000L)) {
      val got = RangeJoin.bucketed(points, intervals,
        col("pt"), col("lo"), col("hi"), w).select("pid", "iid")
      assert(got.exceptAll(oracle).count() == 0, s"width $w: extra pairs")
      assert(oracle.exceptAll(got).count() == 0, s"width $w: missing pairs")
    }
  }

  test("each matching pair appears exactly once (no bucket-overlap duplicates)") {
    val got = RangeJoin.bucketed(points, intervals, col("pt"), col("lo"), col("hi"), 10L)
    val dups = got.groupBy("pid", "iid").count().filter(col("count") > 1)
    assert(dups.count() == 0)
  }

  test("negative coordinates bucket correctly") {
    val pts = Seq((1L, -15L), (2L, -5L), (3L, 5L)).toDF("pid", "pt")
    val ivs = Seq((10L, -20L, -10L), (20L, -7L, 7L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.bucketed(pts, ivs, col("pt"), col("lo"), col("hi"), 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("the plan is an equi join on the bucket, not a nested loop") {
    val got = RangeJoin.bucketed(points, intervals, col("pt"), col("lo"), col("hi"), 50L)
    val physical = got.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"expected a hash/sort-merge join on the bucket key, got:\n$physical")
  }
}
