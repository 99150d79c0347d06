package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points to the intervals containing them, with
  * NO equi key. Spark's only built-in plan for `p BETWEEN lo AND hi` is a
  * nested-loop join — broadcast-NL when one side is small, O(|P|·|I|)
  * otherwise, which does not survive two large sides.
  *
  * `bucketed` restores an equi key by quantizing the range dimension:
  * each interval explodes to the coarse buckets it covers, each point
  * maps to its own bucket, and the join becomes a shuffle hash join on
  * the bucket plus a residual BETWEEN filter. A (point, interval) pair
  * meets in exactly one bucket — the point's — so no dedup pass is
  * needed. Cost scales with |P| + Σ(interval width / bucketWidth), both
  * shuffle-partitionable; pick bucketWidth near the median interval
  * width so intervals explode to O(1) buckets each (wider ⇒ more
  * residual-filter waste, narrower ⇒ more interval replication).
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` where `pt BETWEEN lo AND hi`.
    * `pt`, `lo`, `hi` must be integral (long-compatible) columns;
    * column names must not collide across the two inputs. */
  def bucketed(points: DataFrame, intervals: DataFrame,
      pt: Column, lo: Column, hi: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w = lit(bucketWidth)
    // floor-div buckets: pmod-corrected so negative coordinates land in
    // the right bucket too
    def bucketOf(c: Column): Column = floor(c.cast("double") / w).cast("long")
    val ivB = intervals.withColumn("__rj_bucket",
      explode(sequence(bucketOf(lo), bucketOf(hi))))
    val ptB = points.withColumn("__rj_bucket", bucketOf(pt))
    ptB.join(ivB, ptB("__rj_bucket") === ivB("__rj_bucket") && pt.between(lo, hi))
      .drop("__rj_bucket")
  }
}
