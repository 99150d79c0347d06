package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running (prefix) sums over a global order — the building
  * block for sequence packing (concat-and-chunk sharding of a token
  * stream into fixed-capacity context windows).
  *
  * A naive `sum(...).over(Window.orderBy(o))` funnels the whole dataset
  * through ONE task (Spark plans an un-partitioned ordered window as a
  * single partition). This operator computes the same result with the
  * classic two-phase scan:
  *
  *   1. per-bucket subtotals        — one partial-agg shuffle, tiny output
  *   2. exclusive cumsum of bucket  — window over #buckets rows only
  *      subtotals
  *   3. broadcast offsets back, add — within-bucket ordered window, which
  *      a within-bucket running sum    shuffles on the BUCKET key and so
  *                                     parallelizes across executors
  *
  * The caller supplies the bucket expression; it must be a coarsening of
  * the order (order o1 < o2 ⇒ bucket(o1) <= bucket(o2)) and the order
  * must be unique within a bucket, or the running sum is nondeterministic.
  * Bucket count bounds phase-2 state: pick order-range / bucket-width ≫
  * executor count but small enough that one bucket's rows fit a task
  * (e.g. doc_id DIV 10k at 100 TB → ~10k-row buckets, millions of
  * buckets, phase 2 still trivially driver-window-able).
  */
object PrefixSum {

  /** Adds `as`: the EXCLUSIVE prefix sum of `value` in `order` order
    * (sum of all strictly-earlier rows; 0 for the first). */
  def exclusive(df: DataFrame, order: Column, value: Column,
      bucket: Column, as: String): DataFrame = {
    val withB = df
      .withColumn("__ps_bucket", bucket)
      .withColumn("__ps_order", order)
      .withColumn("__ps_val", value)
    // phase 1+2: bucket subtotals, then exclusive cumsum across buckets.
    // The un-partitioned window here is over the SUBTOTALS (one row per
    // bucket), not the data — bounded, and orders of magnitude smaller.
    val bucketWindow = Window.orderBy("__ps_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB.groupBy("__ps_bucket")
      .agg(sum("__ps_val").as("__ps_subtotal"))
      .withColumn("__ps_offset",
        coalesce(sum("__ps_subtotal").over(bucketWindow), lit(0L)))
      .drop("__ps_subtotal")
    // phase 3: within-bucket exclusive running sum — partitioned by
    // bucket, so it scales out; bucket offset lifts it to the global sum
    val inBucket = Window.partitionBy("__ps_bucket").orderBy("__ps_order")
      .rowsBetween(Window.unboundedPreceding, -1)
    withB
      .join(broadcast(offsets), "__ps_bucket")
      .withColumn(as,
        col("__ps_offset") + coalesce(sum("__ps_val").over(inBucket), lit(0L)))
      .drop("__ps_bucket", "__ps_order", "__ps_val", "__ps_offset")
  }
}
