package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-partial plumbing for incrementally maintained aggregates
  * (the q156/q158/q160 family). A maintained view stores per-key
  * PARTIALS — `n` (count) and `sum_value` (raw, unrounded sum) — never
  * derived measures: partials re-aggregate losslessly under any
  * batching (fold a day's delta, fold micro-batch after micro-batch),
  * while a stored avg would weight batches instead of rows the moment
  * group sizes differ (IncrementalAggSpec pins the counterexample).
  * Derived measures and rounding happen once, at serve time, from the
  * merged sums.
  *
  * The reference's cadence makes this the load-bearing shape: FTS
  * updates daily and the pipeline re-derives its aggregates from
  * scratch each run (reference `GUIDE.md:458`, `code/01_fts_get_flows.R:6`);
  * at 100 TB the refresh must cost O(delta + |keys|), not O(history).
  */
object IncrementalView {

  /** Merge any number of (keys..., n, sum_value) partial frames:
    * union, re-reduce by key, sums-of-sums — the associative half of
    * view maintenance. */
  def mergePartials(keys: Seq[String], parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum("n").as("n"), sum("sum_value").as("sum_value"))
}
