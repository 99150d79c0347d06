package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** CDC changelog → SIGNED partials, the retraction half of view
    * maintenance: (n, sum) is an abelian group, so a delete is a
    * negative merge and an update is delete + insert fused —
    *   I contributes (+1, +value_new),
    *   D contributes (−1, −value_old),
    *   U contributes ( 0, value_new − value_old).
    * Folding the result through [[mergePartials]] absorbs corrections
    * into a maintained view at O(delta + |keys|), never rescanning
    * history — the shape the reference's daily refresh needs, because
    * its current year is REVISED, not appended (reference
    * `code/04_fts_curated_flows.R:46-68`, `GUIDE.md:458`). Callers must
    * drop keys whose merged `n` reaches 0 (the group was deleted whole);
    * [[dropEmptied]] is that filter. The op column carries 'I'/'U'/'D';
    * anything else fails loudly — a silently ignored op is a silently
    * wrong view. */
  def signedPartials(keys: Seq[String], cdc: DataFrame,
      opCol: String = "op", oldCol: String = "value_old",
      newCol: String = "value_new"): DataFrame = {
    val op = col(opCol)
    // an unknown op — or a known op missing the value its sign needs
    // (a D without its before-image, an I/U without the new value) —
    // must fail AT THE ROW: sum() would silently ignore a NULL
    // contribution, so the count would move while the sum kept the
    // retracted value — a silently wrong view, worse than a crash
    val bad = raise_error(
      concat(lit("signedPartials: unknown CDC op '"), op, lit("'")))
    def req(c: Column, what: String): Column =
      when(c.isNull, raise_error(concat(
        lit(s"signedPartials: NULL $what for op '"), op, lit("'"))))
        .otherwise(c)
    cdc.select(keys.map(col) ++ Seq(
        when(op === "I", 1L).when(op === "D", -1L).when(op === "U", 0L)
          .otherwise(bad).as("dn"),
        when(op === "I", req(col(newCol), newCol))
          .when(op === "D", -req(col(oldCol), oldCol))
          .when(op === "U", req(col(newCol), newCol) - req(col(oldCol), oldCol))
          .as("dv")): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum("dn").as("n"), sum("dv").as("sum_value"))
  }

  /** Serve-side filter after a signed merge: a key whose count reached
    * zero was deleted in full and must leave the view (its residual sum
    * is FP noise around 0, not data). A NEGATIVE count means the CDC
    * stream deleted rows the base never held — corruption, so fail
    * loudly instead of serving a wrong view. */
  def dropEmptied(merged: DataFrame): DataFrame =
    merged.filter(
      when(col("n").isNull || col("n") < 0,
        raise_error(concat(
          lit("maintained view reached a negative/unknown count (n="),
          col("n").cast("string"),
          lit("): CDC delta retracted rows the base state never held"))))
        .otherwise(col("n") > 0))
}
