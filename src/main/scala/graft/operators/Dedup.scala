package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-row-per-group dedup (A2/W7, reference code/04:83) and the
  * prioritized "incoming over internal" variant (J13, code/04:83-84).
  *
  * R's `.SD[1], by=id` relies on file order; Spark is unordered, so the
  * caller supplies an explicit deterministic ordering (SURVEY.md §4.3.1).
  *
  * Scale note: one shuffle on the partition keys — the only shuffle this
  * operator needs. With AQE on, skewed ids are split automatically; the
  * window itself is a single pass per partition (no sort spill beyond the
  * keyed sort Spark already does for the window).
  */
object Dedup {
  def firstRowPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** J13: among rows sharing `key`, prefer rows where `preferred` is true,
    * tiebreak by `tiebreak` ascending — one window, no self-union needed
    * (the reference does rbind(first-per-id of slice A, remainder of B)). */
  def prioritizedDedup(df: DataFrame, key: String, preferred: Column, tiebreak: Column): DataFrame =
    firstRowPerGroup(df, Seq(key), Seq(preferred.cast("int").desc, tiebreak.asc))

  /** Aggregation-based first-row-per-group: min(struct(order ++ payload)).
    * Result-identical to `firstRowPerGroup` when `orderAsc` is a total
    * order per group, but PARTIAL-AGGREGATABLE: each map task pre-reduces
    * to one candidate row per group, so the exchange carries one row per
    * (group × partition) instead of every input row, and no per-partition
    * sort happens at all. Prefer this at scale; the window variant remains
    * for ordering specs that aren't ascending-encodable.
    *
    * `orderAsc` columns must encode the desired order ASCENDING (flip a
    * descending key numerically, e.g. `1 - flag.cast("int")`).
    *
    * NULL caveat: min(struct) compares null fields FIRST, while the
    * window variant's default `asc` ordering puts nulls... also first —
    * but a numerically FLIPPED descending key maps null→null and
    * therefore sorts first here versus LAST under the window's `.desc`
    * (nulls-last) default. With nullable order columns, null-encode
    * explicitly (e.g. coalesce to a sentinel) before calling either. */
  def firstRowPerGroupAgg(df: DataFrame, keys: Seq[String], orderAsc: Seq[Column]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    val ordered = orderAsc.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    df.groupBy(keys.map(col): _*)
      .agg(min(struct(ordered ++ payload.map(col): _*)).as("__m"))
      .select(keys.map(col) ++ payload.map(p => col(s"__m.$p").as(p)): _*)
  }
}
