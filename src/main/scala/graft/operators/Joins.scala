package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join idioms from SURVEY.md §2.3 expressed Spark-first.
  *
  * Scale doctrine: every reference lookup table is sub-MB → `broadcast()`
  * the small side so the big fact table never shuffles for enrichment.
  * Composite-key joins shuffle once on their keys; the DAC fallback (J4)
  * is a second broadcast join + `coalesce`, not a mutation pass.
  */
object Joins {
  /** J3+J4: left-join `primary` on `keys`; where `valueCol` comes back
    * null, patch from `fallback` joined on `fallbackKeys` only. Both sides
    * broadcast (they are small dimension tables); the fact side never
    * moves. The fallback value column must be named `valueCol` in both. */
  def joinWithFallback(
      fact: DataFrame,
      primary: DataFrame,
      keys: Seq[String],
      fallback: DataFrame,
      fallbackKeys: Seq[String],
      valueCol: String): DataFrame = {
    val fb = fallback.withColumnRenamed(valueCol, s"__fb_$valueCol")
    fact
      .join(broadcast(primary), keys, "left")
      .join(broadcast(fb), fallbackKeys, "left")
      .withColumn(valueCol, coalesce(col(valueCol), col(s"__fb_$valueCol")))
      .drop(s"__fb_$valueCol")
  }

  /** J11: excluding join on a composite key (reference keys on a pasted
    * string; we key on the tuple — same semantics, no string build). */
  def antiJoinOn(fact: DataFrame, exclude: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(exclude.select(keys.map(col): _*).distinct()), keys, "left_anti")

  /** J12: scaffold cross product of two (small) key sets, then left-join
    * measures and zero-fill — the expand.grid idiom. */
  def scaffold(
      left: DataFrame, right: DataFrame,
      measures: DataFrame, keys: Seq[String],
      fillZero: Seq[String]): DataFrame = {
    val grid = left.crossJoin(right)
    val joined = grid.join(measures, keys, "left")
    fillZero.foldLeft(joined)((d, c) => d.withColumn(c, coalesce(col(c), lit(0.0))))
  }
}
