package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of enrichment over a single keyed, time-ordered stream: attach to
  * every row the most recent prior row matching a predicate (e.g. "the
  * last signup before this event"). Composed from an ordered window with
  * null-skipping `last` — no custom physical operator needed, one shuffle
  * on the key, and the window scan is a single pass per partition.
  *
  * For the two-table as-of join (trades/quotes style), union the tables
  * with a side tag and apply the same window — the classic Spark-native
  * encoding that avoids a range join entirely.
  */
object AsOfJoin {
  /** Adds `outCol` = value of `pick` at the latest row where `predicate`
    * held, at-or-before the current row in (orderCols) order per keyCols. */
  def lastMatching(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      predicate: Column,
      pick: Column,
      outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(when(predicate, pick), ignoreNulls = true).over(w))
  }
}
