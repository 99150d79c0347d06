package graft.cva

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M2 deflator construction (reference code/03_deflators.R) re-expressed
  * as window math over a long (key, time, value) panel:
  *
  *  - rebase at an anchor year (W4): deflator(base_year) == 1 ∀ key
  *  - growth chaining via exact-order cumprod = exp(Σ log) (W1/W2)
  *  - composite "DAC" deflator: Σ cur / Σ con per year over a member set (A9)
  *  - proxy relabeling (R3) lives in operators.Reshape
  *  - boundary extrapolation for missing years (code/03:150-175): forward
  *    and backward geometric extension from the observed endpoints.
  *
  * All per-key windows: one shuffle on the key, then linear scans. The
  * panel is (countries × years) — tiny — but the same plan holds for any
  * (entity × time) panel at scale.
  */
object Deflators {

  /** W4: value / value-at-anchor within each key group. */
  def rebase(df: DataFrame, key: String, time: String, value: String, anchor: Any): DataFrame = {
    val w = Window.partitionBy(key)
    df.withColumn(value,
      col(value) / first(when(col(time) === lit(anchor), col(value)), ignoreNulls = true).over(w))
  }

  /** W1: cumulative product of `growth` per key in `time` order
    * (exp of the running log-sum; growth must be > 0). */
  def chainGrowth(df: DataFrame, key: String, time: String, growth: String,
                  out: String = "chained"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(time))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, exp(sum(log(col(growth))).over(w)))
  }

  /** A9: composite deflator over a member subset: Σ num / Σ den per time. */
  def composite(df: DataFrame, time: String, num: String, den: String,
                memberCol: String, members: Seq[String]): DataFrame =
    df.filter(col(memberCol).isin(members: _*))
      .groupBy(col(time))
      .agg((sum(num) / sum(den)).as("composite"))

  /** code/03:150-175: extend each key's series to `fullRange` by geometric
    * growth — forward from the last observed point at rate
    * g = (last/first)^(1/span), backward from the first at the same rate.
    * Observed rows pass through untouched. */
  def extendSeries(df: DataFrame, key: String, time: String, value: String,
                   fullRange: Seq[Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // one pass: boundary times and their values together via min_by /
    // max_by (the q58 anchor idiom) — the previous two-pass bounds join
    // re-shuffled the observed rows a second time
    val firstLast = df.filter(col(value).isNotNull)
      .groupBy(col(key))
      .agg(
        min(col(time)).as("t_first"), max(col(time)).as("t_last"),
        min_by(col(value), col(time)).as("v_first"),
        max_by(col(value), col(time)).as("v_last"))
      .withColumn("g",
        when(col("t_last") > col("t_first"),
          pow(col("v_last") / col("v_first"), lit(1.0) / (col("t_last") - col("t_first"))))
          .otherwise(lit(1.0)))
    val grid = firstLast.crossJoin(fullRange.toDF(time))
    val filled = grid.withColumn("__ext",
      when(col(time) > col("t_last"), col("v_last") * pow(col("g"), col(time) - col("t_last")))
        .when(col(time) < col("t_first"), col("v_first") * pow(col("g"), col(time) - col("t_first"))))
    filled
      .join(df.select(col(key), col(time), col(value)), Seq(key, time), "left")
      .withColumn(value, coalesce(col(value), col("__ext")))
      .select(col(key), col(time), col(value))
  }
}
