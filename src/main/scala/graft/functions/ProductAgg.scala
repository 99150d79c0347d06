package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** U5: exact product aggregate (SURVEY §2.11 — the alternative to the
  * exp(Σ log) window trick when inputs may be ≤ 0 or exactness matters).
  * A typed `Aggregator` keeps the math in plain doubles with no
  * log-domain round-trip; null inputs are skipped like SQL `sum`.
  */
object ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null) b else b * a
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `df.agg(ProductAgg.product(col("x")))`. */
  def product(c: Column): Column = udaf(ProductAgg).apply(c)
}
