package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversion so the
  * engine can expose custom Catalyst expressions (e.g. OSA distance) as
  * ordinary `Column`s. Standard extension-point idiom for Spark 4's
  * ColumnNode API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
