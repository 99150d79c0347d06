package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** U7: Optimal String Alignment distance (restricted Damerau-Levenshtein).
  *
  * The reference's fuzzy subgrant matching uses stringdist's default OSA
  * metric (code/10:135), which counts an adjacent transposition as ONE
  * edit; Spark's builtin `levenshtein` counts it as two. This expression
  * closes that documented delta (SURVEY.md §4.3.7).
  *
  * Implemented as a Catalyst `BinaryExpression` (not a Scala UDF) so it is
  * null-safe by construction and free of SerDe overhead, with `doGenCode`
  * so it participates in whole-stage codegen instead of breaking the span
  * (the generated code calls the same static DP kernel the interpreted
  * path uses).
  */
case class OsaDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    OsaDistance.osa(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.OsaDistance$$.MODULE$$.osa($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object OsaDistance {
  /** Classic O(|a|·|b|) DP with the one-row transposition check.
    * Operates on CODE POINTS (like Spark's levenshtein and the other
    * text kernels) so supplementary characters count as one edit unit
    * and the caller's length()-based thresholds agree with the
    * distance's units. */
  def osa(aStr: String, bStr: String): Int = {
    val a = aStr.codePoints().toArray
    val b = bStr.codePoints().toArray
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    // three rolling rows: i-2, i-1, i
    var prev2 = new Array[Int](m + 1)
    var prev = Array.tabulate(m + 1)(identity)
    var curr = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      curr(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        var d = math.min(math.min(prev(j) + 1, curr(j - 1) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 &&
            a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1)) {
          d = math.min(d, prev2(j - 2) + cost)
        }
        curr(j) = d
        j += 1
      }
      val t = prev2; prev2 = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  def osa_distance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(OsaDistance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
