package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float- or double-array embeddings as ONE
  * fused loop — dot product and both norms accumulate left-to-right in
  * double precision, then combine as dot / (√na · √nb), the exact
  * operation order of the composed `aggregate(zip_with(...))` form
  * (VectorFnsSpec pins bit-for-bit equality; the DuckDB oracles use the
  * same order). Null or length-mismatched inputs yield null, matching
  * zip_with's null-padding; zero-norm inputs yield NaN (IEEE754 — the
  * composed form would raise DIVIDE_BY_ZERO under ANSI).
  *
  * Element types may differ per side (float embeddings vs double
  * centroids from avg()); each side reads with its own accessor, exactly
  * like the composed form's per-element cast("double").
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def sideType(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(DoubleType, _) => Some(true)
    case ArrayType(FloatType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (sideType(left).isEmpty || sideType(right).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float> or array<double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val leftDouble = sideType(left).get
  private lazy val rightDouble = sideType(right).get

  override def nullSafeEval(l: Any, r: Any): Any =
    CosineSim.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftDouble, rightDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh name: a fixed local would collide when two CosineSim calls
      // land in one codegen scope (janino error → interpreted fallback)
      val r = ctx.freshName("cosineRes")
      s"""
        java.lang.Double $r = graft.functions.CosineSim$$.MODULE$$.cosine(
          $a, $b, $leftDouble, $rightDouble);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float/double-array embeddings — the pair-stage
  * half of [[CosineSim]] for call sites that factor the norms out per
  * SIDE instead of recomputing them per PAIR:
  *
  *   cosine(a, b) == dotN(a, b) / (normN(a) * normN(b))   BIT-FOR-BIT
  *
  * because CosineSim accumulates dot, na, nb in three separate
  * accumulators over the same left-to-right element order and combines
  * them as dot / (√na · √nb) — factoring changes WHERE √na is computed,
  * never a single float operation (VectorFnsSpec pins the equality).
  * In an N·Q pair stage this cuts the per-pair work from three fused
  * multiply-adds per dimension to one, with each side's norm computed
  * once per ROW — at a billion candidates the other two thirds of the
  * FLOPs are the stage. Null / length-mismatch semantics identical to
  * [[CosineSim]] (null-poison); a zero norm divides to NaN/±Inf exactly
  * as the fused form does. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def sideType(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(DoubleType, _) => Some(true)
    case ArrayType(FloatType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (sideType(left).isEmpty || sideType(right).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float> or array<double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val leftDouble = sideType(left).get
  private lazy val rightDouble = sideType(right).get

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftDouble, rightDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
        java.lang.Double $r = graft.functions.DotProduct$$.MODULE$$.dot(
          $a, $b, $leftDouble, $rightDouble);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Same null-poison contract as [[CosineSim.cosine]]: null on length
    * mismatch or any null element. */
  def dot(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    Double.box(dot)
  }

  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

object CosineSim {
  /** Returns null (boxed) on length mismatch — the composed form's
    * zip_with pads with nulls, which poisons the sum to null. */
  def cosine(a: ArrayData, b: ArrayData, aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null element poisons the composed form's sum to null
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    Double.box(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
