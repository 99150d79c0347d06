package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native argmax-cosine over a LITERAL codebook matrix — the quantizer
  * assignment kernel behind `KMeans.nearestCentroid` / `leafInBranch`
  * and `Pq`'s codeword encoding.
  *
  * Semantics are IDENTICAL to the composed form they replace
  * (`array_max` over `struct(round(cosine, 6), -idx)` built per
  * codeword): score = round₆ of CosineSim's fused left-to-right cosine,
  * winner = highest score with the LOWEST index on exact ties, NaN
  * ranked greatest (java.lang.Double.compare = the SQL ordering
  * array_max applies), a null/length-mismatched cosine never wins, and
  * an all-null row yields index 0 (the composed struct-max tiebreak).
  * The DuckDB oracles replay the same arithmetic unchanged;
  * VectorFnsSpec pins kernel-vs-composed equality.
  *
  * What changes is the evaluation shape. The composed form is a
  * higher-order `transform` whose lambda re-evaluates its captured
  * subtree per element — for an 8×256-codeword PQ book that is 256
  * slice+struct allocations per (row, subspace) through interpreted HOF
  * machinery, which priced the FAISS-shaped q139 at ~58 s on the sf0.1
  * bench. This expression runs ONE tight loop per row over primitive
  * arrays: the row vector is read once, its norm computed once, every
  * codeword norm is precomputed per executor (same left-to-right
  * accumulation, so the quotient is bit-identical), and each codeword
  * costs exactly one dot product. Carries `doGenCode`, staying inside
  * whole-stage codegen spans.
  *
  * @param vec     the row's vector (array<float> or array<double>)
  * @param bookIdx which codebook of `books` to score against (a column
  *                for the fused per-subspace/per-branch forms, a
  *                literal 0 for single-book callers)
  * @param books   the codebook matrix: books(b)(i) = codeword i of book
  *                b, variable lengths allowed (under-populated tree
  *                branches train fewer leaves)
  */
case class ArgmaxCosine(
    vec: Expression,
    bookIdx: Expression,
    books: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = bookIdx
  override def dataType: DataType = IntegerType
  // Null semantics mirror the composed form exactly: a null BOOK index
  // made element_at yield a null array and the whole argmax null, but a
  // null VECTOR only nulled every cosine, degenerating the struct-max
  // to its -idx tiebreak — index 0 (same as an array of null elements).
  override def nullable: Boolean = bookIdx.nullable

  private def vecIsDouble: Boolean = vec.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_cosine requires an array<float|double> vector, got ${vec.dataType.sql}")
    else if (bookIdx.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"argmax_cosine book index must be int, got ${bookIdx.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  // The case-class equals/hashCode would compare the Array field by
  // REFERENCE, so two structurally identical instances (e.g. the same
  // codebook literal appearing in two plan legs) would never be equal —
  // canonicalization/semanticEquals and common-subexpression
  // elimination would silently miss and each leg would pay the full
  // kernel. Compare the codebook by CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case a: ArgmaxCosine =>
      vec == a.vec && bookIdx == a.bookIdx &&
        java.util.Arrays.deepEquals(
          books.asInstanceOf[Array[AnyRef]], a.books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(vec, bookIdx,
      Integer.valueOf(java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])))

  // Codeword self-dots, accumulated left-to-right exactly like the fused
  // cosine's nb term — recomputed once per executor after deserialization.
  @transient private lazy val norms: Array[Array[Double]] =
    VectorKernels.selfDots(books)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = bookIdx.eval(input)
    if (b == null) return null
    val v = vec.eval(input)
    if (v == null) 0
    else VectorKernels.argmaxCosine(v.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], books, norms, vecIsDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[][]")
    val vEv = vec.genCode(ctx)
    val bEv = bookIdx.genCode(ctx)
    val nullCheck =
      if (bookIdx.nullable) code"boolean ${ev.isNull} = ${bEv.isNull};"
      else code"boolean ${ev.isNull} = false;"
    ev.copy(code = code"""
      ${bEv.code}
      $nullCheck
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        ${vEv.code}
        if (!${vEv.isNull}) {
          ${ev.value} = graft.functions.VectorKernels$$.MODULE$$.argmaxCosine(
            ${vEv.value}, ${bEv.value}, $booksRef, $normsRef, $vecIsDouble);
        }
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, bookIdx = newRight)
}

object VectorKernels {

  private[functions] def selfDots(books: Array[Array[Array[Double]]]): Array[Array[Double]] =
    books.map(_.map { cw =>
      var s = 0.0
      var i = 0
      while (i < cw.length) { s += cw(i) * cw(i); i += 1 }
      s
    })

  /** Spark's round(x, 6) for doubles: BigDecimal HALF_UP on the
    * canonical decimal representation, NaN/∞ passed through. Shared with
    * the streaming SemPairs processor, whose JVM-side cosine decision
    * must round exactly like the plan-side round(cosine, 6). */
  @inline private[graft] def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def argmaxCosine(vec: ArrayData, book: Int, books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]], vecDouble: Boolean): Int = {
    val bk = books(book)
    val nrm = norms(book)
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      // a null element poisons every cosine to null → the composed
      // struct-max degenerates to the pure -idx tiebreak → index 0
      if (vec.isNullAt(i)) return 0
      v(i) = if (vecDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      i += 1
    }
    var na = 0.0
    i = 0
    while (i < n) { na += v(i) * v(i); i += 1 }
    val sqna = math.sqrt(na)
    var bestIdx = 0
    var best = 0.0 // always a ROUNDED value once found
    var found = false
    var c = 0
    while (c < bk.length) {
      val cw = bk(c)
      if (cw.length == n) { // mismatch ⇒ null cosine ⇒ never wins
        var dot = 0.0
        var j = 0
        while (j < n) { dot += v(j) * cw(j); j += 1 }
        val s0 = dot / (sqna * math.sqrt(nrm(c)))
        // LAZY rounding: round6 is monotone (x ≤ y ⇒ round6(x) ≤
        // round6(y)) and idempotent, and `best` is already rounded — so
        // a raw score s0 ≤ best can never round strictly above best and
        // can never win (equal-rounded keeps the lower index). Only the
        // ascending-max prefix pays the BigDecimal round (expected
        // O(log k) per row instead of k — the round was ~80% of PQ
        // training/encode wall at k=256). NaN must bypass the primitive
        // `>` guard (NaN compares false) because SQL double ordering
        // ranks NaN greatest — the explicit isNaN branch keeps the
        // "first NaN wins, later NaNs don't replace" behavior of the
        // always-rounded loop. Results are bit-identical:
        // VectorFnsSpec pins kernel-vs-composed equality.
        if (!found) {
          found = true; best = round6(s0); bestIdx = c
        } else if (java.lang.Double.isNaN(s0)) {
          if (java.lang.Double.compare(s0, best) > 0) { best = s0; bestIdx = c }
        } else if (s0 > best) {
          val r = round6(s0)
          if (java.lang.Double.compare(r, best) > 0) { best = r; bestIdx = c }
        }
      }
      c += 1
    }
    bestIdx
  }

  /** Column form over a single codebook: argmax index as int. */
  def argmaxCosine(vec: Column, book: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(ArgmaxCosine(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(org.apache.spark.sql.functions.lit(0)),
      Array(book.map(_.toArray).toArray)))

  /** Column form with the codebook selected per row (fused PQ training,
    * tree-leaf assignment). */
  def argmaxCosineBy(vec: Column, bookIdx: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(ArgmaxCosine(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(bookIdx.cast("int")),
      books.map(_.map(_.toArray).toArray).toArray))
}
