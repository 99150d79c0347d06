package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins the native CosineSim kernel to the composed aggregate(zip_with)
  * form it replaced — the ANN/dedup oracles were written against the
  * composed accumulation order, so bit-for-bit equality here keeps them
  * honest. */
class VectorFnsSpec extends SparkSpec {

  private def cosineRef(a: Column, b: Column): Column =
    VectorFns.dot(a, b) / (VectorFns.norm(a) * VectorFns.norm(b))

  test("native cosine is bit-identical to the composed form") {
    val rnd = new scala.util.Random(7L)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val bad = df.select(
      VectorFns.cosine(col("a"), col("b")).as("native"),
      cosineRef(col("a"), col("b")).as("ref"))
      .filter(not(col("native") <=> col("ref"))).count()
    assert(bad == 0)
  }

  test("factored pair cosine is bit-identical to the fused kernel") {
    // the pair-stage refactor (Knn/Pq/SemDedup): norms computed once per
    // SIDE, pair pays one dot — cosine(a,b) must equal
    // dotN(a,b)/(normN(a)·normN(b)) on every bit, or the ANN/dedup
    // oracles' round(...,6) rank cuts could flip at boundaries
    val rnd = new scala.util.Random(13L)
    val f = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val d = Seq.fill(100)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    def factored(a: Column, b: Column): Column =
      VectorFns.cosineFactored(VectorFns.dotN(a, b),
        VectorFns.normN(a), VectorFns.normN(b))
    for (df <- Seq(spark.createDataFrame(f).toDF("a", "b"),
                   spark.createDataFrame(d).toDF("a", "b"))) {
      val bad = df.select(
        VectorFns.cosine(col("a"), col("b")).as("fused"),
        factored(col("a"), col("b")).as("factored"))
        .filter(not(col("fused") <=> col("factored"))).count()
      assert(bad == 0)
    }
    // native dot == composed dot (same left-to-right accumulation)
    val mixed = spark.createDataFrame(f).toDF("a", "b")
    val badDot = mixed.select(
      VectorFns.dotN(col("a"), col("b")).as("native"),
      VectorFns.dot(col("a"), col("b")).as("composed"))
      .filter(not(col("native") <=> col("composed"))).count()
    assert(badDot == 0)
    // null-poison parity on length mismatch: dotN → null → factored null,
    // exactly the fused kernel's null
    import spark.implicits._
    val mism = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val row = mism.select(
      VectorFns.cosine(col("a"), col("b")).as("fused"),
      factored(col("a"), col("b")).as("factored")).head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("mixed float/double sides read with per-side accessors (q39/q53 centroid shape)") {
    val rnd = new scala.util.Random(11L)
    val rows = Seq.fill(100)((
      Seq.fill(16)(rnd.nextFloat() * 2 - 1),
      Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val bad = df.select(
      VectorFns.cosine(col("a"), col("b")).as("native"),
      cosineRef(col("a"), col("b")).as("ref"))
      .filter(not(col("native") <=> col("ref"))).count()
    assert(bad == 0)
    // double × double too
    val dd = df.select(col("b").as("a"), col("b"))
    val bad2 = dd.select(VectorFns.cosine(col("a"), col("b")).as("n"),
      cosineRef(col("a"), col("b")).as("r"))
      .filter(not(col("n") <=> col("r"))).count()
    assert(bad2 == 0)
  }

  test("edge cases: length mismatch → null, self → 1.0") {
    val df = spark.createDataFrame(Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)),   // mismatch
      (Seq(3f, 4f), Seq(3f, 4f))        // self
    )).toDF("a", "b")
    val rows = df.select(
      VectorFns.cosine(col("a"), col("b")).as("native"),
      cosineRef(col("a"), col("b")).as("ref")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getDouble(0) == 1.0 && rows(1).getDouble(1) == 1.0)
  }

  test("two cosine calls in one codegen scope compile (fresh local names)") {
    // non-nullable array literals put both kernels' locals in ONE Java
    // scope; with codegen fallback disabled a duplicate declaration is a
    // hard error instead of a silent interpreted fallback
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.range(1).select(
        VectorFns.cosine(array(lit(1f), lit(2f)), array(lit(1f), lit(2f))).as("c1"),
        VectorFns.cosine(array(lit(3f), lit(4f)), array(lit(3f), lit(4f))).as("c2")).head
      // √na·√nb ≠ na exactly — self-cosine is 1 only to FP tolerance
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9 && math.abs(r.getDouble(1) - 1.0) < 1e-9)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  // The composed argmax the ArgmaxCosine kernel replaced — array_max
  // over struct(round(cosine, 6), -idx): the arithmetic every ANN/PQ
  // oracle replays, so the kernel must match it bit-for-bit.
  private def argmaxRef(vec: Column, book: Seq[Seq[Double]]): Column = {
    val entries = book.zipWithIndex.map { case (c, i) =>
      struct(round(VectorFns.cosine(vec, typedlit(c)), 6).as("sim"),
        lit(-i).as("mcid"))
    }
    (-array_max(array(entries: _*)).getField("mcid")).cast("int")
  }

  test("argmax-cosine kernel matches the composed struct-max form, float and double input") {
    val rnd = new scala.util.Random(23L)
    val book = Seq.fill(17)(Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    val rows = Seq.fill(300)(Tuple1(Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = spark.createDataFrame(rows).toDF("v")
    val bad = df.select(
      VectorKernels.argmaxCosine(col("v"), book).as("native"),
      argmaxRef(col("v"), book).as("ref"))
      .filter(not(col("native") <=> col("ref"))).count()
    assert(bad == 0)
    val dd = df.select(transform(col("v"), x => x.cast("double")).as("v"))
    val bad2 = dd.select(VectorKernels.argmaxCosine(col("v"), book).as("n"),
      argmaxRef(col("v"), book).as("r"))
      .filter(not(col("n") <=> col("r"))).count()
    assert(bad2 == 0)
  }

  test("argmax-cosine generates compilable code (no silent interpreted fallback)") {
    // the custom doGenCode declares ev.isNull/ev.value itself; two calls
    // in one codegen scope plus the CMS kernels must still compile —
    // with fallback disabled a janino error is a hard failure here
    // instead of a silent (and slow) interpreted plan in production
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val book = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
      val r = spark.range(1).select(
        VectorKernels.argmaxCosine(array(lit(0.1), lit(2.0)), book).as("a"),
        VectorKernels.argmaxCosine(array(lit(2.0), lit(0.1)), book).as("b"),
        TextHash.md5_prefix_long(lit("x"), 8).as("h"),
        TextHash.cms_estimate(lit("x"), Array.fill(8)(1L), 2, 4).as("e")).head
      assert(r.getInt(0) == 1 && r.getInt(1) == 0 && r.getLong(3) == 1L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("argmax-cosine null semantics mirror the composed form: null vector -> 0, null book -> null") {
    // composed form: a null vector nulls every cosine, degenerating the
    // struct-max to the -idx tiebreak (index 0); a null book index made
    // element_at (and so the whole argmax) null
    val book = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = spark.createDataFrame(Seq(
        (Some(Seq(0.0, 2.0)), Some(0)),
        (None: Option[Seq[Double]], Some(0)),
        (Some(Seq(0.0, 2.0)), None: Option[Int])))
      .toDF("v", "b")
    val got = df.select(
        argmaxRef(col("v"), book).as("ref"),
        VectorKernels.argmaxCosineBy(col("v"), col("b"), Seq(book)).as("byNull"),
        VectorKernels.argmaxCosine(col("v"), book).as("fixedBook"))
      .collect()
    assert(got(0).getInt(1) == 1 && got(0).getInt(2) == 1)
    // null vector: composed ref gives 0, both kernel forms must too
    assert(got(1).getInt(0) == 0 && got(1).getInt(1) == 0 && got(1).getInt(2) == 0)
    // null book index: kernel null (fixed-book form never sees one)
    assert(got(2).isNullAt(1) && got(2).getInt(2) == 1)
  }

  test("argmax-cosine: exact ties keep the lowest index; by-column books select per row") {
    // duplicate the winning codeword at a later index — the tie must
    // resolve to the EARLIER one, the -idx struct-max tiebreak
    val v = Seq(1.0, 2.0, 3.0, 4.0)
    val book = Seq(Seq(4.0, 3.0, 2.0, 1.0), v, Seq(0.5, 0.5, 0.5, 0.5), v)
    val df = spark.createDataFrame(Seq(Tuple1(v))).toDF("v")
    val idx = df.select(VectorKernels.argmaxCosine(col("v"), book)).head.getInt(0)
    assert(idx == 1, s"tie resolved to $idx, expected the earlier duplicate")
    // per-row book selection, variable book sizes (the tree-leaf shape)
    val books = Seq(
      Seq(Seq(1.0, 0.0, 0.0, 0.0)),                 // book 0: one codeword
      Seq(Seq(0.0, 1.0, 0.0, 0.0), v, Seq(9.0, 9.0, 9.0, 9.0))) // book 1
    val rows = spark.createDataFrame(Seq((v, 0), (v, 1))).toDF("v", "b")
    val got = rows.select(col("b"),
        VectorKernels.argmaxCosineBy(col("v"), col("b"), books).as("i"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(0 -> 0, 1 -> 1), s"by-column selection wrong: $got")
  }

  test("argmax-cosine: structurally identical instances are equal (CSE/canonicalization can dedup)") {
    // the codebook field is an Array, whose default equals is
    // referential — without the content-based override two plan legs
    // carrying the same literal codebook would never canonicalize
    // together and each would pay the full kernel
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val book = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    def mk(b: Seq[Seq[Double]]) = ArgmaxCosine(
      Literal.create(Seq(0.1, 2.0), ArrayType(DoubleType)), Literal(0),
      Array(b.map(_.toArray).toArray))
    val (a, b) = (mk(book), mk(book))
    assert(a == b, "structurally identical ArgmaxCosine instances must be equal")
    assert(a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    assert(a != mk(book.reverse), "different codebooks must not compare equal")
  }

  test("zero-norm input: native yields NaN (DuckDB semantics); composed form throws under ANSI") {
    // deliberate improvement over the composed form, whose 0/0 raises
    // DIVIDE_BY_ZERO with spark.sql.ansi.enabled=true — DuckDB (and any
    // IEEE754 engine) evaluates 0/0 to NaN, which is what the oracle
    // comparisons would see
    val df = spark.createDataFrame(Seq((Seq.empty[Float], Seq.empty[Float])))
      .toDF("a", "b")
    val native = df.select(VectorFns.cosine(col("a"), col("b"))).head
    assert(native.getDouble(0).isNaN)
    intercept[Exception] {
      df.select(cosineRef(col("a"), col("b"))).head
    }
  }
}
