package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns. Accumulation
  * is sequential in array order — the same order every engine uses — so
  * results are reproducible bit-for-bit.
  *
  * `cosine` is a native Catalyst expression (CosineSim): the composed
  * `zip_with`/`aggregate` form is higher-order and therefore INTERPRETED
  * per element — three array walks per pair with boxed lambdas dominated
  * the pairwise ANN/dedup joins. The composed `dot` stays as the
  * reference semantics (VectorFnsSpec pins the kernel to it).
  */
object VectorFns {
  /** Σ aᵢ·bᵢ accumulated left-to-right in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = CosineSim.cosine_sim(a, b)

  /** Native fused-loop dot product (codegen'd) — see [[DotProduct]]. */
  def dotN(a: Column, b: Column): Column = DotProduct.dot_product(a, b)

  /** Per-ROW norm for factoring out of N·Q pair stages: √(self-dot),
    * bit-equal to the √na / √nb inside [[cosine]] (same accumulation
    * order — VectorFnsSpec pins it). */
  def normN(a: Column): Column = sqrt(DotProduct.dot_product(a, a))

  /** Pair cosine with per-side PRECOMPUTED norms: bit-equal to
    * `cosine(a, b)` given `normA = normN(a)`, `normB = normN(b)` in the
    * same left/right order — the denominator multiplies in the exact
    * order the fused kernel does. Use in pair stages where each side's
    * rows meet many partners: the per-pair cost drops to one dot. */
  def cosineFactored(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Sign-bit LSH bucket from the first `nBits` dimensions: bit i set iff
    * a[i] > 0. Deterministic, index-only — the cheap router that turns
    * brute-force O(N·Q) scans into per-bucket scans at scale. */
  def signBucket(a: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(a, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
