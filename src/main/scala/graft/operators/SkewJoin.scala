package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. bucketed inputs or
  * non-shuffle-join plans).
  *
  * Left (large, skewed) rows get a deterministic salt in [0, n) derived
  * from a hash of the whole row's key neighborhood; the right side is
  * replicated n ways. The join key becomes (key, salt), spreading a hot
  * key over n reducers. Row multiplicity is preserved exactly; the salt
  * never leaks into the output.
  *
  * Deterministic by design (hash-based, not rand()) so retried tasks and
  * oracle comparisons see identical results.
  */
object SkewJoin {
  def saltedJoin(
      large: DataFrame, small: DataFrame,
      keys: Seq[String], saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // the small side is REPLICATED per salt, so only join types that
    // never emit unmatched small-side rows preserve multiplicity —
    // right/full outer would surface each unmatched small row once per
    // salt bucket
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replaceAll("[_ ]", "").stripSuffix("join")),
      s"saltedJoin preserves multiplicity only for inner/left joins, got $joinType")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltBuckets)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLarge
      .join(saltedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
