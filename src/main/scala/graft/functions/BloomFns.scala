package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Broadcast Bloom-filter predicates — the shuffle-free pre-filter for
  * "is this row's key in that (small) set?" at corpus scale, e.g.
  * benchmark decontamination: build the filter over the probe set's
  * fingerprints (KBs even for millions of keys), test every corpus row
  * with a codegen'd expression inside the scan's stage, and send only
  * the might-contain survivors to an exact confirmation join. False
  * positives cost a row in the confirm join; false negatives cannot
  * happen, so the composed result stays exact.
  *
  * Uses Spark's own sketch (`DataFrameStatFunctions.bloomFilter`) and
  * predicate (`BloomFilterMightContain` — the expression behind runtime
  * row-level filtering), keyed on xxhash64 of the key column on BOTH
  * sides so insert and probe hash identically.
  */
object BloomFns {

  /** A `might contain` predicate on `testCol`, backed by a Bloom filter
    * built over `keyDf[keyCol]`. The build is one aggregate job whose
    * single-row result (the serialized filter) returns to the driver and
    * re-broadcasts as a literal — the standard runtime-filter shape; size
    * it with `expectedItems`/`fpp` (1M keys at 1% ≈ 1.2 MB). */
  def mightContain(keyDf: DataFrame, keyCol: String, testCol: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Column = {
    val bf = keyDf.select(xxhash64(col(keyCol)).as("__bloom_key"))
      .stat.bloomFilter("__bloom_key", expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(out.toByteArray, BinaryType),
      GraftColumnBridge.expression(xxhash64(testCol))))
  }
}
