package graft.dedup

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data deduplication operators: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard. All are built from generators + hash-groupBys: the
  * shuffles are on (band, bucket-hash) keys, which is how they stay flat
  * as the corpus grows — no pairwise work outside a bucket.
  *
  * Hash choice: md5 (not murmur) wherever a value must be reproducible
  * across engines (DuckDB oracle parity) — md5 is byte-stable everywhere.
  */
object TextDedup {

  /** Exact dedup: canonical fingerprint → keep min-id row per group. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("fp").orderBy(col(idCol))
    df.withColumn("fp", TextFns.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Character k-gram shingles as an array column (dynamic-pos substr). */
  def charShingles(c: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k)))

  /** One MinHash value per row: min over shingles of md5(shingle).
    * (Lexicographic min over hex strings — engine-portable.) */
  def minHashSignature(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.withColumn("minhash",
      array_min(transform(
        transform(sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(1))),
          i => col(textCol).substr(i, lit(k))),
        s => md5(s))))

  /** MinHash band signatures: `bands` independent min-hashes derived from
    * ONE base hash per shingle via linear mixing (h·a_b + c_b over
    * wrapping 64-bit arithmetic) — the classic k-from-1 scheme. One
    * codegen'd xxhash64 per shingle instead of `bands` md5 calls; a pair
    * colliding in SOME band ⇒ candidate. Returns `band_sig` array. */
  def minHashBands(df: DataFrame, textCol: String, k: Int, bands: Int): DataFrame = {
    val shingles = transform(
      sequence(lit(1), greatest(length(col(textCol)) - (k - 1), lit(1))),
      i => col(textCol).substr(i, lit(k)))
    val base = transform(shingles, s => xxhash64(s))
    // re-hash the base with the band id (ANSI-safe — wrapping multiply
    // would throw under Spark 4's default ANSI mode)
    val sigs = (0 until bands).map { b =>
      array_min(transform(base, h => xxhash64(h, lit(b))))
    }
    df.withColumn("band_sig", array(sigs: _*))
  }

  /** Candidate duplicate pairs: rows sharing a band signature. The join
    * key is (band index, signature) — a hash shuffle, never a crossJoin. */
  def lshCandidatePairs(withBands: DataFrame, idCol: String): DataFrame = {
    val exploded = withBands
      .select(col(idCol), posexplode(col("band_sig")).as(Seq("band", "sig")))
    val a = exploded.withColumnRenamed(idCol, "id_a")
    val b = exploded.withColumnRenamed(idCol, "id_b")
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Token n-gram Jaccard similarity between two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    def grams(c: Column): Column = {
      val toks = split(c, """\s+""")
      array_distinct(transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
    }
    val ga = grams(a); val gb = grams(b)
    size(array_intersect(ga, gb)).cast("double") / size(array_union(ga, gb))
  }

  /** 32-bit SimHash over whitespace tokens: bit i of the hash is the sign
    * of Σ_tokens (bit_i(md5₃₂(token))·2 − 1). md5-derived so the oracle
    * can reproduce it. */
  def simHash32(c: Column): Column = {
    val toks = split(trim(c), """\s+""")
    val tokHashes = transform(toks, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { i =>
      aggregate(tokHashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(lit(-1L)))
    }
    bitSums.zipWithIndex.map { case (s, i) =>
      when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash longs. */
  def hamming32(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate candidate pairs via byte banding: a 32-bit
    * signature splits into 4 byte-chunks; pairs agreeing on ANY chunk are
    * candidates (equi-join on (band, chunk) — a hash shuffle, never an
    * all-pairs scan), then the exact hamming filter keeps pairs within
    * `maxHamming`. Classic recall caveat applies: a pair can differ in
    * all 4 bands yet still be within the threshold — banding trades that
    * tail for linear scaling, same as MinHash LSH.
    */
  def simHashNearDup(withSig: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int): DataFrame = {
    val banded = withSig.select(
      col(idCol), col(sigCol),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col(sigCol), 8 * b).bitwiseAND(lit(255L)).as("chunk"))): _*)).as("bc"))
      .select(col(idCol), col(sigCol), col("bc.band"), col("bc.chunk"))
    val a = banded.select(col("band"), col("chunk"),
      col(idCol).as("id_a"), col(sigCol).as("__sa"))
    val b = banded.select(col("band"), col("chunk"),
      col(idCol).as("id_b"), col(sigCol).as("__sb"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming32(col("__sa"), col("__sb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
