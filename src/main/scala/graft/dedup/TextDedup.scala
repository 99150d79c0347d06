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

  /** Materialization barrier for self-joins: project to the named columns
    * and lazily checkpoint. Two problems this solves at once: Catalyst's
    * CollapseProject would inline the caller's (possibly expensive)
    * column EXPRESSIONS into the join and re-evaluate them per joined row
    * (measured 15× on the simhash near-dup path), and the join's two
    * sides would otherwise each execute the computation once (exchange
    * reuse does not kick in across the differently-aliased sides). The
    * checkpoint materializes on first action and both sides share it. */
  private def pinByKey(df: DataFrame, idCol: String, cols: String*): DataFrame =
    df.select((idCol +: cols).map(col): _*).localCheckpoint(eager = false)

  /** Exact dedup: canonical fingerprint → keep min-id row per group, plus
    * the group's dup_count. One hash aggregation (min over an id-first
    * struct picks the min-id row; ids are unique, so later fields never
    * tiebreak) — partial-aggregatable and sort-free, unlike the
    * row_number + count double-window form it replaces (which sorted
    * every partition twice; ~20% on the 200k-doc probe). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cols = df.columns
    df.withColumn("fp", TextFns.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(struct((idCol +: cols.filterNot(_ == idCol)).map(col): _*)).as("__r"),
        count(lit(1)).as("dup_count"))
      .select(cols.map(c => col(s"__r.$c")) ++ Seq(col("fp"), col("dup_count")): _*)
  }

  /** Character k-gram shingles as an array column (dynamic-pos substr). */
  def charShingles(c: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k)))

  /** One MinHash value per row: min over shingles of md5(shingle).
    * (Lexicographic min over hex strings — engine-portable.) Native
    * kernel: compares raw digest bytes, hex-encodes only the winner. */
  def minHashSignature(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.withColumn("minhash", graft.functions.TextHash.min_gram_md5(col(textCol), k))

  /** MinHash band signatures: `bands` independent min-hashes derived
    * from ONE base hash per shingle, rehashed per band — the classic
    * k-from-1 scheme. Band b's hash of shingle s is
    * xxhash64(xxhash64(s), b) (Spark semantics: seed 42 → hashLong on
    * the base → hashInt on the band id). A pair colliding in SOME band
    * ⇒ candidate. Returns `band_sig` array. */
  def minHashBands(df: DataFrame, textCol: String, k: Int, bands: Int): DataFrame =
    // Native kernel: one pass over the grams, making the same XXH64
    // calls Spark's xxhash64 expression makes (seed 42 → hashLong(base)
    // → hashInt(band)), so signatures are bit-identical to the composed
    // let-bound form (TextHashParitySpec pins it) without `bands`
    // interpreted re-walks of the shingle array.
    df.withColumn("band_sig",
      graft.functions.TextHash.minhash_bands(col(textCol), k, bands))

  /** md5-based band signatures — the engine-portable twin of
    * [[minHashBands]] (md5 instead of xxhash64, so a DuckDB oracle can
    * reproduce it bit-for-bit). Band b's signature is the min over
    * char-k-gram shingles of md5(b || ':' || shingle). One output row
    * per (id, band). */
  def md5BandSigs(df: DataFrame, textCol: String, idCol: String,
      k: Int, bands: Int): DataFrame =
    // native kernel (one gram pass, digest bytes only): the composed
    // transform/array_min form is interpreted per element and measured
    // ~10× slower on the q103 map phase; TextHashParitySpec pins the
    // kernel to the composed form
    df.select(col(idCol),
        posexplode(graft.functions.TextHash.md5_band_sigs(col(textCol), k, bands))
          .as(Seq("b", "sig")))

  /** Incremental dedup: flag which `batch` documents near-duplicate the
    * `history` corpus (any shared band signature), without ever
    * reshuffling history. This is the daily-increment shape — history is
    * the 100 TB side, the batch is small by definition — so the plan
    * broadcasts the BATCH's band keys, streams history through one
    * broadcast semi-join (collided keys out, a set bounded by the batch),
    * and resolves per-batch-doc verdicts against the collided set. The
    * only exchanges carry batch-sized data.
    *
    * Returns (idCol, hit_bands, dup_in_history) for every batch row.
    * False positives follow LSH semantics (band collision = candidate);
    * chain [[gramJaccard]] over the flagged pairs to confirm, exactly as
    * the full-corpus path does. */
  def incrementalDupFlags(history: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, k: Int, bands: Int): DataFrame = {
    // batch sigs are intentionally recomputed on both uses — the batch
    // is small; a localCheckpoint pin would cost more than the recompute
    val bSigs = md5BandSigs(batch, textCol, idCol, k, bands)
    val bKeys = bSigs.select("b", "sig").distinct()
    val collided = md5BandSigs(history, textCol, idCol, k, bands)
      .select("b", "sig")
      .join(broadcast(bKeys), Seq("b", "sig"), "leftsemi")
      .distinct()
    val hits = bSigs.join(broadcast(collided), Seq("b", "sig"), "leftsemi")
      .groupBy(idCol).agg(countDistinct("b").as("hit_bands"))
    batch.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("hit_bands"), lit(0L)).as("hit_bands"),
        col("hit_bands").isNotNull.as("dup_in_history"))
  }

  /** Candidate duplicate pairs: rows sharing a band signature. The join
    * key is (band index, signature) — a hash shuffle, never a crossJoin.
    * The band computation is pinned (pinByKey: lazy localCheckpoint) so
    * the self-join's two sides don't each recompute every per-shingle
    * hash. */
  def lshCandidatePairs(withBands: DataFrame, idCol: String): DataFrame = {
    val exploded = pinByKey(withBands, idCol, "band_sig")
      .select(col(idCol), posexplode(col("band_sig")).as(Seq("band", "sig")))
    val a = exploded.withColumnRenamed(idCol, "id_a")
    val b = exploded.withColumnRenamed(idCol, "id_b")
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Distinct word n-grams of a text column. Compute this ONCE per
    * document (materialized before any pairwise join) — inlining it into
    * a pair comparison recomputes the gram set per pair. */
  def wordGrams(c: Column, n: Int): Column = {
    // Let-bind the token array via a single-element transform: the naive
    // form closes over split(trim(c)) inside the lambda, and interpreted
    // higher-order eval re-runs the split for EVERY element_at of every
    // gram (n+1 splits per gram per row — measured 9s on a 5k-doc
    // broadcast join that runs in ~1s with the bound form).
    // Docs with fewer than n tokens have NO grams (the oracle's
    // generate_series yields none) — and the unguarded sequence(0,0)=[0]
    // would index past the array: an INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    // error under Spark 4's default ANSI mode, a partial gram the oracle
    // never emits with ANSI off.
    element_at(
      transform(array(split(trim(c), """\s+""")), toks =>
        when(size(toks) >= n,
          array_distinct(transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
          .otherwise(array().cast("array<string>"))),
      1)
  }

  /** Jaccard similarity of two precomputed gram-set columns. Two empty
    * sets score 0.0 — the unguarded 0/0 is a hard DIVIDE_BY_ZERO under
    * Spark 4's default ANSI mode, not a null. */
  def gramJaccard(ga: Column, gb: Column): Column = {
    val union = size(array_union(ga, gb))
    when(union === 0, lit(0.0))
      .otherwise(size(array_intersect(ga, gb)).cast("double") / union)
  }

  /** Token n-gram Jaccard similarity between two text columns (one-shot
    * form; for pairwise joins precompute `wordGrams` per side instead). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    gramJaccard(wordGrams(a, n), wordGrams(b, n))

  /** n-bit SimHash over whitespace tokens (n ≤ 60 so the md5-derived
    * token hash fits a signed long): bit i of the signature is the sign
    * of Σ_tokens (bit_i(md5ₙ(token))·2 − 1). md5-derived so the oracle
    * can reproduce it. */
  def simHashN(c: Column, bits: Int): Column =
    // Native kernel (TextHash.simHash): one loop over tokens with an
    // int[] of bit counters. (The composed-column history: a per-bit
    // aggregate() duplicated the token-hash subtree ~100×; the array
    // accumulator fixed that but still allocated two arrays per token in
    // interpreted higher-order eval.)
    graft.functions.TextHash.simhash_md5(c, bits)

  /** 32-bit SimHash (the q36 signature). */
  def simHash32(c: Column): Column = simHashN(c, 32)

  /** Hamming distance between two simhash longs. */
  def hamming32(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate candidate pairs via banding: the signature
    * splits into `nBands` chunks of `bandBits` bits; pairs agreeing on
    * ANY chunk are candidates (equi-join on (band, chunk) — a hash
    * shuffle, never an all-pairs scan), then the exact hamming filter
    * keeps pairs within `maxHamming`.
    *
    * Recall: if maxHamming < nBands, the pigeonhole principle guarantees
    * every qualifying pair shares at least one clean band — banding
    * loses NOTHING at the default (4 bands, threshold 3). Band width is
    * the cost dial: 15-bit chunks keep the candidate set ~25× smaller
    * than 8-bit chunks on vocabulary-correlated corpora (measured at
    * sf0.1, SCALING.md).
    */
  def simHashNearDup(withSig: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, nBands: Int = 4, bandBits: Int = 15,
      sigBits: Int = 60): DataFrame = {
    // bands must tile the signature: a band past the signature width has
    // chunk 0 for EVERY row, silently turning the (band, chunk) equi-join
    // into an all-pairs cross product (the quadratic blowup banding
    // exists to avoid). The default 4×15 matches the 60-bit simHashN;
    // pass sigBits = 32 when banding simHash32 signatures.
    require(nBands * bandBits <= sigBits,
      s"$nBands bands × $bandBits bits exceed the $sigBits-bit signature")
    require(maxHamming < nBands,
      s"pigeonhole recall needs maxHamming ($maxHamming) < nBands ($nBands)")
    val mask = (1L << bandBits) - 1
    val pinned = pinByKey(withSig, idCol, sigCol)
    val banded = pinned.select(
      col(idCol), col(sigCol),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col(sigCol), bandBits * b).bitwiseAND(lit(mask)).as("chunk"))): _*)).as("bc"))
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

  /** [[simHashNearDup]]'s ASYMMETRIC form: candidate pairs where at
    * least one side is in `probe` — the probe's bands equi-join the
    * corpus's bands, so the corpus never self-joins. This is what makes
    * cluster maintenance incremental (q171): history×history collisions
    * were already paid when history was ingested; a new batch pays only
    * |batch bands| × bucket occupancy, not the corpus's banded
    * self-join. Pairs are canonicalized (id_a < id_b) and deduped, so
    * probe-probe pairs (found from both sides) emit once; `corpus`
    * should INCLUDE the probe rows when batch-internal duplicates
    * matter. Same pigeonhole-exact recall as the symmetric form. */
  def simHashNearDupAgainst(probe: DataFrame, corpus: DataFrame,
      idCol: String, sigCol: String, maxHamming: Int, nBands: Int = 4,
      bandBits: Int = 15, sigBits: Int = 60): DataFrame = {
    require(nBands * bandBits <= sigBits,
      s"$nBands bands × $bandBits bits exceed the $sigBits-bit signature")
    require(maxHamming < nBands,
      s"pigeonhole recall needs maxHamming ($maxHamming) < nBands ($nBands)")
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, side: String) =
      pinByKey(df, idCol, sigCol).select(
        col(idCol).as(s"id_$side"), col(sigCol).as(s"__s$side"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col(sigCol), bandBits * b).bitwiseAND(lit(mask)).as("chunk"))): _*)).as("bc"))
        .select(col(s"id_$side"), col(s"__s$side"), col("bc.band"), col("bc.chunk"))
    banded(probe, "p").join(banded(corpus, "c"), Seq("band", "chunk"))
      .filter(col("id_p") =!= col("id_c"))
      .select(least(col("id_p"), col("id_c")).as("id_a"),
        greatest(col("id_p"), col("id_c")).as("id_b"),
        hamming32(col("__sp"), col("__sc")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
