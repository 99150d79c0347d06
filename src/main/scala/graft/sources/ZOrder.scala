package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) staging layout — MULTI-dimensional scan pruning for
  * the 100 TB read path. Partition directories prune one column
  * (Bucketing's `partitionCol`) and a single-column sort gives parquet
  * row-group min/max pruning on that one column; a Z-ORDERED sort makes
  * every row group cover a compact rectangle in TWO dimensions, so a
  * reader's footer-stats pruning skips on both predicates of a 2-D box
  * filter. This is the layout trick lakehouse engines expose as
  * `OPTIMIZE ... ZORDER BY`, expressed with stock Spark operators: an
  * integer bit-interleave column, `repartitionByRange` on it (so FILES
  * cover disjoint z-ranges too), and `sortWithinPartitions`.
  *
  * The interleave is pure integer Column arithmetic — deterministic and
  * engine-portable (the q123 oracle replays it in DuckDB), and the
  * staging write is a one-time cost amortized over every later scan,
  * same as the bucketed staging's shuffle (SURVEY §3.1 discipline).
  * ZOrderSpec measures the effect on real parquet footers: row groups
  * whose [min,max] boxes intersect a 2-D query box, z-ordered vs
  * arrival-ordered.
  */
object ZOrder {

  /** 2-D Morton interleave of the low `bits` bits of `a` and `b` (`a`
    * takes the even bit positions). Inputs must be non-negative and fit
    * in `bits` bits for the locality guarantee to hold; higher bits are
    * simply ignored (values only lose LOCALITY, never correctness, since
    * the z-value is used purely as a sort key). */
  def zvalue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Stage `df` z-ordered on (colA, colB): range-partitioned on the
    * z-value (files cover disjoint z-ranges) and sorted within
    * partitions (row groups cover compact z-ranges ⇒ small rectangles
    * in (A, B) space). `options` pass through to the parquet writer
    * (tests shrink `parquet.block.size` to get many row groups).
    *
    * `bits <= 0` (the default) derives the interleave width from the
    * columns' actual max — one tiny agg job at staging time — so keys
    * wider than a hand-picked width can't silently wrap into the low
    * z-space and degrade locality (they'd stay CORRECT, since z is only
    * a sort key, but every high bit above the width is ignored). */
  def stageZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
      bits: Int = 0, partitions: Int = 16,
      options: Map[String, String] = Map.empty): Unit = {
    // bits derivation executes df once and the write a second time —
    // cut the upstream pipeline to one run for the pair (the KMeans
    // .fitTree re-derivation discipline; disk-backed, so staging-sized
    // inputs don't have to fit in executor memory). Callers that know
    // the key domain can pass `bits` and skip both the agg and the cache.
    val toStage = if (bits > 0) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val useBits = if (bits > 0) bits else {
        val r = toStage.agg(max(col(colA).cast("long")), max(col(colB).cast("long"))).head()
        val m = math.max(if (r.isNullAt(0)) 1L else r.getLong(0),
          if (r.isNullAt(1)) 1L else r.getLong(1))
        math.min(31, math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(m, 1L))))
      }
      toStage.withColumn("__z", zvalue2(col(colA), col(colB), useBits))
        .repartitionByRange(partitions, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").options(options).parquet(dir)
    } finally if (!(bits > 0)) toStage.unpersist()
  }

  /** Cheap content fingerprint of a staged source: total byte length and
    * max mtime over the files under `path` — pure filesystem metadata,
    * no Spark job. Staging dirs keyed on it revalidate when the source
    * is regenerated in place (the `_SUCCESS`-only guard would silently
    * keep serving the stale staged copy). The two values are encoded
    * SEPARATELY — folding them into one long would let a length delta
    * cancel an mtime delta and collide two distinct source states. */
  def fingerprint(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val fs = walk(new java.io.File(path))
    val len = fs.map(_.length).sum
    val mt = if (fs.isEmpty) 0L else fs.map(_.lastModified).max
    java.lang.Long.toHexString(len) + "_" + java.lang.Long.toHexString(mt)
  }

  /** The fingerprint-keyed staging-cache idiom shared by q123, the
    * z-staged spine (q125), and the persisted IVF index (q134): dir
    * name = tag + sanitized sf dir + the source fingerprint; stage once
    * per source CONTENT, `_SUCCESS` guarding the completed write.
    * `write` is only invoked (with the target dir) on a cache miss.
    * The ONE home of the cache-key scheme — a revalidation or
    * sanitization fix here reaches every staged artifact.
    *
    * Deliberately LOCAL (`java.io.tmpdir`, mtime-keyed): this is the
    * test-fixture bootstrap that materializes at-rest states from the
    * driver's parquet — in production those states are managed tables
    * built by a pipeline, and the MAINTAINED layer on top of them
    * (generations, ledgers, compaction — `graft.queries.StateFs`) is
    * what runs against hdfs:/object-store roots. */
  def ensureStagedDir(tag: String, sfDir: String, fingerprintSource: String)(
      write: String => Unit): String = {
    val fp = fingerprint(fingerprintSource)
    val dir = s"${System.getProperty("java.io.tmpdir")}/${tag}_${sfDir.replaceAll("[^a-z0-9.]", "_")}_$fp"
    if (!new java.io.File(s"$dir/_SUCCESS").exists()) write(dir)
    dir
  }

  /** [[ensureStagedDir]] with a z-order write (`build` only runs on a
    * cache miss). */
  def ensureStaged(tag: String, sfDir: String, fingerprintSource: String,
      colA: String, colB: String)(build: => DataFrame): String =
    ensureStagedDir(tag, sfDir, fingerprintSource)(dir =>
      stageZOrdered(build, dir, colA, colB))
}
