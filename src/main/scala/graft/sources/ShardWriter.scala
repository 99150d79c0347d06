package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard writer: materializes a corpus as `shards` parquet
  * shard directories, each holding ONE file whose rows are ordered by a
  * deterministic document hash — the on-disk twin of q102's shard
  * layout (the "global shuffle" a training run wants, without a global
  * sort; reference anchor: the curated-master staging write,
  * `/root/reference/code/05_fts_curated_master.R:118-125`, which
  * persists an ordered analysis-ready table for every downstream step).
  *
  * Scale shape: one exchange on the shard id, then each task sorts only
  * the shards it holds and streams each to a single file (`partitionBy`
  * over task-local data ⇒ one file per shard, no small-file explosion).
  * Shards are equal-sized by construction — the md5 prefix is uniform —
  * so the worst task carries a small constant number of shards (hash
  * collision of shard ids over tasks), never a skewed one; a reader can
  * consume shard `i` of `n` without listing the others.
  */
object ShardWriter {

  /** md5-derived shard id + within-shard sort key for `idCol`. */
  def shardKeys(idCol: Column, shards: Int): (Column, Column) = {
    val h = md5(idCol.cast("string"))
    (conv(substring(h, 1, 6), 16, 10).cast("long") % shards, h)
  }

  /** Writes `df` under `path` as `shard=<i>/` parquet directories, one
    * ordered file each. Returns the per-shard row counts (the manifest).
    *
    * The `__h` sort key orders rows but is dropped before the write — it
    * is layout plumbing, not corpus data, and readers recompute it from
    * `idCol` if they ever need it (the projection after the local sort
    * streams rows through, so the physical order survives). The manifest
    * counts what is actually ON DISK, but cheaply: the read-back projects
    * only the `__shard` partition column, so the scan's ReadSchema is
    * empty — row counts come from parquet footers and directory names,
    * no data page is read. (A pre-write groupBy would re-execute the
    * upstream lineage and could diverge from the persisted rows if that
    * lineage is non-deterministic.) */
  def writeShards(df: DataFrame, path: String, idCol: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val (shard, h) = shardKeys(col(idCol), shards)
    df.withColumn("__shard", shard)
      .withColumn("__h", h)
      // the exchange: every row of shard i lands in exactly one task
      .repartition(shards, col("__shard"))
      .sortWithinPartitions("__shard", "__h")
      .drop("__h")
      .write
      .mode("overwrite")
      .partitionBy("__shard")
      .parquet(path)
    df.sparkSession.read.parquet(path)
      .groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
  }
}
