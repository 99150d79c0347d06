package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed staging for repeated co-located joins (SCALING.md knob):
  * writing both sides bucketed by the join key lets Spark plan a
  * SortMergeJoin with NO exchange on either side — at 100 TB this removes
  * the dominant shuffle from every downstream run that reuses the
  * staging. The analogue of pre-partitioned curated-flow staging keyed by
  * flow id (SURVEY §3.1).
  */
object Bucketing {
  /** Write `df` as a bucketed managed table (overwriting any previous).
    * Also clears the warehouse location: a fresh session's in-memory
    * catalog forgets tables while their directories persist, and
    * saveAsTable refuses to reuse an existing location.
    *
    * `partitionCol` adds directory partitioning ON TOP of the bucketing —
    * the SURVEY §3.1 curated-flow staging layout (partitionBy year,
    * bucket by flow id): partition pruning cuts the years a run touches,
    * while every id-keyed join/agg over what remains is still
    * exchange-free (bucket b's files across all year directories feed
    * task b). */
  def stageBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      partitionCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    partitionCol.fold(w)(p => w.partitionBy(p)).saveAsTable(table)
  }

  /** Stage only if the catalog doesn't already have the table — repeated
    * builds in one session (Explain, then Bench, then Verify) reuse the
    * staging instead of re-paying the write, which is the point of
    * bucketed staging. A fresh session re-stages once (its in-memory
    * catalog starts empty even when the directory survived). */
  def ensureStaged(df: DataFrame, table: String, key: String, buckets: Int,
      partitionCol: Option[String] = None): Unit =
    if (!df.sparkSession.catalog.tableExists(table))
      stageBucketed(df, table, key, buckets, partitionCol)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
