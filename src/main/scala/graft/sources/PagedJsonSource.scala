package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S1/S8: paginated REST ingestion (reference code/01_fts_get_flows.R:8-46
  * follows `meta$nextLink` until null; code/06 loops per-project GETs).
  *
  * The page fetcher is injected (`fetchPage(n) => Some(jsonBody)`), so in
  * this zero-egress environment tests feed local fixture strings while
  * production would plug an HTTP client. Fetching is driver-side — page
  * count is small (the reference caps at 1000 rows/page) — and parsing is
  * distributed: pages land in a Dataset[String] and `spark.read.json`
  * infers/applies the schema in parallel.
  *
  * At scale, swap the driver loop for one task per page id via
  * `spark.range(nPages).mapPartitions(fetch)` — same downstream plan.
  */
object PagedJsonSource {
  /** Scale path: one task per page — the fetcher runs inside executors
    * via `spark.range(nPages)`, so 10⁴ pages fan out across the cluster
    * instead of serializing through the driver. Requires the page count
    * (or an upper bound; missing pages yield no rows) and an explicit
    * schema (executors cannot run schema inference per-task). */
  def readPagesDistributed(
      spark: SparkSession,
      nPages: Int,
      fetchPage: Int => Option[String],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_json}
    import spark.implicits._
    val lines = spark.range(nPages).as[Long].flatMap { n =>
      fetchPage(n.toInt).iterator
        .flatMap(_.linesIterator.map(_.trim).filter(_.nonEmpty))
    }
    lines.select(from_json(col("value"), schema).as("r")).select("r.*")
  }

  def readPages(spark: SparkSession, fetchPage: Int => Option[String]): DataFrame = {
    import spark.implicits._
    // one JSON document per dataset element (json-lines contract)
    val docs = Iterator.from(0)
      .map(fetchPage)
      .takeWhile(_.isDefined)
      .flatten
      .flatMap(_.linesIterator.map(_.trim).filter(_.nonEmpty))
      .toSeq
    val ds: Dataset[String] = spark.createDataset(docs)
    spark.read.json(ds)
  }
}
