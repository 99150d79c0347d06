package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided TPC-H-ish parquet tables
  * (`/root/repo/TESTDATA.md`). Schemas are fixed by the driver; we read
  * them as-is so Catalyst's vectorized parquet reader + column pruning /
  * filter pushdown apply (the caller's `select`/`filter` reach the scan).
  *
  * At 100 TB these reads are the dominant cost: every query below selects
  * only the columns it needs so `ReadSchema` stays narrow, and all
  * predicates are plain column comparisons so they appear in
  * `PushedFilters`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is nanosecond parquet, which Spark's vectorized reader
    * rejects; read nanos as a raw long and keep all timestamp math in
    * integer nanoseconds (doubles lose precision above 2^53 ≈ 104 days of
    * nanos). Queries derive seconds via integer division. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
