package graft.cva

import graft.operators.{Dedup, Joins, SplitRows}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1 flow curation + the §7.2 minimum end-to-end slice: the reference's
  * 04_fts_curated_flows.R spine (filter → shared-boundary dedup → year
  * split → location split → iso join → deflator join with DAC fallback)
  * followed by C1/C3 and the per-location aggregate of
  * 11_refresh_2024_sample_analysis.R.
  *
  * Shuffle budget: ONE shuffle (the id-window dedup); everything else is
  * generators and broadcast joins — the Spark shape SURVEY §3.1 calls for.
  * Reference columns carry dots (`destinationObjects_Location.name`);
  * they are renamed to safe identifiers at the boundary and restored on
  * output, keeping the operator internals quoting-free.
  */
object FlowCuration {

  private val yearCol = "destinationObjects_UsageYear.name"
  private val locCol = "destinationObjects_Location.name"

  /** code/04:80-98: curate raw unioned flows. `isos` maps
    * countryname_fts → iso3. */
  def curate(flows: DataFrame, isos: DataFrame): DataFrame = {
    val safe = flows
      .withColumnRenamed(yearCol, "usage_year")
      .withColumnRenamed(locCol, "location")
    val filtered = safe.filter(col("boundary") =!= "outgoing") // F1
    // J13: among onBoundary=="shared" rows sharing an id, prefer incoming
    val deduped = Dedup.firstRowPerGroup(
      filtered, Seq("id"),
      Seq((col("boundary") === "incoming").cast("int").desc, col("usage_year").asc_nulls_last))
    val yearSplit = SplitRows.splitRows(deduped, "usage_year", Seq("amountUSD")) // R1
      .withColumnRenamed("usage_year", "year")
    val locSplit = SplitRows.splitRows(yearSplit, "location", Seq("amountUSD")) // R1
    locSplit.join(
      broadcast(isos.select(col("countryname_fts").as("location"), col("iso3"))),
      Seq("location"), "left") // J1
      .withColumnRenamed("location", locCol)
  }

  /** code/04:115-119: composite-key deflator join with the DAC fallback
    * (J3+J4), then deflated amounts. `deflators` = (iso3, year, deflator);
    * `dac` = (year, deflator) slice. */
  def deflate(curated: DataFrame, deflators: DataFrame, dac: DataFrame): DataFrame =
    Joins.joinWithFallback(curated, deflators, Seq("iso3", "year"), dac, Seq("year"), "deflator")
      .withColumn("amountUSD_defl", col("amountUSD") / col("deflator"))
      .withColumn("amountUSD_defl_millions", col("amountUSD_defl") / 1e6)

  /** §7.2: C1 relevance → C3 steps 1-2 → per-location CVA aggregate
    * (the fts_cva_USA_analysis shape, code/11:62-67). */
  def cvaByLocation(deflated: DataFrame): DataFrame = {
    val withRel = deflated.withColumn("relevance",
      CvaPipeline.sectorMethodClusterRelevance(
        col("method"), col("`destinationObjects_Cluster.name`")))
    val nClust = CvaPipeline.clusterCount(col("`destinationObjects_Cluster.name`"))
    val amount = when(col("relevance") === "Full", col("amountUSD_defl"))
      .when(col("relevance") === "Partial", col("amountUSD_defl") / greatest(nClust, lit(1)))
      .otherwise(lit(0.0))
    withRel.withColumn("CVAamount", amount)
      .filter(col("CVAamount") > 0)
      .groupBy(col("`destinationObjects_Location.name`"))
      .agg(sum("CVAamount").as("CVAamount"))
      .orderBy(col("`destinationObjects_Location.name`"))
  }
}
