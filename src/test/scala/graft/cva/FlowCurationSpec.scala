package graft.cva

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end §7.2 slice over FIXTURES.md-shaped flow rows with
  * hand-computed expectations. */
class FlowCurationSpec extends SparkSpec {
  import spark.implicits._

  private val yearCol = "destinationObjects_UsageYear.name"
  private val locCol = "destinationObjects_Location.name"
  private val cluCol = "destinationObjects_Cluster.name"

  private def flows = Seq(
    // id, amount, boundary, onBoundary, usage_year, location, method, cluster
    (1L, 100.0, "incoming", "single", "2020", "Mali", "Cash transfer programming (CTP)", "Health"),
    (2L, 80.0, "outgoing", "single", "2020", "Mali", "Traditional aid", "Health"),       // dropped (F1)
    (3L, 60.0, "internal", "shared", "2020", "Niger", "Traditional aid", "Multipurpose Cash"),
    (3L, 60.0, "incoming", "shared", "2020", "Niger", "Traditional aid", "Multipurpose Cash"), // J13 keeps this one
    (4L, 40.0, "incoming", "single", "2020; 2021", "Mali", "Cash transfer programming (CTP)", "Health"), // R1 year split
    (5L, 30.0, "incoming", "single", "2020", "Mali; Niger", "Cash transfer programming (CTP)", "Health"), // R1 loc split
    (6L, 50.0, "incoming", "single", "2020", "Chad", "Traditional aid", "Health; Multipurpose Cash"), // Partial, /2
    (7L, 10.0, "incoming", "single", "2020", "Atlantis", "Cash transfer programming (CTP)", "Health")) // no iso → DAC
    .toDF("id", "amountUSD", "boundary", "onBoundary", "usage_year", "location", "method", cluCol)
    .withColumnRenamed("usage_year", yearCol)
    .withColumnRenamed("location", locCol)

  private def isos = Seq(
    ("Mali", "MLI"), ("Niger", "NER"), ("Chad", "TCD")).toDF("countryname_fts", "iso3")

  private def deflators = Seq(
    ("MLI", "2020", 2.0), ("MLI", "2021", 2.0), ("NER", "2020", 1.5), ("TCD", "2020", 1.0))
    .toDF("iso3", "year", "deflator")

  private def dac = Seq(("2020", 0.5), ("2021", 0.5)).toDF("year", "deflator")

  test("curate: filter, dedup, double split, iso join (code/04:80-98)") {
    val out = FlowCuration.curate(flows, isos)
    assert(out.filter(col("id") === 2L).count() == 0)                 // outgoing gone
    assert(out.filter(col("id") === 3L).count() == 1)                 // shared deduped
    assert(out.filter(col("id") === 3L).select("boundary").collect()(0).getString(0) == "incoming")
    val id4 = out.filter(col("id") === 4L)
      .select("year", "amountUSD").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(id4 == Map("2020" -> 20.0, "2021" -> 20.0))                // year split halves
    val id5 = out.filter(col("id") === 5L)
      .select(col("`destinationObjects_Location.name`"), col("amountUSD")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(id5 == Map("Mali" -> 15.0, "Niger" -> 15.0))               // location split halves
    assert(out.filter(col("id") === 7L).select("iso3").collect()(0).isNullAt(0)) // unmatched iso
  }

  test("deflate: composite key join with DAC fallback (code/04:115-119)") {
    val out = FlowCuration.deflate(FlowCuration.curate(flows, isos), deflators, dac)
    val m = out.select(col("id"), col("`destinationObjects_Location.name`"), col("deflator"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m((1L, "Mali")) == 2.0)
    assert(m((3L, "Niger")) == 1.5)
    assert(m((7L, "Atlantis")) == 0.5) // DAC fallback for missing iso
  }

  test("cvaByLocation: the §7.2 slice end-to-end with hand-computed totals") {
    val out = FlowCuration.cvaByLocation(
      FlowCuration.deflate(FlowCuration.curate(flows, isos), deflators, dac))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Mali: id1 CTP full 100/2=50 ; id4 year-split 20/2+… only 2020+2021 both Mali: (20/2)+(20/2)=20 ; id5 15/2=7.5 → 77.5
    // Niger: id3 single cash cluster full 60/1.5=40 ; id5 15/1.5=10 → 50
    // Chad: id6 partial multi-cluster (50/1.0)/2=25
    // Atlantis: id7 CTP full 10/0.5=20
    assert(out("Mali") == 77.5)
    assert(out("Niger") == 50.0)
    assert(out("Chad") == 25.0)
    assert(out("Atlantis") == 20.0)
  }
}
