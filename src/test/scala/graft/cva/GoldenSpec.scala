package graft.cva

import graft.SparkSpec
import graft.cva.CvaPipeline
import org.apache.spark.sql.functions._

/** Golden end-to-end parity (SURVEY §5.2): re-derive the reference's
  * committed `output/cva_agg_org_type.csv` from its committed upstream
  * `output/cva_agg.csv` using the engine's operators (A7 rollup + C6
  * undoubling + TV imputation, reference code/10:313-324), and verify the
  * undoubling invariant on every row of the upstream itself.
  *
  * The PC→TV ratio (pc_tv_estimate sheet) is not committed; it is
  * recovered per-year from the golden (TV/PC is constant within a year by
  * construction) and cross-checked for consistency first.
  */
class GoldenSpec extends SparkSpec {
  private val refOut = "/root/reference/output"

  private def readRef(name: String) =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$refOut/$name")

  test("C6 invariant holds on every committed cva_agg row: undoubled = pmax(PC - subgrant, 0)") {
    assume(new java.io.File(s"$refOut/cva_agg.csv").exists())
    val agg = readRef("cva_agg.csv")
    val recomputed = agg.withColumn("recomputed",
      CvaPipeline.undouble(col("`PC.USD.m`"), col("`PC.USD.m_subgrant`")))
    val bad = recomputed
      .filter(abs(col("recomputed") - col("`PC.USD.m_undoubled`")) > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("A7 rollup of cva_agg reproduces cva_agg_org_type (code/10:316-319)") {
    assume(new java.io.File(s"$refOut/cva_agg.csv").exists())
    val agg = readRef("cva_agg.csv")
    val golden = readRef("cva_agg_org_type.csv")

    // recover the per-year PC→TV factor from the golden, verifying it is
    // consistent within each year (max-min ratio spread ≈ 0)
    val ratios = golden.filter(col("`PC.USD.m`") > 0)
      .withColumn("ratio", col("`TV.USD.m`") / col("`PC.USD.m`"))
      .groupBy("Year")
      .agg(min("ratio").as("rmin"), max("ratio").as("rmax"), first("ratio").as("ratio"))
    assert(ratios.filter(col("rmax") - col("rmin") > 1e-9).count() == 0)

    val rollup = agg.groupBy("Year", "Org_type")
      .agg(sum("`PC.USD.m_undoubled`").as("pc"))
      .join(ratios.select(col("Year"), col("ratio")), Seq("Year"), "left")
      .withColumn("tv", col("pc") * col("ratio"))

    val joined = golden.join(rollup, Seq("Year", "Org_type"), "outer")
    // FTS years (2017+) are fully derivable; earlier years come from the
    // survey side which is upstream of cva_agg too — all rows must match.
    val mismatches = joined.filter(
      col("pc").isNull || col("`PC.USD.m`").isNull ||
      abs(col("pc") - col("`PC.USD.m`")) > 1e-6 ||
      (col("`TV.USD.m`").isNotNull && abs(col("tv") - col("`TV.USD.m`")) > 1e-6))
    val n = mismatches.count()
    if (n > 0) mismatches.show(10, truncate = false)
    assert(n == 0)
    assert(joined.count() == golden.count()) // no extra groups invented
  }

  test("A8 invariants hold on the committed USA location analysis (code/11:62-89)") {
    // the upstream fts_cva.csv is a MISSING_LARGE_BLOB, so the full
    // re-derivation isn't possible; the golden's internal relationship
    // IS derivable: pc = USA / all, USA ≤ all, and per-location rows are
    // unique (the full-outer location join produced no duplicates)
    assume(new java.io.File(s"$refOut/fts_cva_USA_analysis.csv").exists())
    val usa = readRef("fts_cva_USA_analysis.csv")
    val withBoth = usa.filter(col("CVAamount").isNotNull && col("CVAamount_USA").isNotNull)
    assert(withBoth.filter(col("CVAamount_USA") > col("CVAamount") + 1e-6).count() == 0)
    val badPc = withBoth.filter(col("CVAamount") > 0 &&
      abs(col("CVAamount_USA") / col("CVAamount") - col("CVAamount_USA_pc")) > 1e-9)
    assert(badPc.count() == 0)
    assert(usa.select("`destinationObjects_Location.name`").distinct().count() == usa.count())
  }
}
