package graft.cva

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CvaSpec extends SparkSpec {
  import spark.implicits._

  test("deflator rebase: anchor year == 1 for every key (SURVEY §5.2 property)") {
    val df = Seq(
      ("AFG", 2020, 95.0), ("AFG", 2021, 100.0), ("AFG", 2022, 108.0),
      ("FRA", 2020, 99.0), ("FRA", 2021, 100.0), ("FRA", 2022, 101.5))
      .toDF("ISO", "year", "defl")
    val out = Deflators.rebase(df, "ISO", "year", "defl", 2021)
    val anchors = out.filter(col("year") === 2021).select("defl").collect().map(_.getDouble(0))
    assert(anchors.forall(_ == 1.0))
    val afg2022 = out.filter(col("ISO") === "AFG" && col("year") === 2022)
      .collect()(0).getDouble(2)
    assert(math.abs(afg2022 - 1.08) < 1e-12)
  }

  test("chainGrowth: cumprod of growth factors in year order (W1)") {
    val df = Seq(("A", 1, 1.1), ("A", 2, 1.2), ("A", 3, 1.5)).toDF("k", "t", "g")
    val out = Deflators.chainGrowth(df, "k", "t", "g").orderBy("t")
      .select("chained").collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.1) < 1e-12)
    assert(math.abs(out(1) - 1.32) < 1e-12)
    assert(math.abs(out(2) - 1.98) < 1e-12)
  }

  test("composite: sum/sum ratio over member subset (A9 DAC)") {
    val df = Seq(
      ("USA", 2020, 200.0, 100.0), ("FRA", 2020, 100.0, 100.0), ("XXX", 2020, 999.0, 1.0))
      .toDF("ISO", "year", "cur", "con")
    val out = Deflators.composite(df, "year", "cur", "con", "ISO", Seq("USA", "FRA"))
      .collect()(0).getDouble(1)
    assert(out == 1.5) // (200+100)/(100+100), XXX excluded
  }

  test("extendSeries: geometric forward and backward fill (code/03:150-175)") {
    // observed 2020→100, 2022→121 ⇒ g = 1.1
    val df = Seq(("A", 2020, 100.0), ("A", 2021, 110.0), ("A", 2022, 121.0))
      .toDF("ISO", "year", "v")
    val out = Deflators.extendSeries(df, "ISO", "year", "v", 2018 to 2024)
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(math.abs(out(2023) - 133.1) < 1e-9)           // 121 * 1.1
    assert(math.abs(out(2024) - 146.41) < 1e-9)          // 121 * 1.1²
    assert(math.abs(out(2019) - 100.0 / 1.1) < 1e-9)     // back-cast
    assert(out(2021) == 110.0)                           // observed untouched
  }

  test("C1: cash cluster full, multi-cluster partial, CTP method full (code/08:121-128)") {
    val df = Seq(
      ("Cash transfer programming (CTP)", "Health"),
      ("Traditional aid", "Multipurpose Cash"),
      ("Traditional aid", "Health; Multipurpose Cash"),
      ("Traditional aid", "Health"),
      ("Traditional aid", null))
      .toDF("method", "cluster")
    val out = df.select(CvaPipeline.sectorMethodClusterRelevance(col("method"), col("cluster")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("Full", "Full", "Partial", "None", "None"))
  }

  test("C2: percentage bands and ML upgrade only where None (code/08:139-182)") {
    val df = Seq(
      // smc, pct, kw, projCva, predicted
      ("Full", null.asInstanceOf[java.lang.Double], false, false, null.asInstanceOf[String]),
      ("None", java.lang.Double.valueOf(0.8), false, false, null.asInstanceOf[String]),
      ("None", java.lang.Double.valueOf(0.3), false, false, null.asInstanceOf[String]),
      ("None", null.asInstanceOf[java.lang.Double], true, false, "Partial"),
      ("None", null.asInstanceOf[java.lang.Double], false, true, "Full"),
      ("None", null.asInstanceOf[java.lang.Double], false, false, "Full"))
      .toDF("smc", "pct", "kw", "pcva", "pred")
    val (rel, method) = CvaPipeline.relevance(
      col("smc"), col("pct"), col("kw"), col("pcva"), col("pred"))
    val out = df.select(rel.as("r"), method.as("m")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(
      ("Full", "Sector/Method/Cluster"),
      ("Full", "Project CVA Percentage"),
      ("Partial", "Project CVA Percentage"),
      ("Partial", "Keyword + ML"),
      ("Full", "Project API + ML"),
      ("None", "None")))  // no keyword/project signal ⇒ no ML upgrade
  }

  test("C3 waterfall: branch priority and partial-cluster division (code/09:26-89)") {
    val df = Seq(
      // amount, smc, nclust, pct, conf, common, manual
      (100.0, "Full", 1, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double], false, false),
      (100.0, "Partial", 4, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double], false, false),
      (100.0, "None", 0, java.lang.Double.valueOf(0.25), null.asInstanceOf[java.lang.Double], false, false),
      (100.0, "None", 0, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(0.9), true, false),
      (100.0, "None", 0, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(0.9), false, true),
      (100.0, "None", 0, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double], false, false))
      .toDF("amt", "smc", "nclust", "pct", "conf", "common", "manual")
    val (amount, atype) = CvaPipeline.amountWaterfall(
      col("amt"), col("smc"), col("nclust"), col("pct"), col("conf"), col("common"), col("manual"))
    val out = df.select(amount.as("a"), atype.as("t")).collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(out == Seq(
      (100.0, "Sector, method, cluster"),
      (25.0, "Partial cluster"),
      (25.0, "Project CVA percentage"),
      (100.0, "ML high predicted relevance"),
      (100.0, "Manual"),
      (0.0, "None")))
  }

  test("clusterCount: '' → 0, multi '; ' counted (code/09:26-27)") {
    val df = Seq("", "Health", "A; B; C", null).toDF("c")
    val out = df.select(CvaPipeline.clusterCount(col("c"))).collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 1, 3, 0))
  }

  test("pasteNA reproduces R paste's literal NA (SURVEY §4.3.2)") {
    val df = Seq((null.asInstanceOf[String], "objective")).toDF("desc", "obj")
    val out = df.select(CvaPipeline.pasteNA(col("desc"), col("obj"))).collect()(0).getString(0)
    assert(out == "NA objective")
  }

  test("keywordRegex matches word-boundary, case-insensitive (code/08:92-96)") {
    val re = CvaPipeline.keywordRegex(Seq("cash transfer", "voucher"))
    val df = Seq("CASH TRANSFER program", "vouchers only", "cashier transfer").toDF("t")
    val out = df.select(col("t").rlike(re)).collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, false, false)) // "vouchers" ≠ \bvoucher\b
  }

  test("reconcileCvaFlag: percentage overrides flag answers (C5)") {
    val df = Seq(
      (false, java.lang.Double.valueOf(0.5)),
      (true, java.lang.Double.valueOf(0.0)),
      (true, null.asInstanceOf[java.lang.Double]))
      .toDF("cva", "pct")
    val out = df.select(CvaPipeline.reconcileCvaFlag(col("cva"), col("pct")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, false, true))
  }
}
