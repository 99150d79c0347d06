package graft.cva

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("ftsAgg + org type + overlap exclusion (F8/A5/J7/J11)") {
    val fts = Seq(
      ("2020", false, "UNICEF", "UN Agencies", 2e6),
      ("2020", false, "UNICEF", "UN Agencies", 1e6),
      ("2020", false, "International NGOs (Confidential)", "NGO", 9e6),
      ("2021", true, "WFP", "UN Agencies", 4e6))
      .toDF("year", "newMoney", "org_name", "org_subtypes", "CVAamount")
    val types = Seq(("UN Agencies", "UN")).toDF("org_subtypes", "cva_org_type")
    val overlap = Seq(("WFP", "2021")).toDF("org_name", "Year")
    val agg = GlobalAnalysis.ftsAgg(fts, Seq("International NGOs (Confidential)"))
    val typed = GlobalAnalysis.withOrgType(agg, types)
    val kept = GlobalAnalysis.excludeSurveyOverlap(typed, overlap)
      .collect().map(r => r.getAs[String]("org_name") -> r.getAs[Double]("PC.USD.m")).toMap
    assert(kept == Map("UNICEF" -> 3.0)) // confidential excluded, WFP-2021 overlap dropped
  }

  test("unifyNames: manual ≻ exact ≻ fuzzy ≻ substring, unmatched keep own (C4)") {
    val fts = Seq("Save The Children!", "Oxfam Internatoinal", "UNICEF country office",
      "Mystery Org", "DRC").toDF("org_name")
    val survey = Seq("save the children", "oxfam international", "unicef").toDF("survey_org")
    val manual = Seq(("DRC", "danish refugee council")).toDF("org_name", "clean_org")
    val out = GlobalAnalysis.unifyNames(fts, survey, manual)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("Save The Children!") == "save the children")      // exact after cleaning
    assert(out("Oxfam Internatoinal") == "oxfam international")   // fuzzy (transposition)
    assert(out("UNICEF country office") == "unicef")              // survey name inside fts name
    assert(out("Mystery Org") == "mystery org")                   // unmatched → own cleaned
    assert(out("DRC") == "danish refugee council")                // manual override wins
  }

  test("undoubleAgg + orgTypeRollup reproduce the code/10 tail (A6/C6/A7)") {
    val cvaAgg = Seq(
      ("unicef", "2020", false, "UN", 10.0),
      ("acme", "2020", false, "NGO", 5.0))
      .toDF("clean_org", "Year", "newMoney", "Org_type", "PC.USD.m")
    val sub = Seq(("unicef", "2020", false, 4.0), ("acme", "2020", false, 9.0))
      .toDF("clean_org", "Year", "newMoney", "amount_usd")
    val pcTv = Seq(("2020", 1.5)).toDF("Year", "pc_average")
    val und = GlobalAnalysis.undoubleAgg(cvaAgg, sub)
    val roll = GlobalAnalysis.orgTypeRollup(und, pcTv)
      .collect().map(r => r.getAs[String]("Org_type") ->
        (r.getAs[Double]("PC.USD.m"), r.getAs[Double]("TV.USD.m"))).toMap
    assert(roll("UN") == ((6.0, 9.0)))   // 10-4=6; TV=6*1.5
    assert(roll("NGO") == ((0.0, 0.0)))  // 5-9 floored at 0
  }
}
