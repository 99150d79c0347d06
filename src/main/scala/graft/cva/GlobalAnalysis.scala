package graft.cva

import graft.functions.TextFns
import graft.operators.{FuzzyJoin, Joins}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M6: the 10_global_cva_analysis.R surface — FTS aggregation, org-type
  * mapping, survey-overlap exclusion, survey∪FTS union, the
  * name-unification cascade, sub-grant undoubling, and the org-type
  * rollup with TV imputation. Every join side here is a small curated
  * table → broadcast; the only fact-side shuffle is the A5 aggregate.
  */
object GlobalAnalysis {

  /** F8 + A5 (code/10:24-60): exclude confidential orgs, aggregate CVA
    * amounts to millions by (Year, newMoney, org, subtype). */
  def ftsAgg(ftsCva: DataFrame, excludeOrgs: Seq[String]): DataFrame =
    ftsCva
      .filter(!col("org_name").isin(excludeOrgs: _*))
      .groupBy(col("year").as("Year"), col("newMoney"), col("org_name"), col("org_subtypes"))
      .agg((sum("CVAamount") / 1e6).as("PC.USD.m"))

  /** J7 (code/10:63): org-type lookup on organizationSubTypes. */
  def withOrgType(agg: DataFrame, orgTypes: DataFrame): DataFrame =
    agg.join(broadcast(orgTypes), Seq("org_subtypes"), "left")

  /** J11 (code/10:48,66-68): drop FTS rows for (org, year) combos already
    * covered by the survey. */
  def excludeSurveyOverlap(agg: DataFrame, overlap: DataFrame): DataFrame =
    Joins.antiJoinOn(agg, overlap, Seq("org_name", "Year"))

  /** C4 (code/10:88-301): unify FTS org names against survey org names —
    * precedence manual ≻ exact (normalized) ≻ fuzzy ≻ substring; unmatched
    * names keep their own normalized form. Returns (org_name, clean_org).
    * `clean` is the normalizer — default ASCII [[TextFns.cleanName]];
    * pass [[TextFns.cleanNameUnicode]] for reference-exact behavior on
    * accented org names (GoldenSpec drives it that way against the
    * committed cva_agg universe). */
  def unifyNames(ftsNames: DataFrame, surveyNames: DataFrame, manual: DataFrame,
      clean: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextFns.cleanName): DataFrame = {
    val fts = ftsNames.select(col("org_name")).distinct()
      .withColumn("clean_name", clean(col("org_name")))
    val survey = surveyNames.select(col("survey_org")).distinct()
      .withColumn("clean_survey", clean(col("survey_org")))

    val exact = fts.join(survey, col("clean_name") === col("clean_survey"))
      .select(col("org_name"), col("survey_org").as("matched"))
    // Block on the first letter: at maxDistFrac=0.2 an org-name typo that
    // rewrites the first character is outside anything the reference's
    // match list contains, so blocked and unblocked match sets coincide
    // (property-tested in FuzzyJoinSpec) while each block is ~1/26 of the
    // name list. A length band is NOT used: |len(l)-len(r)| can legally
    // reach ceil(0.2·len), which straddles any fixed band boundary.
    val fuzzy = FuzzyJoin.fuzzyMatch(
      fts.select("clean_name"), "clean_name",
      survey.select("clean_survey"), "clean_survey", maxDistFrac = 0.2,
      blockKey = Some(c => substring(c, 1, 1)))
      .join(fts, Seq("clean_name"))
      .join(survey, Seq("clean_survey"))
      .select(col("org_name"), col("survey_org").as("matched"))
    val substr = FuzzyJoin.substringMatch(
      survey.select("clean_survey"), "clean_survey",
      fts.select("clean_name"), "clean_name")
      .join(fts, Seq("clean_name"))
      .join(survey, Seq("clean_survey"))
      .select(col("org_name"), col("survey_org").as("matched"))

    FuzzyJoin.precedenceCoalesce(
      fts.select("org_name", "clean_name"), "org_name",
      Seq((manual, "clean_org"), (exact, "matched"), (fuzzy, "matched"), (substr, "matched")))
      .withColumn("clean_org", coalesce(col("matched"), col("clean_name")))
      .select("org_name", "clean_org")
  }

  /** A6 + C6 (code/10:305-315): aggregate sub-grants, subtract, floor 0. */
  def undoubleAgg(cvaAgg: DataFrame, subGrants: DataFrame): DataFrame = {
    val sg = subGrants
      .groupBy("clean_org", "Year", "newMoney")
      .agg(sum("amount_usd").as("PC.USD.m_subgrant"))
    cvaAgg.join(broadcast(sg), Seq("clean_org", "Year", "newMoney"), "left")
      .withColumn("PC.USD.m_subgrant", coalesce(col("`PC.USD.m_subgrant`"), lit(0.0)))
      .withColumn("PC.USD.m_undoubled",
        CvaPipeline.undouble(col("`PC.USD.m`"), col("`PC.USD.m_subgrant`")))
  }

  /** A7 + TV imputation (code/10:316-321). `pcTv` = (Year, pc_average). */
  def orgTypeRollup(cvaAgg: DataFrame, pcTv: DataFrame): DataFrame =
    cvaAgg.groupBy("Year", "Org_type")
      .agg(sum("`PC.USD.m_undoubled`").as("PC.USD.m"))
      .join(broadcast(pcTv), Seq("Year"), "left")
      .withColumn("TV.USD.m", col("`PC.USD.m`") * col("pc_average"))
      .drop("pc_average")
}
