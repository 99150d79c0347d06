package graft.cva

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M3-M5: the reference's CVA flagging + amount semantics with its own
  * column names, as pure plan fragments (no I/O). Each cascade is one
  * ordered `when` chain — first match wins — which is the declarative
  * equivalent of the reference's sequential `x[which(cond)] = v`
  * mutations (SURVEY §2.9; traps §4.3.2-3 handled via coalesce/null
  * guards).
  */
object CvaPipeline {

  /** The 19-name cash cluster list (code/08:99-119). */
  val cashClusters: Seq[String] = Seq(
    "Multi-sector cash", "Multipurpose Cash", "Multi-Purpose Cash",
    "Multipurpose cash assistance", "Cash à usage multiple",
    "Multipurpose Cash Assistance (MPC)", "Multi-purpose Cash and Social Protection",
    "Basic Needs / Multi-Purpose Cash", "Cash Working Group",
    "Multi-Purpose Cash Assistance COVID-19", "Multisector Humanitarian Cash Transfers",
    "Monetización Multisectorial", "Multipurpose Cash Transfer",
    "Cash Transfer", "CASH TRANSFER", "Transferts monétaires à usages multiples",
    "Modalité Cash", "Cash Multisectoriel", "Multi Purpose Cash Assistance")

  /** Keyword regex, built like code/08:92-96: \bkw\b alternation,
    * case-insensitive. */
  def keywordRegex(keywords: Seq[String]): String =
    keywords.map(k => s"\\b${java.util.regex.Pattern.quote(k)}\\b").mkString("(?i)", "|", "")

  /** R `paste(a, b)` with NA → literal "NA" (SURVEY §4.3.2). */
  def pasteNA(cols: Column*): Column =
    concat_ws(" ", cols.map(c => coalesce(c, lit("NA"))): _*)

  /** C1 (code/08:121-128): sector/method/cluster relevance. `cluster` is
    * the "; "-joined cluster cell. */
  def sectorMethodClusterRelevance(method: Column, cluster: Column): Column = {
    val clusters = split(coalesce(cluster, lit("")), "; ")
    val hasCash = size(filter(clusters, c => c.isin(cashClusters: _*))) > 0
    val multi = size(clusters) > 1
    when(method === "Cash transfer programming (CTP)", "Full")
      .when(hasCash && !multi, "Full")
      .when(hasCash && multi, "Partial")
      .otherwise("None")
  }

  /** C2 (code/08:139-182): relevance + method attribution, including the
    * ML upgrade that applies only where still "None" and a keyword or
    * project-CVA signal exists. */
  def relevance(
      smcRelevance: Column,
      projectCvaPct: Column,
      keywordMatch: Column,
      projectCva: Column,
      predictedClass: Column): (Column, Column) = {
    val rel = when(smcRelevance =!= "None", smcRelevance)
      .when(projectCvaPct >= 0.75, "Full")
      .when(projectCvaPct > 0, "Partial")
      .when(coalesce(keywordMatch, lit(false)) && predictedClass.isin("Partial", "Full"),
        predictedClass)
      .when(coalesce(projectCva, lit(false)) && predictedClass.isin("Partial", "Full"),
        predictedClass)
      .otherwise("None")
    val method = when(smcRelevance =!= "None", "Sector/Method/Cluster")
      .when(projectCvaPct >= 0.75, "Project CVA Percentage")
      .when(projectCvaPct > 0, "Project CVA Percentage")
      .when(coalesce(keywordMatch, lit(false)) && predictedClass.isin("Partial", "Full"),
        "Keyword + ML")
      .when(coalesce(projectCva, lit(false)) && predictedClass.isin("Partial", "Full"),
        "Project API + ML")
      .otherwise("None")
    (rel, method)
  }

  /** C3 (code/09:26-89): CVAamount waterfall. `clusterCount` is the
    * "; "-multiplicity of the destination cluster cell ("" → 0). */
  def amountWaterfall(
      amountUSD: Column,
      smcRelevance: Column,
      clusterCount: Column,
      projectCvaPct: Column,
      predictedConfidence: Column,
      commonWordsMatch: Column,
      manualAccept: Column): (Column, Column) = {
    val amount = when(smcRelevance === "Full", amountUSD)
      .when(smcRelevance === "Partial", amountUSD / greatest(clusterCount, lit(1)))
      .when(projectCvaPct.isNotNull && projectCvaPct > 0, amountUSD * projectCvaPct)
      .when(predictedConfidence >= 0.8 && coalesce(commonWordsMatch, lit(false)), amountUSD)
      .when(coalesce(manualAccept, lit(false)), amountUSD)
      .otherwise(lit(0.0))
    val amountType = when(smcRelevance === "Full", "Sector, method, cluster")
      .when(smcRelevance === "Partial", "Partial cluster")
      .when(projectCvaPct.isNotNull && projectCvaPct > 0, "Project CVA percentage")
      .when(predictedConfidence >= 0.8 && coalesce(commonWordsMatch, lit(false)),
        "ML high predicted relevance")
      .when(coalesce(manualAccept, lit(false)), "Manual")
      .otherwise("None")
    (amount, amountType)
  }

  /** code/09:26-27: "; "-multiplicity with the ""→0 override. */
  def clusterCount(cluster: Column): Column =
    when(coalesce(cluster, lit("")) === "", 0)
      .otherwise(size(split(cluster, "; ")))

  /** C5 (code/07:159-160): reconcile flag with percentage. */
  def reconcileCvaFlag(cva: Column, pct: Column): Column =
    when(pct > 0, lit(true)).when(pct === 0, lit(false)).otherwise(cva)

  /** C6 (code/10:313-319): undoubling + total-value imputation. */
  def undouble(pc: Column, subgrant: Column): Column =
    greatest(pc - coalesce(subgrant, lit(0.0)), lit(0.0))
}
