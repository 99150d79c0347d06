package graft.cva

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M3: project Q/A long-table processing (reference
  * code/07_process_project_data.R) — from one row per (project_id,
  * question, answer) to the `cash_projects` table of
  * (project_id, cva_percentage, cva).
  *
  * Question classification comes from the curated mapping
  * (reference_datasets/cva_project_questions.csv): quant* questions
  * yield percentages (U1), flagCVA questions yield booleans (U2).
  * Percentages sum per project, capped at 100, /100 (A3); flags bool-or
  * per project (A4); the overlap patches (R5, code/07:146-156) add
  * zero-percent projects to the flag set and false-flag projects to the
  * quant set before the full-outer merge; C5 reconciles flag with
  * percentage.
  *
  * One shuffle per aggregation on project_id; the question-type mapping
  * broadcasts.
  */
object Projects {

  /** @param qa        long table (project_id, question, answer)
    * @param questions mapping (question, qtype) with qtype ∈
    *                  {flagCVA, quantC, quantV, quantCVA, otherCVA} */
  def cashProjects(qa: DataFrame, questions: DataFrame): DataFrame = {
    val typed = qa.join(broadcast(questions), Seq("question"), "inner")

    val quant = typed
      .filter(col("qtype").startsWith("quant"))
      .withColumn("pct", TextFns.standardizePercentage(col("answer")))
      .filter(col("pct").isNotNull && !isnan(col("pct")))
      .groupBy("project_id")
      .agg((least(sum("pct"), lit(100.0)) / 100.0).as("cva_percentage")) // A3

    val flags = typed
      .filter(col("qtype") === "flagCVA")
      .withColumn("b", TextFns.standardizeBoolean(col("answer")))
      .groupBy("project_id")
      .agg(max(col("b")).as("cva")) // A4

    // R5 overlap patches: quant-only projects imply a flag; false-flag
    // projects not in quant imply 0 percent — then full-outer merge.
    val merged = quant.join(flags, Seq("project_id"), "outer")
    merged
      .withColumn("cva_percentage",
        when(col("cva_percentage").isNull && col("cva") === false, 0.0)
          .otherwise(col("cva_percentage")))
      .withColumn("cva",
        CvaPipeline.reconcileCvaFlag(col("cva"), col("cva_percentage"))) // C5
  }
}
