package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R1 "split rows, divide value evenly" (reference: code/02_fts_split_rows.R:8-21,
  * called from code/04_fts_curated_flows.R:87-92).
  *
  * Splits `splitCol` on `pattern`, emits one row per token, and divides each
  * of `valueCols` by the token count so additive measures are preserved by
  * the expansion. A NULL `splitCol` keeps its single row with values intact
  * (the reference's `ifelse(is.na(x), 1, …)` guard).
  *
  * Spark-first shape: pure `split`/`explode` generator — stays inside
  * whole-stage codegen, no shuffle, scales linearly with input rows. The
  * invariant Σ valueCol is preserved up to FP tolerance (property-tested).
  */
object SplitRows {
  def splitRows(
      df: DataFrame,
      splitCol: String,
      valueCols: Seq[String],
      pattern: String = "; "): DataFrame = {
    // Null-safe tokenization: null → single-element array holding the null
    // so explode keeps the row (mirrors the reference's NA → 1-row rule).
    val toks = when(col(splitCol).isNull, array(lit(null).cast("string")))
      .otherwise(split(col(splitCol), regexEscape(pattern)))
    val withToks = df
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")).cast("double"))
    val divided = valueCols.foldLeft(withToks) { (d, v) =>
      d.withColumn(v, col(v) / col("__n"))
    }
    divided
      .withColumn(splitCol, explode(col("__toks")))
      .withColumn(splitCol, trim(col(splitCol)))
      .drop("__toks", "__n")
  }

  /** Literal-pattern escape (U3 quotemeta, reference code/10:88-90). */
  def regexEscape(s: String): String = java.util.regex.Pattern.quote(s)

  /** Column-level regex escape for dynamically built patterns (J9). */
  def regexEscapeCol(c: Column): Column =
    regexp_replace(c, """([\\.\[\]\{\}\(\)\*\+\?\^\$\|])""", """\\$1""")
}
