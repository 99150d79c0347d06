package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** R-compatible CSV / TSV I/O (S5, S6, S10).
  *
  * fread/fwrite conventions the engine mirrors (SURVEY §1.2, §4.3.5):
  * UTF-8, header, quotes as needed, "NA"/"" as nulls, booleans as
  * TRUE/FALSE strings on round-trip. The WEO workbook variant (S10) is
  * tab-separated UTF-16 with several NA markers scrubbed post-read
  * (a single `nullValue` can't express multiple markers).
  */
object CsvSources {
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .option("nullValue", "NA")
      .option("emptyValue", "")
    schema.map(r.schema).getOrElse(r.option("inferSchema", "true")).csv(path)
  }

  def writeCsv(df: DataFrame, path: String, single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S10: UTF-16 TSV with multiple NA markers ("", "n/a", "--"). */
  def readWeoTsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", "\t")
      .option("encoding", "UTF-16")
      .option("lineSep", "\n") // multi-byte charsets need an explicit line separator
      .option("multiLine", "true") // respects the charset decoder (incl. BOM)
      .csv(path)
    import org.apache.spark.sql.functions._
    raw.select(raw.columns.map(c =>
      when(trim(col(c)).isin("", "n/a", "--"), lit(null)).otherwise(col(c)).as(c)): _*)
  }
}
