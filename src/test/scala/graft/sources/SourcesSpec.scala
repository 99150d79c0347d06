package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  test("PagedJsonSource follows pages until exhausted (S1, code/01:39-44)") {
    val pages = Seq(
      """{"id": 1, "amountUSD": 10.0}
         {"id": 2, "amountUSD": 20.0}""",
      """{"id": 3, "amountUSD": 30.0}""")
    val df = PagedJsonSource.readPages(spark,
      n => if (n < pages.length) Some(pages(n)) else None)
    assert(df.count() == 3)
    assert(df.agg(sum("amountUSD")).collect()(0).getDouble(0) == 60.0)
  }

  test("readPagesDistributed: fetcher runs task-side, schema applied (S1 scale path)") {
    val df = PagedJsonSource.readPagesDistributed(spark, 4,
      n => if (n < 3) Some(s"""{"id": $n, "amountUSD": ${n * 10}.0}""") else None,
      org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, amountUSD DOUBLE"))
    assert(df.count() == 3)
    assert(df.agg(sum("amountUSD")).collect()(0).getDouble(0) == 30.0)
  }

  test("PagedJsonSource tolerates per-page schema drift (rbindlist fill=T, R4)") {
    val df = PagedJsonSource.readPages(spark,
      n => n match {
        case 0 => Some("""{"id": 1, "a": "x"}""")
        case 1 => Some("""{"id": 2, "b": "y"}""")
        case _ => None
      })
    assert(df.columns.sorted.toSeq == Seq("a", "b", "id"))
    assert(df.filter(col("a").isNull).count() == 1)
  }

  test("readWeoTsv: UTF-16 TSV with multiple NA markers (S10, code/03:46)") {
    val tmp = java.nio.file.Files.createTempDirectory("weo").toFile
    val f = new java.io.File(tmp, "weo.tsv")
    val content = "ISO\t2020\t2021\nAFG\t100\tn/a\nFRA\t--\t200\n"
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-16"))
    val df = CsvSources.readWeoTsv(spark, f.getAbsolutePath)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSet == Set(("AFG", "100", null), ("FRA", null, "200")))
  }

  test("CSV round trip preserves NA semantics (S5/S6)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("csvrt").toString
    val df = Seq((1L, Some("x"), Some(1.5)), (2L, None, None))
      .toDF("id", "name", "v")
    CsvSources.writeCsv(df, tmp)
    val back = CsvSources.readCsv(spark, tmp,
      Some(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, name STRING, v DOUBLE")))
    val rows = back.orderBy("id").collect()
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(0).getString(1) == "x" && rows(0).getDouble(2) == 1.5)
  }

  test("SdmxDecoder maps dimension indices through dictionaries (S12, util_oecd_sdmx.R:8-49)") {
    import spark.implicits._
    val obs = Seq(("0:1", 7.5), ("1:0", 2.5)).toDF("obs_key", "obs_value")
    val out = SdmxDecoder.decode(obs, Seq(
      "iso3" -> Seq("AUS", "FRA"),
      "year" -> Seq("2020", "2021")))
      .collect().map(r => (r.getString(1), r.getString(2), r.getDouble(0))).toSet
    assert(out == Set(("AUS", "2021", 7.5), ("FRA", "2020", 2.5)))
  }
}
