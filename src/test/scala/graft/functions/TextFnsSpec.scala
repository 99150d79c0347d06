package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def parse(ss: Seq[String]): Seq[Option[Double]] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      ss.map(Row(_)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("s STRING"))
    df.select(TextFns.standardizePercentage(col("s")).as("p"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
  }

  test("standardizePercentage covers every branch (code/07:104-128 fixture strings)") {
    // Fixture strings from FIXTURES.md §10.
    assert(parse(Seq("45%")) == Seq(Some(45.0)))
    assert(parse(Seq("12.5 percent")) == Seq(Some(12.5)))
    assert(parse(Seq("less than 1 percent of total")) == Seq(Some(0.5)))
    assert(parse(Seq("80")) == Seq(Some(80.0)))
    assert(parse(Seq("~30% of budget")) == Seq(Some(30.0)))
    assert(parse(Seq("no figure")) == Seq(None))
    assert(parse(Seq(null)) == Seq(None))
    // % branch wins over bare-number branch when both could match
    assert(parse(Seq("100%")) == Seq(Some(100.0)))
  }

  test("standardizeBoolean matches tolower %in% c('true','qui','yes')") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq("TRUE", "qui", "Yes", "non", "FALSE", "true ").map(Row(_)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("s STRING"))
    val out = df.select(TextFns.standardizeBoolean(col("s"))).collect().map(_.getBoolean(0)).toSeq
    assert(out == Seq(true, true, true, false, false, true))
  }

  test("cleanName strips punct, collapses whitespace, lowers (code/10:92-98)") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row("  Save the   Children (UK)!! ")).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("s STRING"))
    assert(df.select(TextFns.cleanName(col("s"))).collect()(0).getString(0)
      == "save the children uk")
  }

  test("token counts: whitespace vs bpe-ish") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row("hello world, 42 times!")).asJava,
      org.apache.spark.sql.types.StructType.fromDDL("s STRING"))
    val r = df.select(
      TextFns.wsTokenCount(col("s")),
      TextFns.bpeishTokenCount(col("s"))).collect()(0)
    assert(r.getInt(0) == 4)
    // hello, world, ',', 4, 2, times, '!' = 7
    assert(r.getInt(1) == 7)
  }

  test("cascade branches are mutually exclusive and exhaustive (C3 shape)") {
    // Every lineitem row lands in exactly one branch of the q24 waterfall.
    val li = graft.sources.Tables.lineitem(spark, sf)
    val branches = Seq(
      col("l_returnflag") === "R",
      col("l_returnflag") =!= "R" && col("l_discount") >= 0.08,
      col("l_returnflag") =!= "R" && col("l_discount") < 0.08 && col("l_tax") >= 0.06,
      col("l_returnflag") =!= "R" && col("l_discount") < 0.08 && col("l_tax") < 0.06)
    val counts = li.select(branches.zipWithIndex.map { case (b, i) =>
      sum(b.cast("int")).as(s"b$i") }: _*).collect()(0)
    val total = li.count()
    assert((0 until 4).map(counts.getLong).sum == total)
  }
}
