package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupJoinsSpec extends SparkSpec {

  test("prioritizedDedup keeps the preferred row per key (code/04:83-84 semantics)") {
    import spark.implicits._
    val df = Seq(
      (1L, "internal", "a"), (1L, "incoming", "b"),
      (2L, "internal", "c"),
      (3L, "incoming", "d"), (3L, "incoming", "e")).toDF("id", "boundary", "payload")
    val out = Dedup.firstRowPerGroup(df, Seq("id"),
      Seq((col("boundary") === "incoming").cast("int").desc, col("payload").asc))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "b", 2L -> "c", 3L -> "d"))
  }

  test("firstRowPerGroup is idempotent and key-unique") {
    import spark.implicits._
    val df = Seq((1, 5), (1, 3), (2, 9), (2, 1), (2, 1)).toDF("k", "v")
    val once = Dedup.firstRowPerGroup(df, Seq("k"), Seq(col("v").asc))
    val twice = Dedup.firstRowPerGroup(once, Seq("k"), Seq(col("v").asc))
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("firstRowPerGroupAgg matches the window variant on real data (incl. desc encoding)") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_linenumber", "l_partkey", "l_suppkey")
    val win = Dedup.firstRowPerGroup(li, Seq("l_orderkey"),
      Seq((col("l_returnflag") === "R").cast("int").desc,
        col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc))
    val agg = Dedup.firstRowPerGroupAgg(li, Seq("l_orderkey"),
      Seq(lit(1) - (col("l_returnflag") === "R").cast("int"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    assert(win.collect().toSet == agg.select(win.columns.map(col): _*).collect().toSet)
  }

  test("joinWithFallback patches nulls from the fallback side (J4 DAC idiom)") {
    import spark.implicits._
    val fact = Seq(("AFG", "2020", 10.0), ("XXX", "2020", 20.0)).toDF("iso", "year", "amt")
    val primary = Seq(("AFG", "2020", 1.1)).toDF("iso", "year", "deflator")
    val fallback = Seq(("2020", 2.2)).toDF("year", "deflator")
    val out = Joins.joinWithFallback(fact, primary, Seq("iso", "year"), fallback, Seq("year"), "deflator")
      .select("iso", "deflator")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("AFG" -> 1.1, "XXX" -> 2.2))
  }

  test("joinWithFallback preserves row multiplicity (SURVEY §4.3.6)") {
    import spark.implicits._
    val fact = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0)).toDF("k", "amt")
    val primary = Seq(("A", 10.0)).toDF("k", "v")
    val fallback = Seq(("A", 99.0), ("B", 20.0)).toDF("k", "v")
    val out = Joins.joinWithFallback(fact, primary, Seq("k"), fallback, Seq("k"), "v")
    assert(out.count() == 3)
  }

  test("proxyRelabelUnion copies source rows under target labels (R3, code/03:131-147)") {
    import spark.implicits._
    val df = Seq(("GBR", 1.0), ("FRA", 2.0), ("AIA", 99.0)).toDF("iso", "defl")
    val out = Reshape.proxyRelabelUnion(df, "iso", Map("AIA" -> "GBR", "MSR" -> "GBR", "WLF" -> "FRA"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("GBR" -> 1.0, "FRA" -> 2.0, "AIA" -> 1.0, "MSR" -> 1.0, "WLF" -> 2.0))
  }

  test("melt produces long rows (R2)") {
    import spark.implicits._
    val df = Seq(("AFG", 1.0, 2.0)).toDF("iso", "y2020", "y2021")
    val out = Reshape.melt(df, Seq("iso"), Seq("y2020", "y2021"))
    assert(out.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet ==
      Set(("AFG", "y2020", 1.0), ("AFG", "y2021", 2.0)))
  }
}
