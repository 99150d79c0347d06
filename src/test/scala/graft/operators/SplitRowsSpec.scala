package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitRowsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def mk(rows: Seq[(java.lang.Long, String, java.lang.Double)]) = {
    val schema = "id BIGINT, loc STRING, amount DOUBLE"
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  test("splits rows and divides value evenly (code/02_fts_split_rows.R:8-21 semantics)") {
    val df = mk(Seq((1L: java.lang.Long, "Mali; Niger", 10.0: java.lang.Double)))
    val out = SplitRows.splitRows(df, "loc", Seq("amount")).collect()
    assert(out.map(_.getString(1)).toSet == Set("Mali", "Niger"))
    assert(out.forall(_.getDouble(2) == 5.0))
  }

  test("null split col keeps one row with value intact") {
    val df = mk(Seq((1L: java.lang.Long, null, 10.0: java.lang.Double)))
    val out = SplitRows.splitRows(df, "loc", Seq("amount")).collect()
    assert(out.length == 1 && out(0).isNullAt(1) && out(0).getDouble(2) == 10.0)
  }

  test("single token is a no-op with trim") {
    val df = mk(Seq((1L: java.lang.Long, "  Chad ", 7.5: java.lang.Double)))
    val out = SplitRows.splitRows(df, "loc", Seq("amount")).collect()
    assert(out.length == 1 && out(0).getString(1) == "Chad" && out(0).getDouble(2) == 7.5)
  }

  test("property: sum of value is preserved across splits (seeded trials)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val rows = (1 to 40).map { i =>
        val n = 1 + rnd.nextInt(5)
        val loc = if (rnd.nextInt(10) == 0) null
          else Seq.fill(n)(rnd.alphanumeric.take(4).mkString).mkString("; ")
        (i.toLong: java.lang.Long, loc, rnd.nextDouble() * 1e6: java.lang.Double)
      }
      val df = mk(rows)
      val before = rows.map(_._3.doubleValue).sum
      val after = SplitRows.splitRows(df, "loc", Seq("amount"))
        .agg(sum("amount")).collect()(0).getDouble(0)
      assert(math.abs(before - after) < 1e-6 * math.max(1.0, before))
    }
  }
}
