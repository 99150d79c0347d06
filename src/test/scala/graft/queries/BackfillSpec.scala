package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q161 backfill contract, pinned at FILE level: a dynamic
  * partition overwrite rewrites exactly the partitions present in the
  * incoming frame — the repaired day gets fresh files and fresh rows,
  * every untouched day keeps its files byte-for-byte (same names, same
  * sizes, same contents). Without `partitionOverwriteMode=dynamic` the
  * same write would TRUNCATE THE TABLE to the incoming partitions —
  * the failure mode this spec exists to keep impossible. */
class BackfillSpec extends SparkSpec {

  private def partFiles(root: String, day: Long): Map[String, Long] = {
    val dir = new java.io.File(root, s"day_num=$day")
    Option(dir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
  }

  test("dynamic overwrite repairs one day and leaves the others' files untouched") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_backfill_spec_").toString
    val base = Seq(
      ("click", 0L, 2L, 10.0), ("click", 1L, 3L, 30.0), ("click", 2L, 1L, 5.0),
      ("view", 0L, 5L, 2.5), ("view", 2L, 4L, 8.0))
      .toDF("event_type", "day_num", "n", "sum_value")
    base.write.partitionBy("day_num").mode("overwrite").parquet(root)
    val before0 = partFiles(root, 0)
    val before1 = partFiles(root, 1)
    val before2 = partFiles(root, 2)
    assert(before0.nonEmpty && before1.nonEmpty && before2.nonEmpty)

    val repair = Seq(("click", 1L, 7L, 77.0), ("view", 1L, 2L, 4.0))
      .toDF("event_type", "day_num", "n", "sum_value")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try repair.write.partitionBy("day_num").mode("overwrite").parquet(root)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // untouched days: identical file names AND sizes — never rewritten
    assert(partFiles(root, 0) == before0, "day 0 was rewritten by a day-1 backfill")
    assert(partFiles(root, 2) == before2, "day 2 was rewritten by a day-1 backfill")
    // repaired day: fresh files, fresh rows
    assert(partFiles(root, 1) != before1, "day 1 backfill wrote nothing")
    val served = spark.read.parquet(root)
      .select("event_type", "day_num", "n", "sum_value")
      .collect().map(_.mkString("|")).toSet
    val expect = Seq(
      ("click", 0L, 2L, 10.0), ("click", 1L, 7L, 77.0), ("click", 2L, 1L, 5.0),
      ("view", 0L, 5L, 2.5), ("view", 1L, 2L, 4.0), ("view", 2L, 4L, 8.0))
      .toDF("event_type", "day_num", "n", "sum_value")
      .collect().map(_.mkString("|")).toSet
    assert(served == expect)
  }

  test("static overwrite (the default) would truncate to the incoming partitions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_backfill_trunc_").toString
    Seq(("a", 0L, 1L, 1.0), ("a", 1L, 1L, 1.0))
      .toDF("event_type", "day_num", "n", "sum_value")
      .write.partitionBy("day_num").mode("overwrite").parquet(root)
    // deliberately NO dynamic mode: whole-table overwrite semantics
    Seq(("a", 1L, 9L, 9.0)).toDF("event_type", "day_num", "n", "sum_value")
      .write.partitionBy("day_num").mode("overwrite").parquet(root)
    assert(spark.read.parquet(root).count() == 1,
      "static overwrite kept other partitions — the dynamic-mode guard is dead code")
  }
}
