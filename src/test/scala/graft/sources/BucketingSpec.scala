package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    graft.PlanText.shuffles(df)

  test("bucketed staging joins with zero exchanges on either side") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.stageBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.stageBucketed(ord, "ord_bucketed", "l_orderkey", 8)
    // disable broadcast so the co-located sort-merge path is what's tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(spark, "li_bucketed")
        .join(Bucketing.readTable(spark, "ord_bucketed"), Seq("l_orderkey"))
      assert(shuffles(joined) == 0) // bucketing provides the partitioning
      val expected = li.join(ord, Seq("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned + bucketed staging: pruning by partition, joining by bucket") {
    // SURVEY §3.1's layout — partitionBy(year) for pruning, bucketBy(id)
    // for exchange-free joins — must deliver BOTH properties at once
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("id"),
        (lit(2021) + col("o_orderkey") % 3).cast("int").as("year"),
        col("o_totalprice"))
    Bucketing.stageBucketed(ord, "ord_year_bucketed", "id", 8,
      partitionCol = Some("year"))
    // year directories exist on disk (the layout, not just the rows)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").replace("file:", ""),
      "ord_year_bucketed")
    assert(Seq(2021, 2022, 2023).forall(y => new java.io.File(loc, s"year=$y").exists))
    val staged = Bucketing.readTable(spark, "ord_year_bucketed")
    // partition pruning: a year filter reaches the scan as PartitionFilters
    val pruned = staged.filter(col("year") === 2022)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(year"))
    assert(pruned.count() == ord.filter(col("year") === 2022).count())
    // bucketing still provides hashpartitioning(id) across the year dirs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val other = Tables.orders(spark, sf)
        .select(col("o_orderkey").as("id"), col("o_custkey"))
      Bucketing.stageBucketed(other, "ord_keys_bucketed", "id", 8)
      val joined = staged.join(Bucketing.readTable(spark, "ord_keys_bucketed"), Seq("id"))
      assert(shuffles(joined) == 0)
      assert(joined.count() == ord.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
