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
}
