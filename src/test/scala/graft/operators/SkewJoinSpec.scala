package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join (multiplicity + values) on skewed data") {
    // one hot key with 1000 rows, a long tail of singletons
    val large = ((1 to 1000).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 25).map(i => s"k$i")).map(k => (k, s"dim_$k"))
      .toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(large, small, Seq("k"), saltBuckets = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin left join keeps unmatched rows exactly once") {
    val large = Seq(("a", 1), ("b", 2), ("b", 3)).toDF("k", "v")
    val small = Seq(("a", "A")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(large, small, Seq("k"), 4, "left")
    assert(out.count() == 3)
    assert(out.filter(col("name").isNull).count() == 2)
  }

  test("salt spreads a hot key across buckets") {
    val large = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(8)).cast("int"))
    val buckets = salted.select("__salt").distinct().count()
    assert(buckets > 4) // 1000 distinct rows land in most of 8 buckets
  }
}
