package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFnsSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key tests positive") {
    val keys = (0 until 2000).map(i => s"key_$i").toDF("k")
    val pred = BloomFns.mightContain(keys, "k", col("k"), expectedItems = 2000L)
    assert(keys.filter(pred).count() == 2000)
  }

  test("false-positive rate is near the configured fpp") {
    val keys = (0 until 5000).map(i => s"in_$i").toDF("k")
    val outside = (0 until 20000).map(i => s"out_$i").toDF("k")
    val pred = BloomFns.mightContain(keys, "k", col("k"),
      expectedItems = 5000L, fpp = 0.01)
    val fp = outside.filter(pred).count()
    assert(fp < 20000 * 0.05, s"false-positive count $fp far above 1% target")
  }

  test("bloom prefilter + exact confirm equals the exact anti join") {
    val corpus = (0 until 3000).map(i => (i.toLong, s"fp_${i % 700}")).toDF("id", "fp")
    val probe = (0 until 100).map(i => s"fp_${i * 7}").toDF("fp").distinct()
    val pred = BloomFns.mightContain(probe, "fp", col("fp"), 1000L)
    val contaminated = corpus.filter(pred).join(broadcast(probe), Seq("fp"), "leftsemi")
      .select("id", "fp")
    val kept = corpus.exceptAll(contaminated)
    val oracle = corpus.join(probe, Seq("fp"), "leftanti").select("id", "fp")
    assert(kept.count() == oracle.count())
    assert(kept.exceptAll(oracle).count() == 0)
  }

  test("the predicate is a codegen-able expression, not a UDF") {
    val keys = Seq("a", "b").toDF("k")
    val pred = BloomFns.mightContain(keys, "k", col("k"), 10L)
    val expr = org.apache.spark.sql.GraftColumnBridge.expression(pred)
    assert(expr.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])
  }
}
