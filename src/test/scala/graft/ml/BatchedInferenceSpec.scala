package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BatchedInferenceSpec extends SparkSpec {

  test("rows reach the scorer in full batches of batchSize (last batch ragged)") {
    import spark.implicits._
    // 1 partition × 10 rows, batch 4 → the scorer must see 4, 4, 2 —
    // proven without shared state: each row's confidence reports the
    // size of the batch it rode in
    val d = (0 until 10).map(i => (i.toLong, s"text $i")).toDF("id", "text")
      .repartition(1)
    val sizes = BatchedInference
      .withPredictions(d, "text", batchSize = 4,
        scorer = texts => texts.map(_ => ("B", texts.size.toDouble)))
      .select("predicted_confidence").as[Double].collect().sorted
    assert(sizes.toSeq == Seq(2.0, 2.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.0))
  }

  test("input columns pass through untouched and nulls score as empty text") {
    import spark.implicits._
    val d = Seq((1L, "alpha", 7), (2L, null.asInstanceOf[String], 9))
      .toDF("id", "text", "extra")
    val got = BatchedInference.withPredictions(d, "text")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).sortBy(_._1)
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 7), (2L, 9)))
    // the null row scored (as ""), not dropped
    val emptyScore = BatchedInference.stubScorer(Seq("")).head
    assert(got(1)._3 == emptyScore._1)
  }

  test("stub forward pass matches the SQL replay md5 arithmetic") {
    // t = first 24 bits of md5 mod 1000; class thresholds at 500/800
    val texts = Seq("hello world", "cash transfer support abc", "x")
    texts.zip(BatchedInference.stubScorer(texts)).foreach { case (t, (cls, conf)) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString
      val tt = java.lang.Long.parseLong(hex, 16) % 1000
      assert(conf == tt / 1000.0)
      assert(cls == (if (tt >= 800) "Full" else if (tt >= 500) "Partial" else "None"))
    }
  }

  test("a scorer that loses rows fails loudly instead of misaligning") {
    import spark.implicits._
    val d = (0 until 4).map(i => (i.toLong, s"t$i")).toDF("id", "text").repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      BatchedInference.withPredictions(d, "text", batchSize = 4,
        scorer = texts => texts.drop(1).map(_ => ("None", 0.0))).collect()
    }
    assert(e.getMessage.contains("scorer returned") ||
      Option(e.getCause).exists(_.getMessage.contains("scorer returned")))
  }
}
