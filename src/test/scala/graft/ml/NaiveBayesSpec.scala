package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {

  private def docs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("lang", "text").withColumn("doc_id", monotonically_increasing_id())
  }

  test("disjoint vocabularies classify training docs perfectly") {
    val d = docs(
      "aa" -> "alpha beta alpha", "aa" -> "beta gamma",
      "bb" -> "delta epsilon", "bb" -> "epsilon epsilon zeta")
    val m = NaiveBayes.fit(d, "lang", "text")
    assert(m.classes == Seq("aa", "bb"))
    val (pred, _) = NaiveBayes.predict(col("text"), m)
    val got = d.select(col("lang"), pred.as("p")).collect()
    assert(got.forall(r => r.getString(0) == r.getString(1)))
  }

  test("weights match a hand replay of add-one smoothing in micro-log units") {
    // class aa: 2 docs, tokens {alpha:2, beta:1}  T=3
    // class bb: 1 doc,  tokens {beta:1, gamma:1}  T=2; V=3 global
    val d = docs("aa" -> "alpha beta alpha", "aa" -> "", "bb" -> "beta gamma")
    val m = NaiveBayes.fit(d, "lang", "text")
    def micro(x: Double): Long = math.floor(x * 1e6).toLong
    assert(m.prior("aa") == micro(math.log(2.0 / 3)))
    assert(m.prior("bb") == micro(math.log(1.0 / 3)))
    assert(m.loglik("aa")("alpha") == micro(math.log(3.0 / 6)))
    assert(m.loglik("aa")("beta") == micro(math.log(2.0 / 6)))
    assert(m.loglik("bb")("gamma") == micro(math.log(2.0 / 5)))
    assert(m.unseen("aa") == micro(math.log(1.0 / 6)))
    assert(m.unseen("bb") == micro(math.log(1.0 / 5)))
    // empty text scores prior-only; unseen tokens take the smoothed floor
    val score = NaiveBayes.score(col("text"), m, "aa")
    val byId = d.select(col("doc_id"), col("text"), score.as("s")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byId("") == m.prior("aa"))
    assert(byId("beta gamma") ==
      m.prior("aa") + m.loglik("aa")("beta") + m.unseen("aa"))
  }

  test("fit refuses an unbounded-vocabulary column instead of collecting it") {
    val d = docs("aa" -> "alpha beta gamma delta", "bb" -> "epsilon zeta")
    val e = intercept[IllegalArgumentException] {
      NaiveBayes.fit(d, "lang", "text", maxModelRows = 3L)
    }
    assert(e.getMessage.contains("vocabulary is not bounded"))
  }

  test("a document carrying the literal marker token cannot skew priors") {
    // whitespace splitting does NOT drop NUL bytes, so without the
    // tokens() strip this doc would count as TWO documents in class aa
    val marker = 0.toChar.toString + "doc" // == the private DocMarker
    val d = docs(
      "aa" -> s"alpha $marker beta", "aa" -> "beta gamma",
      "bb" -> "delta epsilon")
    val clean = docs(
      "aa" -> "alpha beta", "aa" -> "beta gamma",
      "bb" -> "delta epsilon")
    val m = NaiveBayes.fit(d, "lang", "text")
    val mc = NaiveBayes.fit(clean, "lang", "text")
    assert(m.prior == mc.prior && m.loglik == mc.loglik && m.unseen == mc.unseen)
    // scoring side: the marker token contributes no evidence either
    val s = docs("zz" -> s"beta $marker").select(
      NaiveBayes.score(col("text"), m, "aa").as("s")).collect().head.getLong(0)
    assert(s == m.prior("aa") + m.loglik("aa")("beta"))
  }

  test("scoring refuses a model too large to embed as plan literals") {
    val big = NaiveBayes.Model(
      classes = Seq("aa"),
      prior = Map("aa" -> -1L),
      loglik = Map("aa" -> (0 until 100001).map(i => s"w$i" -> -1L).toMap),
      unseen = Map("aa" -> -2L))
    val e = intercept[IllegalArgumentException] {
      NaiveBayes.score(col("text"), big, "aa")
    }
    assert(e.getMessage.contains("plan"))
  }

  test("exact score tie breaks to the alphabetically-first class") {
    // symmetric classes: equal doc counts, equal token totals, and the
    // scored doc holds only tokens unseen by both -> scores tie exactly
    val d = docs("aa" -> "alpha", "bb" -> "beta")
    val m = NaiveBayes.fit(d, "lang", "text")
    assert(m.prior("aa") == m.prior("bb") && m.unseen("aa") == m.unseen("bb"))
    val probe = docs("zz" -> "omega omega")
    val (pred, sc) = NaiveBayes.predict(col("text"), m)
    val r = probe.select(pred.as("p"), sc.as("s")).collect().head
    assert(r.getString(0) == "aa")
    assert(r.getLong(1) == m.prior("aa") + 2 * m.unseen("aa"))
  }
}
