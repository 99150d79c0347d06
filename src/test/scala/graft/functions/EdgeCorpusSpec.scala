package graft.functions

import graft.SparkSpec
import graft.dedup.TextDedup
import org.apache.spark.sql.functions._

/** Every text kernel and composition evaluated over a corpus of edge-case
  * documents — empty, whitespace-only, single-char, shorter than any
  * gram/window size, tabs, non-BMP. Under Spark 4's default ANSI mode a
  * mis-indexed element_at or a 0/0 division is a hard error, and the
  * production corpus never exercises these shapes (min ~10 tokens), so
  * this spec is where short-input regressions surface first (the
  * unguarded wordGrams indexing bug class).
  */
class EdgeCorpusSpec extends SparkSpec {

  private lazy val edge = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val texts = Seq("", " ", "\t", "a", "ab", "a b", "  a  ", "x" * 7,
      "😀", "😀 😀", "word")
    spark.createDataFrame(
      java.util.Arrays.asList(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }: _*),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  test("text kernels evaluate over edge documents without error") {
    val out = edge.select(
      col("doc_id"),
      TextFns.fingerprint(col("text")).as("fp"),
      TextFns.winnowFingerprints(col("text"), 8, 4).as("winnow"),
      TextHash.min_gram_md5(col("text"), 8).as("minhash"),
      TextHash.simhash_md5(col("text"), 60).as("simhash"),
      TextHash.minhash_bands(col("text"), 8, 8).as("bands"),
      TextDedup.wordGrams(col("text"), 3).as("grams3"),
      TextFns.wsTokenCount(col("text")).as("ws"),
      TextFns.bpeishTokenCount(col("text")).as("bpeish"),
      TextFns.langId(col("text")).as("lang"),
      TextFns.qualityScore(col("text"), Seq("the", "a")).as("quality"))
      .collect()
    assert(out.length == 11)
    out.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3) && !r.isNullAt(4))
      assert(r.getSeq[Long](6) != null) // grams3 present (possibly empty)
      assert(r.getSeq[Long](5).length == 8) // one min per band, even for ""
    }
  }

  test("dedup compositions survive an edge corpus end-to-end") {
    // exact dedup: " " and "\t" normalize to the same fingerprint as ""
    val deduped = TextDedup.exactDedup(edge, "text", "doc_id")
    assert(deduped.count() > 0 && deduped.count() < 11)
    // minhash bands → candidate pairs → evaluates cleanly (the edge
    // texts are all distinct as raw strings, so zero pairs is valid)
    val pairs = TextDedup.lshCandidatePairs(
      TextDedup.minHashBands(edge, "text", 8, 4), "doc_id")
    assert(pairs.count() >= 0)
    // simhash near-dup + components
    val sig = edge.select(col("doc_id"), TextDedup.simHashN(col("text"), 60).as("sig"))
    val nd = TextDedup.simHashNearDup(sig, "doc_id", "sig", 3)
    graft.dedup.Components.connectedComponents(nd, "id_a", "id_b").collect()
  }
}
