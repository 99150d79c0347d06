package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.{DataFrame, Row}
import java.nio.file.Files

/** Hand-computable micro-corpora for the corpus-planning additions
  * (q174 survivor selection, q175 hybrid RRF, q176 token-budget mix,
  * q177 contamination fraction). The sf-scale oracle checks prove the
  * two engines agree; these pin that what they agree ON is the intended
  * semantics — the boundaries (zero-kept source, one-armed fusion,
  * gramless doc) and the tie/preference rules, on inputs small enough
  * to verify by hand. */
class CorpusPlanningSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  /** Writes a documents.parquet (and optionally embeddings.parquet)
    * micro-corpus and returns the dir. */
  private def corpus(docs: Seq[(Long, String, String, String)],
      embs: Seq[(Long, Seq[Float], Int)] = Nil): String = {
    val dir = Files.createTempDirectory("graft_planning_spec_").toString
    docs.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    if (embs.nonEmpty)
      embs.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q174: higher-quality copy survives its cluster; equal quality breaks to min id") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val spaced = (1 to 30).map(i => s"tok$i").mkString("  ") // same tokens ⇒ same simhash;
                                                             // longer raw text ⇒ higher quality
    val twin = (1 to 30).map(i => s"other$i").mkString(" ")
    val dir = corpus(Seq(
      (1L, base, "en", "src0"), (2L, spaced, "en", "src0"),
      (3L, "a lone unrelated document about nothing shared", "en", "src0"),
      (4L, twin, "en", "src0"), (5L, twin, "en", "src0")))
    val out = q("q174_dedup_quality_survivor", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // {1,2}: doc 2's doubled spacing is the same token stream (identical
    // simhash, hamming 0) but a longer raw text ⇒ higher length score ⇒
    // quality-preferred survivor DESPITE the larger id
    assert(out(1L) == ((2L, 2L)), s"cluster 1 must pick the higher-quality copy, got $out")
    // {4,5}: byte-identical ⇒ equal quality ⇒ min-id tiebreak
    assert(out(4L) == ((4L, 2L)))
    // 3: singleton is its own survivor
    assert(out(3L) == ((3L, 1L)))
    // components partition the corpus: member counts sum to corpus size
    assert(out.values.map(_._2).sum == 5L)
  }

  test("q175: rrf is exactly the reciprocal-rank sum, one-armed docs included") {
    // embeddings: probe vec 0 = e1; vec 1 aligned (cos 1), vec 2
    // orthogonal (cos 0), vec 3 diagonal (~0.707); vec 2/3 have no text
    // terms, doc 9 has terms but NO embedding row ⇒ both one-armed paths
    val e = (x: Float, y: Float) => Seq(x, y, 0f, 0f)
    val dir = corpus(
      docs = Seq(
        (1L, "dup spark merge dup", "en", "src0"),
        (2L, "filler text with no query terms at all", "en", "src0"),
        (3L, "more filler so the corpus stats are sane", "en", "src0"),
        (9L, "spark merge spark merge", "en", "src0")),
      embs = Seq(
        (0L, e(1f, 0f), 0), (1L, e(1f, 0f), 0),
        (2L, e(0f, 1f), 0), (3L, e(0.5f, 0.5f), 0)))
    val rows = q("q175_hybrid_rrf", dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(!byId.contains(0L), "the probe doc must not retrieve itself")
    def rankTerm(r: Row, i: Int): Double =
      if (r.isNullAt(i)) 0.0 else 1.0 / (60 + r.getInt(i))
    rows.foreach { r =>
      val expect = BigDecimal(rankTerm(r, 1) + rankTerm(r, 2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expect, s"rrf must be the reciprocal-rank sum: $r")
    }
    // doc 1 is in BOTH lists (has terms and the aligned vector) — it must
    // outrank every one-armed doc
    assert(rows.minBy(_.getInt(4)).getLong(0) == 1L)
    // one-armed rows surface with the missing rank NULL, not dropped
    assert(byId(9L).isNullAt(2), "doc 9 has no embedding ⇒ sem_rank NULL")
    assert(byId(2L).isNullAt(1), "vec 2's doc has no terms ⇒ lex_rank NULL")
    // rnk is a clean 1..n permutation ordered by rrf desc
    val byRnk = rows.sortBy(_.getInt(4))
    assert(byRnk.map(_.getInt(4)).toSeq == (1 to rows.length).toSeq)
    assert(byRnk.map(_.getDouble(3)).toSeq == byRnk.map(_.getDouble(3)).sortBy(-(_: Double)).toSeq)
  }

  test("q176: budgets split floor(total/2) by weight; greedy prefix stops at the budget") {
    // all texts are 10 'the' tokens ⇒ equal quality, rank = doc_id;
    // src0 (w=1) two docs, src2 (w=3) four docs; total tokens 60 ⇒
    // budget_total 30, src0 floor(30·1/4)=7 ⇒ ZERO kept (first doc is
    // already 10 > 7), src2 floor(30·3/4)=22 ⇒ exactly two of four kept
    val ten = Seq.fill(10)("the").mkString(" ")
    val dir = corpus(Seq(
      (1L, ten, "en", "src0"), (2L, ten, "en", "src0"),
      (3L, ten, "en", "src2"), (4L, ten, "en", "src2"),
      (5L, ten, "en", "src2"), (6L, ten, "en", "src2")))
    val out = q("q176_token_budget_mix", dir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == Map(
      "src0" -> ((1, 7L, 0L, 0L)),   // over-budget source: present with zero kept
      "src2" -> ((3, 22L, 2L, 20L))), s"got $out")
  }

  test("q177: frac = hits/grams on the kept side only; gramless docs keep frac 0") {
    val dir = corpus(Seq(
      (0L, "aa bb cc dd ee", "en", "src0"),          // eval doc (0 % 97 == 0)
      (1L, "aa bb cc xx yy zz", "en", "src0"),       // 1 of 4 grams hits ⇒ 0.25, flagged
      (2L, "nn oo pp qq rr", "en", "src0"),          // 0 of 3 ⇒ 0.0
      (3L, "hi", "en", "src0")))                     // < 3 tokens ⇒ no grams
    val out = q("q177_contamination_fraction", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(!out.contains(0L), "eval docs are the probe, never scored")
    assert(out(1L) == ((4L, 1L, 0.25, true)), s"got $out")
    assert(out(2L) == ((3L, 0L, 0.0, false)))
    assert(out(3L) == ((0L, 0L, 0.0, false)))
  }

  test("q178: band votes grade exact copy > edited copy > unrelated; flag at ≥2") {
    // md5 shingles are engine-stable, so these collision counts are
    // pinned constants: the exact copy collides in all 4 bands, the
    // suffix-edited copy keeps 3 (one band's min shingle lands in the
    // appended text), the unrelated doc none
    val T = "the quick brown fox jumps over the lazy dog while the cat naps " +
      "by the fire and the day is long"
    val dir = corpus(Seq(
      (0L, T, "en", "src0"),                                               // eval probe
      (1L, T, "en", "src0"),                                               // exact leak
      (2L, "completely unrelated content about databases and distributed systems engineering", "en", "src0"),
      (3L, T + " with some extra trailing words appended here", "en", "src0"))) // edited leak
    val out = q("q178_fuzzy_decontam", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(1L -> ((4L, true)), 2L -> ((0L, false)), 3L -> ((3L, true))),
      s"got $out")
  }

  test("q179: MMR picks the diverse candidate over the exact duplicate") {
    // probe e0 = x-axis; vec 1 most relevant, vec 2 its EXACT duplicate,
    // vec 3 slightly less relevant but angularly distinct, vec 4
    // irrelevant. Pure top-3 by relevance would be (1, 2, 3); MMR's
    // redundancy penalty (λ = 0.7) must demote the duplicate: step 2
    // picks vec 3 (0.7·0.90 − 0.3·0.74 ≈ 0.407 beats the duplicate's
    // 0.7·0.96 − 0.3·1.0 = 0.372), and the duplicate only enters at
    // step 3 once the diverse mass is exhausted.
    val dir = corpus(
      docs = Seq((1L, "filler so the documents table exists", "en", "src0")),
      embs = Seq(
        (0L, Seq(1f, 0f, 0f, 0f), 0),
        (1L, Seq(0.96f, 0.28f, 0f, 0f), 0),
        (2L, Seq(0.96f, 0.28f, 0f, 0f), 0),
        (3L, Seq(0.9f, -0.436f, 0f, 0f), 0),
        (4L, Seq(0f, 0f, 1f, 0f), 0)))
    val out = q("q179_mmr_rerank", dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 1L, 2 -> 3L, 3 -> 2L), s"got $out")
  }

  test("q180: LPT round-robin deals the token-desc order; balance bounded by one doc") {
    // nine docs with distinct token counts 9..1: ranks are exact, the
    // deal wraps after shard 7, and shard 0 gets rank 1 (9 tokens) plus
    // rank 9 (1 token)
    val dir = corpus((1L to 9L).map(i =>
      (i, Seq.fill(10 - i.toInt)("the").mkString(" "), "en", "src0")))
    val rows = q("q180_balanced_shards", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val shardOf = rows.map(r => r._1 -> r._3).toMap
    assert(shardOf == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4,
      6L -> 5, 7L -> 6, 8L -> 7, 9L -> 0), s"got $shardOf")
    val totals = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    assert(totals(0) == 10L) // 9 + 1: the wrap-around lands on the lightest shard
  }
}
