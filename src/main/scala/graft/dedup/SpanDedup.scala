package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.plans.BoundedTopK

/** Cross-document duplicated-SPAN detection — the "exact substring
  * dedup" method (find every >= k-token span that also appears in some
  * OTHER document, and merge overlapping hits into maximal per-doc
  * spans), as opposed to [[graft.queries.PipelineQueries]] q84's
  * C4-style dedup of fixed non-overlapping chunks: the sliding shingle
  * catches duplicated passages at ANY alignment, and the island merge
  * reports them as whole spans a curation pass can cut. Complements the
  * reference's row-level `unique`/`distinct` surface
  * (cva_fts_curated.R:70-83) with the sub-document dedup a training-data
  * pipeline runs before packing.
  *
  * Scale shape (two shuffles total, everything else row-local):
  *  1. shingle: each doc emits (position, md5 of its k-token window) —
  *     a generator over the scan, ~n_tokens rows per doc, fixed-width
  *     md5 keys on the wire (never the span text).
  *  2. shuffle 1 — groupBy(hash): a span is cross-doc duplicated iff
  *     min(doc_id) != max(doc_id) (map-side combinable; no
  *     count-distinct expansion). Occurrences ride along as a
  *     SIZE-CAPPED [[BoundedTopK]] list (first `maxOcc` by (doc_id, p))
  *     plus an exact count — the aggregation buffer can never exceed
  *     maxOcc rows per shingle, map-side partials included, so the one
  *     known hot key of this problem (a corpus-wide boilerplate shingle:
  *     license text, a chat template) cannot put millions of structs in
  *     a single reducer row. Shingles whose count overflows the cap are
  *     routed to the [[everywhereShingles]] channel instead of the span
  *     output: "this hash is everywhere — cut it unconditionally by
  *     hash match", which is both cheaper and the right curation
  *     decision for boilerplate. Memory is a product bound: one task
  *     holds at most fallbackThreshold groups × maxOcc rows (the same
  *     budget [[graft.plans.RewriteRankFilterToTopK]] enforces for the
  *     auto-rewrite), and only shingles at the cap — rare by
  *     construction — pay the full maxOcc.
  *  3. shuffle 2 — groupBy(doc_id): sort the (few) duplicated positions
  *     per doc and fold them row-locally into maximal spans — two fixed-
  *     length windows [p,p+k-1], [q,q+k-1] (p<=q) merge iff q <= p+k.
  *     No window function, no per-doc sort at the exchange: the sort is
  *     inside array_sort over a per-doc array bounded by token count.
  */
object SpanDedup {

  /** Default occurrence cap. Measured headroom: the synthetic corpus at
    * sf0.1 tops out at 4 occurrences per 20-token shingle, and a real
    * boilerplate shingle blows far past any sane cap anyway — the cap
    * only needs to separate "merge these positions" from "everywhere". */
  val DefaultMaxOcc = 1000

  /** Bounded occurrence list: first `maxOcc` (doc_id, p) pairs per
    * shingle, ascending — the aggregation form of
    * `slice(array_sort(collect_list(...)), 1, maxOcc)` but with an
    * O(maxOcc) buffer instead of an unbounded one. */
  private def cappedOcc(maxOcc: Int): Column = {
    val child = GraftColumnBridge.expression(struct(col("doc_id"), col("p")))
    val keys = Seq(GraftColumnBridge.expression(col("doc_id")),
      GraftColumnBridge.expression(col("p")))
    GraftColumnBridge.column(
      BoundedTopK(child, keys, maxOcc, Seq(0, 1), Seq((true, true), (true, true)))
        .toAggregateExpression())
  }

  /** (doc_id, p, h): every k-token window of every doc, keyed by md5. */
  private def shingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), """\s+""").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
              p -> named_struct('p', CAST(p AS BIGINT),
                                'h', md5(array_join(slice(toks, p, $k), ' '))))""")).as("sh"))
      .select(col("doc_id"), col("sh.p").as("p"), col("sh.h").as("h"))

  /** Per cross-doc-duplicated shingle: exact occurrence count and the
    * capped occurrence list (complete iff n_occ <= maxOcc). */
  private def dupShingleAgg(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxOcc: Int): DataFrame = {
    require(k >= 2, s"span width must be >= 2 tokens, got $k")
    require(maxOcc >= 2, s"occurrence cap must be >= 2, got $maxOcc")
    // the >= k guard also keeps sequence() off its descending-on-empty form
    shingles(docs, idCol, textCol, k)
      .groupBy("h")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"),
        count(lit(1)).as("n_occ"), cappedOcc(maxOcc).as("occ"))
      .filter(col("d0") =!= col("d1"))
  }

  /** Rows (doc_id, span_start, span_end, span_tokens): maximal merged
    * spans (1-based token positions, inclusive) of `textCol` that appear
    * verbatim in at least one OTHER document. Docs with no cross-doc
    * duplicated k-shingle produce no row. Within-doc repeats alone do
    * NOT flag a span (min/max doc-id test) — self-repetition is q71's
    * business, not dedup's.
    *
    * Shingles with more than `maxOcc` occurrences corpus-wide are
    * EXCLUDED here and surfaced by [[everywhereShingles]] — a consumer
    * cuts those by hash match over the doc's own windows (row-local, no
    * shuffle), not by position list. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int,
      maxOcc: Int = DefaultMaxOcc): DataFrame = {
    val dupPos = dupShingleAgg(docs, idCol, textCol, k, maxOcc)
      .filter(col("n_occ") <= maxOcc)
      .select(explode(col("occ")).as("o"))
      .select(col("o.doc_id").as("doc_id"), col("o.p").as("p"))
    dupPos.groupBy("doc_id")
      .agg(array_sort(collect_list(col("p"))).as("ps"))
      .select(col("doc_id"), explode(expr(
        s"""aggregate(ps,
              named_struct('spans', CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT>>),
                           'cs', CAST(-1 AS BIGINT), 'ce', CAST(-1 AS BIGINT)),
              (acc, p) -> CASE
                WHEN acc.cs < 0 THEN
                  named_struct('spans', acc.spans, 'cs', p, 'ce', p + ${k - 1})
                WHEN p <= acc.ce + 1 THEN
                  named_struct('spans', acc.spans, 'cs', acc.cs, 'ce', p + ${k - 1})
                ELSE named_struct(
                  'spans', array_append(acc.spans, named_struct('s', acc.cs, 'e', acc.ce)),
                  'cs', p, 'ce', p + ${k - 1}) END,
              acc -> array_append(acc.spans, named_struct('s', acc.cs, 'e', acc.ce)))"""))
        .as("sp"))
      .select(col("doc_id"), col("sp.s").as("span_start"), col("sp.e").as("span_end"),
        (col("sp.e") - col("sp.s") + lit(1L)).as("span_tokens"))
  }

  /** Rows (h, n_occ): cross-doc duplicated k-shingles whose occurrence
    * count exceeds `maxOcc` — corpus-wide boilerplate. The contract for
    * consumers is "cut unconditionally": re-shingle each doc row-locally
    * and drop any window whose md5 is in this (tiny, broadcastable) set,
    * instead of enumerating the millions of positions a hot shingle
    * would otherwise push through one reducer row. */
  def everywhereShingles(docs: DataFrame, idCol: String, textCol: String, k: Int,
      maxOcc: Int = DefaultMaxOcc): DataFrame =
    dupShingleAgg(docs, idCol, textCol, k, maxOcc)
      .filter(col("n_occ") > maxOcc)
      .select(col("h"), col("n_occ"))
}
