package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  *     collect_list bounded by the shingle's multiplicity — the data
  *     about to be cut, small by construction (a pathological
  *     corpus-wide boilerplate shingle is the known hot key; production
  *     would cap the list and treat the overflow as "everywhere").
  *  3. shuffle 2 — groupBy(doc_id): sort the (few) duplicated positions
  *     per doc and fold them row-locally into maximal spans — two fixed-
  *     length windows [p,p+k-1], [q,q+k-1] (p<=q) merge iff q <= p+k.
  *     No window function, no per-doc sort at the exchange: the sort is
  *     inside array_sort over a per-doc array bounded by token count.
  */
object SpanDedup {

  /** Rows (doc_id, span_start, span_end, span_tokens): maximal merged
    * spans (1-based token positions, inclusive) of `textCol` that appear
    * verbatim in at least one OTHER document. Docs with no cross-doc
    * duplicated k-shingle produce no row. Within-doc repeats alone do
    * NOT flag a span (min/max doc-id test) — self-repetition is q71's
    * business, not dedup's. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"span width must be >= 2 tokens, got $k")
    // the >= k guard also keeps sequence() off its descending-on-empty form
    val sh = docs
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"), split(trim(col(textCol)), """\s+""").as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(toks) - ${k - 1}),
              p -> named_struct('p', CAST(p AS BIGINT),
                                'h', md5(array_join(slice(toks, p, $k), ' '))))""")).as("sh"))
      .select(col("doc_id"), col("sh.p").as("p"), col("sh.h").as("h"))
    val dupPos = sh.groupBy("h")
      .agg(min("doc_id").as("d0"), max("doc_id").as("d1"),
        collect_list(struct(col("doc_id"), col("p"))).as("occ"))
      .filter(col("d0") =!= col("d1"))
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
}
