package graft.streaming

import graft.functions.TextHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-state production shape of the streaming incremental near-dup
  * (the q118 pattern; batch twin: TextDedup.incrementalDupFlags,
  * reference semantics `code/3. Projects module.R`'s dedup-against-history
  * discipline re-expressed for an arriving stream).
  *
  * Shape, per micro-batch:
  *   - band expansion is STATELESS on the stream (one native md5 kernel
  *     per doc, rows = bands per doc);
  *   - the history LSH index is the STATIC side of a stream-static
  *     left-semi join — broadcast under the threshold, hash-joined above
  *     it; history itself is never reshuffled by the stream;
  *   - the only stateful operator is the per-doc hit count, keyed by
  *     (arrival window, doc_id) UNDER A WATERMARK: a doc's verdict state
  *     lives exactly until the watermark passes its arrival window, then
  *     the state store drops it. Update output mode emits each verdict as
  *     its count changes and never re-emits settled groups — so neither
  *     the store nor the sink scales with stream history, only with
  *     keys-per-watermark-horizon.
  *
  * md5_band_sigs emits exactly one row per (doc, band), so `count(1)` IS
  * the distinct-band count — no streaming count-distinct needed. A doc's
  * band rows all derive from one input row and therefore one micro-batch,
  * so each (window, doc) group settles within the batch it arrives in.
  *
  * StreamingStateSpec drives this across micro-batches and asserts
  * `stateOperators.numRowsTotal` stays bounded (evicted rows > 0, final
  * state ≪ docs seen) while the emitted verdicts match the batch twin.
  */
object NearDupStream {

  /** Per-doc near-dup verdicts for an arriving doc stream against a
    * static history index.
    *
    * @param docs     streaming frame with (doc_id, text, `arrivalCol`:
    *                 timestamp) — arrival/event time, NOT content time
    * @param index    static distinct (b, sig) history index
    *                 (TextDedup.md5BandSigs(history).select("b","sig").distinct)
    * @param shingle  character shingle width (batch twin uses 8)
    * @param bands    LSH band count (batch twin uses 4)
    * @param delay    watermark delay: how late a doc may arrive and still
    *                 be verdicted; also the state horizon
    * @param windowLen arrival-window length the verdict state is keyed to
    * @return streaming (doc_id, hit_bands) — docs with ≥1 matching band;
    *         zero-hit docs are absent (patch with a batch left join, as
    *         q118 does)
    */
  def verdicts(docs: DataFrame, index: DataFrame, shingle: Int, bands: Int,
      arrivalCol: String = "arrival", delay: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    docs
      .withWatermark(arrivalCol, delay)
      .select(col(arrivalCol), col("doc_id"),
        posexplode(TextHash.md5_band_sigs(col("text"), shingle, bands))
          .as(Seq("b", "sig")))
      .join(index, Seq("b", "sig"), "leftsemi")
      .groupBy(window(col(arrivalCol), windowLen), col("doc_id"))
      .agg(count(lit(1)).as("hit_bands"))
      .select(col("doc_id"), col("hit_bands"))
}
