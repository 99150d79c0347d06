package graft.queries

import graft.QueryDef
import graft.multimodal.MediaColumns
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing under the oracle gate: documents stand in
  * for a media table (content = UTF-8 bytes, JSON metadata sidecar), and
  * the stub decoder (MediaColumns.fakeDecode: md5-derived features) is
  * reproducible in ANSI SQL — so the partition-wise decode path, the
  * binary schema, and the frame-sampling generator are all hash-checked,
  * not just unit-tested. Swapping the stub for a real codec changes no
  * plan shape (SURVEY-prompt multimodal contract).
  */
object MultimodalQueries {

  /** documents → media frame: binary content + JSON sidecar. */
  private def mediaFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("content"),
      concat(lit("{\"width\": "), (col("n_chars") % 640).cast("string"),
        lit(", \"height\": "), ((col("n_chars") * 7) % 480).cast("string"),
        lit("}")).as("meta"))

  val defs: Seq[QueryDef] = Seq(

    // Partition-wise feature extraction over binary media columns
    // (mapPartitions batching — the Scala shape of mapInPandas). f0_byte
    // recovers the first stub-feature's source byte so the decode path is
    // value-checked end-to-end.
    QueryDef("q62_media_features", Seq("S14"),
      """WITH media AS (
           SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS media_type,
             text, n_chars FROM documents)
         SELECT media_id, media_type,
           CAST(coalesce(strlen(text), 0) AS INT) AS n_bytes,
           CAST(n_chars % 640 AS INT) AS width,
           CAST((n_chars * 7) % 480 AS INT) AS height,
           CASE WHEN coalesce(strlen(text), 0) = 0 THEN NULL
                ELSE ('0x' || substring(md5(text), 1, 2))::INT END AS f0_byte
         FROM media""") { (s, d) =>
      MediaColumns.extractFeatures(mediaFrame(s, d), 16)
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"),
          (element_at(col("features"), 1) * 128 + 128).cast("int").as("f0_byte"))
    },

    // Frame sampling for video rows: one output row per sampled byte
    // offset — a generator (no shuffle), each frame fingerprinted by the
    // stub decode.
    QueryDef("q63_frame_sample", Seq("U6", "S14"),
      """WITH media AS (
           SELECT doc_id AS media_id, text FROM documents
           WHERE CAST(doc_id % 3 AS INT) = 2 AND coalesce(strlen(text), 0) > 0),
         offs AS (
           SELECT media_id, text,
             unnest(generate_series(0, CAST(strlen(text) AS BIGINT) - 1, 64)) AS frame_offset
           FROM media)
         SELECT media_id, CAST(frame_offset AS INT) AS frame_offset,
           md5(text || CAST(frame_offset AS VARCHAR)) AS frame_fp
         FROM offs""") { (s, d) =>
      MediaColumns.sampleFrames(mediaFrame(s, d), 64)
    },

    // Perceptual near-duplicate media: dHash over the decoded feature
    // vector (bit i = features[i] > features[i+1] — with a real decoder
    // these are downsampled pixel intensities; the stub's md5 features
    // keep it oracle-reproducible), then the same 4×15-bit banded
    // Hamming join as text simhash — pigeonhole-exact at threshold 3,
    // never an all-pairs scan. The feature→order mapping is monotone
    // ((b-128)/128f is exact in float32), so byte comparisons in SQL
    // reproduce the float comparisons bit-for-bit.
    QueryDef("q98_media_neardup", Seq("S14", "A10"),
      """WITH media AS (
           SELECT doc_id AS media_id, text FROM documents WHERE coalesce(strlen(text), 0) > 0),
         bytes AS (
           SELECT media_id, [('0x' || substring(md5(text), 2*j+1, 2))::BIGINT FOR j IN generate_series(0, 15)] AS bs
           FROM media),
         sig AS (
           SELECT media_id, CAST(list_sum([CASE WHEN bs[(i%16)+1] > bs[((i+1)%16)+1] THEN 1::BIGINT << i ELSE 0::BIGINT END FOR i IN generate_series(0, 59)]) AS BIGINT) AS dhash
           FROM bytes)
         SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
         FROM sig a JOIN sig b ON a.media_id < b.media_id
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""") { (s, d) =>
      val feats = MediaColumns.extractFeatures(mediaFrame(s, d), 64)
        .filter(col("features").isNotNull)
      val dhash = (0 until 60).map { i =>
        when(element_at(col("features"), i + 1) > element_at(col("features"), i + 2),
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      graft.dedup.TextDedup.simHashNearDup(
        feats.select(col("media_id"), dhash.as("dhash")),
        "media_id", "dhash", maxHamming = 3)
    },
  )
}
