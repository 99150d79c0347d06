package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Batched model-inference boundary — the engine-native form of the
  * reference's Python process boundary
  * (`classifier_code/flow_inference.py:11-28`: tokenizer + forward pass
  * per example, then `dataset.map(inference)` adds `predicted_class` /
  * `predicted_confidence` fields to every row of the exported candidate
  * CSV). Here the candidate frame never leaves the engine:
  * `mapPartitions` walks each partition once, groups rows into
  * fixed-size batches, and hands each batch of texts to the model in
  * ONE call — the batch shape a real tokenizer + ONNX/Torch session
  * wants, amortizing per-call overhead exactly the way `mapInPandas`
  * batching does for Python models.
  *
  * The MODEL is stubbed (this container has no torch): per-text scores
  * derive deterministically from md5(text), so the boundary is
  * bit-replayable by the DuckDB oracle and a real session drops in by
  * passing a different `scorer` — the plan, batching, and schema do not
  * change (same pattern as
  * [[graft.multimodal.MediaColumns.extractFeatures]]'s fakeDecode).
  *
  * Scale shape: apply this to the CANDIDATE set (the reference exports
  * only `fts_to_inference.csv`, not the full flow table) and broadcast
  * the scored result back — the fact side never shuffles and the
  * codegen break of the RDD boundary is confined to the
  * candidate-sized subtree. [[NaiveBayes]] covers the TRAINABLE half of
  * U4; this covers the pretrained-model process boundary.
  */
object BatchedInference {

  /** Default inference batch size — the tokenizer/forward-pass unit. */
  val DefaultBatchSize = 32

  /** STUB forward pass: one batch of texts in, one (class, confidence)
    * per text out. Thresholds over the first 24 bits of md5(text) mimic
    * a 3-class softmax head read the way flow_inference.py reads it
    * (argmax class + the confidence scalar). Replayable in SQL as
    * `CAST('0x' || substr(md5(text), 1, 6) AS BIGINT) % 1000`. */
  private[ml] def stubScorer(texts: Seq[String]): Seq[(String, Double)] =
    texts.map { text =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val h = ((md(0) & 0xffL) << 16) | ((md(1) & 0xffL) << 8) | (md(2) & 0xffL)
      val t = h % 1000
      val cls = if (t >= 800) "Full" else if (t >= 500) "Partial" else "None"
      (cls, t / 1000.0)
    }

  /** `df` plus `predicted_class` (string) and `predicted_confidence`
    * (double), scored `batchSize` texts per model call. NULL text scores
    * as the empty string (the tokenizer contract — a null row must not
    * silently drop from the candidate set). All input columns pass
    * through untouched, mirroring `dataset.map(inference)`. */
  def withPredictions(df: DataFrame, textCol: String,
      batchSize: Int = DefaultBatchSize,
      scorer: Seq[String] => Seq[(String, Double)] = stubScorer): DataFrame = {
    require(batchSize >= 1, s"batch size must be >= 1, got $batchSize")
    val spark = df.sparkSession
    val outSchema = df.schema
      .add("predicted_class", StringType, nullable = false)
      .add("predicted_confidence", DoubleType, nullable = false)
    val ti = df.schema.fieldIndex(textCol)
    val out = df.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val scores = scorer(batch.map(r => if (r.isNullAt(ti)) "" else r.getString(ti)))
        require(scores.length == batch.length,
          s"scorer returned ${scores.length} scores for a batch of ${batch.length}")
        batch.iterator.zip(scores.iterator).map { case (r, (cls, conf)) =>
          Row.fromSeq(r.toSeq :+ cls :+ conf)
        }
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
