package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The actual codec is STUBBED (this container has no image/audio libs):
  * `fakeDecode` derives a deterministic feature vector from the bytes'
  * md5, so every piece of Spark-side plumbing — schema, batching,
  * partition-level processing, output shape — is real and testable, and
  * swapping in a true decoder is a one-function change.
  *
  * Scale notes: `mapPartitions` processes each partition's rows in one
  * JVM pass (the Scala analogue of mapInPandas batching); binary blobs
  * never shuffle — features are extracted before any wide operation, and
  * only the (id, features, meta) projection moves.
  */
object MediaColumns {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StringType, nullable = true)))       // JSON sidecar

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** STUB decoder: deterministic pseudo-features from md5(content).
    * Replace with a real codec (JNI/ONNX) without touching the plan. */
  private[multimodal] def fakeDecode(bytes: Array[Byte], dims: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(dims)(i => ((md(i % md.length) & 0xff) - 128) / 128.0f)
  }

  /** Partition-wise feature extraction over a media frame. Width/height
    * come from the JSON sidecar (a real decoder would read the header). */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .select("media_id", "media_type", "content", "meta")
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
          val meta = Option(r.getAs[String]("meta")).getOrElse("{}")
          val wh = """"(width|height)"\s*:\s*(\d+)""".r
          val found = wh.findAllMatchIn(meta).map(m => m.group(1) -> m.group(2).toInt).toMap
          Row(
            r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
            bytes.length,
            if (bytes.isEmpty) null else fakeDecode(bytes, dims).toSeq,
            found.get("width").orNull, found.get("height").orNull)
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * offset — a generator, no shuffle. The decode of each frame is the
    * same stub. */
  def sampleFrames(media: DataFrame, everyNthByte: Int): DataFrame =
    media.filter(col("media_type") === "video")
      // 0-byte or NULL media has no frames (and the null-content row would
      // otherwise surface as a single null-fingerprint "frame")
      .filter(length(col("content")) > 0)
      .withColumn("frame_offset",
        explode(sequence(lit(0), length(col("content")) - 1, lit(everyNthByte))))
      .select(col("media_id"), col("frame_offset"),
        md5(concat(col("content").cast("string"), col("frame_offset"))).as("frame_fp"))
}
