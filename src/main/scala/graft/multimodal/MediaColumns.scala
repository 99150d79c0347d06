package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * IMAGES DECODE FOR REAL: `media_type = 'image'` routes through
  * `javax.imageio` (JDK-only, PNG/BMP/GIF/JPEG) — true width/height from
  * the decoded raster and features = per-cell mean luminance over a
  * row-major grid. Bytes that don't decode (wrong format, corrupt,
  * empty) surface as NULL width/height/features — never the stub:
  * silently hashing undecodable bytes into "features" would poison any
  * downstream similarity join. The md5 STUB remains only for
  * audio/video (this container has no audio/video libs); their
  * width/height come from the JSON sidecar, the documented boundary.
  *
  * Scale notes: `mapPartitions` processes each partition's rows in one
  * JVM pass (the Scala analogue of mapInPandas batching); binary blobs
  * never shuffle — features are extracted before any wide operation, and
  * only the (id, features, meta) projection moves. ImageIO readers are
  * looked up once per JVM (static registry); decode is row-local.
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

  /** STUB decoder (audio/video only): deterministic pseudo-features from
    * md5(content). Replace with a real codec (JNI/ONNX) without touching
    * the plan — exactly what [[decodeImage]] did for images. */
  private[multimodal] def fakeDecode(bytes: Array[Byte], dims: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(dims)(i => ((md(i % md.length) & 0xff) - 128) / 128.0f)
  }

  /** REAL image decode (JDK `javax.imageio`): true (width, height) from
    * the raster plus `dims` features — mean luminance, normalized to
    * [0, 1], over the cells of a ⌈√dims⌉×⌈√dims⌉ row-major grid laid
    * over the image (the classic thumbnail-stats embedding; a solid
    * image yields `dims` copies of gray/255, which is what lets q166's
    * oracle replay the values in SQL). Luminance = (r+g+b)/3 — EXACT
    * for grayscale pixels (3x/3 == x in binary FP), so the oracle's
    * integer replay has no rounding seam. Returns None when the bytes
    * are not a decodable image — the caller surfaces NULLs, never stub
    * features. */
  private[multimodal] def decodeImage(
      bytes: Array[Byte], dims: Int): Option[(Int, Int, Array[Float])] = {
    if (bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null } // recognized-but-corrupt
    if (img == null) None // unrecognized format
    else {
      val w = img.getWidth
      val h = img.getHeight
      val grid = math.max(1, math.ceil(math.sqrt(dims.toDouble)).toInt)
      val feats = Array.ofDim[Float](dims)
      var idx = 0
      var gy = 0
      while (gy < grid && idx < dims) {
        var gx = 0
        while (gx < grid && idx < dims) {
          val x0 = gx * w / grid; val x1 = math.max(x0 + 1, (gx + 1) * w / grid)
          val y0 = gy * h / grid; val y1 = math.max(y0 + 1, (gy + 1) * h / grid)
          var sum = 0.0
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          val n = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
          feats(idx) = (sum / n / 255.0).toFloat
          idx += 1
          gx += 1
        }
        gy += 1
      }
      Some((w, h, feats))
    }
  }

  /** Partition-wise feature extraction over a media frame, dispatched by
    * media_type: images through the real [[decodeImage]] (true
    * width/height; NULLs when undecodable), audio/video through the
    * documented stub with sidecar width/height. */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .select("media_id", "media_type", "content", "meta")
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val mediaType = r.getAs[String]("media_type")
          val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
          if (mediaType == "image") {
            val dec = decodeImage(bytes, dims)
            Row(
              r.getAs[Long]("media_id"), mediaType, bytes.length,
              dec.map(_._3.toSeq).orNull,
              dec.map(_._1).orNull, dec.map(_._2).orNull)
          } else {
            val meta = Option(r.getAs[String]("meta")).getOrElse("{}")
            val wh = """"(width|height)"\s*:\s*(\d+)""".r
            val found = wh.findAllMatchIn(meta).map(m => m.group(1) -> m.group(2).toInt).toMap
            Row(
              r.getAs[Long]("media_id"), mediaType, bytes.length,
              if (bytes.isEmpty) null else fakeDecode(bytes, dims).toSeq,
              found.get("width").orNull, found.get("height").orNull)
          }
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** Deterministic PNG synthesis (JDK `ImageIO.write`) — the fixture
    * generator for the real-decode path: a w×h image filled with one
    * gray level. Runs at STAGING time (the q166 media table is built
    * once per corpus), never in a serving plan. */
  private[graft] def solidPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
