package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * IMAGES AND AUDIO DECODE FOR REAL: `media_type = 'image'` routes
  * through `javax.imageio` (JDK-only, PNG/BMP/GIF/JPEG) — true
  * width/height from the decoded raster, features = per-cell mean
  * luminance over a row-major grid; `media_type = 'audio'` routes
  * through `javax.sound.sampled` (JDK-only, WAV/PCM16) — sample rate /
  * frame count as width/height, features = windowed RMS amplitude.
  * Bytes that don't decode (wrong format, corrupt, empty) surface as
  * NULL width/height/features — never the stub: silently hashing
  * undecodable bytes into "features" would poison any downstream
  * similarity join. The md5 STUB remains only for VIDEO (no JDK video
  * codec exists); its width/height come from the JSON sidecar, the
  * documented boundary.
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

  /** STUB decoder (video only): deterministic pseudo-features from
    * md5(content). Replace with a real codec (JNI/ONNX) without touching
    * the plan — exactly what [[decodeImage]] and [[decodeAudio]] did for
    * images and audio. */
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
    // in-memory stream cache (same reason as decodeAllFrames): the
    // default FILE cache pays a temp-file create/delete per decoded row
    javax.imageio.ImageIO.setUseCache(false)
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

  /** REAL audio decode (JDK `javax.sound.sampled`, WAV): sample rate and
    * frame count from the decoded header plus `dims` features — RMS
    * amplitude, normalized to [0, 1] by the 16-bit full scale, over
    * `dims` contiguous frame windows (the classic audio-thumbnail
    * embedding; a constant-amplitude signal yields `dims` copies of
    * amp/32768 EXACTLY — sum/n of identical squares then √ then a
    * power-of-two divide are all exact — which is what lets q168's
    * oracle replay the values in SQL).
    *
    * Coverage: PCM_SIGNED 16-bit little-endian reads directly; any
    * other PCM shape the JDK's PCM-to-PCM converter reaches (8-bit,
    * unsigned, big-endian) is TRANSCODED first — width/sign/endianness
    * conversions are stock JDK; channel DOWNMIX is not, so multi-
    * channel frames are averaged here (stereo → (L+R)/2, exact in
    * double). Bytes that aren't audio, or shapes with no converter
    * chain, return None and the caller surfaces NULLs, never stub
    * features. In [[featureSchema]] terms an audio row's `width` is
    * its sample rate (Hz) and `height` its frame count. */
  private[multimodal] def decodeAudio(
      bytes: Array[Byte], dims: Int): Option[(Int, Int, Array[Float])] = {
    if (bytes.isEmpty) return None
    // cheap RIFF/WAVE sniff before the SPI lookup: obviously-non-WAV
    // bytes (the common case in a mixed media table) skip the provider
    // scan + exception throw, which dominate the per-row cost
    if (bytes.length < 12 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return None
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => null
        case _: java.io.IOException => null
      }
    if (ais == null) None
    else {
      val src = ais.getFormat
      val direct =
        src.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          src.getSampleSizeInBits == 16 && !src.isBigEndian
      val pcm =
        if (direct) ais
        else {
          // same rate and channel count, 16-bit signed little-endian —
          // the shape the stock PCM-to-PCM converter can always reach
          // from 8-bit / unsigned / big-endian PCM
          val target = new javax.sound.sampled.AudioFormat(
            src.getSampleRate, 16, src.getChannels, true, false)
          try javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
          catch { case _: IllegalArgumentException => null } // no converter chain
        }
      if (pcm == null) return None
      val ch = pcm.getFormat.getChannels
      if (ch < 1) return None
      val data = pcm.readAllBytes()
      val n = data.length / (2 * ch)
      if (n == 0) None
      else {
        // per-frame mono sample: mean over channels — the raw short for
        // mono input (bit-identical to the pre-transcode decoder), the
        // exact (L+R)/2 downmix for stereo
        def frame(i: Int): Double = {
          var c = 0
          var s = 0.0
          while (c < ch) {
            val o = 2 * (i * ch + c)
            s += ((data(o + 1) << 8) | (data(o) & 0xff)).toShort.toDouble
            c += 1
          }
          s / ch
        }
        val feats = Array.ofDim[Float](dims)
        var w = 0
        while (w < dims) {
          // Long arithmetic: w * n overflows Int for ~90-minute WAVs
          val f0 = (w.toLong * n / dims).toInt
          val f1 = math.max(f0 + 1, ((w + 1).toLong * n / dims).toInt)
          var sum = 0.0
          var i = f0
          while (i < math.min(f1, n)) {
            val s = frame(i)
            sum += s * s
            i += 1
          }
          feats(w) = (math.sqrt(sum / (math.min(f1, n) - f0)) / 32768.0).toFloat
          w += 1
        }
        Some((pcm.getFormat.getSampleRate.toInt, n, feats))
      }
    }
  }

  /** Deterministic WAV synthesis (JDK `AudioSystem.write`) — the fixture
    * generator for the real audio decode: `frames` PCM16 mono samples,
    * all at `amp`, at `sampleRate` Hz. Runs at staging time only. */
  private[graft] def solidWav(sampleRate: Int, frames: Int, amp: Int): Array[Byte] = {
    val data = Array.ofDim[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      data(2 * i) = (amp & 0xff).toByte
      data(2 * i + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Partition-wise feature extraction over a media frame, dispatched by
    * media_type: images through the real [[decodeImage]] (true
    * width/height; NULLs when undecodable), audio through the real
    * [[decodeAudio]] (sample rate / frame count as width/height; NULLs
    * when undecodable), video through the documented stub with sidecar
    * width/height. */
  def extractFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val out = media
      .select("media_id", "media_type", "content", "meta")
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val mediaType = r.getAs[String]("media_type")
          val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
          if (mediaType == "image" || mediaType == "audio") {
            val dec = if (mediaType == "image") decodeImage(bytes, dims)
              else decodeAudio(bytes, dims)
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

  /** REAL frame decode for video rows whose container the JDK can read
    * (animated GIF — the one multi-frame format `javax.imageio` decodes
    * with zero new dependencies): one output row per DECODED frame with
    * true width/height and the frame's mean luminance, normalized to
    * [0, 1]. Row-local flatMap — one row in, n-frames rows out, blobs
    * never shuffle. Bytes that aren't a multi-frame image produce no
    * rows here; they remain the honest codec boundary [[sampleFrames]]'
    * byte-offset stub serves. */
  def sampleFramesDecoded(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("f_mean", FloatType, nullable = false)))
    val out = media.filter(col("media_type") === "video")
      .select("media_id", "content")
      .rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
          decodeAllFrames(bytes).zipWithIndex.map { case ((w, h, f), i) =>
            Row(r.getAs[Long]("media_id"), i, w, h, f)
          }
        }
      }
    spark.createDataFrame(out, schema)
  }

  /** Every frame of a multi-frame image container: (width, height,
    * mean luminance / 255) per frame, Nil when the bytes don't decode.
    * Mean luminance is (r+g+b)/3 — exact for grayscale pixels, so a
    * solid frame round-trips its palette gray bit-for-bit (what lets
    * q173's oracle replay the decode in SQL). */
  private[multimodal] def decodeAllFrames(
      bytes: Array[Byte]): Seq[(Int, Int, Float)] = {
    if (bytes.isEmpty) return Nil
    // in-memory stream cache: the default FILE cache opens one temp
    // file per stream, and a per-row decode at corpus scale exhausts
    // the fd limit (observed at the 10× probe: "Too many open files")
    javax.imageio.ImageIO.setUseCache(false)
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (iis == null) return Nil
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).map { i =>
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          (w, h, (sum / (w.toLong * h) / 255.0).toFloat)
        }
      } catch { case _: java.io.IOException => Nil }
      finally reader.dispose()
    } finally iis.close()
  }

  /** Deterministic animated-GIF synthesis (JDK `GIFImageWriter`
    * sequence API) — the fixture generator for the real frame decode:
    * `n` solid frames at `(base + i·37) % 256` gray. Staging-time only. */
  private[graft] def animatedGif(w: Int, h: Int, n: Int, base: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp file per stream
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until n).foreach { i =>
        val g = (base + i * 37) % 256
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam())
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Frame sampling for video rows the JDK has NO decoder for: one
    * output row per sampled byte offset — a generator, no shuffle, the
    * decode of each frame is the documented stub. Real containers the
    * JDK can read go through [[sampleFramesDecoded]]. */
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
