package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MediaColumnsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // image/audio rows carry REAL encoded bytes (JDK ImageIO / WAV
  // round-trips); the undecodable rows (ids 5, 6) pin the NULL
  // contract — bytes that aren't the claimed medium must never surface
  // stub features
  private def media = spark.createDataFrame(
    Seq(
      Row(1L, "image", MediaColumns.solidPng(6, 4, 128), """{"width": 640, "height": 480}"""),
      Row(2L, "audio", MediaColumns.solidWav(16000, 40, 1234), """{"sample_rate": 99}"""),
      Row(3L, "video", "fake-mp4-bytes-somewhat-longer".getBytes("UTF-8"), null),
      Row(4L, "image", null, "{}"),
      Row(5L, "image", "not-an-image-at-all".getBytes("UTF-8"), """{"width": 9, "height": 9}"""),
      Row(6L, "audio", "not-a-wav-either".getBytes("UTF-8"), """{"width": 7}""")).asJava,
    MediaColumns.mediaSchema)

  test("extractFeatures: real image + audio decode, stub for video, NULLs for undecodable") {
    val out = MediaColumns.extractFeatures(media, dims = 8)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    // TRUE dimensions from the decoded raster — the sidecar says 640×480
    // and must lose to the actual 6×4 pixels
    assert(byId(1L).getAs[Int]("width") == 6 && byId(1L).getAs[Int]("height") == 4)
    val feats = byId(1L).getAs[scala.collection.Seq[Float]]("features")
    assert(feats.length == 8)
    // solid gray 128 → every grid-cell mean is exactly 128/255
    assert(feats.forall(_ == (128.0 / 255.0).toFloat), s"features: $feats")
    // audio: decoded header beats the sidecar — sample rate / frames
    assert(byId(2L).getAs[Int]("width") == 16000 && byId(2L).getAs[Int]("height") == 40)
    val afeats = byId(2L).getAs[scala.collection.Seq[Float]]("features")
    // constant amplitude 1234 → every window's RMS is exactly 1234/32768
    assert(afeats.length == 8 && afeats.forall(_ == (1234.0 / 32768.0).toFloat),
      s"audio features: $afeats")
    // video: stub features, sidecar width absent → NULL
    assert(byId(3L).getAs[Any]("width") == null)
    assert(byId(3L).getAs[scala.collection.Seq[Float]]("features").length == 8)
    assert(byId(4L).getAs[Any]("features") == null) // null content → null features
    // undecodable image/audio bytes: NULL features AND NULL dims (the
    // sidecar must NOT leak through — there is no real medium behind it)
    for (id <- Seq(5L, 6L)) {
      assert(byId(id).getAs[Any]("features") == null)
      assert(byId(id).getAs[Any]("width") == null && byId(id).getAs[Any]("height") == null)
    }
    // determinism: same bytes → same features
    val again = MediaColumns.extractFeatures(media, dims = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(feats == again(1L).getAs[scala.collection.Seq[Float]]("features"))
  }

  test("decodeAudio: windows follow the samples, not the fill") {
    // 10 frames: first 5 at +1000, last 5 at -2000; dims=2 → window RMS
    // = [1000, 2000] / 32768 exactly (constant within each window,
    // negative amplitude enters squared)
    val data = Array.ofDim[Byte](20)
    for (i <- 0 until 10) {
      val a = if (i < 5) 1000 else -2000
      data(2 * i) = (a & 0xff).toByte
      data(2 * i + 1) = ((a >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 10L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((rate, frames, feats)) = MediaColumns.decodeAudio(bos.toByteArray, dims = 2)
    assert(rate == 8000 && frames == 10)
    assert(feats.toSeq == Seq((1000.0 / 32768.0).toFloat, (2000.0 / 32768.0).toFloat),
      s"got ${feats.toSeq}")
  }

  test("decodeAudio: stereo downmixes to the exact channel mean") {
    // 8 stereo frames, L = +1000, R = +3000 → mono frame (L+R)/2 = 2000
    // exactly (sum of two doubles, power-of-two divide) → every RMS
    // window is 2000/32768, the mono-downmix expectation
    val data = Array.ofDim[Byte](32)
    for (i <- 0 until 8; (a, c) <- Seq((1000, 0), (3000, 1))) {
      val o = 4 * i + 2 * c
      data(o) = (a & 0xff).toByte
      data(o + 1) = ((a >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 8L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((rate, frames, feats)) = MediaColumns.decodeAudio(bos.toByteArray, dims = 2)
    assert(rate == 8000 && frames == 8)
    assert(feats.toSeq == Seq.fill(2)((2000.0 / 32768.0).toFloat), s"got ${feats.toSeq}")
  }

  test("decodeAudio: 8-bit unsigned PCM transcodes through the JDK converter") {
    // 6 frames of unsigned-byte 200: ideal widening is (x−128)·256 =
    // 18432 → RMS 0.5625; the stock converter also replicates bits into
    // the low byte, so pin scale (within half an 8-bit step of ideal),
    // window constancy, and determinism — not the JDK's private mapping
    val data = Array.fill[Byte](6)(200.toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 6L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((rate, frames, feats)) = MediaColumns.decodeAudio(bos.toByteArray, dims = 2)
    assert(rate == 8000 && frames == 6)
    assert(feats(0) == feats(1), s"constant signal must give equal windows: ${feats.toSeq}")
    assert(math.abs(feats(0) - 0.5625) < 256.0 / 32768.0, s"got ${feats.toSeq}")
    assert(MediaColumns.decodeAudio(bos.toByteArray, dims = 2).get._3.toSeq == feats.toSeq)
  }

  test("decodeImage: grid means follow the raster, not the fill") {
    // 8×8 two-tone: left half gray 40, right half gray 200. dims=4 →
    // 2×2 grid whose cells align exactly with the halves: features =
    // [40, 200, 40, 200] / 255, row-major.
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = if (x < 4) 40 else 200
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, feats)) = MediaColumns.decodeImage(bos.toByteArray, dims = 4)
    assert(w == 8 && h == 8)
    val want = Seq(40, 200, 40, 200).map(g => (g / 255.0).toFloat)
    assert(feats.toSeq == want, s"got ${feats.toSeq}, want $want")
  }

  test("decodeImage: non-square dims walk the grid row-major and stop") {
    // dims=3 over the same two-tone image: ⌈√3⌉=2 grid, first 3 cells
    // row-major = left-top, right-top, left-bottom
    val Some((_, _, feats)) = MediaColumns.decodeImage(
      MediaColumns.solidPng(5, 3, 77), dims = 3)
    assert(feats.length == 3 && feats.forall(_ == (77.0 / 255.0).toFloat))
  }

  test("sampleFramesDecoded: real GIF frames in order, none for undecodable video") {
    import scala.jdk.CollectionConverters._
    val gifMedia = spark.createDataFrame(
      Seq(
        Row(7L, "video", MediaColumns.animatedGif(5, 4, 3, 40), null),
        Row(8L, "video", "not-a-gif".getBytes("UTF-8"), null),
        Row(9L, "image", MediaColumns.animatedGif(5, 4, 3, 40), null)).asJava,
      MediaColumns.mediaSchema)
    val out = MediaColumns.sampleFramesDecoded(gifMedia).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        math.round(r.getFloat(4) * 255)))
    // 3 frames, in sequence order, exact palette grays 40, 77, 114;
    // undecodable bytes contribute nothing; non-video rows are not frames
    assert(out.toSeq == Seq((7L, 0, 5, 4, 40L), (7L, 1, 5, 4, 77L), (7L, 2, 5, 4, 114L)),
      s"got ${out.toSeq}")
  }

  test("sampleFrames: one row per sampled offset, video only") {
    val out = MediaColumns.sampleFrames(media, everyNthByte = 10).collect()
    assert(out.forall(_.getLong(0) == 3L))
    assert(out.length == 3) // len 30 → offsets 0,10,20
  }
}
