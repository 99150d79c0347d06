package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MediaColumnsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def media = spark.createDataFrame(
    Seq(
      Row(1L, "image", "fake-png-bytes".getBytes("UTF-8"), """{"width": 640, "height": 480}"""),
      Row(2L, "audio", "fake-wav-bytes".getBytes("UTF-8"), """{"sample_rate": 16000}"""),
      Row(3L, "video", "fake-mp4-bytes-somewhat-longer".getBytes("UTF-8"), null),
      Row(4L, "image", null, "{}")).asJava,
    MediaColumns.mediaSchema)

  test("extractFeatures: deterministic stub features, metadata parsed, nulls survive") {
    val out = MediaColumns.extractFeatures(media, dims = 8)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("width") == 640 && byId(1L).getAs[Int]("height") == 480)
    assert(byId(1L).getAs[scala.collection.Seq[Float]]("features").length == 8)
    assert(byId(2L).getAs[Any]("width") == null)
    assert(byId(4L).getAs[Any]("features") == null) // null content → null features
    // determinism: same bytes → same features
    val again = MediaColumns.extractFeatures(media, dims = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[scala.collection.Seq[Float]]("features") == again(1L).getAs[scala.collection.Seq[Float]]("features"))
  }

  test("sampleFrames: one row per sampled offset, video only") {
    val out = MediaColumns.sampleFrames(media, everyNthByte = 10).collect()
    assert(out.forall(_.getLong(0) == 3L))
    assert(out.length == 3) // len 30 → offsets 0,10,20
  }
}
