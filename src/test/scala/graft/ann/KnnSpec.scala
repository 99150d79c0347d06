package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 0.1f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),   // closest to 0
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(-1f, 0f, 0f, 0f)),
    (4L, Array(0.8f, 0.2f, 0f, 0f)))   // second closest to 0
  private def df = vecs.toDF("vec_id", "embedding")

  test("bruteForceTopK returns cosine-ordered neighbors, query excluded") {
    val out = Knn.bruteForceTopK(df, df.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 4L, 2L))
    assert(out.head.getDouble(3) > 0.99)
    assert(!out.map(_.getLong(2)).contains(0L))
  }

  test("lshTopK only searches the query's sign bucket") {
    val out = Knn.lshTopK(df, df.filter(col("vec_id") === 0), "vec_id", "embedding", 5, 2)
      .collect()
    // bucket of v0 = bits(x>0, y>0) = 3; v3 (-1,0) bucket 0; v2 (0,1) bucket 2.
    val ids = out.map(_.getLong(2)).toSet
    assert(ids == Set(1L, 4L)) // same-bucket candidates only
  }
}
