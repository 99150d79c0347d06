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

  test("IVF search at full scan budget is EXACT — flat and tree both reduce to brute force") {
    // probes = every cell (branchProbes = every branch) means the
    // cell routing cannot drop a candidate: both index searches must
    // return exactly the brute-force result — the recall=1 endpoint of
    // the probes dial, pinned so the routing can never lose rows it
    // claims only to reorder
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 15)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val flat = Knn.ivfTopK(emb, queries, "vec_id", "embedding", cents,
      k = 5, probes = 8).collect().map(_.toSeq).toSet
    assert(flat == exact, "flat IVF at probes=k diverged from brute force")
    val tq = KMeans.fitTree(emb, "vec_id", "embedding", k1 = 4, k2 = 4, iters = 2)
    val nCells = tq.leaves.map(_.size).sum
    val tree = Knn.ivfTopKTree(emb, queries, "vec_id", "embedding", tq,
      k = 5, probes = nCells, branchProbes = 4).collect().map(_.toSeq).toSet
    assert(tree == exact, "tree IVF at full scan diverged from brute force")
  }
}
