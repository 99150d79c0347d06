package graft.ann

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  test("trained IVF multi-probe recall@5 >= 0.9 vs brute force (sf0.001)") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val ivf = Knn.ivfTopK(emb, queries, "vec_id", "embedding", cents, k = 5, probes = 6)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = exact.keys.toSeq.map { q =>
      (exact(q) intersect ivf.getOrElse(q, Set.empty)).size.toDouble / exact(q).size
    }.sum / exact.size
    assert(recall >= 0.9, s"IVF probe-6/16 recall@5 = $recall")
  }

  test("fit is deterministic and keeps empty clusters on their previous centroid") {
    val emb = Tables.embeddings(spark, sf)
    val a = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val b = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    assert(a == b)
    assert(a.size == 16)
    assert(a.forall(_._2.size == 64))
  }
}
