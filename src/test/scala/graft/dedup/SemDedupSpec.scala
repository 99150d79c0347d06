package graft.dedup

import graft.SparkSpec
import graft.ann.KMeans
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {

  test("planted exact duplicates are removed, lowest id survives") {
    val emb = Tables.embeddings(spark, sf)
    // plant: every vector with id in [500, 520) is an exact copy of id-500
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(planted)
    val cents = KMeans.fit(corpus, "vec_id", "embedding", k = 16, iters = 2)
    val kept = SemDedup.semanticDedup(corpus, "vec_id", "embedding", cents, tau = 0.999999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // an exact copy has cosine 1.0 to its original in the same cell, so
    // every planted id must fall; every original must survive at this tau
    // unless the corpus itself holds an exact twin (it doesn't at sf0.001)
    assert((500L until 520L).forall(id => !kept.contains(id)))
    assert(emb.select("vec_id").collect().map(_.getLong(0)).forall(kept.contains))
  }

  test("tau above any real cosine keeps everything; survivors carry their cell") {
    val emb = Tables.embeddings(spark, sf)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val all = SemDedup.semanticDedup(emb, "vec_id", "embedding", cents, tau = 1.000001)
    assert(all.count() == emb.count())
    val cids = all.select("cid").distinct().collect().map(_.getLong(0))
    assert(cids.forall(c => c >= 0 && c < 16))
  }

  test("survivor set shrinks monotonically as tau drops") {
    val emb = Tables.embeddings(spark, sf)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val counts = Seq(0.9, 0.5, 0.2).map(t =>
      SemDedup.semanticDedup(emb, "vec_id", "embedding", cents, tau = t).count())
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
  }
}
