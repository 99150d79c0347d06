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

  test("shuffled anti-join fallback returns the broadcast path's survivors") {
    // the corpus-scale arm (broadcastDups = false, for SemDeDup-style
    // 30-50% dup rates where the dup set cannot broadcast) must be a
    // pure plan change: same survivor set, no broadcast of the dup ids
    val emb = Tables.embeddings(spark, sf)
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(planted)
    val cents = KMeans.fit(corpus, "vec_id", "embedding", k = 16, iters = 2)
    val cells = SemDedup.assignCells(corpus, "vec_id", "embedding", cents)
      .localCheckpoint(false)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val hinted = SemDedup.semanticDedupOnCells(cells, tau = 0.999999)
    val fallback = SemDedup.semanticDedupOnCells(cells, tau = 0.999999,
      broadcastDups = false)
    assert(ids(hinted) == ids(fallback))
  }

  test("tau above any real cosine keeps everything; survivors carry their cell") {
    val emb = Tables.embeddings(spark, sf)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val all = SemDedup.semanticDedup(emb, "vec_id", "embedding", cents, tau = 1.000001)
    assert(all.count() == emb.count())
    val cids = all.select("cid").distinct().collect().map(_.getLong(0))
    assert(cids.forall(c => c >= 0 && c < 16))
  }

  test("incremental flags: history copies flag dup_in_history, within-batch copies dup_in_batch") {
    val emb = Tables.embeddings(spark, sf)
    val history = emb.filter(col("vec_id") < 40).select("vec_id", "embedding")
    val novel = emb.filter(col("vec_id") >= 40).select("vec_id", "embedding")
    val histCopies = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val batchCopy = emb.filter(col("vec_id") === 40)
      .select((col("vec_id") + 3000).as("vec_id"), col("embedding"))
    val batch = novel.unionByName(histCopies).unionByName(batchCopy)
    val cents = KMeans.fit(history, "vec_id", "embedding", k = 8, iters = 2)
    val flags = SemDedup.incrementalSemanticDedup(
      history, batch, "vec_id", "embedding", cents, tau = 0.999999)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(flags.size == batch.count())
    // exact copies of history vectors: flagged against history (same cell
    // by row-local assignment), not against the batch
    assert((1000L until 1005L).forall(id => flags(id) == (true, false)))
    // vec 40 is novel; its higher-id exact twin 3040 flags within-batch only
    assert(flags(40L) == (false, false))
    assert(flags(3040L) == (false, true))
    // the remaining novel vectors match nothing at this tau
    assert((41L until 50L).forall(id => flags(id) == (false, false)))
  }

  test("survivor set shrinks monotonically as tau drops") {
    val emb = Tables.embeddings(spark, sf)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val counts = Seq(0.9, 0.5, 0.2).map(t =>
      SemDedup.semanticDedup(emb, "vec_id", "embedding", cents, tau = t).count())
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
  }
}
