package graft.ann

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  test("trained IVF at its shipped nprobe: recall@10 >= 0.9 vs brute-force ground truth") {
    // q96's index (k=16 cells, 2 Lloyd rounds) at q96's nprobe (12),
    // measured against q37's exact baseline on a 50-query set — the
    // recall gate. RecallProbe sweeps the full recall-vs-nprobe curve;
    // 12 is where this corpus crosses 0.9 (the old recall@5-on-10-queries
    // check passed at nprobe 6 only as a small-sample artifact).
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val ivf = Knn.ivfTopK(emb, queries, "vec_id", "embedding", cents, k = 10, probes = 12)
    val recall = Knn.recall(exact, ivf)
    assert(recall >= 0.9, s"IVF probe-12/16 recall@10 = $recall")
  }

  test("clustered corpus: recall@10 >= 0.9 at scan fraction <= 0.25, flat and tree routing") {
    // The number that justifies the index: on the planted-cluster corpus
    // (the regime real embedding corpora live in — the raw synthetic
    // table is near-uniform, IVF's worst case, where recall ≈ scan
    // fraction) a trained quantizer aligns cells with clusters, so a
    // quarter of the cells already holds ~every true neighbor.
    val emb = Planted.corpus(Tables.embeddings(spark, sf),
      "vec_id", "embedding", nClusters = 32, eps = 0.15)
      .localCheckpoint()
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .localCheckpoint()

    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val flat = Knn.ivfTopK(emb, queries, "vec_id", "embedding", cents,
      k = 10, probes = 4)
    val rFlat = Knn.recall(exact, flat)
    assert(rFlat >= 0.9, s"flat IVF probe-4/16 clustered recall@10 = $rFlat")

    // the tree quantizer's own search path (ivfTopKTree), same budget:
    // 4 of 16 cells via branch-then-leaf routing
    val tq = KMeans.fitTree(emb, "vec_id", "embedding", k1 = 4, k2 = 4, iters = 2)
    val nCells = tq.leaves.map(_.size).sum
    val tree = Knn.ivfTopKTree(emb, queries, "vec_id", "embedding", tq,
      k = 10, probes = 4, branchProbes = 2)
    val rTree = Knn.recall(exact, tree)
    assert(rTree >= 0.9, s"tree IVF probe-4/$nCells clustered recall@10 = $rTree")

    // q138's shipped config — the nlist ∝ N production cell count (8×8 =
    // 64 cells) at q138's exact routing budget (12 probes through the 3
    // best branches, scan fraction 12/64 ≈ 0.19 ≤ 0.25): the inventory
    // query's recall gate, not just the probe sweep's.
    val tq64 = KMeans.fitTree(emb, "vec_id", "embedding", k1 = 8, k2 = 8, iters = 2)
    val n64 = tq64.leaves.map(_.size).sum
    val tree64 = Knn.ivfTopKTree(emb, queries, "vec_id", "embedding", tq64,
      k = 10, probes = 12, branchProbes = 3)
    val rTree64 = Knn.recall(exact, tree64)
    assert(12.0 / n64 <= 0.25, s"scan fraction ${12.0 / n64} above the gate's 0.25")
    assert(rTree64 >= 0.9, s"tree IVF probe-12/$n64 clustered recall@10 = $rTree64")
  }

  test("tree search matches flat search when the tree degenerates to one branch") {
    // k1=1 makes branch routing trivial: every vector lands in branch 0
    // and ivfTopKTree must reduce to ivfTopK over the leaf table — a
    // correctness pin for the routing arithmetic (cell ids, probe order).
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val tq = KMeans.fitTree(emb, "vec_id", "embedding", k1 = 1, k2 = 8, iters = 2)
    val leafCents = tq.leaves.head.zipWithIndex.map { case (c, i) => (i, c) }
    val viaTree = Knn.ivfTopKTree(emb, queries, "vec_id", "embedding", tq,
      k = 5, probes = 3, branchProbes = 1)
    val viaFlat = Knn.ivfTopK(emb, queries, "vec_id", "embedding", leafCents,
      k = 5, probes = 3)
    assert(viaTree.collect().map(_.toSeq).toSet == viaFlat.collect().map(_.toSeq).toSet)
  }

  test("fit is deterministic and keeps empty clusters on their previous centroid") {
    val emb = Tables.embeddings(spark, sf)
    val a = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    val b = KMeans.fit(emb, "vec_id", "embedding", k = 16, iters = 2)
    assert(a == b)
    assert(a.size == 16)
    assert(a.forall(_._2.size == 64))
  }

  test("tree quantizer: deterministic fit, bounded shape, identical vectors share a cell") {
    val emb = Tables.embeddings(spark, sf)
    val a = KMeans.fitTree(emb, "vec_id", "embedding", k1 = 4, k2 = 4, iters = 2)
    val b = KMeans.fitTree(emb, "vec_id", "embedding", k1 = 4, k2 = 4, iters = 2)
    assert(a == b)
    assert(a.branches.size == 4)
    assert(a.leaves.size == 4 && a.leaves.forall(ls => ls.nonEmpty && ls.size <= 4))
    assert(a.leaves.flatten.forall(_.size == 64))
    // identical vectors land in identical cells under any row-local
    // assignment — the property semantic dedup's recall rests on
    val planted = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val cells = graft.dedup.SemDedup.assignCellsTree(
      emb.select("vec_id", "embedding").unionByName(planted), "vec_id", "embedding", a)
    val byCell = cells.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 10L).forall(id => byCell(id) == byCell(id + 1000)))
    assert(byCell.values.forall(c => c >= 0 && c < 16))
  }

  test("tree-assigned semantic dedup removes planted exact duplicates") {
    val emb = Tables.embeddings(spark, sf)
    val planted = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 500).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(planted)
    val tq = KMeans.fitTree(corpus, "vec_id", "embedding", k1 = 4, k2 = 4, iters = 2)
    val cells = graft.dedup.SemDedup.assignCellsTree(corpus, "vec_id", "embedding", tq)
    val kept = graft.dedup.SemDedup.semanticDedupOnCells(cells, tau = 0.999999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((500L until 520L).forall(id => !kept.contains(id)))
    assert(emb.select("vec_id").collect().map(_.getLong(0)).forall(kept.contains))
  }
}
