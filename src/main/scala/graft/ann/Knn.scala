package graft.ann

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, so the corpus scans once with no shuffle; the only
  * shuffle is the per-query top-k window on Q·N candidate rows.
  *
  * Scale path: sign-bit LSH bucketing (`VectorFns.signBucket`) routes each
  * query to one bucket, cutting candidates by ~2^nBits; same top-k logic
  * after an equi-join on the bucket id. An IVF variant would swap the
  * bucket fn for nearest-centroid assignment — the plumbing is identical.
  */
object Knn {

  /** The N·Q pair-stage cosine with the norms FACTORED per side: each
    * side's norm (`__qn`/`__cn`) is computed once per ROW before the
    * join, so every candidate pair pays ONE dot instead of the fused
    * dot+both-norms — a 3× FLOP cut on the stage that dominates serving
    * at corpus scale. Bit-equal to `cosine(__qvec, __cvec)` by the
    * [[graft.functions.DotProduct]] contract (VectorFnsSpec pins it),
    * so every oracle hash is unchanged. */
  private def pairCosine: Column =
    round(VectorFns.cosineFactored(
      VectorFns.dotN(col("__qvec"), col("__cvec")),
      col("__qn"), col("__cn")), 6)

  private def withQn(df: DataFrame): DataFrame =
    df.withColumn("__qn", VectorFns.normN(col("__qvec")))

  private def withCn(df: DataFrame): DataFrame =
    df.withColumn("__cn", VectorFns.normN(col("__cvec")))

  /** Top-k cosine neighbors for each query row. Both frames must have
    * (idCol, vecCol); query ids are excluded from their own results.
    * Cross-join caveat: this baseline plans as a BroadcastNestedLoopJoin
    * (no codegen), where the FUSED cosine wins: the factored form's
    * extra per-pair interpreted expressions measured SLOWER at 512-dim
    * (ScaleProbe's BNLJ arm), so the baseline keeps the single fused
    * kernel and the factored pairCosine stays on the codegen'd equi-join
    * family below — the serving path at scale. Bit-equal either way
    * (the DotProduct contract). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec"))
    val cand = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        round(VectorFns.cosine(col("__qvec"), col("__cvec")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }

  /** Trained-centroid IVF search: corpus rows carry their (row-local)
    * nearest-centroid cell, queries probe their `probes` nearest cells,
    * and candidates come from the equi-join on the cell id — the query
    * side (queries × probes rows) broadcasts, so the corpus never
    * shuffles; the per-query top-k window is the single exchange.
    * Recall rises with `probes` (probes = k ⇒ exact). */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], k: Int, probes: Int): DataFrame = {
    val q = withQn(queries
        .select(col(idCol).as("query_id"), col(vecCol).as("__qvec")))
      .withColumn("__cell", explode(KMeans.probeCells(col("__qvec"), cents, probes)))
    val c = withCn(corpus
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec")))
      .withColumn("__cell", KMeans.nearestCentroid(col("__cvec"), cents))
    val cand = c.join(broadcast(q), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", pairCosine)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }

  /** Tree-quantizer IVF search — [[ivfTopK]] with [[KMeans.fitTree]]'s
    * two-level cells, for the k ∝ N regime where a flat centroid table
    * would make ASSIGNMENT the bottleneck: corpus rows pay k1 +
    * k2 cosines (branch, then that branch's leaves), queries pay k1 +
    * branchProbes·k2 to route to their `probes` cells. Candidates come
    * from the equi-join on the global cell id; the query side broadcasts,
    * the corpus never shuffles, the per-query top-k window is the single
    * exchange — identical plumbing to the flat index. */
  def ivfTopKTree(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      tq: KMeans.TreeQuantizer, k: Int, probes: Int,
      branchProbes: Int = 2): DataFrame = {
    val q = withQn(queries
        .select(col(idCol).as("query_id"), col(vecCol).as("__qvec")))
      .withColumn("__cell",
        explode(KMeans.probeCellsTree(col("__qvec"), tq, probes, branchProbes)))
    val c = withCn(corpus
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec")))
      .withColumn("__b", KMeans.nearestCentroid(col("__cvec"), tq.branches))
      .withColumn("__cell",
        col("__b") * tq.k2 + KMeans.leafInBranch(col("__cvec"), col("__b"), tq))
      .drop("__b")
    val cand = c.join(broadcast(q), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", pairCosine)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }

  /** recall@k of an approximate result against the exact baseline: the
    * fraction of true (query, neighbor) pairs the approximate search
    * found. Both frames carry (query_id, neighbor_id) — the shapes
    * [[bruteForceTopK]]/[[ivfTopK]]/[[lshTopK]] emit. The measured-eval
    * discipline of the reference's ML half
    * (`classifier_code/train_flow_classifier_weighted.py:171-185` reports
    * accuracy/F1 on a held-out split at train time) applied to similarity
    * search: an index whose recall nobody measured is not a search
    * structure, it's a rumor. KMeansSpec gates trained IVF at its shipped
    * nprobe on this; RecallProbe sweeps the recall-vs-nprobe tradeoff. */
  def recall(exact: DataFrame, approx: DataFrame): Double = {
    val truth = exact.select("query_id", "neighbor_id")
    val n = truth.count()
    require(n > 0, "empty ground truth")
    val hits = truth.join(approx.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "leftsemi").count()
    hits.toDouble / n
  }

  /** LSH-bucketed variant: candidates restricted to the query's sign
    * bucket. Recall < 1 by construction; nBits trades recall for fanout. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int): DataFrame = {
    val q = withQn(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qvec")))
      .withColumn("__bkt", VectorFns.signBucket(col("__qvec"), nBits))
    val c = withCn(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cvec")))
      .withColumn("__bkt", VectorFns.signBucket(col("__cvec"), nBits))
    val cand = c.join(broadcast(q), Seq("__bkt"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", pairCosine)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "cosine")
  }
}
