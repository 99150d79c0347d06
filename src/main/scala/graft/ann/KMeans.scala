package graft.ann

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd k-means over an embedding column —
  * the trained coarse quantizer for IVF search (the reference's ANN
  * surface stops at precomputed partitions; this is the scale path that
  * builds them).
  *
  * Every step is pinned so a SQL engine can replay it bit-for-bit:
  * init = the k lowest-id vectors; assignment = argmax of
  * round(cosine, 6) with lowest-centroid-id tiebreak; new centroid =
  * per-dimension mean rounded to 6; an emptied cluster keeps its
  * previous centroid.
  *
  * Scale shape: centroids live on the driver (k·dim doubles) and enter
  * the plan as literals, so ASSIGNMENT IS ROW-LOCAL — no crossJoin, no
  * shuffle. Each Lloyd iteration costs one partial-agg shuffle of the
  * posexploded (cluster, dim, value) rows; k and dim bound the reduce
  * side regardless of corpus size.
  */
object KMeans {

  /** Version of the pinned deterministic training recipe (init rule,
    * rounding, tiebreaks, empty-cell handling). Bump on ANY change to
    * the arithmetic above — persisted-index cache keys (q134) embed it,
    * so a recipe change invalidates staged indexes instead of silently
    * serving geometry trained under the old rules. */
  val recipeVersion = 1

  /** Nearest-centroid id as a row-local expression: argmax by
    * (rounded cosine, -cid), evaluated by the native
    * [[graft.functions.VectorKernels.argmaxCosine]] kernel (one fused
    * loop per row; identical arithmetic to the composed
    * array_max-over-structs form it replaced — VectorFnsSpec pins the
    * equivalence). Centroid ids must be their positions 0..k-1, which
    * every trainer/loader in this package guarantees. */
  def nearestCentroid(vec: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    require(cents.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "centroid ids must be 0..k-1 in order")
    graft.functions.VectorKernels.argmaxCosine(vec, cents.map(_._2))
  }

  /** The query-side router: the `probes` nearest centroid ids, best
    * first (sim desc, cid asc) — row-local, same argmax arithmetic. */
  def probeCells(vec: Column, cents: Seq[(Int, Seq[Double])], probes: Int): Column = {
    val entries = cents.map { case (cid, c) =>
      struct((-round(VectorFns.cosine(vec, typedlit(c)), 6)).as("nsim"),
        lit(cid).as("cid"))
    }
    transform(slice(array_sort(array(entries: _*)), 1, probes), x => x.getField("cid"))
  }

  /** The tree-routed query side: score all k1 branches (k1 cosines),
    * keep the best `branchProbes`, score only THOSE branches' leaves
    * (≤ branchProbes·k2 more cosines), and return the `probes` best
    * global cell ids (b·k2 + leafIdx), best first — sim desc, cell asc,
    * the [[probeCells]] determinism. Routing cost is k1 + branchProbes·k2
    * per query instead of the flat quantizer's k1·k2 — the reason the
    * tree is the production path once cell count ∝ N. */
  def probeCellsTree(vec: Column, tq: TreeQuantizer,
      probes: Int, branchProbes: Int): Column = {
    val branchScored = tq.branches.map { case (b, c) =>
      struct((-round(VectorFns.cosine(vec, typedlit(c)), 6)).as("nsim"),
        lit(b).as("b"))
    }
    val topBranches = transform(
      slice(array_sort(array(branchScored: _*)), 1, branchProbes),
      x => x.getField("b"))
    val leafScored = flatten(transform(topBranches, b =>
      transform(element_at(typedlit(tq.leaves), (b + 1).cast("int")),
        (c, i) => struct((-round(VectorFns.cosine(vec, c), 6)).as("nsim"),
          (b * tq.k2 + i).as("cell")))))
    transform(slice(array_sort(leafScored), 1, probes), x => x.getField("cell"))
  }

  /** Train k centroids with `iters` Lloyd rounds. `vecCol` may be
    * float[] or double[]; math runs in double. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    val v = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    var cents: Seq[(Int, Seq[Double])] = v.orderBy(col("__id")).limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
    for (_ <- 1 to iters) {
      val means = v
        .withColumn("__c", nearestCentroid(col("__v"), cents))
        .select(col("__c"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy("__c", "__d").agg(avg("__x").as("__mu"))
        .groupBy("__c")
        .agg(transform(array_sort(collect_list(struct(col("__d"), col("__mu")))),
          t => round(t.getField("__mu"), 6)).as("__cent"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cents = cents.map { case (cid, prev) => (cid, means.getOrElse(cid, prev)) }
    }
    cents
  }

  /** Two-level coarse quantizer: `branches` are the level-1 centroids,
    * `leaves(b)` the level-2 centroids inside branch b (1..k2 of them —
    * an under-populated branch trains fewer, an empty one keeps the
    * branch centroid as its single leaf). Global cell id =
    * b * k2 + leafIndex, always < k1 * k2. */
  final case class TreeQuantizer(
      branches: Seq[(Int, Seq[Double])], leaves: Seq[Seq[Seq[Double]]], k2: Int)

  /** Nearest leaf WITHIN a known branch: the native argmax kernel scores
    * only the row's own branch's ≤k2 leaves — assignment is k1 + k2
    * cosines per row instead of the flat quantizer's k1·k2. Same
    * argmax/tiebreak arithmetic as [[nearestCentroid]] (sim desc, leaf
    * index asc). Column expressions cannot let-bind, so compute the
    * branch into its own column first and pass THAT — inlining
    * nearestCentroid here would re-evaluate its k1 cosines a second time
    * per row. */
  def leafInBranch(vec: Column, branch: Column, tq: TreeQuantizer): Column =
    graft.functions.VectorKernels.argmaxCosineBy(vec, branch, tq.leaves)

  /** Train the two-level tree: level 1 = [[fit]] with k1; level 2 runs
    * the same deterministic Lloyd recipe for ALL branches at once (init =
    * the k2 lowest-id vectors of each branch, per-dimension means rounded
    * to 6, an emptied leaf keeps its previous centroid) — each iteration
    * is still ONE partial-agg shuffle, now keyed by (branch, leaf). */
  def fitTree(corpus: DataFrame, idCol: String, vecCol: String,
      k1: Int, k2: Int, iters: Int): TreeQuantizer = {
    import org.apache.spark.sql.expressions.Window
    val l1 = fit(corpus, idCol, vecCol, k1, iters)
    val v = corpus.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
      .withColumn("__b", nearestCentroid(col("__v"), l1))
      // __b never changes across the level-2 iterations, but each of the
      // init collect and the per-iteration means collects is its own
      // action — left lazy they would re-run the N·k1-cosine branch
      // assignment every time (the same re-derivation class SemDedup's
      // incremental path measured at 22×); cut it once
      .localCheckpoint(false)
    val w = Window.partitionBy("__b").orderBy("__id")
    val init = v.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k2)
      .select("__b", "__rn", "__v").collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getSeq[Double](2): Seq[Double]).toSeq)
      .toMap
    var leaves: Seq[Seq[Seq[Double]]] = l1.map { case (b, cent) =>
      init.getOrElse(b, Seq(cent))
    }
    for (_ <- 1 to iters) {
      val tq = TreeQuantizer(l1, leaves, k2)
      val means = v
        .withColumn("__l", leafInBranch(col("__v"), col("__b"), tq))
        .select(col("__b"), col("__l"), posexplode(col("__v")).as(Seq("__d", "__x")))
        .groupBy("__b", "__l", "__d").agg(avg("__x").as("__mu"))
        .groupBy("__b", "__l")
        .agg(transform(array_sort(collect_list(struct(col("__d"), col("__mu")))),
          t => round(t.getField("__mu"), 6)).as("__cent"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      leaves = leaves.zipWithIndex.map { case (ls, b) =>
        ls.zipWithIndex.map { case (prev, l) => means.getOrElse((b, l), prev) }
      }
    }
    TreeQuantizer(l1, leaves, k2)
  }
}
