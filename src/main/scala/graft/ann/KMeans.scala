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

  /** Nearest-centroid id as a row-local expression (argmax by
    * (rounded cosine, -cid) over an inline struct array). */
  def nearestCentroid(vec: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val entries = cents.map { case (cid, c) =>
      struct(round(VectorFns.cosine(vec, typedlit(c)), 6).as("sim"),
        lit(-cid).as("mcid"))
    }
    (-array_max(array(entries: _*)).getField("mcid")).cast("int")
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
}
