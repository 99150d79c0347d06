package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic planted-cluster corpus for measuring ANN recall in the
  * regime real embedding corpora live in. The synthetic embeddings table
  * is near-uniform on the sphere — IVF's WORST case, where cells carve
  * arbitrary boundaries through every query's neighborhood and recall ≈
  * scan fraction. Real text/image embeddings are clustered (that
  * structure is why coarse quantization earns low nprobe at all), so the
  * recall number that justifies the index must be measured on clustered
  * data: row i's vector becomes (1−eps)·anchor(i mod nClusters) +
  * eps·own — nClusters tight bundles whose width eps controls. No RNG
  * anywhere (anchors are the first nClusters embeddings, the blend is
  * pure arithmetic), so every engine and every rerun sees the identical
  * corpus.
  */
object Planted {

  /** Blend `emb` into `nClusters` planted clusters of width `eps`.
    * Output schema matches the input: (idCol, vecCol as double[]). */
  def corpus(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, eps: Double): DataFrame = {
    val anchors: Seq[Seq[Double]] = emb.filter(col(idCol) < nClusters)
      .orderBy(col(idCol))
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .collect().map(r => r.getSeq[Double](0): Seq[Double]).toSeq
    require(anchors.size == nClusters,
      s"corpus has only ${anchors.size} of $nClusters anchor rows")
    emb.select(col(idCol),
      zip_with(
        element_at(typedlit(anchors), (col(idCol) % nClusters + 1).cast("int")),
        transform(col(vecCol), x => x.cast("double")),
        (a, x) => a * (1 - eps) + x * eps).as(vecCol))
  }
}
