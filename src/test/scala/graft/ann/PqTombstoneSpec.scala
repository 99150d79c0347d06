package graft.ann

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The q151 delete contract — the LSM half q148/q149 leave open:
  * (1) SERVING with a tombstone anti-join returns exactly what a
  * physically-rebuilt index without the deleted rows returns (the
  * anti-join is a complete delete, not a best-effort mask); (2)
  * compaction with the same tombstone set PHYSICALLY drops the rows —
  * post-compact row set == pre-compact minus tombstones, zero
  * tombstoned ids at rest; (3) a tombstoned id can never be returned
  * as a neighbor through either path.
  */
class PqTombstoneSpec extends SparkSpec {

  test("tombstone anti-join serving == compacted physical drop; deleted ids never served") {
    val emb = Planted.corpus(Tables.embeddings(spark, sf),
      "vec_id", "embedding", nClusters = 32, eps = 0.15).localCheckpoint()
    val history = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val cents = KMeans.fit(history, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.fitResidual(history, "vec_id", "embedding", cents, m = 8, k = 16, iters = 2)
    val segs = Seq(
      Pq.encode(history, "vec_id", "embedding", cents, cb, residual = true),
      Pq.encode(delta, "vec_id", "embedding", cents, cb, residual = true))
    val union = segs.reduce(_ unionByName _).localCheckpoint()
    val tomb = emb.filter(col("vec_id") % 7 === 3).select("vec_id")

    // (2) compaction physically drops: row set == union minus tombstones
    val compacted = Pq.compactIndex(segs, tombstones = Some(tomb)).localCheckpoint()
    assert(compacted.filter(col("vec_id") % 7 === 3).isEmpty,
      "compaction left tombstoned rows at rest")
    val expected = union.join(tomb, Seq("vec_id"), "left_anti")
    assert(compacted.exceptAll(expected).isEmpty && expected.exceptAll(compacted).isEmpty,
      "post-compact row set != pre-compact minus tombstones")

    // (1) anti-join serving == compacted serving, with and without the
    // probed-cell scan prefilter (q149's serving shape)
    val queries = emb.filter(col("vec_id") < 20)
    def search(idx: org.apache.spark.sql.DataFrame, pre: Boolean = false) =
      Pq.ivfPqTopKFromIndex(idx, emb, queries, "vec_id", "embedding",
          cents, cb, k = 5, probes = 8, r = 30, residual = true,
          prefilterCells = pre)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val served = search(Pq.withoutTombstones(union, tomb))
    assert(served == search(compacted) && served == search(compacted, pre = true),
      "anti-join serving diverges from the physically-compacted index")

    // (3) no deleted id is ever served
    assert(!served.exists { case (_, _, n) => n % 7 == 3 },
      "a tombstoned vec_id was returned as a neighbor")
    // and the delete is visible: the full index DOES serve some id the
    // tombstoned index cannot (the fixture deletes 1/7 of the corpus,
    // so some top-5 neighbor must have been displaced)
    assert(search(union) != served,
      "tombstones did not change any search result — fixture too weak to prove the delete")
  }
}
