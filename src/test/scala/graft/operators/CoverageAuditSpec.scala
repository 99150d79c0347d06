package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q155's three coverage classes on a corpus that actually has all of
  * them — the driver fixtures either cover 1:1 (sf0.01: one vacuous
  * 'both' row) or leave 'embedding_only' empty (sf0.1), so the orphan-
  * embedding arm (stale index entries, the q151 tombstone-candidate
  * class) is pinned here on a synthetic dir. */
class CoverageAuditSpec extends SparkSpec {

  test("coverage audit classifies both / document_only / embedding_only with shares summing to 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cov_").toString
    try {
      // docs 1..5; embeddings 3..7 → both={3,4,5}, doc_only={1,2}, emb_only={6,7}
      (1L to 5L).map(i => (i, s"text $i")).toDF("doc_id", "text")
        .write.parquet(s"$dir/documents.parquet")
      (3L to 7L).map(i => (i, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
        .write.parquet(s"$dir/embeddings.parquet")
      val got = graft.SparkEntry.queries("q155_embedding_coverage_audit")(spark, dir)
        .select(col("coverage_class"), col("n"), col("share"))
        .as[(String, Long, Double)].collect()
      val byClass = got.map(r => r._1 -> r._2).toMap
      assert(byClass == Map("both" -> 3L, "document_only" -> 2L, "embedding_only" -> 2L),
        s"class counts wrong: ${got.toSeq}")
      // each share is rounded to 6 decimals, so the sum can be off by
      // up to classes × 5e-7
      assert(math.abs(got.map(_._3).sum - 1.0) < 1e-5,
        s"shares do not sum to 1: ${got.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
