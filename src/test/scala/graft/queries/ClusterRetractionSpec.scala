package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** Retraction semantics for the maintained dedup clusters (q181/q185)
  * and the survivor manifest (q182), pinned on inputs small enough to
  * verify by hand. The sf-scale oracle checks prove engine == closure
  * over the post-delete corpus; these pin the three behaviors that
  * matter for a forget-request: a cluster SPLITS when a cut vertex is
  * deleted, a cluster DISSOLVES when deletion leaves no edges, and a
  * deleted survivor is RE-ELECTED from the remainder by quality. */
class ClusterRetractionSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("retractedTouchedLabels: deleting a cut vertex splits the chain") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val deleted = Seq(3L).toDF("doc_id")
    val out = DedupQueries.retractedTouchedLabels(edges, deleted)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L),
      s"chain minus its cut vertex must split into two components, got $out")
  }

  test("retractedTouchedLabels: deleting a pair's member dissolves the cluster") {
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = DedupQueries.retractedTouchedLabels(edges, Seq(1L).toDF("doc_id"))
      .as[(Long, Long)].collect()
    assert(out.isEmpty, // the surviving member has no edges ⇒ no label row
      s"pair minus one member must leave NO labeled docs, got ${out.toSeq}")
  }

  /** Micro-corpus keyed to the fixture delete rule (doc_id % 13 == 3):
    * 3, 16, 29, 42 are deleted. Identical texts share a simhash
    * (hamming 0 ⇒ a pair); the double-spaced variant keeps the SAME
    * token stream (same simhash) but scores higher quality (longer raw
    * text), exactly the q174 fixture trick. */
  private def retractionCorpus(): String = {
    val t1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val t1hq = (1 to 30).map(i => s"alpha$i").mkString("  ") // same tokens, higher quality
    val t2 = (1 to 30).map(i => s"beta$i").mkString(" ")
    val t3 = (1 to 30).map(i => s"gamma$i").mkString(" ")
    val dir = Files.createTempDirectory("graft_retraction_spec_").toString
    Seq(
      (1L, t1, "en", "src0"),   // cluster {1, 2, 16}; 16 is the quality survivor
      (2L, t1, "en", "src0"),
      (16L, t1hq, "en", "src0"), // 16 % 13 == 3 → deleted ⇒ re-elect 1
      (4L, t2, "en", "src0"),   // untouched pair {4, 5} — pure pass-through
      (5L, t2, "en", "src0"),
      (3L, "a lone deleted document about nothing shared", "en", "src0"), // deleted singleton
      (6L, "a lone surviving document about nothing shared here", "en", "src0"),
      (29L, t3, "en", "src0"),  // both members deleted ⇒ cluster dissolves
      (42L, t3, "en", "src0"))
      .map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q181/q185: deletes shrink, dissolve, and pass through — batch == streamed") {
    val dir = retractionCorpus()
    val expected = Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L)
    val batch = q("q181_components_retraction", dir)
      .as[(Long, Long)].collect().toMap
    assert(batch == expected, s"got $batch")
    val streamed = q("q185_stream_components_retraction", dir)
      .as[(Long, Long)].collect().toMap
    assert(streamed == expected, s"streamed fold diverged from batch: $streamed")
  }

  test("q182: a deleted survivor is re-elected; untouched manifest rows pass through") {
    val dir = retractionCorpus()
    val out = q("q182_survivor_reelection", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((1L, 2L)), // lost quality-survivor 16 → re-elected min-id 1 of {1, 2}
      4L -> ((4L, 2L)), // untouched cluster passes through
      6L -> ((6L, 1L))  // untouched singleton passes through
      // 3 (deleted singleton) and 29/42 (dissolved pair) have no rows
    ), s"got $out")
  }
}
