package graft.streaming

import graft.SparkSpec
import graft.ann.{KMeans, Pq}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The q152 streaming-append contract, pinned without the oracle:
  * (1) the foreachBatch segment writer lands ONE coded micro-segment
  * per micro-batch, and the StreamMetrics segment ledger records each
  * (batchId, rows) with the rows summing to the delta exactly;
  * (2) history ∪ streamed micro-segments is EXACTLY the row set a
  * whole-corpus batch encode produces — the frozen-codebooks append
  * equivalence (PqAppendSpec) surviving arbitrary arrival batching,
  * which it must because encoding is row-local and deterministic.
  */
class SegmentAppendSpec extends SparkSpec {

  test("foreachBatch micro-segments: one per batch, ledger exact, union == whole-corpus encode") {
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val history = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0).select("vec_id", "embedding")
    val deltaN = delta.count()
    val cents = KMeans.fit(history, "vec_id", "embedding", k = 16, iters = 2)
    val cb = Pq.fitResidual(history, "vec_id", "embedding", cents, m = 8, k = 16, iters = 2)

    val root = java.nio.file.Files.createTempDirectory("graft_segappend_spec_").toString
    val in = s"$root/in"
    val parts = 4
    delta.repartitionByRange(parts, col("vec_id")).write.parquet(in)
    val staged = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))

    val sinkName = "graft_segappend_spec"
    StreamMetrics.resetSegments(sinkName)
    val q = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .writeStream.queryName(sinkName)
      .option("checkpointLocation", s"$root/cp")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val seg = s"$root/rows/seg-$id"
        Pq.encode(b, "vec_id", "embedding", cents, cb, residual = true)
          .write.mode("overwrite").parquet(seg)
        StreamMetrics.recordSegment(sinkName, id,
          b.sparkSession.read.parquet(seg).count())
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val ledger = StreamMetrics.segments(sinkName).filter(_._2 > 0)
    assert(ledger.size == staged,
      s"expected one non-empty segment per staged file ($staged), got ${ledger.size}")
    assert(ledger.map(_._2).sum == deltaN,
      s"ledger rows ${ledger.map(_._2).sum} != delta rows $deltaN")

    val streamed = spark.read.option("recursiveFileLookup", "true").parquet(s"$root/rows")
    val union = Pq.encode(history, "vec_id", "embedding", cents, cb, residual = true)
      .unionByName(streamed).localCheckpoint()
    val whole = Pq.encode(emb, "vec_id", "embedding", cents, cb, residual = true)
      .localCheckpoint()
    assert(union.exceptAll(whole).isEmpty && whole.exceptAll(union).isEmpty,
      "history ∪ streamed micro-segments differs from the whole-corpus encode")

    // cleanup: nothing reads root after the checkpointed comparisons
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(root))
  }
}
