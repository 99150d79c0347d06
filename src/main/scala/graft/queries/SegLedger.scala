package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-SEGMENT ledgers for the CDC fold family (round 17).
  *
  * The r16 shape rewrote each cumulative ledger (deletes, appends,
  * appended pairs, append qualities) whole every micro-batch —
  * O(churn-since-compaction) write I/O per batch, bounded only by how
  * often a compaction fires. Here each batch APPENDS one segment dir
  * holding only its own contribution (O(batch) write I/O); readers
  * union the committed segments and resolve last-writer-wins per doc
  * at read time, and a compaction truncates the family by vacuuming
  * every segment below its generation id.
  *
  * Layout under `root` (one root per ledger family):
  * {{{
  *   seg-<batchGen>/…parquet + _SUCCESS   // the batch's net contribution
  *   seg-<batchGen>/_meta.json            // {"rows":N} — the size policy's input
  * }}}
  * Commit = parquet's own `_SUCCESS` (single atomic write per segment).
  * Replay discipline matches the generation stores: a re-delivered
  * batch reads segments STRICTLY BELOW its id and overwrites its own
  * segment whole, so folds converge under at-least-once delivery. The
  * row-count meta rides the write itself (observe() — no extra job);
  * it feeds the compaction trigger without ever re-reading a segment.
  */
private[graft] object SegLedger {

  private def segNum(f: java.io.File): Long = f.getName.stripPrefix("seg-").toLong

  /** Committed segments strictly below `below` and strictly ABOVE
    * `floor`, ordinal-sorted. The floor is the latest compacted state's
    * generation id: truncation is a READ RULE, not a filesystem fact —
    * a compaction's post-marker segment vacuum is pure cleanup, so a
    * crash between the marker and the vacuum (or a chained compaction
    * whose predecessor's segments still exist) can never resurrect
    * pre-compaction ledger state. */
  def dirs(root: String, below: Long,
      floor: Long = Long.MinValue): Seq[(Long, java.io.File)] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("seg-") &&
        new java.io.File(f, "_SUCCESS").exists() &&
        segNum(f) < below && segNum(f) > floor)
      .map(f => segNum(f) -> f).sortBy(_._1)

  /** Land batch `id`'s contribution as one segment. The `_meta.json`
    * row count is collected by the write action itself. */
  def append(df: DataFrame, root: String, id: Long): Unit = {
    val o = org.apache.spark.sql.Observation()
    df.observe(o, count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$root/seg-$id")
    val meta = new java.io.File(s"$root/seg-$id/_meta.json")
    // a provably-empty batch frame can lose its CollectMetrics node to
    // AQE empty-propagation — missing metric ⟹ zero rows
    val rows = o.get.get("n").fold(0L)(_.asInstanceOf[Long])
    val w = new java.io.PrintWriter(meta, "UTF-8")
    try w.print(s"""{"rows":$rows}""") finally w.close()
    ()
  }

  /** Union of the committed segments in (`floor`, `below`), each row
    * tagged with its segment ordinal (`__seg` — the last-writer-wins
    * resolution key). `empty` supplies the schema when no segment
    * exists yet. */
  def read(s: SparkSession, root: String, below: Long,
      empty: => DataFrame, floor: Long = Long.MinValue): DataFrame =
    dirs(root, below, floor)
      .map { case (n, f) => s.read.parquet(f.getPath).withColumn("__seg", lit(n)) }
      .reduceOption(_.unionByName(_))
      .getOrElse(empty.withColumn("__seg", lit(0L)))

  /** Total rows across committed segments in (`floor`, `below`) — read
    * from the metas, zero Spark jobs. The compaction trigger's ledger
    * side. */
  def rows(root: String, below: Long, floor: Long = Long.MinValue): Long =
    dirs(root, below, floor).map { case (_, f) =>
      val m = new java.io.File(f, "_meta.json")
      if (!m.exists()) 0L
      else """"rows"\s*:\s*(\d+)""".r.findFirstMatchIn(
          new String(java.nio.file.Files.readAllBytes(m.toPath), "UTF-8"))
        .map(_.group(1).toLong).getOrElse(0L)
    }.sum

  /** Compaction truncation: drop every segment strictly below `cutoff`.
    * Runs only AFTER the compaction's overall commit marker — a replay
    * that re-runs a partial compaction must find its inputs intact. */
  def vacuum(root: String, cutoff: Long): Unit =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("seg-") && segNum(f) < cutoff)
      .foreach(EventQueries.rm)
}
