package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Post-drain state-store metrics for the inventory's streaming queries.
  *
  * The drains run INSIDE each query's build function and return only the
  * sink read, so the `StreamingQueryProgress` evidence (how much state
  * the store held, whether the watermark actually evicted) would die
  * with the local `StreamingQuery` reference. Each drain records a
  * snapshot here, keyed by its sink name, and the scale probes read it
  * back to gate the BOUNDED-STATE claims at N× — state rows per
  * key-horizon, not wall time, is what the streaming family promises
  * (StreamingStateSpec pins the same invariants on synthetic batches;
  * this registry lets SpineProbe re-assert them on the scaled tables).
  */
object StreamMetrics {

  /** `maxRowsTotal` = the PEAK across micro-batches of the sum over all
    * state operators' `numRowsTotal` (the store's high-water mark);
    * `removed` = total watermark evictions over the drain; `operators` =
    * state operators in the query (2 for the chained q137). */
  final case class Snapshot(maxRowsTotal: Long, removed: Long, operators: Int)

  private val snaps = scala.collection.concurrent.TrieMap.empty[String, Snapshot]

  /** Reads `q.recentProgress` — a ring buffer capped at
    * spark.sql.streaming.numRecentProgressUpdates, which
    * EventQueries.streamSession raises to 10,000 so no drain in the
    * inventory can outrun it and silently drop early batches from the
    * peak/removed figures. */
  def record(name: String, q: StreamingQuery): Unit = {
    val progress = q.recentProgress.toSeq
    val perBatch = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
    snaps(name) = Snapshot(
      if (perBatch.isEmpty) 0L else perBatch.max,
      progress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum,
      progress.map(_.stateOperators.length).foldLeft(0)(_ max _))
    progressJson(name) = progress.map(_.json)
  }

  def get(name: String): Option[Snapshot] = snaps.get(name)

  /** Raw per-batch progress JSON (durationMs breakdown etc.) for the
    * dev probes — the `recentProgress` ring dies with the local query
    * reference, so the snapshot keeps the evidence the way `snaps`
    * keeps the state totals. A drain is a handful of batches; the cost
    * is a few KB per sink name. */
  private val progressJson = scala.collection.concurrent.TrieMap.empty[String, Seq[String]]

  def progress(name: String): Seq[String] = progressJson.getOrElse(name, Nil)

  def progressNames: Seq[String] = progressJson.keys.toSeq.sorted

  /** Per-drain micro-SEGMENT ledger (q152): each foreachBatch segment
    * writer records (batchId, rows landed) as it commits, giving the
    * probes the evidence the state-store metrics can't — a foreachBatch
    * encode query has NO state operators, so its scaling claim lives in
    * the ledger instead: segment COUNT tracks the trigger cadence
    * (flat in arrival RATE — the q149 compaction cadence is an
    * operational knob, not a consequence of volume) while rows per
    * segment carry the volume. Reset at drain start: probes invoke
    * each query several times and the ledger must describe one drain. */
  private val segs = scala.collection.concurrent.TrieMap.empty[String, Vector[(Long, Long)]]

  def resetSegments(name: String): Unit = { segs.remove(name); () }

  /** Micro-batches commit sequentially WITHIN a drain, but nothing
    * stops two concurrently running queries from registering the same
    * sink name — so the append is an atomic read-modify-write
    * (updateWith) rather than getOrElse+put, which would silently drop
    * an entry under that race. */
  def recordSegment(name: String, batchId: Long, rows: Long): Unit = {
    segs.updateWith(name) {
      case Some(v) => Some(v :+ ((batchId, rows)))
      case None    => Some(Vector((batchId, rows)))
    }
    ()
  }

  def segments(name: String): Vector[(Long, Long)] = segs.getOrElse(name, Vector.empty)
}
