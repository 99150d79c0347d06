package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-cell arrival memory for UNIFIED streaming semantic dedup (q147):
  * each arriving vector is checked against every PRIOR arrival in its
  * quantizer cell — with no interval limit, closing the gap the
  * stream-stream interval join (q146) leaves open (a near-dup pair
  * whose members arrive further apart than the join interval) — and
  * then enters the cell's state itself, under a TTL.
  *
  * This is the `transformWithState` member of the semantic-dedup family
  * the way [[TwsCdc]] is for CDC: explicit typed state (a ListState of
  * arrivals per cell) where the join operators hold implicit buffers.
  * What the arbitrary-state API buys here is exactly the two things the
  * interval join cannot express: (1) "prior" means ALL prior arrivals
  * still inside the retention horizon, not a fixed event-time interval;
  * (2) the retention horizon is a per-element TTL — the production
  * lever that bounds state per cell at (arrival rate within TTL), not
  * stream length. During an oracle drain the TTL is OFF (see
  * [[CellPairs]]' Scaladoc for why it must be), so nothing expires and
  * the emitted flags replay exactly as the batch rule (q142's oracle);
  * SemPairsStateSpec drives a short-TTL live stream to show expiry
  * actually trims the list.
  *
  * Determinism: "prior" is pinned to vec_id order, not arrival
  * nondeterminism — each batch's rows are processed in ascending
  * vec_id, and the staged drain delivers batches in ascending vec_id
  * ranges, so `dup` = "exists a LOWER-ID same-cell arrival with
  * round(cosine, 6) ≥ τ" — the exact one-pass rule
  * [[graft.dedup.SemDedup]] applies in batch (checked against all
  * lower-id arrivals, accepted or not, which keeps the rule order-free
  * and SQL-replayable). PRODUCTION PRECONDITION for that exactness:
  * vec_id must be assigned monotonically at ingest (the single-writer
  * sequence the ingest path hands out); the drain configuration
  * enforces it hard, the live-TTL configuration only warns (see
  * handleInputRows). Requires the RocksDB state store provider;
  * TimeMode.ProcessingTime (the TTL clock) only when a TTL is set.
  */
object SemPairs {

  /** One arriving vector with its row-locally assigned cell. */
  case class Arrival(cid: Long, vec_id: Long, v: Seq[Double])

  /** The verdict, emitted exactly once per arrival; carries the vector
    * so the downstream history gate can score it without a refetch. */
  case class Verdict(vec_id: Long, cid: Long, dup_in_batch: Boolean, v: Seq[Double])

  /** The same arithmetic as the plan-side cosine kernel
    * ([[graft.functions.CosineSim]]): dot and both norms accumulate
    * left-to-right in double, combined as dot / (√na · √nb) — so a
    * JVM-side decision here is bit-identical to the oracle's
    * list_cosine_similarity (SemPairsStateSpec pins the parity). */
  private[streaming] def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** √(self-dot), for factoring the norms out of the per-cell pair loop
    * (a stored vector's norm is computed once per batch, an arrival's
    * once per arrival — the plan-side DotProduct refactor applied to the
    * processor): cosine(a, b) == dotOnly(a, b) / (sqrtSelfDot(a) ·
    * sqrtSelfDot(b)) on every bit, because [[cosine]] keeps the three
    * accumulators separate and combines in exactly this order
    * (SemPairsStateSpec pins the equality). */
  private[streaming] def sqrtSelfDot(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    math.sqrt(s)
  }

  private[streaming] def dotOnly(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    dot
  }

  /** `ttl = None` disables expiry (pair with TimeMode.None — the
    * oracle-drain configuration: a TTL needs TimeMode.ProcessingTime,
    * under which a transformWithState query keeps scheduling
    * TTL-maintenance micro-batches and Trigger.AvailableNow NEVER
    * TERMINATES — observed: 3,000+ empty batches before the drain was
    * killed. A live production stream runs ProcessingTime + Some(ttl);
    * SemPairsStateSpec drives that configuration with an explicit
    * stop). */
  class CellPairs(tau: Double, ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Arrival, Verdict] {
    @transient private var seen: ListState[Arrival] = _
    // rate-limits the live-TTL contract warning: handleInputRows runs
    // once per CELL key, so a misordered batch spanning many cells would
    // otherwise flood executor stderr with one line per cell — warn once
    // per processor instance (≈ once per task) and stay silent after
    @transient private var warnedOrderViolation = false

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[Arrival]("seen",
        Encoders.product[Arrival], ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[Arrival],
        timerValues: TimerValues): Iterator[Verdict] = {
      // prior = the cell's surviving state plus this batch's rows already
      // processed below — ids kept alongside the vectors so the dup rule
      // can be enforced as stated (strictly LOWER id), not inferred from
      // arrival order: under the drain contract state ids are always
      // lower anyway, but in the live-TTL path an out-of-order or
      // redelivered arrival would otherwise (a) match its own prior copy
      // at cosine 1.0 — a false POSITIVE, not just a missed pair — or
      // (b) be flagged against a higher-id row that arrived earlier
      val priorIds = scala.collection.mutable.HashSet.empty[Long]
      // (id, vector, √self-dot): the stored norm rides the buffer so the
      // pair loop pays one dot per pair (bit-equal — see sqrtSelfDot)
      val prior = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      var maxStateId = Long.MinValue
      val it = seen.get()
      while (it.hasNext) {
        val a = it.next()
        if (a.vec_id > maxStateId) maxStateId = a.vec_id
        priorIds += a.vec_id
        val av = a.v.toArray
        prior += ((a.vec_id, av, sqrtSelfDot(av)))
      }
      val out = Seq.newBuilder[Verdict]
      val batch = rows.toSeq.sortBy(_.vec_id)
      // "dup = lower-id prior arrival" rests on a cross-module contract
      // (stageRangedDrain's ascending vec_id ranges + file-source mtime
      // order). In the DRAIN configuration (no TTL) that contract is
      // guaranteed by stageRangedDrain, so a violation is a staging bug:
      // fail loudly instead of silently flipping verdicts. In the LIVE
      // configuration (TTL set) no staging contract exists — a replayed
      // backfill, an at-least-once redelivery (equal vec_id), or a
      // multi-writer id source can legitimately arrive out of order, and
      // a throw here would kill the stream UNRECOVERABLY (restart
      // replays the same batch into the same require) — so warn once
      // per processor instance and degrade ONE-SIDEDLY: the strictly-lower-
      // id comparison below still holds (no self-match on redelivery, no
      // flag against a higher-id row), redelivered ids are not re-added
      // to state, and the only degradation is missed pairs against
      // later-id rows not yet seen at processing time.
      batch.headOption.foreach { first =>
        if (maxStateId >= first.vec_id) {
          val msg = s"CellPairs drain-order contract violated for cell $key: " +
            s"state holds vec_id $maxStateId >= batch min ${first.vec_id}"
          if (ttl.isEmpty) throw new IllegalArgumentException(msg)
          else if (!warnedOrderViolation) {
            warnedOrderViolation = true
            System.err.println(s"[graft] WARN (live-TTL path, continuing): $msg")
          }
        }
      }
      batch.foreach { a =>
        val av = a.v.toArray
        val an = sqrtSelfDot(av) // once per arrival, not per stored partner
        val dup = prior.exists(p =>
          p._1 < a.vec_id &&
            graft.functions.VectorKernels.round6(
              dotOnly(p._2, av) / (p._3 * an)) >= tau)
        out += Verdict(a.vec_id, key, dup, a.v)
        if (!priorIds.contains(a.vec_id)) {
          seen.appendValue(a) // every NEW arrival enters state — the one-
          priorIds += a.vec_id // pass rule, idempotent under redelivery
          prior += ((a.vec_id, av, an))
        }
      }
      out.result().iterator
    }
  }
}
