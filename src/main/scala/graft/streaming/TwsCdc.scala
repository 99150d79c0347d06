package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Last-writer-wins CDC apply as a Spark 4.x [[StatefulProcessor]] —
  * the `transformWithState` member of the CDC triptych (q97 foreachBatch
  * merge, q120 built-in `max(struct)` aggregation, q133 this processor).
  *
  * Semantics are identical to q120's aggregate: per entity, keep the op
  * with the greatest (sec, event_id) and emit it whenever it changes.
  * What the arbitrary-state API buys over the built-in agg is explicit
  * control: a typed ValueState cell per entity, emission only from
  * `handleInputRows` (update mode re-emits only touched entities), and
  * room to grow into timers / TTL / Map state where an aggregate cannot
  * follow. State bound, stated precisely: one cell per entity EVER
  * SEEN — a 'D' deliberately keeps a tombstone cell (clearing it would
  * let a late stale 'U' resurrect the entity), the same retention
  * q120's aggregate has implicitly. Under entity churn that is
  * entities-ever, not live entities; the production lever is exactly
  * the TTLConfig this API exposes (expire tombstones once the source's
  * lateness horizon has passed), which the aggregate form cannot
  * express. Requires the RocksDB state store provider (the TWS
  * operator's native backend).
  *
  * Streaming form of SURVEY §2 A2/W6 (argmax-per-group — the same
  * "latest row wins" shape the reference applies with data.table
  * `max()` per group, e.g. code/07_process_project_data.R:143), on the
  * 4.x stateful API.
  */
object TwsCdc {
  /** One CDC op; also the emitted record (last applied op per entity). */
  case class Op(entity: Long, sec: Long, event_id: Long, op: String, value: Double)

  /** (sec, event_id) lexicographic — event_id is unique, so total. */
  private def later(a: Op, b: Op): Boolean =
    a.sec > b.sec || (a.sec == b.sec && a.event_id > b.event_id)

  class LastWriterWins extends StatefulProcessor[Long, Op, Op] {
    @transient private var last: ValueState[Op] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Op]("last", Encoders.product[Op], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Op],
        timerValues: TimerValues): Iterator[Op] = {
      var cur = if (last.exists()) last.get() else null
      var changed = false
      rows.foreach { r =>
        if (cur == null || later(r, cur)) { cur = r; changed = true }
      }
      if (changed) { last.update(cur); Iterator.single(cur) }
      else Iterator.empty
    }
  }
}
