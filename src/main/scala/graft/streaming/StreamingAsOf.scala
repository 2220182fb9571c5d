package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming AS-OF join — the event-time, out-of-order-tolerant form of
  * [[graft.plans.AsOfJoinPlan]] that Structured Streaming has no native
  * operator for (stream-stream joins support range predicates but emit
  * EVERY in-range pair, not "the most recent one").
  *
  * Semantics (exact, replay-deterministic): for every left event, the
  * right event of the same key with the LARGEST `(ts, id)` such that
  * `rightTs <= leftTs`, or null if none — resolved only once the
  * WATERMARK passes the left's timestamp, because until then an earlier
  * right event could still arrive. Late-but-within-watermark right rows
  * therefore correctly win over rows that arrived first (arrival order
  * never matters, only event time — asserted in `StreamingAsOfSpec`).
  *
  * State per key (RocksDB column families):
  *  - `pending`: left events not yet past the watermark — bounded by the
  *    in-flight watermark window;
  *  - `rights`: right events still matchable. A right row older than the
  *    watermark can only be the match for a future left as the LATEST such
  *    row (as-of looks back arbitrarily far, but only to the most recent),
  *    so on every resolution the buffer compacts to ONE pre-watermark row +
  *    the in-flight window — O(window) state, not O(stream).
  *
  * Resolution runs on event-time TIMERS: each batch arms a timer at the
  * earliest unresolved left timestamp; when the watermark passes it, the
  * expired-timer callback merges (sorted pending) × (sorted rights) in one
  * pass, emits matches for every left `<= watermark`, prunes both buffers,
  * and re-arms for the new earliest pending left.
  */
object StreamingAsOf {

  /** Tagged input event: `side` 0 = left (probe), 1 = right (reference). */
  final case class AsOfEvent(key: String, ts: java.sql.Timestamp,
      side: Int, id: Long)
  final case class AsOfMatch(key: String, leftId: Long, leftMs: Long,
      rightId: Option[Long], rightMs: Option[Long])

  /** Internal buffered event (public only for encoder derivation). */
  final case class Ev(ms: Long, id: Long)

  final class AsOfProcessor
      extends StatefulProcessor[String, AsOfEvent, AsOfMatch] {
    @transient private var pending: ListState[Ev] = _
    @transient private var rights: ListState[Ev] = _
    @transient private var timerMs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[Ev]("pending",
        Encoders.product[Ev], TTLConfig.NONE)
      rights = getHandle.getListState[Ev]("rights",
        Encoders.product[Ev], TTLConfig.NONE)
      timerMs = getHandle.getValueState[Long]("timer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Merge-resolve every pending left with ts <= watermark; compact the
      * right buffer; return the emitted matches. */
    private def resolve(key: String, wm: Long): Iterator[AsOfMatch] = {
      val lefts = pending.get().toArray.sortBy(e => (e.ms, e.id))
      val (ripe, unripe) = lefts.partition(_.ms <= wm)
      if (ripe.isEmpty) { rearm(unripe); return Iterator.empty }
      val rs = rights.get().toArray.sortBy(e => (e.ms, e.id))
      val out = Array.newBuilder[AsOfMatch]
      var ri = 0
      var held: Ev = null
      ripe.foreach { l =>
        while (ri < rs.length && rs(ri).ms <= l.ms) { held = rs(ri); ri += 1 }
        out += (if (held == null) AsOfMatch(key, l.id, l.ms, None, None)
          else AsOfMatch(key, l.id, l.ms, Some(held.id), Some(held.ms)))
      }
      // prune rights: future lefts have ts > wm, so of the rows with
      // ms <= wm only the LATEST can ever match again
      val (past, inflight) = rs.partition(_.ms <= wm)
      val kept = (if (past.isEmpty) inflight
        else past.maxBy(e => (e.ms, e.id)) +: inflight)
      rights.clear()
      if (kept.nonEmpty) rights.put(kept)
      pending.clear()
      if (unripe.nonEmpty) pending.put(unripe)
      rearm(unripe)
      out.result().iterator
    }

    private def rearm(unripe: Array[Ev]): Unit = {
      if (timerMs.exists()) {
        getHandle.deleteTimer(timerMs.get()); timerMs.clear()
      }
      if (unripe.nonEmpty) {
        // fire as soon as the watermark passes the earliest pending left
        val at = unripe.map(_.ms).min + 1
        getHandle.registerTimer(at)
        timerMs.update(at)
      }
    }

    override def handleInputRows(key: String, rows: Iterator[AsOfEvent],
        timerValues: TimerValues): Iterator[AsOfMatch] = {
      rows.foreach { e =>
        val ev = Ev(e.ts.getTime, e.id)
        if (e.side == 0) pending.appendValue(ev) else rights.appendValue(ev)
      }
      // anything already past the current watermark resolves immediately
      resolve(key, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[AsOfMatch] = {
      if (timerMs.exists() &&
          expiredTimerInfo.getExpiryTimeInMs() == timerMs.get()) {
        timerMs.clear()
        resolve(key, timerValues.getCurrentWatermarkInMs())
      } else Iterator.empty // superseded timer
    }
  }

  /** As-of join a watermarked [[AsOfEvent]] stream (tag left rows side=0,
    * right rows side=1 before the union). */
  def asofStream(spark: SparkSession,
      events: Dataset[AsOfEvent]): Dataset[AsOfMatch] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .transformWithState(new AsOfProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
