package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming per-source document cap — t56's quota discipline at INGEST
  * (the RefinedWeb/CCNet "no domain exceeds its quota" rule applied as
  * docs arrive, keep-best-by-quality): per source the processor holds
  * the ≤cap best docs under the (quality DESC, doc_id ASC) total order;
  * an arrival is admitted if the quota has room or it beats the current
  * worst kept doc, which is evicted and reported — so a downstream
  * consumer maintains the materialized kept set by applying deltas.
  *
  * Bounded keep-best under a total order is replay-invariant (the
  * q89/[[StreamingPrioritySample]] argument with an EXPLICIT quality
  * priority instead of the hash-derived one): after full replay the
  * held set equals the batch window selection exactly — any arrival
  * order, any batch split — because the greedy admit/evict step
  * preserves "state = top-cap of everything seen". Batch t56 derives
  * the cap from corpus statistics (80% of the mean source size); the
  * operational streaming form takes the quota as CONFIGURATION — the
  * spec feeds the batch-derived number in and asserts the per-source
  * (n_kept, q_floor, kept_tokens) stats equal the oracle-gated t56
  * rows bit-for-bit.
  *
  * At 100 TB ingest: sources are the state keys, so the stateful
  * shuffle is a rebalance by source and a hot domain bounds at cap
  * entries (24 bytes each) regardless of arrival volume — state never
  * grows with the stream. */
object StreamingSourceCap {

  final case class CapOffer(source: String, docId: Long, q: Long,
      nTokens: Long)
  final case class CapDelta(source: String, docId: Long, q: Long,
      admitted: Boolean, evicted: Long, size: Int)
  final case class Kept(q: Long, docId: Long, nTokens: Long)

  final class SourceCapProcessor(cap: Int)
      extends StatefulProcessor[String, CapOffer, CapDelta] {
    // cap is caller-supplied configuration; cap <= 0 would make the
    // over-cap branch read pts.last on an empty kept vector and throw
    // NoSuchElementException on the first arrival — fail at construction
    // instead, where the misconfiguration is attributable.
    require(cap >= 1, s"source cap must be >= 1, got $cap")
    @transient private var kept: ListState[Kept] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      kept = getHandle.getListState[Kept]("kept",
        Encoders.product[Kept], TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[CapOffer],
        timerValues: TimerValues): Iterator[CapDelta] = {
      var pts = kept.get().toVector
      // deterministic within-batch processing order (doc_id asc) so the
      // emitted delta sequence is replay-stable for a fixed batching
      val out = rows.toSeq.sortBy(_.docId).map { o =>
        val e = Kept(o.q, o.docId, o.nTokens)
        if (pts.size < cap) {
          pts = (pts :+ e).sortBy(p => (-p.q, p.docId))
          CapDelta(source, o.docId, o.q, admitted = true, -1L, pts.size)
        } else {
          val worst = pts.last
          val beats = o.q > worst.q ||
            (o.q == worst.q && o.docId < worst.docId)
          if (beats) {
            pts = (pts.init :+ e).sortBy(p => (-p.q, p.docId))
            CapDelta(source, o.docId, o.q, admitted = true,
              worst.docId, pts.size)
          } else {
            CapDelta(source, o.docId, o.q, admitted = false, -1L, pts.size)
          }
        }
      }
      kept.put(pts.toArray)
      out.iterator
    }
  }

  def sourceCapTws(spark: SparkSession, docs: Dataset[CapOffer],
      cap: Int): Dataset[CapDelta] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new SourceCapProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }
}
