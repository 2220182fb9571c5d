package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming weighted priority sampling — the incremental twin of q89's
  * batch bottom-k-by-(hash div w) sample, maintained per stratum as docs
  * arrive (the reservoir a continuously-ingesting curation run keeps so
  * a "representative weighted subset" query never rescans the corpus).
  *
  * Each arrival gets an immediate verdict: admitted if the stratum's
  * sample has room or the arrival's priority beats the current k-th,
  * with the displaced doc reported as `evicted` — so the downstream
  * consumer can maintain the materialized sample by applying deltas.
  * Priorities are the SAME md5-derived hash60(doc_id) div w as the batch
  * plan ([[TextOps.hash60Scala]] is bit-identical to the Column form),
  * so after full replay the held state equals batch q89's sample
  * exactly — arrival ORDER never matters because (prio, docId) is a
  * total order and bottom-k under a total order is replay-invariant.
  * State per stratum is ≤k entries (24 bytes each), not the stream.
  *
  * At 100 TB ingest: strata (sources) are the keys, so the stateful
  * shuffle is a rebalance by source; a hot source bounds at k entries of
  * state regardless of arrival volume. */
object StreamingPrioritySample {

  final case class DocOffer(source: String, docId: Long, w: Long)
  final case class SampleDelta(source: String, docId: Long, prio: Long,
      admitted: Boolean, evicted: Long, size: Int)
  final case class Entry(prio: Long, docId: Long, w: Long)

  final class PrioritySampleProcessor(k: Int)
      extends StatefulProcessor[String, DocOffer, SampleDelta] {
    @transient private var sample: ListState[Entry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sample = getHandle.getListState[Entry]("sample",
        Encoders.product[Entry], TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[DocOffer],
        timerValues: TimerValues): Iterator[SampleDelta] = {
      var pts = sample.get().toVector
      val out = rows.toSeq.sortBy(_.docId).map { o =>
        val prio = TextOps.hash60Scala(o.docId.toString) / math.max(o.w, 1L)
        val e = Entry(prio, o.docId, o.w)
        if (pts.size < k) {
          pts = (pts :+ e).sortBy(p => (p.prio, p.docId))
          SampleDelta(source, o.docId, prio, admitted = true, -1L, pts.size)
        } else {
          val worst = pts.last
          val beats = prio < worst.prio ||
            (prio == worst.prio && o.docId < worst.docId)
          if (beats) {
            pts = (pts.init :+ e).sortBy(p => (p.prio, p.docId))
            SampleDelta(source, o.docId, prio, admitted = true,
              worst.docId, pts.size)
          } else {
            SampleDelta(source, o.docId, prio, admitted = false, -1L, pts.size)
          }
        }
      }
      sample.put(pts.toArray)
      out.iterator
    }
  }

  def prioritySampleTws(spark: SparkSession, docs: Dataset[DocOffer],
      k: Int): Dataset[SampleDelta] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new PrioritySampleProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
