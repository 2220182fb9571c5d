package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming SAX window symbolization — q79's streaming twin, and the
  * setting the subsequence-similarity literature actually targets
  * (streams too long to re-window in batch). Each user's purchase
  * stream folds through a 7-deep value ring; every arrival that
  * completes an 8-point window emits that window's SAX word, tagged
  * with the window-start index so replay equality against the batch
  * operator is checkable per (user, widx) row.
  *
  * State: ≤7 doubles + one counter per user — constant, no TTL needed
  * (a real deployment adds one; the batch twin has no notion of it).
  * The word arithmetic is the SAME IEEE double sequence as the batch
  * expression (left-to-right sum, per-element squared deviations,
  * sqrt, pairwise PAA, quartile CASE chain), so words match bit-exactly
  * — asserted in `StreamingSaxSpec`. In-order arrival per user is the
  * caller's contract (micro-batch interiors are sorted here; cross-
  * batch reordering needs the StreamingAsOf watermark-buffer pattern). */
object StreamingSax {

  final case class SaxPoint(userId: Long, tsUs: Long, eventId: Long,
                            v: Double)
  final case class SaxWord(userId: Long, widx: Long, wordId: Long)

  /** The exact batch word function (see RelationalQueries.saxWindows):
    * same fold orders, same breakpoints, same flat-window rule. */
  private[streaming] def wordOf(a: IndexedSeq[Double]): Long = {
    val mean = a.foldLeft(0.0)(_ + _) / 8.0
    val std = math.sqrt(
      a.map(x => (x - mean) * (x - mean)).foldLeft(0.0)(_ + _) / 8.0)
    def sym(i: Int): Long = {
      val paa = (a(i * 2) + a(i * 2 + 1)) / 2.0
      val z = if (std == 0.0) 0.0 else (paa - mean) / std
      if (z < -0.6745) 0L else if (z < 0.0) 1L
      else if (z < 0.6745) 2L else 3L
    }
    sym(0) + 4 * sym(1) + 16 * sym(2) + 64 * sym(3)
  }

  final class SaxWindowProcessor
      extends StatefulProcessor[Long, SaxPoint, SaxWord] {
    @transient private var ring: ListState[Double] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ring = getHandle.getListState[Double]("ring",
        Encoders.scalaDouble, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[SaxPoint],
        timerValues: TimerValues): Iterator[SaxWord] = {
      val pts = rows.toSeq.sortBy(p => (p.tsUs, p.eventId))
      var vals = ring.get().toVector
      var n = if (seen.exists()) seen.get() else 0L
      val out = Vector.newBuilder[SaxWord]
      pts.foreach { p =>
        vals = vals :+ p.v
        n += 1
        if (vals.length == 8) {
          out += SaxWord(user, n - 7, wordOf(vals))
          vals = vals.tail
        }
      }
      ring.put(vals.toArray)
      seen.update(n)
      out.result().iterator
    }
  }

  def saxWords(spark: SparkSession,
      points: Dataset[SaxPoint]): Dataset[SaxWord] = {
    import spark.implicits._
    points.groupByKey(_.userId)
      .transformWithState(new SaxWindowProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
