package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming Pareto-frontier maintenance — the incremental twin of
  * q82's batch skyline (minimize price, maximize qty; ties on both
  * dimensions survive together).
  *
  * Contract: each arriving offer gets an immediate verdict — `kept` if no
  * frontier point dominates it at arrival time — and the maintained
  * frontier prunes every stored point the arrival dominates. The VERDICT
  * depends on arrival order (an offer dominated only by a later arrival
  * was correctly kept when it arrived), but the FINAL frontier does not:
  * a point dominated by any seen point is either rejected at arrival or
  * pruned when its dominator lands, so after full replay the frontier
  * equals the batch skyline of everything seen — asserted against
  * `RelationalQueries.paretoSkyline` in the spec, duplicates included.
  *
  * State is the frontier itself: a ListState of points with pairwise
  * incomparable (price, qty), i.e. strictly increasing in BOTH once
  * sorted — so its size is bounded by the number of distinct prices on
  * the frontier, not by the stream. In-batch arrivals fold in
  * (tsMs, offerId) order for replay determinism.
  *
  * At scale the single `shard` key serializes the frontier; shard by a
  * hash of the point instead (local frontiers) and reduce the shards
  * with one batch q82 pass over their union — the same local-prune/
  * global-merge decomposition as the batch two-phase plan, because a
  * local frontier never discards a global skyline point. */
object StreamingSkyline {

  final case class Offer(shard: Int, offerId: Long, tsMs: Long,
      price: Double, qty: Double)
  final case class Verdict(offerId: Long, kept: Boolean, frontierSize: Int)
  final case class SkyPoint(offerId: Long, price: Double, qty: Double)

  /** p dominates r: no worse on both dims, strictly better on one. */
  private def dominates(px: Double, py: Double, rx: Double, ry: Double): Boolean =
    px <= rx && py >= ry && (px < rx || py > ry)

  final class SkylineProcessor
      extends StatefulProcessor[Int, Offer, Verdict] {
    @transient private var frontier: ListState[SkyPoint] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      frontier = getHandle.getListState[SkyPoint]("frontier",
        Encoders.product[SkyPoint], TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[Offer],
        timerValues: TimerValues): Iterator[Verdict] = {
      var pts = frontier.get().toVector
      val out = rows.toSeq.sortBy(o => (o.tsMs, o.offerId)).map { o =>
        val dominated = pts.exists(p => dominates(p.price, p.qty, o.price, o.qty))
        if (!dominated) {
          pts = pts.filterNot(p => dominates(o.price, o.qty, p.price, p.qty)) :+
            SkyPoint(o.offerId, o.price, o.qty)
        }
        Verdict(o.offerId, !dominated, pts.size)
      }
      frontier.put(pts.toArray)
      out.iterator
    }
  }

  def skylineTws(spark: SparkSession, offers: Dataset[Offer]): Dataset[Verdict] = {
    import spark.implicits._
    offers.groupByKey(_.shard)
      .transformWithState(new SkylineProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
