package graft.streaming

import org.apache.spark.sql.Column

/** Serving leg of q91's range planning: the planner's P−1 order-statistic
  * boundaries, embedded as one literal array in a STATELESS streaming
  * projection, route every arriving row to its range partition — the
  * shape of a continuously-loaded range-partitioned table (plan the
  * boundaries once on a sample, route the firehose forever; re-plan only
  * when the q91 balance audit drifts). Assignment is the same
  * count-of-smaller-boundaries fold as the batch planner, so routed pids
  * are BIT-equal to batch assignment on replay (spec-proven). Per-row
  * cost: ≤P−1 literal comparisons inside codegen — no state, no shuffle,
  * independent of history.
  */
object StreamingRangeRouter {

  /** Range-partition id for `v` under the planned `bounds` (ascending
    * order-statistic boundaries): count of boundaries strictly below v —
    * q91's literal-probe assignment, verbatim (shared with the batch
    * planner via [[graft.ops.RangePlanOps.pidColumn]], so the router
    * inherits the bounded-sample provenance of the boundaries too). */
  def pidColumn(bounds: Seq[Double])(v: Column): Column =
    graft.ops.RangePlanOps.pidColumn(bounds)(v)
}
