package graft.ops

import graft.plans.{AsOfJoin, AsOfJoinStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DataFrame API for the native as-of join ([[graft.plans.AsOfJoin]]).
  *
  * Columns are referenced BY NAME and resolved against each side's analyzed
  * plan (a `Column` from the public API carries an unresolved attribute that
  * custom logical nodes can't adopt). Key/time columns may be any atomic
  * orderable type (LongType pairs take a specialized primitive merge);
  * `rightTieBreak` orders equal-time right rows (largest wins). Each left
  * row gets the most recent right row with `rightTime <= leftTime` of the
  * same key, or nulls.
  */
object AsOfJoinOps {

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))

  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame =
    asofJoinMulti(left, right, Seq(leftKey), Seq(rightKey),
      leftTime, rightTime, rightTieBreak, tolerance, direction)

  /** Composite-key variant: keys compare lexicographically in the given
    * order on both sides (e.g. (exchange, symbol) for per-venue quotes).
    * `tolerance` bounds the match window (|leftTime − rightTime| ≤
    * tolerance, native time unit — µs for timestamps); stale matches emit
    * nulls. `direction` "backward" (most recent at-or-before) or "forward"
    * (earliest at-or-after). */
  def asofJoinMulti(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightTieBreak: String,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
      "as-of join needs the same non-zero number of keys on both sides")
    val spark = left.sparkSession
    Bridge.injectStrategy(spark, AsOfJoinStrategy)
    val lPlan = Bridge.analyzedPlan(left)
    val rPlan = Bridge.analyzedPlan(right)
    Bridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      attr(rPlan, rightTieBreak), tolerance, direction))
  }
}
