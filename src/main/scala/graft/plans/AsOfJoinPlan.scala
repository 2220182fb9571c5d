package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** Native AS-OF JOIN: for every left row, attach the single most recent
  * right row of the same key with `rightTime <= leftTime` (nulls when none).
  *
  * Spark has no as-of operator; the composable workaround (union + window
  * `last(ignoreNulls)` — `RelationalQueries.q13`) materializes both streams
  * through one window sort. This operator is the whole-operator escalation
  * (SURVEY §7 preference (c)): a `LogicalPlan` node, a planner `Strategy`,
  * and a `SparkPlan` that declares hash distribution on the key and
  * (key, time) ordering for BOTH children — Catalyst's EnsureRequirements
  * inserts exactly one exchange + sort per side, and execution is a
  * zipPartitions streaming merge: O(1) state (the last right row per key),
  * no buffering, no window. At 100 TB that's the minimum possible data
  * movement for this join (same as a sort-merge join's).
  *
  * Key/time types: any atomic orderable type (string, timestamp, date,
  * numeric, …) via Catalyst's natural row ordering; when every key/time is
  * long-backed (LONG / TIMESTAMP / TIMESTAMP_NTZ — single key) the merge
  * is a specialized primitive loop, and a single STRING key with a
  * long-backed time takes a UTF8String binary-compare loop — no
  * per-compare ordering dispatch on either hot path. NULL KEYS are the
  * caller's contract: filter them upstream (SQL join semantics never match
  * them anyway). The exec's behavior on un-filtered null keys is
  * path-dependent — the generic path compares them like values
  * (nulls-first, so they match each other), while the primitive loops read
  * them through `getLong`/`getUTF8String`, where a null is
  * indistinguishable from 0/"" — which is why the contract is upstream
  * rather than per-path. NULL TIMES take SQL comparison semantics (NULL
  * compares to nothing) uniformly on EVERY merge path: a NULL-rightTime
  * row is skipped at the merge (never matched, never held — it drains at
  * the head of its key group, where nulls-first sorting puts it, at no
  * extra cost), and a NULL-leftTime row emits null-padded without
  * advancing the right stream. This is enforced in the exec rather than
  * documented-away because the primitive loops read times via `getLong`,
  * where a NULL is indistinguishable from 0 — un-filtered NULLs would
  * silently corrupt tolerance/nearest distances and negative-time merges.
  * Ties in rightTime resolve to the LARGEST
  * (key, time, tieBreak) right row, matching the q13 composition.
  *
  * `tolerance` (pandas merge_asof parity): when set, a held match only
  * emits if `leftTime - rightTime <= tolerance` (inclusive, in the time
  * column's native unit — µs for timestamps); stale matches pad with nulls
  * instead. Requires a long-backed time column; the merge stays O(1) state
  * (the gate is one subtraction at emit, the held row still advances
  * normally).
  *
  * `direction` (merge_asof parity): "backward" (default) matches the most
  * recent right row with `rightTime <= leftTime`; "forward" matches the
  * EARLIEST right row with `rightTime >= leftTime` (ties in rightTime
  * resolve to the SMALLEST tieBreak — the head of the ascending sort).
  * Forward needs no held state at all: rows strictly before the left time
  * are discarded (later left rows are only later), and the match is a pure
  * peek — the next left row may match the same un-consumed right row.
  * "nearest" picks whichever of the backward-held row and the forward peek
  * is closer in time (equal distance → backward, pandas semantics;
  * tolerance bounds BOTH sides; long-backed time required).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Option[Long] = None,
    direction: String = "backward") extends BinaryNode {
  // right side comes back nullable: no-match rows pad with nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    tolerance: Option[Long] = None,
    direction: String = "backward") extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def asc(e: Expression) =
    SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(asc) :+ asc(leftTime),
    (rightKeys.map(asc) :+ asc(rightTime)) :+ asc(rightTieBreak))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  /** Physically long-backed atomic types: `getLong` reads them directly
    * from an UnsafeRow, and their sort order IS signed-long order — so
    * timestamp/long keys and times all take the primitive merge loop. */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val lks = leftKeys; val lt = leftTime
    val rks = rightKeys; val rt = rightTime
    val leftOut = left.output; val rightOut = right.output
    val allLong = leftKeys.size == 1 &&
      (leftKeys ++ rightKeys ++ Seq(lt, rt)).forall(e => longBacked(e.dataType))
    val stringKeyLongTime = leftKeys.size == 1 &&
      lks.head.dataType == org.apache.spark.sql.types.StringType &&
      longBacked(lt.dataType)
    val keyTypes = lks.map(_.dataType)
    val timeType = lt.dataType
    require(rks.map(_.dataType) == keyTypes,
      s"key types differ: $keyTypes vs ${rks.map(_.dataType)}")
    require(rt.dataType == timeType, s"time types differ: $timeType vs ${rt.dataType}")
    require(tolerance.isEmpty || longBacked(timeType),
      s"tolerance needs a long-backed time column, got $timeType")
    require(direction == "backward" || direction == "forward" ||
      direction == "nearest",
      s"direction must be backward|forward|nearest, got $direction")
    require(direction != "nearest" || longBacked(timeType),
      s"nearest direction needs a long-backed time column, got $timeType")
    // tolerance gate: held match must be within `tol` of the left time
    // (inclusive, pandas merge_asof semantics); Long.MaxValue = no bound.
    // NULL-time rows follow the documented filter-upstream contract.
    val tol = tolerance.getOrElse(Long.MaxValue)
    val forward = direction == "forward"
    // nearest rides the BACKWARD loops: after the advance, `held` is the
    // backward candidate and the un-consumed head (same key, time > t) is
    // the forward one — pick the closer, ties to backward (pandas).
    val nearest = direction == "nearest"
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lks, leftOut)
      val lTim = UnsafeProjection.create(Seq(lt), leftOut)
      val rKey = UnsafeProjection.create(rks, rightOut)
      val rTim = UnsafeProjection.create(Seq(rt), rightOut)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      // project through NULL-WIDENED right attrs on BOTH the projection
      // list and the binding schema (BindReferences takes nullability from
      // the input schema): binding the child's own attrs would inherit a
      // non-nullable right child's nullability and read the null-pad row's
      // fields as 0/garbage instead of null
      val rightOutN = rightOut.map(_.withNullability(true))
      val out = UnsafeProjection.create(
        leftOut ++ rightOutN, leftOut ++ rightOutN)
      // NULL-time contract (see class scaladoc): NULL rightTime rows never
      // match on any path — drop them before the merge so the primitive
      // loops never read a NULL through getLong (which would yield 0).
      val rBuf = rIter.filter(r => !rTim(r).isNullAt(0)).buffered
      // NULL leftTime ⇒ null-padded emit, right stream untouched.
      def leftTimeIsNull(lRow: InternalRow): Boolean = lTim(lRow).isNullAt(0)

      if (forward && allLong) {
        // forward primitive merge: discard right rows strictly before the
        // left (key, time); the match, if any, is the un-consumed head
        lIter.map { lRow =>
          if (leftTimeIsNull(lRow)) out(joined(lRow, nullRight)) else {
          val k = lKey(lRow).getLong(0)
          val t = lTim(lRow).getLong(0)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val pk = rKey(peek).getLong(0)
            if (pk < k || (pk == k && rTim(peek).getLong(0) < t)) rBuf.next()
            else advancing = false
          }
          val r = if (rBuf.hasNext && rKey(rBuf.head).getLong(0) == k &&
              rTim(rBuf.head).getLong(0) - t <= tol) rBuf.head
            else nullRight
          out(joined(lRow, r))
          }
        }
      } else if (forward && stringKeyLongTime) {
        import org.apache.spark.unsafe.types.UTF8String
        def cmpKey(a: UTF8String, b: UTF8String): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else a.compareTo(b)
        lIter.map { lRow =>
          if (leftTimeIsNull(lRow)) out(joined(lRow, nullRight)) else {
          val k = lKey(lRow).getUTF8String(0)
          val t = lTim(lRow).getLong(0)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val c = cmpKey(rKey(peek).getUTF8String(0), k)
            if (c < 0 || (c == 0 && rTim(peek).getLong(0) < t)) rBuf.next()
            else advancing = false
          }
          val r = if (rBuf.hasNext &&
              cmpKey(rKey(rBuf.head).getUTF8String(0), k) == 0 &&
              rTim(rBuf.head).getLong(0) - t <= tol) rBuf.head
            else nullRight
          out(joined(lRow, r))
          }
        }
      } else if (forward) {
        val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
        val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(Seq(timeType))
        val checkTol = tolerance.isDefined
        lIter.map { lRow =>
          if (leftTimeIsNull(lRow)) out(joined(lRow, nullRight)) else {
          val k = lKey(lRow)
          val t = lTim(lRow)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val c = keyOrd.compare(rKey(peek), k)
            if (c < 0 || (c == 0 && timeOrd.compare(rTim(peek), t) < 0))
              rBuf.next()
            else advancing = false
          }
          val r = if (rBuf.hasNext && keyOrd.compare(rKey(rBuf.head), k) == 0 &&
              (!checkTol ||
                rTim(rBuf.head).getLong(0) - t.getLong(0) <= tol)) rBuf.head
            else nullRight
          out(joined(lRow, r))
          }
        }
      } else if (allLong) {
        // specialized primitive merge: no ordering dispatch per compare
        var heldKey = 0L
        var heldTime = 0L
        var heldValid = false
        var held: InternalRow = null
        lIter.map { lRow =>
          if (leftTimeIsNull(lRow)) out(joined(lRow, nullRight)) else {
          val k = lKey(lRow).getLong(0)
          val t = lTim(lRow).getLong(0)
          if (heldValid && heldKey != k) { heldValid = false; held = null }
          // advance right while its (key, time) <= (k, t)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val pk = rKey(peek).getLong(0)
            val pt = rTim(peek).getLong(0)
            if (pk < k || (pk == k && pt <= t)) {
              val row = rBuf.next()
              if (pk == k) {
                held = row.copy(); heldKey = k; heldTime = pt; heldValid = true
              }
            } else advancing = false
          }
          val bwdOk = heldValid && heldKey == k && t - heldTime <= tol
          val r = if (nearest) {
            val fwdOk = rBuf.hasNext && rKey(rBuf.head).getLong(0) == k &&
              rTim(rBuf.head).getLong(0) - t <= tol
            if (bwdOk && fwdOk) {
              if (t - heldTime <= rTim(rBuf.head).getLong(0) - t) held
              else rBuf.head
            } else if (bwdOk) held
            else if (fwdOk) rBuf.head
            else nullRight
          } else if (bwdOk) held else nullRight
          out(joined(lRow, r))
          }
        }
      } else if (stringKeyLongTime) {
        // string-key specialization: UTF8String binary compare (the same
        // order SortOrder uses for strings) — no per-compare type dispatch
        // through an interpreted row ordering. Nulls-first like the generic
        // path.
        import org.apache.spark.unsafe.types.UTF8String
        def cmpKey(a: UTF8String, b: UTF8String): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else a.compareTo(b)
        var heldKey: UTF8String = null
        var heldTime = 0L
        var heldValid = false
        var held: InternalRow = null
        lIter.map { lRow =>
          if (leftTimeIsNull(lRow)) out(joined(lRow, nullRight)) else {
          val k = lKey(lRow).getUTF8String(0)
          val t = lTim(lRow).getLong(0)
          if (heldValid && cmpKey(heldKey, k) != 0) {
            heldValid = false; held = null; heldKey = null
          }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val c = cmpKey(rKey(peek).getUTF8String(0), k)
            val pt = rTim(peek).getLong(0)
            if (c < 0 || (c == 0 && pt <= t)) {
              val row = rBuf.next()
              if (c == 0) {
                held = row.copy()
                heldKey = if (k == null) null else k.clone()
                heldTime = pt
                heldValid = true
              }
            } else advancing = false
          }
          val bwdOk = heldValid && t - heldTime <= tol
          val r = if (nearest) {
            val fwdOk = rBuf.hasNext &&
              cmpKey(rKey(rBuf.head).getUTF8String(0), k) == 0 &&
              rTim(rBuf.head).getLong(0) - t <= tol
            if (bwdOk && fwdOk) {
              if (t - heldTime <= rTim(rBuf.head).getLong(0) - t) held
              else rBuf.head
            } else if (bwdOk) held
            else if (fwdOk) rBuf.head
            else nullRight
          } else if (bwdOk) held else nullRight
          out(joined(lRow, r))
          }
        }
      } else {
        // generic merge over any orderable atomic types: projected key/time
        // rows compared with Catalyst's natural ascending row ordering
        // (multi-column keys compare lexicographically, matching the
        // required child ordering)
        val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
        val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(Seq(timeType))
        // tolerance/nearest (long-backed time required, see the requires
        // above) track the held time as a primitive beside the
        // generic-ordering compares
        val checkTol = tolerance.isDefined
        val trackTime = checkTol || nearest
        var heldKey: InternalRow = null  // copy of the held right row's key
        var heldTime = 0L
        var held: InternalRow = null
        lIter.map { lRow =>
          if (leftTimeIsNull(lRow)) out(joined(lRow, nullRight)) else {
          val k = lKey(lRow)
          val t = lTim(lRow)
          if (held != null && keyOrd.compare(heldKey, k) != 0) {
            held = null; heldKey = null
          }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val c = keyOrd.compare(rKey(peek), k)
            if (c < 0 || (c == 0 && timeOrd.compare(rTim(peek), t) <= 0)) {
              val row = rBuf.next()
              if (c == 0) {
                if (trackTime) heldTime = rTim(row).getLong(0)
                held = row.copy(); heldKey = k.copy()
              }
            } else advancing = false
          }
          val bwdOk = held != null &&
            (!checkTol || t.getLong(0) - heldTime <= tol)
          val r = if (nearest) {
            val tL = t.getLong(0)
            val fwdOk = rBuf.hasNext &&
              keyOrd.compare(rKey(rBuf.head), k) == 0 &&
              rTim(rBuf.head).getLong(0) - tL <= tol
            if (bwdOk && fwdOk) {
              if (tL - heldTime <= rTim(rBuf.head).getLong(0) - tL) held
              else rBuf.head
            } else if (bwdOk) held
            else if (fwdOk) rBuf.head
            else nullRight
          } else if (bwdOk) held else nullRight
          out(joined(lRow, r))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the exec. Inject via
  * `GraftExtensions` (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, tol, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, tol,
        dir) :: Nil
    case _ => Nil
  }
}
