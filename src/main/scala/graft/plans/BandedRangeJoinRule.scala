package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite residual range joins into the banded equi-join
  * shape of [[graft.ops.RangeJoinOps.bandedRangeJoin]] — automatically.
  *
  * A join whose condition bounds one side's point column between two
  * columns of the other side (`p >= lo AND p <= hi`, any strict/non-strict
  * mix, optionally alongside equi predicates) distributes on the equi keys
  * alone; the range predicate stays RESIDUAL, so a hot key degenerates to
  * one task scanning |l_k|·|r_k| pairs (the reference's own q12 shape —
  * `sparkpykafkajoin.py` never hits this because its join is pure equi).
  * This rule rebuilds the plan the way the hand-written q37 does:
  *
  *  - interval side gains `Generate(Explode(Sequence(⌊lo/w⌋, ⌊hi/w⌋)))` —
  *    one row per covered bucket (⌈span/w⌉+1 copies);
  *  - point side gains a projected `⌊p/w⌋` bucket column;
  *  - the join condition gains `bucket = bucket` — now an EQUI key, so the
  *    shuffle distributes on (bucket, keys) and the range check is a cheap
  *    post-join filter;
  *  - a top Project restores the original output (bucket columns dropped).
  *
  * Every qualifying pair shares exactly the point row's bucket, so each
  * pair still emits once — an EXACT rewrite (`RangeJoinSpec` asserts
  * equality with the residual plan on the corpus, and `q37`'s oracle pins
  * the manual form of the same shape).
  *
  * Opt-in and width-explicit (`spark.graft.rangeJoin.enabled=true`,
  * `spark.graft.rangeJoin.bucketWidth=<n>`): an optimizer rule cannot run
  * the statistics pass [[graft.ops.RangeJoinOps.suggestBucketWidth]] uses,
  * and a mis-sized width is a performance (never correctness) trade-off.
  * Runs inside a fixed-point batch — the `__band_` marker columns in the
  * rewritten condition make the rule self-skipping (idempotent). All
  * expressions are built fully typed/resolved (Cast→Divide→Floor), because
  * optimizer output never re-enters the analyzer. Only integral-typed
  * point/bound columns rewrite (timestamps band via `unix_micros` at the
  * API layer, as q37 does).
  */
case class BandedRangeJoinRule(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "false") == "true"
  private def width: Long =
    conf.getConfString("spark.graft.rangeJoin.bucketWidth", "0").toLong

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || width <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if !cond.references.exists(_.name.startsWith("__band_")) =>
        rewrite(j, cond).getOrElse(j)
    }
  }

  /** ⌊e/width⌋ as a fully-typed LongType expression (Floor(double) is
    * LongType) — bit-identical to RangeJoinOps.bandedRangeJoin's
    * `floor(col / width)`. */
  private def bucket(e: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(width.toDouble)))

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    // side classifier: Some(true)=pure left, Some(false)=pure right
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(leftOut)) Some(true)
      else if (e.references.subsetOf(rightOut)) Some(false)
      else None
    def integral(e: Expression): Boolean = e.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }

    // normalize each conjunct to (point, bound, isLower); point and bound
    // must be single-sided, integral, and on OPPOSITE sides
    val preds = splitConjunctivePredicates(cond)
    val bounds = preds.flatMap {
      case GreaterThanOrEqual(p, b) => Some((p, b, true))
      case GreaterThan(p, b)        => Some((p, b, true))
      case LessThanOrEqual(p, b)    => Some((p, b, false))
      case LessThan(p, b)           => Some((p, b, false))
      case _                        => None
    }.flatMap { case (x, y, xIsPointLower) =>
      // x OP y: treat x as point / y as bound, and the flipped reading
      Seq((x, y, xIsPointLower), (y, x, !xIsPointLower))
    }.filter { case (p, b, _) =>
      integral(p) && integral(b) &&
        (for (ps <- sideOf(p); bs <- sideOf(b)) yield ps != bs).getOrElse(false)
    }

    // first point expression with both a lower and an upper bound
    val candidates = bounds.groupBy(_._1.canonicalized)
    candidates.values.collectFirst {
      case bs if bs.exists(_._3) && bs.exists(!_._3) =>
        val (p, lo, _) = bs.find(_._3).get
        val (_, hi, _) = bs.find(!_._3).get
        (p, lo, hi)
    }.map { case (p, lo, hi) =>
      val pointOnLeft = sideOf(p).get
      val (intervalPlan, pointPlan) =
        if (pointOnLeft) (j.right, j.left) else (j.left, j.right)

      // interval side: explode the covered bucket range; an inverted or
      // NULL interval yields an empty/null array → row drops, matching the
      // residual predicate's non-match
      val bLo = bucket(lo)
      val bHi = bucket(hi)
      // Sequence is TimeZoneAwareExpression: resolved only once a zone id
      // is pinned (unused for integral sequences, but gates `resolved`)
      val seq = If(LessThanOrEqual(bLo, bHi),
        Sequence(bLo, bHi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val bucketAttr = AttributeReference("__band_bucket", LongType,
        nullable = false)()
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bucketAttr),
        child = intervalPlan)

      // point side: its single bucket
      val ptAlias = Alias(bucket(p), "__band_pt")()
      val proj = Project(pointPlan.output :+ ptAlias, pointPlan)

      val newCond = And(EqualTo(bucketAttr, ptAlias.toAttribute), cond)
      val (nl, nr) = if (pointOnLeft) (proj, gen) else (gen, proj)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }
}
