package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bounded-memory quantile sketch (KLL-style compactor chain).
  *
  * Why it exists: exact per-group quantiles need either a per-group sort
  * (parallelism bounded by |groups| — see q23's scaladoc) or bounded value
  * cardinality (q23's histogram form). A mergeable sketch answers quantile
  * queries over CONTINUOUS values in one map-side-combining aggregation
  * pass: each buffer holds ≤ levels·k doubles, merges associatively, and
  * only sketch buffers ever shuffle — the 100 TB path when neither exact
  * trick applies. (Spark's built-in percentile_approx is the same idea with
  * a GK sketch; this is the library's own, so the engine carries no
  * built-in dependency for the capability.)
  *
  * Structure: level i holds a buffer of items, each representing 2^i
  * original values. A full level sorts and keeps alternate elements
  * (compaction), promoting them to level i+1. Rank(x) = Σ_i 2^i ·
  * |{v ∈ level_i : v ≤ x}|; quantile(p) = the stored value with smallest
  * estimated rank ≥ p·n. Compaction offset alternates deterministically
  * per level (no RNG — reproducible runs; the classic random offset only
  * de-biases adversarial inputs).
  *
  * Error: with capacity k per level, rank error is O(n/k · levels) worst
  * case, far tighter in practice; `QuantileSketchSpec` asserts empirical
  * bounds on corpus data and exactness for n ≤ k.
  *
  * Two SQL surfaces (registered in [[graft.GraftExtensions]]):
  *  - `qsketch_quantiles(x)` — fixed [p50, p90, p99]
  *    ([[QuantileSketchAggregator]]);
  *  - `qsketch_quantiles_at(x, ps)` — probe points given AT THE CALL SITE
  *    as an array column, e.g. `qsketch_quantiles_at(v, array(0.25, 0.75))`
  *    ([[QuantileSketchAtAggregator]]; ps must be group-constant, which a
  *    literal array trivially is — the sketch adopts the first row's ps).
  */
object QuantileSketchAggregator {
  /** levels: levels(i) = unsorted buffer of values weighing 2^i each;
    * offsets: per-level compaction parity; n: total values observed;
    * ps: probe quantiles (empty until adopted, for the `_at` variant). */
  case class QSketch(levels: Seq[Seq[Double]], offsets: Seq[Int], n: Long,
      ps: Seq[Double] = Seq.empty)

  val DefaultK = 200

  /** Compact every over-full level upward: sort, keep alternate items. */
  private[functions] def compact(s: QSketch, k: Int): QSketch = {
    var levels = s.levels.toVector
    var offsets = s.offsets.toVector
    var i = 0
    while (i < levels.length) {
      if (levels(i).length > k) {
        val sorted = levels(i).sortBy(identity)
        val off = offsets(i) % 2
        val kept = sorted.zipWithIndex.collect {
          case (v, idx) if idx % 2 == off => v
        }
        if (i + 1 >= levels.length) { levels :+= Vector.empty; offsets :+= 0 }
        levels = levels
          .updated(i, Vector.empty[Double])
          .updated(i + 1, levels(i + 1) ++ kept)
        offsets = offsets.updated(i, offsets(i) + 1)
      }
      i += 1
    }
    s.copy(levels = levels, offsets = offsets)
  }

  private[functions] def mergeSketches(a: QSketch, b: QSketch, k: Int): QSketch = {
    val depth = math.max(a.levels.length, b.levels.length)
    def lvl(s: QSketch, i: Int): Seq[Double] =
      if (i < s.levels.length) s.levels(i) else Vector.empty
    def off(s: QSketch, i: Int): Int =
      if (i < s.offsets.length) s.offsets(i) else 0
    compact(QSketch(
      (0 until depth).map(i => lvl(a, i) ++ lvl(b, i)),
      (0 until depth).map(i => off(a, i) + off(b, i)),
      a.n + b.n,
      if (a.ps.nonEmpty) a.ps else b.ps), k)
  }

  /** Estimated rank of x = Σ weights of stored values ≤ x. */
  private[functions] def estRank(s: QSketch, x: Double): Long =
    s.levels.zipWithIndex.map { case (lv, i) =>
      (1L << i) * lv.count(_ <= x)
    }.sum

  private[functions] def quantiles(s: QSketch, ps: Seq[Double]): Array[Double] = {
    val all = s.levels.flatten.distinct.sortBy(identity)
    if (all.isEmpty) return ps.map(_ => Double.NaN).toArray
    ps.map { p =>
      val target = math.max(1L, math.ceil(p * s.n).toLong)
      all.find(v => estRank(s, v) >= target).getOrElse(all.last)
    }.toArray
  }
}

class QuantileSketchAggregator(ps: Seq[Double],
    k: Int = QuantileSketchAggregator.DefaultK)
    extends Aggregator[Double, QuantileSketchAggregator.QSketch, Array[Double]] {
  import QuantileSketchAggregator._

  override def zero: QSketch = QSketch(Seq(Vector.empty), Seq(0), 0L)

  override def reduce(s: QSketch, x: Double): QSketch =
    compact(s.copy(levels = s.levels.updated(0, s.levels.head :+ x), n = s.n + 1), k)

  override def merge(a: QSketch, b: QSketch): QSketch = mergeSketches(a, b, k)

  override def finish(s: QSketch): Array[Double] = quantiles(s, ps)

  override def bufferEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}

/** Call-site-parameterized variant: input rows are (value, ps) where ps is
  * the (group-constant) array of probe quantiles — normally a literal
  * `array(0.25, 0.75)`. The sketch adopts ps from the first row it sees;
  * rows with NULL/absent ps still contribute their value. */
class QuantileSketchAtAggregator(k: Int = QuantileSketchAggregator.DefaultK)
    extends Aggregator[(Double, Seq[Double]),
      QuantileSketchAggregator.QSketch, Array[Double]] {
  import QuantileSketchAggregator._

  override def zero: QSketch = QSketch(Seq(Vector.empty), Seq(0), 0L)

  override def reduce(s: QSketch, in: (Double, Seq[Double])): QSketch = {
    val withPs = if (s.ps.isEmpty && in._2 != null && in._2.nonEmpty)
      s.copy(ps = in._2) else s
    compact(withPs.copy(
      levels = withPs.levels.updated(0, withPs.levels.head :+ in._1),
      n = withPs.n + 1), k)
  }

  override def merge(a: QSketch, b: QSketch): QSketch = mergeSketches(a, b, k)

  override def finish(s: QSketch): Array[Double] =
    quantiles(s, if (s.ps.nonEmpty) s.ps else Seq(0.5))

  override def bufferEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
