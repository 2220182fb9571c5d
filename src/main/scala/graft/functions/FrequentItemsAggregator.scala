package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries / SpaceSaving heavy-hitters sketch.
  *
  * Why it exists: exact term frequencies over a 100 TB corpus
  * (`t8_explode`) shuffle one row per distinct token per partition — fine
  * while the vocabulary fits a shuffle, impossible when it doesn't
  * (web-scale n-gram or URL vocabularies run to billions). Misra-Gries
  * keeps at most `capacity` counters per buffer, merges associatively
  * (counter-wise sum, then decrement-and-prune back to capacity), and
  * guarantees on finish:
  *
  *  - every item with true count > n/(capacity+1) IS in the sketch
  *    (no false negatives for true heavy hitters);
  *  - each reported count is an UNDER-estimate by at most the total
  *    decrement `err` tracked alongside, so `count ≤ true ≤ count + err`.
  *
  * Both properties hold under any partitioning/merge order; the REPORTED
  * counts can vary across merge orders within the error band (inherent to
  * the sketch family — the spec asserts the guarantees, not bit-equality;
  * exact results need the t8 explode path).
  *
  * Buffer: counters map (≤ capacity entries) + err (max total decrement).
  */
object FrequentItemsAggregator {
  case class FreqSketch(counters: Map[String, Long], err: Long)

  /** Reported item: observed count plus the sketch-wide over/under bounds. */
  case class FreqItem(item: String, countLow: Long, countHigh: Long)
}

class FrequentItemsAggregator(capacity: Int, topK: Int)
    extends Aggregator[String, FrequentItemsAggregator.FreqSketch,
      Array[FrequentItemsAggregator.FreqItem]] {
  import FrequentItemsAggregator._

  override def zero: FreqSketch = FreqSketch(Map.empty, 0L)

  /** Prune a counter map down to `capacity` entries by the Misra-Gries
    * decrement: subtract the (capacity+1)-th largest count from everyone,
    * drop non-positive counters. Decrement amount accumulates into err. */
  private def prune(m: Map[String, Long], err: Long): FreqSketch = {
    if (m.size <= capacity) return FreqSketch(m, err)
    val counts = m.values.toSeq.sorted(Ordering[Long].reverse)
    val dec = counts(capacity) // (capacity+1)-th largest
    val kept = m.flatMap { case (k, c) =>
      val nc = c - dec
      if (nc > 0) Some(k -> nc) else None
    }
    FreqSketch(kept, err + dec)
  }

  override def reduce(s: FreqSketch, x: String): FreqSketch = {
    val m = s.counters.updatedWith(x) {
      case Some(c) => Some(c + 1)
      case None => Some(1L)
    }
    prune(m, s.err)
  }

  override def merge(a: FreqSketch, b: FreqSketch): FreqSketch = {
    val m = b.counters.foldLeft(a.counters) { case (acc, (k, c)) =>
      acc.updatedWith(k) { case Some(c0) => Some(c0 + c); case None => Some(c) }
    }
    prune(m, a.err + b.err)
  }

  /** Deterministic output order: (observed count desc, item asc), top-K. */
  override def finish(s: FreqSketch): Array[FreqItem] =
    s.counters.toSeq
      .sortBy { case (k, c) => (-c, k) }
      .take(topK)
      .map { case (k, c) => FreqItem(k, c, c + s.err) }
      .toArray

  override def bufferEncoder: Encoder[FreqSketch] = ExpressionEncoder[FreqSketch]()
  override def outputEncoder: Encoder[Array[FreqItem]] =
    ExpressionEncoder[Array[FreqItem]]()
}
