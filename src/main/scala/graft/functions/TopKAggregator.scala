package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator: keeps at most k (score, id) pairs in its
  * buffer, ordered by (score DESC, id ASC).
  *
  * Why it exists: the window formulation (`row_number().over(orderBy desc)
  * ≤ k`) must SORT every scored row per group — at 100 TB that's a full
  * shuffle+sort of all candidates. This aggregator's buffer never exceeds k
  * entries, participates in map-side partial aggregation, and merges
  * associatively, so only `k` rows per partition per group ever shuffle.
  * Same deterministic tie-break as the window version (score desc, id asc) —
  * equivalence asserted in `SimilaritySpec`.
  *
  * Buffer is a sorted Array (k is small — insertion cost O(k) beats heap
  * constant factors and serializes trivially).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "better than"

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], v: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length < k) (buf :+ v).sortWith(lt)
    else if (lt(v, buf.last)) (buf.dropRight(1) :+ v).sortWith(lt)
    else buf
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    ExpressionEncoder[Array[(Double, Long)]]()
}
