package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing an element-wise vector mean
  * (centroid) — the custom-aggregate surface of the engine
  * (SURVEY.md §2.7: the reference needs none; this is extension surface for
  * the embedding pipeline, e.g. IVF coarse centroids).
  *
  * Buffer = (element sums, count): constant size per group (dims+1 doubles),
  * merged associatively — Spark runs it as a partial (map-side) aggregation,
  * so only |groups| buffers shuffle regardless of input size.
  *
  * Note: double summation order varies with partitioning, so centroids are
  * deterministic only up to fp rounding — fine for ANN/IVF use; the oracle-
  * checked query variant (`n4_label_centroids`) uses the DECIMAL formulation
  * instead.
  */
class VecCentroidAggregator(dims: Int)
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    require(v.length == dims, s"expected $dims-dim vector, got ${v.length}")
    val (sums, n) = b
    var i = 0
    while (i < dims) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a
    val (sb, nb) = b
    var i = 0
    while (i < dims) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] = {
    val (sums, n) = b
    if (n == 0L) sums else sums.map(_ / n)
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
