package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass reciprocal-rank fusion: ONE typed aggregator holds BOTH
  * retrieval legs' bounded top-k buffers — lexical candidates tagged
  * "lex" (score = shared-token count), vector candidates tagged "vec"
  * (score = cosine) — and `finish` computes each leg's ranks, fuses
  * `Σ 10⁶ div (60 + rank)` over the union, and emits the fused top-k.
  *
  * Why it exists: the two-leg formulation (n16) ranks each leg with its
  * own aggregation and FULL-OUTER-joins the rank lists — three shuffles
  * and, in Structured Streaming, two chained stateful aggregations,
  * which Spark refuses. This aggregator is ONE aggregation: buffers
  * merge associatively map-side (each leg's ≤k pairs per partition),
  * and fusion is pure `finish`-time arithmetic — so hybrid retrieval
  * becomes a legal single-agg streaming (update-mode) query, and in
  * batch the shuffle carries ≤2k rows per query per partition.
  *
  * Determinism: per-leg order is (score DESC, id ASC) — identical to
  * n16's window tie-breaks (lexical counts compare exactly as doubles ≤
  * 2⁵³); fused order is (rrf_ppm DESC, id ASC); the integer division
  * matches SQL `div` on positives. Equality with the two-leg n16 plan
  * is pinned by the `n16b_rrf_onepass` oracle row (n16's own SQL). */
class RrfFusionAggregator(k: Int, rrfK: Int) extends Aggregator[
    (String, Double, Long),
    (Array[(Double, Long)], Array[(Double, Long)]),
    Array[(Long, Long, Long, Option[Long], Option[Long])]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Array[(Double, Long)],
      v: (Double, Long)): Array[(Double, Long)] =
    if (buf.length < k) (buf :+ v).sortWith(better)
    else if (better(v, buf.last)) (buf.dropRight(1) :+ v).sortWith(better)
    else buf

  override def zero: (Array[(Double, Long)], Array[(Double, Long)]) =
    (Array.empty, Array.empty)

  override def reduce(b: (Array[(Double, Long)], Array[(Double, Long)]),
      v: (String, Double, Long)): (Array[(Double, Long)], Array[(Double, Long)]) =
    if (v._1 == "lex") (insert(b._1, (v._2, v._3)), b._2)
    else (b._1, insert(b._2, (v._2, v._3)))

  override def merge(a: (Array[(Double, Long)], Array[(Double, Long)]),
      b: (Array[(Double, Long)], Array[(Double, Long)])): (Array[(Double, Long)], Array[(Double, Long)]) =
    ((a._1 ++ b._1).sortWith(better).take(k),
      (a._2 ++ b._2).sortWith(better).take(k))

  /** (rank, id, rrf_ppm, lex_rank, vec_rank), fused top-k. */
  override def finish(b: (Array[(Double, Long)], Array[(Double, Long)]))
      : Array[(Long, Long, Long, Option[Long], Option[Long])] = {
    val lexRank = b._1.zipWithIndex.map { case ((_, id), i) => id -> (i + 1L) }.toMap
    val vecRank = b._2.zipWithIndex.map { case ((_, id), i) => id -> (i + 1L) }.toMap
    (lexRank.keySet ++ vecRank.keySet).toSeq
      .map { id =>
        val lr = lexRank.get(id)
        val vr = vecRank.get(id)
        val rrf = lr.map(r => 1000000L / (rrfK + r)).getOrElse(0L) +
          vr.map(r => 1000000L / (rrfK + r)).getOrElse(0L)
        (id, rrf, lr, vr)
      }
      .sortBy { case (id, rrf, _, _) => (-rrf, id) }
      .take(k).zipWithIndex
      .map { case ((id, rrf, lr, vr), i) => (i + 1L, id, rrf, lr, vr) }
      .toArray
  }

  override def bufferEncoder: Encoder[(Array[(Double, Long)], Array[(Double, Long)])] =
    ExpressionEncoder[(Array[(Double, Long)], Array[(Double, Long)])]()
  override def outputEncoder: Encoder[Array[(Long, Long, Long, Option[Long], Option[Long])]] =
    ExpressionEncoder[Array[(Long, Long, Long, Option[Long], Option[Long])]]()
}
