package graft.streaming

import graft.ops.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming IVFADC query serving — the third leg of the persisted-index
  * lifecycle (build: [[graft.ops.IvfIndex.build]]; ingest:
  * [[StreamingIvfAdmission]]; this: queries arriving as a stream, served
  * against the static index).
  *
  * Per micro-batch, each query row:
  *  1. probes the coarse quantizer WITHOUT a window — the 8 centroids
  *     embed as literals and the nprobe best lists come from
  *     `slice(array_sort(...), 1, nprobe)` over (−cos, list) structs, a
  *     stateless per-row expression (batch n15 uses a row_number window
  *     for the same order; windows aren't available in append streams,
  *     and the array form IS the right shape anyway at 8 elements);
  *  2. carries its 4 ADC arrays (codebook literals, n11's trick);
  *  3. stream-static inner-joins the persisted 4-byte code table on
  *     list_id (Spark re-plans the static side per batch — the standard
  *     serving join; at scale the static scan is the pruned/bucketed
  *     code layout);
  *  4. ranks through the bounded [[graft.functions.TopKAggregator]] in
  *     update mode — per-query candidates are batch-local, so each qid
  *     emits its final top-k exactly once.
  *
  * Probe order ((cos DESC, list ASC) via struct sort), ADC arithmetic,
  * and rank tie-breaks are bit-identical to batch n15;
  * `StreamingAnnServeSpec` asserts row-set equality on a replay. */
object StreamingAnnServe {

  /** (id, emb ARRAY<DOUBLE>) query frame (static or streaming) →
    * (query_id, rank, vec_id, adc_dist2) — unsorted; streaming sinks
    * can't order. */
  def topK(s: SparkSession, queries: DataFrame, p: IvfIndex.IndexPaths,
      k: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    val cbs = IvfIndex.readCodebooks(s, p)
    val cents = s.read.parquet(p.centroids)
      .select(col("list_id").cast("long"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val probeStructs = cents.map { case (cid, cent) =>
      struct(
        (-graft.functions.VectorExpressions.cosine_sim(
          col("emb"), typedLit(cent))).as("neg_cos"),
        lit(cid).as("p_list"))
    }
    val probed = queries.select(col("id").as("qid"), col("emb"),
        explode(slice(array_sort(array(probeStructs: _*)), 1, nprobe))
          .as("pr"))
      .select(col("qid"), col("pr.p_list").as("p_list"),
        graft.queries.SimilarityQueries.pqAdcArr(cbs, 0).as("a0"),
        graft.queries.SimilarityQueries.pqAdcArr(cbs, 1).as("a1"),
        graft.queries.SimilarityQueries.pqAdcArr(cbs, 2).as("a2"),
        graft.queries.SimilarityQueries.pqAdcArr(cbs, 3).as("a3"))
    val codes = s.read.parquet(p.codes)
      .select(col("vid"), col("list_id").cast("long").as("list_id"),
        col("c0"), col("c1"), col("c2"), col("c3"))
    val scored = probed.join(codes,
        col("list_id") === col("p_list") && col("vid") =!= col("qid"))
      .select(col("qid"),
        -(element_at(col("a0"), col("c0").cast("int") + 1) +
          element_at(col("a1"), col("c1").cast("int") + 1) +
          element_at(col("a2"), col("c2").cast("int") + 1) +
          element_at(col("a3"), col("c3").cast("int") + 1)).as("neg_adc"),
        col("vid"))
      .as[(Long, Double, Long)]
    val agg = new graft.functions.TopKAggregator(k)
    scored.groupByKey(_._1)
      .mapValues { case (_, negAdc, id) => (negAdc, id) }
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (qid, topk) =>
        topk.iterator.zipWithIndex.map { case ((negAdc, id), i) =>
          (qid, (i + 1).toLong, id,
            BigDecimal(-negAdc)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF("query_id", "rank", "vec_id", "adc_dist2")
  }
}
