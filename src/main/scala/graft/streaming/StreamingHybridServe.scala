package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming HYBRID retrieval — queries arrive as a stream and are
  * answered by reciprocal-rank fusion of the lexical and vector legs
  * against a static corpus, in ONE stateful aggregation (update mode).
  *
  * Why the batch plan can't stream: n16 ranks each leg with its own
  * aggregation and joins the rank lists — chained stateful aggregations,
  * which Structured Streaming refuses. Two moves make it legal:
  *  1. the lexical leg's count-agg becomes a PER-ROW expression —
  *     `size(array_intersect(query_tokens, doc_rare_tokens))` against a
  *     precomputed df-capped rare-token array on the static side
  *     (identical to the join-count: the doc side is already capped, so
  *     the intersection only ever counts capped shared tokens);
  *  2. ranking-and-fusion happens inside the single
  *     [[graft.functions.RrfFusionAggregator]] — each scored row emits
  *     its leg inputs (vec always; lex iff ≥1 shared token, mirroring
  *     the batch join's candidate set) and the aggregator's finish
  *     computes both ranks and the fused top-k.
  *
  * The static corpus frame (id, rare_toks, emb, n2) is built once at
  * stream start; per micro-batch the stream-static join fans each query
  * out to the corpus, all scoring is codegen'd row math, and the only
  * state is the ≤2k-entry fusion buffers per in-flight query. Replay
  * equality with batch n16 is asserted in `StreamingHybridServeSpec`. */
object StreamingHybridServe {

  /** Static retrieval corpus: one row per doc — df-capped rare-token
    * array (lexical leg) + embedding and its norm (vector leg). */
  def staticCorpus(s: SparkSession, d: String): DataFrame = {
    import graft.ops.SimilarityOps.{norm2, toDouble}
    val toks = graft.Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(graft.ops.TextOps.tokens(col("text"))))
          .as("tok"))
    val dfT = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= graft.queries.SimilarityQueries.RrfDfCap)
    val rareArr = toks.join(dfT.select(col("tok")), "tok")
      .groupBy(col("doc_id")).agg(collect_list(col("tok")).as("rare_toks"))
    graft.Tables.embeddings(s, d)
      .select(col("vec_id").as("did"), toDouble(col("embedding")).as("emb"))
      .join(rareArr.select(col("doc_id").as("did"), col("rare_toks")),
        Seq("did"), "left")
      .select(col("did"),
        coalesce(col("rare_toks"), array().cast("array<string>"))
          .as("rare_toks"),
        col("emb"), norm2(col("emb")).as("n2"))
  }

  /** (id, toks ARRAY<STRING>, emb ARRAY<DOUBLE>) query frame (static or
    * streaming) → fused (query_id, rank, doc_id, rrf_ppm, lex_rank,
    * vec_rank); unsorted (streaming sinks can't order). */
  def fusedTopK(s: SparkSession, queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    import s.implicits._
    import graft.ops.SimilarityOps.{cosine, dot, norm2}
    val scored = queries
      .select(col("id").as("qid"), col("toks"), col("emb").as("q_emb"),
        norm2(col("emb")).as("q_n2"), lit(1).as("jk"))
      .join(corpus.withColumn("jk", lit(1)), "jk")
      .filter(col("did") =!= col("qid"))
      .select(col("qid"), col("did"),
        size(array_intersect(col("toks"), col("rare_toks"))).as("n_shared"),
        cosine(dot(col("q_emb"), col("emb")), col("q_n2"), col("n2"))
          .as("cos"))
      .as[(Long, Long, Int, Double)]
    val legs = scored.flatMap { case (qid, did, nShared, cos) =>
      val vec = Iterator((qid, "vec", cos, did))
      val lex = if (nShared >= 1)
        Iterator((qid, "lex", nShared.toDouble, did)) else Iterator.empty
      vec ++ lex
    }
    val agg = new graft.functions.RrfFusionAggregator(k, 60)
    legs.groupByKey(_._1)
      .mapValues { case (_, leg, score, id) => (leg, score, id) }
      .agg(agg.toColumn.name("fused"))
      .flatMap { case (qid, fused) =>
        fused.iterator.map { case (rank, id, rrf, lr, vr) =>
          (qid, rank, id, rrf, lr, vr)
        }
      }
      .toDF("query_id", "rank", "doc_id", "rrf_ppm",
        "lex_rank", "vec_rank")
  }
}
