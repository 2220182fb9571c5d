package graft.queries

import graft.Tables
import graft.ops.SimilarityOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings` (ARRAY<FLOAT>, 64-dim).
  *
  * n1 (brute-force cosine top-k) and n3 (cosine near-dup pairs) have
  * bit-exact DuckDB oracles: both engines fold the same doubles in the same
  * element order, so even the ranking ties break identically. n2 (LSH) is
  * the scale path — checked rows-only by the driver plus a recall assertion
  * in `SimilaritySpec`. */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  val K = 10
  val NumQueries = 8       // query set = vec_id < 8
  val NearDupTau = 0.9
  val LshTables = 8   // LSH hash tables
  val Planes = 8   // hyperplanes (bits) per table
  val Dims = 64

  private def vecs(s: SparkSession, d: String) =
    Tables.fanout(Tables.embeddings(s, d))
      .select(col("vec_id").as("id"), toDouble(col("embedding")).as("emb"))

  val queries: Map[String, Q] = Map(
    // Exact ANN baseline: top-10 cosine neighbors of the first 8 vectors.
    "n1_ann_bruteforce" -> ((s, d) => {
      val v = vecs(s, d)
      bruteForceTopK(v.filter(col("id") < NumQueries), v, K)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN (rows-only driver check; recall vs n1 in ScalaTest).
    "n2_ann_lsh" -> ((s, d) => {
      val v = vecs(s, d)
      lshTopK(v.filter(col("id") < NumQueries), v, K, LshTables, Planes, Dims)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Embedding cosine near-duplicate pairs (exact all-pairs ground truth).
    "n3_embedding_neardup" -> ((s, d) => {
      cosineNearDupPairs(vecs(s, d), NearDupTau)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  // DuckDB mirrors: same left-to-right double folds.
  private val dkDot =
    """list_reduce(list_prepend(0.0::DOUBLE,
      |    list_transform(generate_series(1, len(a.emb)),
      |      i -> a.emb[i] * b.emb[i])), (x, y) -> x + y)""".stripMargin
  private def dkNorm2(t: String) =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform($t.emb, x -> x * x)), (p, q) -> p + q)""".stripMargin

  val oracles: Map[String, String] = Map(
    "n1_ann_bruteforce" ->
      s"""WITH v AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |scored AS (
         |  SELECT a.id AS query_id, b.id AS neighbor_id,
         |         $dkDot / sqrt(${dkNorm2("a")} * ${dkNorm2("b")}) AS cos
         |  FROM v a, v b
         |  WHERE a.id < $NumQueries AND b.id <> a.id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos_sim
         |FROM ranked WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "n3_embedding_neardup" ->
      s"""WITH v AS (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |scored AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |         $dkDot / sqrt(${dkNorm2("a")} * ${dkNorm2("b")}) AS cos
         |  FROM v a, v b WHERE a.id < b.id)
         |SELECT id_a, id_b, round(cos, 6) AS cos_sim
         |FROM scored WHERE cos >= $NearDupTau ORDER BY id_a, id_b""".stripMargin
  )
}
