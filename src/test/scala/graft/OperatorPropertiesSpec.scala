package graft

import org.apache.spark.sql.functions._

/** Corpus-level invariants of the training-pipeline operators: properties a
  * production pipeline silently depends on but no single-output oracle
  * check states explicitly. */
class OperatorPropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  test("t10 normalization is idempotent on the corpus") {
    def norm(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
    val bad = Tables.documents(spark, sfDir)
      .select(norm(col("text")).as("n1"))
      .select(col("n1"), norm(col("n1")).as("n2"))
      .filter(col("n1") =!= col("n2")).count()
    assert(bad == 0, "normalize(normalize(x)) must equal normalize(x)")
  }

  test("t11 hash split is a pure function of content: growth-stable") {
    import graft.ops.TextOps.hash60
    val docs = Tables.documents(spark, sfDir)
    def splits(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), pmod(hash60(col("text")), lit(100L)).as("b"))
        .as[(Long, Long)].collect().toMap
    val half = splits(docs.filter(col("doc_id") < 250))
    val full = splits(docs)
    half.foreach { case (id, b) =>
      assert(full(id) == b, s"doc $id's bucket changed when the corpus grew")
    }
  }

  test("sketch operators are bit-identical across input partitionings") {
    // the distributed-correctness property every sketch silently relies
    // on: hash-decided sampling/bucketing + order-free reducers (max, min,
    // count, bottom-k) must make the result independent of how the input
    // was split. Run each oracle-gated sketch query twice with the scan
    // fanout replaced by two different explicit repartitionings.
    val names = Seq("q51_hll_registers", "q52_kmv_sample",
      "d8d_triangle_doulion", "d8b_triangle_degree",
      // round-6 late batch: CMS cells (hash-bucketed counts), block
      // bitmaps (OR-folded masks), bigram LM (integer ratio joins),
      // bounded top-k (associative k-buffer merge)
      "q55_countmin", "q57_bitmap_distinct", "t24_lm_score", "q59_topk_agg",
      // round-6 second batch: fixed-point pagerank (integer in-mass sums),
      // PassJoin (set-valued candidates + exact verify), window bitmaps
      // (OR folds), PMI (integer ratio), novelty (df equi-join + div)
      "d15_pagerank", "d16_editdist_join", "q65_rolling_distinct",
      "t26_pmi_collocations", "d18_ngram_novelty")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def rows(parts: Int): Seq[String] = {
        Tables.withFanoutParts(parts) {
          fn(spark, sfDir).collect().map(_.toString).toSeq
        }
      }
      assert(rows(3) == rows(17), s"$name diverged across partitionings")
    }
  }

  test("k-means assignment is bit-identical across input partitionings") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        graft.ops.SimilarityOps.toDouble(col("embedding")).as("emb"))
    def run(parts: Int) =
      graft.ops.SimilarityOps.kmeansAssign(vecs.repartition(parts), 8, 2)
        .select("id", "cluster", "d2")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(2) == run(13),
      "decimal-exact updates must make the result partition-order-free")
  }
}
