package graft.streaming

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

class StreamingHybridServeSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed hybrid RRF serving equals batch n16 row-for-row") {
    val expected = SparkEntry.queries("n16_rrf_fusion")(spark, sfDir)
      .select(col("query_id"), col("rank").cast("long"), col("doc_id"),
        col("rrf_ppm"), col("lex_rank"), col("vec_rank"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSet
    assert(expected.nonEmpty, "batch n16 must produce rows")

    val corpus = StreamingHybridServe.staticCorpus(spark, sfDir)
      .localCheckpoint()
    val queries = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"),
        array_distinct(graft.ops.TextOps.tokens(col("text"))).as("toks"))
      .join(graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("emb")),
        "id")
      .filter(col("id") < graft.queries.SimilarityQueries.NumQueries)
      .as[(Long, Seq[String], Seq[Double])].collect().toSeq.sortBy(_._1)
    val (b1, b2) = queries.splitAt(queries.length / 2)

    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[String], Seq[Double])]
    val q = StreamingHybridServe.fusedTopK(spark,
        in.toDF().toDF("id", "toks", "emb"), corpus,
        graft.queries.SimilarityQueries.K)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName("hybrid_serve").start()
    try {
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("hybrid_serve")
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("rrf_ppm"), col("lex_rank"), col("vec_rank"))
        .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
        .collect().toSet
      assert(streamed == expected,
        s"streamed hybrid serve must equal batch n16; " +
          s"only-streamed=${(streamed -- expected).take(3)} " +
          s"only-batch=${(expected -- streamed).take(3)}")
    } finally q.stop()
  }
}
