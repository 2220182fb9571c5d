package graft.streaming

import graft.{SparkEntry, SparkSpecBase}
import graft.ops.IvfIndex
import org.apache.spark.sql.functions._

class StreamingAnnServeSpec extends SparkSpecBase {
  import spark.implicits._

  private def batchServe(): Set[(Long, Long, Long, Double)] =
    SparkEntry.queries("n15_ivfpq_serve")(spark, sfDir)
      .select(col("query_id"), col("rank").cast("long"), col("vec_id"),
        col("adc_dist2"))
      .as[(Long, Long, Long, Double)].collect().toSet

  test("streamed query serving equals batch n15 row-for-row") {
    val p = IvfIndex.ensure(spark, sfDir)
    val expected = batchServe()
    assert(expected.nonEmpty, "batch serve must produce rows")

    val queries = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .filter(col("id") < graft.queries.SimilarityQueries.NumQueries)
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val (b1, b2) = queries.splitAt(queries.length / 2)

    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = StreamingAnnServe.topK(spark, in.toDF().toDF("id", "emb"), p,
        graft.queries.SimilarityQueries.K, nprobe = 2)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName("ann_serve").start()
    try {
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("ann_serve")
        .select(col("query_id"), col("rank"), col("vec_id"),
          col("adc_dist2"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed == expected,
        s"streamed serve must equal batch n15; " +
          s"only-streamed=${(streamed -- expected).take(3)} " +
          s"only-batch=${(expected -- streamed).take(3)}")
      // each query answered exactly once (update mode, batch-local groups)
      val perQ = spark.table("ann_serve").groupBy("query_id").count()
        .as[(Long, Long)].collect().toMap
      assert(perQ.values.forall(_ == graft.queries.SimilarityQueries.K.toLong),
        s"every query must emit exactly k rows once: $perQ")
    } finally q.stop()
  }

  test("batch n15 equals in-query-trained n14 (lossless index round-trip)") {
    // the oracle pins both to the same SQL; this asserts it in-suite so a
    // drifting index build fails fast without the DuckDB harness
    val n14 = SparkEntry.queries("n14_ivfpq")(spark, sfDir)
      .select(col("query_id"), col("rank").cast("long"), col("vec_id"),
        col("adc_dist2"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batchServe() == n14,
      "persisted-index serving must replicate n14 exactly")
  }
}
