package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** StreamingMinKGate must score EXACTLY like the batch t55 machinery:
  * same per-bigram integer scores, same bottom-⌈20%⌉ mean — proven
  * against an INDEPENDENT aggregation formulation (sort_array over
  * collected scores, not the window-rank the query uses), against
  * t55's own output rows, and on an exact MemoryStream replay. */
class StreamingMinKGateSpec extends SparkSpecBase {
  import spark.implicits._

  private def holdout = graft.Tables.documents(spark, sfDir)
    .filter(col("doc_id") % 4 === 0)
    .select(col("doc_id"), col("text"))

  test("gate scores equal an independent batch formulation per doc") {
    val p = graft.ops.LmIndex.ensure(spark, sfDir)
    val raw = graft.ops.LmIndex.scoreBigramsRaw(spark,
      graft.ops.LmIndex.holdoutBigrams(spark, sfDir), p)
    // independent bottom-k: sorted score array sliced to ceil-free
    // greatest(n div 5, 1), then integer means
    val batch = raw.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("score_ppm"))).as("ss"),
        count(lit(1)).as("n"), sum(col("backoff")).as("nb"))
      .withColumn("k", greatest(expr("n div 5"), lit(1L)))
      .select(col("doc_id"), col("n"), col("nb"),
        expr("aggregate(ss, 0L, (a, x) -> a + x) div n").as("avg_ppm"),
        expr("aggregate(slice(ss, 1, int(k)), 0L, (a, x) -> a + x) div k")
          .as("mink_ppm"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val gate = StreamingMinKGate
      .gateFrame(spark, sfDir, holdout)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_backoff"),
          r.getAs[Long]("avg_ppm"), r.getAs[Long]("mink_ppm"))).toMap
    assert(batch.nonEmpty && batch.keySet == gate.keySet)
    batch.foreach { case (id, b) =>
      assert(gate(id) == b, s"doc $id: gate ${gate(id)} != batch $b")
    }
  }

  test("gate agrees with t55's suspect rows") {
    val t55 = graft.SparkEntry.queries("t55_min_k_prob")(spark, sfDir)
      .select(col("doc_id"), col("mink_ppm"), col("avg_ppm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t55.nonEmpty)
    val gate = StreamingMinKGate
      .gateFrame(spark, sfDir, holdout)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("mink_ppm"), r.getAs[Long]("avg_ppm"))).toMap
    t55.foreach { case (id, mk, av) =>
      assert(gate(id) == ((mk, av)), s"doc $id drifted")
    }
  }

  test("degenerate docs are admitted with no score") {
    val lm = StreamingMinKGate.literalsFrom(spark, sfDir)
    Seq("", "   ", "solo").foreach { tx =>
      val r = StreamingMinKGate.evalDoc(lm, 7L, tx)
      assert(r.n_bigrams == 0L && r.avg_ppm.isEmpty
        && r.mink_ppm.isEmpty && r.admit, s"text '$tx' -> $r")
    }
  }

  test("MemoryStream replay emits exactly the batch gate frame") {
    implicit val ctx = spark.sqlContext
    val lm = StreamingMinKGate.literalsFrom(spark, sfDir)
    val docs = holdout.as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = StreamingMinKGate
      .gateFrame(lm, in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("mink_gate").start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("mink_gate").orderBy(col("doc_id"))
        .collect().toSeq
      val batch = StreamingMinKGate.gateFrame(lm, holdout)
        .orderBy(col("doc_id")).collect().toSeq
      assert(got.nonEmpty && got == batch)
    } finally q.stop()
  }
}
