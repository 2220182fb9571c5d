package graft.streaming

import graft.SparkSpecBase
import graft.ops.DedupOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streamed Bloom admission gate must agree with batch d30 on replay:
  * identical per-doc contaminated-shingle counts, identical flags, and the
  * no-false-negative contract (every exact-overlap doc is flagged). */
class StreamingBloomGateSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed bloom gate replays to batch d30 counts and flags") {
    implicit val ctx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
    // d30's filter build: benchmark shingles → k=1..3 salted bits →
    // OR-folded 32-bit words
    val benchSh = DedupOps.explodedShingles(docs)
      .filter(col("doc_id") % 50 === 0).select(col("sh")).distinct()
    val bloom = benchSh.select(explode(array((1 to 3).map(k =>
        pmod(graft.ops.TextOps.saltedHash60(col("sh"), k), lit(65536L))): _*))
        .as("b"))
      .select(expr("b div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 32 AS INT))").as("mask"))
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
    val words = StreamingBloomGate.denseWords(bloom)
    assert(words.length == 2048 && words.exists(_ != 0L))

    val train = docs.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val scored = DedupOps.shingleArrays(
        in.toDF().toDF("doc_id", "text"))
      .select(col("doc_id"),
        StreamingBloomGate.bloomHits(words)(col("sh_arr")).as("n_bloom"))
    val q = scored.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("bloom_gate").start()
    try {
      val (b1, b2) = train.splitAt(train.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("bloom_gate")
        .as[(Long, Long)].collect().toMap
      assert(got.size == train.length)
      val batch = graft.queries.DedupQueries
        .queries("d30_bloom_decontaminate")(spark, sfDir)
        .select(col("doc_id"), col("n_bloom"), col("flag_exact"))
        .as[(Long, Long, Boolean)].collect()
      // batch d30 lists every doc with ≥1 bloom-positive shingle; the
      // stream scores everyone — counts must agree exactly on that set,
      // and every unlisted doc must stream to zero
      val batchMap = batch.map(r => r._1 -> r._2).toMap
      batchMap.foreach { case (id, n) =>
        assert(got(id) == n, s"doc $id: stream ${got(id)} != batch $n") }
      got.foreach { case (id, n) =>
        if (!batchMap.contains(id))
          assert(n == 0L, s"doc $id streamed $n but batch saw no hits") }
      // no false negatives: every exact-flagged doc passes the gate
      batch.filter(_._3).foreach { case (id, n, _) =>
        assert(got(id) >= 3L, s"exact-contaminated doc $id under gate: $n") }
    } finally q.stop()
  }
}
