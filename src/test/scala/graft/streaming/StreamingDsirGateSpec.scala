package graft.streaming

import graft.SparkSpecBase
import graft.ops.TextOps._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streamed DSIR gate must replay bit-equal to the batch sampler:
  * same literal bucket weights, same hash-decided Gumbel, admission ≡
  * batch `key_ppm ≥ τ` where τ is the batch budget boundary. */
class StreamingDsirGateSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed DSIR admission replays bit-equal to the batch sampler") {
    implicit val ctx = spark.sqlContext
    val budget = graft.queries.TextQueries.DsirBudget
    val salt = graft.queries.TextQueries.DsirSalt
    val buckets = graft.queries.TextQueries.DsirBuckets

    // batch side: model weights + scored pool + the budget boundary
    val rPpm = graft.queries.TextQueries.dsirModel(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(rPpm.size == buckets, "model must cover every bucket")
    val scored = graft.queries.TextQueries.dsirScored(spark, sfDir)
      .select(col("doc_id"), col("w_ppm"), col("g_ppm"), col("key_ppm"))
      .as[(Long, Long, Long, Long)].collect()
    val tau = scored.map(_._4).sorted(Ordering[Long].reverse)
      .take(budget).last
    val batchAdmitted = scored.filter(_._4 >= tau).map(_._1).toSet
    assert(batchAdmitted.size >= budget)

    // replay the pool (raw docs with ≥2 tokens — batch's feature-bearing
    // population) through the stateless gate across two micro-batches
    val pool = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 50 =!= 0)
      .filter(size(tokens(col("text"))) >= 2)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val gated = StreamingDsirGate.withKey(
      in.toDF().toDF("doc_id", "text")
        .select(col("doc_id"), tokens(col("text")).as("toks")),
      rPpm, salt, buckets, tau)
      .select(col("doc_id"), col("w_ppm"), col("g_ppm"), col("key_ppm"),
        col("admitted"))
    val q = gated.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dsir_gate").start()
    try {
      val (b1, b2) = pool.splitAt(pool.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("dsir_gate")
        .as[(Long, Long, Long, Long, Boolean)].collect()
      assert(got.length == pool.length)
      // every per-doc integer bit-equal to the batch scorer
      val batchByDoc = scored.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      got.foreach { case (id, w, g, k, _) =>
        assert(batchByDoc(id) == ((w, g, k)),
          s"doc $id: stream ($w,$g,$k) != batch ${batchByDoc(id)}")
      }
      val streamAdmitted = got.filter(_._5).map(_._1).toSet
      assert(streamAdmitted == batchAdmitted,
        "threshold admission must equal the batch boundary set")
    } finally q.stop()
  }
}
