package graft.streaming

import graft.SparkSpecBase
import graft.ops.TextOps.tokens
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The curation pipeline's STREAMING FRONT HALF (normalize + the NB
  * quality gate — the stages with no cross-row state) must admit, on
  * replay of the raw corpus, EXACTLY the batch ledger's nb_gate
  * survivors: the streamed gate is the collapsed persisted model
  * (StreamingNbGate) and normalization is a per-row projection, so the
  * streamed survivor set and the batch s2 frame are the same set of
  * doc_ids — the property that lets a 100 TB pipeline run its first two
  * stages at ingest and hand the batch stages an already-gated corpus
  * with a reconciled ledger. */
class CurationFrontSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed normalize+gate admits exactly the batch ledger's survivors") {
    implicit val ctx = spark.sqlContext
    val st = graft.ops.CurationLedger.stages(spark, sfDir)
    val batchS2 = st.s2.select(col("doc_id")).as[Long].collect().toSet
    assert(batchS2.nonEmpty)

    // the gate the stream embeds: the collapsed PERSISTED model
    val p = graft.ops.ClassifierIndex.ensure(spark, sfDir,
      graft.ops.ClassifierIndex.Binary)
    val (seen, consts) = graft.ops.ClassifierIndex.trainModel(spark, p, 2)
    val (w, unseen, priorGap) = graft.ops.ClassifierOps.nbLinearFrom(seen, consts)

    val raw = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val admitted = in.toDF().toDF("doc_id", "text")
      .withColumn("norm_text",
        graft.ops.CurationLedger.normTextCol(col("text")))
      .withColumn("margin_ppm",
        StreamingNbGate.marginColumn(w, unseen, priorGap)(tokens(col("text"))))
      .filter(length(col("norm_text")) > 0 && col("margin_ppm") > 0)
      .select(col("doc_id"))
    val q = admitted.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("curation_front").start()
    try {
      val (b1, b2) = raw.splitAt(raw.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("curation_front").as[Long].collect().toSet
      assert(got == batchS2,
        s"streamed front admitted ${got.size} docs, batch ledger has " +
          s"${batchS2.size}; symmetric diff ${(got diff batchS2) ++ (batchS2 diff got)}")
    } finally q.stop()
  }
}
