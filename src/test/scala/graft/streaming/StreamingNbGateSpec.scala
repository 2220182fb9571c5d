package graft.streaming

import graft.SparkSpecBase
import graft.ops.ClassifierOps
import graft.ops.TextOps._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streamed linear serving of the distilled t38 classifier must be
  * BIT-equal to batch nbPredict margins on replay — the linear collapse
  * (w = ln₁ − ln₀) is an integer identity, not an approximation. */
class StreamingNbGateSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed NB gate replays bit-equal to batch margins and predictions") {
    implicit val ctx = spark.sqlContext
    val t = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val lab = t.select(col("doc_id"),
      when(wordSetCount(col("toks"), stopwords) * 10000
        >= lit(graft.queries.TextQueries.QualityKeepBp) * size(col("toks")), 1)
        .otherwise(0).as("cls"))
    val tf = t.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val trainTf = tf.filter(col("doc_id") % 4 =!= 0)
    val trainLab = lab.filter(col("doc_id") % 4 =!= 0)

    val batch = ClassifierOps.nbPredict(trainTf, trainLab,
        tf.filter(col("doc_id") % 4 === 0),
        lab.filter(col("doc_id") % 4 === 0).select("doc_id"))
      .select("doc_id", "pred_cls", "margin_ppm")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batch.nonEmpty)

    val (w, unseen, priorGap) = ClassifierOps.nbLinearModel(trainTf, trainLab)
    assert(w.nonEmpty && w.values.exists(_ != 0L),
      "weights must carry signal (stopword tokens separate the classes)")

    val holdout = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val margin = StreamingNbGate.marginColumn(w, unseen, priorGap)(
      tokens(col("text")))
    val gated = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), margin.as("margin_ppm"))
      .select(col("doc_id"), col("margin_ppm"),
        StreamingNbGate.predColumn(col("margin_ppm")).as("pred_cls"))
    val q = gated.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("nb_gate").start()
    try {
      val (b1, b2) = holdout.splitAt(holdout.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("nb_gate")
        .select("doc_id", "pred_cls", "margin_ppm")
        .as[(Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.size == holdout.length)
      assert(got == batch,
        "streamed linear margins must be bit-equal to batch NB scores")
    } finally q.stop()
  }
}
