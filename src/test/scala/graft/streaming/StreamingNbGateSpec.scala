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

    // the gate's weights are the collapsed PERSISTED model — and that
    // collapse must equal the in-query training's collapse exactly
    val p = graft.ops.ClassifierIndex.ensure(spark, sfDir,
      graft.ops.ClassifierIndex.Binary)
    val (seen, consts) = graft.ops.ClassifierIndex.trainModel(spark, p, 2)
    val (w, unseen, priorGap) = ClassifierOps.nbLinearFrom(seen, consts)
    assert((w, unseen, priorGap) ==
      ClassifierOps.nbLinearModel(trainTf, trainLab),
      "persisted-model collapse must equal in-query training's collapse")
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
      .select(col("doc_id"), margin.as("margin_ppm"),
        StreamingNbGate.oovCountColumn(w)(tokens(col("text"))).as("oov"),
        size(tokens(col("text"))).cast("long").as("ntok"))
      .select(col("doc_id"), col("margin_ppm"), col("oov"), col("ntok"),
        StreamingNbGate.predColumn(col("margin_ppm")).as("pred_cls"))
      .observe("nb_gate_vocab",
        sum(col("oov")).as("oov_instances"),
        sum(col("ntok")).as("tok_instances"))
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
      // vocab-drift gauge: summed over batches, the observed OOV/token
      // instance counts must equal the batch-side audit on the same docs
      // (t40's readout, against the MODEL vocab instead of the top-N cut)
      val gauges = q.recentProgress.toSeq
        .flatMap(pr => Option(pr.observedMetrics.get("nb_gate_vocab")))
      val gotOov = gauges.map(_.getAs[Long]("oov_instances")).sum
      val gotTok = gauges.map(_.getAs[Long]("tok_instances")).sum
      val expect = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 4 === 0)
        .select(StreamingNbGate.oovCountColumn(w)(tokens(col("text")))
          .as("oov"), size(tokens(col("text"))).cast("long").as("ntok"))
        .agg(sum(col("oov")), sum(col("ntok")))
        .as[(Long, Long)].collect()(0)
      assert(gotTok > 0 && (gotOov, gotTok) == expect,
        s"streamed OOV gauge ($gotOov/$gotTok) != batch audit $expect")
    } finally q.stop()
  }
}
