package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Quality gating at INGEST with the distilled classifier: t38's trained
  * Naive Bayes, served in its linear form as a STATELESS streaming
  * projection. The weights ARE the collapsed PERSISTED model —
  * `[[graft.ops.ClassifierIndex]].trainModel` →
  * [[graft.ops.ClassifierOps.nbLinearFrom]] (w = ln₁ − ln₀; spec-proven
  * equal to in-query training's collapse), so the gate and every batch
  * t38 query serve the same artifact, not parallel trainings —
  * per-token ppm weights embedded as one literal map column,
  * out-of-vocab tokens sharing the smoothed-unseen constant, the prior
  * gap as the fold seed (the StreamingIvfAdmission / StreamingBloomGate
  * literal-embedding discipline: no stream-static join re-shipping the
  * model per batch, no state store, no shuffle).
  *
  * The margin is BIT-EQUAL to batch `nbPredict.margin_ppm` on the same
  * doc (proven on replay by the spec): a binary NB's two per-class sums
  * collapse to one weight sum, and integer subtraction loses nothing.
  * This is the real-world shape of a fastText-style quality filter at the
  * firehose: train offline on the labeled slice, sweep every arriving
  * document with a per-row fold whose cost is |tokens| map probes,
  * independent of corpus size.
  *
  * The literal map is the TRAIN VOCABULARY — bounded, but a web-scale
  * vocab (10⁶+) should switch to a broadcast stream-static join on tok;
  * `maxVocab` makes that boundary explicit instead of letting the plan
  * tree silently balloon.
  */
object StreamingNbGate {

  /** margin_ppm column: `priorGap + Σ_token-instances w(tok)` via a
    * per-row fold over `toks`; admit = margin > 0. */
  def marginColumn(weights: Map[String, Long], unseenW: Long, priorGap: Long,
      maxVocab: Int = 100000)(toks: Column): Column = {
    require(weights.size <= maxVocab,
      s"train vocab ${weights.size} exceeds $maxVocab — serve this model " +
        "via a broadcast stream-static join, not a plan literal")
    val wLit = typedLit(weights)
    aggregate(
      transform(toks, t => coalesce(element_at(wLit, t), lit(unseenW))),
      lit(priorGap),
      (acc, w) => acc + w)
  }

  def predColumn(margin: Column): Column =
    when(margin > 0, 1).otherwise(0)

  /** Vocab-drift gauge (t40's OOV audit as a streaming `observe`
    * metric): token instances ABSENT from the persisted model's
    * vocabulary score as the smoothing floor silently — a corpus
    * drifting away from the training slice degrades the gate with no
    * error anywhere. This column counts a row's OOV token instances;
    * `df.observe(Observation, sum(oov), sum(n))` turns it into the
    * per-batch OOV rate a pipeline owner alerts on (re-distill when it
    * leaves the training-time band). Same literal-map probe as the
    * margin — stateless, no shuffle. */
  def oovCountColumn(weights: Map[String, Long],
      maxVocab: Int = 100000)(toks: Column): Column = {
    require(weights.size <= maxVocab,
      s"train vocab ${weights.size} exceeds $maxVocab — serve this model " +
        "via a broadcast stream-static join, not a plan literal")
    val wLit = typedLit(weights)
    size(filter(toks, t => element_at(wLit, t).isNull)).cast("long")
  }
}
