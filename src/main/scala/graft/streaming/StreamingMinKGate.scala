package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Min-K% Prob membership gating at INGEST (the streaming twin of
  * t55_min_k_prob — Shi et al. 2023): a document the language model has
  * already SEEN keeps even its worst tokens well-predicted, so a HIGH
  * bottom-20% mean score marks a suspected train-set member and an
  * ingest stream feeding an EVAL/holdout corpus must reject it — the
  * LM-side decontamination gate, complementing the n-gram gates
  * (StreamingBloomGate's d30 shape, d14's exact join).
  *
  * The persisted [[graft.ops.LmIndex]] count tables are vocab-bounded
  * (this corpus: 31 tokens ⇒ ≤961 pair rows), so the whole model loads
  * driver-side ONCE into plain Scala maps captured by a stateless typed
  * map — zero state, zero shuffle, per-doc cost independent of corpus
  * size (the StreamingNbGate / StreamingGopherGate literal-model
  * discipline). Scoring is the exact integer arithmetic of
  * [[graft.ops.LmIndex.scoreBigramsRaw]]: seen pair → pair·10⁶ div
  * prefix; unseen → 0.4-backoff as uni·2·10⁶ div (5·n_tok); all
  * non-negative, so Scala `/` ≡ SQL `div`. The bottom-⌊20%⌋ selection
  * (floor(n div 5) clamped to ≥1, matching the batch t55 exactly)
  * sorts scores ascending — the batch breaks ties by (score, w1, w2),
  * but boundary ties have EQUAL scores, so the bottom-k SUM (and hence
  * mink_ppm) is tie-order invariant and the spec asserts bit-equality
  * against the batch windows.
  *
  * Degenerate input (≤1 token ⇒ no bigrams): the batch t55 frame simply
  * has no row for such a doc, so the gate emits None score fields and
  * ADMITS — no evidence is not membership evidence (and an ingest gate
  * must survive the empty doc, the StreamingGopherGate nc==0 lesson).
  */
object StreamingMinKGate {

  final case class MinKRow(doc_id: Long, n_bigrams: Long, n_backoff: Long,
    avg_ppm: Option[Long], mink_ppm: Option[Long], admit: Boolean)

  /** Suspected-member threshold (ppm): reject when mink_ppm ≥ this.
    * A deployment would set it from t55's corpus readout; the literal
    * only gates the verdict column — scores ship regardless. */
  val MinKTau = 500000L

  /** The persisted LM as driver-side literal maps (vocab-bounded). */
  final case class LmLiterals(pair: Map[(String, String), Long],
    pref: Map[String, Long], uni: Map[String, Long], nTok: Long)

  def literalsFrom(s: SparkSession, sfDir: String): LmLiterals = {
    val p = graft.ops.LmIndex.ensure(s, sfDir)
    val pair = s.read.parquet(p.pair).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        r.getAs[Long]("pair_cnt"))).toMap
    val pref = s.read.parquet(p.pref).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[Long]("pref_cnt"))).toMap
    val uni = s.read.parquet(p.uni).collect()
      .map(r => (r.getAs[String]("w2"), r.getAs[Long]("uni_cnt"))).toMap
    val nTok = s.read.parquet(p.totals).collect().head.getAs[Long]("n_tok")
    LmLiterals(pair, pref, uni, nTok)
  }

  /** Row-local scoring of one document against the literal model. */
  def evalDoc(lm: LmLiterals, docId: Long, text: String): MinKRow = {
    val toks = text.trim.split("\\s+")
    if (toks.length < 2 || toks.forall(_.isEmpty))
      return MinKRow(docId, 0L, 0L, None, None, admit = true)
    val scores = new Array[Long](toks.length - 1)
    var backoff = 0L
    var i = 0
    while (i < toks.length - 1) {
      val w1 = toks(i); val w2 = toks(i + 1)
      scores(i) = lm.pair.get((w1, w2)) match {
        case Some(pc) => pc * 1000000L / lm.pref(w1)
        case None =>
          backoff += 1L
          lm.uni.getOrElse(w2, 0L) * 2000000L / (5L * lm.nTok)
      }
      i += 1
    }
    val n = scores.length.toLong
    val avg = scores.sum / n
    java.util.Arrays.sort(scores)
    val k = math.max(n / 5L, 1L).toInt
    val mink = scores.iterator.take(k).sum / k
    MinKRow(docId, n, backoff, Some(avg), Some(mink), mink < MinKTau)
  }

  /** The gate frame from `(doc_id, text)` rows — a stateless typed map:
    * works on a streaming DataFrame unchanged. */
  def gateFrame(lm: LmLiterals, docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, tx) => evalDoc(lm, id, tx) }
      .toDF()
  }

  /** Convenience: literals + frame in one call (batch comparison path). */
  def gateFrame(s: SparkSession, sfDir: String, docs: DataFrame): DataFrame =
    gateFrame(literalsFrom(s, sfDir), docs)
}
