package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine trained text classification — the "distill an expensive
  * filter into a cheap model, then apply it at corpus scale" lifecycle
  * that production curation pipelines run (CCNet / LLaMA-style quality
  * filtering trains a linear n-gram classifier on labeled examples and
  * sweeps it over the whole crawl).
  *
  * The model is multinomial Naive Bayes with add-one smoothing over
  * token counts. Everything is exact integer arithmetic: likelihoods and
  * priors go through the t36 exponent+mantissa ln approximation
  * (ln x ≈ (floor_log2 x + frac)·ln 2, 2³⁰ fixed point, ppm readout), so
  * scores are BIGINTs and the DuckDB oracle replays the identical
  * integer sequence. The approximation is monotone, and NB only compares
  * per-class sums of these terms, so ranking distortion is bounded by
  * the 0.06-nat per-term error — and both engines distort identically.
  *
  * Scale shape (the reason NB is THE classifier you can train inside a
  * data engine at 100 TB): training is ONE map-side-combinable
  * aggregation over (class, token) — no gradient loop, no driver state;
  * the finished model is a vocab-bounded count table. Scoring is one
  * broadcast of that table into the corpus token scan plus one per-doc
  * aggregation. Nothing quadratic, nothing iterative.
  */
object ClassifierOps {

  /** ln fixed-point base: 2³⁰ keeps the smoothed-likelihood numerator
    * ((cnt+1)·FP2 div (tot+V)) ≥ 1 for any class mass below ~2³⁰ tokens;
    * shard the training aggregation before that point. */
  val NbFp: Long = 1L << 30

  /** ppm ≈ ln(`x`/2³⁰) · 10⁶ for a positive BIGINT fixed-point column —
    * `(floor_log2 x − 30 + frac)·ln 2` with floor_log2 = length(bin(x))−1;
    * `bin()` prints the minimal binary string in Spark AND DuckDB, so the
    * oracle replays the same integers. Max abs error 0.06 nats, monotone. */
  def lnPpmExpr(x: String): String = {
    val lp = s"(length(bin($x)) - 1)"
    val pw = s"shiftleft(1L, cast($lp AS INT))"
    s"((($lp - 30) * ${NbFp}L + (($x - $pw) * ${NbFp}L) div $pw) * 693147) " +
      s"div ${NbFp}L"
  }

  /** The trained model as two frames: per-(cls, tok) smoothed
    * log-likelihoods for TRAIN-VOCAB tokens (`cls, tok, ln_ppm`) and the
    * per-class constants (`cls, unseen_ppm, pr_ppm`) — the smoothed
    * likelihood every out-of-vocabulary token shares, and the smoothed
    * log-prior. Both vocab-/class-bounded (broadcastable). */
  def nbModel(trainTf: DataFrame, trainLab: DataFrame,
      k: Int = 2): (DataFrame, DataFrame) = {
    val tr = trainTf.join(trainLab.select(col("doc_id"), col("cls")), "doc_id")
    // the sufficient statistics: one combinable agg → vocab-bounded
    // count table (+ three scalar/class-bounded count frames)
    val cnt = tr.groupBy(col("cls"), col("tok")).agg(sum(col("tf")).as("cnt"))
    val totRaw = tr.groupBy(col("cls")).agg(sum(col("tf")).as("t"))
    val vocab = tr.agg(countDistinct(col("tok")).as("v"))
    val ncRaw = trainLab.groupBy(col("cls")).agg(count(lit(1)).as("c"))
    val ntr = trainLab.agg(count(lit(1)).as("n"))
    nbModelFromStats(trainTf.sparkSession, cnt, totRaw, vocab, ncRaw, ntr, k)
  }

  /** Model derivation from pre-aggregated sufficient statistics — the
    * path shared by in-query training ([[nbModel]]) and the PERSISTED
    * model ([[ClassifierIndex]]): the statistics are exact BIGINT count
    * aggregations (order-free, parquet-roundtrip-exact), so a model
    * derived from persisted stats is bit-identical to one trained
    * in-query on the same docs. Inputs: `cnt` (cls, tok, cnt), `totRaw`
    * (cls, t — per-class token mass, absent classes missing), `vocab`
    * (v — 1 row), `ncRaw` (cls, c — per-class doc counts), `ntr` (n —
    * 1 row, total train docs). */
  def nbModelFromStats(s: SparkSession, cnt: DataFrame, totRaw: DataFrame,
      vocab: DataFrame, ncRaw: DataFrame, ntr: DataFrame,
      k: Int): (DataFrame, DataFrame) = {
    val classes = s.range(k.toLong).select(col("id").cast("int").as("cls"))
    val tot = classes.join(totRaw, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("t"), lit(0L)).as("tot"))
    val prior = classes.join(ncRaw, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("c"), lit(0L)).as("nc"))
      .crossJoin(ntr)
      .withColumn("x", expr(s"((nc + 1) * ${NbFp}L) div (n + $k)"))
      .select(col("cls"), expr(lnPpmExpr("x")).as("pr_ppm"))
    val seen = cnt.join(tot, "cls").crossJoin(vocab)
      .withColumn("x", expr(s"((cnt + 1) * ${NbFp}L) div (tot + v)"))
      .select(col("cls"), col("tok"), expr(lnPpmExpr("x")).as("ln_ppm"))
    val consts = tot.crossJoin(vocab)
      .withColumn("x", expr(s"${NbFp}L div (tot + v)"))
      .select(col("cls"), expr(lnPpmExpr("x")).as("unseen_ppm"))
      .join(prior, "cls")
    (seen, consts)
  }

  /** Train a binary multinomial NB on `trainTf` (doc_id, tok, tf) with
    * labels `trainLab` (doc_id, cls ∈ {0,1}), score `testTf` docs (same
    * shape) against both classes, and return one row per `testSpine`
    * (doc_id) doc: `(doc_id, pred_cls, margin_ppm)` where margin =
    * score(1) − score(0) in ppm-nats (positive ⇒ class 1; prediction
    * tie-breaks to class 0 on margin 0, matching `margin > 0`).
    *
    * Docs in `testSpine` with no feature rows fall back to the smoothed
    * prior alone. Classes absent from training survive through add-one
    * smoothing on both the prior and every likelihood (the empty-class
    * score is finite and identical in both engines). */
  def nbPredict(trainTf: DataFrame, trainLab: DataFrame, testTf: DataFrame,
      testSpine: DataFrame): DataFrame = {
    val (seen, consts) = nbModel(trainTf, trainLab)
    nbScore(seen, consts, testTf, testSpine)
  }

  /** Serve-only binary scoring against an already-derived model
    * (`seen`/`consts` from [[nbModel]] or a [[ClassifierIndex]] read) —
    * identical arithmetic to [[nbPredict]]'s scoring leg, factored out
    * so the persisted-model path is bit-equal by construction. */
  def nbScore(seen: DataFrame, consts: DataFrame, testTf: DataFrame,
      testSpine: DataFrame): DataFrame = {
    val s = seen.sparkSession
    val classes = s.range(2).select(col("id").cast("int").as("cls"))
    // scoring: broadcast the model INTO the test-token scan — the corpus
    // side never shuffles until the per-doc sum
    val ll = testTf
      .crossJoin(broadcast(classes))
      .join(broadcast(seen), Seq("cls", "tok"), "left")
      .join(broadcast(consts.select(col("cls"), col("unseen_ppm"))), "cls")
      .withColumn("ln", coalesce(col("ln_ppm"), col("unseen_ppm")))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("tf") * col("ln")).as("ll"))
    val scored = testSpine.select(col("doc_id"))
      .crossJoin(broadcast(classes))
      .join(ll, Seq("doc_id", "cls"), "left")
      .join(broadcast(consts.select(col("cls"), col("pr_ppm"))), "cls")
      .select(col("doc_id"), col("cls"),
        (coalesce(col("ll"), lit(0L)) + col("pr_ppm")).as("score"))
    scored.groupBy(col("doc_id"))
      .agg((max(when(col("cls") === 1, col("score")))
        - max(when(col("cls") === 0, col("score")))).as("margin_ppm"))
      .select(col("doc_id"),
        when(col("margin_ppm") > 0, 1).otherwise(0).as("pred_cls"),
        col("margin_ppm"))
  }

  /** k-class generalization of [[nbPredict]]: same model
    * ([[nbModel]] with `k` classes), argmax by (score DESC, cls ASC)
    * window — deterministic tie-break to the smallest class id. Returns
    * `(doc_id, pred_cls, score_ppm)` with the winner's score. */
  def nbPredictK(trainTf: DataFrame, trainLab: DataFrame, testTf: DataFrame,
      testSpine: DataFrame, k: Int): DataFrame = {
    val (seen, consts) = nbModel(trainTf, trainLab, k)
    nbScoreK(seen, consts, testTf, testSpine, k)
  }

  /** k-class serve-only scoring against an already-derived model — the
    * [[nbScore]] factoring applied to [[nbPredictK]]. */
  def nbScoreK(seen: DataFrame, consts: DataFrame, testTf: DataFrame,
      testSpine: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = seen.sparkSession
    val classes = s.range(k.toLong).select(col("id").cast("int").as("cls"))
    val ll = testTf
      .crossJoin(broadcast(classes))
      .join(broadcast(seen), Seq("cls", "tok"), "left")
      .join(broadcast(consts.select(col("cls"), col("unseen_ppm"))), "cls")
      .withColumn("ln", coalesce(col("ln_ppm"), col("unseen_ppm")))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("tf") * col("ln")).as("ll"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls"))
    testSpine.select(col("doc_id"))
      .crossJoin(broadcast(classes))
      .join(ll, Seq("doc_id", "cls"), "left")
      .join(broadcast(consts.select(col("cls"), col("pr_ppm"))), "cls")
      .select(col("doc_id"), col("cls"),
        (coalesce(col("ll"), lit(0L)) + col("pr_ppm")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("pred_cls"),
        col("score").as("score_ppm"))
  }

  /** Serving form: a binary NB is a LINEAR scorer — per-token weight
    * w(tok) = ln₁(tok) − ln₀(tok) (out-of-vocab tokens share one
    * constant), plus the prior gap. Returns (weights, unseenW, priorGap),
    * all in the same ppm integers as [[nbPredict]], so
    * `priorGap + Σ_token-instances w(tok)` is BIT-EQUAL to nbPredict's
    * margin_ppm (integer subtraction is exact). The driver-side Map is
    * the train vocabulary — bounded by construction; this is the form a
    * streaming admission gate embeds as a literal
    * ([[graft.streaming.StreamingNbGate]]). */
  def nbLinearModel(trainTf: DataFrame,
      trainLab: DataFrame): (Map[String, Long], Long, Long) = {
    val (seen, consts) = nbModel(trainTf, trainLab)
    nbLinearFrom(seen, consts)
  }

  /** The linear collapse from an already-derived model — so a streaming
    * gate's embedded weights are literally the COLLAPSED PERSISTED MODEL
    * (`[[ClassifierIndex]].trainModel` → this) rather than a parallel
    * training path. */
  def nbLinearFrom(seen: DataFrame,
      consts: DataFrame): (Map[String, Long], Long, Long) = {
    val cm = consts.select(col("cls"), col("unseen_ppm"), col("pr_ppm"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (u0, p0) = cm(0)
    val (u1, p1) = cm(1)
    val w = seen
      .groupBy(col("tok"))
      .agg(max(when(col("cls") === 1, col("ln_ppm"))).as("l1"),
        max(when(col("cls") === 0, col("ln_ppm"))).as("l0"))
      .select(col("tok"),
        (coalesce(col("l1"), lit(u1)) - coalesce(col("l0"), lit(u0))).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (w, u1 - u0, p1 - p0)
  }
}
