package graft.streaming

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Ingest-time NEAR-duplicate gating — the streaming form of the d5
  * SimHash-band dedup: as documents arrive, each of the 4 byte-bands of
  * the doc's 32-bit SimHash probes a keyed state store; the FIRST document
  * to touch a bucket claims it (storing its id + full sketch), and a later
  * document whose band collides AND whose full-sketch Hamming distance is
  * within the threshold is flagged as a near-dup of the claimer. This is
  * the filter a training-data firehose runs BEFORE paying storage: batch
  * LSH dedup (d2/d5) needs the whole corpus, this needs one
  * |buckets|-bounded state store and sees each doc once.
  *
  * Semantics (deliberately conservative, like streaming union-find):
  * every arriving doc claims its still-empty buckets even when another
  * band already flagged it as a dup — so a chain A~B~C where C collides
  * only with B's buckets still flags C. Verdicts are per (doc, band);
  * the caller reduces to doc level (any band hit ⇒ dup, earliest-claimer
  * wins) — each doc's 4 band rows share its micro-batch, so a per-batch
  * `groupBy(doc)` reduction is exact.
  *
  * Determinism: bucket contention inside one micro-batch is resolved in
  * (tsMs, docId) order (sources don't guarantee row order within a
  * batch); across batches the state store serializes claims.
  *
  * At scale: state is one (long, long) per OCCUPIED bucket (≤ 1024 for
  * the 32-bit/4-band family; widen the sketch for real corpora), keyed
  * hash-distributed like any stateful operator; per-doc work is 4 state
  * lookups — no joins, no shuffles beyond the band-key exchange.
  */
object StreamingNearDup {

  final case class BandProbe(band: Long, docId: Long, sim: Long, tsMs: Long)
  /** dupOf = -1: this band was fresh (claimed, or no qualifying match). */
  final case class BandVerdict(docId: Long, band: Long, dupOf: Long)
  final case class Claim(docId: Long, sim: Long)

  final class FirstClaimerProcessor(maxHamming: Int)
      extends StatefulProcessor[Long, BandProbe, BandVerdict] {
    @transient private var claim: ValueState[Claim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claim = getHandle.getValueState[Claim]("claim",
        Encoders.product[Claim], TTLConfig.NONE)

    override def handleInputRows(band: Long, rows: Iterator[BandProbe],
        timerValues: TimerValues): Iterator[BandVerdict] = {
      val ordered = rows.toSeq.sortBy(p => (p.tsMs, p.docId))
      var c = if (claim.exists()) claim.get() else null
      val out = ordered.map { p =>
        c match {
          case null =>
            c = Claim(p.docId, p.sim)
            BandVerdict(p.docId, band, -1L)
          case Claim(owner, ownerSim) if owner != p.docId &&
              java.lang.Long.bitCount(ownerSim ^ p.sim) <= maxHamming =>
            BandVerdict(p.docId, band, owner)
          case _ =>
            BandVerdict(p.docId, band, -1L)
        }
      }
      if (c != null) claim.update(c)
      out.iterator
    }
  }

  /** (doc_id, ts, text) stream → per-(doc, band) first-claimer verdicts.
    * Band extraction mirrors [[DedupOps.simhashBands]] / the d5 oracle:
    * band value = (sim >> (band_idx·8)) & 255, bucket key = band_idx·256
    * + band value. */
  def bandVerdicts(spark: SparkSession, docs: DataFrame,
      maxHamming: Int): Dataset[BandVerdict] = {
    import spark.implicits._
    docs
      .withColumn("hs", DedupOps.tokenHashes(TextOps.tokens(col("text"))))
      .withColumn("sim", DedupOps.simhash32(col("hs")))
      .select(col("doc_id").as("docId"), unix_millis(col("ts")).as("tsMs"),
        col("sim"), explode(expr("sequence(0, 3)")).as("band_idx"))
      .withColumn("band", col("band_idx") * 256 +
        expr("shiftright(sim, cast(band_idx * 8 AS INT)) & 255"))
      .select(col("band"), col("docId"), col("sim"), col("tsMs"))
      .as[BandProbe]
      .groupByKey(_.band)
      .transformWithState(new FirstClaimerProcessor(maxHamming),
        TimeMode.None(), OutputMode.Append())
  }

  /** Doc-level reduction of [[bandVerdicts]] output: earliest claimer of
    * any matching band, NULL when the doc is fresh. Exact when applied
    * per micro-batch (a doc's band rows never split across batches). */
  def docVerdicts(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("docId").as("doc_id"))
      .agg(min(when(col("dupOf") >= 0, col("dupOf"))).as("dup_of"))
      .withColumn("is_near_dup", col("dup_of").isNotNull)
}
