package graft.streaming

import graft.ops.MultimodalOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Ingest-time IMAGE near-duplicate gating — the multimodal member of the
  * streaming admission family: m10's aHash-style tile fingerprint
  * ([[MultimodalOps.phash32]]) pushed through [[StreamingNearDup]]'s
  * first-claimer band state machine. As media payloads arrive, each of
  * the 4 byte-bands of the 32-bit fingerprint probes a keyed state store;
  * the FIRST payload to touch a bucket claims it, and a later payload
  * whose band collides AND whose full-fingerprint Hamming distance is
  * within the threshold is flagged as a near-dup of the claimer — the
  * re-encoded/lightly-edited image filter a multimodal firehose runs
  * BEFORE paying object storage, without ever holding the corpus.
  *
  * Reference: batch m10/m11 (`MultimodalQueries`) find the same pairs
  * corpus-at-rest; this sees each payload once with |occupied-buckets|-
  * bounded state. Semantics, determinism, and the conservative
  * cross-chain behavior are exactly [[StreamingNearDup]]'s (the
  * processor is SHARED, not copied — one state machine, two signal
  * kernels); `StreamingPhashGateSpec` pins the batch-m10 precondition,
  * in-batch and cross-batch flagging, and corpus-replay soundness
  * (every streamed flag is a genuine batch pair).
  *
  * At scale: per-payload work is one 32-tile md5 pass in the scan plus 4
  * state lookups; only 4-byte fingerprints reach the state exchange —
  * payload bytes never shuffle (m10's invariant, kept under streaming).
  */
object StreamingPhashGate {

  /** (media_id, ts, payload) stream → per-(media, band) first-claimer
    * verdicts. Band extraction mirrors m10's band kernel: band value =
    * (phash >> (band_idx·8)) & 255, bucket key = band_idx·256 + value. */
  def bandVerdicts(spark: SparkSession, media: DataFrame,
      maxHamming: Int): Dataset[StreamingNearDup.BandVerdict] = {
    import spark.implicits._
    media
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("tw", greatest(expr("byte_len div 32"), lit(1L)))
      .withColumn("sim", MultimodalOps.phash32)
      .select(col("media_id").as("docId"), unix_millis(col("ts")).as("tsMs"),
        col("sim"), explode(expr("sequence(0, 3)")).as("band_idx"))
      .withColumn("band", col("band_idx") * 256 +
        expr("shiftright(sim, cast(band_idx * 8 AS INT)) & 255"))
      .select(col("band"), col("docId"), col("sim"), col("tsMs"))
      .as[StreamingNearDup.BandProbe]
      .groupByKey(_.band)
      .transformWithState(
        new StreamingNearDup.FirstClaimerProcessor(maxHamming),
        TimeMode.None(), OutputMode.Append())
  }

  /** Media-level reduction — [[StreamingNearDup.docVerdicts]] verbatim
    * (earliest claimer of any matching band; NULL = admitted). */
  def mediaVerdicts(verdicts: DataFrame): DataFrame =
    StreamingNearDup.docVerdicts(verdicts)
      .withColumnRenamed("doc_id", "media_id")
      .withColumnRenamed("is_near_dup", "rejected")
}
