package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Ingest-time shard packing — the streaming form of the p1 ledger's
  * pack stage ([[graft.ops.CurationLedger.packShards]]): a training-data
  * writer doesn't collect the corpus and then pack; it assigns every
  * arriving document to its output shard ON INGEST and appends. Keyed by
  * the pack stratum (lang), the state is ONE long — the running token
  * prefix — and each document's shard id and in-shard offset fall out of
  * that prefix exactly as the batch window form computes them:
  * shard = prefix div ShardTokens, offset = prefix mod ShardTokens.
  *
  * Equivalence contract (spec-asserted): replaying the corpus in doc_id
  * order through any batch partitioning yields BIT-IDENTICAL assignments
  * to the batch window — token conservation included (the pack stage
  * moves every token exactly once), and a shard that straddles a
  * micro-batch boundary continues, not restarts, because the prefix
  * lives in the state store.
  *
  * At scale: state is |strata| longs (not per-doc anything); per-doc
  * work is one state read + add. The only exchange is the stratum-key
  * shuffle — same profile as the batch pack's lang partition, minus the
  * sort (arrival order IS the pack order; the in-batch docId sort below
  * pins determinism for same-batch arrivals). */
object StreamingShardPacker {

  val ShardTokens: Long = graft.ops.CurationLedger.ShardTokens.toLong

  final case class DocTok(lang: String, docId: Long, ntok: Long)
  final case class ShardAssign(lang: String, docId: Long, ntok: Long,
      shard: Long, offset: Long)

  final class ShardPackProcessor
      extends StatefulProcessor[String, DocTok, ShardAssign] {
    @transient private var prefix: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prefix = getHandle.getValueState[Long]("prefix",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(lang: String, rows: Iterator[DocTok],
        timerValues: TimerValues): Iterator[ShardAssign] = {
      val ordered = rows.toSeq.sortBy(_.docId)
      var p = if (prefix.exists()) prefix.get() else 0L
      val out = ordered.map { r =>
        val a = ShardAssign(r.lang, r.docId, r.ntok,
          p / ShardTokens, p % ShardTokens)
        p += r.ntok
        a
      }
      prefix.update(p)
      out.iterator
    }
  }

  /** (lang, doc_id, ntok) stream → per-doc shard assignments. */
  def assignments(spark: SparkSession,
      docs: DataFrame): Dataset[ShardAssign] = {
    import spark.implicits._
    docs
      .select(col("lang"), col("doc_id").as("docId"),
        col("ntok").cast("long").as("ntok"))
      .as[DocTok]
      .groupByKey(_.lang)
      .transformWithState(new ShardPackProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
