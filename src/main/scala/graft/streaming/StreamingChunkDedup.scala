package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Ingest-time chunk-level exact dedup — the streaming form of d24's
  * CCNet-shaped paragraph pass: as documents arrive, each non-overlapping
  * 32-token chunk's 60-bit content hash probes a keyed state store; the
  * FIRST instance of a chunk content claims it (storing the claiming doc
  * id), every later instance — in a later doc, a later batch, or later in
  * the SAME doc — is flagged as a duplicate of the claimer. Downstream,
  * [[docChunkStats]] reduces the per-chunk verdicts to the per-doc
  * dup_ppm a quality gate thresholds on ("reject docs that are >X%
  * already-seen text") BEFORE paying storage for the doc.
  *
  * Relationship to batch d24 (exact, asserted in spec): d24 counts ALL
  * instances of a duplicated content (including the first — the batch
  * pass sees the whole corpus at once), the stream cannot retro-flag a
  * first instance it already shipped; so per doc stream ≤ batch, and
  * corpus-wide Σ stream_dups = Σ batch_dups − |distinct duplicated
  * contents|. A doc replayed verbatim is 100% dup on second arrival.
  *
  * Determinism: in-batch contention on a chunk key resolves in
  * (tsMs, docId, chunkIdx) order; across batches the state store
  * serializes claims.
  *
  * At scale: state is ONE long (claimer id) per distinct chunk content,
  * hash-partitioned by the 60-bit chunk key like any stateful operator —
  * the streaming twin of d24's (ch)-keyed count, with the same skew
  * story (a pathologically hot chunk is one key, its instances combine
  * in the per-batch sort). Per-chunk work is one state lookup; the only
  * exchange is the chunk-key shuffle. RocksDB provider holds billions of
  * chunk keys; pair with TTL if the dedup horizon is bounded. */
object StreamingChunkDedup {

  val ChunkTok = 32

  final case class ChunkProbe(ch: Long, docId: Long, chunkIdx: Long, tsMs: Long)
  /** dupOf = -1: first instance of this content (claimed). */
  final case class ChunkVerdict(docId: Long, chunkIdx: Long, dupOf: Long)

  final class ChunkClaimProcessor
      extends StatefulProcessor[Long, ChunkProbe, ChunkVerdict] {
    @transient private var owner: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[Long]("owner",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(ch: Long, rows: Iterator[ChunkProbe],
        timerValues: TimerValues): Iterator[ChunkVerdict] = {
      val ordered = rows.toSeq.sortBy(p => (p.tsMs, p.docId, p.chunkIdx))
      var own = if (owner.exists()) owner.get() else -1L
      val out = ordered.map { p =>
        if (own < 0) { own = p.docId; ChunkVerdict(p.docId, p.chunkIdx, -1L) }
        else ChunkVerdict(p.docId, p.chunkIdx, own)
      }
      if (own >= 0) owner.update(own)
      out.iterator
    }
  }

  /** (doc_id, ts, text) stream → per-chunk first-claimer verdicts. Chunk
    * extraction mirrors d24 exactly: non-overlapping [[ChunkTok]]-token
    * windows, 60-bit md5 content hash over the re-joined chunk text. */
  def chunkVerdicts(spark: SparkSession, docs: DataFrame): Dataset[ChunkVerdict] = {
    import spark.implicits._
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .withColumn("chunk_start",
        explode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkTok))))
      .select(
        TextOps.hash60(array_join(
          slice(col("toks"), col("chunk_start") + 1, lit(ChunkTok)), " "))
          .as("ch"),
        col("doc_id").as("docId"),
        expr(s"chunk_start div $ChunkTok").as("chunkIdx"),
        unix_millis(col("ts")).as("tsMs"))
      .as[ChunkProbe]
      .groupByKey(_.ch)
      .transformWithState(new ChunkClaimProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Doc-level reduction: d24's (n_chunks, n_dup_chunks, dup_ppm) shape.
    * Exact per micro-batch (a doc's chunk rows never split across
    * batches). */
  def docChunkStats(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("docId").as("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("dupOf") >= 0, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_ppm", expr("n_dup_chunks * 1000000L div n_chunks"))
}
