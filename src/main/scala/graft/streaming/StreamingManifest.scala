package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Manifest ACCRETION at ingest — the streaming form of the p5 shard
  * manifest ([[graft.queries.PipelineQueries]] `p5_manifest`): the writer
  * that assigns shards on arrival ([[StreamingShardPacker]]) also OWES
  * the chain-of-custody row for every shard it finishes. Keyed by the
  * pack stratum (lang), the state is the one OPEN shard — running token
  * prefix plus the accumulating member content-md5 concat and its
  * doc/token/range counters; when an arriving document's prefix lands in
  * a NEW shard, the open shard is complete by construction (the pack
  * order is doc order) and its manifest row — including shard_md5 =
  * md5 of the member md5s in arrival order — is emitted exactly once.
  *
  * Equivalence contract (spec-asserted): replaying the corpus in doc_id
  * order yields, for every CLOSED shard, a row bit-equal to the batch
  * manifest formula (p5's window + agg); the per-stratum tail shard
  * stays open in state — a streaming writer cannot know the corpus
  * ended — until the feed owner appends a FLUSH sentinel
  * (`DocIn(..., flush = true)`, one per stratum, after the last real
  * document): the sentinel closes the open tail shard, emits its row,
  * and clears the state, so a bounded replay's full manifest equals the
  * batch manifest INCLUDING the tail (spec-asserted). A flush against
  * empty state is a no-op.
  *
  * At scale: state per stratum is one open shard's member-hash list —
  * ShardTokens-bounded, the same bound as p5's agg state; per-doc work
  * is O(1) plus one 32-char append. No corpus-wide anything. */
object StreamingManifest {

  val ShardTokens: Long = graft.ops.CurationLedger.ShardTokens.toLong

  final case class DocIn(lang: String, docId: Long, ntok: Long, h: String,
      flush: Boolean = false)
  final case class ManifestRow(lang: String, shard: Long, nDocs: Long,
      shardTokens: Long, firstDoc: Long, lastDoc: Long, shardMd5: String)
  final case class Open(prefix: Long, shard: Long, concat: String,
      nDocs: Long, tokens: Long, firstDoc: Long, lastDoc: Long)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  final class ManifestProcessor
      extends StatefulProcessor[String, DocIn, ManifestRow] {
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Open]("open",
        Encoders.product[Open], TTLConfig.NONE)

    override def handleInputRows(lang: String, rows: Iterator[DocIn],
        timerValues: TimerValues): Iterator[ManifestRow] = {
      val (flushes, docs) = rows.toSeq.partition(_.flush)
      val ordered = docs.sortBy(_.docId)
      var st = if (open.exists()) open.get()
               else Open(0L, 0L, "", 0L, 0L, Long.MaxValue, Long.MinValue)
      val out = Seq.newBuilder[ManifestRow]
      ordered.foreach { r =>
        val shard = st.prefix / ShardTokens
        if (st.nDocs > 0 && shard != st.shard) {
          out += ManifestRow(lang, st.shard, st.nDocs, st.tokens,
            st.firstDoc, st.lastDoc, md5hex(st.concat))
          st = Open(st.prefix, shard, "", 0L, 0L,
            Long.MaxValue, Long.MinValue)
        }
        st = Open(st.prefix + r.ntok, shard, st.concat + r.h,
          st.nDocs + 1, st.tokens + r.ntok,
          math.min(st.firstDoc, r.docId), math.max(st.lastDoc, r.docId))
      }
      // End-of-feed finalization: a flush sentinel (processed AFTER this
      // batch's documents — the feed owner appends it last) closes the
      // open tail shard and clears the state, so a bounded replay's
      // manifest equals the batch manifest INCLUDING the tail. Idempotent:
      // a flush against empty state emits nothing.
      if (flushes.nonEmpty) {
        if (st.nDocs > 0)
          out += ManifestRow(lang, st.shard, st.nDocs, st.tokens,
            st.firstDoc, st.lastDoc, md5hex(st.concat))
        open.clear()
      } else open.update(st)
      out.result().iterator
    }
  }

  /** (lang, doc_id, ntok, h) stream → CLOSED shard manifest rows; each
    * stratum's tail shard stays in state until a successor doc closes
    * it. */
  def manifests(spark: SparkSession, docs: DataFrame)
      : Dataset[ManifestRow] = {
    import spark.implicits._
    docs.select(col("lang"), col("doc_id").as("docId"),
        col("ntok").cast("long").as("ntok"), col("h"),
        (if (docs.columns.contains("flush")) col("flush")
         else lit(false)).as("flush"))
      .as[DocIn]
      .groupByKey(_.lang)
      .transformWithState(new ManifestProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
