package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Ingest-time EXACT near-duplicate gating — the streaming form of d20's
  * PPJoin (`DedupOps.ppJoinPairs`): as documents arrive, the first
  * `n − ⌈τ·n⌉ + 1` of the doc's hash-sorted shingle hashes (its PREFIX
  * under a global total order) each probe a keyed state store; earlier
  * documents that claimed the same prefix token are verified by EXACT
  * Jaccard over the full stored hash sets. This upgrades
  * [[StreamingNearDup]]'s probabilistic Hamming-band gate to the exact
  * τ-Jaccard verdict a curation pipeline actually wants at ingest: every
  * emitted pair truly has J ≥ τ, and — by the prefix-filter theorem, which
  * only needs BOTH prefixes drawn under the SAME total order — every
  * arriving doc with J ≥ τ against an earlier doc shares a prefix token
  * with it, so nothing true is missed (the batch twin proves the same
  * theorem against d4's exhaustive oracle; the spec replays a corpus and
  * asserts pair-set equality with `ppJoinPairs`).
  *
  * Order choice: ascending 60-bit shingle HASH, not batch d20's ascending
  * document frequency — a stream can't know global df, and completeness
  * holds under any fixed order; df-ordering is only a candidate-count
  * optimization. Verification is exact up to 60-bit hash collisions
  * inside one pair's union (~|union|²/2⁶¹ — the batch twin's bound).
  *
  * State: per claimed token, up to `maxClaims` (docId, sorted hash set)
  * entries — bounded like the heavy-hitter caps; a token at capacity
  * still VERIFIES arrivals against its stored claims but accepts no new
  * claimers (documented recall consequence on pathological corpora; the
  * spec's corpus never hits it). Per-doc work: ~(1−τ)·n state probes with
  * merge-intersects — no joins, no shuffles beyond the token-key exchange.
  */
object StreamingPPJoin {

  final case class PrefixProbe(token: Long, docId: Long, tsMs: Long,
      set: Array[Long])
  /** One J ≥ τ match of an arriving doc against an earlier claimer; a doc
    * matching k earlier docs emits k rows (callers reduce as needed). */
  final case class PairVerdict(docId: Long, dupOf: Long, inter: Long,
      unionSz: Long)
  final case class SetClaim(docId: Long, set: Array[Long])

  /** Sorted-ascending merge intersect size. */
  private def intersectSize(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var n = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  final class PrefixClaimProcessor(tau: Double, maxClaims: Int)
      extends StatefulProcessor[Long, PrefixProbe, PairVerdict] {
    @transient private var claims: ListState[SetClaim] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claims = getHandle.getListState[SetClaim]("claims",
        Encoders.product[SetClaim], TTLConfig.NONE)

    override def handleInputRows(token: Long, rows: Iterator[PrefixProbe],
        timerValues: TimerValues): Iterator[PairVerdict] = {
      // Deterministic intra-batch order (sources don't guarantee one).
      val ordered = rows.toSeq.sortBy(p => (p.tsMs, p.docId))
      val held = scala.collection.mutable.ArrayBuffer
        .from(claims.get().toSeq)
      val out = Seq.newBuilder[PairVerdict]
      var dirty = false
      ordered.foreach { p =>
        held.foreach { c =>
          if (c.docId != p.docId) {
            val i = intersectSize(c.set, p.set)
            val u = c.set.length + p.set.length - i
            if (i.toDouble / u >= tau)
              out += PairVerdict(p.docId, c.docId, i, u)
          }
        }
        // Claim even when flagged (chain semantics, like the band gate) —
        // but never double-claim: a doc's prefix tokens are distinct, so
        // it appears at most once per key and needs no self-dedup here.
        if (held.length < maxClaims && !held.exists(_.docId == p.docId)) {
          held += SetClaim(p.docId, p.set)
          dirty = true
        }
      }
      if (dirty) claims.put(held.toArray)
      out.result().iterator
    }
  }

  /** (doc_id, ts, text) stream → J ≥ τ matches against earlier docs.
    * Shingling and hashing mirror the batch family
    * ([[graft.ops.DedupOps.shingleArrays]] + `hash60`); τ is fixed to 1/2
    * like `ppJoinPairs` (the prefix-length arithmetic is specialized). */
  def pairVerdicts(spark: SparkSession, docs: DataFrame,
      maxClaims: Int = 1024): Dataset[PairVerdict] = {
    import spark.implicits._
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("set", array_sort(array_distinct(
        transform(graft.ops.DedupOps.shingles(col("toks"), col("text")),
          s => TextOps.hash60(s)))))
      // prefix length n − ⌈n/2⌉ + 1 (τ = 1/2), identical to ppJoinPairs
      .withColumn("pl",
        expr("size(set) - ((size(set) + 1) div 2) + 1"))
      .select(col("doc_id").as("docId"), unix_millis(col("ts")).as("tsMs"),
        col("set"), explode(expr("slice(set, 1, pl)")).as("token"))
      .select(col("token"), col("docId"), col("tsMs"), col("set"))
      .as[PrefixProbe]
      .groupByKey(_.token)
      .transformWithState(new PrefixClaimProcessor(0.5, maxClaims),
        TimeMode.None(), OutputMode.Append())
  }

  /** Distinct (earlier, later) pairs with their exact overlap stats — the
    * shape batch d20 emits, for replay-agreement checks. A pair found via
    * several shared prefix tokens emits identical verdict rows; distinct
    * collapses them exactly. */
  def pairs(verdicts: DataFrame): DataFrame =
    verdicts.select(
        least(col("docId"), col("dupOf")).as("doc_a"),
        greatest(col("docId"), col("dupOf")).as("doc_b"),
        col("inter"), col("unionSz").as("union_sz"))
      .distinct()
}
