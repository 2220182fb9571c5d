package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame

/** Gopher quality gating at INGEST: every t52 rule is a PER-DOCUMENT
  * computation, so the stream evaluates the full battery row-locally in
  * a typed map — zero state, zero shuffle, per-doc cost independent of
  * corpus size — and the spec asserts bit-equality with the batch t52
  * query (explode + per-doc windows) column-for-column. Two INDEPENDENT
  * implementations of the same 13-rule contract (a plain-Scala
  * evaluator vs the declarative Catalyst plan — the StreamingBpeApply
  * "independent Scala reference" discipline), including the trickiest
  * rule: interval-union duplicate-n-gram character coverage.
  *
  * A first attempt expressed this gate as nested Column HOFs; Catalyst's
  * projection collapsing re-inlines the shared offset/gram
  * subexpressions into every consumer and analysis goes super-linear
  * (the NEXT.md lateral-alias-inlining pathology — a single core spun
  * for 30+ minutes before the plan ever ran). A typed map sidesteps the
  * optimizer entirely, which is exactly right for row-local imperative
  * work at ingest grain; the declarative batch form remains the
  * at-scale path for 100k-token documents.
  *
  * All char arithmetic lives in the same normalized single-space
  * coordinate system as t52 (token lengths + one space between), and
  * every division has non-negative operands, so Scala `/` ≡ SQL `div`
  * — EXCEPT the degenerate empty/whitespace-only document, where the
  * normalized char count `nc = total_len + n − 1` is 0 (split yields a
  * single zero-length token). SQL `x div 0` is NULL, and the verdict
  * CASE (`WHEN pass THEN 0 ELSE 1`) routes NULL to the ELSE, so the
  * batch emits NULL ppm columns that each COUNT AS FAILED. The ppm
  * fields are therefore `Option[Long]` (None ⇔ batch NULL, None ⇒
  * rule failed), keeping the bit-equality contract on exactly the
  * input an ingest gate must survive rather than throwing
  * ArithmeticException and killing the stream.
  */
object StreamingGopherGate {

  final case class GopherRow(doc_id: Long, n_words: Long,
    mean_wl_centi: Long, stop_cnt: Long, alpha_ppm: Long,
    top2_ppm: Option[Long], top3_ppm: Option[Long], top4_ppm: Option[Long],
    dup3_ppm: Option[Long], dup4_ppm: Option[Long], dup5_ppm: Option[Long],
    dup6_ppm: Option[Long], dup7_ppm: Option[Long], dup8_ppm: Option[Long],
    dup9_ppm: Option[Long], dup10_ppm: Option[Long],
    n_failed: Long, keep: Boolean)

  /** The published Appendix-A thresholds (ppm) — the same literals the
    * batch verdict string [[graft.queries.TextQueries.gopherFails]]
    * embeds. */
  val TopTh: Map[Int, Long] =
    Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L)
  val DupTh: Map[Int, Long] =
    Map(5 -> 150000L, 6 -> 140000L, 7 -> 130000L, 8 -> 120000L,
      9 -> 110000L, 10 -> 100000L)

  private val stopSet = TextOps.stopwords.toSet

  /** Row-local evaluation of the full battery for one document. */
  def evalDoc(docId: Long, text: String): GopherRow = {
    val toks = text.trim.split("\\s+")
    val n = toks.length.toLong
    val offs = new Array[Long](toks.length + 1)
    var i = 0
    while (i < toks.length) {
      offs(i + 1) = offs(i) + toks(i).length + 1; i += 1
    }
    val totalLen = toks.iterator.map(_.length.toLong).sum
    val stopCnt = toks.count(stopSet.contains).toLong
    val alphaCnt = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
    val nc = totalLen + n - 1

    def gramsOf(w: Int): Array[(String, Long, Long)] =
      if (toks.length < w) Array.empty
      else Array.tabulate(toks.length - w + 1) { p =>
        (toks.slice(p, p + w).mkString(" "), offs(p), offs(p + w) - 1)
      }
    // the most frequent gram: max count, then max charlen (the
    // gram-string tie never changes count·charlen) — as count × charlen
    def topChars(gi: Array[(String, Long, Long)]): Long =
      if (gi.isEmpty) 0L
      else {
        val per = gi.groupBy(_._1).valuesIterator
          .map(xs => (xs.length.toLong, xs.head._3 - xs.head._2)).toSeq
        val cmax = per.map(_._1).max
        cmax * per.filter(_._1 == cmax).map(_._2).max
      }
    // chars inside any gram occurring ≥2 times, overlap counted ONCE
    def dupChars(gi: Array[(String, Long, Long)]): Long = {
      val cnt = gi.groupBy(_._1).map { case (g, xs) => (g, xs.length) }
      val ivs = gi.iterator.filter(x => cnt(x._1) >= 2)
        .map(x => (x._2, x._3)).toArray.sorted
      var cov = 0L; var mx = -1L
      for ((s, e) <- ivs) {
        cov += math.max(0L, e - math.max(s, mx)); mx = math.max(mx, e)
      }
      cov
    }
    // nc == 0 ⇔ empty/whitespace-only doc: SQL `x div 0` = NULL, and
    // the batch verdict CASE counts NULL ppm as failed (see scaladoc)
    def ppm(x: Long): Option[Long] =
      if (nc == 0L) None else Some(x * 1000000L / nc)
    val topPpm = (2 to 4).map(w => w -> ppm(topChars(gramsOf(w)))).toMap
    val dupPpm = (3 to 10).map(w => w -> ppm(dupChars(gramsOf(w)))).toMap
    val alphaPpm = alphaCnt * 1000000L / n
    var failed = 0L
    if (!(n >= 50 && n <= 100000)) failed += 1
    if (!(totalLen * 100 >= 300 * n && totalLen * 100 <= 1000 * n))
      failed += 1
    if (stopCnt < 2) failed += 1
    if (alphaPpm < 800000L) failed += 1
    (2 to 4).foreach(w => if (!topPpm(w).exists(_ <= TopTh(w))) failed += 1)
    (5 to 10).foreach(w => if (!dupPpm(w).exists(_ <= DupTh(w))) failed += 1)
    GopherRow(docId, n, totalLen * 100 / n, stopCnt, alphaPpm,
      topPpm(2), topPpm(3), topPpm(4),
      dupPpm(3), dupPpm(4), dupPpm(5), dupPpm(6), dupPpm(7), dupPpm(8),
      dupPpm(9), dupPpm(10), failed, failed == 0L)
  }

  /** The full t52 output frame from `(doc_id, text)` rows — identical
    * column names, types, and values to the batch query (spec-gated).
    * A stateless typed map: works on a streaming DataFrame unchanged. */
  def ruleFrame(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.selectExpr("doc_id", "text").as[(Long, String)]
      .map { case (id, tx) => evalDoc(id, tx) }
      .toDF()
  }
}
