package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streamed Gopher battery: the row-local HOF form must reproduce
  * the batch t52 query (explode + per-doc windows) column-for-column —
  * two independent implementations of the same 13-rule contract,
  * including the interval-union duplicate-gram coverage — and the gate
  * must replay identically through a MemoryStream. */
class StreamingGopherGateSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy(col("doc_id")).collect().toSeq

  test("HOF rule frame equals the batch t52 windows column-for-column") {
    val hof = StreamingGopherGate.ruleFrame(docs)
    val batch = graft.SparkEntry.queries("t52_gopher_rules")(spark, sfDir)
    assert(hof.columns.toSeq == batch.columns.toSeq)
    val h = rowsOf(hof)
    val b = rowsOf(batch)
    assert(h.size == b.size && h.nonEmpty)
    h.zip(b).foreach { case (x, y) => assert(x == y, s"\nhof:   $x\nbatch: $y") }
    // the intricate paths are genuinely exercised on this corpus
    val dup3 = hof.filter(col("dup3_ppm") > 0).count()
    assert(dup3 > 0, "dup-gram coverage never fired — corpus drift?")
  }

  test("planted 5-gram geometry: interval-union coverage is exact") {
    // "a b c d e x a b c d e": the 5-gram "a b c d e" occurs at char
    // intervals [0,9) and [12,21) — disjoint, covered = 18 of nc = 21
    // normalized chars (11 tokens ·1 char + 10 spaces).
    val r = StreamingGopherGate.evalDoc(1L, "a b c d e x a b c d e")
    assert(r.dup5_ppm.contains(18L * 1000000L / 21L)) // 857142
    assert(r.dup6_ppm.contains(0L))                   // no repeated 6-gram
    // "a a a a a a a": the 5-gram occurs at [0,9), [2,11), [4,13) —
    // OVERLAPPING; union [0,13) = all 13 chars, counted once.
    val r2 = StreamingGopherGate.evalDoc(2L, "a a a a a a a")
    assert(r2.dup5_ppm.contains(1000000L))
    // and the published dup-5 verdict fires on it
    assert(r2.n_failed >= 1L && !r2.keep)
    // top-gram chars: "a a" occurs 6×, charlen 3 → 18 of 13 chars
    assert(r2.top2_ppm.contains(18L * 1000000L / 13L))
  }

  test("empty/whitespace doc survives the gate with the batch NULL shape") {
    // split("") yields one zero-length token → nc = 0: the batch's
    // `x div 0` is NULL and its `WHEN pass THEN 0 ELSE 1` verdict CASE
    // routes every NULL ppm to ELSE — all 13 rules fail. The gate must
    // emit that row, not throw ArithmeticException.
    for (tx <- Seq("", "   ", "\t\n")) {
      val r = StreamingGopherGate.evalDoc(9L, tx)
      assert(r.n_words == 1L && r.mean_wl_centi == 0L && r.alpha_ppm == 0L)
      assert(r.top2_ppm.isEmpty && r.top4_ppm.isEmpty &&
        r.dup3_ppm.isEmpty && r.dup10_ppm.isEmpty)
      assert(r.n_failed == 13L && !r.keep)
    }
    // and the DataFrame form carries the None through as SQL NULL
    val df = StreamingGopherGate.ruleFrame(
      Seq((9L, ""), (10L, "the of and the of and " * 10)).toDF("doc_id", "text"))
    val rows = df.orderBy(col("doc_id")).collect()
    assert(rows(0).isNullAt(df.columns.indexOf("top2_ppm")))
    assert(!rows(1).isNullAt(df.columns.indexOf("top2_ppm")))
  }

  test("streamed gate replays to the batch rule frame exactly") {
    implicit val ctx = spark.sqlContext
    val incoming = docs.as[(Long, String)].collect().sortBy(_._1)
    val in = MemoryStream[(Long, String)]
    val streamed = StreamingGopherGate.ruleFrame(
      in.toDF().toDF("doc_id", "text"))
    val q = streamed.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("gopher_gate").start()
    try {
      val (b1, b2) = incoming.splitAt(incoming.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("gopher_gate")
        .orderBy(col("doc_id")).collect().toSeq
      val batch = rowsOf(StreamingGopherGate.ruleFrame(docs))
      assert(got.size == batch.size)
      got.zip(batch).foreach { case (x, y) => assert(x == y) }
      // both verdicts occur — the gate separates this corpus
      val keeps = got.map(_.getBoolean(got.head.length - 1)).toSet
      assert(keeps == Set(true, false))
    } finally q.stop()
  }
}
