package graft.streaming

import graft.SparkSpecBase
import graft.ops.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streamed per-source cap must land on batch t56's selection: at
  * the batch-derived quota the held state's per-source stats equal the
  * oracle-gated t56 rows bit-for-bit after full replay, with arrivals
  * deliberately decorrelated from quality so admit-then-evict genuinely
  * fires. */
class StreamingSourceCapSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed source cap replays to batch t56's stats exactly") {
    implicit val ctx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // sf0.01: 500 docs / 20 sources → t56's derived cap = (500·8) div
    // (10·20) = 20 against ~25 docs per source, so every source evicts
    val dir = "/root/testdata/sf0.01"
    val cap = 20
    val offers = graft.Tables.documents(spark, dir)
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop", TextOps.wordSetCount(col("toks"),
        TextOps.stopwords))
      .select(col("source"), col("doc_id"),
        expr("(n_stop * 1000000) div n_tokens").as("q"), col("n_tokens"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (s, id, q, nt) =>
        StreamingSourceCap.CapOffer(s, id, q, nt) }
      // arrival order decorrelated from both quality and doc_id
      .sortBy(o => TextOps.hash60Scala(s"order|${o.docId}"))
    val in = MemoryStream[StreamingSourceCap.CapOffer]
    val q = StreamingSourceCap.sourceCapTws(spark, in.toDS(), cap)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("source_cap").start()
    try {
      val (b1, rest) = offers.splitAt(offers.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b.toSeq); q.processAllAvailable()
      }
      val deltas = spark.table("source_cap")
        .as[StreamingSourceCap.CapDelta].collect()
      assert(deltas.length == offers.length, "one verdict per arrival")
      assert(deltas.exists(d => d.admitted && d.evicted >= 0),
        "eviction must fire on this corpus")
      assert(deltas.forall(_.size <= cap), "kept set never exceeds cap")
      // reconstruct the held set: each doc arrives once, so admitted
      // minus evicted is order-free set arithmetic
      val byDoc = offers.map(o => o.docId -> o).toMap
      val streamed = deltas.groupBy(_.source).map { case (s, ds) =>
        val ids = ds.filter(_.admitted).map(_.docId).toSet --
          ds.filter(_.evicted >= 0).map(_.evicted).toSet
        s -> (ids.size.toLong, ids.map(byDoc(_).q).min,
          ids.toSeq.map(byDoc(_).nTokens).sum)
      }
      // the oracle-gated batch op at the same (derived) cap
      val batch = graft.SparkEntry.queries("t56_source_cap")(spark, dir)
        .select(col("source"), col("cap"), col("n_kept"), col("q_floor"),
          col("kept_tokens"))
        .as[(String, Long, Long, Long, Long)].collect()
      assert(batch.forall(_._2 == cap),
        s"spec cap $cap must equal t56's derived cap")
      batch.foreach { case (s, _, nKept, qFloor, keptTok) =>
        val (sn, sq, st) = streamed(s)
        assert((sn, sq, st) == ((nKept, qFloor, keptTok)),
          s"source $s: streamed ($sn,$sq,$st) != batch t56 " +
            s"($nKept,$qFloor,$keptTok)")
      }
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("final kept set is arrival-order invariant") {
    // the replay-invariance claim directly: two opposite arrival orders
    // through the sequential admit/evict step land on the same set
    val offers = Seq(
      ("A", 1L, 10L, 5L), ("A", 2L, 30L, 5L), ("A", 3L, 20L, 5L),
      ("A", 4L, 30L, 5L), ("A", 5L, 5L, 5L)
    ).map { case (s, id, q, nt) => StreamingSourceCap.CapOffer(s, id, q, nt) }
    def runSeq(os: Seq[StreamingSourceCap.CapOffer]): Set[Long] = {
      // drive the processor's greedy step directly (unit grain — the
      // streaming-session path is covered by the replay test above)
      var pts = Vector.empty[StreamingSourceCap.Kept]
      os.foreach { o =>
        val e = StreamingSourceCap.Kept(o.q, o.docId, o.nTokens)
        if (pts.size < 3) pts = (pts :+ e).sortBy(p => (-p.q, p.docId))
        else {
          val worst = pts.last
          if (o.q > worst.q || (o.q == worst.q && o.docId < worst.docId))
            pts = (pts.init :+ e).sortBy(p => (-p.q, p.docId))
        }
      }
      pts.map(_.docId).toSet
    }
    val expect = Set(2L, 3L, 4L) // top-3 by (q desc, id asc): 30/2, 30/4, 20/3
    assert(runSeq(offers) == expect)
    assert(runSeq(offers.reverse) == expect)
  }

  test("cap <= 0 is rejected at construction, not on first arrival") {
    // cap is caller configuration; with cap=0 the over-cap branch would
    // hit pts.last on an empty kept vector and surface as an opaque
    // NoSuchElementException deep inside a microbatch — the processor
    // must fail fast where the misconfiguration is attributable
    val e = intercept[IllegalArgumentException](
      new StreamingSourceCap.SourceCapProcessor(0))
    assert(e.getMessage.contains("source cap"))
  }
}
