package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline-hygiene features a production 100 TB run depends on:
  * `observe` metrics that ride the job (data-quality counters without a
  * second scan) and filter/projection pushdown into the parquet scan
  * (the difference between reading 2 columns and reading 16). */
class PipelineHygieneSpec extends SparkSpecBase {

  test("observe: quality counters ride the job without a second pass") {
    val obs = Observation("quality")
    val docs = Tables.documents(spark, sfDir)
    val out = docs.observe(obs,
      count(lit(1)).as("n_docs"),
      sum(when(length(col("text")) < 20, 1L).otherwise(0L)).as("n_short"),
      max(length(col("text"))).cast("long").as("max_len"))
      .filter(length(col("text")) >= 0) // keep the observe in a real pipeline
    val nOut = out.count()
    val m = obs.get
    assert(m("n_docs") == nOut, s"observed count must equal the scan: $m")
    val wantShort = docs.filter(length(col("text")) < 20).count()
    assert(m("n_short") == wantShort, s"short-doc counter: $m vs $wantShort")
    assert(m("max_len").asInstanceOf[Long] > 0L)
  }

  test("every registered query carries a DuckDB oracle, and vice versa") {
    // the correctness gate only sees queries that have BOTH a `queries`
    // entry and an `oracleSql` entry — a query missing its oracle would
    // silently skip verification (driver records only a rows>0 check).
    // This meta-guard makes the registries drift-proof.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).mkString(", ")}")
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).mkString(", ")}")
    // and every benched query must exist in the registry
    val missing = Bench.headline.filterNot(q.contains)
    assert(missing.isEmpty, s"bench names not in registry: ${missing.mkString(", ")}")
  }

  test("filters and projections push down into the parquet scan") {
    val df = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 30.0)
      .select(col("l_orderkey"), col("l_quantity"))
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter must reach the scan:\n${planStr.take(1500)}")
    assert(planStr.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must read exactly the 2 projected columns:\n${planStr.take(1500)}")
  }

  test("p2 serves every query n16 fuses — none dropped by the MMR leg") {
    // the MMR pairwise frame is a LEFT join precisely so a query whose
    // fused shortlist has one candidate still emits its rank-1 row; an
    // inner join would silently drop it while the oracle keeps it.
    val fused = SparkEntry.queries("n16_rrf_fusion")(spark, sfDir)
      .select("query_id").distinct().as[Long](longEncoder).collect().toSet
    val served = SparkEntry.queries("p2_rag_serve")(spark, sfDir)
      .select("query_id").distinct().as[Long](longEncoder).collect().toSet
    assert(fused.nonEmpty && served == fused,
      s"p2 lost queries: ${(fused -- served).mkString(", ")}")
  }

  private lazy val longEncoder = org.apache.spark.sql.Encoders.scalaLong

  test("p4 dispositions reconcile with p1's stage ledger, evidence is sane") {
    // Two independent formulations of the same chain must agree: p4's
    // per-doc status counts are exactly p1's per-stage (docs_in −
    // docs_out), and 'kept' is the final mixture survivor count. Plus
    // the evidence contract: exact-dup evidence points at a SMALLER id
    // (min-id keeper), collapse evidence at a smaller id, kept docs
    // carry no evidence.
    import org.apache.spark.sql.Row
    val disp = SparkEntry.queries("p4_disposition")(spark, sfDir)
      .collect().map { case Row(id: Long, st: String, ev) =>
        (id, st, Option(ev).map(_.asInstanceOf[Long])) }
    val byStatus = disp.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ledger = SparkEntry.queries("p1_curation_ledger")(spark, sfDir)
      .collect().map { case Row(_, name: String, di: Long, dout: Long,
        _, _) => name -> ((di, dout)) }.toMap
    def dropped(stage: String) = ledger(stage)._1 - ledger(stage)._2
    def d(s: String) = byStatus.getOrElse(s, 0L)
    assert(d("dropped_empty_norm") == dropped("normalize"))
    assert(d("dropped_gate") == dropped("nb_gate"))
    assert(d("dropped_exact_dup") == dropped("exact_dedup"))
    assert(d("collapsed_neardup") == dropped("neardup_collapse"))
    assert(d("dropped_contaminated") == dropped("decontaminate"))
    assert(d("dropped_mixture") == dropped("mixture"))
    assert(d("kept") == ledger("mixture")._2)
    disp.foreach { case (id, st, ev) =>
      if (st == "dropped_exact_dup" || st == "collapsed_neardup")
        assert(ev.isDefined && ev.get < id,
          s"doc $id ($st): evidence must be a smaller-id canonical, got $ev")
      else
        assert(ev.isEmpty, s"doc $id ($st): unexpected evidence $ev")
    }
  }

  test("p3 delta-refresh ledger: stage identities hold") {
    // The incremental-refresh contracts a reader should check without
    // trusting the oracle: normalize/gate/exact never retract base rows
    // (append-safe: pinned model + min-id keepers with later delta ids),
    // the near-dup stage's retractions PARTITION the base keepers
    // (after + retracted = before), and the delta funnel is monotone.
    import org.apache.spark.sql.Row
    val rows = SparkEntry.queries("p3_delta_refresh")(spark, sfDir)
      .collect().map { case Row(id: Long, name: String, di: Long,
        dk: Long, bb: Long, ba: Long, br: Long) =>
        (id, name, di, dk, bb, ba, br) }.sortBy(_._1)
    assert(rows.map(_._2).toSeq ==
      Seq("normalize", "nb_gate", "exact_dedup", "neardup_collapse"))
    rows.foreach { case (_, name, di, dk, bb, ba, br) =>
      assert(dk <= di, s"$name: delta_kept $dk > delta_in $di")
      assert(ba + br == bb,
        s"$name: base_after $ba + retracted $br != base_before $bb")
      if (name != "neardup_collapse")
        assert(br == 0L, s"$name must be append-safe, retracted $br")
    }
    // funnel continuity: stage n's delta_in = stage n-1's delta_kept
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4,
        s"${b._2} delta_in ${b._3} != ${a._2} delta_kept ${a._4}")
    }
  }
}
