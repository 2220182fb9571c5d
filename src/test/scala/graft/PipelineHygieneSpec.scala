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
}
