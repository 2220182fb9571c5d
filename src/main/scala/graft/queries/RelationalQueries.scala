package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation / window / join / set-op surface (SURVEY.md §2.4 — absent in
  * the reference, built from Spark primitives with DuckDB-oracle checks).
  *
  * Determinism contract with the oracle:
  *  - double aggregates are computed over DECIMAL(18,4) casts — decimal sums
  *    are exact and independent of partial-aggregation order, so Spark (tree
  *    aggregation over 32 partitions) and DuckDB (sequential) agree bit-for-bit
  *    after the final cast to DOUBLE;
  *  - timestamps are emitted as formatted strings (engine-native timestamp
  *    precisions differ: parquet ns vs µs);
  *  - every ORDER BY is total (ties broken by a unique key) and spells out
  *    null ordering (Spark defaults NULLS FIRST asc, DuckDB NULLS LAST).
  *
  * Scale notes are inline per query.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** SUM over an exact decimal view of a double column, surfaced as DOUBLE. */
  private def dsum(e: String): org.apache.spark.sql.Column =
    expr(s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)")

  /** q64b's small-range (linear counting) correction, precomputed:
    * entry V (1-based) = round(1024·ln(1024/V)) for V empty registers.
    * Computed ONCE here and embedded as a literal in BOTH engines'
    * plans, so no runtime `ln` — and therefore no cross-engine libm
    * divergence — ever executes. */
  private[graft] val hllLcTable: Seq[Long] =
    (1 to 1024).map(v => math.round(1024.0 * math.log(1024.0 / v)))

  val SaxWordCap = 64    // q79b hot-word guard: pair only words ≤ cap windows
  val SaxDistTau2 = 2.0  // q79b verify threshold (z-normalized squared L2)
  val SaxTopK = 5        // q79d result depth per query window
  val CusumH = 5         // q80 alarm threshold, in mean-absolute-deviations

  /** q79b/q79c's shared candidate pairs: capped-word SAX window pairs
    * across users, carrying both windows' arrays and stats.
    * (private[graft]: DtwKernelSpec pins the native DP kernel against
    * the fold formulation over exactly this frame.) */
  private[graft] def saxCandidatePairs(s: SparkSession, d: String): DataFrame = {
    val wins = saxWindows(s, d).transform(graft.Tables.stage)
    val hot = wins.groupBy(col("word_id")).agg(count(lit(1)).as("nw"))
      .filter(col("nw") <= SaxWordCap).select(col("word_id"))
    val cand = wins.join(hot, "word_id")
    // pair-expanding byte-light join: pin both exchanges on the word key
    // or AQE's byte-based coalesce runs the whole verify on ONE task
    // (measured: 2×6.5 s single-task stages in q79c at sf0.1 — the
    // d5/d9b/d9r lesson yet again)
    val p = s.sparkContext.defaultParallelism
    val a = cand.select(col("word_id"), col("user_id").as("user_a"),
      col("widx").as("widx_a"), col("arr").as("arr_a"),
      col("mean").as("mean_a"), col("std").as("std_a"))
      .repartition(p, col("word_id"))
    val b = cand.select(col("word_id").as("word_b"),
      col("user_id").as("user_b"), col("widx").as("widx_b"),
      col("arr").as("arr_b"), col("mean").as("mean_b"),
      col("std").as("std_b"))
      .repartition(p, col("word_b"))
    a.join(b, col("word_id") === col("word_b") &&
      col("user_a") < col("user_b"))
  }

  /** q79b/q79d's shared exact verify: z-normalized squared L2 between the
    * paired windows (the arr/mean/std `_a`/`_b` columns from
    * [[saxCandidatePairs]]), as one zip_with fold — IEEE-identical across
    * engines. */
  private val saxDist2Expr: String =
    "aggregate(zip_with(arr_a, arr_b, (x, y) -> " +
      "(CASE WHEN std_a = 0.0D THEN 0.0D " +
      "ELSE (x - mean_a) / std_a END) - " +
      "(CASE WHEN std_b = 0.0D THEN 0.0D " +
      "ELSE (y - mean_b) / std_b END)), " +
      "0.0D, (a, z) -> a + z * z)"

  /** Sakoe-Chiba band-1 DTW over 8-point z-normed windows as a LINEAR
    * FOLD: the band admits only cells (i, i−1), (i, i), (i, i+1), so the
    * whole DP carries 3 doubles of state per step —
    *   lo' = d(i,i−1) + min(mid, lo)
    *   mid' = d(i,i)  + min(hi, lo', mid)
    *   hi'  = d(i,i+1) + min(mid', hi)        (∞ past the last column)
    * seeded at i=1 with (∞, d(1,1), d(1,2)+d(1,1)); answer = final mid.
    * Both engines evaluate it as a higher-order aggregate/list_reduce
    * with a struct accumulator — state references stay SYMBOLIC, so the
    * expression is constant-size (the naive 22-cell unrolling inlines
    * shared subexpressions exponentially: measured as a DuckDB OOM and a
    * minute-long Catalyst analysis before this formulation). lo'/mid'
    * inline once into mid'/hi' — a bounded, shared-free duplication. */
  private def dtwStepExprs(d: (String, String) => String, accLo: String,
      accMid: String, accHi: String, i: String, inf: String)
      : (String, String, String) = {
    val lo = s"(${d(i, s"$i - 1")} + least($accMid, $accLo))"
    val mid = s"(${d(i, i)} + least($accHi, $lo, $accMid))"
    val hi = s"(CASE WHEN $i < 8 THEN ${d(i, s"$i + 1")} " +
      s"+ least($mid, $accHi) ELSE $inf END)"
    (lo, mid, hi)
  }

  /** LB_Keogh lower bound (Keogh & Ratanamahatana 2002) matched to the
    * band-1 DTW over `za`/`zb`: per column i, za_i clamps against zb's
    * band envelope [least, greatest] over positions i−1..i+1. Every
    * band-1 warping path visits every column i at some (i, j) with
    * |i−j| ≤ 1, and (za_i − zb_j)² ≥ the clamped-envelope term there, so
    * LB ≤ DTW² exactly — lb > τ² proves the DP would reject the pair.
    * Emitted as a FLAT 8-term sum (no higher-order fold): fully
    * codegen'd, so the interpreted 3-state DP fold runs only on LB
    * survivors. The filter carries +1e-9 slack so float summation-order
    * noise can never flip a boundary pair the DP keeps — the bound only
    * discards pairs the τ-filter drops, leaving the oracle unchanged. */
  private def lbKeoghExpr: String = {
    val terms = (1 to 8).map { i =>
      val nbrs = (math.max(1, i - 1) to math.min(8, i + 1))
        .map(j => s"element_at(zb, $j)").mkString(", ")
      val za = s"element_at(za, $i)"
      s"(CASE WHEN $za > greatest($nbrs) THEN " +
        s"($za - greatest($nbrs)) * ($za - greatest($nbrs)) " +
        s"WHEN $za < least($nbrs) THEN " +
        s"(least($nbrs) - $za) * (least($nbrs) - $za) " +
        s"ELSE 0.0D END)"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Spark expression string for the banded-DTW fold over columns
    * `za`/`zb` (ARRAY<DOUBLE>, 8 elements). Kept as the REFERENCE
    * formulation: q79c's hot path runs the native codegen twin
    * ([[graft.functions.VectorExpressions.BandedDtw8]] — bit-identical,
    * pinned in `DtwKernelSpec`); this fold is what the DuckDB oracle
    * mirrors symbol-for-symbol. */
  private[graft] def sparkDtwExpr: String = {
    def d(i: String, j: String) =
      s"((element_at(za, $i) - element_at(zb, $j)) * " +
        s"(element_at(za, $i) - element_at(zb, $j)))"
    val inf = "CAST('Infinity' AS DOUBLE)"
    val (lo, mid, hi) =
      dtwStepExprs(d, "acc.lo", "acc.mid", "acc.hi", "i", inf)
    s"""aggregate(sequence(2, 8),
       |  named_struct('lo', $inf, 'mid', ${d("1", "1")},
       |    'hi', ${d("1", "2")} + ${d("1", "1")}),
       |  (acc, i) -> named_struct('lo', $lo, 'mid', $mid, 'hi', $hi),
       |  acc -> acc.mid)""".stripMargin
  }

  /** The DuckDB mirror: same fold with a DOUBLE[] accumulator
    * [i, lo, mid, hi] — NOT a struct one: DuckDB 1.0's list_reduce
    * evaluates struct-literal lambda fields against inconsistent
    * accumulator snapshots when fields share subexpressions (verified
    * with a minimal probe: a field repeating another field's expression
    * reads the NEW value — silently wrong DP cells, caught by this very
    * oracle row failing). List literals evaluate all elements against
    * the same snapshot. Seed rides in as the prepended head; the i=1
    * state is (∞, d(1,1), d(1,2)+d(1,1)); answer = [3] (mid). */
  private def duckDtwExpr: String = {
    def idx(e: String) = s"CAST($e AS BIGINT)"
    def d(i: String, j: String) =
      s"((za[${idx(i)}] - zb[${idx(j)}]) * (za[${idx(i)}] - zb[${idx(j)}]))"
    val inf = "'infinity'::DOUBLE"
    val (lo, mid, hi) =
      dtwStepExprs(d, "acc[2]", "acc[3]", "acc[4]", "x[1]", inf)
    s"""(list_reduce(
       |  list_prepend(
       |    [1.0, $inf, ${d("1", "1")},
       |     ${d("1", "2")} + ${d("1", "1")}]::DOUBLE[],
       |    list_transform(generate_series(2, 8),
       |      n -> [CAST(n AS DOUBLE), 0.0, 0.0, 0.0])),
       |  (acc, x) -> [x[1], $lo, $mid, $hi]))[3]""".stripMargin
  }

  /** DuckDB SAX symbol for PAA segment `i` (1-based subscripts). */
  private def dkSaxSym(i: Int): String = {
    val paa = s"((arr[${i * 2 + 1}] + arr[${i * 2 + 2}]) / 2.0)"
    val z = s"(CASE WHEN std = 0.0 THEN 0.0 ELSE ($paa - mean) / std END)"
    s"(CASE WHEN $z < -0.6745 THEN 0 WHEN $z < 0.0 THEN 1 " +
      s"WHEN $z < 0.6745 THEN 2 ELSE 3 END)"
  }

  /** The q79b/q79c/q79d oracles' shared candidate chain (mirror of
    * [[saxWindows]] + the hot-word cap): CTEs `ev..c`, where `c` is the
    * capped window set carrying (user_id, widx, arr, mean, std, word_id). */
  private lazy val dkSaxCandBase: String =
    s"""ev AS (
       |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
       |         CAST(value AS DOUBLE) AS v
       |  FROM events
       |  WHERE event_type = 'purchase' AND value IS NOT NULL),
       |w AS (
       |  SELECT user_id,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |                       ORDER BY ts_us, event_id) AS widx,
       |    list(v) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS arr
       |  FROM ev),
       |f AS (SELECT user_id, widx, arr FROM w WHERE len(arr) = 8),
       |m AS (
       |  SELECT user_id, widx, arr,
       |    list_reduce(list_prepend(0.0::DOUBLE, arr), (a, x) -> a + x)
       |      / 8.0 AS mean
       |  FROM f),
       |s AS (
       |  SELECT user_id, widx, arr, mean,
       |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |      list_transform(arr, x -> (x - mean) * (x - mean))),
       |      (a, x) -> a + x) / 8.0) AS std
       |  FROM m),
       |ws AS (
       |  SELECT user_id, widx, arr, mean, std,
       |    CAST(${dkSaxSym(0)} + 4 * ${dkSaxSym(1)} + 16 * ${dkSaxSym(2)}
       |         + 64 * ${dkSaxSym(3)} AS BIGINT) AS word_id
       |  FROM s),
       |hot AS (SELECT word_id FROM ws GROUP BY word_id
       |        HAVING count(*) <= $SaxWordCap),
       |c AS (SELECT ws.* FROM ws JOIN hot USING (word_id))""".stripMargin

  /** Shared q79/q79b machinery: every full 8-point sliding window of a
    * user's purchase series with its frame array, window mean/std (L2R
    * HOF folds — no cross-row double agg), SAX word id, and a (user,
    * window) index from the same total frame order. */
  private[graft] def saxWindows(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.fanout(Tables.events(s, d))
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("value").cast("double").as("v"))
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val frame = order.rowsBetween(Window.currentRow, 7)
    val wins = ev
      .withColumn("widx", row_number().over(order).cast("long"))
      .withColumn("arr", collect_list(col("v")).over(frame))
      .filter(size(col("arr")) === 8)
    val stats = wins
      .withColumn("mean", expr(
        "aggregate(arr, 0.0D, (a, x) -> a + x) / 8.0D"))
      .withColumn("std", expr(
        "sqrt(aggregate(transform(arr, x -> (x - mean) * (x - mean)), " +
          "0.0D, (a, x) -> a + x) / 8.0D)"))
    def sym(i: Int) = {
      val paa = s"((arr[$i * 2] + arr[$i * 2 + 1]) / 2.0D)"
      val z = s"(CASE WHEN std = 0.0D THEN 0.0D ELSE ($paa - mean) / std END)"
      s"(CASE WHEN $z < -0.6745D THEN 0 WHEN $z < 0.0D THEN 1 " +
        s"WHEN $z < 0.6745D THEN 2 ELSE 3 END)"
    }
    stats.selectExpr("user_id", "widx", "arr", "mean", "std",
      s"CAST(${sym(0)} + 4 * ${sym(1)} + 16 * ${sym(2)} + " +
        s"64 * ${sym(3)} AS BIGINT) AS word_id")
  }

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped pricing summary. Map-side partial aggregation on
    // (returnflag, linestatus) — only |groups| rows shuffle, so this scans
    // 100 TB with a shuffle measured in kilobytes. fanout spreads the
    // single-row-group test file across cores before the decimal math
    // (a no-op at real scale where the scan has many splits).
    "q1_pricing_summary" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-way star join: fact (lineitem→orders) with broadcast dims.
    // region/nation/customer are tiny → broadcast hash join everywhere; only
    // lineitem⋈orders shuffles on orderkey (AQE coalesces post-shuffle).
    "q2_star_join_revenue" -> ((s, d) => {
      val li = Tables.fanout(Tables.lineitem(s, d))
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Aggregate + orderBy + limit (top-k): Spark's TakeOrderedAndProject —
    // per-partition top-k then a k-row merge on the driver; no full sort at
    // any scale.
    "q3_top_orders" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_orderkey"))
        .agg(dsum("l_extendedprice").as("order_value"),
             count(lit(1)).as("n_lines"))
        .orderBy(col("order_value").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Semi join (EXISTS): customers having ≥1 'O' order.
    "q4_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Anti join (NOT EXISTS): customers with no orders at all.
    "q5_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // distinct / countDistinct.
    "q6_distinct" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // Set ops: INTERSECT / EXCEPT / UNION with tags. Spark intersect/except
    // are set-distinct, matching SQL semantics.
    "q7_set_ops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val highBal = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val both = highBal.intersect(building).withColumn("tag", lit("both"))
      val onlyHigh = highBal.except(building).withColumn("tag", lit("only_high"))
      val onlyBld = building.except(highBal).withColumn("tag", lit("only_building"))
      both.union(onlyHigh).union(onlyBld)
        .orderBy(col("tag"), col("c_custkey"))
    }),

    // ROLLUP subtotals + grand total.
    "q8_rollup" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(dsum("o_totalprice").as("total_price"), count(lit(1)).as("n_orders"))
        .orderBy(col("n_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    }),

    // Correlated scalar subquery (Catalyst decorrelates to an aggregate +
    // join — SURVEY §4 listed decorrelation as unexercised). Mixed SQL/view
    // style mirrors the reference's temp-view usage (sparkpykafkajoin.py:107).
    "q17_corr_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o.o_orderkey, o.o_totalprice
          |FROM orders_v o
          |WHERE o.o_totalprice > (
          |  SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |         / COUNT(*)
          |  FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o.o_orderkey""".stripMargin)
    }),

    // Ranking-function family: rank / dense_rank / ntile / lag / lead over a
    // total per-customer order.
    "q18_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // NULL-handling semantics: nullif/coalesce/null-safe equality. nullif
    // manufactures NULLs from real data; <=> (null-safe =) must treat
    // NULL<=>NULL as true, matching IS NOT DISTINCT FROM.
    "q20_null_semantics" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("seg_or_null", nullif(col("c_mktsegment"), lit("BUILDING")))
        .select(col("c_custkey"),
          col("seg_or_null"),
          coalesce(col("seg_or_null"), lit("(defaulted)")).as("seg_coalesced"),
          col("seg_or_null").eqNullSafe(lit(null).cast("string")).as("is_building"),
          when(col("seg_or_null").isNull, "building").otherwise("other").as("bucket"))
        .orderBy(col("c_custkey"))
    }),

    // max_by/min_by semantics, tie-deterministic via struct ordering: per
    // customer, the (price, orderkey) of their most/least expensive order.
    "q19_minmax_by" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          max(struct(col("o_totalprice"), col("o_orderkey"))).as("mx"),
          min(struct(col("o_totalprice"), col("o_orderkey"))).as("mn"))
        .select(col("o_custkey"),
          col("mx.o_totalprice").as("best_price"),
          col("mx.o_orderkey").as("best_order"),
          col("mn.o_totalprice").as("worst_price"),
          col("mn.o_orderkey").as("worst_order"))
        .orderBy(col("o_custkey"))
    }),

    // CUBE: all grouping-set combinations of (status, priority).
    "q16_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(dsum("o_totalprice").as("total_price"), count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Window functions: per-supplier rank + running total over a total order.
    "q9_window_running" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_suppkey") <= 3)
      val ord = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li.select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(ord).cast("long").as("rn"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)").as("running_qty"))
        .orderBy(col("l_suppkey"), col("rn"))
    }),

    // Exact count distinct (shuffle on expand) — the approx variant
    // (approx_count_distinct/HLL) is covered by ScalaTest error-bound tests,
    // not the oracle (sketches aren't cross-engine comparable).
    "q10_count_distinct" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
             countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // Tumbling event-time window (batch analog of the streaming
    // groupBy(window($"ts","1 hour")) — same bucketing arithmetic).
    "q11_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum("value").as("total_value"))
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_str"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("hour_str"), col("event_type"))
    }),

    // As-of join (Spark has no native ASOF): for each 'error' event, the
    // most recent 'click' by the same user at-or-before it. Implemented as
    // the scalable union+window composition — ONE shuffle on user_id, then a
    // running last-non-null — instead of a per-row range join. The sort key
    // (ts, tag, coalesce(click_id, error_id)) is total and null-free so both
    // engines order identically.
    "q13_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("tag"),
          col("event_id").as("click_id"), lit(null).cast("long").as("error_id"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("long").as("click_id"), col("event_id").as("error_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), coalesce(col("click_id"), col("error_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.union(errors)
        .withColumn("prev_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("error_id").isNotNull)
        .select(col("error_id").as("event_id"), col("user_id"), col("prev_click_id"))
        .orderBy(col("event_id"))
    }),

    // Gap-based sessionization (30-min inactivity closes a session): the
    // batch analog of streaming session_window. lag + running sum of
    // session-start flags — one shuffle on user_id.
    "q14_sessionize" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(ord))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_idx", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event_id"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .as("dur_s"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // Spark's NATIVE session_window aggregation — the two-implementation
    // proof for q14: the built-in merging-session operator must agree
    // with the explicit gaps-and-islands form. The boundary semantics
    // differ by one epsilon and the oracle encodes the NATIVE rule: a
    // session extends [ts, ts+gap), so a successor at exactly gap
    // seconds starts a NEW session (q14's lag form merges at exactly
    // 1800 s — `> 1800` splits vs session_window's `>= 1800`). Output
    // in epoch seconds (sess_end = last event + gap, the operator's
    // contract). Scale: one hash exchange on user_id, sessions merged
    // inside the aggregation — no window, no lag, and the same operator
    // runs under a watermark in streaming.
    "q95_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event_id"))
        .select(col("user_id"),
          unix_timestamp(col("sw.start")).as("sess_start_s"),
          unix_timestamp(col("sw.end")).as("sess_end_s"),
          col("n_events"), col("first_event_id"))
        .orderBy(col("user_id"), col("sess_start_s"))
    }),

    // DYNAMIC-gap session window: q95's operator with the gap as a
    // per-EVENT column (Spark's dynamic session gap — each event holds
    // its session open [ts, ts+gap(event)); sessions merge while the
    // next event starts strictly BEFORE the running max end, and the
    // merged session's end is the max of member ends). Purchases hold
    // a session open 45 min, everything else 15 — engagement-weighted
    // sessionization. The oracle is therefore the running-MAX-end
    // islands form (max over all preceding interval ends, not q95's
    // prev-ts lag: a long-gap event in the middle can outlast several
    // short-gap successors). Scale: identical to q95 — one hash
    // exchange on user_id, sessions merged inside the aggregation.
    "q95b_session_window_dynamic" -> ((s, d) => {
      val gap = when(col("event_type") === "purchase", lit("45 minutes"))
        .otherwise(lit("15 minutes"))
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event_id"))
        .select(col("user_id"),
          unix_timestamp(col("sw.start")).as("sess_start_s"),
          unix_timestamp(col("sw.end")).as("sess_end_s"),
          col("n_events"), col("first_event_id"))
        .orderBy(col("user_id"), col("sess_start_s"))
    }),

    // Pivot: daily counts per event type as columns (explicit value list →
    // deterministic schema; absent cells filled to 0 to match FILTER-count
    // semantics).
    "q15_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0, types)
        .orderBy(col("day"))
    }),

    // Explicit GROUPING SETS (beyond q8 rollup / q16 cube): per-status,
    // per-priority, and grand-total aggregates in one pass, with GROUPING()
    // flags to disambiguate manufactured NULLs. One Expand + one shuffle of
    // |sets|×|groups| rows — same scale profile as any grouped aggregation.
    "q21_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
          |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
          |  COUNT(*) AS n_orders
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY g_status, g_priority,
          |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // Calendar/interval arithmetic: month addition (with month-end clamping),
    // day addition, last_day, quarter truncation, day-diff to an anchor.
    // Dates emitted as strings (engine-native date formatting is identical;
    // timestamp precisions are not). Narrow per-row pipeline — no shuffle.
    // (Oracle note: DuckDB 1.0's subexpression elimination treats INTERVAL
    // constants of different units as equal — `d + INTERVAL 3 MONTH` and
    // `d + INTERVAL 90 DAY` over a column dedupe to one expression — so the
    // oracle adds days via DATE + 90 instead of a second interval literal.)
    "q22_interval_arith" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
        .select(col("o_orderkey"),
          col("od").cast("string").as("order_date"),
          add_months(col("od"), 3).cast("string").as("plus_3m"),
          date_add(col("od"), 90).cast("string").as("plus_90d"),
          last_day(col("od")).cast("string").as("month_end"),
          date_trunc("quarter", col("od")).cast("date").cast("string").as("quarter_start"),
          datediff(lit("1998-01-01").cast("date"), col("od")).cast("long").as("days_to_98"),
          (year(col("od")) * 100 + month(col("od"))).cast("long").as("yyyymm"))
        .orderBy(col("o_orderkey"))
    }),

    // Exact nearest-rank percentiles per group (p50/p90/p99). Interpolating
    // percentile functions are NOT cross-engine bit-stable (the interpolation
    // order of operations differs in the last ulp), so the contract is
    // nearest-rank: value at rank ceil(p·n) — pure integer indexing, exact
    // everywhere. The oracle states it as a per-row ranking window (the
    // executable spec); the Spark plan computes the SAME result as a value
    // histogram + cumulative counts — a per-row window bounds parallelism at
    // |groups| (=3) and sorts all n rows, while the histogram is one
    // map-side-combined shuffle of |group|×|distinct value| rows and a
    // window over that tiny table. (Continuous values at 100 TB: discretize
    // first or use percentile_approx; this exact path needs bounded value
    // cardinality.)
    "q23_percentiles" -> ((s, d) => {
      val vw = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gw = Window.partitionBy(col("l_returnflag"))
      def atRank(k: Int) =
        min(when(col("cum") >= expr(s"(n * $k + 99) DIV 100"), col("l_quantity")))
      Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(vw))
        .withColumn("n", sum(col("cnt")).over(gw))
        .groupBy(col("l_returnflag"))
        .agg(atRank(50).as("p50"), atRank(90).as("p90"), atRank(99).as("p99"),
          max(col("n")).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // IN + NOT IN subqueries. NOT IN plans as a null-aware anti join — a
    // genuinely different operator from q5's left_anti (which is NOT EXISTS):
    // one null in the subquery would empty the result under three-valued
    // logic. Subquery sides are small aggregates → broadcast.
    "q24_in_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_in")
      Tables.nation(s, d).createOrReplaceTempView("nation_in")
      Tables.orders(s, d).createOrReplaceTempView("orders_in")
      s.sql(
        """SELECT c_custkey, c_name FROM customer_in
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation_in
          |                      WHERE n_regionkey IN (1, 2))
          |  AND c_custkey NOT IN (SELECT o_custkey FROM orders_in
          |                        WHERE o_orderstatus = 'F'
          |                          AND o_totalprice > 250000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // FULL OUTER join of two grouped aggregates (nations with rich customers
    // vs nations with rich suppliers) — unmatched sides surface as 0-count
    // rows through coalesce. Both inputs shrink to |nations| rows before the
    // join, so the outer join itself is trivially broadcastable at any scale.
    "q25_outer_join" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_acctbal") > 7000)
        .groupBy(col("c_nationkey").cast("long").as("nk_c"))
        .agg(count(lit(1)).as("cnt_c"))
      val supp = Tables.supplier(s, d).filter(col("s_acctbal") > 7000)
        .groupBy(col("s_nationkey").cast("long").as("nk_s"))
        .agg(count(lit(1)).as("cnt_s"))
      cust.join(supp, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("cnt_c"), lit(0L)).as("n_rich_cust"),
          coalesce(col("cnt_s"), lit(0L)).as("n_rich_supp"))
        .orderBy(col("nationkey"))
    }),

    // MAP-typed columns: per-user event-type→count map built with
    // map_from_entries(collect_list(struct)), consumed via try_element_at /
    // map_keys / size. Keys are unique by construction (pre-grouped), so the
    // map build is order-insensitive; outputs are scalars (the driver's
    // comparator can't hash raw map cells). try_element_at (not element_at):
    // ANSI mode throws on absent keys.
    "q26_map_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
          .as("m"))
        .select(col("user_id"),
          coalesce(try_element_at(col("m"), lit("click")), lit(0L)).as("n_click"),
          coalesce(try_element_at(col("m"), lit("purchase")), lit(0L)).as("n_purchase"),
          size(col("m")).cast("long").as("n_types"),
          array_join(array_sort(map_keys(col("m"))), ",").as("types_csv"))
        .orderBy(col("user_id"))
    }),

    // RANGE-framed window (vs q9's ROWS frame): per-user trailing-1-hour
    // moving aggregates over event time — the frame is value-based
    // (everything within 3600s), so tied timestamps all enter the frame and
    // min/count/decimal-sum stay deterministic without a row tie-break.
    // One shuffle on user_id; the running frame is a single sorted pass.
    "q27_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_timestamp(col("ts")).as("epoch_s"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          expr("CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY epoch_s RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)").as("sum_1h"),
          min(col("event_id")).over(w).as("first_in_window"))
        .orderBy(col("event_id"))
    }),

    // The NATIVE as-of join operator (plans/AsOfJoinPlan: LogicalPlan +
    // Strategy + streaming-merge SparkPlan) under the oracle gate — same
    // semantics as q13's union+window composition, same oracle, but
    // executed by the custom exec's generic merge path (long key +
    // timestamp time). One exchange + sort per side, O(1) merge state.
    "q29_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      graft.ops.AsOfJoinOps.asofJoin(errors, clicks,
          "user_id", "c_user", "ts", "cts", "click_id")
        .select(col("event_id"), col("user_id"),
          col("click_id").as("prev_click_id"))
        .orderBy(col("event_id"))
    }),

    // Native as-of with a match-window TOLERANCE (pandas merge_asof
    // parity): the most recent click ≤ 30 minutes before each error — a
    // stale click pads nulls instead of matching. Same one-exchange-per-
    // side merge as q29; the tolerance is a single subtraction at emit.
    "q44_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      graft.ops.AsOfJoinOps.asofJoin(errors, clicks,
          "user_id", "c_user", "ts", "cts", "click_id",
          tolerance = Some(30L * 60L * 1000000L))
        .select(col("event_id"), col("user_id"),
          col("click_id").as("prev_click_id"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of (merge_asof direction='forward'): the EARLIEST purchase
    // at-or-after each click, within 2 hours — attribution's
    // click-to-conversion join. The forward merge holds ZERO state: rows
    // strictly before the left time are discarded, the match is a peek at
    // the un-consumed head.
    "q45_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      graft.ops.AsOfJoinOps.asofJoin(clicks, purchases,
          "user_id", "p_user", "ts", "pts", "purchase_id",
          tolerance = Some(2L * 3600L * 1000000L), direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("purchase_id").as("next_purchase_id"))
        .orderBy(col("event_id"))
    }),

    // Nearest-direction as-of (merge_asof direction='nearest'): the click
    // CLOSEST in time to each error, either side, within ±45 minutes;
    // equal distance resolves backward (pandas). Rides the backward merge
    // with a one-row forward peek — still O(1) state.
    "q47_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      graft.ops.AsOfJoinOps.asofJoin(errors, clicks,
          "user_id", "c_user", "ts", "cts", "click_id",
          tolerance = Some(45L * 60L * 1000000L), direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("click_id").as("near_click_id"))
        .orderBy(col("event_id"))
    }),

    // Latest-record-wins dedup (CDC compaction / upsert materialization):
    // one row per (user_id, event_type) — the newest by (ts, event_id).
    // row_number-over-desc-order is the standard batch form; the streaming
    // analog is dropDuplicatesWithinWatermark (StreamingInfraSpec). One
    // shuffle on the key; at scale this is the pattern that compacts a
    // changelog into a snapshot.
    "q30_latest_wins" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("latest_event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("latest_ts"),
          round(col("value"), 4).as("latest_value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Error-safe casts and arithmetic under ANSI mode: TRY_CAST yields NULL
    // instead of failing the job (one malformed row in 100 TB must not kill
    // the query), try_divide nulls zero divisors. Narrow, codegen'd —
    // fanout because a failing TRY_CAST costs a caught exception per row,
    // which is exactly the per-row work a single-row-group scan serializes.
    "q28_safe_casts" -> ((s, d) => {
      Tables.fanout(Tables.events(s, d))
        .select(col("event_id"),
          expr("TRY_CAST(event_type AS INT)").as("type_int"),
          expr("TRY_CAST(CAST(user_id AS STRING) AS INT)").cast("long").as("uid_int"),
          try_divide(col("value"), (col("user_id") % 2).cast("double")).as("half_ratio"),
          coalesce(expr("TRY_CAST(event_type AS INT)").cast("long"), lit(-1L))
            .as("type_or_default"))
        .orderBy(col("event_id"))
    }),

    // Range (interval) join: events of the same user within 1 hour after a
    // 'signup'. Equi key user_id keeps it a hash join + residual range
    // predicate — no cartesian blowup; at scale, salting the hot users or a
    // bucketed-by-user layout keeps partitions balanced.
    "q12_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val signup = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("su_user"), col("event_id").as("signup_id"),
                col("ts").as("su_ts"))
      val follow = ev.select(col("user_id"), col("event_id"), col("ts"))
      signup.join(follow,
          col("su_user") === col("user_id") &&
          col("ts") > col("su_ts") &&
          col("ts") <= col("su_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("signup_id"))
        .agg(count(lit(1)).as("n_follow"))
        .orderBy(col("signup_id"))
    }),

    // The q12 range join re-planned as a BANDED equi-join
    // (ops/RangeJoinOps): the left interval replicates into its ≤2 covered
    // hour-buckets and the join key becomes (user, bucket) — pair space per
    // task is bounded by bucket co-occupancy instead of per-user row counts,
    // so a hot user's long history parallelizes. Same rows as q12 (same
    // oracle SQL): banding is an exact rewrite, not an approximation.
    "q37_range_band" -> ((s, d) => {
      // epoch-MICROSECOND arithmetic: event timestamps are µs-precision, so
      // q12's strict `ts > su_ts` is exactly `ets >= su_us + 1` in µs
      val us = 3600L * 1000000L
      val ev = Tables.events(s, d)
      val signup = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("su_user"), col("event_id").as("signup_id"),
          unix_micros(col("ts")).as("su_us"))
        .withColumn("lo", col("su_us") + 1)     // q12 is ts > su_ts …
        .withColumn("hi", col("su_us") + us)    // … AND ts <= su_ts + 1h
      val follow = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ets"))
      graft.ops.RangeJoinOps.bandedRangeJoin(signup, follow,
          "su_user", "user_id", "lo", "hi", "ets", bucketWidth = us)
        .groupBy(col("signup_id"))
        .agg(count(lit(1)).as("n_follow"))
        .orderBy(col("signup_id"))
    }),

    // Mixed EXISTS + NOT EXISTS on one relation (both decorrelate: the
    // EXISTS to a left-semi, the NOT EXISTS to a left-anti — Catalyst plans
    // them as two successive join stages on the same broadcast-able key set).
    "q31_exists_mix" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_ex")
      Tables.orders(s, d).createOrReplaceTempView("orders_ex")
      s.sql(
        """SELECT c_custkey, c_name FROM customer_ex c
          |WHERE EXISTS (SELECT 1 FROM orders_ex o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          |  AND NOT EXISTS (SELECT 1 FROM orders_ex o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // LATERAL correlated subquery with ORDER BY + LIMIT (top-1-per-group as
    // the optimizer sees it: DecorrelateInnerQuery rewrites the per-row
    // limit into a ranked window join — no driver loop, one shuffle).
    "q32_lateral_topn" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      Tables.orders(s, d).createOrReplaceTempView("orders_lat")
      s.sql(
        """SELECT c.c_custkey, t.o_orderkey AS top_orderkey,
          |       t.o_totalprice AS top_price
          |FROM customer_lat c
          |JOIN LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_lat o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
          |ORDER BY c.c_custkey""".stripMargin)
    }),

    // Ordered string aggregation (listagg WITHIN GROUP): deterministic
    // because the intra-group order is total. |groups| rows out; the sort
    // happens inside the aggregation buffer, not as a global sort.
    "q33_listagg" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_la")
      s.sql(
        """SELECT n_regionkey,
          |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations_csv,
          |  COUNT(*) AS n_nations
          |FROM nation_la GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // Exact median per group (sort-based percentile). Both engines
    // interpolate even-count groups as the midpoint of two doubles; the
    // inputs are exact parquet doubles, so the midpoint is deterministic.
    "q34_median" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(round(median(col("value")), 4).as("median_value"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // Bitwise aggregates (bit_and / bit_or / bit_xor): order-free integer
    // folds — fully partial-aggregation friendly (constant-size state).
    "q35_bit_agg" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_returnflag"))
        .agg(bit_and(col("l_partkey")).as("pk_and"),
          bit_or(col("l_partkey")).as("pk_or"),
          bit_xor(col("l_partkey")).as("pk_xor"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // UNPIVOT (wide→long melt): three measure columns become (metric, val)
    // rows — narrow, generator-style, no shuffle; the oracle spells out the
    // equivalent UNION ALL. Values cast to a common double type.
    "q36_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("discount"), col("tax")),
          "metric", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }),

    // Distribution-window family q18 doesn't touch: percent_rank/cume_dist
    // (frameless rank ratios) + first/nth/last_value over explicit ROWS
    // frames. Order key (o_totalprice, o_orderkey) is unique, so RANGE
    // peers = ROWS and every value is deterministic. One shuffle on the
    // partition key; each partition's window sorts locally.
    "q38_dist_windows" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val grow = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") <= 100)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first_value(col("o_orderkey")).over(grow).as("first_key"),
          nth_value(col("o_orderkey"), 3).over(grow).as("third_key"),
          last_value(col("o_orderkey")).over(full).as("last_key"))
        .orderBy(col("o_orderpriority"), col("pct_rank"), col("o_orderkey"))
    }),

    // Time-series gap filling: a generated month spine (sequence+explode
    // over the global [min,max] month bounds) LEFT-joined to the observed
    // monthly counts — absent months surface as explicit zeros. The spine is
    // |priorities|×|months| rows (tiny, broadcast); the monthly agg is the
    // only real shuffle. Dimension spines at 100 TB stay driver-free: the
    // bounds come from one scalar agg, never a collect of the fact table.
    "q39_gapfill" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val monthly = Tables.fanout(o)
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n_orders"))
      val bounds = o.agg(
        min(date_trunc("month", col("o_orderdate"))).as("lo"),
        max(date_trunc("month", col("o_orderdate"))).as("hi"))
      val series = o.select(col("o_orderpriority")).distinct()
        .crossJoin(broadcast(bounds))
        .withColumn("mon",
          explode(expr("sequence(lo, hi, interval 1 month)")))
        .select(col("o_orderpriority"), col("mon"))
      series.join(monthly, Seq("o_orderpriority", "mon"), "left")
        .select(col("o_orderpriority"), col("mon"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("o_orderpriority"), col("mon"))
    }),

    // Explicit CROSS JOIN (the one join kind q2-q25 never plan): dim×dim
    // cartesian — Catalyst plans BroadcastNestedLoopJoin with the 5-row side
    // broadcast, so nothing shuffles regardless of the other side's size.
    "q40_cross_join" -> ((s, d) => {
      val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
      n.crossJoin(broadcast(r))
        .select(col("n_nationkey"), col("r_regionkey"),
          col("n_name"), col("r_name"),
          (col("r_regionkey") * 100 + col("n_nationkey")).cast("long")
            .as("combo_key"))
        .orderBy(col("n_nationkey"), col("r_regionkey"))
    }),

    // SCD2 dimension build (CDC → versioned dimension): collapse each
    // customer's order-status timeline to its CHANGE points, then window
    // the survivors into [valid_from, valid_to) intervals with a version
    // number (valid_to NULL = current). Two same-keyed windows — one
    // shuffle on custkey, the second window reuses the partitioning. The
    // standard warehouse pattern for dimension snapshots at any scale.
    "q42_scd2" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).filter(col("o_custkey") <= 200)
        .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
        .filter(col("prev_status").isNull ||
          col("o_orderstatus") =!= col("prev_status"))
        .select(col("o_custkey"), col("o_orderstatus").as("status"),
          col("o_orderdate").as("valid_from"),
          lead(col("o_orderdate"), 1).over(w).as("valid_to"),
          row_number().over(w).cast("long").as("version"))
        .orderBy(col("o_custkey"), col("version"))
    }),

    // Z-order (Morton) clustering key: interleave customer and order-month
    // buckets into one locality-preserving sort key — the layout primitive
    // behind two-dimensional data skipping (see ops/LayoutOps). Pure
    // integer bit arithmetic, narrow, zero shuffle; the clustering write
    // path (repartitionByRange + sortWithinPartitions) is asserted in
    // LayoutSpec, the key itself is oracle-exact here.
    "q43_zorder" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("xdim", pmod(col("o_custkey"), lit(65536L)))
        .withColumn("ydim",
          pmod(year(col("o_orderdate")) * 12 + month(col("o_orderdate")),
            lit(65536)).cast("long"))
        .select(col("o_orderkey"), col("xdim"), col("ydim"),
          graft.ops.LayoutOps.zorder16(col("xdim"), col("ydim")).as("zkey"))
        .orderBy(col("o_orderkey"))
    }),

    // Recursive CTE (Spark 4's WITH RECURSIVE): walk each customer's
    // synthetic referral chain (parent = key/2, a binary tree — acyclic by
    // construction, so UNION ALL recursion terminates in ⌈log₂ keys⌉
    // iterations). Each recursion step is one self-join of the frontier —
    // at scale the frontier shrinks geometrically and the loop is
    // driver-coordinated exactly like connectedComponents.
    "q46_recursive_cte" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_rec")
      s.sql(
        """WITH RECURSIVE anc(custkey, node, depth) AS (
          |  SELECT c_custkey, c_custkey, 0 FROM customer_rec
          |  UNION ALL
          |  SELECT custkey, node DIV 2, depth + 1 FROM anc WHERE node >= 2)
          |SELECT custkey, max(depth) AS chain_len, count(*) AS n_nodes
          |FROM anc GROUP BY custkey ORDER BY custkey""".stripMargin)
    }),

    // Share-of-total (ratio_to_report): each priority's revenue share of
    // the grand total via an unpartitioned DECIMAL window sum — exact, so
    // the double division is engine-portable (a double window sum would be
    // accumulation-order nondeterministic). The window sees only
    // |groups| rows, never the fact table.
    "q48_share_of_total" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.fanout(Tables.orders(s, d))
        .groupBy(col("o_orderpriority"))
        .agg(expr("SUM(CAST(o_totalprice AS DECIMAL(18,4)))").as("rev_dec"),
          count(lit(1)).as("n"))
        .withColumn("total_dec",
          sum(col("rev_dec")).over(Window.partitionBy()))
        .select(col("o_orderpriority"), col("n"),
          round(col("rev_dec").cast("double"), 2).as("revenue"),
          round(col("rev_dec").cast("double") / col("total_dec").cast("double"),
            6).as("rev_share"))
        .orderBy(col("o_orderpriority"))
    }),

    // Conditional aggregation with the SQL FILTER clause — per-group
    // metrics over different predicates in ONE pass (no self-joins, no
    // CASE pyramids); each FILTER fuses into the same partial aggregate.
    "q49_filtered_agg" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d)).createOrReplaceTempView("lineitem_f")
      s.sql(
        """SELECT l_returnflag,
          |  count(*) AS n_all,
          |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
          |  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
          |       FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS qty_taxed
          |FROM lineitem_f GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // Regression/correlation aggregates (regr_slope/intercept/corr family)
    // from EXACT moment sums: per-row double products fold through
    // DECIMAL(27,10) so every Σx, Σy, Σxy, Σx², Σy² is partial-agg-order
    // independent, then the closed-form slope/intercept/corr runs the same
    // double op sequence in both engines — the only way the native corr()
    // (order-dependent double accumulation) could be cross-engine exact.
    // One map-side-combined shuffle of 6 numbers per group.
    "q50_regression" -> ((s, d) => {
      def m(e: String, alias: String) =
        expr(s"CAST(SUM(CAST($e AS DECIMAL(27,10))) AS DOUBLE)").as(alias)
      Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          m("l_quantity", "sx"), m("l_extendedprice", "sy"),
          m("l_quantity * l_extendedprice", "sxy"),
          m("l_quantity * l_quantity", "sx2"),
          m("l_extendedprice * l_extendedprice", "sy2"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sx2") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") -
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sx2") - col("sx") * col("sx"))) * col("sx")) /
            col("n"), 4).as("intercept"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
              sqrt(col("n") * col("sy2") - col("sy") * col("sy"))), 6)
            .as("corr_xy"))
        .orderBy(col("l_returnflag"))
    }),

    // Mergeable HyperLogLog registers — approximate COUNT DISTINCT at
    // 100 TB. Each row lands in one of 1024 buckets by its md5-derived
    // 60-bit hash; the register is the max "leading-zero rank" rho of the
    // remaining 50 bits (rho = 51 - bitlength, an exact integer via
    // length(bin(w)) — no floating log2). The register TABLE is the
    // sketch: merge = per-bucket max (associative/commutative → map-side
    // combine, cross-shard union, streaming state all compose), ≤1024 rows
    // shuffle regardless of input size. The float-y cardinality estimate
    // is deliberately NOT computed here (cross-engine float determinism);
    // ApproxSpec derives it from these registers and asserts accuracy +
    // mergeability. Hash-decided ⇒ bit-exact DuckDB oracle.
    "q51_hll_registers" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d))
        .select(graft.ops.TextOps.hash60(col("l_orderkey")).as("h"))
        .selectExpr("h % 1024 AS bucket", "h DIV 1024 AS w")
        .selectExpr("bucket",
          "CAST(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS BIGINT) AS rho")
        .groupBy(col("bucket")).agg(max(col("rho")).as("max_rho"))
        .orderBy(col("bucket"))
    }),

    // Interval-overlap analytics WITHOUT pair enumeration — the sweep-line
    // form of an interval self-join. Each shipment becomes a window
    // [shipdate, shipdate + (qty%20+3) days]; per supplier we want the
    // peak number of concurrently-open windows and the total count of
    // overlapping window PAIRS. The naive interval join emits O(overlaps)
    // rows; the sweep emits 2 events per interval (+1 at start, -1 at
    // exclusive end), one window-function running sum per supplier, and
    // reads both statistics off the sweep: peak = max(active at a start),
    // pairs = Σ(active-1 at each start) — O(n log n) per key, output
    // |suppliers| rows, no quadratic anything. Tie handling: ends sort
    // before starts at the same date (delta ASC), so back-to-back windows
    // don't count as overlapping; per-tie-group sums/maxima are
    // order-independent, keeping the result deterministic.
    "q53_overlap_sweep" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_suppkey"),
          col("l_shipdate").cast("date").as("sd"),
          (col("l_quantity").cast("int") % 20 + 3).as("dur"))
        .withColumn("rd", expr("date_add(sd, dur)"))
      val ev = li.select(col("l_suppkey"), col("sd").as("t"), lit(1).as("delta"))
        .unionAll(li.select(col("l_suppkey"),
          expr("date_add(rd, 1)").as("t"), lit(-1).as("delta")))
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("active", sum(col("delta")).over(w))
        .groupBy(col("l_suppkey"))
        .agg(
          sum(when(col("delta") === 1, lit(1L)).otherwise(lit(0L)))
            .as("n_windows"),
          max(when(col("delta") === 1, col("active"))).as("peak_concurrent"),
          sum(when(col("delta") === 1, col("active") - 1).otherwise(lit(0L)))
            .as("n_overlap_pairs"))
        .orderBy(col("l_suppkey"))
    }),

    // KMV (k-minimum-values) bottom-k sketch: the 256 smallest distinct
    // md5 hashes of the key, each with a representative key. Triple duty
    // at 100 TB: (a) cardinality estimator ((k-1)·2^60 / h_k, ApproxSpec),
    // (b) deterministic uniform sample of distinct keys (hash order is
    // uncorrelated with key order), (c) mergeable — bottom-k of a union
    // is bottom-k of the concatenated sketches. The plan is the scalable
    // shape: map-side partial distinct-by-hash, then ORDER BY h LIMIT k
    // compiles to TakeOrderedAndProject (per-partition top-k + driver
    // merge of k·partitions rows — never a global sort).
    "q52_kmv_sample" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d))
        .select(graft.ops.TextOps.hash60(col("l_orderkey")).as("h"),
          col("l_orderkey"))
        .groupBy(col("h")).agg(min(col("l_orderkey")).as("key"))
        .orderBy(col("h")).limit(256)
    }),

    // Histogram binning: fixed-width buckets from floor(price/width) —
    // pure per-row arithmetic (no width_bucket dependence), then one
    // map-side-combined agg; ~|buckets| rows shuffle. min/max of doubles
    // are exact (no summation).
    "q41_histogram" -> ((s, d) => {
      Tables.fanout(Tables.orders(s, d))
        .groupBy(floor(col("o_totalprice") / 20000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bucket"))
    }),

    // MERGE INTO / CDC apply: a change-set derived from orders hits the
    // customer dimension — updates (matched 'U' replaces the row), deletes
    // (matched 'D' drops it), inserts (unmatched 'U': keys shifted by 10M
    // match nothing). The operator is anti-join + union (MergeOps scaladoc
    // proves the equivalence to SQL MERGE): the TB-scale target never
    // shuffles — only its anti-join probe against the broadcast change-key
    // set. c_acctbal takes max(o_totalprice) un-divided: max is exact, so
    // the whole result is integer/string/exact-double → bit-stable.
    "q54_merge_upsert" -> ((s, d) => {
      val target = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"))
      val changes = Tables.orders(s, d)
        .select(when(col("o_custkey") % 3 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")).as("c_custkey"), col("o_totalprice"))
        .groupBy(col("c_custkey"))
        .agg(max(col("o_totalprice")).as("maxp"))
        .select(col("c_custkey"),
          concat(lit("MERGED_"), col("c_custkey").cast("string")).as("c_name"),
          col("maxp").as("c_acctbal"),
          lit("MERGED").as("c_mktsegment"),
          when(col("c_custkey") % 5 === 0, lit("D")).otherwise(lit("U"))
            .as("op"))
      graft.ops.MergeOps.applyChanges(target, changes, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // Count-Min sketch: point-frequency estimates for the 20 hottest part
    // keys, read from a ≤4×512-cell sketch (SketchOps scaladoc: cell-wise-
    // SUM mergeable, md5-hash-decided ⇒ bit-exact oracle). The output pins
    // the CMS contract the oracle can check exactly: cms_est ≥ true_cnt
    // always, and both sides address identical cells. ApproxSpec asserts
    // the error bound, mergeability, and the streaming-state form.
    "q55_countmin" -> ((s, d) => {
      val keys = Tables.fanout(Tables.lineitem(s, d)).select(col("l_partkey"))
      val sketch = graft.ops.SketchOps.cmsSketch(keys, "l_partkey")
      val top = keys.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("l_partkey")).limit(20)
      graft.ops.SketchOps.cmsLookup(sketch, top, "l_partkey")
        .orderBy(col("l_partkey"))
    }),

    // Ordered event funnel (view → click → purchase, each step within 7
    // days of the previous): per-user conversion staging, the product-
    // analytics sequence query. Each step is one |users|-row aggregate
    // joined back to the (filtered) event scan — the big fact table is
    // scanned once per step with the step predicate pushed down, and the
    // per-user step tables are dimension-sized → broadcast. min(ts) per
    // user is deterministic (min commutes with the ns→µs floor), and
    // timestamps leave as unix_micros BIGINTs.
    "q56_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .join(broadcast(views), "user_id")
        .filter(col("ts") >= col("view_ts") &&
          col("ts") <= expr("view_ts + INTERVAL 7 DAY"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .join(broadcast(clicks), "user_id")
        .filter(col("ts") >= col("click_ts") &&
          col("ts") <= expr("click_ts + INTERVAL 7 DAY"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
      views.join(clicks, Seq("user_id"), "left")
        .join(purchases, Seq("user_id"), "left")
        .select(col("user_id"),
          unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          (lit(1L) + when(col("click_ts").isNotNull, 1L).otherwise(0L)
            + when(col("purchase_ts").isNotNull, 1L).otherwise(0L))
            .as("stage"))
        .orderBy(col("user_id"))
    }),

    // EXACT count-distinct at scale via 64-key block bitmaps: dense
    // integer keys compress 64:1 into (block, OR-of-bit-masks) cells, so
    // the shuffle carries |keyspace|/64 rows per group instead of
    // |distinct keys| — and unlike HLL (q51) the answer is exact. The
    // bitmap cells merge by OR (idempotent: duplicate keys are absorbed
    // map-side), popcount + sum reads the cardinality off the cells. The
    // oracle is an ALGORITHM-INDEPENDENT count(DISTINCT ...) — agreement
    // proves the bitmap math, not just mirrors it.
    "q57_bitmap_distinct" -> ((s, d) => {
      Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_returnflag"),
          expr("l_orderkey div 64").as("blk"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 64 AS INT))")
            .as("mask"))
        .groupBy(col("l_returnflag"), col("blk"))
        .agg(bit_or(col("mask")).as("bits"))
        .groupBy(col("l_returnflag"))
        .agg(sum(bit_count(col("bits")).cast("long")).as("n_distinct"),
          count(lit(1)).as("n_blocks"))
        .orderBy(col("l_returnflag"))
    }),

    // Session path mining: top event-type SEQUENCES per 30-minute-gap
    // session (q14's sessionization) — the "what do users do" product
    // query. Order inside a session is pinned by sort_array over
    // (ts, event_id, type) structs (collect_list alone is partition-order
    // nondeterministic — the sort makes the aggregate order-free), paths
    // truncate to the first 5 steps, and the global path histogram is a
    // second tiny aggregate. Shuffles: one by user (window), one by path
    // (|distinct paths| rows) — no row ever carries more than its session.
    "q58_event_paths" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(ord))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_idx", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
        .select(array_join(
          slice(transform(col("evs"), e => e.getField("event_type")), 1, 5),
          "->").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(25)
    }),

    // The bounded top-k AGGREGATOR under the oracle gate (it was spec-only:
    // equivalence with the window form asserted in SimilaritySpec). Unlike
    // `row_number().over(orderBy desc)` — which sorts EVERY row per group —
    // the typed Aggregator's buffer never exceeds k entries, combines
    // map-side, and merges associatively: k rows per partition per group
    // shuffle, no sort. The oracle IS the window formulation, so agreement
    // proves the bounded buffer implements exactly top-k-by-(score desc,
    // id asc). Doubles pass through unchanged — no arithmetic, bit-stable.
    "q59_topk_agg" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.TopKAggregator(5)
      Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues { case (_, price, okey) => (price, okey) }
        .agg(agg.toColumn.name("topk"))
        .flatMap { case (flag, topk) =>
          topk.iterator.zipWithIndex.map { case ((price, okey), i) =>
            (flag, (i + 1).toLong, okey, price)
          }
        }
        .toDF("l_returnflag", "rank", "l_orderkey", "price")
        .orderBy(col("l_returnflag"), col("rank"))
    }),

    // Bitmap SET ALGEBRA across sources: |A ∩ B| per nation where A =
    // high-balance customers (customer table) and B = customers with a
    // finished order (orders table) — an intersection no single-row
    // predicate can express. Each side folds its keys into q57-style
    // 64-key block bitmaps; the intersection is a bitwise AND of
    // co-keyed cells + popcount, so the join carries |keyspace|/64 cells
    // per side instead of distinct keys, and extends to OR/XOR/ANDNOT
    // set ops for free. Oracle is the algorithm-independent
    // COUNT(DISTINCT) over a plain join — agreement proves the algebra.
    "q60_bitmap_intersect" -> ((s, d) => {
      def bitmap(keys: DataFrame) = keys
        .select(col("c_nationkey"),
          expr("c_custkey div 64").as("blk"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(c_custkey % 64 AS INT))")
            .as("mask"))
        .groupBy(col("c_nationkey"), col("blk"))
        .agg(bit_or(col("mask")).as("bits"))
      val cust = Tables.customer(s, d)
      val a = bitmap(cust.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_nationkey")))
      val b = bitmap(Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey")).distinct()
        .join(broadcast(cust.select(col("c_custkey"), col("c_nationkey"))),
          "c_custkey"))
      a.join(b.withColumnRenamed("bits", "bits_b"), Seq("c_nationkey", "blk"))
        .groupBy(col("c_nationkey"))
        .agg(sum(bit_count(col("bits").bitwiseAND(col("bits_b")))
          .cast("long")).as("n_both"))
        .filter(col("n_both") > 0)
        .orderBy(col("c_nationkey"))
    }),

    // Table diff / version reconciliation: old vs new keyed snapshots →
    // added / removed / changed rows with both sides' values (the
    // regression-diff every pipeline migration runs). new = q54's merged
    // output, so the diff must recover EXACTLY the change-set q54 applied
    // — the two operators validate each other. Struct-packed row compare
    // (one codegen'd equality, extends to any column list); the full
    // outer join co-partitions both snapshots on the key — the only
    // correct plan for a diff, since either side may hold rows alone.
    "q61_table_diff" -> ((s, d) => {
      val rowStruct = struct(col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
      val oldT = Tables.customer(s, d)
        .select(col("c_custkey"), rowStruct.as("o"))
      val newT = queries("q54_merge_upsert")(s, d)
        .select(col("c_custkey"), rowStruct.as("nw"))
      oldT.join(newT, Seq("c_custkey"), "full_outer")
        .withColumn("change",
          when(col("o").isNull, "added")
            .when(col("nw").isNull, "removed")
            .when(col("o") =!= col("nw"), "changed"))
        .filter(col("change").isNotNull)
        .select(col("c_custkey"), col("change"),
          col("o.c_name").as("old_name"), col("nw.c_name").as("new_name"),
          col("o.c_acctbal").as("old_acctbal"),
          col("nw.c_acctbal").as("new_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // Hot-key-salted shuffle join (SkewOps): brand revenue through a
    // deliberately-salted lineitem ⋈ part sort-merge join. The oracle is
    // the PLAIN join SQL — agreement proves salting is a pure physical
    // rewrite (each fact row meets its part exactly once, on its own
    // salt). At 100 TB this is what unblocks a join whose hot key AQE
    // can't split finely enough; dims that fit in memory should broadcast
    // instead (q2's path).
    "q62_salted_join" -> ((s, d) => {
      val li = Tables.fanout(Tables.lineitem(s, d))
      val p = Tables.part(s, d)
      graft.ops.SkewOps.saltedJoin(li, p, "l_partkey", "p_partkey",
          salts = 8,
          saltSrc = col("l_orderkey") * lit(7) + col("l_linenumber"))
        .groupBy(col("p_brand"))
        .agg(
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    }),

    // Burst collapse (interaction debounce): within each (user, type)
    // stream, events ≤60 s apart collapse into one burst — q14's gap
    // sessionization at a finer gap — and only the burst's FIRST event
    // survives, annotated with how many it absorbed. The bot-storm /
    // double-fire filter a clickstream corpus runs before training. One
    // user-keyed shuffle; the window and the burst agg share it.
    "q63_burst_collapse" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(ord))
        .withColumn("new_burst",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 60, 1)
            .otherwise(0))
        .withColumn("burst_idx", sum(col("new_burst")).over(cum))
        .groupBy(col("user_id"), col("event_type"), col("burst_idx"))
        .agg(count(lit(1)).as("n_collapsed"),
          min(struct(col("ts"), col("event_id"))).as("first"))
        .select(col("user_id"), col("event_type"),
          col("first.event_id").as("event_id"),
          date_format(col("first.ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
          col("n_collapsed"))
        .orderBy(col("user_id"), col("event_type"), col("first_ts"),
          col("event_id"))
    }),

    // Data-quality profiler: per-column row/null/distinct counts + min/max
    // in ONE scan (the multi-distinct Expand multiplies rows ×|cols|
    // map-side, never reshuffles the fact), melted to one row per column.
    // The ingest-health check a pipeline runs on every new data drop. At
    // 100 TB swap the exact distincts for q51's HLL registers — the
    // rest of the plan is unchanged.
    "q64_profile" -> ((s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
      val aggs = count(lit(1)).as("__total") +: cols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")) }
      val one = Tables.fanout(Tables.lineitem(s, d))
        .agg(aggs.head, aggs.tail: _*)
      val entries = cols.map { c =>
        struct(lit(c).as("col_name"),
          col("__total").as("n_rows"),
          (col("__total") - col(s"${c}__n")).as("n_null"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_str"),
          col(s"${c}__max").as("max_str"))
      }
      one.select(explode(array(entries: _*)).as("p"))
        .select(col("p.*"))
        .orderBy(col("col_name"))
    }),

    // Time-series motif discovery via SAX (Lin et al. 2003 — the EDBT'19
    // streaming-similarity lineage): every 8-point sliding window of a
    // user's purchase series z-normalizes, compresses to 4 PAA segments,
    // and symbolizes against the gaussian quartile breakpoints (±0.6745)
    // into a 4-symbol word; words occurring ≥2× are motif candidates —
    // repeated temporal shapes across users and time, the time-series
    // analog of d26's span dedup. Determinism: the window array is
    // collected over a TOTAL (ts, event_id) frame order and every
    // statistic is a per-row left-to-right HOF fold over that array (the
    // vector-math contract — no cross-row double aggregation anywhere);
    // flat windows (std = 0) map to the all-1s word by definition.
    // Scale: one user-keyed shuffle for the frames; the motif rollup is
    // a ≤256-word map-side-combinable agg.
    "q79_sax_motifs" -> ((s, d) => {
      saxWindows(s, d)
        .groupBy(col("word_id"))
        .agg(count(lit(1)).as("n_windows"),
          countDistinct(col("user_id")).as("n_users"))
        .filter(col("n_windows") >= 2)
        .orderBy(col("word_id"))
    }),

    // CUSUM drift detection (Page 1954) per user series, with the
    // iteration ELIMINATED: the one-sided recurrence
    // s_i = max(0, s_{i−1} + (x_i − k)) has the closed form
    // s_i = P_i − min(0, min_{j≤i} P_j) where P is the running sum of
    // deviations — so the whole detector is two frames over ONE
    // user-partitioned sort, no driver loop, no fold. All arithmetic is
    // integer cents (q76's floor discipline): k = per-user mean (floored),
    // alarm when cusum·n ≥ CusumH·Σ|dev| (mean-absolute-deviation scale,
    // cross-multiplied to stay in BIGINT — t19's no-division discipline).
    // One shuffle on user_id; every window and the final rollup reuse
    // that exchange. Headroom: cusum·n < maxcents·n² — fine to n ~ 10⁶
    // events/user, beyond which chunk the series.
    "q80_cusum_drift" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.fanout(Tables.events(s, d))
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev
        .withColumn("widx", row_number().over(order).cast("long"))
        .withColumn("tot", sum(col("cents")).over(whole))
        .withColumn("n", count(lit(1)).over(whole))
        .withColumn("k_cents", expr("tot div n"))
        .withColumn("dev", col("cents") - col("k_cents"))
        .withColumn("p", sum(col("dev")).over(run))
        .withColumn("cusum", col("p") - least(lit(0L), min(col("p")).over(run)))
        .withColumn("sad", sum(abs(col("dev"))).over(whole))
        .withColumn("alarm",
          col("sad") > 0 && col("cusum") * col("n") >= lit(CusumH) * col("sad"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("k_cents")).as("k_cents"),
          max(col("cusum")).as("max_cusum"),
          sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
          min(when(col("alarm"), col("widx"))).as("first_alarm"))
        .orderBy(col("user_id"))
    }),

    // Cross-user time-series similarity JOIN (the REPOSE/EDBT'19 top-k
    // subsequence-similarity problem, batch form): q79's SAX words act
    // as the LSH-style candidate filter — only window pairs sharing a
    // word are verified — and the verify is the EXACT z-normalized
    // squared Euclidean distance over the full 8 points, ≤ τ². Hot-word
    // guard: words claiming more than SaxWordCap windows are dropped
    // before pairing (flat/common shapes would pair everything — n16's
    // df-cap and m5's patch cap, applied to shapes), so per-word fan-out
    // is bounded. Symbolize → bucket-join → verify: the d2/d5 dedup
    // discipline transplanted to time series.
    "q79b_ts_similarity" -> ((s, d) => {
      saxCandidatePairs(s, d)
        .withColumn("dist2", expr(saxDist2Expr))
        .filter(col("dist2") <= SaxDistTau2)
        .select(col("user_a"), col("widx_a"), col("user_b"), col("widx_b"),
          round(col("dist2"), 6).as("dist2"))
        .orderBy(col("user_a"), col("widx_a"), col("user_b"), col("widx_b"))
    }),

    // q79b with INEXACT ALIGNMENT: the verify becomes banded DTW (Sakoe-
    // Chiba radius 1) — a point may match its neighbor's position, so a
    // one-step phase shift between two otherwise-identical shapes no
    // longer pays the full L2 penalty (DTW ≤ the diagonal L2 by
    // construction: q79c admits every q79b pair plus the near-misses).
    // The DP runs as a constant-size 3-state FOLD ([[dtwStepExprs]] —
    // one Scala builder emits both engines' higher-order aggregate, the
    // lshWeightValues discipline applied to a recurrence), so the oracle
    // computes the identical arithmetic — no UDF, O(band·w) per
    // candidate. Hot words stay capped; cost over q79b is a constant
    // ~3× per candidate.
    "q79c_ts_dtw" -> ((s, d) => {
      def zn(src: String) = expr(
        s"transform(arr_$src, x -> CASE WHEN std_$src = 0.0D THEN 0.0D " +
          s"ELSE (x - mean_$src) / std_$src END)")
      saxCandidatePairs(s, d)
        .withColumn("za", zn("a")).withColumn("zb", zn("b"))
        // codegen'd LB_Keogh prune BEFORE the interpreted DP fold: the
        // DP runs only on pairs the lower bound cannot reject
        // ([[lbKeoghExpr]] — admission is provably unchanged).
        .filter(expr(lbKeoghExpr) <= SaxDistTau2 + 1e-9)
        // native codegen'd DP (bit-identical to the fold the oracle
        // mirrors — DtwKernelSpec pins equality on this candidate set)
        .withColumn("dtw2", graft.functions.VectorExpressions
          .banded_dtw8(col("za"), col("zb")))
        .filter(col("dtw2") <= SaxDistTau2)
        .select(col("user_a"), col("widx_a"), col("user_b"), col("widx_b"),
          round(col("dtw2"), 6).as("dtw2"))
        // stage the (tiny) verified set before the global sort: orderBy
        // plans a range exchange whose sampling pass evaluates the child
        // — without the stage the interpreted DP fold runs TWICE over
        // every candidate (measured as two ~30 s-CPU stages at sf0.1)
        .transform(graft.Tables.stage)
        .orderBy(col("user_a"), col("widx_a"), col("user_b"), col("widx_b"))
    }),

    // REPOSE's ACTUAL ask — top-k per query window, not a threshold scan:
    // for every window, the k nearest other-user windows among its SAX-
    // word candidates. The pair frame symmetrizes (each verified pair
    // feeds both endpoints' lists) and ranking runs through the bounded
    // TopKAggregator — k rows per partition per window shuffle, no
    // per-window sort (q59/n15's discipline; a row_number window would
    // re-sort every candidate). Neighbor identity packs into one long
    // (user·10⁶ + widx, widx < 10⁶ asserted by construction at any sane
    // series length) so the aggregator's (score desc, id asc) tie-break
    // is exactly (dist2 asc, user asc, widx asc) — the oracle's window
    // ORDER BY reproduces it and the ranks must agree row-for-row.
    "q79d_ts_topk" -> ((s, d) => {
      import s.implicits._
      val pairs = saxCandidatePairs(s, d)
        .withColumn("dist2", expr(saxDist2Expr))
      def leg(q: String, m: String) = pairs.select(
        col(s"user_$q").as("uq"), col(s"widx_$q").as("wq"),
        (col(s"user_$m") * 1000000L + col(s"widx_$m")).as("mid"),
        col("dist2"))
      val agg = new graft.functions.TopKAggregator(SaxTopK)
      leg("a", "b").unionByName(leg("b", "a"))
        .select(col("uq"), col("wq"), negate(col("dist2")).as("score"), col("mid"))
        .as[(Long, Long, Double, Long)]
        .groupByKey(t => (t._1, t._2))
        .mapValues(t => (t._3, t._4))
        .agg(agg.toColumn.name("topk"))
        .flatMap { case ((uq, wq), topk) =>
          topk.iterator.zipWithIndex.map { case ((score, mid), i) =>
            (uq, wq, (i + 1).toLong, mid / 1000000L, mid % 1000000L, -score)
          }
        }
        .toDF("user_q", "widx_q", "rank", "user_m", "widx_m", "dist2")
        .withColumn("dist2", round(col("dist2"), 6))
        .orderBy(col("user_q"), col("widx_q"), col("rank"))
    }),

    // q64 WITH THE 100 TB DISTINCT KNOB ENGAGED: the profiler's
    // n_distinct is the one per-column statistic whose exact form doesn't
    // scale — multi-column countDistinct plans an Expand (|cols|× the
    // scan) feeding exact distinct shuffles whose state is
    // O(distinct values) per column. Here the distinct column is SKETCHED
    // with q51's register construction instead (m=1024 md5-bucketed
    // registers per column, melted through one Generate): agg state is a
    // CONSTANT ≤ 6×1024 (col, bucket, max-rho) cells regardless of
    // cardinality, map-side combined, and the readout is d9b's pure-
    // integer estimator ((2^53 div denom)·α_1024 in ppm — α=720541;
    // hash-decided, so the oracle reproduces it bit-exactly; σ ≈
    // 1.04/√1024 ≈ 3.3%). n_rows/n_null/min/max stay exact — they
    // partial-aggregate in O(1) anyway. The standard small-range
    // correction (linear counting m·ln(m/V) when V = empty registers > 0
    // and the raw estimate ≤ 2.5m) is applied WITHOUT cross-engine libm
    // risk: V has only 1024 possible values, so the whole correction is
    // a precomputed integer table ([[hllLcTable]]) embedded as a literal
    // in both the Spark plan and the generated oracle SQL — the
    // lshWeightValues trick. Measured at sf0.01: low-card columns land
    // exact (2/3/7/99 vs true 2/3/7/100) and l_orderkey reads -1.7%.
    "q64b_profile_sketch" -> ((s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
      val li = Tables.fanout(Tables.lineitem(s, d))
      val aggs = count(lit(1)).as("__total") +: cols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__n"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")) }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val entries = cols.map { c =>
        struct(lit(c).as("col_name"),
          col("__total").as("n_rows"),
          (col("__total") - col(s"${c}__n")).as("n_null"),
          col(s"${c}__min").as("min_str"),
          col(s"${c}__max").as("max_str"))
      }
      val exact = one.select(explode(array(entries: _*)).as("p"))
        .select(col("p.*"))
      val melted = li.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
          .as("e"))
        .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
        .filter(col("v").isNotNull)
      val regs = melted
        .select(col("col_name"), graft.ops.TextOps.hash60(col("v")).as("h"))
        .selectExpr("col_name", "h % 1024 AS bucket",
          "(h DIV 1024) % 4294967296 AS w")
        .selectExpr("col_name", "bucket",
          "CAST(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END AS BIGINT) AS rho")
        .groupBy(col("col_name"), col("bucket")).agg(max(col("rho")).as("rho"))
      val est = regs.groupBy(col("col_name"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - rho AS INT))"))
            .as("occ_denom"),
          count(lit(1)).as("n_occ"))
        .selectExpr("col_name",
          s"occ_denom + (1024 - n_occ) * ${1L << 33}L AS hll_denom",
          "1024 - n_occ AS hll_empty")
        .selectExpr("col_name", "hll_denom", "hll_empty",
          s"(${1L << 53}L DIV hll_denom) * 720541 DIV 1000000 AS est_raw")
        .withColumn("est_distinct",
          when(col("hll_empty") > 0 && col("est_raw") <= 2560L,
            element_at(typedLit(hllLcTable), col("hll_empty").cast("int")))
            .otherwise(col("est_raw")))
      exact.join(est, "col_name").orderBy(col("col_name"))
    }),

    // Rolling 7-day distinct users — the moving-window COUNT DISTINCT
    // every retention/reach dashboard needs, via q57's block bitmaps:
    // each day's user set compresses to |users|/64 OR-mergeable cells,
    // each cell fans out to the ≤7 windows it belongs to (explode of a
    // 7-date sequence), and the per-window union is another bit_or +
    // popcount. Users shuffle ONCE (day,block-keyed); the window overlap
    // multiplies only the tiny cell table ×7 — never re-scans or
    // re-shuffles distinct users per window, which is what the naive
    // 7-way self-join does.
    "q65_rolling_distinct" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val cells = du
        .select(col("day"), expr("user_id div 64").as("blk"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))")
            .as("mask"))
        .groupBy(col("day"), col("blk"))
        .agg(bit_or(col("mask")).as("bits"))
      val spine = du.select(col("day")).distinct()
        .withColumnRenamed("day", "w_day")
      cells
        .withColumn("w_day", explode(expr("sequence(day, date_add(day, 6))")))
        .join(spine, "w_day")
        .groupBy(col("w_day"), col("blk"))
        .agg(bit_or(col("bits")).as("wbits"))
        .groupBy(col("w_day"))
        .agg(sum(bit_count(col("wbits")).cast("long")).as("n_users_7d"))
        .select(date_format(col("w_day"), "yyyy-MM-dd").as("day"),
          col("n_users_7d"))
        .orderBy(col("day"))
    }),

    // Equal-frequency decile segmentation (exact ntile semantics — the
    // one ranking form q18/q38 don't cover): customers bucketed into
    // account-balance deciles, then per-decile spend. The ORDER BY is
    // made total (acctbal, custkey) so both engines assign identical
    // bucket boundaries. A literal `ntile(10).over(Window.orderBy(...))`
    // plans as Exchange SinglePartition — every customer through ONE
    // sort task, the q91 defect — so the rank comes from
    // [[graft.ops.RangePlanOps.globalRank]] (sampled range boundaries →
    // per-range local rank + broadcast offsets; exact for any boundary
    // set) and the decile is ntile's published arithmetic on that rank:
    // the first n%10 buckets carry n/10+1 rows, the rest n/10.
    "q66_ntile_deciles" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val ranked = graft.ops.RangePlanOps.globalRank(cust,
        col("c_acctbal"), col("c_custkey"), 32, "q66", "grank")
      val n = cust.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n))
        .withColumn("decile", expr(
          """CASE WHEN grank <= (n div 10 + 1) * (n % 10)
            |THEN (grank - 1) div (n div 10 + 1) + 1
            |ELSE n % 10 + (grank - (n div 10 + 1) * (n % 10) - 1)
            |  div (n div 10) + 1 END""".stripMargin).cast("int"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)")
            .as("sum_acctbal"),
          min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"))
        .orderBy(col("decile"))
    }),

    // Robust outlier detection: median absolute deviation per group, flag
    // |x − median| > 3·MAD — the outlier rule that survives the outliers
    // it's hunting (mean/stddev z-scores get dragged by the tail they
    // should flag; a filtered training corpus needs the robust form).
    // Doubles stay deterministic: abs/sub/×3/compare are IEEE-exact given
    // both engines' identical medians (q34 pins that). Two group-keyed
    // aggs + two broadcast joins of |groups|-row tables.
    "q67_mad_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val med = ev.groupBy(col("event_type"))
        .agg(median(col("value")).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(median(col("adev")).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(max(col("med")), 4).as("median_value"),
          round(max(col("mad")), 4).as("mad_value"),
          sum(when(col("adev") > lit(3) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // Weekly cohort retention matrix: users grouped by first-activity
    // week, each later week's active share in integer basis points — the
    // engagement-over-time readout (and for data curation: which user
    // cohorts still generate training signal). Activity collapses to
    // distinct (user, week) FIRST, so everything downstream is
    // user-week-sized; cohort assignment is a per-user min; the cohort
    // size table is |weeks| rows → broadcast.
    "q68_cohort_retention" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val cohort = act.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      val sizes = cohort.groupBy(col("cohort_wk"))
        .agg(count(lit(1)).as("n_cohort"))
      act.join(cohort, "user_id")
        .groupBy(col("cohort_wk"), col("wk"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(sizes), "cohort_wk")
        .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
          expr("datediff(wk, cohort_wk) div 7").as("week_offset"),
          col("n_active"), col("n_cohort"),
          expr("(n_active * 10000) div n_cohort").as("retention_bp"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Co-occurrence mining (market-basket pairs): parts ordered together,
    // support ≥ 3 orders, top 50 by support. The pair space is bounded by
    // basket size, not catalog size — the self-join runs WITHIN each
    // order (equi-join on orderkey, ~C(7,2) pairs per order), so it
    // scales with |lineitem|, never |parts|². The item-affinity signal
    // behind co-retrieval and batching decisions.
    "q69_cooccurrence" -> ((s, d) => {
      val li = Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.select(col("l_orderkey"), col("l_partkey").as("part_a"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("part_b")),
          "l_orderkey")
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3)
        .orderBy(col("support").desc, col("part_a"), col("part_b"))
        .limit(50)
    }),

    // Event-type Markov transition matrix: P(next | current) per user
    // stream in integer ppm (t24's bigram-LM discipline applied to
    // behavioral sequences) — the session-simulation / anomaly baseline.
    // One user-keyed window for the lag, then two vocabulary-sized aggs.
    "q70_markov_transitions" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(ord))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type").as("from_type"),
          col("event_type").as("to_type"))
      val cnt = tr.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy(col("from_type")).agg(count(lit(1)).as("n_from"))
      cnt.join(tot, "from_type")
        .withColumn("p_ppm", expr("(n * 1000000) div n_from"))
        .select(col("from_type"), col("to_type"), col("n"), col("p_ppm"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Deterministic train/val/test split — the reproducible-partitioning
    // primitive every training-data pipeline needs. Assignment is a pure
    // per-row function of the stable key: the first 8 hex chars of
    // md5(doc_id) compared against hex-string thresholds ('cccccccc' =
    // 0.8·16⁸, 'e6666666' = 0.9·16⁸ — lexicographic compare over
    // fixed-length lowercase hex ≡ numeric compare, identical in both
    // engines). No salt/seed state, no sampling RNG, no shuffle until the
    // final kilobyte-sized report agg: at 100 TB the split is a narrow
    // map stage, re-runnable anywhere with the same answer, and any doc's
    // split membership is decidable without seeing the rest of the corpus.
    "q71_hash_split" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8)
      val assign = when(h < lit("cccccccc"), lit("train"))
        .when(h < lit("e6666666"), lit("val"))
        .otherwise(lit("test"))
      Tables.fanout(Tables.documents(s, d))
        .select(assign.as("split"), col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .orderBy(col("split"), col("lang"))
    }),

    // Training-mix allocation: target domain weights (the mixture table a
    // run config declares) joined to measured per-domain token counts →
    // token budget per domain and the implied sampling epochs. All
    // integer: alloc splits budget·ppm as (budget DIV 1e6)·ppm +
    // ((budget%1e6)·ppm) DIV 1e6 — exact floor(budget·ppm/1e6) without
    // the 1e19 intermediate (safe to ~9e12 token budgets; beyond that the
    // first term still fits since budget ≤ 9e18/1e6). epochs_bp =
    // alloc·1e4 DIV tokens is basis points — alloc ≤ budget keeps the
    // product under 2⁶³ for corpora to ~9e14 tokens (a 100 TB corpus is
    // ~2.5e13 tokens; 36× headroom). Weight table is a literal → the join
    // broadcasts; the only shuffle is the 5-group token count.
    "q72_mixture_plan" -> ((s, d) => {
      val weights = s.createDataFrame(Seq(
        ("en", 300000L), ("zh", 200000L), ("fr", 200000L),
        ("de", 150000L), ("es", 150000L))).toDF("lang", "target_ppm")
      val toks = Tables.fanout(Tables.documents(s, d))
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
        .groupBy(col("lang")).agg(sum(col("nt")).as("lang_tokens"))
      val tot = toks.agg(sum(col("lang_tokens")).as("total_tokens"))
      toks.join(broadcast(weights), "lang").crossJoin(broadcast(tot))
        .withColumn("budget", expr("total_tokens DIV 2"))
        .withColumn("alloc_tokens",
          expr("(budget DIV 1000000) * target_ppm" +
            " + ((budget % 1000000) * target_ppm) DIV 1000000"))
        .select(col("lang"), col("lang_tokens"), col("target_ppm"),
          col("alloc_tokens"),
          expr("(alloc_tokens * 10000) DIV lang_tokens").as("epochs_bp"))
        .orderBy(col("lang"))
    }),

    // Epoch-capped WATER-FILLING mixture planner — q72 reports the
    // epochs a naive proportional allocation implies; this one respects
    // a repetition budget (Muennighoff et al. 2023: value decays fast
    // past ~4 epochs; here cap = 2 epochs to make the constraint bind).
    // A domain whose proportional share exceeds its cap is frozen AT the
    // cap and its unused share re-spreads over the still-active domains
    // proportionally to their weights — which can cascade (at sf0.01:
    // fr caps in round 1, the re-spread then pushes zh over in round 2).
    // Five unrolled rounds (= |domains|) are exactly sufficient: each
    // round either caps ≥1 new domain or is a fixpoint (identical
    // recomputation), so after the ≤|domains|−1 possible cap rounds one
    // more round re-spreads the last freed share — and if THAT round
    // caps the final domain there is no active domain left to re-spread
    // to, so no further round can change anything.
    // Exact-share floor(rem·w/W) uses the q72 split-multiplication (no
    // 1e19 intermediate). Readout per domain: cap, the round it capped
    // (0 = never), final allocation, realized epochs and mixture share,
    // plus the budget shortfall the caps force. Scale shape: the corpus
    // pays ONE combinable lang-token agg; the planner itself iterates on
    // a |domains|-row frame — driver-free, broadcast-only.
    "q93_waterfill_mixture" -> ((s, d) => {
      val weights = s.createDataFrame(Seq(
        ("en", 300000L), ("zh", 200000L), ("fr", 200000L),
        ("de", 150000L), ("es", 150000L))).toDF("lang", "target_ppm")
      val toks = Tables.fanout(Tables.documents(s, d))
        .select(col("lang"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
        .groupBy(col("lang")).agg(sum(col("nt")).as("lang_tokens"))
      val tot = toks.agg(sum(col("lang_tokens")).as("total_tokens"))
      val st = graft.ops.MixtureOps.waterFill(
        toks.join(broadcast(weights), "lang").crossJoin(broadcast(tot))
          .withColumn("budget", expr("(total_tokens * 3) DIV 2"))
          .withColumn("cap_tokens", col("lang_tokens") * lit(2L)),
        rounds = 5)
      val ta = st.agg(sum(col("alloc_tokens")).as("total_alloc"))
      st.crossJoin(broadcast(ta))
        .select(col("lang"), col("lang_tokens"), col("target_ppm"),
          col("cap_tokens"), col("capped_round"), col("alloc_tokens"),
          expr("(alloc_tokens * 10000) DIV lang_tokens").as("epochs_bp"),
          expr("(alloc_tokens * 1000000) DIV total_alloc").as("realized_ppm"),
          col("budget").as("budget_tokens"),
          (col("budget") - col("total_alloc")).as("leftover_tokens"))
        .orderBy(col("lang"))
    }),

    // Stratified deterministic k-per-stratum sample: 5 docs per language,
    // chosen by smallest md5(doc_id) — a seedless uniform draw that is
    // reproducible and append-stable (adding docs can only displace, never
    // reshuffle, earlier picks). Uses the bounded TopKAggregator, NOT a
    // row_number window: the window form sorts every row per stratum
    // (single reducer per language at 100 TB); the aggregator ships ≤k
    // rows per partition per stratum through a map-side-combinable merge.
    // Rank key is the first 13 hex chars (52 bits — exact in the
    // aggregator's Double score; numeric order ≡ hex-string order, and the
    // oracle sorts the same 13-char prefix).
    "q73_stratified_sample" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.TopKAggregator(5)
      Tables.fanout(Tables.documents(s, d))
        .select(col("lang"),
          conv(substring(md5(col("doc_id").cast("string").cast("binary")),
            1, 13), 16, 10).cast("long").as("hv"),
          col("doc_id"))
        .as[(String, Long, Long)]
        .groupByKey(_._1)
        .mapValues { case (_, hv, id) => (-hv.toDouble, id) }
        .agg(agg.toColumn.name("topk"))
        .flatMap { case (lang, topk) =>
          topk.iterator.zipWithIndex.map { case ((_, id), i) =>
            (lang, (i + 1).toLong, id)
          }
        }
        .toDF("lang", "rank", "doc_id")
        .orderBy(col("lang"), col("rank"))
    }),

    // approx_percentile self-evaluation (q74): Spark's GK-style sketch at
    // accuracy=100 (ε = 1/100 rank error) checked against the exact
    // distribution — the d19/n12 "measure your own approximation" pattern
    // for quantile sketches. The sketch value itself is partition-order
    // sensitive, so it never surfaces; what surfaces is the exact
    // percentile (q23's cum-window machinery) plus a boolean per
    // percentile: does the approx value's rank interval [cnt_lt+1, cnt_le]
    // overlap the GK guarantee [⌈(p-ε)n⌉, ⌈(p+ε)n⌉]? All-integer compare
    // (cnt·100 vs (p±1)·n). ANY valid GK merge satisfies it, so the gate
    // is deterministic even though the sketch isn't. Oracle recomputes the
    // exact side and expects TRUE. The value histogram (groupBy qty) is
    // computed once and feeds both the exact ranks and the approx-rank
    // counts; approx results broadcast (3 doubles per group).
    "q74_approx_quantile_eval" -> ((s, d) => {
      val li = Tables.fanout(Tables.lineitem(s, d))
      val ap = li.groupBy(col("l_returnflag").as("flag"))
        .agg(expr("approx_percentile(l_quantity, array(0.50, 0.90, 0.99), 100)")
          .as("ap"))
        .select(col("flag"), col("ap")(0).as("a50"), col("ap")(1).as("a90"),
          col("ap")(2).as("a99"))
      val hist = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      val vw = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gw = Window.partitionBy(col("l_returnflag"))
      def atRank(k: Int) =
        min(when(col("cum") >= expr(s"(n * $k + 99) DIV 100"), col("l_quantity")))
      val exact = hist
        .withColumn("cum", sum(col("cnt")).over(vw))
        .withColumn("n", sum(col("cnt")).over(gw))
        .groupBy(col("l_returnflag"))
        .agg(atRank(50).as("p50_exact"), atRank(90).as("p90_exact"),
          atRank(99).as("p99_exact"))
      def le(a: String) = sum(when(col("l_quantity") <= col(a), col("cnt")).otherwise(0L))
      def lt(a: String) = sum(when(col("l_quantity") < col(a), col("cnt")).otherwise(0L))
      val ranks = hist.join(broadcast(ap), col("l_returnflag") === col("flag"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("cnt")).as("n"),
          le("a50").as("le50"), lt("a50").as("lt50"),
          le("a90").as("le90"), lt("a90").as("lt90"),
          le("a99").as("le99"), lt("a99").as("lt99"))
      def ok(p: Int, leC: String, ltC: String) =
        (col(leC) * 100 >= col("n") * (p - 1)) &&
          (col(ltC) * 100 <= col("n") * (p + 1))
      exact.join(ranks, "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          col("p50_exact"), col("p90_exact"), col("p99_exact"),
          ok(50, "le50", "lt50").as("ok50"),
          ok(90, "le90", "lt90").as("ok90"),
          ok(99, "le99", "lt99").as("ok99"))
        .orderBy(col("l_returnflag"))
    }),

    // Linear multi-touch attribution: every view/click in the 7 days
    // before a purchase shares the conversion credit equally, in integer
    // basis points (10000 div n per touch, remainder to the LAST touch so
    // per-purchase credit sums to exactly 10000 — auditability is the
    // point of an attribution table). The as-of family (q44/q45) picks
    // ONE touch; marketing mix models want them all. Scale shape: the
    // touch↔purchase join is user-keyed with a 7-day band — fan-out is
    // per-user activity², bounded by the window (salt hot users with q62,
    // band time with q37 if a user's week is still too hot); both windows
    // repartition on purchase_id only.
    "q75_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts").as("pts"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_user"), col("event_id").as("touch_id"),
          col("event_type").as("touch_type"), col("ts").as("tts"))
      val w = Window.partitionBy(col("purchase_id"))
        .orderBy(col("tts"), col("touch_id"))
      val wn = Window.partitionBy(col("purchase_id"))
      purchases.join(touches,
          col("p_user") === col("t_user") && col("tts") <= col("pts") &&
            col("tts") > col("pts") - expr("INTERVAL 7 DAYS"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .withColumn("n_touches", count(lit(1)).over(wn))
        .withColumn("credit_bp", expr(
          "CASE WHEN pos = n_touches THEN 10000 - (n_touches - 1) * (10000 div n_touches) " +
          "ELSE 10000 div n_touches END"))
        .select(col("purchase_id"), col("pos"), col("touch_id"),
          col("touch_type"), col("n_touches"), col("credit_bp"))
        .orderBy(col("purchase_id"), col("pos"))
    }),

    // Time-decayed engagement score: per user, Σ value·2^(−age_weeks) —
    // recency weighting without transcendentals. value goes to integer
    // cents (floor — portable), the decay is an arithmetic RIGHT SHIFT by
    // whole weeks (capped at 62 so the shift is always defined), and the
    // per-user sum is order-free integer addition — bit-identical under
    // any partitioning, unlike a pow()-weighted double sum. The reference
    // instant is the corpus max(ts), attached as a broadcast scalar.
    // Narrow scan + one map-side-combinable agg; no windows, no joins.
    "q76_decay_score" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val ref = ev.agg(max(col("ts")).as("ref_ts"))
      ev.crossJoin(broadcast(ref))
        .withColumn("age_weeks", expr(
          "CAST(least(datediff(to_date(ref_ts), to_date(ts)) div 7, 62) AS INT)"))
        .withColumn("cents", expr("CAST(floor(value * 100) AS BIGINT)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents")).as("raw_cents"),
          sum(expr("shiftright(cents, age_weeks)")).as("decayed_cents"))
        .orderBy(col("user_id"))
    }),

    // Incremental view maintenance of an aggregate: a materialized
    // per-customer rollup (the 90% "base" slice) absorbs a delta batch
    // (the 10% slice) by FULL OUTER delta-apply — counts add, DECIMAL
    // partial sums add exactly (decimal addition is associative, so
    // base⊕delta ≡ recompute bit-for-bit). THE ORACLE IS THE DIRECT
    // FULL AGGREGATE: agreement proves the maintenance path equals the
    // recompute it exists to avoid — at 100 TB the delta-apply touches
    // |delta| + |affected keys| instead of the whole fact table, which
    // is the entire economics of a materialized view. (FULL OUTER can't
    // broadcast in Spark; the apply join shuffles BOTH sides — but both
    // are aggregate-sized, |keys| and |delta keys| rows, never the fact.)
    "q77_ivm_agg" -> ((s, d) => {
      val o = Tables.fanout(Tables.orders(s, d))
      def part(df: DataFrame) = df.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          expr("SUM(CAST(o_totalprice AS DECIMAL(18,4)))").as("t"))
      val base = part(o.filter(col("o_orderkey") % 10 =!= 0))
        .toDF("o_custkey", "bn", "bt")
      val delta = part(o.filter(col("o_orderkey") % 10 === 0))
        .toDF("o_custkey", "dn", "dt")
      base.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          expr("CAST(coalesce(bt, CAST(0 AS DECIMAL(18,4))) " +
            "+ coalesce(dt, CAST(0 AS DECIMAL(18,4))) AS DOUBLE)")
            .as("total_price"))
        .orderBy(col("o_custkey"))
    }),

    // As-of LINEAR INTERPOLATION: each click event gets a value estimated
    // between the user's surrounding purchase samples — the time-series
    // resample step (pandas merge_asof + interpolate) that q13/q47's
    // nearest-sample joins can't express. One union + two frames over the
    // same (user, time) window: prev sample via last(IGNORE NULLS) over the
    // preceding frame, next via first over the following frame — no
    // join at all, so the cost is one shuffle on user_id regardless of the
    // sample:query ratio. Determinism: the window order (ts, tag, event_id)
    // is total (tag 0 = sample sorts first, so a same-instant sample is
    // "previous"); the lerp is integer cents × µs with `div` (truncating in
    // both engines; |Δcents|·|Δµs| < 5e4·1e12 ≪ 2⁶³ even at decade spans).
    "q78_interpolate" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // NULL-value purchases are dropped up front: a sample row with no
      // value would otherwise set prev_ts/next_ts (it has tag = 0) while
      // contributing no vc, so the lerp could pair prev_vc and prev_ts
      // from DIFFERENT sample rows — "interpolated between surrounding
      // samples" requires (ts, value) to travel together.
      val tagged = Tables.fanout(Tables.events(s, d))
        .filter(col("event_type") === "click" ||
          (col("event_type") === "purchase" && col("value").isNotNull))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          when(col("event_type") === "purchase", lit(0)).otherwise(lit(1))
            .as("tag"),
          when(col("event_type") === "purchase",
            expr("CAST(floor(value * 100) AS BIGINT)")).as("vc"))
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("tag"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      tagged
        .withColumn("prev_vc", last(col("vc"), ignoreNulls = true).over(wPrev))
        .withColumn("prev_ts",
          last(when(col("tag") === 0, col("ts_us")), ignoreNulls = true)
            .over(wPrev))
        .withColumn("next_vc",
          first(col("vc"), ignoreNulls = true).over(wNext))
        .withColumn("next_ts",
          first(when(col("tag") === 0, col("ts_us")), ignoreNulls = true)
            .over(wNext))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("prev_ts"), col("next_ts"),
          expr("""CASE WHEN prev_ts IS NULL THEN next_vc
                 WHEN next_ts IS NULL THEN prev_vc
                 WHEN next_ts = prev_ts THEN prev_vc
                 ELSE prev_vc + ((next_vc - prev_vc) * (ts_us - prev_ts))
                        div (next_ts - prev_ts) END""").as("interp_c"))
        .orderBy(col("event_id"))
    }),

    // Pareto skyline (Börzsönyi et al. ICDE 2001): the line items no other
    // item beats on BOTH dimensions — lower price AND higher quantity —
    // where dominance needs ≤/≥ on both and strict on at least one, so
    // exact (price, qty) ties survive together. Distributed shape: a
    // LOCAL skyline per md5-decided bucket first (any same-bucket
    // dominator proves global dominance, so local pruning never drops a
    // true skyline point — the classic two-phase distributed skyline),
    // then the identical formulation runs globally over the few
    // survivors. Each phase is a per-distinct-price groupBy + a window
    // over DISTINCT prices (rows-frame prefix max of qty ≡ "best
    // strictly-cheaper offer"), never a sort of the raw rows — at 100 TB
    // the cost is one bucket-keyed shuffle and a trivial merge. Bucket
    // keys are data-derived, so the result is partition-layout-invariant
    // (asserted in OperatorPropertiesSpec; the naive O(n²) dominance
    // model check lives in the spec too).
    "q82_pareto_skyline" -> ((s, d) => {
      paretoSkyline(Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("price"), col("l_quantity").as("qty")))
        .orderBy(col("price"), col("qty"), col("l_orderkey"),
          col("l_linenumber"))
    }),

    // Rolling robust anomaly scores (Hampel filter / rolling MAD): each
    // purchase scores against the MEDIAN and MAD of its own trailing
    // 15-sample window — the self-adapting telemetry outlier gate that
    // q67's global MAD can't give (a user whose spend level shifts is
    // judged against the new level, not the all-time one). The frame is
    // BOUNDED (15 rows), so the per-row state is a 15-element array and
    // the whole operator is one user-keyed shuffle + per-row array math.
    // Determinism: medians of k ints surface as the DOUBLED order-stat
    // sum med2 = a[(n+1) div 2] + a[(n+2) div 2] (odd n: 2·median; even:
    // the two mid values — integer-exact, no /2), MAD likewise at 4×
    // scale, and the score is ppm via `div` (truncating in BOTH engines,
    // exercised here on genuinely negative deviations).
    "q83_rolling_mad" -> ((s, d) => {
      val ev = Tables.fanout(Tables.events(s, d))
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val frame = order.rowsBetween(-14, Window.currentRow)
      ev.withColumn("widx", row_number().over(order).cast("long"))
        .withColumn("arr", sort_array(collect_list(col("cents")).over(frame)))
        .withColumn("n", size(col("arr")).cast("long"))
        .withColumn("med2", expr(
          "element_at(arr, CAST((n + 1) div 2 AS INT)) + " +
            "element_at(arr, CAST((n + 2) div 2 AS INT))"))
        .withColumn("devs",
          expr("array_sort(transform(arr, v -> abs(2*v - med2)))"))
        .withColumn("mad4", expr(
          "element_at(devs, CAST((n + 1) div 2 AS INT)) + " +
            "element_at(devs, CAST((n + 2) div 2 AS INT))"))
        .withColumn("score_ppm", expr(
          "CASE WHEN mad4 = 0 THEN NULL " +
            "ELSE ((2*cents - med2) * 2000000) div mad4 END"))
        .withColumn("outlier",
          expr("mad4 > 0 AND abs(score_ppm) >= 3500000"))
        .select(col("user_id"), col("widx"), col("cents"), col("n"),
          col("med2"), col("mad4"), col("score_ppm"), col("outlier"))
        .orderBy(col("user_id"), col("widx"))
    }),

    // Cross-set similarity from KMV sketches (Beyer et al. SIGMOD 2007):
    // pairwise Jaccard of the per-event-type ACTIVE (user, day) sets,
    // each set summarized by its k=256 smallest element hashes — the
    // sketch algebra HLL can't do (HLL unions but never intersects).
    // Estimator: among the k smallest hashes of A∪B (a uniform sample of
    // the union, because md5 order is data-independent), the fraction
    // present in both sketches estimates |A∩B|/|A∪B|. The element is
    // (user, day) rather than bare user because on this corpus every
    // user touches every event type — activity-day sets actually differ
    // (J ≈ 0.22), so the estimator is exercised away from the J=1
    // fixpoint. Everything is hash-decided → bit-exact oracle; the exact
    // Jaccard per pair rides along so the sketch error is MEASURED, not
    // assumed (d19/n12/q74 discipline). Scale: sketches are k rows per
    // set (mergeable bottom-k — at 100 TB each partition keeps its own
    // bottom-256 before the global rank), so the pair stage touches
    // 10·2·256 rows regardless of corpus size; only the exact-truth
    // readout scans the full distinct-element frame.
    "q84_kmv_jaccard" -> ((s, d) => {
      val users = Tables.fanout(Tables.events(s, d))
        .select(col("event_type").as("et"),
          (col("user_id") * 100000 +
            datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))))
            .as("user_id"))
        .distinct()
        .withColumn("h", graft.ops.TextOps.hash60(col("user_id")))
      val rk = Window.partitionBy(col("et")).orderBy(col("h"), col("user_id"))
      val sk = users.withColumn("rn", row_number().over(rk))
        .filter(col("rn") <= 256).select(col("et"), col("h"))
      val tp = sk.select(col("et")).distinct()
      val tpp = tp.select(col("et").as("et_a"))
        .crossJoin(broadcast(tp.select(col("et").as("et_b"))))
        .filter(col("et_a") < col("et_b"))
      // sketch rows fanned into every pair that involves their set
      val fan = sk.join(broadcast(tpp),
          col("et") === col("et_a") || col("et") === col("et_b"))
        .groupBy(col("et_a"), col("et_b"), col("h"))
        .agg(max(when(col("et") === col("et_a"), 1L).otherwise(0L)).as("in_a"),
          max(when(col("et") === col("et_b"), 1L).otherwise(0L)).as("in_b"))
      val rkU = Window.partitionBy(col("et_a"), col("et_b")).orderBy(col("h"))
      val est = fan.withColumn("rn", row_number().over(rkU))
        .filter(col("rn") <= 256)
        .groupBy(col("et_a"), col("et_b"))
        .agg(count(lit(1)).as("k_eff"),
          sum(col("in_a") * col("in_b")).as("n_both"))
        .withColumn("est_ppm", expr("(n_both * 1000000) div k_eff"))
      val exact = users.select(col("et"), col("user_id"))
        .join(broadcast(tpp),
          col("et") === col("et_a") || col("et") === col("et_b"))
        .groupBy(col("et_a"), col("et_b"), col("user_id"))
        .agg(max(when(col("et") === col("et_a"), 1L).otherwise(0L)).as("in_a"),
          max(when(col("et") === col("et_b"), 1L).otherwise(0L)).as("in_b"))
        .groupBy(col("et_a"), col("et_b"))
        .agg(count(lit(1)).as("n_union"),
          sum(col("in_a") * col("in_b")).as("n_inter"))
        .withColumn("exact_ppm", expr("(n_inter * 1000000) div n_union"))
      est.join(exact, Seq("et_a", "et_b"))
        .select(col("et_a"), col("et_b"), col("k_eff"), col("n_both"),
          col("est_ppm"), col("n_union"), col("n_inter"), col("exact_ppm"),
          (col("est_ppm") - col("exact_ppm")).as("err_ppm"))
        .orderBy(col("et_a"), col("et_b"))
    }),

    // Join-cardinality estimation WITHOUT running the join (the planner
    // primitive behind broadcast-vs-shuffle decisions at 100 TB): CMS
    // inner product — |orders ⋈ lineitem| = Σ_k a_k·b_k, estimated per
    // hash row from two ≤4×512-cell sketches built by map-side-combined
    // scans; min over rows is the estimate, and every row OVER-estimates
    // (SketchOps.cmsInnerProduct scaladoc). The true join count rides
    // along as the self-evaluation readout (ratio_bp ≥ 10000 always —
    // the one-sided bound, checked exactly by the oracle).
    "q85_join_size_estimate" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey").as("k"))
      val li = Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_orderkey").as("k"))
      val est = graft.ops.SketchOps.cmsInnerProduct(
        graft.ops.SketchOps.cmsSketch(o, "k"),
        graft.ops.SketchOps.cmsSketch(li, "k"))
      val truth = o.join(li, "k").agg(count(lit(1)).as("true_rows"))
      est.crossJoin(broadcast(truth))
        .select(col("rw"), col("est_rows"), col("true_rows"),
          expr("(est_rows * 10000) div true_rows").as("ratio_bp"))
        .orderBy(col("rw"))
    }),

    // HLL rollup — the multi-granularity distinct count at 100 TB: ONE
    // fact scan builds registers at the finest grouping level; every
    // coarser level (here the global 'ALL') is derived by MERGING the
    // fine registers (per-bucket max), never by rescanning. The Spark
    // side computes 'ALL' from the per-flag register table; the oracle
    // computes BOTH levels directly from rows — agreement is the
    // cross-engine proof that merge ≡ recompute (the HLL mergeability
    // law q51's scaladoc promises). Only ≤1024×levels register rows ever
    // shuffle.
    "q86_hll_rollup" -> ((s, d) => {
      val regs = Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_returnflag").as("grp"),
          graft.ops.TextOps.hash60(col("l_orderkey")).as("h"))
        .selectExpr("grp", "h % 1024 AS bucket", "h DIV 1024 AS w")
        .selectExpr("grp", "bucket",
          "CAST(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS BIGINT) AS rho")
        .groupBy(col("grp"), col("bucket")).agg(max(col("rho")).as("max_rho"))
      val global = regs.groupBy(col("bucket"))
        .agg(max(col("max_rho")).as("max_rho"))
        .select(lit("ALL").as("grp"), col("bucket"), col("max_rho"))
      regs.unionByName(global).orderBy(col("grp"), col("bucket"))
    }),

    // Join-key skew advisor — the diagnostic that feeds SkewOps.saltedJoin
    // its salt factor: per-key counts of the fact-side join key (one
    // map-side-combined agg), then the 5 hottest keys with their share of
    // the table (bp), their multiple of the average key load (bp, computed
    // as cnt·k·10⁴ div n to stay in integers), and the recommended salt
    // shard count ⌈cnt·k/n⌉ that levels that key back to average. The
    // per-key count table is the only shuffle; the totals row broadcasts.
    "q87_skew_report" -> ((s, d) => {
      val counts = Tables.fanout(Tables.lineitem(s, d))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val totals = counts.agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("k"))
      counts.orderBy(col("cnt").desc, col("l_partkey")).limit(5)
        .crossJoin(broadcast(totals))
        .select(col("l_partkey"), col("cnt"), col("n"), col("k"),
          expr("(cnt * 10000) div n").as("share_bp"),
          expr("(cnt * k * 10000) div n").as("x_avg_bp"),
          expr("(cnt * k + n - 1) div n").as("rec_salt"))
        .orderBy(col("cnt").desc, col("l_partkey"))
    }),

    // Mergeable log-bucket quantile sketch (DDSketch form, Masson et al.
    // 2019, with base-2 buckets so the bucket index is the exact integer
    // bit-length — no floating log): the sketch is a ≤64-cell histogram
    // (bucket = length(bin(v))), merge = cell-wise sum, and the q-th
    // quantile reads off the first bucket whose cumulative count reaches
    // ⌈qN/100⌉. Guarantees the true order statistic lies in [2^(b-1),
    // 2^b−1] — a ≤2× relative-error quantile from constant state, the
    // 100 TB alternative to exact percentiles (q23), which need a full
    // sort. The exact order statistic rides along as the self-evaluation
    // (est_lo ≤ exact_val ≤ est_hi by construction) — ranked by
    // [[graft.ops.RangePlanOps.globalRank]] (range partitions +
    // broadcast offsets), so even the exact readout never funnels the
    // table through one sort task.
    "q88_log2_quantiles" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), greatest(col("n_chars"), lit(1L)).as("v"))
      val hb = docs.selectExpr("CAST(length(bin(v)) AS BIGINT) AS b")
        .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      val tot = hb.agg(sum(col("cnt")).as("n"))
      val wc = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hb.withColumn("cum", sum(col("cnt")).over(wc))
      val ranks = Seq(50, 90, 99).toDF("q").crossJoin(broadcast(tot))
        .select(col("q"), expr("(n * q + 99) div 100").as("rank"))
      val pick = ranks.join(broadcast(cum), col("cum") >= col("rank"))
        .groupBy(col("q"), col("rank")).agg(min(col("b")).as("bucket"))
      val ordered = graft.ops.RangePlanOps.globalRank(docs,
        col("v"), col("doc_id"), 32, "q88", "rn")
      val exact = ranks.join(ordered, col("rn") === col("rank"))
        .select(col("q"), col("v").as("exact_val"))
      pick.join(exact, "q")
        .select(col("q"), col("bucket"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT) - 1)")
            .as("est_lo"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1")
            .as("est_hi"),
          col("exact_val"))
        .orderBy(col("q"))
    }),

    // Weighted priority sampling per stratum (the Duffield-Lund-Thorup
    // priority-sample shape with a DETERMINISTIC md5 priority — q73's
    // hash-decided discipline extended to WEIGHTS): each doc draws
    // priority hash60(doc_id) div w, and the bottom-8 per source are the
    // sample, so inclusion odds scale ≈ with w (longer/higher-quality
    // docs win ties against the uniform hash) while staying replayable
    // bit-for-bit. The fixed-size-per-stratum form is what a curation
    // run wants (q73's Bernoulli rate gives random sizes). One shuffle
    // (source-keyed rank); per-source totals ride the same exchange, so
    // each sampled row reports its weight share of the stratum in bp.
    "q89_priority_sample" -> ((s, d) => {
      val docs = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), col("source"),
          greatest(col("n_chars"), lit(1L)).as("w"))
        .withColumn("h", graft.ops.TextOps.hash60(col("doc_id")))
        .withColumn("prio", expr("h div w"))
      val wTot = Window.partitionBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val rk = Window.partitionBy(col("source"))
        .orderBy(col("prio"), col("doc_id"))
      docs.withColumn("tot_w", sum(col("w")).over(wTot))
        .withColumn("rn", row_number().over(rk).cast("long"))
        .filter(col("rn") <= 8)
        .select(col("source"), col("rn"), col("doc_id"), col("w"),
          col("prio"), expr("(w * 10000) div tot_w").as("w_share_bp"))
        .orderBy(col("source"), col("rn"))
    }),

    // Incremental view maintenance for a JOIN view — the delta rule
    // ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB (Blakeley et al. SIGMOD 1986; q77 is
    // the aggregate sibling). The "stored" view joins the old orders
    // (90%) with old customers (96%); arriving deltas touch only the
    // three delta joins, each bounded by |Δ|·selectivity — the fact
    // table is never rescanned. The oracle computes the full join on
    // the full tables directly, so agreement proves the decomposition
    // exhaustive AND disjoint (double-counted pairs would surface as
    // duplicate rows under the hash gate). Customer sides broadcast.
    "q90_ivm_join" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
        col("c_mktsegment"))
      val oOld = o.filter(col("o_orderkey") % 10 =!= 0)
      val oDelta = o.filter(col("o_orderkey") % 10 === 0)
      val cOld = c.filter(col("c_custkey") % 25 =!= 0)
      val cDelta = c.filter(col("c_custkey") % 25 === 0)
      def j(of: DataFrame, cf: DataFrame) =
        of.join(broadcast(cf), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
            col("c_mktsegment"), col("o_totalprice"))
      j(oOld, cOld)                // the stored view
        .unionByName(j(oDelta, cOld))   // ΔA ⋈ B
        .unionByName(j(oOld, cDelta))   // A ⋈ ΔB
        .unionByName(j(oDelta, cDelta)) // ΔA ⋈ ΔB
        .orderBy(col("o_orderkey"))
    }),

    // Sample-based range-partition planning (the RangePartitioner
    // primitive behind every 100 TB global sort / repartitionByRange /
    // sorted-parquet write): a COUNT-TARGETED bounded sample — each of
    // 32 md5 strata keeps its 20 smallest-hash rows, a uniform fixed-size
    // reservoir of ≤640 rows no matter the table size (the per-stratum
    // top-k compiles to WindowGroupLimit: map tasks prune to ≤20 rows
    // per stratum BEFORE the exchange — plan-guarded) — is globally
    // ranked (the ONLY un-partitioned sort, over ≤640 rows), P−1 = 31
    // order-statistic boundaries are read at positions (i·ns) div P,
    // and the FULL table is assigned to ranges with a 31-value literal
    // probe (the binary-search equivalent — per-row HOF count inside
    // codegen, no row expansion, no full-table sort). The readout is
    // the planner's own balance audit: per-range counts, value extents,
    // and load-vs-average in bp — the number that decides whether the
    // planned sort would straggle. Boundary ties on duplicate values
    // leave ranges empty (visible as pid gaps). Driver data: 31 doubles
    // (the n6-centroid discipline). At scale: grow SampleBuckets (more
    // parallel top-k strata), never a rate sample — see
    // [[graft.ops.RangePlanOps]]. The per-range agg map-side combines
    // to ≤P rows per task before its 32-key exchange.
    "q91_range_plan" -> ((s, d) => {
      val P = 32
      val li = Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("v"))
      val bArr = graft.ops.RangePlanOps.planBoundaries(s, li, P)
      val pid = graft.ops.RangePlanOps.pidColumn(bArr)(col("v"))
      val tot = li.agg(count(lit(1)).as("n"))
      li.withColumn("pid", pid)
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("cnt"), min(col("v")).as("pmin"),
          max(col("v")).as("pmax"))
        .crossJoin(broadcast(tot))
        .select(col("pid"), col("cnt"),
          round(col("pmin"), 2).as("vmin"), round(col("pmax"), 2).as("vmax"),
          expr(s"cnt * $P * 10000 div n").as("x_avg_bp"))
        .orderBy(col("pid"))
    }),

    // Range-boundary REFRESH as IVM (q91's delta story): a data drop
    // shifts the value distribution — re-deriving boundaries must not
    // rescan the base table. The per-stratum smallest-k-by-hash
    // reservoir is MERGEABLE (top-k of a union ≡ top-k of per-side
    // top-k's), so the refresh merges the base's PERSISTED ≤640-row
    // sample with the delta's and re-ranks ≤1280 rows — the DuckDB
    // oracle derives the new boundaries from the FULL table from
    // scratch, so agreement proves the merge identity exactly. The
    // readout is the router's migration bill: per new partition, how
    // many rows sat in a different partition under the old boundaries
    // (StreamingRangeRouter keeps old-boundary literals until this
    // count justifies a re-deploy). Scale: two bounded samples + one
    // assignment scan with 2·(P−1) literal probes per row.
    "q94_boundary_refresh" -> ((s, d) => {
      import graft.ops.RangePlanOps._
      val P = 32
      // staged once: the planner reads this frame five times (the cut
      // agg, the old-boundary sample, the base and delta reservoir legs
      // of the refreshed sample, and the final migration agg) — without
      // the checkpoint each pass re-paid the parquet scan + fanout
      // exchange (~4 redundant full-table passes at bench scale; at
      // 100 TB the equivalent is planning from a staged narrow
      // projection instead of five scans of the fact table)
      val li = Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("v"))
        .transform(graft.Tables.stage)
      val cut = li.agg(expr("((max(l_orderkey) + 1) * 4) div 5").as("c"))
        .head.getLong(0)
      val base = li.filter(col("l_orderkey") < cut)
      val delta = li.filter(col("l_orderkey") >= cut)
      val oldB = planBoundaries(s, base, P)
      val newB = boundariesFromRanked(s, mergeRankedSamples(
        boundedRankedSample(base), boundedRankedSample(delta)), P)
      li.withColumn("pid", pidColumn(newB)(col("v")))
        .withColumn("old_pid", pidColumn(oldB)(col("v")))
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("pid") =!= col("old_pid"), 1L).otherwise(0L))
            .as("n_moved"))
        .select(col("pid"), col("cnt"), col("n_moved"),
          expr("n_moved * 10000 div cnt").as("moved_bp"))
        .orderBy(col("pid"))
    }),

    // Two-stage cluster-sampling audit (survey-sampling at the petabyte:
    // estimate a 100 TB table's total WITHOUT scanning it — sample 1-in-4
    // storage blocks, then 1-in-2 rows inside each sampled block, and
    // scale by the Horvitz-Thompson inverse inclusion probability ×8.
    // Block = l_orderkey div 32 stands in for the file/row-group unit a
    // real audit prunes on (only sampled blocks are ever read — the
    // outer predicate is a pure function of the block id, so it pushes
    // into partition/file pruning). Money moves as EXACT integer
    // deci-cents (price → DECIMAL(18,4) → ×10⁴ → BIGINT), so estimate
    // and truth are bit-stable in any summation order. The full-scan
    // true total rides along as the self-eval (err_bp) — the readout
    // you drop at scale, where the whole point is not reading 75% of
    // the blocks.
    "q92_block_audit" -> ((s, d) => {
      val li = Tables.fanout(Tables.lineitem(s, d))
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)")
            .as("dc"),
          expr("l_orderkey div 32").as("blk"))
      val sampled = li
        .filter(graft.ops.TextOps.hash60(
          concat(lit("blk|"), col("blk").cast("string"))) % 4 === 0)
        .filter(graft.ops.TextOps.hash60(
          concat(lit("row|"), col("l_orderkey").cast("string"), lit("_"),
            col("l_linenumber").cast("string"))) % 2 === 0)
      val est = sampled.agg(count(lit(1)).as("n_rows_sampled"),
        (sum(col("dc")) * 8).as("est_dc"))
      val truth = li.agg(count(lit(1)).as("n_rows"),
        sum(col("dc")).as("true_dc"),
        countDistinct(col("blk")).as("n_blocks"))
      est.crossJoin(broadcast(truth))
        .select(col("n_blocks"), col("n_rows"), col("n_rows_sampled"),
          col("est_dc"), col("true_dc"),
          expr("abs(est_dc - true_dc) * 10000 div true_dc").as("err_bp"))
    })
  )

  /** q82's two-phase distributed skyline: local per-bucket prune, then the
    * identical per-distinct-price formulation globally over survivors.
    * Expects columns (l_orderkey, l_linenumber, price, qty); minimizes
    * price, maximizes qty. */
  private[graft] def paretoSkyline(pts: DataFrame): DataFrame = {
    def stage(df: DataFrame, g: org.apache.spark.sql.Column): DataFrame = {
      val perx = df.withColumn("grp", g)
        .groupBy(col("grp"), col("price")).agg(max(col("qty")).as("bestq"))
      val w = Window.partitionBy(col("grp")).orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val mins = perx.withColumn("best_prev", max(col("bestq")).over(w))
      df.withColumn("grp", g).join(mins, Seq("grp", "price"))
        .filter(!(coalesce(col("best_prev") >= col("qty"), lit(false)) ||
          col("bestq") > col("qty")))
        .drop("grp", "bestq", "best_prev")
    }
    val local = stage(pts,
      pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(64L)))
    stage(local, lit(0L))
  }

  /** SQL twin of [[graft.ops.MixtureOps.waterFill]]: the unrolled
    * redistribution rounds as CTEs s1..s5 over a seed CTE s0 that must
    * carry `$passCols, target_ppm, budget, cap_tokens, capped_round,
    * alloc_tokens`. Shared by q93 (lang targets) and p10 (DoReMi source
    * weights) so both oracles replay the identical integer sequence. */
  private[queries] def dkWaterfillRounds(passCols: String,
      rounds: Int = 5): String =
    (1 to rounds).map { r =>
      s"""a$r AS (SELECT
         |    CAST(coalesce(sum(CASE WHEN capped_round = 0
         |      THEN target_ppm END), 0) AS BIGINT) AS w_act,
         |    CAST(coalesce(sum(CASE WHEN capped_round <> 0
         |      THEN alloc_tokens END), 0) AS BIGINT) AS capped_alloc
         |  FROM s${r - 1}),
         |s$r AS (SELECT $passCols, target_ppm, budget, cap_tokens,
         |    CASE WHEN capped_round <> 0 THEN capped_round
         |         WHEN want > cap_tokens THEN CAST($r AS BIGINT)
         |         ELSE CAST(0 AS BIGINT) END AS capped_round,
         |    CASE WHEN capped_round <> 0 THEN alloc_tokens
         |         WHEN want > cap_tokens THEN cap_tokens
         |         ELSE want END AS alloc_tokens
         |  FROM (SELECT s.*,
         |      CASE WHEN a.w_act = 0 THEN CAST(0 AS BIGINT)
         |        ELSE ((budget - a.capped_alloc) // a.w_act) * target_ppm
         |          + (((budget - a.capped_alloc) % a.w_act) * target_ppm)
         |            // a.w_act END AS want
         |    FROM s${r - 1} s, a$r a))""".stripMargin
    }.mkString(",\n")

  private val dkAttribution: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id, ts::TIMESTAMP AS pts
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
      |         ts::TIMESTAMP AS tts
      |  FROM events WHERE event_type IN ('view', 'click')),
      |j AS (
      |  SELECT p.purchase_id, t.touch_id, t.touch_type, t.tts
      |  FROM p JOIN t ON t.user_id = p.user_id
      |    AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 7 DAY),
      |r AS (
      |  SELECT purchase_id, touch_id, touch_type,
      |    ROW_NUMBER() OVER (PARTITION BY purchase_id
      |                       ORDER BY tts, touch_id) AS pos,
      |    COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
      |  FROM j)
      |SELECT purchase_id, pos, touch_id, touch_type, n_touches,
      |  CASE WHEN pos = n_touches
      |       THEN 10000 - (n_touches - 1) * (10000 // n_touches)
      |       ELSE 10000 // n_touches END AS credit_bp
      |FROM r ORDER BY purchase_id, pos""".stripMargin

  /** The merged-customer state after q54's change-set applies (no ORDER BY
    * so q61 can embed it as a version CTE). */
  private val dkMergedCustomer: String =
    """WITH changes AS (
      |  SELECT c_custkey,
      |         'MERGED_' || CAST(c_custkey AS VARCHAR) AS c_name,
      |         maxp AS c_acctbal,
      |         'MERGED' AS c_mktsegment,
      |         CASE WHEN c_custkey % 5 = 0 THEN 'D' ELSE 'U' END AS op
      |  FROM (
      |    SELECT CASE WHEN o_custkey % 3 = 0 THEN o_custkey + 10000000
      |                ELSE o_custkey END AS c_custkey,
      |           max(o_totalprice) AS maxp
      |    FROM orders GROUP BY 1))
      |SELECT t.c_custkey, t.c_name, t.c_acctbal, t.c_mktsegment
      |FROM customer t
      |WHERE NOT EXISTS (SELECT 1 FROM changes s
      |                  WHERE s.c_custkey = t.c_custkey)
      |UNION ALL
      |SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |FROM changes WHERE op = 'U'""".stripMargin

  val oracles: Map[String, String] = Map(
    "q78_interpolate" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |    CASE WHEN event_type = 'purchase'
        |         THEN CAST(floor(value * 100) AS BIGINT) END AS vc
        |  FROM events
        |  WHERE event_type = 'click'
        |     OR (event_type = 'purchase' AND value IS NOT NULL)),
        |w AS (
        |  SELECT event_id, user_id, ts_us, tag,
        |    last_value(vc IGNORE NULLS) OVER pw AS prev_vc,
        |    last_value(CASE WHEN tag = 0 THEN ts_us END IGNORE NULLS)
        |      OVER pw AS prev_ts,
        |    first_value(vc IGNORE NULLS) OVER nw AS next_vc,
        |    first_value(CASE WHEN tag = 0 THEN ts_us END IGNORE NULLS)
        |      OVER nw AS next_ts
        |  FROM ev
        |  WINDOW pw AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         nw AS (PARTITION BY user_id ORDER BY ts_us, tag, event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, ts_us, prev_ts, next_ts,
        |  CASE WHEN prev_ts IS NULL THEN next_vc
        |       WHEN next_ts IS NULL THEN prev_vc
        |       WHEN next_ts = prev_ts THEN prev_vc
        |       ELSE prev_vc + ((next_vc - prev_vc) * (ts_us - prev_ts))
        |              // (next_ts - prev_ts) END AS interp_c
        |FROM w WHERE tag = 1 ORDER BY event_id""".stripMargin,
    "q51_hll_registers" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem)
        |SELECT h % 1024 AS bucket,
        |       max(CAST(CASE WHEN h // 1024 = 0 THEN 51
        |                     ELSE 51 - length(bin(h // 1024)) END AS BIGINT))
        |         AS max_rho
        |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q52_kmv_sample" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT AS h,
        |         l_orderkey
        |  FROM lineitem),
        |d AS (SELECT h, min(l_orderkey) AS key FROM h GROUP BY h)
        |SELECT h, key FROM d ORDER BY h LIMIT 256""".stripMargin,
    // deliberately a DIFFERENT algorithm than the Spark sweep: nested-loop
    // pair/at-point counting — agreement pins the sweep's tie semantics
    // (inclusive ends, back-to-back windows don't overlap)
    "q53_overlap_sweep" ->
      """WITH li AS (
        |  -- (l_orderkey, l_linenumber) is NOT unique in this corpus; the
        |  -- synthetic rid only orders pairs and its predicate columns are
        |  -- (s, sd, rd), so tie order among identical rows is harmless
        |  SELECT l_suppkey AS s,
        |         l_shipdate::DATE AS sd,
        |         l_shipdate::DATE + (l_quantity::INT % 20 + 3) AS rd,
        |         row_number() OVER (ORDER BY l_suppkey, l_shipdate) AS rid
        |  FROM lineitem),
        |wins AS (SELECT s, count(*) AS n_windows FROM li GROUP BY s),
        |pairs AS (
        |  SELECT a.s, count(*) AS n_overlap_pairs
        |  FROM li a JOIN li b ON a.s = b.s AND a.rid < b.rid
        |   AND a.sd <= b.rd AND b.sd <= a.rd
        |  GROUP BY a.s),
        |peak AS (
        |  SELECT s, max(c) AS peak_concurrent FROM (
        |    SELECT a.s AS s, a.rid, count(*) AS c
        |    FROM li a JOIN li b ON a.s = b.s AND b.sd <= a.sd AND a.sd <= b.rd
        |    GROUP BY a.s, a.rid)
        |  GROUP BY s)
        |SELECT w.s AS l_suppkey, w.n_windows, p2.peak_concurrent,
        |       CAST(coalesce(p.n_overlap_pairs, 0) AS BIGINT) AS n_overlap_pairs
        |FROM wins w
        |JOIN peak p2 ON p2.s = w.s
        |LEFT JOIN pairs p ON p.s = w.s
        |ORDER BY l_suppkey""".stripMargin,
    "q31_exists_mix" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q32_lateral_topn" ->
      """SELECT c.c_custkey, t.o_orderkey AS top_orderkey,
        |       t.o_totalprice AS top_price
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t ON true
        |ORDER BY c.c_custkey""".stripMargin,
    "q33_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
        |  COUNT(*) AS n_nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q34_median" ->
      """SELECT event_type, round(median(value), 4) AS median_value,
        |       COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q35_bit_agg" ->
      """SELECT l_returnflag,
        |  bit_and(l_partkey) AS pk_and,
        |  bit_or(l_partkey) AS pk_or,
        |  bit_xor(l_partkey) AS pk_xor,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q36_unpivot" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DOUBLE) AS quantity,
        |    CAST(l_discount AS DOUBLE) AS discount,
        |    CAST(l_tax AS DOUBLE) AS tax
        |  FROM lineitem WHERE l_orderkey <= 100)
        |SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, quantity AS val FROM base
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount', discount FROM base
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'tax', tax FROM base)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_star_join_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS order_value,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY order_value DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q6_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q7_set_ops" ->
      """WITH high AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |     bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM high INTERSECT SELECT * FROM bld)
        |UNION ALL
        |SELECT c_custkey, 'only_high' AS tag FROM (SELECT * FROM high EXCEPT SELECT * FROM bld)
        |UNION ALL
        |SELECT c_custkey, 'only_building' AS tag FROM (SELECT * FROM bld EXCEPT SELECT * FROM high)
        |ORDER BY tag, c_custkey""".stripMargin,
    "q8_rollup" ->
      """SELECT n_name, o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderstatus)
        |ORDER BY n_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q9_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q10_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_str, event_type""".stripMargin,
    "q17_corr_subquery" ->
      """SELECT o.o_orderkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_totalprice > (
        |  SELECT 2 * CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |         / COUNT(*)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,
    "q18_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  RANK() OVER w AS rnk,
        |  DENSE_RANK() OVER w AS drnk,
        |  NTILE(4) OVER w AS quartile,
        |  LAG(o_orderkey, 1) OVER w AS prev_order,
        |  LEAD(o_orderkey, 1) OVER w AS next_order
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q16_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q20_null_semantics" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(defaulted)') AS seg_coalesced,
        |  nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS is_building,
        |  CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL
        |       THEN 'building' ELSE 'other' END AS bucket
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q19_minmax_by" ->
      """WITH m AS (
        |  SELECT o_custkey,
        |    max(struct_pack(p := o_totalprice, k := o_orderkey)) AS mx,
        |    min(struct_pack(p := o_totalprice, k := o_orderkey)) AS mn
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey,
        |  mx.p AS best_price, mx.k AS best_order,
        |  mn.p AS worst_price, mn.k AS worst_order
        |FROM m ORDER BY o_custkey""".stripMargin,
    "q13_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, 0 AS tag,
        |         event_id AS click_id, NULL::BIGINT AS error_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts::TIMESTAMP AS ts, 1 AS tag,
        |         NULL::BIGINT AS click_id, event_id AS error_id
        |  FROM events WHERE event_type = 'error'),
        |w AS (
        |  SELECT *, last_value(click_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id
        |    ORDER BY ts, tag, coalesce(click_id, error_id)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click_id
        |  FROM u)
        |SELECT error_id AS event_id, user_id, prev_click_id
        |FROM w WHERE error_id IS NOT NULL ORDER BY event_id""".stripMargin,
    "q14_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
        |    lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM o),
        |sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx::BIGINT AS session_idx, COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event_id,
        |  date_diff('second', MIN(ts), MAX(ts)) AS dur_s
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    // native-rule islands: split at diff >= 1800 (session extends
    // [ts, ts+gap)); end = last event + gap
    "q95_session_window" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
        |    lag(ts::TIMESTAMP) OVER (PARTITION BY user_id
        |      ORDER BY ts::TIMESTAMP, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1
        |    ELSE 0 END AS new_sess
        |  FROM o),
        |sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id,
        |  CAST(floor(epoch(MIN(ts))) AS BIGINT) AS sess_start_s,
        |  CAST(floor(epoch(MAX(ts))) + 1800 AS BIGINT) AS sess_end_s,
        |  COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event_id
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_s""".stripMargin,
    // dynamic-gap islands: running MAX of preceding interval ends (a
    // long-gap event can outlast several short-gap successors — lag of
    // the previous end alone would split too early); split at
    // ts >= prev_max_end ([ts, ts+gap) half-open, the native rule);
    // merged end = max member end, exact in epoch microseconds.
    "q95b_session_window_dynamic" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
        |    CASE WHEN event_type = 'purchase' THEN 2700 ELSE 900 END
        |      AS gap_s
        |  FROM events),
        |w AS (
        |  SELECT *,
        |    max(epoch_us(ts) + gap_s * 1000000::BIGINT) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max_end
        |  FROM o),
        |f AS (
        |  SELECT *, CASE WHEN prev_max_end IS NULL
        |    OR epoch_us(ts) >= prev_max_end THEN 1 ELSE 0 END AS new_sess
        |  FROM w),
        |sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id,
        |  CAST(floor(epoch(MIN(ts))) AS BIGINT) AS sess_start_s,
        |  CAST(max(epoch_us(ts) + gap_s * 1000000::BIGINT) // 1000000
        |    AS BIGINT) AS sess_end_s,
        |  COUNT(*) AS n_events,
        |  MIN(event_id) AS first_event_id
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_s""".stripMargin,
    "q15_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q21_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_priority,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q22_interval_arith" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3m,
        |  CAST(CAST(o_orderdate AS DATE) + 90 AS VARCHAR) AS plus_90d,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
        |  CAST(CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS VARCHAR) AS quarter_start,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |  CAST(year(CAST(o_orderdate AS DATE)) * 100 + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS yyyymm
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q23_percentiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN l_quantity END) AS p50,
        |  MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN l_quantity END) AS p90,
        |  MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN l_quantity END) AS p99,
        |  COUNT(*) AS n_rows
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey IN (1, 2))
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderstatus = 'F'
        |                          AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,
    "q25_outer_join" ->
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nk_c, COUNT(*) AS cnt_c
        |           FROM customer WHERE c_acctbal > 7000 GROUP BY 1),
        |     s AS (SELECT CAST(s_nationkey AS BIGINT) AS nk_s, COUNT(*) AS cnt_s
        |           FROM supplier WHERE s_acctbal > 7000 GROUP BY 1)
        |SELECT coalesce(nk_c, nk_s) AS nationkey,
        |       coalesce(cnt_c, 0) AS n_rich_cust,
        |       coalesce(cnt_s, 0) AS n_rich_supp
        |FROM c FULL OUTER JOIN s ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,
    "q26_map_funcs" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types_csv
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q27_range_frame" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |         -- integer floor of seconds (epoch() is a DOUBLE and its
        |         -- BIGINT cast rounds; Spark's unix_timestamp floors)
        |         epoch_us(ts::TIMESTAMP) // 1000000 AS epoch_s
        |  FROM events)
        |SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h,
        |  MIN(event_id) OVER w AS first_in_window
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // identical spec to q13 — the native exec must agree with the
    // composed form bit-for-bit
    "q29_asof_native" ->
      """WITH u AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, 0 AS tag,
        |         event_id AS click_id, NULL::BIGINT AS error_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts::TIMESTAMP AS ts, 1 AS tag,
        |         NULL::BIGINT AS click_id, event_id AS error_id
        |  FROM events WHERE event_type = 'error'),
        |w AS (
        |  SELECT *, last_value(click_id IGNORE NULLS) OVER (
        |    PARTITION BY user_id
        |    ORDER BY ts, tag, coalesce(click_id, error_id)
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_click_id
        |  FROM u)
        |SELECT error_id AS event_id, user_id, prev_click_id
        |FROM w WHERE error_id IS NOT NULL ORDER BY event_id""".stripMargin,
    "q30_latest_wins" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id AS latest_event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts,
        |  round(value, 4) AS latest_value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q28_safe_casts" ->
      """SELECT event_id,
        |  TRY_CAST(event_type AS INT) AS type_int,
        |  CAST(TRY_CAST(CAST(user_id AS VARCHAR) AS INT) AS BIGINT) AS uid_int,
        |  CASE WHEN user_id % 2 = 0 THEN NULL
        |       ELSE value / CAST(user_id % 2 AS DOUBLE) END AS half_ratio,
        |  coalesce(CAST(TRY_CAST(event_type AS INT) AS BIGINT), -1) AS type_or_default
        |FROM events ORDER BY event_id""".stripMargin,
    "q12_range_join" ->
      """SELECT s.event_id AS signup_id, COUNT(*) AS n_follow
        |FROM (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |      WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events) f
        |  ON f.user_id = s.user_id
        |  AND f.ts > s.ts AND f.ts <= s.ts + INTERVAL 1 HOUR
        |GROUP BY s.event_id ORDER BY signup_id""".stripMargin,
    // identical semantics to q12 — the banded plan must reproduce the plain
    // range join's rows exactly
    "q37_range_band" ->
      """SELECT s.event_id AS signup_id, COUNT(*) AS n_follow
        |FROM (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |      WHERE event_type = 'signup') s
        |JOIN (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events) f
        |  ON f.user_id = s.user_id
        |  AND f.ts > s.ts AND f.ts <= s.ts + INTERVAL 1 HOUR
        |GROUP BY s.event_id ORDER BY signup_id""".stripMargin,
    // window order (o_totalprice, o_orderkey) is unique → percent_rank is
    // strictly increasing, so ordering the output by pct_rank matches the
    // Spark side's ordering exactly
    "q38_dist_windows" ->
      """SELECT o_orderpriority, o_orderkey,
        |  round(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  round(CUME_DIST() OVER w, 6) AS cdist,
        |  FIRST_VALUE(o_orderkey) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
        |  NTH_VALUE(o_orderkey, 3) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key,
        |  LAST_VALUE(o_orderkey) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_key
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, pct_rank, o_orderkey""".stripMargin,
    "q39_gapfill" ->
      """WITH monthly AS (
        |  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS mon,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (
        |  SELECT min(date_trunc('month', o_orderdate)) AS lo,
        |         max(date_trunc('month', o_orderdate)) AS hi FROM orders),
        |series AS (
        |  SELECT p.o_orderpriority,
        |         unnest(generate_series(b.lo, b.hi, INTERVAL 1 MONTH)) AS mon
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders) p, bounds b)
        |SELECT s.o_orderpriority, s.mon,
        |       coalesce(m.n_orders, 0) AS n_orders
        |FROM series s LEFT JOIN monthly m
        |  ON m.o_orderpriority = s.o_orderpriority AND m.mon = s.mon
        |ORDER BY s.o_orderpriority, s.mon""".stripMargin,
    "q40_cross_join" ->
      """SELECT n_nationkey, r_regionkey, n_name, r_name,
        |       r_regionkey * 100 + n_nationkey AS combo_key
        |FROM nation CROSS JOIN region
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,
    "q41_histogram" ->
      """SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q48_share_of_total" ->
      """WITH g AS (
        |  SELECT o_orderpriority,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec,
        |         count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, n,
        |  round(CAST(rev_dec AS DOUBLE), 2) AS revenue,
        |  round(CAST(rev_dec AS DOUBLE) /
        |        CAST(SUM(rev_dec) OVER () AS DOUBLE), 6) AS rev_share
        |FROM g ORDER BY o_orderpriority""".stripMargin,
    "q50_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(27,10))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,10))) AS DOUBLE)
        |      AS sy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(27,10)))
        |      AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,10)))
        |      AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice
        |      AS DECIMAL(27,10))) AS DOUBLE) AS sy2
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sx2 - sx * sx)) * sx) / n,
        |        4) AS intercept,
        |  round((n * sxy - sx * sy) /
        |        (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6)
        |    AS corr_xy
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q49_filtered_agg" ->
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
        |  count(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |       FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS qty_taxed
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q46_recursive_cte" ->
      """WITH RECURSIVE anc(custkey, node, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT custkey, node // 2, depth + 1 FROM anc WHERE node >= 2)
        |SELECT custkey, max(depth) AS chain_len, count(*) AS n_nodes
        |FROM anc GROUP BY custkey ORDER BY custkey""".stripMargin,
    // tiebreak encodes the exec's per-side resolution: equal distance →
    // backward; among equal-time backward rows the LARGEST id, forward the
    // SMALLEST
    "q47_asof_nearest" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |  WHERE event_type = 'error'),
        |c AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |  WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, l.click_id AS near_click_id
        |FROM e LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id FROM c
        |  WHERE c.user_id = e.user_id
        |    AND abs(epoch_us(c.ts - e.ts)) <= 2700000000::BIGINT
        |  ORDER BY abs(epoch_us(c.ts - e.ts)) ASC,
        |           (c.ts > e.ts) ASC,
        |           CASE WHEN c.ts <= e.ts THEN -c.event_id
        |                ELSE c.event_id END ASC
        |  LIMIT 1) l ON true
        |ORDER BY e.event_id""".stripMargin,
    "q45_asof_forward" ->
      """WITH cl AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT cl.event_id, cl.user_id, l.purchase_id AS next_purchase_id
        |FROM cl LEFT JOIN LATERAL (
        |  SELECT p.event_id AS purchase_id FROM p
        |  WHERE p.user_id = cl.user_id AND p.ts >= cl.ts
        |    AND p.ts <= cl.ts + INTERVAL 2 HOUR
        |  ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) l ON true
        |ORDER BY cl.event_id""".stripMargin,
    "q44_asof_tolerance" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |  WHERE event_type = 'error'),
        |c AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
        |  WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, l.click_id AS prev_click_id
        |FROM e LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id FROM c
        |  WHERE c.user_id = e.user_id AND c.ts <= e.ts
        |    AND c.ts >= e.ts - INTERVAL 30 MINUTE
        |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) l ON true
        |ORDER BY e.event_id""".stripMargin,
    "q43_zorder" -> {
      val z = graft.ops.LayoutOps.zorder16Sql("xdim", "ydim")
      s"""WITH dims AS (
         |  SELECT o_orderkey,
         |         o_custkey % 65536 AS xdim,
         |         (year(o_orderdate) * 12 + month(o_orderdate)) % 65536
         |           AS ydim
         |  FROM orders)
         |SELECT o_orderkey, xdim, ydim, $z AS zkey
         |FROM dims ORDER BY o_orderkey""".stripMargin
    },
    "q42_scd2" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |         LAG(o_orderstatus) OVER w AS prev_status
        |  FROM orders WHERE o_custkey <= 200
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey)),
        |changes AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        |  FROM seq WHERE prev_status IS NULL OR o_orderstatus <> prev_status)
        |SELECT o_custkey, o_orderstatus AS status,
        |       o_orderdate AS valid_from,
        |       LEAD(o_orderdate) OVER w2 AS valid_to,
        |       CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
        |FROM changes
        |WINDOW w2 AS (PARTITION BY o_custkey
        |              ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    // deliberately the textbook full MERGE phrasing (NOT EXISTS + UNION of
    // surviving upserts) — agreement pins applyChanges' anti-join+union
    // decomposition to SQL MERGE semantics
    "q54_merge_upsert" -> s"$dkMergedCustomer\nORDER BY c_custkey",
    // same md5 hash family as the Spark side: bucket(i, key) =
    // ('0x' || substr(md5(i || '|' || key), 1, 15))::BIGINT % 512
    "q55_countmin" ->
      """WITH rws AS (SELECT i FROM (VALUES (0),(1),(2),(3)) AS r(i)),
        |cells AS (
        |  SELECT r.i AS rw,
        |         ('0x' || substr(md5(CAST(r.i AS VARCHAR) || '|' ||
        |            CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT % 512
        |           AS bucket
        |  FROM lineitem, rws r),
        |sketch AS (
        |  SELECT rw, bucket, count(*) AS cnt FROM cells GROUP BY rw, bucket),
        |top AS (
        |  SELECT l_partkey, count(*) AS true_cnt FROM lineitem
        |  GROUP BY l_partkey ORDER BY true_cnt DESC, l_partkey LIMIT 20),
        |lk AS (
        |  SELECT t.l_partkey, t.true_cnt, r.i AS rw,
        |         ('0x' || substr(md5(CAST(r.i AS VARCHAR) || '|' ||
        |            CAST(t.l_partkey AS VARCHAR)), 1, 15))::BIGINT % 512
        |           AS bucket
        |  FROM top t, rws r)
        |SELECT lk.l_partkey, lk.true_cnt, min(s.cnt) AS cms_est
        |FROM lk JOIN sketch s ON s.rw = lk.rw AND s.bucket = lk.bucket
        |GROUP BY lk.l_partkey, lk.true_cnt
        |ORDER BY l_partkey""".stripMargin,
    "q56_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts::TIMESTAMP) AS view_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS click_ts
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click'
        |    AND e.ts::TIMESTAMP >= v.view_ts
        |    AND e.ts::TIMESTAMP <= v.view_ts + INTERVAL 7 DAY
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS purchase_ts
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts::TIMESTAMP >= c.click_ts
        |    AND e.ts::TIMESTAMP <= c.click_ts + INTERVAL 7 DAY
        |  GROUP BY e.user_id)
        |SELECT v.user_id,
        |       epoch_us(v.view_ts) AS view_us,
        |       epoch_us(c.click_ts) AS click_us,
        |       epoch_us(p.purchase_ts) AS purchase_us,
        |       CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
        |              + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
        |            AS BIGINT) AS stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    // independent algorithm on purpose: plain COUNT(DISTINCT ...) vs the
    // Spark side's bitmap cells — agreement proves the bitmap encoding
    "q57_bitmap_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS n_distinct,
        |       count(DISTINCT l_orderkey // 64) AS n_blocks
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // same sessionization as q14 (date_diff('second') ≡ unix_timestamp
    // floor subtraction); DuckDB's ordered list() pins in-session order
    "q58_event_paths" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type,
        |    lag(ts::TIMESTAMP) OVER (PARTITION BY user_id
        |      ORDER BY ts::TIMESTAMP, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END
        |    AS new_sess
        |  FROM o),
        |sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM f),
        |p AS (
        |  SELECT user_id, session_idx,
        |    array_to_string(
        |      (list(event_type ORDER BY ts, event_id))[1:5], '->') AS path
        |  FROM sess GROUP BY user_id, session_idx)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 25""".stripMargin,
    // the window formulation the bounded aggregator must reproduce exactly
    "q59_topk_agg" ->
      """SELECT l_returnflag, rank, l_orderkey, price FROM (
        |  SELECT l_returnflag,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice DESC, l_orderkey ASC) AS rank,
        |         l_orderkey, l_extendedprice AS price
        |  FROM lineitem)
        |WHERE rank <= 5 ORDER BY l_returnflag, rank""".stripMargin,
    // the merged snapshot embeds as a CTE; row compare is column-wise
    // (mirrors the Spark side's struct equality — no NULL fields inside)
    "q61_table_diff" ->
      s"""WITH newt AS (
         |$dkMergedCustomer),
         |oldt AS (
         |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer)
         |SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
         |  CASE WHEN o.c_custkey IS NULL THEN 'added'
         |       WHEN n.c_custkey IS NULL THEN 'removed'
         |       ELSE 'changed' END AS change,
         |  o.c_name AS old_name, n.c_name AS new_name,
         |  o.c_acctbal AS old_acctbal, n.c_acctbal AS new_acctbal
         |FROM oldt o FULL JOIN newt n ON o.c_custkey = n.c_custkey
         |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
         |   OR o.c_name <> n.c_name OR o.c_acctbal <> n.c_acctbal
         |   OR o.c_mktsegment <> n.c_mktsegment
         |ORDER BY c_custkey""".stripMargin,
    // independent algorithm: plain semi-join + COUNT DISTINCT, no bitmaps
    "q60_bitmap_intersect" ->
      """SELECT c.c_nationkey, count(DISTINCT c.c_custkey) AS n_both
        |FROM customer c
        |WHERE c.c_acctbal > 5000
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |GROUP BY c.c_nationkey
        |HAVING count(DISTINCT c.c_custkey) > 0
        |ORDER BY c.c_nationkey""".stripMargin,
    // the PLAIN join — salting must be result-invisible
    "q62_salted_join" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q63_burst_collapse" ->
      """WITH o AS (
        |  SELECT user_id, event_type, event_id, ts::TIMESTAMP AS ts,
        |    lag(ts::TIMESTAMP) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts::TIMESTAMP, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |    OR date_diff('second', prev_ts, ts) > 60 THEN 1 ELSE 0 END
        |    AS new_burst
        |  FROM o),
        |b AS (
        |  SELECT *, SUM(new_burst) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_idx
        |  FROM f),
        |r AS (
        |  SELECT user_id, event_type, event_id, ts, burst_idx,
        |    row_number() OVER (PARTITION BY user_id, event_type, burst_idx
        |      ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type, burst_idx)
        |      AS n_collapsed
        |  FROM b)
        |SELECT user_id, event_type, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts, n_collapsed
        |FROM r WHERE rn = 1
        |ORDER BY user_id, event_type, first_ts, event_id""".stripMargin,
    "q64_profile" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    // same total frame order, same L2R folds; DuckDB subscripts are
    // 1-based where Spark SQL's arr[i] is 0-based — hence the +1 shifts
    "q79_sax_motifs" -> {
      def sym(i: Int) = {
        val paa = s"((arr[${i * 2 + 1}] + arr[${i * 2 + 2}]) / 2.0)"
        val z = s"(CASE WHEN std = 0.0 THEN 0.0 ELSE ($paa - mean) / std END)"
        s"(CASE WHEN $z < -0.6745 THEN 0 WHEN $z < 0.0 THEN 1 " +
          s"WHEN $z < 0.6745 THEN 2 ELSE 3 END)"
      }
      s"""WITH ev AS (
         |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         |         CAST(value AS DOUBLE) AS v
         |  FROM events
         |  WHERE event_type = 'purchase' AND value IS NOT NULL),
         |w AS (
         |  SELECT user_id,
         |    list(v) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |                  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS arr
         |  FROM ev),
         |f AS (SELECT user_id, arr FROM w WHERE len(arr) = 8),
         |m AS (
         |  SELECT user_id, arr,
         |    list_reduce(list_prepend(0.0::DOUBLE, arr), (a, x) -> a + x)
         |      / 8.0 AS mean
         |  FROM f),
         |s AS (
         |  SELECT user_id, arr, mean,
         |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(arr, x -> (x - mean) * (x - mean))),
         |      (a, x) -> a + x) / 8.0) AS std
         |  FROM m),
         |words AS (
         |  SELECT user_id,
         |    CAST(${sym(0)} + 4 * ${sym(1)} + 16 * ${sym(2)}
         |         + 64 * ${sym(3)} AS BIGINT) AS word_id
         |  FROM s)
         |SELECT word_id, count(*) AS n_windows,
         |       count(DISTINCT user_id) AS n_users
         |FROM words GROUP BY word_id HAVING count(*) >= 2
         |ORDER BY word_id""".stripMargin
    },
    // q79's CTEs + widx, hot-word cap, exact z-norm verify (the
    // difference fold squares inside the reducer, matching Spark's
    // zip_with → aggregate structure)
    "q79b_ts_similarity" -> {
      def z(t: String, i: String) =
        s"(CASE WHEN $t.std = 0.0 THEN 0.0 " +
          s"ELSE ($t.arr[$i] - $t.mean) / $t.std END)"
      s"""WITH $dkSaxCandBase,
         |p AS (
         |  SELECT a.user_id AS user_a, a.widx AS widx_a,
         |         b.user_id AS user_b, b.widx AS widx_b,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(generate_series(1, 8),
         |        i -> ${z("a", "i")} - ${z("b", "i")})),
         |      (a, z) -> a + z * z) AS dist2
         |  FROM c a JOIN c b
         |    ON a.word_id = b.word_id AND a.user_id < b.user_id)
         |SELECT user_a, CAST(widx_a AS BIGINT) AS widx_a,
         |       user_b, CAST(widx_b AS BIGINT) AS widx_b,
         |       round(dist2, 6) AS dist2
         |FROM p WHERE dist2 <= $SaxDistTau2
         |ORDER BY user_a, widx_a, user_b, widx_b""".stripMargin
    },
    // q79b's candidate CTEs + the SAME 3-state banded-DTW fold
    // ([[duckDtwExpr]] — generated by the builder that emits Spark's)
    "q79c_ts_dtw" -> {
      def zl(t: String) =
        s"list_transform($t.arr, x -> CASE WHEN $t.std = 0.0 THEN 0.0 " +
          s"ELSE (x - $t.mean) / $t.std END)"
      s"""WITH $dkSaxCandBase,
         |p AS (
         |  SELECT a.user_id AS user_a, a.widx AS widx_a,
         |         b.user_id AS user_b, b.widx AS widx_b,
         |         ${zl("a")} AS za, ${zl("b")} AS zb
         |  FROM c a JOIN c b
         |    ON a.word_id = b.word_id AND a.user_id < b.user_id),
         |dp AS (
         |  SELECT user_a, widx_a, user_b, widx_b,
         |    $duckDtwExpr AS dtw2
         |  FROM p)
         |SELECT user_a, CAST(widx_a AS BIGINT) AS widx_a,
         |       user_b, CAST(widx_b AS BIGINT) AS widx_b,
         |       round(dtw2, 6) AS dtw2
         |FROM dp WHERE dtw2 <= $SaxDistTau2
         |ORDER BY user_a, widx_a, user_b, widx_b""".stripMargin
    },
    // the same two-frame closed form over the same total order; // and
    // div both truncate toward zero, exercised here on NEGATIVE totals
    "q80_cusum_drift" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
         |    CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events
         |  WHERE event_type = 'purchase' AND value IS NOT NULL),
         |w AS (
         |  SELECT user_id,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |                       ORDER BY ts_us, event_id) AS widx,
         |    sum(cents) OVER (PARTITION BY user_id) AS tot,
         |    count(*) OVER (PARTITION BY user_id) AS n,
         |    cents
         |  FROM ev),
         |k AS (SELECT *, CAST(tot // n AS BIGINT) AS k_cents,
         |             CAST(cents - tot // n AS BIGINT) AS dev FROM w),
         |r AS (
         |  SELECT *,
         |    sum(dev) OVER (PARTITION BY user_id ORDER BY widx
         |                   ROWS UNBOUNDED PRECEDING) AS p,
         |    CAST(sum(abs(dev)) OVER (PARTITION BY user_id) AS BIGINT) AS sad
         |  FROM k),
         |cu AS (
         |  SELECT *,
         |    CAST(p - least(0, min(p) OVER (PARTITION BY user_id
         |      ORDER BY widx ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS cusum
         |  FROM r),
         |a AS (
         |  SELECT *, (sad > 0 AND cusum * n >= $CusumH * sad) AS alarm
         |  FROM cu)
         |SELECT user_id, count(*) AS n_events,
         |  max(k_cents) AS k_cents,
         |  max(cusum) AS max_cusum,
         |  CAST(sum(CASE WHEN alarm THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
         |  min(CASE WHEN alarm THEN widx END) AS first_alarm
         |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q79b's candidate + verify CTEs, symmetrized, then the window-rank
    // formulation of top-k — agreement proves the bounded aggregator's
    // (−dist2 desc, packed-id asc) buffer ≡ (dist2 asc, user, widx) rank
    "q79d_ts_topk" -> {
      def z(t: String, i: String) =
        s"(CASE WHEN $t.std = 0.0 THEN 0.0 " +
          s"ELSE ($t.arr[$i] - $t.mean) / $t.std END)"
      s"""WITH $dkSaxCandBase,
         |p AS (
         |  SELECT a.user_id AS user_a, a.widx AS widx_a,
         |         b.user_id AS user_b, b.widx AS widx_b,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(generate_series(1, 8),
         |        i -> ${z("a", "i")} - ${z("b", "i")})),
         |      (a, z) -> a + z * z) AS dist2
         |  FROM c a JOIN c b
         |    ON a.word_id = b.word_id AND a.user_id < b.user_id),
         |p2 AS (
         |  SELECT user_a AS uq, widx_a AS wq, user_b AS um, widx_b AS wm,
         |         dist2 FROM p
         |  UNION ALL
         |  SELECT user_b, widx_b, user_a, widx_a, dist2 FROM p),
         |r AS (
         |  SELECT uq, wq, um, wm, dist2,
         |    ROW_NUMBER() OVER (PARTITION BY uq, wq
         |                       ORDER BY dist2, um, wm) AS rank
         |  FROM p2)
         |SELECT uq AS user_q, CAST(wq AS BIGINT) AS widx_q, rank,
         |       um AS user_m, CAST(wm AS BIGINT) AS widx_m,
         |       round(dist2, 6) AS dist2
         |FROM r WHERE rank <= $SaxTopK
         |ORDER BY user_q, widx_q, rank""".stripMargin
    },
    "q64b_profile_sketch" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
      val lcList = hllLcTable.mkString("[", ", ", "]")
      val base = cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  CAST(min($c) AS VARCHAR) AS min_str,
           |  CAST(max($c) AS VARCHAR) AS max_str
           |FROM lineitem""".stripMargin
      }.mkString("(", "\nUNION ALL\n", ")")
      val melt = cols.map { c =>
        s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM lineitem"
      }.mkString("(", "\nUNION ALL\n", ")")
      s"""WITH base AS $base,
         |m AS $melt,
         |h AS (
         |  SELECT col_name, ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
         |  FROM m WHERE v IS NOT NULL),
         |r AS (
         |  SELECT col_name, h % 1024 AS bucket,
         |    max(CAST(CASE WHEN (h // 1024) % 4294967296 = 0 THEN 33
         |             ELSE 33 - length(bin((h // 1024) % 4294967296)) END
         |        AS BIGINT)) AS rho
         |  FROM h GROUP BY col_name, bucket),
         |e AS (
         |  SELECT col_name,
         |    CAST(sum(1::BIGINT << CAST(33 - rho AS INT)) AS BIGINT)
         |      + (1024 - count(*)) * ${1L << 33} AS hll_denom,
         |    1024 - count(*) AS hll_empty
         |  FROM r GROUP BY col_name),
         |raw AS (
         |  SELECT col_name, hll_denom, hll_empty,
         |    (${1L << 53} // hll_denom) * 720541 // 1000000 AS est_raw
         |  FROM e)
         |SELECT b.col_name, b.n_rows, b.n_null, b.min_str, b.max_str,
         |  r.hll_denom, r.hll_empty, r.est_raw,
         |  CASE WHEN r.hll_empty > 0 AND r.est_raw <= 2560
         |       THEN ($lcList)[r.hll_empty]
         |       ELSE r.est_raw END AS est_distinct
         |FROM base b JOIN raw r USING (col_name)
         |ORDER BY col_name""".stripMargin
    },
    // independent algorithm: window-range join + plain COUNT DISTINCT
    "q65_rolling_distinct" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(ts::TIMESTAMP AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM e)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |       count(DISTINCT e.user_id) AS n_users_7d
        |FROM days d JOIN e ON date_diff('day', e.day, d.day) BETWEEN 0 AND 6
        |GROUP BY d.day ORDER BY day""".stripMargin,
    "q66_ntile_deciles" ->
      """WITH t AS (
        |  SELECT c_custkey, c_acctbal,
        |    ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        |  FROM customer)
        |SELECT decile, count(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal,
        |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin,
    "q67_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, median(value) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n,
        |  round(max(d.med), 4) AS median_value,
        |  round(max(m.mad), 4) AS mad_value,
        |  CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // both engines truncate weeks to ISO Monday
    "q68_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts::TIMESTAMP) AS DATE) AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY user_id),
        |s AS (SELECT cohort_wk, count(*) AS n_cohort FROM c GROUP BY cohort_wk),
        |r AS (
        |  SELECT c.cohort_wk, a.wk, count(DISTINCT a.user_id) AS n_active
        |  FROM a JOIN c USING (user_id) GROUP BY c.cohort_wk, a.wk)
        |SELECT strftime(r.cohort_wk, '%Y-%m-%d') AS cohort_week,
        |  date_diff('day', r.cohort_wk, r.wk) // 7 AS week_offset,
        |  r.n_active, s.n_cohort,
        |  (r.n_active * 10000) // s.n_cohort AS retention_bp
        |FROM r JOIN s USING (cohort_wk)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q69_cooccurrence" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |       count(*) AS support
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY a.l_partkey, b.l_partkey
        |HAVING count(*) >= 3
        |ORDER BY support DESC, part_a, part_b LIMIT 50""".stripMargin,
    "q70_markov_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts::TIMESTAMP, event_id) AS prev_type
        |  FROM events),
        |tr AS (
        |  SELECT prev_type AS from_type, event_type AS to_type
        |  FROM o WHERE prev_type IS NOT NULL),
        |cnt AS (SELECT from_type, to_type, count(*) AS n
        |        FROM tr GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, count(*) AS n_from
        |        FROM tr GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |       (c.n * 1000000) // t.n_from AS p_ppm
        |FROM cnt c JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "q71_hash_split" ->
      """WITH a AS (
        |  SELECT CASE
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
        |        THEN 'train'
        |      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
        |        THEN 'val'
        |      ELSE 'test' END AS split,
        |    lang,
        |    len(string_split_regex(trim(text), '\s+')) AS nt
        |  FROM documents)
        |SELECT split, lang, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM a GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q72_mixture_plan" ->
      """WITH w(lang, target_ppm) AS (VALUES
        |    ('en', CAST(300000 AS BIGINT)), ('zh', 200000), ('fr', 200000),
        |    ('de', 150000), ('es', 150000)),
        |toks AS (
        |  SELECT lang,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS lang_tokens
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens
        |        FROM toks),
        |base AS (
        |  SELECT t.lang, t.lang_tokens, w.target_ppm,
        |    (total_tokens // 2) AS budget
        |  FROM toks t JOIN w USING (lang) CROSS JOIN tot),
        |alloc AS (
        |  SELECT lang, lang_tokens, target_ppm,
        |    (budget // 1000000) * target_ppm
        |      + ((budget % 1000000) * target_ppm) // 1000000 AS alloc_tokens
        |  FROM base)
        |SELECT lang, lang_tokens, target_ppm, alloc_tokens,
        |  (alloc_tokens * 10000) // lang_tokens AS epochs_bp
        |FROM alloc ORDER BY lang""".stripMargin,
    "q93_waterfill_mixture" -> {
      val rounds = dkWaterfillRounds("lang, lang_tokens")
      s"""WITH w(lang, target_ppm) AS (VALUES
         |    ('en', CAST(300000 AS BIGINT)), ('zh', 200000), ('fr', 200000),
         |    ('de', 150000), ('es', 150000)),
         |toks AS (
         |  SELECT lang,
         |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
         |      AS lang_tokens
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens
         |        FROM toks),
         |s0 AS (
         |  SELECT t.lang, t.lang_tokens, w.target_ppm,
         |    (total_tokens * 3) // 2 AS budget,
         |    lang_tokens * 2 AS cap_tokens,
         |    CAST(0 AS BIGINT) AS capped_round,
         |    CAST(0 AS BIGINT) AS alloc_tokens
         |  FROM toks t JOIN w USING (lang) CROSS JOIN tot),
         |$rounds,
         |ta AS (SELECT CAST(sum(alloc_tokens) AS BIGINT) AS total_alloc
         |       FROM s5)
         |SELECT lang, lang_tokens, target_ppm, cap_tokens, capped_round,
         |  alloc_tokens,
         |  (alloc_tokens * 10000) // lang_tokens AS epochs_bp,
         |  (alloc_tokens * 1000000) // total_alloc AS realized_ppm,
         |  budget AS budget_tokens,
         |  budget - total_alloc AS leftover_tokens
         |FROM s5, ta ORDER BY lang""".stripMargin
    },
    "q73_stratified_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), doc_id)
        |      AS rank
        |  FROM documents)
        |SELECT lang, rank, doc_id FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,
    "q75_attribution" -> dkAttribution,
    "q77_ivm_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q76_decay_score" ->
      """WITH ref AS (SELECT max(ts)::TIMESTAMP AS ref_ts FROM events),
        |e AS (
        |  SELECT user_id,
        |    least(date_diff('day', (ts::TIMESTAMP)::DATE, ref_ts::DATE) // 7,
        |          62) AS age_weeks,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events CROSS JOIN ref)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(cents) AS BIGINT) AS raw_cents,
        |  CAST(SUM(cents >> age_weeks) AS BIGINT) AS decayed_cents
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q74_approx_quantile_eval" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS n,
        |  MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN l_quantity END)
        |    AS p50_exact,
        |  MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN l_quantity END)
        |    AS p90_exact,
        |  MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN l_quantity END)
        |    AS p99_exact,
        |  TRUE AS ok50, TRUE AS ok90, TRUE AS ok99
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // single-pass GLOBAL form of the per-distinct-price skyline — the
    // Spark side runs the bucketed two-phase decomposition; agreement
    // proves local pruning exact
    "q82_pareto_skyline" ->
      """WITH pts AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_extendedprice AS price, l_quantity AS qty
        |  FROM lineitem),
        |perx AS (SELECT price, max(qty) AS bestq FROM pts GROUP BY price),
        |m AS (
        |  SELECT price, bestq,
        |    max(bestq) OVER (ORDER BY price
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
        |  FROM perx)
        |SELECT p.l_orderkey, p.l_linenumber, p.price, p.qty
        |FROM pts p JOIN m USING (price)
        |WHERE NOT (coalesce(m.best_prev >= p.qty, false) OR m.bestq > p.qty)
        |ORDER BY p.price, p.qty, p.l_orderkey, p.l_linenumber""".stripMargin,
    "q83_rolling_mad" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type = 'purchase' AND value IS NOT NULL),
        |w AS (
        |  SELECT user_id, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS widx,
        |    list_sort(list(cents) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM ev),
        |s1 AS (
        |  SELECT user_id, widx, cents, len(arr) AS n, arr,
        |    arr[CAST((len(arr)+1) // 2 AS INT)]
        |      + arr[CAST((len(arr)+2) // 2 AS INT)] AS med2
        |  FROM w),
        |s2 AS (
        |  SELECT user_id, widx, cents, n, med2,
        |    list_sort(list_transform(arr, v -> abs(2*v - med2))) AS devs
        |  FROM s1),
        |s3 AS (
        |  SELECT user_id, widx, cents, n, med2,
        |    devs[CAST((n+1) // 2 AS INT)] + devs[CAST((n+2) // 2 AS INT)] AS mad4
        |  FROM s2),
        |s4 AS (
        |  SELECT user_id, widx, cents, n, med2, mad4,
        |    CASE WHEN mad4 = 0 THEN NULL
        |         ELSE ((2*cents - med2) * 2000000) // mad4 END AS score_ppm
        |  FROM s3)
        |SELECT user_id, widx, cents, n, med2, mad4, score_ppm,
        |  coalesce(abs(score_ppm) >= 3500000, false) AS outlier
        |FROM s4 ORDER BY user_id, widx""".stripMargin,
    "q84_kmv_jaccard" ->
      """WITH u AS (
        |  SELECT DISTINCT event_type AS et,
        |    user_id * 100000
        |      + date_diff('day', DATE '1970-01-01', ts::DATE) AS user_id
        |  FROM events),
        |uh AS (
        |  SELECT et, user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM u),
        |sk AS (
        |  SELECT et, h FROM (
        |    SELECT et, h,
        |      ROW_NUMBER() OVER (PARTITION BY et ORDER BY h, user_id) AS rn
        |    FROM uh) WHERE rn <= 256),
        |tp AS (SELECT DISTINCT et FROM sk),
        |tpp AS (SELECT a.et AS et_a, b.et AS et_b
        |        FROM tp a JOIN tp b ON a.et < b.et),
        |fan AS (
        |  SELECT t.et_a, t.et_b, s.h,
        |    max(CASE WHEN s.et = t.et_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN s.et = t.et_b THEN 1 ELSE 0 END) AS in_b
        |  FROM sk s JOIN tpp t ON s.et = t.et_a OR s.et = t.et_b
        |  GROUP BY t.et_a, t.et_b, s.h),
        |est AS (
        |  SELECT et_a, et_b, count(*) AS k_eff,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS n_both
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY et_a, et_b
        |          ORDER BY h) AS rn FROM fan)
        |  WHERE rn <= 256 GROUP BY et_a, et_b),
        |ex AS (
        |  SELECT t.et_a, t.et_b, u2.user_id,
        |    max(CASE WHEN u2.et = t.et_a THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN u2.et = t.et_b THEN 1 ELSE 0 END) AS in_b
        |  FROM u u2 JOIN tpp t ON u2.et = t.et_a OR u2.et = t.et_b
        |  GROUP BY t.et_a, t.et_b, u2.user_id),
        |ex2 AS (
        |  SELECT et_a, et_b, count(*) AS n_union,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS n_inter
        |  FROM ex GROUP BY et_a, et_b)
        |SELECT e.et_a, e.et_b, e.k_eff, e.n_both,
        |  (e.n_both * 1000000) // e.k_eff AS est_ppm,
        |  x.n_union, x.n_inter,
        |  (x.n_inter * 1000000) // x.n_union AS exact_ppm,
        |  (e.n_both * 1000000) // e.k_eff
        |    - (x.n_inter * 1000000) // x.n_union AS err_ppm
        |FROM est e JOIN ex2 x USING (et_a, et_b)
        |ORDER BY et_a, et_b""".stripMargin,
    // same md5 cell addressing as q55; sum(BIGINT) widens to HUGEINT in
    // DuckDB, so the inner product is CAST back to BIGINT
    "q85_join_size_estimate" ->
      """WITH rws AS (SELECT i FROM (VALUES (0),(1),(2),(3)) AS r(i)),
        |sa AS (
        |  SELECT r.i AS rw,
        |         ('0x' || substr(md5(CAST(r.i AS VARCHAR) || '|' ||
        |            CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 512
        |           AS bucket,
        |         count(*) AS cnt
        |  FROM orders, rws r GROUP BY 1, 2),
        |sb AS (
        |  SELECT r.i AS rw,
        |         ('0x' || substr(md5(CAST(r.i AS VARCHAR) || '|' ||
        |            CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT % 512
        |           AS bucket,
        |         count(*) AS cnt
        |  FROM lineitem, rws r GROUP BY 1, 2),
        |est AS (
        |  SELECT a.rw, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS est_rows
        |  FROM sa a JOIN sb b ON a.rw = b.rw AND a.bucket = b.bucket
        |  GROUP BY a.rw),
        |tr AS (SELECT count(*) AS true_rows
        |       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
        |SELECT e.rw, e.est_rows, t.true_rows,
        |       (e.est_rows * 10000) // t.true_rows AS ratio_bp
        |FROM est e CROSS JOIN tr t
        |ORDER BY rw""".stripMargin,
    // BOTH levels computed directly from rows (no merge step) — agreement
    // with the Spark side's merge-from-fine-registers path is the
    // mergeability proof
    "q86_hll_rollup" ->
      """WITH h AS (
        |  SELECT l_returnflag AS grp,
        |    ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem),
        |r AS (
        |  SELECT grp, h % 1024 AS bucket,
        |    max(CAST(CASE WHEN h // 1024 = 0 THEN 51
        |             ELSE 51 - length(bin(h // 1024)) END AS BIGINT))
        |      AS max_rho
        |  FROM h GROUP BY grp, bucket),
        |g AS (
        |  SELECT 'ALL' AS grp, h % 1024 AS bucket,
        |    max(CAST(CASE WHEN h // 1024 = 0 THEN 51
        |             ELSE 51 - length(bin(h // 1024)) END AS BIGINT))
        |      AS max_rho
        |  FROM h GROUP BY 1, 2)
        |SELECT grp, bucket, max_rho FROM r
        |UNION ALL SELECT grp, bucket, max_rho FROM g
        |ORDER BY grp, bucket""".stripMargin,
    "q87_skew_report" ->
      """WITH c AS (
        |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, count(*) AS k FROM c),
        |top AS (SELECT l_partkey, cnt FROM c
        |        ORDER BY cnt DESC, l_partkey LIMIT 5)
        |SELECT top.l_partkey, top.cnt, t.n, t.k,
        |       (top.cnt * 10000) // t.n AS share_bp,
        |       (top.cnt * t.k * 10000) // t.n AS x_avg_bp,
        |       (top.cnt * t.k + t.n - 1) // t.n AS rec_salt
        |FROM top CROSS JOIN t
        |ORDER BY cnt DESC, l_partkey""".stripMargin,
    "q88_log2_quantiles" ->
      """WITH v AS (SELECT greatest(n_chars, 1) AS v FROM documents),
        |hb AS (SELECT CAST(length(bin(v)) AS BIGINT) AS b, count(*) AS cnt
        |       FROM v GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hb),
        |cumt AS (SELECT b, sum(cnt) OVER (ORDER BY b) AS cum FROM hb),
        |qs AS (SELECT q FROM (VALUES (50),(90),(99)) AS x(q)),
        |rk AS (SELECT q, (t.n * q + 99) // 100 AS rank FROM qs CROSS JOIN t),
        |pick AS (SELECT rk.q, rk.rank, min(c.b) AS bucket
        |         FROM rk JOIN cumt c ON c.cum >= rk.rank GROUP BY 1, 2),
        |ordr AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |ex AS (SELECT rk.q, o.v AS exact_val
        |       FROM rk JOIN ordr o ON o.rn = rk.rank)
        |SELECT p.q, p.bucket,
        |       (1::BIGINT << (CAST(p.bucket AS INT) - 1)) AS est_lo,
        |       (1::BIGINT << CAST(p.bucket AS INT)) - 1 AS est_hi,
        |       e.exact_val
        |FROM pick p JOIN ex e USING (q)
        |ORDER BY q""".stripMargin,
    "q89_priority_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source, greatest(n_chars, 1) AS w,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source, w, h // w AS prio,
        |         CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS tot_w,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY h // w, doc_id) AS BIGINT) AS rn
        |  FROM d)
        |SELECT source, rn, doc_id, w, prio,
        |       (w * 10000) // tot_w AS w_share_bp
        |FROM p WHERE rn <= 8
        |ORDER BY source, rn""".stripMargin,
    // the full join on the full tables — agreement with the Spark side's
    // old ∪ three-delta-join union proves the IVM delta rule
    "q90_ivm_join" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment,
        |       o.o_totalprice
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    "q91_range_plan" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice AS v
        |  FROM lineitem),
        |hs AS (
        |  SELECT li.*, ('0x' || substr(md5(l_orderkey || '_'
        |          || l_linenumber), 1, 15))::BIGINT AS h FROM li),
        |smp AS (
        |  SELECT v, l_orderkey, l_linenumber FROM (
        |    SELECT v, l_orderkey, l_linenumber,
        |      ROW_NUMBER() OVER (PARTITION BY h % 32
        |        ORDER BY h, l_orderkey, l_linenumber, v) AS brn
        |    FROM hs) WHERE brn <= 20),
        |rk AS (
        |  SELECT v, ROW_NUMBER() OVER (
        |    ORDER BY v, l_orderkey, l_linenumber) AS rn FROM smp),
        |ns AS (SELECT CAST(max(rn) AS BIGINT) AS ns FROM rk),
        |pos AS (
        |  SELECT g.i, (g.i * ns.ns) // 32 AS pos
        |  FROM (SELECT unnest(generate_series(1, 31)) AS i) g, ns),
        |bounds AS (
        |  SELECT p.i, rk.v AS bval FROM pos p
        |  JOIN rk ON rk.rn = p.pos WHERE p.pos >= 1),
        |asg AS (
        |  SELECT li.v,
        |    (SELECT count(*) FROM bounds b WHERE b.bval < li.v) AS pid
        |  FROM li),
        |tot AS (SELECT count(*) AS n FROM li)
        |SELECT pid, CAST(count(*) AS BIGINT) AS cnt,
        |  round(min(v), 2) AS vmin, round(max(v), 2) AS vmax,
        |  (CAST(count(*) AS BIGINT) * 32 * 10000) // t.n AS x_avg_bp
        |FROM asg, tot t GROUP BY pid, t.n ORDER BY pid""".stripMargin,
    // both boundary sets derived from scratch (old: base slice; new:
    // FULL table) — the Spark side derives `new` by merging persisted
    // reservoirs, so row-for-row agreement proves the merge identity
    "q94_boundary_refresh" -> {
      def chain(p: String, where: String) =
        s"""${p}li AS (
           |  SELECT l_orderkey, l_linenumber, l_extendedprice AS v
           |  FROM lineitem $where),
           |${p}hs AS (
           |  SELECT ${p}li.*, ('0x' || substr(md5(l_orderkey || '_'
           |          || l_linenumber), 1, 15))::BIGINT AS h FROM ${p}li),
           |${p}smp AS (
           |  SELECT v, l_orderkey, l_linenumber FROM (
           |    SELECT v, l_orderkey, l_linenumber,
           |      ROW_NUMBER() OVER (PARTITION BY h % 32
           |        ORDER BY h, l_orderkey, l_linenumber, v) AS brn
           |    FROM ${p}hs) WHERE brn <= 20),
           |${p}rk AS (
           |  SELECT v, ROW_NUMBER() OVER (
           |    ORDER BY v, l_orderkey, l_linenumber) AS rn FROM ${p}smp),
           |${p}ns AS (SELECT CAST(max(rn) AS BIGINT) AS ns FROM ${p}rk),
           |${p}pos AS (
           |  SELECT g.i, (g.i * ns.ns) // 32 AS pos
           |  FROM (SELECT unnest(generate_series(1, 31)) AS i) g,
           |    ${p}ns ns),
           |${p}bounds AS (
           |  SELECT p2.i, ${p}rk.v AS bval FROM ${p}pos p2
           |  JOIN ${p}rk ON ${p}rk.rn = p2.pos WHERE p2.pos >= 1)"""
      // chain() keeps its |-margins: ONLY the outer stripMargin runs —
      // double-stripping would re-clip lines that begin with `||`
      s"""WITH cutv AS (
         |  SELECT ((max(l_orderkey) + 1) * 4) // 5 AS c FROM lineitem),
         |${chain("o", "WHERE l_orderkey < (SELECT c FROM cutv)")},
         |${chain("n", "")},
         |asg AS (
         |  SELECT li.v,
         |    (SELECT count(*) FROM nbounds b WHERE b.bval < li.v) AS pid,
         |    (SELECT count(*) FROM obounds b WHERE b.bval < li.v)
         |      AS old_pid
         |  FROM nli li)
         |SELECT pid, CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(CASE WHEN pid <> old_pid THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_moved,
         |  CAST(sum(CASE WHEN pid <> old_pid THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS moved_bp
         |FROM asg GROUP BY pid ORDER BY pid""".stripMargin
    },
    "q92_block_audit" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS dc,
        |    l_orderkey // 32 AS blk
        |  FROM lineitem),
        |smp AS (
        |  SELECT * FROM li
        |  WHERE ('0x' || substr(md5('blk|' || blk), 1, 15))::BIGINT % 4 = 0
        |    AND ('0x' || substr(md5('row|' || l_orderkey || '_'
        |          || l_linenumber), 1, 15))::BIGINT % 2 = 0),
        |est AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows_sampled,
        |         CAST(sum(dc) * 8 AS BIGINT) AS est_dc FROM smp),
        |tr AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(sum(dc) AS BIGINT) AS true_dc,
        |         CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks FROM li)
        |SELECT tr.n_blocks, tr.n_rows, est.n_rows_sampled,
        |  est.est_dc, tr.true_dc,
        |  abs(est.est_dc - tr.true_dc) * 10000 // tr.true_dc AS err_bp
        |FROM est, tr""".stripMargin
  )
}
