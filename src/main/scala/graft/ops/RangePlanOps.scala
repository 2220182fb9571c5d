package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample-based range-partition planning — the RangePartitioner
  * primitive behind every 100 TB global sort / repartitionByRange /
  * sorted-parquet write, with the sample volume BOUNDED by construction
  * (the round-8 q91 defect: a fixed 1-in-20 rate sample grows with the
  * table and then funnels through one un-partitioned global-rank task —
  * ~5 TB through a single partition at 100 TB, in the exact operator
  * whose job is to plan around stragglers).
  *
  * Count-targeted two-stage order statistic instead:
  *
  *  1. STRATIFIED BOUNDED RESERVOIR — every row hashes (md5, the engine's
  *     deterministic sampler) into one of [[SampleBuckets]] strata; each
  *     stratum keeps its [[PerBucket]] smallest-hash rows. The hash is
  *     independent of the value, so the kept set is a uniform random
  *     sample of FIXED size ≤ SampleBuckets·PerBucket (=640) no matter
  *     how large the table is — the SQL form of RangePartitioner's
  *     per-partition reservoir, but deterministic and engine-replayable
  *     (Spark partition ids never appear, so DuckDB derives the same
  *     sample from the same bytes).
  *  2. GLOBAL RANK over ≤640 survivors → P−1 order-statistic boundaries.
  *
  * The rank-≤-k filter over the bucketed window compiles to
  * WindowGroupLimit (plan-guarded): each map task keeps only the top
  * PerBucket rows per stratum BEFORE the exchange, so the shuffle moves
  * ≤ tasks·buckets·PerBucket rows and the per-stratum final sort sees
  * ≤ tasks·PerBucket — never a data-sized sort. The un-partitioned
  * global-rank Window runs on the ≤640-row union only. At 100 TB with
  * finer targets, scale SampleBuckets (more strata = more parallel
  * top-k's), never PerBucket×table-rate.
  */
object RangePlanOps {

  /** Sample strata (hash buckets) — boundaries come from a sample of
    * ≤ SampleBuckets·PerBucket rows total. */
  val SampleBuckets = 32L

  /** Bounded rows kept per stratum (smallest md5 order). */
  val PerBucket = 20

  /** The bounded, globally-ranked boundary sample over rows
    * (l_orderkey, l_linenumber, v): ≤ [[SampleBuckets]]·[[PerBucket]]
    * rows with a total-order rank `rn` by (v, key). */
  def boundedRankedSample(li: DataFrame): DataFrame = {
    val h = TextOps.hash60(concat(col("l_orderkey").cast("string"),
      lit("_"), col("l_linenumber").cast("string")))
    li.withColumn("h", h)
      .withColumn("bkt", col("h") % SampleBuckets)
      .withColumn("brn", row_number().over(
        Window.partitionBy(col("bkt"))
          // v as the last tie-break: (l_orderkey, l_linenumber) is NOT
          // unique in the synthetic corpus, and a non-total order here
          // lets each engine reservoir a different duplicate's value
          .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"),
            col("v"))))
      .filter(col("brn") <= PerBucket)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))))
  }

  /** P−1 ascending order-statistic boundaries from the bounded sample —
    * the driver collect is exactly P−1 doubles (the n6-centroid
    * discipline). */
  def planBoundaries(s: SparkSession, li: DataFrame, p: Int): Seq[Double] =
    boundariesFromRanked(s, boundedRankedSample(li), p)

  /** Boundary extraction from an already-ranked sample (shared by the
    * one-shot planner and the q94 delta refresh). */
  def boundariesFromRanked(s: SparkSession, sample: DataFrame,
      p: Int): Seq[Double] = {
    val ranked = sample.transform(graft.Tables.stage)
    val ns = ranked.agg(max(col("rn")).as("ns"))
    s.range(1, p).toDF("i").crossJoin(broadcast(ns))
      .select(col("i"), expr(s"(i * ns) div $p").as("pos"))
      .filter(col("pos") >= 1)
      .join(ranked, col("pos") === col("rn"))
      .orderBy(col("i"))
      .select(col("v")).collect().map(_.getDouble(0)).toSeq
  }

  /** Reservoir MERGE — the boundary-refresh IVM primitive: per-stratum
    * smallest-k-by-hash is MERGEABLE (top-k of a union = top-k of the
    * per-side top-k's), so a delta refresh re-derives boundaries from
    * two persisted ≤640-row samples and never rescans the base table.
    * Agreement with the from-scratch full-table derivation is q94's
    * oracle-proven contract. */
  def mergeRankedSamples(a: DataFrame, b: DataFrame): DataFrame = {
    val keep = Seq("h", "bkt", "l_orderkey", "l_linenumber", "v")
      .map(col)
    a.select(keep: _*).union(b.select(keep: _*))
      .withColumn("brn", row_number().over(
        Window.partitionBy(col("bkt"))
          .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"),
            col("v"))))
      .filter(col("brn") <= PerBucket)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))))
  }

  /** Range-partition id under ascending `bounds`: count of boundaries
    * strictly below v — the literal-probe (binary-search-equivalent)
    * assignment shared by the batch planner and the streaming router. */
  def pidColumn(bounds: Seq[Double])(v: Column): Column =
    size(filter(typedLit(bounds), b => b < v)).cast("long")

  /** EXACT global rank without a single-partition sort — the scale-safe
    * replacement for `row_number().over(Window.orderBy(v, key))` (the
    * q66/t38d shape the q91 discipline exists to kill):
    *
    *  1. bounded stratified reservoir over the table (≤640 rows, the
    *     [[boundedRankedSample]] machinery) — runs at PLAN time,
    *  2. `p−1` sampled order-statistic boundaries become literals,
    *  3. literal-probe range id (count of boundaries strictly < v),
    *  4. per-range local `row_number` (hash-partitioned window on the
    *     range id — each task sorts ~|rows|/p, never the table),
    *  5. global rank = local rank + per-range offsets (a ≤p-row count
    *     frame, prefix-summed and broadcast).
    *
    * CORRECTNESS does not depend on sample quality — only balance
    * does: assignment uses strict `<` on v alone, so rows with equal v
    * can never split across ranges, ranges are monotone in v, and the
    * within-range order is the caller's full (v, key) total order;
    * offset + local is therefore the exact global rank for ANY
    * boundary set. The boundary probe casts v to double — safe because
    * long→double is monotone (collisions above 2^53 merge ranges, never
    * split ties). `key` must make (v, key) a total order, and `v` must
    * be NON-NULL on every row: the boundary collect reads sampled v
    * values with getDouble (a NULL would NPE at plan-build time), and
    * the strict-< probe has no defined NULL range — callers with
    * nullable measures must coalesce/filter first (current callers
    * pass c_acctbal, greatest(n_chars,1), margin_ppm — all non-null
    * by construction). */
  def globalRank(df: DataFrame, v: Column, key: Column, p: Int,
      tag: String, rankCol: String): DataFrame = {
    val s = df.sparkSession
    val vd = v.cast("double")
    val samp = df.select(vd.as("__v"), key.cast("string").as("__k"))
      .withColumn("__h", TextOps.hash60(concat(lit(tag + "|"), col("__k"))))
      .withColumn("__b", col("__h") % SampleBuckets)
      .withColumn("__brn", row_number().over(
        Window.partitionBy(col("__b"))
          .orderBy(col("__h"), col("__k"), col("__v"))))
      .filter(col("__brn") <= PerBucket)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("__v"), col("__k"))))
      .transform(graft.Tables.stage)
    val ns = samp.agg(max(col("rn")).as("ns"))
    val bounds = s.range(1, p.toLong).toDF("i").crossJoin(broadcast(ns))
      .select(col("i"), expr(s"(i * ns) div $p").as("pos"))
      .filter(col("pos") >= 1)
      .join(samp, col("pos") === col("rn"))
      .orderBy(col("i"))
      .select(col("__v")).collect().map(_.getDouble(0)).toSeq.distinct
    val pidded = df.withColumn("__pid", pidColumn(bounds)(vd))
    val local = pidded.withColumn("__lrn",
      row_number().over(
        Window.partitionBy(col("__pid")).orderBy(v, key)).cast("long"))
    val offs = pidded.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), "__pid")
      .withColumn(rankCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
  }
}
