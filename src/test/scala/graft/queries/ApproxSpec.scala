package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Sketch aggregates aren't cross-engine comparable, so they're asserted
  * here against exact answers instead of the DuckDB oracle. */
class ApproxSpec extends SparkSpecBase {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Tables.lineitem(spark, sfDir)
    val (exact, approx) = li.select(
      countDistinct(col("l_orderkey")).cast("double"),
      approx_count_distinct(col("l_orderkey"), 0.02).cast("double"))
      .as[(Double, Double)].collect()(0)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL registers estimate distinct keys and merge associatively") {
    val m = 1024
    def registers(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(graft.ops.TextOps.hash60(col("l_orderkey")).as("h"))
        .selectExpr("h % 1024 AS bucket", "h DIV 1024 AS w")
        .selectExpr("bucket",
          "CAST(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS BIGINT) AS rho")
        .groupBy(col("bucket")).agg(max(col("rho")).as("max_rho"))
        .as[(Long, Long)].collect().toMap
    // standard HLL estimator with small-range (linear counting) correction
    def estimate(regs: Map[Long, Long]): Double = {
      val alpha = 0.7213 / (1 + 1.079 / m)
      val z = (0 until m).map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
      val raw = alpha * m * m / z
      val zeros = m - regs.size
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
    }
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_orderkey"))).as[Long].collect()(0)
    val est = estimate(registers(li))
    assert(math.abs(est - exact) / exact < 0.10, s"est=$est exact=$exact")
    // mergeability: sketch(halfA) ∪max sketch(halfB) == sketch(all) —
    // the property that makes the register table a cross-shard /
    // streaming-state sketch rather than a one-shot aggregate
    val a = registers(li.filter(col("l_orderkey") % 2 === 0))
    val b = registers(li.filter(col("l_orderkey") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
    assert(merged == registers(li), "per-bucket max merge must equal the full sketch")
    // cross-check the oracle-gated query produces the same registers
    val viaQuery = graft.queries.RelationalQueries
      .queries("q51_hll_registers")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(viaQuery == registers(graft.Tables.fanout(li)))
  }

  test("KMV bottom-k estimates distinct keys and merges by concatenation") {
    val k = 256
    val li = Tables.lineitem(spark, sfDir)
    def kmv(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(graft.ops.TextOps.hash60(col("l_orderkey")).as("h"))
        .distinct().orderBy(col("h")).limit(k).as[Long].collect().toSeq
    val full = kmv(li)
    val exact = li.select(countDistinct(col("l_orderkey"))).as[Long].collect()(0)
    if (full.size == k) {
      // (k-1) * 2^60 / h_k — h_k is the k-th smallest 60-bit hash
      val est = (k - 1).toDouble * math.pow(2.0, 60) / full.last.toDouble
      assert(math.abs(est - exact) / exact < 0.20, s"est=$est exact=$exact")
    } else {
      // fewer distinct keys than k: the sketch IS the exact distinct set
      assert(full.size == exact)
    }
    // merge = bottom-k of concatenated sketches
    val a = kmv(li.filter(col("l_orderkey") % 2 === 0))
    val b = kmv(li.filter(col("l_orderkey") % 2 =!= 0))
    assert((a ++ b).distinct.sorted.take(k) == full)
    // the oracle-gated query agrees (it also carries a representative key)
    val viaQuery = graft.queries.RelationalQueries
      .queries("q52_kmv_sample")(spark, sfDir)
      .select(col("h")).as[Long].collect().toSeq
    assert(viaQuery == kmv(graft.Tables.fanout(li)))
  }

  test("streaming HLL registers equal the batch sketch after all batches") {
    // the register table is streaming STATE: groupBy(bucket).max(rho) in
    // complete mode maintains the sketch incrementally; after any prefix
    // of batches the table equals the batch sketch of the rows seen
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val regs = in.toDF().toDF("key")
      .select(graft.ops.TextOps.hash60(col("key")).as("h"))
      .selectExpr("h % 1024 AS bucket", "h DIV 1024 AS w")
      .selectExpr("bucket",
        "CAST(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS BIGINT) AS rho")
      .groupBy(col("bucket")).agg(max(col("rho")).as("max_rho"))
    val q = regs.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("hll_stream").start()
    def batchRegs(keys: Seq[Long]): Map[Long, Long] =
      keys.toDF("key")
        .select(graft.ops.TextOps.hash60(col("key")).as("h"))
        .selectExpr("h % 1024 AS bucket", "h DIV 1024 AS w")
        .selectExpr("bucket",
          "CAST(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END AS BIGINT) AS rho")
        .groupBy(col("bucket")).agg(max(col("rho")).as("max_rho"))
        .as[(Long, Long)].collect().toMap
    try {
      val b1 = (1L to 500L).toSeq
      val b2 = (300L to 900L).toSeq // overlaps b1: max-merge must dedupe
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(spark.table("hll_stream").as[(Long, Long)].collect().toMap
        == batchRegs(b1))
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(spark.table("hll_stream").as[(Long, Long)].collect().toMap
        == batchRegs(b1 ++ b2))
    } finally q.stop()
  }

  test("CMS never undercounts, errs within bound, and merges by cell sum") {
    import graft.ops.SketchOps
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey"))
    val n = li.count()
    val sketch = SketchOps.cmsSketch(li, "l_partkey")
    val truth = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("true_cnt"))
    val est = SketchOps.cmsLookup(sketch, truth, "l_partkey")
      .as[(Long, Long, Long)].collect()
    assert(est.nonEmpty)
    // one-sided error: min over rows of a cell that contains the key's own
    // count plus non-negative collision mass can never undercount
    assert(est.forall { case (_, t, e) => e >= t },
      "CMS must never undercount")
    // collision mass per cell averages N/width; min over Depth independent
    // rows stays well under a loose 5×N/width for every key
    val bound = 5.0 * n / SketchOps.CmsWidth
    assert(est.forall { case (_, t, e) => (e - t) <= bound },
      s"overcount exceeded ${bound}")
    // mergeability: cell-wise sum of two shard sketches == full sketch
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      SketchOps.cmsSketch(df, "l_partkey")
        .as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => ((r.toLong, b), c) }.toMap
    val a = cells(li.filter(col("l_partkey") % 2 === 0))
    val b = cells(li.filter(col("l_partkey") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == cells(li), "cell-wise sum merge must equal full sketch")
  }

  test("CMS inner product over-estimates join cardinality and merges by cell sum") {
    import graft.ops.SketchOps
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"))
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("k"))
    val truth = o.join(li, "k").count()
    val ests = SketchOps.cmsInnerProduct(
        SketchOps.cmsSketch(o, "k"), SketchOps.cmsSketch(li, "k"))
      .as[(Int, Long)].collect().toMap
    assert(ests.size == SketchOps.CmsDepth)
    // every hash row over-estimates (collisions only ADD cross terms)
    assert(ests.values.forall(_ >= truth), s"under-estimate: $ests vs $truth")
    // min over rows is within the loose CMS additive bound 5·|A|·|B|/width
    val bound = truth + 5.0 * o.count() * li.count() / SketchOps.CmsWidth
    assert(ests.values.min <= bound, s"min=${ests.values.min} bound=$bound")
    // merge law: estimating from shard-summed sketches == whole-input sketch
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      SketchOps.cmsSketch(df, "k").as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => ((r.toLong, b), c) }.toMap
    val a = cells(li.filter(col("k") % 2 === 0))
    val b = cells(li.filter(col("k") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == cells(li))
  }

  test("log2 quantile sketch brackets the exact order statistic at every decile") {
    // the q88 readout at finer granularity: for each q, the exact q-th
    // order statistic must land inside the chosen bucket's [2^(b-1), 2^b-1]
    val docs = Tables.documents(spark, sfDir)
      .select(greatest(col("n_chars"), lit(1L)).as("v"))
    val n = docs.count()
    val hist = docs.selectExpr("CAST(length(bin(v)) AS BIGINT) AS b")
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val sorted = docs.as[Long].collect().sorted
    for (q <- 10 to 99 by 10) {
      val rank = (n * q + 99) / 100
      var cum = 0L
      val bucket = hist.collectFirst {
        case (b, c) if { cum += c; cum >= rank } => b
      }.get
      val exact = sorted((rank - 1).toInt)
      val lo = 1L << (bucket - 1).toInt
      val hi = (1L << bucket.toInt) - 1
      assert(exact >= lo && exact <= hi,
        s"q=$q exact=$exact outside bucket $bucket [$lo,$hi]")
    }
  }

  test("streaming CMS cells equal the batch sketch after each batch") {
    // like the streaming-HLL test but sum-merged: groupBy(rw,bucket).count
    // in complete mode maintains the frequency sketch as streaming state
    import graft.ops.SketchOps
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val sketch = SketchOps.cmsSketch(in.toDF().toDF("key"), "key")
    val q = sketch.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("cms_stream").start()
    def batchCells(keys: Seq[Long]): Map[(Int, Long), Long] =
      SketchOps.cmsSketch(keys.toDF("key"), "key")
        .as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => ((r, b), c) }.toMap
    def stateCells(): Map[(Int, Long), Long] =
      spark.table("cms_stream").as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => ((r, b), c) }.toMap
    try {
      val b1 = (1L to 300L) ++ (1L to 100L) // repeats: counts, not distincts
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(stateCells() == batchCells(b1))
      val b2 = (250L to 600L).toSeq
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(stateCells() == batchCells(b1 ++ b2))
    } finally q.stop()
  }

  test("streaming bitmap distinct: OR-merged cells stay exact per batch") {
    // q57's block bitmaps as streaming state: groupBy(blk).bit_or in
    // complete mode — the OR absorbs duplicate keys across batches, so the
    // popcount readout is an EXACT running distinct count (HLL's streaming
    // form approximates; this one doesn't, for dense bounded keyspaces)
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val cells = in.toDF().toDF("key")
      .selectExpr("key div 64 AS blk",
        "shiftleft(CAST(1 AS BIGINT), CAST(key % 64 AS INT)) AS mask")
      .groupBy(col("blk")).agg(bit_or(col("mask")).as("bits"))
    val q = cells.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("bitmap_stream").start()
    def distinctFromState(): Long =
      spark.table("bitmap_stream")
        .select(sum(bit_count(col("bits")).cast("long"))).as[Long].collect()(0)
    try {
      val b1 = (1L to 500L) ++ (100L to 200L) // repeats within the batch
      in.addData(b1: _*); q.processAllAvailable()
      assert(distinctFromState() == b1.distinct.size)
      val b2 = (450L to 900L).toSeq // overlaps b1: OR must dedupe
      in.addData(b2: _*); q.processAllAvailable()
      assert(distinctFromState() == (b1 ++ b2).distinct.size)
    } finally q.stop()
  }

  test("streaming rolling 7-day distinct: windowed bitmap union stays exact across batches") {
    // q65's ingest-time form: (day, block) bitmap cells as complete-mode
    // streaming state; the trailing-window union + popcount runs on the
    // STATE table, so arbitrary cross-batch duplicate arrivals are
    // absorbed by the OR before any window math sees them
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, Long)]
    val cells = in.toDF().toDF("day", "user")
      .selectExpr("day", "user div 64 AS blk",
        "shiftleft(CAST(1 AS BIGINT), CAST(user % 64 AS INT)) AS mask")
      .groupBy(col("day"), col("blk")).agg(bit_or(col("mask")).as("bits"))
    val q = cells.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .format("memory").queryName("roll_stream").start()
    def rollingFromState(): Map[Int, Long] = {
      val state = spark.table("roll_stream")
      val spine = state.select(col("day")).distinct()
        .withColumnRenamed("day", "w_day")
      state.withColumn("w_day", explode(expr("sequence(day, day + 6)")))
        .join(spine, "w_day")
        .groupBy(col("w_day"), col("blk")).agg(bit_or(col("bits")).as("w"))
        .groupBy(col("w_day"))
        .agg(sum(bit_count(col("w")).cast("long")).as("n"))
        .as[(Int, Long)].collect().toMap
    }
    def expected(evs: Seq[(Int, Long)]): Map[Int, Long] = {
      val days = evs.map(_._1).distinct
      days.map(d => d ->
        evs.filter(e => e._1 >= d - 6 && e._1 <= d).map(_._2).distinct.size.toLong
      ).toMap
    }
    try {
      val b1 = Seq((1, 10L), (1, 11L), (2, 10L), (5, 12L), (9, 10L))
      in.addData(b1: _*); q.processAllAvailable()
      assert(rollingFromState() == expected(b1))
      // batch 2 back-fills day 2 with a user day 1 already saw (cross-batch
      // dedupe) and extends day 9's window
      val b2 = Seq((2, 11L), (2, 13L), (9, 14L), (8, 10L))
      in.addData(b2: _*); q.processAllAvailable()
      assert(rollingFromState() == expected(b1 ++ b2))
    } finally q.stop()
  }

  test("approx percentile brackets the exact median") {
    val li = Tables.lineitem(spark, sfDir)
    val p50 = li.select(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .as[Double].collect()(0)
    val sorted = li.select(col("l_quantity")).as[Double].collect().sorted
    val exact = sorted(sorted.length / 2)
    assert(math.abs(p50 - exact) <= 1.0, s"p50=$p50 exact=$exact")
  }
}
