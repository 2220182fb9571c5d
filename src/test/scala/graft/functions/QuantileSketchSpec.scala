package graft.functions

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpecBase {
  import spark.implicits._

  private val ps = Seq(0.5, 0.9, 0.99)

  /** Exact nearest-rank quantiles of a sorted sample. */
  private def exact(xs: Array[Double], p: Double): Double = {
    val sorted = xs.sorted
    sorted(math.max(0, math.ceil(p * xs.length).toInt - 1))
  }

  test("sketch is exact when n <= k (no compaction ever fires)") {
    val xs = (1 to 150).map(_.toDouble)
    val agg = new QuantileSketchAggregator(ps, k = 200)
    val got = xs.toDS().select(agg.toColumn).head()
    val want = ps.map(p => exact(xs.toArray, p))
    assert(got.toSeq == want, s"exact regime must be lossless: $got vs $want")
  }

  test("rank error stays within bound on 60k skewed doubles") {
    val n = 60000
    // heavy-tailed deterministic data: x^3 spreads mass over 5 decades
    val xs = (1 to n).map(i => (i.toDouble / n) * i * i / 1000.0)
    val agg = new QuantileSketchAggregator(ps, k = 200)
    val got = xs.toDS().repartition(16).select(agg.toColumn).head()
    val sorted = xs.sorted.toArray
    ps.zip(got).foreach { case (p, est) =>
      // estimated quantile's true rank must be within eps*n of target
      val trueRank = sorted.count(_ <= est)
      val err = math.abs(trueRank - p * n)
      assert(err <= 0.02 * n,
        s"p=$p: rank error $err exceeds 2% of n (est=$est)")
    }
  }

  test("merge is partitioning-insensitive within the error bound") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").cast("double").as("x")).as[Double]
    val agg = new QuantileSketchAggregator(Seq(0.5), k = 200)
    val few = li.repartition(2).as[Double].select(agg.toColumn).head().head
    val many = li.repartition(32).as[Double].select(agg.toColumn).head().head
    val all = li.collect().sorted
    def rank(v: Double) = all.count(_ <= v).toDouble / all.length
    assert(math.abs(rank(few) - 0.5) < 0.03, s"2-part median rank ${rank(few)}")
    assert(math.abs(rank(many) - 0.5) < 0.03, s"32-part median rank ${rank(many)}")
  }

  test("qsketch_quantiles_at takes probe points at the SQL call site") {
    graft.GraftExtensions.install(spark)
    val xs = (1 to 150).map(_.toDouble)
    xs.toDF("x").createOrReplaceTempView("qs_at_in")
    val got = spark.sql(
      "SELECT qsketch_quantiles_at(x, array(0.25D, 0.75D)) AS qs FROM qs_at_in")
      .head().getSeq[Double](0)
    val want = Seq(0.25, 0.75).map(p => exact(xs.toArray, p))
    assert(got == want, s"call-site ps must drive the probes: $got vs $want")
    // group-wise: each group gets its own exact answer in the n<=k regime
    val byGroup = spark.sql(
      """SELECT x > 75 AS hi, qsketch_quantiles_at(x, array(0.5D)) AS qs
        |FROM qs_at_in GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getBoolean(0), r.getSeq[Double](1).head))
    assert(byGroup.toSeq == Seq((false, 38.0), (true, 113.0)), byGroup.toSeq)
  }

  test("buffer footprint stays bounded: levels * k, not n") {
    val n = 100000
    val xs = (1 to n).map(_.toDouble)
    val agg = new QuantileSketchAggregator(Seq(0.5), k = 200)
    var s = agg.zero
    xs.foreach(x => s = agg.reduce(s, x))
    val stored = s.levels.map(_.length).sum
    assert(s.levels.length <= 16, s"levels ${s.levels.length}")
    assert(stored <= 16 * 200, s"stored values $stored must be << n=$n")
    assert(s.n == n)
  }
}
