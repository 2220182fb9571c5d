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

  test("approx percentile brackets the exact median") {
    val li = Tables.lineitem(spark, sfDir)
    val p50 = li.select(percentile_approx(col("l_quantity"), lit(0.5), lit(1000)))
      .as[Double].collect()(0)
    val sorted = li.select(col("l_quantity")).as[Double].collect().sorted
    val exact = sorted(sorted.length / 2)
    assert(math.abs(p50 - exact) <= 1.0, s"p50=$p50 exact=$exact")
  }
}
