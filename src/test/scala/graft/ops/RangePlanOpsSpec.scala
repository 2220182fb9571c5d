package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[RangePlanOps.globalRank]] — the distributed exact-rank primitive
  * behind q66 (and any future global-order consumer): must equal the
  * single-window `row_number` bit-for-bit, for any partition count,
  * including heavily tied sort keys (ties must never split across
  * ranges). */
class RangePlanOpsSpec extends SparkSpecBase {

  test("globalRank ≡ row_number over the global window, any p") {
    val cust = graft.Tables.customer(spark, sfDir)
    val want = cust.withColumn("rk", row_number().over(
        Window.orderBy(col("c_acctbal"), col("c_custkey"))))
      .select(col("c_custkey"), col("rk").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (p <- Seq(2, 7, 32)) {
      val got = RangePlanOps.globalRank(cust, col("c_acctbal"),
          col("c_custkey"), p, s"spec$p", "rk")
        .select(col("c_custkey"), col("rk"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"p=$p diverged from the window rank")
    }
  }

  test("heavily tied keys: equal values never split across ranges") {
    // quantities repeat constantly — every boundary lands ON a tie run;
    // strict-< assignment must keep each run whole and the rank exact
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("k", col("l_orderkey") * 10 + col("l_linenumber"))
    val want = li.withColumn("rk", row_number().over(
        Window.orderBy(col("l_quantity"), col("k"))))
      .select(col("k"), col("rk").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = RangePlanOps.globalRank(li, col("l_quantity"), col("k"),
        16, "spec-tie", "rk")
      .select(col("k"), col("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
