package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streamed range router must assign every replayed row the pid the
  * batch planner (q91's literal-probe form) assigns — and the routed
  * volume histogram must therefore match the planner's balance audit. */
class StreamingRangeRouterSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed routing replays bit-equal to the batch range plan") {
    implicit val ctx = spark.sqlContext
    val P = 32
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("v"))
    // q91's boundary build: bounded stratified reservoir, P−1 order stats
    val bounds = graft.ops.RangePlanOps.planBoundaries(spark, li, P)
    assert(bounds.nonEmpty && bounds == bounds.sorted)

    // (l_orderkey, l_linenumber) is NOT unique in the synthetic corpus —
    // compare routed rows as sorted multisets keyed by the full row
    val batch = li
      .select(col("l_orderkey"), col("l_linenumber"), col("v"),
        StreamingRangeRouter.pidColumn(bounds)(col("v")).as("pid"))
      .as[(Long, Int, Double, Long)].collect().toVector.sorted

    val rows = li.as[(Long, Int, Double)].collect().sortBy(r => (r._1, r._2))
    val in = MemoryStream[(Long, Int, Double)]
    val routed = in.toDF().toDF("l_orderkey", "l_linenumber", "v")
      .select(col("l_orderkey"), col("l_linenumber"), col("v"),
        StreamingRangeRouter.pidColumn(bounds)(col("v")).as("pid"))
    val q = routed.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("range_router").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.table("range_router")
        .as[(Long, Int, Double, Long)].collect().toVector.sorted
      assert(got.length == rows.length)
      assert(got == batch, "streamed pids must equal batch assignment")
      // every pid in range; routing covers multiple partitions
      assert(got.forall(r => r._4 >= 0 && r._4 < P))
      assert(got.map(_._4).toSet.size > 1)
    } finally q.stop()
  }
}
