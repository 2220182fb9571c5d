package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Spark's NATIVE session_window as a watermarked streaming aggregation:
  * the same operator q95 proves in batch must, on an event-time-ordered
  * replay, finalize exactly the batch sessions once the watermark passes
  * them. Sessions are closed by a far-future sentinel event (a session
  * window only becomes emittable in append mode when the watermark
  * clears its end), and the sentinel user is excluded from comparison. */
class StreamingSessionWindowSpec extends SparkSpecBase {
  import spark.implicits._

  test("watermarked session_window finalizes the batch q95 sessions on replay") {
    implicit val ctx = spark.sqlContext
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val maxTs = ev.map(_._3.getTime).max
    val sentinel = (-1L, -1L, new java.sql.Timestamp(maxTs + 4L * 3600 * 1000))

    val in = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val agg = in.toDF().toDF("user_id", "event_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("sess_start_s"),
        unix_timestamp(col("sw.end")).as("sess_end_s"),
        col("n_events"), col("first_event_id"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_win").start()
    try {
      val (b1, b2) = ev.splitAt(ev.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      in.addData(sentinel); q.processAllAvailable()
      // one more empty-ish batch so the advanced watermark finalizes
      in.addData(sentinel); q.processAllAvailable()
      val got = spark.table("sess_win").filter(col("user_id") >= 0)
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      val batch = graft.SparkEntry.queries("q95_session_window")(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got.nonEmpty && got == batch)
    } finally q.stop()
  }

  test("watermarked DYNAMIC-gap session_window finalizes the batch q95b sessions") {
    implicit val ctx = spark.sqlContext
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
    val maxTs = ev.map(_._3.getTime).max
    val sentinel =
      (-1L, -1L, new java.sql.Timestamp(maxTs + 4L * 3600 * 1000), "view")

    val in = MemoryStream[(Long, Long, java.sql.Timestamp, String)]
    val gap = when(col("event_type") === "purchase", lit("45 minutes"))
      .otherwise(lit("15 minutes"))
    val agg = in.toDF().toDF("user_id", "event_id", "ts", "event_type")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("sess_start_s"),
        unix_timestamp(col("sw.end")).as("sess_end_s"),
        col("n_events"), col("first_event_id"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_win_dyn").start()
    try {
      val (b1, b2) = ev.splitAt(ev.length / 2)
      in.addData(b1.toSeq); q.processAllAvailable()
      in.addData(b2.toSeq); q.processAllAvailable()
      in.addData(sentinel); q.processAllAvailable()
      in.addData(sentinel); q.processAllAvailable()
      val got = spark.table("sess_win_dyn").filter(col("user_id") >= 0)
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      val batch = graft.SparkEntry
        .queries("q95b_session_window_dynamic")(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      assert(got.nonEmpty && got == batch)
    } finally q.stop()
  }
}
