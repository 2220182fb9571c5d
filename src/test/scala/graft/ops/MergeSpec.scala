package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** CDC MERGE semantics of [[MergeOps]]: update / delete / insert paths,
  * idempotency, changelog compaction, and the broadcast-anti-join plan
  * shape that keeps the target un-shuffled at scale. */
class MergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def target = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0)).toDF("id", "name", "bal")

  test("applyChanges updates matched, deletes matched, inserts unmatched") {
    val changes = Seq(
      (2L, "bob2", 22.0, "U"),  // matched update (full-row replace)
      (3L, "x", 0.0, "D"),      // matched delete
      (4L, "dave", 40.0, "U"),  // unmatched insert
      (5L, "ghost", 0.0, "D")   // unmatched delete: no-op
    ).toDF("id", "name", "bal", "op")
    val out = MergeOps.applyChanges(target, changes, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "alice", 10.0), (2L, "bob2", 22.0), (4L, "dave", 40.0)))
  }

  test("applyChanges is idempotent") {
    val changes = Seq(
      (1L, "alice9", 11.0, "U"), (3L, "x", 0.0, "D"), (9L, "ned", 9.0, "U"))
      .toDF("id", "name", "bal", "op")
    val once = MergeOps.applyChanges(target, changes, Seq("id"))
    val twice = MergeOps.applyChanges(once, changes, Seq("id"))
    assert(twice.orderBy("id").collect().toSeq ==
      once.orderBy("id").collect().toSeq)
  }

  test("latestWins compacts a multi-version log; tombstone wins seq ties") {
    val log = Seq(
      (1L, "a_v1", 1.0, "U", 1L),
      (1L, "a_v2", 2.0, "U", 2L),   // highest seq for key 1 → wins
      (2L, "b_v1", 1.0, "U", 1L),
      (2L, "gone", 0.0, "D", 1L),   // same seq as the upsert → delete wins
      (9L, "new", 9.0, "U", 5L)
    ).toDF("id", "name", "bal", "op", "seq")
    val out = MergeOps
      .applyChangeLog(target, log, Seq("id"), seqCol = "seq")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a_v2", 2.0), (3L, "carol", 30.0), (9L, "new", 9.0)))
  }

  test("plan: target side probes a broadcast anti join (no target shuffle)") {
    val changes = Seq((2L, "bob2", 22.0, "U")).toDF("id", "name", "bal", "op")
    val plan = MergeOps.applyChanges(target, changes, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti join in:\n$plan")
  }

  test("streaming foreachBatch merge equals one-shot changelog apply") {
    // the streaming table-maintenance form: each micro-batch of the change
    // log is compacted and merged into the running target; because seq is
    // monotone across batches, sequential per-batch apply must equal one
    // applyChangeLog over the whole log
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double, String, Long)]
    var state = target
    val q = in.toDF().toDF("id", "name", "bal", "op", "seq")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = MergeOps.applyChangeLog(state, batch, Seq("id"), "seq")
          .localCheckpoint(true) // cut the growing lineage at each batch
        ()
      }.start()
    val log = Seq(
      (1L, "a_v1", 1.1, "U", 1L), (4L, "d_v1", 4.0, "U", 2L),
      (2L, "gone", 0.0, "D", 3L), (1L, "a_v2", 1.2, "U", 4L),
      (4L, "gone", 0.0, "D", 5L), (5L, "e_v1", 5.0, "U", 6L))
    try {
      in.addData(log.take(3): _*); q.processAllAvailable()
      in.addData(log.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val oneShot = MergeOps.applyChangeLog(
      target, log.toDF("id", "name", "bal", "op", "seq"), Seq("id"), "seq")
    assert(state.orderBy("id").collect().toSeq ==
      oneShot.orderBy("id").collect().toSeq)
  }

  test("q54 oracle-shape sanity: keys unique after merge") {
    val dir = sfDir
    val out = graft.queries.RelationalQueries
      .queries("q54_merge_upsert")(spark, dir)
    assert(out.groupBy("c_custkey").count().filter(col("count") > 1).isEmpty,
      "merge output must have unique keys")
  }
}
