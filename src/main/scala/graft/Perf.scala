package graft

import org.apache.spark.sql.SparkSession

/** Perf probe: `runMain graft.Perf <sfDir> <query> [query...]` — times each
  * named query twice (cold/warm) against a noop sink, prints the formatted
  * physical plan, and dumps a per-stage task-duration skew table for the
  * warm run (tasks, median/max ms, skew = max/median — a straggler shows up
  * as skew >> 1 on a stage with many tasks, the thing wall-clock alone
  * can't distinguish from uniform slowness). */
object Perf {

  /** Collects (stageId, task duration ms) while attached. */
  private final class TaskDurations extends org.apache.spark.scheduler.SparkListener {
    val byStage = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      synchronized {
        val buf = byStage.getOrElseUpdate(
          e.stageId, scala.collection.mutable.ArrayBuffer())
        buf += e.taskInfo.duration
      }
    def report(): String = synchronized {
      val rows = byStage.toSeq.sortBy(_._1).map { case (sid, ds) =>
        val s = ds.sorted
        val med = s(s.length / 2)
        val mx = s.last
        f"  stage $sid%4d: ${s.length}%4d tasks  med ${med}%5d ms  max ${mx}%5d ms  skew ${mx.toDouble / math.max(med, 1)}%5.1f"
      }
      rows.mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q1_pricing_summary")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ClusterConfigs.local(
      SparkSession.builder().appName("graft-perf"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      println(s"==== $name ====")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      (1 to 2).foreach { i =>
        val listener = if (i == 2) Some(new TaskDurations) else None
        listener.foreach(spark.sparkContext.addSparkListener)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[$name run$i] ${(System.nanoTime() - t0) / 1e9}%.3f s")
        listener.foreach { l =>
          Thread.sleep(500) // listener bus drain (no public flush API)
          println(s"[$name task skew]\n${l.report()}")
          spark.sparkContext.removeSparkListener(l)
        }
      }
    }
    spark.stop()
  }
}
