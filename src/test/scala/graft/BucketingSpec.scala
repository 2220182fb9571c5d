package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scale pattern: bucketed table layout co-locates join keys so fact-fact
  * joins plan WITHOUT a shuffle exchange — at 100 TB this is the difference
  * between an exabyte of shuffle and a local sort-merge. Proves the engine
  * writes/reads bucketed tables and that Catalyst exploits the layout. */
class BucketingSpec extends SparkSpecBase {

  test("bucketed-by-key join plans without shuffle exchanges") {
    // default warehouse dir (./spark-warehouse, gitignored) — the static
    // conf can't be changed on the shared session. The in-memory catalog is
    // per-JVM, so also clear stale table DIRECTORIES from previous runs
    // (DROP TABLE can't see them).
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Tables.lineitem(spark, sfDir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    // force AQE final plan, then walk it for shuffles under the join
    val rows = joined.collect()
    assert(rows.map(_.getLong(1)).sum > 0)
    val executed = joined.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = finalPlan.collect { case s: ShuffleExchangeExec => s }
    // the only legal shuffle is the tiny post-aggregation exchange on
    // o_orderstatus; the JOIN itself must be shuffle-free
    assert(shuffles.size <= 1,
      s"bucketed join must not shuffle join inputs; found ${shuffles.size} exchanges")
  }

  test("d12's exact-dedup probe against a bucketed corpus index never shuffles the corpus") {
    // the claim in d12's scaladoc made concrete: persist the corpus
    // content-hash index bucketed by content_md5, and the daily delta
    // probe plans with NO exchange on the corpus side — ingest cost is
    // |delta| + a bucket-local lookup, however big the corpus grows.
    spark.sql("DROP TABLE IF EXISTS corpus_hash_idx")
    val dir = new java.io.File("spark-warehouse/corpus_hash_idx")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    val hashed = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("content_md5"))
    hashed.filter(col("doc_id") % 10 =!= 0)
      .write.bucketBy(8, "content_md5").sortBy("content_md5")
      .mode("overwrite").saveAsTable("corpus_hash_idx")
    val delta = hashed.filter(col("doc_id") % 10 === 0)
      // pre-shuffle the delta into the SAME bucket hash space, so the
      // join needs no exchange on either side at execution time
      .repartition(8, col("content_md5"))
    val probe = delta.join(spark.table("corpus_hash_idx")
        .withColumnRenamed("doc_id", "corpus_id"), "content_md5")
    probe.collect()
    val finalPlan = probe.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val corpusShuffled = finalPlan.collect { case s: ShuffleExchangeExec => s }
      .exists(_.toString.contains("corpus_id"))
    assert(!corpusShuffled,
      s"the corpus side must read bucket-local:\n$finalPlan")
  }
}
