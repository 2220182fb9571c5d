package graft.ops

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("curated corpus is deduped, sampled, split, and sharded consistently") {
    val obs = Observation("curation")
    val out = CurationPipeline.curate(docs, Some(obs)).cache()
    try {
      val n = out.count()
      val nIn = docs.count()
      assert(n > 0 && n < nIn, s"curation must drop something: $n of $nIn")

      // observe counters agree with the materialized frame
      assert(obs.get("n_curated") == n)

      // doc_ids unique; no two rows share normalized content
      assert(out.select("doc_id").distinct().count() == n)
      assert(out.select("norm_text").distinct().count() == n,
        "exact dedup must leave unique normalized texts")

      // near-dup closure: no surviving pair within Hamming 3 of each other
      val withSketch = out.withColumn("hs",
        DedupOps.tokenHashes(TextOps.tokens(col("norm_text"))))
      val survivors = DedupOps.simhashPairs(
          DedupOps.simhashBands(withSketch, DedupOps.simhash32(col("hs"))),
          maxHamming = 3)
      assert(survivors.count() == 0,
        "no near-dup pair may survive the component dedup")

      // quality gate really applied
      assert(out.filter(col("n_tokens") < CurationPipeline.MinTokens).count() == 0)

      // split labels well-formed; shard numbering dense from 0 per group
      assert(out.select("split").distinct().as[String].collect().toSet
        .subsetOf(Set("train", "val", "test")))
      val badShard = out.groupBy(col("split"), col("lang"))
        .agg(min(col("shard")).as("mn")).filter(col("mn") =!= 0).count()
      assert(badShard == 0, "each (split, lang) group starts at shard 0")
    } finally out.unpersist()
  }

  test("chunking covers every curated token with the configured overlap") {
    val curated = CurationPipeline.curate(docs)
    val chunks = CurationPipeline.chunkForTraining(curated,
      chunkTok = 32, stride = 24).cache()
    try {
      val perDoc = chunks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          max(col("chunk_start") + col("n_chunk_toks")).as("covered"),
          min("chunk_start").as("first_start"))
      val nTok = curated.select(col("doc_id"), col("n_tokens"))
      val joined = perDoc.join(nTok, "doc_id")
      // every chunked doc starts at 0 and its last chunk reaches the end
      assert(joined.filter(col("first_start") =!= 0).count() == 0)
      assert(joined.filter(col("covered") =!= col("n_tokens")).count() == 0,
        "chunks must cover exactly the token stream")
      // starts advance by the stride
      val badStride = chunks.filter(col("chunk_start") % 24 =!= 0).count()
      assert(badStride == 0, "chunk starts are stride-aligned")
      // chunk rows keep the training tags
      assert(chunks.filter(col("split").isNull || col("shard").isNull)
        .count() == 0)
    } finally chunks.unpersist()
  }

  test("streaming curation: normalize + quality gate + dedup on a stream") {
    // the ingest-time form of stages 1-3: every transform is narrow, so
    // the SAME column expressions run unchanged on a stream; exact dedup
    // becomes dropDuplicatesWithinWatermark on the content hash
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, String)]
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val curated = in.toDF().toDF("ts", "doc_id", "text")
      .withColumn("norm_text", cleaned)
      .withColumn("n_tokens",
        size(TextOps.tokens(col("norm_text"))).cast("long"))
      .filter(col("n_tokens") >= 3)
      .withColumn("content_md5", md5(col("norm_text").cast("binary")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_md5")
    val q = curated.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("stream_curation").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 01:$m%02d:00")
    try {
      in.addData(
        (ts(0), 1L, "The quick brown fox!"),
        (ts(1), 2L, "the  QUICK   brown fox"), // same after normalize → dup
        (ts(2), 3L, "too short"),              // quality-gated (2 tokens)
        (ts(3), 4L, "a genuinely different document"))
      q.processAllAvailable()
      in.addData((ts(4), 5L, "THE QUICK BROWN FOX")) // cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("stream_curation").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 4L),
        s"normalized dup + short doc must drop, originals survive: $ids")
    } finally q.stop()
  }

  test("streaming chunking + tf front half equals the batch form per batch") {
    // t17 (chunk explosion) is fully narrow and t19's front half (per-doc
    // term frequencies) aggregates only within doc_id, so both run
    // unchanged inside foreachBatch at ingest time; the corpus-level df/N
    // back half of t19 stays batch (it needs the whole corpus by
    // definition). Each micro-batch's output must be IDENTICAL to running
    // the same plan over the same rows as a plain batch DataFrame.
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.{DataFrame, Row}
    import scala.jdk.CollectionConverters._
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    def chunkFront(df: DataFrame): DataFrame = {
      val chunkTok = 4; val stride = 3
      df.withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .withColumn("chunk_start",
          explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
        .select(col("doc_id"),
          col("chunk_start").cast("long").as("chunk_start"),
          size(slice(col("toks"), col("chunk_start") + 1, lit(chunkTok)))
            .cast("long").as("n_chunk_toks"),
          array_join(slice(col("toks"), col("chunk_start") + 1, lit(chunkTok)), " ")
            .as("chunk_text"))
    }
    def tfFront(df: DataFrame): DataFrame =
      df.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val perBatch = scala.collection.mutable.Map[Long, Seq[(Set[Row], Set[Row])]]()
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // replay the exact batch rows through the exact same plans in
        // batch mode; any divergence is a streaming-incompatibility bug
        val replay = spark.createDataFrame(
          batch.collect().toIndexedSeq.asJava, batch.schema)
        perBatch.synchronized {
          perBatch(id) = Seq(
            (chunkFront(batch).collect().toSet, chunkFront(replay).collect().toSet),
            (tfFront(batch).collect().toSet, tfFront(replay).collect().toSet))
        }
        ()
      }
      .start()
    try {
      in.addData((1L, "a b c d e f g"), (2L, "x y"))
      q.processAllAvailable()
      in.addData((3L, "m n o p q r s t u v"), (4L, "solo"))
      q.processAllAvailable()
      assert(perBatch.keySet == Set(0L, 1L), s"batches: ${perBatch.keySet}")
      perBatch.foreach { case (id, Seq((sc, bc), (st, bt))) =>
        assert(sc.nonEmpty && st.nonEmpty, s"batch $id produced no rows")
        assert(sc == bc, s"batch $id: streaming chunking diverged from batch")
        assert(st == bt, s"batch $id: streaming tf diverged from batch")
      }
      // spot-check the semantics, not just self-consistency: 7 tokens,
      // stride 3 → starts 0,3,6 with widths 4,4,1
      val d1 = perBatch(0L).head._1.filter(_.getLong(0) == 1L)
      assert(d1.map(r => (r.getLong(1), r.getLong(2))) ==
        Set((0L, 4L), (3L, 4L), (6L, 1L)))
    } finally q.stop()
  }

  test("curation is deterministic across runs and partitionings") {
    def fingerprint(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
      df.select(col("doc_id"), col("split"), col("shard"))
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val a = fingerprint(CurationPipeline.curate(docs))
    val b = fingerprint(CurationPipeline.curate(docs.repartition(7)))
    assert(a == b, "content-hash decisions must not depend on partitioning")
  }
}
