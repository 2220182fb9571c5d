package graft.streaming

import graft.SparkSpecBase
import graft.ops.IvfIndex
import org.apache.spark.sql.functions._

class StreamingIvfAdmissionSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed admissions replay byte-equal to the persisted index codes") {
    // The whole point of the admission path: a vector arriving AFTER the
    // index build must land in the same inverted list with the same PQ
    // codes as if it had been in the build corpus. Replaying the corpus
    // itself through the stream makes that falsifiable row-for-row
    // against the index's own codes table.
    val p = IvfIndex.ensure(spark, sfDir)
    val expected = spark.read.parquet(p.codes)
      .select(col("vid"), col("list_id").cast("long"),
        col("c0").cast("long"), col("c1").cast("long"),
        col("c2").cast("long"), col("c3").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "index must hold codes")

    val corpus = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    // two micro-batches: admission must not depend on batch boundaries
    val (b1, b2) = corpus.splitAt(corpus.length / 2)

    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = StreamingIvfAdmission
      .admissions(spark, in.toDF().toDF("id", "emb"), p)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("ivf_admissions").start()
    try {
      in.addData(b1)
      q.processAllAvailable()
      val afterB1 = spark.table("ivf_admissions").count()
      assert(afterB1 == b1.length.toLong,
        s"batch 1 must admit exactly its rows: $afterB1")
      in.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("ivf_admissions")
        .select(col("vid"), col("list_id"),
          col("c0").cast("long"), col("c1").cast("long"),
          col("c2").cast("long"), col("c3").cast("long"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == expected,
        s"streamed admissions must equal the index codes; " +
          s"only-streamed=${(streamed -- expected).take(3)} " +
          s"only-index=${(expected -- streamed).take(3)}")
    } finally q.stop()
  }

  test("admitted vectors ACCRETE: append to a copied index, then get served") {
    // the full ingest loop on an isolated index copy (never the shared
    // per-corpus index — other suites assert its exact contents): build,
    // admit a near-twin of vector 0, append its row to the partitioned
    // code table, serve — the newcomer must surface for query 0, whose
    // own codes it carries while v0 itself is self-excluded.
    val p = IvfIndex.build(spark, sfDir, "target/ivf-index-test/accrete")
    val before = spark.read.parquet(p.codes).count()
    val v0 = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .filter(col("id") === 0L).as[(Long, Seq[Double])].head()
    StreamingIvfAdmission.admissions(spark,
        Seq((900001L, v0._2.map(_ * 1.0000001))).toDF("id", "emb"), p)
      .write.mode("append").partitionBy("list_id").parquet(p.codes)
    assert(spark.read.parquet(p.codes).count() == before + 1,
      "append must add exactly the admitted row")
    val top0 = IvfIndex.serveFrom(spark, sfDir, p,
        graft.queries.SimilarityQueries.K, nprobe = 2)
      .filter(col("query_id") === 0L)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(top0.contains(900001L),
      s"the accreted near-twin of v0 must serve for query 0: $top0")
  }

  test("accreted list directories compact back to right-sized files") {
    // continuous admission leaves a trail of tiny per-batch files in each
    // inverted list's directory — the classic streaming-sink pathology
    // (file COUNT, not bytes, is what kills scan planning at scale). The
    // maintenance job is LayoutOps.compactParquet per list dir; this
    // closes the ingest→maintain loop on an isolated index copy.
    val p = IvfIndex.build(spark, sfDir, "target/ivf-index-test/compact")
    val v0 = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .filter(col("id") === 0L).as[(Long, Seq[Double])].head()
    val twins = (1 to 5).map(i =>
      (900000L + i, v0._2.map(_ * (1.0 + i * 1e-7))))
    val adm = StreamingIvfAdmission
      .admissions(spark, twins.toDF("id", "emb"), p)
    val lists = adm.select(col("list_id")).distinct().as[Long].collect()
    assert(lists.length == 1, s"tiny perturbations share v0's list: $lists")
    // 5 separate "micro-batch" files land in the one list dir
    adm.repartition(5).write.mode("append")
      .partitionBy("list_id").parquet(p.codes)
    val listDir = s"${p.codes}/list_id=${lists.head}"
    val before = spark.read.parquet(listDir)
      .select(col("vid"), col("c0"), col("c1"), col("c2"), col("c3"))
      .as[(Long, Byte, Byte, Byte, Byte)].collect().toSet
    val stats = graft.ops.LayoutOps.compactParquet(spark, listDir,
      listDir + "_compacted", targetBytes = 64L * 1024 * 1024)
    assert(stats.filesBefore >= 6,
      s"append trail must be visible pre-compaction: $stats")
    assert(stats.filesOut == 1, s"one right-sized file out: $stats")
    val after = spark.read.parquet(listDir + "_compacted")
      .select(col("vid"), col("c0"), col("c1"), col("c2"), col("c3"))
      .as[(Long, Byte, Byte, Byte, Byte)].collect().toSet
    assert(after == before, "compaction must preserve every code row")
  }

  test("admission of a NOVEL vector assigns the nearest list deterministically") {
    // not in the build corpus: a perturbed copy of vector 0 must follow
    // vector 0's list assignment (perturbation ≪ inter-centroid gaps)
    // and produce identical PQ codes under the same tie rule as batch.
    val p = IvfIndex.ensure(spark, sfDir)
    val v0 = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      .filter(col("id") === 0L).as[(Long, Seq[Double])].head()
    val near = (900001L, v0._2.map(_ * 1.0000001))
    val out = StreamingIvfAdmission.admissions(spark,
        Seq(v0, near).toDF("id", "emb"), p)
      .as[(Long, Long, Byte, Byte, Byte, Byte)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(900001L) == out(0L),
      s"near-identical vector must admit identically: $out")
  }
}
