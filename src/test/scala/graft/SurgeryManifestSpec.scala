package graft

import org.apache.spark.sql.functions._

/** Model checks for the rewrite/sampling/manifest operators (t43 boilerplate
  * strip, d37 contaminated-span surgery, n23 temperature sampling, p5 shard
  * manifest): the invariants their oracle rows alone don't state. */
class SurgeryManifestSpec extends SparkSpecBase {
  import spark.implicits._

  test("d37 planted contamination: exact islands, margin, reassembly") {
    // bench doc 0 plants a 5-token run; train doc 1 embeds it mid-doc,
    // train doc 3 IS it verbatim, train doc 2 is clean.
    val docs = Seq(
      (0L, "b1 b2 b3 b4 b5"),
      (1L, ("x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 b1 b2 b3 b4 b5 " +
        "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10")),
      (2L, "z1 z2 z3 z4 z5"),
      (3L, "b1 b2 b3 b4 b5")
    ).toDF("doc_id", "text")
    val out = graft.ops.DedupOps.spanSurgery(docs, col("doc_id") === 0L, 3)
      .orderBy(col("doc_id"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L), "doc 2 must be clean")
    val r1 = out(0)
    // 3 shingle hits at positions 10,11,12 dilate to [7,15],[8,16],[9,17]
    // and merge into ONE island [7,17]: 11 tokens out, 14 kept.
    assert(r1.getAs[Long]("n_hits") == 3 && r1.getAs[Long]("n_spans") == 1)
    assert(r1.getAs[Long]("tokens_removed") == 11
      && r1.getAs[Long]("kept_tokens") == 14)
    assert(r1.getAs[String]("disposition") == "drop",
      "11/25 = 44% removed is past the 20% shred threshold")
    val expectClean = "x1 x2 x3 x4 x5 x6 x7 y4 y5 y6 y7 y8 y9 y10"
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expectClean.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getAs[String]("cleaned_md5") == expectMd5,
      "rebuilt text must be the doc minus the [7,17] window, order kept")
    val r3 = out(1)
    assert(r3.getAs[Long]("kept_tokens") == 0
      && r3.getAs[String]("cleaned_md5") == null
      && r3.getAs[String]("disposition") == "drop",
      "a verbatim benchmark copy must be excised to nothing")
  }

  test("t56 planted caps: tie split at the floor, under-cap source kept") {
    // 8 docs over 2 sources → cap = max(1, (8*8) div (10*2)) = 3.
    // Source A (6 docs): one q=1e6 doc, a THREE-way tie at q=500000
    // (only two fit under the cap — doc_id asc breaks it), two q=0.
    // Source B (2 docs) is under the cap: untouched, floor = its min q.
    val docs = Seq(
      (0L, "A", "the a of"), // q = 1000000
      (2L, "A", "the x"), (4L, "A", "a y"), (6L, "A", "of z"), // 500000
      (8L, "A", "p r"), (10L, "A", "u v"), // q = 0
      (1L, "B", "the and in to x"), // q = 800000
      (3L, "B", "m n") // q = 0
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("t56cap").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.queries("t56_source_cap")(spark, dir)
      .select("source", "n_docs", "cap", "n_kept", "n_dropped",
        "q_floor", "kept_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 6L, 3L, 3L, 3L, 500000L, 7L), // d0(3 tok) + d2 + d4 (2 each)
      ("B", 2L, 3L, 2L, 0L, 0L, 7L)))
  }

  test("d37 on the corpus conserves tokens and islands stay disjoint") {
    val out = graft.queries.DedupQueries.queries("d37_span_surgery")(
      spark, sfDir)
    val bad = out.filter(
      col("kept_tokens") + col("tokens_removed") =!= col("n_tokens")
        || col("tokens_removed") < col("n_spans")
        || col("removed_ppm") > lit(1000000L)).count()
    assert(bad == 0, "kept+removed must equal total; spans cover >=1 token")
  }

  test("t43 strip accounting is consistent and cleaned docs shrink") {
    val out = graft.queries.TextQueries.queries("t43_boilerplate_strip")(
      spark, sfDir)
    val bad = out.filter(
      col("n_kept") + col("n_stripped") =!= col("n_sents")
        || (col("n_kept") === 0) =!= col("cleaned_md5").isNull).count()
    assert(bad == 0)
  }

  test("n23 quotas land exactly on budget; alpha=1 is proportional, alpha=0 uniform") {
    val out = graft.queries.SimilarityQueries.queries("n23_cluster_sample")(
      spark, sfDir).collect()
    val byAlpha = out.groupBy(_.getAs[Long]("alpha_ppm"))
    byAlpha.foreach { case (a, rows) =>
      assert(rows.map(_.getAs[Long]("quota")).sum == 200L,
        s"alpha=$a largest-remainder apportionment must hit the budget")
      rows.foreach { r =>
        assert(r.getAs[Long]("kept")
          == math.min(r.getAs[Long]("quota"), r.getAs[Long]("n_c")),
          "membership = quota smallest hashes, capped by cluster size")
      }
    }
    val n = byAlpha(1000000L).map(_.getAs[Long]("n_c")).sum
    byAlpha(1000000L).foreach { r =>
      val exact = 200.0 * r.getAs[Long]("n_c") / n
      assert(math.abs(r.getAs[Long]("quota") - exact) <= 1.0,
        "alpha=1 must reproduce proportional allocation within rounding")
    }
    val k = byAlpha(0L).size
    byAlpha(0L).foreach { r =>
      assert(math.abs(r.getAs[Long]("quota") - 200.0 / k) <= 1.0,
        "alpha=0 must be uniform within rounding")
    }
  }

  test("p5 manifest conserves pack tokens and is partitioning-invariant") {
    def run() = graft.queries.PipelineQueries.queries("p5_manifest")(
      spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("shard_tokens"),
        r.getAs[String]("shard_md5"))).toSeq.sorted
    val a = Tables.withFanoutParts(3)(run())
    val b = Tables.withFanoutParts(11)(run())
    assert(a == b, "manifest (incl. every shard_md5) must not depend on " +
      "how the input was partitioned")
    val st = graft.ops.CurationLedger.stages(spark, sfDir)
    val mixTokens = st.s6.agg(sum(col("ntok"))).as[Long].collect().head
    assert(a.map(_._4).sum == mixTokens,
      "sum of shard_tokens must equal the mixture's token mass (p1 row 7)")
  }

  test("p6 repack: clean shards form a per-lang prefix with equal stats") {
    val rows = graft.queries.PipelineQueries.queries("p6_shard_repack")(
      spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[String]("status"),
        Option(r.getAs[java.lang.Long]("n_docs_old")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("n_docs_new")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("tokens_old")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("tokens_new")).map(_.longValue)))
    assert(rows.exists(_._3 == "clean") && rows.exists(_._3 == "rewritten")
      && rows.exists(_._3 == "new"),
      "the drop shape must exercise clean, rewritten, and new verdicts")
    // md5 equality is a statement about members: counts and masses agree
    rows.filter(_._3 == "clean").foreach { r =>
      assert(r._4 == r._5 && r._6 == r._7,
        s"clean shard ${r._1}/${r._2} must carry identical doc/token stats")
    }
    // prefix packing: one mid-order change dirties every LATER shard in
    // its stratum, so per lang the clean set is a downward-closed prefix
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val old = rs.filter(r => r._3 == "clean" || r._3 == "rewritten"
        || r._3 == "dropped").sortBy(_._2)
      val firstDirty = old.indexWhere(_._3 != "clean")
      if (firstDirty >= 0)
        assert(old.drop(firstDirty).forall(_._3 != "clean"),
          s"$lang: a clean shard after the first dirty one contradicts " +
            "running-prefix invalidation")
    }
    // both sides' verdicts reconcile: every old shard is accounted for
    // exactly once, and 'new' rows carry no old-side stats
    rows.foreach {
      case (_, _, "new", o, _, ot, _) => assert(o.isEmpty && ot.isEmpty)
      case (_, _, "dropped", _, n, _, nt) => assert(n.isEmpty && nt.isEmpty)
      case (_, _, s, o, n, _, _) => assert(o.nonEmpty && n.nonEmpty, s)
    }
  }
}
