package graft.ops

import graft.{SparkSpecBase, Tables}
import graft.ops.SimilarityOps._
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id").as("id"), toDouble(col("embedding")).as("emb"))

  test("corpus embeddings are uniformly 64-dim (zip_with precondition)") {
    val dims = vecs.select(size(col("emb"))).distinct().as[Int].collect()
    assert(dims.sameElements(Array(64)))
  }

  test("persisted index stats carry the exact planted-corpus cardinality") {
    // m8's bucket-growth knob sizes its layout from IvfIndex.plantedCount
    // instead of a per-query count() action — the 1-row stats read must
    // equal |plantedVecs| exactly (n_vecs + |id % PlantMod == 0|, no id-
    // density assumption).
    import graft.queries.SimilarityQueries.PlantMod
    val n = vecs.count() +
      vecs.filter(col("id") % PlantMod === 0).count()
    assert(IvfIndex.plantedCount(spark, sfDir) == n)
  }

  test("cosine of a vector with itself is 1.0") {
    val self = vecs.limit(5)
      .withColumn("cos", cosine(dot(col("emb"), col("emb")),
        norm2(col("emb")), norm2(col("emb"))))
      .select("cos").as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("brute-force top-k is ordered and self-free") {
    val out = bruteForceTopK(vecs.filter(col("id") < 4), vecs, 10)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 4)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 10)
      assert(rows.forall(_._3 != q), "self must be excluded")
      val sims = rows.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
    }
  }

  test("LSH top-k achieves reasonable recall@10 vs brute force") {
    val q = vecs.filter(col("id") < 8)
    val exact = bruteForceTopK(q, vecs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = lshTopK(q, vecs, 10, tables = 8, planes = 8, dims = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // sign-LSH with 12 planes on random-ish embeddings: bucket recall is
    // data-dependent; require non-trivial overlap and full precision of
    // format (every LSH result must be a real neighbor of its query)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"LSH recall@10 = $recall%.3f (candidates=${approx.size})")
    assert(approx.nonEmpty, "LSH must return candidates")
    assert(recall > 0.0, "LSH must recover at least some true neighbors")
  }

  test("native vector kernels match HOF formulation bit-for-bit") {
    val pairs = vecs.limit(100).crossJoin(
      vecs.select(col("id").as("id2"), col("emb").as("emb2")).limit(100))
    val diffs = pairs.select(
      dot(col("emb"), col("emb2")).as("d_native"),
      dotHof(col("emb"), col("emb2")).as("d_hof"),
      norm2(col("emb")).as("n_native"),
      norm2Hof(col("emb")).as("n_hof"),
      graft.functions.VectorExpressions.cosine_sim(col("emb"), col("emb2")).as("c_native"),
      (dotHof(col("emb"), col("emb2")) /
        sqrt(norm2Hof(col("emb")) * norm2Hof(col("emb2")))).as("c_hof"))
      .filter(col("d_native") =!= col("d_hof") ||
        col("n_native") =!= col("n_hof") || col("c_native") =!= col("c_hof"))
    assert(diffs.count() == 0, "native kernels must be bit-identical to HOF math")
  }

  test("JL ±1 projection concentrates pairwise distance ratios around 1") {
    // The Johnson–Lindenstrauss property n22 exists to audit: over the
    // 496-pair panel, ‖Ru−Rv‖²/(k‖u−v‖²) has mean ≈ 1 and chi²_k/k
    // spread (sd ≈ √(2/16) ≈ 0.35). Deterministic (seeded signs, fixed
    // corpus), so the bounds are stable — but they are the THEORY's
    // bounds, not tuned to this corpus.
    val ratios = graft.queries.SimilarityQueries
      .queries("n22_jl_distortion")(spark, sfDir)
      .select(col("ratio")).as[Double].collect()
    assert(ratios.length > 400, s"panel produced only ${ratios.length} pairs")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"JL mean ratio $mean drifted from 1")
    val inBand = ratios.count(r => r >= 0.5 && r <= 1.5)
    assert(inBand.toDouble / ratios.length >= 0.75,
      s"only $inBand/${ratios.length} pairs within [0.5, 1.5]")
    // signs are deterministic, balanced-ish, and ±1 only
    val s0 = jlSigns(0, 64)
    assert(s0 == jlSigns(0, 64) && s0.forall(x => x == 1.0 || x == -1.0))
  }

  test("plane weights are deterministic and bounded") {
    val w1 = planeWeights(3, 64)
    val w2 = planeWeights(3, 64)
    assert(w1 == w2)
    assert(w1.forall(x => x >= -1000 && x <= 1000))
    assert(planeWeights(4, 64) != w1)
  }

  test("fused LSH signature kernel equals the expression-composed form") {
    val diff = vecs.select(
        lshSignatures(col("emb"), 8, 8, 64).as("fast"),
        lshSignaturesHof(col("emb"), 8, 8, 64).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0, "fused kernel must produce identical bucket signatures")
  }

  test("bounded TopKAggregator ranking equals the window formulation") {
    val q = vecs.filter(col("id") < 8)
    val viaWindow = bruteForceTopK(q, vecs, 10)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val viaAgg = bruteForceTopKAgg(spark, q, vecs, 10)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(viaWindow.toSeq == viaAgg.toSeq,
      "bounded-buffer top-k must produce the identical ranking")
  }

  test("typed VecCentroidAggregator matches the exploded-decimal centroid query") {
    import graft.functions.VecCentroidAggregator
    val agg = new VecCentroidAggregator(64)
    val typed = graft.Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding").cast("array<double>").as("emb"))
      .as[(Int, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("centroid"))
      .collect().toMap
    val oracle = graft.queries.SimilarityQueries
      .queries("n4_label_centroids")(spark, sfDir)
      .select("label", "dim", "centroid")
      .as[(Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(typed.keySet == oracle.keySet)
    typed.foreach { case (label, cent) =>
      val exp = oracle(label)
      assert(cent.length == 64)
      cent.zip(exp).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label centroid mismatch: $a vs $b")
      }
    }
  }

  test("PQ/ADC holds its recall floor, orders by estimate, deterministic") {
    // exact L2 top-10 (the metric PQ approximates — n1 ranks by cosine,
    // which differs on unnormalized vectors)
    def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      norm2(a) + norm2(b) - lit(2.0) * dot(a, b)
    val q = vecs.filter(col("id") < 8)
      .select(col("id").as("qid"), col("emb").as("qemb"))
    val exact = q.crossJoin(vecs)
      .withColumn("d2", sqDist(col("qemb"), col("emb")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d2"), col("id"))))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("id")).as[(Long, Long)].collect().toSet
    val pq = graft.queries.SimilarityQueries.queries("n11_pq_adc")(spark, sfDir)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    // 64→4-code compression with an untrained 16-entry codebook on
    // unclustered synthetic data: measured 0.375 at sf0.001 — the honest
    // floor for this regime (trained codebooks and IVF gating raise it)
    assert(recall >= 0.25, s"PQ recall@10 collapsed: $recall")
    // ADC is a true distance estimate: per query it must be
    // non-decreasing in rank, and the whole result deterministic
    val ranked = graft.queries.SimilarityQueries.queries("n11_pq_adc")(spark, sfDir)
      .select(col("query_id"), col("rank"), col("adc_dist2"))
      .as[(Long, Long, Double)].collect()
    ranked.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "adc must be non-decreasing in rank")
    }
    val again = graft.queries.SimilarityQueries.queries("n11_pq_adc")(spark, sfDir)
      .select(col("query_id"), col("rank"), col("adc_dist2"))
      .as[(Long, Long, Double)].collect()
    assert(ranked.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq, "PQ ranking must be deterministic")
  }

  test("trained PQ cuts quantization SSE vs the fixed codebook; recall measured") {
    import graft.queries.SimilarityQueries
    val v = vecs
    // Total quantization SSE: Σ_vectors Σ_subspaces min_c d²(sub, c) —
    // the objective Lloyd minimizes. Trained starts FROM the fixed
    // codebook (first-16 init), and neither Lloyd step can increase the
    // objective, so trained ≤ fixed must hold EXACTLY (up to fp noise).
    def sse(cbs: Seq[Seq[(Long, Seq[Double], Double)]]): Double =
      (0 until SimilarityQueries.PqM).map { m =>
        val sub = SimilarityQueries.pqSub(m)
        val sn2 = norm2(sub)
        val minD2 = least(cbs(m).map { case (_, cent, cn2) =>
          (sn2 + lit(cn2)) - lit(2.0) * dot(sub, typedLit(cent))
        }: _*)
        v.agg(sum(minD2)).as[Double].collect().head
      }.sum
    val fixed = sse(SimilarityQueries.fixedCodebooks(v))
    val trained = sse(SimilarityQueries.trainedCodebooks(v))
    assert(trained <= fixed * (1 + 1e-12),
      s"Lloyd must not increase SSE: trained=$trained fixed=$fixed")
    assert(trained < fixed * 0.9,
      s"training should cut SSE materially here: trained=$trained fixed=$fixed")
    // recall@10 vs exact L2 for both variants (n12's evaluation pattern)
    def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      norm2(a) + norm2(b) - lit(2.0) * dot(a, b)
    val exact = vecs.filter(col("id") < 8)
      .select(col("id").as("qid"), col("emb").as("qemb"))
      .crossJoin(vecs)
      .withColumn("d2", sqDist(col("qemb"), col("emb")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d2"), col("id"))))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("id")).as[(Long, Long)].collect().toSet
    def recall(name: String): Double = {
      val got = SimilarityQueries.queries(name)(spark, sfDir)
        .select(col("query_id"), col("vec_id")).as[(Long, Long)]
        .collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val (rFixed, rTrained) = (recall("n11_pq_adc"), recall("n11b_pq_trained"))
    info(f"PQ recall@10: fixed=$rFixed%.3f trained=$rTrained%.3f " +
      f"(SSE ${fixed}%.1f -> ${trained}%.1f)")
    // recall isn't monotone in SSE in general; assert the trained variant
    // at least clears the fixed variant's documented floor
    assert(rTrained >= 0.25, s"trained PQ recall collapsed: $rTrained")
  }

  test("quantized rerank achieves high recall vs exact brute force") {
    val exact = bruteForceTopK(vecs.filter(col("id") < 4), vecs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val staged = quantizedRerankTopK(vecs.filter(col("id") < 4), vecs, 10, 50)
      .select("query_id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      staged.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9,
      f"int8 shortlist of 50 must keep recall@10 high, got $mean%.2f")
    // stage-2 scores are EXACT: every returned cos matches brute force
    val exactCos = bruteForceTopK(vecs.filter(col("id") < 4), vecs, 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val stagedCos = quantizedRerankTopK(vecs.filter(col("id") < 4), vecs, 10, 50)
      .select("query_id", "nbr_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    stagedCos.foreach { case (q, n, c) =>
      exactCos.get((q, n)).foreach(e => assert(e == c,
        s"rerank cosine must be the exact score: ($q,$n) $c vs $e")) }
  }

  test("label kNN graph equals per-label brute force") {
    val labeled = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), toDouble(col("embedding")).as("emb"),
        col("label").as("list_id"))
    val graph = labelKnnGraph(labeled, 3)
      .select("src_id", "rank", "nbr_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    // brute-force the same graph one label at a time (exact ground truth)
    val perLabel = labeled.select("list_id").distinct().as[Int].collect()
      .flatMap { lb =>
        val part = labeled.filter(col("list_id") === lb)
        bruteForceTopK(part, part, 3)
          .select(col("query_id").as("src_id"), col("rank"),
            col("neighbor_id").as("nbr_id"), col("cos_sim"))
          .as[(Long, Long, Long, Double)].collect()
      }.toSet
    assert(graph == perLabel, "partitioned kNN graph must match ground truth")
    assert(graph.nonEmpty)
  }

  test("near-dup pairs are symmetric-free (a<b) and above threshold") {
    val pairs = cosineNearDupPairs(vecs.limit(200), 0.5)
      .select("id_a", "id_b", "cos_sim").as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 < p._2))
    assert(pairs.forall(p => p._3 >= 0.5))
  }

  test("k-means: every vector assigned, ≤k clusters, Lloyd SSE non-increasing") {
    val n = vecs.count()
    def sse(iters: Int): Double =
      kmeansAssign(vecs, 8, iters)
        .agg(sum(col("d2"))).as[Double].head()
    val a2 = kmeansAssign(vecs, 8, 2)
      .select("id", "cluster").as[(Long, Long)].collect()
    assert(a2.length == n, "every vector gets exactly one assignment")
    assert(a2.map(_._2).distinct.length <= 8)
    val sses = Seq(sse(0), sse(1), sse(2))
    assert(sses.zip(sses.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"Lloyd iterations must not increase total SSE: $sses")
  }

  test("multi-probe LSH recall dominates the single-probe same-table form") {
    import graft.queries.SimilarityQueries.{NumQueries, K, Planes, Dims}
    val qs = vecs.filter(col("id") < NumQueries)
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = hits(bruteForceTopK(qs, vecs, K))
    val single = hits(lshTopK(qs, vecs, K, tables = 1, Planes, Dims))
    val multi = hits(multiProbeTopK(qs, vecs, K, Planes, Dims))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }
    // probing bucket 0 is part of the probe set → candidates are a
    // superset per query, so recall can only go up; on this corpus it
    // must go STRICTLY up (asserted so a probe-generation bug that
    // silently yields only the original bucket fails loudly)
    exact.keys.foreach { q =>
      assert(single.getOrElse(q, Set.empty).subsetOf(
        multi.getOrElse(q, Set.empty) ++ single.getOrElse(q, Set.empty)))
    }
    val (rs, rm) = (recall(single), recall(multi))
    assert(rm >= rs, s"multi-probe recall $rm must be >= single-probe $rs")
    assert(rm > rs, s"multi-probe must strictly improve recall here ($rs -> $rm)")
  }

  test("d23 SemDeDup pairs = exact near-dup pairs restricted to same cluster") {
    import graft.queries.SimilarityQueries.{KmK, KmIters, SemTau}
    // The cluster filter is the ONLY approximation SemDeDup makes: its
    // within-cluster pair set must equal the exhaustive τ-pair set
    // intersected with "same final k-means cluster" — no pair gained,
    // none lost inside a cluster.
    val assigned = kmeansAssign(vecs, KmK, KmIters).select(col("id"), col("cluster"))
    val exact = cosineNearDupPairs(vecs, SemTau)
      .join(assigned.withColumnRenamed("id", "id_a")
        .withColumnRenamed("cluster", "ca"), "id_a")
      .join(assigned.withColumnRenamed("id", "id_b")
        .withColumnRenamed("cluster", "cb"), "id_b")
      .filter(col("ca") === col("cb"))
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val semPairs = graft.SparkEntry.queries("d23_semdedup")(spark, sfDir)
      .select(col("kept_id"), col("removed_id"))
    // d23 groups pairs by removed_id; recover the pair set from a rerun of
    // the ungrouped join to compare apples to apples
    val v = vecs
    val a = v.join(assigned, "id").select(col("cluster"), col("id").as("id_a"),
      col("emb").as("emb_a"), norm2(col("emb")).as("n2_a"))
    val b = v.join(assigned, "id").select(col("cluster").as("cb"),
      col("id").as("id_b"), col("emb").as("emb_b"), norm2(col("emb")).as("n2_b"))
    val within = a.join(b, col("cluster") === col("cb") && col("id_a") < col("id_b"))
      .withColumn("cos", cosine(dot(col("emb_a"), col("emb_b")),
        col("n2_a"), col("n2_b")))
      .filter(col("cos") >= SemTau)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(within == exact, "within-cluster pairs must equal cluster-restricted exact pairs")
    // and every removed doc in d23 is the larger id of at least one such pair
    val removed = semPairs.select("removed_id").as[Long].collect().toSet
    assert(removed == within.map(_._2), "removed set = {larger ids of τ-pairs}")
  }

  test("n14b residual IVFADC: in-list recall vs raw-vector codes, measured") {
    import graft.queries.SimilarityQueries
    import graft.queries.SimilarityQueries.{KmK, KmIters, NumQueries}
    // Ground truth RESTRICTED to each query's probed lists (the coarse
    // gate is shared by n14 and n14b — only the code quality differs, so
    // the in-gate comparison isolates exactly the residual-encoding
    // claim). Recall here = |ADC top-10 ∩ exact in-gate top-10| / 10.
    val (cents, assigned) = kmeansFit(vecs, KmK, KmIters)
    val cluster = assigned.select(col("id"), col("cluster"))
      .as[(Long, Long)].collect().toMap
    val cent = cents.select(col("cid"), col("cent"))
      .as[(Long, Seq[Double])].collect()
    val all = vecs.as[(Long, Seq[Double])].collect()
    val qs = all.filter(_._1 < NumQueries)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exactInGate = qs.map { case (qid, qemb) =>
      val probed = cent.map { case (cid, c) => (cos(qemb, c), cid) }
        .sortBy { case (cs, cid) => (-cs, cid) }.take(2).map(_._2).toSet
      qid -> all.filter { case (id, _) =>
          id != qid && probed.contains(cluster(id)) }
        .map { case (id, e) => (d2(qemb, e), id) }
        .sortBy(identity).take(10).map(_._2).toSet
    }.toMap
    def recall(name: String): Double = {
      val got = SimilarityQueries.queries(name)(spark, sfDir)
        .select(col("query_id"), col("vec_id")).as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val hits = exactInGate.map { case (q, truth) =>
        truth.intersect(got.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / exactInGate.values.map(_.size).sum
    }
    val (raw, res) = (recall("n14_ivfpq"), recall("n14b_ivfpq_residual"))
    info(f"IVFADC in-gate recall@10: raw-codes=$raw%.3f residual-codes=$res%.3f")
    assert(res >= 0.25, s"residual IVFADC recall collapsed: $res")
    // structural: per-query output confined to its probed lists, self-free
    val out = SimilarityQueries.queries("n14b_ivfpq_residual")(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    val probedOf = qs.map { case (qid, qemb) =>
      qid -> cent.map { case (cid, c) => (cos(qemb, c), cid) }
        .sortBy { case (cs, cid) => (-cs, cid) }.take(2).map(_._2).toSet
    }.toMap
    out.foreach { case (qid, vid) =>
      assert(vid != qid && probedOf(qid).contains(cluster(vid)),
        s"q$qid returned $vid outside its gate")
    }
  }

  test("n14 IVFADC: results confined to probed lists, self-free, ADC-ordered") {
    import graft.queries.SimilarityQueries.{KmK, KmIters, NumQueries}
    val (cents, assigned) = kmeansFit(vecs, KmK, KmIters)
    val out = graft.SparkEntry.queries("n14_ivfpq")(spark, sfDir)
      .select("query_id", "rank", "vec_id", "adc_dist2")
      .as[(Long, Int, Long, Double)].collect()
    val cluster = assigned.select(col("id"), col("cluster"))
      .as[(Long, Long)].collect().toMap
    // per-query probed lists: top-2 centroid cosine, ties to smaller cid —
    // recomputed here independently of the serving path
    val cent = cents.select(col("cid"), col("cent"))
      .as[(Long, Seq[Double])].collect()
    val q = vecs.filter(col("id") < NumQueries)
      .as[(Long, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val probed = q.map { case (qid, emb) =>
      qid -> cent.map { case (cid, c) => (cos(emb, c), cid) }
        .sortBy { case (cs, cid) => (-cs, cid) }.take(2).map(_._2).toSet
    }.toMap
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.forall(_._3 != qid), "self must be excluded")
      assert(rows.forall(r => probed(qid).contains(cluster(r._3))),
        s"q$qid returned a vector outside its probed lists")
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "ADC distance must be non-decreasing in rank")
    }
  }
}
