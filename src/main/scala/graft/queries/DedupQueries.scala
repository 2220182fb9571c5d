package graft.queries

import graft.Tables
import graft.ops.DedupOps._
import graft.ops.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication queries over `documents`, each with a bit-exact DuckDB
  * oracle (shared md5 hash family — see [[graft.ops.DedupOps]]).
  *
  * d2 (MinHash+LSH) is the 100 TB path: cost is linear in corpus size plus a
  * band-bucket equi-join. d4 (exact Jaccard) is its small-scale ground
  * truth. */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  // The engine's standard dedup knobs live with the persisted artifacts
  // ([[graft.ops.DedupIndex]]) — aliased here so query bodies and the
  // index builder cannot drift apart.
  val NumHashes = graft.ops.DedupIndex.NumHashes
  val Bands = graft.ops.DedupIndex.Bands
  val RowsPerBand = graft.ops.DedupIndex.RowsPerBand
  val JaccardTau = 0.5

  /** d39's (bands, rowsPerBand) sweep — every split of the 16-hash
    * signature. */
  val LshConfigs: Seq[(Int, Int)] = Seq((8, 2), (4, 4), (2, 8))

  /** S-curve catch probability 1−(1−τ^r)^b at s = [[JaccardTau]], exact
    * integer ppm (floor at each multiply) — computed at plan-build time
    * and embedded as the SAME literal in both engines. */
  def sCurvePpm(b: Int, r: Int): Long = {
    def powPpm(x: Long, n: Int): Long =
      (1 to n).foldLeft(1000000L)((acc, _) => acc * x / 1000000L)
    1000000L - powPpm(1000000L - powPpm((JaccardTau * 1000000L).toLong, r), b)
  }
  /** d43 winnowing knobs: 4-token k-grams, window sweep, and the MOSS
    * boilerplate cap (fingerprints in more docs than this are dropped
    * before pairing — bounds every hash bucket's pair fan-out). */
  val WinWs: Seq[Int] = Seq(4, 8, 16)
  val WinMaxDocs = graft.ops.DedupIndex.WinMaxDocs

  val ContainTau = 0.6
  val MaxHamming = graft.ops.DedupIndex.MaxHamming
  val PageRankIters = 3
  val EditK = 4  // PassJoin threshold: k+1 segments, min doc length 47 ≫ 5
  val KCoreK = 3      // k-core threshold (d25)
  val KCoreRounds = 3 // fixed peel rounds, unrolled in the oracle
  val SpanL = 16      // d26 repeated-substring window length (tokens)
  val SpanC = 50      // d26b window length in CHARACTERS (Lee et al.'s unit)
  val WJTauBp = 4000  // d28 weighted-Jaccard keep threshold (basis points)
  val LpaRounds = 3   // d29 fixed synchronous label-propagation rounds
  val SpanMargin = 3  // d37 excision dilation: tokens removed around a hit

  private def docs(s: SparkSession, d: String) =
    Tables.fanout(Tables.documents(s, d))

  /** Exact triangle count of an undirected `(doc_a < doc_b)` edge list via
    * the degree-ordered orientation (see d8b): 1-row result
    * `(n_triangles)`. Callers pass a materialized (checkpointed) edge
    * frame — this plan references it 4 times. */
  private def degreeOrientedTriangles(edges: DataFrame): DataFrame = {
    val deg = edges
      .select(explode(array(col("doc_a"), col("doc_b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // rank(v) = (deg, id): total order, ties broken by id; flat boolean
    // form (no struct allocation inside the codegen'd comparison).
    val da = deg.select(col("v").as("doc_a"), col("deg").as("deg_a"))
    val db = deg.select(col("v").as("doc_b"), col("deg").as("deg_b"))
    val aLower = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("doc_a") < col("doc_b"))
    val dir = edges.join(da, "doc_a").join(db, "doc_b")
      .select(
        when(aLower, col("doc_a")).otherwise(col("doc_b")).as("src"),
        when(aLower, col("doc_b")).otherwise(col("doc_a")).as("dst"),
        when(aLower, col("deg_b")).otherwise(col("deg_a")).as("deg_dst"))
      .transform(graft.Tables.stage)
    val e1 = dir.select(col("src").as("u"), col("dst").as("v"), col("deg_dst").as("dv"))
    val e2 = dir.select(col("src").as("u"), col("dst").as("w"), col("deg_dst").as("dw"))
    val closing = dir.select(col("src").as("v2"), col("dst").as("w2"))
    // Wedge-join exchanges PINNED on the join key (the d9b/d5 lesson):
    // the staged edge list is a few MB, so AQE's byte-based coalesce ran
    // the wedge expansion — whose OUTPUT is p²·wedges rows, not its
    // input size — on a single task (measured: a 4.3 s one-task stage
    // under d8d at sf0.1, 75% of the query). REPARTITION_BY_NUM keeps
    // all cores on the expansion; the closing join's exchange is left to
    // AQE, which sizes it from the wedge join's real output stats.
    val p = edges.sparkSession.sparkContext.defaultParallelism
    e1.repartition(p, col("u"))
      .join(e2.repartition(p, col("u")), Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .join(closing, col("v") === col("v2") && col("w") === col("w2"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Collapsed-class analytics graph: one node per distinct SimHash
    * (min-id representative), edges = hamming ≤ [[MaxHamming]] pairs
    * between distinct sketches — the executable form of "collapse
    * duplicate components before graph analytics" (see the d9r query
    * scaladoc for measured reductions). SERVED from the persisted
    * [[graft.ops.DedupIndex]] artifacts: the collapse and its banded
    * pair join run ONCE per corpus inside the index build, not once per
    * residual-family report (round-10's headline re-derived this graph
    * in 7 query bodies). Bit parity with the old in-query build is
    * asserted in `DedupIndexSpec`. */
  private def residualClassGraph(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val ix = graft.ops.DedupIndex.ensure(s, d)
    (graft.ops.DedupIndex.classesDf(s, ix),
      graft.ops.DedupIndex.classEdgesDf(s, ix)
        .select(col("doc_a"), col("doc_b")))
  }

  private def residualClassEdges(s: SparkSession, d: String): DataFrame =
    residualClassGraph(s, d)._2

  /** Full-doc-graph SimHash near-dup edges, served from the persisted
    * [[graft.ops.DedupIndex]] (d5 — the oracle-gated builder-path
    * validator — keeps the from-scratch chain). */
  private def servedEdges(s: SparkSession, d: String): DataFrame = {
    val ix = graft.ops.DedupIndex.ensure(s, d)
    graft.ops.DedupIndex.edgesDf(s, ix).select(col("doc_a"), col("doc_b"))
  }

  /** d7's component labels (doc_id, canon_id), served from the persisted
    * [[graft.ops.DedupIndex]] (d7/d33/d35 — the three independent CC
    * validators — keep their from-scratch chains). */
  private def servedCanonical(s: SparkSession, d: String): DataFrame =
    graft.ops.DedupIndex.canonicalDf(s, graft.ops.DedupIndex.ensure(s, d))

  /** MinHash-LSH candidate pairs at the engine knobs, served from the
    * persisted [[graft.ops.DedupIndex]] (d2 keeps the from-scratch
    * chain as the builder's oracle gate). */
  private def servedCandidates(s: SparkSession, d: String): DataFrame =
    graft.ops.DedupIndex.candidatesDf(s, graft.ops.DedupIndex.ensure(s, d))

  /** d9's exact per-node stats (degree / non-adjacent 2-hop reach /
    * triangles) over an undirected `(doc_a < doc_b)` edge list, guarded
    * by the wedge budget ([[graft.ops.DedupOps.requireWedgeBudget]]). */
  private def exactGraphStats(pairs: DataFrame, op: String): DataFrame = {
    val edges = pairs.transform(graft.Tables.stage)
    val adj = edges
      .union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("u", "v")
    graft.ops.DedupOps.requireWedgeBudget(adj, budget = 200000000L, op = op)
    // The wedge-expansion joins are byte-light (2 longs/row) but each
    // input row fans out wedge-fold, so AQE's byte-based coalesce plans
    // them onto ONE task (measured: a single 3.6 s straggler on d9r's
    // 11.5M-wedge residual graph). Pin both sides of each expansion on
    // the join key — the d9b/d5 discipline.
    val p = pairs.sparkSession.sparkContext.defaultParallelism
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("degree"))
    val hop2 = adj.toDF("u", "mid").repartition(p, col("mid"))
      .join(adj.toDF("mid", "v").repartition(p, col("mid")), "mid")
      .filter(col("v") =!= col("u"))
      .select(col("u"), col("v")).distinct()
      .join(adj, Seq("u", "v"), "left_anti")
      .groupBy(col("u")).agg(count(lit(1)).as("n_2hop"))
    val tri = adj.toDF("u", "v1").repartition(p, col("u"))
      .join(adj.toDF("u", "v2").repartition(p, col("u")), "u")
      .filter(col("v1") < col("v2"))
      .join(edges, col("v1") === col("doc_a") && col("v2") === col("doc_b"))
      .groupBy(col("u")).agg(count(lit(1)).as("n_tri"))
    deg.join(hop2, Seq("u"), "left").join(tri, Seq("u"), "left")
      .select(col("u").as("doc_id"), col("degree"),
        coalesce(col("n_2hop"), lit(0L)).as("n_2hop"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing fingerprints at the persisted w=8 grain, served from
    * [[graft.ops.DedupIndex]] — d44/d45's position-aware candidate leg.
    * d43 (the w-sweep trainer) keeps the from-scratch
    * [[graft.ops.DedupOps.winnowKgrams]]/[[graft.ops.DedupOps.winnowFps]]
    * chain: it is to this artifact what n14's training is to n15's
    * serving. */
  private def servedWinnowFp8(s: SparkSession, d: String): DataFrame =
    graft.ops.DedupIndex.winnowFpDf(s, graft.ops.DedupIndex.ensure(s, d))

  val queries: Map[String, Q] = Map(
    // Exact dedup: content-hash groupBy; keeper = min doc_id. At scale:
    // hash-partitioned shuffle on a 32-hex key — perfectly distributed.
    "d1_exact_dedup" -> ((s, d) => {
      docs(s, d)
        .groupBy(md5(col("text").cast("binary")).as("content_md5"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_id"))
    }),

    // MinHash + LSH banding: signatures computed per-row (no shuffle),
    // candidate pairs from band-bucket collisions, then exact-Jaccard
    // verification of the candidates only (array set-ops, no corpus-wide
    // explode).
    "d2_minhash_lsh" -> ((s, d) => {
      val arr = shingleArrays(docs(s, d))
      val sig = minhashSignatureNarrow(arr, NumHashes)
      val pairs = candidatePairs(lshBands(sig, Bands, RowsPerBand))
      jaccardVerifyArrays(pairs, arr)
        .filter(col("jaccard") >= JaccardTau)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("union_sz"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // SimHash sketch per document (oracle-checked bit-for-bit).
    "d3_simhash" -> ((s, d) => {
      docs(s, d)
        .withColumn("hs", tokenHashes(tokens(col("text"))))
        .select(col("doc_id"), simhash32(col("hs")).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // Exact n-gram (3-shingle) Jaccard pairs ≥ tau — LSH-free ground truth.
    "d4_ngram_jaccard" -> ((s, d) => {
      exactJaccardPairs(explodedShingles(docs(s, d)), JaccardTau)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("union_sz"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Exact Jaccard ≥ tau via PREFIX FILTERING (PPJoin) — the scalable
    // EXACT path between d2's probabilistic LSH and d4's quadratic truth:
    // rare-first prefixes indexed, candidates from a prefix equi-join,
    // array verify on candidates only. Shares d4's oracle text, so a green
    // row proves the prefix filter is complete, not just fast.
    "d20_ppjoin" -> ((s, d) => {
      ppJoinPairs(docs(s, d), JaccardTau)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("union_sz"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Term-frequency WEIGHTED Jaccard near-dup pairs: d2's LSH candidates,
    // verified with the multiset score Σmin(tf)/Σmax(tf) instead of the
    // set score — a doc that repeats a template 10× is no longer
    // indistinguishable from one containing it once. Candidates are the
    // SAME band join as d2 (the oracle mirrors it), so this row costs one
    // extra tf groupBy over d2; the verify join is candidate-bounded.
    // Integer basis points end-to-end — no doubles anywhere.
    "d28_weighted_jaccard" -> ((s, d) => {
      val ds = docs(s, d)
      val pairs = servedCandidates(s, d)
      weightedJaccardVerify(pairs, ds)
        .filter(col("wjacc_bp") >= WJTauBp)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Label-propagation communities (Raghavan et al. 2007) over the
    // SimHash-Hamming graph — d7's reachability components split into
    // DENSELY-connected communities: each node adopts its neighbors'
    // majority label (tie → min) for LpaRounds synchronous rounds. Fixed
    // rounds + deterministic tie-break ⇒ the oracle is the same rounds
    // unrolled as CTEs (the d15 PageRank contract, argmax instead of mass).
    // Each round is one |E|-row shuffle + a per-node top-1 window; the
    // quadratic terms of this 41%-dense graph never appear. Bench: kept in
    // the headline — 3 bounded rounds, unlike d7's fixpoint driver loop.
    "d29_label_propagation" -> ((s, d) => {
      val ds = docs(s, d)
      val pairs = servedEdges(s, d)
      labelPropagation(pairs, ds.select(col("doc_id")), LpaRounds,
        assumeDistinct = true)
        .select(col("doc_id"), col("lbl").as("community"))
        .orderBy(col("doc_id"))
    }),

    // Dedup groups: connected components over the exact-Jaccard pair graph —
    // every doc mapped to its canonical keeper (smallest doc_id in its
    // near-dup component); the step that turns pair lists into a deduped
    // corpus.
    "d6_dedup_groups" -> ((s, d) => {
      val ds = docs(s, d)
      val pairs = exactJaccardPairs(explodedShingles(ds), JaccardTau)
        .select(col("doc_a"), col("doc_b"))
      connectedComponents(pairs, ds.select(col("doc_id")))
        .orderBy(col("doc_id"))
    }),

    // SimHash near-dup pairs via byte-band candidates + Hamming filter.
    "d5_simhash_pairs" -> ((s, d) => {
      val df = docs(s, d).withColumn("hs", tokenHashes(tokens(col("text"))))
      simhashPairs(simhashBands(df, simhash32(col("hs"))), MaxHamming)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Triangle count over the SimHash near-dup graph — the cluster-cohesion
    // statistic (triangles/edges distinguishes tight duplicate cliques from
    // chains of borderline pairs). The a<b edge orientation makes every
    // triangle a<b<c enumerate EXACTLY once from its lowest vertex (the
    // "forward" algorithm); three equi-joins, each shuffling edge keys.
    // Edges are localCheckpoint'd once: three self-join sides + two counts
    // must not re-run the sketch pipeline. Bench-excluded like d4/d6/d7:
    // the id orientation makes a min-id hub of a k-clique fan out k², so
    // sf0.1's dense cliques enumerate quadratically — d8b below is the
    // degree-ordered production form; THIS is its ground-truth cross-check.
    "d8_triangle_count" -> ((s, d) => {
      val edges = servedEdges(s, d).transform(graft.Tables.stage)
      val nNodes = edges
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .agg(countDistinct(col("doc_id")).as("n_nodes"))
      val nEdges = edges.agg(count(lit(1)).as("n_edges"))
      val e2 = edges.select(col("doc_a").as("b2"), col("doc_b").as("c2"))
      val e3 = edges.select(col("doc_a").as("a3"), col("doc_b").as("c3"))
      val tri = edges
        .join(e2, col("doc_b") === col("b2"))
        .join(e3, col("doc_a") === col("a3") && col("c2") === col("c3"))
        .agg(count(lit(1)).as("n_triangles"))
      nNodes.crossJoin(nEdges).crossJoin(tri)
    }),

    // Scale-safe triangle count: SAME graph and SAME answer as d8, but with
    // edges re-oriented from their lower-(degree, id) endpoint to the higher
    // one before the wedge join. Every triangle still enumerates exactly
    // once (from its minimum-rank vertex), and per-vertex join fan-out drops
    // from deg² to out-deg²: under degree orientation out-deg is bounded by
    // O(sqrt(|E|)) for ANY graph (a vertex with out-deg k has k neighbors of
    // degree ≥ its own, so k² ≤ 2|E|), which is what makes triangle counting
    // survive the power-law hubs and dense duplicate cliques of a 100 TB
    // near-dup graph — a k-clique's wedges spread over all k vertices
    // instead of piling onto its min-id member. Cost: one extra degree agg
    // + two |E|-row hash equi-joins to attach ranks — all linear shuffles.
    // Still bench-excluded alongside d8: exact triangle counting is
    // OUTPUT-bound (this corpus's sf0.1 graph: 4661 nodes / 2.15M edges /
    // 880M triangles — 41% pair density; DuckDB takes 105s for the same
    // enumeration), and orientation fixes the straggler, not the output.
    // At 100 TB run it AFTER d7 collapses duplicate components.
    "d8b_triangle_degree" -> ((s, d) => {
      val edges = servedEdges(s, d).transform(graft.Tables.stage)
      val nNodes = edges
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .agg(countDistinct(col("doc_id")).as("n_nodes"))
      val nEdges = edges.agg(count(lit(1)).as("n_edges"))
      nNodes.crossJoin(nEdges).crossJoin(degreeOrientedTriangles(edges))
    }),

    // Component-decomposed triangle count: split into connected components
    // (pointer doubling, O(log diameter) rounds), sum the C(k,3) closed
    // form over components that ARE cliques (m == k(k-1)/2 — exact-dup
    // clusters always are; no enumeration at any size), and run the
    // degree-ordered enumeration (d8b) only on the non-clique residual.
    // Same answer as d8/d8b (one shared oracle). Honest measured caveat:
    // THIS corpus's Hamming-≤3 graph concentrates into one giant
    // NEAR-clique component (sf0.01: 90 comps, 83 singletons, 4 true
    // cliques, and 21 219 of 21 223 edges in a single 403-node component
    // at 26% density), so here the residual dominates and d8c ≈ d8b + CC
    // cost — the shortcut pays off on real corpora where exact/near-exact
    // duplicate clusters close into cliques, not on this one. The
    // complement trick (enumerate the sparse complement for >50%-dense
    // components) doesn't help either at 26-41% density. All three d8
    // forms therefore stay bench-excluded: 880M output rows at sf0.1 is
    // inherent. (k ≤ ~2M keeps k³ in a long.)
    "d8c_triangle_cliques" -> ((s, d) => {
      val edges = servedEdges(s, d).transform(graft.Tables.stage)
      val nodes = edges
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val nNodes = nodes.agg(count(lit(1)).as("n_nodes"))
      val nEdges = edges.agg(count(lit(1)).as("n_edges"))
      val comp = connectedComponents(edges, nodes, uncheckedRounds = 2)
      val kPer = comp.groupBy(col("canon_id")).agg(count(lit(1)).as("k"))
      val ec = edges.join(comp.toDF("doc_a", "canon_id"), "doc_a")
      val mPer = ec.groupBy(col("canon_id")).agg(count(lit(1)).as("m"))
      val cliques = kPer.join(mPer, "canon_id")
        .filter(col("m") * lit(2) === col("k") * (col("k") - lit(1)))
      val cliqueTri = cliques
        .agg(coalesce(sum(expr("k * (k - 1) * (k - 2) DIV 6")), lit(0L))
          .as("t_clique"))
      val residual = ec
        .join(cliques.select(col("canon_id")), Seq("canon_id"), "left_anti")
        .select(col("doc_a"), col("doc_b")).transform(graft.Tables.stage)
      val tri = cliqueTri.crossJoin(degreeOrientedTriangles(residual))
        .select((col("t_clique") + col("n_triangles")).as("n_triangles"))
      nNodes.crossJoin(nEdges).crossJoin(tri)
    }),

    // Approximate triangle count with BOUNDED work — the operator that
    // actually survives any density at 100 TB, where the exact forms
    // (d8/d8b/d8c) are output-bound. DOULION edge sampling (Tsourakakis et
    // al., KDD'09): keep each edge iff a DETERMINISTIC 60-bit md5 hash of
    // the pair ≡ 0 (mod 8) (p = 1/8 — the same hash family every dedup
    // operator here uses, so the DuckDB oracle reproduces the estimate
    // BIT-EXACTLY: no RNG, no tolerance band), count triangles on the
    // sample via the degree-ordered enumeration, scale by 1/p³ = 512
    // (integer math). Each triangle survives with probability p³ ⇒
    // unbiased; work drops from #triangles to p³·#triangles + p²·wedges
    // (sf0.1: 880M → ~1.7M join rows). Variance ~ 1/(p³·T): tiny for the
    // dense graphs where sampling is needed at all — exactly the regime
    // trade-off a planner wants.
    "d8d_triangle_doulion" -> ((s, d) => {
      val edges = servedEdges(s, d)
      val sampled = edges.filter(
        graft.ops.TextOps.hash60(
          concat(col("doc_a").cast("string"), lit("_"),
            col("doc_b").cast("string"))) % 8 === 0)
        .transform(graft.Tables.stage)
      val nSampled = sampled.agg(count(lit(1)).as("n_sampled_edges"))
      nSampled.crossJoin(degreeOrientedTriangles(sampled)
        .select((col("n_triangles") * lit(512L)).as("est_triangles")))
    }),

    // Per-node graph statistics over the near-dup graph: degree, 2-hop
    // reach (friends-of-friends not already adjacent), and triangles
    // through each node — the signals that rank a component's CANONICAL
    // keeper by centrality instead of min-id, all exact integers.
    // GROUND-TRUTH VALIDATOR for d9b: the 2-hop expansion materializes
    // Σdeg² intermediate rows (~4e9 on the dense sf0.1 synthetic graph),
    // so the builder now REFUSES fast above a wedge budget instead of
    // churning — run it after d7's component collapse, or use
    // d9b_graph_stats_sketch (the scale path). Bench-excluded like d4/d6-d8.
    "d9_graph_stats" -> ((s, d) => {
      exactGraphStats(servedEdges(s, d), "d9_graph_stats")
    }),

    // The post-collapse contract, EXECUTABLE (the Bench/d9b prose made it
    // advice; these three rows make it code): sketch-identical documents
    // (SimHash hamming 0 — the "duplicate component" relation) collapse to
    // one node each, and the near-dup analytics edges (hamming ≤
    // MaxHamming between DISTINCT sketches) connect the collapsed
    // classes. At sf0.1 the collapse takes 5 000 docs → 2 783 classes and
    // 2.15M doc edges → 57.6k class edges (37×); Σdeg² falls 4.0e9 →
    // 1.15e7, so the EXACT graph family fits its wedge budget again —
    // d9r runs to completion where d9 refuses fast. The collapse itself
    // is one map-side-combinable groupBy on the 8-byte sketch; the class
    // edge build is the same banded+salted join as d5 over the (smaller)
    // class table.
    "d9r_graph_stats_residual" -> ((s, d) => {
      exactGraphStats(residualClassEdges(s, d), "d9r_graph_stats_residual")
    }),

    // k-core peel on the collapsed class graph — the form a real pipeline
    // runs (d25 pays the pre-collapse clique blowup; here rounds cost
    // |class edges|). In the bench headline: bounded rounds, small graph.
    "d25r_kcore_residual" -> ((s, d) => {
      kcoreResidual(residualClassEdges(s, d), KCoreK, KCoreRounds)
        .orderBy(col("doc_id"))
    }),

    // Label-propagation communities on the collapsed class graph (d29's
    // production form): near-identical docs no longer vote as cliques, so
    // communities reflect BETWEEN-template structure.
    "d29r_lpa_residual" -> ((s, d) => {
      val (classes, edges) = residualClassGraph(s, d)
      labelPropagation(edges, classes.select(col("doc_id")), LpaRounds,
        assumeDistinct = true)
        .select(col("doc_id"), col("lbl").as("community"))
        .orderBy(col("doc_id"))
    }),

    // Scale-safe per-node graph stats — d9's replacement above the wedge
    // budget. Degree stays exact; the 2-hop ball is SKETCHED with per-node
    // HyperLogLog registers (q51's hash-decided construction, m=64 buckets,
    // so the DuckDB oracle reproduces every register and the estimate
    // BIT-EXACTLY); per-node triangles are DOULION-sampled (d8d's p=1/8
    // deterministic md5 edge sample, ×512 unbiased scale-up). Cost model
    // vs d9: the exact expansion is Σdeg² rows; here each node's neighbor
    // REGISTERS (≤64 cells) flow to its neighbors instead of its full
    // neighbor LIST, so the join is ≤ 64·2|E| rows — linear in edges with
    // a constant-64 factor (sf0.1: 4e9 → ~275M narrow rows), and the
    // triangle term drops to p²·wedges. Register semantics: node v hashes
    // identically everywhere (bucket = h60(v) % 64, rho from the next 32
    // bits), so max-merge across nodes is a true HLL set union; the union
    // of own + neighbors' 1-hop registers sketches ball₂(u) = {w :
    // dist(u,w) ≤ 2} ∪ {u}. ball2_est = α₆₄·m²/Σ2^(−rho) in pure integer
    // arithmetic: raw = 2⁴⁵ div denom (denom = Σ 2^(33−rho), empty
    // registers contribute 2³³), then α₆₄ applied as ×709340 div 10⁶ —
    // deterministic in both engines, ~13% HLL σ (1.04/√64). Callers
    // needing small-ball exactness have exact `degree` alongside.
    "d9b_graph_stats_sketch" -> ((s, d) => {
      val edges = servedEdges(s, d).transform(graft.Tables.stage)
      val adj = edges
        .union(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .toDF("u", "v")
      val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("degree"))
      // 1-hop registers in COLUMNAR form: one row per node, 64 register
      // COLUMNS (max rho per bucket; NULL = empty). Keeping registers as
      // columns instead of (u, bucket, rho) rows is the scale move: the
      // neighbor join below carries ONE row per directed edge rather than
      // 64, and every merge is a codegen'd partial-max hash aggregation —
      // map-side combine collapses each partition to ≤|V| rows before the
      // exchange, so the merge shuffle is 64× fewer rows than the row
      // form's. (Wall time at sf0.1 is ~equal — ~10.5 s both forms, edge
      // build and fixed stage costs dominate this graph size — the
      // columnar shape is chosen for its exchange volume at 100 TB.)
      val regCols = (0 until 64).map(b =>
        max(when(col("bucket") === b, col("rho"))).as(s"r$b"))
      // localCheckpoint: regs1 feeds BOTH the neighbor join and the union
      // below — without it the whole aggregation subtree plans twice.
      val regs1 = adj
        .select(col("u"), graft.ops.TextOps.hash60(col("v")).as("h"))
        .selectExpr("u", "h % 64 AS bucket", "(h DIV 64) % 4294967296 AS w")
        .selectExpr("u", "bucket",
          "CAST(CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END AS BIGINT) AS rho")
        .groupBy(col("u")).agg(regCols.head, regCols.tail: _*)
        .transform(graft.Tables.stage)
      // ball-2 union: own registers ∪ each neighbor's registers (u ∈ N(mid)
      // for mid ∈ N(u), so the union covers u, N(u), and exactly-2-hop).
      // Exchanges are PINNED on both join inputs (the d5/d20 lesson): the
      // adj side is byte-light (two longs/row) but every joined row fans
      // into 64 max-merges, so AQE's byte-based coalesce ran the join on 2
      // tasks (measured 2×5.9 s at sf0.1); repartition keeps all cores on
      // it. At 10⁹ nodes the same shuffle-join plan holds, still linear.
      val p = s.sparkContext.defaultParallelism
      val mergeCols = (0 until 64).map(b => max(col(s"r$b")).as(s"r$b"))
      val nbrRegs = adj.repartition(p, col("v"))
        .join(regs1.toDF("nv" +: regs1.columns.tail: _*)
          .repartition(p, col("nv")), col("v") === col("nv"))
        .select(col("u") +: (0 until 64).map(b => col(s"r$b")): _*)
      val denomExpr = (0 until 64)
        .map(b => s"shiftleft(CAST(1 AS BIGINT), CAST(33 - coalesce(r$b, 0) AS INT))")
        .mkString(" + ")
      val emptyExpr = (0 until 64)
        .map(b => s"CAST(r$b IS NULL AS INT)").mkString(" + ")
      val ball = nbrRegs
        .union(regs1.select(col("u") +: (0 until 64).map(b => col(s"r$b")): _*))
        .groupBy(col("u")).agg(mergeCols.head, mergeCols.tail: _*)
        .selectExpr("u", s"$denomExpr AS ball2_denom",
          s"CAST($emptyExpr AS BIGINT) AS ball2_empty")
        .selectExpr("u", "ball2_denom", "ball2_empty",
          s"(${1L << 45} DIV ball2_denom) * 709340 DIV 1000000 AS ball2_est")
      // DOULION per-node triangle estimate on the p=1/8 hash-sampled graph:
      // each surviving triangle credits its 3 vertices; ×512 = 1/p³.
      val sampled = edges.filter(
        graft.ops.TextOps.hash60(
          concat(col("doc_a").cast("string"), lit("_"),
            col("doc_b").cast("string"))) % 8 === 0)
        .transform(graft.Tables.stage)
      // wedge join pinned for the same reason as the register join: the
      // sampled edge list is a few MB but expands to p²·wedges rows
      val triEst = sampled.toDF("a", "b").repartition(p, col("b"))
        .join(sampled.toDF("b", "c").repartition(p, col("b")), "b")
        .join(sampled.toDF("a2", "c2"),
          col("a") === col("a2") && col("c") === col("c2"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("u"))
        .groupBy(col("u")).agg((count(lit(1)) * lit(512L)).as("est_tri"))
      deg.join(ball, Seq("u"), "left")
        .join(triEst, Seq("u"), "left")
        .select(col("u").as("doc_id"), col("degree"),
          col("ball2_denom"), col("ball2_empty"), col("ball2_est"),
          coalesce(col("est_tri"), lit(0L)).as("est_tri"))
        // NOT staged before the sort (unlike q79c): the heavy inputs
        // (edges/regs1/sampled) are already checkpointed above, so the
        // range-sampling re-eval repeats only the final merge — measured
        // within noise at sf0.1 — and a stage here would hide the four
        // pinned exchanges from PlanGuardSpec's AQE guard.
        .orderBy(col("doc_id"))
    }),

    // Asymmetric containment near-dup (quote/subset detection): the same
    // LSH candidates as d2, verified by inter/min(|A|,|B|) instead of
    // Jaccard — a short doc embedded in a long one scores ~1.0 here while
    // its Jaccard dilutes to ~|short|/|long|. Recall caveat shared with
    // every MinHash+containment combo: banding collides by JACCARD, so
    // extreme-ratio subsets need the long side's bands probed per shingle
    // window at scale.
    "d11_containment" -> ((s, d) => {
      val arr = shingleArrays(docs(s, d))
      val pairs = servedCandidates(s, d)
      containmentVerifyArrays(pairs, arr)
        .filter(col("containment") >= ContainTau)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"),
          col("n_b"), round(col("containment"), 4).as("containment"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Benchmark decontamination: flag TRAINING docs whose shingle mass
    // overlaps an eval/benchmark split (doc_id % 50 = 0 plays the held-out
    // set) — the test-set-leak scan every LLM data pipeline must run,
    // distinct from dedup: the question is overlap with a PROTECTED set,
    // not self-similarity. Exact shingle-keyed equi-join (no LSH needed —
    // it's train×benchmark, and the benchmark side is small → broadcast
    // at scale), flag on ≥3 shared distinct shingles — a 5-token verbatim
    // overlap, the classic n-gram-collision decontamination rule; the
    // emitted n_own/n_shared lets consumers apply stricter ratios.
    "d14_decontaminate" -> ((s, d) => {
      val sh = explodedShingles(docs(s, d))
      val benchPred = col("doc_id") % 50 === 0
      val train = sh.filter(!benchPred)
      val benchSh = sh.filter(benchPred)
        .select(col("sh"), col("doc_id").as("bench_id"))
      val own = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_own"))
      val stats = train.join(benchSh, "sh")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("sh")).as("n_shared"),
          countDistinct(col("bench_id")).as("n_bench_docs"))
      stats.join(own, "doc_id")
        .filter(col("n_shared") >= 3)
        .select(col("doc_id"), col("n_own"), col("n_shared"),
          col("n_bench_docs"))
        .orderBy(col("doc_id"))
    }),

    // Dedup savings report: per near-dup component (d7's SimHash graph),
    // how much the collapse buys — member count, total bytes, bytes saved
    // by keeping only the canonical doc. The number a 100 TB curation run
    // reports to justify itself; only multi-member components surface.
    "d21_dedup_savings" -> ((s, d) => {
      val ds = docs(s, d)
      val labels = servedCanonical(s, d)
      labels
        .join(ds.select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars")), "doc_id")
        .groupBy(col("canon_id"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("n_chars")).as("total_chars"),
          (sum(col("n_chars")) -
            max(when(col("doc_id") === col("canon_id"), col("n_chars"))))
            .as("saved_chars"))
        .filter(col("n_members") >= 2)
        .orderBy(col("canon_id"))
    }),

    // Verbatim quote detection: longest common TOKEN RUN per LSH candidate
    // pair, via diagonal run-length analysis — positional shingles of both
    // docs join on content, a match at (pa, pb) lies on diagonal pa−pb,
    // and k consecutive positions on one diagonal = a verbatim run of k+2
    // tokens. Distinguishes a QUOTE (one long run) from scattered phrase
    // reuse (many short runs) — d11's containment ratio can't tell them
    // apart. Work is bounded by candidate pairs × shared shingles.
    "d22_quote_runs" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ds = docs(s, d)
      val cand = servedCandidates(s, d).select(col("doc_a"), col("doc_b"))
      val posSh = ds.select(col("doc_id"),
          posexplode(shingles(tokens(col("text")), col("text")))
            .as(Seq("pos0", "sh")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("sh"))
      val m = cand
        .join(posSh.select(col("doc_id").as("doc_a"), col("pos").as("pa"),
          col("sh")), "doc_a")
        .join(posSh.select(col("doc_id").as("doc_b"), col("pos").as("pb"),
          col("sh")), Seq("doc_b", "sh"))
        .withColumn("diag", col("pa") - col("pb"))
      val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
        .orderBy(col("pa"))
      val runs = m.withColumn("grp", col("pa") - row_number().over(w))
        .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(max(col("run_len")).as("max_run"))
      val hits = m.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_hits"))
      runs.join(hits, Seq("doc_a", "doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("max_run") + 2).as("longest_run_tokens"), col("n_hits"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // LSH-layer quality evaluation: precision/recall of d2's raw band
    // candidates against the exact-Jaccard ground truth, in integer basis
    // points — the measurement that justifies (bands, rowsPerBand) before
    // a 100 TB run, produced by the engine itself. Contains the quadratic
    // exact truth, so it lives with the d4/d6 validators: bench-excluded,
    // run at small SF to tune, then trust the bound at scale.
    "d19_lsh_quality" -> ((s, d) => {
      val ds = docs(s, d)
      val arr = shingleArrays(ds)
      val cand = candidatePairs(lshBands(
          minhashSignatureNarrow(arr, NumHashes), Bands, RowsPerBand))
        .select(col("doc_a"), col("doc_b"))
      val truth = exactJaccardPairs(explodedShingles(ds), JaccardTau)
        .select(col("doc_a"), col("doc_b"))
      val hit = cand.join(truth, Seq("doc_a", "doc_b"))
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        // nullif on BOTH engines: Spark's div would yield NULL on an empty
        // candidate/truth set while DuckDB's // raises — making the guard
        // explicit keeps degenerate corpora engine-symmetric (NULL).
        .withColumn("precision_bp",
          expr("(n_hit * 10000) div nullif(n_candidates, 0)"))
        .withColumn("recall_bp",
          expr("(n_hit * 10000) div nullif(n_truth, 0)"))
    }),

    // Contamination-radius traversal: multi-source BFS hop levels from
    // flagged seed docs (doc_id % 100 = 0) over the SimHash near-dup
    // graph — "everything within k near-dup hops of a known-bad source".
    // Frontier-expansion rounds against the once-persisted edge list;
    // oracle is a DuckDB recursive CTE over the same d5 edges. Not in the
    // bench headline: the iterative driver loop puts it with d7's CC, and
    // real pipelines run it after the component collapse anyway.
    "d13_bfs_levels" -> ((s, d) => {
      val ds = docs(s, d)
      val edges = servedEdges(s, d)
      val seeds = ds.select(col("doc_id")).filter(col("doc_id") % 100 === 0)
      bfsLevels(edges, seeds, maxIters = 6).orderBy(col("doc_id"))
    }),

    // Exact repeated-substring spans (the Lee et al. 2022 "Deduplicating
    // Training Data Makes Language Models Better" objective, shingled):
    // every stride-1 SpanL-token window is content-hashed; windows whose
    // content occurs ≥2× anywhere in the corpus are duplicate instances;
    // consecutive duplicate window starts merge into maximal spans (the
    // pos − row_number run trick), whose token length is run + SpanL − 1.
    // This is what the suffix-array pass computes, re-expressed in two
    // hash aggs + one doc-keyed window: d24 sees only aligned 32-token
    // chunks and d22 only LSH-candidate pairs; this catches EVERY ≥SpanL
    // verbatim overlap corpus-wide. Scale shape: |tokens| window rows
    // carrying 8-byte hashes (same cardinality as d18's shingle table),
    // one map-side-combinable count, one join back, one doc-keyed window
    // whose skew equals doc length. Per doc: duplicate-window count,
    // span count, longest span.
    "d26_repeated_spans" -> ((s, d) => {
      repeatedSpans(docs(s, d), SpanL).orderBy(col("doc_id"))
    }),

    // Character-level repeated spans — the same Lee et al. objective at
    // the paper's actual granularity (50-char substrings of the raw
    // text). Catches verbatim overlap that d26's tokenizer normalizes
    // away (collapsed whitespace, sub-token boundaries). Window table is
    // |chars| rows of (doc_id, pos, 8-byte hash); same cost family as
    // d26/d18, one map-side-combinable count + one doc-keyed window.
    "d26b_repeated_char_spans" -> ((s, d) => {
      repeatedCharSpans(docs(s, d), SpanC).orderBy(col("doc_id"))
    }),

    // k-core peeling (bounded rounds): the dense-subgraph membership
    // signal over the SimHash near-dup graph — nodes surviving the k=3
    // peel belong to template families where EVERY member has ≥3 similar
    // peers (chains and stars peel away; d8's triangles count closure,
    // this isolates the mutually-dense cores a curation pass samples
    // down). Residual per-node degree after KCoreRounds rounds; fixed
    // rounds ⇒ the DuckDB oracle is the same peel unrolled as CTEs.
    // Bench-excluded like d13/d15: iterative driver loop, run after d7's
    // component collapse in a real pipeline.
    "d25_kcore" -> ((s, d) => {
      kcoreResidual(servedEdges(s, d), KCoreK, KCoreRounds)
        .orderBy(col("doc_id"))
    }),

    // PageRank UNDER THE ORACLE GATE: integer parts-per-billion fixed
    // point makes every iteration bit-exact and summation-order-free
    // (pageRank's double form is spec-only for exactly that reason), so
    // the DuckDB oracle is the same 3 iterations unrolled as CTEs. The
    // centrality signal for choosing canonical keepers beyond raw degree.
    // Bench-excluded like d13: iterative driver loop over the near-dup
    // graph; runs after d7's component collapse in a real pipeline.
    "d15_pagerank" -> ((s, d) => {
      val ds = docs(s, d)
      val edges = servedEdges(s, d)
      pageRankExact(edges, ds.select(col("doc_id")), PageRankIters)
        .orderBy(col("doc_id"))
    }),

    // Exact edit-distance similarity join (lev ≤ 4) via PassJoin segment
    // partitioning — catches character-level near-dups (typo/OCR variants)
    // that token-set methods (d2/d5) miss and that t18's predecessor
    // screen only samples. The oracle is the naive all-pairs algorithm
    // (with the exact |len diff| ≤ k prefilter), so agreement proves the
    // segment windows are COMPLETE, not just sound.
    "d16_editdist_join" -> ((s, d) => {
      editDistancePairs(docs(s, d), EditK)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Personalized PageRank from d13's seed set: stationary mass measures
    // proximity to known-bad sources through ALL paths (d13's BFS answers
    // "how many hops"; this answers "how much flow"). Same fixed-point
    // integer arithmetic as d15 ⇒ same unrolled-CTE oracle, with seed-
    // gated initial mass and teleport. Bench-excluded (driver loop).
    "d17_personalized_ppr" -> ((s, d) => {
      val ds = docs(s, d)
      val edges = servedEdges(s, d)
      personalizedPageRankExact(edges, ds.select(col("doc_id")),
          PageRankIters, seed = col("doc_id") % 100 === 0)
        .orderBy(col("doc_id"))
    }),

    // Per-document n-gram novelty: what fraction of a doc's distinct
    // 3-shingles appear in NO other document (integer basis points — the
    // t24 div pattern). The training-mix diversity signal: low-novelty
    // docs are boilerplate already covered by the corpus; high-novelty
    // docs carry new content. Two shingle-keyed aggs, both map-side
    // combining; df table is vocabulary-sized.
    "d18_ngram_novelty" -> ((s, d) => {
      val sh = explodedShingles(docs(s, d))
      val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      sh.join(df, "sh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .withColumn("novelty_bp", expr("(n_unique * 10000) div n_shingles"))
        .orderBy(col("doc_id"))
    }),

    // Incremental ingest dedup: a new batch (doc_id % 10 = 0 plays the
    // delta) deduped AGAINST the existing corpus without re-deduping the
    // corpus itself — the shape a daily 100 TB pipeline actually runs.
    // Two layers, cheapest first: (1) exact — the delta's content hashes
    // probe the corpus hash index (an equi-join on 16-byte keys; at scale
    // the index is a bucketed table and the probe is shuffle-free);
    // (2) near — the delta's LSH bands probe only the CORPUS bands
    // (candidatePairsAcross: never delta×delta, never corpus×corpus),
    // survivors exact-Jaccard-verified. Verdict per delta doc:
    // exact_dup > near_dup > kept, match_id = smallest matching corpus id.
    "d12_incremental_dedup" -> ((s, d) => {
      val all = docs(s, d)
      val deltaPred = col("doc_id") % 10 === 0
      val hashed = all.select(col("doc_id"),
        md5(col("text").cast("binary")).as("content_md5"))
      val exact = hashed.filter(deltaPred)
        .join(hashed.filter(!deltaPred)
          .select(col("content_md5"), col("doc_id").as("cid")), "content_md5")
        .groupBy(col("doc_id")).agg(min(col("cid")).as("exact_of"))
      val arr = shingleArrays(all)
      // bands re-derived from the PERSISTED signatures (the artifact a
      // production delta probe bands against — never re-shingling the
      // corpus side)
      val bands = lshBands(graft.ops.DedupIndex.minhashDf(s,
        graft.ops.DedupIndex.ensure(s, d)), Bands, RowsPerBand)
      val cand = candidatePairsAcross(
        bands.filter(deltaPred), bands.filter(!deltaPred))
      val near = jaccardVerifyArrays(cand, arr)
        .filter(col("jaccard") >= JaccardTau)
        .groupBy(col("doc_a")).agg(min(col("doc_b")).as("near_of"))
        .withColumnRenamed("doc_a", "doc_id")
      all.filter(deltaPred).select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_of").isNotNull, "exact_dup")
            .when(col("near_of").isNotNull, "near_dup")
            .otherwise("kept").as("status"),
          coalesce(col("exact_of"), col("near_of")).as("match_id"))
        .orderBy(col("doc_id"))
    }),

    // Centrality-chosen canonical keeper: d7's components re-keyed so each
    // cluster keeps its highest-degree member (tie → min id) — the
    // "most representative variant" policy, composed from components + d9's
    // degree signal. Bench-excluded like d6/d7 (same iterative loop).
    "d10_central_keeper" -> ((s, d) => {
      val pairs = servedEdges(s, d)
      centralCanonical(pairs, docs(s, d).select(col("doc_id")),
          uncheckedRounds = 2)
        .orderBy(col("doc_id"))
    }),

    // Scalable dedup groups: connected components over the SimHash pair
    // graph (d6 runs the same min-label propagation over the exact-Jaccard
    // graph, which is quadratic to build; THIS is the 100 TB composition —
    // linear sketching + band join + iterative small joins). Output is one
    // canonical keeper per document instead of d5's millions of raw pairs.
    "d7_simhash_groups" -> ((s, d) => {
      val df = docs(s, d).withColumn("hs", tokenHashes(tokens(col("text"))))
      val pairs = simhashPairs(simhashBands(df, simhash32(col("hs"))), MaxHamming)
        .select(col("doc_a"), col("doc_b"))
      // near-dup components are dense small cliques: 2 pointer-doubled
      // rounds reach the fixpoint, so skip their fixpoint counts (driver
      // round-trips); round 3's count verifies convergence
      connectedComponents(pairs, docs(s, d).select(col("doc_id")),
          uncheckedRounds = 2)
        .orderBy(col("doc_id"))
    }),

    // d7's component map computed by the OTHER production CC algorithm:
    // alternating large-star/small-star edge rewrites (Kiveris et al.
    // SoCC 2014) instead of label propagation. Identical output contract
    // (oracle is d7's SQL verbatim — byte-equality across two independent
    // algorithms is the strongest cross-check either can get); different
    // scale profile: per-round work follows the SHRINKING edge list and
    // never joins the |V|-row label table, which wins on deep/giant
    // components where min-propagation pays |V| per round for
    // O(diameter) rounds. Bench-excluded like d7: on the pathological
    // 41%-dense sf0.1 synthetic graph every CC loop pays the 2.15M-edge
    // candidate join per round (measured 18 s); d33r below is the
    // collapse-first headline form.
    "d33_star_components" -> ((s, d) => {
      val df = docs(s, d).withColumn("hs", tokenHashes(tokens(col("text"))))
      val pairs = simhashPairs(simhashBands(df, simhash32(col("hs"))), MaxHamming)
        .select(col("doc_a"), col("doc_b"))
      starComponents(pairs, docs(s, d).select(col("doc_id")))
        .orderBy(col("doc_id"))
    }),

    // d33 on the collapsed class graph (the d9r/d25r/d29r collapse-first
    // contract): star-CC over distinct-sketch representatives — the
    // production composition, since duplicate cliques are exactly what
    // the class collapse removes before any graph loop runs.
    "d33r_star_residual" -> ((s, d) => {
      val (classes, edges) = residualClassGraph(s, d)
      starComponents(edges, classes.select(col("doc_id")),
          uncheckedRounds = 2)
        .orderBy(col("doc_id"))
    }),

    // Incremental connected-components maintenance (IVM for graphs, the
    // q77/q90 delta discipline applied to d7's component map): 80% of
    // the pair graph plays "yesterday's corpus" — its components are
    // collapsed ONCE to a star forest — and the remaining 20% arrives as
    // the delta. The refresh runs star-CC over (star forest ∪ Δ): a star
    // forest preserves its graph's connectivity exactly and roots are
    // component minima, so the merged fixpoint equals the full
    // recomputation — proven by the oracle, which is d7's closure over
    // ALL pairs (the third independent path to the same bytes, after d7
    // and d33). The 100 TB point: refresh cost is ∝ (#non-singleton
    // docs + |Δ|) edges, never |E_old| — yesterday's 2.15M-edge join is
    // NOT re-run; in production the star forest is the parquet you
    // persist between corpus drops.
    "d35_cc_incremental" -> ((s, d) => {
      val df = docs(s, d).withColumn("hs", tokenHashes(tokens(col("text"))))
      val pairs = simhashPairs(simhashBands(df, simhash32(col("hs"))), MaxHamming)
        .select(col("doc_a"), col("doc_b")).transform(graft.Tables.stage)
      val splitH = graft.ops.TextOps.hash60(
        concat(col("doc_a").cast("string"), lit("_"),
          col("doc_b").cast("string"))) % 5
      val base = starComponents(pairs.filter(splitH =!= 0),
        docs(s, d).select(col("doc_id")), uncheckedRounds = 2)
      val starEdges = base.filter(col("canon_id") =!= col("doc_id"))
        .select(col("doc_id").as("doc_a"), col("canon_id").as("doc_b"))
      starComponents(
          starEdges.union(pairs.filter(splitH === 0)
            .select(col("doc_a"), col("doc_b"))),
          docs(s, d).select(col("doc_id")), uncheckedRounds = 2)
        .orderBy(col("doc_id"))
    }),

    // Dedup-threshold tuning sweep (t38b/n21's operating-curve discipline
    // for the NEAR-DUP KNOB: how aggressive should hamming τ be before
    // the 100 TB collapse runs?): the class-graph pairs are generated
    // ONCE at τ=MaxHamming with their hamming distance attached, then
    // each τ ∈ 0..3 filters and re-components the shrinking edge set.
    // Per point: edges, components, docs collapsed (the dedup yield),
    // and giant-family share (the over-merge alarm — a τ whose giant
    // share jumps is merging template families, d27's health readout as
    // a CURVE). Star-CC per point: the edge sets shrink with τ, and the
    // candidate join — the expensive part — is paid once.
    "d36_threshold_sweep" -> ((s, d) => {
      val ix = graft.ops.DedupIndex.ensure(s, d)
      // the persisted class edges carry their hamming distance, so the
      // τ sweep filters a parquet scan — the candidate join is paid at
      // index-build time, once per corpus. Per-τ labels come from ONE
      // monotone contraction sweep ([[graft.ops.DedupOps
      // .sweepComponents]]): τ's CC merges τ-1's components along the
      // newly activated hamming==τ edges only, instead of 4 independent
      // star-CC loops each re-walking the full ≤τ edge set.
      val pairs = graft.ops.DedupIndex.classEdgesDf(s, ix)
      val nodes = graft.ops.DedupIndex.classesDf(s, ix)
        .select(col("doc_id")).transform(graft.Tables.stage)
      // uncheckedRounds=1 (not the from-scratch loops' 2): every step
      // after τ=0 runs on an already-contracted supernode graph whose
      // star rounds converge in 1-2 iterations — forcing a third
      // unchecked round costs more stages than the fixpoint check saves
      val byTau = sweepComponents(pairs, nodes, col("hamming"),
        0 to MaxHamming, uncheckedRounds = 1,
        // class-edge endpoints come from the same persisted class table
        // as `nodes` — subset by construction, so the sweep skips its
        // defensive extra-endpoint probe (2 driver actions)
        edgesWithinDocs = true)
      // ONE stats pass over the tau-tagged union of the four label
      // frames (2 shuffles total) instead of four independent
      // agg+crossJoin chains; the per-τ edge count is a cumsum over the
      // ≤4-row hamming histogram, not four scans
      val lbl = byTau.map { case (tau, comp) =>
        comp.withColumn("tau", lit(tau.toLong))
      }.reduce(_ unionByName _)
      val stats = lbl.groupBy(col("tau"), col("canon_id"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("tau"))
        .agg(count(lit(1)).as("n_components"),
          sum(col("sz")).as("n_nodes"), max(col("sz")).as("giant"))
      val hist = pairs.groupBy(col("hamming")).agg(count(lit(1)).as("c"))
      val ecnt = byTau.map { case (tau, _) =>
        hist.filter(col("hamming") <= tau)
          .agg(coalesce(sum(col("c")), lit(0L)).as("n_edges"))
          .select(lit(tau.toLong).as("tau"), col("n_edges"))
      }.reduce(_ unionByName _)
      stats.join(broadcast(ecnt), "tau")
        .select(col("tau"), col("n_edges"), col("n_components"),
          (col("n_nodes") - col("n_components")).as("n_collapsed"),
          expr("giant * 1000000L div n_nodes").as("giant_share_ppm"))
        .orderBy(col("tau"))
    }),

    // Contaminated-SPAN surgery (the GPT-3 appendix-C discipline, Brown
    // et al. 2020): excise the ±SpanMargin-token window around each
    // benchmark 3-shingle collision instead of dropping the whole
    // document — d14/d30 are the doc-level GATES; this REWRITES, keeping
    // the ~99% clean tokens a whole-doc drop throws away for one quoted
    // line. Logic and scale shape in [[graft.ops.DedupOps.spanSurgery]]
    // (broadcast bench set, per-doc-bounded island merge, equi-join
    // excision, ordered reassembly); the planted-corpus model check
    // lives in SurgeryManifestSpec.
    "d37_span_surgery" -> ((s, d) =>
      spanSurgery(docs(s, d), col("doc_id") % 50 === 0, SpanMargin)),

    // Transitive-chaining audit (the known failure mode of CC-based
    // dedup: A~B and B~C merge A with C even when A≁C, so clusters
    // inflate beyond the pairwise-τ relation — Spacerini/ExactSubstr
    // writeups call this chaining; nobody MEASURES it in-pipeline).
    // On the collapsed class graph (the production analytics surface):
    // per component-size log2 bucket, member pairs C(n,2) in CLOSED
    // FORM (never enumerated), direct hamming≤3 edges, and the chained
    // share — pairs co-clustered without direct evidence. A high
    // chained_ppm at a size bucket says those merges rest on paths,
    // not pairwise similarity: tighten τ or switch to star-shaped
    // canonical assignment. Scale: rides the class graph (|E| edges),
    // one component-size agg, one edge→canon join; pair counts are
    // arithmetic on |components| rows.
    "d42_chaining_audit" -> ((s, d) => {
      // serve-only: both the class edges AND their star-CC labels read
      // from the persisted DedupIndex (the audit consumes the collapse,
      // it doesn't define it — d33r keeps the in-query star rounds)
      val ix = graft.ops.DedupIndex.ensure(s, d)
      val edges = graft.ops.DedupIndex.classEdgesDf(s, ix)
        .select(col("doc_a"), col("doc_b"))
      val canon = graft.ops.DedupIndex.classCanonDf(s, ix)
      val cs = canon.groupBy(col("canon_id")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      val de = edges
        .join(canon.select(col("doc_id").as("doc_a"), col("canon_id")),
          "doc_a")
        .groupBy(col("canon_id")).agg(count(lit(1)).as("n_edges"))
      cs.join(de, Seq("canon_id"), "left")
        .select(col("n"), expr("n * (n - 1) div 2").as("n_pairs"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          expr("CAST(length(bin(n)) - 1 AS BIGINT)").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_components"), sum(col("n")).as("n_docs"),
          sum(col("n_pairs")).as("member_pairs"),
          sum(col("n_edges")).as("direct_edges"))
        .select(col("bucket"), col("n_components"), col("n_docs"),
          col("member_pairs"), col("direct_edges"),
          expr("(member_pairs - direct_edges) * 1000000 div member_pairs")
            .as("chained_ppm"))
        .orderBy(col("bucket"))
    }),

    // Effective dataset size under near-dup weighting (the "count each
    // cluster once" correction behind dedup-aware scaling laws —
    // training on N docs of which half are near-copies is not an N-doc
    // dataset): per source, raw docs, distinct d7-components touched,
    // the dedup rate, and the EFFECTIVE doc mass Σ 1/|component| in ppm
    // (each doc contributes one component-th — the loss-weighting a
    // trainer would apply instead of dropping; integer 10⁶ div csize,
    // floor-identical in both engines). Scale: rides d7's closure (the
    // persisted artifact), then one component-size agg + one
    // source-keyed agg — nothing new above |V|. SERVE-ONLY since r11:
    // canon_id reads from the persisted DedupIndex star forest (the
    // round-10 verdict's one weak was this query re-paying the
    // corpus-wide CC per report — 12.2 s of in-headline driver loop a
    // parquet scan replaces).
    "d40_effective_size" -> ((s, d) => {
      val canon = servedCanonical(s, d)
      val csize = canon.groupBy(col("canon_id"))
        .agg(count(lit(1)).as("csize"))
      canon.join(csize, "canon_id")
        .join(docs(s, d).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("canon_id")).as("n_components"),
          sum(expr("1000000 div csize")).as("eff_docs_ppm"))
        .select(col("source"), col("n_docs"), col("n_components"),
          col("eff_docs_ppm"),
          expr("n_components * 10000 div n_docs").as("distinct_bp"))
        .orderBy(col("source"))
    }),

    // LSH parameter advisor (the banding S-curve made empirical): for
    // each (bands, rows) split of the SAME 16-hash signature table,
    // the predicted catch probability at s=τ — 1−(1−τ^r)^b, computed
    // in exact integer ppm at plan-build time and embedded as a
    // literal in BOTH engines — next to the MEASURED candidate count,
    // true-pair count, precision, and caught share. The knob every
    // MinHash deployment turns blind; this prints the curve on the
    // actual corpus. Score-once discipline twice over: ONE signature
    // table feeds all three bandings, and the union of candidates is
    // Jaccard-verified ONCE (distinct pairs), then joined back per
    // config. Scale: three band-bucket self-joins (each d2's shape)
    // + one bounded verify — no config re-pays the signature scan.
    "d39_lsh_advisor" -> ((s, d) => {
      val arr = shingleArrays(docs(s, d).select(col("doc_id"), col("text")))
        .transform(graft.Tables.stage)
      val sig = graft.ops.DedupIndex.minhashDf(s,
        graft.ops.DedupIndex.ensure(s, d))
      val allc = LshConfigs.map { case (b, r) =>
        candidatePairs(lshBands(sig, b, r))
          .select(lit(b.toLong).as("bands"),
            lit(r.toLong).as("rows_per_band"), col("doc_a"), col("doc_b"))
      }.reduce(_ union _).transform(graft.Tables.stage)
      val ver = jaccardVerifyArrays(
          allc.select(col("doc_a"), col("doc_b")).distinct(), arr)
        .select(col("doc_a"), col("doc_b"),
          when(col("jaccard") >= JaccardTau, 1L).otherwise(0L)
            .as("is_true"))
        .transform(graft.Tables.stage)
      val tot = ver.agg(sum(col("is_true")).as("tt"))
      import s.implicits._
      val pred = LshConfigs
        .map { case (b, r) => (b.toLong, sCurvePpm(b, r)) }
        .toDF("bands", "pred_catch_ppm")
      allc.join(ver, Seq("doc_a", "doc_b"))
        .groupBy(col("bands"), col("rows_per_band"))
        .agg(count(lit(1)).as("n_cand"), sum(col("is_true")).as("n_true"))
        .crossJoin(broadcast(tot))
        .join(broadcast(pred), Seq("bands"))
        .select(col("bands"), col("rows_per_band"), col("pred_catch_ppm"),
          col("n_cand"), col("n_true"),
          expr("n_true * 1000000 div n_cand").as("precision_ppm"),
          expr("n_true * 1000000 div greatest(tt, 1L)").as("caught_ppm"))
        .orderBy(col("bands").desc)
    }),

    // Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken SIGMOD
    // 2003 — the MOSS local fingerprinting algorithm: in every window of
    // w consecutive k-gram hashes keep the minimum, rightmost on ties;
    // guarantees any shared run of w+k-1 tokens is caught while storing
    // an expected 2/(w+1) of all hashes — a POSITION-AWARE sketch where
    // MinHash is set-level). One k-gram hash table feeds a w ∈ {4,8,16}
    // sweep (score-once); per w: fingerprints kept, measured density vs
    // the paper's 2/(w+1) prediction as embedded ppm literals, and
    // match pairs through the fingerprint index — with hashes in more
    // than WinMaxDocs docs dropped first (MOSS's boilerplate cull; it
    // also BOUNDS each hash bucket's fan-out at C(cap,2) pairs, the d2
    // band-bucket argument). Ties inside a window need one combined
    // key: hash·2²¹ + (2²⁰ − pos) makes one BIGINT min pick (min hash,
    // rightmost pos) simultaneously — hash < 2³², pos < 2²⁰, so the key
    // stays under 2⁵³. Scale: the selection is a per-doc ROWS window
    // (doc-partitioned — embarrassingly parallel), the sweep re-windows
    // the checkpointed hash table without re-hashing, and the pair join
    // is capped per bucket; nothing exceeds |tokens| rows.
    "d43_winnowing" -> ((s, d) => {
      val kg = winnowKgrams(docs(s, d))
      val nKg = kg.agg(count(lit(1)).as("n_kgrams"))
      val rows = WinWs.map { w =>
        val fp = winnowFps(kg, w)
        val (byHash, pairFrame) = winnowPairFrame(fp, WinMaxDocs)
        val pairs = pairFrame
          .agg(count(lit(1)).as("n_pairs"),
            coalesce(sum(when(col("shared") >= 3, 1L).otherwise(0L)), lit(0L))
              .as("n_pairs_strong"))
        fp.agg(count(lit(1)).as("n_fp"))
          .crossJoin(broadcast(nKg))
          .crossJoin(broadcast(
            byHash.agg(coalesce(sum(when(col("nd") > WinMaxDocs, 1L)
              .otherwise(0L)), lit(0L)).as("n_common_dropped"))))
          .crossJoin(broadcast(pairs))
          .select(lit(w.toLong).as("w"), col("n_kgrams"), col("n_fp"),
            expr("n_fp * 1000000 div n_kgrams").as("density_ppm"),
            lit(2000000L / (w + 1)).as("pred_density_ppm"),
            col("n_common_dropped"), col("n_pairs"), col("n_pairs_strong"))
      }
      rows.reduce(_ union _).orderBy(col("w"))
    }),

    // Dedup-signal agreement audit (t53's cross-signal methodology on
    // the dedup side — the "which candidate generator do I trust"
    // question every pipeline owner asks before paying for the exact
    // pass): MinHash-band collisions (d2's candidate stage, pre-verify)
    // vs winnowing-fingerprint match pairs (d43's culled w=8 index),
    // each scored against d4's exact-Jaccard ≥ τ pair truth. One row
    // per signal plus their intersection and union: candidates, true
    // hits, recall_ppm vs the truth set, precision_ppm of the candidate
    // set — recall says what the signal misses, precision what the
    // verify step pays, `both`/`either` whether the two signals are
    // redundant or complementary (MinHash is SET-level, winnowing is
    // POSITION-aware, so containment-style dups split them). Scale: both
    // candidate generators are the banded/bucketed paths; the one
    // quadratic-class leg is the d4 truth (shingle-bucket join), which
    // is exactly why d44 lives OUTSIDE the bench headline with the
    // d4/d19 validators — it certifies the scale path, it isn't one.
    // The merge is one (doc_a, doc_b) groupBy over tagged candidate
    // rows + a broadcast-sized 1-row readout exploded to 4 signals.
    "d44_signal_agreement" -> ((s, d) => {
      val ds = docs(s, d)
      val truth = exactJaccardPairs(explodedShingles(ds), JaccardTau)
        .select(col("doc_a"), col("doc_b")).transform(graft.Tables.stage)
      val candA = servedCandidates(s, d)
        .select(col("doc_a"), col("doc_b"))
      val candB = winnowPairFrame(servedWinnowFp8(s, d), WinMaxDocs)._2
        .select(col("doc_a"), col("doc_b"))
      val flags = candA.withColumn("ia", lit(1L)).withColumn("ib", lit(0L))
        .unionByName(candB.withColumn("ia", lit(0L)).withColumn("ib", lit(1L)))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(max(col("ia")).as("in_a"), max(col("ib")).as("in_b"))
        .join(truth.withColumn("t", lit(1L)), Seq("doc_a", "doc_b"), "left")
        .withColumn("is_true", coalesce(col("t"), lit(0L)))
      val tt = truth.agg(count(lit(1)).as("truth_total"))
      val one = flags.agg(
        coalesce(sum(col("in_a")), lit(0L)).as("a_cand"),
        coalesce(sum(col("in_a") * col("is_true")), lit(0L)).as("a_true"),
        coalesce(sum(col("in_b")), lit(0L)).as("b_cand"),
        coalesce(sum(col("in_b") * col("is_true")), lit(0L)).as("b_true"),
        coalesce(sum(col("in_a") * col("in_b")), lit(0L)).as("both_cand"),
        coalesce(sum(col("in_a") * col("in_b") * col("is_true")), lit(0L))
          .as("both_true"),
        count(lit(1)).as("e_cand"),
        coalesce(sum(col("is_true")), lit(0L)).as("e_true"))
        .crossJoin(broadcast(tt))
      def sigStruct(nme: String, c: String, t: String) =
        struct(lit(nme).as("signal"), col(c).as("n_cand"), col(t).as("n_true"))
      one.select(explode(array(
            sigStruct("both", "both_cand", "both_true"),
            sigStruct("either", "e_cand", "e_true"),
            sigStruct("minhash_band", "a_cand", "a_true"),
            sigStruct("winnow_w8", "b_cand", "b_true"))).as("r"),
          col("truth_total"))
        .select(col("r.signal").as("signal"), col("r.n_cand").as("n_cand"),
          col("r.n_true").as("n_true"), col("truth_total"),
          expr("r.n_true * 1000000 div greatest(truth_total, 1L)")
            .as("recall_ppm"),
          expr("r.n_true * 1000000 div greatest(r.n_cand, 1L)")
            .as("precision_ppm"))
        .orderBy(col("signal"))
    }),

    // Contamination-SIGNAL agreement audit (the d44/t53 pattern on the
    // decontamination side — completing the agreement-audit trilogy:
    // quality signals t53, dedup candidates d44, contamination flags
    // here): four benchmark-leak detectors over the SAME train split,
    // each a real published gate — exact ≥3-shared-shingle (d14's
    // rule, the truth), Bloom-probed ≥3 (d30 — one-sided: recall is
    // 100% BY CONSTRUCTION, so its row measures pure FP cost),
    // winnowing-fingerprint overlap (MOSS — position-aware, the only
    // signal here that would survive benchmark paraphrase reordering),
    // and the ≥10% n-gram fraction (d38's PaLM-style knob, which
    // misses LONG docs whose absolute overlap is large but diluted).
    // Per signal + all4 + either: flagged, true hits, recall_ppm,
    // precision_ppm vs the exact truth. Scale: the bench side is the
    // small one everywhere (d14's argument); winnow adds one per-doc
    // window pass; the merge is one train-universe left-join frame.
    "d45_contamination_agreement" -> ((s, d) => {
      val ds = docs(s, d)
      // one shingle materialization feeds exact, own, frac AND the
      // Bloom probe's bit explode — otherwise the document explode
      // re-runs once per leg
      val sh = explodedShingles(ds).transform(graft.Tables.stage)
      val benchPred = col("doc_id") % 50 === 0
      val train = sh.filter(!benchPred)
      val benchSh = sh.filter(benchPred).select(col("sh")).distinct()
      val exact = train.join(benchSh, Seq("sh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_exact"))
      val own = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_own"))
      // d30's Bloom probe (2048×32-bit words, k=3 salted bits)
      val ks = Seq(1, 2, 3)
      def bitsOf(df: DataFrame,
          keep: Seq[org.apache.spark.sql.Column]) =
        df.select(keep :+ explode(array(ks.map(k =>
            pmod(saltedHash60(col("sh"), k), lit(65536L))): _*)).as("b"): _*)
          .select(keep :+ expr("b div 32").as("word") :+
            expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 32 AS INT))")
              .as("mask"): _*)
      val bloom = bitsOf(benchSh, Seq(col("sh"))).drop("sh")
        .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
      val bloomHits = bitsOf(train, Seq(col("doc_id"), col("sh")))
        .join(broadcast(bloom), Seq("word"), "left")
        .groupBy(col("doc_id"), col("sh"))
        .agg(min(when(expr("(coalesce(bits, CAST(0 AS BIGINT)) & mask) <> 0"),
          1L).otherwise(0L)).as("all_set"))
        .filter(col("all_set") === 1)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bloom"))
      // MOSS winnowing-fingerprint overlap (w=8, the persisted index)
      val fps = servedWinnowFp8(s, d)
      val benchFp = fps.filter(benchPred).select(col("fp_hash")).distinct()
      val wfl = fps.filter(!benchPred)
        .join(benchFp, Seq("fp_hash"), "left_semi")
        .select(col("doc_id")).distinct().withColumn("fw", lit(1L))
      val flags = ds.filter(!benchPred).select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(bloomHits, Seq("doc_id"), "left")
        .join(wfl, Seq("doc_id"), "left")
        .join(own, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(coalesce(col("n_exact"), lit(0L)) >= 3, 1L).otherwise(0L)
            .as("f_exact"),
          when(coalesce(col("n_bloom"), lit(0L)) >= 3, 1L).otherwise(0L)
            .as("f_bloom"),
          coalesce(col("fw"), lit(0L)).as("f_winnow"),
          when(expr("coalesce(n_exact, 0L) * 10000" +
            " div greatest(coalesce(n_own, 1L), 1L)") >= 1000, 1L)
            .otherwise(0L).as("f_frac"))
      val one = flags.agg(
        sum(col("f_exact")).as("truth_total"),
        sum(col("f_bloom")).as("bl_n"),
        sum(col("f_bloom") * col("f_exact")).as("bl_t"),
        sum(col("f_winnow")).as("wn_n"),
        sum(col("f_winnow") * col("f_exact")).as("wn_t"),
        sum(col("f_frac")).as("fr_n"),
        sum(col("f_frac") * col("f_exact")).as("fr_t"),
        sum(greatest(col("f_exact"), col("f_bloom"), col("f_winnow"),
          col("f_frac"))).as("ei_n"),
        sum(greatest(col("f_exact"), col("f_bloom"), col("f_winnow"),
          col("f_frac")) * col("f_exact")).as("ei_t"),
        sum(col("f_exact") * col("f_bloom") * col("f_winnow")
          * col("f_frac")).as("a4_n"))
      def sigStruct(nme: String, c: org.apache.spark.sql.Column,
          t: org.apache.spark.sql.Column) =
        struct(lit(nme).as("signal"), c.as("n_flagged"), t.as("n_true"))
      one.select(explode(array(
            sigStruct("all4", col("a4_n"), col("a4_n")),
            sigStruct("bloom", col("bl_n"), col("bl_t")),
            sigStruct("either", col("ei_n"), col("ei_t")),
            sigStruct("exact", col("truth_total"), col("truth_total")),
            sigStruct("frac10", col("fr_n"), col("fr_t")),
            sigStruct("winnow_w8", col("wn_n"), col("wn_t")))).as("r"),
          col("truth_total"))
        .select(col("r.signal").as("signal"),
          col("r.n_flagged").as("n_flagged"), col("r.n_true").as("n_true"),
          col("truth_total"),
          expr("r.n_true * 1000000 div greatest(truth_total, 1L)")
            .as("recall_ppm"),
          expr("r.n_true * 1000000 div greatest(r.n_flagged, 1L)")
            .as("precision_ppm"))
        .orderBy(col("signal"))
    }),

    // Contamination operating curve (the PaLM/GPT-4 report methodology:
    // a doc is contaminated when MORE THAN X% of its n-grams appear in
    // the benchmark — a FRACTION knob, where d14's gate is an absolute
    // ≥3-shingle count): per train doc, the share of its distinct
    // 3-shingles hitting the benchmark set, then one sweep over
    // thresholds {any, 10%, 30%, 70%} reporting flagged volume. The
    // fraction is computed ONCE; the sweep re-filters the per-doc bp
    // column (t38b/n21/d36's score-once discipline — 4 operating points
    // for one semi-join). Scale: the semi-join keys on the shingle (the
    // bench side is the small one — d14's argument), both aggs are
    // map-side combinable on doc_id, and the sweep explodes a 4-element
    // literal array — no second scan anywhere.
    "d38_contamination_curve" -> ((s, d) => {
      val sh = explodedShingles(docs(s, d))
      val benchPred = col("doc_id") % 50 === 0
      val train = sh.filter(!benchPred)
      val benchSh = sh.filter(benchPred).select(col("sh")).distinct()
      val hits = train.join(benchSh, Seq("sh"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      val frac = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          expr("coalesce(n_hit, 0L) * 10000 div n_sh").as("frac_bp"))
      frac.select(col("frac_bp"),
          explode(expr("array(1L, 1000L, 3000L, 7000L)")).as("thr_bp"))
        .groupBy(col("thr_bp"))
        .agg(sum(when(col("frac_bp") >= col("thr_bp"), 1L).otherwise(0L))
            .as("n_flagged"),
          count(lit(1)).as("n_train"))
        .select(col("thr_bp"), col("n_flagged"), col("n_train"),
          expr("n_flagged * 10000 div n_train").as("flagged_bp"))
        .orderBy(col("thr_bp"))
    }),

    // Modularity scoring of the LPA communities (Newman & Girvan 2004,
    // Q = Σ_c [e_c/m − (d_c/2m)²]) — the "measure your own clustering"
    // discipline (d19/n12/q74) applied to d29r: did label propagation
    // find real structure, or did it shatter/merge? Pure integer form:
    // per-community numerator 4m·e_c − d_c², global Q_ppm =
    // Σnum·10⁶ div 4m² — exact BIGINTs while the READOUT numerator
    // Σnum·10⁶ (worst case 4m²·10⁶ at Q→1) stays under 2⁶³, i.e.
    // m ≲ 1.5e6 edges; past that, widen the two Q readout products to
    // DECIMAL(38,0) — the per-community aggs themselves hold to
    // m < 1.5e9 (4m² alone < 2⁶³). Cost on top of
    // d29r: one edge join against the label map (intra count) + one
    // degree agg — both map-side combinable, both ∝ |E|.
    "d34_modularity" -> ((s, d) => {
      val (classes, ce0) = residualClassGraph(s, d)
      val ce = ce0.transform(graft.Tables.stage) // feeds LPA, m, intra, and degrees
      // same persisted class-edge frame as d29r: unique canonical pairs
      // by construction, so LPA skips its defensive distinct
      val lab = labelPropagation(ce, classes.select(col("doc_id")), LpaRounds,
        assumeDistinct = true)
      val m = ce.agg(count(lit(1)).as("m"))
      val intra = ce
        .join(lab.select(col("doc_id").as("doc_a"), col("lbl")), "doc_a")
        .join(lab.select(col("doc_id").as("doc_b"), col("lbl").as("lbl_b")),
          "doc_b")
        .filter(col("lbl") === col("lbl_b"))
        .groupBy(col("lbl")).agg(count(lit(1)).as("e_intra"))
      val deg = ce.select(col("doc_a").as("doc_id"))
        .union(ce.select(col("doc_b").as("doc_id")))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
      val comm = lab.join(deg, Seq("doc_id"), "left")
        .groupBy(col("lbl"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(coalesce(col("deg"), lit(0L))).as("d_sum"))
      val per = comm.join(intra, Seq("lbl"), "left")
        .crossJoin(broadcast(m))
        .select(col("lbl").as("community"), col("n_nodes"),
          coalesce(col("e_intra"), lit(0L)).as("e_intra"), col("d_sum"),
          (lit(4L) * col("m") * coalesce(col("e_intra"), lit(0L))
            - col("d_sum") * col("d_sum")).as("num"), col("m"))
      val q = per.agg(sum(col("num")).as("qnum"))
      per.crossJoin(broadcast(q))
        .select(col("community"), col("n_nodes"), col("e_intra"),
          col("d_sum"), expr("qnum * 1000000L div (4 * m * m)").as("q_ppm"))
        .orderBy(col("community"))
    }),

    // Component-size distribution over d7's collapse: how many duplicate
    // families exist at each size, and what share of the corpus the
    // LARGEST family holds (giant_share_ppm repeated per row — a
    // one-glance health readout: a giant component usually means the
    // near-dup threshold is too loose or a template family exploded,
    // and it is exactly the case where graph analytics must run
    // post-collapse). Rollup of the component map — the d21 savings
    // report's structural complement; served from the persisted
    // DedupIndex star forest.
    "d27_component_sizes" -> ((s, d) => {
      val comp = servedCanonical(s, d)
      val sizes = comp.groupBy(col("canon_id"))
        .agg(count(lit(1)).as("comp_size"))
      val hist = sizes.groupBy(col("comp_size"))
        .agg(count(lit(1)).as("n_components"))
      val tot = sizes.agg(sum(col("comp_size")).as("n_docs"),
        max(col("comp_size")).as("max_size"))
      hist.crossJoin(broadcast(tot))
        .select(col("comp_size"), col("n_components"),
          (col("comp_size") * col("n_components")).as("docs_at_size"),
          expr("max_size * 1000000L div n_docs").as("giant_share_ppm"))
        .orderBy(col("comp_size"))
    }),

    // Bloom-filter decontamination — d14's scan with BOUNDED benchmark
    // state (Bloom 1970). The benchmark split's distinct shingles
    // compress into a 2^16-bit filter held as 2048 32-bit words (bit
    // masks stay below bit 63 — BIGINT shift overflow differs between
    // engines above it), k=3 bit positions from the salted md5 family.
    // At 100 TB the exact d14 join shuffles every training shingle
    // against the benchmark table; here the ~16 KB word table BROADCASTS
    // into the training scan and the probe is three bit tests per
    // shingle — the benchmark side never shuffles at all. Error is
    // one-sided by construction (a contaminated shingle always finds its
    // own bits set → no false negatives; membership of every exact hit
    // in the bloom-positive set is what the n_fp ≥ 0 column shows), and
    // the false-positive cost is MEASURED per doc against the exact d14
    // truth riding along (d19/n12/q74 self-evaluation discipline).
    // Missing-word probes resolve through the LEFT join to unset bits —
    // an INNER join would silently shrink the per-shingle test count and
    // pass 2-of-2 instead of failing 2-of-3.
    "d30_bloom_decontaminate" -> ((s, d) => {
      val sh = explodedShingles(docs(s, d))
      val benchPred = col("doc_id") % 50 === 0
      val train = sh.filter(!benchPred)
      val benchSh = sh.filter(benchPred).select(col("sh")).distinct()
      val ks = Seq(1, 2, 3)
      def bitsOf(df: DataFrame, keep: Seq[org.apache.spark.sql.Column]) =
        df.select(keep :+ explode(array(ks.map(k =>
            pmod(saltedHash60(col("sh"), k), lit(65536L))): _*)).as("b"): _*)
          .select(keep :+ expr("b div 32").as("word") :+
            expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 32 AS INT))")
              .as("mask"): _*)
      val bloom = bitsOf(benchSh, Seq(col("sh"))).drop("sh")
        .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
      val pos = bitsOf(train, Seq(col("doc_id"), col("sh")))
        .join(broadcast(bloom), Seq("word"), "left")
        .groupBy(col("doc_id"), col("sh"))
        .agg(min(when(expr("(coalesce(bits, CAST(0 AS BIGINT)) & mask) <> 0"),
          1L).otherwise(0L)).as("all_set"))
        .filter(col("all_set") === 1)
      val bloomHits = pos.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bloom"))
      val exact = train.join(benchSh, "sh").groupBy(col("doc_id"))
        .agg(countDistinct(col("sh")).as("n_exact"))
      bloomHits.join(exact, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bloom"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          (col("n_bloom") - coalesce(col("n_exact"), lit(0L))).as("n_fp"),
          (col("n_bloom") >= 3).as("flag_bloom"),
          (coalesce(col("n_exact"), lit(0L)) >= 3).as("flag_exact"))
        .orderBy(col("doc_id"))
    }),

    // Entity resolution with golden-record survivorship — the classic
    // record-linkage pipeline (Fellegi-Sunter shape: block → compare →
    // classify → cluster → survive) over a planted dirty-duplicate
    // fixture. The corpus's raw customer names are distance-1 apart from
    // EACH OTHER ("Customer#…001" vs "…002"), so ER runs on a synthesized
    // composite identity (segment + an 8-hex md5 section + name); every
    // 10th entity gets a deletion-edit duplicate (rec_id + 1e6), every
    // 20th additionally a substitution-edit duplicate (rec_id + 2e6).
    // Blocking derives TWO keys from the dirty name itself (nation +
    // hash-prefix, nation + hash-suffix — each edit breaks at most one
    // key, the standard multi-key insurance); candidate pairs are
    // per-block self-joins (never all-pairs — at 100 TB the block key is
    // the shuffle key and block sizes bound the quadratic work), verified
    // by levenshtein ≤ 2, clustered by DedupOps.connectedComponents, and
    // survived: canonical name from the min-id member, max acctbal across
    // members. Output = multi-member clusters only.
    "d31_entity_resolution" -> ((s, d) => {
      val c0 = Tables.customer(s, d).select(
        col("c_custkey").as("ck"), col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("seg"), col("c_name").as("nm"),
        substring(md5(col("c_custkey").cast("string")), 1, 8).as("h8"),
        col("c_acctbal").as("acctbal"))
      def mk(h: org.apache.spark.sql.Column) =
        concat(col("seg"), lit(" "), h, lit(" "), col("nm"))
      val base = c0.select(col("ck").as("rec_id"), col("nation"),
        mk(col("h8")).as("name"), col("acctbal"))
      val va = c0.filter(col("ck") % 10 === 0).select(
        (col("ck") + 1000000L).as("rec_id"), col("nation"),
        mk(concat(substring(col("h8"), 1, 3), substring(col("h8"), 5, 4)))
          .as("name"),
        (col("acctbal") + lit(50.0)).as("acctbal"))
      val vb = c0.filter(col("ck") % 20 === 0).select(
        (col("ck") + 2000000L).as("rec_id"), col("nation"),
        mk(concat(substring(col("h8"), 1, 1), lit("z"),
          substring(col("h8"), 3, 6))).as("name"),
        col("acctbal").as("acctbal"))
      val recs = base.unionByName(va).unionByName(vb)
      val keyed = recs.withColumn("h8c", element_at(split(col("name"), " "), 2))
      val k1 = keyed.select(concat(col("nation").cast("string"), lit(":"),
        substring(col("h8c"), 1, 3)).as("bk"), col("rec_id"))
      val k2 = keyed.select(concat(col("nation").cast("string"), lit(":"),
        expr("right(h8c, 4)")).as("bk"), col("rec_id"))
      val cand = k1.unionByName(k2)
      val pairs0 = cand.as("a").join(cand.as("b"), "bk")
        .filter(col("a.rec_id") < col("b.rec_id"))
        .select(col("a.rec_id").as("doc_a"), col("b.rec_id").as("doc_b"))
        .distinct()
      val named = recs.select(col("rec_id"), col("name"))
      val verified = pairs0
        .join(named.select(col("rec_id").as("doc_a"), col("name").as("name_a")),
          "doc_a")
        .join(named.select(col("rec_id").as("doc_b"), col("name").as("name_b")),
          "doc_b")
        .filter(levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("doc_a"), col("doc_b"))
      val labels = connectedComponents(verified,
        recs.select(col("rec_id").as("doc_id")))
      recs.join(labels, recs("rec_id") === labels("doc_id"))
        .groupBy(col("canon_id"))
        .agg(count(lit(1)).as("n_members"),
          max(when(col("rec_id") === col("canon_id"), col("name")))
            .as("canon_name"),
          max(col("acctbal")).as("max_acctbal"))
        .filter(col("n_members") > 1)
        .orderBy(col("canon_id"))
    }),

    // Leakage-free train/test split — the near-dup-aware eval-split a
    // training pipeline owes its benchmarks (Dodge et al. 2021 measured
    // exactly this C4→benchmark leakage; random doc-level splits put one
    // copy of a near-duplicate in train and its twin in test, inflating
    // eval). Strategy A (naive) hashes doc_id to a 20% test split;
    // strategy B hashes the d7 COMPONENT id, assigning whole near-dup
    // families to one side. The readout counts SimHash near-dup pairs
    // crossing the boundary under each: cluster_cross_pairs is ZERO BY
    // CONSTRUCTION (both endpoints share canon_id), and naive_cross is
    // the leakage a random split silently ships — the operator is its
    // own ablation. Serves the persisted DedupIndex star forest + edge
    // list (headline-safe since r11: two parquet scans + two joins).
    // DedupIndex HEALTH readout (n15b's index-stats discipline for the
    // dedup artifacts — what an operator checks before trusting a
    // persisted index against a corpus drop): one row per artifact with
    // its cardinality, a touched-entity count, and the health ppm that
    // artifact is judged by — signature h0 collision level, candidate /
    // edge corpus coverage, star-forest collapse share, class-collapse
    // ratio, measured winnowing density (d43's 2/(w+1) law on the
    // PERSISTED index). Serve-only Spark side (8 parquet aggs); the
    // oracle recomputes every chain from scratch, so this row
    // oracle-gates the artifact CARDINALITIES directly (the consumers'
    // oracles gate the contents). Scale: each leg is one
    // map-side-combinable agg over its artifact — nothing touches the
    // corpus beyond the two denominator aggs.
    "d46_dedup_index_stats" -> ((s, d) => {
      import graft.ops.DedupIndex
      val ix = DedupIndex.ensure(s, d)
      val nd = broadcast(docs(s, d).agg(count(lit(1)).as("nd")))
      val nkg = broadcast(docs(s, d)
        .select(greatest(size(tokens(col("text"))) - 3, lit(1))
          .cast("long").as("k"))
        .agg(sum(col("k")).as("nkg")))
      val ncls = broadcast(DedupIndex.classesDf(s, ix)
        .agg(count(lit(1)).as("ncls")))
      def pairLeg(name: String, p: DataFrame, denom: DataFrame,
          dcol: String): DataFrame = {
        val e = p.select(explode(array(col("doc_a"), col("doc_b"))).as("dd"))
        p.agg(count(lit(1)).as("n_rows"))
          .crossJoin(broadcast(e.agg(countDistinct(col("dd")).as("n_keys"))))
          .crossJoin(denom)
          .select(lit(name).as("artifact"), col("n_rows"), col("n_keys"),
            expr(s"n_keys * 1000000 div $dcol").as("ppm"))
      }
      def canonLeg(name: String, c: DataFrame): DataFrame =
        c.agg(count(lit(1)).as("n_rows"),
            countDistinct(col("canon_id")).as("n_keys"))
          .select(lit(name).as("artifact"), col("n_rows"), col("n_keys"),
            expr("(n_rows - n_keys) * 1000000 div n_rows").as("ppm"))
      val mh = DedupIndex.minhashDf(s, ix)
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("h0")).as("n_keys"))
        .select(lit("minhash").as("artifact"), col("n_rows"), col("n_keys"),
          expr("n_keys * 1000000 div n_rows").as("ppm"))
      val cls = DedupIndex.classesDf(s, ix).agg(count(lit(1)).as("n_rows"))
        .crossJoin(nd)
        .select(lit("classes").as("artifact"), col("n_rows"),
          col("n_rows").as("n_keys"), expr("n_rows * 1000000 div nd").as("ppm"))
      val fp = DedupIndex.winnowFpDf(s, ix)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_keys"))
        .crossJoin(nkg)
        .select(lit("winnow_fp8").as("artifact"), col("n_rows"),
          col("n_keys"), expr("n_rows * 1000000 div nkg").as("ppm"))
      Seq(
        pairLeg("candidates", DedupIndex.candidatesDf(s, ix), nd, "nd"),
        pairLeg("edges", DedupIndex.edgesDf(s, ix)
          .select(col("doc_a"), col("doc_b")), nd, "nd"),
        canonLeg("canonical", DedupIndex.canonicalDf(s, ix)),
        cls,
        pairLeg("class_edges", DedupIndex.classEdgesDf(s, ix)
          .select(col("doc_a"), col("doc_b")), ncls, "ncls"),
        canonLeg("class_canon", DedupIndex.classCanonDf(s, ix)),
        mh, fp)
        .reduce(_ unionByName _)
        .orderBy(col("artifact"))
    }),

    "d32_leakage_split" -> ((s, d) => {
      val pairs = servedEdges(s, d)
      val comp = servedCanonical(s, d)
      val tags = comp
        .withColumn("naive_test", pmod(hash60(col("doc_id")), lit(5L)) === 0)
        .withColumn("cluster_test", pmod(hash60(col("canon_id")), lit(5L)) === 0)
      val counts = tags.agg(count(lit(1)).as("n_docs"),
        sum(when(col("naive_test"), 1L).otherwise(0L)).as("naive_test_docs"),
        sum(when(col("cluster_test"), 1L).otherwise(0L)).as("cluster_test_docs"))
      val cross = pairs
        .join(tags.select(col("doc_id").as("doc_a"),
          col("naive_test").as("na"), col("cluster_test").as("ca")), "doc_a")
        .join(tags.select(col("doc_id").as("doc_b"),
          col("naive_test").as("nb"), col("cluster_test").as("cb")), "doc_b")
        .agg(
          coalesce(sum(when(col("na") =!= col("nb"), 1L).otherwise(0L)), lit(0L))
            .as("naive_cross_pairs"),
          coalesce(sum(when(col("ca") =!= col("cb"), 1L).otherwise(0L)), lit(0L))
            .as("cluster_cross_pairs"))
      counts.crossJoin(cross)
        .select(col("n_docs"), col("naive_test_docs"), col("cluster_test_docs"),
          col("naive_cross_pairs"), col("cluster_cross_pairs"))
        .orderBy(col("n_docs"))
    })
  )

  // ---- DuckDB oracle SQL (generated to mirror the Scala plans exactly) ----

  private val dkToks = "string_split_regex(trim(text), '\\s+')"
  private def dkHash60(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Shared CTE: (doc_id, sh) distinct 3-shingles. */
  private val dkShingled =
    s"""sh0 AS (
       |  SELECT doc_id, text, $dkToks AS toks FROM documents),
       |sh1 AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) >= 3
       |      THEN list_transform(generate_series(1, len(toks) - 2),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [trim(text)] END AS shingles
       |  FROM sh0),
       |shingled AS (
       |  SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM sh1)""".stripMargin

  /** d43/d44's k-gram combined-key table CTEs (toksd → kgs → kg):
    * DuckDB mirror of [[winnowKgrams]]. */
  private val dkWinnowKgCtes: String =
    s"""toksd AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
       |    trim(text) AS t
       |  FROM documents),
       |kgs AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) >= 4
       |      THEN list_transform(generate_series(1, len(toks) - 3),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] ||
       |          ' ' || toks[i+3])
       |      ELSE [t] END AS kgarr
       |  FROM toksd),
       |kg AS MATERIALIZED (
       |  SELECT doc_id, u.pos,
       |    ('0x' || substr(md5(u.g), 1, 8))::BIGINT * 2097152
       |      + (1048576 - u.pos) AS key,
       |    len(kgarr) AS n_kg
       |  FROM kgs, LATERAL (SELECT unnest(kgarr) AS g,
       |    generate_subscripts(kgarr, 1) AS pos) u)""".stripMargin

  /** Winnowing selection + culled pair join at window `w` over `kg`
    * (win$w → fp$w → keep$w → pr$w): DuckDB mirror of [[winnowFps]] +
    * [[winnowPairFrame]]. */
  private def dkWinnowChain(w: Int): String =
    s"""win$w AS (
       |  SELECT doc_id,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS mk,
       |    pos, n_kg
       |  FROM kg),
       |fp$w AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, mk // 2097152 AS fp_hash,
       |    1048576 - (mk % 2097152) AS fp_pos
       |  FROM win$w WHERE pos >= least($w, n_kg)),
       |keep$w AS (
       |  SELECT fp_hash FROM (SELECT fp_hash, count(DISTINCT doc_id)
       |    AS nd FROM fp$w GROUP BY 1) WHERE nd <= $WinMaxDocs),
       |pr$w AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(DISTINCT a.fp_hash) AS BIGINT) AS shared
       |  FROM fp$w a JOIN keep$w k ON a.fp_hash = k.fp_hash
       |  JOIN fp$w b ON b.fp_hash = a.fp_hash AND b.doc_id > a.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** Exhaustive exact-Jaccard pairs (d4's oracle; d20 reuses it — same
    * answer via prefix filtering). */
  private lazy val dkExactJaccard: String =
    s"""WITH $dkShingled,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM shingled a JOIN shingled b
       |    ON a.sh = b.sh AND a.doc_id < b.doc_id),
       |$dkJaccardTail""".stripMargin

  private val dkJaccardTail =
    s"""sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
       |inter AS (
       |  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
       |  FROM pairs p
       |  JOIN shingled a ON a.doc_id = p.doc_a
       |  JOIN shingled b ON b.doc_id = p.doc_b AND b.sh = a.sh
       |  GROUP BY p.doc_a, p.doc_b)
       |SELECT i.doc_a, i.doc_b, i.inter,
       |  sa.n_sh + sb.n_sh - i.inter AS union_sz,
       |  round(CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter), 4) AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.doc_a
       |JOIN sizes sb ON sb.doc_id = i.doc_b
       |WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= $JaccardTau
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d2's CTE chain through candidate `pairs` (shingles → minhash sig →
    * LSH bands → bucket collisions), no final SELECT — shared with the
    * composed-pipeline ledger ([[PipelineQueries]]), which verifies and
    * components the same candidates over its surviving docs. */
  private[queries] val dkMinhashCandCtes: String = {
    import graft.ops.TextOps.{MinhashP, permParams}
    val minAggs = (0 until NumHashes).map { i =>
      val (a, b) = permParams(i)
      s"min(($a * (('0x' || substr(md5(sh), 1, 8))::BIGINT) + $b) % $MinhashP) AS h$i"
    }.mkString(",\n    ")
    val bandCols = (0 until Bands).map { b =>
      val hs = (0 until RowsPerBand).map(r => s"h${b * RowsPerBand + r}::VARCHAR")
      s"md5(concat_ws(',', ${hs.mkString(", ")})) AS band$b"
    }.mkString(",\n    ")
    val bandSelects = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band_idx, band$b AS band_hash FROM sig_bands")
      .mkString("\n  UNION ALL\n  ")
    s"""$dkShingled,
       |sig AS (
       |  SELECT doc_id,
       |    $minAggs
       |  FROM shingled GROUP BY doc_id),
       |sig_bands AS (
       |  SELECT doc_id,
       |    $bandCols
       |  FROM sig),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
       |   AND l.doc_id < r.doc_id)""".stripMargin
  }

  private val dkMinhashLsh: String =
    s"""WITH $dkMinhashCandCtes,
       |$dkJaccardTail""".stripMargin

  private val dkSimhashExpr: String = {
    val terms = (0 until 32).map { j =>
      s"(CASE WHEN 2 * len(list_filter(hs, h -> ((h >> $j) & 1) = 1)) > len(hs) THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"($terms)::BIGINT"
  }

  private val dkTokenHashes =
    s"list_transform(list_distinct($dkToks), t -> ${dkHash60("t")})"

  /** Recursive-CTE transitive closure (oracle for connected components):
    * canon(doc) = min(reachable ∪ {doc}). Closure size is bounded by the
    * near-dup components, which are small by construction. */
  private val dkDedupGroups: String =
    s"""WITH RECURSIVE $dkShingled,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM shingled a JOIN shingled b
       |    ON a.sh = b.sh AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN shingled a ON a.doc_id = c.doc_a
       |  JOIN shingled b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |  GROUP BY c.doc_a, c.doc_b),
       |jpairs AS (
       |  SELECT i.doc_a, i.doc_b FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) >= $JaccardTau),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |  UNION ALL SELECT doc_b, doc_a FROM jpairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |canon AS (
       |  SELECT d.doc_id,
       |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canon_id
       |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
       |  GROUP BY d.doc_id)
       |SELECT doc_id, canon_id FROM canon ORDER BY doc_id""".stripMargin

  /** The d7 closure CTE chain (`h` … `canon`) WITHOUT a final SELECT — the
    * named shared constant d7/d10/d21 all build on. Factored (rather than
    * string-replacing d7's final SELECT out) so a rewording of the tail
    * can never silently no-op the replace into malformed SQL. */
  /** (private[graft]: m17's cross-modal consistency oracle composes this
    * text-side closure with the payload-side phash closure.) */
  private[graft] val dkSimhashClosureCtes: String =
    s"""WITH RECURSIVE h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
       |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
       |bands AS (
       |  SELECT doc_id, simhash, b.band_idx,
       |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
       |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
       |jpairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
       |   AND l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jpairs
       |  UNION ALL SELECT doc_b, doc_a FROM jpairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |canon AS (
       |  SELECT d.doc_id,
       |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canon_id
       |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
       |  GROUP BY d.doc_id)""".stripMargin

  /** d2's candidate CTEs with the tf-weighted verify tail (d28): Σmin of
    * term frequencies joined on candidate pairs, Σmax derived from total
    * token counts, score in integer basis points. */
  private val dkWeightedJaccard: String =
    dkMinhashLsh.replace(dkJaccardTail,
      s"""tf0 AS (SELECT doc_id, unnest(toks) AS tok FROM sh0),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tf0
         |       GROUP BY doc_id, tok),
         |wsz AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tok FROM tf
         |        GROUP BY doc_id),
         |wint AS (
         |  SELECT p.doc_a, p.doc_b, CAST(sum(least(a.tf, b.tf)) AS BIGINT)
         |           AS wmin
         |  FROM pairs p
         |  JOIN tf a ON a.doc_id = p.doc_a
         |  JOIN tf b ON b.doc_id = p.doc_b AND b.tok = a.tok
         |  GROUP BY p.doc_a, p.doc_b)
         |SELECT w.doc_a, w.doc_b, w.wmin,
         |  sa.n_tok + sb.n_tok - w.wmin AS wunion,
         |  (w.wmin * 10000) // (sa.n_tok + sb.n_tok - w.wmin) AS wjacc_bp
         |FROM wint w
         |JOIN wsz sa ON sa.doc_id = w.doc_a
         |JOIN wsz sb ON sb.doc_id = w.doc_b
         |WHERE (w.wmin * 10000) // (sa.n_tok + sb.n_tok - w.wmin)
         |  >= $WJTauBp
         |ORDER BY doc_a, doc_b""".stripMargin)

  /** d29's oracle: the SimHash edge CTEs + [[LpaRounds]] synchronous
    * label-propagation rounds UNROLLED (majority neighbor label, tie →
    * min, isolated nodes keep their own) — the d15 pattern of mirroring a
    * fixed-round iteration as a CTE chain, argmax instead of mass. */
  /** The synchronous LPA rounds + community readout, over a directed edge
    * CTE named `edges` (src, dst) and an initial label CTE `l0` — shared
    * by d29 (doc graph) and d29r (collapsed class graph). */
  /** The unrolled synchronous-LPA round CTEs (`n1…l{LpaRounds}`) alone —
    * shared by the d29/d29r final-label readout and d34's modularity
    * scoring of those labels. */
  private val dkLpaRounds: String =
    (1 to LpaRounds).map { r =>
      s"""n$r AS (
         |  SELECT e.src AS doc_id, l.lbl, count(*) AS c
         |  FROM edges e JOIN l${r - 1} l ON l.doc_id = e.dst
         |  GROUP BY e.src, l.lbl),
         |t$r AS (
         |  SELECT doc_id, lbl FROM (
         |    SELECT doc_id, lbl,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id
         |                         ORDER BY c DESC, lbl) AS rn
         |    FROM n$r) WHERE rn = 1),
         |l$r AS (
         |  SELECT p.doc_id, coalesce(t.lbl, p.lbl) AS lbl
         |  FROM l${r - 1} p LEFT JOIN t$r t USING (doc_id))""".stripMargin
    }.mkString(",\n")

  private val dkLpaTail: String =
    s"""$dkLpaRounds
       |SELECT doc_id, lbl AS community FROM l$LpaRounds
       |ORDER BY doc_id""".stripMargin

  private val dkLabelPropagation: String =
    s"""$dkSimhashClosureCtes,
       |l0 AS (SELECT doc_id, doc_id AS lbl FROM documents),
       |$dkLpaTail""".stripMargin

  /** Shared class-collapse CTEs for the residual graph family: one node
    * per distinct SimHash (min-id rep, CTE `cls`), class pair list `ce`
    * from the same band join over classes. */
  private val dkClassCtes: String =
    s"""h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
       |shx AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
       |cls AS (SELECT simhash, min(doc_id) AS doc_id FROM shx
       |        GROUP BY simhash),
       |cbands AS (
       |  SELECT doc_id, simhash, b.band_idx,
       |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
       |  FROM cls, (SELECT unnest([0,1,2,3]) AS band_idx) b),
       |ce AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM cbands l JOIN cbands r
       |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
       |   AND l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming)""".stripMargin

  private val dkKcoreResidual: String =
    s"""WITH $dkClassCtes,
       |e0 AS (SELECT doc_a, doc_b FROM ce),
       |$dkKcoreTail""".stripMargin

  private val dkLpaResidual: String =
    s"""WITH $dkClassCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM ce
       |  UNION ALL SELECT doc_b, doc_a FROM ce),
       |l0 AS (SELECT doc_id, doc_id AS lbl FROM cls),
       |$dkLpaTail""".stripMargin

  /** d9's exact per-node stats tail over the collapsed class graph. */
  private val dkGraphStatsResidual: String =
    s"""WITH $dkClassCtes,
       |adj AS (
       |  SELECT doc_a AS u, doc_b AS v FROM ce
       |  UNION ALL SELECT doc_b, doc_a FROM ce),
       |deg AS (SELECT u, count(*) AS degree FROM adj GROUP BY u),
       |twohop AS (
       |  SELECT a1.u, count(DISTINCT a2.v) AS n_2hop
       |  FROM adj a1 JOIN adj a2 ON a1.v = a2.u
       |  WHERE a2.v <> a1.u
       |    AND NOT EXISTS (SELECT 1 FROM adj d
       |                    WHERE d.u = a1.u AND d.v = a2.v)
       |  GROUP BY a1.u),
       |tri AS (
       |  SELECT a1.u, count(*) AS n_tri
       |  FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
       |  JOIN ce e ON e.doc_a = a1.v AND e.doc_b = a2.v
       |  GROUP BY a1.u)
       |SELECT d.u AS doc_id, d.degree,
       |       coalesce(t2.n_2hop, 0) AS n_2hop,
       |       coalesce(t.n_tri, 0) AS n_tri
       |FROM deg d LEFT JOIN twohop t2 ON t2.u = d.u
       |LEFT JOIN tri t ON t.u = d.u
       |ORDER BY doc_id""".stripMargin

  /** Recursive-CTE closure over the SimHash-Hamming pair graph (same
    * structure as [[dkDedupGroups]], edges from the d5 candidate SQL). */
  private val dkSimhashGroups: String =
    s"""$dkSimhashClosureCtes
       |SELECT doc_id, canon_id FROM canon ORDER BY doc_id""".stripMargin

  /** d7's transitive-closure CTEs + degree argmax: the keeper is the
    * max-degree (tie min-id) member of each component. */
  private val dkCentralKeeper: String =
    s"""$dkSimhashClosureCtes,
       |deg AS (SELECT src AS doc_id, count(*) AS degree FROM edges
       |        GROUP BY src),
       |m AS (SELECT c.doc_id, c.canon_id, coalesce(g.degree, 0) AS degree
       |      FROM canon c LEFT JOIN deg g USING (doc_id)),
       |k AS (SELECT canon_id, doc_id AS keeper FROM (
       |        SELECT canon_id, doc_id,
       |               ROW_NUMBER() OVER (PARTITION BY canon_id
       |                                  ORDER BY degree DESC, doc_id) AS rn
       |        FROM m) WHERE rn = 1)
       |SELECT m.doc_id, m.degree, k.keeper
       |FROM m JOIN k USING (canon_id) ORDER BY doc_id""".stripMargin

  /** Triangle/node/edge counts over the SimHash-Hamming graph; shared by
    * d8 (id orientation), d8b (degree orientation) and d8c (clique
    * closed-form + residual enumeration) — identical answers by
    * construction, so one oracle pins all three. */
  private val dkTriangles: String =
    s"""WITH h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
       |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
       |bands AS (
       |  SELECT doc_id, simhash, b.band_idx,
       |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
       |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
       |edges AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
       |   AND l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
       |tri AS (
       |  SELECT count(*) AS n_triangles
       |  FROM edges e1
       |  JOIN edges e2 ON e2.doc_a = e1.doc_b
       |  JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
       |SELECT
       |  (SELECT count(DISTINCT doc_id) FROM (
       |     SELECT doc_a AS doc_id FROM edges
       |     UNION ALL SELECT doc_b FROM edges)) AS n_nodes,
       |  (SELECT count(*) FROM edges) AS n_edges,
       |  n_triangles
       |FROM tri""".stripMargin

  /** DOULION estimate: d8's edge CTEs + deterministic md5 edge sample at
    * p = 1/8, triangle count on the sample × 512. Bit-exact vs Spark
    * because the sample is hash-decided, not RNG-decided. */
  private val dkTrianglesDoulion: String = {
    val prefix = dkTriangles.substring(0, dkTriangles.indexOf("tri AS ("))
    prefix +
      s"""sampled AS (
         |  SELECT doc_a, doc_b FROM edges
         |  WHERE ${dkHash60("doc_a::VARCHAR || '_' || doc_b::VARCHAR")} % 8 = 0),
         |tri AS (
         |  SELECT count(*) AS n FROM sampled e1
         |  JOIN sampled e2 ON e2.doc_a = e1.doc_b
         |  JOIN sampled e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
         |SELECT (SELECT count(*) FROM sampled) AS n_sampled_edges,
         |       n * 512 AS est_triangles
         |FROM tri""".stripMargin
  }

  /** d2's LSH-candidate CTEs with an evaluation tail: raw band candidates
    * scored against the exact-Jaccard truth (the d4 CTE chain, re-rooted
    * at `cand2` so it doesn't collide with the LSH `pairs`). */
  private val dkLshQuality: String =
    dkMinhashLsh.replace(dkJaccardTail,
      s"""cand2 AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shingled a JOIN shingled b
         |    ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |  FROM cand2 c
         |  JOIN shingled a ON a.doc_id = c.doc_a
         |  JOIN shingled b ON b.doc_id = c.doc_b AND b.sh = a.sh
         |  GROUP BY c.doc_a, c.doc_b),
         |truth AS (
         |  SELECT i.doc_a, i.doc_b FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.doc_a
         |  JOIN sizes sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter)
         |    >= $JaccardTau),
         |hit AS (SELECT p.doc_a FROM pairs p JOIN truth t
         |        ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b)
         |SELECT
         |  (SELECT count(*) FROM pairs) AS n_candidates,
         |  (SELECT count(*) FROM truth) AS n_truth,
         |  (SELECT count(*) FROM hit) AS n_hit,
         |  ((SELECT count(*) FROM hit) * 10000)
         |    // nullif((SELECT count(*) FROM pairs), 0) AS precision_bp,
         |  ((SELECT count(*) FROM hit) * 10000)
         |    // nullif((SELECT count(*) FROM truth), 0) AS recall_bp""".stripMargin)

  /** d2's LSH-candidate CTEs with the containment verify tail. */
  private val dkContainment: String =
    dkMinhashLsh.replace(dkJaccardTail,
      s"""sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
         |inter AS (
         |  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
         |  FROM pairs p
         |  JOIN shingled a ON a.doc_id = p.doc_a
         |  JOIN shingled b ON b.doc_id = p.doc_b AND b.sh = a.sh
         |  GROUP BY p.doc_a, p.doc_b)
         |SELECT i.doc_a, i.doc_b, i.inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
         |  round(CAST(i.inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 4)
         |    AS containment
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.doc_a
         |JOIN sizes sb ON sb.doc_id = i.doc_b
         |WHERE CAST(i.inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= $ContainTau
         |ORDER BY doc_a, doc_b""".stripMargin)

  /** d2's sig/band CTEs, pairs re-scoped to delta-probes-corpus and the
    * Jaccard tail replaced by the two-layer verdict (exact > near > kept). */
  private val dkIncremental: String =
    dkMinhashLsh
      .replace("l.doc_id < r.doc_id",
        "l.doc_id % 10 = 0 AND r.doc_id % 10 <> 0")
      .replace(dkJaccardTail,
        s"""sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled GROUP BY doc_id),
           |inter AS (
           |  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
           |  FROM pairs p
           |  JOIN shingled a ON a.doc_id = p.doc_a
           |  JOIN shingled b ON b.doc_id = p.doc_b AND b.sh = a.sh
           |  GROUP BY p.doc_a, p.doc_b),
           |near AS (
           |  SELECT i.doc_a AS doc_id, min(i.doc_b) AS near_of
           |  FROM inter i
           |  JOIN sizes sa ON sa.doc_id = i.doc_a
           |  JOIN sizes sb ON sb.doc_id = i.doc_b
           |  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter)
           |          >= $JaccardTau
           |  GROUP BY i.doc_a),
           |ex AS (
           |  SELECT dd.doc_id, min(c.doc_id) AS exact_of
           |  FROM documents dd JOIN documents c
           |    ON md5(dd.text) = md5(c.text) AND c.doc_id % 10 <> 0
           |  WHERE dd.doc_id % 10 = 0
           |  GROUP BY dd.doc_id)
           |SELECT d.doc_id,
           |  CASE WHEN e.exact_of IS NOT NULL THEN 'exact_dup'
           |       WHEN n.near_of IS NOT NULL THEN 'near_dup'
           |       ELSE 'kept' END AS status,
           |  coalesce(e.exact_of, n.near_of) AS match_id
           |FROM documents d
           |LEFT JOIN ex e ON e.doc_id = d.doc_id
           |LEFT JOIN near n ON n.doc_id = d.doc_id
           |WHERE d.doc_id % 10 = 0
           |ORDER BY d.doc_id""".stripMargin)

  /** d5's edge CTEs + a recursive min-hop BFS; the lvl < 6 cap mirrors the
    * Spark side's maxIters and bounds the recursion on cyclic graphs. */
  /** d26's mirror: stride-1 window hashes, ≥2-instance contents, runs of
    * consecutive duplicate window starts via pos − row_number. */
  private val dkRepeatedSpans: String =
    s"""WITH t AS (
       |  SELECT doc_id, $dkToks AS toks FROM documents),
       |w AS (
       |  SELECT doc_id, u.p AS pos,
       |    ${dkHash60(s"array_to_string(toks[u.p + 1 : u.p + $SpanL], ' ')")} AS wh
       |  FROM t, LATERAL (
       |    SELECT unnest(generate_series(0, len(toks) - $SpanL)) AS p) u
       |  WHERE len(toks) >= $SpanL),
       |c AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) >= 2),
       |r AS (
       |  SELECT w.doc_id, w.pos,
       |    ROW_NUMBER() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS rk
       |  FROM w JOIN c USING (wh)),
       |runs AS (
       |  SELECT doc_id, pos - rk AS grp, COUNT(*) AS run_len
       |  FROM r GROUP BY doc_id, grp)
       |SELECT doc_id,
       |  CAST(SUM(run_len) AS BIGINT) AS n_dup_windows,
       |  COUNT(*) AS n_spans,
       |  MAX(run_len) + ${SpanL - 1} AS longest_span_tokens
       |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** d26b's mirror: the d26 run structure over stride-1 [[SpanC]]-char
    * substrings of trim(text) (both engines count CHARACTERS — Spark
    * `substring`/`length` and DuckDB `substr`/`length` are codepoint-
    * based). */
  private val dkRepeatedCharSpans: String =
    s"""WITH t AS (
       |  SELECT doc_id, trim(text) AS txt FROM documents),
       |w AS (
       |  SELECT doc_id, u.p AS pos,
       |    ${dkHash60(s"substr(txt, u.p + 1, $SpanC)")} AS wh
       |  FROM t, LATERAL (
       |    SELECT unnest(generate_series(0, length(txt) - $SpanC)) AS p) u
       |  WHERE length(txt) >= $SpanC),
       |c AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) >= 2),
       |r AS (
       |  SELECT w.doc_id, w.pos,
       |    ROW_NUMBER() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS rk
       |  FROM w JOIN c USING (wh)),
       |runs AS (
       |  SELECT doc_id, pos - rk AS grp, COUNT(*) AS run_len
       |  FROM r GROUP BY doc_id, grp)
       |SELECT doc_id,
       |  CAST(SUM(run_len) AS BIGINT) AS n_dup_windows,
       |  COUNT(*) AS n_spans,
       |  MAX(run_len) + ${SpanC - 1} AS longest_span_chars
       |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** [[graft.ops.DedupOps.kcoreResidual]]'s peel unrolled: the d5 edge
    * CTEs as e0, then KCoreRounds × (degree over both endpoints → keep
    * nodes with deg ≥ k → keep edges whose endpoints both survive), and
    * the residual degree readout. All counts are BIGINT in both engines. */
  /** The peel rounds + residual-degree readout over a pair CTE named
    * `e0` — shared by d25 (doc graph) and d25r (collapsed class graph). */
  // lazy: referenced by dkKcoreResidual, which is declared earlier in the
  // object — a strict val would still be null at its initializer.
  private lazy val dkKcoreTail: String = {
    val rounds = (1 to KCoreRounds).map { i =>
      s"""d$i AS (
         |  SELECT u, COUNT(*) AS deg FROM (
         |    SELECT doc_a AS u FROM e${i - 1}
         |    UNION ALL SELECT doc_b FROM e${i - 1})
         |  GROUP BY u),
         |k$i AS (SELECT u FROM d$i WHERE deg >= $KCoreK),
         |e$i AS (
         |  SELECT doc_a, doc_b FROM e${i - 1}
         |  WHERE doc_a IN (SELECT u FROM k$i)
         |    AND doc_b IN (SELECT u FROM k$i))""".stripMargin
    }.mkString(",\n")
    s"""$rounds
       |SELECT u AS doc_id, COUNT(*) AS deg FROM (
       |  SELECT doc_a AS u FROM e$KCoreRounds
       |  UNION ALL SELECT doc_b FROM e$KCoreRounds)
       |GROUP BY u ORDER BY doc_id""".stripMargin
  }

  private val dkKcore: String =
    s"""WITH h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
       |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
       |bands AS (
       |  SELECT doc_id, simhash, b.band_idx,
       |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
       |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
       |e0 AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
       |   AND l.doc_id < r.doc_id
       |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
       |$dkKcoreTail""".stripMargin

  private val dkBfsLevels: String =
    s"""WITH RECURSIVE h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
       |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
       |bands AS (
       |  SELECT doc_id, simhash, b.band_idx,
       |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
       |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |         l.simhash AS sh_a, r.simhash AS sh_b
       |  FROM bands l JOIN bands r
       |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
       |   AND l.doc_id < r.doc_id),
       |e AS (SELECT doc_a, doc_b FROM cand
       |      WHERE bit_count(xor(sh_a, sh_b)) <= $MaxHamming),
       |und AS (SELECT doc_a AS u, doc_b AS v FROM e
       |        UNION ALL SELECT doc_b, doc_a FROM e),
       |bfs(doc_id, lvl) AS (
       |  SELECT doc_id, 0 FROM documents WHERE doc_id % 100 = 0
       |  UNION
       |  SELECT und.v, bfs.lvl + 1 FROM bfs JOIN und ON und.u = bfs.doc_id
       |  WHERE bfs.lvl < 6)
       |SELECT doc_id, CAST(min(lvl) AS BIGINT) AS level
       |FROM bfs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** [[graft.ops.DedupOps.pageRankExact]]'s 3 iterations unrolled as
    * chained CTEs over the d5 SimHash edge graph. All-BIGINT: `//` is
    * DuckDB's integer floor division (≡ Spark `div` on positives) and
    * every `sum` is cast back from HUGEINT. `r0Sql`/`teleportSql` gate the
    * initial mass and per-step teleport (uniform for d15, seed-only for
    * d17's personalized form; both may reference `d.doc_id`). */
  private def dkPageRankSql(r0Sql: String, teleportSql: String): String = {
    val steps = (1 to PageRankIters).map { i =>
      s"""m$i AS (
         |  SELECT und.dst,
         |    CAST(sum(r${i - 1}.rank_ppb // deg.degree) AS BIGINT) AS in_mass
         |  FROM und JOIN r${i - 1} ON r${i - 1}.doc_id = und.src
         |  JOIN deg ON deg.src = und.src
         |  GROUP BY und.dst),
         |r$i AS (
         |  SELECT d.doc_id,
         |    CAST(($teleportSql)
         |      + (coalesce(m$i.in_mass, 0) // 100) * 85
         |      + ((coalesce(m$i.in_mass, 0) % 100) * 85) // 100
         |      AS BIGINT) AS rank_ppb
         |  FROM documents d LEFT JOIN m$i ON m$i.dst = d.doc_id)"""
    }.mkString(",\n")
    s"""WITH h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
       |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
       |bands AS (
       |  SELECT doc_id, simhash, b.band_idx,
       |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
       |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |         l.simhash AS sh_a, r.simhash AS sh_b
       |  FROM bands l JOIN bands r
       |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
       |   AND l.doc_id < r.doc_id),
       |e AS (SELECT doc_a, doc_b FROM cand
       |      WHERE bit_count(xor(sh_a, sh_b)) <= $MaxHamming),
       |und AS (SELECT doc_a AS src, doc_b AS dst FROM e
       |        UNION ALL SELECT doc_b, doc_a FROM e),
       |deg AS (SELECT src, count(*) AS degree FROM und GROUP BY src),
       |r0 AS (SELECT d.doc_id, CAST($r0Sql AS BIGINT) AS rank_ppb
       |       FROM documents d),
       |$steps
       |SELECT doc_id, rank_ppb FROM r$PageRankIters ORDER BY doc_id""".stripMargin
  }

  private val dkDecontaminate: String =
    s"""WITH $dkShingled,
       |tr AS (SELECT doc_id, sh FROM shingled WHERE doc_id % 50 <> 0),
       |be AS (SELECT doc_id AS bench_id, sh FROM shingled
       |       WHERE doc_id % 50 = 0),
       |own AS (SELECT doc_id, count(*) AS n_own FROM tr GROUP BY doc_id),
       |st AS (
       |  SELECT tr.doc_id, count(DISTINCT tr.sh) AS n_shared,
       |         count(DISTINCT be.bench_id) AS n_bench_docs
       |  FROM tr JOIN be ON be.sh = tr.sh
       |  GROUP BY tr.doc_id)
       |SELECT s.doc_id, o.n_own, s.n_shared, s.n_bench_docs
       |FROM st s JOIN own o USING (doc_id)
       |WHERE s.n_shared >= 3
       |ORDER BY doc_id""".stripMargin

  private val dkBloomDecontaminate: String = {
    val salts = Seq(1, 2, 3)
    def bitsSel(src: String, cols: String) = salts.map { k =>
      s"""SELECT $cols,
         |  ('0x' || substr(md5('$k|' || sh), 1, 15))::BIGINT % 65536 AS b
         |FROM $src""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH $dkShingled,
       |tr AS (SELECT doc_id, sh FROM shingled WHERE doc_id % 50 <> 0),
       |be AS (SELECT DISTINCT sh FROM shingled WHERE doc_id % 50 = 0),
       |bb AS (
       |${bitsSel("be", "sh")}),
       |bloom AS (
       |  SELECT b // 32 AS word,
       |    bit_or(1::BIGINT << CAST(b % 32 AS INT)) AS bits
       |  FROM bb GROUP BY b // 32),
       |pr AS (
       |${bitsSel("tr", "doc_id, sh")}),
       |pos AS (
       |  SELECT p.doc_id, p.sh,
       |    min(CASE WHEN (coalesce(w.bits, 0::BIGINT)
       |          & (1::BIGINT << CAST(p.b % 32 AS INT))) <> 0
       |        THEN 1 ELSE 0 END) AS all_set
       |  FROM pr p LEFT JOIN bloom w ON w.word = p.b // 32
       |  GROUP BY p.doc_id, p.sh),
       |bh AS (
       |  SELECT doc_id, count(*) AS n_bloom
       |  FROM pos WHERE all_set = 1 GROUP BY doc_id),
       |exj AS (
       |  SELECT t.doc_id, count(DISTINCT t.sh) AS n_exact
       |  FROM tr t JOIN be b ON b.sh = t.sh GROUP BY t.doc_id)
       |SELECT h.doc_id, h.n_bloom,
       |  coalesce(x.n_exact, 0) AS n_exact,
       |  h.n_bloom - coalesce(x.n_exact, 0) AS n_fp,
       |  h.n_bloom >= 3 AS flag_bloom,
       |  coalesce(x.n_exact, 0) >= 3 AS flag_exact
       |FROM bh h LEFT JOIN exj x USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // d7's recursive-closure canon + the split tags — cross-pair sums
    // coalesce to 0 in BOTH engines so an empty pair set can't diverge
    "d32_leakage_split" ->
      s"""$dkSimhashClosureCtes,
         |tags AS (
         |  SELECT c.doc_id, c.canon_id,
         |    (${dkHash60("c.doc_id::VARCHAR")} % 5 = 0) AS naive_test,
         |    (${dkHash60("c.canon_id::VARCHAR")} % 5 = 0) AS cluster_test
         |  FROM canon c),
         |ct AS (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(CASE WHEN naive_test THEN 1 ELSE 0 END) AS BIGINT)
         |      AS naive_test_docs,
         |    CAST(sum(CASE WHEN cluster_test THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cluster_test_docs
         |  FROM tags),
         |cr AS (
         |  SELECT
         |    coalesce(CAST(sum(CASE WHEN a.naive_test <> b.naive_test
         |      THEN 1 ELSE 0 END) AS BIGINT), 0) AS naive_cross_pairs,
         |    coalesce(CAST(sum(CASE WHEN a.cluster_test <> b.cluster_test
         |      THEN 1 ELSE 0 END) AS BIGINT), 0) AS cluster_cross_pairs
         |  FROM jpairs p
         |  JOIN tags a ON a.doc_id = p.doc_a
         |  JOIN tags b ON b.doc_id = p.doc_b)
         |SELECT ct.n_docs, ct.naive_test_docs, ct.cluster_test_docs,
         |       cr.naive_cross_pairs, cr.cluster_cross_pairs
         |FROM ct CROSS JOIN cr
         |ORDER BY n_docs""".stripMargin,
    // CC mirrored as 4 unrolled min-label rounds — the planted duplicate
    // geometry is triangles around the min-id base record (diameter ≤ 2),
    // so 4 rounds strictly dominates convergence
    "d31_entity_resolution" ->
      """WITH c0 AS (
        |  SELECT c_custkey AS ck, CAST(c_nationkey AS BIGINT) AS nation,
        |         c_mktsegment AS seg, c_name AS nm,
        |         substr(md5(c_custkey::VARCHAR), 1, 8) AS h8,
        |         c_acctbal AS acctbal
        |  FROM customer),
        |recs AS (
        |  SELECT ck AS rec_id, nation,
        |         seg || ' ' || h8 || ' ' || nm AS name, acctbal
        |  FROM c0
        |  UNION ALL
        |  SELECT ck + 1000000, nation,
        |         seg || ' ' || (substr(h8, 1, 3) || substr(h8, 5, 4))
        |             || ' ' || nm,
        |         acctbal + 50.0
        |  FROM c0 WHERE ck % 10 = 0
        |  UNION ALL
        |  SELECT ck + 2000000, nation,
        |         seg || ' ' || (substr(h8, 1, 1) || 'z' || substr(h8, 3, 6))
        |             || ' ' || nm,
        |         acctbal
        |  FROM c0 WHERE ck % 20 = 0),
        |keyed AS (SELECT rec_id, nation, name,
        |                 split_part(name, ' ', 2) AS h8c FROM recs),
        |cand AS (
        |  SELECT CAST(nation AS VARCHAR) || ':' || substr(h8c, 1, 3) AS bk,
        |         rec_id FROM keyed
        |  UNION ALL
        |  SELECT CAST(nation AS VARCHAR) || ':' || right(h8c, 4) AS bk,
        |         rec_id FROM keyed),
        |pairs0 AS (
        |  SELECT DISTINCT a.rec_id AS doc_a, b.rec_id AS doc_b
        |  FROM cand a JOIN cand b ON a.bk = b.bk AND a.rec_id < b.rec_id),
        |ver AS (
        |  SELECT p.doc_a, p.doc_b
        |  FROM pairs0 p JOIN recs ra ON ra.rec_id = p.doc_a
        |       JOIN recs rb ON rb.rec_id = p.doc_b
        |  WHERE levenshtein(ra.name, rb.name) <= 2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM ver
        |      UNION ALL SELECT doc_b, doc_a FROM ver),
        |l0 AS (SELECT rec_id, rec_id AS lbl FROM recs),
        |l1 AS (SELECT r.rec_id, least(r.lbl, coalesce(min(n.lbl), r.lbl)) AS lbl
        |       FROM l0 r LEFT JOIN e ON e.dst = r.rec_id
        |            LEFT JOIN l0 n ON n.rec_id = e.src
        |       GROUP BY r.rec_id, r.lbl),
        |l2 AS (SELECT r.rec_id, least(r.lbl, coalesce(min(n.lbl), r.lbl)) AS lbl
        |       FROM l1 r LEFT JOIN e ON e.dst = r.rec_id
        |            LEFT JOIN l1 n ON n.rec_id = e.src
        |       GROUP BY r.rec_id, r.lbl),
        |l3 AS (SELECT r.rec_id, least(r.lbl, coalesce(min(n.lbl), r.lbl)) AS lbl
        |       FROM l2 r LEFT JOIN e ON e.dst = r.rec_id
        |            LEFT JOIN l2 n ON n.rec_id = e.src
        |       GROUP BY r.rec_id, r.lbl),
        |l4 AS (SELECT r.rec_id, least(r.lbl, coalesce(min(n.lbl), r.lbl)) AS lbl
        |       FROM l3 r LEFT JOIN e ON e.dst = r.rec_id
        |            LEFT JOIN l3 n ON n.rec_id = e.src
        |       GROUP BY r.rec_id, r.lbl)
        |SELECT l.lbl AS canon_id, count(*) AS n_members,
        |       max(CASE WHEN r.rec_id = l.lbl THEN r.name END) AS canon_name,
        |       max(r.acctbal) AS max_acctbal
        |FROM recs r JOIN l4 l ON l.rec_id = r.rec_id
        |GROUP BY l.lbl HAVING count(*) > 1
        |ORDER BY canon_id""".stripMargin,
    "d30_bloom_decontaminate" -> dkBloomDecontaminate,
    "d14_decontaminate" -> dkDecontaminate,
    "d13_bfs_levels" -> dkBfsLevels,
    "d25_kcore" -> dkKcore,
    "d26_repeated_spans" -> dkRepeatedSpans,
    "d26b_repeated_char_spans" -> dkRepeatedCharSpans,
    "d9r_graph_stats_residual" -> dkGraphStatsResidual,
    "d25r_kcore_residual" -> dkKcoreResidual,
    "d29r_lpa_residual" -> dkLpaResidual,
    "d15_pagerank" -> dkPageRankSql("1000000000", "150000000"),
    "d19_lsh_quality" -> dkLshQuality,
    // d2's LSH-candidate CTEs with the diagonal run-length tail
    "d22_quote_runs" -> dkMinhashLsh.replace(dkJaccardTail,
      s"""ps0 AS (
         |  SELECT doc_id,
         |    CASE WHEN len(toks) >= 3
         |      THEN list_transform(generate_series(1, len(toks) - 2),
         |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |      ELSE [trim(text)] END AS shs
         |  FROM sh0),
         |ps AS (
         |  SELECT doc_id, u.p AS pos, u.s AS sh
         |  FROM ps0, LATERAL (SELECT unnest(shs) AS s,
         |                            generate_subscripts(shs, 1) AS p) u),
         |m AS (
         |  SELECT p.doc_a, p.doc_b, a.pos AS pa, b.pos AS pb,
         |         a.pos - b.pos AS diag
         |  FROM pairs p
         |  JOIN ps a ON a.doc_id = p.doc_a
         |  JOIN ps b ON b.doc_id = p.doc_b AND b.sh = a.sh),
         |r AS (
         |  SELECT doc_a, doc_b, diag, pa,
         |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, diag
         |                            ORDER BY pa) AS grp
         |  FROM m),
         |runs AS (
         |  SELECT doc_a, doc_b, count(*) AS run_len
         |  FROM r GROUP BY doc_a, doc_b, diag, grp),
         |agg1 AS (SELECT doc_a, doc_b, max(run_len) AS max_run
         |         FROM runs GROUP BY doc_a, doc_b),
         |agg2 AS (SELECT doc_a, doc_b, count(*) AS n_hits
         |         FROM m GROUP BY doc_a, doc_b)
         |SELECT a1.doc_a, a1.doc_b,
         |  CAST(a1.max_run + 2 AS BIGINT) AS longest_run_tokens, a2.n_hits
         |FROM agg1 a1 JOIN agg2 a2 USING (doc_a, doc_b)
         |ORDER BY doc_a, doc_b""".stripMargin),
    // d7's closure CTEs + per-component size/savings aggregation
    "d21_dedup_savings" ->
      s"""$dkSimhashClosureCtes,
         |len AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
         |        FROM documents)
         |SELECT c.canon_id, count(*) AS n_members,
         |  CAST(sum(l.n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(l.n_chars) -
         |    max(CASE WHEN c.doc_id = c.canon_id THEN l.n_chars END)
         |    AS BIGINT) AS saved_chars
         |FROM canon c JOIN len l USING (doc_id)
         |GROUP BY c.canon_id
         |HAVING count(*) >= 2
         |ORDER BY canon_id""".stripMargin,
    "d17_personalized_ppr" -> dkPageRankSql(
      "CASE WHEN d.doc_id % 100 = 0 THEN 1000000000 ELSE 0 END",
      "CASE WHEN d.doc_id % 100 = 0 THEN 150000000 ELSE 0 END"),
    "d18_ngram_novelty" ->
      s"""WITH $dkShingled,
         |df AS (SELECT sh, count(*) AS df FROM shingled GROUP BY sh)
         |SELECT s.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unique,
         |  CAST((CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |        * 10000) // count(*) AS BIGINT) AS novelty_bp
         |FROM shingled s JOIN df USING (sh)
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    // the naive algorithm: PassJoin completeness is the thing under test
    "d16_editdist_join" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
         |           WHERE length(text) >= ${EditK + 1})
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
         |FROM d a JOIN d b
         |  ON a.doc_id < b.doc_id
         | AND abs(length(a.text) - length(b.text)) <= $EditK
         |WHERE levenshtein(a.text, b.text) <= $EditK
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d12_incremental_dedup" -> dkIncremental,
    "d28_weighted_jaccard" -> dkWeightedJaccard,
    "d29_label_propagation" -> dkLabelPropagation,
    "d6_dedup_groups" -> dkDedupGroups,
    "d7_simhash_groups" -> dkSimhashGroups,
    // two independent CC algorithms, one truth: d33's oracle is d7's SQL;
    // d35's incremental refresh must land on the same bytes too
    "d33_star_components" -> dkSimhashGroups,
    "d35_cc_incremental" -> dkSimhashGroups,
    "d33r_star_residual" ->
      s"""WITH RECURSIVE $dkClassCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM ce
         |  UNION ALL SELECT doc_b, doc_a FROM ce),
         |reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |canon AS (
         |  SELECT c.doc_id,
         |    least(c.doc_id, coalesce(min(r.dst), c.doc_id)) AS canon_id
         |  FROM cls c LEFT JOIN reach r ON r.src = c.doc_id
         |  GROUP BY c.doc_id)
         |SELECT doc_id, canon_id FROM canon ORDER BY doc_id""".stripMargin,
    // class-graph closure + closed-form pair counts + direct-edge join
    "d42_chaining_audit" ->
      s"""WITH RECURSIVE $dkClassCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM ce
         |  UNION ALL SELECT doc_b, doc_a FROM ce),
         |reach AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |canon AS (
         |  SELECT c.doc_id,
         |    least(c.doc_id, coalesce(min(r.dst), c.doc_id)) AS canon_id
         |  FROM cls c LEFT JOIN reach r ON r.src = c.doc_id
         |  GROUP BY c.doc_id),
         |cs AS (SELECT canon_id, CAST(count(*) AS BIGINT) AS n
         |       FROM canon GROUP BY 1 HAVING count(*) >= 2),
         |de AS (SELECT c.canon_id, CAST(count(*) AS BIGINT) AS n_edges
         |       FROM ce p JOIN canon c ON c.doc_id = p.doc_a GROUP BY 1),
         |comp AS (
         |  SELECT cs.n, cs.n * (cs.n - 1) // 2 AS n_pairs,
         |    coalesce(de.n_edges, 0) AS n_edges,
         |    CAST(length(bin(cs.n)) - 1 AS BIGINT) AS bucket
         |  FROM cs LEFT JOIN de USING (canon_id))
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_components,
         |  CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(sum(n_pairs) AS BIGINT) AS member_pairs,
         |  CAST(sum(n_edges) AS BIGINT) AS direct_edges,
         |  CAST((sum(n_pairs) - sum(n_edges)) * 1000000 // sum(n_pairs)
         |    AS BIGINT) AS chained_ppm
         |FROM comp GROUP BY bucket ORDER BY bucket""".stripMargin,
    // d7's closure + component sizes + per-source weighting
    "d40_effective_size" ->
      s"""$dkSimhashClosureCtes,
         |cs AS (SELECT canon_id, CAST(count(*) AS BIGINT) AS csize
         |       FROM canon GROUP BY 1),
         |j AS (SELECT c.doc_id, c.canon_id, cs.csize, d.source
         |      FROM canon c JOIN cs USING (canon_id)
         |      JOIN documents d ON d.doc_id = c.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT canon_id) AS BIGINT) AS n_components,
         |  CAST(sum(1000000 // csize) AS BIGINT) AS eff_docs_ppm,
         |  count(DISTINCT canon_id) * 10000 // count(*) AS distinct_bp
         |FROM j GROUP BY source ORDER BY source""".stripMargin,
    // replays the full advisor: 16-hash signature, three band splits,
    // union-verified exact Jaccard, and the SAME plan-build-time
    // S-curve literals
    "d39_lsh_advisor" -> {
      import graft.ops.TextOps.{MinhashP, permParams}
      val minAggs = (0 until NumHashes).map { i =>
        val (a, b) = permParams(i)
        s"min(($a * (('0x' || substr(md5(sh), 1, 8))::BIGINT) + $b) " +
          s"% $MinhashP) AS h$i"
      }.mkString(",\n    ")
      def cfg(b: Int, r: Int): String = {
        val bandCols = (0 until b).map { bb =>
          val hs = (0 until r).map(rr => s"h${bb * r + rr}::VARCHAR")
          s"md5(concat_ws(',', ${hs.mkString(", ")})) AS band$bb"
        }.mkString(",\n    ")
        val bandSel = (0 until b)
          .map(bb => s"SELECT doc_id, $bb AS band_idx, band$bb AS band_hash " +
            s"FROM sigb$b")
          .mkString("\n  UNION ALL\n  ")
        s"""sigb$b AS (
           |  SELECT doc_id,
           |    $bandCols
           |  FROM sig),
           |bands$b AS (
           |  $bandSel),
           |cand$b AS (
           |  SELECT DISTINCT l.doc_id AS doc_a, r2.doc_id AS doc_b
           |  FROM bands$b l JOIN bands$b r2
           |    ON l.band_idx = r2.band_idx AND l.band_hash = r2.band_hash
           |   AND l.doc_id < r2.doc_id)"""
      }
      val predCase = LshConfigs.map { case (b, r) =>
        s"WHEN ${b} THEN ${sCurvePpm(b, r)}"
      }.mkString(" ")
      val allSel = LshConfigs.map { case (b, r) =>
        s"SELECT $b AS bands, $r AS rpb, doc_a, doc_b FROM cand$b"
      }.mkString("\n  UNION ALL ")
      s"""WITH $dkShingled,
         |sig AS (
         |  SELECT doc_id,
         |    $minAggs
         |  FROM shingled GROUP BY doc_id),
         |${cfg(8, 2)},
         |${cfg(4, 4)},
         |${cfg(2, 8)},
         |allc AS (
         |  $allSel),
         |szs AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY 1),
         |dp AS (SELECT DISTINCT doc_a, doc_b FROM allc),
         |ver AS (
         |  SELECT c.doc_a, c.doc_b,
         |    CASE WHEN CAST(i.inter AS DOUBLE) /
         |      (sa.n_sh + sb2.n_sh - i.inter) >= $JaccardTau
         |      THEN 1 ELSE 0 END AS is_true
         |  FROM dp c
         |  JOIN (SELECT p.doc_a, p.doc_b, count(*) AS inter FROM dp p
         |        JOIN shingled a ON a.doc_id = p.doc_a
         |        JOIN shingled b ON b.doc_id = p.doc_b AND b.sh = a.sh
         |        GROUP BY 1, 2) i
         |    ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |  JOIN szs sa ON sa.doc_id = c.doc_a
         |  JOIN szs sb2 ON sb2.doc_id = c.doc_b),
         |tott AS (SELECT CAST(sum(is_true) AS BIGINT) AS tt FROM ver)
         |SELECT CAST(a.bands AS BIGINT) AS bands,
         |  CAST(a.rpb AS BIGINT) AS rows_per_band,
         |  CAST(CASE a.bands $predCase END AS BIGINT) AS pred_catch_ppm,
         |  CAST(count(*) AS BIGINT) AS n_cand,
         |  CAST(sum(v.is_true) AS BIGINT) AS n_true,
         |  CAST(sum(v.is_true) * 1000000 // count(*) AS BIGINT)
         |    AS precision_ppm,
         |  CAST(sum(v.is_true) * 1000000 // greatest(t.tt, 1) AS BIGINT)
         |    AS caught_ppm
         |FROM allc a JOIN ver v ON v.doc_a = a.doc_a AND v.doc_b = a.doc_b,
         |  tott t
         |GROUP BY a.bands, a.rpb, t.tt ORDER BY bands DESC""".stripMargin
    },
    // one k-gram hash table, three window-min passes, capped pair joins
    "d43_winnowing" -> {
      def winSql(w: Int): String =
        s"""${dkWinnowChain(w)},
           |row$w AS (
           |  SELECT CAST($w AS BIGINT) AS w,
           |    (SELECT CAST(count(*) AS BIGINT) FROM kg) AS n_kgrams,
           |    (SELECT CAST(count(*) AS BIGINT) FROM fp$w) AS n_fp,
           |    (SELECT CAST(count(*) AS BIGINT) FROM fp$w) * 1000000
           |      // (SELECT count(*) FROM kg) AS density_ppm,
           |    CAST(${2000000L / (w + 1)} AS BIGINT) AS pred_density_ppm,
           |    (SELECT CAST(count(*) AS BIGINT) FROM
           |      (SELECT fp_hash, count(DISTINCT doc_id) nd FROM fp$w
           |       GROUP BY 1) WHERE nd > $WinMaxDocs) AS n_common_dropped,
           |    (SELECT CAST(count(*) AS BIGINT) FROM pr$w) AS n_pairs,
           |    (SELECT CAST(count(*) AS BIGINT) FROM pr$w
           |     WHERE shared >= 3) AS n_pairs_strong)"""
      val wins = WinWs.map(winSql).mkString(",\n")
      val unions = WinWs.map(w => s"SELECT * FROM row$w")
        .mkString("\n  UNION ALL ")
      s"""WITH $dkWinnowKgCtes,
         |$wins
         |$unions
         |ORDER BY w""".stripMargin
    },
    // recomputes every DedupIndex chain from scratch — agreement gates
    // the served artifacts' cardinalities directly
    "d46_dedup_index_stats" ->
      s"""WITH RECURSIVE $dkMinhashCandCtes,
         |cpairs AS MATERIALIZED (SELECT * FROM pairs),
         |msig AS MATERIALIZED (SELECT * FROM sig),
         |hh AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
         |shx AS MATERIALIZED (
         |  SELECT doc_id, $dkSimhashExpr AS simhash FROM hh),
         |dbands AS (
         |  SELECT doc_id, simhash, b.band_idx,
         |    (simhash >> (b.band_idx * 8)) & 255 AS band_val
         |  FROM shx, (SELECT unnest([0,1,2,3]) AS band_idx) b),
         |de AS MATERIALIZED (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM dbands l JOIN dbands r
         |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         |   AND l.doc_id < r.doc_id
         |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
         |dedges AS (SELECT doc_a AS src, doc_b AS dst FROM de
         |  UNION ALL SELECT doc_b, doc_a FROM de),
         |dreach AS (
         |  SELECT src, dst FROM dedges
         |  UNION
         |  SELECT r.src, e.dst FROM dreach r JOIN dedges e ON r.dst = e.src),
         |dcanon AS MATERIALIZED (
         |  SELECT d.doc_id,
         |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS canon_id
         |  FROM documents d LEFT JOIN dreach r ON r.src = d.doc_id
         |  GROUP BY d.doc_id),
         |cls AS MATERIALIZED (
         |  SELECT simhash, min(doc_id) AS doc_id FROM shx GROUP BY simhash),
         |cbands AS (
         |  SELECT doc_id, simhash, b.band_idx,
         |    (simhash >> (b.band_idx * 8)) & 255 AS band_val
         |  FROM cls, (SELECT unnest([0,1,2,3]) AS band_idx) b),
         |ce AS MATERIALIZED (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM cbands l JOIN cbands r
         |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         |   AND l.doc_id < r.doc_id
         |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
         |cedges AS (SELECT doc_a AS src, doc_b AS dst FROM ce
         |  UNION ALL SELECT doc_b, doc_a FROM ce),
         |creach AS (
         |  SELECT src, dst FROM cedges
         |  UNION
         |  SELECT r.src, e.dst FROM creach r JOIN cedges e ON r.dst = e.src),
         |ccanon AS MATERIALIZED (
         |  SELECT c.doc_id,
         |    least(c.doc_id, coalesce(min(r.dst), c.doc_id)) AS canon_id
         |  FROM cls c LEFT JOIN creach r ON r.src = c.doc_id
         |  GROUP BY c.doc_id),
         |$dkWinnowKgCtes,
         |${dkWinnowChain(8)},
         |ndd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |nkgd AS (SELECT CAST(sum(greatest(len(toks) - 3, 1)) AS BIGINT)
         |  AS nkg FROM toksd),
         |nclsd AS (SELECT CAST(count(*) AS BIGINT) AS ncls FROM cls),
         |cd AS (SELECT CAST(count(DISTINCT dd) AS BIGINT) AS k FROM
         |  (SELECT doc_a AS dd FROM cpairs
         |   UNION ALL SELECT doc_b FROM cpairs)),
         |ed AS (SELECT CAST(count(DISTINCT dd) AS BIGINT) AS k FROM
         |  (SELECT doc_a AS dd FROM de UNION ALL SELECT doc_b FROM de)),
         |ced AS (SELECT CAST(count(DISTINCT dd) AS BIGINT) AS k FROM
         |  (SELECT doc_a AS dd FROM ce UNION ALL SELECT doc_b FROM ce))
         |SELECT artifact, n_rows, n_keys, ppm FROM (
         |  SELECT 'candidates' AS artifact,
         |    (SELECT CAST(count(*) AS BIGINT) FROM cpairs) AS n_rows,
         |    (SELECT k FROM cd) AS n_keys,
         |    CAST((SELECT k FROM cd) * 1000000
         |      // (SELECT nd FROM ndd) AS BIGINT) AS ppm
         |  UNION ALL
         |  SELECT 'edges',
         |    (SELECT CAST(count(*) AS BIGINT) FROM de),
         |    (SELECT k FROM ed),
         |    CAST((SELECT k FROM ed) * 1000000
         |      // (SELECT nd FROM ndd) AS BIGINT)
         |  UNION ALL
         |  SELECT 'canonical',
         |    (SELECT CAST(count(*) AS BIGINT) FROM dcanon),
         |    (SELECT CAST(count(DISTINCT canon_id) AS BIGINT) FROM dcanon),
         |    CAST(((SELECT count(*) FROM dcanon)
         |        - (SELECT count(DISTINCT canon_id) FROM dcanon)) * 1000000
         |      // (SELECT count(*) FROM dcanon) AS BIGINT)
         |  UNION ALL
         |  SELECT 'classes',
         |    (SELECT ncls FROM nclsd), (SELECT ncls FROM nclsd),
         |    CAST((SELECT ncls FROM nclsd) * 1000000
         |      // (SELECT nd FROM ndd) AS BIGINT)
         |  UNION ALL
         |  SELECT 'class_edges',
         |    (SELECT CAST(count(*) AS BIGINT) FROM ce),
         |    (SELECT k FROM ced),
         |    CAST((SELECT k FROM ced) * 1000000
         |      // (SELECT ncls FROM nclsd) AS BIGINT)
         |  UNION ALL
         |  SELECT 'class_canon',
         |    (SELECT CAST(count(*) AS BIGINT) FROM ccanon),
         |    (SELECT CAST(count(DISTINCT canon_id) AS BIGINT) FROM ccanon),
         |    CAST(((SELECT count(*) FROM ccanon)
         |        - (SELECT count(DISTINCT canon_id) FROM ccanon)) * 1000000
         |      // (SELECT count(*) FROM ccanon) AS BIGINT)
         |  UNION ALL
         |  SELECT 'minhash',
         |    (SELECT CAST(count(*) AS BIGINT) FROM msig),
         |    (SELECT CAST(count(DISTINCT h0) AS BIGINT) FROM msig),
         |    CAST((SELECT count(DISTINCT h0) FROM msig) * 1000000
         |      // (SELECT count(*) FROM msig) AS BIGINT)
         |  UNION ALL
         |  SELECT 'winnow_fp8',
         |    (SELECT CAST(count(*) AS BIGINT) FROM fp8),
         |    (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM fp8),
         |    CAST((SELECT count(*) FROM fp8) * 1000000
         |      // (SELECT nkg FROM nkgd) AS BIGINT)
         |) ORDER BY artifact""".stripMargin,

    "d45_contamination_agreement" -> {
      val salts = Seq(1, 2, 3)
      def bitsSel(src: String, cols: String) = salts.map { k =>
        s"""SELECT $cols,
           |  ('0x' || substr(md5('$k|' || sh), 1, 15))::BIGINT % 65536 AS b
           |FROM $src""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH $dkShingled,
         |tr AS (SELECT doc_id, sh FROM shingled WHERE doc_id % 50 <> 0),
         |be AS (SELECT DISTINCT sh FROM shingled WHERE doc_id % 50 = 0),
         |ex AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact
         |       FROM tr WHERE sh IN (SELECT sh FROM be) GROUP BY 1),
         |own AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_own
         |        FROM tr GROUP BY 1),
         |bb AS (
         |${bitsSel("be", "sh")}),
         |bloom AS (
         |  SELECT b // 32 AS word,
         |    bit_or(1::BIGINT << CAST(b % 32 AS INT)) AS bits
         |  FROM bb GROUP BY b // 32),
         |pr AS (
         |${bitsSel("tr", "doc_id, sh")}),
         |pos AS (
         |  SELECT p.doc_id, p.sh,
         |    min(CASE WHEN (coalesce(w.bits, 0::BIGINT)
         |          & (1::BIGINT << CAST(p.b % 32 AS INT))) <> 0
         |        THEN 1 ELSE 0 END) AS all_set
         |  FROM pr p LEFT JOIN bloom w ON w.word = p.b // 32
         |  GROUP BY p.doc_id, p.sh),
         |bh AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom
         |  FROM pos WHERE all_set = 1 GROUP BY doc_id),
         |$dkWinnowKgCtes,
         |${dkWinnowChain(8)},
         |wbe AS (SELECT DISTINCT fp_hash FROM fp8 WHERE doc_id % 50 = 0),
         |wfl AS (SELECT DISTINCT doc_id FROM fp8
         |        WHERE doc_id % 50 <> 0
         |          AND fp_hash IN (SELECT fp_hash FROM wbe)),
         |flags AS (
         |  SELECT d.doc_id,
         |    CASE WHEN coalesce(e.n_exact, 0) >= 3 THEN 1 ELSE 0 END
         |      AS f_exact,
         |    CASE WHEN coalesce(b.n_bloom, 0) >= 3 THEN 1 ELSE 0 END
         |      AS f_bloom,
         |    CASE WHEN w.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f_winnow,
         |    CASE WHEN coalesce(e.n_exact, 0) * 10000
         |        // greatest(coalesce(o.n_own, 1), 1) >= 1000
         |      THEN 1 ELSE 0 END AS f_frac
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
         |  LEFT JOIN ex e USING (doc_id)
         |  LEFT JOIN bh b USING (doc_id)
         |  LEFT JOIN wfl w USING (doc_id)
         |  LEFT JOIN own o USING (doc_id)),
         |onerow AS (SELECT
         |  CAST(coalesce(sum(f_exact), 0) AS BIGINT) AS truth_total,
         |  CAST(coalesce(sum(f_bloom), 0) AS BIGINT) AS bl_n,
         |  CAST(coalesce(sum(f_bloom * f_exact), 0) AS BIGINT) AS bl_t,
         |  CAST(coalesce(sum(f_winnow), 0) AS BIGINT) AS wn_n,
         |  CAST(coalesce(sum(f_winnow * f_exact), 0) AS BIGINT) AS wn_t,
         |  CAST(coalesce(sum(f_frac), 0) AS BIGINT) AS fr_n,
         |  CAST(coalesce(sum(f_frac * f_exact), 0) AS BIGINT) AS fr_t,
         |  CAST(coalesce(sum(greatest(f_exact, f_bloom, f_winnow,
         |    f_frac)), 0) AS BIGINT) AS ei_n,
         |  CAST(coalesce(sum(greatest(f_exact, f_bloom, f_winnow, f_frac)
         |    * f_exact), 0) AS BIGINT) AS ei_t,
         |  CAST(coalesce(sum(f_exact * f_bloom * f_winnow * f_frac), 0)
         |    AS BIGINT) AS a4_n
         |  FROM flags),
         |m AS (
         |  SELECT 'all4' AS signal, a4_n AS n_flagged, a4_n AS n_true
         |  FROM onerow
         |  UNION ALL SELECT 'bloom', bl_n, bl_t FROM onerow
         |  UNION ALL SELECT 'either', ei_n, ei_t FROM onerow
         |  UNION ALL SELECT 'exact', truth_total, truth_total FROM onerow
         |  UNION ALL SELECT 'frac10', fr_n, fr_t FROM onerow
         |  UNION ALL SELECT 'winnow_w8', wn_n, wn_t FROM onerow)
         |SELECT signal, n_flagged, n_true, truth_total,
         |  n_true * 1000000 // greatest(truth_total, 1) AS recall_ppm,
         |  n_true * 1000000 // greatest(n_flagged, 1) AS precision_ppm
         |FROM m CROSS JOIN (SELECT truth_total FROM onerow) t
         |ORDER BY signal""".stripMargin
    },
    "d44_signal_agreement" ->
      s"""WITH $dkMinhashCandCtes,
         |cand_a AS (SELECT doc_a, doc_b FROM pairs),
         |tsz AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingled
         |        GROUP BY doc_id),
         |tint AS (
         |  SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
         |  FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM shingled a JOIN shingled b
         |          ON a.sh = b.sh AND a.doc_id < b.doc_id) p
         |  JOIN shingled a ON a.doc_id = p.doc_a
         |  JOIN shingled b ON b.doc_id = p.doc_b AND b.sh = a.sh
         |  GROUP BY p.doc_a, p.doc_b),
         |truth AS MATERIALIZED (
         |  SELECT i.doc_a, i.doc_b FROM tint i
         |  JOIN tsz sa ON sa.doc_id = i.doc_a
         |  JOIN tsz sb ON sb.doc_id = i.doc_b
         |  WHERE CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter)
         |    >= $JaccardTau),
         |$dkWinnowKgCtes,
         |${dkWinnowChain(8)},
         |cand_b AS (SELECT doc_a, doc_b FROM pr8),
         |tagged AS (SELECT doc_a, doc_b, 1 AS ia, 0 AS ib FROM cand_a
         |      UNION ALL SELECT doc_a, doc_b, 0, 1 FROM cand_b),
         |flags AS (
         |  SELECT doc_a, doc_b, max(ia) AS in_a, max(ib) AS in_b
         |  FROM tagged GROUP BY 1, 2),
         |ft AS (
         |  SELECT f.in_a, f.in_b,
         |    CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_true
         |  FROM flags f LEFT JOIN truth t
         |    ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS truth_total FROM truth),
         |onerow AS (SELECT
         |  CAST(coalesce(sum(in_a), 0) AS BIGINT) AS a_cand,
         |  CAST(coalesce(sum(in_a * is_true), 0) AS BIGINT) AS a_true,
         |  CAST(coalesce(sum(in_b), 0) AS BIGINT) AS b_cand,
         |  CAST(coalesce(sum(in_b * is_true), 0) AS BIGINT) AS b_true,
         |  CAST(coalesce(sum(in_a * in_b), 0) AS BIGINT) AS both_cand,
         |  CAST(coalesce(sum(in_a * in_b * is_true), 0) AS BIGINT)
         |    AS both_true,
         |  CAST(count(*) AS BIGINT) AS e_cand,
         |  CAST(coalesce(sum(is_true), 0) AS BIGINT) AS e_true FROM ft),
         |m AS (
         |  SELECT 'both' AS signal, both_cand AS n_cand, both_true AS n_true
         |  FROM onerow
         |  UNION ALL SELECT 'either', e_cand, e_true FROM onerow
         |  UNION ALL SELECT 'minhash_band', a_cand, a_true FROM onerow
         |  UNION ALL SELECT 'winnow_w8', b_cand, b_true FROM onerow)
         |SELECT signal, n_cand, n_true, truth_total,
         |  n_true * 1000000 // greatest(truth_total, 1) AS recall_ppm,
         |  n_true * 1000000 // greatest(n_cand, 1) AS precision_ppm
         |FROM m CROSS JOIN tt ORDER BY signal""".stripMargin,
    "d38_contamination_curve" ->
      s"""WITH $dkShingled,
         |tr AS (SELECT doc_id, sh FROM shingled WHERE doc_id % 50 <> 0),
         |be AS (SELECT DISTINCT sh FROM shingled WHERE doc_id % 50 = 0),
         |hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit
         |        FROM tr WHERE sh IN (SELECT sh FROM be) GROUP BY 1),
         |own AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
         |        FROM tr GROUP BY 1),
         |fr AS (SELECT o.doc_id,
         |         coalesce(h.n_hit, 0) * 10000 // o.n_sh AS frac_bp
         |       FROM own o LEFT JOIN hit h USING (doc_id)),
         |th AS (SELECT unnest([1, 1000, 3000, 7000]) AS thr_bp)
         |SELECT CAST(thr_bp AS BIGINT) AS thr_bp,
         |  CAST(sum(CASE WHEN frac_bp >= thr_bp THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_flagged,
         |  CAST(count(*) AS BIGINT) AS n_train,
         |  CAST(sum(CASE WHEN frac_bp >= thr_bp THEN 1 ELSE 0 END) * 10000
         |    // count(*) AS BIGINT) AS flagged_bp
         |FROM fr CROSS JOIN th GROUP BY thr_bp ORDER BY thr_bp""".stripMargin,
    "d37_span_surgery" ->
      s"""WITH t AS (
         |  SELECT doc_id, $dkToks AS toks FROM documents),
         |ps AS (
         |  SELECT t.doc_id, u.i - 1 AS pos,
         |    toks[u.i] || ' ' || toks[u.i+1] || ' ' || toks[u.i+2] AS sh
         |  FROM t, LATERAL (SELECT unnest(generate_series(1,
         |    len(toks) - 2)) AS i) u),
         |bsh AS (SELECT DISTINCT sh FROM ps WHERE doc_id % 50 = 0),
         |ntk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
         |        FROM t WHERE doc_id % 50 <> 0),
         |sp AS (
         |  SELECT p.doc_id, n.n_tokens,
         |    CAST(greatest(p.pos - $SpanMargin, 0) AS BIGINT) AS st,
         |    CAST(least(p.pos + ${2 + SpanMargin}, n.n_tokens - 1)
         |      AS BIGINT) AS en
         |  FROM ps p JOIN bsh USING (sh) JOIN ntk n ON n.doc_id = p.doc_id
         |  WHERE p.doc_id % 50 <> 0),
         |mk AS (
         |  SELECT doc_id, n_tokens, st, en,
         |    CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st, en
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           IS NULL
         |         OR st > max(en) OVER (PARTITION BY doc_id
         |           ORDER BY st, en ROWS BETWEEN UNBOUNDED PRECEDING
         |           AND 1 PRECEDING) + 1
         |         THEN 1 ELSE 0 END AS new_isl
         |  FROM sp),
         |mi AS (
         |  SELECT doc_id, n_tokens, st, en,
         |    sum(new_isl) OVER (PARTITION BY doc_id ORDER BY st, en
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
         |  FROM mk),
         |isl AS MATERIALIZED (
         |  SELECT doc_id, max(n_tokens) AS n_tokens, isl,
         |    min(st) AS span_st, max(en) AS span_en,
         |    count(*) AS n_hits_isl
         |  FROM mi GROUP BY doc_id, isl),
         |stats AS MATERIALIZED (
         |  SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(n_hits_isl) AS BIGINT) AS n_hits,
         |    CAST(sum(span_en - span_st + 1) AS BIGINT) AS tokens_removed
         |  FROM isl GROUP BY doc_id),
         |cov AS (
         |  SELECT doc_id, unnest(generate_series(span_st, span_en)) AS pos
         |  FROM isl),
         |tk AS (
         |  SELECT t.doc_id, u.i - 1 AS pos, toks[u.i] AS tok
         |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)))
         |    AS i) u
         |  WHERE t.doc_id % 50 <> 0),
         |reb AS (
         |  SELECT k.doc_id,
         |    CAST(count(CASE WHEN c.pos IS NULL THEN 1 END) AS BIGINT)
         |      AS kept_tokens,
         |    CASE WHEN count(CASE WHEN c.pos IS NULL THEN 1 END) > 0
         |         THEN md5(string_agg(CASE WHEN c.pos IS NULL THEN k.tok
         |                             END, ' ' ORDER BY k.pos))
         |         END AS cleaned_md5
         |  FROM tk k
         |  JOIN stats s ON s.doc_id = k.doc_id
         |  LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.pos = k.pos
         |  GROUP BY k.doc_id)
         |SELECT s.doc_id, s.n_tokens, s.n_hits, s.n_spans,
         |  s.tokens_removed,
         |  CAST(s.tokens_removed * 1000000 // s.n_tokens AS BIGINT)
         |    AS removed_ppm,
         |  r.kept_tokens,
         |  CASE WHEN s.tokens_removed * 1000000 // s.n_tokens > 200000
         |       THEN 'drop' ELSE 'surgery' END AS disposition,
         |  r.cleaned_md5
         |FROM stats s JOIN reb r USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin,
    "d36_threshold_sweep" -> {
      val perTau = (0 to MaxHamming).map { tau =>
        s"""e$tau AS (
           |  SELECT doc_a AS src, doc_b AS dst FROM ceh WHERE hamming <= $tau
           |  UNION ALL
           |  SELECT doc_b, doc_a FROM ceh WHERE hamming <= $tau),
           |r$tau AS (
           |  SELECT src, dst FROM e$tau
           |  UNION
           |  SELECT r.src, e.dst FROM r$tau r JOIN e$tau e ON r.dst = e.src),
           |cc$tau AS (
           |  SELECT c.doc_id,
           |    least(c.doc_id, coalesce(min(r.dst), c.doc_id)) AS canon_id
           |  FROM cls c LEFT JOIN r$tau r ON r.src = c.doc_id
           |  GROUP BY c.doc_id),
           |sz$tau AS (SELECT canon_id, count(*) AS sz FROM cc$tau
           |           GROUP BY canon_id),
           |o$tau AS (
           |  SELECT $tau AS tau,
           |    (SELECT CAST(count(*) AS BIGINT) FROM ceh
           |     WHERE hamming <= $tau) AS n_edges,
           |    CAST(count(*) AS BIGINT) AS n_components,
           |    CAST(sum(sz) - count(*) AS BIGINT) AS n_collapsed,
           |    (CAST(max(sz) AS BIGINT) * 1000000)
           |      // CAST(sum(sz) AS BIGINT) AS giant_share_ppm
           |  FROM sz$tau)""".stripMargin
      }.mkString(",\n")
      val unions = (0 to MaxHamming)
        .map(tau => s"SELECT * FROM o$tau").mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE h AS (SELECT doc_id, $dkTokenHashes AS hs
         |                     FROM documents),
         |shx AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
         |cls AS (SELECT simhash, min(doc_id) AS doc_id FROM shx
         |        GROUP BY simhash),
         |cbands AS (
         |  SELECT doc_id, simhash, b.band_idx,
         |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
         |  FROM cls, (SELECT unnest([0,1,2,3]) AS band_idx) b),
         |ceh AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |         bit_count(xor(l.simhash, r.simhash)) AS hamming
         |  FROM cbands l JOIN cbands r
         |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         |   AND l.doc_id < r.doc_id
         |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
         |$perTau
         |$unions
         |ORDER BY tau""".stripMargin
    },
    "d34_modularity" ->
      s"""WITH $dkClassCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM ce
         |  UNION ALL SELECT doc_b, doc_a FROM ce),
         |l0 AS (SELECT doc_id, doc_id AS lbl FROM cls),
         |$dkLpaRounds,
         |lab AS (SELECT doc_id, lbl FROM l$LpaRounds),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ce),
         |intra AS (
         |  SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_intra
         |  FROM ce JOIN lab la ON la.doc_id = ce.doc_a
         |          JOIN lab lb ON lb.doc_id = ce.doc_b AND lb.lbl = la.lbl
         |  GROUP BY la.lbl),
         |deg AS (SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS deg
         |        FROM edges GROUP BY src),
         |comm AS (
         |  SELECT l.lbl, CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(sum(coalesce(d.deg, 0)) AS BIGINT) AS d_sum
         |  FROM lab l LEFT JOIN deg d USING (doc_id) GROUP BY l.lbl),
         |per AS (
         |  SELECT c.lbl AS community, c.n_nodes,
         |         coalesce(i.e_intra, 0) AS e_intra, c.d_sum,
         |         4 * mm.m * coalesce(i.e_intra, 0) - c.d_sum * c.d_sum
         |           AS num
         |  FROM comm c LEFT JOIN intra i USING (lbl), mm),
         |q AS (SELECT CAST(sum(num) AS BIGINT) AS qnum FROM per)
         |SELECT p.community, p.n_nodes, p.e_intra, p.d_sum,
         |  (q.qnum * 1000000) // (4 * mm.m * mm.m) AS q_ppm
         |FROM per p, q, mm ORDER BY p.community""".stripMargin,
    "d27_component_sizes" ->
      s"""$dkSimhashClosureCtes,
         |sizes AS (
         |  SELECT canon_id, COUNT(*) AS comp_size
         |  FROM canon GROUP BY canon_id),
         |hist AS (
         |  SELECT comp_size, COUNT(*) AS n_components
         |  FROM sizes GROUP BY comp_size),
         |tot AS (
         |  SELECT CAST(SUM(comp_size) AS BIGINT) AS n_docs,
         |         MAX(comp_size) AS max_size
         |  FROM sizes)
         |SELECT comp_size, n_components,
         |  comp_size * n_components AS docs_at_size,
         |  (max_size * 1000000) // n_docs AS giant_share_ppm
         |FROM hist CROSS JOIN tot ORDER BY comp_size""".stripMargin,
    "d10_central_keeper" -> dkCentralKeeper,
    "d11_containment" -> dkContainment,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id,
        |       COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin,
    "d2_minhash_lsh" -> dkMinhashLsh,
    "d3_simhash" ->
      s"""WITH h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents)
         |SELECT doc_id, $dkSimhashExpr AS simhash FROM h
         |ORDER BY doc_id""".stripMargin,
    "d4_ngram_jaccard" -> dkExactJaccard,
    // d20 = the SAME statistic via prefix filtering: one oracle text pins
    // the PPJoin candidates to the exhaustive answer (completeness proof)
    "d20_ppjoin" -> dkExactJaccard,
    "d5_simhash_pairs" ->
      s"""WITH h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
         |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
         |bands AS (
         |  SELECT doc_id, simhash, b.band_idx,
         |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
         |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
         |         l.simhash AS sh_a, r.simhash AS sh_b
         |  FROM bands l JOIN bands r
         |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         |   AND l.doc_id < r.doc_id)
         |SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= $MaxHamming
         |ORDER BY doc_a, doc_b""".stripMargin,
    // d8 / d8b / d8c are the same statistic via different algorithms: one
    // oracle text pins all three to the same answer.
    "d8_triangle_count" -> dkTriangles,
    "d8b_triangle_degree" -> dkTriangles,
    "d8c_triangle_cliques" -> dkTriangles,
    "d8d_triangle_doulion" -> dkTrianglesDoulion,
    "d9_graph_stats" ->
      s"""WITH h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
         |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
         |bands AS (
         |  SELECT doc_id, simhash, b.band_idx,
         |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
         |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
         |edges AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM bands l JOIN bands r
         |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         |   AND l.doc_id < r.doc_id
         |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
         |adj AS (
         |  SELECT doc_a AS u, doc_b AS v FROM edges
         |  UNION ALL SELECT doc_b, doc_a FROM edges),
         |deg AS (SELECT u, count(*) AS degree FROM adj GROUP BY u),
         |twohop AS (
         |  SELECT a1.u, count(DISTINCT a2.v) AS n_2hop
         |  FROM adj a1 JOIN adj a2 ON a1.v = a2.u
         |  WHERE a2.v <> a1.u
         |    AND NOT EXISTS (SELECT 1 FROM adj d
         |                    WHERE d.u = a1.u AND d.v = a2.v)
         |  GROUP BY a1.u),
         |tri AS (
         |  SELECT a1.u, count(*) AS n_tri
         |  FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
         |  JOIN edges e ON e.doc_a = a1.v AND e.doc_b = a2.v
         |  GROUP BY a1.u)
         |SELECT d.u AS doc_id, d.degree,
         |       coalesce(t2.n_2hop, 0) AS n_2hop,
         |       coalesce(t.n_tri, 0) AS n_tri
         |FROM deg d LEFT JOIN twohop t2 ON t2.u = d.u
         |LEFT JOIN tri t ON t.u = d.u
         |ORDER BY doc_id""".stripMargin,
    // d9's edge CTEs + the register/sample mirror of the sketched form:
    // every quantity is hash-decided or integer arithmetic, so the sketch
    // itself is bit-exact across engines (like q51's registers).
    "d9b_graph_stats_sketch" ->
      s"""WITH h AS (SELECT doc_id, $dkTokenHashes AS hs FROM documents),
         |sh AS (SELECT doc_id, $dkSimhashExpr AS simhash FROM h),
         |bands AS (
         |  SELECT doc_id, simhash, b.band_idx,
         |         (simhash >> (b.band_idx * 8)) & 255 AS band_val
         |  FROM sh, (SELECT unnest([0,1,2,3]) AS band_idx) b),
         |edges AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM bands l JOIN bands r
         |    ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         |   AND l.doc_id < r.doc_id
         |  WHERE bit_count(xor(l.simhash, r.simhash)) <= $MaxHamming),
         |adj AS (
         |  SELECT doc_a AS u, doc_b AS v FROM edges
         |  UNION ALL SELECT doc_b, doc_a FROM edges),
         |deg AS (SELECT u, count(*) AS degree FROM adj GROUP BY u),
         |r0 AS (
         |  SELECT u, bucket, max(rho) AS rho FROM (
         |    SELECT u, h % 64 AS bucket,
         |      CAST(CASE WHEN (h // 64) % 4294967296 = 0 THEN 33
         |           ELSE 33 - length(bin((h // 64) % 4294967296)) END
         |           AS BIGINT) AS rho
         |    FROM (SELECT u, ${dkHash60("v::VARCHAR")} AS h FROM adj))
         |  GROUP BY u, bucket),
         |r2 AS (
         |  SELECT u, bucket, max(rho) AS rho FROM (
         |    SELECT a.u, r.bucket, r.rho FROM adj a JOIN r0 r ON r.u = a.v
         |    UNION ALL SELECT u, bucket, rho FROM r0)
         |  GROUP BY u, bucket),
         |ball AS (
         |  SELECT u,
         |    CAST(sum(1::BIGINT << CAST(33 - rho AS INT)) AS BIGINT)
         |      + (64 - count(*)) * ${1L << 33} AS ball2_denom,
         |    CAST(64 - count(*) AS BIGINT) AS ball2_empty
         |  FROM r2 GROUP BY u),
         |sampled AS (
         |  SELECT doc_a, doc_b FROM edges
         |  WHERE ${dkHash60("doc_a::VARCHAR || '_' || doc_b::VARCHAR")} % 8 = 0),
         |trin AS (
         |  SELECT u, count(*) * 512 AS est_tri FROM (
         |    SELECT unnest([e1.doc_a, e1.doc_b, e2.doc_b]) AS u
         |    FROM sampled e1
         |    JOIN sampled e2 ON e2.doc_a = e1.doc_b
         |    JOIN sampled e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
         |  GROUP BY u)
         |SELECT d.u AS doc_id, d.degree, b.ball2_denom, b.ball2_empty,
         |  (${1L << 45} // b.ball2_denom) * 709340 // 1000000 AS ball2_est,
         |  coalesce(t.est_tri, 0) AS est_tri
         |FROM deg d JOIN ball b ON b.u = d.u
         |LEFT JOIN trin t ON t.u = d.u
         |ORDER BY doc_id""".stripMargin
  )
}
