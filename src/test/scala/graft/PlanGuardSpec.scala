package graft

import org.apache.spark.sql.functions._

/** Pins the scale-critical PHYSICAL-plan properties of the headline
  * queries, so a refactor that silently turns a broadcast join into a
  * shuffle — or worse, a bounded nested loop into an unbounded cartesian
  * product — fails here instead of at 100 TB. Planning only: no query is
  * executed.
  */
class PlanGuardSpec extends SparkSpecBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)

  test("no headline plan contains an unbounded cartesian product") {
    // Every intentional all-pairs form is either bench-excluded (d4/d6,
    // the ground-truth validators) or broadcast-bounded (BNLJ with a
    // tiny broadcast side — n1's query block, q40's 5x5x5 dims). A
    // CartesianProduct node means BOTH sides ship everywhere: never
    // acceptable in the headline mix.
    val offenders = Bench.headline.filter(SparkEntry.queries.contains)
      .filter(name => planOf(name).contains("CartesianProduct"))
    assert(offenders.isEmpty,
      s"cartesian products planned in: ${offenders.mkString(", ")}")
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    // s6 (events x customer) and q2 (star join) must keep the fact table
    // shuffle-free: the dimension side broadcasts.
    Seq("s6_inner_join", "q2_star_join_revenue").foreach { name =>
      val p = planOf(name)
      assert(p.contains("BroadcastHashJoin"),
        s"$name lost its broadcast join:\n$p")
    }
    // ANN serving broadcasts the query block under a nested loop — the
    // candidate side must never shuffle.
    val ann = planOf("n1_ann_bruteforce")
    assert(ann.contains("BroadcastNestedLoopJoin"),
      s"n1 must broadcast the query block:\n$ann")
  }

  test("q90's IVM delta joins broadcast the customer side, never the orders") {
    // The IVM contract is that delta work is |Δ|-bounded; a plan that
    // shuffles an orders side to meet a customer slice has reintroduced
    // the fact-table exchange the delta rule exists to avoid. All four
    // joins (stored view + three deltas) must be broadcast-hash.
    val p = planOf("q90_ivm_join")
    val n = "BroadcastHashJoin".r.findAllIn(p).size
    assert(n == 4, s"expected 4 broadcast joins in q90, found $n:\n$p")
  }

  test("n14 broadcasts the probe frame into the code scan, never the reverse") {
    // IVFADC's entire point is that the corpus side is a 4-byte-code scan
    // gated by a tiny broadcast (queries × ADC arrays × probed lists). A
    // plan that shuffles the code side to meet the probes has reintroduced
    // the full-corpus exchange PQ exists to avoid.
    val p = planOf("n14_ivfpq")
    assert(p.contains("BroadcastHashJoin"),
      s"n14's probe-gate join must broadcast:\n$p")
  }

  test("n15 partition-prunes the persisted code scan to the probed lists") {
    // The serve path's contract: the 4-byte code scan reads ONLY the
    // probed inverted lists' directories (the partitionBy(list_id)
    // layout is the index structure), and the probe frame broadcasts
    // into it — a plan that lists every partition or shuffles the code
    // side has lost the IVF access path. (First run per corpus builds
    // the index; the assertions are on the steady-state serve plan.)
    val p = planOf("n15_ivfpq_serve")
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(p).isDefined,
      s"n15's code scan must carry a list_id partition filter:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"n15's probe-gate join must broadcast:\n$p")
    // ranking must stay in the bounded aggregator: a Window here means
    // every probed candidate sorts on one reducer per query
    assert(!p.contains("Window"),
      s"n15 must rank through the bounded TopKAggregator, not a window:\n$p")
  }

  test("t50 partition-prunes the postings scan to the query-term buckets") {
    // The inverted index's access path: the postings scan reads ONLY the
    // buckets holding the query's terms (partitionBy(bucket) layout),
    // and the query-term frame broadcasts into it. A plan listing every
    // bucket or shuffling the postings side has lost the index. (First
    // run per corpus builds the index; assertions are on steady-state.)
    val p = planOf("t50_bm25_serve")
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined,
      s"t50's postings scan must carry a bucket partition filter:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"t50's query-term join must broadcast:\n$p")
  }

  test("p9's crash-cut frame broadcasts into the manifest, never shuffles it") {
    // The 5-row per-lang cut joins INTO the shard manifest; a shuffled
    // manifest side would re-exchange the pack for a planner that only
    // reads it.
    val p = planOf("p9_resume_plan")
    assert(p.contains("BroadcastHashJoin"),
      s"p9's cut join must broadcast:\n$p")
  }

  test("p1/p4/p5/p9 serve the persisted curation artifacts, not the corpus") {
    // The round-9 finding: 8 p-family queries recomputed the identical
    // curation front per query. The chain now runs ONCE inside
    // CurationIndex.ensure; the serve plans must read the persisted
    // artifact (ledger/docs/manifest parquet under curation-index/) and
    // never rescan the documents table. (ensure() runs at plan-build
    // time — these assertions pin the steady-state serve plan.)
    Seq("p1_curation_ledger", "p4_disposition", "p5_manifest",
        "p9_resume_plan").foreach { name =>
      val p = planOf(name)
      assert(p.contains("curation-index"),
        s"$name must scan the persisted curation artifact:\n$p")
      assert(!p.contains("documents"),
        s"$name must not rescan the corpus:\n$p")
    }
  }

  test("d40/d42 serve the persisted dedup artifacts, never re-run the collapse") {
    // The round-10 verdict's one weak: d40 re-ran the full SimHash pair
    // join + connected-components driver loop per report (12.2 s stable)
    // when the star forest is a once-per-corpus artifact. Serve-only
    // shape: the plan reads the persisted dedup-index parquet and
    // contains NO localCheckpoint scan (an ExistingRDD node is the
    // in-plan signature of the iterative CC rounds).
    val d40 = planOf("d40_effective_size")
    assert(d40.contains("dedup-index"),
      s"d40 must scan the persisted dedup artifact:\n$d40")
    assert(!d40.contains("ExistingRDD"),
      s"d40 must not contain checkpointed CC rounds:\n$d40")
    // d42 consumes the collapse (class edges + star labels) without
    // defining it — fully served, no corpus rescan at all.
    val d42 = planOf("d42_chaining_audit")
    assert(d42.contains("dedup-index"),
      s"d42 must scan the persisted dedup artifacts:\n$d42")
    assert(!d42.contains("documents") && !d42.contains("ExistingRDD"),
      s"d42 must not rescan the corpus or re-run CC:\n$d42")
  }

  test("the dedup candidate/edge consumers read the persisted artifacts") {
    // One banded pair join per corpus, not one per report: the consumer
    // families must read dedup-index parquet. (d9b/d9r/d29 serve the
    // same artifacts but localCheckpoint them at plan-build — their
    // final plans show the checkpoint, so the read is pinned by
    // DedupIndexSpec's bit-parity tests instead.)
    Seq("d22_quote_runs", "d28_weighted_jaccard",
        "d36_threshold_sweep", "d45_contamination_agreement").foreach { n =>
      val p = planOf(n)
      assert(p.contains("dedup-index"),
        s"$n must scan the persisted dedup artifact:\n$p")
    }
  }

  test("q64b profiles distincts through registers, not an Expand") {
    // q64's exact multi-column countDistinct plans an Expand (|cols|× the
    // scan) feeding distinct shuffles with O(cardinality) state; q64b's
    // whole reason to exist is replacing that with ≤6×1024 register
    // cells. An Expand reappearing means the sketch regressed to exact.
    val p = planOf("q64b_profile_sketch")
    assert(!p.contains("Expand"), s"q64b must not plan an Expand:\n$p")
    val q64 = planOf("q64_profile")
    assert(q64.contains("Expand"),
      "q64 (exact) is EXPECTED to Expand — if this stops holding, " +
        "re-check what q64b is claiming to save")
  }

  test("q73 samples through a bounded aggregator, not a per-stratum window sort") {
    // The point of q73 is that k-per-stratum sampling merges ≤k-row
    // buffers map-side; a regression to the row_number() formulation
    // would plan a Window over a full per-stratum sort — the 100 TB
    // single-reducer-per-language trap.
    val p = planOf("q73_stratified_sample")
    assert(!p.contains("Window"), s"q73 must not sort-and-rank per stratum:\n$p")
    assert(p.contains("Aggregate"), s"q73 must aggregate with the bounded buffer:\n$p")
  }

  test("d9b pins its register and wedge joins against AQE under-parallelization") {
    // Both joins are byte-light but compute-heavy (each register row fans
    // into 64 max-merges; each wedge row expands p²-fold), so AQE's
    // byte-based coalesce ran them on 2 tasks at sf0.1 (measured 2×5.9 s).
    // The four REPARTITION_BY_NUM exchanges (register join both sides,
    // wedge join both sides) are the fix — a refactor that drops them
    // re-serializes the sketch.
    val p = planOf("d9b_graph_stats_sketch")
    val pins = "REPARTITION_BY_NUM".r.findAllMatchIn(p).length
    assert(pins >= 4, s"d9b must pin 4 exchanges, found $pins:\n$p")
  }

  test("merge and sketch lookups broadcast their small sides") {
    // q54: the TB-scale target side must probe a BROADCAST left-anti join
    // (a shuffled anti join would move the whole dimension).
    val merge = planOf("q54_merge_upsert")
    assert(merge.contains("BroadcastHashJoin") && merge.contains("LeftAnti"),
      s"q54 lost its broadcast anti join:\n$merge")
    // q55: the ≤2048-cell sketch broadcasts under the lookup join.
    val cms = planOf("q55_countmin")
    assert(cms.contains("BroadcastHashJoin"),
      s"q55 must broadcast the sketch side:\n$cms")
    // q56: each funnel step joins a dimension-sized per-user table back to
    // the fact scan — all three step joins broadcast.
    val funnel = planOf("q56_funnel")
    assert(funnel.contains("BroadcastHashJoin"),
      s"q56 funnel steps must broadcast the per-user step tables:\n$funnel")
  }

  test("t38 broadcasts the PERSISTED NB model into the token scan") {
    // The distillation serving contract: the vocab-bounded model tables
    // (per-(cls,tok) likelihoods + per-class constants) broadcast — a
    // sort-merge join on tok would shuffle the whole corpus token list
    // to meet a dictionary. And the model must be READ from the
    // ClassifierIndex artifact, not retrained in-query: the plan shows
    // the nb-model parquet scan feeding the broadcast.
    val p = planOf("t38_quality_distill")
    assert(p.contains("BroadcastHashJoin"),
      s"t38 must broadcast the model:\n$p")
    assert("SortMergeJoin \\[[^\\]]*tok".r.findFirstIn(p).isEmpty,
      s"t38's token-scoring join fell back to sort-merge:\n$p")
    assert(p.contains("nb-model"),
      s"t38 must serve the persisted ClassifierIndex model, not retrain:\n$p")
  }

  test("t55 broadcasts the PERSISTED LM tables into both bigram scans") {
    // The min-k serving contract mirrors t38's: the vocab-bounded LM
    // count tables (pair / prefix / unigram / totals) broadcast into
    // the holdout bigram scan — a sort-merge join on a token key would
    // shuffle the corpus bigram list to meet a dictionary. Scoring
    // runs twice (per-bigram mink leg + per-doc avg leg), each with 3
    // model joins, so the plan must carry at least 6 broadcast-hash
    // joins and no token-keyed sort-merge. The lone SortMergeJoin on
    // doc_id (scl ⋈ mink — two co-partitioned per-doc aggregates) is
    // the correct shape and stays.
    val p = planOf("t55_min_k_prob")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 6, s"t55 expected >=6 model broadcasts, found $bhj:\n$p")
    assert("SortMergeJoin \\[[^\\]]*w[12]".r.findFirstIn(p).isEmpty,
      s"t55's model join fell back to a token-keyed sort-merge:\n$p")
    assert(p.contains("lm-index"),
      s"t55 must serve the persisted LmIndex, not retrain in-query:\n$p")
  }

  test("t57 serves the persisted LM and broadcasts its model tables") {
    // The DoReMi weights must not retrain the LM in-query: the holdout
    // scoring leg joins the persisted vocab-bounded count tables via
    // broadcast (3 model joins), and the final weight frame is
    // |sources|-row broadcast arithmetic — no token-keyed sort-merge.
    val p = planOf("t57_doremi_weights")
    assert(p.contains("lm-index"),
      s"t57 must serve the persisted LmIndex, not retrain in-query:\n$p")
    assert("SortMergeJoin \\[[^\\]]*w[12]".r.findFirstIn(p).isEmpty,
      s"t57's model join fell back to a token-keyed sort-merge:\n$p")
  }

  test("q66 ranks through range partitions, never one global ntile sort") {
    // ntile(10).over(Window.orderBy(...)) plans as Exchange
    // SinglePartition — the whole customer table through one sort task.
    // The exact-rank form must show only PARTITIONED windows (the range
    // id leads the window spec); an un-partitioned spec ordered by
    // c_acctbal means the global sort came back.
    val p = planOf("q66_ntile_deciles")
    assert(!p.contains("ntile("),
      s"q66 must not plan a global ntile:\n$p")
    assert("windowspecdefinition\\(c_acctbal".r.findFirstIn(p).isEmpty,
      s"q66's rank window must be range-partitioned, not global:\n$p")
  }

  test("q91 never sorts or windows the full table") {
    // The range planner's contract: the ONLY sort is the sample's
    // (executed while building the boundary literals, outside this
    // plan); the full-table pass is scan → literal-probe pid → combinable
    // agg. A Window or sort-merge join here means the planner degraded
    // into the global sort it exists to avoid.
    val p = planOf("q91_range_plan")
    assert(!p.contains("Window"),
      s"q91's full-table pass must not window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q91's full-table pass must not join-sort:\n$p")
  }

  test("q91's boundary sample is bounded before its un-partitioned rank") {
    // The planner's sample leg (executed at boundary-build time, outside
    // the q91 plan above) must never feed an unbounded relation into an
    // un-partitioned Window: the per-stratum top-k filter has to compile
    // to WindowGroupLimit — map tasks prune to ≤PerBucket rows per
    // stratum BEFORE the exchange — so the global rank's input is
    // ≤ SampleBuckets·PerBucket rows by construction. A rate sample (the
    // round-8 form) has no WindowGroupLimit and funnels a table-sized
    // sample through one sort task at 100 TB.
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("v"))
    val p = graft.ops.RangePlanOps.boundedRankedSample(li)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("WindowGroupLimit"),
      s"sample's per-stratum top-k lost its WindowGroupLimit pushdown:\n$p")
    // exactly one un-partitioned Window (the global rank); its input side
    // carries the bounded brn filter
    assert(p.contains("brn"), s"bounded-reservoir filter missing:\n$p")
  }

  test("parquet scans prune to the referenced columns") {
    // s4 projects 2 of part's 9 columns; the scan must read only those.
    val p = planOf("s4_array_index")
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("p_partkey") && read.contains("p_type") &&
      !read.contains("p_retailprice"),
      s"s4 scan is not column-pruned: $read")
  }

  test("d37 broadcasts the bench shingle set and keeps excision an equi-join") {
    // Surgery's scale contract: the train×bench probe is a broadcast of
    // the (small) protected set — a shuffle here moves the whole corpus's
    // positional shingles; and the island-excision join must stay on
    // (doc_id, pos) equi-keys, never a range nested loop.
    val p = planOf("d37_span_surgery")
    assert(p.contains("BroadcastHashJoin"),
      s"d37's bench-set probe must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin")
      && !p.contains("CartesianProduct"),
      s"d37's excision must stay an equi-join:\n$p")
  }

  test("n23's member rank is group-limit pruned behind the literal budget") {
    // The literal rn <= budget conjunct must plan a WindowGroupLimit so
    // each cluster ships at most `budget` candidates into the rank sort
    // (q91's bounded-reservoir argument applied to per-cluster top-k);
    // and the |clusters|-row quota frame must broadcast into the member
    // scan, never shuffle it.
    val p = planOf("n23_cluster_sample")
    assert(p.contains("WindowGroupLimit"),
      s"n23 lost the literal-budget group-limit prune:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"n23's quota frame must broadcast:\n$p")
  }

  test("t44's DSIR model broadcasts and both ranks are group-limit pruned") {
    // The 256-row hashed-bigram model must broadcast into the ngram scan
    // (shuffling the scan to meet a 256-row frame is the classic
    // dim-join inversion), and both global selection ranks sit behind
    // literal rn<=budget conjuncts → WindowGroupLimit, so no unbounded
    // relation feeds an un-partitioned sort (the q91 defect class).
    val p = planOf("t44_dsir_select")
    assert(p.contains("BroadcastHashJoin"),
      s"t44's bucket model must broadcast:\n$p")
    // the un-partitioned rank behind a literal rn<=budget plans as a
    // bounded TakeOrderedAndProject (map-side partial top-k, single
    // 32·budget-row merge) — or at worst a WindowGroupLimit prune;
    // either bounds what reaches the sort, which is the contract
    assert(p.contains("TakeOrderedAndProject")
      || p.contains("WindowGroupLimit"),
      s"t44's selection ranks lost the bounded-top-k prune:\n$p")
  }
}
