package graft

/** Scale-shape assertions on the gated query plans (VERDICT r1 item 3):
  * the solar join chain and the round-2 bucketed candidate generators must
  * contain no BroadcastNestedLoopJoin and no CartesianProduct — those are
  * the O(n²) shapes that kill a 100 TB run even when small-SF correctness
  * is green. (q12/q14 were originally documented id-window NLJ demos with
  * scale twins q31/q32 — since the r15 optimizer rules they auto-rewrite
  * to equi plans, so they are now IN the gate.)
  */
class PlanShapeSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private val scaleShaped = Seq(
    "q04_join_panel_module", "q06_join_module_panel",
    "q07_anomaly_filter", "q08_flagship_anomalies",
    "q11_dedup_minhash_lsh", "q13_dedup_ngram_jaccard",
    "q31_dedup_simhash_bucketed", "q32_dedup_embedding_cells",
    "q33_ann_ivf_kmeans", "q35_asof_join", "q39_range_join", "q40_salted_join",
    "q51_ann_ivf_multiprobe", "q56_bag_set_ops", "q57_correlated_subquery",
    // q71/q84/q88/q89/q90 are NOT here: their one-row
    // crossJoin(broadcast(totals)) is a documented safe-by-construction
    // BroadcastNestedLoopJoin (global-aggregate side)
    "q74_contamination",
    "q80_token_budget_select", "q81_epoch_shuffle", "q82_boilerplate_removal",
    "q83_span_dedup", "q85_srp_lsh", "q86_incremental_dedup",
    "q87_exact_quantile_twopass", "q91_ohlc_downsample", "q92_train_split",
    "q93_dedup_savings", "q95_blocklist_filter", "q96_cluster_quality",
    "q97_feature_extract_batch",
    // r13: the incremental merge and the four-stage ingestion chain must
    // stay equi-join-shaped. q129 is NOT here for the same reason as q15:
    // its float/pq BRUTE variants are corpus × broadcast(8 golden
    // queries) with a <>-condition — a safe-by-construction BNLJ whose
    // broadcast side is the bounded query sample; the IVF-PQ variants
    // inside the same query are cell equi-joins.
    "q128_corpus_merge_incremental", "q130_ingest_chain",
    // r15: the ex-NLJ demos now rewrite to equi plans automatically...
    "q12_dedup_simhash", "q14_dedup_embedding_cosine",
    // ...and the optimizer-rule gates themselves must stay rewritten
    // (q151's lambda sets its bin-width conf; the rules read confs at
    // optimization time, which happens inside queryExecution below)
    "q150_hamming_join_rewrite", "q151_interval_join_rewrite",
    "q152_pagerank_centrality", "q153_fuzzy_decontamination",
    // r16: SCD2 build + broadcast point-in-time join, triangle
    // compact-forward (all equi), TrustRank (the PageRank shape).
    // NOT here: q163 (its FK stitch is the documented one-row
    // crossJoin(broadcast) BNLJ), q164/q166 (the ≤2k-char short-string
    // branch is a safe-by-construction BNLJ between two finite tiny
    // sets — empty on the gate fixture but present in the plan)
    "q160_scd2_build", "q161_scd2_pointintime", "q162_triangle_lcc",
    "q165_trustrank",
    // r17: EWMA (no joins at all), containment (needle-prefix index
    // probe + overlap-count equi-joins), PSI (full-outer sketch join),
    // LPA (vote equi-join + argmax aggregate). NOT here: q168 (its
    // 3-row quantile relation rides a documented crossJoin(broadcast)
    // BNLJ), q167 (checkpoint-looped like q52 — the interesting plan
    // lives inside the rounds, pinned by GraphSpec instead)
    "q169_ewma_anomaly", "q170_containment_join", "q171_psi_drift",
    "q172_lpa_communities", "q175_cdc_apply", "q176_regional_volume",
    // the OR-join gate MUST plan NLJ-free — that is the rule under test
    "q177_or_join_rewrite",
    // r18: rank/stat aggregates over sketch-sized relations (q179/q186/
    // q192), the reconciliation semi/anti chain (q182), IVF candidate
    // equi-joins (q184/q185), the MV rollup + its maintenance merges
    // (q188/q189/q196), per-level broadcast generalization (q191), the
    // funnel cascade (q190), folds (q187/q194/q195), profile Expand
    // (q193), purge receipt (q197). NOT here: q181 (its one-row totals
    // and the marginal-grid cross join are documented
    // safe-by-construction broadcast BNLJs), q180/q183 (scan-only —
    // included anyway costs nothing, so they are in)
    "q179_roc_auc", "q180_grouped_trend", "q182_table_diff",
    "q183_schema_evolution", "q184_hard_negatives", "q185_retrieval_ndcg",
    "q186_robust_outliers", "q187_attribution", "q188_mv_rollup",
    "q189_summary_delta", "q190_funnel_within", "q191_kanonymize",
    "q192_robust_outliers_artifact", "q193_table_profile",
    "q194_top_paths", "q195_transition_timing",
    "q196_summary_delete_rebuild", "q197_forget_receipt")

  for (name <- scaleShaped)
    test(s"$name plan has no nested-loop join and no cartesian product") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"BroadcastNestedLoopJoin in plan:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"CartesianProduct in plan:\n$plan")
      spark.catalog.clearCache()
    }

  // The one-pass claims in Curation/Similarity docs, pinned as plan-shape
  // assertions: exchange count == shuffles, scan count == corpus passes.
  private def shape(name: String): (Int, Int) = {
    // executedPlan (not sparkPlan): exchanges are inserted by
    // EnsureRequirements during preparation
    val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange "))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    (exchanges, scans)
  }

  // VERDICT r7 #1: the four hot-bucket caps (LSH bands, shingle df,
  // corpus band index, SRP bands) must be map-side-combining
  // groupBy+anti-join, never count(*) OVER (PARTITION BY bucket) — an
  // unordered window buffers the whole viral bucket in one WindowExec
  // task before the filter can drop it.
  for (name <- Seq("q11_dedup_minhash_lsh", "q13_dedup_ngram_jaccard",
                   "q85_srp_lsh", "q86_incremental_dedup"))
    test(s"$name bucket cap is window-free") {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"hot-bucket cap must not use WindowExec:\n$plan")
      spark.catalog.clearCache()
    }

  test("q176 six-table join: dims broadcast, fact pipelines, one shuffle") {
    // the TPC-H Q5 shape must plan as lineitem streaming through five
    // BroadcastHashJoins with the date filter pushed into the orders
    // scan — the only shuffle is the final aggregate's
    val qe = SparkEntry.queries("q176_regional_volume")(spark, sfDir)
      .queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) === 5)
    assert(!plan.contains("SortMergeJoin"))
    val shuffles = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("ReusedExchange"))
    assert(shuffles <= 2, s"expected only the aggregate exchange:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      "date range must push into the orders scan")
    spark.catalog.clearCache()
  }

  test("q113 ground-truth window join is the bin-bucket equi-join") {
    // the only nested-loop join allowed is the one-row recall-report
    // cross (the documented safe-by-construction global-aggregate shape);
    // the corpus-side truth join must hash on the blk bucket, never
    // nested-loop over n² id pairs
    val plan = SparkEntry.queries("q113_lsh_recall")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"corpus-sized nested loop crept into q113:\n$plan")
    assert(plan.contains("blk"), s"bin-bucket key missing from plan:\n$plan")
    spark.catalog.clearCache()
  }

  test("q53 curation is one corpus scan + one shuffle, window-free") {
    val q = SparkEntry.queries("q53_curation_pipeline")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    // VERDICT r6 #1: survivor selection must be a map-side-combining
    // aggregate, never a window — an unordered fp64 window funnels a viral
    // duplicate's whole group through one WindowExec task
    assert(!plan.contains("Window"),
      "curation survivor selection must not use WindowExec")
    val (exchanges, scans) = shape("q53_curation_pipeline")
    assert(exchanges === 1, "curation must shuffle exactly once (fp64 agg)")
    assert(scans === 1, "curation must scan the corpus exactly once")
    spark.catalog.clearCache()
  }

  test("q80 boundary running sum is the two-level (qb, block) window") {
    // VERDICT r16 #1: the boundary bucket's running sum must shard by
    // (qb, md5-block) — a single-key Window.partitionBy(qb) funnels the
    // whole boundary bucket (~1/#buckets of the corpus, several GB at
    // 100 TB) through ONE task. The two-level form is bit-identical to
    // one window ordered by (block, doc_id) and parallel in #blocks.
    val plan = SparkEntry.queries("q80_token_budget_select")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.exists(l =>
        "\\], \\[qb#\\d+, block#\\d+\\], \\[doc_id".r.findFirstIn(l).isDefined),
      s"two-level (qb, block) boundary window missing:\n$plan")
    // and no unpartitioned window anywhere: the descending bucket prefix
    // is computed inside one collected ≤101-element array (higher-order
    // aggregate), not a global single-partition WindowExec
    assert(windows.forall(!_.contains("], [], [")),
      s"unpartitioned Window crept back into q80:\n$plan")
    spark.catalog.clearCache()
  }

  test("q54 stratified sampling is scan-only (no shuffle)") {
    val (exchanges, scans) = shape("q54_stratified_sample")
    assert(exchanges === 0)
    assert(scans === 1)
  }

  test("q55 quantization is scan-only (no shuffle)") {
    val (exchanges, scans) = shape("q55_embedding_quantize")
    assert(exchanges === 0)
    assert(scans === 1)
  }

  test("q111 classifier scoring is scan-only (no shuffle, no window)") {
    // the scoring claim: kernels + logit + sigmoid fuse into the scan
    // projection — adding a shuffle here would mean the model stopped
    // being a per-row expression
    val (exchanges, scans) = shape("q111_quality_classifier")
    assert(exchanges === 0)
    assert(scans === 1)
  }

  // Two plan-shape claims previously made only in docs (VERDICT r4 #7):
  // global ORDER BY + LIMIT must run as per-partition heaps, and the
  // fixed-size stratum sample must rank through per-partition group
  // limits, not a full stratum sort.

  // Round 9: candidate-scored top-k ranks through the bounded
  // TopKByScoreAgg heap (ObjectHashAggregate), never a row_number window —
  // the window form sorts the whole candidate stream per map partition and
  // spills at probe scale (measured 1,433 s for multi-probe IVF at 1M
  // vectors; ~9 s with the heap). Pin all four ANN top-k gated plans
  // window- and sort-free on the candidate stream.
  for (name <- Seq("q15_ann_topk_brute", "q16_ann_ivf_label",
                   "q33_ann_ivf_kmeans", "q51_ann_ivf_multiprobe",
                   "q73_ann_quantized"))
    test(s"$name ranks via the bounded heap aggregate, not a window sort") {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec") && !plan.contains("Window "),
        s"window in ANN ranking plan:\n$plan")
      assert(!plan.contains("WindowGroupLimit"),
        s"WindowGroupLimit in ANN ranking plan:\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"expected ObjectHashAggregate heap ranking in plan:\n$plan")
      spark.catalog.clearCache()
    }

  test("q42 global top-n executes as TakeOrderedAndProject") {
    val plan = SparkEntry.queries("q42_global_topn")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in plan:\n$plan")
  }

  test("q62 fixed-size sample executes through WindowGroupLimit") {
    val plan = SparkEntry.queries("q62_fixed_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in plan:\n$plan")
  }

  // q13's final stats joins must not hard-code a broadcast of the
  // per-document sizes table (VERDICT r4 #1): at sf the optimizer may
  // legitimately CHOOSE broadcast, so the assertion is on the logical
  // plan carrying no user hint, via the analyzed plan's hint nodes.
  test("q13 carries no user broadcast hint on per-document tables") {
    val analyzed = SparkEntry.queries("q13_dedup_ngram_jaccard")(spark, sfDir)
      .queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
      case r: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => r
    }
    assert(hints.isEmpty, s"unexpected join hints: $hints")
  }

  // q77's running sum must shard by (lang, block), never by lang alone
  // (VERDICT r5 #1): a lang-only window caps parallelism at #languages and
  // serializes the dominant language through one task. The pin reads the
  // physical Window operators' partition specs — the big per-document
  // window must carry BOTH keys; only the #langs×#blocks block-offset
  // window may be lang-only.
  test("q77 per-document window partitions by (lang, block), not lang alone") {
    // string form: AQE wraps the physical plan, so operator collect()
    // sees only AdaptiveSparkPlanExec. The per-document window is the one
    // whose spec ORDERS by doc_id; it must PARTITION by lang AND block
    // (the lang-only window is the #langs×#blocks offset stitch).
    val plan = SparkEntry.queries("q77_sequence_packing")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowLines.nonEmpty, s"expected Window operators:\n$plan")
    val perDoc = windowLines.filter(_.contains("doc_id#"))
    assert(perDoc.nonEmpty, s"no doc_id-ordered window:\n$plan")
    assert(perDoc.forall(l =>
      l.contains("windowspecdefinition(lang#") && l.contains("block#")),
      s"per-document window not sharded by (lang, block):\n$perDoc")
    // and the shuffle feeding it carries both keys
    assert(plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(lang#") && l.contains("block#")),
      s"no (lang, block) hash exchange:\n$plan")
    spark.catalog.clearCache()
  }

  test("q122 decontamination broadcasts the benchmark, never the pool") {
    val plan = SparkEntry.queries("q122_decontamination")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the pool side must reach the join un-shuffled: its only exchange is
    // the final per-doc count aggregate AFTER the broadcast join
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark fp set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a sort-merge join here means the pool shuffled on the fp:\n$plan")
    spark.catalog.clearCache()
  }

  test("q126 merge joins key on doc_id only — text never keys a shuffle") {
    val plan = SparkEntry.queries("q126_corpus_merge")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .foreach { l =>
        assert(l.contains("doc_id#"),
          s"merge exchange not keyed on doc_id:\n$l")
        assert(!l.contains("text#"),
          s"merge must never shuffle on document text:\n$l")
      }
    spark.catalog.clearCache()
  }

  test("q124 data card reads the kernel projection once (cached diamond)") {
    val plan = SparkEntry.queries("q124_source_datacard")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // four consumers (dup fp agg, base rollup, lang counts, join probe)
    // must hit the persisted projection, not re-run the kernels
    assert(plan.contains("InMemoryTableScan"),
      s"data card lost its shared projection cache:\n$plan")
    spark.catalog.clearCache()
  }
}
