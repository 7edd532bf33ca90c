package graft

/** Locks the performance-critical physical-plan shapes: a regression that
  * silently turns a broadcast into a shuffle, drops parquet pushdown, or
  * loses the bounded top-k heaps would pass value-level tests but destroy
  * 100 TB behavior — so the plans themselves are asserted. */
class PlanRegressionSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_scan_pruned pushes filter and projection into the parquet scan") {
    val p = plan("q_scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_linenumber:int,l_shipdate:timestamp"))
  }

  test("q_join_broadcast plans a broadcast hash join (no fact shuffle)") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_agg_hash plans partial then final hash aggregation") {
    val p = plan("q_agg_hash")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_topk_per_group plans bounded WindowGroupLimit heaps") {
    assert("WindowGroupLimit".r.findAllIn(plan("q_topk_per_group"))
      .size >= 2) // partial below the exchange + final above
  }

  test("q_sort_limit plans TakeOrderedAndProject (no global sort)") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("PLANS.md and PLANS_sf01.md are FRESH: the committed audit " +
      "row-sets equal SparkEntry.queries.keySet (r12 verdict item 2 — " +
      "the artifact the next round reads can never lag the inventory)") {
    val declared = SparkEntry.queries.keySet
    Seq("PLANS.md", "PLANS_sf01.md").foreach { f =>
      val path = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.exists(path), s"$f missing")
      val rows = scala.jdk.CollectionConverters
        .IteratorHasAsScala(java.nio.file.Files.lines(path).iterator())
        .asScala
        .filter(_.startsWith("| q_"))
        .map(_.split("\\|")(1).trim)
        .toSet
      val missing = declared -- rows
      val stale = rows -- declared
      assert(missing.isEmpty && stale.isEmpty,
        s"$f is stale: missing=${missing.toSeq.sorted.take(5)} " +
          s"extinct=${stale.toSeq.sorted.take(5)} — regenerate with " +
          s"sbt \"runMain graft.PlanAudit <sfDir> $f\"")
    }
  }

  test("no declared query plans a CartesianProduct") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  // SortAggregate means a non-mutable aggregation buffer (string/struct
  // min-max and friends) pushed the agg off the codegen'd hash path onto
  // a per-partition sort by the grouping key — still linear with
  // map-side partials, but n·log n per partition and outside
  // whole-stage codegen, so every instance must be a conscious choice.
  // q_bpe_encode's max(merge_string) (r8) was rewritten to re-join its
  // 1-row merge constants after an all-BIGINT agg; the allowlist below
  // is every instance that survives ON ARGUMENT:
  //  - q_snapshot_diff: max over a (ts, event_id, value) struct is the
  //    lexicographic ARGMAX — associative, partial-agg-safe, one pass.
  //    The hashable alternatives are strictly worse: window+filter
  //    sorts every key group AND blocks partial aggregation; a
  //    two-pass max(packed-decimal)+self-join doubles the shuffles.
  //    The in-partition sort is by user_id only, and the map-side
  //    partial collapses each partition to one row per key before the
  //    exchange — the 100 TB cost shape is the same one shuffle as the
  //    hash path, with a per-partition sort instead of a hash table.
  private val sortAggAllowed = Set("q_snapshot_diff")

  test("no declared query plans a SortAggregate (argued allowlist)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => plan(name).contains("SortAggregate"))
    assert(offenders.toSet.subsetOf(sortAggAllowed),
      s"unargued SortAggregate in: ${offenders.filterNot(sortAggAllowed)}")
    // the allowlist must not go stale: every entry still plans one
    sortAggAllowed.foreach { name =>
      assert(plan(name).contains("SortAggregate"),
        s"$name no longer plans a SortAggregate — drop it from the list")
    }
  }

  // A window with an EMPTY partition spec funnels the whole input through
  // one task (Exchange SinglePartition → sequential sort) — the quietest
  // scale-killer, because results stay correct. Every declared window
  // must be partitioned; global rankings go through TakeOrderedAndProject
  // or WindowGroupLimit instead.
  //
  // The traversal must unwrap AdaptiveSparkPlanExec: under AQE (default)
  // executedPlan is a LEAF from TreeNode's point of view, so a naive
  // p.foreach visits nothing and the gate silently passes everything.
  private def allPhysicalNodes(
      p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    val subs = p.subqueries
    (p +: inner.flatMap(allPhysicalNodes)) ++ subs.flatMap(allPhysicalNodes)
  }

  private def globalWindows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    allPhysicalNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
    }
  }

  test("the global-window detector sees through AQE (not vacuous)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val bad = Tables.table(spark, sf, "nation")
      .withColumn("rn", row_number()
        .over(Window.orderBy("n_nationkey"))) // deliberately global
    assert(globalWindows(bad).nonEmpty,
      "detector failed to flag a deliberately global window — the gate " +
        "below would be vacuous")
  }

  test("no declared query plans a global (unpartitioned) window") {
    // allowlisted = provably bounded input: q_concurrency_peak's carry
    // window is the SECOND level of a two-level prefix sum and runs over
    // DAY-GRAIN totals (one row per calendar day — bounded by the span of
    // time, not the event count); the event-grain running sum below it is
    // partitioned by day
    // q_ts_cusum's rank+cumsum window likewise runs over the day-grain
    // frame (one row per calendar day), merged into a single node
    val allowed = globalWindowCap
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allowed.contains).foreach { name =>
      val found = globalWindows(SparkEntry.queries(name)(spark, sf))
      assert(found.isEmpty, s"$name plans a global window: $found")
    }
    // the allowlisted queries still have their event-grain work keyed:
    // only the declared day-grain window nodes may appear
    allowed.foreach { case (name, cap) =>
      val found = globalWindows(SparkEntry.queries(name)(spark, sf))
      assert(found.size <= cap, s"$name grew extra global windows: $found")
    }
  }

  // globalWindowCap maps each query to the max day/value-domain-bounded
  // global-window NODES its plan may carry (node count, not distinct
  // windows: an unpersisted multi-consumer frame duplicates its
  // window subtree IDENTICALLY, and ReuseExchange computes it once).
  // Class-level so the sf0.1 sweep asserts the same contract.
  private val globalWindowCap =
    Map("q_concurrency_peak" -> 1, "q_ts_cusum" -> 1,
      // q_changepoint shares q_ts_cusum's skeleton: its single merged
      // rank+prefix-sum window runs over the day-grain frame (one row
      // per calendar day — bounded by the time span, not events)
      "q_changepoint" -> 1,
      // q_ts_decompose's centered 7-day moving average runs over the
      // day-grain frame (one row per calendar day — bounded by the
      // time span, not events); the event-grain collapse below it is
      // a keyed hash aggregate. TWO nodes: the trend/seasonal branches
      // both consume the same day-grain window subtree (kept unpersisted
      // on the q_graph_kcore reuse-over-cache argument)
      "q_ts_decompose" -> 2,
      // q_anomaly_stl's two median rank windows run over the persisted
      // day-grain residual/deviation frames (≤ one row per calendar
      // day); the decompose windows below them sit behind the persisted
      // frame. Cap 2 = the two global medians
      "q_anomaly_stl" -> 2,
      // q_ts_seasonality_strength consumes the q_ts_decompose day-grain
      // window subtree; the trend/seasonal branches duplicate it
      // identically (ReuseExchange computes it once) — same cap-2
      // argument as q_ts_decompose
      "q_ts_seasonality_strength" -> 2,
      // q_source_budget's remainder-rank window runs over the
      // source-domain-bounded quota frame (≤ |sources| rows)
      "q_source_budget" -> 1,
      // q_corpus_curate_v3 reuses the same source-domain-bounded
      // remainder-rank window over the clean per-source counts; TWO
      // nodes because the alloc frame has two consumers (quota
      // consumption + the final report join) and the unpersisted
      // subtree duplicates identically — ReuseExchange computes it
      // once (the q_ts_decompose argument)
      "q_corpus_curate_v3" -> 2,
      // KS/MWU pooled-CDF carry: the global window runs over integer
      // value BUCKETS — bounded by the value domain (~330 rows), not the
      // event count (StatsTests.cumulative)
      "q_stats_ks" -> 1, "q_stats_mwu" -> 1,
      // q_stats_kruskal reuses the same value-domain-bounded bucket
      // carry (StatsTests.kruskalPoints) for the 3-group pooled ranks
      "q_stats_kruskal" -> 1,
      // q_stats_dunn consumes the SAME kruskalMoments bucket carry —
      // the identical value-domain-bounded global window
      "q_stats_dunn" -> 1,
      // q_stats_mood_median reads its pooled-median bracket off the
      // SAME value-domain-bounded bucket carry (StatsTests.cumulative)
      // — the q_stats_ks argument verbatim
      "q_stats_mood_median" -> 1,
      // q_stats_ad_2sample integrates over the same value-domain-bounded
      // bucket carry — the q_stats_ks argument verbatim
      "q_stats_ad_2sample" -> 1,
      // q_event_gini's cumulative-rank window runs over the count-VALUE
      // histogram (≤ max events/user rows — the q_stats_ks bucket
      // argument); users collapse to the histogram in keyed aggregates
      "q_event_gini" -> 1,
      // q_dedup_lsh_tune's recommendation rank runs over the CONFIG
      // domain — exactly 3 rows (the (bands, rows) factorings of the
      // 8-hash signature), bounded by the tuner's own config list
      "q_dedup_lsh_tune" -> 1,
      // q_ts_hurst's re-index row_number runs over the day-grain frame
      // (one row per calendar day — bounded by the time span); the
      // R/S windows below it are (w, window)-PARTITIONED. Cap 2: the
      // unpersisted day subtree feeds both the cumsum and the
      // per-window totals branches (ReuseExchange computes it once —
      // the q_ts_decompose argument)
      "q_ts_hurst" -> 2,
      // q_ts_sample_entropy's re-index/lead window runs over the
      // day-grain frame (one row per calendar day — bounded by the
      // time span, not events); cap 2 because the unpersisted day
      // subtree feeds both sides of the pair self-join (ReuseExchange
      // computes it once — the q_ts_decompose argument)
      "q_ts_sample_entropy" -> 2)

  // The scale-killer gate: a nested-loop join is quadratic in its inputs,
  // so it is only acceptable where one side is provably bounded — the
  // 1-row broadcasts (q_simsearch_topk's probe, q_ann_ivf's final
  // scoring, q_text_docfreq's corpus-count scalar, where Catalyst
  // constant-folds the dummy equi-key away) and the explicitly
  // vec_id-bounded LSH verify stage (q_dedup_embed). Any OTHER query
  // that plans one is a regression that would melt at 100 TB even though
  // its values still verify.
  test("BroadcastNestedLoopJoin only on the allowlisted bounded queries") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      if (!bnljAllowed(name))
        assert(!plan(name).contains("BroadcastNestedLoopJoin"),
          s"$name plans an unbounded nested-loop join")
    }
  }

  // allowlisted = provably bounded: one side is a 1-row aggregate on a
  // constant key (docfreq/tfidf corpus count, simsearch probe) or an
  // explicitly filtered verify stage (dedup_embed). Class-level so the
  // sf0.1 sweep asserts the same contract.
  private val bnljAllowed =
    Set("q_dedup_embed", "q_simsearch_topk", "q_ann_ivf",
      "q_text_docfreq", "q_text_tfidf",
      // broadcast-k centroid assignment: the equi-key is a constant, so
      // Catalyst folds it away and the join is a k-row broadcast — linear
      // in the corpus, bounded by k, same as q_ann_ivf's assignment
      "q_kmeans_iter",
      // q_ann_ivf with a 2-row probe-cluster broadcast: the nested-loop
      // side is bounded by nprobe (= 2), same bounded-probe argument as
      // q_ann_ivf's 1-row probe
      "q_ann_ivf_nprobe",
      // recall/cost diagnostics: nested-loop sides are the 1-row probe /
      // 8-row centroid ranking (curve) and the FIXED 16-row probe panel
      // (recall) — bounded constants independent of corpus size, the
      // broadcast-k centroid-assignment argument
      "q_ann_ivf_curve", "q_ann_recall", "q_ann_recall_multi",
      // the same FIXED 16-row probe panel broadcast, once per dims level
      "q_ann_dim_truncate",
      // the same FIXED 16-row panel broadcast on the exact ground-truth
      // side (the q_ann_recall argument); the approx side is the
      // bucketed equi-join, never nested-loop
      "q_ann_ndcg",
      // broadcast-8 integer-grid centroid assignment (twice) + the
      // 1-row moved-count broadcast on a constant key
      "q_kmeans_converge",
      // 1-row broadcast of corpus totals (mixture) / the minority class
      // size (balance) / the node count (pagerank) on a constant key —
      // the q_text_docfreq shape
      "q_mixture_weights", "q_label_balance", "q_graph_pagerank",
      // 1-row broadcasts of the PQ codebook (pq) and the bigram grand
      // total (pmi) on a constant key — the q_text_docfreq shape again:
      // the nested-loop side is exactly one row, so the "loop" is a
      // single broadcast probe; ivfpq composes the pq codebook row with
      // the nprobe-bounded (2-row) probe-cluster broadcast
      "q_ann_pq", "q_text_pmi", "q_ann_ivfpq",
      // 1-row broadcast of the global (n, Σx, Σx²) totals — the
      // q_text_docfreq shape
      "q_stats_ttest",
      // three 1-row broadcasts on a constant key: the max-abs scale of
      // each iterate (m1, m2) and the assembled u1 vector — the
      // q_stats_ttest shape; every nested-loop side is exactly one row
      "q_embed_pca_power",
      // 1-row broadcasts on a constant key: the train vocabulary size
      // (perplexity's smoothing denominator) and the corpus token total
      // (KL's reference distribution) — the q_text_docfreq shape
      "q_text_perplexity", "q_source_kl",
      // the identical q_source_kl shape (the jsd variant adds in-row
      // columns, not joins): the nested-loop side is the 1-row corpus
      // total on a constant key
      "q_source_jsd",
      // the same 1-row constant-key broadcast: the KN (B + V + 1)
      // continuation denominator
      "q_text_lm_kn",
      // 1-row broadcast of the (n_days, grand-total) frame; the
      // non-empty-right-segment filter folds into the join condition so
      // the probe plans as a nested loop against exactly one row — the
      // q_stats_ttest shape
      "q_changepoint",
      // 1-row broadcast of the (n_keys, n_rows) grand totals — the
      // q_text_docfreq shape
      "q_skew_profile",
      // 1-row broadcast of the (token, isqrt) grand totals on a
      // constant key against the source-domain-bounded (≤ tens of
      // rows) mixture frame — the q_text_docfreq shape
      "q_source_mix_sqrt",
      // 1-row broadcasts of the day count and the median/MAD scalars
      // on a constant key against the day-grain residual frame — the
      // q_text_docfreq shape
      "q_anomaly_stl",
      // 1-row broadcasts of the token grand total and the leftover-seat
      // count on a constant key against the source-domain-bounded
      // quota frame — the q_text_docfreq shape
      "q_source_budget",
      // the same two 1-row Hamilton broadcasts over the clean counts
      "q_corpus_curate_v3",
      // the two 1-row learned-merge broadcasts on a constant key (the
      // q_bpe_merges top-1 shape, applied to the encode frame)
      "q_bpe_encode",
      // composes q_ann_ivfpq's bounded broadcasts with the 1-row exact
      // probe (the q_ann_ivf_curve ground-truth shape)
      "q_ann_pq_recall",
      // the same composition plus the PqRefineK-row (= 50, bounded by
      // construction: LIMIT on the ADC ranking) candidate broadcast and
      // the 1-row probe for the exact refine
      "q_ann_ivfpq_refined",
      // 1-row broadcast of the contingency grand total — the
      // q_stats_ttest shape
      "q_stats_chi2",
      // the click-side and view-side 1-row moment aggregates joined on
      // a constant key — both nested-loop sides are exactly one row
      // (the q_stats_ttest shape)
      "q_stats_f_test",
      // the same two 1-row moment sides on a constant key
      "q_stats_cohens_d",
      // the 1-row (nd, Σx, d0) grand-total broadcast + the 1-row shared
      // downscale divisor g, each on a constant key against the 4-row
      // period frame — the q_stats_ttest shape twice
      "q_ts_spectral_entropy",
      // the 8-row trained-centroid broadcast + the bounded probe — the
      // q_kmeans_iter / q_ann_ivf broadcast-k shape
      "q_ann_ivf_trained",
      // broadcast-k centroid assignment + the 1-row plain and residual
      // codebook broadcasts on constant keys — the q_kmeans_iter and
      // q_ann_pq shapes composed
      "q_ann_pq_residual",
      // the same bounded broadcasts plus the nprobe-bounded (2-row)
      // probe-cluster and 64-row per-cluster ADC table broadcasts —
      // the q_ann_ivfpq composition on the residual grid
      "q_ann_ivfpq_residual",
      // 1-row broadcasts of the series totals (n, Σx) and the centered
      // sum-of-squares / max-deviation scalars on a constant key, joined
      // against the tiny day-grain frame — the q_text_docfreq shape
      "q_ts_autocorr", "q_ts_cusum",
      // the same 1-row totals/denominator broadcasts on a constant key
      // against the tiny day-grain frame — the q_ts_autocorr shape
      "q_ts_ccf",
      // 1-row triangle-count broadcast on a constant key against the
      // 1-row degree aggregate — the q_text_docfreq shape
      "q_graph_clustering_coeff",
      // 1-row broadcast of the positive-balance mean on a constant key —
      // the q_stats_ttest shape
      "q_tpch_q22",
      // 1-row broadcast of the global stock-value total on a constant
      // key (the HAVING > 0.001 × total threshold) — the q_stats_ttest
      // shape
      "q_tpch_q11",
      // 1-row broadcast of the corpus max order date on a constant key
      // — the q_text_docfreq shape
      "q_customer_rfm",
      // 1-row broadcast of the probe's token set on a constant key —
      // the q_simsearch_topk bounded-probe shape
      "q_dedup_lookup",
      // 1-row broadcast of the two sample sizes on a constant key — the
      // q_stats_ttest shape
      "q_stats_ks",
      // 1-row broadcast of the global centroid + its c·c scalar on a
      // constant key — the q_text_docfreq shape
      "q_embed_outlier",
      // FIXED 16-doc exact-truth panel broadcast — the q_ann_recall
      // bounded-panel argument applied to text dedup
      "q_dedup_recall",
      // FIXED 32-vector panel self-joined on va < vb (496 pairs, a
      // constant independent of corpus size) — the q_ann_recall
      // bounded-panel argument
      "q_embed_pairwise_hist",
      // 1-row broadcast of the adopted merge pair on a constant key —
      // the q_text_docfreq shape (the LIMIT 1 bounds it by construction)
      "q_bpe_merges",
      // 1-row broadcast of the corpus doc count on a constant key
      // (the decile-bucket denominator), used by both aggregate branches
      // — the q_text_docfreq shape
      "q_vocab_growth",
      // 1-row broadcasts of the two top-k occurrence sums (TakeOrdered
      // + aggregate, bounded by construction) on a constant key — the
      // q_text_docfreq shape
      "q_vocab_coverage",
      // 10-row label-centroid broadcast on a constant key — fan-out
      // bounded by the label DOMAIN, the broadcast-k assignment shape
      "q_embed_label_margin",
      // broadcast-k coarse assignment (the q_kmeans_iter shape); the
      // pair stage itself is a cluster-keyed equi-join
      "q_dedup_semantic",
      // ≤20-row source-domain broadcast (the vocab × source TV grid)
      // plus the 1-row corpus-total broadcast — the q_text_docfreq shape
      "q_source_token_shift",
      // 1-row probe-embedding and probe-token-set broadcasts on a
      // constant key — the q_simsearch_topk bounded-probe shape
      "q_rank_fusion",
      // FIXED 32-row probe-panel broadcast (vec_id < 32 — bounded at any
      // corpus size) for the leave-one-out kNN scan — the q_ann_recall
      // bounded-panel argument; a corpus-fraction probe set here would
      // be the decontamination broadcast mistake
      "q_embed_knn_classify",
      // FIXED 6-row subscription-panel broadcast (wildcardPanel, a
      // literal) probed by anchored rlike — subscription metadata is
      // KBs at any corpus size, the q_ann_recall bounded-panel argument
      "q_trigger_wildcard",
      // 1-row broadcasts on constant keys: the θ scalar (a TakeOrdered
      // top-K aggregate, bounded by K) and the exact-count pair — the
      // q_text_docfreq shape twice
      "q_sketch_theta",
      // 1-row broadcast of the (n1, n2) sample totals on a constant
      // key against the value-domain point frame — the q_stats_ks shape
      "q_stats_bhattacharyya",
      // 1-row broadcast of the contingency grand total — the
      // q_stats_chi2 shape verbatim
      "q_stats_cramers_v",
      // 1-row broadcast of the (n_docs, sum_dl) corpus totals on a
      // constant key — the q_text_docfreq shape
      "q_text_bm25",
      // day-domain-bounded |d| rank-reference broadcast (≤ |days| rows
      // — the calendar bounds it at any corpus size, the kendall_tau
      // day-pair argument) plus the 1-row tie-fold broadcast on a
      // constant key — the q_stats_ttest shape
      "q_stats_wilcoxon_signed",
      // 1-row broadcasts of the series totals and energy denominator
      // on a constant key against the tiny day-grain frame — the
      // q_ts_autocorr shape
      "q_ts_periodogram", "q_ts_ljung_box", "q_ts_pacf",
      "q_ts_acf_bands",
      // 1-row broadcasts of the sample totals and the doubled median
      // bracket on constant keys against the value-domain point frame —
      // the q_stats_ks shape
      "q_stats_mood_median",
      // the same 1-row (n1, n2) totals broadcast on a constant key —
      // the q_stats_ks shape
      "q_stats_ad_2sample",
      // 1-row exact-distinct audit broadcast on a constant key — the
      // q_text_docfreq shape
      "q_sketch_linear",
      // the |sources|-bounded (≤ tens of rows at any corpus size)
      // pair-side broadcast on a constant key plus the 1-row pair-fold
      // broadcast — the q_stats_wilcoxon_signed bounded-frame argument
      "q_source_gini",
      // two 1-row sketch-aggregate broadcasts (the merged ≤K-element
      // list and the single-pass ≤K-element list) crossed with the
      // 1-row count — every nested-loop side is exactly one row, the
      // q_stats_ttest shape
      "q_sketch_quantile_merge",
      // the day-grain pair self-join (idx < idx — inequality, so
      // nested-loop by construction) is bounded by the CALENDAR
      // squared, never the event count (the kendall/wilcoxon day-pair
      // argument), plus the 1-row (n_days, r) tolerance broadcast on a
      // constant key
      "q_ts_sample_entropy",
      // 1-row probe broadcast (packed sign words + embedding) on a
      // constant key — the q_simsearch_topk bounded-probe shape
      "q_ann_hamming",
      // the FIXED 32-row packed-word panel broadcast (vec_id < 32,
      // bounded at any corpus size — the q_embed_knn_classify panel
      // argument); the nested-loop fan-out is corpus × 32 slim integer
      // rows, pruned to top-10 per probe by WindowGroupLimit before
      // the 32-key shuffle
      "q_ann_hamming_panel",
      // the exact-side ground truth is the 1-row probe broadcast (the
      // q_ann_hamming shape); the approx side is the bucketed
      // EQUI-join against the 9-row probe broadcast, and the final
      // fold crosses three ≤10-row constant-key sides
      "q_ann_hamming_multiprobe")

  // The r11 verdict's item #6: the four structural gates above run at
  // sf0.001, where AQE's broadcast thresholds can hide size-driven
  // join-strategy flips. This sweep re-asserts ALL FOUR invariants
  // (no cartesian, SortAggregate allowlist, global-window caps, BNLJ
  // allowlist) against the plans AS COMPILED AT sf0.1 — the largest
  // local fixture — with one construction per query. Any plan shape
  // that is legal only because the data is tiny fails here.
  test("the cartesian/sortAgg/global-window/BNLJ invariants hold on the " +
      "sf0.1 plans too (AQE sees 100x the rows)") {
    val big = "/root/testdata/sf0.1"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val df = fn(spark, big)
        val p = df.queryExecution.executedPlan.toString
        val errs = scala.collection.mutable.Buffer.empty[String]
        if (p.contains("CartesianProduct"))
          errs += s"$name: CartesianProduct"
        if (p.contains("SortAggregate") && !sortAggAllowed(name))
          errs += s"$name: unargued SortAggregate"
        val gw = globalWindows(df)
        if (gw.size > globalWindowCap.getOrElse(name, 0))
          errs += s"$name: global windows $gw over cap " +
            globalWindowCap.getOrElse(name, 0)
        if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          errs += s"$name: unargued BroadcastNestedLoopJoin"
        errs
      }
    assert(failures.isEmpty,
      s"${failures.size} sf0.1 plan regressions:\n" +
        failures.mkString("\n"))
  }

  test("q_ann_neighbors pairs via an equi-join on bucket (hash-joinable)") {
    val p = plan("q_ann_neighbors")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // equi-join on bucket: broadcastable at test SF, shuffles on bucket at
    // scale — either way a hash/merge join, never nested-loop
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"))
  }

  test("q_dedup_pairs candidates via an equi-join on band key") {
    // r13: the declared query reads the lineage-truncated named stage
    // (its own plan is just Scan ExistingRDD + filter + sort), so the
    // gate audits the stage BUILD plan — the unstaged LSH chain, which
    // NamedStagesSpec proves row-identical to the staged accessor
    val p = graft.operators.TextDedup
      .nearDuplicates(Tables.table(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"))
  }
}
