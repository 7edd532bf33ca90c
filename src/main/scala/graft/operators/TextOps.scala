package graft.operators

import graft.CacheScope.ScopedPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis + deduplication operators for large-scale training-data
  * pipelines: tokenization, per-language stats, exact dedup, MinHash+LSH,
  * SimHash, n-gram Jaccard, language-ID, quality scoring, fingerprinting,
  * token counting.
  *
  * Algorithms (public literature): MinHash resemblance sketching — Broder,
  * "On the resemblance and containment of documents" (SEQUENCES 1997);
  * banded LSH — Gionis/Indyk/Motwani, "Similarity search in high
  * dimensions via hashing" (VLDB 1999); SimHash — Charikar, "Similarity
  * estimation techniques from rounding algorithms" (STOC 2002).
  *
  * Scale design:
  *  - all per-document features are narrow codegen'd projections (array
  *    higher-order functions — no UDFs, no shuffles);
  *  - MinHash signatures/bands make near-dup detection O(n·bands) via a
  *    shuffle on band key instead of the O(n²) pair join: at 100 TB you
  *    group by `band_*` and only verify bucket-mates;
  *  - SimHash packs a document into one BIGINT so candidate pairs can be
  *    bucketed by hash prefix;
  *  - the pairwise n-gram Jaccard is intentionally bounded (doc_id < 50) —
  *    it is the verification step applied to LSH candidates, not a scan;
  *  - hashes are md5 (identical on Spark and DuckDB), and minhash order is
  *    lexicographic over hex — deterministic everywhere, no seed state.
  */
object TextOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Zipf least-squares assembly from the exact 1e-10-grid moments
    * (n_ranks, sx, sy, sxy, sxx) — ONE string shared verbatim by the
    * Spark selectExpr and the DuckDB oracle so the IEEE trees match.
    * Scale algebra: qx ≈ x·1e10 and qxy ≈ x·y·1e10, so the covariance
    * numerator needs n·1e10·sxy to sit on the same 1e20 grid as sx·sy
    * (likewise the variance denominator); the intercept divides the
    * 1e10-grid residual back out. */
  private val zipfSlopeExpr: String =
    "((CAST(n_ranks AS DOUBLE) * CAST(10000000000 AS DOUBLE) " +
      "* CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) " +
      "/ (CAST(n_ranks AS DOUBLE) * CAST(10000000000 AS DOUBLE) " +
      "* CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"

  private[operators] val zipfFitExprs: Seq[String] = Seq(
    s"$zipfSlopeExpr AS slope",
    s"((CAST(sy AS DOUBLE) - $zipfSlopeExpr * CAST(sx AS DOUBLE)) " +
      "/ (CAST(n_ranks AS DOUBLE) * CAST(10000000000 AS DOUBLE))) " +
      "AS intercept")

  private val NumHashes = 8
  private val NumBands = 4 // rows-per-band = 2

  /** Winnowing geometry (q_text_winnow): k-gram width and window size —
    * the guarantee threshold is matches of ≥ w + k − 1 = 6 tokens. */
  private val WinnowK = 3
  private val WinnowW = 4

  // argmax with deterministic alphabetical tie-break; valid Spark AND
  // DuckDB SQL — shared verbatim by both sides.
  private val langCase =
    """CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr
      |       AND s_de >= s_zh THEN 'de'
      |     WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |     WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |     WHEN s_fr >= s_zh THEN 'fr'
      |     ELSE 'zh' END""".stripMargin
  private val markers = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "et", "du"),
    "zh" -> Seq("de5", "le5", "shi4", "bu4"))

  /** One row per (source, token) with the exact occurrence count — the
    * token-shift point frame. PUBLIC and mode-agnostic like
    * StatsTests.pricePoints: as a streaming keyed aggregate in update
    * mode this is the live drift-monitor state, and StreamingParitySpec
    * proves the drained counts assemble the identical TV distances
    * through [[tokenShiftFrom]]. */
  def sourceTokenPoints(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))

  /** Exact total-variation token-shift assembly from a
    * (source, token, cnt) point frame — see q_source_token_shift's doc
    * for the arithmetic. Corpus counts and totals all derive from the
    * same point frame, so a streamed replica of it yields the identical
    * result. */
  def tokenShiftFrom(pts0: DataFrame): DataFrame = {
    // persisted: four consumers (corpus counts, corpus total, per-source
    // totals, the per-cell left join) re-run the upstream otherwise
    val pts = pts0.persistScoped()
    val corp = pts.groupBy("token").agg(sum("cnt").as("cnt_c"))
    val nC = broadcast(pts.agg(sum("cnt").as("n_c"))
      .withColumn("_one", lit(1)))
    val nS = broadcast(pts.groupBy("source").agg(sum("cnt").as("n_s")))
    corp.crossJoin(broadcast(pts.select("source").distinct()))
      .join(pts.select(col("source"), col("token"),
        col("cnt").as("cnt_s")), Seq("source", "token"), "left")
      .join(nS, "source")
      .withColumn("_one", lit(1)).join(nC, "_one")
      .withColumn("num", abs(coalesce(col("cnt_s"), lit(0L))
        * col("n_c") - col("cnt_c") * col("n_s")))
      .groupBy("source")
      .agg(max("n_s").as("n_tokens"),
        sum("num").as("tv_num"),
        (sum("num").cast("double")
          / (lit(2.0d) * max("n_s") * max("n_c"))).as("tv_dist"))
      .orderBy(asc_nulls_last("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tokenize" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc_nulls_last("cnt"), asc_nulls_last("token"))
        .limit(20)),

    // LSH band-bucket skew audit — the operational guardrail for the
    // 100 TB dedup run: in-bucket candidate generation is quadratic in
    // bucket size, so ONE hot bucket (a boilerplate shingle shared by
    // millions of docs) turns the "slim keyed shuffle" argument into an
    // O(n²) task. This query is the histogram that catches it before it
    // ships: bucket-size distribution plus the exact candidate-pair bill
    // n_buckets · size·(size−1)/2 each size contributes. Scale: one
    // (band-key) shuffle with map-side combine, then a histogram over
    // the size domain — strictly cheaper than the dedup it audits.
    "q_dedup_bucket_skew" -> ((s, d) => {
      val sizes = MinHash.withSignatures(
          t(s, d, "documents").select("doc_id", "text"), "text", NumHashes)
        .select(col("doc_id"),
          explode(array(MinHash.bandKeys(NumHashes, NumBands): _*))
            .as("bkey"))
        .groupBy("bkey").agg(count(lit(1)).as("sz"))
      sizes.groupBy("sz")
        .agg(count(lit(1)).as("n_buckets"))
        .select(col("sz").as("bucket_size"), col("n_buckets"),
          // integer DIV: the product is even, keep it off the FP path.
          // BIGINT survivor of the r12 overflow sweep: the pair bill
          // per histogram row wraps only past 9.2e18 candidate pairs —
          // ~300 years of verification at 1e9 cmp/s, i.e. a single
          // bucket of >4.29e9 docs, two orders past where maxBucket
          // already refuses to expand buckets (TextDedup). The reading
          // saturates only where no configuration could ever run.
          // PropertyLawsSpec pins the 4.29e9 single-bucket bound.
          expr("CAST(n_buckets * sz * (sz - 1) DIV 2 AS BIGINT)")
            .as("n_candidate_pairs"))
        .orderBy(asc_nulls_last("bucket_size"))
    }),

    // Per-source near-duplicate membership rate — "which crawl sources
    // duplicate most" — the curation report that decides source-level
    // dedup budgets: every doc participating in a verified near-dup
    // pair counts as a dup member, aggregated per source with one IEEE
    // rate division. Scale: the pair frame is the proven bucketed LSH
    // pipeline; membership is a slim distinct on doc ids; the join back
    // to sources is keyed on doc_id.
    "q_source_dup_rate" -> ((s, d) => {
      val members = Corpus.nearDupPairs(s, d)
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
        .withColumn("is_dup", lit(1L))
      t(s, d, "documents").select("doc_id", "source")
        .join(members, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_members"),
          (sum(coalesce(col("is_dup"), lit(0L))).cast("double")
            / count(lit(1))).as("dup_rate"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Incremental (shard-vs-corpus) near-dup ingestion — the DAILY
    // dedup economics: when a new shard (doc_id % 7 == 0 stands in for
    // "today's crawl") lands against an existing corpus, only new×old
    // and new×new pairs ever materialize — the old×old combinations
    // that dominate every bucket are NEVER generated (each bucket
    // splits into new/old member lists in-row; buckets with no new
    // member drop before pair expansion). DedupPipelineSpec proves the
    // result equals the full corpus-wide pipeline filtered to
    // new-touching pairs. Scale: this is why daily ingest costs
    // O(shard · bucket-mates), not O(corpus²) — the bucketed-LSH shuffle
    // with the quadratic term amputated.
    "q_dedup_incremental" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id").as("id"), col("text"),
          (col("doc_id") % 7 === 0).as("is_new"))
      val signed = MinHash.withSignatures(base, "text", NumHashes)
      val cands = signed.select(col("id"), col("is_new"),
          explode(array(MinHash.bandKeys(NumHashes, NumBands): _*))
            .as("band"))
        .groupBy("band")
        .agg(
          sort_array(collect_list(when(col("is_new"), col("id"))))
            .as("new_ids"),
          sort_array(collect_list(when(!col("is_new"), col("id"))))
            .as("old_ids"))
        .filter(size(col("new_ids")) > 0)
        .select(explode(expr(
          // new×new ordered combinations + new×old ordered pairs
          "concat(" +
            "flatten(transform(new_ids, (a, i) -> " +
            "transform(slice(new_ids, i + 2, size(new_ids) - i - 1), " +
            "b -> struct(a AS id_a, b AS id_b)))), " +
            "flatten(transform(new_ids, n -> transform(old_ids, o -> " +
            "struct(least(n, o) AS id_a, greatest(n, o) AS id_b)))))"))
          .as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .distinct()
      TextDedup.withJaccard(cands, MinHash.tokens(base, "text"))
        .filter(col("jaccard") >= 0.7)
        .select("id_a", "id_b", "jaccard")
        .orderBy(asc_nulls_last("id_a"), asc_nulls_last("id_b"))
    }),

    // Dedup threshold tuning curve — how many pairs each Jaccard cutoff
    // would keep, from ONE candidate-verify pass (the number that turns
    // "pick 0.7" from folklore into a measured choice: too low floods
    // the cluster pass, too high leaks templates). Conditional
    // aggregation over the verified candidate frame; the jaccard double
    // is derived identically on both engines so the >= comparisons
    // agree exactly. Scale: identical to q_dedup_pairs (the LSH
    // bucketed pipeline) plus one 1-row aggregate — and since r11 it
    // reads the SAME [[graft.operators.Corpus.nearDupCands]] named
    // stage as the pair/graph family (the r10 solo A/B showed this
    // query alone rebuilding the LSH chain: 1.24 s solo vs 0.07 s for
    // stage-warm q_dedup_pairs).
    "q_dedup_threshold_curve" -> ((s, d) =>
      Corpus.nearDupCands(s, d)
        .agg(count(lit(1)).as("n_candidates"),
          sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("n_ge_05"),
          sum(when(col("jaccard") >= 0.6, 1L).otherwise(0L)).as("n_ge_06"),
          sum(when(col("jaccard") >= 0.7, 1L).otherwise(0L)).as("n_ge_07"),
          sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("n_ge_08"),
          sum(when(col("jaccard") >= 0.9, 1L).otherwise(0L))
            .as("n_ge_09"))),

    // One step of BPE vocabulary learning (Sennrich et al., ACL 2016 —
    // the tokenizer-training primitive): count adjacent symbol pairs
    // weighted by word frequency, adopt the most frequent pair as a
    // merge, re-segment, and count again. Two iterations are unrolled;
    // each emits its top-10 pairs. The merge is applied with plain
    // string replace over a double-space-joined symbol string with
    // single-space sentinels: both engines scan leftmost
    // non-overlapping, which IS greedy BPE application, and the double
    // separator means adjacent matches never share a boundary space
    // (" a  b  a  b " -> " ab  ab ", not " ab a b"). Scale: the corpus
    // collapses to the word-frequency sliver first (one shuffle on the
    // word), so both pair counts and the re-segmentation run over
    // |vocab| rows, not corpus tokens — exactly how production BPE
    // trainers batch; the adopted merge is a 1-row broadcast.
    "q_bpe_merges" -> ((s, d) => {
      val words = t(s, d, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .persistScoped()
      val p1 = words
        .select(col("n"), explode(expr(
          "CASE WHEN length(w) < 2 THEN CAST(array() AS ARRAY<STRING>) " +
            "ELSE transform(sequence(1, length(w) - 1), i -> " +
            "concat(substring(w, i, 1), ' ', substring(w, i + 1, 1))) " +
            "END")).as("pair"))
        .groupBy("pair").agg(sum("n").as("freq"))
        .persistScoped() // two consumers: the top-10 readout and the top-1 merge
      val top1 = broadcast(p1
        .orderBy(desc_nulls_last("freq"), asc_nulls_last("pair"))
        .limit(1)
        .select(col("pair").as("mp")).withColumn("_one", lit(1)))
      val p2 = words.withColumn("_one", lit(1)).join(top1, "_one")
        .withColumn("syms", split(trim(expr(
          "replace(concat(' ', array_join(transform(sequence(1, " +
            "length(w)), i -> substring(w, i, 1)), '  '), ' '), " +
            "concat(' ', replace(mp, ' ', '  '), ' '), " +
            "concat(' ', replace(mp, ' ', ''), ' '))")), "  "))
        .select(col("n"), explode(expr(
          "CASE WHEN size(syms) < 2 THEN CAST(array() AS ARRAY<STRING>) " +
            "ELSE transform(sequence(1, size(syms) - 1), i -> " +
            "concat(element_at(syms, i), ' ', element_at(syms, i + 1))) " +
            "END")).as("pair"))
        .groupBy("pair").agg(sum("n").as("freq"))
      p1.orderBy(desc_nulls_last("freq"), asc_nulls_last("pair")).limit(10)
        .withColumn("iter", lit(1L))
        .unionByName(p2
          .orderBy(desc_nulls_last("freq"), asc_nulls_last("pair"))
          .limit(10)
          .withColumn("iter", lit(2L)))
        .select("iter", "pair", "freq")
        .orderBy(asc_nulls_last("iter"), desc_nulls_last("freq"),
          asc_nulls_last("pair"))
    }),

    // BPE ENCODE — the apply side of q_bpe_merges: learn the same two
    // greedy merges corpus-wide, apply them to every word, and report
    // per-source compression (symbols-after / chars-before) — the
    // tokenizer-efficiency readout that says which crawl source the
    // learned vocabulary actually serves. The merge application is the
    // proven double-space-joined symbol replace (q_bpe_merges'
    // machinery, applied twice); counts stay exact integers with ONE
    // trailing IEEE division per source. Scale: learning runs on the
    // VOCABULARY (word-type grain, not occurrences); encoding runs on
    // the (source, word) distinct frame with the two 1-row merge
    // frames joined by constant-key broadcast (the q_text_docfreq
    // shape).
    "q_bpe_encode" -> ((s, d) => {
      val wcSrc = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("n"))
      // NO persistScoped here despite two consumers (corpus-level
      // learning + encoding): the r11 solo A/B measured the cache
      // round-trip COSTLIER than the rebuild (1.76 s with persist vs
      // 1.50 s without at sf0.1 — the r10 persist was the +63%
      // regression the r10 verdict flagged; the (source, word) frame
      // is wide enough that memory-format write+read loses to
      // recomputing one cheap shuffle whose exchange Spark reuses).
      val wc = wcSrc.groupBy("w").agg(sum("n").as("n"))
      val p1 = wc.select(col("n"), explode(expr(
          "CASE WHEN length(w) < 2 THEN CAST(array() AS ARRAY<STRING>) " +
            "ELSE transform(sequence(1, length(w) - 1), i -> " +
            "concat(substring(w, i, 1), ' ', substring(w, i + 1, 1))) " +
            "END")).as("pair"))
        .groupBy("pair").agg(sum("n").as("freq"))
      val top1 = broadcast(p1
        .orderBy(desc_nulls_last("freq"), asc_nulls_last("pair"))
        .limit(1)
        .select(col("pair").as("mp1")).withColumn("_one", lit(1)))
      val s2 = wc.withColumn("_one", lit(1)).join(top1, "_one")
        .withColumn("syms", split(trim(expr(
          "replace(concat(' ', array_join(transform(sequence(1, " +
            "length(w)), i -> substring(w, i, 1)), '  '), ' '), " +
            "concat(' ', replace(mp1, ' ', '  '), ' '), " +
            "concat(' ', replace(mp1, ' ', ''), ' '))")), "  "))
      val p2 = s2.select(col("n"), explode(expr(
          "CASE WHEN size(syms) < 2 THEN CAST(array() AS ARRAY<STRING>) " +
            "ELSE transform(sequence(1, size(syms) - 1), i -> " +
            "concat(element_at(syms, i), ' ', element_at(syms, i + 1))) " +
            "END")).as("pair"))
        .groupBy("pair").agg(sum("n").as("freq"))
      val top2 = broadcast(p2
        .orderBy(desc_nulls_last("freq"), asc_nulls_last("pair"))
        .limit(1)
        .select(col("pair").as("mp2")).withColumn("_one", lit(1)))
      wcSrc.withColumn("_one", lit(1)).join(top1, "_one").join(top2, "_one")
        .withColumn("sp1", expr(
          "replace(concat(' ', array_join(transform(sequence(1, " +
            "length(w)), i -> substring(w, i, 1)), '  '), ' '), " +
            "concat(' ', replace(mp1, ' ', '  '), ' '), " +
            "concat(' ', replace(mp1, ' ', ''), ' '))"))
        .withColumn("sp2", expr(
          "replace(sp1, concat(' ', replace(mp2, ' ', '  '), ' '), " +
            "concat(' ', replace(mp2, ' ', ''), ' '))"))
        .withColumn("n_syms",
          size(split(trim(col("sp2")), "  ")).cast("long"))
        // all-BIGINT aggregation buffers keep this on the codegen'd
        // HashAggregate path; aggregating the merge STRINGS here
        // (max("mp1")) would force SortAggregate — the only one in the
        // whole inventory before r9 — because a string max has a
        // non-mutable buffer. The merges are 1-row broadcast constants
        // anyway, so they re-join after the agg for free.
        .groupBy("source")
        .agg(sum("n").as("n_tokens"),
          sum(col("n") * length(col("w"))).as("n_chars_sym"),
          sum(col("n") * col("n_syms")).as("n_syms_after"))
        .withColumn("_one", lit(1)).join(top1, "_one").join(top2, "_one")
        .select(col("source"), col("n_tokens"), col("n_chars_sym"),
          col("n_syms_after"), col("mp1").as("merge_1"),
          col("mp2").as("merge_2"))
        .withColumn("compression",
          col("n_syms_after").cast("double") / col("n_chars_sym"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Per-source token-distribution shift — exact total-variation
    // distance ½·Σ|p_source − p_corpus| between each source's unigram
    // distribution and the corpus': the drift metric that flags a crawl
    // source gone off-domain BEFORE it skews training. KL wants logs
    // (transcendental, engine-divergent); TV is pure rational
    // arithmetic: |cnt_s·N_c − cnt_c·N_s| is an exact BIGINT per
    // (source, token) — including corpus tokens the source never emits
    // — summed exactly, ONE trailing IEEE division by 2·N_s·N_c.
    // Scale: the honest cost of exact TV is the vocab × source grid —
    // slim integer rows, source domain ≤ 20 broadcast, partial agg
    // collapses per source.
    "q_source_token_shift" -> ((s, d) =>
      tokenShiftFrom(sourceTokenPoints(t(s, d, "documents")))),

    // Cross-split n-gram novelty — the train/test memorization audit
    // that complements q_decontaminate: for every TEST-split document
    // (doc_id % 10 == 7), the share of its distinct 3-gram shingles
    // never seen anywhere in the TRAIN split. Near-zero novelty means
    // the held-out doc is effectively memorized boilerplate; high
    // novelty validates the split. Exact integer counts, ONE trailing
    // IEEE division per doc. Scale: the membership probe is a
    // gram-keyed shuffle equi-join of two slim slivers (the
    // q_decontaminate economics — no corpus-fraction broadcast; AQE
    // may demote from measured bytes), grams built in generator form
    // (explode(sequence) fuses into codegen; HOFs don't).
    "q_text_novelty" -> ((s, d) => {
      val g = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("source"), col("toks"),
          explode(expr("sequence(0, size(toks) - 3)")).as("i"))
        .select(col("doc_id"), col("source"), expr(
          "concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])").as("gram"))
        .distinct() // per-doc distinct grams: novelty is a SET measure
        .persistScoped()  // two consumers: the train gram set + the test probe
      val train = g.filter(col("doc_id") % 10 =!= 7)
        .select("gram").distinct().withColumn("hit", lit(1))
      g.filter(col("doc_id") % 10 === 7)
        .join(train, Seq("gram"), "left")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_grams"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Temperature-0.5 source-mixture weights — the DoReMi-flavored
    // rebalancing step between raw token shares and uniform sampling:
    // w_i ∝ √(tokens_i) dampens mega-sources without zeroing small
    // ones. The square root is the EXACT integer isqrt (floor(√n)):
    // the float sqrt seeds it and a ±1 correction step repairs any
    // boundary rounding, so both engines agree bit-for-bit at any
    // magnitude and the only IEEE ops are the two trailing share
    // divisions. Scale: one source-keyed count with map-side combine
    // into a source-domain-bounded frame, then a 1-row totals
    // broadcast on a constant key (the q_text_docfreq shape).
    "q_source_mix_sqrt" -> ((s, d) => {
      val cnt = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long"))
          .as("n_tokens"))
        .withColumn("s0", expr(
          "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
        .withColumn("isqrt_tokens", expr(
          "CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1 " +
            "WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END"))
        .drop("s0")
      val tot = broadcast(cnt
        .agg(sum("n_tokens").as("tot_tokens"),
          sum("isqrt_tokens").as("tot_isqrt"))
        .withColumn("_one", lit(1)))
      cnt.withColumn("_one", lit(1)).join(tot, "_one")
        .select(col("source"), col("n_tokens"), col("isqrt_tokens"),
          (col("n_tokens").cast("double") / col("tot_tokens"))
            .as("w_raw"),
          (col("isqrt_tokens").cast("double") / col("tot_isqrt"))
            .as("w_sqrt"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Token-budget apportionment — sampling a FIXED 1M-token budget
    // across sources proportionally to their size, with the largest-
    // remainder (Hamilton) method so the per-source quotas are exact
    // integers that sum to the budget EXACTLY (floor-only leaves
    // tokens on the table; naive rounding over/under-shoots). The
    // B·n_i products run in DECIMAL(38,0) (128-bit — a BIGINT product
    // overflows once a source holds > 2^63/B ≈ 9e12 tokens, which a
    // 100 TB corpus reaches), quotient/remainder by integral DIV, and
    // the +1 seats go to the largest remainders with a source-name
    // tie-break. Scale: one source-keyed count with map-side combine;
    // everything after runs on the source-domain-bounded frame (the
    // ranking window is global but over ≤ |sources| rows; totals
    // broadcast on a constant key — the q_text_docfreq shape).
    "q_source_budget" -> ((s, d) => {
      val B = 1000000L
      val cnt = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long"))
          .as("n_tokens"))
      val tot = broadcast(cnt.agg(sum("n_tokens").as("tot"))
        .withColumn("_one", lit(1)))
      val base = cnt.withColumn("_one", lit(1)).join(tot, "_one")
        .withColumn("b128", expr(
          s"CAST($B AS DECIMAL(38,0)) * CAST(n_tokens AS DECIMAL(38,0))"))
        .withColumn("base", expr(
          "CAST(b128 DIV CAST(tot AS DECIMAL(38,0)) AS BIGINT)"))
        .withColumn("rem", expr(
          "CAST(b128 - CAST(base AS DECIMAL(38,0)) " +
            "* CAST(tot AS DECIMAL(38,0)) AS BIGINT)"))
      val ext = broadcast(base.agg((lit(B) - sum("base")).as("n_extra"))
        .withColumn("_one", lit(1)))
      val wr = Window.orderBy(desc_nulls_last("rem"),
        asc_nulls_last("source"))
      base.withColumn("rk", row_number().over(wr))
        .join(ext, "_one")
        .withColumn("alloc", col("base")
          + when(col("rk") <= col("n_extra"), 1L).otherwise(0L))
        .select("source", "n_tokens", "base", "rem", "alloc")
        .orderBy(asc_nulls_last("source"))
    }),

    // Top-k vocabulary coverage — the tokenizer-sizing number: what
    // share of all token OCCURRENCES the 100 / 1000 most frequent
    // types carry (a Zipf corpus saturates fast; the gap to 1.0 is the
    // long tail a subword tokenizer must absorb). Exact integer sums,
    // two trailing IEEE divisions. Scale: one (token)-keyed count with
    // map-side combine; each top-k is a TakeOrdered (per-partition
    // heaps, no global sort); the three 1-row frames combine by
    // constant-key broadcast.
    "q_vocab_coverage" -> ((s, d) => {
      val freq = t(s, d, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .persistScoped() // three consumers: totals + two top-k sums
      val tot = freq.agg(count(lit(1)).as("n_types"),
        sum("cnt").as("n_occurrences")).withColumn("_one", lit(1))
      def topSum(k: Int, alias: String) =
        freq.orderBy(desc_nulls_last("cnt"), asc_nulls_last("token"))
          .limit(k)
          .agg(sum("cnt").as(alias)).withColumn("_one", lit(1))
      tot
        .join(broadcast(topSum(100, "occ_top100")), "_one")
        .join(broadcast(topSum(1000, "occ_top1000")), "_one")
        .select(col("n_types"), col("n_occurrences"),
          col("occ_top100"), col("occ_top1000"),
          (col("occ_top100").cast("double") / col("n_occurrences"))
            .as("cov_top100"),
          (col("occ_top1000").cast("double") / col("n_occurrences"))
            .as("cov_top1000"))
    }),

    // Heaps'-law vocabulary-growth profile — the corpus diagnostic that
    // sizes tokenizer vocab and predicts dedup headroom: per corpus
    // decile (doc_id-range bucket), total token occurrences vs tokens
    // FIRST seen in that decile, plus the novelty rate (one IEEE
    // division of exact counts). A flattening novelty curve says the
    // crawl is saturating. Scale: first-occurrence is one (token)
    // keyed min — vocabulary-sized, not corpus-sized — and the bucket
    // grain is a constant 10 rows; no window anywhere.
    "q_vocab_growth" -> ((s, d) => {
      val toks = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .persistScoped()
      val nd = broadcast(t(s, d, "documents")
        .agg(count(lit(1)).as("n_docs")).withColumn("_one", lit(1)))
      val occ = toks.withColumn("_one", lit(1)).join(nd, "_one")
        .withColumn("bucket",
          expr("least(CAST(9 AS BIGINT), (doc_id * 10) DIV n_docs)"))
        .groupBy("bucket").agg(count(lit(1)).as("n_occurrences"))
      val fresh = toks.groupBy("token").agg(min("doc_id").as("fd"))
        .withColumn("_one", lit(1)).join(nd, "_one")
        .withColumn("bucket",
          expr("least(CAST(9 AS BIGINT), (fd * 10) DIV n_docs)"))
        .groupBy("bucket").agg(count(lit(1)).as("n_new_types"))
      occ.join(fresh, Seq("bucket"), "left")
        .select(col("bucket"), col("n_occurrences"),
          coalesce(col("n_new_types"), lit(0L)).as("n_new_types"),
          (coalesce(col("n_new_types"), lit(0L)).cast("double")
            / col("n_occurrences")).as("novelty_rate"))
        .orderBy(asc_nulls_last("bucket"))
    }),

    // Bigram language-model cross-entropy of the eval split under a
    // model trained on the train split (doc_id % 5, the decontaminate
    // convention) — THE corpus quality filter (perplexity-based pruning
    // à la CCNet/DSIR), previously impossible under the libm-ln
    // descope: with add-one smoothing p̂(b|a) = (c_ab+1)/(c_a+V), the
    // per-bigram bits are plog2(c_a+V) − plog2(c_ab+1) — portable log2
    // of two INTEGERS — quantized to the exact 1e-10 grid and summed as
    // integers, so the per-doc mean is order-invariant. (Perplexity
    // itself is 2^H — pow is libm, so the query emits bits/bigram; the
    // monotone transform preserves every ranking/threshold use.) Scale:
    // counts are one (a,b)-keyed shuffle with map-side combine; the
    // eval side probes them by a gram-keyed shuffle join (the
    // q_decontaminate economics — never a corpus-fraction broadcast);
    // V is a 1-row constant-key broadcast.
    "q_text_perplexity" -> ((s, d) => {
      val toks = t(s, d, "documents").filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
        .select(col("doc_id"), col("p.a"), col("p.b"))
      val train = toks.filter(col("doc_id") % 5 =!= 0)
      val cntAb = bigrams(train).groupBy("a", "b")
        .agg(count(lit(1)).as("cab"))
      val cntA = cntAb.groupBy("a").agg(sum("cab").as("ca"))
      val vocab = broadcast(train
        .select(explode(col("toks")).as("tok"))
        .agg(countDistinct("tok").as("v")).withColumn("_one", lit(1)))
      val ev = bigrams(toks.filter(col("doc_id") % 5 === 0))
        .join(cntAb, Seq("a", "b"), "left")
        .join(cntA, Seq("a"), "left")
        .withColumn("_one", lit(1)).join(vocab, "_one")
        .withColumn("num", coalesce(col("cab"), lit(0L)) + 1L)
        .withColumn("den", coalesce(col("ca"), lit(0L)) + col("v"))
      graft.Det.withPlog2(graft.Det.withPlog2(ev, "num", "l2n"),
          "den", "l2d")
        .withColumn("q", expr(
          "CAST(floor((l2d - l2n) * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("q").as("sq"))
        .select(col("doc_id"), col("n_bigrams"), expr(
          "CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE) " +
            "/ CAST(n_bigrams AS DOUBLE)").as("cross_entropy"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Interpolated Kneser–Ney bigram scoring (Kneser & Ney, ICASSP
    // 1995; Chen & Goodman 1998) — THE n-gram smoothing, upgraded from
    // q_text_perplexity's add-one: with discount d = 3/4 (an exact
    // binary fraction, so 4·KN stays integral),
    //   p(w|v) = (c_vw − ¾)₊/c_v + (¾·N₁₊(v·)/c_v) · p_cont(w),
    //   p_cont(w) = (N₁₊(·w) + 1)/(B + V + 1)
    // (continuation counts, add-one on the continuation distribution so
    // unseen words keep positive mass; B = bigram types, V = train
    // vocabulary). Every probability is the exact rational
    //   num = (4c_vw − 3)₊·(B+V+1) + 3·N₁₊(v·)·(N₁₊(·w)+1)
    //   den = 4·c_v·(B+V+1)        (unseen context: num = N₁₊(·w)+1,
    //                               den = B+V+1 — pure continuation)
    // and the per-bigram bits are portable-log2 chains over INTEGER
    // pieces: den factors exactly (log2(4c_v) + log2(B+V+1)); num does
    // not, so it DOWNSHIFTS deterministically to its first 18 decimal
    // digits (a pure string slice — floor(num/10^sh) on both engines)
    // with the shifted magnitude restored as sh·log2(10) (16-digit
    // literal, identical text): the truncation perturbs log2(num) by
    // < 1e-17 — noise against the 1e-10 grid — while keeping every
    // intermediate inside BIGINT at ANY corpus size (num itself can
    // pass 2^63 once c_vw·(B+V) ≈ 2.3e18). Per-source readout: bits
    // per bigram + the backoff rate (share of eval bigrams whose
    // context never occurred in train). Scale: the q_text_perplexity
    // economics — (a,b)-keyed count shuffles with map-side combine,
    // gram-keyed eval probes (never a corpus-fraction broadcast), and
    // the (B, V) totals as a 1-row constant-key broadcast.
    "q_text_lm_kn" -> ((s, d) => {
      val toks = t(s, d, "documents").filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"), col("source"), explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
        .select(col("doc_id"), col("source"), col("p.a"), col("p.b"))
      val train = toks.filter(col("doc_id") % 5 =!= 0)
      val cntAb = bigrams(train).groupBy("a", "b")
        .agg(count(lit(1)).as("cab"))
      val ctx = cntAb.groupBy("a")
        .agg(sum("cab").as("ca"), count(lit(1)).as("n1a"))
      val cont = cntAb.groupBy("b").agg(count(lit(1)).as("n1b"))
      val bt = cntAb.agg(count(lit(1)).as("bt"))
        .withColumn("_one", lit(1))
      val vc = train.select(explode(col("toks")).as("tok"))
        .agg(countDistinct("tok").as("v")).withColumn("_one", lit(1))
      val tot = broadcast(bt.join(vc, "_one")
        .select(col("_one"), (col("bt") + col("v") + 1L).as("bv")))
      val dec = "decimal(38,0)"
      val ev = bigrams(toks.filter(col("doc_id") % 5 === 0))
        .join(cntAb, Seq("a", "b"), "left")
        .join(ctx, Seq("a"), "left")
        .join(cont, Seq("b"), "left")
        .withColumn("_one", lit(1)).join(tot, "_one")
        .withColumn("seen", col("ca").isNotNull)
        .withColumn("numd", when(col("seen"),
          greatest(lit(0L), coalesce(col("cab"), lit(0L)) * 4L - 3L)
            .cast(dec) * col("bv").cast(dec)
            + lit(3L).cast(dec) * col("n1a").cast(dec)
              * (coalesce(col("n1b"), lit(0L)) + 1L).cast(dec))
          .otherwise((coalesce(col("n1b"), lit(0L)) + 1L).cast(dec)))
        // den factors exactly: log2(den) = log2(denf1) + log2(bv)
        .withColumn("denf1",
          when(col("seen"), col("ca") * 4L).otherwise(lit(1L)))
        // num downshifts to 18 decimal digits: floor(num / 10^sh) as a
        // string slice, sh restored as sh·log2(10)
        .withColumn("numstr", col("numd").cast("string"))
        .withColumn("sh",
          greatest(lit(0), length(col("numstr")) - 18).cast("long"))
        .withColumn("num18",
          expr("CAST(substring(numstr, 1, 18) AS BIGINT)"))
      val chained = graft.Det.withPlog2(graft.Det.withPlog2(
          graft.Det.withPlog2(ev, "denf1", "l2d1"), "bv", "l2d2"),
        "num18", "l2n")
      chained
        .withColumn("q", expr(
          "CAST(floor((l2d1 + l2d2 - l2n " +
            "- CAST(sh AS DOUBLE) * CAST(3.321928094887362 AS DOUBLE)) " +
            "* CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("seen"), 0L).otherwise(1L)).as("n_backoff"),
          sum("q").as("sq"))
        .select(col("source"), col("n_bigrams"), col("n_backoff"),
          expr("CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE) " +
            "/ CAST(n_bigrams AS DOUBLE)").as("kn_bits"),
          (col("n_backoff").cast("double") / col("n_bigrams"))
            .as("backoff_rate"))
        .orderBy(asc_nulls_last("source"))
    }),

    "q_text_stats" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("n_chars")).cast("double") / count(lit(1)))
            .as("avg_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
        .orderBy(asc_nulls_last("lang"))),

    // Syllable-density readability profile per language — the
    // Flesch-family signal that survives this fixture's
    // no-sentence-punctuation token streams: syllables ≈ vowel CLUSTERS
    // ([aeiouy]+ runs, the standard heuristic's core), so the profile
    // reads out syllables/word, word length and vowel ratio — the
    // inputs a quality gate combines into grade-level scores. Counting
    // is pure LENGTH arithmetic around two regex rewrites (cluster →
    // '#', cluster → ''): C = len(after-#) − len(after-del), V = len −
    // len(after-del), W = spaces + 1 — all exact integers summed per
    // lang with map-side combine; the three ratios are independent
    // single divisions of exact totals. Scale: one narrow map over the
    // text column + a |langs|-bounded keyed agg, zero joins.
    "q_text_readability" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("lang"),
          length(col("text")).cast("long").as("l0"),
          length(regexp_replace(col("text"), "[aeiouy]+", ""))
            .cast("long").as("l1"),
          length(regexp_replace(col("text"), "[aeiouy]+", "#"))
            .cast("long").as("l2"),
          length(regexp_replace(col("text"), " ", ""))
            .cast("long").as("l3"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("l2 - l1")).as("clusters"),
          sum(expr("l0 - l1")).as("vowels"),
          sum(expr("l0 - l3 + 1")).as("words"),
          sum(col("l3")).as("word_chars"))
        .withColumn("syll_per_word", expr(
          "CAST(clusters AS DOUBLE) / CAST(words AS DOUBLE)"))
        .withColumn("chars_per_word", expr(
          "CAST(word_chars AS DOUBLE) / CAST(words AS DOUBLE)"))
        .withColumn("vowel_ratio", expr(
          "CAST(vowels AS DOUBLE) / CAST(word_chars AS DOUBLE)"))
        .select("lang", "n_docs", "words", "clusters", "syll_per_word",
          "chars_per_word", "vowel_ratio")
        .orderBy(asc_nulls_last("lang"))),

    // Per-document Shannon token entropy — the lexical-diversity quality
    // signal gini approximates from below, now exact(-to-2e-7) via the
    // r8 BIT-PORTABLE log2 (graft.Det.plog2Series: exact binary exponent
    // + atanh-series mantissa, only +,*,/ on identically-derived doubles
    // — libm ln() was the reason entropy stayed descoped through r7).
    // H = log2(n) − (Σ c·log2 c)/n over per-doc token counts c; each
    // c·log2 c term is quantized to the exact 1e-10 grid (floor(x·1e10
    // + 0.5), the pure-IEEE embed_cov rounding) so the per-doc sum is
    // exact integer arithmetic — partition-order-invariant. Scale: one
    // (doc, token) shuffle with map-side combine, then a doc-keyed
    // reduce — token-cardinality cost, no corpus-wide state.
    "q_text_entropy" -> ((s, d) => {
      val tc = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val terms = tc
        .withColumn("e2", expr(graft.Det.log2Exp("c")))
        .withColumn("mm", expr(graft.Det.mantissa("c", "e2")))
        .withColumn("zz", expr(graft.Det.zOfM("mm")))
        .withColumn("l2",
          expr(s"CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")}"))
        .withColumn("q", expr(
          "CAST(floor(CAST(c AS DOUBLE) * l2 " +
            "* CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum("q").as("sq"))
      terms
        .withColumn("e2", expr(graft.Det.log2Exp("n_tokens")))
        .withColumn("mm", expr(graft.Det.mantissa("n_tokens", "e2")))
        .withColumn("zz", expr(graft.Det.zOfM("mm")))
        .withColumn("entropy", expr(
          s"CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")} " +
            "- CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE) " +
            "/ CAST(n_tokens AS DOUBLE)"))
        .select("doc_id", "n_tokens", "n_types", "entropy")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Zipf rank–frequency fit over the top-100 corpus tokens — the
    // "does this corpus look like natural language" diagnostic (natural
    // text slopes ≈ −1; template/boilerplate corpora flatten or
    // cliff). Least-squares of log2(freq) on log2(rank), both through
    // the bit-portable log2; the regression moments quantize each term
    // to the exact 1e-10 grid and sum as integers, so the fit is
    // order-invariant and engine-identical. Scale: one token shuffle
    // with map-side combine → TakeOrdered(100) → the 100-row tail runs
    // IN-ROW (sorted collect_list + posexplode — no global window, the
    // q_path_per_session trick); a 100 TB corpus adds zero rows to the
    // fitted frame.
    "q_text_zipf" -> ((s, d) => {
      val top = t(s, d, "documents").filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(desc_nulls_last("c"), asc_nulls_last("tok"))
        .limit(100)
      top
        .agg(expr("sort_array(collect_list(struct(-c AS nc, tok, c)))")
          .as("a"))
        .select(posexplode(col("a")).as(Seq("i", "s")))
        .select((col("i") + 1).cast("long").as("rank"),
          col("s.c").as("c"))
        .withColumn("er", expr(graft.Det.log2Exp("rank")))
        .withColumn("mr", expr(graft.Det.mantissa("rank", "er")))
        .withColumn("zr", expr(graft.Det.zOfM("mr")))
        .withColumn("x",
          expr(s"CAST(er AS DOUBLE) + ${graft.Det.plog2Series("zr")}"))
        .withColumn("ec", expr(graft.Det.log2Exp("c")))
        .withColumn("mc", expr(graft.Det.mantissa("c", "ec")))
        .withColumn("zc", expr(graft.Det.zOfM("mc")))
        .withColumn("y",
          expr(s"CAST(ec AS DOUBLE) + ${graft.Det.plog2Series("zc")}"))
        .select(col("x"), col("y"),
          expr("CAST(floor(x * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").as("qx"),
          expr("CAST(floor(y * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").as("qy"),
          expr("CAST(floor(x * y * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").as("qxy"),
          expr("CAST(floor(x * x * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").as("qxx"))
        .agg(count(lit(1)).as("n_ranks"), sum("qx").as("sx"),
          sum("qy").as("sy"), sum("qxy").as("sxy"), sum("qxx").as("sxx"))
        // all four moments are exact ints on the 1e-10 grid; the fit
        // assembles them with IDENTICAL expression text on both engines
        // (the q_stats_anova discipline, via zipfFitExprs)
        .selectExpr("n_ranks" +: zipfFitExprs: _*)
    }),

    // Exact dedup: hash-groupBy on a normalization fingerprint. At scale
    // this is one shuffle on the 128-bit key; groups with n_docs > 1 are
    // exact duplicates (this corpus has none — the grouping itself is the
    // declared result).
    "q_text_dedup" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("fp", md5(lower(trim(col("text")))))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
        .orderBy(asc_nulls_last("fp"))),

    // MinHash signatures + LSH band keys (shingle → minhash → band) —
    // built from the shared [[MinHash]] blocks the TextDedup pipeline
    // also uses.
    "q_dedup_minhash" -> ((s, d) => {
      val withSigs = MinHash.withSignatures(
        t(s, d, "documents").select("doc_id", "text"), "text", NumHashes)
      withSigs
        .select(col("doc_id") +:
          ((0 until NumHashes).map(i => col(s"sig_$i")) ++
            MinHash.bandKeys(NumHashes, NumBands)): _*)
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // 16-bit SimHash over token hashes (sign of per-bit vote), computed
    // entirely IN-ROW: md5 once per token, then a 16-way bit-vote fold
    // over the hash array — zero shuffles (the previous explode +
    // 16-row-grid crossJoin + two groupBys shuffled 16× the token count).
    // Per-document work is identical; at 100 TB this is a pure map.
    // r13 OPTIMIZATION (guide §4 / step-4 codegen): the vote fold is the
    // native [[graft.functions.SimHash16]] expression — the previous
    // nested aggregate-in-aggregate HOF ran 16 × |tokens| interpreted
    // lambda steps per row (instr + substring + pow each), measured
    // 8.4 s of the query's 8.5 s at sf0.1; the native loop parses each
    // hash's 4 leading nibbles once in compiled code (exact-result
    // contract incl. edge arithmetic pinned in ByteOpsSpec; the bench
    // query fell to ~0.6 s). md5 stays Spark's builtin.
    "q_dedup_simhash" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      t(s, d, "documents")
        // null-text docs have no tokens: the old explode form (and the
        // oracle's unnest) drop them — the in-row fold must too
        .filter(col("text").isNotNull)
        .withColumn("hs", expr("transform(split(text, ' '), t -> md5(t))"))
        .withColumn("simhash", expr("simhash16(hs)"))
        .select("doc_id", "simhash")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // END-TO-END LSH near-dup pipeline: shingle → minhash → band keys →
    // band-bucket self-join (candidates only) → exact Jaccard verify.
    // The composed scale path — candidate generation shuffles on band key
    // (O(n·bands)), never the O(n²) pair space.
    "q_dedup_pairs" -> ((s, d) =>
      Corpus.nearDupPairs(s, d)
        .orderBy(asc_nulls_last("id_a"), asc_nulls_last("id_b"))),

    // Query-time near-dup LOOKUP — "find THIS document's near-dups",
    // the point-read the corpus-wide q_dedup_pairs can't serve without
    // scanning its whole output: the probe's band keys broadcast
    // (≤ bands rows), candidates are the docs sharing ANY band (a
    // keyed semi-join on band — the index-probe read path of the LSH
    // table), and only candidates get the exact-Jaccard verify against
    // the probe's broadcast token set. At 100 TB this is the online
    // serving shape: per-probe work is buckets-touched, not corpus.
    // Probe doc_id = 8 (has VERIFIED LSH pairs at every fixture SF
    // — exact-Jaccard dups alone are not enough: the probe must also
    // band-collide, which doc 1 does not at sf0.01).
    "q_dedup_lookup" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val signed = MinHash.withSignatures(base, "text", 8)
      val banded = signed.select(col("id"),
        explode(array(MinHash.bandKeys(8, 4): _*)).as("band"))
      val probeBands = broadcast(banded.filter(col("id") === 8)
        .select(col("band")).distinct())
      val cands = banded.join(probeBands, "band")
        .filter(col("id") =!= 8)
        .select("id").distinct()
      val toks = MinHash.tokens(base, "text")
      val probeToks = broadcast(toks.filter(col("id") === 8)
        .select(col("toks").as("toks_b")).withColumn("_one", lit(1)))
      cands.join(toks, "id")
        .withColumn("_one", lit(1)).join(probeToks, "_one")
        .withColumn("inter", size(array_intersect(
          array_distinct(col("toks")), array_distinct(col("toks_b")))))
        .withColumn("uni", size(array_union(
          array_distinct(col("toks")), array_distinct(col("toks_b")))))
        .withColumn("jaccard", col("inter").cast("double") / col("uni"))
        .filter(col("jaccard") >= 0.7)
        .select(col("id").as("doc_id"), col("jaccard"))
        .orderBy(desc_nulls_last("jaccard"), asc_nulls_last("doc_id"))
    }),

    // Edit-distance fuzzy matching — the character-grain verifier the
    // token-set Jaccard can't express (transpositions, small in-word
    // edits): Levenshtein distance over 60-char prefixes of each
    // VERIFIED near-dup pair, plus the normalized prefix similarity
    // 1 − d/max(len). The O(len²) DP runs ONLY on the LSH-verified
    // sliver (never all pairs — the same verify-touches-candidates
    // economics as the Jaccard stage); prefixes cap the DP at 60² per
    // pair. Both engines implement classic unit-cost Levenshtein, so
    // the distances are engine-identical and the similarity is one
    // IEEE division.
    "q_text_editdist" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pre = docs.select(col("doc_id"),
        substring(col("text"), 1, 60).as("tp"))
      Corpus.nearDupPairs(s, d)
        .join(pre.select(col("doc_id").as("id_a"), col("tp").as("ta")),
          "id_a")
        .join(pre.select(col("doc_id").as("id_b"), col("tp").as("tb")),
          "id_b")
        .select(col("id_a"), col("id_b"), col("jaccard"),
          levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
          (lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double")
            / greatest(length(col("ta")), length(col("tb"))))
            .as("prefix_sim"))
        .orderBy(asc_nulls_last("id_a"), asc_nulls_last("id_b"))
    }),

    // LSH dedup RECALL against exact ground truth — "what fraction of a
    // document's true near-duplicates does the banded pipeline actually
    // find?", the q_ann_recall question asked of text dedup. Ground
    // truth: exact token-set Jaccard ≥ 0.7 from a FIXED 16-doc panel
    // (doc_id < 16 — a bounded constant independent of corpus size, the
    // q_ann_recall broadcast argument) to every document in the
    // pipeline's universe (≥ 3 tokens). Found: the declared LSH pairs
    // touching the panel — verified at the SAME similarity, so
    // found ⊆ truth and recall ≤ 1 by construction. Per-panel-doc
    // (n_true, n_found, recall); the recall is ONE IEEE division of
    // exact counts.
    "q_dedup_recall" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val toks = docs
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), array_distinct(col("toks")).as("tset"))
      val panel = broadcast(toks.filter(col("doc_id") < 16)
        .select(col("doc_id").as("pid"), col("tset").as("ptoks")))
      val truth = toks.join(panel, col("doc_id") =!= col("pid"))
        .withColumn("inter",
          size(array_intersect(col("ptoks"), col("tset"))))
        .withColumn("uni",
          size(col("ptoks")) + size(col("tset")) - col("inter"))
        .filter(col("inter").cast("double") / col("uni") >= 0.7)
        .groupBy("pid").agg(count(lit(1)).as("n_true"))
      val found = Corpus.nearDupPairs(s, d)
        .select(explode(array(
          struct(col("id_a").as("pid"), col("id_b").as("other")),
          struct(col("id_b").as("pid"), col("id_a").as("other")))).as("e"))
        .select("e.pid", "e.other")
        .filter(col("pid") < 16)
        .groupBy("pid").agg(count(lit(1)).as("n_found"))
      truth.join(found, Seq("pid"), "left")
        .select(col("pid").as("doc_id"), col("n_true"),
          coalesce(col("n_found"), lit(0L)).as("n_found"),
          (coalesce(col("n_found"), lit(0L)).cast("double")
            / col("n_true")).as("recall"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // MinHash estimator accuracy on the verified near-dup pairs:
    // est = matching signatures / NumHashes vs the exact token-set
    // Jaccard — the sketch-quality diagnostic of the LSH pipeline. Each
    // signature match is APPROXIMATELY a Bernoulli of the true Jaccard:
    // the XOR-by-constant family folds one shared 60-bit md5 per shingle
    // (see the MinHash scaladoc on the OPH-style correlation), so the
    // indices are not independent permutations — this very query is the
    // empirical guard on the resulting bias. The signature frame is
    // persisted once and joined to both pair sides.
    "q_dedup_minhash_est" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Corpus.nearDupPairs(s, d)
        .select("id_a", "id_b", "jaccard")
      val signed = MinHash.withSignatures(
          docs.select(col("doc_id").as("id"), col("text")),
          "text", NumHashes)
        .select(col("id") +:
          (0 until NumHashes).map(i => col(s"sig_$i")): _*)
        .persistScoped()
      val a = signed.toDF(
        "id_a" +: (0 until NumHashes).map(i => s"a_$i"): _*)
      val b = signed.toDF(
        "id_b" +: (0 until NumHashes).map(i => s"b_$i"): _*)
      val matches = (0 until NumHashes)
        .map(i => when(col(s"a_$i") === col(s"b_$i"), 1).otherwise(0))
        .reduce(_ + _)
      pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("matches", matches.cast("long"))
        .withColumn("est_jaccard",
          col("matches").cast("double") / NumHashes)
        .select("id_a", "id_b", "jaccard", "matches", "est_jaccard")
        .orderBy(asc_nulls_last("id_a"), asc_nulls_last("id_b"))
    }),

    // Token-set Jaccard over a bounded pair set (the verify stage of the
    // LSH pipeline).
    "q_dedup_ngram" -> ((s, d) => {
      val dtok = t(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val sizes = dtok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = dtok.as("a")
        .join(dtok.as("b"), col("a.tok") === col("b.tok")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
          "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")),
          "doc_b")
        .withColumn("jaccard", col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy(asc_nulls_last("doc_a"), asc_nulls_last("doc_b"))
    }),

    // ASYMMETRIC containment C(A→B) = |A∩B| / |A|: flags documents
    // mostly CONTAINED in another (quote/subset duplicates that
    // symmetric Jaccard under-scores — a 50-token doc inside a
    // 5000-token doc has Jaccard ~0.01 but containment 1.0). Ordered
    // pairs, both directions, over the same bounded verify set as
    // q_dedup_ngram; the scale path feeds LSH candidates through the
    // identical shape.
    "q_dedup_containment" -> ((s, d) => {
      val dtok = t(s, d, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
      val sizes = dtok.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = dtok.as("a")
        .join(dtok.as("b"), col("a.tok") === col("b.tok")
          && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")),
          "doc_a")
        .withColumn("containment", col("inter").cast("double") / col("na"))
        .filter(col("containment") >= 0.8)
        .select("doc_a", "doc_b", "inter", "containment")
        .orderBy(asc_nulls_last("doc_a"), asc_nulls_last("doc_b"))
    }),

    // n-gram-marker language ID (deterministic heuristic scoring).
    "q_text_langid" -> ((s, d) => {
      val base = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
      val scored = markers.toSeq.sortBy(_._1).foldLeft(base) {
        case (df, (lang, words)) =>
          val list = words.map(w => s"'$w'").mkString(", ")
          df.withColumn(s"s_$lang",
            expr(s"CAST(size(filter(toks, t -> t IN ($list))) AS BIGINT)"))
      }
      scored
        .withColumn("pred_lang", expr(langCase))
        .select("doc_id", "lang", "pred_lang",
          "s_de", "s_en", "s_es", "s_fr", "s_zh")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Language-ID confusion matrix — the EVALUATION of q_text_langid
    // against the declared lang labels: per (true, predicted) cell, doc
    // count + row-share (one IEEE division of exact counts via a
    // lang-partitioned window total — bounded by the language domain) +
    // the diagonal flag. Composes the declared classifier query, so the
    // two stay in lockstep by construction. Scale: the per-doc scoring
    // is the langid narrow map; the rollup is one keyed agg over a
    // |langs|² -bounded frame.
    "q_lang_confusion" -> ((s, d) => {
      val wl = Window.partitionBy("lang")
      queries("q_text_langid")(s, d)
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share", col("n_docs").cast("double")
          / sum("n_docs").over(wl))
        .withColumn("correct", col("lang") === col("pred_lang"))
        .orderBy(asc_nulls_last("lang"), asc_nulls_last("pred_lang"))
    }),

    // Filter-cascade attribution — the "why did we drop it" report a
    // curation pipeline owes its operators: each document runs the four
    // declared gates IN ORDER (language-ID mismatch → gopher structural
    // → non-canonical exact duplicate → quality score) and is charged
    // to the FIRST gate it fails, so gate counts downstream of a noisy
    // langid never silently absorb its rejects. Composes the declared
    // q_text_langid / gopherMetrics / q_text_quality logic, so the
    // cascade stays in lockstep with the individual gates by
    // construction. Scale: four doc-grain narrow maps equi-joined on
    // doc_id (AQE co-partitions the shuffles); the dup gate is a
    // hash-partitioned window over md5 groups, never global.
    "q_quality_cascade" -> ((s, d) => {
      val li = queries("q_text_langid")(s, d)
        .select(col("doc_id"),
          (col("pred_lang") =!= col("lang")).as("g_lang"))
      val gm = Quality.gopherMetrics(t(s, d, "documents"))
        .select(col("doc_id"), (!col("passes")).as("g_gopher"))
      val wdup = Window.partitionBy("h")
      val dup = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .withColumn("g_dup",
          col("doc_id") =!= min("doc_id").over(wdup))
        .select("doc_id", "g_dup")
      val q = t(s, d, "documents").filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("score",
          (size(array_distinct(col("toks"))).cast("double")
            / col("n_tokens"))
            * (least(col("n_tokens"), lit(100L)).cast("double") / 100))
        .select(col("doc_id"), (!(col("score") > 0.3)).as("g_quality"))
      li.join(gm, "doc_id").join(dup, "doc_id").join(q, "doc_id")
        .withColumn("first_failed",
          when(col("g_lang"), "lang")
            .when(col("g_gopher"), "gopher")
            .when(col("g_dup"), "exact_dup")
            .when(col("g_quality"), "quality")
            .otherwise("kept"))
        .withColumn("kept", col("first_failed") === "kept")
        .select("doc_id", "g_lang", "g_gopher", "g_dup", "g_quality",
          "first_failed", "kept")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Hapax legomena per source — the share of a source's vocabulary
    // seen exactly once (the tokenizer-health / crawl-diversity
    // diagnostic next to q_vocab_growth's corpus-decile view): high
    // hapax rate predicts vocabulary blow-up, near-zero predicts
    // boilerplate. Exact integer counts, ONE IEEE division. Scale: one
    // (source, token) shuffle with map-side combine, then a
    // vocabulary-grain keyed agg.
    "q_text_hapax" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"),
          explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
          sum("c").as("n_tokens"))
        .withColumn("hapax_rate",
          col("hapax").cast("double") / col("vocab"))
        .orderBy(asc_nulls_last("source"))),

    // Quality scoring: length / type-token ratio features.
    "q_text_quality" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_distinct",
          size(array_distinct(col("toks"))).cast("long"))
        .withColumn("ttr",
          col("n_distinct").cast("double") / col("n_tokens"))
        .withColumn("avg_token_len",
          (col("n_chars") - (col("n_tokens") - 1)).cast("double")
            / col("n_tokens"))
        .withColumn("score", col("ttr")
          * (least(col("n_tokens"), lit(100L)).cast("double") / 100))
        .withColumn("is_quality", col("score") > 0.3)
        .select("doc_id", "n_tokens", "n_distinct", "ttr", "avg_token_len",
          "score", "is_quality")
        .orderBy(asc_nulls_last("doc_id"))),

    // Moving-average type-token ratio, window 50 (Covington & McFall
    // 2010) — the lexical-diversity metric that plain TTR gets WRONG on
    // varying document lengths (TTR falls mechanically with length, so
    // a length-based quality gate using raw TTR systematically favors
    // short docs): average the distinct-type count over every 50-token
    // sliding window. Docs shorter than the window fall back to plain
    // TTR (the standard convention, stated). All counts exact integers
    // folded IN-ROW (a pure narrow map); ONE trailing IEEE division.
    // Scale: zero shuffles until the terminal sort.
    // r13 OPTIMIZATION (guide step-4 codegen + the open ADVICE r12
    // scaling item): the window fold is the native O(n)
    // [[graft.functions.MattrSumDistinct]] — the HOF form paid an
    // interpreted slice + array_distinct PER WINDOW (O(n·W); a
    // 100k-token doc ≈ 5M list_distinct evaluations in one row); the
    // native loop maintains one sliding count map. Same per-window
    // distinct counts summed (ByteOpsSpec pins equivalence); the
    // oracle keeps the direct fold. Bench 1.15 → see OPTIMIZATION_r13.
    "q_text_mattr" -> ((s, d) => {
      val W = 50
      graft.functions.GraftFunctions.ensureRegistered(s)
      t(s, d, "documents").filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_windows", expr(
          s"CAST(CASE WHEN size(toks) >= $W THEN size(toks) - $W + 1 " +
            "ELSE 1 END AS BIGINT)"))
        .withColumn("sum_distinct", expr(
          s"mattr_sum_distinct(toks, $W)"))
        .withColumn("mattr", expr(
          s"CASE WHEN n_tokens >= $W THEN " +
            s"CAST(sum_distinct AS DOUBLE) " +
            s"/ (CAST(n_windows AS DOUBLE) * CAST($W AS DOUBLE)) " +
            "ELSE CAST(sum_distinct AS DOUBLE) " +
            "/ CAST(n_tokens AS DOUBLE) END"))
        .select("doc_id", "n_tokens", "n_windows", "sum_distinct",
          "mattr")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Document fingerprint: extremal 2-gram shingle hashes (winnowing-
    // style representative selection, deterministic).
    "q_text_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .withColumn("fp_min", expr(
          "array_min(transform(sequence(0, size(toks) - 2), " +
            "i -> md5(concat(toks[i], ' ', toks[i+1]))))"))
        .withColumn("fp_max", expr(
          "array_max(transform(sequence(0, size(toks) - 2), " +
            "i -> md5(concat(toks[i], ' ', toks[i+1]))))"))
        .select("doc_id", "fp_min", "fp_max")
        .orderBy(asc_nulls_last("doc_id"))),

    // Token counting: whitespace tokens + a BPE-ish segmentation count
    // (vowel-run / consonant-run segments via regex).
    "q_text_tokencount" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("ws_tokens",
          size(split(col("text"), " ")).cast("long"))
        .withColumn("vowel_runs",
          size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0)))
            .cast("long"))
        .withColumn("other_runs",
          size(regexp_extract_all(col("text"), lit("[^aeiou ]+"), lit(0)))
            .cast("long"))
        .withColumn("subword_total", col("vowel_runs") + col("other_runs"))
        .select("doc_id", "ws_tokens", "vowel_runs", "other_runs",
          "subword_total")
        .orderBy(asc_nulls_last("doc_id"))),

    // Tokenizer fertility per language — subword tokens emitted per
    // whitespace word (the q_text_tokencount vowel/consonant-run
    // segmentation as the BPE-ish stand-in), THE number a multilingual
    // pipeline watches per language: fertility ≫ 1 for a language means
    // the tokenizer fragments it, inflating its compute cost per
    // delivered word and starving it of effective context. Exact
    // integer counts from narrow in-row regexes; one lang-keyed agg
    // with map-side combine; one trailing IEEE division per lang.
    "q_tokenizer_fertility" -> ((s, d) =>
      t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("ws"),
          (size(regexp_extract_all(col("text"), lit("[aeiou]+"),
            lit(0))) +
            size(regexp_extract_all(col("text"), lit("[^aeiou ]+"),
              lit(0)))).cast("long").as("sub"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("ws").as("n_words"),
          sum("sub").as("n_subwords"))
        .withColumn("fertility", expr(
          "CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE)"))
        .orderBy(asc_nulls_last("lang"))),

    // Corpus bigram frequencies — the co-occurrence statistic BPE-style
    // tokenizer training starts from. In-row bigram arrays, one shuffle
    // on the bigram key.
    "q_text_bigrams" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> concat(toks[i], ' ', toks[i+1]))")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(desc_nulls_last("cnt"), asc_nulls_last("bigram"))
        .limit(20)),

    // Bigram-LM fluency gate (the KenLM-style quality filter without the
    // log): every document scored by its MEAN corpus-bigram conditional
    // probability. Log-perplexity is not bit-portable (ln differs across
    // libm builds — SURVEY §7.4 round 3), so each p(b|a) is quantized to
    // the exact integer floor(cnt_ab·10⁶ / cnt_a) — identical floor
    // division on both engines, and the 10⁶ scale keeps the multiply
    // inside BIGINT up to ~9×10¹² occurrences per bigram — summed
    // exactly per document; the mean is ONE IEEE division at the end.
    // Scale: the tokenized corpus is persisted once and feeds both the
    // stats branch and the per-doc join; the join back to documents is
    // an equi-join on the bigram key (hash-joinable, shuffles the corpus
    // once); prefix totals are a window over the |vocab|²-bounded counts.
    "q_text_lm_score" -> ((s, d) => {
      val docBg = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
        .select(col("doc_id"), col("p.a"), col("p.b"))
        .persistScoped()
      val wTot = Window.partitionBy("a")
      val probs = docBg.groupBy("a", "b").agg(count(lit(1)).as("cnt_ab"))
        .withColumn("cnt_a", sum("cnt_ab").over(wTot))
        .withColumn("p_scaled", expr(
          "(cnt_ab * CAST(1000000 AS BIGINT)) DIV cnt_a"))
        .select("a", "b", "p_scaled")
      docBg.join(probs, Seq("a", "b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum("p_scaled").as("score_sum"))
        .withColumn("fluency", col("score_sum").cast("double")
          / (col("n_bigrams").cast("double") * lit(1000000.0d)))
        .select("doc_id", "n_bigrams", "score_sum", "fluency")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // DSIR-style data-selection weights (Xie et al., NeurIPS 2023 —
    // importance resampling toward a target domain): each TRAIN doc is
    // scored by how much more its bigrams look like the TARGET split
    // (doc_id % 5 == 0, the q_decontaminate eval convention) than like
    // the raw corpus. Log-likelihood ratios are transcendental, so this
    // uses the q_text_lm_score precedent: per-bigram probabilities as
    // exact scaled integers (cnt·1e6 DIV prefix-total), the score the
    // ADDITIVE affinity gap (Σp_target − Σp_raw)/n — same ranking
    // intent, engine-identical arithmetic, one trailing IEEE division.
    // Scale: two vocabulary-sized probability frames keyed on the
    // bigram join back onto one bigram-keyed corpus shuffle; target
    // bigrams missing from a train doc's vocabulary coalesce to 0.
    "q_dsir_weight" -> ((s, d) => {
      val docBg = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
        .select(col("doc_id"), col("p.a"), col("p.b"))
        .persistScoped()
      val wTot = Window.partitionBy("a")
      def probs(src: DataFrame, alias: String): DataFrame =
        src.groupBy("a", "b").agg(count(lit(1)).as("cnt_ab"))
          .withColumn("cnt_a", sum("cnt_ab").over(wTot))
          .withColumn(alias, expr(
            "(cnt_ab * CAST(1000000 AS BIGINT)) DIV cnt_a"))
          .select("a", "b", alias)
      docBg.filter(col("doc_id") % 5 =!= 0)
        .join(probs(docBg, "p_raw"), Seq("a", "b"))
        .join(probs(docBg.filter(col("doc_id") % 5 === 0), "p_tgt"),
          Seq("a", "b"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(coalesce(col("p_tgt"), lit(0L))).as("tgt_sum"),
          sum("p_raw").as("raw_sum"))
        .withColumn("dsir_score",
          (col("tgt_sum") - col("raw_sum")).cast("double")
            / (col("n_bigrams").cast("double") * lit(1000000.0d)))
        .select("doc_id", "n_bigrams", "tgt_sum", "raw_sum", "dsir_score")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Bigram conditional probability p(b|a) = cnt(a,b) / cnt(a,·) — the
    // n-gram language-model statistic. Exact integer counts, ONE IEEE
    // division; the per-prefix total joins back as a vocabulary-sized
    // broadcast, so the corpus shuffles once on the bigram key.
    "q_text_bigram_prob" -> ((s, d) => {
      val bg = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
        .select(col("p.a"), col("p.b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cnt_ab"))
      val tot = bg.groupBy("a").agg(sum("cnt_ab").as("cnt_a"))
      bg.join(tot, "a")
        .withColumn("p", col("cnt_ab").cast("double") / col("cnt_a"))
        .orderBy(desc_nulls_last("cnt_ab"), asc_nulls_last("a"),
          asc_nulls_last("b"))
        .limit(20)
        .select("a", "b", "cnt_ab", "cnt_a", "p")
    }),

    // Document frequency per token (the df side of tf-idf; the ratio is
    // exact small-int division — ln() is NOT bit-portable across libm
    // implementations, so idf itself stays a caller-side transform).
    "q_text_docfreq" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // corpus size as a broadcast 1-row aggregate on a constant join key
      // (declarative — no driver-side count(); hash join, never BNLJ)
      val total = broadcast(docs.agg(count(lit(1)).as("n_docs"))
        .withColumn("_one", lit(1)))
      docs
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
        .withColumn("_one", lit(1))
        .join(total, "_one")
        .withColumn("doc_ratio", col("df").cast("double") / col("n_docs"))
        .filter(col("df") >= 10)
        .select("tok", "df", "doc_ratio")
        .orderBy(desc_nulls_last("df"), asc_nulls_last("tok"))
    }),

    // BM25 retrieval (Robertson & Walker 1994, k₁=1.2 b=0.75) — the
    // top-20 documents for a self-derived 4-term query (the df-band
    // tokens ranked 6–9: past the stopword head, still corpus-wide).
    // THE ranked-retrieval scorer a curation stack uses for targeted
    // corpus probes ("find the docs about X"), upgrading q_text_tfidf's
    // raw tf·idf with saturation and length normalization. Exactness:
    // idf = ln((N−df+½)/(df+½)) = ln2·(log2(2N−2df+1) − log2(2df+1)) —
    // a ratio of ODD INTEGERS through two portable-log2 chains (the
    // q_text_perplexity move); the tf part is a fixed IEEE tree over
    // integer tf/dl (k₁+1 = 2.2, 1−b = 0.25, b = 0.75 — identical
    // literal text, avgdl one division of exact casts); each per-term
    // score quantizes to the 1e-10 grid BEFORE the per-doc integer sum,
    // so engine sum order never matters. Negative idf (df > N/2) is
    // kept — Robertson's raw form; floor(x+½) is exact either sign.
    // Scale: tf is one (doc,term)-keyed agg with map-side combine
    // against a 4-row broadcast term table; dl one doc-keyed agg;
    // terminal TakeOrdered(20) — no global windows, no vocab shuffle
    // beyond the df aggregate every text query already pays.
    "q_text_bm25" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val tot = broadcast(dl
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
        .withColumn("_one", lit(1)))
      val df = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      def band(n: Int) = df
        .orderBy(desc_nulls_last("df"), asc_nulls_last("tok")).limit(n)
      val qterms = broadcast(band(9)
        .join(band(5).select("tok"), Seq("tok"), "left_anti"))
      val base = toks.join(qterms, "tok")
        .groupBy("doc_id", "tok", "df").agg(count(lit(1)).as("tf"))
        .join(dl, "doc_id")
        .withColumn("_one", lit(1)).join(tot, "_one")
        .withColumn("hi",
          lit(2L) * col("n_docs") - lit(2L) * col("df") + 1L)
        .withColumn("lo", lit(2L) * col("df") + 1L)
      graft.Det.withPlog2(graft.Det.withPlog2(base, "hi", "l2h"),
          "lo", "l2l")
        .withColumn("q", expr(
          "CAST(floor((l2h - l2l) " +
            "* CAST(0.6931471805599453 AS DOUBLE) " +
            "* ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)) " +
            "/ (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) " +
            "* (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) " +
            "* (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) " +
            "/ CAST(n_docs AS DOUBLE)))))) " +
            "* CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("doc_id")
        .agg(max("dl").as("dl"), count(lit(1)).as("n_hits"),
          sum("q").as("sq"))
        .withColumn("score", expr(
          "CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE)"))
        .orderBy(desc_nulls_last("sq"), asc_nulls_last("doc_id"))
        .limit(20)
        .select("doc_id", "dl", "n_hits", "sq", "score")
    }),

    // Katz's word burstiness for the top-50 corpus tokens — once a
    // word appears in a document, how many MORE times does it appear
    // there (burstiness = tf/df − 1, Katz 1996)? Function words repeat
    // independently (≈ their rate), content/boilerplate words clump —
    // high burstiness on a high-df token is the template-phrase
    // signature that n-gram dedup thresholds should key on. tf and df
    // come from ONE token-keyed aggregate (df = distinct docs via a
    // (doc, tok) pre-distinct), burstiness = (tf − df)/df is exact
    // integers + ONE IEEE division. Scale: two keyed shuffles with
    // map-side combine → TakeOrdered(50); token skew is absorbed by
    // partial aggregation.
    "q_text_burstiness" -> ((s, d) => {
      val toks = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val stats = toks.groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("c"))
        .groupBy("tok")
        .agg(sum("c").as("tf"), count(lit(1)).as("df"))
      stats
        .orderBy(desc_nulls_last("tf"), asc_nulls_last("tok"))
        .limit(50)
        .withColumn("burstiness",
          (col("tf") - col("df")).cast("double") / col("df"))
        .select("tok", "tf", "df", "burstiness")
        .orderBy(desc_nulls_last("tf"), asc_nulls_last("tok"))
    }),

    // The LSH bands/rows S-curve measured empirically — the MinHash
    // tuning dial the IVF family's nprobe curve mirrors on the vector
    // side: over the SAME 8 signatures, band the corpus three ways
    // (8×1 loosest … 2×4 strictest) and report candidate volume vs how
    // many candidates verify at Jaccard ≥ 0.7. Fewer, wider bands trade
    // recall for precision (the (1−s^r)^b collision curve); this query
    // is where a corpus picks its operating point. Scale: three passes
    // of the proven bucketed pipeline — still never all-pairs; each
    // config's output is ONE row.
    "q_dedup_bands_curve" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id").as("id"), col("text"))
      // signatures computed ONCE (the expensive md5 pass) and persisted;
      // each config only re-bands them — was 3 full pipeline runs
      val signed = MinHash.withSignatures(base, "text").persistScoped()
      val toks = signed.select(col("id"), col("toks"))
      Seq(8, 4, 2).map { b =>
        TextDedup.withJaccard(
            TextDedup.candidatePairs(signed, NumHashes, b), toks)
          .agg(count(lit(1)).as("n_candidates"),
            count(when(col("jaccard") >= 0.7, lit(1))).as("n_verified"))
          .select(lit(b.toLong).as("bands"),
            lit((NumHashes / b).toLong).as("rows_per_band"),
            col("n_candidates"), col("n_verified"))
      }.reduce(_ unionAll _)
        .orderBy(desc_nulls_last("bands"))
    }),

    // LSH AUTO-TUNER (r10 verdict item #8) — the knob a 100 TB operator
    // actually turns: for every (bands, rows) factoring of the 8-hash
    // signature, marry the ANALYTIC collision model (p(J) =
    // 1−(1−J^r)^b, the q_dedup_bands_curve S-curve) to the MEASURED
    // bucket telemetry of THIS corpus (buckets ≥ 2, max bucket, exact
    // candidate-pair bill Σ s(s−1)/2), and flag the recommended
    // operating point: the cheapest config whose recall at the target
    // Jaccard 0.7 clears 0.9 (falling back to max-recall if none
    // does; ties break to more bands = more recall headroom). The
    // p-columns are fixed literal double trees — identical text both
    // engines — and the recommendation is a rank over them, so the
    // flag is hash-stable. Scale: signatures computed ONCE (persist
    // scoped); each config re-bands them into a slim (band) count —
    // the histogram pass costs O(n·bands) WITHOUT ever expanding
    // pairs, so tuning is cheaper than one mistuned dedup run.
    "q_dedup_lsh_tune" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val signed = MinHash.withSignatures(base, "text").persistScoped()
      def pTree(j: String, b: Int, r: Int): String =
        s"CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) - " +
          s"pow(CAST($j AS DOUBLE), CAST($r AS DOUBLE)), " +
          s"CAST($b AS DOUBLE))"
      val perConfig = Seq(8, 4, 2).map { b =>
        val r = NumHashes / b
        signed
          .select(col("id"),
            explode(array(MinHash.bandKeys(NumHashes, b): _*)).as("band"))
          .groupBy("band").agg(count(lit(1)).as("sz"))
          .filter(col("sz") >= 2L)
          .agg(count(lit(1)).as("n_buckets"),
            max("sz").as("max_bucket"),
            sum(expr("sz * (sz - 1) div 2")).as("pair_cost"))
          .select(lit(b.toLong).as("bands"),
            lit(r.toLong).as("rows_per_band"),
            expr(pTree("0.7", b, r)).as("p_at_07"),
            expr(pTree("0.3", b, r)).as("p_at_03"),
            col("n_buckets"),
            coalesce(col("max_bucket"), lit(0L)).as("max_bucket"),
            coalesce(col("pair_cost"), lit(0L)).as("pair_cost"))
      }.reduce(_ unionAll _)
      val w = Window.orderBy(
        expr("CASE WHEN p_at_07 >= 0.9 THEN 0 ELSE 1 END"),
        col("pair_cost"), desc("bands"))
      perConfig
        .withColumn("recommended", row_number().over(w) === 1)
        .orderBy(desc_nulls_last("bands"))
    }),

    // Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
    // — the MOSS algorithm): md5 k-gram hashes, each w-window's MINIMUM
    // selected, the distinct selections are the document's fingerprint
    // set. The winnowing guarantee: any shared token run of length
    // ≥ w + k − 1 between two documents shares at least one fingerprint
    // — so fingerprints are the sub-document near-dup/plagiarism index
    // where whole-doc MinHash is too coarse. Output: per doc, its
    // fingerprint count and how many of its fingerprints appear in ≥ 2
    // RAKE keyword extraction (Rose, Engel, Cramer & Cowley, "Automatic
    // keyword extraction from individual documents", 2010) — the
    // unsupervised keyphrase miner a curation pipeline runs to label
    // what a corpus is ABOUT: candidate phrases are maximal runs of
    // non-stopword tokens (stopwords = the corpus' own top-5 tokens,
    // derived deterministically — synthetic corpora have no external
    // stopword list), each word scores degree/frequency (degree = Σ of
    // containing-phrase lengths — co-occurrence favoring words that
    // live in long phrases), and a phrase scores the sum of its
    // members' scores. Exactness: word scores carry a 10⁶ scale with
    // truncating integer division (Spark DIV = DuckDB // on
    // non-negatives), so phrase scores are exact BIGINTs — no float
    // summation order anywhere. Top-20 phrases by (score, phrase).
    // Scale: tokenize+islands are narrow per-doc windows (doc-id
    // partitioned); word stats one slim hash-agg; the phrase-score
    // join is token-keyed with map-side combine.
    "q_text_rake" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(length(col("tok")) > 0)
      val stop = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(desc_nulls_last("n"), asc_nulls_last("tok")).limit(5)
        .select(col("tok").as("stok"))
      val content = toks
        .join(broadcast(stop), col("tok") === col("stok"), "left_anti")
      val wpos = Window.partitionBy("doc_id").orderBy("pos")
      val ph = content
        .withColumn("grp", col("pos") - row_number().over(wpos))
        .withColumn("plen", count(lit(1))
          .over(Window.partitionBy("doc_id", "grp")))
      val wstats = ph.groupBy("tok")
        .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
        .withColumn("wscore", expr("(deg * 1000000) DIV freq"))
      val phrases = ph.groupBy("doc_id", "grp")
        .agg(expr("array_join(transform(array_sort(" +
          "collect_list(struct(pos, tok))), x -> x.tok), ' ')")
          .as("phrase"),
          count(lit(1)).as("n_words"))
      val pscore = ph.join(wstats.select("tok", "wscore"), "tok")
        .groupBy("doc_id", "grp").agg(sum("wscore").as("score"))
      phrases.join(pscore, Seq("doc_id", "grp"))
        .groupBy("phrase")
        .agg(max("n_words").as("n_words"),
          count(lit(1)).as("n_occurrences"),
          max("score").as("score"))
        .orderBy(desc_nulls_last("score"), asc_nulls_last("phrase"))
        .limit(20)
        .orderBy(desc_nulls_last("score"), asc_nulls_last("phrase"))
    }),

    // documents (the copied-content signal). Scale: grams and window
    // minima are in-row folds (O(tokens · w)); the cross-doc half is one
    // slim (fp, doc) shuffle with partial aggregation — the md5 min is a
    // lexicographic string min, identical on both engines.
    "q_text_winnow" -> ((s, d) => {
      val (k, w) = (WinnowK, WinnowW)
      val base = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= k + w - 1)
        .withColumn("grams", expr(
          s"transform(sequence(0, size(toks) - $k), " +
            s"i -> md5(concat_ws(' ', slice(toks, i + 1, $k))))"))
        .withColumn("fps", expr(
          s"array_distinct(transform(sequence(0, size(grams) - $w), " +
            s"j -> array_min(slice(grams, j + 1, $w))))"))
        .select(col("doc_id"), col("fps"),
          size(col("fps")).cast("long").as("n_fps"))
        // consumed by both the explode and the final n_fps join
        .persistScoped()
      val fps = base.select(col("doc_id"), explode(col("fps")).as("fp"))
      val counts = fps.groupBy("fp")
        .agg(countDistinct(col("doc_id")).as("nd"))
      fps.join(counts, "fp")
        .groupBy("doc_id")
        .agg(count(when(col("nd") > 1, lit(1))).as("n_shared"))
        .join(base.select("doc_id", "n_fps"), "doc_id")
        .select(col("doc_id"), col("n_fps"), col("n_shared"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // PMI collocation mining: rank adjacent-token pairs by how much more
    // often they co-occur than their unigram frequencies predict — the
    // classic phrase detector (Church & Hanks 1990). The log is dropped
    // (not bit-portable, the q_text_lm_score precedent): the ranking key
    // is the monotone-equivalent exact integer
    // floor(n_ab·N·10⁶ / (n_a·n_b)) with both marginals read off the
    // bigram table itself (n_a = prefix total, n_b = suffix total), so
    // everything derives from ONE bigram count. BIGINT headroom: the
    // n_ab·N·10⁶ product stays under 2⁶³ while n_ab·N < 9.2×10¹²; a
    // corpus past that moves the same expression to DECIMAL(38,0)
    // unchanged. Scale: one corpus shuffle on the bigram key, two
    // windows over the vocab²-bounded count table, the grand total as a
    // 1-row broadcast (the q_text_docfreq shape), min-support n_ab ≥ 5
    // before the global top-50.
    "q_text_pmi" -> ((s, d) => {
      val bg = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> struct(toks[i] AS a, toks[i+1] AS b))")).as("p"))
        .select(col("p.a"), col("p.b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      val total = broadcast(bg.agg(sum("n_ab").as("n_total"))
        .withColumn("_one", lit(1)))
      bg.withColumn("n_a", sum("n_ab").over(Window.partitionBy("a")))
        .withColumn("n_b", sum("n_ab").over(Window.partitionBy("b")))
        .withColumn("_one", lit(1))
        .join(total, "_one")
        .filter(col("n_ab") >= 5)
        // operand-first DECIMAL(38,0) (r12 overflow sweep: n_ab·n_total
        // in BIGINT wraps once the corpus passes ~10⁹ bigrams with a
        // 10⁹-count pair — routine at 100 TB; the widened product peaks
        // at ~1e29 ≪ 1e38). The QUOTIENT stays BIGINT: it is
        // 1e6 × the PMI lift, which exceeds 9.2e18 only for a ≥5-count
        // bigram whose tokens never appear apart in a >4.6e13-bigram
        // corpus — a pathological token pair, not a statistic.
        .withColumn("pmi_scaled", expr(
          "CAST((CAST(n_ab AS DECIMAL(38,0)) " +
            "* CAST(n_total AS DECIMAL(38,0)) * 1000000) " +
            "DIV (CAST(n_a AS DECIMAL(38,0)) " +
            "* CAST(n_b AS DECIMAL(38,0))) AS BIGINT)"))
        .select("a", "b", "n_ab", "n_a", "n_b", "pmi_scaled")
        .orderBy(desc_nulls_last("pmi_scaled"),
          asc_nulls_last("a"), asc_nulls_last("b"))
        .limit(50)
    }),

    // Repetition scoring — the standard "degenerate text" gate of a
    // curation pipeline: duplicate-bigram ratio and the mode token's
    // count. Bigram stats are in-row array exprs; the mode count is one
    // (doc, token) shuffle + a max — both linear.
    "q_text_repetition" -> ((s, d) => {
      val base = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
      val inRow = base.select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double")
          / size(col("toks"))).as("distinct_ratio"),
        when(size(col("toks")) >= 2,
          lit(1.0) - expr(
            "CAST(size(array_distinct(transform(sequence(0, " +
              "size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1])))) " +
              "AS DOUBLE) / (size(toks) - 1)"))
          .otherwise(lit(0.0)).as("dup_bigram_ratio"))
      val top = base
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top_token_n"))
      inRow.join(top, "doc_id")
        .select("doc_id", "n_tokens", "top_token_n", "distinct_ratio",
          "dup_bigram_ratio")
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // PII redaction — the standard scrubbing pass of a training-data
    // pipeline. The corpus is synthetic, so a deterministic contact line
    // (email + phone derived from doc_id) is appended first; the
    // REDACTION is the real operator: regex patterns valid in both Java
    // regex and RE2, global replacement, match counting. Output carries
    // md5(redacted) so the oracle proves byte-identical redaction without
    // shipping full texts through the checker.
    "q_text_pii_redact" -> ((s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
      val phoneRe = "[0-9]{3}-[0-9]{4}"
      t(s, d, "documents")
        .withColumn("text2", concat(col("text"),
          lit(" Contact: user"), col("doc_id").cast("string"),
          lit("@mail.example (tel 555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit(")")))
        .select(col("doc_id"),
          size(regexp_extract_all(col("text2"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text2"), lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace(col("text2"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("redacted_md5"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Multimodal plumbing: opaque binary payload + typed metadata. The
    // "decode" is a deterministic fake (byte stats) — real image/audio
    // decode plugs into graft.operators.Multimodal without touching this
    // schema/partitioning contract.
    "q_multimodal_features" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
          md5(col("payload")).as("checksum"),
          col("lang"), col("source"))
        .orderBy(asc_nulls_last("doc_id")))
  )

  private def minhashOracle: String = {
    val sigCols = (0 until NumHashes)
      .map(i => s"${MinHash.sqlSig(i)} AS sig_$i").mkString(",\n    ")
    val bandCols = (0 until NumBands)
      .map(j => s"${MinHash.sqlBandKey(j, NumHashes / NumBands)} AS band_$j")
      .mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, unnest(generate_series(0, len(toks) - 3)) AS i, toks
       |  FROM t WHERE len(toks) >= 3
       |), sh AS (
       |  SELECT doc_id,
       |    ${MinHash.sqlHashVal(
             "md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])")} AS v
       |  FROM s
       |), m AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM sh GROUP BY doc_id
       |)
       |SELECT doc_id, ${(0 until NumHashes).map(i => s"sig_$i").mkString(", ")},
       |  $bandCols
       |FROM m ORDER BY doc_id ASC NULLS LAST""".stripMargin
  }

  /** Mirror of [[TextDedup.nearDuplicates]] with the default parameters
    * (8 hashes, 4 bands of 2, threshold 0.7) — same md5 signature/band
    * math as [[minhashOracle]], then the band-bucket pair join and exact
    * token-set Jaccard verify. */
  /** The q_dedup_pairs oracle WITHOUT its final ORDER BY, reusable as a
    * parenthesized subquery (e.g. the edge source of the
    * [[Corpus]] q_dedup_clusters oracle). */
  def dedupPairsSubquery: String =
    dedupPairsSubquery("documents", threshold = true)

  /** Checked oracle-text substitution: a silent no-op replace would
    * produce a subtly WRONG oracle instead of a build error if the
    * helper text ever drifts (ADVICE r7), so the caller's intent to
    * change something is asserted. */
  private[operators] def subst(base: String, from: String,
      to: String): String = {
    val out = base.replace(from, to)
    require(out != base,
      s"oracle substitution no-op: '$from' not present in base text")
    out
  }

  /** Parameterized form — `source` is the relation the pipeline grams
    * (the curation oracles probe their post-gate `kept` CTE);
    * `threshold = false` omits the final jaccard cut
    * (q_dedup_threshold_curve scores ALL verified candidates). The
    * parameters replace the string-replace surgery the composed oracles
    * previously performed on this text (ADVICE r7: a drifted helper
    * would have made the replace a silent no-op). */
  def dedupPairsSubquery(source: String, threshold: Boolean): String = {
    val sigCols = (0 until NumHashes)
      .map(i => s"${MinHash.sqlSig(i)} AS sig_$i").mkString(",\n    ")
    val bandList = (0 until NumBands)
      .map(j => MinHash.sqlBandKey(j, NumHashes / NumBands))
      .mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id AS id, string_split(text, ' ') AS toks
       |  FROM $source WHERE len(string_split(text, ' ')) >= 3
       |), s AS (
       |  SELECT id, unnest(generate_series(0, len(toks) - 3)) AS i, toks
       |  FROM t
       |), sh AS (
       |  SELECT id, ${MinHash.sqlHashVal(
             "md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])")}
       |    AS v FROM s
       |), m AS (
       |  SELECT id,
       |    $sigCols
       |  FROM sh GROUP BY id
       |), banded AS (
       |  SELECT id, unnest([$bandList]) AS band FROM m
       |), cand AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.id < y.id
       |), j AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_distinct(list_intersect(a.toks, b.toks)))
       |      AS DOUBLE) / len(list_distinct(a.toks || b.toks)) AS jaccard
       |  FROM cand c JOIN t a ON a.id = c.id_a JOIN t b ON b.id = c.id_b
       |)
       |SELECT id_a, id_b, jaccard FROM j${
         if (threshold) " WHERE jaccard >= 0.7" else ""}""".stripMargin
  }

  private def dedupPairsOracle: String =
    dedupPairsSubquery +
      "\nORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST"

  /** Per-config candidate/verified counts over ONE signature CTE: each
    * UNION branch re-bands the same `m` at its (bands, rows) geometry. */
  private def bandsCurveOracle: String = {
    val sigCols = (0 until NumHashes)
      .map(i => s"${MinHash.sqlSig(i)} AS sig_$i").mkString(",\n    ")
    def configSel(b: Int): String = {
      val rows = NumHashes / b
      val bandList = (0 until b).map(j => MinHash.sqlBandKey(j, rows))
        .mkString(", ")
      s"""SELECT CAST($b AS BIGINT) AS bands,
         |  CAST($rows AS BIGINT) AS rows_per_band,
         |  COUNT(*) AS n_candidates,
         |  CAST(COUNT(CASE WHEN jaccard >= 0.7 THEN 1 END) AS BIGINT)
         |    AS n_verified
         |FROM (
         |  SELECT c.id_a, c.id_b,
         |    CAST(len(list_distinct(list_intersect(a.toks, b2.toks)))
         |      AS DOUBLE) / len(list_distinct(a.toks || b2.toks)) AS jaccard
         |  FROM (
         |    SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |    FROM (SELECT id, unnest([$bandList]) AS band FROM m) x
         |    JOIN (SELECT id, unnest([$bandList]) AS band FROM m) y
         |      ON x.band = y.band AND x.id < y.id
         |  ) c JOIN t a ON a.id = c.id_a JOIN t b2 ON b2.id = c.id_b
         |)""".stripMargin
    }
    s"""WITH t AS (
       |  SELECT doc_id AS id, string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3
       |), s AS (
       |  SELECT id, unnest(generate_series(0, len(toks) - 3)) AS i, toks
       |  FROM t
       |), sh AS (
       |  SELECT id, ${MinHash.sqlHashVal(
             "md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])")}
       |    AS v FROM s
       |), m AS (
       |  SELECT id,
       |    $sigCols
       |  FROM sh GROUP BY id
       |)
       |${configSel(8)}
       |UNION ALL
       |${configSel(4)}
       |UNION ALL
       |${configSel(2)}
       |ORDER BY bands DESC NULLS LAST""".stripMargin
  }

  /** Tuner oracle: the bands-curve signature CTEs, but each config
    * contributes its BUCKET histogram (no pair expansion) plus the
    * literal collision-model trees; the recommendation is the same
    * rank over identical doubles. */
  private def lshTuneOracle: String = {
    val sigCols = (0 until NumHashes)
      .map(i => s"${MinHash.sqlSig(i)} AS sig_$i").mkString(",\n    ")
    def pTree(j: String, b: Int, r: Int): String =
      s"CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE) - " +
        s"pow(CAST($j AS DOUBLE), CAST($r AS DOUBLE)), " +
        s"CAST($b AS DOUBLE))"
    def configSel(b: Int): String = {
      val rows = NumHashes / b
      val bandList = (0 until b).map(j => MinHash.sqlBandKey(j, rows))
        .mkString(", ")
      s"""SELECT CAST($b AS BIGINT) AS bands,
         |  CAST($rows AS BIGINT) AS rows_per_band,
         |  ${pTree("0.7", b, rows)} AS p_at_07,
         |  ${pTree("0.3", b, rows)} AS p_at_03,
         |  COUNT(*) AS n_buckets,
         |  COALESCE(CAST(MAX(sz) AS BIGINT), 0) AS max_bucket,
         |  COALESCE(CAST(SUM(sz * (sz - 1) // 2) AS BIGINT), 0)
         |    AS pair_cost
         |FROM (
         |  SELECT band, COUNT(*) AS sz
         |  FROM (SELECT id, unnest([$bandList]) AS band FROM m)
         |  GROUP BY band
         |) WHERE sz >= 2""".stripMargin
    }
    s"""WITH t AS (
       |  SELECT doc_id AS id, string_split(text, ' ') AS toks
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3
       |), s AS (
       |  SELECT id, unnest(generate_series(0, len(toks) - 3)) AS i, toks
       |  FROM t
       |), sh AS (
       |  SELECT id, ${MinHash.sqlHashVal(
             "md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])")}
       |    AS v FROM s
       |), m AS (
       |  SELECT id,
       |    $sigCols
       |  FROM sh GROUP BY id
       |), cfg AS (
       |${configSel(8)}
       |UNION ALL
       |${configSel(4)}
       |UNION ALL
       |${configSel(2)}
       |)
       |SELECT bands, rows_per_band, p_at_07, p_at_03, n_buckets,
       |  max_bucket, pair_cost,
       |  (row_number() OVER (ORDER BY
       |    CASE WHEN p_at_07 >= 0.9 THEN 0 ELSE 1 END ASC,
       |    pair_cost ASC, bands DESC)) = 1 AS recommended
       |FROM cfg
       |ORDER BY bands DESC NULLS LAST""".stripMargin
  }

  /** Estimator-accuracy oracle: the SAME CTE chain, re-joined to the
    * signature CTE `m` for the per-pair matching-signature count. */
  private def minhashEstOracle: String = {
    val matchSum = (0 until NumHashes)
      .map(i => s"CASE WHEN ma.sig_$i = mb.sig_$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    subst(dedupPairsSubquery,
      "SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.7",
      s"""SELECT j.id_a, j.id_b, j.jaccard,
         |  CAST($matchSum AS BIGINT) AS matches,
         |  CAST($matchSum AS DOUBLE) / $NumHashes AS est_jaccard
         |FROM j
         |JOIN m ma ON ma.id = j.id_a
         |JOIN m mb ON mb.id = j.id_b
         |WHERE j.jaccard >= 0.7
         |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin)
  }

  private def langidOracle: String = {
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($list))) AS BIGINT) AS s_$lang"
    }.mkString(",\n    ")
    s"""WITH sc AS (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM documents
       |)
       |SELECT doc_id, lang, $langCase AS pred_lang,
       |  s_de, s_en, s_es, s_fr, s_zh
       |FROM sc ORDER BY doc_id ASC NULLS LAST""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // The langid oracle wrapped as a CTE, then the same rollup.
    "q_lang_confusion" ->
      s"""WITH li AS (
         |${langidOracle.linesIterator.map("  " + _).mkString("\n")}
         |), c AS (
         |  SELECT lang, pred_lang, COUNT(*) AS n_docs
         |  FROM li GROUP BY lang, pred_lang
         |)
         |SELECT lang, pred_lang, n_docs,
         |  CAST(n_docs AS DOUBLE)
         |    / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
         |    AS share,
         |  lang = pred_lang AS correct
         |FROM c
         |ORDER BY lang ASC NULLS LAST, pred_lang ASC NULLS LAST"""
        .stripMargin,

    "q_text_hapax" ->
      """WITH tc AS (
        |  SELECT source, tok, COUNT(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents WHERE text IS NOT NULL
        |  ) WHERE length(tok) > 0
        |  GROUP BY source, tok
        |)
        |SELECT source, COUNT(*) AS vocab,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hapax,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS DOUBLE) / COUNT(*) AS hapax_rate
        |FROM tc GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin,

    "q_text_tokenize" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |) WHERE length(token) > 0
        |GROUP BY token
        |ORDER BY cnt DESC NULLS LAST, token ASC NULLS LAST
        |LIMIT 20""".stripMargin,

    "q_dedup_bucket_skew" -> {
      val sigCols = (0 until NumHashes)
        .map(i => s"${MinHash.sqlSig(i)} AS sig_$i").mkString(",\n    ")
      val bandList = (0 until NumBands)
        .map(j => MinHash.sqlBandKey(j, NumHashes / NumBands))
        .mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id AS id, string_split(text, ' ') AS toks
         |  FROM documents WHERE len(string_split(text, ' ')) >= 3
         |), s AS (
         |  SELECT id, unnest(generate_series(0, len(toks) - 3)) AS i, toks
         |  FROM t
         |), sh AS (
         |  SELECT id, ${MinHash.sqlHashVal(
               "md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])")}
         |    AS v FROM s
         |), m AS (
         |  SELECT id,
         |    $sigCols
         |  FROM sh GROUP BY id
         |), banded AS (
         |  SELECT id, unnest([$bandList]) AS bkey FROM m
         |), sizes AS (
         |  SELECT bkey, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM banded GROUP BY bkey
         |)
         |SELECT sz AS bucket_size, CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(COUNT(*) * sz * (sz - 1) // 2 AS BIGINT)
         |    AS n_candidate_pairs
         |FROM sizes GROUP BY sz
         |ORDER BY bucket_size ASC NULLS LAST""".stripMargin
    },

    "q_source_dup_rate" ->
      s"""WITH pairs AS (
         |${dedupPairsSubquery.linesIterator.map("  " + _).mkString("\n")}
         |), members AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT id_a AS doc_id FROM pairs
         |    UNION ALL SELECT id_b FROM pairs)
         |)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(m.doc_id) AS BIGINT) AS n_dup_members,
         |  CAST(COUNT(m.doc_id) AS DOUBLE) / COUNT(*) AS dup_rate
         |FROM documents d LEFT JOIN members m ON d.doc_id = m.doc_id
         |GROUP BY d.source
         |ORDER BY d.source ASC NULLS LAST""".stripMargin,

    "q_dsir_weight" ->
      """WITH bg AS (
        |  SELECT doc_id, toks[i+1] AS a, toks[i+2] AS b FROM (
        |    SELECT doc_id, toks,
        |      unnest(generate_series(0, len(toks) - 2)) AS i
        |    FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |          FROM documents)
        |    WHERE len(toks) >= 2)
        |), praw AS (
        |  SELECT a, b,
        |    (COUNT(*) * CAST(1000000 AS BIGINT))
        |      // CAST(SUM(COUNT(*)) OVER (PARTITION BY a) AS BIGINT)
        |      AS p_raw
        |  FROM bg GROUP BY a, b
        |), ptgt AS (
        |  SELECT a, b,
        |    (COUNT(*) * CAST(1000000 AS BIGINT))
        |      // CAST(SUM(COUNT(*)) OVER (PARTITION BY a) AS BIGINT)
        |      AS p_tgt
        |  FROM bg WHERE doc_id % 5 = 0 GROUP BY a, b
        |)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(COALESCE(g.p_tgt, 0)) AS BIGINT) AS tgt_sum,
        |  CAST(SUM(r.p_raw) AS BIGINT) AS raw_sum,
        |  CAST(SUM(COALESCE(g.p_tgt, 0)) - SUM(r.p_raw) AS DOUBLE)
        |    / (COUNT(*) * 1000000.0) AS dsir_score
        |FROM bg t
        |JOIN praw r ON t.a = r.a AND t.b = r.b
        |LEFT JOIN ptgt g ON t.a = g.a AND t.b = g.b
        |WHERE t.doc_id % 5 <> 0
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id ASC NULLS LAST""".stripMargin,

    "q_dedup_incremental" ->
      s"""WITH pairs AS (
         |${dedupPairsSubquery.linesIterator.map("  " + _).mkString("\n")}
         |)
         |SELECT id_a, id_b, jaccard FROM pairs
         |WHERE id_a % 7 = 0 OR id_b % 7 = 0
         |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin,

    "q_dedup_threshold_curve" ->
      s"""WITH pairs AS (
         |${dedupPairsSubquery("documents", threshold = false)
             .linesIterator.map("  " + _).mkString("\n")}
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |  CAST(COUNT(CASE WHEN jaccard >= 0.5 THEN 1 END) AS BIGINT)
         |    AS n_ge_05,
         |  CAST(COUNT(CASE WHEN jaccard >= 0.6 THEN 1 END) AS BIGINT)
         |    AS n_ge_06,
         |  CAST(COUNT(CASE WHEN jaccard >= 0.7 THEN 1 END) AS BIGINT)
         |    AS n_ge_07,
         |  CAST(COUNT(CASE WHEN jaccard >= 0.8 THEN 1 END) AS BIGINT)
         |    AS n_ge_08,
         |  CAST(COUNT(CASE WHEN jaccard >= 0.9 THEN 1 END) AS BIGINT)
         |    AS n_ge_09
         |FROM pairs""".stripMargin,

    "q_bpe_merges" ->
      """WITH w AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |    WHERE text IS NOT NULL
        |  ) WHERE length(w) > 0 GROUP BY w
        |), p1 AS (
        |  SELECT pair, CAST(SUM(n) AS BIGINT) AS freq FROM (
        |    SELECT n, unnest(list_transform(range(1, length(w)),
        |      i -> substring(w, i, 1) || ' ' || substring(w, i + 1, 1)))
        |      AS pair
        |    FROM w) GROUP BY pair
        |), top1 AS (
        |  SELECT pair AS mp FROM p1
        |  ORDER BY freq DESC NULLS LAST, pair ASC NULLS LAST LIMIT 1
        |), s2 AS (
        |  SELECT n, string_split(trim(replace(
        |      ' ' || array_to_string(list_transform(range(1, length(w) + 1),
        |        i -> substring(w, i, 1)), '  ') || ' ',
        |      ' ' || replace(mp, ' ', '  ') || ' ',
        |      ' ' || replace(mp, ' ', '') || ' ')), '  ') AS syms
        |  FROM w, top1
        |), p2 AS (
        |  SELECT pair, CAST(SUM(n) AS BIGINT) AS freq FROM (
        |    SELECT n, unnest(list_transform(range(1, len(syms)),
        |      i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |    FROM s2) GROUP BY pair
        |)
        |SELECT iter, pair, freq FROM (
        |  SELECT CAST(1 AS BIGINT) AS iter, pair, freq FROM
        |    (SELECT pair, freq FROM p1
        |     ORDER BY freq DESC NULLS LAST, pair ASC NULLS LAST LIMIT 10)
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT) AS iter, pair, freq FROM
        |    (SELECT pair, freq FROM p2
        |     ORDER BY freq DESC NULLS LAST, pair ASC NULLS LAST LIMIT 10)
        |)
        |ORDER BY iter ASC NULLS LAST, freq DESC NULLS LAST,
        |  pair ASC NULLS LAST""".stripMargin,

    // The q_bpe_merges learning CTEs verbatim, a second top-1, then
    // the same two nested replaces over the (source, word) frame.
    "q_bpe_encode" ->
      """WITH w AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |    WHERE text IS NOT NULL
        |  ) WHERE length(w) > 0 GROUP BY w
        |), p1 AS (
        |  SELECT pair, CAST(SUM(n) AS BIGINT) AS freq FROM (
        |    SELECT n, unnest(list_transform(range(1, length(w)),
        |      i -> substring(w, i, 1) || ' ' || substring(w, i + 1, 1)))
        |      AS pair
        |    FROM w) GROUP BY pair
        |), top1 AS (
        |  SELECT pair AS mp1 FROM p1
        |  ORDER BY freq DESC NULLS LAST, pair ASC NULLS LAST LIMIT 1
        |), s2 AS (
        |  SELECT n, string_split(trim(replace(
        |      ' ' || array_to_string(list_transform(range(1, length(w) + 1),
        |        i -> substring(w, i, 1)), '  ') || ' ',
        |      ' ' || replace(mp1, ' ', '  ') || ' ',
        |      ' ' || replace(mp1, ' ', '') || ' ')), '  ') AS syms
        |  FROM w, top1
        |), p2 AS (
        |  SELECT pair, CAST(SUM(n) AS BIGINT) AS freq FROM (
        |    SELECT n, unnest(list_transform(range(1, len(syms)),
        |      i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |    FROM s2) GROUP BY pair
        |), top2 AS (
        |  SELECT pair AS mp2 FROM p2
        |  ORDER BY freq DESC NULLS LAST, pair ASC NULLS LAST LIMIT 1
        |), ws AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE text IS NOT NULL
        |  ) WHERE length(w) > 0 GROUP BY source, w
        |), e1 AS (
        |  SELECT source, n, w, mp1, mp2,
        |    replace(replace(
        |      ' ' || array_to_string(list_transform(range(1, length(w) + 1),
        |        i -> substring(w, i, 1)), '  ') || ' ',
        |      ' ' || replace(mp1, ' ', '  ') || ' ',
        |      ' ' || replace(mp1, ' ', '') || ' '),
        |      ' ' || replace(mp2, ' ', '  ') || ' ',
        |      ' ' || replace(mp2, ' ', '') || ' ') AS sp2
        |  FROM ws, top1, top2
        |)
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n * length(w)) AS BIGINT) AS n_chars_sym,
        |  CAST(SUM(n * len(string_split(trim(sp2), '  '))) AS BIGINT)
        |    AS n_syms_after,
        |  MAX(mp1) AS merge_1, MAX(mp2) AS merge_2,
        |  CAST(CAST(SUM(n * len(string_split(trim(sp2), '  ')))
        |    AS BIGINT) AS DOUBLE)
        |    / CAST(SUM(n * length(w)) AS BIGINT) AS compression
        |FROM e1 GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin,

    "q_source_token_shift" ->
      """WITH tk AS (
        |  SELECT source, token FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token
        |    FROM documents WHERE text IS NOT NULL
        |  ) WHERE length(token) > 0
        |), corp AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt_c
        |  FROM tk GROUP BY token
        |), nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_c FROM tk),
        |ns AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        |  FROM tk GROUP BY source
        |), cs AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt_s
        |  FROM tk GROUP BY source, token
        |), grid AS (
        |  SELECT s.source, c.token, c.cnt_c FROM corp c
        |  CROSS JOIN (SELECT DISTINCT source FROM tk) s
        |)
        |SELECT g.source, MAX(ns.n_s) AS n_tokens,
        |  CAST(SUM(abs(COALESCE(cs.cnt_s, 0) * nc.n_c
        |    - g.cnt_c * ns.n_s)) AS BIGINT) AS tv_num,
        |  CAST(SUM(abs(COALESCE(cs.cnt_s, 0) * nc.n_c
        |    - g.cnt_c * ns.n_s)) AS DOUBLE)
        |    / (2.0 * MAX(ns.n_s) * MAX(nc.n_c)) AS tv_dist
        |FROM grid g
        |LEFT JOIN cs ON g.source = cs.source AND g.token = cs.token
        |JOIN ns ON g.source = ns.source
        |CROSS JOIN nc
        |GROUP BY g.source
        |ORDER BY g.source ASC NULLS LAST""".stripMargin,

    // Same split convention; the train set is the DISTINCT train-gram
    // sliver, the probe a LEFT JOIN, counts exact integers.
    "q_text_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM documents
        |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 3
        |), e AS (
        |  SELECT doc_id, source, toks,
        |    unnest(generate_series(0, len(toks) - 3)) AS i
        |  FROM t
        |), g AS (
        |  SELECT DISTINCT doc_id, source,
        |    toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS gram
        |  FROM e
        |), tr AS (
        |  SELECT DISTINCT gram FROM g WHERE doc_id % 10 <> 7
        |), te AS (
        |  SELECT doc_id, source, gram FROM g WHERE doc_id % 10 = 7
        |)
        |SELECT te.doc_id, te.source, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN tr.gram IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(CAST(SUM(CASE WHEN tr.gram IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) / COUNT(*) AS novelty
        |FROM te LEFT JOIN tr ON te.gram = tr.gram
        |GROUP BY te.doc_id, te.source
        |ORDER BY te.doc_id ASC NULLS LAST""".stripMargin,

    // The four gate CTEs mirror the composed builders (langid CTE,
    // gopher pass-list via LEFT JOIN null-probe, md5-window dup,
    // quality score with identical association), then the same
    // first-failed CASE.
    "q_quality_cascade" ->
      s"""WITH li AS (
         |${langidOracle.linesIterator.map("  " + _).mkString("\n")}
         |), gp AS (
         |${Quality.gopherPassSubquery.linesIterator
             .map("  " + _).mkString("\n")}
         |), dp AS (
         |  SELECT doc_id,
         |    doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
         |      AS g_dup
         |  FROM documents WHERE text IS NOT NULL
         |), ql AS (
         |  SELECT doc_id,
         |    NOT ((CAST(len(list_distinct(string_split(text, ' ')))
         |        AS DOUBLE)
         |      / CAST(len(string_split(text, ' ')) AS BIGINT))
         |      * (CAST(least(CAST(len(string_split(text, ' '))
         |          AS BIGINT), 100) AS DOUBLE) / 100) > 0.3)
         |      AS g_quality
         |  FROM documents WHERE text IS NOT NULL
         |), m AS (
         |  SELECT li.doc_id,
         |    li.pred_lang <> li.lang AS g_lang,
         |    gp.doc_id IS NULL AS g_gopher,
         |    dp.g_dup, ql.g_quality
         |  FROM li
         |  LEFT JOIN gp ON li.doc_id = gp.doc_id
         |  JOIN dp ON li.doc_id = dp.doc_id
         |  JOIN ql ON li.doc_id = ql.doc_id
         |), f AS (
         |  SELECT doc_id, g_lang, g_gopher, g_dup, g_quality,
         |    CASE WHEN g_lang THEN 'lang'
         |      WHEN g_gopher THEN 'gopher'
         |      WHEN g_dup THEN 'exact_dup'
         |      WHEN g_quality THEN 'quality'
         |      ELSE 'kept' END AS first_failed
         |  FROM m
         |)
         |SELECT doc_id, g_lang, g_gopher, g_dup, g_quality,
         |  first_failed, first_failed = 'kept' AS kept
         |FROM f ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // The isqrt correction mirrors the Spark CASE exactly; window
    // totals replace the constant-key broadcast (oracle SQL is not
    // plan-gated).
    "q_source_mix_sqrt" ->
      """WITH c AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE text IS NOT NULL
        |  GROUP BY source
        |), s AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0
        |  FROM c
        |), q AS (
        |  SELECT source, n_tokens,
        |    CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1
        |      WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END
        |      AS isqrt_tokens
        |  FROM s
        |)
        |SELECT source, n_tokens, isqrt_tokens,
        |  CAST(n_tokens AS DOUBLE)
        |    / CAST(SUM(n_tokens) OVER () AS BIGINT) AS w_raw,
        |  CAST(isqrt_tokens AS DOUBLE)
        |    / CAST(SUM(isqrt_tokens) OVER () AS BIGINT) AS w_sqrt
        |FROM q
        |ORDER BY source ASC NULLS LAST""".stripMargin,

    // HUGEINT is DuckDB's 128-bit lane (the DECIMAL(38,0) twin);
    // floor-div and mod on non-negative operands equal Spark's
    // integral DIV / subtract-multiply remainder.
    "q_source_budget" ->
      """WITH c AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE text IS NOT NULL
        |  GROUP BY source
        |), t AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM c
        |), b AS (
        |  SELECT source, n_tokens,
        |    CAST((CAST(1000000 AS HUGEINT) * n_tokens) // tot
        |      AS BIGINT) AS base,
        |    CAST((CAST(1000000 AS HUGEINT) * n_tokens) % tot
        |      AS BIGINT) AS rem
        |  FROM c, t
        |), e AS (
        |  SELECT 1000000 - CAST(SUM(base) AS BIGINT) AS n_extra FROM b
        |), r AS (
        |  SELECT source, n_tokens, base, rem,
        |    row_number() OVER (
        |      ORDER BY rem DESC NULLS LAST, source ASC NULLS LAST)
        |      AS rk
        |  FROM b
        |)
        |SELECT source, n_tokens, base, rem,
        |  base + CASE WHEN rk <= e.n_extra THEN 1 ELSE 0 END AS alloc
        |FROM r, e
        |ORDER BY source ASC NULLS LAST""".stripMargin,

    "q_vocab_coverage" ->
      """WITH f AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token
        |    FROM documents WHERE text IS NOT NULL
        |  ) WHERE length(token) > 0 GROUP BY token
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(cnt) AS BIGINT) AS n_occurrences FROM f
        |), t100 AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS occ_top100 FROM (
        |    SELECT cnt FROM f
        |    ORDER BY cnt DESC NULLS LAST, token ASC NULLS LAST LIMIT 100)
        |), t1000 AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS occ_top1000 FROM (
        |    SELECT cnt FROM f
        |    ORDER BY cnt DESC NULLS LAST, token ASC NULLS LAST LIMIT 1000)
        |)
        |SELECT n_types, n_occurrences, occ_top100, occ_top1000,
        |  CAST(occ_top100 AS DOUBLE) / n_occurrences AS cov_top100,
        |  CAST(occ_top1000 AS DOUBLE) / n_occurrences AS cov_top1000
        |FROM tot, t100, t1000""".stripMargin,

    "q_vocab_growth" ->
      """WITH tk AS (
        |  SELECT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents WHERE text IS NOT NULL
        |  ) WHERE length(token) > 0
        |), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |occ AS (
        |  SELECT least(9, (doc_id * 10) // n_docs) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |  FROM tk, nd GROUP BY 1
        |), fst AS (
        |  SELECT least(9, (fd * 10) // n_docs) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_new_types
        |  FROM (SELECT token, min(doc_id) AS fd FROM tk GROUP BY token), nd
        |  GROUP BY 1
        |)
        |SELECT o.bucket, o.n_occurrences,
        |  CAST(COALESCE(f.n_new_types, 0) AS BIGINT) AS n_new_types,
        |  CAST(COALESCE(f.n_new_types, 0) AS DOUBLE) / o.n_occurrences
        |    AS novelty_rate
        |FROM occ o LEFT JOIN fst f ON o.bucket = f.bucket
        |ORDER BY o.bucket ASC NULLS LAST""".stripMargin,

    // Same bigram extraction as the q_text_bigram_prob oracle; the two
    // portable-log2 chains ride DuckDB's lateral column aliases
    // (Det.sqlPlog2Cols), and the final mean repeats Spark's division
    // text exactly.
    "q_text_perplexity" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE text IS NOT NULL
         |    AND len(string_split(text, ' ')) >= 2
         |), x AS (
         |  SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i FROM tk
         |), bgf AS (
         |  SELECT doc_id, toks[i+1] AS a, toks[i+2] AS b FROM x
         |), cab AS (
         |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab
         |  FROM bgf WHERE doc_id % 5 <> 0 GROUP BY a, b
         |), ca AS (
         |  SELECT a, CAST(SUM(cab) AS BIGINT) AS ca FROM cab GROUP BY a
         |), vb AS (
         |  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM (
         |    SELECT unnest(toks) AS tok FROM tk WHERE doc_id % 5 <> 0)
         |), ev AS (
         |  SELECT e.doc_id,
         |    COALESCE(c.cab, 0) + 1 AS num,
         |    COALESCE(a2.ca, 0) + vb.v AS den
         |  FROM bgf e
         |  LEFT JOIN cab c ON e.a = c.a AND e.b = c.b
         |  LEFT JOIN ca a2 ON e.a = a2.a, vb
         |  WHERE e.doc_id % 5 = 0
         |), lg AS (
         |  SELECT doc_id, ${graft.Det.sqlPlog2Cols("num", "n_")},
         |    ${graft.Det.sqlPlog2Cols("den", "d_")}
         |  FROM ev
         |), q AS (
         |  SELECT doc_id,
         |    CAST(floor((d_l2 - n_l2) * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM lg
         |), agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(q) AS BIGINT) AS sq
         |  FROM q GROUP BY doc_id
         |)
         |SELECT doc_id, n_bigrams,
         |  CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE)
         |    / CAST(n_bigrams AS DOUBLE) AS cross_entropy
         |FROM agg ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // Same KN rationals in HUGEINT, same string-slice downshift (first
    // 18 digits = floor(num/10^sh) on both engines), same three log2
    // chains and the identical sh·log2(10) restore literal.
    "q_text_lm_kn" ->
      s"""WITH tk AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS toks
         |  FROM documents
         |  WHERE text IS NOT NULL
         |    AND len(string_split(text, ' ')) >= 2
         |), x AS (
         |  SELECT doc_id, source, toks,
         |    unnest(range(len(toks) - 1)) AS i FROM tk
         |), bgf AS (
         |  SELECT doc_id, source, toks[i+1] AS a, toks[i+2] AS b FROM x
         |), cab AS (
         |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab
         |  FROM bgf WHERE doc_id % 5 <> 0 GROUP BY a, b
         |), cx AS (
         |  SELECT a, CAST(SUM(cab) AS BIGINT) AS ca,
         |    CAST(COUNT(*) AS BIGINT) AS n1a FROM cab GROUP BY a
         |), cw AS (
         |  SELECT b, CAST(COUNT(*) AS BIGINT) AS n1b FROM cab GROUP BY b
         |), tot AS (
         |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cab)
         |    + (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM (
         |        SELECT unnest(toks) AS tok FROM tk
         |        WHERE doc_id % 5 <> 0))
         |    + 1 AS bv
         |), ev AS (
         |  SELECT e.source, cx.ca IS NOT NULL AS seen,
         |    CASE WHEN cx.ca IS NOT NULL THEN
         |      CAST(greatest(0, COALESCE(c.cab, 0) * 4 - 3) AS HUGEINT)
         |        * tot.bv
         |      + CAST(3 AS HUGEINT) * cx.n1a * (COALESCE(cw.n1b, 0) + 1)
         |    ELSE CAST(COALESCE(cw.n1b, 0) + 1 AS HUGEINT) END AS numd,
         |    CASE WHEN cx.ca IS NOT NULL THEN cx.ca * 4 ELSE 1 END
         |      AS denf1,
         |    tot.bv AS bv
         |  FROM bgf e
         |  LEFT JOIN cab c ON e.a = c.a AND e.b = c.b
         |  LEFT JOIN cx ON e.a = cx.a
         |  LEFT JOIN cw ON e.b = cw.b, tot
         |  WHERE e.doc_id % 5 = 0
         |), shv AS (
         |  SELECT source, seen, denf1, bv,
         |    CAST(greatest(0, length(CAST(numd AS VARCHAR)) - 18)
         |      AS BIGINT) AS sh,
         |    CAST(substring(CAST(numd AS VARCHAR), 1, 18) AS BIGINT)
         |      AS num18
         |  FROM ev
         |), lg AS (
         |  SELECT source, seen, sh,
         |    ${graft.Det.sqlPlog2Cols("denf1", "e_")},
         |    ${graft.Det.sqlPlog2Cols("bv", "f_")},
         |    ${graft.Det.sqlPlog2Cols("num18", "g_")}
         |  FROM shv
         |), q AS (
         |  SELECT source, seen,
         |    CAST(floor((e_l2 + f_l2 - g_l2
         |      - CAST(sh AS DOUBLE) * CAST(3.321928094887362 AS DOUBLE))
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM lg
         |), agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(CASE WHEN seen THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_backoff,
         |    CAST(SUM(q) AS BIGINT) AS sq
         |  FROM q GROUP BY source
         |)
         |SELECT source, n_bigrams, n_backoff,
         |  CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE)
         |    / CAST(n_bigrams AS DOUBLE) AS kn_bits,
         |  CAST(n_backoff AS DOUBLE) / n_bigrams AS backoff_rate
         |FROM agg ORDER BY source ASC NULLS LAST""".stripMargin,

    // Mirrors the bit-portable log2 chain step for step: same exact
    // binary exponent, same shifted power of two (<< here, shiftleft on
    // the Spark side — the VALUE is the same exact integer), and the
    // IDENTICAL series/assembly text from graft.Det, so every double is
    // bit-equal by construction.
    "q_text_entropy" ->
      s"""WITH tc AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL
         |), c AS (
         |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tc GROUP BY doc_id, tok
         |), l AS (
         |  SELECT doc_id, c, ${graft.Det.log2Exp("c")} AS e2 FROM c
         |), m AS (
         |  SELECT doc_id, c, e2, ${graft.Det.sqlMantissa("c", "e2")} AS mm
         |  FROM l
         |), z AS (
         |  SELECT doc_id, c, e2, mm, ${graft.Det.zOfM("mm")} AS zz FROM m
         |), lq AS (
         |  SELECT doc_id, c,
         |    CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")} AS l2
         |  FROM z
         |), q AS (
         |  SELECT doc_id, c,
         |    CAST(floor(CAST(c AS DOUBLE) * l2
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM lq
         |), agg AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_types,
         |    CAST(SUM(q) AS BIGINT) AS sq
         |  FROM q GROUP BY doc_id
         |), l2n AS (
         |  SELECT *, ${graft.Det.log2Exp("n_tokens")} AS e2 FROM agg
         |), m2n AS (
         |  SELECT *, ${graft.Det.sqlMantissa("n_tokens", "e2")} AS mm
         |  FROM l2n
         |), z2n AS (
         |  SELECT *, ${graft.Det.zOfM("mm")} AS zz FROM m2n
         |)
         |SELECT doc_id, n_tokens, n_types,
         |  CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")}
         |    - CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE)
         |    / CAST(n_tokens AS DOUBLE) AS entropy
         |FROM z2n ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // Same portable-log2 chain over the top-100 frame; ranks come from
    // the identical (freq DESC, token ASC) order, and the fit assembles
    // the shared zipfFitExprs text over the exact grid moments.
    "q_text_zipf" ->
      s"""WITH tf AS (
         |  SELECT unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL
         |), c AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tf GROUP BY tok
         |), top AS (
         |  SELECT tok, c FROM c ORDER BY c DESC, tok ASC LIMIT 100
         |), r AS (
         |  SELECT CAST(row_number() OVER (ORDER BY c DESC, tok ASC)
         |    AS BIGINT) AS rank, c
         |  FROM top
         |), lg AS (
         |  SELECT rank, c, ${graft.Det.log2Exp("rank")} AS er,
         |    ${graft.Det.log2Exp("c")} AS ec
         |  FROM r
         |), mm AS (
         |  SELECT rank, c, er, ec,
         |    ${graft.Det.sqlMantissa("rank", "er")} AS mr,
         |    ${graft.Det.sqlMantissa("c", "ec")} AS mc
         |  FROM lg
         |), zz AS (
         |  SELECT er, ec, ${graft.Det.zOfM("mr")} AS zr,
         |    ${graft.Det.zOfM("mc")} AS zc
         |  FROM mm
         |), xy AS (
         |  SELECT CAST(er AS DOUBLE) + ${graft.Det.plog2Series("zr")} AS x,
         |    CAST(ec AS DOUBLE) + ${graft.Det.plog2Series("zc")} AS y
         |  FROM zz
         |), qq AS (
         |  SELECT
         |    CAST(floor(x * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qx,
         |    CAST(floor(y * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qy,
         |    CAST(floor(x * y * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qxy,
         |    CAST(floor(x * x * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qxx
         |  FROM xy
         |), agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
         |    CAST(SUM(qx) AS BIGINT) AS sx, CAST(SUM(qy) AS BIGINT) AS sy,
         |    CAST(SUM(qxy) AS BIGINT) AS sxy,
         |    CAST(SUM(qxx) AS BIGINT) AS sxx
         |  FROM qq
         |)
         |SELECT n_ranks, ${zipfFitExprs.mkString(",\n  ")}
         |FROM agg""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  max(n_chars) AS max_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang
        |ORDER BY lang ASC NULLS LAST""".stripMargin,

    // Same two regex rewrites (global flag) + length arithmetic; the
    // three ratio trees repeat the Spark text verbatim.
    "q_text_readability" ->
      """WITH m AS (
        |  SELECT lang,
        |    CAST(len(text) AS BIGINT) AS l0,
        |    CAST(len(regexp_replace(text, '[aeiouy]+', '', 'g'))
        |      AS BIGINT) AS l1,
        |    CAST(len(regexp_replace(text, '[aeiouy]+', '#', 'g'))
        |      AS BIGINT) AS l2,
        |    CAST(len(regexp_replace(text, ' ', '', 'g')) AS BIGINT)
        |      AS l3
        |  FROM documents WHERE text IS NOT NULL
        |), a AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(l2 - l1) AS BIGINT) AS clusters,
        |    CAST(SUM(l0 - l1) AS BIGINT) AS vowels,
        |    CAST(SUM(l0 - l3 + 1) AS BIGINT) AS words,
        |    CAST(SUM(l3) AS BIGINT) AS word_chars
        |  FROM m GROUP BY lang
        |)
        |SELECT lang, n_docs, words, clusters,
        |  CAST(clusters AS DOUBLE) / CAST(words AS DOUBLE)
        |    AS syll_per_word,
        |  CAST(word_chars AS DOUBLE) / CAST(words AS DOUBLE)
        |    AS chars_per_word,
        |  CAST(vowels AS DOUBLE) / CAST(word_chars AS DOUBLE)
        |    AS vowel_ratio
        |FROM a ORDER BY lang ASC NULLS LAST""".stripMargin,

    "q_text_dedup" ->
      """SELECT md5(lower(trim(text))) AS fp, COUNT(*) AS n_docs,
        |  min(doc_id) AS min_doc_id
        |FROM documents GROUP BY 1
        |ORDER BY fp ASC NULLS LAST""".stripMargin,

    "q_dedup_minhash" -> minhashOracle,

    "q_dedup_pairs" -> dedupPairsOracle,

    // The corpus-wide pair pipeline restricted to pairs touching the
    // probe: its band-bucket candidates for doc 1 are EXACTLY the docs
    // sharing a band with it, so the mirror needs no separate probe
    // machinery.
    "q_dedup_lookup" ->
      s"""WITH pairs AS (
         |${dedupPairsSubquery.linesIterator.map("  " + _).mkString("\n")}
         |)
         |SELECT CASE WHEN id_a = 8 THEN id_b ELSE id_a END AS doc_id,
         |  jaccard
         |FROM pairs WHERE id_a = 8 OR id_b = 8
         |ORDER BY jaccard DESC NULLS LAST, doc_id ASC NULLS LAST""".stripMargin,

    "q_text_editdist" ->
      s"""WITH pairs AS (
         |${dedupPairsSubquery.linesIterator.map("  " + _).mkString("\n")}
         |), pre AS (
         |  SELECT doc_id, substring(text, 1, 60) AS tp FROM documents
         |)
         |SELECT p.id_a, p.id_b, p.jaccard,
         |  CAST(levenshtein(a.tp, b.tp) AS BIGINT) AS edit_dist,
         |  1.0 - CAST(levenshtein(a.tp, b.tp) AS DOUBLE)
         |    / greatest(length(a.tp), length(b.tp)) AS prefix_sim
         |FROM pairs p
         |JOIN pre a ON a.doc_id = p.id_a
         |JOIN pre b ON b.doc_id = p.id_b
         |ORDER BY p.id_a ASC NULLS LAST, p.id_b ASC NULLS LAST""".stripMargin,

    // Ground truth + the dedupPairsSubquery pipeline mirror; recall is
    // one IEEE division of exact counts.
    "q_dedup_recall" ->
      s"""WITH t0 AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents WHERE len(string_split(text, ' ')) >= 3
         |), u AS (
         |  SELECT doc_id, list_distinct(toks) AS tset FROM t0
         |), p AS (
         |  SELECT doc_id AS pid, tset AS ptoks FROM u WHERE doc_id < 16
         |), truth AS (
         |  SELECT pid, COUNT(*) AS n_true
         |  FROM u, p
         |  WHERE u.doc_id <> p.pid
         |    AND CAST(len(list_intersect(ptoks, tset)) AS DOUBLE)
         |      / (len(ptoks) + len(tset) - len(list_intersect(ptoks, tset)))
         |      >= 0.7
         |  GROUP BY pid
         |), lsh AS (
         |  SELECT * FROM (
         |${dedupPairsSubquery.linesIterator.map("    " + _).mkString("\n")}
         |  )
         |), fnd AS (
         |  SELECT pid, COUNT(*) AS n_found FROM (
         |    SELECT id_a AS pid FROM lsh WHERE id_a < 16
         |    UNION ALL
         |    SELECT id_b AS pid FROM lsh WHERE id_b < 16)
         |  GROUP BY pid
         |)
         |SELECT truth.pid AS doc_id, n_true,
         |  coalesce(n_found, 0) AS n_found,
         |  CAST(coalesce(n_found, 0) AS DOUBLE) / n_true AS recall
         |FROM truth LEFT JOIN fnd ON truth.pid = fnd.pid
         |ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_dedup_minhash_est" -> minhashEstOracle,

    "q_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, md5(tk) AS h, j.j AS j
        |  FROM tok, (SELECT unnest(range(16)) AS j) j
        |), b AS (
        |  SELECT doc_id, j,
        |    SUM(2 * (CAST(floor((strpos('0123456789abcdef',
        |      substring(h, CAST(floor(j/4) AS INT) + 1, 1)) - 1)
        |      / pow(2, 3 - j % 4)) AS BIGINT) % 2) - 1) AS sj
        |  FROM g GROUP BY doc_id, j
        |)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN sj > 0 THEN CAST(pow(2, j) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS simhash
        |FROM b GROUP BY doc_id ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_dedup_ngram" ->
      """WITH s AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 50
        |), c AS (
        |  SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id
        |), i AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM s a JOIN s b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
        |FROM i JOIN c ca ON doc_a = ca.doc_id JOIN c cb ON doc_b = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5
        |ORDER BY doc_a ASC NULLS LAST, doc_b ASC NULLS LAST""".stripMargin,

    "q_dedup_containment" ->
      """WITH s AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 50
        |), c AS (
        |  SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id
        |), i AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM s a JOIN s b ON a.tok = b.tok AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, inter,
        |  CAST(inter AS DOUBLE) / ca.n AS containment
        |FROM i JOIN c ca ON doc_a = ca.doc_id
        |WHERE CAST(inter AS DOUBLE) / ca.n >= 0.8
        |ORDER BY doc_a ASC NULLS LAST, doc_b ASC NULLS LAST""".stripMargin,

    "q_text_langid" -> langidOracle,

    "q_text_bigrams" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |)
        |SELECT bigram, COUNT(*) AS cnt FROM (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
        |  FROM t
        |) GROUP BY bigram
        |ORDER BY cnt DESC NULLS LAST, bigram ASC NULLS LAST
        |LIMIT 20""".stripMargin,

    // Mirrors the scaled floor division (// is DuckDB floor division,
    // Spark's DIV truncates — identical on the positive counts here) and
    // the exact-product-then-one-division mean.
    "q_text_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), x AS (
        |  SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i FROM t
        |), dbg AS (
        |  SELECT doc_id, toks[i+1] AS a, toks[i+2] AS b FROM x
        |), bg AS (
        |  SELECT a, b, COUNT(*) AS cnt_ab FROM dbg GROUP BY a, b
        |), pr AS (
        |  SELECT a, b,
        |    (cnt_ab * CAST(1000000 AS BIGINT))
        |      // CAST(SUM(cnt_ab) OVER (PARTITION BY a) AS BIGINT)
        |      AS p_scaled
        |  FROM bg
        |)
        |SELECT dbg.doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(pr.p_scaled) AS BIGINT) AS score_sum,
        |  CAST(CAST(SUM(pr.p_scaled) AS BIGINT) AS DOUBLE)
        |    / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS fluency
        |FROM dbg JOIN pr ON dbg.a = pr.a AND dbg.b = pr.b
        |GROUP BY dbg.doc_id
        |ORDER BY dbg.doc_id ASC NULLS LAST""".stripMargin,

    "q_text_bigram_prob" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), x AS (
        |  SELECT toks, unnest(range(len(toks) - 1)) AS i FROM t
        |), bg AS (
        |  SELECT toks[i+1] AS a, toks[i+2] AS b, COUNT(*) AS cnt_ab
        |  FROM x GROUP BY 1, 2
        |), tot AS (
        |  SELECT a, CAST(SUM(cnt_ab) AS BIGINT) AS cnt_a
        |  FROM bg GROUP BY a
        |)
        |SELECT bg.a, bg.b, bg.cnt_ab, tot.cnt_a,
        |  CAST(bg.cnt_ab AS DOUBLE) / tot.cnt_a AS p
        |FROM bg JOIN tot ON bg.a = tot.a
        |ORDER BY cnt_ab DESC NULLS LAST, bg.a ASC NULLS LAST,
        |  b ASC NULLS LAST
        |LIMIT 20""".stripMargin,

    "q_text_docfreq" ->
      """WITH n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT tok, COUNT(*) AS df,
        |  CAST(COUNT(*) AS DOUBLE) / (SELECT n_docs FROM n) AS doc_ratio
        |FROM (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
        |    AS tok
        |  FROM documents
        |) GROUP BY tok HAVING COUNT(*) >= 10
        |ORDER BY df DESC NULLS LAST, tok ASC NULLS LAST""".stripMargin,

    // Same df-band term table and the verbatim idf/tf expression text;
    // the per-term grid quantization makes the per-doc sum an exact
    // integer on both engines.
    "q_text_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents WHERE text IS NOT NULL
         |), dl AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
         |  FROM toks GROUP BY doc_id
         |), tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(dl) AS BIGINT) AS sum_dl
         |  FROM dl
         |), df AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM (
         |    SELECT DISTINCT doc_id, tok FROM toks
         |  ) GROUP BY tok
         |), q9 AS (
         |  SELECT tok, df FROM df
         |  ORDER BY df DESC NULLS LAST, tok ASC NULLS LAST LIMIT 9
         |), q5 AS (
         |  SELECT tok FROM df
         |  ORDER BY df DESC NULLS LAST, tok ASC NULLS LAST LIMIT 5
         |), qt AS (
         |  SELECT tok, df FROM q9
         |  WHERE tok NOT IN (SELECT tok FROM q5)
         |), base AS (
         |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
         |    max(qt.df) AS df
         |  FROM toks t JOIN qt ON qt.tok = t.tok
         |  GROUP BY t.doc_id, t.tok
         |), wide AS (
         |  SELECT b.doc_id, b.tf, dl.dl, tot.n_docs, tot.sum_dl,
         |    2 * tot.n_docs - 2 * b.df + 1 AS hi,
         |    2 * b.df + 1 AS lo
         |  FROM base b JOIN dl ON dl.doc_id = b.doc_id CROSS JOIN tot
         |), lg AS (
         |  SELECT doc_id, tf, dl, n_docs, sum_dl,
         |    ${graft.Det.sqlPlog2Cols("hi", "h_")},
         |    ${graft.Det.sqlPlog2Cols("lo", "l_")}
         |  FROM wide
         |), qq AS (
         |  SELECT doc_id, dl,
         |    CAST(floor((h_l2 - l_l2)
         |      * CAST(0.6931471805599453 AS DOUBLE)
         |      * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
         |      / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
         |      * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
         |      * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE)
         |      / CAST(n_docs AS DOUBLE))))))
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM lg
         |), agg AS (
         |  SELECT doc_id, max(dl) AS dl,
         |    CAST(COUNT(*) AS BIGINT) AS n_hits,
         |    CAST(SUM(q) AS BIGINT) AS sq
         |  FROM qq GROUP BY doc_id
         |)
         |SELECT doc_id, dl, n_hits, sq,
         |  CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE) AS score
         |FROM agg
         |ORDER BY sq DESC NULLS LAST, doc_id ASC NULLS LAST
         |LIMIT 20""".stripMargin,

    // Same (doc, tok) pre-distinct tf/df aggregate, the same top-50
    // tie-break, and the single (tf − df)/df division.
    "q_text_burstiness" ->
      """WITH dt AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents WHERE text IS NOT NULL
        |  ) WHERE length(tok) > 0 GROUP BY doc_id, tok
        |), st AS (
        |  SELECT tok, CAST(SUM(c) AS BIGINT) AS tf,
        |    CAST(COUNT(*) AS BIGINT) AS df
        |  FROM dt GROUP BY tok
        |), top AS (
        |  SELECT tok, tf, df FROM st
        |  ORDER BY tf DESC NULLS LAST, tok ASC NULLS LAST LIMIT 50
        |)
        |SELECT tok, tf, df, CAST(tf - df AS DOUBLE) / df AS burstiness
        |FROM top
        |ORDER BY tf DESC NULLS LAST, tok ASC NULLS LAST""".stripMargin,

    "q_dedup_bands_curve" -> bandsCurveOracle,
    "q_dedup_lsh_tune" -> lshTuneOracle,

    // list_slice is (start, end)-inclusive — the i+1..i+k / j+1..j+w
    "q_text_rake" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS tok,
         |    generate_subscripts(string_split(text, ' '), 1) AS pos
         |  FROM documents WHERE text IS NOT NULL
         |), tk AS (
         |  SELECT * FROM toks WHERE length(tok) > 0
         |), stop AS (
         |  SELECT tok FROM (
         |    SELECT tok, COUNT(*) AS n FROM tk GROUP BY tok
         |  ) ORDER BY n DESC NULLS LAST, tok ASC NULLS LAST LIMIT 5
         |), content AS (
         |  SELECT * FROM tk WHERE tok NOT IN (SELECT tok FROM stop)
         |), isl AS (
         |  SELECT doc_id, tok, pos,
         |    pos - row_number() OVER
         |      (PARTITION BY doc_id ORDER BY pos ASC) AS grp
         |  FROM content
         |), ph AS (
         |  SELECT doc_id, tok, pos, grp,
         |    COUNT(*) OVER (PARTITION BY doc_id, grp) AS plen
         |  FROM isl
         |), wstats AS (
         |  SELECT tok, (CAST(SUM(plen) AS BIGINT) * 1000000)
         |      // COUNT(*) AS wscore
         |  FROM ph GROUP BY tok
         |), phrases AS (
         |  SELECT doc_id, grp,
         |    string_agg(tok, ' ' ORDER BY pos ASC) AS phrase,
         |    COUNT(*) AS n_words
         |  FROM ph GROUP BY doc_id, grp
         |), pscore AS (
         |  SELECT ph.doc_id, ph.grp,
         |    CAST(SUM(w.wscore) AS BIGINT) AS score
         |  FROM ph JOIN wstats w ON ph.tok = w.tok
         |  GROUP BY ph.doc_id, ph.grp
         |)
         |SELECT p.phrase, MAX(p.n_words) AS n_words,
         |  COUNT(*) AS n_occurrences, MAX(s.score) AS score
         |FROM phrases p
         |JOIN pscore s ON p.doc_id = s.doc_id AND p.grp = s.grp
         |GROUP BY p.phrase
         |ORDER BY score DESC NULLS LAST, phrase ASC NULLS LAST
         |LIMIT 20""".stripMargin,

    // bounds mirror Spark's slice(start, LENGTH) exactly; list_aggr
    // 'min' is the same lexicographic md5 min.
    "q_text_winnow" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE len(string_split(text, ' ')) >= ${WinnowK + WinnowW - 1}
         |), g AS (
         |  SELECT doc_id, list_transform(
         |    generate_series(0, len(toks) - $WinnowK),
         |    i -> md5(array_to_string(
         |      list_slice(toks, i + 1, i + $WinnowK), ' '))) AS grams
         |  FROM t
         |), f AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(0, len(grams) - $WinnowW),
         |    j -> list_aggr(list_slice(grams, j + 1, j + $WinnowW),
         |      'min'))) AS fps
         |  FROM g
         |), e AS (
         |  SELECT doc_id, unnest(fps) AS fp FROM f
         |), c AS (
         |  SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM e GROUP BY fp
         |)
         |SELECT e.doc_id, CAST(len(f.fps) AS BIGINT) AS n_fps,
         |  COUNT(CASE WHEN c.nd > 1 THEN 1 END) AS n_shared
         |FROM e JOIN c ON e.fp = c.fp JOIN f ON f.doc_id = e.doc_id
         |GROUP BY e.doc_id, len(f.fps)
         |ORDER BY e.doc_id ASC NULLS LAST""".stripMargin,

    // Same single bigram-count source; // is DuckDB's floor division
    // (exact match for Spark's DIV on these non-negative operands), and
    // the window sums widen to HUGEINT so every cast pins BIGINT.
    "q_text_pmi" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), bg AS (
        |  SELECT toks[i+1] AS a, toks[i+2] AS b
        |  FROM (SELECT toks, unnest(generate_series(0, len(toks) - 2)) AS i
        |        FROM t)
        |), c AS (
        |  SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY a, b
        |), m AS (
        |  SELECT a, b, n_ab,
        |    CAST(SUM(n_ab) OVER (PARTITION BY a) AS BIGINT) AS n_a,
        |    CAST(SUM(n_ab) OVER (PARTITION BY b) AS BIGINT) AS n_b,
        |    CAST((SELECT SUM(n_ab) FROM c) AS BIGINT) AS n_total
        |  FROM c
        |)
        |SELECT a, b, n_ab, n_a, n_b,
        |  CAST((CAST(n_ab AS HUGEINT) * CAST(n_total AS HUGEINT)
        |    * 1000000) // (CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT))
        |    AS BIGINT) AS pmi_scaled
        |FROM m WHERE n_ab >= 5
        |ORDER BY pmi_scaled DESC NULLS LAST, a ASC NULLS LAST,
        |  b ASC NULLS LAST
        |LIMIT 50""".stripMargin,

    "q_text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), cnt AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(toks) AS tok FROM t
        |  ) GROUP BY doc_id, tok
        |), top AS (
        |  SELECT doc_id, max(c) AS top_token_n FROM cnt GROUP BY doc_id
        |), r AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |      AS distinct_ratio,
        |    CASE WHEN len(toks) >= 2 THEN
        |      1.0 - CAST(len(list_distinct(list_transform(
        |        range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2])))
        |        AS DOUBLE) / (len(toks) - 1)
        |    ELSE 0.0 END AS dup_bigram_ratio
        |  FROM t
        |)
        |SELECT r.doc_id, n_tokens, top_token_n, distinct_ratio,
        |  dup_bigram_ratio
        |FROM r JOIN top ON r.doc_id = top.doc_id
        |ORDER BY r.doc_id ASC NULLS LAST""".stripMargin,

    "q_text_pii_redact" ->
      """WITH t2 AS (
        |  SELECT doc_id,
        |    text || ' Contact: user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example (tel 555-01' ||
        |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ')' AS text2
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text2,
        |    '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexpreplace_tmp, '[0-9]{3}-[0-9]{4}',
        |    '<PHONE>', 'g')) AS redacted_md5
        |FROM (SELECT doc_id, text2,
        |  regexp_replace(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
        |    '<EMAIL>', 'g') AS regexpreplace_tmp FROM t2)
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_text_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS n_distinct,
        |    n_chars
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, n_tokens, n_distinct,
        |    CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
        |    CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens
        |      AS avg_token_len,
        |    (CAST(n_distinct AS DOUBLE) / n_tokens)
        |      * (CAST(least(n_tokens, 100) AS DOUBLE) / 100) AS score
        |  FROM f
        |)
        |SELECT doc_id, n_tokens, n_distinct, ttr, avg_token_len, score,
        |  score > 0.3 AS is_quality
        |FROM q ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // Same in-row window fold via list_transform/list_aggregate over
    // inclusive list_slice bounds; identical CASE and division text.
    "q_text_mattr" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), f AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(CASE WHEN len(toks) >= 50 THEN len(toks) - 50 + 1
        |      ELSE 1 END AS BIGINT) AS n_windows,
        |    CAST(CASE WHEN len(toks) >= 50 THEN
        |      list_aggregate(list_transform(
        |        generate_series(0, len(toks) - 50),
        |        i -> len(list_distinct(list_slice(toks, i + 1, i + 50)))
        |      ), 'sum')
        |      ELSE len(list_distinct(toks)) END AS BIGINT)
        |      AS sum_distinct
        |  FROM t
        |)
        |SELECT doc_id, n_tokens, n_windows, sum_distinct,
        |  CASE WHEN n_tokens >= 50 THEN
        |    CAST(sum_distinct AS DOUBLE)
        |    / (CAST(n_windows AS DOUBLE) * CAST(50 AS DOUBLE))
        |  ELSE CAST(sum_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |  END AS mattr
        |FROM f ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, unnest(generate_series(0, len(toks) - 2)) AS i, toks
        |  FROM t WHERE len(toks) >= 2
        |), sh AS (
        |  SELECT doc_id, md5(toks[i+1] || ' ' || toks[i+2]) AS h FROM s
        |)
        |SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max
        |FROM sh GROUP BY doc_id ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // Same run-segmentation regexes at the lang grain; the one division
    // repeats the Spark text.
    "q_tokenizer_fertility" ->
      """WITH x AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
        |    CAST(len(regexp_extract_all(text, '[aeiou]+'))
        |      + len(regexp_extract_all(text, '[^aeiou ]+')) AS BIGINT)
        |      AS sub
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(ws) AS BIGINT) AS n_words,
        |  CAST(SUM(sub) AS BIGINT) AS n_subwords,
        |  CAST(SUM(sub) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE)
        |    AS fertility
        |FROM x GROUP BY lang ORDER BY lang ASC NULLS LAST""".stripMargin,

    "q_text_tokencount" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
        |    AS vowel_runs,
        |  CAST(len(regexp_extract_all(text, '[^aeiou ]+')) AS BIGINT)
        |    AS other_runs,
        |  CAST(len(regexp_extract_all(text, '[aeiou]+'))
        |    + len(regexp_extract_all(text, '[^aeiou ]+')) AS BIGINT)
        |    AS subword_total
        |FROM documents ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
        |  md5(text) AS checksum,
        |  lang, source
        |FROM documents ORDER BY doc_id ASC NULLS LAST""".stripMargin
  )
}
