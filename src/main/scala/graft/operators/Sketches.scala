package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic frequency/membership sketches over the corpus tokens —
  * the streaming-friendly summaries a 100 TB pipeline keeps instead of
  * exact dictionaries:
  *
  *  - `q_sketch_countmin`: a 4×32 count-min sketch of token frequencies
  *    plus the classic overestimate check (top-10 tokens' true count vs
  *    the sketch's min-over-rows estimate);
  *  - `q_sketch_bloom`: a 4096-bit Bloom filter (128 × 32-bit words,
  *    k=3) over the distinct token set, probed with 5 present and 5
  *    absent keys.
  *
  * Unlike HLL (q_agg_approx_distinct, estimator-specific → no-oracle),
  * BOTH sketches here are bit-deterministic: the hash family is the
  * proven 60-bit md5 fold XOR'd with [[MinHash.seeds]] (identical on
  * both engines), so the sketch contents — and therefore estimates and
  * membership answers — hash-match the DuckDB oracle exactly.
  *
  * Scale: both sketches are ONE hash-aggregate over (row/word, cell)
  * keys — commutative, partial-aggregation-friendly, exactly how a
  * distributed sketch merge works (cells add; words OR). 32-bit words
  * because DuckDB overflow-checks `1::BIGINT << 63`.
  */
object Sketches {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Count-min geometry. */
  val CmDepth = 4
  val CmWidth = 32

  /** Bloom geometry: 128 words × 32 bits, k = 3. */
  val BloomWords = 128
  val BloomBits: Int = BloomWords * 32
  val BloomK = 3

  /** KMV sketch size: keep the K smallest distinct hash values. */
  val KmvK = 64

  /** Quantile-sketch sample size: the K rows with the smallest
    * row-identity hashes form a uniform simple random sample, so rank
    * selection inside the sample estimates any quantile with rank error
    * O(sqrt(ln(2/δ)/2K)) uniformly over q (DKW inequality) — ±2.1% at
    * K=4096, δ=10⁻⁴. Bottom-K (not GK/KLL) because it is the
    * DETERMINISTIC mergeable member of the quantile-sketch family: GK
    * compaction depends on arrival order and KLL on coin flips — both
    * change results under Spark's nondeterministic partial-agg merge
    * order — while "K smallest hashes of the union" is associative,
    * commutative, and worst-case bounded, the exact algebra
    * q_sketch_kmv/theta already rely on. */
  val QuantK = 4096

  /** 60-bit hash space of [[hvExpr]] (16^15 = 2^60) — the KMV
    * estimator's normalization constant. */
  val HashSpace = 1152921504606846976L

  /** q_join_bloom geometry: 4096 words × 32 bits = 131072 bits. Sized so
    * the sf0.1 build side (~30k keys × 3 bits) fills ~2/3 of the filter
    * (false-positive rate ≈ 0.67³ ≈ 30%); at larger corpora the word
    * count scales with the build side — the broadcast stays KBs. */
  val JoinBloomWords = 4096
  val JoinBloomBits: Int = JoinBloomWords * 32

  /** 60-bit md5 fold of a token (Spark side) — same math as
    * [[MinHash.withSignatures]]. */
  private[operators] def hvExpr(tok: String): String =
    s"CAST(conv(substring(md5($tok), 1, 15), 16, 10) AS BIGINT)"

  /** Per-(event_type, bucket) HLL register table (register = max ρ over
    * the bucket's hashes) — the state behind q_sketch_hll. PUBLIC and
    * mode-agnostic: fed a streaming frame this IS the live
    * distinct-counter state (an update-mode keyed MAX — one long per
    * touched register per micro-batch, merged associatively), and
    * StreamingParitySpec proves the streamed registers equal this batch
    * frame before assembling the same estimate from them. */
  def hllRegisters(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    events
      .select(col("event_type"),
        expr(hvExpr("CAST(user_id AS STRING)")).as("hv"))
      .withColumn("bucket", expr("hv div 4503599627370496"))
      .withColumn("w", expr("hv % 4503599627370496"))
      .withColumn("rho", expr(
        "CAST(CASE WHEN w = 0 THEN 53 ELSE " +
          "52 - (length(bin(w)) - 1) END AS BIGINT)"))
      .groupBy("event_type", "bucket")
      .agg(max("rho").as("mj"))

  /** DuckDB mirror of [[hvExpr]]. */
  private[operators] def sqlHv(tok: String): String =
    s"CAST('0x' || substring(md5($tok), 1, 15) AS BIGINT)"

  /** (event_type, event_id, value, hv) observations the quantile sketch
    * consumes — the ONE place the row-identity hash is defined, shared
    * by q_sketch_quantile / q_sketch_quantile_merge and the streaming
    * twin ([[graft.streaming.StatefulTwins.quantileSketchStream]]), so
    * the two sides cannot drift. Mode-agnostic: works on a batch frame
    * or a streaming one (pure narrow map). */
  def quantileObs(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    events.filter(col("value").isNotNull)
      .withColumn("hv",
        expr(hvExpr("concat('qq_', CAST(event_id AS STRING))")))
      .select("event_type", "event_id", "value", "hv")

  private def seedRows: String = (0 until CmDepth)
    .map(i => s"(${i}, ${MinHash.seeds(i)})").mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Count-min: cells[d][c] = Σ counts of tokens with (hv⊕seed_d)%W = c;
    // estimate(tok) = min_d cells[d][(hv⊕seed_d)%W] ≥ true count. The
    // probe set is the top-10 tokens (ties by token), so the oracle can
    // reproduce the exact same rows.
    "q_sketch_countmin" -> ((s, d) => {
      val tf = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .withColumn("hv", expr(hvExpr("tok")))
      val dims = (0 until CmDepth).map(i =>
        s"struct(${i}L AS d, pmod(hv ^ ${MinHash.seeds(i)}L, $CmWidth) AS c)")
        .mkString("array(", ", ", ")")
      val cells = tf
        .select(col("n"), explode(expr(dims)).as("dc"))
        .groupBy(col("dc.d").as("d"), col("dc.c").as("c"))
        .agg(sum("n").as("cell"))
      val probes = tf
        .orderBy(desc_nulls_last("n"), asc_nulls_last("tok"))
        .limit(10)
      probes
        .select(col("tok"), col("n"), explode(expr(dims)).as("dc"))
        .join(cells, col("dc.d") === cells("d") && col("dc.c") === cells("c"))
        .groupBy("tok", "n")
        .agg(min("cell").as("est_n"))
        .select(col("tok"), col("n").as("true_n"), col("est_n"))
        .orderBy(desc_nulls_last("true_n"), asc_nulls_last("tok"))
    }),

    // Bloom filter: 3 bit positions per DISTINCT token; words build by
    // bit_or; membership = all 3 bits set. Probes: the corpus' top-5
    // tokens (guaranteed present) and 5 synthetic keys (absent unless
    // the corpus happens to contain them — the oracle recomputes
    // `present` from data, so parity holds either way).
    "q_sketch_bloom" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val tf = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      val positions = (0 until BloomK).map(i =>
        s"pmod(hv ^ ${MinHash.seeds(i)}L, $BloomBits)")
        .mkString("array(", ", ", ")")
      val words = tf
        .withColumn("hv", expr(hvExpr("tok")))
        .select(explode(expr(positions)).as("pos"))
        .select((col("pos") / 32).cast("long").as("word"),
          expr("CAST(shiftleft(1L, CAST(pos % 32 AS INT)) AS BIGINT)")
            .as("bit"))
        .groupBy("word").agg(expr("bit_or(bit)").as("bits"))
      val present = tf
        .orderBy(desc_nulls_last("n"), asc_nulls_last("tok"))
        .limit(5).select("tok")
      val absent = (0 until 5).map(i => s"zz_absent_$i")
      val probes = present
        .unionAll(t(s, d, "region").filter(col("r_regionkey") < 5)
          .select(element_at(
            typedLit(absent), col("r_regionkey") + 1).as("tok")))
      val inCorpus = tf.select(col("tok"), lit(true).as("present"))
      probes
        .withColumn("hv", expr(hvExpr("tok")))
        .select(col("tok"), col("hv"), explode(expr(positions)).as("pos"))
        .select(col("tok"),
          (col("pos") / 32).cast("long").as("word"),
          expr("CAST(shiftleft(1L, CAST(pos % 32 AS INT)) AS BIGINT)")
            .as("bit"))
        .join(broadcast(words), Seq("word"), "left")
        .groupBy("tok")
        .agg(min(coalesce(col("bits"), lit(0L)).bitwiseAND(col("bit")) =!= 0)
          .as("bloom_member"))
        .join(inCorpus, Seq("tok"), "left")
        .select(col("tok"),
          coalesce(col("present"), lit(false)).as("present"),
          col("bloom_member"))
        .orderBy(asc_nulls_last("tok"))
    }),

    // KMV (K minimum values) distinct sketch — the DETERMINISTIC
    // companion to q_agg_approx_distinct's HLL (Bar-Yossef et al.,
    // RANDOM 2002: with values hashed uniformly into [0, M), the Kth
    // smallest distinct hash h_(K) estimates the cardinality as
    // (K−1)·M/h_(K)). Unlike HLL — whose register layout is
    // estimator-specific, hence that query's contract-allowed no-oracle
    // status — every number here is reproducible from the md5 hash
    // family both engines share, so the sketch FAMILY has a fully
    // hash-matched member: k_used and kth_hv are exact integers, and
    // the estimate is two IEEE double ops (one divide, one multiply)
    // in the same textual shape on both sides, rounded once to integer.
    // Output per l_returnflag group: sketch size used, the Kth hash,
    // the KMV estimate, and the exact distinct count beside it.
    //
    // Scale note: as declared this distinct+window shape shuffles the
    // distinct (flag, hv) pairs — the same cost class as the exact
    // count it sits beside, which is what makes the oracle possible.
    // The 100 TB deployment shape is the same estimator as a bounded-
    // state partial aggregate (per-partition top-K merge, the
    // TypedImperativeAggregate upgrade path): KMV merges by unioning
    // K-lists and re-taking the K smallest, so partial aggregation is
    // exact — the algebra this query proves is unchanged there.
    // Manual HyperLogLog (Flajolet et al. 2007) per event_type, built
    // entirely from the shared 60-bit md5 fold so the WHOLE estimator —
    // registers, harmonic mean, small-range correction — is
    // hash-matched against DuckDB, unlike Spark's built-in
    // approx_count_distinct (q_agg_approx_distinct, the contract's one
    // no-oracle row, whose HLL++ internals are engine-private). m = 256
    // registers: bucket = top 8 hash bits, ρ = leading-zero run of the
    // remaining 52 (integer arithmetic via the portable bit-length
    // `length(bin(w))`, no floats), register = max ρ. The harmonic
    // mean Σ2^(−M_j) stays EXACT: on the common denominator 2^Mmax
    // every term is the integer 2^(Mmax−M_j) (shiftleft — never
    // pow()), so raw = α·m²·2^Mmax/T is one fixed double tree over
    // exact integers; the small-range branch (raw ≤ 2.5m, V > 0) is
    // the q_sketch_linear portable-log estimate. Scale: registers
    // merge by MAX — associative, partial-agg exact — and the
    // register table is |types|·256 rows at any corpus size.
    "q_sketch_hll" -> ((s, d) => {
      val ev = t(s, d, "events")
      val exact = broadcast(ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_distinct")))
      val regs = hllRegisters(ev)
      val wm = Window.partitionBy("event_type")
      val per = regs.withColumn("mmax", max("mj").over(wm))
        .groupBy("event_type", "mmax")
        .agg(count(lit(1)).as("n_present"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), " +
            "CAST(mmax - mj AS INT))")).as("t_present"))
        .withColumn("v_zeros", expr("256 - n_present"))
        .withColumn("t_sum", expr(
          "t_present + v_zeros * shiftleft(CAST(1 AS BIGINT), " +
            "CAST(mmax AS INT))"))
        .withColumn("raw_est", expr(
          "(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) " +
            "+ CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))) " +
            "* CAST(65536 AS DOUBLE) " +
            "* CAST(shiftleft(CAST(1 AS BIGINT), CAST(mmax AS INT)) " +
            "AS DOUBLE) / CAST(t_sum AS DOUBLE)"))
        .withColumn("vsafe", greatest(col("v_zeros"), lit(1L)))
      graft.Det.withPlog2(per, "vsafe", "l2v")
        .withColumn("est_distinct", expr(
          "CASE WHEN raw_est <= CAST(640 AS DOUBLE) AND v_zeros > 0 " +
            "THEN CAST(round(CAST(256 AS DOUBLE) " +
            "* CAST(0.6931471805599453 AS DOUBLE) " +
            "* (CAST(8 AS DOUBLE) - l2v), 0) AS BIGINT) " +
            "ELSE CAST(round(raw_est, 0) AS BIGINT) END"))
        .join(exact, Seq("event_type"))
        .select("event_type", "n_present", "v_zeros", "mmax", "t_sum",
          "raw_est", "est_distinct", "exact_distinct")
        .orderBy(asc_nulls_last("event_type"))
    }),

    // HLL set union via register MAX-merge (the property that makes HLL
    // the 100 TB distinct counter: sketches built per shard/day/cohort
    // merge EXACTLY — max per register — with no access to the raw
    // keys) on the theta cohorts (1995 vs 1996 buyers): three rows out,
    // cohort a, cohort b, and their register-merged union, each with
    // the full q_sketch_hll estimator beside its exact audit count.
    // The merged registers are BY CONSTRUCTION the registers of the
    // concatenated key stream, so the union estimate needs no new
    // theory — and inclusion–exclusion (est_a + est_b − est_u) gives
    // the overlap estimate the theta sketch computes by θ-sampling.
    // Exactness/scale: the q_sketch_hll pipeline verbatim, keyed by
    // cohort tag instead of event_type.
    "q_sketch_hll_union" -> ((s, d) => {
      val ord = t(s, d, "orders")
      def keys(yr: Int) = ord
        .filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey").as("k"))
      val tagged = keys(1995).select(lit("a").as("cohort"), col("k"))
        .unionAll(keys(1996).select(lit("b").as("cohort"), col("k")))
      val all = tagged.unionAll(
        tagged.select(lit("u").as("cohort"), col("k")))
      val exact = broadcast(all.groupBy("cohort")
        .agg(countDistinct("k").as("exact_distinct")))
      val regs = all
        .select(col("cohort"),
          expr(hvExpr("CAST(k AS STRING)")).as("hv"))
        .withColumn("bucket", expr("hv div 4503599627370496"))
        .withColumn("w", expr("hv % 4503599627370496"))
        .withColumn("rho", expr(
          "CAST(CASE WHEN w = 0 THEN 53 ELSE " +
            "52 - (length(bin(w)) - 1) END AS BIGINT)"))
        .groupBy("cohort", "bucket")
        .agg(max("rho").as("mj"))
      val wm = Window.partitionBy("cohort")
      val per = regs.withColumn("mmax", max("mj").over(wm))
        .groupBy("cohort", "mmax")
        .agg(count(lit(1)).as("n_present"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), " +
            "CAST(mmax - mj AS INT))")).as("t_present"))
        .withColumn("v_zeros", expr("256 - n_present"))
        .withColumn("t_sum", expr(
          "t_present + v_zeros * shiftleft(CAST(1 AS BIGINT), " +
            "CAST(mmax AS INT))"))
        .withColumn("raw_est", expr(
          "(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) " +
            "+ CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))) " +
            "* CAST(65536 AS DOUBLE) " +
            "* CAST(shiftleft(CAST(1 AS BIGINT), CAST(mmax AS INT)) " +
            "AS DOUBLE) / CAST(t_sum AS DOUBLE)"))
        .withColumn("vsafe", greatest(col("v_zeros"), lit(1L)))
      graft.Det.withPlog2(per, "vsafe", "l2v")
        .withColumn("est_distinct", expr(
          "CASE WHEN raw_est <= CAST(640 AS DOUBLE) AND v_zeros > 0 " +
            "THEN CAST(round(CAST(256 AS DOUBLE) " +
            "* CAST(0.6931471805599453 AS DOUBLE) " +
            "* (CAST(8 AS DOUBLE) - l2v), 0) AS BIGINT) " +
            "ELSE CAST(round(raw_est, 0) AS BIGINT) END"))
        .join(exact, Seq("cohort"))
        .select("cohort", "n_present", "v_zeros", "mmax", "t_sum",
          "est_distinct", "exact_distinct")
        .orderBy(asc_nulls_last("cohort"))
    }),

    // Linear counting (Whang, Vander-Zanden & Taylor 1990) for distinct
    // users — the LOW-cardinality-regime member of the distinct-sketch
    // family (HLL shines at billions, KMV in the middle; linear counting
    // is unbiased when the bucket table is sparse and degrades
    // gracefully as it fills): hash each key into m = 4096 buckets
    // (2²⁰-free md5 bucket both engines share), count the z EMPTY
    // buckets, est = m·ln(m/z). m is a power of two so ln(m/z) =
    // ln2·(12 − log2 z) needs ONE portable log2 of the INTEGER z (the
    // r8 atanh-series chain — no libm), making the estimate fully
    // hash-matched against DuckDB, unlike HLL's estimator-specific
    // q_agg_approx_distinct. Saturated table (z = 0) → NULL per the
    // paper. Scale: the bucket set is a 4096-key distinct (map-side
    // partial dedup), merged bitmap-style by partial aggregation;
    // exact count sits beside it as the audit column.
    "q_sketch_linear" -> ((s, d) => {
      val m = 4096
      val ev = t(s, d, "events")
      val exact = broadcast(ev
        .agg(countDistinct("user_id").as("exact_distinct"))
        .withColumn("_one", lit(1)))
      val used = ev.select(expr(
          "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), " +
            s"16, 10) AS BIGINT) % $m").as("bucket"))
        .distinct()
        .agg(count(lit(1)).as("used"))
        .withColumn("m", lit(m.toLong))
        .withColumn("z", expr("m - used"))
        .withColumn("zsafe", greatest(col("z"), lit(1L)))
      graft.Det.withPlog2(used, "zsafe", "l2z")
        .withColumn("est_distinct", when(col("z") === 0L, lit(null))
          .otherwise(expr(
            "CAST(round(CAST(4096 AS DOUBLE) " +
              "* CAST(0.6931471805599453 AS DOUBLE) " +
              "* (CAST(12 AS DOUBLE) - l2z), 0) AS BIGINT)")))
        .withColumn("_one", lit(1)).join(exact, "_one")
        .select("m", "used", "z", "est_distinct", "exact_distinct")
    }),

    // AMS "tug-of-war" F2 sketch (Alon, Matias & Szegedy, STOC 1996):
    // 16 counters, each the ±1-signed sum of per-user frequencies with
    // signs drawn from one md5 digest's hex nibbles (bit 0 of nibble j
    // → sign_j(user); E[c_j²] = F2 exactly), estimate = mean of the 16
    // squared counters vs the exact second frequency moment Σ f² — the
    // join-size/self-join-cardinality estimator a planner keeps per
    // column at 100 TB (F2 IS the self-join size). Everything but the
    // final mean/error divisions is exact integers: users collapse to
    // (user, f) in ONE keyed agg, each user row derives its 16 signs
    // from one md5; counters are BIGINT-safe (|c_j| ≤ n) while f² goes
    // through DECIMAL(38,0) (see below). Scale: the sketch is what scales — the
    // per-user frame never re-shuffles, counters are 16 map-side-
    // combined sums, mergeable across shards by addition.
    "q_sketch_ams" -> ((s, d) => {
      val nC = 16
      val ucnt = t(s, d, "events")
        .groupBy("user_id").agg(count(lit(1)).as("f"))
        .withColumn("h", expr("md5(concat('ams_', " +
          "CAST(user_id AS STRING)))"))
      val signCols = (0 until nC).map(j => expr(
        s"(CAST(conv(substring(h, ${j + 1}, 1), 16, 10) AS BIGINT) " +
          s"% 2) * 2 - 1").as(s"sg$j"))
      val aggs = (0 until nC).map(j =>
        sum(expr(s"sg$j * f")).as(s"c$j"))
      // c² in DOUBLE (|c_j| ≤ n can square past 2⁶³ at extreme scale);
      // the 16-term sum is one fixed left-assoc tree — identical text
      // both engines, so the estimate is bit-stable. f² sums live in
      // DECIMAL(38,0) (r12 overflow sweep: ONE key with >3·10⁹ events
      // wraps BIGINT f² — a plausible heavy hitter at 100 TB) and the
      // wide exact moment routes to DOUBLE via VARCHAR on both engines.
      val cSq = (0 until nC)
        .map(j => s"CAST(c$j AS DOUBLE) * CAST(c$j AS DOUBLE)")
        .mkString(" + ")
      ucnt.select(Seq(col("f")) ++ signCols: _*)
        .agg(sum(expr(
          "CAST(f AS DECIMAL(38,0)) * CAST(f AS DECIMAL(38,0))"))
          .as("f2x"), aggs: _*)
        .withColumn("f2_exact", expr("CAST(CAST(f2x AS STRING) AS DOUBLE)"))
        .withColumn("f2_est", expr(
          s"($cSq) / CAST($nC AS DOUBLE)"))
        .withColumn("rel_err", expr(
          "abs(f2_est - f2_exact) / f2_exact"))
        .select(col("f2_exact"), col("f2_est"), col("rel_err"),
          lit(nC.toLong).as("n_counters"))
    }),

    "q_sketch_kmv" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val hv = li.select(col("l_returnflag").as("flag"),
          expr(hvExpr("CAST(l_partkey AS STRING)")).as("hv"))
        .distinct()
      val w = Window.partitionBy("flag").orderBy(asc_nulls_last("hv"))
      val exact = li
        .groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct("l_partkey").as("exact_distinct"))
      hv.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= KmvK)
        .groupBy("flag")
        .agg(count(lit(1)).as("k_used"), max("hv").as("kth_hv"))
        .withColumn("est_distinct", expr(
          s"CASE WHEN k_used < $KmvK THEN k_used ELSE " +
            "CAST(round((CAST(k_used AS DOUBLE) - CAST(1 AS DOUBLE)) " +
            s"* (CAST($HashSpace AS DOUBLE) / CAST(kth_hv AS DOUBLE)), " +
            "0) AS BIGINT) END"))
        .join(exact, Seq("flag"))
        .select("flag", "k_used", "kth_hv", "est_distinct",
          "exact_distinct")
        .orderBy(asc_nulls_last("flag"))
    }),

    // Quantile sketch (r11 verdict item #3 — the missing sketch-family
    // member): per-event_type value quantiles from a bottom-K
    // row-identity-hash sample (see [[QuantK]] for why bottom-K beats
    // GK/KLL here), the scale substitute for q_percentile_exact's full
    // per-group sort at 100 TB. Estimates are PURE RANK SELECTIONS
    // (nearest-rank, ceil(q·m)): actual data values, zero FP arithmetic,
    // so the whole row hash-matches the oracle. Scale: one narrow md5
    // map, the bottom-K per group prunes map-side (WindowGroupLimit on
    // the rank filter — each task keeps ≤K rows before the exchange),
    // then ONE ≤K-element in-row sorted list per group; n_full rides a
    // plain map-side-combined count. Groups smaller than K are their own
    // sample (exact mode — the theta fallback argument). SketchesSpec
    // property-bounds the rank error against the exact quantile.
    "q_sketch_quantile" -> ((s, d) => {
      val ev = quantileObs(t(s, d, "events"))
      val wq = Window.partitionBy("event_type")
        .orderBy(asc_nulls_last("hv"), asc_nulls_last("event_id"))
      val sk = ev
        .withColumn("srk", row_number().over(wq))
        .filter(col("srk") <= QuantK)
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("value"),
          col("event_id")))).as("sk"), count(lit(1)).as("m"))
      val nn = ev.groupBy("event_type").agg(count(lit(1)).as("n_full"))
      def estq(q: String, alias: String) = expr(
        s"element_at(sk, CAST(ceil(($q) * m) AS INT)).value").as(alias)
      sk.join(nn, "event_type")
        .select(col("event_type"), col("n_full"), col("m"),
          estq("0.5", "est_p50"), estq("0.9", "est_p90"),
          estq("0.99", "est_p99"))
        .orderBy(asc_nulls_last("event_type"))
    }),

    // Quantile-sketch MERGE (the q_sketch_hll_union analogue): the
    // per-event_type bottom-K sub-sketches — the state a distributed
    // build keeps per shard — merge into ONE global sketch by "K
    // smallest hashes of the concatenated sample lists" (associative,
    // commutative: exactly the partial-agg merge), and the merged
    // estimates are emitted BESIDE an independent single-pass global
    // bottom-K (TakeOrderedAndProject — per-partition heaps, no global
    // sort). The two paths must agree exactly: every global-bottom-K row
    // is inside its group's bottom-K, so merge loses nothing — the law
    // that makes the sketch safe to keep per-partition at 100 TB.
    "q_sketch_quantile_merge" -> ((s, d) => {
      val ev = quantileObs(t(s, d, "events"))
      val wq = Window.partitionBy("event_type")
        .orderBy(asc_nulls_last("hv"), asc_nulls_last("event_id"))
      val subs = ev
        .withColumn("srk", row_number().over(wq))
        .filter(col("srk") <= QuantK)
        .groupBy("event_type")
        .agg(collect_list(struct(col("hv"), col("event_id"),
          col("value"))).as("sk"))
      val merged = subs.agg(
        expr(s"slice(sort_array(flatten(collect_list(sk))), 1, $QuantK)")
          .as("mg"),
        count(lit(1)).as("n_subs"))
      val single = ev
        .orderBy(asc_nulls_last("hv"), asc_nulls_last("event_id"))
        .limit(QuantK)
        .agg(collect_list(struct(col("hv"), col("event_id"),
          col("value"))).as("sg"))
      val nn = ev.agg(count(lit(1)).as("n_full"))
      def estq(arr: String, q: String, alias: String) = expr(
        s"element_at(sort_array(transform($arr, x -> x.value)), " +
          s"CAST(ceil(($q) * size($arr)) AS INT))").as(alias)
      merged.crossJoin(single).crossJoin(nn)
        .filter(expr("size(mg) > 0"))
        .select(col("n_full"), col("n_subs"),
          expr("CAST(size(mg) AS BIGINT)").as("m_merged"),
          expr("CAST(size(sg) AS BIGINT)").as("m_single"),
          estq("mg", "0.5", "est_p50_merged"),
          estq("sg", "0.5", "est_p50_single"),
          estq("mg", "0.99", "est_p99_merged"),
          estq("sg", "0.99", "est_p99_single"))
    }),

    // Theta-sketch set algebra (Dasgupta et al., "Theta-Sketch
    // Framework", 2016) on the KMV machinery: DISTINCT-CUSTOMER overlap
    // of two order-year cohorts (1995 vs 1996 buyers — retention!)
    // WITHOUT materializing either set — the audience-overlap primitive
    // at 100 TB, where the exact answer costs a full shuffle of ids per
    // cohort. Each cohort keeps its K smallest distinct hashes; θ =
    // min of the two Kth values, falling back to the FULL hash space M
    // when a cohort holds fewer than K distinct values (theta's exact
    // mode — a small cohort is its own sample, so the estimator stays
    // correct at ANY fixture size); every retained hash < θ is a
    // uniform 1-in-(M/θ) sample of ITS set, so |union sample| · M/θ
    // and |in-both sample| · M/θ estimate union and intersection with
    // the same two IEEE ops the KMV row uses. Exact counts sit beside
    // the estimates. Deterministic end to end (shared md5 fold) →
    // fully hash-matched oracle; merges are K-list unions → partial
    // aggregation exact, the q_sketch_kmv scale argument.
    "q_sketch_theta" -> ((s, d) => {
      val ord = t(s, d, "orders")
      def cohort(yr: Int) = ord
        .filter(year(col("o_orderdate")) === yr)
        .select(expr(hvExpr("CAST(o_custkey AS STRING)")).as("hv"))
        .distinct()
      // θ_X = Kth smallest, or M in exact mode (|X| < K). orderBy +
      // limit plans as TakeOrderedAndProject — the DISTRIBUTED top-K
      // (per-partition K smallest, merged on one reducer), never a
      // global window; the aggregate is then over ≤ K rows.
      def kth(c: DataFrame) = c
        .orderBy(asc_nulls_last("hv")).limit(KmvK)
        .agg(coalesce(when(count(lit(1)) === KmvK, max(col("hv"))),
          lit(HashSpace)).as("theta"))
      val a = cohort(1995)
      val b = cohort(1996)
      val theta = kth(a).crossJoin(kth(b).withColumnRenamed(
          "theta", "theta_b"))
        .select(least(col("theta"), col("theta_b")).as("theta"))
      val below = a.select(col("hv"), lit(1).as("in_a"))
        .unionByName(b.select(col("hv"), lit(2).as("in_a")))
        .groupBy("hv").agg(sum("in_a").as("m"))
        .crossJoin(broadcast(theta))
        .filter(col("hv") < col("theta"))
      val est = "CAST(round(CAST(%s AS DOUBLE) * " +
        s"(CAST($HashSpace AS DOUBLE) / CAST(theta AS DOUBLE)), " +
        "0) AS BIGINT)"
      val exact = ord
        .filter(year(col("o_orderdate")).isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(max(year(col("o_orderdate")) === 1995).as("a"),
          max(year(col("o_orderdate")) === 1996).as("b"))
        .agg(count(lit(1)).as("exact_union"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L))
            .as("exact_inter"))
      below
        .groupBy("theta")
        .agg(count(lit(1)).as("n_union_sample"),
          sum(when(col("m") === 3, 1L).otherwise(0L))
            .as("n_inter_sample"))
        .withColumn("est_union", expr(est.format("n_union_sample")))
        .withColumn("est_inter", expr(est.format("n_inter_sample")))
        .crossJoin(exact)
        .select("theta", "n_union_sample", "est_union", "exact_union",
          "n_inter_sample", "est_inter", "exact_inter")
    }),

    // Bloom-prefiltered join — the sketch APPLIED as a join optimization
    // (what Spark's runtime bloom pruning does, built explicitly so the
    // mechanics are visible and oracle-provable): the selective dim side
    // (urgent orders) builds a 131072-bit k=3 filter with the
    // q_sketch_bloom hash family, the filter ships as a 32 KB literal in
    // the fact-side predicate (see [[bloomPrefiltered]] for why that
    // beats a 1-row broadcast join 10×), and only fact rows passing all
    // 3 codegen'd bit probes reach the real shuffle join. Bloom filters
    // have no false negatives, so the result IS the plain join — the
    // oracle states the plain join and the hash must match. At 100 TB
    // the prefilter cuts the fact-side shuffle by the filter's
    // selectivity for constant-size filter state.
    "q_join_bloom" -> ((s, d) => {
      bloomPrefiltered(s, d)
        .join(urgentOrders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          graft.Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(asc_nulls_last("l_returnflag"))
    })
  )

  private[graft] def urgentOrders(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))

  /** The lineitem rows surviving the urgent-orders Bloom probe — the
    * prefilter half of q_join_bloom, split out so the spec can measure
    * its selectivity directly.
    *
    * The filter words are materialized on the DRIVER and embedded as ONE
    * array literal — exactly how Spark's own runtime bloom pushdown
    * ships its filter (a driver-executed subquery whose result becomes a
    * literal in the probe-side predicate). The alternatives lose badly:
    * a 1-row broadcast join copies the 32 KB array into EVERY joined
    * fact row before the filter can drop it (measured 40 s at sf0.1 as
    * a word→bits map, 3.5 s as a dense array — vs 0.4 s as a literal),
    * while the literal is allocated once per task and the probe stays
    * inside whole-stage codegen. The driver transfer is the AGGREGATED
    * filter (≤ 4096 slim rows, constant in the data size) — the same
    * bounded driver round-trip as q_dedup_clusters' convergence count. */
  private[graft] def bloomPrefiltered(s: SparkSession, d: String)
      : DataFrame = {
    // xxhash64, NOT the md5 family: the sketch queries need md5 because
    // their contents are oracle-mirrored, but this filter never surfaces
    // (the oracle is the plain join) — it only needs build/probe
    // consistency within Spark, so it uses the native codegen'd hash
    // (the md5→conv detour costs a hex round-trip per row, and predicate
    // pushdown re-inlines it into each of the k probe terms — measured
    // 3× the scan cost at sf0.1)
    def pos(keyCol: String, i: Int): Column =
      pmod(xxhash64(col(keyCol)).bitwiseXOR(lit(MinHash.seeds(i))),
        lit(JoinBloomBits.toLong))
    val sparse = urgentOrders(s, d)
      .select(explode(array((0 until BloomK)
        .map(i => pos("o_orderkey", i)): _*)).as("p"))
      .select(shiftright(col("p"), 5).cast("int").as("word"),
        call_function("shiftleft", lit(1L),
          pmod(col("p"), lit(32L)).cast("int")).as("bit"))
      .groupBy("word").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val dense = Array.fill[Long](JoinBloomWords)(0L)
    sparse.foreach(r => dense(r.getInt(0)) = r.getLong(1))
    val bw = typedLit(dense.toSeq)
    val probe = (0 until BloomK).map { i =>
      val p = pos("l_orderkey", i)
      val word = (shiftright(p, 5) + lit(1)).cast("int")
      val mask = call_function("shiftleft", lit(1L),
        pmod(p, lit(32L)).cast("int"))
      element_at(bw, word).bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
    t(s, d, "lineitem").filter(probe)
  }

  /** Same one-digest nibble signs, BIGINT counters, the identical
    * fixed-order 16-term double tree. */
  private def amsOracle: String = {
    val signCols = (0 until 16).map(j =>
      s"(CAST('0x' || substring(h, ${j + 1}, 1) AS BIGINT) % 2) * 2 " +
        s"- 1 AS sg$j").mkString(",\n       |    ")
    val cAggs = (0 until 16).map(j =>
      s"CAST(SUM(sg$j * f) AS BIGINT) AS c$j").mkString(",\n       |    ")
    val cSq = (0 until 16)
      .map(j => s"CAST(c$j AS DOUBLE) * CAST(c$j AS DOUBLE)")
      .mkString(" + ")
    s"""WITH u AS (
       |  SELECT user_id, COUNT(*) AS f FROM events GROUP BY 1
       |), hh AS (
       |  SELECT f, md5('ams_' || CAST(user_id AS VARCHAR)) AS h
       |  FROM u
       |), sg AS (
       |  SELECT f,
       |    $signCols
       |  FROM hh
       |), ag AS (
       |  SELECT SUM(CAST(f AS HUGEINT) * CAST(f AS HUGEINT)) AS f2x,
       |    $cAggs
       |  FROM sg
       |), est AS (
       |  SELECT CAST(CAST(f2x AS VARCHAR) AS DOUBLE) AS f2_exact,
       |    ($cSq) / CAST(16 AS DOUBLE) AS f2_est
       |  FROM ag
       |)
       |SELECT f2_exact, f2_est,
       |  abs(f2_est - f2_exact) / f2_exact AS rel_err,
       |  CAST(16 AS BIGINT) AS n_counters
       |FROM est""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_sketch_ams" -> amsOracle,
    // Same 60-bit row-identity fold; the bottom-K and the nearest-rank
    // selections restate the Spark side as windows (the PLAN differs —
    // the RESULT is pure value selection, so it hash-matches exactly).
    "q_sketch_quantile" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id, value,
         |    ${sqlHv("'qq_' || CAST(event_id AS VARCHAR)")} AS hv
         |  FROM events WHERE value IS NOT NULL
         |), samp AS (
         |  SELECT event_type, event_id, value FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type
         |      ORDER BY hv ASC, event_id ASC) AS srk
         |    FROM ev) WHERE srk <= $QuantK
         |), rk AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY value ASC, event_id ASC) AS vrk,
         |    COUNT(*) OVER (PARTITION BY event_type) AS m
         |  FROM samp
         |), nn AS (
         |  SELECT event_type, COUNT(*) AS n_full FROM ev GROUP BY 1
         |), est AS (
         |  SELECT event_type, m,
         |    MAX(CASE WHEN vrk = CAST(ceil(0.5 * m) AS BIGINT)
         |      THEN value END) AS est_p50,
         |    MAX(CASE WHEN vrk = CAST(ceil(0.9 * m) AS BIGINT)
         |      THEN value END) AS est_p90,
         |    MAX(CASE WHEN vrk = CAST(ceil(0.99 * m) AS BIGINT)
         |      THEN value END) AS est_p99
         |  FROM rk GROUP BY 1, 2
         |)
         |SELECT e.event_type, n_full, CAST(m AS BIGINT) AS m,
         |  est_p50, est_p90, est_p99
         |FROM est e JOIN nn ON nn.event_type = e.event_type
         |ORDER BY e.event_type ASC NULLS LAST""".stripMargin,

    // Merged-vs-single equality is a THEOREM of bottom-K (every global
    // bottom-K row is inside its group's bottom-K), so the oracle
    // computes the global sample once and emits it for both paths; the
    // Spark side must land the identical values through the actual
    // merge machinery.
    "q_sketch_quantile_merge" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id, value,
         |    ${sqlHv("'qq_' || CAST(event_id AS VARCHAR)")} AS hv
         |  FROM events WHERE value IS NOT NULL
         |), g AS (
         |  SELECT event_id, value FROM (
         |    SELECT *, row_number() OVER (ORDER BY hv ASC, event_id ASC)
         |      AS grk FROM ev)
         |  WHERE grk <= $QuantK
         |), rk AS (
         |  SELECT value,
         |    row_number() OVER (ORDER BY value ASC, event_id ASC) AS vrk,
         |    COUNT(*) OVER () AS m
         |  FROM g
         |), est AS (
         |  SELECT m,
         |    MAX(CASE WHEN vrk = CAST(ceil(0.5 * m) AS BIGINT)
         |      THEN value END) AS e50,
         |    MAX(CASE WHEN vrk = CAST(ceil(0.99 * m) AS BIGINT)
         |      THEN value END) AS e99
         |  FROM rk GROUP BY 1
         |), nn AS (
         |  SELECT COUNT(*) AS n_full,
         |    COUNT(DISTINCT event_type) AS n_subs
         |  FROM ev
         |)
         |SELECT n_full, CAST(n_subs AS BIGINT) AS n_subs,
         |  CAST(m AS BIGINT) AS m_merged, CAST(m AS BIGINT) AS m_single,
         |  e50 AS est_p50_merged, e50 AS est_p50_single,
         |  e99 AS est_p99_merged, e99 AS est_p99_single
         |FROM est, nn""".stripMargin,
    // Same 60-bit fold, bit-length ρ, shift-built powers of two, and
    // verbatim raw/small-range trees (`//` and `<<` spellings produce
    // the same exact integers).
    "q_sketch_hll" ->
      s"""WITH hv AS (
         |  SELECT event_type, CAST('0x' ||
         |    substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
         |    AS hv
         |  FROM events
         |), rr AS (
         |  SELECT event_type, hv // 4503599627370496 AS bucket,
         |    hv % 4503599627370496 AS w
         |  FROM hv
         |), rho AS (
         |  SELECT event_type, bucket,
         |    CASE WHEN w = 0 THEN 53 ELSE
         |      52 - (length(bin(w)) - 1) END AS rho
         |  FROM rr
         |), regs AS (
         |  SELECT event_type, bucket, MAX(rho) AS mj
         |  FROM rho GROUP BY 1, 2
         |), wm AS (
         |  SELECT *, MAX(mj) OVER (PARTITION BY event_type) AS mmax
         |  FROM regs
         |), per AS (
         |  SELECT event_type, mmax, COUNT(*) AS n_present,
         |    CAST(SUM(CAST(1 AS BIGINT) << CAST(mmax - mj AS INT))
         |      AS BIGINT) AS t_present
         |  FROM wm GROUP BY 1, 2
         |), x AS (
         |  SELECT event_type, mmax, n_present,
         |    256 - n_present AS v_zeros,
         |    t_present + (256 - n_present)
         |      * (CAST(1 AS BIGINT) << CAST(mmax AS INT)) AS t_sum
         |  FROM per
         |), r2 AS (
         |  SELECT *,
         |    (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
         |      + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
         |      * CAST(65536 AS DOUBLE)
         |      * CAST((CAST(1 AS BIGINT) << CAST(mmax AS INT))
         |        AS DOUBLE) / CAST(t_sum AS DOUBLE) AS raw_est,
         |    greatest(256 - n_present, CAST(1 AS BIGINT)) AS vsafe
         |  FROM x
         |), lg AS (
         |  SELECT *, ${graft.Det.sqlPlog2Cols("vsafe", "q")} FROM r2
         |), e AS (
         |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
         |  FROM events GROUP BY 1
         |)
         |SELECT l.event_type, n_present, v_zeros, mmax, t_sum, raw_est,
         |  CASE WHEN raw_est <= CAST(640 AS DOUBLE) AND v_zeros > 0
         |    THEN CAST(round(CAST(256 AS DOUBLE)
         |      * CAST(0.6931471805599453 AS DOUBLE)
         |      * (CAST(8 AS DOUBLE) - ql2), 0) AS BIGINT)
         |    ELSE CAST(round(raw_est, 0) AS BIGINT) END AS est_distinct,
         |  exact_distinct
         |FROM lg l JOIN e ON e.event_type = l.event_type
         |ORDER BY l.event_type ASC NULLS LAST""".stripMargin,

    // The q_sketch_hll estimator CTEs keyed by cohort tag; the union
    // rows re-fold the concatenated key stream (register-merge
    // equivalence by construction).
    "q_sketch_hll_union" ->
      s"""WITH tagged AS (
         |  SELECT 'a' AS cohort, o_custkey AS k FROM orders
         |  WHERE year(o_orderdate) = 1995
         |  UNION ALL
         |  SELECT 'b' AS cohort, o_custkey AS k FROM orders
         |  WHERE year(o_orderdate) = 1996
         |), allk AS (
         |  SELECT cohort, k FROM tagged
         |  UNION ALL
         |  SELECT 'u' AS cohort, k FROM tagged
         |), hv AS (
         |  SELECT cohort, CAST('0x' ||
         |    substring(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |  FROM allk
         |), rr AS (
         |  SELECT cohort, hv // 4503599627370496 AS bucket,
         |    hv % 4503599627370496 AS w
         |  FROM hv
         |), rho AS (
         |  SELECT cohort, bucket,
         |    CASE WHEN w = 0 THEN 53 ELSE
         |      52 - (length(bin(w)) - 1) END AS rho
         |  FROM rr
         |), regs AS (
         |  SELECT cohort, bucket, MAX(rho) AS mj
         |  FROM rho GROUP BY 1, 2
         |), wm AS (
         |  SELECT *, MAX(mj) OVER (PARTITION BY cohort) AS mmax
         |  FROM regs
         |), per AS (
         |  SELECT cohort, mmax, COUNT(*) AS n_present,
         |    CAST(SUM(CAST(1 AS BIGINT) << CAST(mmax - mj AS INT))
         |      AS BIGINT) AS t_present
         |  FROM wm GROUP BY 1, 2
         |), x AS (
         |  SELECT cohort, mmax, n_present,
         |    256 - n_present AS v_zeros,
         |    t_present + (256 - n_present)
         |      * (CAST(1 AS BIGINT) << CAST(mmax AS INT)) AS t_sum
         |  FROM per
         |), r2 AS (
         |  SELECT *,
         |    (CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
         |      + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
         |      * CAST(65536 AS DOUBLE)
         |      * CAST((CAST(1 AS BIGINT) << CAST(mmax AS INT))
         |        AS DOUBLE) / CAST(t_sum AS DOUBLE) AS raw_est,
         |    greatest(256 - n_present, CAST(1 AS BIGINT)) AS vsafe
         |  FROM x
         |), lg AS (
         |  SELECT *, ${graft.Det.sqlPlog2Cols("vsafe", "q")} FROM r2
         |), e AS (
         |  SELECT cohort, COUNT(DISTINCT k) AS exact_distinct
         |  FROM allk GROUP BY 1
         |)
         |SELECT l.cohort, n_present, v_zeros, mmax, t_sum,
         |  CASE WHEN raw_est <= CAST(640 AS DOUBLE) AND v_zeros > 0
         |    THEN CAST(round(CAST(256 AS DOUBLE)
         |      * CAST(0.6931471805599453 AS DOUBLE)
         |      * (CAST(8 AS DOUBLE) - ql2), 0) AS BIGINT)
         |    ELSE CAST(round(raw_est, 0) AS BIGINT) END AS est_distinct,
         |  exact_distinct
         |FROM lg l JOIN e ON e.cohort = l.cohort
         |ORDER BY l.cohort ASC NULLS LAST""".stripMargin,

    // Same md5 bucket fold, the identical portable-log2 chain (lateral
    // column aliases), and the verbatim estimate tree.
    "q_sketch_linear" ->
      s"""WITH b AS (
         |  SELECT DISTINCT CAST('0x' ||
         |    substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |    % 4096 AS bucket
         |  FROM events
         |), u AS (
         |  SELECT CAST(4096 AS BIGINT) AS m, COUNT(*) AS used,
         |    CAST(4096 AS BIGINT) - COUNT(*) AS z,
         |    greatest(CAST(4096 AS BIGINT) - COUNT(*),
         |      CAST(1 AS BIGINT)) AS zsafe
         |  FROM b
         |), l AS (
         |  SELECT m, used, z, ${graft.Det.sqlPlog2Cols("zsafe", "q")}
         |  FROM u
         |), e AS (
         |  SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events
         |)
         |SELECT m, used, z,
         |  CASE WHEN z = 0 THEN NULL ELSE
         |    CAST(round(CAST(4096 AS DOUBLE)
         |      * CAST(0.6931471805599453 AS DOUBLE)
         |      * (CAST(12 AS DOUBLE) - ql2), 0) AS BIGINT) END
         |    AS est_distinct,
         |  exact_distinct
         |FROM l, e""".stripMargin,

    "q_sketch_countmin" ->
      s"""WITH tf AS (
         |  SELECT tok, COUNT(*) AS n FROM (
         |    SELECT unnest(string_split(text, ' ')) AS tok
         |    FROM documents WHERE text IS NOT NULL
         |  ) WHERE length(tok) > 0 GROUP BY tok
         |), h AS (
         |  SELECT tok, n, ${sqlHv("tok")} AS hv FROM tf
         |), sd AS (
         |  SELECT * FROM (VALUES ${seedRows}) s(d, seed)
         |), cells AS (
         |  SELECT sd.d, xor(h.hv, sd.seed) % $CmWidth AS c,
         |    CAST(SUM(h.n) AS BIGINT) AS cell
         |  FROM h, sd GROUP BY 1, 2
         |), probes AS (
         |  SELECT tok, n, hv FROM h
         |  ORDER BY n DESC NULLS LAST, tok ASC NULLS LAST LIMIT 10
         |)
         |SELECT p.tok, p.n AS true_n, min(c.cell) AS est_n
         |FROM probes p
         |JOIN sd ON true
         |JOIN cells c ON c.d = sd.d
         |  AND c.c = xor(p.hv, sd.seed) % $CmWidth
         |GROUP BY p.tok, p.n
         |ORDER BY true_n DESC NULLS LAST, tok ASC NULLS LAST""".stripMargin,

    "q_sketch_bloom" -> {
      val seeds3 = (0 until BloomK)
        .map(i => s"(${MinHash.seeds(i)})").mkString(", ")
      s"""WITH tf AS (
         |  SELECT tok, COUNT(*) AS n FROM (
         |    SELECT unnest(string_split(text, ' ')) AS tok
         |    FROM documents WHERE text IS NOT NULL
         |  ) WHERE length(tok) > 0 GROUP BY tok
         |), h AS (
         |  SELECT tok, n, ${sqlHv("tok")} AS hv FROM tf
         |), ks AS (
         |  SELECT * FROM (VALUES ${seeds3}) s(seed)
         |), pos AS (
         |  SELECT xor(h.hv, ks.seed) % $BloomBits AS pos FROM h, ks
         |), words AS (
         |  SELECT pos // 32 AS word,
         |    bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
         |  FROM pos GROUP BY 1
         |), probes AS (
         |  (SELECT tok, hv FROM h
         |   ORDER BY n DESC NULLS LAST, tok ASC NULLS LAST LIMIT 5)
         |  UNION ALL
         |  (SELECT 'zz_absent_' || CAST(r_regionkey AS VARCHAR) AS tok,
         |    ${sqlHv("'zz_absent_' || CAST(r_regionkey AS VARCHAR)")} AS hv
         |  FROM region WHERE r_regionkey < 5)
         |), pp AS (
         |  SELECT p.tok, xor(p.hv, ks.seed) % $BloomBits AS pos
         |  FROM probes p, ks
         |), mem AS (
         |  SELECT pp.tok,
         |    bool_and((coalesce(w.bits, 0) &
         |      (1::BIGINT << CAST(pp.pos % 32 AS INT))) <> 0)
         |      AS bloom_member
         |  FROM pp LEFT JOIN words w ON w.word = pp.pos // 32
         |  GROUP BY pp.tok
         |)
         |SELECT m.tok,
         |  coalesce(tf.tok IS NOT NULL, false) AS present,
         |  m.bloom_member
         |FROM mem m LEFT JOIN tf ON m.tok = tf.tok
         |ORDER BY m.tok ASC NULLS LAST""".stripMargin
    },

    "q_sketch_kmv" ->
      s"""WITH hv AS (
         |  SELECT DISTINCT l_returnflag AS flag,
         |    ${sqlHv("CAST(l_partkey AS VARCHAR)")} AS hv
         |  FROM lineitem
         |), rk AS (
         |  SELECT flag, hv,
         |    row_number() OVER (PARTITION BY flag ORDER BY hv ASC) AS rk
         |  FROM hv
         |), sk AS (
         |  SELECT flag, COUNT(*) AS k_used, MAX(hv) AS kth_hv
         |  FROM rk WHERE rk <= $KmvK GROUP BY flag
         |), ex AS (
         |  SELECT l_returnflag AS flag,
         |    COUNT(DISTINCT l_partkey) AS exact_distinct
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT sk.flag, sk.k_used, sk.kth_hv,
         |  CASE WHEN sk.k_used < $KmvK THEN sk.k_used ELSE
         |    CAST(round((CAST(sk.k_used AS DOUBLE) - CAST(1 AS DOUBLE))
         |      * (CAST($HashSpace AS DOUBLE) / CAST(sk.kth_hv AS DOUBLE)),
         |      0) AS BIGINT) END AS est_distinct,
         |  ex.exact_distinct
         |FROM sk JOIN ex ON sk.flag = ex.flag
         |ORDER BY sk.flag ASC NULLS LAST""".stripMargin,

    "q_sketch_theta" -> {
      val est = "CAST(round(CAST(%s AS DOUBLE) * " +
        s"(CAST($HashSpace AS DOUBLE) / CAST(theta AS DOUBLE)), " +
        "0) AS BIGINT)"
      s"""WITH ca AS (
         |  SELECT DISTINCT ${sqlHv("CAST(o_custkey AS VARCHAR)")} AS hv
         |  FROM orders WHERE year(o_orderdate) = 1995
         |), cb AS (
         |  SELECT DISTINCT ${sqlHv("CAST(o_custkey AS VARCHAR)")} AS hv
         |  FROM orders WHERE year(o_orderdate) = 1996
         |), ka AS (
         |  SELECT coalesce(max(CASE WHEN rk = $KmvK THEN hv END),
         |    $HashSpace) AS theta FROM
         |    (SELECT hv, row_number() OVER (ORDER BY hv ASC) AS rk
         |     FROM ca)
         |), kb AS (
         |  SELECT coalesce(max(CASE WHEN rk = $KmvK THEN hv END),
         |    $HashSpace) AS theta FROM
         |    (SELECT hv, row_number() OVER (ORDER BY hv ASC) AS rk
         |     FROM cb)
         |), th AS (
         |  SELECT least(ka.theta, kb.theta) AS theta FROM ka, kb
         |), below AS (
         |  SELECT u.hv, SUM(u.in_a) AS m, MAX(th.theta) AS theta
         |  FROM (
         |    SELECT hv, 1 AS in_a FROM ca
         |    UNION ALL
         |    SELECT hv, 2 AS in_a FROM cb
         |  ) u, th
         |  WHERE u.hv < th.theta
         |  GROUP BY u.hv
         |), ex AS (
         |  SELECT COUNT(*) AS exact_union,
         |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS exact_inter
         |  FROM (
         |    SELECT o_custkey,
         |      bool_or(year(o_orderdate) = 1995) AS a,
         |      bool_or(year(o_orderdate) = 1996) AS b
         |    FROM orders
         |    WHERE year(o_orderdate) IN (1995, 1996)
         |    GROUP BY o_custkey
         |  )
         |)
         |SELECT s.theta, s.n_union_sample,
         |  ${est.format("s.n_union_sample")} AS est_union,
         |  ex.exact_union, s.n_inter_sample,
         |  ${est.format("s.n_inter_sample")} AS est_inter,
         |  ex.exact_inter
         |FROM (
         |  SELECT theta, COUNT(*) AS n_union_sample,
         |    CAST(SUM(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_inter_sample
         |  FROM below GROUP BY theta
         |) s, ex""".stripMargin
    },

    // The plain join — no bloom anywhere: the filter admits every true
    // match (no false negatives) and the exact join removes its false
    // positives, so the prefiltered plan must hash-match this.
    "q_join_bloom" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_items,
         |  ${graft.Det.sqlDsum("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag ASC NULLS LAST""".stripMargin
  )
}
