package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Breadth operators rounding out the everyday surface: deterministic
  * hash splits (the train/test assignment every training-data pipeline
  * needs), null-handling scalars, multiset (ALL) set operations, exact
  * interpolated percentiles, and outer explode.
  *
  * Scale notes: the hash split is a pure narrow map (no shuffle, no RNG
  * state — the same row lands in the same split on any cluster, any
  * partitioning, any rerun); percentiles use one window sort per group —
  * at 100 TB that is the same shuffle a groupBy would need; the rest are
  * projections.
  */
object Breadth {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Deterministic hash-split expression: md5 of the key's decimal string
    * → first 8 hex digits → bucket in [0, 100). Reproducible everywhere;
    * the standard seed-free train/test assignment. Single source of truth
    * for every split in the library (the declared query AND
    * [[graft.examples.TrainingDataPipeline]]) so thresholds can differ
    * but the assignment never can. */
  def splitBucket(keyCol: String): String =
    s"CAST(conv(substring(md5(CAST($keyCol AS STRING)), 1, 8), 16, 10) " +
      "AS BIGINT) % 100"

  private val docBucket = splitBucket("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Column profiling — the schema-inspection report every ingest step
    // runs first (null rates, cardinalities): ONE pass computes
    // count/nulls/distinct for five lineitem columns, then pivots the
    // single result row into one row per column with an in-row explode
    // (the output is ≤ |columns| rows at any corpus size). The
    // multi-column exact countDistinct expands the scan ×5 before the
    // shuffle — the price of exactness; the HLL variant for wide tables
    // is q_agg_approx_distinct's pattern.
    "q_schema_profile" -> ((s, d) => {
      val cols = Seq("l_quantity", "l_discount", "l_returnflag",
        "l_linestatus", "l_partkey")
      val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")))
      t(s, d, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c => struct(
          lit(c).as("column_name"), col("n_rows"),
          col(s"nn_$c").as("n_nulls"),
          col(s"nd_$c").as("n_distinct"))): _*)).as("r"))
        .select("r.*")
        .orderBy(asc_nulls_last("column_name"))
    }),

    // Reproducible train/test split: 80/20 by key hash, verified by the
    // per-split counts, id extrema and an id-sum checksum.
    "q_split_hash" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("split",
          when(expr(docBucket) < 80, "train").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(asc_nulls_last("split"))),

    // Stratified downsampling: per-language keep-rates over the same
    // seed-free hash buckets (en is over-represented in the corpus, so it
    // keeps 10%; mid-resource de/fr keep 40%; low-resource strata keep
    // 70%). The per-stratum counts + an id-sum checksum of the kept rows
    // prove the exact membership, not just the sizes. Pure narrow map +
    // one groupBy shuffle — the assignment is partitioning-invariant, so
    // at 100 TB the sample is reproducible across reruns and cluster
    // layouts.
    "q_sample_stratified" -> ((s, d) => {
      val rate = expr(
        "CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 40 WHEN 'fr' THEN 40 " +
          "ELSE 70 END")
      t(s, d, "documents")
        .withColumn("keep", expr(docBucket) < rate)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("keep"), lit(1))).as("n_sampled"),
          sum(when(col("keep"), col("doc_id"))).as("sample_id_sum"))
        .orderBy(asc_nulls_last("lang"), asc_nulls_last("source"))
    }),

    // Exact COUNT DISTINCT via bitmap aggregation (the ClickHouse
    // groupBitmap / roaring-bitmap technique, on 32-bit words): user ids
    // bucket into (key DIV 32) words, each word bit_or-accumulates its
    // members' bits — idempotent, commutative, partial-aggregation-
    // friendly — and the distinct count is the popcount sum. At 100 TB
    // this replaces the Expand-based distinct aggregate (which doubles
    // the shuffle) with two slim shuffles of pre-combined words; the
    // same words are also the mergeable distinct STATE a rollup layer
    // stores (bitmaps OR across periods; counts never re-scan). The
    // plain countDistinct rides along so the identity is visible in the
    // output and pinned by the oracle. Streaming twin:
    // [[graft.streaming.StatefulTwins.bitmapDistinctStream]] (the same
    // words OR-merged as per-key state, replay-idempotent).
    "q_agg_bitmap" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          // Floor division in pure 64-bit integer math (the numerator is
          // an exact multiple of 32, so truncating DIV == floor for any
          // sign), and pmod keeps the bit index in [0, 32) — the encoding
          // is engine- and sign-robust, no IEEE double in the key path.
          expr("(user_id - pmod(user_id, 32)) DIV 32").as("word"),
          expr("CAST(shiftleft(1L, CAST(pmod(user_id, 32) AS INT)) " +
            "AS BIGINT)").as("bit"),
          col("user_id"))
        .groupBy("event_type", "word")
        .agg(expr("bit_or(bit)").as("bits"),
          countDistinct(col("user_id")).as("nd_word"))
        .groupBy("event_type")
        .agg(sum(expr("bit_count(bits)")).as("n_distinct_bitmap"),
          sum("nd_word").as("n_distinct_exact"))
        .orderBy(asc_nulls_last("event_type"))),

    // Deterministic EXACT-k reservoir sample — the fixed-size eval-set
    // draw (q_split_hash keeps a fixed FRACTION; evaluation wants
    // exactly k rows regardless of corpus size). Rank = md5 of the key
    // under a purpose-distinct salt: a uniform, seed-free, total order,
    // so "first 64 by rank" is a uniform exact-k sample that is
    // IDENTICAL on any cluster layout and any rerun. Plans as
    // TakeOrderedAndProject: each partition keeps its local top-64
    // heap, the driver merges — no global sort, the same 100 TB shape
    // as q_sort_limit.
    "q_sample_reservoir" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("rk",
          md5(concat(lit("rsv_"), col("doc_id").cast("string"))))
        .orderBy(asc_nulls_last("rk"), asc_nulls_last("doc_id"))
        .limit(64)
        .select("doc_id", "lang", "source", "n_chars", "rk")),

    // Weighted (importance) sampling — the quality-proportional document
    // sampler of a data-mixing pipeline: each document's keep
    // probability is its OWN data-derived weight (per-mille, here a
    // length-based quality proxy clamped to [100, 900]), decided by the
    // same seed-free md5 bucket family as q_split_hash at 1/1000 grain.
    // Partitioning-invariant like all the md5 samplers: the kept SET is
    // identical on any cluster layout, proven by the id-sum checksum;
    // w_sum is the exact expected kept count ×1000, so the oracle also
    // pins the weight assignment itself, not just the outcome. Pure
    // narrow map + one groupBy shuffle.
    "q_sample_weighted" -> ((s, d) => {
      val bucket1000 = s"CAST(conv(substring(md5(CAST(doc_id AS STRING))," +
        " 1, 8), 16, 10) AS BIGINT) % 1000"
      t(s, d, "documents")
        .withColumn("w", expr(
          "least(CAST(900 AS BIGINT), greatest(CAST(100 AS BIGINT), " +
            "CAST(n_chars AS BIGINT) DIV 5))"))
        .withColumn("keep", expr(bucket1000) < col("w"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("keep"), lit(1))).as("n_kept"),
          sum(col("w")).as("w_sum"),
          sum(when(col("keep"), col("doc_id"))).as("kept_id_sum"))
        .orderBy(asc_nulls_last("lang"))
    }),

    // Null-handling scalar surface. Nulls are CREATED with nullif (the
    // fixture tables are dense), then routed through coalesce / greatest
    // / least / CASE — both engines ignore nulls inside greatest/least.
    "q_null_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_filled"),
          when(nullif(col("o_orderstatus"), lit("O")).isNotNull,
            lit("closed-ish")).otherwise(lit("open")).as("nvl2_like"),
          greatest(col("o_totalprice"), lit(100000.0),
            lit(null).cast("double")).as("g"),
          least(col("o_totalprice"), lit(100000.0),
            lit(null).cast("double")).as("l"))
        .orderBy(asc_nulls_last("o_orderkey"))),

    // Multiset set operations (bag semantics): nation keys of customers
    // vs suppliers WITH multiplicities.
    "q_setops_all" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("k"))
      val su = t(s, d, "supplier").select(col("s_nationkey").as("k"))
      c.exceptAll(su)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_last("k"))
    }),

    // Exact interpolated percentiles (the percentile_cont formula spelled
    // out so both engines compute the identical double arithmetic):
    // pos = (n-1)*q, v = v_lo + (pos - floor(pos)) * (v_hi - v_lo).
    "q_percentile_exact" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
        .orderBy(asc_nulls_last("value"), asc_nulls_last("event_id"))
      val ranked = t(s, d, "events")
        .select("event_type", "event_id", "value")
        .withColumn("rn", row_number().over(w))
      val sized = ranked.groupBy("event_type")
        .agg(count(lit(1)).as("n"))
      def pct(q: String, alias: String) = {
        // positions are exact in double for n < 2^50
        expr(s"max(CASE WHEN rn = CAST(floor(($q) * (n - 1)) AS BIGINT) + 1 " +
          s"THEN value END) + (($q) * (n - 1) - floor(($q) * (n - 1))) * " +
          s"(max(CASE WHEN rn = CAST(ceil(($q) * (n - 1)) AS BIGINT) + 1 " +
          s"THEN value END) - max(CASE WHEN rn = " +
          s"CAST(floor(($q) * (n - 1)) AS BIGINT) + 1 THEN value END))")
          .as(alias)
      }
      ranked.join(sized, "event_type")
        .groupBy("event_type", "n")
        .agg(pct("0.25", "p25"), pct("0.5", "p50"), pct("0.75", "p75"))
        .select("event_type", "n", "p25", "p50", "p75")
        .orderBy(asc_nulls_last("event_type"))
    }),

    // Outer explode: empty token arrays keep their row (null token) —
    // the generator form that does not silently drop parents.
    "q_explode_outer" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("toks",
          when(col("doc_id") % 10 === 0, array().cast("array<string>"))
            .otherwise(split(col("text"), " ")))
        .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_rows"),
          count(col("tok")).as("n_tokens"))
        .orderBy(asc_nulls_last("doc_id"))),

    // Quartile bucketing: ntile(4) per order status (identical remainder
    // rule on both engines: first buckets take the extra rows), then
    // per-quartile aggregates with the exact-decimal sum convention.
    "q_window_ntile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderstatus")
        .orderBy(asc_nulls_last("o_totalprice"), asc_nulls_last("o_orderkey"))
      t(s, d, "orders")
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy("o_orderstatus", "quartile")
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(asc_nulls_last("o_orderstatus"),
          asc_nulls_last("quartile"))
    }),

    // Ordered-collect aggregate serialized to a scalar (the driver's
    // checker row-sorts with pandas and can't hash list cells): the five
    // lowest order keys per priority as a CSV. sort_array makes the
    // collect order partition-invariant — the AQE/cluster-layout-proof
    // form of collect_list.
    "q_agg_collect" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          concat_ws(",", expr(
            "transform(slice(sort_array(collect_list(o_orderkey)), 1, 5), " +
              "x -> CAST(x AS STRING))")).as("low5_keys"))
        .orderBy(asc_nulls_last("o_orderpriority"))),

    // Boolean aggregates: bool_and / bool_or / count_if — same names and
    // semantics on both engines (order-insensitive, so partition-proof).
    "q_agg_bool" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("bool_and(value > 0)").as("all_pos"),
          expr("bool_or(value > 400)").as("any_big"),
          expr("count_if(value > 200)").as("n_over200"))
        .orderBy(asc_nulls_last("event_type"))),

    // Deterministic MODE per group: most frequent event_type per user,
    // ties broken by type ascending. Spark's mode() picks an arbitrary
    // tie winner, so the window formulation with an explicit tie-break
    // is the only engine-portable form. Two hash aggregations + one
    // bounded window — partial aggregation absorbs key skew.
    "q_agg_mode" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(desc_nulls_last("c"), asc_nulls_last("event_type"))
      t(s, d, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"),
          col("c").as("n"))
        .orderBy(asc_nulls_last("user_id"))
    }),

    // Fixed-width value histogram: bin = floor(value / width). The
    // division is ONE IEEE double op (identical on both engines); bins,
    // counts and the decimal sum are exact. Narrow map + one shuffle.
    "q_stats_histogram" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("bin", floor(col("value") / 50.0).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          sum(col("value")
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(18, 6)))
            .cast("double").as("sum_v"))
        .orderBy(asc_nulls_last("bin")))
  )

  val oracle: Map[String, String] = Map(
    "q_schema_profile" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_q,
        |    COUNT(DISTINCT l_quantity) AS nd_q,
        |    CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_d,
        |    COUNT(DISTINCT l_discount) AS nd_d,
        |    CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_r,
        |    COUNT(DISTINCT l_returnflag) AS nd_r,
        |    CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_l,
        |    COUNT(DISTINCT l_linestatus) AS nd_l,
        |    CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_p,
        |    COUNT(DISTINCT l_partkey) AS nd_p
        |  FROM lineitem)
        |SELECT 'l_quantity' AS column_name, n_rows, nn_q AS n_nulls, nd_q AS n_distinct FROM a
        |UNION ALL SELECT 'l_discount', n_rows, nn_d, nd_d FROM a
        |UNION ALL SELECT 'l_returnflag', n_rows, nn_r, nd_r FROM a
        |UNION ALL SELECT 'l_linestatus', n_rows, nn_l, nd_l FROM a
        |UNION ALL SELECT 'l_partkey', n_rows, nn_p, nd_p FROM a
        |ORDER BY column_name ASC NULLS LAST""".stripMargin,

    "q_split_hash" ->
      """SELECT CASE WHEN CAST('0x' ||
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |    % 100 < 80 THEN 'train' ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 1
        |ORDER BY split ASC NULLS LAST""".stripMargin,

    "q_sample_stratified" ->
      """WITH b AS (
        |  SELECT lang, source, doc_id,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 100 <
        |    CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 40
        |      WHEN 'fr' THEN 40 ELSE 70 END AS keep
        |  FROM documents
        |)
        |SELECT lang, source, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN keep THEN 1 END) AS n_sampled,
        |  CAST(SUM(CASE WHEN keep THEN doc_id END) AS BIGINT)
        |    AS sample_id_sum
        |FROM b GROUP BY lang, source
        |ORDER BY lang ASC NULLS LAST, source ASC NULLS LAST""".stripMargin,

    // Same two-level word/popcount path; summing the per-word distinct
    // counts is exact because words partition the id space.
    "q_agg_bitmap" ->
      """WITH w AS (
        |  SELECT event_type,
        |    (user_id - ((user_id % 32) + 32) % 32) // 32 AS word,
        |    bit_or(1::BIGINT
        |      << CAST(((user_id % 32) + 32) % 32 AS INT)) AS bits,
        |    COUNT(DISTINCT user_id) AS nd_word
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type,
        |  CAST(SUM(bit_count(bits)) AS BIGINT) AS n_distinct_bitmap,
        |  CAST(SUM(nd_word) AS BIGINT) AS n_distinct_exact
        |FROM w GROUP BY event_type
        |ORDER BY event_type ASC NULLS LAST""".stripMargin,

    "q_sample_reservoir" ->
      """SELECT doc_id, lang, source, n_chars,
        |  md5('rsv_' || CAST(doc_id AS VARCHAR)) AS rk
        |FROM documents
        |ORDER BY rk ASC NULLS LAST, doc_id ASC NULLS LAST
        |LIMIT 64""".stripMargin,

    "q_sample_weighted" ->
      """WITH b AS (
        |  SELECT lang, doc_id,
        |    least(900, greatest(100, n_chars // 5)) AS w,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 1000 AS bkt
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN bkt < w THEN 1 END) AS n_kept,
        |  CAST(SUM(w) AS BIGINT) AS w_sum,
        |  CAST(SUM(CASE WHEN bkt < w THEN doc_id END) AS BIGINT)
        |    AS kept_id_sum
        |FROM b GROUP BY lang
        |ORDER BY lang ASC NULLS LAST""".stripMargin,

    "q_null_funcs" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
        |  CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
        |    THEN 'closed-ish' ELSE 'open' END AS nvl2_like,
        |  greatest(o_totalprice, 100000.0, NULL) AS g,
        |  least(o_totalprice, 100000.0, NULL) AS l
        |FROM orders ORDER BY o_orderkey ASC NULLS LAST""".stripMargin,

    "q_setops_all" ->
      """SELECT k, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey AS k FROM supplier
        |) GROUP BY k ORDER BY k ASC NULLS LAST""".stripMargin,

    "q_percentile_exact" ->
      """WITH r AS (
        |  SELECT event_type, value, row_number() OVER (
        |    PARTITION BY event_type
        |    ORDER BY value ASC NULLS LAST, event_id ASC NULLS LAST) AS rn
        |  FROM events
        |), s AS (
        |  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
        |)
        |SELECT r.event_type, s.n,
        |  max(CASE WHEN rn = CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1
        |    THEN value END) + (0.25 * (n - 1) - floor(0.25 * (n - 1))) *
        |    (max(CASE WHEN rn = CAST(ceil(0.25 * (n - 1)) AS BIGINT) + 1
        |    THEN value END) - max(CASE WHEN rn =
        |    CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1 THEN value END))
        |    AS p25,
        |  max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
        |    THEN value END) + (0.5 * (n - 1) - floor(0.5 * (n - 1))) *
        |    (max(CASE WHEN rn = CAST(ceil(0.5 * (n - 1)) AS BIGINT) + 1
        |    THEN value END) - max(CASE WHEN rn =
        |    CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 THEN value END))
        |    AS p50,
        |  max(CASE WHEN rn = CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1
        |    THEN value END) + (0.75 * (n - 1) - floor(0.75 * (n - 1))) *
        |    (max(CASE WHEN rn = CAST(ceil(0.75 * (n - 1)) AS BIGINT) + 1
        |    THEN value END) - max(CASE WHEN rn =
        |    CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1 THEN value END))
        |    AS p75
        |FROM r JOIN s ON r.event_type = s.event_type
        |GROUP BY r.event_type, s.n
        |ORDER BY r.event_type ASC NULLS LAST""".stripMargin,

    "q_explode_outer" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE string_split(text, ' ') END AS toks
        |  FROM documents
        |), x AS (
        |  -- toks IS NULL arm mirrors Spark explode_outer(NULL) → one
        |  -- (doc_id, NULL) row; unnest(NULL) alone would drop the doc
        |  SELECT doc_id, unnest(CASE WHEN toks IS NULL OR len(toks) = 0
        |    THEN [NULL]::VARCHAR[] ELSE toks END) AS tok
        |  FROM t
        |)
        |SELECT doc_id, COUNT(*) AS n_rows, COUNT(tok) AS n_tokens
        |FROM x GROUP BY doc_id ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_window_ntile" ->
      s"""WITH q AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    CAST(ntile(4) OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice ASC NULLS LAST,
        |        o_orderkey ASC NULLS LAST) AS BIGINT) AS quartile
        |  FROM orders
        |)
        |SELECT o_orderstatus, quartile, COUNT(*) AS n_orders,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  ${Det.sqlDsum("o_totalprice")} AS sum_price
        |FROM q GROUP BY o_orderstatus, quartile
        |ORDER BY o_orderstatus ASC NULLS LAST, quartile ASC NULLS LAST"""
        .stripMargin,

    "q_agg_collect" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  list_aggr(list_transform(
        |    list_slice(list_sort(list(o_orderkey)), 1, 5),
        |    x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS low5_keys
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS LAST""".stripMargin,

    "q_agg_bool" ->
      """SELECT event_type, COUNT(*) AS n,
        |  bool_and(value > 0) AS all_pos,
        |  bool_or(value > 400) AS any_big,
        |  CAST(count_if(value > 200) AS BIGINT) AS n_over200
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC NULLS LAST""".stripMargin,

    "q_agg_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY user_id, event_type
        |), r AS (
        |  SELECT user_id, event_type, c,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY c DESC NULLS LAST, event_type ASC NULLS LAST) AS rn
        |  FROM c
        |)
        |SELECT user_id, event_type AS mode_type, c AS n
        |FROM r WHERE rn = 1
        |ORDER BY user_id ASC NULLS LAST""".stripMargin,

    "q_stats_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
        |  COUNT(*) AS n, min(value) AS min_v, max(value) AS max_v,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR)
        |    AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1
        |ORDER BY bin ASC NULLS LAST""".stripMargin
  )
}
