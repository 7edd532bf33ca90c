package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-quality operators of a training-data pipeline beyond the
  * round-1/2 surface: a multi-rule document gate (Gopher-style), raw
  * tf-idf term ranking, and an exact token-diversity (Gini impurity)
  * score.
  *
  * Determinism (SURVEY §7.4): every score here is rational arithmetic
  * over exact integers (counts, lengths) finished by ONE IEEE-exact
  * double division — no logs, no float accumulation, so Spark and DuckDB
  * agree bit-for-bit regardless of partitioning.
  *
  * Scale notes: the gate is a pure narrow map (per-row array folds, no
  * shuffle); tf-idf is two hash aggregations (doc,term) → (term) plus a
  * broadcast 1-row corpus count — the same shape at 100 TB with term
  * skew absorbed by partial aggregation; Gini uses the explode+groupBy
  * shape rather than an in-row O(distinct·n) fold so 100k-token
  * documents cost n log n, not n². */
object Quality {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** The corpus' closed-class tokens — stands in for a real stopword
    * list; shared literal between both engines' rules. */
  private val stopList = Seq("the", "a")
  private val stopSql = stopList.map(w => s"'$w'").mkString(", ")
  private val stopIn = stopList.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The Gopher-style gate as a reusable frame (q_quality_gopher and
    * the q_corpus_curate pipeline's stage 1 share it by construction):
    * per-doc rule metrics plus the composite `passes` flag. Pure
    * narrow map. */
  def gopherMetrics(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("mean_tok_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double")
          / col("n_tokens"))
      .withColumn("stop_ratio",
        expr(s"size(filter(toks, t -> t IN ($stopSql)))").cast("double")
          / col("n_tokens"))
      .withColumn("max_tok_len",
        expr("array_max(transform(toks, t -> length(t)))").cast("long"))
      .withColumn("passes",
        col("n_tokens").between(10, 100000) &&
          col("mean_tok_len").between(2.0, 10.0) &&
          (col("stop_ratio") >= 0.02) && (col("max_tok_len") <= 20))
      .select("doc_id", "n_tokens", "mean_tok_len", "stop_ratio",
        "max_tok_len", "passes")

  /** DuckDB mirror of `gopherMetrics(...).filter(passes)` as a
    * parenthesizable doc_id subquery (the q_corpus_curate oracle's
    * stage 1). */
  def gopherPassSubquery: String =
    s"""SELECT doc_id FROM (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks)
       |      AS mean_tok_len,
       |    CAST(len(list_filter(toks, t -> t IN $stopIn)) AS DOUBLE)
       |      / len(toks) AS stop_ratio,
       |    CAST(list_max(list_transform(toks, t -> length(t))) AS BIGINT)
       |      AS max_tok_len
       |  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
       |        FROM documents WHERE text IS NOT NULL)
       |) WHERE (n_tokens BETWEEN 10 AND 100000)
       |  AND (mean_tok_len BETWEEN 2.0 AND 10.0)
       |  AND stop_ratio >= 0.02 AND max_tok_len <= 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Quality-cutoff prune sweep — "how much data survives each
    // filter setting", the planning number a curation run needs BEFORE
    // committing to a cutoff (prune too hard and the token budget
    // collapses; too soft and junk trains). For minimum-stop-ratio
    // cutoffs 0%..10% in 2% steps: docs kept and tokens kept. The
    // cutoff-0 row doubles as the corpus total, so shares need no extra
    // broadcast. Cutoff constants parse to identical doubles on both
    // engines and stop_ratio derives identically, so the >= agrees
    // exactly. Scale: the 6-way in-row fan-out collapses under map-side
    // partial aggregation — one narrow pass, a 6-row result.
    "q_quality_prune_sweep" -> ((s, d) =>
      gopherMetrics(t(s, d, "documents"))
        .select(col("n_tokens"), col("stop_ratio"),
          explode(expr("array(0, 2, 4, 6, 8, 10)")).as("cutoff_pct"))
        .filter(col("stop_ratio") >= col("cutoff_pct").cast("double") / 100.0d)
        .groupBy("cutoff_pct")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum("n_tokens").as("n_tokens_kept"))
        .select(col("cutoff_pct").cast("long").as("cutoff_pct"),
          col("n_docs_kept"), col("n_tokens_kept"))
        .orderBy(asc_nulls_last("cutoff_pct"))),

    // Duplicate-vs-quality bias per source — "are the near-duplicates
    // also the junk?": compares the mean q_text_quality score of LSH
    // near-dup members against non-members within each source. A
    // negative bias says dedup doubles as a quality filter there; a
    // near-zero bias says boilerplate is spread across quality levels
    // and the two gates prune independently — which decides whether a
    // pipeline can cheapen by running only one of them. Scores are the
    // declared deterministic rationals; the per-group means quantize
    // each score to an exact DECIMAL(18,7) before the integer-exact sum
    // (the Det convention) so partition order never shows. Scale: ONE
    // LSH run (the proven bucketed pipeline) + a doc-keyed membership
    // left-join + one source-keyed conditional aggregate.
    "q_dup_quality_bias" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val members = Corpus.nearDupPairs(s, d)
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
        .withColumn("is_dup", lit(true))
      val scored = docs
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_distinct",
          size(array_distinct(col("toks"))).cast("long"))
        .withColumn("score",
          (col("n_distinct").cast("double") / col("n_tokens"))
            * (least(col("n_tokens"), lit(100L)).cast("double") / 100))
        .join(members, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
      def davgIf(cond: org.apache.spark.sql.Column) =
        sum(when(cond, col("score")
          .cast(org.apache.spark.sql.types.DecimalType(18, 7))))
          .cast("double") /
          sum(when(cond && col("score").isNotNull, 1L).otherwise(0L))
      scored.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
          davgIf(col("is_dup")).as("avg_score_dup"),
          davgIf(!col("is_dup")).as("avg_score_nondup"))
        .withColumn("quality_bias",
          col("avg_score_dup") - col("avg_score_nondup"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Gopher-style multi-rule gate: token-count bounds, mean token
    // length bounds, minimum stopword ratio, maximum token length. Each
    // rule surfaces as a column so a pipeline can report WHY a document
    // was dropped, plus the composite pass flag.
    "q_quality_gopher" -> ((s, d) =>
      gopherMetrics(t(s, d, "documents"))
        .orderBy(asc_nulls_last("doc_id"))),

    // Raw tf-idf (no log — rational arithmetic only): per-document top-3
    // terms by tf · N / df, ties broken by term. df is a vocabulary-sized
    // aggregate BROADCAST back onto tf — tf itself never shuffles by
    // term, so a stopword appearing in every document costs nothing
    // extra (a COUNT-window-over-term formulation would funnel that
    // term's n_docs rows through one task; partial aggregation absorbs
    // the skew here). The df branch re-runs the linear corpus pass —
    // a production pipeline persists tf to pay it once; both shapes are
    // cliff-free. N is a broadcast 1-row aggregate on a constant key.
    "q_text_tfidf" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = broadcast(tf.groupBy("tok").agg(count(lit(1)).as("df")))
      val total = broadcast(docs.agg(count(lit(1)).as("n_docs"))
        .withColumn("_one", lit(1)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id")
        .orderBy(desc_nulls_last("score"), asc_nulls_last("tok"))
      tf.join(df, "tok")
        .withColumn("_one", lit(1))
        .join(total, "_one")
        // integer product, ONE exact double division — engine-identical
        .withColumn("score",
          (col("tf") * col("n_docs")).cast("double") / col("df"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= 3)
        .select("doc_id", "tok", "tf", "df", "score")
        .orderBy(asc_nulls_last("doc_id"), desc_nulls_last("score"),
          asc_nulls_last("tok"))
    }),

    // Token diversity as Gini impurity 1 − Σ(c/n)² = (n² − Σc²)/n² —
    // exact integers until the final division. The explode+groupBy shape
    // keeps long documents n log n (an in-row distinct×scan fold would
    // be quadratic per row).
    "q_text_gini" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c") * col("c")).as("sum_sq"))
        .withColumn("gini",
          (col("n_tokens") * col("n_tokens") - col("sum_sq")).cast("double")
            / (col("n_tokens") * col("n_tokens")))
        .select("doc_id", "n_tokens", "sum_sq", "gini")
        .orderBy(asc_nulls_last("doc_id"))),

    // Hashed-feature linear quality classifier — the fastText-shaped
    // "model-based filter" stage of a curation pipeline (a linear score
    // over hashed bag-of-words features), with the hashing trick
    // standing in for a trained weight table: weight(token) =
    // hexdigit(md5(token)[0]) · 2 − 15, an odd integer in [−15, 15]
    // (never zero — no sign ties), so the per-doc score is an exact
    // BIGINT sum over token instances and keep = score > 0 is
    // engine-identical. The report is the per-(source, lang) keep-rate
    // matrix a filter rollout review reads. Scale: hashing needs no
    // broadcast weight table at all (the trick's point); one narrow
    // hash-per-token map, then two keyed aggregates with map-side
    // combine — linear, two slim shuffles.
    "q_quality_linear" -> ((s, d) => {
      val sc = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("w", expr(
          "CAST((instr('0123456789abcdef', substring(md5(tok), 1, 1)) " +
            "- 1) * 2 - 15 AS BIGINT)"))
        .groupBy("doc_id", "source", "lang")
        .agg(sum("w").as("score"))
      sc.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
          sum("score").as("sum_score"))
        .withColumn("keep_rate",
          col("n_keep").cast("double") / col("n_docs"))
        .orderBy(asc_nulls_last("source"), asc_nulls_last("lang"))
    })
  )

  val oracle: Map[String, String] = Map(
    // The shared LSH pair subquery feeds membership; score text is the
    // q_text_quality oracle's verbatim; means VARCHAR-route the decimal
    // sums per §7.4.
    "q_dup_quality_bias" ->
      s"""WITH pairs AS (
         |${TextOps.dedupPairsSubquery}
         |), mem AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT id_a AS doc_id FROM pairs
         |    UNION ALL SELECT id_b AS doc_id FROM pairs)
         |), sc AS (
         |  SELECT d.source,
         |    (CAST(len(list_distinct(string_split(d.text, ' ')))
         |      AS DOUBLE) / len(string_split(d.text, ' ')))
         |    * (CAST(least(len(string_split(d.text, ' ')), 100)
         |      AS DOUBLE) / 100) AS score,
         |    m.doc_id IS NOT NULL AS is_dup
         |  FROM documents d LEFT JOIN mem m ON d.doc_id = m.doc_id
         |)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup,
         |  CAST(CAST(SUM(CASE WHEN is_dup
         |    THEN CAST(score AS DECIMAL(18,7)) END) AS VARCHAR)
         |    AS DOUBLE)
         |    / SUM(CASE WHEN is_dup AND score IS NOT NULL
         |      THEN 1 ELSE 0 END) AS avg_score_dup,
         |  CAST(CAST(SUM(CASE WHEN NOT is_dup
         |    THEN CAST(score AS DECIMAL(18,7)) END) AS VARCHAR)
         |    AS DOUBLE)
         |    / SUM(CASE WHEN NOT is_dup AND score IS NOT NULL
         |      THEN 1 ELSE 0 END) AS avg_score_nondup,
         |  avg_score_dup - avg_score_nondup AS quality_bias
         |FROM sc GROUP BY source
         |ORDER BY source ASC NULLS LAST""".stripMargin,

    "q_quality_prune_sweep" ->
      s"""WITH m AS (
         |  SELECT CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(toks, t -> t IN $stopIn)) AS DOUBLE)
         |      / len(toks) AS stop_ratio
         |  FROM (SELECT string_split(text, ' ') AS toks FROM documents
         |        WHERE text IS NOT NULL)
         |), c AS (SELECT unnest([0, 2, 4, 6, 8, 10]) AS cutoff_pct)
         |SELECT CAST(cutoff_pct AS BIGINT) AS cutoff_pct,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept
         |FROM m, c
         |WHERE stop_ratio >= CAST(cutoff_pct AS DOUBLE) / 100.0
         |GROUP BY cutoff_pct
         |ORDER BY cutoff_pct ASC NULLS LAST""".stripMargin,

    "q_quality_gopher" ->
      s"""WITH t AS (
         |  SELECT doc_id, n_chars, string_split(text, ' ') AS toks
         |  FROM documents WHERE text IS NOT NULL
         |), m AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(n_chars - (len(toks) - 1) AS DOUBLE) / len(toks)
         |      AS mean_tok_len,
         |    CAST(len(list_filter(toks, t -> t IN $stopIn)) AS DOUBLE)
         |      / len(toks) AS stop_ratio,
         |    CAST(list_max(list_transform(toks, t -> length(t))) AS BIGINT)
         |      AS max_tok_len
         |  FROM t
         |)
         |SELECT doc_id, n_tokens, mean_tok_len, stop_ratio, max_tok_len,
         |  (n_tokens BETWEEN 10 AND 100000)
         |    AND (mean_tok_len BETWEEN 2.0 AND 10.0)
         |    AND stop_ratio >= 0.02 AND max_tok_len <= 20 AS passes
         |FROM m ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_text_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents WHERE text IS NOT NULL
        |  ) GROUP BY doc_id, tok
        |), df AS (
        |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        |), n AS (
        |  SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
        |), r AS (
        |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        |    CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC,
        |        tf.tok ASC) AS rn
        |  FROM tf JOIN df USING (tok) CROSS JOIN n
        |)
        |SELECT doc_id, tok, tf, df, score FROM r WHERE rn <= 3
        |ORDER BY doc_id ASC NULLS LAST, score DESC NULLS LAST,
        |  tok ASC NULLS LAST""".stripMargin,

    "q_text_gini" ->
      """WITH c AS (
        |  SELECT doc_id, tok, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents WHERE text IS NOT NULL
        |  ) GROUP BY doc_id, tok
        |), m AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(SUM(c * c) AS BIGINT) AS sum_sq
        |  FROM c GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens, sum_sq,
        |  CAST(n_tokens * n_tokens - sum_sq AS DOUBLE)
        |    / (n_tokens * n_tokens) AS gini
        |FROM m ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // strpos is DuckDB's 1-based instr; md5 hex is lowercase on both
    // engines, so the hashed weight is integer-identical per token.
    "q_quality_linear" ->
      """WITH tk AS (
        |  SELECT doc_id, source, lang,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL
        |), sc AS (
        |  SELECT doc_id, source, lang,
        |    CAST(SUM((strpos('0123456789abcdef',
        |      substring(md5(tok), 1, 1)) - 1) * 2 - 15) AS BIGINT)
        |      AS score
        |  FROM tk GROUP BY doc_id, source, lang
        |), agg AS (
        |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_keep,
        |    CAST(SUM(score) AS BIGINT) AS sum_score
        |  FROM sc GROUP BY source, lang
        |)
        |SELECT source, lang, n_docs, n_keep, sum_score,
        |  CAST(n_keep AS DOUBLE) / n_docs AS keep_rate
        |FROM agg
        |ORDER BY source ASC NULLS LAST, lang ASC NULLS LAST""".stripMargin
  )
}
