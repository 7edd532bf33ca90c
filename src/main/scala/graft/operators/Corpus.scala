package graft.operators

import graft.CacheScope.ScopedPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-level training-data operators that work ACROSS documents —
  * the stages that turn per-document scores into corpus decisions:
  *
  *  - `q_dedup_clusters`: connected components over the verified near-dup
  *    pairs (min-label propagation), turning pairwise duplicates into
  *    keep-one clusters — the step every dedup pipeline needs between
  *    "pairs found" and "rows dropped";
  *  - `q_decontaminate`: 8-gram overlap between a held-out eval split and
  *    the train split (benchmark decontamination);
  *  - `q_dedup_spans`: repeated-span removal (C4-style): fixed-width token
  *    spans that occur more than once in the corpus are dropped from every
  *    document, and the surviving text is re-assembled;
  *  - `q_url_parse`: URL structure extraction (host/tld/path/ref) — the
  *    domain-filtering front door of a web-corpus pipeline;
  *  - `q_mixture_weights`: dataset-mixture balancing (per-source keep
  *    rates from integer target weights, cross-multiplied — no division);
  *  - `q_label_balance`: downsample every class to the minority size by
  *    seed-free hash order;
  *  - `q_text_clean`: HTML boilerplate removal (tag strip, entity
  *    unescape, whitespace collapse).
  *
  * Determinism (SURVEY §7.4): md5 keys, integer counts, boolean gates —
  * no floating-point accumulation anywhere in this file.
  *
  * Scale notes per query are inline; none of them materializes an
  * all-pairs product, and the one iterative algorithm (label propagation)
  * persists its per-iteration frontier so the lazy plan cannot
  * re-evaluate the full LSH subtree 2^iters times.
  */
object Corpus {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Safety bound on label-propagation rounds (q_dedup_clusters iterates
    * to a TRUE fixed point — the bound only turns a pathological
    * never-converging graph into a loud failure instead of an infinite
    * loop; min-label propagation converges in ≤ component-eccentricity
    * rounds, so 64 covers any component of diameter < 64). */
  val MaxClusterRounds = 64

  /** Tokens per span for q_dedup_spans. */
  val SpanTokens = 10

  /** Connected components over an undirected edge list (`id_a`, `id_b`)
    * by min-label propagation WITH pointer doubling — returns one row per
    * node: (`id`, `lbl` = minimum id of the node's component).
    *
    * Each round: (1) propagate — lbl'(v) = min over (adj(v) ∪ {v}) of lbl
    * (self-loops make this a single join + groupBy: no left join, no
    * coalesce); (2) pointer-double — lbl ← lbl(lbl). Every label value is
    * itself a node id (labels start as ids and min preserves that) and
    * the self-loop guarantees lbl(l) ≤ l, so the extra self-join halves
    * the remaining distance to the component minimum: O(log diameter)
    * rounds on path-shaped components instead of O(diameter). The
    * fixed-point guarantee is unchanged — next == labels forces
    * prop == labels (prop ≤ labels elementwise and next ≤ prop), i.e. a
    * fixed point of plain propagation, which is exactly the
    * connected-components labeling; the recursive-CTE oracle is the
    * exactness witness.
    *
    * Scale: edges are persisted once (they are the expensive subtree);
    * each round shuffles only slim (id, lbl) rows. Every round persists
    * its labels (the change-count materializes them) and drops the
    * previous round's cache, so the loop holds at most two label
    * snapshots plus the edge set in memory; the final labels stay cached
    * for the caller's terminal action (Verify clears the cache between
    * queries). */
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** Loop-shuffle right-sizing shared by every iterative graph loop
    * (CC, pagerank, k-core peel, label propagation, BFS): one
    * partition per `per` rows, floored at 4, capped at the session
    * default. An iterative loop pays the partition count in SCHEDULED
    * TASKS every round, so the session default — sized for
    * corpus-wide shuffles — would schedule hundreds of near-empty
    * tasks per round on a cluster whenever the loop graph is a sliver
    * of the corpus (the usual near-dup case). Applied as EXPLICIT
    * repartition(n, key) on loop frames, never by mutating the
    * session-global spark.sql.shuffle.partitions (which would race
    * with concurrent queries). Division of labor: loop JOIN and
    * WINDOW inputs are sized explicitly here; keyed AGGREGATE
    * exchanges are left unsized on purpose — pre-repartitioning an
    * agg input would defeat the map-side partial combine, and AQE's
    * runtime coalescing already right-sizes the post-agg side. */
  private[graft] def loopShufflePartitions(
      spark: org.apache.spark.sql.SparkSession, rows: Long,
      per: Long): Int = {
    val sessionParts = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toLong).getOrElse(32L)
    math.max(4L, math.min(sessionParts, rows / per + 1L)).toInt
  }

  /** [[connectedComponents]] plus the number of rounds the loop ran —
    * exposed so the log-diameter convergence property is testable.
    *
    * `checkpointDir`: when set, each round's labels take a RELIABLE
    * checkpoint into that directory instead of a localCheckpoint.
    * localCheckpoint stores blocks on executors — fast, but an
    * executor loss mid-loop kills the lineage-truncated frame with no
    * recovery path; on a real multi-node cluster a long CC run over a
    * big dup graph should pay the checkpoint-dir write (HDFS/object
    * store) for restartability. Default stays local: at single-node /
    * test scale the loop is short enough to simply re-run, and the
    * reliable path costs one filesystem round-trip per round. */
  def connectedComponentsWithRounds(pairs: DataFrame,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    // symmetric expansion IN-ROW (explode of both directions), not a
    // union of two branches — a union would evaluate the whole upstream
    // subtree (LSH in the declared query) twice before the persist helps
    val sym = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .persistScoped()
    val nodes = sym.select(col("src")).distinct()
    // Right-size the loop's shuffles to the DUP-GRAPH size, not the
    // session default: label frames only contain near-dup members — a
    // sliver of the corpus — and an iterative loop pays the partition
    // count in tasks EVERY round. One partition per ~10k edges, floored
    // at 4, capped at the session default; the count() materializes the
    // persisted sym set the first round needs anyway. (At sf0.1 this is
    // timing-neutral — per-round cost there is driver job-launch
    // latency — but on a cluster the default would schedule hundreds of
    // near-empty tasks per round.) The count is applied as EXPLICIT
    // repartition(loopParts, key) on the loop frames — never by mutating
    // the session-global spark.sql.shuffle.partitions, which would race
    // with any concurrent query on the same SparkSession; an explicit
    // hash partitioning also satisfies the downstream join/agg
    // distribution requirements, so each round still plans exactly one
    // exchange per shuffle boundary. The caller's terminal sort runs at
    // the untouched session setting.
    val spark = pairs.sparkSession
    // ONE setup action (round 7; was two): node count sizes the loop's
    // shuffles and the node-id sum is the round-0 convergence reference —
    // both from the same distinct-node agg (materializing persisted sym
    // on the way). Sizing by nodes instead of symmetric-edge rows is the
    // same decade for any graph with bounded average degree.
    val setup = nodes.agg(count(lit(1)),
      sum(col("src").cast(
        org.apache.spark.sql.types.DecimalType(38, 0)))).head
    val nNodes = setup.getLong(0)
    val loopParts = loopShufflePartitions(spark, nNodes, 5000L)
    // NOTE: Spark's checkpoint dir is SparkContext-GLOBAL — there is no
    // per-job override, so passing a dir here affects every reliable
    // checkpoint on the session from now on (concurrent pipelines
    // wanting different dirs cannot be isolated; that is a Spark
    // limitation, not a choice). Set only when it actually changes,
    // and prefer configuring it once at session setup on a cluster.
    checkpointDir.foreach { dir =>
      if (!spark.sparkContext.getCheckpointDir.contains(dir))
        spark.sparkContext.setCheckpointDir(dir)
    }
    val edges = sym
      .union(nodes.select(col("src"), col("src").as("dst")))
      .repartition(loopParts, col("dst"))
      .persistScoped()
    var labels = nodes.select(col("src").as("id"), col("src").as("lbl"))
    // convergence check = exact-decimal label sum: labels are elementwise
    // non-increasing (self-loop ⇒ prop ≤ labels, doubling ⇒ next ≤ prop),
    // so an unchanged sum ⇔ no label changed — one narrow agg over the
    // just-materialized round instead of a join-against-previous shuffle
    def lblSum(df: DataFrame): java.math.BigDecimal = Option(
      df.agg(sum(col("lbl").cast(
        org.apache.spark.sql.types.DecimalType(38, 0)))).head.getDecimal(0))
      .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = Option(setup.getDecimal(1))
      .getOrElse(java.math.BigDecimal.ZERO)
    var changed = true
    var rounds = 0
    while (changed) {
      rounds += 1
      require(rounds <= MaxClusterRounds,
        s"label propagation did not converge in $MaxClusterRounds rounds")
      // labels repartitioned to match the persisted edge partitioning
      // (co-located join, no edge re-shuffle); the src repartition then
      // satisfies the groupBy's distribution so the agg adds no exchange.
      // ROUND-1 SHORTCUT (round 7): labels is the identity map before the
      // first round, so lbl(dst) = dst and the propagate collapses to
      // min(dst) per src straight off the persisted edges — two fewer
      // exchanges on the round the loop always runs.
      val prop = (if (rounds == 1)
          edges.repartition(loopParts, col("src"))
            .groupBy("src").agg(min("dst").as("lbl"))
        else edges
          .join(labels.select(col("id").as("dst"), col("lbl"))
            .repartition(loopParts, col("dst")), "dst")
          .repartition(loopParts, col("src"))
          .groupBy("src").agg(min("lbl").as("lbl")))
        .select(col("src").as("id"), col("lbl"))
      // localCheckpoint, not persist: the doubling self-join references
      // prop TWICE, so the logical plan would otherwise double per round —
      // 2^rounds analysis cost even with every round cached. Checkpointing
      // materializes AND truncates lineage, keeping each round's plan
      // constant-size. LAZY (eager=false, round 7): the convergence
      // label-sum below is the round's ONLY driver action — its full-scan
      // agg materializes the checkpoint blocks as it reads them, folding
      // what used to be two jobs per round (checkpoint materialization +
      // sum) into one. With `checkpointDir` set, a RELIABLE checkpoint
      // replaces the local one — same lineage truncation, same lazy
      // materialization-by-first-action, but the blocks live in the
      // checkpoint dir and survive executor loss (the multi-node
      // trade; see the Scaladoc).
      val doubled = prop.repartition(loopParts, col("lbl"))
        .join(prop.select(col("id").as("lbl"), col("lbl").as("lbl2"))
          .repartition(loopParts, col("lbl")),
          "lbl")
        .select(col("id"), least(col("lbl"), col("lbl2")).as("lbl"))
      val next =
        if (checkpointDir.isDefined) doubled.checkpoint(eager = false)
        else doubled.localCheckpoint(eager = false)
      val s = lblSum(next)
      changed = s.compareTo(prevSum) != 0
      prevSum = s
      labels.unpersist()
      labels = next
    }
    edges.unpersist()
    sym.unpersist()
    (labels, rounds)
  }

  /** 3-round 2-core peel over an (id_a, id_b) pair frame — the
    * q_graph_kcore body, exposed so PropertyLawsSpec can drive it over
    * random graphs the LSH fixture never generates. Each round drops
    * vertices whose degree among survivors is < 2; the final in-core
    * degree is recomputed over the peeled set. Rounds are UNROLLED
    * (identical on both engines even when the fixed point lands
    * earlier — extra rounds are no-ops). Each round references `nodes`
    * TWICE (src + dst semi-join), so the peel subtrees appear
    * duplicated in the final plan — but IDENTICALLY, so ReuseExchange
    * computes each round's shuffle once. Only the FINAL round persists
    * (its two final-degree consumers sit above different exchanges):
    * r8 measured 1.3 s solo sf0.1 vs 1.7 s persisting every round
    * lazily and 2.7 s materializing each round eagerly — the
    * reuse-over-cache shape wins on all axes. Semi-join probe sides
    * sized explicitly (loopShufflePartitions; the count materializes
    * the persisted sym cache every round reads anyway); the peel's
    * degree agg stays unsized for map-side combine. */
  def kcore2(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .persistScoped()
    val lp = loopShufflePartitions(s, sym.count(), 10000L)
    var nodes = sym.select(col("src").as("id")).distinct()
    for (_ <- 1 to 3) {
      nodes = sym
        .join(nodes.select(col("id").as("src"))
          .repartition(lp, col("src")), Seq("src"), "left_semi")
        .join(nodes.select(col("id").as("dst"))
          .repartition(lp, col("dst")), Seq("dst"), "left_semi")
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2)
        .select(col("src").as("id"))
    }
    nodes = nodes.persistScoped()
    sym
      .join(nodes.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(nodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("doc_id"), col("core_deg"))
  }

  /** 3-round deterministic synchronous label propagation over an
    * (id_a, id_b) pair frame — the q_graph_labelprop body, exposed for
    * random-graph property tests. Each node adopts the most common
    * label among its neighbors plus ONE self-vote (the damping that
    * stops 2-cycles oscillating under synchronous update), ties to the
    * smallest label — fully deterministic, unlike classic random-order
    * LPA. Loop shuffles sized to the graph; the vote agg stays unsized
    * so (id, lbl) duplicates combine map-side. */
  def labelProp3(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .persistScoped()
    val lp = loopShufflePartitions(s, sym.count(), 10000L)
    var lbl = sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    for (_ <- 1 to 3) {
      val w = Window.partitionBy("id")
        .orderBy(desc_nulls_last("c"), asc_nulls_last("lbl"))
      lbl = sym
        .join(lbl.select(col("id").as("dst"), col("lbl"))
          .repartition(lp, col("dst")), "dst")
        .select(col("src").as("id"), col("lbl"))
        .unionByName(lbl) // the self-vote
        .groupBy("id", "lbl").agg(count(lit(1)).as("c"))
        .repartition(lp, col("id")) // satisfies the window's hash(id)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("id", "lbl")
    }
    lbl
  }

  /** Gram width for q_decontaminate. */
  val GramTokens = 8

  /** NAMED STAGE (r10): the verified near-dup pair frame over the FULL
    * documents table with the declared default LSH config (8 hashes, 4
    * bands, Jaccard ≥ 0.7) — the sub-plan every dup-graph query and
    * the q_dedup_* family re-derived per query under r9's per-query
    * CacheScope protocol (signatures → band buckets → verify was the
    * dominant repeated cost: the r9 verdict's one perf-design gap).
    * The first consumer materializes it once per (session, sfDir);
    * every later consumer reads the cached slim (id_a, id_b, jaccard)
    * frame — exactly how a nightly pipeline shares the pair table
    * across downstream jobs. Explicit refresh: [[graft.NamedStages]].
    * Non-default LSH configs (q_dedup_bands_curve) keep their own
    * plans — the stage covers only the declared default. */
  def nearDupPairs(s: SparkSession, d: String): DataFrame =
    nearDupCands(s, d).filter(col("jaccard") >= 0.7)

  /** NAMED STAGE (r11): the verified candidate frame BEFORE the 0.7
    * threshold — (id_a, id_b, jaccard) for every LSH band collision
    * under the declared default config. One tier below [[nearDupPairs]]
    * (which is now just a filter over this cache): the UNFILTERED frame
    * is what threshold-tuning consumers (q_dedup_threshold_curve) need,
    * and materializing here instead of post-filter shares the
    * signature → bucket → verify chain with the pair consumers too —
    * the r10 verdict's threshold_curve regression was exactly this
    * query rebuilding the whole chain solo while its siblings read the
    * warm stage. The frame is slim (two ids + one double per surviving
    * candidate), so caching pre-threshold costs only the low-jaccard
    * sliver extra. */
  def nearDupCands(s: SparkSession, d: String): DataFrame =
    graft.NamedStages.stage(s, s"neardup_cands:$d") {
      val base = t(s, d, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val signed = MinHash.withSignatures(base, "text", 8)
      val toks = MinHash.tokens(base, "text")
      TextDedup.withJaccard(TextDedup.candidatePairs(signed, 8, 4), toks)
        .select("id_a", "id_b", "jaccard")
    }

  /** NAMED STAGE: the gate → exact-dedup survivor corpus (curation
    * stages 1–2), shared verbatim by q_corpus_curate and the
    * [[curatedClean]] chain behind v2/v3. */
  def cleanKept(s: SparkSession, d: String): DataFrame =
    graft.NamedStages.stage(s, s"curate_kept:$d") {
      val docs = t(s, d, "documents")
      val q = Quality.gopherMetrics(docs)
        .filter(col("passes")).select("doc_id")
      val qd = docs.join(q, "doc_id")
      val ex = qd.groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      qd.join(ex, "doc_id")
    }

  /** NAMED STAGE: near-dup losers of the KEPT corpus (curation stage
    * 3's drop set) — the second LSH run the curation family shared
    * only within-query before r10. Slim (doc_id) sliver. */
  def cleanLosers(s: SparkSession, d: String): DataFrame =
    graft.NamedStages.stage(s, s"curate_losers:$d")(
      TextDedup.nearDuplicates(cleanKept(s, d))
        .select(col("id_b").as("doc_id")).distinct())

  /** Stages 1–4 of the curation pipeline — gate → exact dedup → LSH
    * near-dup drop → eval-gram decontamination of the train split —
    * shared by q_corpus_curate_v2 (per-source quota + per-lang report)
    * and q_corpus_curate_v3 (token-budget apportionment). Returns the
    * lazy `clean` frame of surviving train documents. Stages 1–3 are
    * named stages (shared ACROSS queries); only the decontamination
    * tail builds per query. */
  def curatedClean(s: SparkSession, d: String): DataFrame = {
    // dependency stages resolve OUTSIDE the new stage's build, so the
    // registry's getOrElseUpdate never nests a second insertion
    val docs = t(s, d, "documents")
    val kept = cleanKept(s, d)
    val losers = cleanLosers(s, d)
    graft.NamedStages.stage(s, s"curate_clean:$d") {
      curatedCleanBody(docs, kept, losers)
    }
  }

  /** The decontamination tail (stage 4) — r13 OPTIMIZATION: promoted to
    * the NAMED-STAGE tier (the cleanKept/cleanLosers precedent one stage
    * further down the same pipeline). v2 and v3 each re-ran the two
    * gram passes (~600k md5'd 8-gram strings at sf0.1, single-task on
    * the fixture's one-row-group documents file) plus the gram-keyed
    * membership join PER QUERY; a nightly pipeline computes the clean
    * train corpus once and every budget/quota/report job reads it.
    * Identical rows — the stage only adds the materialization. */
  private def curatedCleanBody(docs: DataFrame, kept: DataFrame,
      losers: DataFrame): DataFrame = {
    val surv = kept.join(losers, Seq("doc_id"), "left_anti")
    // gram positions via a GENERATOR + codegen'd md5 (the q_embed_cov
    // lesson; q_source_overlap measured 1.6 → 1.3 s from the same
    // change). The HOF form's in-row array_distinct is superseded by
    // the consumers' own distincts (membership semantics — within-doc
    // duplicate grams can't change either)
    def grams(df: DataFrame) = df
      .filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= GramTokens)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - GramTokens))
          .as("i"))
      .select(col("doc_id"), expr(
        s"md5(array_join(slice(toks, i + 1, $GramTokens), ' '))")
        .as("gm"))
    val evalGrams = grams(docs.filter(col("doc_id") % 5 === 0))
      .select("gm").distinct()
    // gram the POST-GATE train sliver only (eval docs leave the train
    // stream regardless, so their grams never need probing)
    val contaminated = grams(surv.filter(col("doc_id") % 5 =!= 0))
      .join(evalGrams, "gm")
      .select("doc_id").distinct()
    surv.filter(col("doc_id") % 5 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Connected components over near-dup pairs by min-label propagation:
    // lbl(v) ← min(lbl(v), min over neighbors lbl(u)), iterated until a
    // FIXED POINT (no label changes) so arbitrarily-long-diameter
    // components merge fully — the oracle mirrors with a recursive-CTE
    // transitive closure, which is exact by construction. Edges come from
    // the declared LSH pipeline (TextDedup.nearDuplicates — itself
    // oracle-proven as q_dedup_pairs). Scale: edges are persisted once
    // (they are the expensive subtree); each round is one shuffle join on
    // id, one label self-join (pointer doubling: lbl ← lbl(lbl), for
    // log-diameter convergence instead of linear), plus one slim
    // change-count — the GraphX/connected-components shape without the
    // RDD API.
    "q_dedup_clusters" -> ((s, d) =>
      connectedComponents(
        nearDupPairs(s, d)
          .select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("lbl").as("cluster"),
          (col("id") === col("lbl")).as("survivor"))
        .orderBy(asc_nulls_last("doc_id"))),

    // Source purity per near-dup cluster (r12) — the "is this cluster a
    // crawl artifact or cross-source contamination?" triage a curation
    // run reads before choosing a dedup policy: same-source clusters
    // are boilerplate/re-crawls (drop freely), cross-source clusters
    // flag syndication or benchmark leakage (the q_decontaminate
    // signal). Per cluster: member count, distinct sources, the
    // dominant source (mode, source-asc tie-break), its share (ONE
    // IEEE division of exact counts), and the cross-source flag.
    // Scale: the shared CC labels + one (cluster, source)-keyed agg
    // with map-side combine + a top-1 window over cluster-sized groups.
    "q_dedup_cluster_purity" -> ((s, d) => {
      val cl = connectedComponents(
          nearDupPairs(s, d).select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      val bySrc = cl
        .join(t(s, d, "documents").select("doc_id", "source"), "doc_id")
        .groupBy("cluster", "source").agg(count(lit(1)).as("ns"))
      val w = Window.partitionBy("cluster")
        .orderBy(desc_nulls_last("ns"), asc_nulls_last("source"))
      // the mode row arrives by top-1-window + join rather than a
      // max(string) aggregate: a string max forces SortAggregate (the
      // plan gate's conscious-choice list), while this shape keeps the
      // counts on the codegen'd hash-agg path and reuses the window
      // sort it needs anyway
      val agg = bySrc.groupBy("cluster")
        .agg(sum("ns").as("n_members"), count(lit(1)).as("n_sources"))
      val dom = bySrc.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster"), col("source").as("dom_source"),
          col("ns").as("dom_count"))
      agg.join(dom, "cluster")
        .withColumn("purity", expr(
          "CAST(dom_count AS DOUBLE) / CAST(n_members AS DOUBLE)"))
        .withColumn("cross_source", col("n_sources") > 1L)
        .select("cluster", "n_members", "n_sources", "dom_source",
          "dom_count", "purity", "cross_source")
        .orderBy(asc_nulls_last("cluster"))
    }),

    // The production dedup POLICY on top of the clusters: each duplicate
    // cluster keeps its best-QUALITY member (longest document, doc_id
    // tie-break) — not the arbitrary min-id — the canonical-copy
    // selection a curation pipeline actually ships. One quality join on
    // doc_id + a per-cluster top-1 window over cluster-sized groups.
    "q_dedup_survivor" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val clusters = connectedComponents(
        nearDupPairs(s, d).select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("lbl").as("cluster"))
      val w = Window.partitionBy("cluster")
        .orderBy(desc_nulls_last("n_chars"), asc_nulls_last("doc_id"))
      clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn("_rn", row_number().over(w))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          max(when(col("_rn") === 1, col("doc_id"))).as("survivor_id"),
          max(when(col("_rn") === 1, col("n_chars"))).as("survivor_chars"))
        .orderBy(asc_nulls_last("cluster"))
    }),

    // HITS hubs & authorities (Kleinberg 1999, 2 unrolled iterations)
    // over the near-dup graph DIRECTED newer→older (each id_a < id_b
    // pair cites the lower-id "original"): authorities = canonical
    // much-copied documents, hubs = aggregator/scraper pages stitching
    // many originals — the directed complement to q_graph_pagerank's
    // undirected centrality, and the signal that separates "keep this
    // canonical doc" from "drop this scraper page" in a curation pass.
    // Unnormalized, so every score is an EXACT BIGINT (h₁ = outdeg,
    // a₁ = Σ_{u→v} h₁(u), h₂ = Σ_{u→v} a₁(v), a₂ = Σ_{u→v} h₂(u) —
    // normalization only rescales the ranking); magnitudes are bounded
    // by deg⁴ of the dup clusters. Scale: each half-step is ONE hash
    // equi-join of the slim edge list against the previous per-node
    // sliver + one keyed agg with map-side combine — the pagerank
    // economics without the rank-scale division; the assembled panel
    // left-joins per-node slivers back onto the node set.
    "q_graph_hits" -> ((s, d) => {
      val e = nearDupPairs(s, d)
        .select(col("id_b").as("src"), col("id_a").as("dst"))
        .persistScoped()
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val h1 = e.groupBy("src").agg(count(lit(1)).as("h1"))
      val indeg = e.groupBy("dst").agg(count(lit(1)).as("indeg"))
      val a1 = e.join(h1, "src")
        .groupBy("dst").agg(sum("h1").as("a1"))
      val h2 = e.join(a1, "dst")
        .groupBy("src").agg(sum("a1").as("h2"))
      val a2 = e.join(h2, "src")
        .groupBy("dst").agg(sum("h2").as("a2"))
      nodes
        .join(h1.withColumnRenamed("src", "id"), Seq("id"), "left")
        .join(indeg.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .join(a1.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .join(h2.withColumnRenamed("src", "id"), Seq("id"), "left")
        .join(a2.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("h1"), lit(0L)).as("outdeg"),
          coalesce(col("indeg"), lit(0L)).as("indeg"),
          coalesce(col("a1"), lit(0L)).as("auth1"),
          coalesce(col("h2"), lit(0L)).as("hub2"),
          coalesce(col("a2"), lit(0L)).as("auth2"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Cross-source duplication matrix — near-dup pair counts per
    // UNORDERED source pair: the "who copies whom" audit that decides
    // whether two crawls should be deduplicated jointly or are
    // independent (the diagonal is each source's internal dup load, the
    // off-diagonal the cross-crawl plagiarism a per-source dedup would
    // MISS). Scale: the pair list is the shared named LSH stage; the
    // doc→source sliver joins in by doc_id twice (slim keyed hash
    // joins), and the output is bounded by |sources|², never doc count.
    "q_dedup_source_matrix" -> ((s, d) => {
      val src = t(s, d, "documents").select(col("doc_id"), col("source"))
      nearDupPairs(s, d)
        .select("id_a", "id_b")
        .join(src.select(col("doc_id").as("id_a"),
          col("source").as("source_a")), "id_a")
        .join(src.select(col("doc_id").as("id_b"),
          col("source").as("source_b")), "id_b")
        .select(least(col("source_a"), col("source_b")).as("s_lo"),
          greatest(col("source_a"), col("source_b")).as("s_hi"))
        .groupBy("s_lo", "s_hi")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(asc_nulls_last("s_lo"), asc_nulls_last("s_hi"))
    }),

    // PageRank (2 Jacobi iterations, damping 0.85) over the near-dup
    // graph — the centrality signal a dedup pipeline uses to pick the
    // CANONICAL copy of a duplicate cluster (highest-rank member ≈ most
    // connected). Everything is integer: ranks carry a 10¹² scale,
    // damping is the exact rational 85/100 applied as one multiply and
    // one floor division ((85·r) DIV (100·deg) — Spark's DIV and
    // DuckDB's // agree on non-negative operands), so every engine
    // reproduces the same BIGINTs with no float accumulation anywhere.
    // Scale: each iteration is one shuffle of slim (dst, contrib) rows
    // with map-side partial sums + an id-keyed join — the canonical
    // distributed power-iteration step; edges/degrees persist once. The
    // node count joins as a 1-row broadcast on a constant key (the
    // q_text_docfreq shape).
    "q_graph_pagerank" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
        .select("id_a", "id_b")
      val sym = pairs.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select("e.src", "e.dst")
        .persistScoped()
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      val n = broadcast(deg.agg(count(lit(1)).as("n_nodes"))
        .withColumn("_one", lit(1)))
      val info = deg.withColumn("_one", lit(1)).join(n, "_one")
        .select(col("src").as("id"), col("deg"),
          expr("CAST(15000000000000 AS BIGINT) DIV " +
            "(CAST(100 AS BIGINT) * n_nodes)").as("base"),
          expr("CAST(1000000000000 AS BIGINT) DIV n_nodes").as("r0"))
        .persistScoped()
      // loop shuffles sized to the dup graph (loopShufflePartitions):
      // the sym.count() materializes the persisted edge cache the loop
      // needs anyway; the dst-keyed edge repartition appears once per
      // round but IDENTICALLY, so ReuseExchange computes it once. The
      // groupBy("src") agg stays unsized (map-side combine + AQE).
      val lp = loopShufflePartitions(s, sym.count(), 10000L)
      val edgesByDst = sym.repartition(lp, col("dst"))
      var r = info.select(col("id"), col("deg"), col("r0").as("r"))
      for (_ <- 1 to 2) {
        val inSum = edgesByDst
          .join(r.select(col("id").as("dst"), col("deg").as("ddeg"),
            col("r").as("dr")).repartition(lp, col("dst")), "dst")
          .withColumn("c", expr(
            "(CAST(85 AS BIGINT) * dr) DIV (CAST(100 AS BIGINT) * ddeg)"))
          .groupBy("src").agg(sum("c").as("in_sum"))
        // symmetric edges ⇒ every node has an incoming edge: inner join
        r = info.join(inSum, info("id") === inSum("src"))
          .select(info("id"), info("deg"),
            (col("base") + col("in_sum")).as("r"))
      }
      r.select(col("id").as("doc_id"), col("deg"),
          col("r").as("rank_scaled"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Per-node triangle participation over the near-dup graph — the
    // clustering-coefficient numerator that separates tight duplicate
    // cliques from chains of borderline matches. Edges are oriented
    // id_a < id_b (nearDuplicates emits them sorted), so each triangle
    // a < b < c is enumerated exactly once: wedge join on the shared
    // middle vertex, closing-edge equi-join on (a, c), then each
    // triangle credits its 3 corners. Scale: the canonical distributed
    // triangle count — both joins are hash equi-joins on edge endpoints
    // (wedge fan-out is bounded by oriented out-degree, the standard
    // mitigation), edges persist once, and the corner explode is ×3.
    "q_graph_triangles" -> ((s, d) => {
      val edges = nearDupPairs(s, d)
        .select("id_a", "id_b")
        .persistScoped()
      val tri = edges.select(col("id_a").as("a"), col("id_b").as("b"))
        .join(edges.select(col("id_a").as("b"), col("id_b").as("c")), "b")
        .join(edges.select(col("id_a").as("a"), col("id_b").as("c")),
          Seq("a", "c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Global clustering coefficient (transitivity) of the near-dup
    // graph — C = 3·triangles / wedges: high transitivity says
    // near-dups form tight cliques (template families — safe to
    // collapse whole clusters), low says chains (A~B~C but A≁C —
    // greedy cluster-collapse would over-merge). Triangle count is the
    // proven a<b<c ordered-edge double-join (each triangle exactly
    // once); wedges Σ d(d−1)/2 come from one degree aggregate. All
    // exact integers + ONE IEEE division. (BIGINT headroom: per-node
    // d(d−1) DIV 2 overflows only past d ≈ 4·10⁹ — more neighbors than
    // documents; the maxBucket cap bounds d in practice.) Scale: the
    // triangle join is edge-keyed (never all-pairs) and everything
    // else is two slim keyed aggregates.
    "q_graph_clustering_coeff" -> ((s, d) => {
      val edges = nearDupPairs(s, d)
        .select("id_a", "id_b").persistScoped()
      val tri = broadcast(edges
        .select(col("id_a").as("a"), col("id_b").as("b"))
        .join(edges.select(col("id_a").as("b"), col("id_b").as("c")), "b")
        .join(edges.select(col("id_a").as("a"), col("id_b").as("c")),
          Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
        .withColumn("_one", lit(1)))
      edges.select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("deg")).as("sum_deg"),
          sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
        .withColumn("_one", lit(1)).join(tri, "_one")
        .selectExpr("n_nodes", "sum_deg DIV 2 AS n_edges",
          "n_triangles", "n_wedges",
          "CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE) " +
            "AS transitivity")
    }),

    // Duplicate-cluster size histogram — how much of the corpus sits in
    // how-big dup families (the before/after report of a dedup run: a
    // long tail of pairs vs a few mega-clusters need different
    // policies). Two slim aggregates over the proven component labels.
    "q_graph_cc_sizes" -> ((s, d) =>
      connectedComponents(
        nearDupPairs(s, d)
          .select("id_a", "id_b"))
        .groupBy("lbl").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy(asc_nulls_last("cluster_size"))),

    // Neighbor-set Jaccard similarity over the near-dup graph — the
    // link-prediction / "same cluster soon" score: two documents that
    // share most of their near-dup NEIGHBORS are alike even if their own
    // pair never collided in a band. Candidate pairs come from wedges
    // (only pairs with ≥ 1 common neighbor exist — never all-pairs);
    // |N(a)∩N(b)| is the wedge count per (a, b), |N(a)∪N(b)| =
    // deg(a) + deg(b) − common by inclusion-exclusion, and the Jaccard
    // is ONE IEEE division of exact integers. Scale: the wedge join is
    // keyed on the shared vertex (fan-out bounded by per-vertex degree²,
    // the common-neighbor standard), degrees join per endpoint.
    "q_graph_jaccard" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
        .select("id_a", "id_b")
      val sym = pairs.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select("e.src", "e.dst")
        .persistScoped()
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      val common = sym.select(col("src").as("v"), col("dst").as("a"))
        .join(sym.select(col("src").as("v"), col("dst").as("b")), "v")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
      common
        .join(deg.select(col("src").as("a"), col("deg").as("deg_a")), "a")
        .join(deg.select(col("src").as("b"), col("deg").as("deg_b")), "b")
        .select(col("a").as("id_a"), col("b").as("id_b"),
          col("n_common"), col("deg_a"), col("deg_b"),
          (col("n_common").cast("double")
            / (col("deg_a") + col("deg_b") - col("n_common"))).as("jac"))
        .orderBy(asc_nulls_last("id_a"), asc_nulls_last("id_b"))
    }),

    // Degree distribution of the near-dup graph — the 30-second triage
    // before any graph pass: a heavy tail here (one doc near-dup to
    // thousands) predicts hot keys in every downstream join and flags
    // boilerplate/template contamination. Two keyed aggregates on slim
    // rows; output bounded by the max degree.
    "q_graph_degree_dist" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
        .select("id_a", "id_b")
      pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy(asc_nulls_last("deg"))
    }),

    // BFS layers (hop distance ≤ 4) from the lowest-id node of the
    // near-dup graph — the "blast radius" probe: how much of the corpus
    // a single contaminated document reaches through chains of near
    // duplicates, by hop count. Four frontier rounds are unrolled on
    // both engines (the oracle's recursive CTE carries the same dist<4
    // cap); each round is one equi-join of the persisted symmetric edge
    // list against the LAST frontier only plus an anti-join against the
    // visited set — the standard distributed BFS, work proportional to
    // edges incident to the frontier, never a driver-side walk.
    "q_graph_bfs_layers" -> ((s, d) =>
      bfsLayers(nearDupPairs(s, d)
        .select("id_a", "id_b"), maxHops = 4)),

    // Harmonic closeness centrality of the 5 lowest-id nodes of the
    // near-dup graph (Marchiori & Latora 2000 — the disconnected-safe
    // closeness: H(s) = Σ 1/d(s,v), unreachable nodes contribute 0, so
    // no normalization fight over component size): "how central is
    // this document in its duplication neighborhood" — the seed-audit
    // a dedup operator runs on its worst survivors. Exactness: BFS
    // distances are exact integers from the multi-source frontier loop
    // (one (seed, node) visited set, per-round equi-joins — the
    // bfsLayers machinery with a seed column), and H is a FIXED 4-term
    // tree c1/1 + c2/2 + c3/3 + c4/4 over exact hop counts — written
    // identically on both engines. Scale: frontier joins are keyed
    // shuffles sized to seed-incident edges; seeds are a bounded
    // panel (5), hops bounded (4), so the loop is O(seeds · frontier),
    // never a corpus walk.
    "q_graph_closeness" -> ((s, d) =>
      harmonicCentrality(nearDupPairs(s, d)
        .select("id_a", "id_b"), nSeeds = 5, maxHops = 4)),

    // Incremental connected-components maintenance — the cluster-label
    // twin of q_dedup_incremental's pair economics (daily ingest must
    // UPDATE dedup clusters, not rebuild them): old×old edges feed the
    // base labeling, new-touching edges (shard doc_id % 7 == 0 on either
    // endpoint) feed the delta, and label propagation re-runs ONLY on the
    // components those new edges touch — untouched components keep their
    // labels verbatim. The min-label convention makes labels canonical,
    // so the merged result must equal the FULL-graph closure cell-exactly
    // — which is precisely what the oracle computes (with recomputed =
    // "cluster contains a shard doc", provably the same set). Scale: the
    // re-run is bounded by affected-component size, not corpus size.
    // Both edge sets come from ONE shared LSH run: band membership is
    // per-doc, so the full run's both-old slice IS nearDuplicates(old
    // corpus) and its new-touching slice IS q_dedup_incremental's output
    // (the identity DedupPipelineSpec proves) — the previous composition
    // signed + verified the corpus twice (old corpus, then the full
    // corpus inside the incremental query); sharing the verified pair
    // frame halves that signature/verify compute. Measured sf0.1 A/B is
    // timing-NEUTRAL (3.1 → 3.0 s subset) because the two CC loops'
    // per-round job-launch latency dominates at this scale — the shared
    // run is kept for the 100× story, where signatures over the corpus
    // are the dominant cost and the old version pays them 1.86×.
    "q_graph_cc_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = nearDupPairs(s, d)
        .select("id_a", "id_b").persistScoped()
      val oldPairs = pairs.filter(
        col("id_a") % 7 =!= 0 && col("id_b") % 7 =!= 0)
      val newEdges = pairs.filter(
        col("id_a") % 7 === 0 || col("id_b") % 7 === 0)
      val labelsOld = connectedComponents(oldPairs).persistScoped()
      // CONTRACT each old component to its label node (the label IS the
      // component's min id), map new-edge endpoints through the labels
      // (new/unseen nodes keep their own id), and propagate over the
      // contracted delta graph ONLY — bounded by |new edges|, never by
      // affected-component size (the second full CC the naive version
      // runs). The min of a merged component over {old component mins,
      // new ids} is the global min of its node set, so contracted labels
      // ARE the full-graph labels.
      def mapEnd(end: String) = {
        val m = labelsOld.select(col("id").as(end),
          col("lbl").as(s"${end}_m"))
        (df: DataFrame) => df.join(m, Seq(end), "left")
          .withColumn(end, coalesce(col(s"${end}_m"), col(end)))
          .drop(s"${end}_m")
      }
      val contracted = mapEnd("id_b")(mapEnd("id_a")(newEdges))
        .filter(col("id_a") =!= col("id_b"))
      val deltaLabels = connectedComponents(contracted).persistScoped()
      // old labels that merged (appear in the delta graph) re-map; the
      // rest keep their labels verbatim — the untouched-component
      // guarantee the oracle's full closure must agree with
      val oldFixed = labelsOld
        .join(deltaLabels.select(col("id").as("lbl")), Seq("lbl"),
          "left_anti")
        .select(col("id"), col("lbl"), lit(false).as("recomputed"))
      val oldMerged = labelsOld
        .join(deltaLabels.select(col("id").as("lbl"),
          col("lbl").as("new_lbl")), "lbl")
        .select(col("id"), col("new_lbl").as("lbl"),
          lit(true).as("recomputed"))
      // delta-graph nodes that are NEW docs (not old labels) — their
      // label comes straight from the contracted propagation
      val newNodes = deltaLabels
        .join(labelsOld.select(col("lbl").as("id")).distinct(),
          Seq("id"), "left_anti")
        .select(col("id"), col("lbl"), lit(true).as("recomputed"))
      oldFixed.union(oldMerged).union(newNodes)
        .select(col("id").as("doc_id"), col("lbl").as("cluster"),
          col("recomputed"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Modularity of the SOURCE partition over the near-dup graph — do
    // near-duplicates concentrate within a source (mirrors/SEO farms)
    // or bridge sources (syndication)? Per-community modularity terms
    // stay exact integers on the common 4m² denominator:
    // Q·4m² = Σ_c (4·m·e_c − d_c²) with m total edges, e_c intra-edges,
    // d_c the community degree sum — no division anywhere. Scale: one
    // slim count (m, a driver literal like q_join_bloom's), two keyed
    // aggregates over the source-labeled edge list; the doc_id→source
    // attachment is two hash equi-joins on the edge endpoints.
    "q_graph_modularity" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val srcMap = docs.select(col("doc_id"), col("source"))
      val lab = nearDupPairs(s, d)
        .select("id_a", "id_b")
        .join(srcMap.select(col("doc_id").as("id_a"),
          col("source").as("sa")), "id_a")
        .join(srcMap.select(col("doc_id").as("id_b"),
          col("source").as("sb")), "id_b")
        .persistScoped()
      val m = lab.count()
      val deg = lab.select(explode(array(col("sa"), col("sb")))
          .as("source"))
        .groupBy("source").agg(count(lit(1)).as("deg_sum"))
      val intra = lab.filter(col("sa") === col("sb"))
        .groupBy(col("sa").as("source"))
        .agg(count(lit(1)).as("intra_edges"))
      // 4m·e_c − d_c² and 4m² in exact 128-bit DECIMAL(38,0), shipped
      // VARCHAR-routed: 4m² wraps a driver Long once the near-dup edge
      // count passes ~1.5e9 — silently on Spark, where the old BIGINT
      // column arithmetic would diverge from DuckDB's HUGEINT (the
      // q_graph_assortativity §7.4 precedent; the scaled integers are
      // the portable readout, the caller does the one division).
      val m4 = lit(4L).cast("decimal(38,0)") * lit(m).cast("decimal(38,0)")
      deg.join(intra, Seq("source"), "left")
        .na.fill(0L, Seq("intra_edges"))
        .select(col("source"), col("intra_edges"), col("deg_sum"),
          (m4 * col("intra_edges").cast("decimal(38,0)")
            - col("deg_sum").cast("decimal(38,0)")
              * col("deg_sum").cast("decimal(38,0)"))
            .cast("string").as("q_num_scaled"),
          (m4 * lit(m).cast("decimal(38,0)"))
            .cast("string").as("q_den_scaled"))
        .orderBy(asc_nulls_last("source"))
    }),

    // k-core decomposition (k = 2) of the near-dup graph by iterative
    // peeling: repeatedly drop vertices whose degree among SURVIVING
    // vertices is < 2; what remains is the 2-core — the cyclically
    // interlinked duplication backbone (a doc near-dup to 2+ docs that
    // are themselves interlinked), as opposed to the chains and stars
    // q_graph_cc_sizes counts. Three peel rounds are unrolled on BOTH
    // engines (identical even if the fixed point lands earlier — extra
    // rounds are no-ops), then the final in-core degree is recomputed
    // over the peeled vertex set. Scale: each round is one keyed degree
    // aggregate (map-side combine) plus two endpoint semi-joins on the
    // persisted symmetric edge list — the standard distributed peel,
    // bounded rounds, never a per-vertex loop on the driver.
    "q_graph_kcore" -> ((s, d) =>
      kcore2(nearDupPairs(s, d)
        .select("id_a", "id_b"))
        .orderBy(asc_nulls_last("doc_id"))),

    // Community detection by synchronous label propagation over the
    // near-dup graph — the cheap-at-scale clustering that groups
    // boilerplate families WITHOUT the transitive-closure iteration of
    // connected components: 3 rounds, each node adopts the most common
    // label among its neighbors plus ONE self-vote (the damping that
    // stops 2-cycles oscillating under synchronous update), ties broken
    // by smallest label — fully deterministic, unlike classic
    // random-order LPA. Scale: each round is one edge-keyed hash join +
    // one (node, label)-keyed partial agg + a node-partitioned
    // row_number (never a global window); like q_graph_kcore, rounds
    // reference the previous frame twice but IDENTICALLY, so
    // ReuseExchange computes each round once and only the final labels
    // persist (two consumers: sizes + the output join).
    "q_graph_labelprop" -> ((s, d) => {
      var lbl = labelProp3(
        nearDupPairs(s, d)
          .select("id_a", "id_b"))
      lbl = lbl.persistScoped()
      val sz = lbl.groupBy("lbl").agg(count(lit(1)).as("n_members"))
      lbl.join(sz, "lbl")
        .select(col("id").as("doc_id"), col("lbl").as("community"),
          col("n_members"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Degree assortativity of the near-dup graph — Newman's r as pure
    // integer arithmetic: over the symmetric directed edge list,
    // r = (M·Σdadb − S1²) / (M·Σda² − S1²) with S1 = Σda (= Σ_v d_v²
    // by symmetry), every sum an exact 128-bit DECIMAL(38,0) (M·Σda³
    // overflows BIGINT on a big corpus) and ONE trailing IEEE division
    // of the two correctly-rounded doubles. The >2^53 numerator and
    // denominator ALSO ship as the §7.4 VARCHAR-routed strings —
    // positive r means duplicate hubs cluster with hubs (one boiler-
    // plate family), negative means hubs attach to leaves (a template
    // radiating near-identical one-off pages). Scale: two degree joins
    // keyed on the edge endpoints + one global agg with map-side
    // partials; nothing beyond the edge list is ever materialized.
    "q_graph_assortativity" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
        .select("id_a", "id_b")
      val sym = pairs.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select("e.src", "e.dst")
        .persistScoped() // two consumers: degrees + the labeled edge join
      val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      sym
        .join(deg.select(col("src"), col("deg").as("da")), "src")
        .join(deg.select(col("src").as("dst"), col("deg").as("db")),
          "dst")
        .agg(count(lit(1)).as("m_directed"),
          sum(expr("CAST(da AS DECIMAL(38,0)) * CAST(db AS DECIMAL(38,0))"))
            .as("sdadb"),
          sum(expr("CAST(da AS DECIMAL(38,0))")).as("s1"),
          sum(expr("CAST(da AS DECIMAL(38,0)) * CAST(da AS DECIMAL(38,0))"))
            .as("s2"))
        .select(col("m_directed"),
          expr("CAST(CAST(m_directed AS DECIMAL(38,0)) * sdadb - s1 * s1 " +
            "AS STRING)").as("num_str"),
          expr("CAST(CAST(m_directed AS DECIMAL(38,0)) * s2 - s1 * s1 " +
            "AS STRING)").as("den_str"),
          (expr("CAST(CAST(m_directed AS DECIMAL(38,0)) * sdadb - s1 * s1 " +
            "AS DOUBLE)")
            / expr("CAST(CAST(m_directed AS DECIMAL(38,0)) * s2 - s1 * s1 " +
              "AS DOUBLE)")).as("r"))
    }),

    // Benchmark decontamination: eval split = doc_id % 5 == 0; a train
    // document is contaminated if any of its distinct 8-gram hashes
    // appears anywhere in the eval split. Scale: the membership probe is
    // a gram-keyed SHUFFLE equi-join of two slim (doc_id, gm) / (gm)
    // slivers — the eval gram set is a corpus fraction by the declared
    // convention (20% of docs), so an unconditional broadcast of it
    // would OOM executors at 100 TB; leaving the join unhinted lets AQE
    // demote it to a broadcast at runtime ONLY when the measured build
    // side is actually small (the honest version of the "eval sets are
    // small" bet — decided per run from bytes, not assumed).
    "q_decontaminate" -> ((s, d) => {
      val g = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("grams", expr(
          s"CASE WHEN size(toks) >= $GramTokens THEN " +
            s"array_distinct(transform(sequence(0, size(toks) - $GramTokens), " +
            s"i -> md5(array_join(slice(toks, i + 1, $GramTokens), ' ')))) " +
            "ELSE array() END"))
        .select(col("doc_id"), col("grams"),
          size(col("grams")).cast("long").as("n_grams"))
        // three consumers (eval set, hit join, final left join) and the
        // doc_id filters push BELOW the gram transform — without the
        // cache every branch re-tokenizes and re-hashes its slice
        .persistScoped()
      val evalGrams = g.filter(col("doc_id") % 5 === 0)
        .select(explode(col("grams")).as("gm")).distinct()
      val train = g.filter(col("doc_id") % 5 =!= 0)
      val hits = train.select(col("doc_id"), explode(col("grams")).as("gm"))
        .join(evalGrams, "gm")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      train.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Inter-source contamination matrix — "which corpus sources share
    // content?" — the source-grain sibling of q_decontaminate: for
    // every source pair, the count of distinct 8-gram hashes both
    // contain, plus the overlap coefficient |A∩B| / min(|A|,|B|) (one
    // IEEE division of exact counts). Scale: the (source, gram)
    // frame is deduped BEFORE the self-join, the join is keyed on the
    // gram hash, and in-gram fan-out is bounded by the SOURCE DOMAIN
    // (≤ 20 sources → ≤ 190 pairs per gram — the in-bucket LSH
    // argument, never corpus-quadratic); totals are a 20-row
    // broadcast.
    "q_source_overlap" -> ((s, d) => {
      // gram positions via a GENERATOR, md5 as a codegen'd column expr
      // (the q_embed_cov lesson — the transform-HOF form hashed every
      // shingle in the interpreter); the terminal distinct supersedes
      // the HOF form's in-row array_distinct
      val g = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= GramTokens)
        .select(col("source"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - GramTokens))
            .as("i"))
        .select(col("source"), expr(
          s"md5(array_join(slice(toks, i + 1, $GramTokens), ' '))")
          .as("gm"))
        .distinct()
        // persisted: three consumers (totals, both self-join sides)
        // would each re-tokenize and re-hash the corpus
        .persistScoped()
      val tot = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
      val a = g.select(col("gm"), col("source").as("src_a"))
      val b = g.select(col("gm"), col("source").as("src_b"))
      a.join(b, "gm").filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
        .join(broadcast(tot.select(col("source").as("src_a"),
          col("n_grams").as("ta"))), "src_a")
        .join(broadcast(tot.select(col("source").as("src_b"),
          col("n_grams").as("tb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"),
          (col("n_shared").cast("double") / least(col("ta"), col("tb")))
            .as("overlap_coef"))
        .orderBy(asc_nulls_last("src_a"), asc_nulls_last("src_b"))
    }),

    // C4-style repeated-span removal: cut each document into consecutive
    // 10-token spans; any span text occurring MORE THAN ONCE in the whole
    // corpus (across or within documents) is dropped from every document;
    // survivors re-assemble in order. Scale: one (span-hash) shuffle for
    // the occurrence count — O(total tokens / 10) slim rows — and one
    // doc_id shuffle to re-assemble; the reassembly collect is
    // sort_array'd so the result is partition-order-invariant.
    "q_dedup_spans" -> ((s, d) => {
      val base = t(s, d, "documents")
        .filter(col("text").isNotNull)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_spans", expr(
          s"CAST((size(toks) + ${SpanTokens - 1}) div $SpanTokens AS BIGINT)"))
      val spans = base.select(col("doc_id"), col("n_spans"),
        posexplode(expr(
          s"transform(sequence(0, CAST(n_spans AS INT) - 1), " +
            s"c -> array_join(slice(toks, c * $SpanTokens + 1, $SpanTokens)," +
            " ' '))")).as(Seq("pos", "span")))
      val occ = spans.groupBy("span").agg(count(lit(1)).as("occ"))
      val kept = spans.join(occ, "span").filter(col("occ") === 1)
      val reassembled = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ", expr(
            "transform(sort_array(collect_list(struct(pos, span))), " +
              "x -> x.span)")).as("kept_text"))
      base.select("doc_id", "n_spans")
        .join(reassembled, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          md5(coalesce(col("kept_text"), lit(""))).as("kept_md5"))
        .orderBy(asc_nulls_last("doc_id"))
    }),

    // Per-language vocabulary build: token frequencies per language with
    // contiguous per-language ids by (freq DESC, token ASC) — the
    // tokenizer-vocab initialization shape. The ranking window partitions
    // by lang, so no global sequential funnel exists; at 100 TB each
    // language ranks independently after one (lang, tok) shuffle with
    // map-side partial counts.
    "q_vocab_per_lang" -> ((s, d) => {
      val tf = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang")
        .orderBy(desc_nulls_last("n"), asc_nulls_last("tok"))
      tf.withColumn("vocab_id", row_number().over(w).cast("long"))
        .filter(col("vocab_id") <= 100)
        .select("lang", "vocab_id", "tok", "n")
        .orderBy(asc_nulls_last("lang"), asc_nulls_last("vocab_id"))
    }),

    // Per-source language entropy — the crawl-homogeneity readout: a
    // source whose language distribution has near-zero entropy is a
    // single-language site (its langid gate can be fixed); high entropy
    // flags an aggregator/mirror whose per-language quality must be
    // audited separately. Same bit-portable log2 + 1e-10-grid term
    // quantization as q_event_entropy (every log2 identical text, the
    // per-language terms sum as exact integers). Scale: ONE keyed
    // partial agg to the ≤ |sources|×|langs| grid; everything after
    // runs on that bounded frame.
    "q_source_lang_entropy" -> ((s, d) => {
      val lc = t(s, d, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val terms = lc
        .withColumn("e2", expr(graft.Det.log2Exp("c")))
        .withColumn("mm", expr(graft.Det.mantissa("c", "e2")))
        .withColumn("zz", expr(graft.Det.zOfM("mm")))
        .withColumn("l2",
          expr(s"CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")}"))
        .withColumn("q", expr(
          "CAST(floor(CAST(c AS DOUBLE) * l2 " +
            "* CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("source")
        .agg(sum("c").as("n_docs"), count(lit(1)).as("n_langs"),
          sum("q").as("sq"))
      terms
        .withColumn("e2", expr(graft.Det.log2Exp("n_docs")))
        .withColumn("mm", expr(graft.Det.mantissa("n_docs", "e2")))
        .withColumn("zz", expr(graft.Det.zOfM("mm")))
        .withColumn("entropy_bits", expr(
          s"CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")} " +
            "- CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE) " +
            "/ CAST(n_docs AS DOUBLE)"))
        .select("source", "n_docs", "n_langs", "entropy_bits")
        .orderBy(asc_nulls_last("source"))
    }),

    // Source-quota sampling (corpus balancing): keep at most 20 docs per
    // source, chosen by seed-free md5 order so the selection is
    // partitioning- and cluster-layout-invariant; membership proven to
    // the oracle by the kept-id checksum. Per-source window + one
    // groupBy — the per-group variant of q_sample_stratified.
    "q_source_quota" -> ((s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")).asc_nulls_last,
          asc_nulls_last("doc_id"))
      t(s, d, "documents")
        .withColumn("rk", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("rk") <= 20, 1)).as("n_kept"),
          sum(when(col("rk") <= 20, col("doc_id"))).as("kept_id_sum"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Herfindahl–Hirschman concentration of the source mixture — the
    // single-number "is one crawl dominating the corpus" monitor next
    // to q_source_lang_entropy's information view and q_event_gini's
    // inequality view (HHI is the standard concentration index;
    // Herfindahl 1950, Hirschman 1945). Kept exact the q_event_gini
    // way: HHI = Σ n_s² / N² as two exact DECIMAL(38,0) integers
    // (HUGEINT in the oracle; n_s² wraps BIGINT once a source passes
    // ~3e9 docs, hence the §7.4 route), VARCHAR-routed, ONE trailing
    // IEEE division; the normalized variant (HHI − 1/k)/(1 − 1/k) is
    // the same division after exact cross-multiplied rescaling:
    // (k·Σn_s² − N²) / (N²·(k − 1)). Scale: one keyed count with
    // map-side combine; the source domain (≤ dozens) collapses to one
    // wide aggregate row.
    // Gini coefficient of source char mass — the INEQUALITY member of
    // the concentration trio (HHI = Simpson family, N_eff = Kish; Gini
    // is the Lorenz-curve number policy people quote): computed by the
    // pairwise mean-absolute-difference identity G = Σ_ij|w_i − w_j| /
    // (2k·Σw), which needs NO sorted ranks — the |sources|² self-join
    // (≤ 400 pairs, bounded by the source DOMAIN) replaces the global
    // rank window the classic formula wants, so not even a bounded
    // unpartitioned window exists here. Exact DECIMAL(38,0) sums; one
    // trailing division. Scale: one source-keyed agg; everything after
    // is domain-bounded.
    "q_source_gini" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val ws = t(s, d, "documents")
        .groupBy("source").agg(sum("n_chars").as("w"))
      val pairs = ws.select(col("w").as("wa"))
        .withColumn("_one", lit(1))
        .join(broadcast(ws.select(col("w").as("wb"))
          .withColumn("_one", lit(1))), "_one")
        .agg(sum(expr(s"CAST(abs(wa - wb) AS $dec)")).as("sad"))
        .withColumn("_one", lit(1))
      ws.agg(count(lit(1)).as("k"), sum(col("w").cast(dec)).as("sw"))
        .withColumn("_one", lit(1)).join(broadcast(pairs), "_one")
        .withColumn("gini", expr(
          "CAST(CAST(sad AS STRING) AS DOUBLE) " +
            "/ (CAST(2 AS DOUBLE) * CAST(k AS DOUBLE) " +
            "* CAST(CAST(sw AS STRING) AS DOUBLE))"))
        .select("k", "gini")
    }),

    // Kish effective sample size (Kish 1965, the survey-weighting
    // design effect applied to corpus curation): with per-source char
    // mass as the implicit training weight, N_eff = (Σw)²/Σw² says how
    // many EQUALLY-weighted sources the mixture is worth — the honest
    // "how diverse is this corpus really?" scalar behind every
    // source-mix decision (N_eff ≪ k means a few giants dominate and
    // dedup/temperature reweighting is overdue; the design effect
    // k/N_eff is the variance inflation a model pays for the skew).
    // Exact DECIMAL(38,0) char sums and squares, ONE trailing division
    // each for n_eff and deff. Scale: one source-keyed agg with
    // map-side combine + a |sources|-bounded fold.
    "q_source_effective_n" -> ((s, d) => {
      val dec = "decimal(38,0)"
      t(s, d, "documents")
        .groupBy("source").agg(sum("n_chars").as("w"))
        .agg(count(lit(1)).as("k"),
          sum(col("w").cast(dec)).as("sw"),
          sum(col("w").cast(dec) * col("w").cast(dec)).as("sww"))
        .select(col("k"), col("sw").cast("string").as("sum_w"),
          (expr(s"CAST(CAST(sw AS $dec) * CAST(sw AS $dec) " +
            "AS STRING)").cast("double")
            / expr("CAST(CAST(sww AS STRING) AS DOUBLE)"))
            .as("n_eff"),
          (col("k").cast("double")
            * expr("CAST(CAST(sww AS STRING) AS DOUBLE)")
            / expr(s"CAST(CAST(CAST(sw AS $dec) * CAST(sw AS $dec) " +
            "AS STRING) AS DOUBLE)")).as("design_effect"))
    }),

    "q_source_hhi" -> ((s, d) => {
      val dec = "decimal(38,0)"
      t(s, d, "documents")
        .groupBy("source").agg(count(lit(1)).as("ns"))
        .agg(count(lit(1)).as("k"), sum("ns").as("n_docs"),
          sum(col("ns").cast(dec) * col("ns").cast(dec)).as("s2"))
        .select(col("k"), col("n_docs"),
          col("s2").cast("string").as("sum_sq"),
          (col("s2").cast("double")
            / (col("n_docs").cast(dec) * col("n_docs").cast(dec))
              .cast("double")).as("hhi"),
          // guarded: k = 1 would divide by zero, where Spark yields
          // NULL but DuckDB yields ±Infinity — NULL on BOTH engines
          // is the deterministic degenerate answer
          when(col("k") > 1,
            (col("k").cast(dec) * col("s2")
              - col("n_docs").cast(dec) * col("n_docs").cast(dec))
              .cast("double")
              / ((col("n_docs").cast(dec) * col("n_docs").cast(dec))
                * (col("k").cast(dec) - lit(1)))
                .cast("double")).as("hhi_normalized"))
    }),

    // Dataset-mixture balancing: given integer target weights per source
    // (the mixing ratios of a pretraining recipe), compute each source's
    // keep rate min(1, w_s·N / (W·n_s)) and sample it with the seed-free
    // md5 bucket — all comparisons cross-multiplied so no engine ever
    // divides. Scale: per-source counts are one tiny aggregate broadcast
    // back; the sampling pass is narrow; buckets are 4-digit so the
    // cross-product w·N·10^4 stays far inside BIGINT at petabyte corpus
    // sizes. Membership proven by the kept-id checksum.
    "q_mixture_weights" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("w", expr(
          "CAST(1 + (CAST(substring(source, 4) AS INT) % 4) * 2 AS BIGINT)"))
        .withColumn("b", expr(
          "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)" +
            " AS BIGINT) % 10000"))
      val perSource = docs.groupBy("source", "w")
        .agg(count(lit(1)).as("n_s"))
      val totals = perSource
        .agg(sum("n_s").as("n_total"), sum("w").as("w_total"))
        .withColumn("_k", lit(1))
      val rates = broadcast(perSource.drop("w").withColumn("_k", lit(1))
        .join(broadcast(totals), "_k").drop("_k"))
      docs.join(rates, "source")
        .withColumn("keep",
          col("b") * col("w_total") * col("n_s")
            < col("w") * col("n_total") * lit(10000L))
        .groupBy("source", "w", "n_s")
        .agg(count(when(col("keep"), 1)).as("n_kept"),
          sum(when(col("keep"), col("doc_id"))).as("kept_id_sum"))
        .select("source", "w", "n_s", "n_kept", "kept_id_sum")
        .orderBy(asc_nulls_last("source"))
    }),

    // Class balancing: downsample every label to the MINORITY class size
    // (the classic class-imbalance fix), selection by seed-free md5 order
    // so the kept set is partitioning-invariant. The minority size is a
    // 1-row aggregate broadcast to the ranked rows (bounded nested-loop,
    // the q_text_docfreq pattern); ranking is one per-label window.
    "q_label_balance" -> ((s, d) => {
      val w = Window.partitionBy("label")
        .orderBy(md5(col("vec_id").cast("string")).asc_nulls_last,
          asc_nulls_last("vec_id"))
      val ranked = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"))
        .withColumn("rk", row_number().over(w).cast("long"))
      val minC = broadcast(ranked.groupBy("label")
        .agg(count(lit(1)).as("cnt"))
        .agg(min("cnt").as("m")).withColumn("_k", lit(1)))
      ranked.withColumn("_k", lit(1)).join(minC, "_k")
        .groupBy("label")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("rk") <= col("m"), 1)).as("n_kept"),
          sum(when(col("rk") <= col("m"), col("vec_id")))
            .as("kept_id_sum"))
        .orderBy(asc_nulls_last("label"))
    }),

    // The END-TO-END curation pipeline — the composition a real
    // training-data run executes nightly, as ONE declared query whose
    // stages are the individually-proven operators chained:
    //   1. quality gate   — Quality.gopherMetrics (the q_quality_gopher
    //      frame, shared by construction), keep `passes`;
    //   2. exact dedup    — keep MIN doc_id per md5(text) (q_text_dedup
    //      policy): one slim keyed aggregate + a key semi-join;
    //   3. near-dup drop  — TextDedup.nearDuplicates over the KEPT
    //      corpus (not the raw one: stages compose), greedy policy =
    //      drop every non-minimal pair member (any doc appearing as
    //      id_b), a LEFT ANTI against the distinct loser sliver. The
    //      simple-greedy vs cluster-survivor distinction is deliberate:
    //      q_dedup_survivor demonstrates the cluster-quality policy,
    //      this pipeline the cheap streaming-friendly one;
    //   4. source quota   — first 20 docs per source by doc_id (the
    //      q_source_quota policy) via a per-source partitioned window;
    //   5. report         — per-lang docs/chars/sources.
    // Scale: every stage is a keyed shuffle of slivers or a narrow map;
    // the only window is source-partitioned; the LSH stage is the
    // bucketed pipeline, never all-pairs.
    "q_corpus_curate" -> ((s, d) => {
      // stages 1–3 are the shared named stages (cleanKept/cleanLosers)
      // — the same materializations v2/v3 and the dup-graph loops read
      val kept = cleanKept(s, d)
      val losers = cleanLosers(s, d)
      val surv = kept.join(losers, Seq("doc_id"), "left_anti")
      val w = Window.partitionBy("source").orderBy("doc_id")
      surv.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct("source").as("n_sources"))
        .orderBy(asc_nulls_last("lang"))
    }),

    // The curation pipeline v2 — q_corpus_curate with the
    // DECONTAMINATION stage a benchmark-honest run inserts between
    // near-dup drop and quota: train docs sharing any distinct 8-gram
    // with the eval split (doc_id % 5 == 0, q_decontaminate's
    // convention, grams built from the RAW corpus so eval membership
    // does not depend on earlier gates) are dropped, and the eval docs
    // themselves leave the train stream. Scale adds one gram-keyed
    // shuffle equi-join of slim (doc_id, gm) / (gm) slivers — the
    // q_decontaminate economics grafted into the composition (the eval
    // gram set is 20% of the corpus by convention, so it is never
    // broadcast unconditionally; AQE may demote at runtime from
    // measured bytes).
    "q_corpus_curate_v2" -> ((s, d) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
      curatedClean(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct("source").as("n_sources"))
        .orderBy(asc_nulls_last("lang"))
    }),

    // v3: the curated-clean corpus feeds TOKEN-BUDGET construction —
    // the step after cleaning, where a training run of fixed size must
    // be drawn from the cleaned pool: a 100k-token budget apportions
    // across sources by the largest-remainder (Hamilton) method over
    // clean token counts (q_source_budget's exact-integer machinery),
    // then each source's quota is CONSUMED greedily in the seed-free
    // md5(doc_id) order (q_source_quota's partitioning-invariant
    // selection) — whole documents only, stop before the first doc
    // that would overflow the quota. Everything is exact integers; the
    // oracle proves the COMPOSITION (gate → exact dedup → LSH drop →
    // decontaminate → apportion → consume) end to end. Scale: the
    // clean stages are the proven v2 shapes; apportionment runs on the
    // source-domain-bounded frame (global rank window ≤ |sources|
    // rows, allowlisted); consumption is one source-partitioned
    // prefix-sum window.
    "q_corpus_curate_v3" -> ((s, d) => {
      val B = 100000L
      val clean = curatedClean(s, d)
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .persistScoped() // two consumers: per-source counts + quota consumption
      val cnt = clean.groupBy("source")
        .agg(count(lit(1)).as("n_clean_docs"),
          sum("n_toks").as("n_clean_tokens"))
      val tot = broadcast(cnt.agg(sum("n_clean_tokens").as("tot"))
        .withColumn("_one", lit(1)))
      val base = cnt.withColumn("_one", lit(1)).join(tot, "_one")
        .withColumn("b128", expr(
          s"CAST($B AS DECIMAL(38,0)) * CAST(n_clean_tokens " +
            "AS DECIMAL(38,0))"))
        .withColumn("base", expr(
          "CAST(b128 DIV CAST(tot AS DECIMAL(38,0)) AS BIGINT)"))
        .withColumn("rem", expr(
          "CAST(b128 - CAST(base AS DECIMAL(38,0)) " +
            "* CAST(tot AS DECIMAL(38,0)) AS BIGINT)"))
      val ext = broadcast(base.agg((lit(B) - sum("base")).as("n_extra"))
        .withColumn("_one", lit(1)))
      val wr = Window.orderBy(desc_nulls_last("rem"),
        asc_nulls_last("source"))
      val alloc = base.withColumn("rk", row_number().over(wr))
        .join(ext, "_one")
        .withColumn("alloc", col("base")
          + when(col("rk") <= col("n_extra"), 1L).otherwise(0L))
        .select("source", "n_clean_docs", "n_clean_tokens", "alloc")
      val wq = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")).asc_nulls_last,
          asc_nulls_last("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val kept = clean
        .withColumn("cum", sum(col("n_toks")).over(wq))
        .join(alloc.select("source", "alloc"), "source")
        .filter(col("cum") <= col("alloc"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept_docs"),
          sum("n_toks").as("kept_tokens"))
      alloc.join(kept, Seq("source"), "left")
        .na.fill(0L, Seq("n_kept_docs", "kept_tokens"))
        .select("source", "n_clean_docs", "n_clean_tokens", "alloc",
          "n_kept_docs", "kept_tokens")
        .orderBy(asc_nulls_last("source"))
    }),

    // Corpus snapshot delta — the CDC reconciliation a pipeline runs
    // between two crawl snapshots before re-training: per source, how
    // many documents were added, removed, changed (same id, different
    // content hash), unchanged. Snapshots derive deterministically from
    // the fixture (the OLD snapshot holds doc_id % 7 != 3, the NEW one
    // doc_id % 11 != 5 with doc_id % 13 == 2 texts revised by a suffix
    // token). Scale: ONE doc_id-keyed full-outer join of slim
    // (id, source, md5) slivers — the canonical two-snapshot diff;
    // document CONTENT never shuffles, only its 16-byte hash, so the
    // join cost is id-cardinality, not corpus bytes.
    "q_corpus_snapshot_delta" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val old = docs.filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), col("source"), md5(col("text")).as("h_old"))
      val neu = docs.filter(col("doc_id") % 11 =!= 5)
        .select(col("doc_id"), col("source"),
          md5(when(col("doc_id") % 13 === 2,
              concat(col("text"), lit(" rev2")))
            .otherwise(col("text"))).as("h_new"))
      old.join(neu, Seq("doc_id", "source"), "full_outer")
        .groupBy("source")
        .agg(
          sum(when(col("h_old").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("h_new").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("h_old").isNotNull && col("h_new").isNotNull
              && col("h_old") =!= col("h_new"), 1L).otherwise(0L))
            .as("n_changed"),
          sum(when(col("h_old") === col("h_new"), 1L).otherwise(0L))
            .as("n_unchanged"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Incremental view maintenance over the same two-snapshot convention
    // — the "never recompute the 100 TB rollup per crawl" algebra: the
    // per-source char total of the NEW snapshot is maintained from the
    // OLD total plus delta terms (added docs' chars, minus removed docs'
    // chars, plus the length shift of revised docs), and the query emits
    // BOTH the maintained value and the direct recomputation so the
    // oracle proves the algebra cell-exactly (ivm_matches pins it
    // per-source). Scale: the delta terms touch ONLY delta rows (one
    // full-outer id-join of slim (id, source, len) slivers — the
    // snapshot_delta economics); the direct recomputation exists for the
    // proof, a production pipeline ships just the maintained column.
    "q_snapshot_ivm" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val oldF = docs.filter(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), col("source"),
          length(col("text")).cast("long").as("len_old"))
      val newText = when(col("doc_id") % 13 === 2,
        concat(col("text"), lit(" rev2"))).otherwise(col("text"))
      val newF = docs.filter(col("doc_id") % 11 =!= 5)
        .select(col("doc_id"), col("source"),
          length(newText).cast("long").as("len_new"))
      val oldAgg = oldF.groupBy("source")
        .agg(count(lit(1)).as("n_old"), sum("len_old").as("sum_old"))
      val delta = oldF.join(newF, Seq("doc_id", "source"), "full_outer")
        .groupBy("source")
        .agg(
          sum(when(col("len_old").isNull, col("len_new"))
            .otherwise(0L)).as("add_chars"),
          sum(when(col("len_new").isNull, col("len_old"))
            .otherwise(0L)).as("del_chars"),
          sum(when(col("len_old").isNotNull && col("len_new").isNotNull,
            col("len_new") - col("len_old")).otherwise(0L))
            .as("rev_shift"))
      val direct = newF.groupBy("source")
        .agg(count(lit(1)).as("n_new"), sum("len_new").as("sum_new"))
      oldAgg.join(delta, "source").join(direct, "source")
        .select(col("source"), col("n_old"), col("n_new"),
          col("sum_old"), col("add_chars"), col("del_chars"),
          col("rev_shift"),
          (col("sum_old") + col("add_chars") - col("del_chars")
            + col("rev_shift")).as("sum_new_ivm"),
          col("sum_new").as("sum_new_direct"),
          (col("sum_old") + col("add_chars") - col("del_chars")
            + col("rev_shift") === col("sum_new")).as("ivm_matches"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Per-source KL divergence from the corpus token distribution —
    // "which sources are distributionally unusual" (the
    // domain-reweighting diagnostic next to q_mixture_weights'
    // count-based view and q_source_token_shift's total-variation
    // distance; KL is the information-theoretic one, unlocked by the r8
    // portable log2). KL(p_s ‖ p) = Σ_t (c_st/N_s)·log2(c_st·N /
    // (N_s·c_t)) — both log arguments are INTEGER products (< 2^53), so
    // the bits are bit-portable; each term quantizes to the exact 1e-10
    // grid and sums as integers. Scale: one (source, token) shuffle with
    // map-side combine; the corpus-count probe is a token-keyed shuffle
    // join (never a vocabulary broadcast); totals are a 1-row
    // constant-key broadcast + a source-domain-bounded join.
    "q_source_kl" -> ((s, d) => {
      val st = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("cst"))
      val ct = st.groupBy("tok").agg(sum("cst").as("ct"))
      val ns = st.groupBy("source").agg(sum("cst").as("ns"))
      val tot = broadcast(ct.agg(sum("ct").as("n"))
        .withColumn("_one", lit(1)))
      val j = st.join(ct, "tok").join(ns, "source")
        .withColumn("_one", lit(1)).join(tot, "_one")
        .withColumn("num", col("cst") * col("n"))
        .withColumn("den", col("ns") * col("ct"))
      graft.Det.withPlog2(graft.Det.withPlog2(j, "num", "l2n"),
          "den", "l2d")
        .withColumn("q", expr(
          "CAST(floor(CAST(cst AS DOUBLE) * (l2n - l2d) " +
            "/ CAST(ns AS DOUBLE) * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("source")
        .agg(max("ns").as("n_tokens"), count(lit(1)).as("n_types"),
          sum("q").as("sq"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr("CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE)")
            .as("kl_bits"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Jensen–Shannon divergence (Lin 1991) per source vs the REST of
    // the corpus — the SYMMETRIC, bounded-[0,1] sibling of q_source_kl
    // (KL is infinite on source-only tokens and asymmetric; data-mixture
    // balancing work compares sources with JSD for exactly that reason).
    // JSD(P‖Q) = ½Σp·log2(p/m) + ½Σq·log2(q/m), m = (p+q)/2, with
    // p = c_st/N_s and q = (c_t−c_st)/(N−N_s). Every log argument is a
    // ratio of INTEGER products: p/m = 2·c_st·nr / (c_st·nr + rt·ns),
    // q/m = 2·rt·ns / (same den) — three portable-log2 chains per
    // (source, token) row, each term quantized to the 1e-10 grid and
    // integer-summed (< 2^53 at any local SF; the DECIMAL(38,0) drop-in
    // applies past ~1e15 tokens, the q_source_kl note). Tokens ABSENT
    // from the source need no join at all: their q/m is exactly 2, so
    // the whole missing mass folds to the CLOSED FORM (N − Σ_{t∈s}c_t)
    // / (2·nr) — one extra aggregate column instead of an anti-join.
    // A source-only token's q-part is 0·log0 = 0 (guarded); its p-part
    // log2 is exactly 1 on the grid (plog2(2x) − plog2(x) ≡ 1).
    // Scale: identical economics to q_source_kl — one (source, token)
    // shuffle with map-side combine, token-keyed probe join, 1-row
    // total broadcast; the closing term is free.
    "q_source_jsd" -> ((s, d) => {
      val st = t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("cst"))
      val ct = st.groupBy("tok").agg(sum("cst").as("ct"))
      val ns = st.groupBy("source").agg(sum("cst").as("ns"))
      val tot = broadcast(ct.agg(sum("ct").as("n"))
        .withColumn("_one", lit(1)))
      val j = st.join(ct, "tok").join(ns, "source")
        .withColumn("_one", lit(1)).join(tot, "_one")
        .withColumn("rt", col("ct") - col("cst"))
        .withColumn("nr", col("n") - col("ns"))
        .withColumn("nump", lit(2L) * col("cst") * col("nr"))
        // rt = 0 would feed plog2(0); the q-part is zeroed by its rt
        // coefficient anyway, and plog2(1) = 0 exactly
        .withColumn("numq", expr(
          "CASE WHEN rt > 0 THEN 2 * rt * ns ELSE CAST(1 AS BIGINT) END"))
        .withColumn("den", col("cst") * col("nr") + col("rt") * col("ns"))
      graft.Det.withPlog2(graft.Det.withPlog2(graft.Det.withPlog2(
          j, "nump", "lp"), "numq", "lq"), "den", "ld")
        .withColumn("q", expr(
          "CAST(floor((CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE) " +
            "* (lp - ld) " +
            "+ CASE WHEN rt > 0 THEN CAST(rt AS DOUBLE) " +
            "/ CAST(nr AS DOUBLE) * (lq - ld) " +
            "ELSE CAST(0 AS DOUBLE) END) " +
            "/ CAST(2 AS DOUBLE) * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("source")
        .agg(max("ns").as("n_tokens"), max("nr").as("n_rest"),
          max("n").as("_n"), count(lit(1)).as("n_types"),
          sum("q").as("sq"), sum("ct").as("cts_present"))
        .withColumn("qmiss", expr(
          "CASE WHEN n_rest > 0 THEN " +
            "CAST(floor(CAST(_n - cts_present AS DOUBLE) " +
            "/ (CAST(2 AS DOUBLE) * CAST(n_rest AS DOUBLE)) " +
            "* CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT) END"))
        .select(col("source"), col("n_tokens"), col("n_rest"),
          col("n_types"),
          expr("CASE WHEN n_rest > 0 THEN " +
            "CAST(sq + qmiss AS DOUBLE) " +
            "/ CAST(10000000000 AS DOUBLE) END").as("jsd_bits"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Boilerplate removal: documents wrapped in deterministic HTML (tags,
    // entities, chrome) and cleaned back — tag strip, entity unescape,
    // whitespace collapse — with the SAME regexes on both engines (the
    // C4/CCNet-style HTML-to-text front door). Pure narrow map; output
    // proven by md5 of the cleaned text plus tag counts.
    "q_text_clean" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").isNotNull)
        .withColumn("html", concat(
          lit("<div class=\"doc\" id=\""), col("doc_id").cast("string"),
          lit("\"><h1>Doc &amp; friends</h1><p>"), col("text"),
          lit("</p><br/><span>&copy; example&nbsp;corp</span></div>")))
        .withColumn("n_tags", expr(
          "CAST(size(regexp_extract_all(html, '<[^>]*>', 0)) AS BIGINT)"))
        .withColumn("clean", expr(
          "trim(regexp_replace(replace(replace(replace(" +
            "regexp_replace(html, '<[^>]*>', ' '), " +
            "'&nbsp;', ' '), '&amp;', '&'), '&copy;', '(c)'), " +
            "'\\\\s+', ' '))"))
        .select(col("doc_id"), col("n_tags"),
          length(col("clean")).cast("long").as("clean_len"),
          md5(col("clean")).as("clean_md5"))
        .orderBy(asc_nulls_last("doc_id"))),

    // URL structure extraction: a synthetic-but-realistic URL per document
    // (host varies by source and language TLD), parsed back with the SAME
    // regexes on both engines (DuckDB 1.0 has no parse_url, so regexes are
    // the portable formulation). Pure narrow map — the shape of a
    // domain-blocklist filter at 100 TB.
    "q_url_parse" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("tld", expr(
          "CASE lang WHEN 'de' THEN 'de' WHEN 'es' THEN 'es' " +
            "WHEN 'fr' THEN 'fr' WHEN 'zh' THEN 'cn' ELSE 'com' END"))
        .withColumn("url", concat(
          lit("https://www."), col("source"), lit(".example."), col("tld"),
          lit("/"), col("lang"), lit("/doc-"), col("doc_id"),
          lit("?ref=r"), col("doc_id") % 7))
        .select(col("doc_id"), col("url"),
          regexp_extract(col("url"), "^https?://([^/]+)", 1).as("host"),
          regexp_extract(col("url"), "^https?://[^/]+(/[^?]*)", 1)
            .as("path"),
          regexp_extract(col("url"), "[?&]ref=([^&]+)", 1).as("ref"))
        .orderBy(asc_nulls_last("doc_id"))),

    // URL canonicalization dedup — the crawl-frontier dedup a web-corpus
    // pipeline runs BEFORE fetching anything twice: raw URLs differ by
    // host case, tracking params (utm_*), fragments and trailing slashes
    // while naming the same page. URLs synthesize deterministically from
    // the fixture (page identity doc_id % 200 plus doc_id-driven
    // decorations so every noise class is present), canonicalize by
    // lowercase → fragment strip → utm strip → trailing-slash strip
    // (each decoration appears at most once, so literal `replace` and
    // single-match regexes behave identically on both engines), and
    // duplicates are raw URLs sharing a canonical form. Scale:
    // canonicalization is a narrow map; the dedup is ONE groupBy on the
    // canonical string — slim keys, no pairwise product anywhere.
    "q_dedup_url" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("page", col("doc_id") % 200)
        .withColumn("host",
          concat(lit("www."), col("source"), lit(".example.com")))
        .withColumn("url", concat(
          lit("https://"),
          when(col("doc_id") % 5 === 0, upper(col("host")))
            .otherwise(col("host")),
          lit("/"), col("lang"), lit("/doc-"), col("page"),
          when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
              lit("?utm_source=feed&utm_campaign=c"))
            .when(col("doc_id") % 3 === 1,
              concat(lit("?v="), col("page") % 4))
            .otherwise(concat(lit("?utm_source=feed&utm_campaign=c&v="),
              col("page") % 4)),
          when(col("doc_id") % 4 === 0, lit("#section2"))
            .otherwise(lit(""))))
        .withColumn("canon", expr(
          "regexp_replace(replace(replace(replace(" +
            "regexp_replace(lower(url), '#.*$', ''), " +
            "'utm_source=feed&utm_campaign=c&', ''), " +
            "'?utm_source=feed&utm_campaign=c', ''), " +
            "'/?', '?'), '/$', '')"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canon")).as("n_canon"),
          (count(lit(1)) - countDistinct(col("canon"))).as("n_dup"))
        .orderBy(asc_nulls_last("source"))),

    // Cross-document boilerplate line removal — the C4/CCNet stage that
    // drops nav bars, cookie banners and copyright footers BY FREQUENCY,
    // not by markup: a "line" seen in ≥ 30% of a source's documents
    // (and ≥ 5 of them) is chrome, not content. Every document frames
    // deterministically with a per-source header/footer and its text
    // splits into 12-token lines, so the detector has real boilerplate
    // to find while body lines stay (mostly) unique — the detection
    // itself is honest counting. Scale: lines shuffle once as
    // (source, md5) slivers for the doc-frequency count, then join back
    // to instances by the same slim key (gram-keyed shuffle, never a
    // vocabulary broadcast); only the 20-row per-source doc-count table
    // broadcasts. The 30% gate cross-multiplies (ldf·10 ≥ n_docs·3) —
    // no division, no FP.
    "q_text_boilerplate" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
      val inst = docs
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("line", explode(concat(
          array(concat(lit("home | about | contact | "), col("source"))),
          expr("transform(sequence(0, CAST(floor((n_toks - 1) / 12) " +
            "AS INT)), c -> array_join(slice(toks, c * 12 + 1, 12), ' '))"),
          array(concat(lit("copyright "), col("source"),
            lit(" all rights reserved"))))))
        .select(col("doc_id"), col("source"), md5(col("line")).as("lh"),
          length(col("line")).cast("long").as("llen"))
      val ldf = inst.groupBy("source", "lh")
        .agg(countDistinct(col("doc_id")).as("ldf"))
      val nd = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      inst.join(ldf, Seq("source", "lh"))
        .join(broadcast(nd), "source")
        .withColumn("boiler",
          col("ldf") * 10 >= col("n_docs") * 3 && col("ldf") >= 5)
        .groupBy("source")
        .agg(max("n_docs").as("n_docs"),
          count(lit(1)).as("n_lines"),
          countDistinct(when(col("boiler"), col("lh")))
            .as("n_boiler_lines"),
          sum(when(col("boiler"), 1L).otherwise(0L)).as("n_removed"),
          sum(when(!col("boiler"), col("llen")).otherwise(0L))
            .as("chars_kept"))
        .orderBy(asc_nulls_last("source"))
    }),

    // Curriculum staging report — order each language's documents by a
    // difficulty proxy (token count, doc_id tie-break) and cut them
    // into 10 training stages (easy → hard); per (lang, stage): doc
    // and char budgets plus the difficulty span — the schedule a
    // curriculum-learning run feeds its sampler. ntile parity between
    // engines is the proven q_window_ntile remainder rule. Scale: one
    // lang-partitioned window (per-language sort, no global ordering)
    // + one keyed aggregate.
    "q_curriculum" -> ((s, d) => {
      val w = Window.partitionBy("lang")
        .orderBy(asc_nulls_last("n_toks"), asc_nulls_last("doc_id"))
      t(s, d, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .withColumn("stage", ntile(10).over(w).cast("long"))
        .groupBy("lang", "stage")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("n_toks").as("min_toks"),
          max("n_toks").as("max_toks"))
        .orderBy(asc_nulls_last("lang"), asc_nulls_last("stage"))
    })
  )

  /** BFS hop layers from the lowest-id node of the (id_a, id_b) pair
    * graph, up to `maxHops` frontier rounds — split out of
    * q_graph_bfs_layers so PropertyLawsSpec can drive it over random
    * graphs the LSH fixture never generates. Each round is one equi-join
    * of the persisted symmetric edge list against the LAST frontier plus
    * an anti-join against the visited set; work is proportional to
    * frontier-incident edges, never a driver-side walk. */
  def bfsLayers(pairs: DataFrame, maxHops: Int): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .persistScoped()
    val seedRow = sym.agg(min(col("src"))).head
    if (seedRow.isNullAt(0)) {
      sym.unpersist()
      Seq.empty[(Long, Long)].toDF("doc_id", "dist")
    } else {
      val seed = seedRow.getLong(0)
      // loop shuffles sized to the dup graph (the seed agg above
      // already materialized the persisted sym cache); the frontier
      // dedup repartition satisfies distinct's distribution, so the
      // round adds ONE lp-sized exchange — the frontier join itself is
      // left to AQE, which broadcasts the (typically tiny) frontier.
      val lp = loopShufflePartitions(s, sym.count(), 10000L)
      var visited = Seq((seed, 0L)).toDF("doc_id", "dist")
      var frontier = visited.select(col("doc_id"))
      var r = 1
      var done = false
      while (r <= maxHops && !done) {
        val nf = sym.join(frontier.withColumnRenamed("doc_id", "src"),
            "src")
          .select(col("dst").as("doc_id"))
          .repartition(lp, col("doc_id"))
          .distinct()
          .join(visited.select("doc_id"), Seq("doc_id"), "left_anti")
          .persistScoped()
        if (nf.isEmpty) { nf.unpersist(); done = true }
        else {
          visited = visited.union(
            nf.withColumn("dist", lit(r.toLong)))
          frontier = nf
          r += 1
        }
      }
      visited.orderBy(asc_nulls_last("doc_id"))
    }
  }

  /** Multi-source BFS → harmonic centrality for the `nSeeds` lowest-id
    * nodes: one (seed, node) visited frame, per-round symmetric-edge
    * equi-joins + anti-join against visited — [[bfsLayers]] with a seed
    * column. The final H assembles hop counts through a fixed 4-term
    * rational tree (identical text on both engines). */
  def harmonicCentrality(pairs: DataFrame, nSeeds: Int,
      maxHops: Int): DataFrame = {
    val s = pairs.sparkSession
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .persistScoped()
    val seeds = sym.select(col("src").as("seed")).distinct()
      .orderBy(asc_nulls_last("seed")).limit(nSeeds)
    val lp = loopShufflePartitions(s, sym.count(), 10000L)
    var visited = seeds
      .select(col("seed"), col("seed").as("doc_id"), lit(0L).as("dist"))
      .persistScoped()
    var frontier = visited.select("seed", "doc_id")
    var r = 1
    var done = false
    while (r <= maxHops && !done) {
      val nf = sym
        .join(frontier.withColumnRenamed("doc_id", "src"), "src")
        .select(col("seed"), col("dst").as("doc_id"))
        .repartition(lp, col("seed"), col("doc_id"))
        .distinct()
        .join(visited.select("seed", "doc_id"), Seq("seed", "doc_id"),
          "left_anti")
        .persistScoped()
      if (nf.isEmpty) { nf.unpersist(); done = true }
      else {
        visited = visited
          .union(nf.withColumn("dist", lit(r.toLong))
            .select("seed", "doc_id", "dist"))
          .persistScoped()
        frontier = nf.select("seed", "doc_id")
        r += 1
      }
    }
    visited.groupBy("seed")
      .agg(sum(when(col("dist") === 1L, 1L).otherwise(0L)).as("c1"),
        sum(when(col("dist") === 2L, 1L).otherwise(0L)).as("c2"),
        sum(when(col("dist") === 3L, 1L).otherwise(0L)).as("c3"),
        sum(when(col("dist") === 4L, 1L).otherwise(0L)).as("c4"))
      .withColumn("n_reached", expr("c1 + c2 + c3 + c4"))
      .withColumn("harmonic", expr(
        "CAST(c1 AS DOUBLE) / CAST(1 AS DOUBLE) " +
          "+ CAST(c2 AS DOUBLE) / CAST(2 AS DOUBLE) " +
          "+ CAST(c3 AS DOUBLE) / CAST(3 AS DOUBLE) " +
          "+ CAST(c4 AS DOUBLE) / CAST(4 AS DOUBLE)"))
      .select("seed", "n_reached", "c1", "c2", "c3", "c4", "harmonic")
      .orderBy(asc_nulls_last("seed"))
  }

  /** Exact connected components as a recursive transitive closure:
    * `reach` accumulates every label reachable from each node (UNION
    * dedup terminates the recursion at the closure), and min(reachable
    * ids) IS the component minimum — a true fixed point, matching the
    * Spark side's converge-until-stable propagation on ANY graph shape.
    * Closure size is Σ component_size², fine for near-dup clusters. */
  /** Shared recursive-closure CTE prefix (q_dedup_clusters,
    * q_dedup_survivor): `reach` accumulates every reachable label. */
  private def clustersCtes: String =
    s"""WITH RECURSIVE pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), n AS (
       |  SELECT DISTINCT src FROM e0
       |), reach AS (
       |  SELECT src AS id, src AS lbl FROM n
       |  UNION
       |  SELECT e.src AS id, r.lbl
       |  FROM e0 e JOIN reach r ON r.id = e.dst
       |)""".stripMargin

  private def clustersOracle: String =
    clustersCtes +
      """
        |SELECT id AS doc_id, min(lbl) AS cluster,
        |  id = min(lbl) AS survivor
        |FROM reach GROUP BY id
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Same closure, then the per-(cluster, source) counts and the
    * mode-source top-1 window; the purity division repeats the Spark
    * text over the identical integers. */
  private def clusterPurityOracle: String =
    clustersCtes +
      """
        |, cl AS (
        |  SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id
        |), ms AS (
        |  SELECT cl.cluster, d.source, COUNT(*) AS ns
        |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY cluster
        |    ORDER BY ns DESC, source ASC) AS rn
        |  FROM ms
        |)
        |SELECT cluster, CAST(SUM(ns) AS BIGINT) AS n_members,
        |  CAST(COUNT(*) AS BIGINT) AS n_sources,
        |  max(CASE WHEN rn = 1 THEN source END) AS dom_source,
        |  CAST(max(CASE WHEN rn = 1 THEN ns END) AS BIGINT)
        |    AS dom_count,
        |  CAST(max(CASE WHEN rn = 1 THEN ns END) AS DOUBLE)
        |    / CAST(SUM(ns) AS DOUBLE) AS purity,
        |  COUNT(*) > 1 AS cross_source
        |FROM r GROUP BY cluster
        |ORDER BY cluster ASC NULLS LAST""".stripMargin

  /** Same closure, then the quality-ranked canonical pick per cluster. */
  private def survivorOracle: String =
    clustersCtes +
      """
        |, cl AS (
        |  SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id
        |), r AS (
        |  SELECT cl.cluster, cl.doc_id, d.n_chars,
        |    row_number() OVER (PARTITION BY cl.cluster
        |      ORDER BY d.n_chars DESC, cl.doc_id ASC) AS rn
        |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id
        |)
        |SELECT cluster, COUNT(*) AS n_members,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
        |  max(CASE WHEN rn = 1 THEN n_chars END) AS survivor_chars
        |FROM r GROUP BY cluster
        |ORDER BY cluster ASC NULLS LAST""".stripMargin

  /** Two unrolled integer-scaled power iterations (same constants as the
    * Spark side; // is DuckDB floor division, exact on the non-negative
    * operands here; SUM over BIGINT widens to HUGEINT so the per-node
    * result is cast back). */
  private def pagerankOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), dg AS (
       |  SELECT src AS id, COUNT(*) AS deg FROM e0 GROUP BY src
       |), nn AS (SELECT COUNT(*) AS n_nodes FROM dg),
       |r0 AS (
       |  SELECT id, deg,
       |    CAST(1000000000000 AS BIGINT) // n_nodes AS r
       |  FROM dg, nn
       |), r1 AS (
       |  SELECT d.id, d.deg, CAST(
       |    CAST(15000000000000 AS BIGINT)
       |      // (CAST(100 AS BIGINT) * nn.n_nodes)
       |    + SUM((CAST(85 AS BIGINT) * ru.r)
       |      // (CAST(100 AS BIGINT) * ru.deg)) AS BIGINT) AS r
       |  FROM e0 e
       |  JOIN r0 ru ON ru.id = e.dst
       |  JOIN dg d ON d.id = e.src, nn
       |  GROUP BY d.id, d.deg, nn.n_nodes
       |), r2 AS (
       |  SELECT d.id, d.deg, CAST(
       |    CAST(15000000000000 AS BIGINT)
       |      // (CAST(100 AS BIGINT) * nn.n_nodes)
       |    + SUM((CAST(85 AS BIGINT) * ru.r)
       |      // (CAST(100 AS BIGINT) * ru.deg)) AS BIGINT) AS r
       |  FROM e0 e
       |  JOIN r1 ru ON ru.id = e.dst
       |  JOIN dg d ON d.id = e.src, nn
       |  GROUP BY d.id, d.deg, nn.n_nodes
       |)
       |SELECT id AS doc_id, deg, r AS rank_scaled FROM r2
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Two unrolled HITS iterations over the newer→older directed pair
    * list — every score an exact integer (SUMs widen to HUGEINT and
    * cast back; no scaling or division anywhere). */
  private def hitsOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e AS (
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), nodes AS (
       |  SELECT src AS id FROM e UNION SELECT dst FROM e
       |), h1 AS (
       |  SELECT src, CAST(COUNT(*) AS BIGINT) AS h1 FROM e GROUP BY src
       |), ind AS (
       |  SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg
       |  FROM e GROUP BY dst
       |), a1 AS (
       |  SELECT e.dst, CAST(SUM(h1.h1) AS BIGINT) AS a1
       |  FROM e JOIN h1 ON h1.src = e.src GROUP BY e.dst
       |), h2 AS (
       |  SELECT e.src, CAST(SUM(a1.a1) AS BIGINT) AS h2
       |  FROM e JOIN a1 ON a1.dst = e.dst GROUP BY e.src
       |), a2 AS (
       |  SELECT e.dst, CAST(SUM(h2.h2) AS BIGINT) AS a2
       |  FROM e JOIN h2 ON h2.src = e.src GROUP BY e.dst
       |)
       |SELECT n.id AS doc_id,
       |  COALESCE(h1.h1, 0) AS outdeg,
       |  COALESCE(ind.indeg, 0) AS indeg,
       |  COALESCE(a1.a1, 0) AS auth1,
       |  COALESCE(h2.h2, 0) AS hub2,
       |  COALESCE(a2.a2, 0) AS auth2
       |FROM nodes n
       |LEFT JOIN h1 ON h1.src = n.id
       |LEFT JOIN ind ON ind.dst = n.id
       |LEFT JOIN a1 ON a1.dst = n.id
       |LEFT JOIN h2 ON h2.src = n.id
       |LEFT JOIN a2 ON a2.dst = n.id
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Pair subquery + two doc→source joins + unordered-pair fold. */
  private def sourceMatrixOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), lab AS (
       |  SELECT least(da.source, db.source) AS s_lo,
       |    greatest(da.source, db.source) AS s_hi
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.id_a
       |  JOIN documents db ON db.doc_id = p.id_b
       |)
       |SELECT s_lo, s_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM lab GROUP BY s_lo, s_hi
       |ORDER BY s_lo ASC NULLS LAST, s_hi ASC NULLS LAST""".stripMargin

  /** Same oriented wedge + closing-edge enumeration over the proven
    * near-dup pair subquery, corners credited via unnest. */
  private def degreeDistOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), m AS (
       |  SELECT unnest([id_a, id_b]) AS id FROM pairs
       |), dg AS (
       |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM m GROUP BY id
       |)
       |SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
       |FROM dg GROUP BY deg
       |ORDER BY deg ASC NULLS LAST""".stripMargin

  private def trianglesOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), tri AS (
       |  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
       |  FROM pairs e1
       |  JOIN pairs e2 ON e2.id_a = e1.id_b
       |  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
       |), n AS (
       |  SELECT unnest([a, b, c]) AS doc_id FROM tri
       |)
       |SELECT doc_id, COUNT(*) AS n_tri FROM n GROUP BY doc_id
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Shared WITH-chain of curation stages 1–4, ending at the `clean`
    * CTE — the DuckDB mirror of [[curatedClean]], spliced by the v2
    * and v3 curation oracles. */
  private def curatedCleanCtes: String =
    s"""WITH q AS (
       |${Quality.gopherPassSubquery.linesIterator
            .map("  " + _).mkString("\n")}
       |), qd AS (
       |  SELECT d.* FROM documents d JOIN q ON d.doc_id = q.doc_id
       |), ex AS (
       |  SELECT MIN(doc_id) AS doc_id FROM qd GROUP BY md5(text)
       |), kept AS (
       |  SELECT qd.* FROM qd JOIN ex ON qd.doc_id = ex.doc_id
       |), pairs AS (
       |${TextOps.dedupPairsSubquery("kept", threshold = true)
            .linesIterator.map("  " + _).mkString("\n")}
       |), losers AS (
       |  SELECT DISTINCT id_b FROM pairs
       |), surv AS (
       |  SELECT k.* FROM kept k
       |  LEFT JOIN losers l ON k.doc_id = l.id_b
       |  WHERE l.id_b IS NULL
       |), ev AS (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(
       |      generate_series(0, len(string_split(text, ' ')) - $GramTokens),
       |      i -> md5(array_to_string(list_slice(
       |        string_split(text, ' '), i + 1, i + $GramTokens), ' ')))))
       |    AS gm
       |  FROM documents
       |  WHERE text IS NOT NULL AND doc_id % 5 = 0
       |    AND len(string_split(text, ' ')) >= $GramTokens
       |), sg AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |      generate_series(0, len(string_split(text, ' ')) - $GramTokens),
       |      i -> md5(array_to_string(list_slice(
       |        string_split(text, ' '), i + 1, i + $GramTokens), ' ')))))
       |    AS gm
       |  FROM surv
       |  WHERE text IS NOT NULL
       |    AND len(string_split(text, ' ')) >= $GramTokens
       |), contaminated AS (
       |  SELECT DISTINCT sg.doc_id FROM sg JOIN ev ON sg.gm = ev.gm
       |), clean AS (
       |  SELECT s.* FROM surv s
       |  LEFT JOIN contaminated c ON s.doc_id = c.doc_id
       |  WHERE c.doc_id IS NULL AND s.doc_id % 5 <> 0
       |)""".stripMargin

  /** The triangles CTE (a<b<c, each triangle once) + one symmetric
    * degree aggregate; `//` is the integer wedge division. */
  private def clusteringCoeffOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), tri AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
       |  FROM pairs e1
       |  JOIN pairs e2 ON e2.id_a = e1.id_b
       |  JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
       |), dg AS (
       |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT id_a AS id FROM pairs
       |    UNION ALL SELECT id_b AS id FROM pairs
       |  ) GROUP BY id
       |), ag AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    CAST(SUM(deg) AS BIGINT) AS sum_deg,
       |    CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
       |  FROM dg
       |)
       |SELECT n_nodes, sum_deg // 2 AS n_edges, n_triangles, n_wedges,
       |  CAST(3 * n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
       |    AS transitivity
       |FROM ag, tri""".stripMargin

  /** Wedge-count common neighbors + inclusion-exclusion union over the
    * symmetric edge CTE; one IEEE division for the ratio. */
  private def graphJaccardOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), dg AS (
       |  SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src
       |), w AS (
       |  SELECT x.dst AS a, y.dst AS b
       |  FROM e0 x JOIN e0 y ON x.src = y.src AND x.dst < y.dst
       |), c AS (
       |  SELECT a, b, COUNT(*) AS n_common FROM w GROUP BY a, b
       |)
       |SELECT c.a AS id_a, c.b AS id_b, c.n_common,
       |  da.deg AS deg_a, db.deg AS deg_b,
       |  CAST(c.n_common AS DOUBLE) / (da.deg + db.deg - c.n_common)
       |    AS jac
       |FROM c
       |JOIN dg da ON da.src = c.a
       |JOIN dg db ON db.src = c.b
       |ORDER BY id_a ASC NULLS LAST, id_b ASC NULLS LAST""".stripMargin

  /** Same closure CTE, then the size double-group. */
  private def ccSizesOracle: String =
    clustersCtes +
      """
        |, cl AS (
        |  SELECT id, min(lbl) AS lbl FROM reach GROUP BY id
        |), sz AS (
        |  SELECT lbl, COUNT(*) AS cluster_size FROM cl GROUP BY lbl
        |)
        |SELECT cluster_size, COUNT(*) AS n_clusters
        |FROM sz GROUP BY cluster_size
        |ORDER BY cluster_size ASC NULLS LAST""".stripMargin

  /** Three unrolled peels mirroring the Spark loop exactly (the round
    * CTEs are generated by the same 1-to-3 loop); each join target n_i
    * holds unique ids, so the inner joins are the Spark side's
    * semi-joins. The final degree recomputes over the last vertex set. */
  private def kcoreOracle: String = {
    val rounds = (1 to 3).map { r =>
      s"""
         |), d$r AS (
         |  SELECT e.src, COUNT(*) AS c FROM e0 e
         |  JOIN n${r - 1} a ON e.src = a.id
         |  JOIN n${r - 1} b ON e.dst = b.id
         |  GROUP BY e.src
         |), n$r AS (
         |  SELECT src AS id FROM d$r WHERE c >= 2""".stripMargin
    }.mkString
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), n0 AS (
       |  SELECT DISTINCT src AS id FROM e0$rounds
       |), df AS (
       |  SELECT e.src, COUNT(*) AS c FROM e0 e
       |  JOIN n3 a ON e.src = a.id
       |  JOIN n3 b ON e.dst = b.id
       |  GROUP BY e.src
       |)
       |SELECT src AS doc_id, c AS core_deg FROM df
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  }

  /** Three unrolled vote rounds mirroring the Spark loop exactly (the
    * round CTEs come from the same 1-to-3 loop); the self-vote is the
    * UNION ALL of the previous labels and the deterministic tie-break
    * is the identical (count DESC, label ASC) row_number. */
  private def labelpropOracle: String = {
    val rounds = (1 to 3).map { r =>
      s"""
         |), v$r AS (
         |  SELECT e.src AS id, l.lbl FROM e0 e
         |  JOIN l${r - 1} l ON l.id = e.dst
         |  UNION ALL
         |  SELECT id, lbl FROM l${r - 1}
         |), c$r AS (
         |  SELECT id, lbl, COUNT(*) AS c FROM v$r GROUP BY id, lbl
         |), l$r AS (
         |  SELECT id, lbl FROM (
         |    SELECT id, lbl, row_number() OVER (
         |      PARTITION BY id
         |      ORDER BY c DESC NULLS LAST, lbl ASC NULLS LAST) AS rn
         |    FROM c$r) WHERE rn = 1""".stripMargin
    }.mkString
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), l0 AS (
       |  SELECT DISTINCT src AS id, src AS lbl FROM e0$rounds
       |), sz AS (
       |  SELECT lbl, COUNT(*) AS n_members FROM l3 GROUP BY lbl
       |)
       |SELECT l3.id AS doc_id, l3.lbl AS community, sz.n_members
       |FROM l3 JOIN sz ON l3.lbl = sz.lbl
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin
  }

  /** HUGEINT is DuckDB's 128-bit DECIMAL(38,0) twin; num/den
    * VARCHAR-route per §7.4 and the double division mirrors the two
    * correctly-rounded casts. */
  private def assortativityOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), dg AS (
       |  SELECT src, CAST(COUNT(*) AS HUGEINT) AS deg
       |  FROM e0 GROUP BY src
       |), l AS (
       |  SELECT da.deg AS da, db.deg AS db
       |  FROM e0
       |  JOIN dg da ON e0.src = da.src
       |  JOIN dg db ON e0.dst = db.src
       |), a AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
       |    SUM(da * db) AS sdadb, SUM(da) AS s1, SUM(da * da) AS s2
       |  FROM l
       |)
       |SELECT CAST(m AS BIGINT) AS m_directed,
       |  CAST(m * sdadb - s1 * s1 AS VARCHAR) AS num_str,
       |  CAST(m * s2 - s1 * s1 AS VARCHAR) AS den_str,
       |  CAST(CAST(m * sdadb - s1 * s1 AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(m * s2 - s1 * s1 AS VARCHAR) AS DOUBLE) AS r
       |FROM a""".stripMargin

  /** Recursive CTE mirroring the Spark frontier loop: UNION dedups
    * (id, dist) pairs and the dist < 4 guard bounds the recursion to the
    * same four unrolled rounds; min(dist) collapses longer rediscoveries
    * to the hop distance the anti-join enforces on the Spark side. */
  private def bfsLayersOracle: String =
    s"""WITH RECURSIVE pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), seed AS (
       |  SELECT min(src) AS sid FROM e0
       |), bfs AS (
       |  SELECT sid AS id, 0 AS dist FROM seed WHERE sid IS NOT NULL
       |  UNION
       |  SELECT e.dst AS id, b.dist + 1
       |  FROM bfs b JOIN e0 e ON e.src = b.id
       |  WHERE b.dist < 4
       |)
       |SELECT id AS doc_id, CAST(min(dist) AS BIGINT) AS dist
       |FROM bfs GROUP BY id
       |ORDER BY doc_id ASC NULLS LAST""".stripMargin

  /** Multi-seed recursive BFS over the same symmetric edges; min-dist
    * per (seed, node), the identical fixed 4-term harmonic tree. */
  private def closenessOracle: String =
    s"""WITH RECURSIVE pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), e0 AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), seeds AS (
       |  SELECT DISTINCT src AS seed FROM e0 ORDER BY src LIMIT 5
       |), bfs AS (
       |  SELECT seed, seed AS id, 0 AS dist FROM seeds
       |  UNION
       |  SELECT b.seed, e.dst AS id, b.dist + 1
       |  FROM bfs b JOIN e0 e ON e.src = b.id
       |  WHERE b.dist < 4
       |), md AS (
       |  SELECT seed, id, MIN(dist) AS dist FROM bfs GROUP BY 1, 2
       |), cs AS (
       |  SELECT seed,
       |    CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c1,
       |    CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c2,
       |    CAST(SUM(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c3,
       |    CAST(SUM(CASE WHEN dist = 4 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS c4
       |  FROM md GROUP BY seed
       |)
       |SELECT seed, c1 + c2 + c3 + c4 AS n_reached, c1, c2, c3, c4,
       |  CAST(c1 AS DOUBLE) / CAST(1 AS DOUBLE)
       |    + CAST(c2 AS DOUBLE) / CAST(2 AS DOUBLE)
       |    + CAST(c3 AS DOUBLE) / CAST(3 AS DOUBLE)
       |    + CAST(c4 AS DOUBLE) / CAST(4 AS DOUBLE) AS harmonic
       |FROM cs
       |ORDER BY seed ASC NULLS LAST""".stripMargin

  /** Same source-labeled edge list; COUNT(*) scalars stay BIGINT and the
    * modularity numerator/denominator are pure integer products. */
  private def modularityOracle: String =
    s"""WITH pairs AS (
       |${TextOps.dedupPairsSubquery}
       |), lab AS (
       |  SELECT p.id_a, p.id_b, da.source AS sa, db.source AS sb
       |  FROM pairs p
       |  JOIN documents da ON p.id_a = da.doc_id
       |  JOIN documents db ON p.id_b = db.doc_id
       |), m AS (
       |  SELECT COUNT(*) AS m FROM lab
       |), deg AS (
       |  SELECT source, COUNT(*) AS deg_sum FROM (
       |    SELECT sa AS source FROM lab
       |    UNION ALL
       |    SELECT sb AS source FROM lab) u
       |  GROUP BY source
       |), intra AS (
       |  SELECT sa AS source, COUNT(*) AS intra_edges
       |  FROM lab WHERE sa = sb GROUP BY sa
       |)
       |SELECT d.source, coalesce(i.intra_edges, 0) AS intra_edges,
       |  d.deg_sum,
       |  CAST(CAST(4 AS HUGEINT) * m.m * coalesce(i.intra_edges, 0)
       |    - CAST(d.deg_sum AS HUGEINT) * d.deg_sum AS VARCHAR)
       |    AS q_num_scaled,
       |  CAST(CAST(4 AS HUGEINT) * m.m * m.m AS VARCHAR) AS q_den_scaled
       |FROM deg d LEFT JOIN intra i ON d.source = i.source, m
       |ORDER BY d.source ASC NULLS LAST""".stripMargin

  val oracle: Map[String, String] = Map(
    // Same exact HUGEINT squares, VARCHAR-routed, identical division
    // trees over the one wide row.
    // Same pairwise mean-absolute-difference identity over the bounded
    // source frame; HUGEINT folds, one verbatim division tree.
    "q_source_gini" ->
      """WITH ws AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY source
        |), p AS (
        |  SELECT CAST(SUM(CAST(abs(a.w - b.w) AS HUGEINT)) AS HUGEINT)
        |    AS sad
        |  FROM ws a CROSS JOIN ws b
        |), a AS (
        |  SELECT COUNT(*) AS k, SUM(CAST(w AS HUGEINT)) AS sw FROM ws
        |)
        |SELECT k,
        |  CAST(CAST(sad AS VARCHAR) AS DOUBLE)
        |    / (CAST(2 AS DOUBLE) * CAST(k AS DOUBLE)
        |    * CAST(CAST(sw AS VARCHAR) AS DOUBLE)) AS gini
        |FROM a, p""".stripMargin,

    // Same exact char-mass folds; HUGEINT squares, VARCHAR-routed into
    // the two verbatim division trees.
    "q_source_effective_n" ->
      """WITH ws AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY source
        |), a AS (
        |  SELECT COUNT(*) AS k,
        |    SUM(CAST(w AS HUGEINT)) AS sw,
        |    SUM(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)) AS sww
        |  FROM ws
        |)
        |SELECT k, CAST(sw AS VARCHAR) AS sum_w,
        |  CAST(CAST(sw * sw AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sww AS VARCHAR) AS DOUBLE) AS n_eff,
        |  CAST(k AS DOUBLE) * CAST(CAST(sww AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(sw * sw AS VARCHAR) AS DOUBLE)
        |    AS design_effect
        |FROM a""".stripMargin,

    "q_source_hhi" ->
      """WITH ns AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
        |  FROM documents GROUP BY source
        |), a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(ns) AS BIGINT) AS n_docs,
        |    SUM(CAST(ns AS HUGEINT) * ns) AS s2
        |  FROM ns
        |)
        |SELECT k, n_docs, CAST(s2 AS VARCHAR) AS sum_sq,
        |  CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(n_docs AS HUGEINT) * n_docs AS VARCHAR)
        |      AS DOUBLE) AS hhi,
        |  CASE WHEN k > 1 THEN
        |    CAST(CAST(CAST(k AS HUGEINT) * s2
        |      - CAST(n_docs AS HUGEINT) * n_docs AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(n_docs AS HUGEINT) * n_docs * (k - 1)
        |      AS VARCHAR) AS DOUBLE) END AS hhi_normalized
        |FROM a""".stripMargin,

    "q_dedup_clusters" -> clustersOracle,
    "q_dedup_cluster_purity" -> clusterPurityOracle,
    "q_dedup_survivor" -> survivorOracle,
    "q_graph_cc_sizes" -> ccSizesOracle,
    "q_graph_pagerank" -> pagerankOracle,
    "q_graph_hits" -> hitsOracle,
    "q_dedup_source_matrix" -> sourceMatrixOracle,
    "q_graph_triangles" -> trianglesOracle,
    "q_graph_clustering_coeff" -> clusteringCoeffOracle,
    "q_graph_degree_dist" -> degreeDistOracle,
    "q_graph_jaccard" -> graphJaccardOracle,
    "q_graph_kcore" -> kcoreOracle,
    "q_graph_labelprop" -> labelpropOracle,
    "q_graph_assortativity" -> assortativityOracle,
    "q_graph_bfs_layers" -> bfsLayersOracle,
    "q_graph_closeness" -> closenessOracle,
    "q_graph_modularity" -> modularityOracle,

    // The FULL-graph min-label closure — the incremental maintenance on
    // the Spark side must reproduce it exactly; recomputed = the cluster
    // contains a shard (doc_id % 7 = 0) doc, which is provably the set
    // of components any new-touching edge reaches.
    "q_graph_cc_incremental" -> (clustersCtes +
      """
        |, cl AS (
        |  SELECT id, min(lbl) AS lbl FROM reach GROUP BY id
        |), fl AS (
        |  SELECT lbl, bool_or(id % 7 = 0) AS recomputed
        |  FROM cl GROUP BY lbl
        |)
        |SELECT cl.id AS doc_id, cl.lbl AS cluster, fl.recomputed
        |FROM cl JOIN fl ON cl.lbl = fl.lbl
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin),

    // Same snapshot CTEs; the using-join's coalesced source key is the
    // explicit COALESCE here, and the maintained/direct columns assemble
    // from the identical integer terms.
    "q_snapshot_ivm" ->
      """WITH d AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE text IS NOT NULL
        |), o AS (
        |  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS len_old
        |  FROM d WHERE doc_id % 7 <> 3
        |), n AS (
        |  SELECT doc_id, source,
        |    CAST(length(CASE WHEN doc_id % 13 = 2 THEN text || ' rev2'
        |      ELSE text END) AS BIGINT) AS len_new
        |  FROM d WHERE doc_id % 11 <> 5
        |), oa AS (
        |  SELECT source, COUNT(*) AS n_old,
        |    CAST(SUM(len_old) AS BIGINT) AS sum_old
        |  FROM o GROUP BY source
        |), de AS (
        |  SELECT COALESCE(o.source, n.source) AS source,
        |    CAST(SUM(CASE WHEN o.len_old IS NULL THEN n.len_new
        |      ELSE 0 END) AS BIGINT) AS add_chars,
        |    CAST(SUM(CASE WHEN n.len_new IS NULL THEN o.len_old
        |      ELSE 0 END) AS BIGINT) AS del_chars,
        |    CAST(SUM(CASE WHEN o.len_old IS NOT NULL
        |        AND n.len_new IS NOT NULL
        |      THEN n.len_new - o.len_old ELSE 0 END) AS BIGINT)
        |      AS rev_shift
        |  FROM o FULL OUTER JOIN n
        |    ON o.doc_id = n.doc_id AND o.source = n.source
        |  GROUP BY COALESCE(o.source, n.source)
        |), di AS (
        |  SELECT source, COUNT(*) AS n_new,
        |    CAST(SUM(len_new) AS BIGINT) AS sum_new
        |  FROM n GROUP BY source
        |)
        |SELECT oa.source, n_old, n_new, sum_old, add_chars, del_chars,
        |  rev_shift,
        |  sum_old + add_chars - del_chars + rev_shift AS sum_new_ivm,
        |  sum_new AS sum_new_direct,
        |  sum_old + add_chars - del_chars + rev_shift = sum_new
        |    AS ivm_matches
        |FROM oa
        |JOIN de ON oa.source = de.source
        |JOIN di ON oa.source = di.source
        |ORDER BY oa.source ASC NULLS LAST""".stripMargin,

    "q_curriculum" ->
      """WITH dtoks AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents WHERE text IS NOT NULL
        |), st AS (
        |  SELECT lang, n_chars, n_toks,
        |    ntile(10) OVER (PARTITION BY lang
        |      ORDER BY n_toks ASC NULLS LAST, doc_id ASC NULLS LAST)
        |      AS stage
        |  FROM dtoks
        |)
        |SELECT lang, stage, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  min(n_toks) AS min_toks, max(n_toks) AS max_toks
        |FROM st GROUP BY lang, stage
        |ORDER BY lang ASC NULLS LAST, stage ASC NULLS LAST""".stripMargin,

    "q_decontaminate" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(string_split(text, ' ')) >= $GramTokens THEN
         |      list_distinct(list_transform(
         |        generate_series(0, len(string_split(text, ' ')) - $GramTokens),
         |        i -> md5(array_to_string(list_slice(
         |          string_split(text, ' '), i + 1, i + $GramTokens), ' '))))
         |    ELSE CAST([] AS VARCHAR[]) END AS grams
         |  FROM documents WHERE text IS NOT NULL
         |), ev AS (
         |  SELECT DISTINCT unnest(grams) AS gm FROM g WHERE doc_id % 5 = 0
         |), tr AS (
         |  SELECT doc_id, grams, CAST(len(grams) AS BIGINT) AS n_grams
         |  FROM g WHERE doc_id % 5 <> 0
         |), x AS (
         |  SELECT doc_id, unnest(grams) AS gm FROM tr
         |), h AS (
         |  SELECT x.doc_id, COUNT(*) AS n_hits
         |  FROM x JOIN ev ON x.gm = ev.gm
         |  GROUP BY x.doc_id
         |)
         |SELECT tr.doc_id, tr.n_grams,
         |  coalesce(h.n_hits, 0) AS n_hits,
         |  coalesce(h.n_hits, 0) > 0 AS contaminated
         |FROM tr LEFT JOIN h ON tr.doc_id = h.doc_id
         |ORDER BY tr.doc_id ASC NULLS LAST""".stripMargin,

    "q_source_overlap" ->
      s"""WITH t AS (
         |  SELECT source, string_split(text, ' ') AS toks
         |  FROM documents WHERE text IS NOT NULL
         |), sq AS (
         |  SELECT source, toks,
         |    unnest(generate_series(0, len(toks) - $GramTokens)) AS i
         |  FROM t WHERE len(toks) >= $GramTokens
         |), g AS (
         |  SELECT DISTINCT source, md5(array_to_string(
         |    list_slice(toks, i + 1, i + $GramTokens), ' ')) AS gm
         |  FROM sq
         |), tot AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
         |  FROM g GROUP BY 1
         |), c AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM g a JOIN g b ON a.gm = b.gm AND a.source < b.source
         |  GROUP BY 1, 2
         |)
         |SELECT src_a, src_b, n_shared,
         |  CAST(n_shared AS DOUBLE) / least(ta.n_grams, tb.n_grams)
         |    AS overlap_coef
         |FROM c
         |JOIN tot ta ON src_a = ta.source
         |JOIN tot tb ON src_b = tb.source
         |ORDER BY src_a ASC NULLS LAST, src_b ASC NULLS LAST""".stripMargin,

    "q_dedup_spans" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |    CAST((len(string_split(text, ' ')) + ${SpanTokens - 1})
         |      // $SpanTokens AS BIGINT) AS n_spans
         |  FROM documents WHERE text IS NOT NULL
         |), sp AS (
         |  SELECT doc_id, n_spans,
         |    unnest(generate_series(0, CAST(n_spans AS INT) - 1)) AS pos
         |  FROM base
         |), spans AS (
         |  SELECT s.doc_id, s.pos,
         |    array_to_string(list_slice(b.toks,
         |      s.pos * $SpanTokens + 1, s.pos * $SpanTokens + $SpanTokens),
         |      ' ') AS span
         |  FROM sp s JOIN base b ON s.doc_id = b.doc_id
         |), occ AS (
         |  SELECT span, COUNT(*) AS occ FROM spans GROUP BY span
         |), kept AS (
         |  SELECT s.doc_id, s.pos, s.span
         |  FROM spans s JOIN occ o ON s.span = o.span
         |  WHERE o.occ = 1
         |), re AS (
         |  SELECT doc_id, COUNT(*) AS n_kept,
         |    string_agg(span, ' ' ORDER BY pos) AS kept_text
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT b.doc_id, b.n_spans,
         |  coalesce(re.n_kept, 0) AS n_kept,
         |  md5(coalesce(re.kept_text, '')) AS kept_md5
         |FROM base b LEFT JOIN re ON b.doc_id = re.doc_id
         |ORDER BY b.doc_id ASC NULLS LAST""".stripMargin,

    "q_vocab_per_lang" ->
      """WITH tf AS (
        |  SELECT lang, tok, COUNT(*) AS n FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok
        |    FROM documents WHERE text IS NOT NULL
        |  ) GROUP BY lang, tok
        |), r AS (
        |  SELECT lang, tok, n,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY n DESC NULLS LAST, tok ASC NULLS LAST) AS BIGINT)
        |      AS vocab_id
        |  FROM tf
        |)
        |SELECT lang, vocab_id, tok, n FROM r WHERE vocab_id <= 100
        |ORDER BY lang ASC NULLS LAST, vocab_id ASC NULLS LAST""".stripMargin,

    // The q_event_entropy portable-log2 CTE chain on the
    // (source, lang) grid.
    "q_source_lang_entropy" ->
      s"""WITH lc AS (
         |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM documents GROUP BY source, lang
         |), l AS (
         |  SELECT source, c, ${graft.Det.log2Exp("c")} AS e2 FROM lc
         |), m AS (
         |  SELECT source, c, e2, ${graft.Det.sqlMantissa("c", "e2")} AS mm
         |  FROM l
         |), z AS (
         |  SELECT source, c, e2, mm, ${graft.Det.zOfM("mm")} AS zz FROM m
         |), lq AS (
         |  SELECT source, c,
         |    CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")} AS l2
         |  FROM z
         |), q AS (
         |  SELECT source, c,
         |    CAST(floor(CAST(c AS DOUBLE) * l2
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM lq
         |), agg AS (
         |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
         |    CAST(COUNT(*) AS BIGINT) AS n_langs,
         |    CAST(SUM(q) AS BIGINT) AS sq
         |  FROM q GROUP BY source
         |), l2n AS (
         |  SELECT *, ${graft.Det.log2Exp("n_docs")} AS e2 FROM agg
         |), m2n AS (
         |  SELECT *, ${graft.Det.sqlMantissa("n_docs", "e2")} AS mm
         |  FROM l2n
         |), z2n AS (
         |  SELECT *, ${graft.Det.zOfM("mm")} AS zz FROM m2n
         |)
         |SELECT source, n_docs, n_langs,
         |  CAST(e2 AS DOUBLE) + ${graft.Det.plog2Series("zz")}
         |    - CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE)
         |    / CAST(n_docs AS DOUBLE) AS entropy_bits
         |FROM z2n ORDER BY source ASC NULLS LAST""".stripMargin,

    "q_source_quota" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC NULLS LAST,
        |        doc_id ASC NULLS LAST) AS rk
        |  FROM documents
        |)
        |SELECT source, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN rk <= 20 THEN 1 END) AS n_kept,
        |  CAST(SUM(CASE WHEN rk <= 20 THEN doc_id END) AS BIGINT)
        |    AS kept_id_sum
        |FROM r GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin,

    "q_mixture_weights" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(1 + (CAST(substring(source, 4) AS INT) % 4) * 2
        |      AS BIGINT) AS w,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 10000 AS b
        |  FROM documents
        |), ps AS (
        |  SELECT source, w, COUNT(*) AS n_s FROM d GROUP BY source, w
        |), tot AS (
        |  SELECT CAST(SUM(n_s) AS BIGINT) AS n_total,
        |    CAST(SUM(w) AS BIGINT) AS w_total
        |  FROM ps
        |)
        |SELECT d.source, d.w, ps.n_s,
        |  COUNT(CASE WHEN d.b * tot.w_total * ps.n_s
        |    < d.w * tot.n_total * 10000 THEN 1 END) AS n_kept,
        |  CAST(SUM(CASE WHEN d.b * tot.w_total * ps.n_s
        |    < d.w * tot.n_total * 10000 THEN d.doc_id END) AS BIGINT)
        |    AS kept_id_sum
        |FROM d JOIN ps ON d.source = ps.source, tot
        |GROUP BY d.source, d.w, ps.n_s
        |ORDER BY d.source ASC NULLS LAST""".stripMargin,

    "q_label_balance" ->
      """WITH r AS (
        |  SELECT label, vec_id,
        |    CAST(row_number() OVER (PARTITION BY label
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC NULLS LAST,
        |        vec_id ASC NULLS LAST) AS BIGINT) AS rk
        |  FROM embeddings
        |), m AS (
        |  SELECT CAST(min(cnt) AS BIGINT) AS m
        |  FROM (SELECT COUNT(*) AS cnt FROM r GROUP BY label)
        |)
        |SELECT label, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN rk <= m.m THEN 1 END) AS n_kept,
        |  CAST(SUM(CASE WHEN rk <= m.m THEN vec_id END) AS BIGINT)
        |    AS kept_id_sum
        |FROM r, m
        |GROUP BY label
        |ORDER BY label ASC NULLS LAST""".stripMargin,

    // Stage mirrors composed as one WITH chain; the LSH pair subquery
    // embeds as a nested WITH reading the KEPT corpus (the
    // clustersCtes precedent), so batch-vs-oracle parity covers the
    // COMPOSITION, not just the stages.
    "q_corpus_curate" ->
      s"""WITH q AS (
         |${Quality.gopherPassSubquery.linesIterator
              .map("  " + _).mkString("\n")}
         |), qd AS (
         |  SELECT d.* FROM documents d JOIN q ON d.doc_id = q.doc_id
         |), ex AS (
         |  SELECT MIN(doc_id) AS doc_id FROM qd GROUP BY md5(text)
         |), kept AS (
         |  SELECT qd.* FROM qd JOIN ex ON qd.doc_id = ex.doc_id
         |), pairs AS (
         |${TextOps.dedupPairsSubquery("kept", threshold = true)
              .linesIterator.map("  " + _).mkString("\n")}
         |), losers AS (
         |  SELECT DISTINCT id_b FROM pairs
         |), surv AS (
         |  SELECT k.* FROM kept k
         |  LEFT JOIN losers l ON k.doc_id = l.id_b
         |  WHERE l.id_b IS NULL
         |), quota AS (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY doc_id) AS rn
         |  FROM surv
         |)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
         |FROM quota WHERE rn <= 20
         |GROUP BY lang
         |ORDER BY lang ASC NULLS LAST""".stripMargin,

    "q_corpus_curate_v2" ->
      s"""$curatedCleanCtes, quota AS (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY doc_id) AS rn
         |  FROM clean
         |)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
         |FROM quota WHERE rn <= 20
         |GROUP BY lang
         |ORDER BY lang ASC NULLS LAST""".stripMargin,

    // The shared clean CTEs, the q_source_budget Hamilton arithmetic
    // over clean token counts, and the q_source_quota md5-order
    // prefix-sum consumption.
    "q_corpus_curate_v3" ->
      s"""$curatedCleanCtes, cl2 AS (
         |  SELECT source, doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM clean
         |), cnt AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clean_docs,
         |    CAST(SUM(n_toks) AS BIGINT) AS n_clean_tokens
         |  FROM cl2 GROUP BY source
         |), tt AS (
         |  SELECT CAST(SUM(n_clean_tokens) AS BIGINT) AS tot FROM cnt
         |), bs AS (
         |  SELECT source, n_clean_docs, n_clean_tokens,
         |    CAST((CAST(100000 AS HUGEINT) * n_clean_tokens) // tot
         |      AS BIGINT) AS base,
         |    CAST((CAST(100000 AS HUGEINT) * n_clean_tokens) % tot
         |      AS BIGINT) AS rem
         |  FROM cnt, tt
         |), e2 AS (
         |  SELECT 100000 - CAST(SUM(base) AS BIGINT) AS n_extra FROM bs
         |), al AS (
         |  SELECT source, n_clean_docs, n_clean_tokens,
         |    base + CASE WHEN row_number() OVER (
         |      ORDER BY rem DESC NULLS LAST, source ASC NULLS LAST)
         |      <= e2.n_extra THEN 1 ELSE 0 END AS alloc
         |  FROM bs, e2
         |), cum AS (
         |  SELECT source, n_toks,
         |    SUM(n_toks) OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC NULLS LAST,
         |        doc_id ASC NULLS LAST
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM cl2
         |), kp AS (
         |  SELECT c.source, CAST(COUNT(*) AS BIGINT) AS n_kept_docs,
         |    CAST(SUM(c.n_toks) AS BIGINT) AS kept_tokens
         |  FROM cum c JOIN al ON c.source = al.source
         |  WHERE c.cum <= al.alloc GROUP BY c.source
         |)
         |SELECT al.source, al.n_clean_docs, al.n_clean_tokens, al.alloc,
         |  coalesce(kp.n_kept_docs, 0) AS n_kept_docs,
         |  coalesce(kp.kept_tokens, 0) AS kept_tokens
         |FROM al LEFT JOIN kp ON al.source = kp.source
         |ORDER BY al.source ASC NULLS LAST""".stripMargin,

    // Mirrors the integer-product KL chain on DuckDB's lateral column
    // aliases; the weighted-term and final divisions repeat Spark's
    // expression text exactly.
    "q_source_kl" ->
      s"""WITH st AS (
         |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cst FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS tok
         |    FROM documents WHERE text IS NOT NULL
         |  ) GROUP BY source, tok
         |), ct AS (
         |  SELECT tok, CAST(SUM(cst) AS BIGINT) AS ct FROM st GROUP BY tok
         |), ns AS (
         |  SELECT source, CAST(SUM(cst) AS BIGINT) AS ns
         |  FROM st GROUP BY source
         |), tot AS (
         |  SELECT CAST(SUM(ct) AS BIGINT) AS n FROM ct
         |), j AS (
         |  SELECT st.source, st.cst, ns.ns,
         |    st.cst * tot.n AS num, ns.ns * ct.ct AS den
         |  FROM st JOIN ct ON st.tok = ct.tok
         |  JOIN ns ON st.source = ns.source, tot
         |), lg AS (
         |  SELECT source, cst, ns, ${graft.Det.sqlPlog2Cols("num", "n_")},
         |    ${graft.Det.sqlPlog2Cols("den", "d_")}
         |  FROM j
         |), q AS (
         |  SELECT source, ns,
         |    CAST(floor(CAST(cst AS DOUBLE) * (n_l2 - d_l2)
         |      / CAST(ns AS DOUBLE) * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM lg
         |), agg AS (
         |  SELECT source, CAST(MAX(ns) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_types,
         |    CAST(SUM(q) AS BIGINT) AS sq
         |  FROM q GROUP BY source
         |)
         |SELECT source, n_tokens, n_types,
         |  CAST(sq AS DOUBLE) / CAST(10000000000 AS DOUBLE) AS kl_bits
         |FROM agg ORDER BY source ASC NULLS LAST""".stripMargin,

    // Same st/ct/ns/tot CTEs; three plog2 chains (p-part, guarded
    // q-part, shared den), identical quantized term text, and the
    // closed-form missing-token mass added at the aggregate.
    "q_source_jsd" ->
      s"""WITH st AS (
         |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cst FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS tok
         |    FROM documents WHERE text IS NOT NULL
         |  ) GROUP BY source, tok
         |), ct AS (
         |  SELECT tok, CAST(SUM(cst) AS BIGINT) AS ct FROM st GROUP BY tok
         |), ns AS (
         |  SELECT source, CAST(SUM(cst) AS BIGINT) AS ns
         |  FROM st GROUP BY source
         |), tot AS (
         |  SELECT CAST(SUM(ct) AS BIGINT) AS n FROM ct
         |), j AS (
         |  SELECT st.source, st.cst, ns.ns, ct.ct,
         |    ct.ct - st.cst AS rt, tot.n - ns.ns AS nr, tot.n AS n,
         |    2 * st.cst * (tot.n - ns.ns) AS nump,
         |    CASE WHEN ct.ct - st.cst > 0
         |      THEN 2 * (ct.ct - st.cst) * ns.ns
         |      ELSE CAST(1 AS BIGINT) END AS numq,
         |    st.cst * (tot.n - ns.ns) + (ct.ct - st.cst) * ns.ns AS den
         |  FROM st JOIN ct ON st.tok = ct.tok
         |  JOIN ns ON st.source = ns.source, tot
         |), lg AS (
         |  SELECT source, cst, ns, ct, rt, nr, n,
         |    ${graft.Det.sqlPlog2Cols("nump", "p_")},
         |    ${graft.Det.sqlPlog2Cols("numq", "q_")},
         |    ${graft.Det.sqlPlog2Cols("den", "d_")}
         |  FROM j
         |), q AS (
         |  SELECT source, ns, nr, n, ct,
         |    CAST(floor((CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE)
         |      * (p_l2 - d_l2)
         |      + CASE WHEN rt > 0 THEN CAST(rt AS DOUBLE)
         |      / CAST(nr AS DOUBLE) * (q_l2 - d_l2)
         |      ELSE CAST(0 AS DOUBLE) END)
         |      / CAST(2 AS DOUBLE) * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM lg
         |), agg AS (
         |  SELECT source, CAST(MAX(ns) AS BIGINT) AS n_tokens,
         |    CAST(MAX(nr) AS BIGINT) AS n_rest,
         |    CAST(MAX(n) AS BIGINT) AS _n,
         |    CAST(COUNT(*) AS BIGINT) AS n_types,
         |    CAST(SUM(q) AS BIGINT) AS sq,
         |    CAST(SUM(ct) AS BIGINT) AS cts_present
         |  FROM q GROUP BY source
         |), closed AS (
         |  SELECT *,
         |    CASE WHEN n_rest > 0 THEN
         |      CAST(floor(CAST(_n - cts_present AS DOUBLE)
         |      / (CAST(2 AS DOUBLE) * CAST(n_rest AS DOUBLE))
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS qmiss
         |  FROM agg
         |)
         |SELECT source, n_tokens, n_rest, n_types,
         |  CASE WHEN n_rest > 0 THEN
         |    CAST(sq + qmiss AS DOUBLE)
         |    / CAST(10000000000 AS DOUBLE) END AS jsd_bits
         |FROM closed ORDER BY source ASC NULLS LAST""".stripMargin,

    // Same deterministic snapshot derivation; the diff classification
    // runs on md5 hashes both engines compute identically.
    "q_corpus_snapshot_delta" ->
      """WITH d AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE text IS NOT NULL
        |), old AS (
        |  SELECT doc_id, source, md5(text) AS h_old
        |  FROM d WHERE doc_id % 7 <> 3
        |), neu AS (
        |  SELECT doc_id, source,
        |    md5(CASE WHEN doc_id % 13 = 2 THEN text || ' rev2'
        |        ELSE text END) AS h_new
        |  FROM d WHERE doc_id % 11 <> 5
        |), j AS (
        |  SELECT COALESCE(o.source, n.source) AS source, o.h_old, n.h_new
        |  FROM old o FULL OUTER JOIN neu n
        |    ON o.doc_id = n.doc_id AND o.source = n.source
        |)
        |SELECT source,
        |  CAST(SUM(CASE WHEN h_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(SUM(CASE WHEN h_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(SUM(CASE WHEN h_old IS NOT NULL AND h_new IS NOT NULL
        |    AND h_old <> h_new THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(SUM(CASE WHEN h_old = h_new THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged
        |FROM j GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin,

    "q_text_clean" ->
"""WITH h AS (
        |  SELECT doc_id,
        |    '<div class="doc" id="' || CAST(doc_id AS VARCHAR) ||
        |    '"><h1>Doc &amp; friends</h1><p>' || text ||
        |    '</p><br/><span>&copy; example&nbsp;corp</span></div>' AS html
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT)
        |      AS n_tags,
        |    trim(regexp_replace(replace(replace(replace(
        |      regexp_replace(html, '<[^>]*>', ' ', 'g'),
        |      '&nbsp;', ' '), '&amp;', '&'), '&copy;', '(c)'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h
        |)
        |SELECT doc_id, n_tags,
        |  CAST(length(clean) AS BIGINT) AS clean_len,
        |  md5(clean) AS clean_md5
        |FROM c ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    "q_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '.example.' ||
        |    (CASE lang WHEN 'de' THEN 'de' WHEN 'es' THEN 'es'
        |      WHEN 'fr' THEN 'fr' WHEN 'zh' THEN 'cn' ELSE 'com' END) ||
        |    '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) ||
        |    '?ref=r' || CAST(doc_id % 7 AS VARCHAR) AS url
        |  FROM documents
        |)
        |SELECT doc_id, url,
        |  regexp_extract(url, '^https?://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '[?&]ref=([^&]+)', 1) AS ref
        |FROM u ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // Same deterministic URL synthesis + the identical 5-step
    // canonicalization chain (lower → fragment regex → two literal utm
    // replaces → slash fixes); DuckDB regexp_replace is first-match-only
    // but each pattern occurs at most once by construction.
    "q_dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id, source, lang, doc_id % 200 AS page,
        |    'www.' || source || '.example.com' AS host
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, source,
        |    'https://' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN upper(host) ELSE host END) ||
        |    '/' || lang || '/doc-' || CAST(page AS VARCHAR) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0
        |        THEN '?utm_source=feed&utm_campaign=c'
        |      WHEN doc_id % 3 = 1
        |        THEN '?v=' || CAST(page % 4 AS VARCHAR)
        |      ELSE '?utm_source=feed&utm_campaign=c&v=' ||
        |        CAST(page % 4 AS VARCHAR) END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '#section2' ELSE '' END)
        |      AS url
        |  FROM u
        |), c AS (
        |  SELECT source,
        |    regexp_replace(replace(replace(replace(
        |      regexp_replace(lower(url), '#.*$', ''),
        |      'utm_source=feed&utm_campaign=c&', ''),
        |      '?utm_source=feed&utm_campaign=c', ''),
        |      '/?', '?'), '/$', '') AS canon
        |  FROM r
        |)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canon,
        |  CAST(COUNT(*) - COUNT(DISTINCT canon) AS BIGINT) AS n_dup
        |FROM c GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin,

    // Same framing, 12-token lines, md5 line keys and cross-multiplied
    // 30%/5-doc gate; COUNT(DISTINCT CASE ...) ignores the NULL arm on
    // both engines.
    "q_text_boilerplate" ->
      """WITH docs AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE text IS NOT NULL
        |), b AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM docs
        |), lines AS (
        |  SELECT doc_id, source,
        |    'home | about | contact | ' || source AS line FROM b
        |  UNION ALL
        |  SELECT doc_id, source,
        |    'copyright ' || source || ' all rights reserved' FROM b
        |  UNION ALL
        |  SELECT doc_id, source,
        |    list_aggr(list_slice(toks, c * 12 + 1,
        |      least(c * 12 + 12, n_toks)), 'string_agg', ' ') AS line
        |  FROM (
        |    SELECT doc_id, source, toks, n_toks,
        |      unnest(generate_series(0,
        |        CAST(floor((n_toks - 1) / 12) AS BIGINT))) AS c
        |    FROM b
        |  )
        |), inst AS (
        |  SELECT doc_id, source, md5(line) AS lh,
        |    CAST(length(line) AS BIGINT) AS llen
        |  FROM lines
        |), ldf AS (
        |  SELECT source, lh, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
        |    AS ldf
        |  FROM inst GROUP BY source, lh
        |), nd AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM docs GROUP BY source
        |), j AS (
        |  SELECT i.source, i.lh, i.llen, l.ldf, n.n_docs,
        |    (l.ldf * 10 >= n.n_docs * 3 AND l.ldf >= 5) AS boiler
        |  FROM inst i
        |  JOIN ldf l ON i.source = l.source AND i.lh = l.lh
        |  JOIN nd n ON i.source = n.source
        |)
        |SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(COUNT(DISTINCT CASE WHEN boiler THEN lh END) AS BIGINT)
        |    AS n_boiler_lines,
        |  CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  CAST(SUM(CASE WHEN NOT boiler THEN llen ELSE 0 END) AS BIGINT)
        |    AS chars_kept
        |FROM j GROUP BY source
        |ORDER BY source ASC NULLS LAST""".stripMargin
  )
}
