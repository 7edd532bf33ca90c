package graft.operators

import graft.CacheScope.ScopedPersist
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over embedding columns (`array<float>`, unit-norm so
  * cosine == dot product).
  *
  * The bucketing scheme is random-hyperplane LSH (Charikar, STOC 2002):
  * sign patterns of projections onto fixed pseudo-random hyperplanes
  * approximate angular similarity; the hyperplanes here derive from md5
  * so every engine and every run agrees without shared RNG state.
  *
  * Scale design:
  *  - brute-force top-k against a FIXED probe is a narrow map + global
  *    top-k (TakeOrderedAndProject): linear, no shuffle of the vectors;
  *  - the all-pairs variant is the bounded verification step; the scale
  *    path is [[annBuckets]] — deterministic random-hyperplane LSH that
  *    partitions vectors into 2^planes buckets so candidate generation
  *    becomes a shuffle on bucket id instead of an O(n²) cross join;
  *  - dot products fold through exact DECIMAL accumulation (see
  *    [[graft.Det]]): merge-order-insensitive, hash-identical to DuckDB.
  */
object VectorOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  /** Embedding dimensionality of the fixture `embeddings` table — the ONE
    * constant both sides of every LSH oracle derive from: the Spark side
    * embeds `EmbDim` hyperplane weights as literals and the oracle SQL
    * interpolates the same bound into its generate_series, so a fixture
    * dimensionality change breaks both engines together (loudly) instead
    * of silently skewing one. */
  val EmbDim = 64

  /** Hyperplane count for q_ann_neighbors (2^6 = 64 buckets). */
  private val NeighborPlanes = 6

  /** Coarse-quantizer size for q_ann_ivf (first k vectors as centroids). */
  private val IvfCentroids = 8

  /** Multiprobe xor masks over the 8-bit Hamming bucket key: identity,
    * every 1-bit flip, every 2-bit flip — 1 + 8 + 28 = 37 constants
    * shared verbatim by the Spark build and the DuckDB oracle
    * (q_ann_hamming_multiprobe). */
  private val ProbeMasks: Seq[Int] =
    Seq(0) ++ (0 until 8).map(1 << _) ++
      (for (i <- 0 until 8; j <- i + 1 until 8)
        yield (1 << i) | (1 << j))

  /** Product-quantization geometry for q_ann_pq: EmbDim splits into
    * [[PqM]] contiguous sub-spaces of [[PqSubDim]] dims; the sub-space
    * codebooks are the matching slices of the first [[PqCodebook]]
    * vectors (the deterministic stand-in for trained sub-centroids, as
    * with [[IvfCentroids]]). */
  private val PqM = 8
  private val PqSubDim = EmbDim / PqM
  private val PqCodebook = 4

  /** Candidate count the refined IVF-PQ search re-ranks exactly
    * (q_ann_ivfpq_refined): the ADC stage keeps its top [[PqRefineK]]
    * and the refine stage reads ONLY those full vectors. */
  private val PqRefineK = 50

  /** Exact-decimal dot product of two `array<float>` columns, as DOUBLE —
    * the native codegen'd [[graft.functions.DecimalDot]], bit-identical
    * to the interpreted decimal fold (and hence the DuckDB oracle) but
    * without a Decimal allocation per element. The interpreted reference
    * form it replaces is kept in [[dotFoldReference]] and equality is
    * property-locked in FunctionsAndSourcesSpec. */
  def dotExpr(s: SparkSession, a: String, b: String): Column = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    expr(s"decimal_dot($a, $b)")
  }

  /** The interpreted exact fold [[dotExpr]] is proven against. */
  def dotFoldReference(a: String, b: String): Column = expr(
    s"CAST(aggregate(zip_with($a, $b, " +
      "(x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) " +
      "AS DECIMAL(20,10))), CAST(0 AS DECIMAL(30,10)), " +
      "(acc, p) -> CAST(acc + p AS DECIMAL(30,10))) AS DOUBLE)")

  /** Fast screening dot product: the native codegen'd
    * [[graft.functions.FloatDot]] expression (no per-row serialization,
    * stays inside whole-stage codegen). Used only to PRE-RANK candidates —
    * the exact-decimal [[dotExpr]] makes the final, oracle-deterministic
    * ordering. */
  def fastDot(s: SparkSession, a: String, b: String): Column = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    expr(s"float_dot($a, $b)")
  }

  /** Exact-decimal (scale 8) weighted dot of a float vector against a
    * DOUBLE-literal weight array — the codegen'd
    * [[graft.functions.DecimalWDot]], bit-identical to the interpreted
    * scale-8 fold it replaced ([[wdotFoldReference]], equality
    * property-locked in FunctionsAndSourcesSpec) but one tight loop per
    * row instead of a Decimal allocation per element per plane. */
  def wdotExpr(s: SparkSession, vec: String, weights: String): Column = {
    graft.functions.GraftFunctions.ensureRegistered(s)
    expr(s"decimal_wdot($vec, $weights)")
  }

  /** The interpreted scale-8 fold [[wdotExpr]] is proven against. */
  def wdotFoldReference(vec: String, weights: String): Column = expr(
    s"CAST(aggregate(zip_with($vec, $weights, " +
      "(x, w) -> CAST(CAST(x AS DOUBLE) * w AS DECIMAL(20,8))), " +
      "CAST(0 AS DECIMAL(30,8)), " +
      "(acc, t) -> CAST(acc + t AS DECIMAL(30,8))) AS DOUBLE)")

  private def sqlDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), " +
      "p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) " +
      "AS DECIMAL(20,10)))) AS DOUBLE)"

  /** Deterministic random-hyperplane LSH bucket id (2^`planes` buckets).
    * Hyperplane weight (p, i) = first hex digit of md5("p_i") − 7.5 — no
    * RNG state, so the assignment is reproducible on any engine and any
    * cluster. The weights depend only on (plane, dim), so they are
    * evaluated ONCE here (same md5, via MessageDigest) and embedded as
    * array literals: the runtime expression is a pure zip_with/aggregate
    * fold with zero hashing — planes × dim md5 calls per ROW would
    * otherwise dominate every query that buckets (measured 4-6 s/5k rows
    * at planes=6). Weights are k + 0.5 halves, exactly representable, so
    * the literal embeds bit-identically to the oracle's strpos-on-md5
    * arithmetic. */
  def annBuckets(emb: DataFrame, planes: Int = 4,
      dim: Int = EmbDim, table: Int = 0): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // table 0 keeps the original "p_i" md5 keys (every existing oracle
    // derives from them); tables ≥ 1 prefix the key — an independent
    // hyperplane family per table for OR-amplified multi-table LSH
    def weight(p: Int, i: Int): Double = {
      val key = if (table == 0) s"${p}_$i" else s"t${table}_${p}_$i"
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(hex.charAt(0)) - 7.5
    }
    def proj(p: Int): String = {
      // D suffix: double literals (a bare 7.5 parses as DECIMAL(2,1));
      // the codegen'd decimal_wdot is bit-identical to the scale-8 fold
      // this replaced (wdotFoldReference) and the oracle's strpos-on-md5
      // arithmetic — weights are k + 0.5 halves, exactly representable
      val w = (0 until dim).map(i => s"${weight(p, i)}D").mkString(", ")
      s"decimal_wdot(embedding, array($w))"
    }
    val bucket = (0 until planes)
      .map(p => s"CASE WHEN ${proj(p)} > 0 THEN ${1L << p} ELSE 0 END")
      .mkString("CAST(", " + ", " AS BIGINT)")
    graft.functions.GraftFunctions
      .ensureRegistered(emb.sparkSession)
    // NULL embedding → NULL bucket (a CASE over NULL projections would
    // otherwise silently land every vector-less row in bucket 0)
    emb.withColumn("bucket",
      when(col("embedding").isNotNull, expr(bucket))
        .otherwise(lit(null).cast("long")))
  }

  /** Hash-table count for q_ann_recall_multi (OR-amplified LSH). */
  private val RecallTables = 4

  /** All `tables` hyperplane families in ONE corpus pass: each vector's
    * bucket per table computed in-row (the [[annBuckets]] expression at
    * each table seed) and exploded to slim (vec_id, tbl, bucket) rows —
    * the multi-table LSH layout whose candidate join is a single
    * equi-join on (tbl, bucket). NULL embedding → NULL buckets (never
    * bucket 0), which equi-joins drop. */
  def annBucketsMulti(emb: DataFrame, planes: Int, tables: Int,
      dim: Int = EmbDim): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(tb: Int, p: Int, i: Int): Double = {
      val key = if (tb == 0) s"${p}_$i" else s"t${tb}_${p}_$i"
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(hex.charAt(0)) - 7.5
    }
    def bucket(tb: Int): String = {
      val terms = (0 until planes).map { p =>
        val w = (0 until dim).map(i => s"${weight(tb, p, i)}D")
          .mkString(", ")
        s"CASE WHEN decimal_wdot(embedding, array($w)) > 0 " +
          s"THEN ${1L << p} ELSE 0 END"
      }
      terms.mkString(
        "CASE WHEN embedding IS NULL THEN NULL ELSE CAST(",
        " + ", " AS BIGINT) END")
    }
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val arr = (0 until tables).map(bucket).mkString("array(", ", ", ")")
    emb.select(col("vec_id"),
        posexplode(expr(arr)).as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("tbl").cast("int").as("tbl"),
        col("bucket"))
  }

  /** Brute-force exact top-3 neighbors for the FIXED 16-probe recall
    * panel (vec_id < 16): a bounded probe broadcast against one linear
    * corpus pass, fast top-8 prefilter slim through the ranking window,
    * exact-decimal rerank to 3 (the proven q_ann_neighbors two-phase
    * margin argument). Ground truth shared by q_ann_recall and
    * q_ann_recall_multi. */
  private def panelExactTop3(s: SparkSession, d: String): DataFrame = {
    val probes = broadcast(t(s, d, "embeddings")
      .filter(col("vec_id") < 16)
      .select(col("vec_id").as("p_id"), col("embedding").as("pe")))
    val corpus = t(s, d, "embeddings")
      .select(col("vec_id").as("nb_id"), col("embedding").as("eb"))
    val wFast = Window.partitionBy("p_id")
      .orderBy(desc_nulls_last("fastdot"), asc_nulls_last("nb_id"))
    val wExact = Window.partitionBy("p_id")
      .orderBy(desc_nulls_last("cosine"), asc_nulls_last("nb_id"))
    corpus
      .crossJoin(probes)
      .filter(col("nb_id") =!= col("p_id"))
      .withColumn("fastdot", fastDot(s, "eb", "pe"))
      .select("p_id", "nb_id", "fastdot")
      .withColumn("_rn", row_number().over(wFast))
      .filter(col("_rn") <= 8)
      .join(corpus, "nb_id")
      .join(probes, "p_id")
      .withColumn("cosine", dotExpr(s, "eb", "pe"))
      .withColumn("_rx", row_number().over(wExact))
      .filter(col("_rx") <= 3)
      .select(col("p_id").as("vec_id"), col("nb_id"))
  }

  /** Broadcast-k max-cosine centroid assignment shared by the IVF family
    * (q_ann_ivf, q_ann_ivf_nprobe, q_ann_ivf_curve) and q_kmeans_iter:
    * the first [[IvfCentroids]] vectors are the centroids; ranking uses
    * the fast double dot with a cid tie-break (selection can only differ
    * from the oracle's exact-decimal ranking on a <1e-12 centroid-dot
    * tie, which distinct centroids cannot produce). `k` is the nprobe
    * knob: each vector keeps its k nearest centroids, with the 1-based
    * nearness rank exposed as `crank` (the recall/cost-curve axis). */
  private def centroidAssign(s: SparkSession, e: DataFrame,
      vecs: DataFrame, k: Int = 1,
      nCents: Long = IvfCentroids): DataFrame = {
    val cents = broadcast(e.filter(col("vec_id") < nCents)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        lit(1).as("_one")))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(desc_nulls_last("cdot"), asc_nulls_last("cid"))
    vecs
      .withColumn("_one", lit(1))
      .join(cents, "_one")
      .withColumn("cdot", fastDot(s, "embedding", "cemb"))
      .select("vec_id", "cid", "cdot")
      .withColumn("_rn", row_number().over(wAssign))
      .filter(col("_rn") <= k)
      .select(col("vec_id"), col("cid").as("cluster"),
        col("_rn").cast("long").as("crank"))
  }

  /** Shared PQ encoding intermediate (q_ann_pq, q_ann_ivfpq): per
    * vector, `dists` = PqM × PqCodebook {dist, cid} structs of exact
    * integer sub-space L2 distances — each entry carries the REAL
    * codebook cid (not its array position, which would silently shift
    * if a codebook vec_id were missing or null-embedded) — and `best` =
    * the per-sub-space (dist ASC, cid ASC) argmin struct.
    * All integer arithmetic on the proven DOUBLE → DECIMAL(18,7) →
    * scaled-BIGINT encoding; the codebook is ONE broadcast row on a
    * constant equi-key and the folds are in-row — zero shuffles. */
  private def pqEncoded(s: SparkSession, d: String): DataFrame = {
    val ints = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull)
      .withColumn("iv", expr(
        "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
          "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
    val cb = broadcast(ints.filter(col("vec_id") < PqCodebook)
      .groupBy()
      .agg(sort_array(collect_list(struct(
        col("vec_id").cast("long").as("cid"), col("iv").as("cv"))))
        .as("cbs"))
      .withColumn("_one", lit(1)))
    // native codegen'd distance table (r14; guide §4.2): one compiled
    // loop instead of the pqm × |cbs| × subdim interpreted HOF fold —
    // bit-exact equivalence with [[pqDistsFoldReference]] pinned in
    // ByteOpsSpec
    val distsExpr = s"pq_dists(iv, cbs, $PqM, $PqSubDim)"
    graft.functions.GraftFunctions.ensureRegistered(s)
    ints.withColumn("_one", lit(1))
      .join(cb, "_one")
      .withColumn("dists", expr(distsExpr))
      // struct comparison is field-ordered, so array_min IS the
      // (dist ASC, cid ASC) argmin — ties break to the lowest real cid
      .withColumn("best", expr("transform(dists, ds -> array_min(ds))"))
      .drop("_one", "cbs")
  }

  /** Per-sub-space residual distance table expression: the [[pqEncoded]]
    * `dists` kernel applied to a residual vector `rv` against the
    * residual codebook `cbs` (native pq_dists — r14, guide §4.2). */
  private def residualDistsExpr: String =
    s"pq_dists(rv, cbs, $PqM, $PqSubDim)"

  /** The interpreted HOF fold [[graft.functions.PqDists]] replaced and
    * is proven against (ByteOpsSpec pins bit-exact equivalence,
    * including slice/zip_with/aggregate NULL edge arithmetic). */
  def pqDistsFoldReference(vec: String, pqm: Int, sub: Int): String =
    s"transform(sequence(0, ${pqm - 1}), m -> " +
      "transform(cbs, c -> struct(" +
      s"aggregate(zip_with(slice($vec, m * $sub + 1, $sub), " +
      s"slice(c.cv, m * $sub + 1, $sub), " +
      "(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), " +
      "(a, v) -> a + v) AS dist, c.cid AS cid)))"

  /** Shared residual-quantization intermediates (q_ann_pq_residual,
    * q_ann_ivfpq_residual): the scaled-int encodings, the per-cluster
    * MEAN reference vectors (one deterministic floor(sum/n + 0.5) per
    * element — see q_ann_pq_residual's doc for why the reference must
    * be the mean, not the raw seed), and the 1-row residual codebook
    * broadcast. */
  private def residualParts(s: SparkSession, d: String):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val e = t(s, d, "embeddings")
    val ints = e.filter(col("embedding").isNotNull)
      .withColumn("iv", expr(
        "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
          "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
      .select("vec_id", "iv")
      // four consumers (mean agg, residuals, code side, probe qiv) —
      // uncached, each re-runs the decimal re-encoding scan
      .persistScoped()
    // the full-corpus coarse assignment costs a window shuffle; it is
    // needed by the mean aggregation, the residual join AND the caller's
    // candidate filter — persist once, return it, never re-derive
    val cl = centroidAssign(s, e, e).select("vec_id", "cluster").persistScoped()
    val meanc = broadcast(ints.join(cl, "vec_id")
      .select(col("cluster"), posexplode(col("iv")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg(expr("CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5D) " +
        "AS BIGINT)").as("mv"))
      .groupBy("cluster")
      .agg(expr("transform(sort_array(collect_list(struct(pos, mv))), " +
        "s -> s.mv)").as("civ")))
    val res = ints
      .join(cl, "vec_id")
      .join(meanc, "cluster")
      .withColumn("rv", expr("zip_with(iv, civ, (x, y) -> x - y)"))
      .select("vec_id", "rv")
    val rcb = broadcast(res.filter(col("vec_id") < PqCodebook)
      .groupBy()
      .agg(sort_array(collect_list(struct(
        col("vec_id").cast("long").as("cid"), col("rv").as("cv"))))
        .as("cbs"))
      .withColumn("_one", lit(1)))
    (ints, cl, meanc, rcb)
  }

  /** Per-vector residual PQ assignment: `rbest` = the per-sub-space
    * (dist ASC, cid ASC) argmin struct over the residual codebook. */
  private def residualEncoded(s: SparkSession, d: String): DataFrame = {
    val (ints, cl, meanc, rcb) = residualParts(s, d)
    residualEncodedFrom(s, d, ints, cl, meanc, rcb)
  }

  /** [[residualEncoded]] from already-built parts — lets
    * q_ann_ivfpq_residual share ONE parts subtree between its code and
    * table sides instead of re-deriving the mean aggregation. */
  private def residualEncodedFrom(s: SparkSession, d: String,
      ints: DataFrame, cl: DataFrame, meanc: DataFrame,
      rcb: DataFrame): DataFrame = {
    ints.join(cl, "vec_id")
      .join(meanc, "cluster")
      .withColumn("rv", expr("zip_with(iv, civ, (x, y) -> x - y)"))
      .withColumn("_one", lit(1)).join(rcb, "_one")
      .withColumn("dists", expr(residualDistsExpr))
      .withColumn("rbest", expr("transform(dists, ds -> array_min(ds))"))
      .select("vec_id", "rbest")
  }

  /** IVF-PQ search with asymmetric distance computation (ADC) — the
    * production ANN read path (Jégou et al., PAMI 2011) composed from
    * the two proven halves: the probe searches its 2 nearest IVF
    * clusters (q_ann_ivf_nprobe's coarse stage), and candidates inside
    * them are ranked WITHOUT touching their full vectors — each
    * candidate's distance is the sum over sub-spaces of the probe's
    * precomputed distance to the candidate's CODEBOOK ENTRY (32-row
    * table: PqM × PqCodebook exact integer L2 values). Everything is
    * exact integers, so the ADC ranking is engine-identical. Scale:
    * candidates ship only their (vec_id, m, cid) code rows — ×PqM slim
    * fan-out instead of ×EmbDim floats — against a broadcast table,
    * then one vec_id-keyed partial-agg shuffle and a bounded top-`k`.
    * Shared by q_ann_ivfpq (k=10) and the refined two-stage search
    * (k=PqRefineK). */
  private def ivfpqAdcTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    val e = t(s, d, "embeddings")
    val clusters = centroidAssign(s, e, e)
    val probeClusters = broadcast(
      centroidAssign(s, e, e.filter(col("vec_id") === 0), k = 2)
        .select(col("cluster").as("probe_cluster")))
    // the probe's 32-entry distance table: its PQ argmin intermediate
    // IS the (m, entry, dist) table before the min is taken
    val tbl = broadcast(pqEncoded(s, d)
      .filter(col("vec_id") === 0)
      .select(posexplode(col("dists")).as(Seq("m", "ds")))
      .select(col("m"), explode(col("ds")).as("e"))
      .select(col("m"), col("e.cid").as("cid"), col("e.dist").as("tdist")))
    val codes = pqEncoded(s, d)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), posexplode(expr(
        "transform(best, b -> b.cid)")).as(Seq("m", "cid")))
    clusters.filter(col("vec_id") =!= 0)
      .join(probeClusters, col("cluster") === col("probe_cluster"))
      .select("vec_id")
      .join(codes, "vec_id")
      .join(tbl, Seq("m", "cid"))
      .groupBy("vec_id")
      .agg(sum("tdist").as("adc"))
      .orderBy(asc_nulls_last("adc"), asc_nulls_last("vec_id"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k against probe vec_id=0 (the baseline).
    "q_simsearch_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb")))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .withColumn("cosine", dotExpr(s, "embedding", "probe_emb"))
        .select("vec_id", "cosine")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_id"))
        .limit(10)
    }),

    // Embedding-cosine near-dup: top-20 most similar pairs (bounded to
    // vec_id < 1000 — the brute-force verify stage; candidate generation
    // at scale goes through q_ann_lsh buckets).
    //
    // Two-phase ranking: a tight-loop JVM UDF computes the double dot for
    // ALL pairs (48× faster than the interpreted decimal fold) and keeps
    // the top-100 via TakeOrderedAndProject; the exact-decimal dot then
    // re-ranks only those and emits the final 20. Double vs exact-decimal
    // dots differ by <1e-12, far below inter-pair spacing, so the final
    // top-20 is identical to the all-exact computation the oracle runs.
    "q_dedup_embed" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("vec_id") < 1000)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("fastdot", fastDot(s, "ea", "eb"))
        .orderBy(desc_nulls_last("fastdot"),
          asc_nulls_last("vec_a"), asc_nulls_last("vec_b"))
        .limit(100)
        .withColumn("cosine", dotExpr(s, "ea", "eb"))
        .select("vec_a", "vec_b", "cosine")
        .orderBy(desc_nulls_last("cosine"),
          asc_nulls_last("vec_a"), asc_nulls_last("vec_b"))
        .limit(20)
    }),

    // Exact-duplicate embedding detection — the storage-level dedup an
    // embedding store runs before any ANN build (identical vectors from
    // re-encoded shards waste index space and skew centroids): group by
    // the md5 of the exact scaled-BIGINT encoding (bit-identical
    // vectors ⇒ identical grids ⇒ identical fingerprints — no FP
    // comparison anywhere), keep MIN vec_id per group, q_text_dedup's
    // policy on the vector column. One shuffle on the 128-bit key.
    "q_embed_dedup_exact" -> ((s, d) =>
      t(s, d, "embeddings").filter(col("embedding").isNotNull)
        .withColumn("fp", md5(expr(
          "array_join(transform(embedding, x -> CAST(CAST(CAST(x " +
            "AS DOUBLE) AS DECIMAL(18,7)) * 10000000 AS BIGINT)), ',')")))
        .groupBy("fp")
        .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_vec_id"))
        .orderBy(asc_nulls_last("fp"))),

    // Hybrid-retrieval rank fusion (reciprocal rank fusion, Cormack et
    // al. SIGIR'09 — the standard way a RAG stack combines dense and
    // lexical retrieval): the probe doc's top-50 by exact embedding
    // cosine and top-50 by exact token Jaccard fuse via
    // RRF(d) = Σ_lists 1/(60 + rank_list(d)), top-10 out. Each
    // reciprocal is cast to DECIMAL(18,10) before summing (the Det
    // convention — dyadic reciprocals terminate, so no rounding ties),
    // making the fused score order-insensitive. Scale: two TakeOrdered
    // top-50s (per-partition heaps, no global sort), ranks assigned by
    // a window PARTITIONED BY the list tag over the bounded 100-row
    // union, probe payloads are 1-row broadcasts.
    "q_rank_fusion" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      val probeEmb = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("pe")).withColumn("_one", lit(1)))
      val docs = t(s, d, "documents").filter(col("text").isNotNull)
        .withColumn("toks", expr("array_distinct(split(text, ' '))"))
      val probeToks = broadcast(docs.filter(col("doc_id") === 0)
        .select(col("toks").as("pt")).withColumn("_one", lit(1)))
      val cosCand = e.filter(col("vec_id") =!= 0)
        .withColumn("_one", lit(1)).join(probeEmb, "_one")
        .withColumn("score", dotExpr(s, "embedding", "pe"))
        .select(col("vec_id").as("doc_id"), col("score"))
        .orderBy(desc_nulls_last("score"), asc_nulls_last("doc_id"))
        .limit(50)
        .withColumn("list", lit("cos"))
      val tokCand = docs.filter(col("doc_id") =!= 0)
        .withColumn("_one", lit(1)).join(probeToks, "_one")
        .withColumn("score",
          expr("CAST(size(array_intersect(toks, pt)) AS DOUBLE)")
            / expr("size(array_distinct(concat(toks, pt)))"))
        .select(col("doc_id"), col("score"))
        .orderBy(desc_nulls_last("score"), asc_nulls_last("doc_id"))
        .limit(50)
        .withColumn("list", lit("tok"))
      val wr = Window.partitionBy("list")
        .orderBy(desc_nulls_last("score"), asc_nulls_last("doc_id"))
      cosCand.unionByName(tokCand)
        .withColumn("rank", row_number().over(wr).cast("long"))
        .groupBy("doc_id")
        .agg(
          max(when(col("list") === "cos", col("rank"))).as("cos_rank"),
          max(when(col("list") === "tok", col("rank"))).as("tok_rank"),
          sum(expr("CAST(1.0D / (60 + rank) AS DECIMAL(18,10))"))
            .cast("double").as("rrf"))
        .orderBy(desc_nulls_last("rrf"), asc_nulls_last("doc_id"))
        .limit(10)
    }),

    // Cluster-scoped semantic dedup screening (the SemDeDup shape,
    // Abbas et al. 2023): pairs are compared only INSIDE coarse
    // clusters — the quadratic is bounded by cluster size, never the
    // corpus — and each cluster reports its top-3 most-similar pairs,
    // the list a curation run reviews to pick the dedup threshold.
    // Two-phase ranking like q_dedup_embed: the codegen'd float dot
    // screens each cluster to 20 candidates, the exact-decimal dot
    // settles the declared top-3. Scale (the r11 sf1 audit's one >10×
    // member, fixed r12): the in-cluster fan-out is Θ((n/k)²·k) float
    // dots — the SemDeDup paper's own cost — so k now GROWS WITH THE
    // CORPUS, k = max(8, ceil(n/500)), computed once on the driver
    // (exactly the q_join_bloom n_orders precedent: a bounded count →
    // a deterministic plan literal the oracle mirrors as a scalar
    // subquery). Clusters stay ≤~500 vectors, the pair bill per cluster
    // is capped at ~125k float dots, and the TOTAL bill is ~125·n —
    // linear in the corpus, the paper's own recipe (50k clusters at
    // web scale). WindowGroupLimit still prunes top-20 per cluster
    // map-side before any exchange. The exact top-3-cosine-per-cluster
    // CONTRACT is unchanged at every SF where ceil(n/500) ≤ 8 (all
    // three fixtures), and the sub-quadratic screening path when
    // exactness is negotiable remains the LSH-bucketed q_dedup_embed.
    "q_dedup_semantic" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      val kSem = math.max(IvfCentroids.toLong,
        math.ceil(e.count() / 500.0).toLong)
      val cl = centroidAssign(s, e, e, nCents = kSem)
        .select("vec_id", "cluster")
      val m = e.join(cl, "vec_id")
        .select(col("cluster"), col("vec_id"), col("embedding"))
      val a = m.select(col("cluster"), col("vec_id").as("vec_a"),
        col("embedding").as("ea"))
      val b = m.select(col("cluster"), col("vec_id").as("vec_b"),
        col("embedding").as("eb"))
      val wf = Window.partitionBy("cluster")
        .orderBy(desc_nulls_last("fd"), asc_nulls_last("vec_a"),
          asc_nulls_last("vec_b"))
      val wx = Window.partitionBy("cluster")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_a"),
          asc_nulls_last("vec_b"))
      a.join(b, Seq("cluster")).filter(col("vec_a") < col("vec_b"))
        .withColumn("fd", fastDot(s, "ea", "eb"))
        .withColumn("_rn", row_number().over(wf))
        .filter(col("_rn") <= 20)
        .withColumn("cosine", dotExpr(s, "ea", "eb"))
        .withColumn("rank", row_number().over(wx).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("cluster").cast("long").as("cluster"), col("rank"),
          col("vec_a"), col("vec_b"), col("cosine"))
        .orderBy(asc_nulls_last("cluster"), asc_nulls_last("rank"))
    }),

    // LSH bucket assignment for every vector — the scale path for ANN.
    "q_ann_lsh" -> ((s, d) =>
      annBuckets(t(s, d, "embeddings"))
        .select("vec_id", "bucket")
        .orderBy(asc_nulls_last("vec_id"))),

    // Binary-embedding Hamming ANN (sign-bit quantization — Charikar
    // 2002's hyperplane LSH with the coordinate basis): each vector
    // compresses to EmbDim sign BITS packed into two 32-bit words, and
    // the probe's top-10 ranks by Hamming distance = popcount(xor) —
    // the 32×-smaller index a 100 TB ANN tier scans before any float
    // touches memory. Determinism: packing is pure sign COMPARISON
    // (no FP arithmetic), words/distances are exact integers, ties
    // break by vec_id; the exact-decimal cosine of each returned
    // neighbor rides along as the self-audit column (computed on the
    // 10 survivors only). Scale: a narrow in-row fold, a 1-row probe
    // broadcast, and TakeOrderedAndProject's per-partition heaps — no
    // global sort, no float reads until the final 10 rows.
    "q_ann_hamming" -> ((s, d) => {
      def word(lo: Int): String =
        s"aggregate(sequence($lo, ${lo + 31}), CAST(0 AS BIGINT), " +
          "(acc, i) -> acc + shiftleft(CAST(CASE WHEN embedding[i] > 0 " +
          s"THEN 1 ELSE 0 END AS BIGINT), i - $lo))"
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
        .withColumn("w0", expr(word(0)))
        .withColumn("w1", expr(word(32)))
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("w0").as("pw0"), col("w1").as("pw1"),
          col("embedding").as("pe"), lit(1).as("_one")))
      e.filter(col("vec_id") =!= 0)
        .withColumn("_one", lit(1))
        .join(probe, "_one")
        .withColumn("hamming", expr(
          "CAST(bit_count(w0 ^ pw0) + bit_count(w1 ^ pw1) AS BIGINT)"))
        .orderBy(asc_nulls_last("hamming"), asc_nulls_last("vec_id"))
        .limit(10)
        .withColumn("cosine", dotExpr(s, "embedding", "pe"))
        .select("vec_id", "hamming", "cosine")
        .orderBy(asc_nulls_last("hamming"), asc_nulls_last("vec_id"))
    }),

    // Batch-probe Hamming tier (r12 verdict item 8): the production
    // shape amortizes ONE pass over the packed sign words across a
    // bounded probe panel (vec_id < 32 — fixed at any corpus size, the
    // q_embed_knn_classify panel argument) instead of rescanning per
    // probe. Per-probe top-10 by popcount via row_number ≤ 10 — the
    // rank filter compiles to WindowGroupLimit, so each map partition
    // keeps only its local top-10 PER PROBE before the 32-key shuffle;
    // the shuffled rows are slim (p_id, vec_id, hamming) integers.
    // Everything is exact integer arithmetic; ties break by vec_id.
    // Scale: corpus × 32 slim in-row expansions, bounded panel
    // broadcast, no float reads at all — the scan tier stays 32×
    // smaller than the embedding column.
    "q_ann_hamming_panel" -> ((s, d) => {
      def word(lo: Int): String =
        s"aggregate(sequence($lo, ${lo + 31}), CAST(0 AS BIGINT), " +
          "(acc, i) -> acc + shiftleft(CAST(CASE WHEN embedding[i] > 0 " +
          s"THEN 1 ELSE 0 END AS BIGINT), i - $lo))"
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
        .withColumn("w0", expr(word(0)))
        .withColumn("w1", expr(word(32)))
        .select("vec_id", "w0", "w1")
      val panel = broadcast(e.filter(col("vec_id") < 32)
        .select(col("vec_id").as("p_id"), col("w0").as("pw0"),
          col("w1").as("pw1")))
      val w = Window.partitionBy("p_id")
        .orderBy(asc_nulls_last("hamming"), asc_nulls_last("vec_id"))
      e.crossJoin(panel)
        .filter(col("vec_id") =!= col("p_id"))
        .withColumn("hamming", expr(
          "CAST(bit_count(w0 ^ pw0) + bit_count(w1 ^ pw1) AS BIGINT)"))
        .select("p_id", "vec_id", "hamming")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .orderBy(asc_nulls_last("p_id"), asc_nulls_last("rnk"))
    }),

    // Multiprobe Hamming LSH (r13; the Lv et al. 2007 multi-probe idea
    // on the sign-bit index): instead of scanning the WHOLE packed-word
    // tier (q_ann_hamming) or growing the table count, bucket the
    // corpus by the low 8 bits of word0 and probe the query's bucket
    // PLUS every 1-bit and 2-bit perturbation — 1+8+28 = 37 of 256
    // buckets ≈ 14% of the corpus scanned, repairing any neighbor
    // whose 64-bit divergence puts ≤ 2 bits inside the 8-bit key. The
    // measured recall10 (0.2/0.5/0.6 across the fixture SFs) IS the
    // predicted value, not a defect: the synthetic embeddings are
    // near-random, so the exact top-10 sits at h ≈ 19–23 of 64 bits
    // (verified from the q_ann_hamming dump) → expected h/8 ≈ 2.9 key
    // bits astray → P(≤2) ≈ 0.5 per neighbor. On clustered real
    // corpora (top-10 at h ≤ 6, < 1 expected key bit astray) the same
    // 37-probe ring recovers ≈ all of them — recall is a function of
    // neighbor distance, and the in-query self-audit reports the
    // knob's true position instead of asserting a cherry-picked 1.0.
    // Candidates rank by full 64-bit popcount; the
    // EXACT full-scan top-10 is recomputed in-query and the overlap
    // reported as recall10 — the self-audit making the trade-off
    // measurable, not asserted. All integers; ties break by vec_id.
    // Scale: corpus shuffles ONCE on the 256-value bucket key into an
    // equi-join against the 37-row probe-bucket broadcast (never a
    // nested loop over the corpus); both top-10s are
    // TakeOrderedAndProject heaps; the final fold crosses three ≤10-row
    // sides.
    "q_ann_hamming_multiprobe" -> ((s, d) => {
      def word(lo: Int): String =
        s"aggregate(sequence($lo, ${lo + 31}), CAST(0 AS BIGINT), " +
          "(acc, i) -> acc + shiftleft(CAST(CASE WHEN embedding[i] > 0 " +
          s"THEN 1 ELSE 0 END AS BIGINT), i - $lo))"
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
        .withColumn("w0", expr(word(0)))
        .withColumn("w1", expr(word(32)))
        .select("vec_id", "w0", "w1")
        .withColumn("bucket", expr("w0 % 256"))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("w0").as("pw0"), col("w1").as("pw1"),
          col("bucket").as("pb"))
      // the probe bucket + all 1-bit and 2-bit flips (37 distinct
      // masks, constants) — the broadcast driving the equi-join
      val probes = broadcast(probe
        .select(col("pw0"), col("pw1"), explode(expr(
          ProbeMasks.map(m => s"pb ^ $m")
            .mkString("array(", ", ", ")"))).as("bucket")))
      def ranked(cand: org.apache.spark.sql.DataFrame) = cand
        .filter(col("vec_id") =!= 0)
        .withColumn("hamming", expr(
          "CAST(bit_count(w0 ^ pw0) + bit_count(w1 ^ pw1) AS BIGINT)"))
        .orderBy(asc_nulls_last("hamming"), asc_nulls_last("vec_id"))
        .limit(10)
        .select("vec_id", "hamming")
      val approx = ranked(e.join(probes, "bucket"))
      val exact = ranked(e.crossJoin(
        broadcast(probe.select("pw0", "pw1"))))
      val nCand = e.join(probes, "bucket")
        .filter(col("vec_id") =!= 0)
        .agg(count(lit(1)).as("n_candidates")).withColumn("_one", lit(1))
      val hit = approx.select(col("vec_id"))
        .join(exact.select(col("vec_id")), "vec_id")
        .agg(count(lit(1)).as("hit10")).withColumn("_one", lit(1))
      nCand.join(hit, "_one")
        .select(lit(ProbeMasks.size.toLong).as("n_probed_buckets"),
          col("n_candidates"), col("hit10"),
          expr("CAST(hit10 AS DOUBLE) / CAST(10 AS DOUBLE)")
            .as("recall10"))
    }),

    // Embedding L2 normalization — the standard pre-step before cosine
    // ANN (normalized vectors turn cosine into a plain dot product).
    // Pure narrow map. norm = sqrt(exact-decimal self-dot): sqrt is
    // IEEE correctly-rounded, so both engines agree bit-for-bit; the
    // first normalized component is ONE exact double division.
    "q_embed_norm" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      e.withColumn("norm", sqrt(dotExpr(s, "embedding", "embedding")))
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          col("norm"),
          (col("embedding").getItem(0).cast("double") / col("norm"))
            .as("c0_unit"))
        .orderBy(asc_nulls_last("vec_id"))
    }),

    // Bucketed ANN neighbors — the composed scale path end-to-end: LSH
    // bucket assignment, a pair join SHUFFLED ON BUCKET (never the O(n²)
    // pair space; no BroadcastNestedLoopJoin), codegen'd FloatDot
    // prefilter to top-8 per vector, exact-decimal rerank to the final
    // top-3. The 8→3 margin makes the fast/exact phase swap safe: a
    // selection difference would need the double dot's <1e-12 error to
    // exceed the #3→#8 cosine gap. planes=6 (64 buckets) keeps the
    // within-bucket pair fan-out ~n·(n/2^planes); at 100 TB planes grows
    // with the corpus so avg bucket size (and per-bucket quadratic cost)
    // stays bounded — 2^planes is also the join's parallelism.
    "q_ann_neighbors" -> ((s, d) => {
      val e = annBuckets(t(s, d, "embeddings"), planes = NeighborPlanes)
        .select(col("vec_id"), col("bucket"), col("embedding"))
      val a = e.select(col("vec_id"), col("bucket"),
        col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("nb_id"),
        col("bucket").as("bucket_b"), col("embedding").as("eb"))
      val wFast = Window.partitionBy("vec_id")
        .orderBy(desc_nulls_last("fastdot"), asc_nulls_last("nb_id"))
      val wExact = Window.partitionBy("vec_id")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("nb_id"))
      // fastdot computed at the join, then SLIM (vec_id, nb_id, fastdot)
      // rows through the WindowGroupLimit shuffle — dragging two 64-float
      // embeddings per pair through the window sort was 25× the bytes;
      // the top-8 survivors re-join their embeddings for the exact rerank
      // shuffle_hash: with ~2^planes distinct keys and bounded buckets a
      // hash join streams pairs straight out of the build map — the SMJ
      // alternative pays a full sort of both embedding-carrying sides
      // (measured 1.3 s vs 0.9 s for this stage at sf0.1)
      val top8 = a.hint("shuffle_hash")
        .join(b, col("bucket") === col("bucket_b")
          && col("vec_id") =!= col("nb_id"))
        .withColumn("fastdot", fastDot(s, "ea", "eb"))
        .select("vec_id", "nb_id", "fastdot")
        .withColumn("_rn", row_number().over(wFast))
        .filter(col("_rn") <= 8)
      top8
        .join(e.select(col("vec_id"), col("embedding").as("ea")), "vec_id")
        .join(e.select(col("vec_id").as("nb_id"),
          col("embedding").as("eb")), "nb_id")
        .withColumn("cosine", dotExpr(s, "ea", "eb"))
        .withColumn("_rx", row_number().over(wExact))
        .filter(col("_rx") <= 3)
        .select("vec_id", "nb_id", "cosine")
        .orderBy(asc_nulls_last("vec_id"), desc_nulls_last("cosine"),
          asc_nulls_last("nb_id"))
    }),

    // kNN label classification (k = 5, leave-one-out) over the embedding
    // column — the label-propagation / auto-labeling audit of a
    // training-data pipeline, reported as per-class accuracy. Probe set
    // is the FIXED 32-row panel (vec_id < 32 — bounded at ANY corpus
    // size, the q_ann_recall panel argument; a corpus-fraction probe set
    // would broadcast 10% of the corpus — the decontamination mistake);
    // the neighbor scan is the proven two-phase shape — codegen'd double
    // dots pre-rank SLIM (p_id, nb_id, fastdot) rows, the top 16 survive
    // to the exact-decimal rerank that keeps 5 (the q_ann_neighbors
    // margin argument: double vs decimal ranks can only differ on a
    // <1e-12 near-tie, absorbed by the 16→5 margin). The vote is one
    // keyed count + a top-1 window; the accuracy rollup is one keyed
    // aggregate. Scale: the panel broadcasts, the corpus never shuffles
    // until the slim pre-rank rows; everything downstream is bounded by
    // 16 × panel.
    "q_embed_knn_classify" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val probes = broadcast(emb.filter(col("vec_id") < 32)
        .select(col("vec_id").as("p_id"), col("embedding").as("pe"),
          col("label").as("true_label")))
      val corpus = emb.select(col("vec_id").as("nb_id"),
        col("embedding").as("eb"), col("label").as("nb_label"))
      val wFast = Window.partitionBy("p_id")
        .orderBy(desc_nulls_last("fastdot"), asc_nulls_last("nb_id"))
      val wExact = Window.partitionBy("p_id")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("nb_id"))
      val top5 = corpus
        .crossJoin(probes)
        .filter(col("nb_id") =!= col("p_id"))
        .withColumn("fastdot", fastDot(s, "eb", "pe"))
        .select("p_id", "nb_id", "fastdot")
        .withColumn("_rn", row_number().over(wFast))
        .filter(col("_rn") <= 16)
        .join(corpus, "nb_id")
        .join(probes.select("p_id", "pe"), "p_id")
        .withColumn("cosine", dotExpr(s, "eb", "pe"))
        .withColumn("_rx", row_number().over(wExact))
        .filter(col("_rx") <= 5)
        .select("p_id", "nb_label")
      val wVote = Window.partitionBy("p_id")
        .orderBy(desc_nulls_last("n_votes"), asc_nulls_last("nb_label"))
      val pred = top5.groupBy("p_id", "nb_label")
        .agg(count(lit(1)).as("n_votes"))
        .withColumn("_rv", row_number().over(wVote))
        .filter(col("_rv") === 1)
        .select(col("p_id"), col("nb_label").as("pred_label"))
      pred
        .join(probes.select("p_id", "true_label"), "p_id")
        .groupBy("true_label")
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("pred_label") === col("true_label"), 1L)
            .otherwise(0L)).as("n_correct"))
        .orderBy(asc_nulls_last("true_label"))
    }),

    // Pairwise-cosine histogram over the FIXED 32-vector panel — the
    // anisotropy / space-collapse diagnostic (Ethayarajh, EMNLP 2019):
    // contextual-embedding spaces drift toward a narrow cone, and a
    // mass of pairwise cosines near 1 means distance-based retrieval
    // and dedup thresholds stop discriminating. The panel keeps the
    // O(panel²) bill a CONSTANT (496 pairs) independent of corpus
    // size — the q_ann_recall bounded-panel economics; cosines are the
    // exact-decimal dot (bit-identical on both engines), the bin is
    // floor(10·cos) of that identical double, and the per-bin sum is
    // an exact scale-7 decimal.
    "q_embed_pairwise_hist" -> ((s, d) => {
      val p = t(s, d, "embeddings").filter(col("vec_id") < 32)
        .select(col("vec_id"), col("embedding"))
      p.select(col("vec_id").as("va"), col("embedding").as("ea"))
        .join(p.select(col("vec_id").as("vb"), col("embedding").as("eb")),
          col("va") < col("vb"))
        .withColumn("cosine", dotExpr(s, "ea", "eb"))
        .groupBy(floor(col("cosine") * 10).cast("long").as("bin"))
        .agg(count(lit(1)).as("n_pairs"),
          graft.Det.dsum(col("cosine"), 7).as("sum_cos"))
        .orderBy(asc_nulls_last("bin"))
    }),

    // IVF-style ANN (inverted-file coarse quantization): k deterministic
    // centroids (the first k vectors — a fixed, engine-agnostic choice
    // standing in for trained k-means centroids), every vector assigned
    // to its max-cosine centroid, then the probe searches ONLY its own
    // cluster — nprobe=1. All phases linear: assignment is a broadcast of
    // k rows (equi-join on a constant key, so the plan is a hash join,
    // never nested-loop) + a per-vector top-1 window; search is a
    // cluster-filtered exact-dot TakeOrderedAndProject. At 100 TB, k
    // scales with corpus size and assignment stays one narrow pass.
    // Assignment ranks by the codegen'd double dot; the oracle ranks by
    // the exact-decimal dot — selection can only differ on a <1e-12
    // centroid-dot tie, which distinct centroids cannot produce.
    "q_ann_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val clusters = centroidAssign(s, e, e)
      // the probe's cluster needs only the probe row's k dots — deriving
      // it from `clusters` would re-run the full corpus assignment
      val probeCluster = broadcast(
        centroidAssign(s, e, e.filter(col("vec_id") === 0))
          .select(col("cluster").as("probe_cluster")))
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb")))
      clusters.filter(col("vec_id") =!= 0)
        .join(probeCluster, col("cluster") === col("probe_cluster"))
        .join(e, "vec_id")
        .crossJoin(probe)
        .withColumn("cosine", dotExpr(s, "embedding", "probe_emb"))
        .select("vec_id", "cosine")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_id"))
        .limit(10)
    }),

    // IVF with nprobe=2: identical phases to q_ann_ivf, but the probe
    // searches its TWO nearest clusters — the standard recall knob of an
    // inverted-file index (nprobe trades linear extra search cost for
    // recall lost at cluster boundaries). The probe-cluster set is a
    // 2-row broadcast, so the cluster filter is a broadcast hash join on
    // a real key; everything else stays linear.
    "q_ann_ivf_nprobe" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val clusters = centroidAssign(s, e, e)
      val probeClusters = broadcast(
        centroidAssign(s, e, e.filter(col("vec_id") === 0), k = 2)
          .select(col("cluster").as("probe_cluster")))
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb")))
      clusters.filter(col("vec_id") =!= 0)
        .join(probeClusters, col("cluster") === col("probe_cluster"))
        .join(e, "vec_id")
        .crossJoin(probe)
        .withColumn("cosine", dotExpr(s, "embedding", "probe_emb"))
        .select("vec_id", "cosine")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_id"))
        .limit(10)
    }),

    // IVF recall/cost curve — the first question a real user asks of an
    // inverted-file index: how much recall does each extra probed
    // cluster buy, and at what scan cost? For nprobe ∈ {1, 2, 4}:
    // n_searched = candidates whose cluster is within the probe's
    // nprobe nearest centroids (the scan cost), n_hit = how many of the
    // brute-force exact top-10 those candidates contain (the recall
    // numerator). ONE pass: every vector's cluster joins the probe's
    // 8-row centroid ranking (broadcast), membership in the exact top-10
    // is a 10-row broadcast semi-equi-join, and the three nprobe points
    // fold out of a single conditional aggregate via stack() — no
    // per-nprobe rescans, no extra join for the curve axis.
    "q_ann_ivf_curve" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val clusters = centroidAssign(s, e, e).select("vec_id", "cluster")
      // the probe's full centroid ranking (8 rows, broadcast)
      val probeRanks = broadcast(
        centroidAssign(s, e, e.filter(col("vec_id") === 0),
          k = IvfCentroids)
          .select(col("cluster").as("pcluster"), col("crank")))
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb")))
      val exact10 = broadcast(e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .withColumn("fd", fastDot(s, "embedding", "probe_emb"))
        .orderBy(desc_nulls_last("fd"), asc_nulls_last("vec_id"))
        .limit(100)
        .withColumn("cosine", dotExpr(s, "embedding", "probe_emb"))
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_id"))
        .limit(10)
        .select(col("vec_id").as("hit_id"), lit(1L).as("is_hit")))
      clusters.filter(col("vec_id") =!= 0)
        .join(probeRanks, col("cluster") === col("pcluster"))
        .join(exact10, col("vec_id") === col("hit_id"), "left")
        .agg(
          sum(when(col("crank") <= 1, 1L).otherwise(0L)).as("s1"),
          sum(when(col("crank") <= 1, coalesce(col("is_hit"), lit(0L)))
            .otherwise(0L)).as("h1"),
          sum(when(col("crank") <= 2, 1L).otherwise(0L)).as("s2"),
          sum(when(col("crank") <= 2, coalesce(col("is_hit"), lit(0L)))
            .otherwise(0L)).as("h2"),
          sum(when(col("crank") <= 4, 1L).otherwise(0L)).as("s4"),
          sum(when(col("crank") <= 4, coalesce(col("is_hit"), lit(0L)))
            .otherwise(0L)).as("h4"))
        .selectExpr("stack(3, 1L, s1, h1, 2L, s2, h2, 4L, s4, h4) " +
          "AS (nprobe, n_searched, n_hit)")
        .orderBy(asc_nulls_last("nprobe"))
    }),

    // LSH recall diagnostic: recall@3 of the bucketed q_ann_neighbors
    // path against brute-force exact top-3 ground truth, measured on a
    // FIXED 16-probe panel (vec_id < 16) — the standard ANN methodology:
    // (On the synthetic fixtures this reports near-zero recall — random
    // near-orthogonal vectors have no neighbor structure, so ANY
    // sublinear index scores near the random baseline there; on real
    // clustered embeddings the same query is the tuning dial for planes
    // and table count. That it exposes this honestly is the point of a
    // recall diagnostic.)
    // ground truth is only computable by exhaustive scan, so it is
    // estimated on a bounded probe set (cost: 16 broadcast rows × one
    // linear corpus pass — the q_kmeans_iter broadcast-k shape, never
    // quadratic). The bucketed side IS the declared q_ann_neighbors
    // plan with its left side filtered to the panel (the vec_id
    // predicate pushes below the per-vector ranking windows). Integer
    // output: (probe, hits-in-top-3, 3).
    "q_ann_recall" -> ((s, d) => {
      val approx = queries("q_ann_neighbors")(s, d)
        .filter(col("vec_id") < 16)
        .select(col("vec_id"), col("nb_id"), lit(1L).as("_m"))
      panelExactTop3(s, d).join(approx, Seq("vec_id", "nb_id"), "left")
        .groupBy("vec_id")
        .agg(count(col("_m")).as("n_hit"))
        .select(col("vec_id"), col("n_hit"), lit(3L).as("n_exact"))
        .orderBy(asc_nulls_last("vec_id"))
    }),

    // nDCG@10 of the bucketed ANN pipeline — the GRADED companion to
    // q_ann_recall's set overlap (Järvelin & Kekäläinen, TOIS 2002): a
    // candidate in the approx list earns gain 11−exact_rank discounted
    // by log2(position+1), so finding the #1 neighbor at position 1 is
    // worth more than finding #10 at position 10 — the metric that
    // separates "returns the right set" from "returns it in the right
    // order". Determinism: gains and positions are exact integers, each
    // discount log2 is the bit-portable chain (Det.plog2Series), every
    // term quantizes to the exact 1e-10 grid before summation (the
    // q_event_entropy pattern), and nDCG is ONE IEEE division of two
    // grid integers; the ideal DCG is computed over the SAME complete
    // (probe × position) grid, so probes with thin buckets (< 10
    // candidates) score honestly. Scale: the panel is FIXED (16
    // probes × 10 positions); the approx side is the proven bucketed
    // q_ann_neighbors shape with a 16→10 fast/exact margin; the exact
    // side the panelExactTop3 shape widened to 20→10.
    "q_ann_ndcg" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val probes = broadcast(emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("p_id"), col("embedding").as("pe")))
      val corpus = emb.select(col("vec_id").as("nb_id"),
        col("embedding").as("eb"))
      val wFastEx = Window.partitionBy("p_id")
        .orderBy(desc_nulls_last("fastdot"), asc_nulls_last("nb_id"))
      val wExactEx = Window.partitionBy("p_id")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("nb_id"))
      // exact ground truth: top-10 with graded gain 11 − rank
      val exact = corpus.crossJoin(probes)
        .filter(col("nb_id") =!= col("p_id"))
        .withColumn("fastdot", fastDot(s, "eb", "pe"))
        .select("p_id", "nb_id", "fastdot")
        .withColumn("_rn", row_number().over(wFastEx))
        .filter(col("_rn") <= 20)
        .join(corpus, "nb_id").join(probes, "p_id")
        .withColumn("cosine", dotExpr(s, "eb", "pe"))
        .withColumn("_rx", row_number().over(wExactEx))
        .filter(col("_rx") <= 10)
        .select(col("p_id").as("vec_id"), col("nb_id"),
          (lit(11L) - col("_rx")).as("gain"))
      // approx ranking: the bucketed pipeline, panel side filtered,
      // positions 1..10 (fast top-16 → exact rerank, the margin rule)
      val bk = annBuckets(emb, planes = NeighborPlanes)
        .select(col("vec_id"), col("bucket"), col("embedding"))
      val a = bk.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("bucket"), col("embedding").as("ea"))
      val b = bk.select(col("vec_id").as("nb_id"),
        col("bucket").as("bucket_b"), col("embedding").as("eb"))
      val wFast = Window.partitionBy("vec_id")
        .orderBy(desc_nulls_last("fastdot"), asc_nulls_last("nb_id"))
      val wExact = Window.partitionBy("vec_id")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("nb_id"))
      val approx = a
        .join(b, col("bucket") === col("bucket_b")
          && col("vec_id") =!= col("nb_id"))
        .withColumn("fastdot", fastDot(s, "ea", "eb"))
        .select("vec_id", "nb_id", "fastdot")
        .withColumn("_rn", row_number().over(wFast))
        .filter(col("_rn") <= 16)
        .join(corpus, "nb_id")
        .join(probes.select(col("p_id").as("vec_id"), col("pe")),
          "vec_id")
        .withColumn("cosine", dotExpr(s, "eb", "pe"))
        .withColumn("posn", row_number().over(wExact))
        .filter(col("posn") <= 10)
        .select("vec_id", "posn", "nb_id")
      // complete (probe × position) grid → honest thin-bucket scoring
      val grid = probes.select(col("p_id").as("vec_id"))
        .withColumn("posn", explode(expr("sequence(1, 10)")))
      val terms = graft.Det.withPlog2(
        grid.join(approx, Seq("vec_id", "posn"), "left")
          .join(exact, Seq("vec_id", "nb_id"), "left")
          .withColumn("g", coalesce(col("gain"), lit(0L)))
          .withColumn("posn1", (col("posn") + 1L).cast("long")),
        "posn1", "l2")
        .withColumn("q", expr(
          "CAST(floor(CAST(g AS DOUBLE) / l2 " +
            "* CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .withColumn("iq", expr(
          "CAST(floor(CAST(11 - posn AS DOUBLE) / l2 " +
            "* CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
      terms.groupBy("vec_id")
        .agg(sum(when(col("g") > 0L, 1L).otherwise(0L)).as("n_overlap"),
          sum("q").as("dcg_q"), sum("iq").as("idcg_q"))
        .withColumn("ndcg",
          col("dcg_q").cast("double") / col("idcg_q").cast("double"))
        .orderBy(asc_nulls_last("vec_id"))
    }),

    // Multi-table LSH recall — the OR-amplification remedy q_ann_recall
    // motivates: 4 independent md5-seeded hyperplane families, a vector
    // pair is a candidate if ANY table co-buckets it (union of 4 bucket
    // joins collapsed to one equi-join on (tbl, bucket) over in-row
    // exploded assignments — still ONE corpus pass and one hash-joinable
    // shuffle, fan-out ×tables), exact-decimal rerank to top-3, recall
    // measured against the same brute-force panel. More tables trade
    // candidate volume for recall — the production LSH tuning dial.
    "q_ann_recall_multi" -> ((s, d) => {
      val bk = annBucketsMulti(t(s, d, "embeddings"),
        planes = NeighborPlanes, tables = RecallTables)
      val a = bk.filter(col("vec_id") < 16)
      val b = bk.select(col("vec_id").as("nb_id"),
        col("tbl").as("tbl_b"), col("bucket").as("bucket_b"))
      val cands = a.join(b,
          col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b")
            && col("vec_id") =!= col("nb_id"))
        .select("vec_id", "nb_id").distinct()
      val emb = t(s, d, "embeddings")
      val wEx = Window.partitionBy("vec_id")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("nb_id"))
      val approx = cands
        .join(emb.select(col("vec_id"), col("embedding").as("ea")),
          "vec_id")
        .join(emb.select(col("vec_id").as("nb_id"),
          col("embedding").as("eb")), "nb_id")
        .withColumn("cosine", dotExpr(s, "ea", "eb"))
        .withColumn("_r", row_number().over(wEx))
        .filter(col("_r") <= 3)
        .select(col("vec_id"), col("nb_id"), lit(1L).as("_m"))
      panelExactTop3(s, d).join(approx, Seq("vec_id", "nb_id"), "left")
        .groupBy("vec_id")
        .agg(count(col("_m")).as("n_hit"))
        .select(col("vec_id"), col("n_hit"), lit(3L).as("n_exact"))
        .orderBy(asc_nulls_last("vec_id"))
    }),

    // Matryoshka-style dimension ablation (Kusupati et al., NeurIPS
    // 2022): brute-force top-3 using only the first `dims` prefix
    // dimensions of each embedding, recall measured against the
    // full-64-dim exact top-3, for dims ∈ {16, 32} — the "how few
    // dims can the first-stage retriever keep" curve that decides a
    // truncated-index deployment. Both sides rank by the exact-decimal
    // dot (the prefix is itself an array<float>, so the proven
    // decimal_dot applies unchanged — no tie argument needed). Scale:
    // the 16-probe panel broadcasts, the corpus streams through ONE
    // narrow pass per dims level (the explode doubles rows in-row, not
    // via shuffle), and the per-(dims, probe) top-3 is a bounded
    // partitioned window — the documented brute-force panel shape.
    "q_ann_dim_truncate" -> ((s, d) => {
      val probes = broadcast(t(s, d, "embeddings")
        .filter(col("vec_id") < 16)
        .select(col("vec_id").as("p_id"), col("embedding").as("pe")))
      val corpus = t(s, d, "embeddings")
        .select(col("vec_id").as("nb_id"), col("embedding").as("eb"))
      val wTr = Window.partitionBy("dims", "p_id")
        .orderBy(desc_nulls_last("tdot"), asc_nulls_last("nb_id"))
      val truncTop = corpus.crossJoin(probes)
        .filter(col("nb_id") =!= col("p_id"))
        .withColumn("dims", explode(array(lit(16), lit(32))))
        .withColumn("tdot",
          dotExpr(s, "slice(eb, 1, dims)", "slice(pe, 1, dims)"))
        .select("dims", "p_id", "nb_id", "tdot")
        .withColumn("_rn", row_number().over(wTr))
        .filter(col("_rn") <= 3)
        .select(col("dims"), col("p_id").as("vec_id"), col("nb_id"),
          lit(1L).as("_m"))
      panelExactTop3(s, d)
        .withColumn("dims", explode(array(lit(16), lit(32))))
        .join(truncTop, Seq("dims", "vec_id", "nb_id"), "left")
        .groupBy("dims", "vec_id")
        .agg(count(col("_m")).as("n_hit"))
        .select(col("dims").cast("long").as("dims"), col("vec_id"),
          col("n_hit"), lit(3L).as("n_exact"))
        .orderBy(asc_nulls_last("dims"), asc_nulls_last("vec_id"))
    }),

    // IVF search against TRAINED centroids — one Lloyd update
    // (q_kmeans_iter's exact-decimal means) replaces the raw seed
    // vectors as the coarse quantizer, then the probe searches its
    // nearest trained cluster: the "index improves with training" step
    // between q_ann_ivf (seed centroids) and a production index. Every
    // stage is exact: the means are partition-order-invariant decimal
    // averages (bit-identical on both engines), assignment ranks by the
    // exact scale-8 decimal dot against those means (no fast-prefilter
    // tie argument needed — both engines run the SAME fold), and the
    // final ranking is the proven exact cosine. Scale: means are one
    // slim (cluster, dim) shuffle; the 8 trained centroids broadcast as
    // rows; everything else is the q_ann_ivf shape.
    "q_ann_ivf_trained" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = t(s, d, "embeddings")
      // Lloyd step: per-(cluster, pos) exact mean → per-cluster DOUBLE
      // array ordered by pos
      val trained = broadcast(
        centroidAssign(s, e, e).join(e, "vec_id")
          .select(col("cluster"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos")
          .agg(graft.Det.davg(col("x").cast("double"), 7).as("mean"))
          .groupBy("cluster")
          .agg(sort_array(collect_list(struct(col("pos"), col("mean"))))
            .as("pm"))
          .select(col("cluster").as("tcid"),
            expr("transform(pm, x -> x.mean)").as("cent"),
            lit(1).as("_one")))
      // exact scale-8 decimal dot of a float vector against the trained
      // double array — the codegen'd decimal_wdot, bit-identical to the
      // interpreted wdot fold (DecimalWDot's proof; data-derived means
      // |w| ≤ 1 sit far inside the fast path's |w| ≤ 16 band) but one
      // tight codegen loop instead of 64 Decimal allocations per row
      // per cluster
      val tdot = expr("decimal_wdot(embedding, cent)")
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(desc_nulls_last("tdot"), asc_nulls_last("tcid"))
      val assigned = e.withColumn("_one", lit(1))
        .join(trained, "_one")
        .withColumn("tdot", tdot)
        .select(col("vec_id"), col("tcid"), col("tdot"))
        .withColumn("_rn", row_number().over(wAssign))
        .filter(col("_rn") === 1)
        .select(col("vec_id"), col("tcid").as("cluster"))
      val probeCluster = broadcast(assigned
        .filter(col("vec_id") === 0)
        .select(col("cluster").as("probe_cluster")))
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb")))
      assigned.filter(col("vec_id") =!= 0)
        .join(probeCluster, col("cluster") === col("probe_cluster"))
        .join(e, "vec_id")
        .crossJoin(probe)
        .withColumn("cosine", dotExpr(s, "embedding", "probe_emb"))
        .select("vec_id", "cosine")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_id"))
        .limit(10)
    }),

    // LSH index-health diagnostic: the bucket-occupancy histogram at the
    // q_ann_neighbors geometry (how many buckets hold how many vectors).
    // Occupancy is THE operational dial of a bucketed ANN index — the
    // within-bucket pair cost is quadratic in bucket size, so a fat tail
    // here says "add planes / tables" long before queries slow down.
    // Two slim keyed aggregates; output is at most |distinct sizes| rows.
    "q_ann_bucket_stats" -> ((s, d) =>
      annBuckets(t(s, d, "embeddings"), planes = NeighborPlanes)
        .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
        .groupBy("n_vecs").agg(count(lit(1)).as("n_buckets"))
        .orderBy(asc_nulls_last("n_vecs"))),

    // Random-projection dimensionality reduction (Achlioptas-style ±1
    // sign matrix): every vector projected onto 16 md5-derived sign
    // hyperplanes — the cheap JL-lemma reduction that precedes clustering
    // or coarse ANN when 64 dims are still too many. Signs derive from
    // md5 parity (no RNG state, engine-agnostic); projections fold
    // through exact decimals like annBuckets. Pure narrow map, one row
    // per (vector, output dim).
    "q_embed_rp" -> ((s, d) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      def sign(p: Int, i: Int): String = {
        val hex = md.digest(s"rp_${p}_$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if ("0123456789abcdef".indexOf(hex.charAt(0)) % 2 == 0) "1.0D"
        else "-1.0D"
      }
      def proj(p: Int): String = {
        // codegen'd scale-8 weighted dot (see wdotExpr) — was 16
        // interpreted DECIMAL folds per row, the round-4 bench's
        // slowest narrow map (1.2 s at sf0.1, ADVICE r4)
        val w = (0 until EmbDim).map(i => sign(p, i)).mkString(", ")
        s"decimal_wdot(embedding, array($w))"
      }
      val projArr = (0 until 16).map(proj).mkString("array(", ", ", ")")
      graft.functions.GraftFunctions.ensureRegistered(s)
      t(s, d, "embeddings")
        .select(col("vec_id"),
          posexplode(expr(projArr)).as(Seq("rp_dim", "rp")))
        .select(col("vec_id"), col("rp_dim").cast("long").as("rp_dim"),
          col("rp"))
        .orderBy(asc_nulls_last("vec_id"), asc_nulls_last("rp_dim"))
    }),

    // Per-dimension embedding health check — dead dimensions, scale
    // drift, and mean offset are the first signs of a broken encoder or
    // a bad normalization step, and they are per-DIMENSION statistics
    // (norms and cosines can look fine while one dim is constant).
    // Exact-decimal mean and sum-of-squares per dimension (the variance
    // numerator n·Σx² − (Σx)² stays in exact decimals, ONE IEEE division
    // at the end). One posexplode + one slim (pos) shuffle with partial
    // aggregation — the q_kmeans_iter update shape without clusters.
    "q_embed_dim_stats" -> ((s, d) =>
      t(s, d, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("pos").cast("long").as("pos"),
          col("x").cast("double").as("x"))
        .groupBy("pos")
        .agg(count(lit(1)).as("n"),
          graft.Det.dsum(col("x"), 7).as("sx"),
          sum(expr("CAST(CAST(x AS DECIMAL(18,7)) " +
            "* CAST(x AS DECIMAL(19,7)) AS DECIMAL(38,14))"))
            .cast("double").as("sxx"),
          min("x").as("x_min"), max("x").as("x_max"))
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("variance",
          (col("n") * col("sxx") - col("sx") * col("sx"))
            / (col("n") * col("n")))
        .select("pos", "n", "mean", "variance", "x_min", "x_max")
        .orderBy(asc_nulls_last("pos"))),

    // Embedding-space isotropy — the "has my space collapsed?" hygiene
    // number (Ethayarajh 2019): the MEAN PAIRWISE COSINE over all i≠j
    // unit-normalized pairs. Near 0 = directions spread (healthy
    // retrieval geometry); near 1 = everything points one way (ANN
    // buckets and cosine thresholds silently stop discriminating). The
    // O(n²) pair sum is NEVER materialized — with unit vectors u_i,
    // Σ_{i≠j} u_i·u_j = ‖Σu‖² − n, so the whole statistic needs one
    // per-dim component sum. Exactness: norm = √(exact-decimal dot)
    // and the division are correctly rounded (identical doubles), each
    // unit component quantizes to the exact integer
    // floor(u_d·10⁷ + ½), per-dim sums/squares carry in DECIMAL(38,0)
    // (HUGEINT), VARCHAR-routed, and the mean is ONE fixed IEEE tree.
    // Scale: one slim (pos, q) shuffle with map-side combine to the
    // dim-domain-bounded frame (64 rows here; 4096-dim × 10⁹ vectors
    // still sums to a 4096-row frame), then a single fold — the
    // q_embed_dim_stats economics for a pairwise-defined statistic.
    "q_embed_isotropy" -> ((s, d) => {
      val dec = "decimal(38,0)"
      t(s, d, "embeddings")
        .filter(col("embedding").isNotNull)
        .withColumn("norm", sqrt(dotExpr(s, "embedding", "embedding")))
        .select(col("norm"),
          posexplode(col("embedding")).as(Seq("pos", "comp")))
        .withColumn("q", expr(
          "CAST(floor(CAST(comp AS DOUBLE) / norm " +
            "* CAST(10000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) " +
            "AS BIGINT)"))
        .groupBy("pos")
        .agg(count(lit(1)).as("nr"), sum("q").as("sd"),
          sum(expr(s"CAST(q AS $dec) * CAST(q AS $dec)")).as("ssq"))
        .agg(count(lit(1)).as("dim"), max("nr").as("n_vecs"),
          sum(expr(s"CAST(sd AS $dec) * CAST(sd AS $dec)"))
            .as("s_cross"),
          sum(col("ssq")).as("s_self"))
        .withColumn("num", col("s_cross") - col("s_self"))
        .withColumn("avg_pair_cos", expr(
          "CAST(CAST(num AS DOUBLE) " +
            "/ (CAST(n_vecs AS DOUBLE) * CAST(n_vecs - 1 AS DOUBLE)) " +
            "/ CAST(100000000000000 AS DOUBLE) AS DOUBLE)"))
        .select(col("dim"), col("n_vecs"),
          col("s_cross").cast("string").as("s_cross"),
          col("s_self").cast("string").as("s_self"),
          col("num").cast("string").as("num"),
          col("avg_pair_cos"))
    }),

    // Linear-kernel Maximum Mean Discrepancy between every label pair
    // (Gretton et al. 2012, JMLR "A Kernel Two-Sample Test"): with the
    // linear kernel, MMD²(a,b) collapses to ‖μ_a − μ_b‖² — the
    // distribution-shift number a training pipeline watches per
    // source/epoch/shard ("did class b's embedding mass drift away from
    // class a's?") without any O(n²) pair join. Exactness: components
    // quantize to the proven floor(x·10⁷+½) integer grid, per-(label,
    // pos) sums stay BIGINT, the mean difference cross-multiplies —
    // s_a·n_b − s_b·n_a, never a per-dim division, with EVERY operand
    // cast to DECIMAL(38,0)/HUGEINT BEFORE the multiply (r10 ADVICE:
    // the old BIGINT multiply would wrap at n_a·n_b ≈ 9e11, ~1e6
    // vectors per label) — and squares
    // accumulate in DECIMAL(38,0)/HUGEINT; ONE trailing division
    // un-scales. Scale: the corpus shuffles ONCE as slim (label, pos,
    // q) rows with map-side combine into a |labels|·dim frame (640
    // rows); the pair fan-out happens on THAT, bounded by the label
    // DOMAIN, so a 1000× corpus changes only the partial-agg stage.
    "q_embed_mmd" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val comp = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .select(col("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("q", expr(
          "CAST(floor(CAST(x AS DOUBLE) * CAST(10000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(count(lit(1)).as("n"), sum("q").as("sq"))
      val a = comp.select(col("label").as("label_a"), col("pos"),
        col("n").as("n_a"), col("sq").as("s_a"))
      val b = comp.select(col("label").as("label_b"), col("pos"),
        col("n").as("n_b"), col("sq").as("s_b"))
      a.join(b, Seq("pos"))
        .filter(col("label_a") < col("label_b"))
        .withColumn("dterm", expr(
          s"CAST(s_a AS $dec) * CAST(n_b AS $dec) " +
            s"- CAST(s_b AS $dec) * CAST(n_a AS $dec)"))
        .groupBy("label_a", "label_b", "n_a", "n_b")
        .agg(sum(expr(s"CAST(dterm * dterm AS $dec)")).as("num"))
        .withColumn("mmd2", expr(
          "CAST(CAST(num AS STRING) AS DOUBLE) " +
            "/ (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) " +
            "* CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) " +
            "/ CAST(100000000000000 AS DOUBLE)"))
        .select("label_a", "label_b", "n_a", "n_b", "mmd2")
        .orderBy(asc_nulls_last("label_a"), asc_nulls_last("label_b"))
    }),

    // Linear Centered Kernel Alignment (Kornblith et al. 2019,
    // "Similarity of Neural Network Representations Revisited") between
    // the two 32-dim HALVES of the embedding — the representation-
    // similarity number used to compare checkpoints/layers/models
    // ("did the fine-tune actually change the geometry?"), here
    // demonstrated on the within-corpus split a pipeline would apply to
    // two embedding columns. CKA = ‖X'Y‖²_F / (‖X'X‖_F·‖Y'Y‖_F) over
    // column-centered features; EVERYTHING up to the final tree is
    // exact: components quantize to the 10⁵ grid (coarser than the mmd
    // grid so the 1024 squared cross-covariances fit DECIMAL(38,0) at
    // 100× this corpus), centering cross-multiplies per dim pair
    // (n·Σxy − Σx·Σy — no mean subtraction), and the three Frobenius
    // sums are order-insensitive integer folds. One trailing
    // sqrt+divide tree. Scale: the corpus shuffles once as slim
    // (pos, q) component rows; the dim-pair fan-out (64×64) happens on
    // per-PARTITION partial products via the q_embed_cov one-pass
    // second-moment shape — map-side combine collapses it before the
    // exchange, so the shuffle carries ≤ partitions·4096 slim rows.
    "q_embed_cka" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val comp = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(posexplode(col("embedding")).as(Seq("pos", "x")),
          col("vec_id"))
        .withColumn("q", expr(
          "CAST(floor(CAST(x AS DOUBLE) * CAST(100000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("q"))
      // per-vector cross products of the two halves, partially
      // aggregated: (i ∈ X-half, j ∈ Y-half) keyed sums of q_i·q_j,
      // plus per-dim linear sums for the centering term
      val pairs = comp.as("a").join(comp.as("b"), "vec_id")
        .select(col("a.pos").as("i"), col("b.pos").as("j"),
          (col("a.q") * col("b.q")).as("xy"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("n"), sum("xy").as("sxy"))
      val lin = broadcast(comp.groupBy("pos")
        .agg(sum("q").as("s")))
      val cent = pairs
        .join(lin.select(col("pos").as("i"), col("s").as("si")), "i")
        .join(lin.select(col("pos").as("j"), col("s").as("sj")), "j")
        .withColumn("c", expr(
          s"CAST(n AS $dec) * CAST(sxy AS $dec) " +
            s"- CAST(si AS $dec) * CAST(sj AS $dec)"))
        .withColumn("c2", expr(s"CAST(c * c AS $dec)"))
      cent.agg(
          max("n").as("n_vecs"),
          sum(when(col("i") < 32 && col("j") >= 32, col("c2"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sxy2"),
          sum(when(col("i") < 32 && col("j") < 32, col("c2"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("sxx2"),
          sum(when(col("i") >= 32 && col("j") >= 32, col("c2"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("syy2"))
        .withColumn("cka", expr(
          "CAST(CAST(sxy2 AS STRING) AS DOUBLE) " +
            "/ (sqrt(CAST(CAST(sxx2 AS STRING) AS DOUBLE)) " +
            "* sqrt(CAST(CAST(syy2 AS STRING) AS DOUBLE)))"))
        .select("n_vecs", "cka")
    }),

    // Simplified silhouette per label (the "medoid-free" silhouette of
    // Hruschka et al. — a(i)/b(i) measured to CENTROIDS instead of
    // all-pairs, the form that scales): a = distance to the own-label
    // centroid, b = distance to the nearest other-label centroid,
    // s = (b−a)/max(a,b) — the cluster-quality / label-noise audit a
    // training pipeline runs over auto-labeled embeddings. Exactness:
    // the O(n²) pair silhouette is never materialized; squared centroid
    // distances stay on the integer grid by cross-multiplication
    // (Σ(q·n_l − s_l)² — the mmd dterm move, no per-dim division,
    // operands cast to DECIMAL(38,0)/HUGEINT BEFORE the q·n_l multiply
    // per the r10 ADVICE so nothing transits BIGINT),
    // each distance is ONE sqrt+divide of exact pieces, per-vector s
    // quantizes to the 1e-10 grid before the order-insensitive integer
    // sum (the bhattacharyya ppm move), and the label mean is one
    // trailing division. Scale: the corpus shuffles once as slim
    // component rows; the |labels|·dim centroid frame (640 rows)
    // BROADCASTS back, so per-vector work is labels·dim — linear in
    // the corpus with domain-bounded factors.
    "q_embed_silhouette" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val quant = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("q", expr(
          "CAST(floor(CAST(x AS DOUBLE) * CAST(10000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .select(col("vec_id"), col("label"),
          col("pos").cast("long").as("pos"), col("q"))
      val cent = quant
        .groupBy(col("label").as("label2"), col("pos"))
        .agg(count(lit(1)).as("n2"), sum("q").as("s2"))
      val dists = quant.join(broadcast(cent), Seq("pos"))
        .groupBy("vec_id", "label", "label2", "n2")
        .agg(sum(expr(
          s"(CAST(q AS $dec) * CAST(n2 AS $dec) - CAST(s2 AS $dec)) " +
            s"* (CAST(q AS $dec) * CAST(n2 AS $dec) - CAST(s2 AS $dec))"))
          .as("dd"))
        .withColumn("dist", expr(
          "sqrt(CAST(CAST(dd AS STRING) AS DOUBLE)) " +
            "/ CAST(n2 AS DOUBLE)"))
      dists.groupBy("vec_id", "label")
        .agg(min(when(col("label2") === col("label"), col("dist")))
            .as("a"),
          min(when(col("label2") =!= col("label"), col("dist")))
            .as("b"))
        .withColumn("sil", expr(
          "CASE WHEN greatest(a, b) = CAST(0 AS DOUBLE) THEN " +
            "CAST(0 AS DOUBLE) ELSE (b - a) / greatest(a, b) END"))
        .withColumn("silq", expr(
          "CAST(floor(sil * CAST(10000000000 AS DOUBLE) " +
            "+ CAST(0.5 AS DOUBLE)) AS BIGINT)"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), sum("silq").as("sq"))
        .withColumn("mean_silhouette", expr(
          "CAST(sq AS DOUBLE) / CAST(n_vecs AS DOUBLE) " +
            "/ CAST(10000000000 AS DOUBLE)"))
        .select("label", "n_vecs", "mean_silhouette")
        .orderBy(asc_nulls_last("label"))
    }),

    // Label prototypes — per-label centroid on the exact integer grid,
    // then each label's 3 members most aligned with it (highest integer
    // dot): the "class exemplars" readout behind dataset distillation /
    // few-shot prompt mining and the sanity check that a label's
    // centroid actually represents it. EVERYTHING is integer: vectors
    // enter the proven DECIMAL(18,7)→scaled-BIGINT grid, centroids
    // re-enter it via one floor(sum/n + 0.5) per element (the
    // residual-PQ mean pattern), and the alignment score is the raw
    // Σ iv·civ BIGINT (≤ 64·1e14·~2 — far inside the 2⁶³ window), so
    // both engines rank identical numbers. Scale: one slim
    // (label, pos) shuffle for centroids (10×64 rows), a label-keyed
    // broadcast join back, an in-row zip_with fold, and a per-label
    // top-3 window — the broadcast-k assignment economics.
    "q_label_prototypes" -> ((s, d) => {
      val ints = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .withColumn("iv", expr(
          "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
            "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
        .select("vec_id", "label", "iv")
      val cents = broadcast(ints
        .select(col("label"), posexplode(col("iv")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(expr("CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5D) " +
          "AS BIGINT)").as("mv"))
        .groupBy("label")
        .agg(expr("transform(sort_array(collect_list(struct(pos, mv))), " +
          "s -> s.mv)").as("civ")))
      val w = Window.partitionBy("label")
        .orderBy(desc_nulls_last("dot"), asc_nulls_last("vec_id"))
      ints.join(cents, "label")
        .withColumn("dot", expr(
          "aggregate(zip_with(iv, civ, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("label").cast("long").as("label"), col("rank"),
          col("vec_id"), col("dot"))
        .orderBy(asc_nulls_last("label"), asc_nulls_last("rank"))
    }),

    // Per-label centroid drift between the two snapshot conventions —
    // the embedding-space monitor a pipeline runs between crawls before
    // trusting an old ANN index or classifier against new data: each
    // label's centroid computed on the OLD (vec_id % 7 ≠ 3) and NEW
    // (vec_id % 11 ≠ 5) snapshots on the exact scaled-BIGINT grid (the
    // q_label_prototypes floor(sum/n + 0.5) re-entry), then L1 and
    // max-dimension shifts as exact integers — no FP anywhere. Scale:
    // two slim (label, pos) aggregates off one persisted exploded frame
    // (label-domain × EmbDim rows out at any corpus size) + one keyed
    // join on that bounded grid.
    "q_embed_centroid_drift" -> ((s, d) => {
      val ints = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .withColumn("iv", expr(
          "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
            "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
        .select(col("vec_id"), col("label"),
          posexplode(col("iv")).as(Seq("pos", "x")))
        .persistScoped()
      def cent(f: Column) = ints.filter(f)
        .groupBy("label", "pos")
        .agg(expr("CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*) " +
          "+ 0.5D) AS BIGINT)").as("mv"), count(lit(1)).as("n"))
      val o = cent(col("vec_id") % 7 =!= 3)
        .select(col("label"), col("pos"), col("mv").as("m_old"),
          col("n").as("n_old"))
      val nw = cent(col("vec_id") % 11 =!= 5)
        .select(col("label"), col("pos"), col("mv").as("m_new"),
          col("n").as("n_new"))
      o.join(nw, Seq("label", "pos"))
        .groupBy("label")
        .agg(max("n_old").as("n_old"), max("n_new").as("n_new"),
          sum(abs(col("m_new") - col("m_old"))).as("l1_drift_scaled"),
          max(abs(col("m_new") - col("m_old"))).as("max_dim_drift"))
        .select(col("label").cast("long").as("label"), col("n_old"),
          col("n_new"), col("l1_drift_scaled"), col("max_dim_drift"))
        .orderBy(asc_nulls_last("label"))
    }),

    // Label-margin OOD audit — for every vector, its integer alignment
    // with its OWN label centroid minus its best alignment with any
    // OTHER label's centroid; the 20 most negative margins are the
    // mislabeled / out-of-distribution suspects a labeling pipeline
    // reviews first. Same exact integer grid as q_label_prototypes, so
    // the margin itself is an exact BIGINT — no FP anywhere. Scale:
    // the 10-row centroid table broadcasts; the candidate scan is one
    // vectors × labels in-task fan-out (bounded by the label DOMAIN,
    // the broadcast-k argument) collapsed to argmax by one per-vector
    // window; TakeOrdered caps the output at 20.
    "q_embed_label_margin" -> ((s, d) => {
      val ints = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull && col("label").isNotNull)
        .withColumn("iv", expr(
          "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
            "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
        .select("vec_id", "label", "iv")
      val cents = broadcast(ints
        .select(col("label").as("clabel"),
          posexplode(col("iv")).as(Seq("pos", "x")))
        .groupBy("clabel", "pos")
        .agg(expr("CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5D) " +
          "AS BIGINT)").as("mv"))
        .groupBy("clabel")
        .agg(expr("transform(sort_array(collect_list(struct(pos, mv))), " +
          "s -> s.mv)").as("civ"))
        .withColumn("_one", lit(1)))
      // every (vector, label-centroid) pair via the constant-key
      // broadcast — fan-out bounded by the label DOMAIN (10)
      val scored = ints.withColumn("_one", lit(1)).join(cents, "_one")
        .withColumn("dot", expr(
          "aggregate(zip_with(iv, civ, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      val wOther = Window.partitionBy("vec_id")
        .orderBy(desc_nulls_last("dot"), asc_nulls_last("clabel"))
      val own = scored.filter(col("label") === col("clabel"))
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("dot").as("own_dot"))
      val other = scored.filter(col("label") =!= col("clabel"))
        .withColumn("_rn", row_number().over(wOther))
        .filter(col("_rn") === 1)
        .select(col("vec_id"), col("clabel").cast("long")
          .as("best_other_label"), col("dot").as("best_other_dot"))
      own.join(other, "vec_id")
        .withColumn("margin", col("own_dot") - col("best_other_dot"))
        .orderBy(asc_nulls_last("margin"), asc_nulls_last("vec_id"))
        .limit(20)
        .select("vec_id", "label", "own_dot", "best_other_label",
          "best_other_dot", "margin")
    }),

    // Cross-dimension covariance (upper triangle of the full dim×dim
    // matrix) — the distributed Gram-matrix building block behind PCA /
    // whitening / decorrelation audits of an embedding store, and the
    // pairwise generalization of q_embed_dim_stats (whose per-dim
    // variance is this query's diagonal). Each row fans out to its
    // dim·(dim+1)/2 = 2080 upper-triangle products in-task; map-side
    // partial aggregation collapses the fan-out BEFORE the shuffle, so
    // the exchange carries ≤ partitions × 2080 slim partial rows no
    // matter the corpus size — the canonical one-pass second-moment
    // shape (no per-row self-join, no global anything). The marginal
    // sums Σx/Σy are NOT carried through the pair fan-out (they would
    // be 64-fold redundant there — measured 40% of the map-side cost):
    // one extra posexplode pass computes the 64-row per-dim sum frame,
    // broadcast-joined back onto the 2080 aggregated cells.
    //
    // Determinism: values are quantized to exact scale-8 integers via
    // floor(x·1e8 + 0.5) — pure IEEE double ops that both engines
    // evaluate identically — NOT a decimal cast: a float can be a
    // dyadic whose decimal expansion is exactly scale+1 digits ending
    // in 5 (the fixture contains −0.27392578125 = −561/2048, an exact
    // tie at scale 10), and on genuine ties Spark's cast rounds HALF_UP
    // while DuckDB's rounds half-even — the one case Det's
    // "ties are not binary-representable" argument does not cover.
    // Scale 8 (not 10) keeps every sum in PRIMITIVE BIGINT inside
    // whole-stage codegen — 31M Decimal allocations at sf0.1 cost 3×
    // the whole query (measured 4.3 s → 1.x s) — with real headroom:
    // |x·y|·1e8 ≤ ~2e9 per element sums to 2e18 < 2^63 at 1e9 vectors.
    // cov = Σxy/n/1e8 − (Σx/n/1e8)(Σy/n/1e8) is the same IEEE op tree
    // on both engines over identical operands (sums < 2^53 convert to
    // DOUBLE exactly; beyond, both engines round correctly — the
    // oracle routes via VARCHAR like Det.sqlDsum).
    // Top principal direction by TWO power-iteration steps on the
    // uncentered Gram matrix A = Σ x·xᵀ — the PCA building block whose
    // full matrix q_embed_cov materializes; power iteration never forms
    // A: w1 = A·e0 is the per-dim sum of iv_j·iv_0 (one slim (pos)
    // shuffle with map-side combine), w2 = A·u1 folds the per-vector
    // dot d = ⟨iv, u1⟩ in-row then reduces iv_j·d the same way. All
    // arithmetic rides the exact scaled-BIGINT grid: products route
    // through DECIMAL before they can overflow (iv_j·d ≤ 2.6e23 →
    // DECIMAL(18)·DECIMAL(19), the q_stats_anova p1+p2+1=38 trick), and
    // each iterate renormalizes by its max-abs component — NOT the L2
    // norm, because sqrt is libm — via one IEEE division of two
    // VARCHAR-routed doubles (the sums exceed 2^53, where a direct
    // decimal→double cast double-rounds per engine — §7.4), then
    // re-enters the grid by floor(r·1e7 + 0.5). Scale: two passes, each
    // reducing to EmbDim rows; the u1 vector re-enters as a 1-row
    // broadcast — the canonical distributed matrix-free eigensolver
    // step at any corpus size.
    "q_embed_pca_power" -> ((s, d) => {
      val iv = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull)
        .withColumn("iv", expr(
          "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
            "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
        .select("vec_id", "iv")
      val ev = iv.select(col("iv"),
        posexplode(col("iv")).as(Seq("pos", "x")))
      val w1 = ev
        .select(col("pos"), expr("CAST(x * iv[0] AS DECIMAL(38,0))")
          .as("p"))
        .groupBy("pos").agg(sum("p").as("w"))
      def unitize(w: DataFrame): DataFrame = {
        val m = broadcast(w
          .agg(max(abs(col("w"))).as("m")).withColumn("_one", lit(1)))
        w.withColumn("_one", lit(1)).join(m, "_one")
          .select(col("pos"), expr(
            "CAST(floor(CAST(CAST(w AS STRING) AS DOUBLE) " +
              "/ CAST(CAST(m AS STRING) AS DOUBLE) " +
              "* CAST(10000000 AS DOUBLE) " +
              "+ CAST(0.5 AS DOUBLE)) AS BIGINT)").as("u"))
      }
      val u1 = unitize(w1)
      val u1vec = broadcast(u1
        .agg(expr("transform(sort_array(collect_list(struct(pos, u))), " +
          "s -> s.u)").as("uv"))
        .withColumn("_one", lit(1)))
      val dv = iv.withColumn("_one", lit(1)).join(u1vec, "_one")
        .select(col("vec_id"), col("iv"), expr(
          "aggregate(zip_with(iv, uv, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("d"))
      val w2 = dv
        .select(posexplode(col("iv")).as(Seq("pos", "x")), col("d"))
        .select(col("pos"), expr(
          "CAST(x AS DECIMAL(18,0)) * CAST(d AS DECIMAL(19,0))").as("p"))
        .groupBy("pos").agg(sum("p").as("w"))
      u1.select(col("pos").cast("long").as("pos"), col("u").as("u1"))
        .join(unitize(w2)
          .select(col("pos").cast("long").as("pos"), col("u").as("u2")),
          "pos")
        .orderBy(asc_nulls_last("pos"))
    }),

    "q_embed_cov" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      val dims = e
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("pos")
        .agg(sum(expr(
          "CAST(floor(CAST(x AS DOUBLE) * 1e8 + 0.5) AS BIGINT)"))
          .cast("double").as("sv"))
      // pair fan-out via two chained generators, NOT a nested
      // transform/flatten HOF: explode(sequence) is plain codegen'd
      // GenerateExec, so scan -> explode i -> explode j -> product ->
      // partial agg fuses into ONE whole-stage pipeline with zero
      // per-row array/struct allocation (the HOF form built 2080
      // structs per row interpreted — measured 3.4 s vs 1.x s)
      e.select(col("embedding"),
          explode(expr(s"sequence(0, ${EmbDim - 1})")).as("i"))
        .select(col("i"),
          explode(expr(s"sequence(i, ${EmbDim - 1})")).as("j"),
          col("embedding"))
        .select(col("i"), col("j"), expr(
          """CAST(floor(CAST(embedding[i] AS DOUBLE)
            |  * CAST(embedding[j] AS DOUBLE) * 1e8 + 0.5)
            |  AS BIGINT)""".stripMargin).as("p"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("n"),
          sum("p").cast("double").as("sxy"))
        .join(broadcast(dims.select(col("pos").as("i"),
          col("sv").as("sx"))), "i")
        .join(broadcast(dims.select(col("pos").as("j"),
          col("sv").as("sy"))), "j")
        .select(col("i"), col("j"), col("n"),
          (col("sxy") / col("n") / lit(1e8)).as("e_xy"),
          (col("sxy") / col("n") / lit(1e8)
            - (col("sx") / col("n") / lit(1e8))
              * (col("sy") / col("n") / lit(1e8)))
            .as("cov"))
        .orderBy(asc_nulls_last("i"), asc_nulls_last("j"))
    }),

    // Embedding outlier scan — the corpus-QA "which vectors are broken"
    // report (a mis-encoded batch, a zeroed row, a different model's
    // output): exact squared distance to the GLOBAL centroid, top-20.
    // ||x − c||² = x·x − 2·x·c + c·c with every dot an exact-decimal
    // fold (x·x via the codegen'd decimal_dot, x·c via decimal_wdot
    // against the 1-row broadcast centroid, c·c folded once over the
    // centroid itself); the final combine is three IEEE ops of
    // identically-derived doubles — bit-portable (the q_anomaly_mad
    // argument). Scale: the centroid is one slim (pos) shuffle with
    // partial aggregation; the scan is a narrow map + TakeOrdered(20).
    "q_embed_outlier" -> ((s, d) => {
      graft.functions.GraftFunctions.ensureRegistered(s)
      val e = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      val cent = broadcast(e
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("pos")
        .agg(graft.Det.davg(col("x").cast("double"), 7).as("mean"))
        .agg(sort_array(collect_list(struct(col("pos"), col("mean"))))
          .as("pm"))
        .select(expr("transform(pm, p -> p.mean)").as("cent"),
          expr("CAST(aggregate(transform(pm, p -> " +
            "CAST(p.mean * p.mean AS DECIMAL(20,8))), " +
            "CAST(0 AS DECIMAL(30,8)), " +
            "(acc, t) -> CAST(acc + t AS DECIMAL(30,8))) AS DOUBLE)")
            .as("c2"),
          lit(1).as("_one")))
      e.withColumn("_one", lit(1)).join(cent, "_one")
        .select(col("vec_id"),
          (expr("decimal_dot(embedding, embedding)")
            - lit(2.0) * expr("decimal_wdot(embedding, cent)")
            + col("c2")).as("dist2"))
        .orderBy(desc_nulls_last("dist2"), asc_nulls_last("vec_id"))
        .limit(20)
    }),

    // Int8 scalar quantization (the embedding-store compression step):
    // per-vector max-abs scale, symmetric round-half-up to [-127, 127],
    // plus the exact integer reconstruction-error sum. Every element is
    // routed through the proven exact-integer encoding (DOUBLE →
    // DECIMAL(18,7) → scaled BIGINT, as in Det.arrCsv), so scale, codes
    // and error are integer arithmetic finished by ONE IEEE-exact double
    // division — deterministic on both engines. Pure narrow map: the
    // 100 TB shape is one pass, no shuffle.
    "q_embed_quantize" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("ints", expr(
          "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
            "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
        .withColumn("mx", expr("array_max(transform(ints, v -> abs(v)))"))
        // `mx IS NULL` also covers the EMPTY embedding (array_max([]) is
        // NULL): without it Spark would emit ''/0 where DuckDB's
        // list_aggr([])/list_sum([]) give NULL
        .withColumn("q", expr(
          "CASE WHEN mx IS NULL OR mx = 0 THEN NULL ELSE " +
            "transform(ints, v -> " +
            "CAST(floor(CAST(v * 127 AS DOUBLE) / CAST(mx AS DOUBLE) " +
            "+ 0.5D) AS BIGINT)) END"))
        .withColumn("err", expr(
          "CASE WHEN mx IS NULL OR mx = 0 THEN NULL ELSE " +
            "aggregate(zip_with(ints, q, (v, w) -> abs(v * 127 - w * mx)), " +
            "CAST(0 AS BIGINT), (a, x) -> a + x) END"))
        .select(col("vec_id"), col("mx"),
          // null guard: concat_ws IGNORES a null array (→ ''), while the
          // DuckDB mirror's list_aggr propagates NULL — latent mismatch
          // on a null embedding (fixtures are dense; same rule as
          // Det.arrCsv)
          expr("CASE WHEN q IS NULL THEN NULL ELSE " +
            "concat_ws(',', transform(q, x -> CAST(x AS STRING))) END")
            .as("q_csv"),
          col("err"))
        .orderBy(asc_nulls_last("vec_id"))),

    // One k-means (Lloyd) iteration over the IVF centroids: assign every
    // vector to its max-cosine centroid (same broadcast-k + window-top-1
    // shape as q_ann_ivf), then recompute per-(cluster, dim) means with
    // the exact-decimal average so the update is partition-order-
    // invariant. 8 clusters × 64 dims = 512 rows out. Scale: assignment
    // is a narrow broadcast pass; the update is ONE shuffle of slim
    // (cluster, dim, x) rows with map-side partial aggregation — the
    // canonical distributed k-means step.
    "q_kmeans_iter" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      centroidAssign(s, e, e).join(e, "vec_id")
        .select(col("cluster"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(count(lit(1)).as("n_vecs"),
          graft.Det.davg(col("x").cast("double"), 7).as("mean"))
        .select(col("cluster"), col("pos").cast("long").as("pos"),
          col("n_vecs"), col("mean"))
        .orderBy(asc_nulls_last("cluster"), asc_nulls_last("pos"))
    }),

    // Two unrolled Lloyd iterations with an exact convergence readout —
    // the "is clustering converging" diagnostic a training pipeline
    // reads before trusting an IVF index: per iteration the total
    // inertia (Σ min squared L2) and, for iteration 2, how many vectors
    // changed cluster. Runs ENTIRELY on the scaled-BIGINT grid — the
    // seed centroids are the integer-grid first-8 vectors, assignment
    // is exact-integer argmin L2 (cid tie-break), the iteration-2
    // centroids re-enter the grid via the proven floor(sum/n + 0.5),
    // so both inertia values and the moved count are engine-identical
    // (inertia sums route through DECIMAL(38,0): ~4e14 per vector
    // would overrun BIGINT near 20k vectors). Scale: per iteration one
    // broadcast-8 assignment pass + one slim (cluster, dim) shuffle
    // with map-side combine — the canonical distributed k-means loop,
    // with NO growing lineage (two fixed iterations).
    "q_kmeans_converge" -> ((s, d) => {
      val ints = t(s, d, "embeddings")
        .filter(col("embedding").isNotNull)
        .withColumn("iv", expr(
          "transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE) " +
            "AS DECIMAL(18,7)) * 10000000 AS BIGINT))"))
        .select("vec_id", "iv")
        .persistScoped()
      def assign(cents: DataFrame): DataFrame = {
        val wA = Window.partitionBy("vec_id")
          .orderBy(asc_nulls_last("dist"), asc_nulls_last("cid"))
        ints.withColumn("_one", lit(1)).join(cents, "_one")
          .withColumn("dist", expr(
            "aggregate(zip_with(iv, civ, (x, y) -> (x - y) * (x - y)), " +
              "CAST(0 AS BIGINT), (a, v) -> a + v)"))
          .withColumn("_rn", row_number().over(wA))
          .filter(col("_rn") === 1)
          .select(col("vec_id"), col("cid").as("cluster"), col("dist"))
      }
      val c1 = broadcast(ints.filter(col("vec_id") < IvfCentroids)
        .select(col("vec_id").cast("long").as("cid"), col("iv").as("civ"),
          lit(1).as("_one")))
      val a1 = assign(c1).persistScoped()
      val c2 = broadcast(a1.join(ints, "vec_id")
        .select(col("cluster"), posexplode(col("iv")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(expr("CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5D) " +
          "AS BIGINT)").as("mv"))
        .groupBy("cluster")
        .agg(expr("transform(sort_array(collect_list(struct(pos, mv))), " +
          "s -> s.mv)").as("civ"))
        .select(col("cluster").as("cid"), col("civ"), lit(1).as("_one")))
      val a2 = assign(c2)
      val moved = a1.select(col("vec_id"), col("cluster").as("ca"))
        .join(a2.select(col("vec_id"), col("cluster").as("cb")), "vec_id")
        .agg(sum(when(col("ca") =!= col("cb"), 1L).otherwise(0L))
          .as("n_moved"))
        .withColumn("_one", lit(1))
      // inertia exceeds 2^53 — the one magnitude where a DECIMAL that
      // transits any float64 step double-rounds per-engine, so it ships
      // as the §7.4 VARCHAR routing (digit string, exact on both sides).
      val r1 = a1
        .agg(count(lit(1)).as("n_vecs"),
          expr("CAST(SUM(CAST(dist AS DECIMAL(38,0))) AS STRING)")
            .as("inertia"))
        .select(lit(1L).as("iter"), col("n_vecs"), col("inertia"),
          lit(null).cast("long").as("n_moved"))
      val r2 = a2
        .agg(count(lit(1)).as("n_vecs"),
          expr("CAST(SUM(CAST(dist AS DECIMAL(38,0))) AS STRING)")
            .as("inertia"))
        .withColumn("_one", lit(1))
        .join(broadcast(moved), "_one")
        .select(lit(2L).as("iter"), col("n_vecs"), col("inertia"),
          col("n_moved"))
      r1.unionByName(r2).orderBy(asc_nulls_last("iter"))
    }),

    // Product quantization (the IVF-PQ compression half): each vector
    // splits into PqM contiguous sub-vectors; each sub-vector snaps to
    // its nearest codebook slice (min exact L2, codebook = slices of the
    // first PqCodebook vectors), emitting the PQ code word plus the total
    // quantization error. All arithmetic is exact integers: elements
    // route through the proven DOUBLE → DECIMAL(18,7) → scaled-BIGINT
    // encoding (Det.arrCsv), so squared distances, argmins and the error
    // sum are integer-identical on every engine (scaled diffs ≤ 2·10⁷,
    // so a sub-space distance ≤ 8·4·10¹⁴ — no BIGINT overflow). Scale:
    // the codebook is ONE broadcast row (constant-key equi-join, hash
    // join — never a nested loop) and everything else is an in-row fold:
    // PQ encoding of 100 TB is embarrassingly parallel, zero shuffles.
    "q_ann_pq" -> ((s, d) =>
      pqEncoded(s, d)
        .select(col("vec_id"),
          expr("concat_ws(',', transform(best, b -> CAST(b.cid AS STRING)))")
            .as("code_csv"),
          expr("aggregate(transform(best, b -> b.dist), " +
            "CAST(0 AS BIGINT), (a, v) -> a + v)").as("qerr"))
        .orderBy(asc_nulls_last("vec_id"))),

    // Residual product quantization — the encoding the production
    // IVF-PQ layout actually stores (Jégou et al., PAMI 2011 §III):
    // each vector quantizes its RESIDUAL v − mean(cluster(v)), whose
    // spread around zero is far tighter than the raw vectors', so the
    // same 4-entry codebook spends its capacity on fine structure
    // instead of coarse position. The reference MUST be the cluster
    // MEAN (one Lloyd update — the q_kmeans_iter frame): subtracting
    // the raw unit-norm seed vector was MEASURED to inflate the error
    // 61e15 → 81e15 on the fixtures (|v − c| > |v| when v·c is small),
    // while the mean reference cuts it to 53e15 with 490/500 vectors
    // improving — VectorTrainSpec pins both directions of that fact.
    // Everything stays on the scaled-BIGINT grid: the mean re-enters
    // the grid via one deterministic floor(sum/n + 0.5) per element,
    // residuals are integer differences, so distances, argmins and
    // both error sums are engine-identical. Scale: assignment is the
    // broadcast-k pass, the cluster means ONE slim (cluster, dim)
    // shuffle with map-side combine (the distributed k-means update),
    // the residual subtraction an in-row zip_with, the codebook ONE
    // broadcast row, the summary a single partial-agg pass. BIGINT
    // sums keep ≥ 10× headroom (per-vector error ≈ 1e14; 2k vectors
    // ≈ 1e17 of 9.2e18).
    "q_ann_pq_residual" -> ((s, d) => {
      val rerr = residualEncoded(s, d)
        .withColumn("rqerr", expr(
          "aggregate(transform(rbest, b -> b.dist), " +
            "CAST(0 AS BIGINT), (a, v) -> a + v)"))
        .select("vec_id", "rqerr")
      val perr = pqEncoded(s, d)
        .select(col("vec_id"), expr(
          "aggregate(transform(best, b -> b.dist), CAST(0 AS BIGINT), " +
            "(a, v) -> a + v)").as("pqerr"))
      perr.join(rerr, "vec_id")
        .agg(count(lit(1)).as("n_vecs"),
          sum("pqerr").as("plain_qerr"),
          sum("rqerr").as("residual_qerr"),
          sum(when(col("rqerr") < col("pqerr"), 1L).otherwise(0L))
            .as("n_improved"))
    }),

    // Residual IVF-PQ search with per-cluster ADC — the full production
    // read path (FAISS IndexIVFPQ): the coarse stage probes the 2
    // nearest cells, the probe's RESIDUAL against EACH probed cell's
    // mean gets its own 32-entry distance table (nprobe × PqM ×
    // PqCodebook = 64 rows broadcast), and candidates are ranked by the
    // table sum over their residual code words — no candidate's full
    // vector is ever read. All integer arithmetic on the shared
    // residual grid, so the ranking is engine-identical. Scale: codes
    // fan out slim (vec, cluster, m, cid) rows against the tiny table
    // broadcast, then one vec_id-keyed partial-agg shuffle and a
    // bounded top-10 — identical economics to q_ann_ivfpq with the
    // residual encoding's tighter quantization.
    "q_ann_ivfpq_residual" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val (ints, cl, meanc, rcb) = residualParts(s, d)
      val probeClusters = broadcast(
        centroidAssign(s, e, e.filter(col("vec_id") === 0), k = 2)
          .select(col("cluster").as("probe_cluster")))
      val codes = residualEncodedFrom(s, d, ints, cl, meanc, rcb)
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), posexplode(expr(
          "transform(rbest, b -> b.cid)")).as(Seq("m", "cid")))
      val tbl = broadcast(meanc
        .join(probeClusters, col("cluster") === col("probe_cluster"))
        .crossJoin(ints.filter(col("vec_id") === 0)
          .select(col("iv").as("qiv")))
        .withColumn("rv", expr("zip_with(qiv, civ, (x, y) -> x - y)"))
        .withColumn("_one", lit(1)).join(rcb, "_one")
        .withColumn("dists", expr(residualDistsExpr))
        .select(col("cluster").as("t_cluster"),
          posexplode(col("dists")).as(Seq("m", "ds")))
        .select(col("t_cluster"), col("m"), explode(col("ds")).as("e"))
        .select(col("t_cluster"), col("m"), col("e.cid").as("cid"),
          col("e.dist").as("tdist")))
      cl.filter(col("vec_id") =!= 0)
        .join(probeClusters, col("cluster") === col("probe_cluster"))
        .select("vec_id", "cluster")
        .join(codes, "vec_id")
        .join(tbl, col("cluster") === col("t_cluster")
          && codes("m") === tbl("m") && codes("cid") === tbl("cid"))
        .groupBy("vec_id")
        .agg(sum("tdist").as("adc"))
        .orderBy(asc_nulls_last("adc"), asc_nulls_last("vec_id"))
        .limit(10)
    }),

    // IVF-PQ search with asymmetric distance computation — the shared
    // [[ivfpqAdcTopK]] pipeline (see its doc for the full design) at the
    // declared top-10.
    "q_ann_ivfpq" -> ((s, d) => ivfpqAdcTopK(s, d, 10)),

    // Two-stage IVF-PQ search: the ADC ranking above keeps its top
    // PqRefineK candidates, whose FULL vectors are then re-ranked by the
    // exact-decimal cosine — the standard refine tail (Jégou et al.,
    // PAMI 2011 §V) that recovers most ADC quantization loss while
    // reading only k full vectors instead of the corpus. Recall@10
    // provably ⊇ the plain-ADC hits: exact-top-10 members among the
    // candidates out-rank every non-member under the exact cosine, so
    // re-ranking can only keep or add hits (measured 3/10 → strictly
    // better on the fixtures; pinned in VectorOpsSpec). Scale: the
    // refine JOIN touches PqRefineK ids — the candidate list broadcasts
    // against the vector store, one bounded hash join, and the probe is
    // the same 1-row broadcast as every ANN query here.
    "q_ann_ivfpq_refined" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb")))
      broadcast(ivfpqAdcTopK(s, d, PqRefineK))
        .join(e, "vec_id")
        .crossJoin(probe)
        .withColumn("cosine", dotExpr(s, "embedding", "probe_emb"))
        .select("vec_id", "adc", "cosine")
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_id"))
        .limit(10)
    }),

    // Recall@10 of the IVF-PQ ADC ranking against the exact-cosine
    // top-10 — pure quantization + coarse-probe loss (unit-norm vectors
    // rank identically under L2 and cosine in exact space), the number
    // that sizes the PQ codebook and nprobe. The exact side is the
    // q_ann_ivf_curve ground-truth shape (fast prefilter, exact-decimal
    // rerank); the approximate side IS the declared q_ann_ivfpq plan.
    "q_ann_pq_recall" -> ((s, d) => {
      val adc10 = queries("q_ann_ivfpq")(s, d)
        .select(col("vec_id"), lit(1L).as("_a"))
      val e = t(s, d, "embeddings")
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb")))
      val exact10 = e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .withColumn("fd", fastDot(s, "embedding", "probe_emb"))
        .orderBy(desc_nulls_last("fd"), asc_nulls_last("vec_id"))
        .limit(100)
        .withColumn("cosine", dotExpr(s, "embedding", "probe_emb"))
        .orderBy(desc_nulls_last("cosine"), asc_nulls_last("vec_id"))
        .limit(10)
        .select("vec_id")
      exact10.join(adc10, Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_exact"), count(col("_a")).as("n_hit"))
    }),

    // Multimodal join: text metadata ⋈ vector stats on doc_id == vec_id.
    "q_multimodal_join" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val emb = t(s, d, "embeddings")
      docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(docs("doc_id"),
          // JSON-serialized: the driver's checker needs scalar cells (it
          // row-sorts with pandas, which can't hash struct/dict values).
          // lang/source coalesce to a sentinel because Spark's to_json
          // OMITS null struct fields while DuckDB emits "lang":null —
          // the coalesced struct prints identically on both engines.
          to_json(struct(
            coalesce(docs("lang"), lit("<null>")).as("lang"),
            coalesce(docs("source"), lit("<null>")).as("source"))).as("meta"),
          docs("n_chars"),
          size(col("embedding")).cast("long").as("dim"),
          col("label"))
        .orderBy(asc_nulls_last("doc_id"))
    })
  )

  private val annOracle: String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding, unnest(generate_series(1, $EmbDim)) AS i
      |  FROM embeddings
      |), c AS (
      |  SELECT vec_id, p.p AS p,
      |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) *
      |      (strpos('0123456789abcdef', substring(md5(
      |        CAST(p.p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1))
      |        - 1 - 7.5) AS DECIMAL(20,8))) AS DOUBLE) AS proj
      |  FROM e, (SELECT unnest(range(4)) AS p) p
      |  GROUP BY vec_id, p.p
      |)
      |SELECT vec_id,
      |  CAST(SUM(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS bucket
      |FROM c GROUP BY vec_id ORDER BY vec_id ASC NULLS LAST""".stripMargin

  /** Shared IVF-PQ oracle CTE block (q_ann_ivfpq, q_ann_pq_recall): the
    * PQ per-(vec, sub-space, entry) distance CTE `dd` plus its argmin
    * (`best`), the probe's ADC table (`tbl` = dd's vec_id = 0 slice),
    * and the q_ann_ivf_nprobe exact-decimal cluster CTEs. */
  private def ivfpqCtes: String =
    s"""WITH iv AS (
       |  SELECT vec_id, list_transform(embedding, x ->
       |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
       |      AS BIGINT)) AS iv
       |  FROM embeddings WHERE embedding IS NOT NULL
       |), e AS (
       |  SELECT vec_id, iv, unnest(generate_series(1, $EmbDim)) AS i
       |  FROM iv
       |), dd AS (
       |  SELECT v.vec_id, (i - 1) // $PqSubDim AS m, c.vec_id AS cid,
       |    CAST(SUM((v.iv[i] - c.iv[i]) * (v.iv[i] - c.iv[i]))
       |      AS BIGINT) AS dist
       |  FROM e v, (SELECT vec_id, iv FROM iv WHERE vec_id < $PqCodebook) c
       |  GROUP BY v.vec_id, (i - 1) // $PqSubDim, c.vec_id
       |), best AS (
       |  SELECT vec_id, m, cid FROM dd
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist ASC, cid ASC) = 1
       |), tbl AS (
       |  SELECT m, cid, dist FROM dd WHERE vec_id = 0
       |), cents AS (
       |  SELECT vec_id AS ccid, embedding AS cemb
       |  FROM embeddings WHERE vec_id < $IvfCentroids
       |), a AS (
       |  SELECT e2.vec_id, c.ccid,
       |    ${sqlDot("e2.embedding", "c.cemb")} AS cdot
       |  FROM embeddings e2, cents c
       |), cl AS (
       |  SELECT vec_id, ccid AS cluster FROM a
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cdot DESC, ccid ASC) = 1
       |), pc AS (
       |  SELECT ccid AS probe_cluster FROM a WHERE vec_id = 0
       |  QUALIFY row_number() OVER (ORDER BY cdot DESC, ccid ASC) <= 2
       |)""".stripMargin

  /** Shared residual-quantization oracle CTE chain (q_ann_pq_residual,
    * q_ann_ivfpq_residual): scaled-int encodings (iv/e), plain-PQ
    * distances with dist kept through the argmin (dd/pbest/perr), the
    * exact-decimal cluster assignment (cents/aa/cl), per-cluster MEAN
    * encodings (mc), residual elements (rv), the residual codebook
    * (rcb) and its per-vector distances/argmin/error (rd/rbest/rerr —
    * rbest keeps cid for the ADC code join). */
  private def residualOracleCtes: String =
    s"""WITH iv AS (
       |  SELECT vec_id, list_transform(embedding, x ->
       |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
       |      AS BIGINT)) AS iv
       |  FROM embeddings WHERE embedding IS NOT NULL
       |), e AS (
       |  SELECT vec_id, iv, unnest(generate_series(1, $EmbDim)) AS i
       |  FROM iv
       |), dd AS (
       |  SELECT v.vec_id, (i - 1) // $PqSubDim AS m, c.vec_id AS cid,
       |    CAST(SUM((v.iv[i] - c.iv[i]) * (v.iv[i] - c.iv[i]))
       |      AS BIGINT) AS dist
       |  FROM e v, (SELECT vec_id, iv FROM iv WHERE vec_id < $PqCodebook) c
       |  GROUP BY v.vec_id, (i - 1) // $PqSubDim, c.vec_id
       |), pbest AS (
       |  SELECT vec_id, m, dist FROM dd
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist ASC, cid ASC) = 1
       |), perr AS (
       |  SELECT vec_id, CAST(SUM(dist) AS BIGINT) AS pqerr
       |  FROM pbest GROUP BY vec_id
       |), cents AS (
       |  SELECT vec_id AS ccid, embedding AS cemb
       |  FROM embeddings WHERE vec_id < $IvfCentroids
       |), aa AS (
       |  SELECT e2.vec_id, c.ccid,
       |    ${sqlDot("e2.embedding", "c.cemb")} AS cdot
       |  FROM embeddings e2, cents c
       |), cl AS (
       |  SELECT vec_id, ccid AS cluster FROM aa
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cdot DESC, ccid ASC) = 1
       |), mc AS (
       |  SELECT cl.cluster, t.i,
       |    CAST(floor(CAST(SUM(t.iv[t.i]) AS DOUBLE) / COUNT(*) + 0.5)
       |      AS BIGINT) AS mv
       |  FROM e t JOIN cl ON t.vec_id = cl.vec_id
       |  GROUP BY cl.cluster, t.i
       |), rv AS (
       |  SELECT t.vec_id, t.i, t.iv[t.i] - mc.mv AS r
       |  FROM e t
       |  JOIN cl ON t.vec_id = cl.vec_id
       |  JOIN mc ON cl.cluster = mc.cluster AND t.i = mc.i
       |), rcb AS (
       |  SELECT vec_id AS cid, i, r FROM rv WHERE vec_id < $PqCodebook
       |), rd AS (
       |  SELECT v.vec_id, (v.i - 1) // $PqSubDim AS m, c.cid,
       |    CAST(SUM((v.r - c.r) * (v.r - c.r)) AS BIGINT) AS dist
       |  FROM rv v JOIN rcb c ON v.i = c.i
       |  GROUP BY v.vec_id, (v.i - 1) // $PqSubDim, c.cid
       |), rbest AS (
       |  SELECT vec_id, m, cid, dist FROM rd
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist ASC, cid ASC) = 1
       |), rerr AS (
       |  SELECT vec_id, CAST(SUM(dist) AS BIGINT) AS rqerr
       |  FROM rbest GROUP BY vec_id
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_embed_norm" ->
      s"""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |  sqrt(${sqlDot("embedding", "embedding")}) AS norm,
        |  CAST(embedding[1] AS DOUBLE)
        |    / sqrt(${sqlDot("embedding", "embedding")}) AS c0_unit
        |FROM embeddings ORDER BY vec_id ASC NULLS LAST""".stripMargin,

    "q_simsearch_topk" ->
      s"""SELECT e.vec_id, ${sqlDot("e.embedding", "p.embedding")} AS cosine
         |FROM embeddings e,
         |  (SELECT embedding FROM embeddings WHERE vec_id = 0) p
         |WHERE e.vec_id <> 0
         |ORDER BY cosine DESC NULLS LAST, vec_id ASC NULLS LAST
         |LIMIT 10""".stripMargin,

    "q_dedup_embed" ->
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${sqlDot("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 1000 AND b.vec_id < 1000
         |ORDER BY cosine DESC NULLS LAST, vec_a ASC NULLS LAST,
         |  vec_b ASC NULLS LAST
         |LIMIT 20""".stripMargin,

    "q_ann_lsh" -> annOracle,

    // Same two 32-bit sign-packed words (DuckDB lists are 1-based, so
    // dims 1..32 / 33..64 shift by i−1 / i−33), xor() + bit_count for
    // the distance, the shared exact-decimal dot for the audit column.
    "q_ann_hamming" -> {
      def word(lo: Int): String =
        s"CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}), " +
          s"i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) " +
          s"<< CAST(i - $lo AS INT)) ELSE CAST(0 AS BIGINT) END)) " +
          "AS BIGINT)"
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    ${word(1)} AS w0,
         |    ${word(33)} AS w1
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), p AS (
         |  SELECT w0 AS pw0, w1 AS pw1, embedding AS pe
         |  FROM e WHERE vec_id = 0
         |), h AS (
         |  SELECT e.vec_id, e.embedding, p.pe,
         |    CAST(bit_count(xor(e.w0, p.pw0))
         |      + bit_count(xor(e.w1, p.pw1)) AS BIGINT) AS hamming
         |  FROM e, p WHERE e.vec_id <> 0
         |), topk AS (
         |  SELECT * FROM h
         |  ORDER BY hamming ASC NULLS LAST, vec_id ASC NULLS LAST
         |  LIMIT 10
         |)
         |SELECT vec_id, hamming, ${sqlDot("embedding", "pe")} AS cosine
         |FROM topk
         |ORDER BY hamming ASC NULLS LAST, vec_id ASC NULLS LAST""".stripMargin
    },

    // Same sign-bit packing; the probe panel is vec_id < 32, per-probe
    // top-10 by exact integer popcount with vec_id tiebreaks.
    "q_ann_hamming_panel" -> {
      def word(lo: Int): String =
        s"CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}), " +
          s"i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) " +
          s"<< CAST(i - $lo AS INT)) ELSE CAST(0 AS BIGINT) END)) " +
          "AS BIGINT)"
      s"""WITH e AS (
         |  SELECT vec_id,
         |    ${word(1)} AS w0,
         |    ${word(33)} AS w1
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), p AS (
         |  SELECT vec_id AS p_id, w0 AS pw0, w1 AS pw1
         |  FROM e WHERE vec_id < 32
         |), h AS (
         |  SELECT p.p_id, e.vec_id,
         |    CAST(bit_count(xor(e.w0, p.pw0))
         |      + bit_count(xor(e.w1, p.pw1)) AS BIGINT) AS hamming
         |  FROM e, p WHERE e.vec_id <> p.p_id
         |), r AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY p_id
         |    ORDER BY hamming ASC NULLS LAST, vec_id ASC NULLS LAST)
         |    AS BIGINT) AS rnk
         |  FROM h
         |)
         |SELECT p_id, vec_id, hamming, rnk FROM r WHERE rnk <= 10
         |ORDER BY p_id ASC NULLS LAST, rnk ASC NULLS LAST""".stripMargin
    },

    // Same packing; bucket = w0 % 256, the 37 probe buckets via xor
    // UNNEST over the shared mask constants, both top-10s as
    // ORDER/LIMIT CTEs, overlap join count.
    "q_ann_hamming_multiprobe" -> {
      def word(lo: Int): String =
        s"CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}), " +
          s"i -> CASE WHEN embedding[i] > 0 THEN (CAST(1 AS BIGINT) " +
          s"<< CAST(i - $lo AS INT)) ELSE CAST(0 AS BIGINT) END)) " +
          "AS BIGINT)"
      s"""WITH e AS (
         |  SELECT vec_id,
         |    ${word(1)} AS w0,
         |    ${word(33)} AS w1
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), eb AS (
         |  SELECT vec_id, w0, w1, w0 % 256 AS bucket FROM e
         |), p AS (
         |  SELECT w0 AS pw0, w1 AS pw1, bucket AS pb
         |  FROM eb WHERE vec_id = 0
         |), probes AS (
         |  SELECT p.pw0, p.pw1, UNNEST([${ProbeMasks
              .map(m => s"xor(p.pb, $m)").mkString(", ")}]) AS bucket
         |  FROM p
         |), cand AS (
         |  SELECT eb.vec_id,
         |    CAST(bit_count(xor(eb.w0, pr.pw0))
         |      + bit_count(xor(eb.w1, pr.pw1)) AS BIGINT) AS hamming
         |  FROM eb JOIN probes pr ON eb.bucket = pr.bucket
         |  WHERE eb.vec_id <> 0
         |), approx AS (
         |  SELECT vec_id FROM cand
         |  ORDER BY hamming ASC NULLS LAST, vec_id ASC NULLS LAST
         |  LIMIT 10
         |), exact AS (
         |  SELECT eb.vec_id FROM eb, p WHERE eb.vec_id <> 0
         |  ORDER BY CAST(bit_count(xor(eb.w0, p.pw0))
         |    + bit_count(xor(eb.w1, p.pw1)) AS BIGINT) ASC NULLS LAST,
         |    eb.vec_id ASC NULLS LAST
         |  LIMIT 10
         |), nc AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand
         |), h AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS hit10
         |  FROM approx a JOIN exact x ON a.vec_id = x.vec_id
         |)
         |SELECT CAST(${ProbeMasks.size} AS BIGINT) AS n_probed_buckets,
         |  nc.n_candidates, h.hit10,
         |  CAST(h.hit10 AS DOUBLE) / CAST(10 AS DOUBLE) AS recall10
         |FROM nc, h""".stripMargin
    },

    // Mirrors the IVF phases with exact-decimal dots throughout:
    // assignment argmax via window top-1 (dot DESC, cid ASC tiebreak),
    // probe-cluster filter, exact top-10.
    "q_ann_ivf" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < $IvfCentroids
         |), a AS (
         |  SELECT e.vec_id, c.cid,
         |    ${sqlDot("e.embedding", "c.cemb")} AS cdot
         |  FROM embeddings e, cents c
         |), cl AS (
         |  SELECT vec_id, cid AS cluster FROM a
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cdot DESC, cid ASC) = 1
         |)
         |SELECT e.vec_id, ${sqlDot("e.embedding", "p.embedding")} AS cosine
         |FROM embeddings e
         |JOIN cl ON e.vec_id = cl.vec_id
         |JOIN (SELECT cluster FROM cl WHERE vec_id = 0) pc
         |  ON cl.cluster = pc.cluster,
         |  (SELECT embedding FROM embeddings WHERE vec_id = 0) p
         |WHERE e.vec_id <> 0
         |ORDER BY cosine DESC NULLS LAST, e.vec_id ASC NULLS LAST
         |LIMIT 10""".stripMargin,

    // Same bucket math as annOracle (at NeighborPlanes planes), then the
    // within-bucket pair join and an exact-decimal top-3 per vector (the
    // oracle ranks by the exact cosine directly — the Spark side's
    // fast-prefilter margin guarantees the same selection).
    "q_ann_neighbors" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    unnest(generate_series(1, $EmbDim)) AS i
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) *
         |      (strpos('0123456789abcdef', substring(md5(
         |        CAST(p.p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1))
         |        - 1 - 7.5) AS DECIMAL(20,8))) AS DOUBLE) AS proj
         |  FROM e, (SELECT unnest(range($NeighborPlanes)) AS p) p
         |  GROUP BY vec_id, p.p
         |), bk AS (
         |  SELECT vec_id,
         |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS bucket
         |  FROM c GROUP BY vec_id
         |), j AS (
         |  SELECT a.vec_id AS vec_id, b.vec_id AS nb_id,
         |    ${sqlDot("ea.embedding", "eb.embedding")} AS cosine
         |  FROM bk a JOIN bk b
         |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |), r AS (
         |  SELECT vec_id, nb_id, cosine, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY cosine DESC, nb_id ASC) AS rn
         |  FROM j
         |)
         |SELECT vec_id, nb_id, cosine FROM r WHERE rn <= 3
         |ORDER BY vec_id ASC NULLS LAST, cosine DESC NULLS LAST,
         |  nb_id ASC NULLS LAST""".stripMargin,

    // Exact-decimal dots on ALL probe×corpus pairs (no prescreen — the
    // oracle is the ground truth the two-phase Spark shape must equal),
    // then the same vote count, top-1 window, and per-class rollup.
    "q_embed_knn_classify" ->
      s"""WITH p AS (
         |  SELECT vec_id AS p_id, embedding AS pe, label AS true_label
         |  FROM embeddings WHERE vec_id < 32
         |), top5 AS (
         |  SELECT p.p_id, e.label AS nb_label
         |  FROM embeddings e JOIN p ON e.vec_id <> p.p_id
         |  QUALIFY row_number() OVER (PARTITION BY p.p_id
         |    ORDER BY ${sqlDot("e.embedding", "p.pe")} DESC,
         |      e.vec_id ASC) <= 5
         |), votes AS (
         |  SELECT p_id, nb_label, COUNT(*) AS n_votes
         |  FROM top5 GROUP BY p_id, nb_label
         |), pred AS (
         |  SELECT p_id, nb_label AS pred_label FROM votes
         |  QUALIFY row_number() OVER (PARTITION BY p_id
         |    ORDER BY n_votes DESC, nb_label ASC) = 1
         |)
         |SELECT p.true_label, COUNT(*) AS n_probes,
         |  CAST(SUM(CASE WHEN pr.pred_label = p.true_label
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM pred pr JOIN p ON pr.p_id = p.p_id
         |GROUP BY p.true_label
         |ORDER BY true_label ASC NULLS LAST""".stripMargin,

    // Same fixed panel self-join; identical exact-decimal dot text and
    // the floor(10·cos) bin of the identical double.
    "q_embed_pairwise_hist" ->
      s"""WITH p AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 32
         |), pr AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |    ${sqlDot("a.embedding", "b.embedding")} AS cosine
         |  FROM p a JOIN p b ON a.vec_id < b.vec_id
         |)
         |SELECT CAST(floor(cosine * 10) AS BIGINT) AS bin,
         |  COUNT(*) AS n_pairs,
         |  ${graft.Det.sqlDsum("cosine", 7)} AS sum_cos
         |FROM pr GROUP BY CAST(floor(cosine * 10) AS BIGINT)
         |ORDER BY bin ASC NULLS LAST""".stripMargin,

    // The q_ann_neighbors bucket CTE with the occupancy double-group.
    "q_ann_bucket_stats" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    unnest(generate_series(1, $EmbDim)) AS i
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) *
         |      (strpos('0123456789abcdef', substring(md5(
         |        CAST(p.p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1))
         |        - 1 - 7.5) AS DECIMAL(20,8))) AS DOUBLE) AS proj
         |  FROM e, (SELECT unnest(range($NeighborPlanes)) AS p) p
         |  GROUP BY vec_id, p.p
         |), bk AS (
         |  SELECT vec_id,
         |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS bucket
         |  FROM c GROUP BY vec_id
         |), occ AS (
         |  SELECT bucket, COUNT(*) AS n_vecs FROM bk GROUP BY bucket
         |)
         |SELECT n_vecs, COUNT(*) AS n_buckets
         |FROM occ GROUP BY n_vecs
         |ORDER BY n_vecs ASC NULLS LAST""".stripMargin,

    // q_ann_ivf with a 2-cluster probe set: same exact-decimal assignment
    // argmax, but pc keeps the probe's TWO nearest centroids (rn <= 2).
    // The Spark side pre-ranks with the fast double dot — identical
    // selection, see the q_ann_ivf note.
    "q_ann_ivf_nprobe" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < $IvfCentroids
         |), a AS (
         |  SELECT e.vec_id, c.cid,
         |    ${sqlDot("e.embedding", "c.cemb")} AS cdot
         |  FROM embeddings e, cents c
         |), cl AS (
         |  SELECT vec_id, cid AS cluster FROM a
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cdot DESC, cid ASC) = 1
         |), pc AS (
         |  SELECT cid AS probe_cluster FROM a WHERE vec_id = 0
         |  QUALIFY row_number() OVER (ORDER BY cdot DESC, cid ASC) <= 2
         |)
         |SELECT e.vec_id, ${sqlDot("e.embedding", "p.embedding")} AS cosine
         |FROM embeddings e
         |JOIN cl ON e.vec_id = cl.vec_id
         |JOIN pc ON cl.cluster = pc.probe_cluster,
         |  (SELECT embedding FROM embeddings WHERE vec_id = 0) p
         |WHERE e.vec_id <> 0
         |ORDER BY cosine DESC NULLS LAST, e.vec_id ASC NULLS LAST
         |LIMIT 10""".stripMargin,

    // The q_kmeans_iter mean CTEs feed a trained-assignment dot (the
    // same scale-8 decimal fold the Spark side runs — bit-identical by
    // construction, scaled sums ≪ 2⁵³ so the direct DOUBLE cast is
    // exact), then the q_ann_ivf search tail.
    "q_ann_ivf_trained" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < $IvfCentroids
         |), a AS (
         |  SELECT e.vec_id, c.cid,
         |    ${sqlDot("e.embedding", "c.cemb")} AS cdot
         |  FROM embeddings e, cents c
         |), cl AS (
         |  SELECT vec_id, cid AS cluster FROM a
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cdot DESC, cid ASC) = 1
         |), x AS (
         |  SELECT cl.cluster, e.i - 1 AS pos,
         |    CAST(e.embedding[e.i] AS DOUBLE) AS x
         |  FROM (SELECT vec_id, embedding,
         |          unnest(generate_series(1, $EmbDim)) AS i
         |        FROM embeddings) e
         |  JOIN cl ON e.vec_id = cl.vec_id
         |), m AS (
         |  SELECT cluster, pos, ${graft.Det.sqlDavg("x", 7)} AS mean
         |  FROM x GROUP BY cluster, pos
         |), ta AS (
         |  SELECT e2.vec_id, m.cluster AS tcid,
         |    CAST(SUM(CAST(CAST(e2.embedding[m.pos + 1] AS DOUBLE)
         |      * m.mean AS DECIMAL(20,8))) AS DOUBLE) AS tdot
         |  FROM embeddings e2, m
         |  GROUP BY e2.vec_id, m.cluster
         |), tcl AS (
         |  SELECT vec_id, tcid AS cluster FROM ta
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY tdot DESC, tcid ASC) = 1
         |), pc AS (
         |  SELECT cluster AS probe_cluster FROM tcl WHERE vec_id = 0
         |)
         |SELECT e3.vec_id, ${sqlDot("e3.embedding", "p.embedding")} AS cosine
         |FROM embeddings e3
         |JOIN tcl ON e3.vec_id = tcl.vec_id
         |JOIN pc ON tcl.cluster = pc.probe_cluster,
         |  (SELECT embedding FROM embeddings WHERE vec_id = 0) p
         |WHERE e3.vec_id <> 0
         |ORDER BY cosine DESC NULLS LAST, e3.vec_id ASC NULLS LAST
         |LIMIT 10""".stripMargin,

    // Mirrors the curve phases with exact-decimal dots: assignment
    // argmax, the probe's full centroid ranking, brute-force exact
    // top-10, then the three nprobe points from one grouped aggregate.
    "q_ann_ivf_curve" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < $IvfCentroids
         |), a AS (
         |  SELECT e.vec_id, c.cid,
         |    ${sqlDot("e.embedding", "c.cemb")} AS cdot
         |  FROM embeddings e, cents c
         |), cl AS (
         |  SELECT vec_id, cid AS cluster FROM a
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cdot DESC, cid ASC) = 1
         |), pr AS (
         |  SELECT cid AS pcluster, row_number() OVER (
         |    ORDER BY cdot DESC, cid ASC) AS crank
         |  FROM a WHERE vec_id = 0
         |), ex AS (
         |  SELECT e.vec_id,
         |    ${sqlDot("e.embedding", "p.embedding")} AS cosine
         |  FROM embeddings e,
         |    (SELECT embedding FROM embeddings WHERE vec_id = 0) p
         |  WHERE e.vec_id <> 0
         |  ORDER BY cosine DESC NULLS LAST, e.vec_id ASC NULLS LAST
         |  LIMIT 10
         |), cand AS (
         |  SELECT cl.vec_id, pr.crank,
         |    CASE WHEN cl.vec_id IN (SELECT vec_id FROM ex)
         |      THEN 1 ELSE 0 END AS is_hit
         |  FROM cl JOIN pr ON cl.cluster = pr.pcluster
         |  WHERE cl.vec_id <> 0
         |), k AS (SELECT unnest([1, 2, 4]) AS nprobe)
         |SELECT CAST(k.nprobe AS BIGINT) AS nprobe,
         |  CAST(SUM(CASE WHEN cand.crank <= k.nprobe THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_searched,
         |  CAST(SUM(CASE WHEN cand.crank <= k.nprobe THEN cand.is_hit
         |    ELSE 0 END) AS BIGINT) AS n_hit
         |FROM cand, k GROUP BY k.nprobe
         |ORDER BY nprobe ASC NULLS LAST""".stripMargin,

    // Same bucket math, top-10 positions each side, the bit-portable
    // log2 chain per position, grid-quantized terms, ONE division.
    "q_ann_ndcg" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    unnest(generate_series(1, $EmbDim)) AS i
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) *
         |      (strpos('0123456789abcdef', substring(md5(
         |        CAST(p.p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1))
         |        - 1 - 7.5) AS DECIMAL(20,8))) AS DOUBLE) AS proj
         |  FROM e, (SELECT unnest(range($NeighborPlanes)) AS p) p
         |  GROUP BY vec_id, p.p
         |), bk AS (
         |  SELECT vec_id,
         |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS bucket
         |  FROM c GROUP BY vec_id
         |), appr AS (
         |  SELECT a.vec_id AS vec_id, b.vec_id AS nb_id,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${sqlDot("ea.embedding", "eb.embedding")} DESC,
         |        b.vec_id ASC) AS posn
         |  FROM bk a JOIN bk b
         |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE a.vec_id < 16
         |  QUALIFY row_number() OVER (PARTITION BY a.vec_id
         |    ORDER BY ${sqlDot("ea.embedding", "eb.embedding")} DESC,
         |      b.vec_id ASC) <= 10
         |), ex AS (
         |  SELECT p.vec_id, x.vec_id AS nb_id,
         |    11 - row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY ${sqlDot("x.embedding", "p.embedding")} DESC,
         |        x.vec_id ASC) AS gain
         |  FROM embeddings p JOIN embeddings x ON x.vec_id <> p.vec_id
         |  WHERE p.vec_id < 16
         |  QUALIFY row_number() OVER (PARTITION BY p.vec_id
         |    ORDER BY ${sqlDot("x.embedding", "p.embedding")} DESC,
         |      x.vec_id ASC) <= 10
         |), grid AS (
         |  SELECT p.vec_id, g.posn
         |  FROM (SELECT DISTINCT vec_id FROM embeddings
         |    WHERE vec_id < 16) p,
         |    (SELECT unnest(generate_series(1, 10)) AS posn) g
         |), tm AS (
         |  SELECT gr.vec_id, gr.posn,
         |    CAST(coalesce(ex.gain, 0) AS BIGINT) AS g,
         |    CAST(gr.posn + 1 AS BIGINT) AS posn1,
         |    ${graft.Det.sqlPlog2Cols("posn1", "d")}
         |  FROM grid gr
         |  LEFT JOIN appr ON appr.vec_id = gr.vec_id
         |    AND appr.posn = gr.posn
         |  LEFT JOIN ex ON ex.vec_id = gr.vec_id
         |    AND ex.nb_id = appr.nb_id
         |), qq AS (
         |  SELECT vec_id,
         |    CASE WHEN g > 0 THEN 1 ELSE 0 END AS hit,
         |    CAST(floor(CAST(g AS DOUBLE) / dl2
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q,
         |    CAST(floor(CAST(11 - posn AS DOUBLE) / dl2
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS iq
         |  FROM tm
         |)
         |SELECT vec_id, CAST(SUM(hit) AS BIGINT) AS n_overlap,
         |  CAST(SUM(q) AS BIGINT) AS dcg_q,
         |  CAST(SUM(iq) AS BIGINT) AS idcg_q,
         |  CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(SUM(iq) AS BIGINT) AS DOUBLE) AS ndcg
         |FROM qq GROUP BY vec_id
         |ORDER BY vec_id ASC NULLS LAST""".stripMargin,

    // Same bucket math as the q_ann_neighbors oracle (probe-restricted),
    // exact-decimal ground-truth top-3, LEFT JOIN count = hits.
    "q_ann_recall" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    unnest(generate_series(1, $EmbDim)) AS i
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id, p.p AS p,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) *
         |      (strpos('0123456789abcdef', substring(md5(
         |        CAST(p.p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1))
         |        - 1 - 7.5) AS DECIMAL(20,8))) AS DOUBLE) AS proj
         |  FROM e, (SELECT unnest(range($NeighborPlanes)) AS p) p
         |  GROUP BY vec_id, p.p
         |), bk AS (
         |  SELECT vec_id,
         |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS bucket
         |  FROM c GROUP BY vec_id
         |), appr AS (
         |  SELECT a.vec_id AS vec_id, b.vec_id AS nb_id
         |  FROM bk a JOIN bk b
         |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE a.vec_id < 16
         |  QUALIFY row_number() OVER (PARTITION BY a.vec_id
         |    ORDER BY ${sqlDot("ea.embedding", "eb.embedding")} DESC,
         |      b.vec_id ASC) <= 3
         |), ex AS (
         |  SELECT p.vec_id, x.vec_id AS nb_id
         |  FROM embeddings p JOIN embeddings x ON x.vec_id <> p.vec_id
         |  WHERE p.vec_id < 16
         |  QUALIFY row_number() OVER (PARTITION BY p.vec_id
         |    ORDER BY ${sqlDot("x.embedding", "p.embedding")} DESC,
         |      x.vec_id ASC) <= 3
         |)
         |SELECT ex.vec_id, CAST(COUNT(appr.nb_id) AS BIGINT) AS n_hit,
         |  CAST(3 AS BIGINT) AS n_exact
         |FROM ex LEFT JOIN appr
         |  ON appr.vec_id = ex.vec_id AND appr.nb_id = ex.nb_id
         |GROUP BY ex.vec_id
         |ORDER BY ex.vec_id ASC NULLS LAST""".stripMargin,

    // The q_ann_recall oracle with a table axis: table 0 keeps the
    // legacy "p_i" md5 key, tables >= 1 prefix "t<t>_"; candidates are
    // DISTINCT same-(t, bucket) pairs, exact-decimal rerank to 3.
    "q_ann_recall_multi" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    unnest(generate_series(1, $EmbDim)) AS i
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id, t.t AS t, p.p AS p,
         |    CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) *
         |      (strpos('0123456789abcdef', substring(md5(
         |        CASE WHEN t.t = 0 THEN
         |          CAST(p.p AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)
         |        ELSE 't' || CAST(t.t AS VARCHAR) || '_'
         |          || CAST(p.p AS VARCHAR) || '_'
         |          || CAST(i - 1 AS VARCHAR) END), 1, 1))
         |        - 1 - 7.5) AS DECIMAL(20,8))) AS DOUBLE) AS proj
         |  FROM e, (SELECT unnest(range($NeighborPlanes)) AS p) p,
         |    (SELECT unnest(range($RecallTables)) AS t) t
         |  GROUP BY vec_id, t.t, p.p
         |), bk AS (
         |  SELECT vec_id, t,
         |    CAST(SUM(CASE WHEN proj > 0 THEN CAST(pow(2, p) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS bucket
         |  FROM c GROUP BY vec_id, t
         |), cand AS (
         |  SELECT DISTINCT a.vec_id, b.vec_id AS nb_id
         |  FROM bk a JOIN bk b
         |    ON a.t = b.t AND a.bucket = b.bucket
         |      AND a.vec_id <> b.vec_id
         |  WHERE a.vec_id < 16
         |), appr AS (
         |  SELECT c.vec_id, c.nb_id
         |  FROM cand c
         |  JOIN embeddings ea ON ea.vec_id = c.vec_id
         |  JOIN embeddings eb ON eb.vec_id = c.nb_id
         |  QUALIFY row_number() OVER (PARTITION BY c.vec_id
         |    ORDER BY ${sqlDot("ea.embedding", "eb.embedding")} DESC,
         |      c.nb_id ASC) <= 3
         |), ex AS (
         |  SELECT p.vec_id, x.vec_id AS nb_id
         |  FROM embeddings p JOIN embeddings x ON x.vec_id <> p.vec_id
         |  WHERE p.vec_id < 16
         |  QUALIFY row_number() OVER (PARTITION BY p.vec_id
         |    ORDER BY ${sqlDot("x.embedding", "p.embedding")} DESC,
         |      x.vec_id ASC) <= 3
         |)
         |SELECT ex.vec_id, CAST(COUNT(appr.nb_id) AS BIGINT) AS n_hit,
         |  CAST(3 AS BIGINT) AS n_exact
         |FROM ex LEFT JOIN appr
         |  ON appr.vec_id = ex.vec_id AND appr.nb_id = ex.nb_id
         |GROUP BY ex.vec_id
         |ORDER BY ex.vec_id ASC NULLS LAST""".stripMargin,

    // Both the truncated and the exact rankings are the same exact-
    // decimal dot (list_slice is the prefix; no approximate pre-rank on
    // either engine), so parity needs no tie argument at all.
    "q_ann_dim_truncate" ->
      s"""WITH dms AS (SELECT unnest([16, 32]) AS dims
         |), tr AS (
         |  SELECT d.dims, p.vec_id, x.vec_id AS nb_id
         |  FROM embeddings p
         |  JOIN embeddings x ON x.vec_id <> p.vec_id
         |  CROSS JOIN dms d
         |  WHERE p.vec_id < 16
         |  QUALIFY row_number() OVER (PARTITION BY d.dims, p.vec_id
         |    ORDER BY ${sqlDot("list_slice(x.embedding, 1, d.dims)",
                                "list_slice(p.embedding, 1, d.dims)")} DESC,
         |      x.vec_id ASC) <= 3
         |), ex AS (
         |  SELECT d.dims, p.vec_id, x.vec_id AS nb_id
         |  FROM embeddings p
         |  JOIN embeddings x ON x.vec_id <> p.vec_id
         |  CROSS JOIN dms d
         |  WHERE p.vec_id < 16
         |  QUALIFY row_number() OVER (PARTITION BY d.dims, p.vec_id
         |    ORDER BY ${sqlDot("x.embedding", "p.embedding")} DESC,
         |      x.vec_id ASC) <= 3
         |)
         |SELECT CAST(ex.dims AS BIGINT) AS dims, ex.vec_id,
         |  CAST(COUNT(tr.nb_id) AS BIGINT) AS n_hit,
         |  CAST(3 AS BIGINT) AS n_exact
         |FROM ex LEFT JOIN tr
         |  ON tr.dims = ex.dims AND tr.vec_id = ex.vec_id
         |    AND tr.nb_id = ex.nb_id
         |GROUP BY ex.dims, ex.vec_id
         |ORDER BY dims ASC NULLS LAST, ex.vec_id ASC NULLS LAST""".stripMargin,

    // The residualOracleCtes integer-grid idiom: explode over dims,
    // exact-BIGINT squared distances grouped per (vec, centroid),
    // argmin by (dist, cid), floor(sum/n + 0.5) grid means; inertia
    // through DECIMAL(38,0) then VARCHAR (it is the one >2^53 value in
    // the inventory — the digit string survives any float64 step in a
    // comparison pipeline that the raw decimal would not).
    "q_kmeans_converge" ->
      s"""WITH iv AS (
         |  SELECT vec_id, list_transform(embedding, x ->
         |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
         |      AS BIGINT)) AS iv
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), e AS (
         |  SELECT vec_id, iv, unnest(generate_series(1, $EmbDim)) AS i
         |  FROM iv
         |), c1 AS (
         |  SELECT vec_id AS cid, iv AS civ FROM iv WHERE vec_id < $IvfCentroids
         |), d1 AS (
         |  SELECT v.vec_id, c.cid,
         |    CAST(SUM((v.iv[v.i] - c.civ[v.i]) * (v.iv[v.i] - c.civ[v.i]))
         |      AS BIGINT) AS dist
         |  FROM e v, c1 c GROUP BY v.vec_id, c.cid
         |), a1 AS (
         |  SELECT vec_id, cid AS cluster, dist FROM d1
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, cid ASC) = 1
         |), m2 AS (
         |  SELECT a1.cluster, t.i,
         |    CAST(floor(CAST(SUM(t.iv[t.i]) AS DOUBLE) / COUNT(*) + 0.5)
         |      AS BIGINT) AS mv
         |  FROM e t JOIN a1 ON t.vec_id = a1.vec_id
         |  GROUP BY a1.cluster, t.i
         |), d2 AS (
         |  SELECT v.vec_id, m.cluster AS cid,
         |    CAST(SUM((v.iv[v.i] - m.mv) * (v.iv[v.i] - m.mv)) AS BIGINT)
         |      AS dist
         |  FROM e v JOIN m2 m ON v.i = m.i
         |  GROUP BY v.vec_id, m.cluster
         |), a2 AS (
         |  SELECT vec_id, cid AS cluster, dist FROM d2
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist ASC, cid ASC) = 1
         |), r1 AS (
         |  SELECT CAST(1 AS BIGINT) AS iter,
         |    CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(CAST(SUM(dist) AS DECIMAL(38,0)) AS VARCHAR) AS inertia,
         |    CAST(NULL AS BIGINT) AS n_moved
         |  FROM a1
         |), r2 AS (
         |  SELECT CAST(2 AS BIGINT) AS iter,
         |    CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |    CAST(CAST(SUM(dist) AS DECIMAL(38,0)) AS VARCHAR) AS inertia,
         |    (SELECT CAST(SUM(CASE WHEN x.cluster <> y.cluster
         |        THEN 1 ELSE 0 END) AS BIGINT)
         |     FROM a1 x JOIN a2 y ON x.vec_id = y.vec_id) AS n_moved
         |  FROM a2
         |)
         |SELECT * FROM r1 UNION ALL SELECT * FROM r2
         |ORDER BY iter ASC NULLS LAST""".stripMargin,

    // Mirrors q_embed_rp's md5-parity sign matrix exactly: strpos is
    // 1-based, so (strpos − 1) is the Scala indexOf and even index → +1
    // (the annOracle hyperplane pattern with a ±1 weight). Per-element
    // DECIMAL(20,8) rounding matches the Spark fold's cast.
    "q_embed_rp" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    unnest(generate_series(1, $EmbDim)) AS i
         |  FROM embeddings
         |)
         |SELECT vec_id, CAST(p.p AS BIGINT) AS rp_dim,
         |  CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) *
         |    (CASE WHEN (strpos('0123456789abcdef', substring(md5(
         |      'rp_' || CAST(p.p AS VARCHAR) || '_'
         |      || CAST(i - 1 AS VARCHAR)), 1, 1)) - 1) % 2 = 0
         |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)
         |    AS DECIMAL(20,8))) AS DOUBLE) AS rp
         |FROM e, (SELECT unnest(range(16)) AS p) p
         |GROUP BY vec_id, p.p
         |ORDER BY vec_id ASC NULLS LAST, rp_dim ASC NULLS LAST""".stripMargin,

    // Mirrors the PQ phases on the same scaled-BIGINT encoding: per-dim
    // rows regroup to (vec, sub-space, codebook entry) exact L2 sums,
    // the argmin is the (dist ASC, cid ASC) row_number window, and the
    // code word re-assembles with an ordered string_agg.
    "q_ann_pq" ->
      s"""WITH iv AS (
         |  SELECT vec_id, list_transform(embedding, x ->
         |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
         |      AS BIGINT)) AS iv
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), e AS (
         |  SELECT vec_id, iv, unnest(generate_series(1, $EmbDim)) AS i
         |  FROM iv
         |), d AS (
         |  SELECT v.vec_id, (i - 1) // $PqSubDim AS m, c.vec_id AS cid,
         |    CAST(SUM((v.iv[i] - c.iv[i]) * (v.iv[i] - c.iv[i]))
         |      AS BIGINT) AS dist
         |  FROM e v, (SELECT vec_id, iv FROM iv WHERE vec_id < $PqCodebook) c
         |  GROUP BY v.vec_id, (i - 1) // $PqSubDim, c.vec_id
         |), best AS (
         |  SELECT vec_id, m, cid, dist FROM d
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
         |    ORDER BY dist ASC, cid ASC) = 1
         |)
         |SELECT vec_id,
         |  string_agg(CAST(cid AS VARCHAR), ',' ORDER BY m ASC) AS code_csv,
         |  CAST(SUM(dist) AS BIGINT) AS qerr
         |FROM best GROUP BY vec_id
         |ORDER BY vec_id ASC NULLS LAST""".stripMargin,

    // Shared residual CTE chain (see residualOracleCtes) + the
    // error-comparison summary. The plain-PQ distance CTE keeps its
    // dist through the argmin (the shared ivfpqCtes `best` drops it);
    // the residual path rebuilds the same cluster assignment, subtracts
    // the per-cluster MEAN encodings index-wise, and re-runs the
    // identical integer sub-space argmin over the residual codebook.
    "q_ann_pq_residual" -> (residualOracleCtes +
      """
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(pqerr) AS BIGINT) AS plain_qerr,
        |  CAST(SUM(rqerr) AS BIGINT) AS residual_qerr,
        |  CAST(SUM(CASE WHEN rqerr < pqerr THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_improved
        |FROM perr JOIN rerr ON perr.vec_id = rerr.vec_id""".stripMargin),

    // The residual chain + probe-side CTEs: per probed cluster the
    // probe's RESIDUAL distance table, candidates ranked by the table
    // sum over their residual code words — the FAISS IndexIVFPQ search
    // mirrored exactly.
    "q_ann_ivfpq_residual" -> (residualOracleCtes +
      s"""
         |, pc AS (
         |  SELECT ccid AS probe_cluster FROM aa WHERE vec_id = 0
         |  QUALIFY row_number() OVER (ORDER BY cdot DESC, ccid ASC) <= 2
         |), prv AS (
         |  SELECT mc.cluster, mc.i, q.iv[mc.i] - mc.mv AS r
         |  FROM mc
         |  JOIN pc ON mc.cluster = pc.probe_cluster,
         |    (SELECT iv FROM iv WHERE vec_id = 0) q
         |), tbl AS (
         |  SELECT p.cluster, (p.i - 1) // $PqSubDim AS m, c.cid,
         |    CAST(SUM((p.r - c.r) * (p.r - c.r)) AS BIGINT) AS tdist
         |  FROM prv p JOIN rcb c ON p.i = c.i
         |  GROUP BY p.cluster, (p.i - 1) // $PqSubDim, c.cid
         |)
         |SELECT b.vec_id, CAST(SUM(t.tdist) AS BIGINT) AS adc
         |FROM rbest b
         |JOIN cl ON b.vec_id = cl.vec_id
         |JOIN pc ON cl.cluster = pc.probe_cluster
         |JOIN tbl t ON t.cluster = cl.cluster AND t.m = b.m
         |  AND t.cid = b.cid
         |WHERE b.vec_id <> 0
         |GROUP BY b.vec_id
         |ORDER BY adc ASC NULLS LAST, b.vec_id ASC NULLS LAST
         |LIMIT 10""".stripMargin),

    // The PQ per-(vec, sub-space, entry) distance CTE doubles as both
    // the code assignment (argmin) and the probe's ADC table (its
    // vec_id = 0 slice); the coarse stage is the q_ann_ivf_nprobe
    // exact-decimal cluster CTEs verbatim.
    "q_ann_ivfpq" -> (ivfpqCtes +
      """
         |SELECT b.vec_id, CAST(SUM(t.dist) AS BIGINT) AS adc
         |FROM best b
         |JOIN tbl t ON t.m = b.m AND t.cid = b.cid
         |JOIN cl ON cl.vec_id = b.vec_id
         |JOIN pc ON cl.cluster = pc.probe_cluster
         |WHERE b.vec_id <> 0
         |GROUP BY b.vec_id
         |ORDER BY adc ASC NULLS LAST, b.vec_id ASC NULLS LAST
         |LIMIT 10""".stripMargin),

    // The ADC CTE at LIMIT PqRefineK, then the exact-decimal cosine over
    // ONLY those candidates — the refine tail. Column names and ordering
    // mirror the Spark side exactly.
    "q_ann_ivfpq_refined" -> (ivfpqCtes +
      s"""
         |, adc AS (
         |  SELECT b.vec_id, CAST(SUM(t.dist) AS BIGINT) AS adc
         |  FROM best b
         |  JOIN tbl t ON t.m = b.m AND t.cid = b.cid
         |  JOIN cl ON cl.vec_id = b.vec_id
         |  JOIN pc ON cl.cluster = pc.probe_cluster
         |  WHERE b.vec_id <> 0
         |  GROUP BY b.vec_id
         |  ORDER BY adc ASC NULLS LAST, b.vec_id ASC NULLS LAST
         |  LIMIT $PqRefineK
         |)
         |SELECT a.vec_id, a.adc,
         |  ${sqlDot("e2.embedding", "p.embedding")} AS cosine
         |FROM adc a
         |JOIN embeddings e2 ON e2.vec_id = a.vec_id,
         |  (SELECT embedding FROM embeddings WHERE vec_id = 0) p
         |ORDER BY cosine DESC NULLS LAST, a.vec_id ASC NULLS LAST
         |LIMIT 10""".stripMargin),

    // Recall@10 of the ADC ranking against the exact-cosine top-10 (for
    // unit-norm vectors exact L2 and cosine rank identically, so the gap
    // measured here is pure quantization loss — the number that sizes
    // the PQ codebook). Same CTE block; the exact side is the
    // q_ann_ivf_curve ground-truth pattern.
    "q_ann_pq_recall" -> (ivfpqCtes +
      s"""
         |, adc AS (
         |  SELECT b.vec_id, CAST(SUM(t.dist) AS BIGINT) AS adc
         |  FROM best b
         |  JOIN tbl t ON t.m = b.m AND t.cid = b.cid
         |  JOIN cl ON cl.vec_id = b.vec_id
         |  JOIN pc ON cl.cluster = pc.probe_cluster
         |  WHERE b.vec_id <> 0
         |  GROUP BY b.vec_id
         |  ORDER BY adc ASC NULLS LAST, b.vec_id ASC NULLS LAST
         |  LIMIT 10
         |), ex AS (
         |  SELECT e2.vec_id,
         |    ${sqlDot("e2.embedding", "p.embedding")} AS cosine
         |  FROM embeddings e2,
         |    (SELECT embedding FROM embeddings WHERE vec_id = 0) p
         |  WHERE e2.vec_id <> 0
         |  ORDER BY cosine DESC NULLS LAST, e2.vec_id ASC NULLS LAST
         |  LIMIT 10
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(COUNT(a.vec_id) AS BIGINT) AS n_hit
         |FROM ex LEFT JOIN adc a ON a.vec_id = ex.vec_id""".stripMargin),


    "q_multimodal_join" ->
      """SELECT doc_id,
        |  CAST(to_json(struct_pack(lang := coalesce(lang, '<null>'),
        |    source := coalesce(source, '<null>'))) AS VARCHAR) AS meta,
        |  n_chars, CAST(len(embedding) AS BIGINT) AS dim, label
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id ASC NULLS LAST""".stripMargin,

    // Same integer-grid serialization (the Det.arrCsv cast chain) under
    // md5 — both engines fingerprint identical strings.
    "q_embed_dedup_exact" ->
      """SELECT md5(array_to_string(list_transform(embedding, x ->
        |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
        |      AS BIGINT)), ',')) AS fp,
        |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  min(vec_id) AS min_vec_id
        |FROM embeddings WHERE embedding IS NOT NULL
        |GROUP BY 1
        |ORDER BY fp ASC NULLS LAST""".stripMargin,

    // Full-ranking window + QUALIFY-free rank<=50 mirrors the
    // TakeOrdered top-50s; the decimal reciprocal sum routes through
    // VARCHAR (Det.sqlDsum convention).
    "q_rank_fusion" ->
      s"""WITH pe AS (
         |  SELECT embedding AS pe FROM embeddings WHERE vec_id = 0
         |), cosr AS (
         |  SELECT doc_id, rank FROM (
         |    SELECT e.vec_id AS doc_id,
         |      row_number() OVER (ORDER BY
         |        ${sqlDot("e.embedding", "pe.pe")} DESC NULLS LAST,
         |        e.vec_id ASC NULLS LAST) AS rank
         |    FROM embeddings e, pe
         |    WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL
         |  ) WHERE rank <= 50
         |), pt AS (
         |  SELECT list_distinct(string_split(text, ' ')) AS pt
         |  FROM documents WHERE doc_id = 0
         |), tokr AS (
         |  SELECT doc_id, rank FROM (
         |    SELECT d.doc_id,
         |      row_number() OVER (ORDER BY
         |        CAST(len(list_intersect(toks, pt.pt)) AS DOUBLE)
         |          / len(list_distinct(toks || pt.pt)) DESC NULLS LAST,
         |        d.doc_id ASC NULLS LAST) AS rank
         |    FROM (SELECT doc_id,
         |            list_distinct(string_split(text, ' ')) AS toks
         |          FROM documents WHERE text IS NOT NULL) d, pt
         |    WHERE d.doc_id <> 0
         |  ) WHERE rank <= 50
         |), u AS (
         |  SELECT doc_id, rank, 'cos' AS list FROM cosr
         |  UNION ALL SELECT doc_id, rank, 'tok' FROM tokr
         |)
         |SELECT doc_id,
         |  max(CASE WHEN list = 'cos' THEN rank END) AS cos_rank,
         |  max(CASE WHEN list = 'tok' THEN rank END) AS tok_rank,
         |  CAST(CAST(SUM(CAST(1.0 / (60 + rank) AS DECIMAL(18,10)))
         |    AS VARCHAR) AS DOUBLE) AS rrf
         |FROM u GROUP BY doc_id
         |ORDER BY rrf DESC NULLS LAST, doc_id ASC NULLS LAST
         |LIMIT 10""".stripMargin,

    // The residualOracleCtes assignment idiom (exact-decimal cdot
    // argmax) + in-cluster all-pairs exact cosine, window top-3 —
    // states the screening semantics directly; the Spark side's float
    // prefilter must land the same exact-decimal top-3. The cluster
    // count mirrors the Spark side's corpus-derived driver literal
    // k = max(8, ceil(n/500)) as a scalar subquery over the same
    // non-null corpus — both engines see the same n, so the same k.
    "q_dedup_semantic" ->
      s"""WITH p AS (
         |  SELECT GREATEST($IvfCentroids,
         |    CAST(ceil(count(*) / 500.0) AS BIGINT)) AS k
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), cents AS (
         |  SELECT vec_id AS ccid, embedding AS cemb FROM embeddings, p
         |  WHERE vec_id < p.k AND embedding IS NOT NULL
         |), aa AS (
         |  SELECT e2.vec_id, c.ccid,
         |    ${sqlDot("e2.embedding", "c.cemb")} AS cdot
         |  FROM embeddings e2, cents c
         |  WHERE e2.embedding IS NOT NULL
         |), cl AS (
         |  SELECT vec_id, ccid AS cluster FROM aa
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cdot DESC, ccid ASC) = 1
         |), m AS (
         |  SELECT cl.cluster, e.vec_id, e.embedding
         |  FROM embeddings e JOIN cl ON e.vec_id = cl.vec_id
         |), pr AS (
         |  SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${sqlDot("a.embedding", "b.embedding")} AS cosine
         |  FROM m a JOIN m b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |)
         |SELECT CAST(cluster AS BIGINT) AS cluster,
         |  CAST(rn AS BIGINT) AS rank, vec_a, vec_b, cosine FROM (
         |  SELECT cluster, vec_a, vec_b, cosine,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY cosine DESC NULLS LAST, vec_a ASC NULLS LAST,
         |        vec_b ASC NULLS LAST) AS rn
         |  FROM pr)
         |WHERE rn <= 3
         |ORDER BY cluster ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin,

    // The residualOracleCtes integer-grid idiom, label-conditioned:
    // per-label centroid means on the scaled-BIGINT grid, integer dots,
    // window top-3.
    "q_label_prototypes" ->
      s"""WITH iv AS (
         |  SELECT vec_id, label, list_transform(embedding, x ->
         |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
         |      AS BIGINT)) AS iv
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL
         |), e AS (
         |  SELECT vec_id, label, iv, unnest(generate_series(1, $EmbDim))
         |    AS i FROM iv
         |), cm AS (
         |  SELECT label, i,
         |    CAST(floor(CAST(SUM(iv[i]) AS DOUBLE) / COUNT(*) + 0.5)
         |      AS BIGINT) AS mv
         |  FROM e GROUP BY label, i
         |), dots AS (
         |  SELECT e.vec_id, e.label,
         |    CAST(SUM(e.iv[e.i] * cm.mv) AS BIGINT) AS dot
         |  FROM e JOIN cm ON e.label = cm.label AND e.i = cm.i
         |  GROUP BY e.vec_id, e.label
         |)
         |SELECT label, rank, vec_id, dot FROM (
         |  SELECT CAST(label AS BIGINT) AS label, vec_id, dot,
         |    CAST(row_number() OVER (PARTITION BY label
         |      ORDER BY dot DESC NULLS LAST, vec_id ASC NULLS LAST)
         |      AS BIGINT) AS rank
         |  FROM dots)
         |WHERE rank <= 3
         |ORDER BY label ASC NULLS LAST, rank ASC NULLS LAST""".stripMargin,

    // Same grid, two snapshot-filtered centroid CTEs, integer drifts.
    "q_embed_centroid_drift" ->
      s"""WITH iv AS (
         |  SELECT vec_id, label, list_transform(embedding, x ->
         |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
         |      AS BIGINT)) AS iv
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL
         |), e AS (
         |  SELECT vec_id, label, iv, unnest(generate_series(1, $EmbDim))
         |    AS i FROM iv
         |), co AS (
         |  SELECT label, i,
         |    CAST(floor(CAST(SUM(iv[i]) AS DOUBLE) / COUNT(*) + 0.5)
         |      AS BIGINT) AS m_old,
         |    COUNT(*) AS n_old
         |  FROM e WHERE vec_id % 7 <> 3 GROUP BY label, i
         |), cn AS (
         |  SELECT label, i,
         |    CAST(floor(CAST(SUM(iv[i]) AS DOUBLE) / COUNT(*) + 0.5)
         |      AS BIGINT) AS m_new,
         |    COUNT(*) AS n_new
         |  FROM e WHERE vec_id % 11 <> 5 GROUP BY label, i
         |), j AS (
         |  SELECT co.label, co.m_old, cn.m_new, co.n_old, cn.n_new
         |  FROM co JOIN cn ON co.label = cn.label AND co.i = cn.i
         |)
         |SELECT CAST(label AS BIGINT) AS label,
         |  max(n_old) AS n_old, max(n_new) AS n_new,
         |  CAST(SUM(abs(m_new - m_old)) AS BIGINT) AS l1_drift_scaled,
         |  CAST(max(abs(m_new - m_old)) AS BIGINT) AS max_dim_drift
         |FROM j GROUP BY label
         |ORDER BY label ASC NULLS LAST""".stripMargin,

    // Same grid; every (vector, centroid) pair via the dim-keyed join
    // (fan-out bounded by the label domain), integer margins.
    "q_embed_label_margin" ->
      s"""WITH iv AS (
         |  SELECT vec_id, label, list_transform(embedding, x ->
         |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
         |      AS BIGINT)) AS iv
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL
         |), e AS (
         |  SELECT vec_id, label, iv, unnest(generate_series(1, $EmbDim))
         |    AS i FROM iv
         |), cm AS (
         |  SELECT label AS clabel, i,
         |    CAST(floor(CAST(SUM(iv[i]) AS DOUBLE) / COUNT(*) + 0.5)
         |      AS BIGINT) AS mv
         |  FROM e GROUP BY label, i
         |), alldots AS (
         |  SELECT e.vec_id, e.label, cm.clabel,
         |    CAST(SUM(e.iv[e.i] * cm.mv) AS BIGINT) AS dot
         |  FROM e JOIN cm ON e.i = cm.i
         |  GROUP BY e.vec_id, e.label, cm.clabel
         |), own AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label, dot AS own_dot
         |  FROM alldots WHERE label = clabel
         |), oth AS (
         |  SELECT vec_id, CAST(clabel AS BIGINT) AS best_other_label,
         |    dot AS best_other_dot FROM (
         |    SELECT vec_id, clabel, dot,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dot DESC NULLS LAST, clabel ASC NULLS LAST)
         |        AS rn
         |    FROM alldots WHERE label <> clabel) WHERE rn = 1
         |)
         |SELECT o.vec_id, o.label, o.own_dot, t.best_other_label,
         |  t.best_other_dot, o.own_dot - t.best_other_dot AS margin
         |FROM own o JOIN oth t ON o.vec_id = t.vec_id
         |ORDER BY margin ASC NULLS LAST, o.vec_id ASC NULLS LAST
         |LIMIT 20""".stripMargin,

    // Same exact-decimal moments; sxx routes through VARCHAR on this
    // side only (the Det.sqlDsum convention — DuckDB's direct
    // DECIMAL→DOUBLE cast double-rounds past 2⁵³ scaled).
    "q_embed_dim_stats" ->
      s"""WITH e AS (
         |  SELECT unnest(generate_series(1, $EmbDim)) AS i, embedding
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), v AS (
         |  SELECT CAST(i - 1 AS BIGINT) AS pos,
         |    CAST(embedding[i] AS DOUBLE) AS x
         |  FROM e
         |), g AS (
         |  SELECT pos, COUNT(*) AS n,
         |    ${graft.Det.sqlDsum("x", 7)} AS sx,
         |    CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(18,7))
         |      * CAST(x AS DECIMAL(19,7)) AS DECIMAL(38,14)))
         |      AS VARCHAR) AS DOUBLE) AS sxx,
         |    min(x) AS x_min, max(x) AS x_max
         |  FROM v GROUP BY pos
         |)
         |SELECT pos, n, sx / n AS mean,
         |  (n * sxx - sx * sx) / (n * n) AS variance,
         |  x_min, x_max
         |FROM g ORDER BY pos ASC NULLS LAST""".stripMargin,

    // Same 10⁵ grid, cross-multiplied centering, HUGEINT Frobenius
    // folds, verbatim final tree.
    "q_embed_cka" ->
      s"""WITH e AS (
         |  SELECT vec_id, unnest(generate_series(1, $EmbDim)) AS i,
         |    embedding
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), v AS (
         |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE)
         |      * CAST(100000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM e
         |), p AS (
         |  SELECT a.pos AS i, b.pos AS j, COUNT(*) AS n,
         |    CAST(SUM(a.q * b.q) AS BIGINT) AS sxy
         |  FROM v a JOIN v b ON b.vec_id = a.vec_id
         |  GROUP BY 1, 2
         |), lin AS (
         |  SELECT pos, CAST(SUM(q) AS BIGINT) AS s FROM v GROUP BY 1
         |), c AS (
         |  SELECT p.i, p.j, p.n,
         |    CAST(p.n AS HUGEINT) * CAST(p.sxy AS HUGEINT)
         |      - CAST(li.s AS HUGEINT) * CAST(lj.s AS HUGEINT) AS c
         |  FROM p JOIN lin li ON li.pos = p.i
         |  JOIN lin lj ON lj.pos = p.j
         |), ag AS (
         |  SELECT MAX(n) AS n_vecs,
         |    SUM(CASE WHEN i < 32 AND j >= 32 THEN c * c ELSE 0 END)
         |      AS sxy2,
         |    SUM(CASE WHEN i < 32 AND j < 32 THEN c * c ELSE 0 END)
         |      AS sxx2,
         |    SUM(CASE WHEN i >= 32 AND j >= 32 THEN c * c ELSE 0 END)
         |      AS syy2
         |  FROM c
         |)
         |SELECT n_vecs,
         |  CAST(CAST(sxy2 AS VARCHAR) AS DOUBLE)
         |    / (sqrt(CAST(CAST(sxx2 AS VARCHAR) AS DOUBLE))
         |      * sqrt(CAST(CAST(syy2 AS VARCHAR) AS DOUBLE))) AS cka
         |FROM ag""".stripMargin,

    // Same grid, cross-multiplied centroid distances, per-vector
    // quantization and trailing mean — verbatim expression text.
    "q_embed_silhouette" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |    unnest(generate_series(1, $EmbDim)) AS i, embedding
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL
         |), v AS (
         |  SELECT vec_id, label, CAST(i - 1 AS BIGINT) AS pos,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE)
         |      * CAST(10000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM e
         |), cent AS (
         |  SELECT label AS label2, pos, COUNT(*) AS n2,
         |    CAST(SUM(q) AS BIGINT) AS s2
         |  FROM v GROUP BY 1, 2
         |), dd AS (
         |  SELECT v.vec_id, v.label, c.label2, c.n2,
         |    SUM((CAST(v.q AS HUGEINT) * CAST(c.n2 AS HUGEINT)
         |        - CAST(c.s2 AS HUGEINT))
         |      * (CAST(v.q AS HUGEINT) * CAST(c.n2 AS HUGEINT)
         |        - CAST(c.s2 AS HUGEINT))) AS dd
         |  FROM v JOIN cent c ON c.pos = v.pos
         |  GROUP BY 1, 2, 3, 4
         |), dist AS (
         |  SELECT vec_id, label, label2,
         |    sqrt(CAST(CAST(dd AS VARCHAR) AS DOUBLE))
         |      / CAST(n2 AS DOUBLE) AS dist
         |  FROM dd
         |), ab AS (
         |  SELECT vec_id, label,
         |    MIN(CASE WHEN label2 = label THEN dist END) AS a,
         |    MIN(CASE WHEN label2 <> label THEN dist END) AS b
         |  FROM dist GROUP BY 1, 2
         |), sq AS (
         |  SELECT label,
         |    CAST(floor(
         |      (CASE WHEN greatest(a, b) = CAST(0 AS DOUBLE)
         |        THEN CAST(0 AS DOUBLE)
         |        ELSE (b - a) / greatest(a, b) END)
         |      * CAST(10000000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS silq
         |  FROM ab
         |)
         |SELECT label, COUNT(*) AS n_vecs,
         |  CAST(CAST(SUM(silq) AS BIGINT) AS DOUBLE) / CAST(COUNT(*)
         |    AS DOUBLE) / CAST(10000000000 AS DOUBLE) AS mean_silhouette
         |FROM sq GROUP BY label
         |ORDER BY label ASC NULLS LAST""".stripMargin,

    // Same floor(x·10⁷+½) grid and cross-multiplied mean difference;
    // HUGEINT squares, the identical un-scaling division text.
    "q_embed_mmd" ->
      s"""WITH e AS (
         |  SELECT label, unnest(generate_series(1, $EmbDim)) AS i,
         |    embedding
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL
         |), v AS (
         |  SELECT label, CAST(i - 1 AS BIGINT) AS pos,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE)
         |      * CAST(10000000 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
         |  FROM e
         |), g AS (
         |  SELECT label, pos, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq
         |  FROM v GROUP BY 1, 2
         |), p AS (
         |  SELECT a.label AS label_a, b.label AS label_b,
         |    a.n AS n_a, b.n AS n_b,
         |    CAST(a.sq AS HUGEINT) * CAST(b.n AS HUGEINT)
         |      - CAST(b.sq AS HUGEINT) * CAST(a.n AS HUGEINT) AS dterm
         |  FROM g a JOIN g b ON b.pos = a.pos AND a.label < b.label
         |), ag AS (
         |  SELECT label_a, label_b, n_a, n_b, SUM(dterm * dterm) AS num
         |  FROM p GROUP BY 1, 2, 3, 4
         |)
         |SELECT label_a, label_b, n_a, n_b,
         |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
         |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
         |      * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
         |    / CAST(100000000000000 AS DOUBLE) AS mmd2
         |FROM ag
         |ORDER BY label_a ASC NULLS LAST, label_b ASC NULLS LAST"""
        .stripMargin,

    // Same per-dim component machinery; the quantization and the final
    // mean are verbatim expression text (HUGEINT carries the squares,
    // VARCHAR-routed into the one division).
    "q_embed_isotropy" ->
      s"""WITH e AS (
         |  SELECT unnest(generate_series(1, $EmbDim)) AS i, embedding,
         |    sqrt(${sqlDot("embedding", "embedding")}) AS norm
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), qs AS (
         |  SELECT CAST(i - 1 AS BIGINT) AS pos,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) / norm
         |      * CAST(10000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |      AS BIGINT) AS q
         |  FROM e
         |), dims AS (
         |  SELECT pos, CAST(COUNT(*) AS BIGINT) AS nr,
         |    CAST(SUM(q) AS BIGINT) AS sd,
         |    SUM(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS ssq
         |  FROM qs GROUP BY pos
         |), agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS dim,
         |    CAST(MAX(nr) AS BIGINT) AS n_vecs,
         |    SUM(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS s_cross,
         |    SUM(ssq) AS s_self
         |  FROM dims
         |)
         |SELECT dim, n_vecs,
         |  CAST(s_cross AS VARCHAR) AS s_cross,
         |  CAST(s_self AS VARCHAR) AS s_self,
         |  CAST(s_cross - s_self AS VARCHAR) AS num,
         |  CAST(CAST(CAST(s_cross - s_self AS VARCHAR) AS DOUBLE)
         |    / (CAST(n_vecs AS DOUBLE) * CAST(n_vecs - 1 AS DOUBLE))
         |    / CAST(100000000000000 AS DOUBLE) AS DOUBLE)
         |    AS avg_pair_cos
         |FROM agg""".stripMargin,

    // The 1-based series index i carries its embedding[i] alongside a
    // second series from i; the floor(x·1e8 + 0.5) quantization is the
    // identical IEEE double tree as the Spark struct (see the query's
    // determinism note — a DECIMAL cast would tie-break differently on
    // Mirrors the matrix-free power iteration on the same scaled-BIGINT
    // grid: per-dim exact decimal sums, max-abs renormalization through
    // the VARCHAR-routed division (both sums exceed 2^53), and the same
    // floor(r·1e7 + 0.5) grid re-entry. DuckDB lists are 1-indexed —
    // iv[1] is Spark's iv[0]; pos re-bases on output.
    "q_embed_pca_power" ->
      s"""WITH iv AS (
         |  SELECT vec_id, list_transform(embedding, x ->
         |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
         |      AS BIGINT)) AS iv
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), e AS (
         |  SELECT vec_id, iv, unnest(generate_series(1, $EmbDim)) AS i
         |  FROM iv
         |), w1 AS (
         |  SELECT i, SUM(CAST(iv[i] * iv[1] AS DECIMAL(38,0))) AS w
         |  FROM e GROUP BY i
         |), m1 AS (SELECT MAX(ABS(w)) AS m FROM w1),
         |u1 AS (
         |  SELECT i, CAST(floor(CAST(CAST(w AS VARCHAR) AS DOUBLE)
         |    / CAST(CAST(m AS VARCHAR) AS DOUBLE)
         |    * CAST(10000000 AS DOUBLE)
         |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS u
         |  FROM w1, m1
         |), dv AS (
         |  SELECT e.vec_id, CAST(SUM(e.iv[e.i] * u1.u) AS BIGINT) AS d
         |  FROM e JOIN u1 ON e.i = u1.i GROUP BY e.vec_id
         |), w2 AS (
         |  SELECT e.i, SUM(CAST(e.iv[e.i] AS DECIMAL(18,0))
         |    * CAST(d.d AS DECIMAL(19,0))) AS w
         |  FROM e JOIN dv d ON e.vec_id = d.vec_id GROUP BY e.i
         |), m2 AS (SELECT MAX(ABS(w)) AS m FROM w2),
         |u2 AS (
         |  SELECT i, CAST(floor(CAST(CAST(w AS VARCHAR) AS DOUBLE)
         |    / CAST(CAST(m AS VARCHAR) AS DOUBLE)
         |    * CAST(10000000 AS DOUBLE)
         |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS u
         |  FROM w2, m2
         |)
         |SELECT CAST(u1.i - 1 AS BIGINT) AS pos, u1.u AS u1, u2.u AS u2
         |FROM u1 JOIN u2 ON u1.i = u2.i
         |ORDER BY pos ASC NULLS LAST""".stripMargin,

    // dyadic floats like −561/2048); the exact BIGINT sums (HUGEINT in
    // DuckDB) route to DOUBLE via VARCHAR (Det.sqlDsum rationale) and
    // the cov combine repeats Spark's op tree.
    "q_embed_cov" ->
      s"""WITH p AS (
         |  SELECT unnest(generate_series(1, $EmbDim)) AS i, embedding
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), pp AS (
         |  SELECT i, unnest(generate_series(i, $EmbDim)) AS j, embedding
         |  FROM p
         |), v AS (
         |  SELECT CAST(i - 1 AS INTEGER) AS i, CAST(j - 1 AS INTEGER) AS j,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE)
         |      * CAST(embedding[j] AS DOUBLE) * 1e8 + 0.5)
         |      AS BIGINT) AS p,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e8 + 0.5)
         |      AS BIGINT) AS vi,
         |    CAST(floor(CAST(embedding[j] AS DOUBLE) * 1e8 + 0.5)
         |      AS BIGINT) AS vj
         |  FROM pp
         |), g AS (
         |  SELECT i, j, COUNT(*) AS n,
         |    CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS sxy,
         |    CAST(CAST(SUM(vi) AS VARCHAR) AS DOUBLE) AS sx,
         |    CAST(CAST(SUM(vj) AS VARCHAR) AS DOUBLE) AS sy
         |  FROM v GROUP BY i, j
         |)
         |SELECT i, j, n, sxy / n / 1e8 AS e_xy,
         |  sxy / n / 1e8 - (sx / n / 1e8) * (sy / n / 1e8) AS cov
         |FROM g
         |ORDER BY i ASC NULLS LAST, j ASC NULLS LAST""".stripMargin,

    // Mirrors the three exact dots: per-dim scale-7 means, c·c at scale
    // 8, x·c at scale 8 (the ivf_trained "ta" fold), x·x at scale 10
    // (the sqlDot pair of decimal_dot); the dist2 combine is the same
    // three IEEE ops.
    "q_embed_outlier" ->
      s"""WITH v AS (
         |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
         |    CAST(embedding[i] AS DOUBLE) AS x
         |  FROM (SELECT vec_id, embedding,
         |          unnest(generate_series(1, $EmbDim)) AS i
         |        FROM embeddings WHERE embedding IS NOT NULL) t
         |), m AS (
         |  SELECT pos, ${graft.Det.sqlDavg("x", 7)} AS mean
         |  FROM v GROUP BY pos
         |), cc AS (
         |  SELECT CAST(SUM(CAST(mean * mean AS DECIMAL(20,8)))
         |    AS DOUBLE) AS c2
         |  FROM m
         |), w AS (
         |  SELECT e.vec_id,
         |    CAST(SUM(CAST(CAST(e.embedding[m.pos + 1] AS DOUBLE) * m.mean
         |      AS DECIMAL(20,8))) AS DOUBLE) AS wdot
         |  FROM embeddings e, m
         |  WHERE e.embedding IS NOT NULL
         |  GROUP BY e.vec_id
         |), n AS (
         |  SELECT vec_id, ${sqlDot("embedding", "embedding")} AS xx
         |  FROM embeddings WHERE embedding IS NOT NULL
         |)
         |SELECT n.vec_id, n.xx - 2.0 * w.wdot + cc.c2 AS dist2
         |FROM n JOIN w ON n.vec_id = w.vec_id, cc
         |ORDER BY dist2 DESC NULLS LAST, n.vec_id ASC NULLS LAST
         |LIMIT 20""".stripMargin,

    "q_embed_quantize" ->
      """WITH t AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,7)) * 10000000
        |      AS BIGINT)) AS ints
        |  FROM embeddings
        |), m AS (
        |  SELECT vec_id, ints,
        |    list_max(list_transform(ints, v -> abs(v))) AS mx
        |  FROM t
        |), qq AS (
        |  SELECT vec_id, ints, mx,
        |    CASE WHEN mx IS NULL OR mx = 0 THEN NULL ELSE
        |      list_transform(ints, v -> CAST(floor(CAST(v * 127 AS DOUBLE)
        |        / CAST(mx AS DOUBLE) + 0.5) AS BIGINT)) END AS q
        |  FROM m
        |)
        |SELECT vec_id, mx,
        |  CASE WHEN mx IS NULL OR mx = 0 THEN NULL ELSE
        |    list_aggr(list_transform(q, x -> CAST(x AS VARCHAR)),
        |      'string_agg', ',') END AS q_csv,
        |  CASE WHEN mx IS NULL OR mx = 0 THEN NULL ELSE
        |    CAST(list_sum(list_transform(list_zip(ints, q),
        |      p -> abs(p[1] * 127 - p[2] * mx))) AS BIGINT) END AS err
        |FROM qq ORDER BY vec_id ASC NULLS LAST""".stripMargin,

    // Mirrors the Lloyd-step phases: exact-decimal assignment argmax (the
    // Spark side pre-ranks with the fast double dot — identical selection,
    // see the q_ann_ivf note), then the exact-decimal per-dim average.
    "q_kmeans_iter" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < $IvfCentroids
         |), a AS (
         |  SELECT e.vec_id, c.cid,
         |    ${sqlDot("e.embedding", "c.cemb")} AS cdot
         |  FROM embeddings e, cents c
         |), cl AS (
         |  SELECT vec_id, cid AS cluster FROM a
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY cdot DESC, cid ASC) = 1
         |), x AS (
         |  SELECT cl.cluster, e.i - 1 AS pos,
         |    CAST(e.embedding[e.i] AS DOUBLE) AS x
         |  FROM (SELECT vec_id, embedding,
         |          unnest(generate_series(1, $EmbDim)) AS i
         |        FROM embeddings) e
         |  JOIN cl ON e.vec_id = cl.vec_id
         |)
         |SELECT cluster, CAST(pos AS BIGINT) AS pos,
         |  COUNT(*) AS n_vecs, ${graft.Det.sqlDavg("x", 7)} AS mean
         |FROM x GROUP BY cluster, pos
         |ORDER BY cluster ASC NULLS LAST, pos ASC NULLS LAST""".stripMargin
  )
}
