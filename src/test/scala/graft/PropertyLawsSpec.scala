package graft

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, StatsTests}

/** Property-style laws on randomized inputs (fixed seed — deterministic
  * CI): the distributed builders must equal straightforward single-node
  * reference implementations on arbitrary small datasets, not just the
  * fixture corpus. This catches formulation bugs the fixture's shape
  * can mask (e.g. a rank-overlap error that only fires when one value
  * straddles a winsorize cutoff, or a propagation bug on a graph shape
  * LSH never generates). */
class PropertyLawsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("winsorizeFrom equals the row-grain clip-and-average on random " +
      "data (20 cases)") {
    for (k <- 1 to 20) {
      val n = 1 + rnd.nextInt(60)
      val types = Seq("a", "b", "c").take(1 + rnd.nextInt(3))
      // values on a half-integer grid: exact in binary AND at decimal
      // scale 4, so the reference needs no rounding-mode modeling
      val rows = (1 to n).map(_ =>
        (types(rnd.nextInt(types.size)), (rnd.nextInt(19) - 9) / 2.0))
      val got = StatsTests.winsorizeFrom(
          StatsTests.typedValuePoints(rows.toDF("event_type", "value")))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSeq
      val want = rows.groupBy(_._1).toSeq.map { case (t, rs) =>
        val vs = rs.map(_._2).sorted
        val m = vs.length
        val lo = m * 5 / 100 + 1
        val hi = math.max(m * 95 / 100, lo)
        val (loV, hiV) = (vs(lo - 1), vs(hi - 1))
        val clipped = vs.zipWithIndex.map { case (v, i) =>
          if (i + 1 < lo) loV else if (i + 1 > hi) hiV else v
        }
        (t, m.toLong, loV, hiV, clipped.map(BigDecimal(_)).sum.toDouble / m)
      }.sortBy(_._1)
      assert(got == want, s"case $k: got $got want $want")
    }
  }

  test("weightedMedianFrom equals the reference doubled-running-weight " +
      "scan on random points (20 cases)") {
    for (k <- 1 to 20) {
      val n = 1 + rnd.nextInt(40)
      val flags = Seq("A", "N", "R").take(1 + rnd.nextInt(3))
      val pts = (1 to n).map(_ => (flags(rnd.nextInt(flags.size)),
        (rnd.nextInt(30) + 1) * 0.5, (rnd.nextInt(5) + 1).toLong))
        // distinct (flag, price): the builder's input contract
        .groupBy(p => (p._1, p._2)).map { case ((f, p), rs) =>
          (f, p, rs.map(_._3).sum) }.toSeq
      val got = StatsTests.weightedMedianFrom(
          pts.toDF("l_returnflag", "l_extendedprice", "w"))
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      val want = pts.groupBy(_._1).toSeq.map { case (f, rs) =>
        val sorted = rs.sortBy(_._2)
        val tw = sorted.map(_._3).sum
        var run = 0L
        val med = sorted.find { p => run += p._3; 2L * run >= tw }.get._2
        (f, med, tw)
      }.sortBy(_._1)
      assert(got == want, s"case $k: got $got want $want")
    }
  }

  test("connectedComponents equals union-find min-labels on random " +
      "graphs (6 cases)") {
    for (k <- 1 to 6) {
      val nv = 2 + rnd.nextInt(20)
      val edges = (1 to (1 + rnd.nextInt(25)))
        .map(_ => (rnd.nextInt(nv).toLong, rnd.nextInt(nv).toLong))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val got = Corpus.connectedComponents(
            edges.toDF("id_a", "id_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // reference union-find with min-id labels
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(v => v -> find(v)).toMap
        assert(got == want, s"case $k: got $got want $want")
      }
    }
  }

  test("bfsLayers equals a plain-Scala BFS on random graphs (15 cases)") {
    for (_ <- 1 to 15) {
      val n = 2 + rnd.nextInt(20)
      val nEdges = 1 + rnd.nextInt(30)
      val edges = (1 to nEdges).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (edges.nonEmpty) {
        val maxHops = 1 + rnd.nextInt(5)
        val got = Corpus.bfsLayers(edges.toDF("id_a", "id_b"), maxHops)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val adj = (edges ++ edges.map(_.swap))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val seed = adj.keys.min
        val dist = scala.collection.mutable.Map(seed -> 0L)
        var frontier = Set(seed)
        for (r <- 1 to maxHops) {
          frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
          frontier.foreach(x => dist(x) = r.toLong)
        }
        assert(got == dist.toMap,
          s"edges $edges maxHops $maxHops: $got vs $dist")
        // hop-consistency law: reached neighbors differ by at most 1 hop
        edges.foreach { case (a, b) =>
          (got.get(a), got.get(b)) match {
            case (Some(da), Some(db)) => assert(math.abs(da - db) <= 1)
            case (Some(da), None) => assert(da == maxHops.toLong)
            case (None, Some(db)) => assert(db == maxHops.toLong)
            case _ => ()
          }
        }
      }
    }
  }

  test("kcore2 equals a plain-Scala 3-round peel on random graphs " +
      "(12 cases)") {
    for (k <- 1 to 12) {
      val n = 3 + rnd.nextInt(18)
      val nEdges = 2 + rnd.nextInt(30)
      val edges = (1 to nEdges).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (edges.nonEmpty) {
        val got = Corpus.kcore2(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // replay exactly 3 unrolled rounds (the declared semantics —
        // NOT peel-to-fixed-point), then the in-core degree
        var sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        var nodes = sym.map(_._1).toSet
        for (_ <- 1 to 3) {
          val deg = sym.filter(e => nodes(e._1) && nodes(e._2))
            .groupBy(_._1).map { case (v, es) => v -> es.length }
          nodes = deg.filter(_._2 >= 2).keySet
        }
        val want = sym.filter(e => nodes(e._1) && nodes(e._2))
          .groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
        // NOTE: no "degree ≥ 2" law here — the contract is 3 UNROLLED
        // rounds, and a graph that has not converged in 3 (a long
        // chain) legitimately leaves degree-1 survivors; only the
        // replay equality is the specification
        assert(got == want, s"case $k edges $edges: $got vs $want")
      }
    }
  }

  test("labelProp3 equals a plain-Scala 3-round synchronous replay on " +
      "random graphs (12 cases)") {
    for (k <- 1 to 12) {
      val n = 3 + rnd.nextInt(18)
      val nEdges = 2 + rnd.nextInt(30)
      val edges = (1 to nEdges).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (edges.nonEmpty) {
        val got = Corpus.labelProp3(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        val nbrs = sym.groupBy(_._1).map { case (v, es) =>
          v -> es.map(_._2) }
        var lbl: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
        for (_ <- 1 to 3) {
          lbl = nbrs.map { case (v, ns) =>
            val votes = (ns.map(lbl) :+ lbl(v)).groupBy(identity)
              .map { case (l, vs) => (l, vs.length) }
            v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
          }
        }
        assert(got == lbl, s"case $k edges $edges: $got vs $lbl")
      }
    }
  }

  test("portable log2: the bin-exponent + atanh-series chain matches " +
      "math log2 within 1e-6 for n in 1..200000") {
    import graft.Det
    val out = spark.range(1, 200001).toDF("c")
      .withColumn("e2", expr(Det.log2Exp("c")))
      .withColumn("mm", expr(Det.mantissa("c", "e2")))
      .withColumn("zz", expr(Det.zOfM("mm")))
      .withColumn("l2", expr(s"CAST(e2 AS DOUBLE) + ${Det.plog2Series("zz")}"))
      .select("c", "l2").collect()
    out.foreach { r =>
      val (c, l2) = (r.getLong(0), r.getDouble(1))
      val want = math.log(c.toDouble) / math.log(2.0)
      assert(math.abs(l2 - want) < 1e-6, s"log2($c): $l2 vs $want")
    }
    // powers of two are EXACT (z = 0 kills the series entirely)
    Seq(1L, 2L, 4L, 1024L, 65536L).foreach { c =>
      val l2 = out(c.toInt - 1).getDouble(1)
      assert(l2 == (63 - java.lang.Long.numberOfLeadingZeros(c)).toDouble)
    }
  }

  test("q_text_entropy bounds: 0 <= H <= log2(n_types), exact zero for " +
      "single-type docs, and the fixture is non-degenerate") {
    val rows = graft.operators.TextOps.queries("q_text_entropy")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, h) = (r.getLong(2), r.getDouble(3))
      val cap = math.log(types.toDouble) / math.log(2.0)
      assert(h >= -1e-6 && h <= cap + 1e-6,
        s"doc ${r.getLong(0)}: H=$h outside [0, log2($types)]")
      if (types == 1) assert(math.abs(h) < 1e-6)
    }
    assert(rows.exists(_.getDouble(3) > 1.0), "all-low-entropy fixture?")
  }

  test("q_text_zipf: slope is negative and reproduces a brute-force " +
      "least-squares fit of the top-100 log-log points") {
    val r = graft.operators.TextOps.queries("q_text_zipf")(spark, sf).head()
    val (n, slope, intercept) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n > 10)
    assert(slope < 0.0, s"zipf slope $slope not negative")
    // brute force from the raw counts
    val counts = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count()
      .collect().map(r2 => (r2.getString(0), r2.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(100)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0) / math.log(2.0), math.log(c.toDouble) / math.log(2.0))
    }
    val m = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val wantSlope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val wantIcept = (sy - wantSlope * sx) / m
    assert(math.abs(slope - wantSlope) < 1e-4,
      s"slope $slope vs brute $wantSlope")
    assert(math.abs(intercept - wantIcept) < 1e-4)
  }

  test("q_embed_pca_power: u2 aligns with the brute-force dominant " +
      "eigendirection of the Gram matrix") {
    val rows = graft.operators.VectorOps.queries("q_embed_pca_power")(
      spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.length == 64)
    val u2 = rows.map(_.getLong(2).toDouble)
    // brute-force: many plain-double power steps from the same seed
    val vecs = Tables.table(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull)
      .select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    // same TWO steps in plain doubles (the law is the distributed
    // exact-grid formulation equals the single-node algorithm, not a
    // convergence claim — two steps from e0 need not reach the
    // eigenvector)
    var v = Array.tabulate(64)(j => vecs.map(x => x(j) * x(0)).sum)
    var m = v.map(math.abs).max
    v = v.map(_ / m)
    val next = Array.tabulate(64) { j =>
      vecs.map(x => x(j) * x.zip(v).map { case (a, b) => a * b }.sum).sum
    }
    m = next.map(math.abs).max
    val v2 = next.map(_ / m)
    val dot = u2.zip(v2).map { case (a, b) => a * b }.sum
    val cos = dot / math.sqrt(u2.map(x => x * x).sum) /
      math.sqrt(v2.map(x => x * x).sum)
    assert(cos > 0.9999, s"pca two-step cosine $cos")
  }

  test("q_corpus_snapshot_delta partitions both snapshots exactly") {
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
    val nOld = docs.filter(col("doc_id") % 7 =!= 3).count()
    val nNew = docs.filter(col("doc_id") % 11 =!= 5).count()
    val out = graft.operators.Corpus.queries("q_corpus_snapshot_delta")(
      spark, sf).collect()
    val (add, rem, chg, same) = (
      out.map(_.getLong(1)).sum, out.map(_.getLong(2)).sum,
      out.map(_.getLong(3)).sum, out.map(_.getLong(4)).sum)
    assert(rem + chg + same == nOld, "old snapshot not partitioned")
    assert(add + chg + same == nNew, "new snapshot not partitioned")
    // revised docs exist and are classified as changed
    assert(chg > 0)
  }

  test("q_text_perplexity: positive bits, and a brute-force replay of " +
      "the smoothed bigram model agrees per doc") {
    val rows = graft.operators.TextOps.queries("q_text_perplexity")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) > 0.0,
      s"doc ${r.getLong(0)}: non-positive cross-entropy"))
    // brute force in plain Scala from the raw fixture
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ")) }
      .filter(_._2.length >= 2)
    val train = docs.filter(_._1 % 5 != 0)
    val cab = scala.collection.mutable.Map[(String, String), Long]()
    train.foreach { case (_, ts) => ts.sliding(2).foreach { w =>
      if (w.length == 2) cab((w(0), w(1))) = cab.getOrElse((w(0), w(1)), 0L) + 1 } }
    val ca = cab.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val v = train.flatMap(_._2).distinct.length.toLong
    val got = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    docs.filter(_._1 % 5 == 0).take(20).foreach { case (id, ts) =>
      val bs = ts.sliding(2).filter(_.length == 2).toSeq
      val h = bs.map { w =>
        val num = cab.getOrElse((w(0), w(1)), 0L) + 1.0
        val den = ca.getOrElse(w(0), 0L) + v.toDouble
        (math.log(den) - math.log(num)) / math.log(2.0)
      }.sum / bs.length
      val (n, gh) = got(id)
      assert(n == bs.length, s"doc $id bigram count")
      assert(math.abs(gh - h) < 1e-4, s"doc $id: $gh vs brute $h")
    }
  }

  test("q_source_kl: Gibbs non-negativity, full vocabulary accounting, " +
      "and a brute-force replay per source") {
    val rows = graft.operators.Corpus.queries("q_source_kl")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= -1e-9,
      s"source ${r.getString(0)}: negative KL"))
    val toks = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select("source", "text").as[(String, String)].collect()
      .flatMap { case (src, t) => t.split(" ").map(src -> _) }
    val n = toks.length.toDouble
    val ct = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = toks.filter(_._1 == src).map(_._2)
      val ns = mine.length.toLong
      assert(r.getLong(1) == ns, s"$src n_tokens")
      val cst = mine.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      assert(r.getLong(2) == cst.size, s"$src n_types")
      val kl = cst.map { case (t, c) =>
        c.toDouble / ns * (math.log(c * n / (ns * ct(t))) / math.log(2.0))
      }.sum
      assert(math.abs(r.getDouble(3) - kl) < 1e-4,
        s"$src: ${r.getDouble(3)} vs brute $kl")
    }
  }

  test("q_source_jsd: bounded in [0, 1] bits, symmetric-construction " +
      "sanity, and a brute-force replay per source (incl. the " +
      "closed-form missing-token mass)") {
    val rows = graft.operators.Corpus.queries("q_source_jsd")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val toks = Tables.table(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .select("source", "text").as[(String, String)].collect()
      .flatMap { case (src, t) => t.split(" ").map(src -> _) }
    val n = toks.length.toLong
    val ct = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    def lg2(x: Double): Double = math.log(x) / math.log(2.0)
    rows.foreach { r =>
      val src = r.getString(0)
      val jsd = r.getDouble(4)
      assert(jsd >= -1e-9 && jsd <= 1.0 + 1e-9,
        s"$src: JSD $jsd outside [0,1]")
      val mine = toks.filter(_._1 == src).map(_._2)
      val ns = mine.length.toLong
      val nr = n - ns
      assert(r.getLong(1) == ns && r.getLong(2) == nr, s"$src totals")
      val cst = mine.groupBy(identity)
        .map { case (t, xs) => t -> xs.length.toLong }
      assert(r.getLong(3) == cst.size, s"$src n_types")
      // brute JSD over the FULL vocabulary (missing tokens included)
      val brute = ct.map { case (t, c) =>
        val cs = cst.getOrElse(t, 0L)
        val p = cs.toDouble / ns
        val q = (c - cs).toDouble / nr
        val m = (p + q) / 2.0
        (if (p > 0) p / 2.0 * lg2(p / m) else 0.0) +
          (if (q > 0) q / 2.0 * lg2(q / m) else 0.0)
      }.sum
      assert(math.abs(jsd - brute) < 1e-4,
        s"$src: $jsd vs brute $brute")
    }
  }

  test("overflow bounds of the BIGINT survivors (r12 sweep): " +
      "q_window_rolling_beta's 7-row OLS den holds to a 13.7-year " +
      "span, q_dedup_bucket_skew's pair bill to a 4.29e9-doc bucket") {
    // q_window_rolling_beta: den = k·stt − st² over a 7-row frame with
    // tt = seconds since the 2024 epoch. Worst case all 7 rows at span
    // T: den components ≤ 49·T². The documented envelope (13.7 years)
    // must fit; one more year must NOT — pinning that the comment's
    // number is the actual wrap point, not folklore.
    val yearSec = 365L * 24 * 3600
    def den(tSec: Long): BigInt = BigInt(7) * 7 * BigInt(tSec) * tSec
    val max = BigInt(Long.MaxValue)
    assert(den((13.7 * yearSec).toLong) <= max,
      "13.7-year span must stay inside BIGINT")
    assert(den((14.7 * yearSec).toLong) > max,
      "the wrap point must be near the documented 13.7 years")
    // and the sty term: T·|v|·1e4 per row, 7 rows, |v| ≤ 2e5 at the
    // 13.7-year envelope
    assert(BigInt(7) * (13.7 * yearSec).toLong * 200000L * 10000L <= max)
    // q_dedup_bucket_skew: a single histogram row wraps only when
    // n_buckets·sz·(sz−1)/2 > 2⁶³−1; at n_buckets = 1 that is a single
    // band bucket of > 4.29e9 docs (the comment's bound) — verify both
    // sides of the boundary.
    def pairs(sz: Long): BigInt = BigInt(sz) * (sz - 1) / 2
    assert(pairs(4290000000L) <= max)
    assert(pairs(4300000000L) > max)
    // q_source_kl / q_source_jsd (r13 ADVICE): the plog2 inputs are
    // integer PRODUCTS of counts. The binding constraint is BIGINT
    // overflow of the product itself, not the 2^53 double-exactness
    // bound (past 2^53 both engines CAST BIGINT→DOUBLE with the same
    // correctly-rounded value, so PARITY survives; only the mantissa
    // decomposition's exactness degrades, <1 ulp). Adversarial worst
    // case for jsd's den = cst·nr + rt·ns with one source holding half
    // an all-one-token corpus: cst = ns = N/2, nr = N/2, rt = N/2 →
    // den = N²/2. The guaranteed-safe corpus is N ≤ √(2·(2⁶³−1)) ≈
    // 4.29e9 tokens; past ~6.1e9 the adversarial den wraps — the
    // DECIMAL(38,0) drop-in noted in Corpus.scala applies there.
    def jsdDen(n: Long): BigInt = {
      val h = BigInt(n) / 2
      h * h + h * h
    }
    assert(jsdDen(4290000000L) <= max,
      "4.29e9 tokens must stay inside BIGINT even adversarially")
    assert(jsdDen(6200000000L) > max,
      "the adversarial wrap point must be near the documented ~6.1e9")
  }
}
