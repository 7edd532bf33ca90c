package graft

import org.apache.spark.sql.functions.{col, year}

import graft.operators.{MinHash, Sketches}

/** Sketch invariants: count-min never underestimates (and matches the
  * brute-force sketch exactly); Bloom has no false negatives. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def hv(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private lazy val counts: Map[String, Long] =
    Tables.table(spark, sf, "documents")
      .select("text").as[String].collect()
      .filter(_ != null).flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("q_sketch_countmin estimates equal the brute-force sketch and " +
      "never underestimate") {
    val out = Sketches.queries("q_sketch_countmin")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 10)
    // brute-force the same 4×32 sketch
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    counts.foreach { case (tok, n) =>
      (0 until Sketches.CmDepth).foreach { d =>
        val c = (hv(tok) ^ MinHash.seeds(d)) % Sketches.CmWidth
        cells((d, c)) += n
      }
    }
    out.foreach { case (tok, trueN, estN) =>
      assert(counts(tok) == trueN)
      val expected = (0 until Sketches.CmDepth).map { d =>
        cells((d, (hv(tok) ^ MinHash.seeds(d)) % Sketches.CmWidth))
      }.min
      assert(estN == expected, s"$tok sketch estimate")
      assert(estN >= trueN, s"$tok underestimated")
    }
  }

  test("q_agg_approx_distinct: HLL estimate stays inside the published " +
      "error envelope of exact countDistinct") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // approx_count_distinct is HLL++ at Spark's default relative
    // standard deviation rsd = 0.05; the estimate is deterministic for
    // fixed data, and the published envelope puts essentially all mass
    // within a few σ — we pin 3·rsd = 15% relative error per group,
    // which a correct sketch clears with wide margin and a broken one
    // (wrong register merge, wrong bias correction) blows immediately.
    val est = graft.operators.Relational
      .queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.table(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, "group sets must agree")
    assert(est.nonEmpty)
    exact.foreach { case (k, n) =>
      val e = est(k)
      val relErr = math.abs(e.toDouble - n.toDouble) / n.toDouble
      assert(relErr <= 3 * 0.05,
        s"$k: estimate $e vs exact $n (relative error $relErr > 3*rsd)")
    }
  }

  test("q_sketch_bloom has no false negatives and flags presence " +
      "correctly") {
    val out = Sketches.queries("q_sketch_bloom")(spark, sf).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.length == 10)
    out.foreach { case (tok, present, member) =>
      assert(present == counts.contains(tok), s"$tok presence")
      if (present) assert(member, s"$tok is a false negative")
    }
    // the synthetic keys really are absent from the fixtures
    assert(out.count(!_._2) == 5)
  }

  test("q_sketch_kmv: estimate within the KMV error envelope of the " +
      "exact count it reports beside itself") {
    // rsd for a K-minimum-values sketch ≈ 1/sqrt(K−2) (Beyer et al.
    // 2007 unbiased form); 3·rsd is the standard acceptance bound
    val rows = Sketches.queries("q_sketch_kmv")(spark,
      "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val rsd = 1.0 / math.sqrt(Sketches.KmvK - 2.0)
    rows.foreach { r =>
      val (kUsed, est, exact) = (r.getAs[Long]("k_used"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      assert(kUsed == Sketches.KmvK, "fixture groups must fill the sketch")
      val rel = math.abs(est.toDouble - exact.toDouble) / exact.toDouble
      assert(rel <= 3 * rsd, s"estimate $est vs exact $exact: $rel")
    }
  }

  test("q_sketch_theta: union/intersection estimates inside 3 rsd, " +
      "and the sketch algebra is internally consistent") {
    val r = Sketches.queries("q_sketch_theta")(spark,
      "/root/testdata/sf0.01").collect().head
    val rsd = 1.0 / math.sqrt(Sketches.KmvK - 2.0)
    def rel(est: Long, exact: Long) =
      math.abs(est.toDouble - exact.toDouble) / exact.toDouble
    assert(rel(r.getAs[Long]("est_union"),
      r.getAs[Long]("exact_union")) <= 3 * rsd)
    assert(rel(r.getAs[Long]("est_inter"),
      r.getAs[Long]("exact_inter")) <= 3 * rsd)
    // algebra: the in-both sample is a subset of the union sample, and
    // estimates preserve that ordering; the fixture cohorts genuinely
    // differ (union > intersection)
    assert(r.getAs[Long]("n_inter_sample")
      <= r.getAs[Long]("n_union_sample"))
    assert(r.getAs[Long]("est_inter") <= r.getAs[Long]("est_union"))
    assert(r.getAs[Long]("exact_union") > r.getAs[Long]("exact_inter"),
      "fixture must exercise a non-degenerate overlap")
  }

  test("q_sketch_hll: registers match a brute-force replay and the " +
      "estimate sits inside the published error envelope") {
    val rows = Tables.table(spark, sf, "events")
      .select("event_type", "user_id").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = Sketches.queries("q_sketch_hll")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (ty, evs) =>
      val users = evs.map(_._2).distinct
      val regs = scala.collection.mutable.Map[Long, Long]()
      users.foreach { u =>
        val hv = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(u.toString.getBytes("UTF-8"))
            .take(8).map("%02x".format(_)).mkString.take(15), 16)
        val bucket = hv / 4503599627370496L
        val w = hv % 4503599627370496L
        val rho = if (w == 0) 53L
          else 52L - (java.lang.Long.toBinaryString(w).length - 1)
        regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
      }
      val r = out(ty)
      assert(r.getAs[Long]("n_present") == regs.size.toLong,
        s"$ty present")
      assert(r.getAs[Long]("v_zeros") == (256 - regs.size).toLong,
        s"$ty zeros")
      assert(r.getAs[Long]("mmax") == regs.values.max, s"$ty mmax")
      val mmax = regs.values.max
      val t = regs.values.map(mj => 1L << (mmax - mj)).sum +
        (256 - regs.size) * (1L << mmax)
      assert(r.getAs[Long]("t_sum") == t, s"$ty t_sum")
      // HLL relative error ≈ 1.04/√m = 6.5% at m = 256; allow 5σ
      val est = r.getAs[Long]("est_distinct").toDouble
      val n = users.length.toDouble
      assert(math.abs(est - n) <= math.max(5 * 1.04 / 16 * n, 3.0),
        s"$ty estimate $est vs exact $n")
    }
  }

  test("q_sketch_hll_union: merged registers equal max-merge of the " +
      "cohort registers and estimates bracket the exact counts") {
    val out = Sketches.queries("q_sketch_hll_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("a", "b", "u"))
    // exact audit: the union exact is the true union cardinality
    val ords = Tables.table(spark, sf, "orders")
      .select(year(col("o_orderdate")).as("y"), col("o_custkey"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val a = ords.filter(_._1 == 1995).map(_._2).toSet
    val b = ords.filter(_._1 == 1996).map(_._2).toSet
    assert(out("a").getAs[Long]("exact_distinct") == a.size.toLong)
    assert(out("b").getAs[Long]("exact_distinct") == b.size.toLong)
    assert(out("u").getAs[Long]("exact_distinct") ==
      (a ++ b).size.toLong)
    // register-merge property: union t_sum/mmax cannot be looser than
    // either cohort's (max-merge only raises registers)
    assert(out("u").getAs[Long]("mmax") >=
      math.max(out("a").getAs[Long]("mmax"),
        out("b").getAs[Long]("mmax")))
    // estimates within the 5-sigma HLL envelope of their exacts
    Seq("a", "b", "u").foreach { tag =>
      val est = out(tag).getAs[Long]("est_distinct").toDouble
      val n = out(tag).getAs[Long]("exact_distinct").toDouble
      assert(math.abs(est - n) <= math.max(5 * 1.04 / 16 * n, 3.0),
        s"$tag estimate $est vs exact $n")
    }
    // inclusion-exclusion overlap estimate stays plausible
    val estI = out("a").getAs[Long]("est_distinct") +
      out("b").getAs[Long]("est_distinct") -
      out("u").getAs[Long]("est_distinct")
    val exactI = (a & b).size.toLong
    assert(math.abs(estI - exactI)
      <= math.max(15 * 1.04 / 16 * (a ++ b).size, 5.0),
      s"overlap estimate $estI vs exact $exactI")
  }

  test("q_sketch_linear: bucket count matches the brute-force table " +
      "and the estimate sits inside the paper's error envelope") {
    val users = Tables.table(spark, sf, "events")
      .select("user_id").distinct()
      .collect().map(_.getLong(0))
    val m = 4096
    val buckets = users.map { u =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16) % m
    }.toSet
    val r = Sketches.queries("q_sketch_linear")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("m") == m.toLong)
    assert(r.getAs[Long]("used") == buckets.size.toLong)
    assert(r.getAs[Long]("z") == (m - buckets.size).toLong)
    assert(r.getAs[Long]("exact_distinct") == users.length.toLong)
    val est = r.getAs[Long]("est_distinct")
    // sparse-regime linear counting: expected standard error
    // ≈ sqrt(m·(exp(t)−t−1))/n with t = n/m — allow 5 sigma plus the
    // integer-rounding slack (generous, deterministic fixture)
    val t = users.length.toDouble / m
    val se = math.sqrt(m * (math.exp(t) - t - 1)) / users.length
    val tol = math.max(5 * se * users.length, 3.0)
    assert(math.abs(est - users.length) <= tol,
      s"estimate $est vs exact ${users.length} (tol $tol)")
  }

  test("q_sketch_quantile: rank error within the DKW envelope at sf0.1 " +
      "(groups genuinely subsample there), exact mode below K") {
    val big = "/root/testdata/sf0.1"
    val rows = Sketches.queries("q_sketch_quantile")(spark, big).collect()
    assert(rows.nonEmpty)
    val ev = Tables.table(spark, big, "events")
      .filter(col("value").isNotNull)
    // DKW: P(sup_q |F_sample(q) - F(q)| > eps) <= 2 exp(-2 K eps²);
    // eps = sqrt(ln(2/δ)/(2K)) at δ=1e-4 is ~0.035 for K=4096 — the
    // fixture is deterministic, so this either holds or the sampler is
    // biased. +1/n covers nearest-rank discretization.
    val eps = math.sqrt(math.log(2.0 / 1e-4) / (2.0 * Sketches.QuantK))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (nFull, m) = (r.getAs[Long]("n_full"), r.getAs[Long]("m"))
      assert(m == math.min(Sketches.QuantK.toLong, nFull),
        s"$et: sample size $m != min(K, $nFull)")
      assert(nFull > Sketches.QuantK,
        s"$et: sf0.1 group must exceed K or the test is vacuous")
      val grp = ev.filter(col("event_type") === et)
      Seq(0.5 -> "est_p50", 0.9 -> "est_p90", 0.99 -> "est_p99")
        .foreach { case (q, cn) =>
          val est = r.getAs[Double](cn)
          val le = grp.filter(col("value") <= est).count().toDouble
          val lt = grp.filter(col("value") < est).count().toDouble
          // est's possible quantile positions span [lt/n, le/n] (ties);
          // the target q must be within eps + 1/n of that interval
          val slack = eps + 1.0 / nFull
          assert(q >= lt / nFull - slack && q <= le / nFull + slack,
            s"$et $cn=$est: rank in [${lt / nFull}, ${le / nFull}], " +
              s"target $q, eps $eps")
        }
    }
  }

  test("q_sketch_quantile_merge: merged sub-sketches equal the " +
      "single-pass global sketch exactly (the mergeability law)") {
    val r = Sketches.queries("q_sketch_quantile_merge")(spark,
      "/root/testdata/sf0.01").collect().head
    assert(r.getAs[Long]("m_merged") == r.getAs[Long]("m_single"))
    assert(r.getAs[Double]("est_p50_merged") ==
      r.getAs[Double]("est_p50_single"))
    assert(r.getAs[Double]("est_p99_merged") ==
      r.getAs[Double]("est_p99_single"))
    assert(r.getAs[Long]("n_subs") == 5L) // the 5 fixture event types
  }
}
