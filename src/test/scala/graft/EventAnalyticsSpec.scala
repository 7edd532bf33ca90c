package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Funnel / retention / resample-ffill against plain-Scala ground truth
  * recomputed from the fixture events. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** Full-microsecond epoch of a Timestamp — getTime is ms-truncated and
    * would order same-millisecond events differently from the queries'
    * (ts, event_id) keys. */
  private def usOf(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private lazy val events: Seq[(Long, Timestamp, String, Double)] =
    Tables.table(spark, sf, "events")
      .select("user_id", "ts", "event_type", "value")
      .as[(Long, Timestamp, String, Double)].collect().toSeq

  test("q_funnel stages are ordered and match brute force") {
    val out = EventAnalytics.queries("q_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getLong(4))).toMap
    val byUser = events.groupBy(_._1)
    assert(out.keySet == byUser.keySet)
    byUser.foreach { case (uid, evs) =>
      val s = evs.filter(_._3 == "signup").map(_._2).sortBy(usOf)
        .headOption
      val c = s.flatMap(st => evs.filter(e => e._3 == "click"
        && !e._2.before(st)).map(_._2).sortBy(usOf).headOption)
      val p = c.flatMap(ct => evs.filter(e => e._3 == "purchase"
        && !e._2.before(ct)).map(_._2).sortBy(usOf).headOption)
      val stage = if (s.isEmpty) 0 else if (c.isEmpty) 1
        else if (p.isEmpty) 2 else 3
      val (os, oc, op, ost) = out(uid)
      assert(os == s && oc == c && op == p && ost == stage,
        s"user $uid funnel mismatch")
      // ordering invariant: each stage at-or-after the previous
      for (st <- os; ct <- oc) assert(!ct.before(st))
      for (ct <- oc; pt <- op) assert(!pt.before(ct))
    }
  }

  test("q_retention offset-0 cohorts partition the user base") {
    val out = EventAnalytics.queries("q_retention")(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    // every user is active on their own first day, so summing the
    // offset-0 cells over all cohorts counts each user exactly once
    val day0Total = out.collect { case ((_, 0L), n) => n }.sum
    assert(day0Total == events.map(_._1).distinct.size)
    // retention can never exceed the cohort's day-0 size
    out.foreach { case ((cohort, off), n) =>
      assert(n <= out((cohort, 0L)), s"cohort $cohort offset $off grows")
    }
  }

  /** (user_id, event_id, ts, event_type) — the scd2/path ground truths
    * need the event_id tie-break the queries order by. */
  private lazy val eventsKeyed: Seq[(Long, Long, Timestamp, String)] =
    Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type")
      .as[(Long, Long, Timestamp, String)].collect().toSeq

  test("q_scd2_intervals tiles each user's timeline with type runs") {
    val out = EventAnalytics.queries("q_scd2_intervals")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
    val byUser = eventsKeyed.groupBy(_._1)
    out.groupBy(_._1).foreach { case (uid, ivs) =>
      val sorted = ivs.sortBy(i => (usOf(i._4), i._2))
      // ground truth: runs of equal type in (ts, event_id) order
      val evs = byUser(uid).sortBy(e => (usOf(e._3), e._2))
      val runs = evs.foldLeft(Vector.empty[(String, Timestamp)]) {
        case (acc, (_, _, t, tpe)) =>
          if (acc.nonEmpty && acc.last._1 == tpe) acc
          else acc :+ (tpe, t)
      }
      assert(sorted.length == runs.length, s"user $uid run count")
      sorted.zip(runs).foreach { case ((_, _, tpe, from, _), (rTpe, rTs)) =>
        assert(tpe == rTpe && from == rTs)
      }
      // valid_to chains to the next valid_from; the last run stays open
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5.contains(b._4), s"user $uid gap")
        case _ =>
      }
      assert(sorted.last._5.isEmpty)
      // consecutive runs always change type
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3)
        case _ =>
      }
    }
  }

  test("q_path_per_session counts 30-minute-gap sessions with <=5 hops") {
    val out = EventAnalytics.queries("q_path_per_session")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { case (path, n) =>
      assert(path.split(">").length <= 5)
      assert(n >= 1)
    }
    // the top-20 total can never exceed the true session count
    val gapUs = 1800L * 1000000L
    val totalSessions = eventsKeyed.groupBy(_._1).map { case (_, evs) =>
      val ts = evs.sortBy(e => (usOf(e._3), e._2)).map(e => usOf(e._3))
      1 + ts.sliding(2).count { case Seq(a, b) => b - a > gapUs; case _ => false }
    }.sum
    assert(out.map(_._2).sum <= totalSessions)
  }

  test("q_anomaly_mad matches brute-force median/MAD and outlier counts") {
    val out = EventAnalytics.queries("q_anomaly_mad")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    def medianOf(xs: Seq[Double], scale: Int): Double = {
      val s = xs.sorted
      val n = s.length
      val picked =
        if (n % 2 == 1) Seq(s(n / 2)) else Seq(s(n / 2 - 1), s(n / 2))
      val dec = picked.map(BigDecimal(_)
        .setScale(scale, BigDecimal.RoundingMode.HALF_UP)).sum
      dec.toDouble / picked.size
    }
    events.groupBy(_._3).foreach { case (tpe, evs) =>
      val vals = evs.map(_._4)
      val med = medianOf(vals, 4)
      val mad = medianOf(vals.map(v => math.abs(v - med)), 7)
      val outliers = vals.count(v => math.abs(v - med) > mad * 3)
      val (n, oMed, oMad, oOut) = out(tpe)
      assert(n == vals.size)
      assert(oMed == med && oMad == mad, s"$tpe med/mad")
      assert(oOut == outliers, s"$tpe outliers")
    }
  }

  test("q_resample_ffill fills gaps with the last observed day") {
    val out = EventAnalytics.queries("q_resample_ffill")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // spine is contiguous: first and last day observed, no null filled
      // after the first day (offset 0 always has a value)
      assert(sorted.head._3.isDefined)
      var lastSeen: Option[Double] = None
      sorted.foreach { case (_, _, dval, filled) =>
        if (dval.isDefined) lastSeen = dval
        assert(filled == lastSeen)
      }
    }
  }

  private lazy val eventsFull: Seq[(Long, Long, String, Timestamp, Double)] =
    Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "ts", "value")
      .as[(Long, Long, String, Timestamp, Double)].collect().toSeq

  test("q_markov_transition counts match brute force; rows normalize") {
    val rows = EventAnalytics.queries("q_markov_transition")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
    val truth = eventsFull.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (usOf(e._4), e._2)).sliding(2).collect {
        case Seq(a, b) => (a._3, b._3)
      }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = rows.toMap
    assert(got.keySet == truth.keySet)
    truth.foreach { case (k, n) => assert(got(k)._1 == n, s"pair $k") }
    rows.groupBy(_._1._1).foreach { case (prev, vs) =>
      val nPrev = vs.head._2._2
      assert(vs.map(_._2._1).sum == nPrev, s"$prev row total")
      assert(math.abs(vs.map(_._2._3).sum - 1.0) < 1e-9, s"$prev norm")
    }
  }

  test("q_concurrency_peak is a non-negative prefix sum whose peak " +
      "matches the brute-force interval count") {
    val out = EventAnalytics.queries("q_concurrency_peak")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    var run = 0L
    out.foreach { case (tsu, d, conc) =>
      run += d
      assert(conc == run, s"prefix sum broken at $tsu")
      assert(conc >= 0)
    }
    assert(run == 0L, "timeline must close every session")
    // brute-force sessions: 30-min gap islands per user
    val sessions = eventsFull.groupBy(_._1).values.flatMap { evs =>
      val ts = evs.map(e => (usOf(e._4), e._2)).sortBy(identity)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      var start = ts.head._1
      var prev = ts.head._1
      ts.tail.foreach { case (t, _) =>
        if (t - prev > 1800L * 1000000L) { out += ((start, prev)); start = t }
        prev = t
      }
      out += ((start, prev))
      out.toSeq
    }.toSeq
    val (peakT, _, peakC) = out.maxBy(_._3)
    val brute = sessions.count { case (s, e) => s <= peakT && peakT <= e }
    assert(peakC == brute, s"peak at $peakT: $peakC vs brute $brute")
  }

  test("q_window_time_range matches brute-force trailing-hour stats") {
    val out = EventAnalytics.queries("q_window_time_range")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val byUser = eventsFull.groupBy(_._1)
    out.foreach { case (uid, _, tsu, n1h, sum1h) =>
      val win = byUser(uid).filter { e =>
        val t = usOf(e._4); t >= tsu - 3600L * 1000000L && t <= tsu
      }
      assert(n1h == win.size, s"count for user $uid at $tsu")
      val exact = win.map(e => BigDecimal(e._5)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(sum1h == exact, s"sum for user $uid at $tsu")
    }
  }

  private def dayOf(t: Timestamp): java.time.LocalDate =
    t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate

  test("q_ts_autocorr matches brute-force scaled-integer ACF") {
    val out = EventAnalytics.queries("q_ts_autocorr")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val daily = events.groupBy(e => dayOf(e._2))
      .map { case (d, es) => d -> es.size.toLong }
    val n = daily.size.toLong
    val s = daily.values.sum
    val cx = daily.map { case (d, x) => d -> (x * n - s) }
    val den = cx.values.map(c => c * c).sum
    assert(out.keySet == (1L to 7L).toSet)
    (1L to 7L).foreach { lag =>
      val pairs = cx.toSeq.flatMap { case (d, c1) =>
        cx.get(d.plusDays(lag)).map(c2 => c1 * c2)
      }
      val (nPairs, acf) = out(lag)
      assert(nPairs == pairs.size, s"n_pairs at lag $lag")
      assert(acf == pairs.sum.toDouble / den.toDouble, s"acf at lag $lag")
    }
  }

  test("q_ts_cusum matches brute-force exact-decimal changepoint") {
    val r = EventAnalytics.queries("q_ts_cusum")(spark, sf).collect().head
    val daily = events.groupBy(e => dayOf(e._2))
      .map { case (d, es) => d -> es.map(e => BigDecimal(e._4)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum }
      .toSeq.sortBy(_._1.toEpochDay)
    val n = daily.size
    val stot = daily.map(_._2).sum
    var cum = BigDecimal(0)
    val devs = daily.zipWithIndex.map { case ((d, sd), i) =>
      cum += sd
      d -> (cum * n - BigDecimal(i + 1) * stot).abs
    }
    val mdev = devs.map(_._2).max
    val dayStar = devs.filter(_._2 == mdev).map(_._1)
      .minBy(_.toEpochDay)
    assert(r.getDate(0).toLocalDate == dayStar)
    assert(r.getLong(1) == n.toLong)
    assert(r.getDouble(2) == mdev.toDouble / n.toDouble)
  }

  test("q_audience_overlap matches brute-force user-set Jaccard and " +
      "only emits pairs with common users") {
    val ut = eventsKeyed.map(e => (e._1, e._4)).distinct
    val byType = ut.groupBy(_._2).map { case (t0, rs) =>
      t0 -> rs.map(_._1).toSet }
    val out = EventAnalytics.queries("q_audience_overlap")(spark, sf)
      .collect()
    val expectPairs = byType.keys.toSeq.sorted.combinations(2)
      .map { case Seq(a, b) => (a, b) }
      .filter { case (a, b) => (byType(a) & byType(b)).nonEmpty }
      .toSet
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet
      == expectPairs)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val inter = (byType(a) & byType(b)).size.toLong
      assert(r.getLong(2) == byType(a).size.toLong)
      assert(r.getLong(3) == byType(b).size.toLong)
      assert(r.getLong(4) == inter)
      assert(r.getDouble(5) == inter.toDouble
        / (byType(a).size + byType(b).size - inter))
    }
  }

  test("q_ts_decompose matches a brute-force exact-decimal STL-lite " +
      "replay and the components re-sum to the series") {
    val daily = events.groupBy(e => dayOf(e._2))
      .map { case (d, es) => d -> (es.map(e => BigDecimal(e._4)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum,
        es.size.toLong) }
      .toSeq.sortBy(_._1.toEpochDay)
    val byDay = daily.toMap
    def winOf(d: java.time.LocalDate) = daily.filter { case (d2, _) =>
      math.abs(d2.toEpochDay - d.toEpochDay) <= 3 }
    val interior = daily.filter { case (d, _) => winOf(d).size == 7 }
    val seas = interior.groupBy(_._1.getDayOfWeek.getValue)
      .map { case (dow, rows) =>
        val num = rows.map { case (d, (y, _)) =>
          7 * y - winOf(d).map(_._2._1).sum }.sum
        dow -> (num, rows.size.toLong)
      }
    val out = EventAnalytics.queries("q_ts_decompose")(spark, sf).collect()
    assert(out.map(_.getDate(0).toLocalDate).toSet == byDay.keySet)
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val (y, n) = byDay(d)
      val w = winOf(d)
      val trend = w.map(_._2._1).sum.toDouble / w.size
      assert(r.getLong(1) == n, s"$d n_events")
      assert(r.getDouble(2) == y.toDouble, s"$d y")
      assert(r.getDouble(3) == trend, s"$d trend")
      seas.get(d.getDayOfWeek.getValue) match {
        case Some((num, cnt)) =>
          val sv = num.toDouble / (7 * cnt)
          assert(r.getDouble(4) == sv, s"$d seasonal")
          assert(r.getDouble(5) == y.toDouble - trend - sv, s"$d resid")
        case None =>
          assert(r.isNullAt(4) && r.isNullAt(5), s"$d null seasonal")
      }
    }
    // components re-sum to the series (resid is defined as the exact
    // double remainder, so only re-association noise can appear)
    out.filterNot(_.isNullAt(5)).foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3) - r.getDouble(4)
        - r.getDouble(5)) < 1e-9)
    }
  }

  test("q_anomaly_stl medians/flags replay from the verified decompose " +
      "residuals") {
    val dec = EventAnalytics.queries("q_ts_decompose")(spark, sf)
      .collect()
      .filterNot(_.isNullAt(5))
      .map(r => r.getDate(0).toLocalDate -> r.getDouble(5))
    assume(dec.length >= 3)
    def med2(xs: Seq[(java.time.LocalDate, Double)]): Double = {
      val sorted = xs.sortBy { case (d, v) => (v, d.toEpochDay) }
      val n = sorted.size
      val picks = Seq((n + 1) / 2, (n + 2) / 2).distinct
        .map(i => sorted(i - 1)._2)
      picks.map(v => BigDecimal(v)
          .setScale(7, BigDecimal.RoundingMode.HALF_UP)).sum
        .doubleValue / picks.size
    }
    val med = med2(dec.toSeq)
    val devs = dec.map { case (d, r) => d -> math.abs(r - med) }
    val mad = med2(devs.toSeq)
    val out = EventAnalytics.queries("q_anomaly_stl")(spark, sf).collect()
    assert(out.map(_.getDate(0).toLocalDate).toSet == dec.map(_._1).toSet)
    val devMap = devs.toMap
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getDouble(2) == med, s"$d med")
      assert(r.getDouble(3) == mad, s"$d mad")
      assert(r.getDouble(4) == devMap(d), s"$d adev")
      assert(r.getBoolean(5) == (devMap(d) > mad * 3), s"$d flag")
    }
    // the 3-MAD gate must separate: not everything flagged
    assert(out.count(_.getBoolean(5)) < out.length)
  }

  test("q_ts_ewma matches brute-force dyadic-weight smoothing") {
    val out = EventAnalytics.queries("q_ts_ewma")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val daily = events.groupBy(e => (e._3, dayOf(e._2)))
      .map { case (k, es) => k -> es.size.toLong }
    assert(out.keySet == daily.keySet.map { case (t, d) => (t, d) })
    daily.foreach { case ((typ, day), x) =>
      val terms = (0 to 15).flatMap { k =>
        daily.get((typ, day.minusDays(k.toLong)))
          .map(xk => (xk * (1.0 / (1L << (k + 1)).toDouble),
            1.0 / (1L << (k + 1)).toDouble))
      }
      val (ox, oe) = out((typ, day))
      assert(ox == x, s"count for $typ $day")
      assert(oe == terms.map(_._1).sum / terms.map(_._2).sum,
        s"ewma for $typ $day")
    }
  }

  test("q_event_entropy matches brute-force Shannon entropy of the " +
    "hour-of-day histogram") {
    val out = EventAnalytics.queries("q_event_entropy")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val byType = events.groupBy(_._3)
    assert(out.keySet == byType.keySet)
    val log2 = math.log(2.0)
    byType.foreach { case (typ, evs) =>
      val hours = evs.groupBy(e =>
        e._2.toInstant.atZone(java.time.ZoneOffset.UTC).getHour)
        .map(_._2.size)
      val n = evs.size
      val h = math.log(n.toDouble) / log2 -
        hours.map(c => c * math.log(c.toDouble) / log2).sum / n
      val (on, oh, oe) = out(typ)
      assert(on == n && oh == hours.size, s"$typ counts")
      // the portable series truncates below 2e-7 per log2 call
      assert(math.abs(oe - h) < 1e-5, s"$typ entropy $oe vs $h")
      assert(oe >= -1e-9 &&
        oe <= math.log(24.0) / log2 + 1e-9, s"$typ range")
    }
  }

  test("q_ts_mann_kendall S equals the brute-force concordance count " +
    "on exact daily decimals") {
    val out = EventAnalytics.queries("q_ts_mann_kendall")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val daily = events.groupBy(e => (e._3, dayOf(e._2)))
      .map { case (k, es) => k -> es.map(e => BigDecimal(e._4)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum }
    val byType = daily.groupBy(_._1._1)
    assert(out.keySet == byType.keySet)
    byType.foreach { case (typ, m) =>
      val ys = m.toSeq.sortBy(_._1._2.toEpochDay).map(_._2)
      val n = ys.size
      val sStat = (for { i <- 0 until n; j <- i + 1 until n }
        yield (ys(j) - ys(i)).signum.toLong).sum
      val (on, os, ov, ot) = out(typ)
      assert(on == n && os == sStat, s"$typ S")
      assert(ov == n.toLong * (n - 1) * (2L * n + 5), s"$typ var")
      assert(ot == (18L * sStat * math.abs(sStat)).toDouble / ov.toDouble,
        s"$typ score")
    }
  }

  test("q_ts_fano matches brute-force daily-count dispersion moments") {
    // var_num is a DOUBLE since the r12 overflow sweep (the exact
    // DECIMAL(38,0) moment routed through VARCHAR) — the brute force
    // recomputes the same exact integer and compares its double image
    val out = EventAnalytics.queries("q_ts_fano")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val byType = events.groupBy(_._3)
    assert(out.keySet == byType.keySet)
    byType.foreach { case (typ, evs) =>
      val daily = evs.groupBy(e => dayOf(e._2)).map(_._2.size.toLong)
      val n = daily.size.toLong
      val tot = daily.sum
      val sxx = daily.map(x => BigInt(x) * BigInt(x)).sum
      val varNum = BigInt(n) * sxx - BigInt(tot) * BigInt(tot)
      val (on, ot, ov, of) = out(typ)
      assert(on == n && ot == tot && ov == varNum.toDouble,
        s"$typ moments")
      assert(of == varNum.toDouble / (BigInt(n) * BigInt(tot)).toDouble,
        s"$typ fano")
      assert(of >= 0.0, s"$typ nonneg")
    }
  }

  test("q_ts_seasonality_strength matches the quantized variance " +
    "ratios recomputed from the decomposition") {
    val r = EventAnalytics.queries("q_ts_seasonality_strength")(spark, sf)
      .collect().head
    val dec = EventAnalytics.queries("q_ts_decompose")(spark, sf)
      .collect().filter(!_.isNullAt(5))
      .map(x => (x.getDouble(3), x.getDouble(4), x.getDouble(5)))
    def q7(v: Double): BigInt = BigInt(BigDecimal(v)
      .setScale(7, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(10000000)).toBigInt.toString)
    val ri = dec.map { case (_, _, rr) => q7(rr) }
    val ti = dec.map { case (tr, _, rr) => q7(tr + rr) }
    val si = dec.map { case (_, se, rr) => q7(se + rr) }
    val n = BigInt(dec.length)
    def varNum(xs: Seq[BigInt]): BigInt =
      n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val expT = math.max(0.0,
      1.0 - varNum(ri).toDouble / varNum(ti).toDouble)
    val expS = math.max(0.0,
      1.0 - varNum(ri).toDouble / varNum(si).toDouble)
    assert(r.getLong(0) == dec.length.toLong)
    assert(r.getDouble(1) == expT, "strength_trend")
    assert(r.getDouble(2) == expS, "strength_seasonal")
    assert(r.getDouble(1) <= 1.0 && r.getDouble(2) <= 1.0)
  }

  test("q_ts_ccf matches brute-force centered cross-products at every " +
    "lag") {
    val out = EventAnalytics.queries("q_ts_ccf")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getDouble(3))).toMap
    val daily = events.filter(e => e._3 == "click" || e._3 == "purchase")
      .groupBy(e => dayOf(e._2))
      .map { case (d0, es) => d0 ->
        (es.count(_._3 == "click").toLong,
          es.count(_._3 == "purchase").toLong) }
    val nd = daily.size.toLong
    val sx = daily.values.map(_._1).sum
    val sy = daily.values.map(_._2).sum
    val cent = daily.map { case (d0, (x, y)) =>
      d0 -> (x * nd - sx, y * nd - sy) }
    val dx = cent.values.map(c => BigInt(c._1) * c._1).sum
    val dy = cent.values.map(c => BigInt(c._2) * c._2).sum
    assert(out.keySet == (-7L to 7L).toSet)
    (-7L to 7L).foreach { lag =>
      val pairs = cent.toSeq.flatMap { case (d0, (cx, _)) =>
        cent.get(d0.plusDays(lag)).map(c2 => (cx, c2._2)) }
      val num = pairs.map { case (cx, cy) => BigInt(cx) * cy }.sum
      val (np, ns, r2) = out(lag)
      assert(np == pairs.size.toLong, s"lag $lag pairs")
      assert(ns == num.toString, s"lag $lag num")
      val numd = num.toDouble
      val exp = numd * numd * (if (num < 0) -1.0 else 1.0) /
        (dx.toDouble * dy.toDouble)
      assert(r2 == exp, s"lag $lag r2")
    }
  }

  test("q_event_gini matches the sorted brute-force Gini and stays " +
    "in [0, 1)") {
    val r = EventAnalytics.queries("q_event_gini")(spark, sf)
      .collect().head
    val counts = events.groupBy(_._1).map(_._2.size.toLong).toSeq.sorted
    val n = counts.size.toLong
    val tot = counts.sum
    val six = counts.zipWithIndex
      .map { case (x, i) => (i + 1).toLong * x }.sum
    val num = 2 * six - (n + 1) * tot
    val den = n * tot
    assert(r.getLong(0) == n && r.getLong(1) == tot)
    assert(r.getString(2) == num.toString)
    assert(r.getString(3) == den.toString)
    assert(r.getDouble(4) == num.toDouble / den.toDouble)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }

  /** Daily (day → (count, exact 10⁴-scaled value sum)) per event_type. */
  private def dailyByType: Map[String, Seq[(String, Long, BigInt)]] = {
    val rows = Tables.table(spark, sf, "events")
      .select(col("event_type"), to_date(col("ts")).cast("string")
        .as("day"), col("value").cast("decimal(18,4)").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        BigInt(r.getDecimal(2).movePointRight(4).toBigIntegerExact)))
    rows.groupBy(_._1).view.mapValues { evs =>
      evs.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (day, g) =>
          (day, g.length.toLong, g.map(_._3).sum)
        }
    }.toMap
  }

  test("q_stats_durbin_watson equals a plain-Scala exact-integer " +
      "replay and sits in [0, 4]") {
    val out = EventAnalytics.queries("q_stats_durbin_watson")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val byType = dailyByType
    assert(out.keySet == byType.keySet)
    byType.foreach { case (ty, daily) =>
      val nd = daily.length.toLong
      val stot = daily.map(_._3).sum
      val rr = daily.map { case (_, _, svi) => svi * nd - stot }
      val den = rr.map(x => x * x).sum
      val num = rr.sliding(2).collect { case Seq(a, b) =>
        (b - a) * (b - a) }.sum
      val r = out(ty)
      assert(r.getAs[Long]("n_days") == nd, s"$ty n_days")
      val dw = BigDecimal(num).toDouble / BigDecimal(den).toDouble
      assert(r.getAs[Double]("dw_stat") == dw, s"$ty dw")
      assert(dw >= 0.0 && dw <= 4.0, s"$ty dw in range")
    }
  }

  /** Centered daily-count grid shared by the ACF-family replays. */
  private def centeredDaily: (Long, Seq[(String, BigInt)], BigInt) = {
    val days = events.groupBy(e => e._2.toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString)
      .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val nd = days.length.toLong
    val sx = days.map(_._2).sum
    val cent = days.map { case (d, x) => d -> BigInt(x * nd - sx) }
    val den = cent.map { case (_, c) => c * c }.sum
    (nd, cent, den)
  }

  private def lagNum(cent: Seq[(String, BigInt)], k: Int): BigInt = {
    val m = cent.toMap
    cent.map { case (d, c) =>
      val d2 = java.time.LocalDate.parse(d).plusDays(k).toString
      m.get(d2).map(_ * c).getOrElse(BigInt(0))
    }.sum
  }

  test("q_ts_ljung_box equals a plain-Scala common-denominator replay " +
      "and Q is non-negative") {
    val (nd, cent, den) = centeredDaily
    val pAll = (1 to 7).map(k => BigInt(nd - k)).product
    val sSum = (1 to 7).map { k =>
      val num = lagNum(cent, k)
      num * num * (pAll / BigInt(nd - k))
    }.sum
    val qNum = BigInt(nd) * BigInt(nd + 2) * sSum
    val qDen = den * den * pAll
    val q = BigDecimal(qNum).toDouble / BigDecimal(qDen).toDouble
    val r = EventAnalytics.queries("q_ts_ljung_box")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_days") == nd)
    assert(r.getAs[Long]("n_lags") == 7L)
    assert(r.getAs[Double]("q_stat") == q)
    assert(q >= 0.0)
  }

  test("q_ts_acf_bands carries the autocorr ACF verbatim with the " +
      "white-noise band and correct flags") {
    val acf = EventAnalytics.queries("q_ts_autocorr")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val nd = events.map(_._2.toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate).distinct.size
    val band = 1.96 / math.sqrt(nd.toDouble)
    val out = EventAnalytics.queries("q_ts_acf_bands")(spark, sf)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 7L))
    out.foreach { r =>
      assert(r.getDouble(2) == acf(r.getLong(0)), s"lag ${r.getLong(0)}")
      assert(r.getDouble(3) == band)
      assert(r.getBoolean(4) == (math.abs(r.getDouble(2)) > band))
    }
  }

  test("q_ts_max_drawdown equals a plain-Scala peak-trough replay " +
      "and is non-negative") {
    val byType = dailyByType
    val out = EventAnalytics.queries("q_ts_max_drawdown")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == byType.keySet)
    byType.foreach { case (ty, daily) =>
      val nd = daily.length.toLong
      val stot = daily.map(_._3).sum
      val rr = daily.map { case (_, _, svi) => svi * nd - stot }
      var cum = BigInt(0); var peak = BigInt(0); var dd = BigInt(0)
      var first = true
      rr.foreach { r =>
        cum += r
        if (first) { peak = cum; first = false }
        else if (cum > peak) peak = cum
        if (peak - cum > dd) dd = peak - cum
      }
      val r = out(ty)
      assert(r.getAs[Long]("n_days") == nd, s"$ty n_days")
      val expect = BigDecimal(dd).toDouble / (10000.0 * nd.toDouble)
      assert(r.getAs[Double]("max_drawdown") == expect, s"$ty dd")
      assert(expect >= 0.0, s"$ty non-negative")
    }
  }

  test("q_window_hampel equals a frame replay; flagged points are " +
      "exactly the 3-MAD violators") {
    val rows = Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("tsu"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val out = EventAnalytics.queries("q_window_hampel")(spark, sf)
      .collect().map(r => r.getLong(1) -> r).toMap
    var outliers = 0
    rows.groupBy(_._1).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2)).toSeq
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._4)
        val med = frame.sorted.apply((frame.length + 1) / 2 - 1)
        val devs = frame.map(v => math.abs(v - med))
        val mad = devs.sorted.apply((devs.length + 1) / 2 - 1)
        val r = out(ordered(i)._2)
        assert(r.getAs[Double]("med") == med, s"ev ${ordered(i)._2}")
        assert(r.getAs[Double]("mad") == mad, s"ev ${ordered(i)._2}")
        val flag = math.abs(ordered(i)._4 - med) > 3.0 * 1.4826 * mad
        assert(r.getAs[Boolean]("is_outlier") == flag)
        if (flag) outliers += 1
      }
    }
    assert(outliers > 0, "fixture exercises the outlier branch")
    assert(outliers < rows.length / 2, "flag is selective")
  }

  test("q_ts_ewm_var equals an exact-dyadic replay and the variance " +
      "identity holds") {
    val daily = events.groupBy(e => (e._3, e._2.toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate))
      .view.mapValues(_.size.toLong).toMap
    val out = EventAnalytics.queries("q_ts_ewm_var")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ty = r.getString(0)
      val day = r.getDate(1).toLocalDate
      // replay: weights 2^-(k+1) over the 16 days ending at `day`
      var num = 0.0; var num2 = 0.0; var wsum = 0.0
      (0 to 15).foreach { k =>
        daily.get((ty, day.minusDays(k))).foreach { x =>
          val w = 1.0 / (1L << (k + 1)).toDouble
          num += x * w; num2 += x * x * w; wsum += w
        }
      }
      val ewma = num / wsum
      val v = num2 / wsum - (num / wsum) * (num / wsum)
      assert(r.getAs[Long]("x") == daily((ty, day)), s"$ty $day x")
      assert(r.getAs[Double]("ewma") == ewma, s"$ty $day ewma")
      assert(r.getAs[Double]("ewm_var") == v, s"$ty $day var")
      assert(r.getAs[Double]("ewm_std") ==
        math.sqrt(math.max(v, 0.0)), s"$ty $day std")
    }
  }

  test("q_ts_control_chart equals an exact-dyadic PRIOR-window replay: " +
      "per type the flag count and max |z| match, and no day is judged " +
      "against a baseline containing itself") {
    val daily = events.groupBy(e => (e._3, e._2.toInstant
      .atZone(java.time.ZoneOffset.UTC).toLocalDate))
      .view.mapValues(_.size.toLong).toMap
    val out = EventAnalytics.queries("q_ts_control_chart")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val byType = daily.keys.groupBy(_._1)
    out.foreach { r =>
      val ty = r.getString(0)
      val zs = byType(ty).toSeq.map(_._2).sorted.flatMap { day =>
        // prior window: days day-16 .. day-1 (k+1 shift — the day
        // itself NEVER contributes to its own baseline)
        var num = 0.0; var num2 = 0.0; var wsum = 0.0
        (1 to 16).foreach { k =>
          daily.get((ty, day.minusDays(k))).foreach { x =>
            val w = 1.0 / (1L << k).toDouble
            num += x * w; num2 += x * x * w; wsum += w
          }
        }
        if (wsum == 0.0) None // first day drops by the inner join
        else {
          val ewma = num / wsum
          val sd = math.sqrt(
            math.max(num2 / wsum - ewma * ewma, 0.0))
          val x = daily((ty, day))
          Some(if (sd > 0.0) Some((x.toDouble - ewma) / sd) else None)
        }
      }
      assert(r.getAs[Long]("n_days") == zs.length.toLong, s"$ty n_days")
      val defined = zs.flatten
      assert(r.getAs[Long]("n_flagged") ==
        defined.count(z => math.abs(z) > 3.0).toLong, s"$ty flags")
      if (defined.nonEmpty)
        assert(r.getAs[Double]("max_abs_z") ==
          defined.map(math.abs).max, s"$ty max_abs_z")
    }
  }

  test("q_markov_2step equals P squared from the one-step matrix and " +
      "rows sum to ~1") {
    val one = EventAnalytics.queries("q_markov_transition")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val out = EventAnalytics.queries("q_markov_2step")(spark, sf)
      .collect()
    val states = one.keys.flatMap(k => Seq(k._1, k._2)).toSet
    out.foreach { r =>
      val (i, k) = (r.getString(0), r.getString(1))
      val terms = states.toSeq.flatMap { j =>
        for {
          (nij, ri) <- one.get((i, j))
          (njk, rj) <- one.get((j, k))
        } yield math.floor(nij.toDouble * njk.toDouble /
          (ri.toDouble * rj.toDouble) * 1e12 + 0.5).toLong
      }
      assert(r.getAs[Long]("n_paths") == terms.length.toLong,
        s"$i->$k paths")
      assert(r.getAs[Long]("q2") == terms.sum, s"$i->$k q2")
      assert(r.getAs[Double]("p2") == terms.sum.toDouble / 1e12)
    }
    // each originating state's two-step row sums to 1 up to the
    // quantization grid (all mid- and end-states present in the fixture)
    out.groupBy(_.getString(0)).foreach { case (i, rows) =>
      val rowSum = rows.map(_.getAs[Double]("p2")).sum
      assert(math.abs(rowSum - 1.0) < 1e-9, s"$i row sum $rowSum")
    }
  }

  test("q_ts_pacf equals the Durbin–Levinson replay over exact ACF " +
      "pieces; pacf1 == r1") {
    val (nd, cent, den) = centeredDaily
    val Seq(n1, n2, n3) = (1 to 3).map(k => lagNum(cent, k))
    val dend = BigDecimal(den).toDouble
    val r1 = BigDecimal(n1).toDouble / dend
    val r2 = BigDecimal(n2).toDouble / dend
    val r3 = BigDecimal(n3).toDouble / dend
    val pacf2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val phi21 = r1 - pacf2 * r1
    val pacf3 = (r3 - phi21 * r2 - pacf2 * r1) /
      (1.0 - phi21 * r1 - pacf2 * r2)
    val r = EventAnalytics.queries("q_ts_pacf")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_days") == nd)
    assert(r.getAs[Double]("r1") == r1 && r.getAs[Double]("r2") == r2
      && r.getAs[Double]("r3") == r3)
    assert(r.getAs[Double]("pacf1") == r1)
    assert(r.getAs[Double]("pacf2") == pacf2)
    assert(r.getAs[Double]("pacf3") == pacf3)
    assert(math.abs(pacf2) <= 1.0 && math.abs(pacf3) <= 1.0)
  }
}
