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
}
