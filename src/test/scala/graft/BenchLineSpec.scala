package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench stdout contract: the driver's capture is a 2000-char
  * tail ring buffer (BENCH_r02.json: a valid 2339-char JSON line still
  * parsed as null), so the printed line must stay under 1900 chars with
  * every declared query present under an injective abbreviated name. */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet

  test("abbreviation is injective over the declared query set") {
    val byAbbr = names.groupBy(Bench.abbr)
    val clashes = byAbbr.filter(_._2.size > 1)
    assert(clashes.isEmpty, s"abbr collisions: $clashes")
  }

  test("abbreviated names stay identifiable (non-empty, <= 16 chars)") {
    names.foreach { n =>
      val a = Bench.abbr(n)
      assert(a.nonEmpty && a.length <= 16, s"$n -> $a")
    }
  }

  test("worst-case stdout line fits the driver's 2000-char tail buffer") {
    // worst case under the adaptive value format (2dp <10s, 1dp <100s,
    // 0dp above): at most 4 chars per value below 1000 s
    val qs = names.toSeq.sorted
      .map(n => "\"" + Bench.abbr(n) + "\":99.9").mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":9999.99,"unit":"sec","failed":0,"queries":$qs,"sf":"sf0.1"}"""
    assert(line.length < 1900,
      s"bench line ${line.length} chars >= 1900; trim sufMap/famMap in Bench.abbr")
  }
}
