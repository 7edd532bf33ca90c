package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench stdout contract: the driver's capture is a 2000-char
  * tail ring buffer (BENCH_r02.json: a valid 2339-char JSON line still
  * parsed as null), so the line Bench PRINTS must stay under 1992 chars
  * with every abbreviated name injective. The assertions run through
  * [[Bench.stdoutLineFor]] — the exact code path main prints — so the
  * elision fallback is tested, not just hoped correct. */
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

  test("typical-run stdout line fills the tail budget: fits, and elides " +
    "at most a sliver of the fastest queries") {
    // realistic per-query times (sub-10 s → 3-char compact values). The
    // inventory outgrew the ~220-entry capacity of the 2000-char tail
    // channel at round 7, so minimal elision IS the steady state now:
    // the line must still fit and bench_out.json stays the canonical
    // full record. The elision bound scales with the CHANNEL, not the
    // inventory: every abbr is ≤ 2 chars (r8 audit, re-tightened r10),
    // so an entry costs ~9 chars and the 1992-char line mathematically
    // holds ~214 entries (fixed header + a 3-digit elision counter eat
    // the difference from the r8 estimate of 215) — the assert pins
    // "kept ≥ 213" so a code-table regression (longer abbrs, fatter
    // values — each lost entry costs ≥9 chars, i.e. ≥1 kept query)
    // still fails loudly while inventory growth alone does not.
    val results = names.toSeq.sorted.map(n => n -> 1.23)
    val line = Bench.stdoutLineFor(results, 0, "sf0.1")
    assert(line.length < 1992,
      s"bench line ${line.length} chars >= 1992; trim Bench.abbr codes")
    val elided = "\"elided_fast_queries\":(\\d+)".r
      .findFirstMatchIn(line).map(_.group(1).toInt).getOrElse(0)
    assert(names.size - elided >= math.min(names.size, 213),
      s"only ${names.size - elided} of ${names.size} queries on the " +
        "stdout line — trim Bench.abbr codes")
  }

  test("slow-run stdout line still fits at compact-value cap") {
    // every query ≥ 100 s (the 4-char value cap): the full line grows to
    // its maximum and must STILL fit — the elision fallback only exists
    // for inventories the buffer mathematically cannot hold
    val results = names.toSeq.sorted.map(n => n -> 999.9)
    val line = Bench.stdoutLineFor(results, 0, "sf0.1")
    assert(line.length < 1992,
      s"slow-run bench line ${line.length} chars >= 1992")
  }

  test("subset runs are stamped subset:true in BOTH emitted lines; " +
    "full runs carry no marker") {
    // a BENCH_ONLY subset line must never be mistakable for a full
    // round record (ADVICE r6: the comment promised this marker but the
    // code didn't emit it)
    val results = Seq("q_join_interval" -> 0.9)
    val fullFile = Bench.fullLineFor(results, 0, "sf0.1")
    val subFile = Bench.fullLineFor(results, 0, "sf0.1", subset = true)
    val fullOut = Bench.stdoutLineFor(results, 0, "sf0.1")
    val subOut = Bench.stdoutLineFor(results, 0, "sf0.1", subset = true)
    assert(!fullFile.contains("\"subset\"") && !fullOut.contains("\"subset\""))
    assert(subFile.contains("\"subset\":true,\"queries\"") ||
      subFile.contains("\"subset\":true,"))
    assert(subOut.contains("\"subset\":true,"))
  }

  test("oversized inventory elides to slowest-40 but keeps every failure") {
    // synthetic 400-query inventory that cannot fit: the fallback must
    // kick in, keep the -1 failures, and stay inside the buffer
    val results = (1 to 400).map { i =>
      f"q_synthetic_query_number_$i%03d" ->
        (if (i % 50 == 3) -1.0 else 0.1 * (i % 30))
    }
    val nFailed = results.count(_._2 < 0)
    val line = Bench.stdoutLineFor(results, nFailed, "sf0.1")
    assert(line.length < 1992,
      s"elided bench line ${line.length} chars >= 1992")
    assert(line.contains("elided_fast_queries"))
    results.filter(_._2 < 0).foreach { case (n, _) =>
      assert(line.contains("\"" + Bench.abbr(n) + "\":-1"),
        s"failure $n elided from the stdout line")
    }
  }
}
