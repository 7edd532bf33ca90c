package graft

/** Locks the performance-critical physical-plan shapes: a regression that
  * silently turns a broadcast into a shuffle, drops parquet pushdown, or
  * loses the bounded top-k heaps would pass value-level tests but destroy
  * 100 TB behavior — so the plans themselves are asserted. */
class PlanRegressionSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_scan_pruned pushes filter and projection into the parquet scan") {
    val p = plan("q_scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_linenumber:int,l_shipdate:timestamp"))
  }

  test("q_join_broadcast plans a broadcast hash join (no fact shuffle)") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_agg_hash plans partial then final hash aggregation") {
    val p = plan("q_agg_hash")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_topk_per_group plans bounded WindowGroupLimit heaps") {
    assert("WindowGroupLimit".r.findAllIn(plan("q_topk_per_group"))
      .size >= 2) // partial below the exchange + final above
  }

  test("q_sort_limit plans TakeOrderedAndProject (no global sort)") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("no declared query plans a CartesianProduct") {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }
}
