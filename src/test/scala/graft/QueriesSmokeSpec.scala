package graft

/** Contract smoke: every declared query runs on sf0.001, returns a
  * non-degenerate schema, and every oracle key refers to a real query.
  * (Value-level correctness is gated by scripts/check_oracle.py against
  * DuckDB — this spec guards the contract shape itself.) */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("only the declared no-oracle query (HLL sketch) lacks oracle SQL") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == Set("q_agg_approx_distinct"))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is non-degenerate on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (name != "q_join_anti") // anti join is legitimately empty here
        assert(n > 0, s"$name returned zero rows")
    }
  }
}
