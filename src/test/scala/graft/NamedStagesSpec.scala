package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.storage.StorageLevel

/** Lifetime semantics of the named-stage tier (between fixture caches
  * and CacheScope's per-query persists): build-once, explicit
  * invalidation, CacheScope non-interference. */
class NamedStagesSpec extends SparkSpec {
  import spark.implicits._

  test("stage builds once, returns the same cached frame, and " +
      "invalidate forces a rebuild") {
    val builds = new AtomicInteger(0)
    def build = {
      builds.incrementAndGet()
      spark.range(100).toDF("id")
    }
    val a = NamedStages.stage(spark, "spec_once")(build)
    val b = NamedStages.stage(spark, "spec_once")(build)
    assert(builds.get() == 1, "second call must not rebuild")
    assert(a eq b, "later calls return the SAME frame")
    assert(a.storageLevel != StorageLevel.NONE, "stage must be persisted")
    assert(NamedStages.names(spark).contains("spec_once"))
    assert(NamedStages.invalidate(spark, "spec_once"))
    assert(!NamedStages.invalidate(spark, "spec_once"), "already gone")
    NamedStages.stage(spark, "spec_once")(build)
    assert(builds.get() == 2, "invalidate must force a rebuild")
    NamedStages.invalidate(spark, "spec_once")
  }

  test("stages are materialized eagerly and survive a CacheScope " +
      "close (they are NOT per-query state)") {
    val st = CacheScope.scoped {
      val s = NamedStages.stage(spark, "spec_scope")(
        spark.range(50).select(($"id" * 2).as("x")))
      assert(s.storageLevel != StorageLevel.NONE)
      s
    }
    // the scope closed; a named stage must still be cached
    assert(st.storageLevel != StorageLevel.NONE,
      "CacheScope must not release a named stage")
    assert(NamedStages.invalidate(spark, "spec_scope"))
    assert(st.storageLevel == StorageLevel.NONE)
  }

  test("clearAll drops every stage of the session") {
    NamedStages.stage(spark, "spec_a")(spark.range(5).toDF("id"))
    NamedStages.stage(spark, "spec_b")(spark.range(6).toDF("id"))
    assert(NamedStages.names(spark).intersect(Set("spec_a", "spec_b"))
      == Set("spec_a", "spec_b"))
    NamedStages.clearAll(spark)
    assert(NamedStages.names(spark).isEmpty)
  }

  test("the engine's stage-backed accessors return identical results " +
      "to a fresh unstaged build (q_dedup_pairs is the oracle-proven " +
      "LSH chain)") {
    import org.apache.spark.sql.functions._
    NamedStages.clearAll(spark)
    val staged = graft.operators.Corpus.nearDupPairs(spark, sf)
      .orderBy("id_a", "id_b").collect().toSeq
    val fresh = graft.operators.TextDedup
      .nearDuplicates(Tables.table(spark, sf, "documents"))
      .orderBy(asc("id_a"), asc("id_b")).collect().toSeq
    assert(staged == fresh)
    NamedStages.clearAll(spark)
  }
}
