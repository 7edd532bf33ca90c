package graft

import java.util.concurrent.atomic.AtomicInteger


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
    // r13: stages materialize via localCheckpoint — the observable
    // contract is a TRUNCATED plan over materialized blocks (LogicalRDD),
    // not a cache-manager entry
    assert(a.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD],
      "stage must hand consumers a lineage-truncated materialization")
    assert(NamedStages.names(spark).contains("spec_once"))
    assert(NamedStages.invalidate(spark, "spec_once"))
    assert(!NamedStages.invalidate(spark, "spec_once"), "already gone")
    NamedStages.stage(spark, "spec_once")(build)
    assert(builds.get() == 2, "invalidate must force a rebuild")
    NamedStages.invalidate(spark, "spec_once")
  }

  test("stages are materialized eagerly and survive a CacheScope " +
      "close (they are NOT per-query state)") {
    val builds = new AtomicInteger(0)
    val st = CacheScope.scoped {
      NamedStages.stage(spark, "spec_scope") {
        builds.incrementAndGet()
        spark.range(50).select(($"id" * 2).as("x"))
      }
    }
    assert(builds.get() == 1, "eager: the build ran inside stage()")
    // the scope closed; a named stage must still serve the materialized
    // frame without re-running the build
    assert(NamedStages.stage(spark, "spec_scope") {
      builds.incrementAndGet()
      spark.range(50).select(($"id" * 2).as("x"))
    } eq st, "CacheScope must not release a named stage")
    assert(builds.get() == 1)
    assert(st.count() == 50L, "blocks readable after scope close")
    assert(NamedStages.invalidate(spark, "spec_scope"))
  }

  test("clearAll drops every stage of the session") {
    NamedStages.stage(spark, "spec_a")(spark.range(5).toDF("id"))
    NamedStages.stage(spark, "spec_b")(spark.range(6).toDF("id"))
    assert(NamedStages.names(spark).intersect(Set("spec_a", "spec_b"))
      == Set("spec_a", "spec_b"))
    NamedStages.clearAll(spark)
    assert(NamedStages.names(spark).isEmpty)
  }

  test("invalidate releases the localCheckpoint block storage, not " +
      "just the cache-manager entry (r13 ADVICE)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    NamedStages.stage(spark, "spec_blocks")(spark.range(1000).toDF("id"))
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty,
      "the stage's checkpoint RDD must be registered as persistent")
    NamedStages.invalidate(spark, "spec_blocks")
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"invalidate must unpersist the checkpoint RDD blocks, leaked: $after")
  }

  test("stage build seconds are recorded per name for the bench record") {
    NamedStages.clearAll(spark)
    NamedStages.stage(spark, "spec_secs")(spark.range(10).toDF("id"))
    val secs = NamedStages.buildSeconds(spark)
    assert(secs.contains("spec_secs") && secs("spec_secs") >= 0.0)
    NamedStages.clearAll(spark)
    assert(NamedStages.buildSeconds(spark).isEmpty,
      "released stages must leave the build-seconds record")
  }

  test("the reliable-storage seam (spark.graft.stageDir) materializes " +
      "to parquet with identical rows and plan-truncates to a scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stage_seam").toString
    val data = spark.range(100).select(($"id" % 7).as("k"), $"id")
    val cp = NamedStages.stage(spark, "spec_seam_cp")(data)
    spark.conf.set("spark.graft.stageDir", dir)
    try {
      val pq = NamedStages.stage(spark, "spec_seam_pq")(data)
      assert(!pq.queryExecution.analyzed.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD],
        "stageDir stages must NOT be executor-local checkpoint blocks")
      assert(pq.queryExecution.executedPlan.toString.contains("Parquet"),
        "stageDir stages must read back from parquet")
      assert(cp.orderBy("id").collect().toSeq
        == pq.orderBy("id").collect().toSeq,
        "identical rows through either medium")
    } finally {
      spark.conf.unset("spark.graft.stageDir")
      NamedStages.invalidate(spark, "spec_seam_cp")
      NamedStages.invalidate(spark, "spec_seam_pq")
    }
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
