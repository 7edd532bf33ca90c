package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped NAMED materialized stages — the cache tier between
  * fixture tables (persisted for a whole session) and
  * [[CacheScope]]'s within-query persists (released after each
  * query's terminal action).
  *
  * Why it exists: several query families share one expensive sub-plan —
  * the curation family and every dup-graph loop re-derive the SAME
  * LSH chain (MinHash signatures → band buckets → verified near-dup
  * pairs) from the documents table. Under per-query CacheScope each
  * query honestly pays that chain again (r9's protocol fix); but in a
  * real nightly pipeline the verified-pairs frame is computed ONCE and
  * every downstream job reads it. A named stage is exactly that: an
  * explicitly-keyed, explicitly-invalidated materialization the first
  * consumer builds and later consumers reuse — not a silent cache
  * leak (it has a name, a storage level, and an invalidation API) and
  * not per-query state (CacheScope never touches it, because stages
  * persist outside any scope's registration).
  *
  * Semantics:
  *   - `stage(spark, name)(build)`: get-or-materialize. The FIRST call
  *     runs `build` and materializes it EAGERLY via localCheckpoint
  *     (memory-and-disk blocks: a stage outliving queries must spill,
  *     not evict silently; builder-internal scoped persists are still
  *     alive while it fills), so the stage never half-builds under a
  *     later consumer and every consumer plans against the truncated
  *     LogicalRDD, not the build chain. Later calls return the SAME
  *     materialized frame.
  *   - `invalidate(spark, name)` / `clearAll(spark)`: unpersist +
  *     forget — the refresh hook when the underlying table changes
  *     (the q_snapshot_ivm algebra is the incremental-refresh story;
  *     this layer is the full-rebuild one).
  *
  * At 100 TB the same seam holds with a different medium: a stage this
  * hot would materialize to parquet/bucketed tables rather than
  * executor storage — the accessor signature (name → DataFrame) is
  * what the rest of the engine depends on, not the storage choice.
  */
object NamedStages {

  private val stages =
    mutable.Map.empty[(SparkSession, String), DataFrame]

  /** Get-or-materialize the named stage. `build` runs at most once per
    * (session, name) until invalidated.
    *
    * r13 OPTIMIZATION (guide §3.3 "materialising an intermediate
    * truncates the plan" / §7.3 planning stalls): the stage
    * materializes via `localCheckpoint` (same MEMORY_AND_DISK storage
    * as the previous persist+count) instead of persist+count, so the
    * frame handed to consumers carries a TRUNCATED logical plan
    * (LogicalRDD) rather than the full build chain. Under
    * persist+count every consumer re-analyzed, re-optimized and — with
    * AQE — re-planned the entire LSH/curation subtree per query even
    * though execution hit the cache (measured: a 1.9 s driver-side
    * planning stall inside warm q_corpus_curate_v3, 0.2–1.6 s
    * construction time on every dup-graph consumer). Execution is
    * unchanged — the same materialized rows are read back. On
    * invalidate, the checkpoint blocks are released by the
    * ContextCleaner once the frame is unreferenced (the unpersist
    * below covers the cache-manager entry if any); at 100 TB the same
    * seam materializes to parquet/bucketed tables, as before. */
  def stage(spark: SparkSession, name: String)
      (build: => DataFrame): DataFrame = synchronized {
    stages.getOrElseUpdate((spark, name), {
      build.localCheckpoint(eager = true)
    })
  }

  /** Drop one stage (unpersist + forget). Returns true if it existed. */
  def invalidate(spark: SparkSession, name: String): Boolean =
    synchronized {
      stages.remove((spark, name)).exists { df =>
        df.unpersist(blocking = false); true
      }
    }

  /** Drop every stage of a session. */
  def clearAll(spark: SparkSession): Unit = synchronized {
    stages.keys.filter(_._1 eq spark).toSeq.foreach { k =>
      stages.remove(k).foreach(_.unpersist(blocking = false))
    }
  }

  /** Names of the session's live stages (diagnostics). */
  def names(spark: SparkSession): Set[String] = synchronized {
    stages.keys.collect { case (s, n) if s eq spark => n }.toSet
  }
}
