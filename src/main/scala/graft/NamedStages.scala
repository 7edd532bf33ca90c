package graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
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
  * leak (it has a name, a storage level, an invalidation API, and —
  * since r14 — a per-name build-seconds record the bench publishes) and
  * not per-query state (CacheScope never touches it, because stages
  * persist outside any scope's registration).
  *
  * Semantics:
  *   - `stage(spark, name)(build)`: get-or-materialize. The FIRST call
  *     runs `build` and materializes it EAGERLY (see the two media
  *     below), so the stage never half-builds under a later consumer
  *     and every consumer plans against a truncated leaf (LogicalRDD or
  *     a parquet scan), not the build chain. Later calls return the
  *     SAME materialized frame.
  *   - `invalidate(spark, name)` / `clearAll(spark)`: release + forget
  *     — the refresh hook when the underlying table changes
  *     (the q_snapshot_ivm algebra is the incremental-refresh story;
  *     this layer is the full-rebuild one). Release covers BOTH the
  *     cache-manager entry (df.unpersist) and the localCheckpoint
  *     block storage (rdd.unpersist — r13 ADVICE: checkpoint blocks are
  *     otherwise only freed when the GC collects the RDD), asserted by
  *     NamedStagesSpec.
  *
  * Storage media (r14, verdict item 7):
  *   - DEFAULT: `localCheckpoint(eager = true)` — MEMORY_AND_DISK
  *     executor-local blocks, plan truncated to a LogicalRDD. Fast and
  *     right for local mode, but deliberately NOT fault-tolerant: the
  *     truncated lineage cannot be recomputed, so on a real cluster an
  *     executor loss fails every consumer of the stage until it is
  *     invalidated and rebuilt, and it interacts poorly with dynamic
  *     allocation (executors holding blocks cannot be released).
  *   - RELIABLE: set `spark.graft.stageDir` (session conf) or
  *     `SPARK_GRAFT_STAGE_DIR` (env) to a writable directory and the
  *     stage materializes as parquet under it and is read back — the
  *     100 TB medium (survives executor loss, shareable across jobs,
  *     compactable), at the cost of one write+read through the
  *     filesystem. Identical rows both ways (NamedStagesSpec toggles
  *     the seam and compares).
  */
object NamedStages {

  private case class Entry(df: DataFrame, cpRdd: Option[RDD[_]],
      buildSec: Double)

  private val stages =
    mutable.Map.empty[(SparkSession, String), Entry]

  /** The reliable-storage root, if configured (conf wins over env). */
  private def stageDir(spark: SparkSession): Option[String] =
    spark.conf.getOption("spark.graft.stageDir")
      .orElse(sys.env.get("SPARK_GRAFT_STAGE_DIR"))
      .filter(_.nonEmpty)

  /** Filesystem-safe directory name for a stage key (stage names embed
    * the fixture path, e.g. "curate_clean:/root/testdata/sf0.1"); the
    * hash suffix keeps distinct keys distinct after sanitization. */
  private def pathFor(root: String, name: String): String = {
    val safe = name.map(c => if (c.isLetterOrDigit) c else '_')
    f"$root/${safe}_${name.hashCode & 0xffffffffL}%08x"
  }

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
    * unchanged — the same materialized rows are read back. */
  def stage(spark: SparkSession, name: String)
      (build: => DataFrame): DataFrame = synchronized {
    stages.getOrElseUpdate((spark, name), {
      val t0 = System.nanoTime()
      val entry = stageDir(spark) match {
        case Some(root) =>
          val path = pathFor(root, name)
          build.write.mode("overwrite").parquet(path)
          Entry(spark.read.parquet(path), None,
            (System.nanoTime() - t0) / 1e9)
        case None =>
          val cp = build.localCheckpoint(eager = true)
          // the checkpoint blocks belong to the RDD inside the
          // truncated plan; keep a handle so invalidate can release
          // them (df.unpersist alone only clears the cache manager)
          val rdd = cp.queryExecution.optimizedPlan.collectFirst {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }
          Entry(cp, rdd, (System.nanoTime() - t0) / 1e9)
      }
      entry
    }).df
  }

  /** Drop one stage (release storage + forget). Returns true if it
    * existed. */
  def invalidate(spark: SparkSession, name: String): Boolean =
    synchronized {
      stages.remove((spark, name)).exists { e =>
        e.df.unpersist(blocking = false)
        e.cpRdd.foreach(_.unpersist(blocking = false))
        true
      }
    }

  /** Drop every stage of a session. */
  def clearAll(spark: SparkSession): Unit = synchronized {
    stages.keys.filter(_._1 eq spark).toSeq.foreach { k =>
      stages.remove(k).foreach { e =>
        e.df.unpersist(blocking = false)
        e.cpRdd.foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Names of the session's live stages (diagnostics). */
  def names(spark: SparkSession): Set[String] = synchronized {
    stages.keys.collect { case (s, n) if s eq spark => n }.toSet
  }

  /** Wall-clock build seconds per live stage of the session — published
    * by the bench ("stages" field in bench_out.json) so the amortized
    * (first-consumer) share of stage costs stays auditable next to the
    * per-query best-of-3 floors (r13 verdict item 3). */
  def buildSeconds(spark: SparkSession): Map[String, Double] =
    synchronized {
      stages.collect { case ((s, n), e) if s eq spark =>
        n -> e.buildSec
      }.toMap
    }
}
