package graft

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer

/** Per-query cache lifetime scope.
  *
  * Several query builders persist an intermediate frame that is consumed
  * by 2+ downstream subtrees within the SAME query (e.g. q_basket_pairs'
  * order-item lists, the curation pipelines' `kept`/`losers` slivers, the
  * BPE word/pair frames, BFS frontiers). Those persists are correct
  * within one query but used to outlive it: nothing released them after
  * the terminal action, so a full 3×300 interleaved bench accumulated
  * every within-query cache of every query, and late queries paid the
  * eviction pressure of early ones (BENCH_r08: q_basket_pairs 5.17 s
  * full-suite vs 2.04 s solo — same plan, just cache-starved executors).
  * On a real cluster the same leak would pin executor storage memory
  * across unrelated jobs sharing a long-lived session.
  *
  * Design: builders call `.persistScoped()` instead of `.persist()`. If a
  * scope is open on the calling thread, the dataset is registered and the
  * scope's closer unpersists it (non-blocking) after the terminal action;
  * with no scope open (unit tests, ad-hoc REPL use) it degrades to a
  * plain `.persist()` with unchanged semantics. The runner-side wrapper
  * (`Bench`) opens one scope per query run, so fixture/table caches —
  * which are persisted OUTSIDE any scope — are never touched. This is
  * deliberately NOT `spark.catalog.clearCache()`, which would also drop
  * the warm fixture caches the bench protocol relies on.
  *
  * Thread-local is sufficient: query builders construct plans and run
  * their bounded internal actions on the caller's thread (Spark's own
  * task threads never call these builders).
  */
object CacheScope {
  private val current = new ThreadLocal[ArrayBuffer[Dataset[_]]]

  /** Register an already-persisted dataset with the open scope (no-op
    * when no scope is open). */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    val buf = current.get()
    if (buf != null) buf += ds
    ds
  }

  /** Run `body` with a fresh scope; afterwards unpersist everything the
    * body registered, in reverse registration order (dependents first),
    * non-blocking. Nested scopes release only their own registrations. */
  def scoped[T](body: => T): T = {
    val outer = current.get()
    val buf = ArrayBuffer.empty[Dataset[_]]
    current.set(buf)
    try body
    finally {
      if (outer == null) current.remove() else current.set(outer)
      buf.reverseIterator.foreach { ds =>
        // best-effort per dataset (one failed unpersist must not strand
        // the rest), but NOT Throwable: fatal VM errors propagate, and a
        // thread interrupt re-sets the flag instead of being swallowed
        try ds.unpersist(blocking = false)
        catch {
          case _: InterruptedException =>
            Thread.currentThread().interrupt()
          case scala.util.control.NonFatal(_) => ()
        }
      }
    }
  }

  implicit class ScopedPersist[T](private val ds: Dataset[T])
      extends AnyVal {
    /** `persist()` whose lifetime ends with the enclosing
      * [[CacheScope.scoped]] block (plain persist when none is open). */
    def persistScoped(): Dataset[T] = register(ds.persist())
  }
}
