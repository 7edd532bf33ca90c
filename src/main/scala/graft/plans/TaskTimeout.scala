package graft.plans

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Per-task timeout/cancellation for workflow executions — the engine
  * analogue of the reference's per-task coroutine timeout (tukio cancels
  * the task's coroutine; here the unit of execution is a Spark action, so
  * the timeout cancels the action's JOB GROUP, which aborts all of its
  * running stages cluster-wide).
  *
  * Usage: wrap the ACTION (collect/write/count) of a compiled template,
  * not the lazy DataFrame:
  *
  * {{{
  *   TaskTimeout.runWithTimeout(spark, "tpl-42", 30.seconds_ms) {
  *     compiled.write.parquet(out)
  *   }
  * }}}
  *
  * Scale notes: cancellation is cooperative-but-prompt — `interruptOnCancel`
  * interrupts executor task threads, and Spark aborts remaining stages; no
  * state is left behind because nothing was committed (file sinks commit
  * per-task via the output committer, which rolls back uncommitted
  * attempts). Event-time timeouts for STREAMING state live in
  * [[graft.streaming.Sessionize]]; this class is the batch-side control.
  */
object TaskTimeout {

  final class TaskTimedOutException(groupId: String, ms: Long,
      cause: Throwable = null)
    extends RuntimeException(
      s"task group '$groupId' exceeded its ${ms} ms timeout and was cancelled",
      cause)

  /** Run `action` with the calling thread's jobs tagged as `groupId`;
    * cancel the whole group if it exceeds `timeoutMs`. Throws
    * [[TaskTimedOutException]] on timeout, propagates other failures,
    * and always clears the job group. */
  def runWithTimeout[T](spark: SparkSession, groupId: String,
      timeoutMs: Long)(action: => T): T = {
    val sc = spark.sparkContext
    sc.setJobGroup(groupId, s"graft task $groupId (timeout ${timeoutMs} ms)",
      interruptOnCancel = true)
    @volatile var fired = false
    val watchdog = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, s"graft-timeout-$groupId")
      t.setDaemon(true)
      t
    })
    val cancel = watchdog.schedule(new Runnable {
      override def run(): Unit = {
        fired = true
        sc.cancelJobGroup(groupId)
      }
    }, timeoutMs, TimeUnit.MILLISECONDS)
    try action
    catch {
      case e: Throwable if fired =>
        // keep the underlying failure: if the action died for an unrelated
        // reason while the watchdog fired, the real error must stay visible
        throw new TaskTimedOutException(groupId, timeoutMs, e)
    } finally {
      cancel.cancel(false)
      watchdog.shutdownNow()
      sc.clearJobGroup()
    }
  }
}
