package graft.plans

import scala.collection.concurrent.TrieMap
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Named-instance registry + EXTERNAL cancellation of running workflow
  * instances — the other half of SURVEY §2.1's R4 "per-task
  * timeout/cancellation" gap ([[TaskTimeout]] is the deadline half;
  * this adds cancel-by-name from outside the running thread, wired to
  * `DELETE /instances/{id}` on [[HttpControlPlane]]). The reference
  * cancels individual asyncio tasks (public reference
  * `nyuki/workflow/` — mount empty, SURVEY.md §0); in this engine's
  * compiled-single-plan model an instance is either ONE batch action
  * or ONE StreamingQuery, and both carry a native cluster-wide kill
  * switch — job-group cancellation interrupts every task of the
  * instance on every executor, `StreamingQuery.stop()` halts the
  * stream at a batch boundary. This manager only NAMES instances and
  * wires the switches; it never invents a second scheduler (the
  * round-1 design rule: delegate scheduling to Spark).
  *
  * Thread-safety: TrieMap registry, same as TemplateRegistry. The
  * job-group tag is thread-local in Spark, so [[runBatch]] is
  * synchronous on the calling thread; [[cancel]] may fire from any
  * thread (that is its point).
  */
final class InstanceManager(spark: SparkSession) {

  private sealed trait Handle
  private final case class Batch(group: String) extends Handle
  private final case class Stream(query: StreamingQuery) extends Handle

  private val running = TrieMap.empty[String, Handle]

  private def groupOf(id: String) = s"graft-instance-$id"

  /** Run one batch instance synchronously under its own job group,
    * optionally deadline-guarded by [[TaskTimeout]]. Returns Failure
    * (with Spark's cancellation exception, or TaskTimedOutException)
    * if [[cancel]] was called from another thread or the deadline
    * fired; the job group is always cleared and the instance
    * deregistered. */
  def runBatch[T](id: String, timeoutMs: Option[Long] = None)
      (body: => T): Try[T] = {
    require(!running.contains(id), s"instance '$id' already running")
    val group = groupOf(id)
    running.put(id, Batch(group))
    try Success(timeoutMs match {
      case Some(ms) => TaskTimeout.runWithTimeout(spark, group, ms)(body)
      case None =>
        spark.sparkContext.setJobGroup(group, s"graft instance $id",
          interruptOnCancel = true)
        try body finally spark.sparkContext.clearJobGroup()
    })
    catch { case e: Exception => Failure(e) }
    finally running.remove(id)
  }

  /** Adopt a running streaming instance so the control plane can stop
    * it by name; deregistration happens on cancel or [[prune]]. */
  def register(id: String, query: StreamingQuery): Unit = {
    require(!running.contains(id), s"instance '$id' already running")
    running.put(id, Stream(query))
  }

  /** Cancel a named instance. Batch: cancels its job group (running
    * tasks are interrupted everywhere; the runner's finally block
    * deregisters, so a double cancel is harmless). Stream: stops the
    * query at the next batch boundary. Returns false for unknown
    * ids. */
  def cancel(id: String): Boolean = running.get(id) match {
    case Some(Batch(group)) =>
      spark.sparkContext.cancelJobGroup(group)
      true
    case Some(Stream(q)) =>
      q.stop()
      running.remove(id)
      true
    case None => false
  }

  /** Drop registered streaming instances that already terminated. */
  def prune(): Unit = running.foreach {
    case (id, Stream(q)) if !q.isActive => running.remove(id)
    case _ => ()
  }

  def active: Set[String] = { prune(); running.keySet.toSet }
}
