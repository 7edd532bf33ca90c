package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user workflow-instance state machine — the reference keeps one
  * mutable dict per running workflow instance and transitions it as task
  * events arrive (tukio `workflow.py` instance reports; mount empty,
  * SURVEY.md §0). Spark-native: `flatMapGroupsWithState` with event-time
  * timeout, state spread across executors by user_id.
  */
object Sessionize {

  case class Ev(event_id: Long, user_id: Long, event_type: String,
      ts: Timestamp, value: Double)

  /** Running per-user instance state (the "workflow data dict"). */
  case class UserState(nEvents: Long, nTransitions: Long, lastType: String,
      lastTs: Long)

  case class UserUpdate(user_id: Long, n_events: Long, n_transitions: Long,
      last_type: String)

  /** Fold a batch of events (sorted by ts, event_id for determinism) into
    * the state — shared by the streaming op and its batch twin. */
  def fold(state: Option[UserState], evs: Seq[Ev]): UserState =
    evs.sortBy(e => (e.ts.getTime, e.event_id)).foldLeft(
      state.getOrElse(UserState(0L, 0L, null, Long.MinValue))) { (s, e) =>
      val trans = if (s.lastType != null && s.lastType != e.event_type) 1L
        else 0L
      UserState(s.nEvents + 1, s.nTransitions + trans, e.event_type,
        e.ts.getTime)
    }

  private def update(uid: Long, it: Iterator[Ev],
      state: GroupState[UserState]): Iterator[UserUpdate] = {
    val evs = it.toSeq
    if (evs.nonEmpty) {
      val next = fold(state.getOption, evs)
      state.update(next)
      Iterator.single(
        UserUpdate(uid, next.nEvents, next.nTransitions, next.lastType))
    } else Iterator.empty
  }

  /** Streaming op: one updated row per user per micro-batch. */
  def stream(events: Dataset[Ev]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  final case class ClosedSession(user_id: Long, n_events: Long,
      last_type: String, closed: Boolean)

  /** Timeout variant — the reference's per-instance timeout: a user whose
    * state sees no event before the event-time watermark passes
    * lastTs + gap is CLOSED and emitted exactly once, then the state is
    * dropped (bounded state: the watermark is the GC horizon). Input must
    * carry a watermark on `ts`. */
  def streamWithTimeout(events: Dataset[Ev],
      gapMs: Long = 30 * 60 * 1000L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Ev], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.nEvents, s.lastType,
              closed = true))
          } else {
            val evs = it.toSeq
            if (evs.nonEmpty) {
              val next = fold(state.getOption, evs)
              state.update(next)
              // flatMapGroupsWithState does NOT drop late rows: events can
              // arrive with lastTs + gap already behind the watermark, and
              // setTimeoutTimestamp would throw — clamp to just past it.
              state.setTimeoutTimestamp(
                math.max(next.lastTs + gapMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          }
      }
  }

  /** Spark-4 arbitrary-state rewrite of [[stream]]: the SAME fold through
    * the `transformWithState` StatefulProcessor API (RocksDB-backed
    * ValueState — TWS only runs on the RocksDB state store provider).
    * This is the forward path for the reference's per-instance state at
    * cluster scale: typed per-key state with explicit TTL/timer surfaces,
    * state spread across executors by key. Parity with the
    * flatMapGroupsWithState path and the batch fold is locked in
    * StreamingParitySpec. */
  class UserStatefulProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, UserUpdate] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[UserState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[UserState]("userState",
        org.apache.spark.sql.Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserUpdate] = {
      val evs = rows.toSeq
      if (evs.isEmpty) Iterator.empty
      else {
        val prev = if (state.exists()) Some(state.get()) else None
        val next = fold(prev, evs)
        state.update(next)
        Iterator.single(
          UserUpdate(key, next.nEvents, next.nTransitions, next.lastType))
      }
    }
  }

  /** [[stream]] via transformWithState (requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the session). */
  def streamTws(events: Dataset[Ev]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserStatefulProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch twin over the events table (same fold, one shot). */
  def batch(spark: SparkSession, sfDir: String): Dataset[UserUpdate] = {
    import spark.implicits._
    graft.Tables.table(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
        val s = fold(None, it.toSeq)
        Iterator.single(UserUpdate(uid, s.nEvents, s.nTransitions, s.lastType))
      }
  }
}
