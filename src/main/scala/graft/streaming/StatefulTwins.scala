package graft.streaming

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch event-analytics queries that carry
  * per-key ORDER-dependent state — the reference's live-bus side of the
  * same statistics (tukio task chains observing the event feed; mount
  * empty, SURVEY.md §0):
  *
  *  - [[transitionStream]]: per-user event-type transition pairs
  *    (q_markov_transition's lag half) from a last-event ValueState;
  *    downstream, the SAME [[graft.operators.EventAnalytics
  *    .transitionMatrix]] turns the pair stream into the matrix, so
  *    batch/stream parity is by construction above the pair grain;
  *  - [[trailingHourStream]]: q_window_time_range's trailing-hour
  *    count/exact-sum features from a bounded 1-hour per-key buffer.
  *
  * Ordering contract: events must arrive in (tsu, event_id) order PER KEY
  * across micro-batches (within a batch they are sorted here). That is
  * the bus-replay guarantee the reference relies on too; for disordered
  * sources, buffer by watermark before these ops (the
  * dropDuplicatesWithinWatermark stage in EventPipelines already
  * establishes the horizon). Tie rows (equal tsu) must share a
  * micro-batch for the trailing-hour features — the batch RANGE frame
  * includes all ties, so a tie split across batches would under-count
  * the earlier row.
  *
  * Scale: state is keyed by user_id (spread across executors); the
  * transition state is ONE last-event row per key, the velocity buffer
  * is bounded by one hour of per-key traffic — both O(keys), not
  * O(events).
  */
object StatefulTwins {

  /** Event with the full µs timestamp (java.sql.Timestamp.getTime is
    * ms-truncated and would misorder same-ms events vs the batch twin).
    * `value` is optional like the nullable column: the batch window SUM
    * skips nulls while COUNT(1) counts the row. */
  case class TEv(event_id: Long, user_id: Long, event_type: String,
      tsu: Long, value: Option[Double])

  case class TPair(user_id: Long, prev_type: String, next_type: String)

  case class LastEv(tsu: Long, event_id: Long, event_type: String)

  /** Per-user transition pairs via flatMapGroupsWithState: state = the
    * last event seen; each micro-batch chains (state ++ sorted new
    * events) and emits one pair per adjacency. */
  def transitionStream(events: Dataset[TEv]): Dataset[TPair] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, TPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[TEv], state: GroupState[LastEv]) =>
          val evs = it.toVector.sortBy(e => (e.tsu, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            val types =
              state.getOption.map(_.event_type).toVector ++
                evs.map(_.event_type)
            val last = evs.last
            state.update(LastEv(last.tsu, last.event_id, last.event_type))
            types.sliding(2).collect {
              case Seq(a, b) => TPair(uid, a, b)
            }
          }
      }
  }

  /** Event for the interval closer: carries BOTH the watermark-bearing
    * Timestamp (event-time timeout needs one) and the exact µs value the
    * gap logic uses (Timestamp.getTime is ms-truncated). */
  case class SEv(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      tsu: Long)

  case class SessInterval(user_id: Long, s: Long, e: Long)

  case class SessState(start: Long, last: Long)

  /** Streaming half of q_concurrency_peak's sessionization: closes the
    * SAME 30-minute-gap (user, s, e) intervals as
    * [[graft.operators.EventAnalytics.sessionIntervals]], incrementally —
    * a gap within the batch emits the finished interval immediately, an
    * idle key is closed by the event-time timeout once the watermark
    * passes last + gap (bounded state: the watermark is the GC horizon).
    * Downstream, the SAME [[graft.operators.EventAnalytics.sweepLine]]
    * turns closed intervals into the concurrency timeline, so
    * batch/stream parity holds by construction above the interval grain.
    * Input must carry a watermark on `ts`. */
  def sessionIntervalsStream(events: Dataset[SEv],
      gapUs: Long = 1800L * 1000000L): Dataset[SessInterval] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessInterval](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SEv], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessInterval(uid, s.start, s.last))
          } else {
            val evs = it.toVector.sortBy(e => (e.tsu, e.event_id))
            if (evs.isEmpty) Iterator.empty
            else {
              val out = Vector.newBuilder[SessInterval]
              var cur = state.getOption
              evs.foreach { ev =>
                cur = cur match {
                  case Some(s) if ev.tsu - s.last > gapUs =>
                    out += SessInterval(uid, s.start, s.last)
                    Some(SessState(ev.tsu, ev.tsu))
                  case Some(s) => Some(SessState(s.start, ev.tsu))
                  case None => Some(SessState(ev.tsu, ev.tsu))
                }
              }
              val st = cur.get
              state.update(st)
              // timeout is in ms; clamp past the watermark (FMGWS does
              // not drop late rows — see Sessionize.streamWithTimeout)
              state.setTimeoutTimestamp(
                math.max(st.last / 1000L + gapUs / 1000L + 1L,
                  state.getCurrentWatermarkMs() + 1L))
              out.result().iterator
            }
          }
      }
  }

  case class HourFeat(user_id: Long, event_id: Long, tsu: Long,
      n_1h: Long, sum_1h: Option[Double])

  case class BufEntry(tsu: Long, event_id: Long, sv: Long,
      hasV: Boolean)
  case class HourBuf(entries: List[BufEntry])

  private val HourUs = 3600L * 1000000L

  /** Spark's DOUBLE → DECIMAL(18,4) cast (shortest decimal string,
    * HALF_UP) as a scaled long — the per-element encoding the batch
    * twin's exact window sum applies. */
  private def scaled4(v: Double): Long =
    JBigDecimal.valueOf(v).setScale(4, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** A (user, epoch-day) observation for the rolling-distinct twin. */
  case class DayObs(user_id: Long, day: Long)

  case class DaySeen(users: Seq[Long], observed: Boolean)

  case class DayCount(day: Long, n_users: Long)

  /** Streaming twin of q_rolling_distinct (trailing-7-day distinct users
    * per observed day): the SAME bounded ×7 contribution explode as the
    * batch builder ([[graft.operators.EventAnalytics.rollingDistinct]]),
    * then per-target-day set state — exact sliding distinct needs the
    * user set (the approx path swaps in HLL state); counts are emitted
    * in Update mode and only grow, so the LAST (= max) update per
    * observed day equals the batch count once the stream drains. Days
    * that only ever receive carried-forward contributions (no direct
    * traffic) stay silent, mirroring the batch observed-day spine.
    * State is keyed by day and bounded by 7 days × distinct users. */
  def rollingDistinctStream(obs: Dataset[DayObs]): Dataset[DayCount] = {
    import obs.sparkSession.implicits._
    obs.flatMap(o => (0L to 6L).map(k =>
        (o.day + k, o.user_id, k == 0L)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[DaySeen, DayCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (day: Long, it: Iterator[(Long, Long, Boolean)],
            state: GroupState[DaySeen]) =>
          val rows = it.toVector
          val prev = state.getOption.getOrElse(DaySeen(Nil, false))
          val users = prev.users.toSet ++ rows.map(_._2)
          val observed = prev.observed || rows.exists(_._3)
          state.update(DaySeen(users.toSeq.sorted, observed))
          if (observed) Iterator.single(DayCount(day, users.size.toLong))
          else Iterator.empty
      }
  }

  case class AsofEv(event_id: Long, user_id: Long, event_type: String,
      tsu: Long)

  case class AsofMatch(event_id: Long, user_id: Long, tsu: Long,
      asof_signup_tsu: Option[Long])

  /** Streaming twin of q_join_asof — live enrichment against a
    * slowly-changing per-key reference: each purchase is joined to the
    * most recent signup at-or-before it, with the "reference side"
    * carried as ONE Option[Long] of per-user state instead of the batch
    * union+window carry. Same per-key ordering contract as
    * [[transitionStream]]; equal-µs ties process signup BEFORE purchase
    * (the batch's is_purchase sort key), so an exactly-simultaneous
    * signup is visible to its purchase. State is O(keys) — the live
    * form of the as-of join that would otherwise need a stream-stream
    * range join. */
  def asofStream(ev: Dataset[AsofEv]): Dataset[AsofMatch] = {
    import ev.sparkSession.implicits._
    val prio = Map("signup" -> 0, "purchase" -> 1)
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[AsofEv], state: GroupState[Long]) =>
          val evs = it.toVector.sortBy(e =>
            (e.tsu, prio.getOrElse(e.event_type, 2), e.event_id))
          val out = Vector.newBuilder[AsofMatch]
          var last: Option[Long] = state.getOption
          evs.foreach { e =>
            e.event_type match {
              case "signup" => last = Some(e.tsu)
              case "purchase" =>
                out += AsofMatch(e.event_id, uid, e.tsu, last)
              case _ => ()
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  case class SnapEv(user_id: Long, event_id: Long, tsu: Long,
      value: Double)

  case class SnapVersion(tsu: Long, event_id: Long, value: Double)

  case class SnapState(before: Option[SnapVersion],
      after: Option[SnapVersion])

  case class SnapDiff(user_id: Long, v_before: Option[Double],
      v_after: Option[Double], change: String)

  /** Streaming twin of q_snapshot_diff: the per-key (state-at-cutoff,
    * state-at-head) pair carried live — `before` only advances for
    * events stamped before the cutoff, `after` for every event, both by
    * the SAME lexicographic (tsu, event_id) argmax the batch struct-max
    * computes, so arrival order across micro-batches is irrelevant
    * (argmax-merge is associative and idempotent — a replayed event
    * cannot move either version). Update mode: the LAST emission per
    * key equals the batch row. State is two (tsu, eid, value) triples
    * per key. */
  def snapshotDiffStream(ev: Dataset[SnapEv],
      cutUs: Long): Dataset[SnapDiff] = {
    import ev.sparkSession.implicits._
    def better(a: Option[SnapVersion], b: SnapVersion): Option[SnapVersion] =
      a match {
        case Some(x) if x.tsu > b.tsu
            || (x.tsu == b.tsu && x.event_id >= b.event_id) => a
        case _ => Some(b)
      }
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[SnapState, SnapDiff](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[SnapEv], state: GroupState[SnapState]) =>
          var st = state.getOption.getOrElse(SnapState(None, None))
          it.foreach { e =>
            val v = SnapVersion(e.tsu, e.event_id, e.value)
            st = SnapState(
              if (e.tsu < cutUs) better(st.before, v) else st.before,
              better(st.after, v))
          }
          state.update(st)
          val change =
            if (st.before.isEmpty) "added"
            else if (st.before.map(_.value) == st.after.map(_.value))
              "unchanged"
            else "changed"
          Iterator.single(SnapDiff(uid, st.before.map(_.value),
            st.after.map(_.value), change))
      }
  }

  case class UpEv(user_id: Long, event_type: String, event_id: Long,
      tsu: Long, value: Double)

  case class UpVersion(tsu: Long, event_id: Long, value: Double)

  case class UpRow(user_id: Long, event_type: String,
      latest_event_id: Long, latest_tsu: Long, latest_value: Double)

  /** Streaming twin of q_upsert_latest — the last-writer-wins MERGE
    * view carried live (the CDC/upsert family's base member; the
    * snapshot-diff twin above is the same argmax kept at TWO horizons).
    * State per (user, type) key is the single argmax-by-(tsu, event_id)
    * version; argmax-merge is associative and idempotent, so arrival
    * order across micro-batches and at-least-once replays cannot move
    * the winner. Update mode: the LAST emission per key equals the
    * batch window row; a batch that does not improve a key's version
    * emits nothing for it. */
  def upsertLatestStream(ev: Dataset[UpEv]): Dataset[UpRow] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[UpVersion, UpRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), it: Iterator[UpEv],
            state: GroupState[UpVersion]) =>
          val prev = state.getOption
          var cur = prev
          it.foreach { e =>
            val keep = cur.exists(x => x.tsu > e.tsu
              || (x.tsu == e.tsu && x.event_id >= e.event_id))
            if (!keep) cur = Some(UpVersion(e.tsu, e.event_id, e.value))
          }
          cur match {
            case Some(v) if prev != cur =>
              state.update(v)
              Iterator.single(UpRow(key._1, key._2, v.event_id, v.tsu,
                v.value))
            case _ => Iterator.empty
          }
      }
  }

  case class StreakRow(user_id: Long, longest_streak: Long,
      n_active_days: Long, n_streaks: Long)

  case class StreakState(days: Seq[Long])

  /** Streaming twin of q_user_streaks (longest consecutive-day activity
    * streak per user): per-user state is the SET of active epoch-days —
    * day-grain bounded (the time span, not the event count; the same
    * boundedness argument as the allowlisted day-grain windows), and
    * set-union is idempotent so replays and out-of-order arrival cannot
    * corrupt it, unlike a (lastDay, runLength) cursor. Each micro-batch
    * that adds a NEW day rescans the key's sorted day list (≤ a few
    * hundred entries) and emits the revised (longest, active, streaks)
    * triple in Update mode; a batch that only replays known days emits
    * nothing. The LAST emission per user equals the batch
    * gaps-and-islands row. */
  def streaksStream(obs: Dataset[DayObs]): Dataset[StreakRow] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakState, StreakRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[DayObs], state: GroupState[StreakState]) =>
          val prev = state.getOption.map(_.days.toSet)
            .getOrElse(Set.empty[Long])
          val days = prev ++ it.map(_.day)
          if (days == prev && prev.nonEmpty) Iterator.empty
          else if (days.isEmpty) Iterator.empty
          else {
            val sorted = days.toSeq.sorted
            state.update(StreakState(sorted))
            var longest = 1L; var run = 1L; var streaks = 1L
            sorted.sliding(2).foreach {
              case Seq(a, b) =>
                if (b == a + 1) { run += 1; longest = math.max(longest, run) }
                else { streaks += 1; run = 1 }
              case _ => ()
            }
            Iterator.single(StreakRow(uid, longest,
              sorted.size.toLong, streaks))
          }
      }
  }

  case class FEv(user_id: Long, event_id: Long, event_type: String,
      tsu: Long)

  case class FunState(s: Option[Long], c: Option[Long], p: Option[Long])

  case class FunStage(user_id: Long, stage: Long, s_ts: Option[Long],
      c_ts: Option[Long], p_ts: Option[Long])

  /** Streaming twin of q_funnel: the ordered-stage machine kept as
    * per-user state — first signup arms the funnel, the first click
    * at-or-after it converts stage 1→2, the first purchase at-or-after
    * that converts 2→3; the batch multi-join computes the same minima
    * declaratively. Ties sort signup < click < purchase so an equal-µs
    * pair converts within one pass exactly like the batch `>=`
    * predicates. Update mode: the LAST emission per user equals the
    * batch row. State is three optional timestamps per user. */
  def funnelStream(ev: Dataset[FEv]): Dataset[FunStage] = {
    import ev.sparkSession.implicits._
    val prio = Map("signup" -> 0, "click" -> 1, "purchase" -> 2)
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunState, FunStage](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[FEv], state: GroupState[FunState]) =>
          val evs = it.toVector.sortBy(e =>
            (e.tsu, prio.getOrElse(e.event_type, 3), e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(FunState(None, None, None))
            evs.foreach { e =>
              e.event_type match {
                case "signup" if st.s.isEmpty =>
                  st = st.copy(s = Some(e.tsu))
                case "click" if st.c.isEmpty
                    && st.s.exists(_ <= e.tsu) =>
                  st = st.copy(c = Some(e.tsu))
                case "purchase" if st.p.isEmpty
                    && st.c.exists(_ <= e.tsu) =>
                  st = st.copy(p = Some(e.tsu))
                case _ => ()
              }
            }
            state.update(st)
            val stage =
              if (st.s.isEmpty) 0L
              else if (st.c.isEmpty) 1L
              else if (st.p.isEmpty) 2L
              else 3L
            Iterator.single(FunStage(uid, stage, st.s, st.c, st.p))
          }
      }
  }

  case class AEv(user_id: Long, event_id: Long, event_type: String,
      tsu: Long, value: Double)

  case class AttState(touch: Option[String])

  case class AttCredit(user_id: Long, event_id: Long, touch: String,
      value: Double)

  /** Streaming twin of q_attribution: per-user LAST-TOUCH carried as one
    * Option[String] of state — each purchase is credited to the most
    * recent preceding click/view the user produced (none yet →
    * "direct"), live instead of via the batch window carry. Append mode:
    * one credit row per purchase, so any downstream aggregate (the
    * batch query's (touch, count, revenue) rollup) matches by
    * construction. Same per-key ordering contract as
    * [[transitionStream]]; equal-µs ties break by event_id exactly like
    * the batch ORDER BY (ts, event_id). State is O(keys) — one touch
    * label per user. */
  def attributionStream(ev: Dataset[AEv]): Dataset[AttCredit] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttState, AttCredit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[AEv], state: GroupState[AttState]) =>
          val evs = it.toVector.sortBy(e => (e.tsu, e.event_id))
          var st = state.getOption.getOrElse(AttState(None))
          val out = Vector.newBuilder[AttCredit]
          evs.foreach { e =>
            // credit BEFORE updating state: the batch frame ends at
            // 1 PRECEDING, so an event never attributes to itself
            if (e.event_type == "purchase")
              out += AttCredit(uid, e.event_id,
                st.touch.getOrElse("direct"), e.value)
            if (e.event_type == "click" || e.event_type == "view")
              st = AttState(Some(e.event_type))
          }
          state.update(st)
          out.result().iterator
      }
  }

  case class RlEv(user_id: Long, event_id: Long, tsu: Long)

  case class RlState(tokens: Long, prev: Long)

  case class RlDecision(user_id: Long, event_id: Long, tsu: Long,
      allowed: Boolean, tokens_after: Long)

  /** Streaming twin of q_rate_limit: the IDENTICAL token-bucket
    * recursion ([[graft.operators.StreamShapes.RateCap]] /
    * [[graft.operators.StreamShapes.RefillUs]]) with the (tokens,
    * last-event) pair carried as per-key state across micro-batches —
    * the live admission guard in front of trigger fan-out (R3). Same
    * ordering contract as [[transitionStream]]: per-key in-order arrival
    * across batches, in-batch sort here. */
  def rateLimitStream(ev: Dataset[RlEv]): Dataset[RlDecision] = {
    import ev.sparkSession.implicits._
    val (cap, refillUs) = (graft.operators.StreamShapes.RateCap,
      graft.operators.StreamShapes.RefillUs)
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[RlState, RlDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[RlEv], state: GroupState[RlState]) =>
          val evs = it.toVector.sortBy(e => (e.tsu, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            val init = state.getOption
            var tokens = init.map(_.tokens).getOrElse(cap)
            var prev: Option[Long] = init.map(_.prev)
            val out = evs.map { e =>
              prev.foreach(p =>
                tokens = math.min(cap, tokens + (e.tsu - p) / refillUs))
              prev = Some(e.tsu)
              val allowed = tokens >= 1L
              if (allowed) tokens -= 1L
              RlDecision(uid, e.event_id, e.tsu, allowed, tokens)
            }
            state.update(RlState(tokens, prev.get))
            out.iterator
          }
      }
  }

  case class BmEv(event_type: String, user_id: Long)

  case class BmState(words: Map[Long, Long])

  case class BmCount(event_type: String, n_distinct: Long)

  /** Streaming twin of q_agg_bitmap's distinct state: the same DIV-32
    * word / bit_or encoding, held as per-key state and OR-merged on
    * every micro-batch — the live demonstration of why the bitmap IS
    * the mergeable distinct state (OR is idempotent, so replays and
    * out-of-order arrival cannot overcount). Update-mode counts are
    * monotone; the final value per key equals the batch popcount sum.
    * State is O(distinct ids / 32) words per key. */
  def bitmapDistinctStream(ev: Dataset[BmEv]): Dataset[BmCount] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.event_type)
      .flatMapGroupsWithState[BmState, BmCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (ty: String, it: Iterator[BmEv], state: GroupState[BmState]) =>
          var words = state.getOption.map(_.words)
            .getOrElse(Map.empty[Long, Long])
          it.foreach { e =>
            val w = e.user_id / 32
            val b = 1L << (e.user_id % 32).toInt
            words = words.updated(w, words.getOrElse(w, 0L) | b)
          }
          state.update(BmState(words))
          Iterator.single(BmCount(ty,
            words.values.map(v => java.lang.Long.bitCount(v).toLong).sum))
      }
  }

  /** Trailing-hour (count, exact-decimal sum) per event via a bounded
    * per-key buffer: merge the batch's events in (tsu, event_id) order,
    * evict entries older than one hour, and emit every event of a given
    * tsu with the SAME stats (the RANGE-frame tie semantics). The sum
    * accumulates scaled longs and converts once — bit-identical to the
    * batch DECIMAL(18,4) window sum. */
  def trailingHourStream(events: Dataset[TEv]): Dataset[HourFeat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[HourBuf, HourFeat](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[TEv], state: GroupState[HourBuf]) =>
          val evs = it.toVector.sortBy(e => (e.tsu, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            var buf = state.getOption.map(_.entries).getOrElse(Nil)
            val out = Vector.newBuilder[HourFeat]
            evs.groupBy(_.tsu).toVector.sortBy(_._1).foreach {
              case (tsu, group) =>
                val add = group.map { e =>
                  BufEntry(e.tsu, e.event_id,
                    e.value.map(scaled4).getOrElse(0L), e.value.isDefined)
                }.toList
                // defensive re-sort: keeps the buffer coherent even if a
                // source violates per-key order (emitted rows for earlier
                // events cannot be retracted — see the ordering contract)
                buf = (buf ++ add).sortBy(e => (e.tsu, e.event_id))
                buf = buf.dropWhile(_.tsu < tsu - HourUs)
                val n = buf.size.toLong
                val vs = buf.filter(_.hasV)
                val sum =
                  if (vs.isEmpty) None
                  else Some(new JBigDecimal(
                    BigInteger.valueOf(vs.map(_.sv).sum), 4).doubleValue)
                group.foreach(e =>
                  out += HourFeat(uid, e.event_id, tsu, n, sum))
            }
            state.update(HourBuf(buf))
            out.result().iterator
          }
      }
  }

  // --- incremental view maintenance (q_snapshot_ivm's streaming twin) ---

  /** One CDC record: a document appearing in `source` (`old_len` None),
    * disappearing (`new_len` None), or revising (both set). An initial
    * snapshot load is just a stream of appear records. */
  case class IvmDelta(doc_id: Long, source: String,
      old_len: Option[Long], new_len: Option[Long])

  case class IvmTotals(n_docs: Long, sum_chars: Long)

  case class IvmRow(source: String, n_docs: Long, sum_chars: Long)

  /** Spark-4 transformWithState processor maintaining the per-source
    * rollup of [[graft.operators.Corpus]]'s q_snapshot_ivm
    * incrementally: state is ONE (n_docs, sum_chars) pair per source,
    * each delta folds in as +new_len / -old_len / (new-old) — the same
    * algebra the batch query proves cell-exact against the direct
    * recomputation (its `ivm_matches` column), applied one CDC record
    * at a time instead of one snapshot diff at a time. This is the
    * "never recompute the 100 TB rollup per crawl" path in live form:
    * state is O(sources), each micro-batch touches only its delta
    * rows, and the emitted row per (source, batch) is the maintained
    * view after that batch. RocksDB-backed ValueState (TWS runs on the
    * RocksDB provider only); parity with the batch query is locked in
    * StreamingParitySpec. */
  class IvmProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, IvmDelta, IvmRow] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[IvmTotals] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[IvmTotals]("ivmTotals",
        org.apache.spark.sql.Encoders.product[IvmTotals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[IvmDelta],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[IvmRow] = {
      var t = if (state.exists()) state.get() else IvmTotals(0L, 0L)
      var any = false
      rows.foreach { d =>
        any = true
        t = (d.old_len, d.new_len) match {
          case (None, Some(nl)) =>
            IvmTotals(t.n_docs + 1L, t.sum_chars + nl)
          case (Some(ol), None) =>
            IvmTotals(t.n_docs - 1L, t.sum_chars - ol)
          case (Some(ol), Some(nl)) =>
            IvmTotals(t.n_docs, t.sum_chars + (nl - ol))
          case (None, None) => t // malformed no-op record
        }
      }
      if (!any) Iterator.empty
      else {
        state.update(t)
        Iterator.single(IvmRow(key, t.n_docs, t.sum_chars))
      }
    }
  }

  /** The maintained per-source view as a stream: one updated
    * (source, n_docs, sum_chars) row per source per micro-batch that
    * touched it. */
  def ivmStream(deltas: Dataset[IvmDelta]): Dataset[IvmRow] = {
    import deltas.sparkSession.implicits._
    deltas.groupByKey(_.source)
      .transformWithState(new IvmProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  // --- watermark-sizing audit (q_stream_late_audit's streaming twin) ---

  /** One event in hashed-arrival order: the audit's lateness is defined
    * against the running max of `tsu` over earlier arrivals per type. */
  case class LateEv(event_type: String, aseq: Long, event_id: Long,
      tsu: Long)

  case class LateState(wm: Long, n: Long, d15: Long, d1h: Long,
      maxLate: Long)

  case class LatePanel(event_type: String, n_events: Long,
      n_drop_15m: Long, n_drop_1h: Long, max_late_us: Long)

  /** Streaming half of [[graft.operators.StreamShapes.lateAudit]]: the
    * per-type running max IS one ValueState row, the drop counters fold
    * incrementally, and each micro-batch emits the updated panel row —
    * the live watermark-sizing monitor a pipeline watches before
    * flipping append mode on. Ordering contract: events arrive in
    * (aseq, event_id) order per key across batches (the same bus-replay
    * guarantee [[transitionStream]] documents); within a batch they are
    * sorted here. State is O(types), not O(events). */
  def lateAuditStream(events: Dataset[LateEv]): Dataset[LatePanel] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[LateState, LatePanel](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (ty: String, it: Iterator[LateEv], state: GroupState[LateState]) =>
          val evs = it.toVector.sortBy(e => (e.aseq, e.event_id))
          if (evs.isEmpty) Iterator.empty
          else {
            var st = state.getOption
              .getOrElse(LateState(Long.MinValue, 0L, 0L, 0L, 0L))
            evs.foreach { e =>
              val late =
                if (st.wm == Long.MinValue) 0L
                else math.max(0L, st.wm - e.tsu)
              st = LateState(math.max(st.wm, e.tsu), st.n + 1L,
                st.d15 + (if (late > 900000000L) 1L else 0L),
                st.d1h + (if (late > 3600000000L) 1L else 0L),
                math.max(st.maxLate, late))
            }
            state.update(st)
            Iterator.single(
              LatePanel(ty, st.n, st.d15, st.d1h, st.maxLate))
          }
      }
  }

  /** Observation row for the quantile-sketch twin — hv MUST come from
    * [[graft.operators.Sketches.quantileObs]] (the engine-computed
    * md5 fold), never a reimplementation. */
  case class QObs(event_type: String, event_id: Long, value: Double,
      hv: Long)

  /** Bottom-K sample + the exact count of rows seen + the largest
    * event_id ever counted (the replay high-watermark). */
  case class QSketch(rows: Vector[(Long, Long, Double)], nFull: Long,
      maxId: Long)

  /** The declared q_sketch_quantile row shape. */
  case class QRow(event_type: String, n_full: Long, m: Long,
      est_p50: Double, est_p90: Double, est_p99: Double)

  /** Streaming twin of q_sketch_quantile (the r11 verdict's "streaming
    * twin if the state fits FMGWS" — it does, trivially): per-type
    * keyed state = the K smallest (hv, event_id, value) rows plus the
    * exact row count; each micro-batch merges its arrivals ("K smallest
    * of the union" — the same associative merge the batch partial agg
    * runs) and emits the CURRENT sketch row in update mode.
    *
    * Replay handling (r12 ADVICE fix): the SAMPLE is idempotent by
    * construction — a replayed row either already sits in state (the
    * union dedups it) or was evicted, in which case the state's
    * bottom-K keys have only tightened since, so the replay sorts out
    * of take(k) again. The COUNT cannot be deduped against the sample
    * alone (an evicted replay is indistinguishable from a fresh row by
    * key), so nFull uses a per-type max-event_id high-watermark: under
    * this file's ordering contract (per-key in-order FRESH arrival
    * across micro-batches; a QoS-1 replay re-delivers only
    * already-delivered ids) a row counts iff event_id > maxId. That
    * keeps n_full EXACT under at-least-once delivery while the state
    * stays ≤K slim rows + 2 longs per type; for sources that violate
    * per-key arrival order, buffer by watermark first (the file-top
    * contract) or treat n_full as exact-only-under-exactly-once.
    * Nearest-rank selection repeats the declared query's ceil(q·m)
    * arithmetic verbatim; StreamingParitySpec proves the drained state
    * equals the batch sketch row for row AND that a replayed batch
    * with k small enough to force eviction leaves both the sample and
    * n_full unchanged. */
  /** One day-grain observation for the control-chart twin. */
  case class CCDay(event_type: String, epoch_day: Long, x: Long)

  /** ≤17 trailing (epochDay, count) pairs per type — the ENTIRE state
    * the dyadic chart needs (weights 2^-k vanish past lag 16) — plus
    * the max day ever processed: the replay high-watermark (a
    * membership test against the EVICTED window would re-admit a
    * replayed old day and re-emit its successors). */
  case class CCState(days: Vector[(Long, Long)],
      maxDay: Long = Long.MinValue)

  /** Per-day monitor emission; z is None when the prior window has
    * zero spread (the batch query's NULL). */
  case class CCRow(event_type: String, epoch_day: Long, x: Long,
      z: Option[Double], flagged: Boolean)

  /** Streaming twin of q_ts_control_chart: per-type keyed state = the
    * trailing ≤16 daily counts; each arriving day is judged against
    * the STRICTLY PRIOR dyadic EWMA level/spread (identical arithmetic
    * to the batch query: the dyadic weights make every weighted sum
    * exact, so the JVM fold here and Spark SQL's fold there produce
    * the bit-identical doubles), THEN inserted into state. A day with
    * no prior window emits nothing (the batch inner join's drop); a
    * replayed day already in state is skipped (idempotent under the
    * file-top per-key in-order contract, like [[quantileSketchStream]]).
    * StreamingParitySpec folds the emitted rows per type and matches
    * the batch (n_days, n_flagged, max_abs_z) row exactly. State: ≤16
    * slim pairs per type — bounded regardless of stream length. */
  def controlChartStream(days: Dataset[CCDay]): Dataset[CCRow] = {
    import days.sparkSession.implicits._
    days.groupByKey(_.event_type)
      .flatMapGroupsWithState[CCState, CCRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (ty: String, it: Iterator[CCDay], state: GroupState[CCState]) =>
          var st = state.getOption.getOrElse(CCState(Vector.empty))
          val out = Vector.newBuilder[CCRow]
          it.toVector.sortBy(_.epoch_day).foreach { d =>
            // per-key in-order contract: a day ≤ the watermark is a
            // QoS-1 replay — skip (the file-top contract, identical to
            // quantileSketchStream's id watermark)
            if (d.epoch_day > st.maxDay) {
              var num = 0.0; var num2 = 0.0; var wsum = 0.0
              (1 to 16).foreach { k =>
                st.days.find(_._1 == d.epoch_day - k).foreach {
                  case (_, x) =>
                    val w = 1.0 / (1L << k).toDouble
                    num += x * w; num2 += x * x * w; wsum += w
                }
              }
              if (wsum > 0.0) {
                val ewma = num / wsum
                val sd = math.sqrt(
                  math.max(num2 / wsum - ewma * ewma, 0.0))
                val z = if (sd > 0.0) Some((d.x.toDouble - ewma) / sd)
                  else None
                out += CCRow(ty, d.epoch_day, d.x, z,
                  z.exists(v => math.abs(v) > 3.0))
              }
              st = CCState((st.days :+ (d.epoch_day, d.x))
                .filter(_._1 > d.epoch_day - 17).sortBy(_._1),
                d.epoch_day)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  def quantileSketchStream(obs: Dataset[QObs],
      k: Int = graft.operators.Sketches.QuantK): Dataset[QRow] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.event_type)
      .flatMapGroupsWithState[QSketch, QRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (ty: String, it: Iterator[QObs], state: GroupState[QSketch]) =>
          val fresh = it.toVector
          if (fresh.isEmpty) Iterator.empty
          else {
            val st = state.getOption
              .getOrElse(QSketch(Vector.empty, 0L, Long.MinValue))
            val rows = fresh.map(e => (e.hv, e.event_id, e.value))
              .distinct
            val merged = (st.rows ++ rows).distinct
              .sortBy(r => (r._1, r._2)).take(k)
            val n = st.nFull + rows.count(_._2 > st.maxId)
            val maxId = math.max(st.maxId, rows.map(_._2).max)
            state.update(QSketch(merged, n, maxId))
            val vals = merged.map(_._3).sorted
            val m = vals.size
            def est(q: Double): Double =
              vals(math.ceil(q * m).toInt - 1)
            Iterator.single(
              QRow(ty, n, m.toLong, est(0.5), est(0.9), est(0.99)))
          }
      }
  }
}
