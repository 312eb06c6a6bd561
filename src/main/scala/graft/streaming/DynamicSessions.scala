package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dynamic-gap sessionization — the one piece of custom streaming state
  * the engine needs (SURVEY.md §7.4): the built-in `session_window` covers
  * fixed gaps only, so per-event gap policies (e.g. purchases hold a
  * session open longer than views) go through
  * `flatMapGroupsWithState` with event-time timeouts.
  *
  * State per user is one [[DynamicSessions.SessionState]] (a few dozen
  * bytes); eviction is watermark-driven via `EventTimeTimeout`, so state
  * size is bounded by (active users within the watermark horizon), not by
  * stream length — the property that keeps this runnable forever at any
  * scale.
  */
object DynamicSessions {

  final case class SessionEvent(
      user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class SessionState(
      startMs: Long, lastMs: Long, nEvents: Long, sumValue: Double,
      gapMs: Long)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, session_value: Double)

  /** Gap policy: how long after event `e` the session stays open. */
  type GapPolicy = SessionEvent => Long

  /** The fixed-gap policy (recovers built-in `session_window` semantics). */
  def fixedGap(ms: Long): GapPolicy = _ => ms

  /** Example dynamic policy: purchases extend the session 3× longer. */
  def purchaseWeightedGap(baseMs: Long): GapPolicy =
    e => if (e.event_type == "purchase") baseMs * 3 else baseMs

  /** Sessionize a (watermarked) event stream with a per-event gap.
    *
    * Emits a session once the watermark passes its dynamic gap (timeout
    * path) or when a new event arrives after the gap (in-batch split).
    * Append-mode output; exactly the built-in session contract, with the
    * gap recomputed per event.
    */
  def sessionize(events: Dataset[SessionEvent], gap: GapPolicy)
      : Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.startMs),
              new Timestamp(s.lastMs), s.nEvents, s.sumValue))
          } else {
            val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_type))
            var cur = state.getOption
            val closed = Vector.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= s.gapMs =>
                  // Activity-refresh semantics: the session stays open
                  // gap(latest event) past the latest event — a late
                  // out-of-order arrival (t < lastMs) joins the session
                  // but does not change its deadline. (Deliberately NOT
                  // max(gapMs, gap(e)): a sticky max would let one early
                  // purchase hold the session open forever, and has no
                  // window-SQL batch twin — `dynamic_sessions` oracles
                  // this exact lag-based contract.)
                  cur = Some(SessionState(s.startMs, math.max(s.lastMs, t),
                    s.nEvents + 1, s.sumValue + e.value,
                    if (t >= s.lastMs) gap(e) else s.gapMs))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.startMs),
                    new Timestamp(s.lastMs), s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value, gap(e)))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value, gap(e)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + s.gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
