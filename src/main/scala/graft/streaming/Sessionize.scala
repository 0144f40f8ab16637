package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over the events stream with custom state —
  * `flatMapGroupsWithState` per user (beyond-reference capability; the
  * reference's activity log has no session concept).
  *
  * Semantics: events for a user belong to one session while consecutive
  * event gaps are ≤ `gap`; a closed session is emitted when a later event
  * proves the gap exceeded, OR when the event-time watermark passes the
  * session's last event + gap (EventTimeTimeout). The timeout path is what
  * bounds state: without it, one OpenSession per EVER-seen user accumulates
  * forever; with it, idle users' sessions close and their state is removed,
  * so state size tracks currently-active users only.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(user_id: Long, start: Long, last: Long,
                         n_events: Long, value_sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long,
                     value_sum: Double)

  def sessionize(events: Dataset[Event],
                 gapMinutes: Int = 30): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val oe = Encoders.product[OpenSession]
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no newer event: close and
            // free the state slot
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start),
              new Timestamp(s.last), s.n_events, s.value_sum))
          } else {
            // per-group iterators are unordered; sort this batch's slice
            val evs = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            evs.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  open = Some(s.copy(last = t, n_events = s.n_events + 1,
                                     value_sum = s.value_sum + e.value))
                case Some(s) =>
                  closed += Session(user, new Timestamp(s.start),
                                    new Timestamp(s.last), s.n_events, s.value_sum)
                  open = Some(OpenSession(user, t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(user, t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout may not precede the current watermark
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs + 1, s.last + gapMs))
            }
            closed.result().iterator
          }
      }
  }
}
