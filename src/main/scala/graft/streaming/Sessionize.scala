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
  * (or batch) proves the gap exceeded. The open tail session stays in state
  * (bounded: one OpenSession per active user).
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
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
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
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
