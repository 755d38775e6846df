package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `graft.operators.Markov.transitions` (SURVEY §2
  * D14): per-user event-path steps emitted continuously.
  *
  * State per user is exactly ONE row — the last event seen — because a
  * transition only ever joins two consecutive events. The session-gap
  * rule doubles as the state-expiry rule: once a user has been silent
  * past `gapUs` of EVENT time, the held event can never legally pair
  * with anything later, so the state times out against the watermark
  * and is dropped — state is bounded by ACTIVE users, not all users
  * ever seen, which is what a 100 TB / multi-year feed needs.
  *
  * The gap compares epoch-MICROSECONDS (rebuilt from the timestamp's
  * second + nano fields), so the cut agrees exactly with the batch
  * operator's `unix_micros` arithmetic — a millisecond comparison would
  * disagree on µs-precision feeds right at the boundary.
  *
  * Rows inside a microbatch are ordered by (ts, event_id) before
  * pairing, matching the batch operator's window order; cross-batch
  * continuity rides the held last event. Per-user in-order arrival
  * ACROSS microbatches is assumed (the CDC-feed contract every other
  * streaming twin here shares); an older-than-state event would pair in
  * arrival order, not time order.
  *
  * Downstream, the transition matrix is `groupBy(prev,next).count` over
  * these steps — the same map-side-combinable aggregate as the batch
  * twin, maintained by any streaming sink.
  */
object PathStream {

  case class PEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)
  case class LastEv(us: Long, id: Long, tpe: String)
  case class Step(user_id: Long, prev_type: String, next_type: String, at_us: Long)

  private def epochUs(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  def steps(evs: Dataset[PEv], gapUs: Long): Dataset[Step] = {
    val spark = evs.sparkSession
    import spark.implicits._
    val delaySec = (gapUs + 999999L) / 1000000L
    evs
      .withWatermark("ts", s"$delaySec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Step](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[PEv], state: GroupState[LastEv]) =>
          if (state.hasTimedOut) {
            // silent past the gap: the held event can never pair again
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(e => (epochUs(e.ts), e.event_id))
            val out = Array.newBuilder[Step]
            var last = state.getOption
            sorted.foreach { e =>
              val us = epochUs(e.ts)
              last.foreach { l =>
                if (us - l.us <= gapUs) out += Step(uid, l.tpe, e.event_type, us)
              }
              last = Some(LastEv(us, e.event_id, e.event_type))
            }
            last.foreach { l =>
              state.update(l)
              // ceil to ms so expiry is never early at µs precision
              state.setTimeoutTimestamp((l.us + gapUs + 999L) / 1000L)
            }
            out.result().iterator
          }
      }
  }
}
