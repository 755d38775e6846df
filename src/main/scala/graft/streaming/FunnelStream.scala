package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel — the continuous twin of the `events_funnel` batch
  * cascade ([[graft.operators.Funnel.funnel]]): per user, resolve the
  * ordered steps' earliest-qualifying times as events arrive, emitting
  * the user's current step vector each microbatch (Update mode).
  *
  * Exactness contract: processed in per-user EVENT-TIME order, the
  * incremental resolution equals the batch min-cascade — by the time a
  * step-i event is considered, every event that could still lower
  * t_{i-1} has already been seen (its timestamp is smaller), so the
  * first qualifying step-i event IS the cascade's minimum. Within a
  * microbatch the buffered group is sorted; ACROSS microbatches the
  * source must deliver each user's events time-ordered (a watermark +
  * sort upstream, or a naturally monotone feed) — the same ordering
  * contract the A10m scd2Merge append path documents. An out-of-order
  * arrival VOIDS exactness in either direction: a late step-0 event
  * cannot lower an already-resolved t_0, so later steps may resolve
  * against the wrong (larger) anchor — enforce the order upstream
  * rather than reasoning about the drift.
  *
  * State per user: one Long per funnel step (-1 = unreached) — constant
  * in stream length, keyspace-bounded across executors, exactly the
  * bound a 100 TB event feed needs.
  */
object FunnelStream {

  case class Ev(user_id: Long, ts_us: Long, event_type: String)

  /** Current resolution: `steps(i)` = epoch-µs of step i, -1 unreached. */
  case class UserFunnel(user_id: Long, steps: Seq[Long])

  def funnelUpdates(
      evs: Dataset[Ev], steps: Seq[String], windowUs: Long): Dataset[UserFunnel] = {
    require(steps.size >= 2, s"funnelUpdates: need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnelUpdates: steps must be distinct")
    val spark = evs.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], UserFunnel](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Seq[Long]]) =>
          val cur = state.getOption.map(_.toArray)
            .getOrElse(Array.fill(steps.size)(-1L))
          rows.toArray.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
            stepIdx.get(e.event_type).foreach { i =>
              if (i == 0) {
                if (cur(0) < 0) cur(0) = e.ts_us
              } else if (cur(i) < 0 && cur(i - 1) >= 0 &&
                e.ts_us > cur(i - 1) && e.ts_us <= cur(i - 1) + windowUs) {
                cur(i) = e.ts_us
              }
            }
          }
          state.update(cur.toSeq)
          Iterator.single(UserFunnel(uid, cur.toSeq))
      }
  }
}
