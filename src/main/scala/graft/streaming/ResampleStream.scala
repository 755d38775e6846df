package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** D17s: STREAMING time-grid resampling — the continuous twin of
  * [[graft.operators.Resample.gridFill]]: as samples arrive per key,
  * every epoch-aligned tick that has become DETERMINED (a sample at or
  * after it exists) is emitted exactly once with the same LOCF and
  * linear-interpolation values the batch operator computes — identical
  * IEEE expression tree, so streamed rows are bit-equal to batch rows
  * (parity-tested across microbatch splits).
  *
  * Emission is ARRIVAL-driven, not watermark-driven: a tick between two
  * samples is fully determined the moment the right-hand sample arrives,
  * so no event-time timeout or lateness bound is needed — and the open
  * tail past the last sample is exactly the part the batch operator
  * also refuses to fabricate (its grid is span-clipped). State per key
  * is ONE held sample plus the next unemitted tick index — bounded by
  * keys, not events, the [[PathStream]] argument.
  *
  * Contract: per-key event times STRICTLY increase across the feed (the
  * changefeed-tail contract; equal-instant ties need the batch
  * operator's tieBreak column and are refused LOUDLY here — a violation
  * raises rather than silently reordering history).
  */
object ResampleStream {

  case class RsEvent(k: Long, tsUs: Long, v: Double)
  case class RsTick(k: Long, tick_us: Long, v_locf: Double, v_interp: Double)
  case class RsState(lastTs: Long, lastV: Double, nextTickIdx: Long)

  /** ceil(ts / grain) as a tick index on the positive epoch axis. */
  private def ceilIdx(ts: Long, grainUs: Long): Long = (ts + grainUs - 1) / grainUs

  private[streaming] def advance(
      grainUs: Long)(
      key: Long,
      events: Iterator[RsEvent],
      state: GroupState[RsState]): Iterator[RsTick] = {
    val sorted = events.toSeq.sortBy(_.tsUs)
    val out = Seq.newBuilder[RsTick]
    var st = state.getOption.orNull
    sorted.foreach { e =>
      if (st == null) {
        // first sample: its own tick (if aligned) is already determined
        var next = ceilIdx(e.tsUs, grainUs)
        if (next * grainUs == e.tsUs) {
          out += RsTick(key, e.tsUs, e.v, e.v)
          next += 1
        }
        st = RsState(e.tsUs, e.v, next)
      } else {
        if (e.tsUs <= st.lastTs)
          throw new IllegalStateException(
            s"ResampleStream: event at ${e.tsUs}us for key $key does not " +
              s"advance past the held sample at ${st.lastTs}us — per-key " +
              "event times must strictly increase (ties need batch gridFill)")
        var next = st.nextTickIdx
        while (next * grainUs <= e.tsUs) {
          val t = next * grainUs
          if (t == e.tsUs) out += RsTick(key, t, e.v, e.v) // on-tick short-circuit
          else {
            // same IEEE tree as Resample.gridFill's interp expression
            val frac = (t - st.lastTs).toDouble / (e.tsUs - st.lastTs).toDouble
            out += RsTick(key, t, st.lastV, st.lastV + (e.v - st.lastV) * frac)
          }
          next += 1
        }
        st = RsState(e.tsUs, e.v, next)
      }
    }
    if (st != null) state.update(st)
    out.result().iterator
  }

  /** @param grainUs tick width in integer microseconds */
  def ticks(events: Dataset[RsEvent], grainUs: Long): Dataset[RsTick] = {
    require(grainUs > 0, s"ResampleStream: grainUs must be positive, got $grainUs")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.k)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(advance(grainUs))
  }
}
