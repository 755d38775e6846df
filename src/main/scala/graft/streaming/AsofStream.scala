package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous as-of enrichment — the streaming twin of
  * operators.AsofJoin.backward: probes pick up the latest reference
  * value at-or-before their event time for the same key (feature
  * serving, price-at-order-time, config-at-event-time).
  *
  * Shape: both streams union into one `flatMapGroupsWithState` keyed by
  * the join key. State per key is the reference history still able to
  * match a future probe — NOT the whole stream: once the watermark
  * passes, every reference older than the newest one at-or-before the
  * watermark is unreachable (any in-watermark probe prefers that newer
  * one), and with a tolerance everything older than `watermark −
  * tolerance` can never match at all. So state is bounded by reference
  * churn within the watermark window, hash-partitioned by key across
  * executors — the same 1/Nth-of-the-keyspace-per-executor scaling as
  * CdcStream.
  *
  * Within a microbatch, rows process in event-time order with
  * references before probes at equal timestamps (the batch operator's
  * tie rule). Across microbatches the answer is as-of-ARRIVAL: a
  * reference that shows up after a probe was already answered does not
  * retract the emitted row — at-least-once enrichment, exactly the
  * semantics a serving path wants. Parity with the batch operator on
  * an in-order feed is pinned in StreamingSpec.
  */
object AsofStream {

  case class Ref(k: String, ts: Timestamp, v: String)
  case class Probe(k: String, ts: Timestamp, probeId: Long)
  case class Enriched(
      probeId: Long, k: String, tsUs: Long,
      asofV: Option[String], asofTsUs: Option[Long])

  /** Whole microseconds — matches the batch operator's `unix_micros`
    * precision; Timestamp.getTime alone would truncate to millis and
    * let a later-in-the-same-millisecond reference answer an earlier
    * probe. */
  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  // internal envelope/state shapes — public because Catalyst's generated
  // deserializers cannot touch private classes
  case class Tagged(k: String, ts: Timestamp, side: Int, probeId: Long, v: String)
  case class RefHistory(entries: List[(Long, String)]) // ts-descending

  /** @param refs           reference updates (k, event time, value)
    * @param probes         probe rows to enrich
    * @param toleranceUs    max probe.ts − ref.ts in MICROSECONDS for a
    *                       match (None = any) — the batch operator's
    *                       timestamp unit; also tightens the
    *                       state-pruning horizon
    * @param watermarkDelay when set (e.g. "1 hour"), a watermark on the
    *                       unioned event time — bounds state (live keys
    *                       prune as rows arrive; dead keys compact via an
    *                       event-time timeout), and rows LATER than the
    *                       watermark — probes and refs alike — are
    *                       dropped by the engine, the standard watermark
    *                       contract. When None, nothing is dropped and
    *                       history is never pruned (tests / bounded
    *                       streams).
    */
  def enrich(
      refs: Dataset[Ref],
      probes: Dataset[Probe],
      toleranceUs: Option[Long] = None,
      watermarkDelay: Option[String] = None): Dataset[Enriched] = {
    val spark = refs.sparkSession
    import spark.implicits._
    val unioned = refs.map(r => Tagged(r.k, r.ts, 0, -1L, r.v))
      .union(probes.map(p => Tagged(p.k, p.ts, 1, p.probeId, null)))
    val tagged = watermarkDelay.fold(unioned)(d => unioned.withWatermark("ts", d))
    val watermarked = watermarkDelay.isDefined // asking for the watermark without one throws
    // prune runs inside a key's invocation, so a key that stops receiving
    // rows would otherwise hold its full last-seen history forever; under
    // a watermark, an event-time timeout wakes dead keys once the
    // watermark passes their newest ref and compacts them to the carry
    val timeoutConf =
      if (watermarked) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    tagged
      .groupByKey(_.k)
      .flatMapGroupsWithState[RefHistory, Enriched](
        OutputMode.Append, timeoutConf) {
        (k: String, rows: Iterator[Tagged], state: GroupState[RefHistory]) =>
          var hist = state.getOption.map(_.entries).getOrElse(Nil)
          val out = Vector.newBuilder[Enriched]
          // event-time order, refs before probes at equal ts — one pass,
          // history stays ts-descending so the head scan finds the match
          rows.toSeq.sortBy(t => (micros(t.ts), t.side)).foreach {
            case Tagged(_, ts, 0, _, v) =>
              val tsUs = micros(ts)
              // drop a same-ts predecessor: last write at a timestamp wins
              val (newer, olderOrEq) = hist.span(_._1 > tsUs)
              hist = newer ::: (tsUs, v) :: olderOrEq.dropWhile(_._1 == tsUs)
            case Tagged(_, ts, _, probeId, _) =>
              val tsUs = micros(ts)
              val hit = hist.find { case (rts, _) =>
                rts <= tsUs && toleranceUs.forall(tol => tsUs - rts <= tol)
              }
              out += Enriched(probeId, k, tsUs, hit.map(_._2), hit.map(_._1))
          }
          // watermark pruning: keep refs a future (in-watermark) probe can
          // still reach — everything newer than the watermark, plus the
          // single newest at-or-before it (unless the tolerance already
          // rules it out for every future probe)
          val wmUs = (if (watermarked) state.getCurrentWatermarkMs() else 0L) * 1000L
          if (wmUs > 0 && hist.nonEmpty) {
            val (inWindow, older) = hist.span(_._1 > wmUs)
            val carry = older.headOption.filter { case (rts, _) =>
              toleranceUs.forall(tol => wmUs - rts <= tol)
            }
            hist = inWindow ::: carry.toList
          }
          if (hist.nonEmpty) {
            state.update(RefHistory(hist))
            // arm the dead-key compaction: more than the single carry is
            // held, so wake when the watermark passes the newest ref and
            // shrink again (hist is pruned above, so size > 1 implies the
            // head is still ahead of the watermark — a legal timeout)
            if (watermarked && hist.size > 1)
              state.setTimeoutTimestamp(hist.head._1 / 1000L + 1L)
          } else state.remove()
          out.result().iterator
      }
  }
}
