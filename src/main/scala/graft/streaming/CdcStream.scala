package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Continuous CDC apply — the streaming twin of CdcApply.latestState.
  *
  * The reference replays CDC files in a batch loop; a live pipeline keeps
  * table state current as changefeed microbatches arrive. Structured
  * Streaming expression: group the feed by pk and keep the
  * latest-by-(ordering) row per key in `flatMapGroupsWithState`, emitting
  * a (pk, op, row) update whenever the winner changes. State is one row
  * per key — the minimum for LWW semantics — and is partitioned by pk
  * across executors, so a 1000-executor cluster holds 1/1000 of the keys
  * each.
  */
object CdcStream {

  case class KeyedChange(pk: String, seq: Long, op: String, payload: String)
  case class CurrentState(pk: String, seq: Long, op: String, payload: String)

  /** Latest-state maintenance over a stream of KeyedChange. Emits the new
    * winning row for a key whenever it changes (deletes emit op="D" so a
    * sink can remove the key). */
  def latestState(changes: Dataset[KeyedChange]): Dataset[CurrentState] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[CurrentState, CurrentState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (pk: String, rows: Iterator[KeyedChange], state: GroupState[CurrentState]) =>
          val incoming = rows.maxByOption(_.seq)
          incoming match {
            case None => Iterator.empty
            case Some(top) =>
              val prev = state.getOption
              if (prev.forall(_.seq <= top.seq)) {
                val next = CurrentState(pk, top.seq, top.op, top.payload)
                state.update(next)
                Iterator.single(next)
              } else Iterator.empty
          }
      }
  }

  /** Wrap an events-shaped DataFrame (pk/seq/op/payload columns) into the
    * typed changefeed. */
  def asChangefeed(df: DataFrame, pk: String, seq: String, op: String, payload: String): Dataset[KeyedChange] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(pk).cast("string").as("pk"),
      col(seq).cast("long").as("seq"),
      col(op).cast("string").as("op"),
      col(payload).cast("string").as("payload")).as[KeyedChange]
  }
}

/** Watermarked tumbling-window aggregation over the events stream —
  * the streaming twin of the `events_window_agg` batch query. */
object EventAgg {
  def hourly(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
}

/** Streaming sessionization — the continuous twin of the
  * `events_sessionize` batch query: events group by user, a session
  * closes after `gapMin` minutes of EVENT-TIME silence, enforced with
  * `EventTimeTimeout` against the stream's watermark. Sessions that
  * close inside a microbatch (a gap between consecutive buffered
  * events) emit immediately; the trailing open session is held in
  * state and emitted when the watermark passes its gap deadline.
  * State per key is one open session (start, end, count) — constant
  * per active user regardless of stream length.
  */
object SessionStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startMs: Long, endMs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  def sessions(evs: Dataset[Ev], gapMin: Int = 30): Dataset[ClosedSession] = {
    val spark = evs.sparkSession
    import spark.implicits._
    val gapMs = gapMin * 60000L
    evs
      .withWatermark("ts", s"$gapMin minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.startMs, s.endMs, s.n))
          } else {
            val times = rows.map(_.ts.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            times.foreach { t =>
              open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  // out-of-order-but-not-late events may precede the
                  // session start: extend both ends
                  open = Some(OpenSession(math.min(s.startMs, t), math.max(s.endMs, t), s.n + 1))
                case Some(s) => // gap inside the batch: close and start anew
                  closed += ClosedSession(uid, s.startMs, s.endMs, s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.iterator
          }
      }
  }
}

/** Streaming exact dedup — the continuous twin of Dedup.exact for an
  * ingest pipeline: only the FIRST document carrying each normalized-text
  * fingerprint passes; later duplicates are dropped across microbatches.
  *
  * State is one (16-byte fingerprint → first id) entry per distinct
  * document, partitioned by fingerprint across executors — the same state
  * shape a 100 TB ingest needs, since the corpus's distinct fingerprints,
  * not its raw bytes, bound memory. `mapGroupsWithState` (not
  * dropDuplicates) so the keeper's id is emitted exactly once and
  * re-arrivals are observable as drops.
  */
object StreamDedup {

  case class FpDoc(fp: String, id: Long)
  case class Keeper(fp: String, keeper_id: Long)

  /** First-seen winners over a (fingerprint, id) stream. Emits a Keeper
    * exactly once per new fingerprint; duplicate fingerprints emit
    * nothing. */
  def firstSeen(docs: Dataset[FpDoc]): Dataset[Keeper] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Keeper, Keeper](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[FpDoc], state: GroupState[Keeper]) =>
          if (state.exists) Iterator.empty
          else rows.minByOption(_.id) match {
            case None => Iterator.empty
            case Some(first) =>
              val k = Keeper(fp, first.id)
              state.update(k)
              Iterator.single(k)
          }
      }
  }

  /** Wrap a documents-shaped DataFrame into the fingerprinted feed using
    * the SAME normalization as batch Dedup.exact, so batch and stream
    * agree on what is a duplicate. */
  def asFingerprinted(df: DataFrame, idCol: String, textCol: String): Dataset[FpDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      graft.text.TextOps.fingerprint(col(textCol)).as("fp"),
      col(idCol).cast("long").as("id")).as[FpDoc]
  }
}
