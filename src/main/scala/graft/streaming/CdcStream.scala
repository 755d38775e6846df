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

  /** Schema-generic latest-state maintenance: the same LWW-per-pk
    * semantics as [[latestState]], but the state carries the FULL typed
    * row (`Encoders.row` over the feed's schema) instead of a single
    * string payload — so a real multi-column table can be landed from a
    * stream with no column round-trip through text. Emits the complete
    * winning row whenever a key's winner changes; `Op='D'` rows are
    * emitted too (the sink's signal to delete the key). State remains
    * one row per key, hash-partitioned by pk across executors.
    *
    * The feed must contain the pk columns, `seqCol` (castable to long)
    * and `opCol`; all other columns ride along untouched. Parity with
    * the batch semantics (CdcApply.latestState) is property-tested in
    * StreamingSpec. */
  def latestStateRows(
      changes: DataFrame, pk: Seq[String], seqCol: String, opCol: String): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    val schema = changes.schema
    val seqIdx = schema.fieldIndex(seqCol)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    val ds: Dataset[Row] = changes.as(rowEnc)
    // \u0001 separator: composite pk ("a","bc") must not collide with ("ab","c")
    ds.groupByKey(r => pk.map(c => String.valueOf(r.getAs[Any](c))).mkString("\u0001"))
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Row]) =>
          def seqOf(r: Row): Long = r.get(seqIdx) match {
            case l: Long => l
            case n: Number => n.longValue()
            case null => Long.MinValue // a NULL seq loses to everything
          }
          rows.maxByOption(seqOf) match {
            case None => Iterator.empty
            case Some(top) =>
              if (state.getOption.forall(prev => seqOf(prev) <= seqOf(top))) {
                state.update(top)
                Iterator.single(top)
              } else Iterator.empty
          }
      }
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
    * nothing.
    *
    * `stateTtl` bounds state growth for long-running streams: a
    * fingerprint unseen for the TTL (processing time, re-armed on every
    * re-arrival) is evicted, so a duplicate arriving AFTER eviction
    * re-emits — the standard dedup-window compaction trade. With the
    * default `None`, state holds every distinct fingerprint forever
    * (exact dedup); run periodic external compaction or accept the
    * growth. */
  def firstSeen(
      docs: Dataset[FpDoc],
      stateTtl: Option[java.time.Duration] = None): Dataset[Keeper] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .groupByKey(_.fp)
      .flatMapGroupsWithState[Keeper, Keeper](
        OutputMode.Update, timeoutConf) {
        (fp: String, rows: Iterator[FpDoc], state: GroupState[Keeper]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // duplicate re-arrival: keep the keeper, slide its TTL
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.empty
          } else rows.minByOption(_.id) match {
            case None => Iterator.empty
            case Some(first) =>
              val k = Keeper(fp, first.id)
              state.update(k)
              stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
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
