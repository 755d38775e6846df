package graft.streaming

import graft.cdc.CdcApply
import graft.pg.{Ddl, JdbcSink, ValueRenderer}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC → SCD2 HISTORY landing: the durable audit-trail twin of
  * [[JdbcLanding]]. Where JdbcLanding keeps only each key's CURRENT row
  * (the reference's landing shape, postgres_operator_impl.rs:300-404),
  * this lands EVERY version with its validity interval —
  * [[graft.cdc.CdcApply.scd2History]] semantics maintained continuously,
  * so the landed table is queryable time-travel
  * ([[graft.cdc.CdcApply.stateAt]]) that stays current as the feed runs.
  *
  * Per microbatch, two statement families (order-independent, see below):
  *  - INSERTs of the batch's OWN versions (the batch-local `scd2History`:
  *    within-batch supersessions close intervals immediately), landed as
  *    `ON CONFLICT (pk, valid_from_us) DO UPDATE` — the history's natural
  *    key, so a replayed batch rewrites identical rows;
  *  - one UPDATE per touched key closing the PREVIOUSLY-open version at
  *    the batch's first event time for that key:
  *    `SET valid_to_us = first, is_current = 0
  *     WHERE pk = ? AND valid_to_us IS NULL AND valid_from_us < first`.
  *
  * Idempotence under at-least-once delivery (`foreachBatch` replays the
  * last batch after a crash between sink write and checkpoint commit):
  * the close-UPDATE's `valid_from_us < first` guard excludes the batch's
  * own versions (their `valid_from_us >= first`), so replaying closes
  * nothing twice and never clips the batch's open version; replayed
  * INSERTs conflict-rewrite the same values. Either statement family
  * landing without the other (crash mid-batch) also converges on replay —
  * the families commute because the guard makes them disjoint. So the
  * landed history always converges to batch `scd2History` over the whole
  * feed (kill/restart-tested against a live embedded JDBC database).
  *
  * Requirements, stated loudly rather than silently mis-landed:
  *  - the target table needs a UNIQUE constraint on (pk..., valid_from_us)
  *    for the conflict target;
  *  - the feed must be per-key event-time ordered ACROSS microbatches
  *    (within a batch the window sorts) — the standard changefeed shape
  *    (DMS file sequence). A late event older than an already-closed
  *    boundary would need interval splitting, which no single-statement
  *    landing can express;
  *  - event times must be distinct per key (they are the version key).
  */
object Scd2Landing {

  /** The statements landing one microbatch, as a distributed Dataset —
    * generation is per partition (mirrors SqlWriter), nothing returns to
    * the driver. */
  def statements(
      batch: DataFrame, pk: Seq[String], ordering: Seq[Column], tsCol: Column,
      opCol: String, schemaName: String, table: String): Dataset[String] = {
    val spark = batch.sparkSession
    import spark.implicits._
    // two consumers below (versions + per-key firsts) — pay the batch
    // plan once (the double-paid-plan trap)
    val b = batch.localCheckpoint()
    val hist = CdcApply.scd2History(b, pk, ordering, tsCol, opCol)
    val cols = hist.columns.toSeq
    val histKey = pk :+ "valid_from_us"
    val inserts = hist.mapPartitions { rows =>
      rows.map { r =>
        Ddl.upsert(schemaName, table, cols,
          cols.indices.map(i => ValueRenderer.render(r.get(i))),
          histKey, isUpdate = true)
      }
    }
    val firsts = b.groupBy(pk.map(col): _*)
      .agg(min(graft.util.TimeCols.toMicros(b, tsCol)).as("__first_us"))
    val pkN = pk.length
    val closes = firsts.mapPartitions { rows =>
      rows.map { r =>
        val eq = pk.zipWithIndex
          .map { case (c, i) => s"$c = ${ValueRenderer.render(r.get(i))}" }
          .mkString(" AND ")
        val first = r.getLong(pkN)
        s"UPDATE $schemaName.$table SET valid_to_us = $first, is_current = 0 " +
          s"WHERE $eq AND valid_to_us IS NULL AND valid_from_us < $first;"
      }
    }
    inserts.union(closes)
  }

  /** Land one microbatch (see class doc for semantics/idempotence).
    * `maxConnections` bounds concurrent writer connections (required by
    * single-writer embedded targets; the reference's --max-connections). */
  def landBatch(
      batch: DataFrame, pk: Seq[String], ordering: Seq[Column], tsCol: Column,
      opCol: String, url: String, schemaName: String, table: String,
      user: String, password: String, batchSize: Int = 10000,
      maxConnections: Int = 0): Unit = {
    val stmts = statements(batch, pk, ordering, tsCol, opCol, schemaName, table)
    val sized = if (maxConnections > 0) stmts.coalesce(maxConnections) else stmts
    JdbcSink.execute(sized, url, user, password, batchSize)
  }

  /** Start the continuous history landing over a raw changefeed stream
    * (NOT latestStateRows — every event is a version boundary, so the
    * feed goes to the sink whole; no streaming state beyond the source
    * offsets, the history table itself is the state). `availableNow`
    * drains the files available at start and terminates — the resumable
    * one-shot shape the CLI uses; the default tails forever. */
  def start(
      feed: DataFrame, pk: Seq[String], ordering: Seq[Column], tsCol: Column,
      opCol: String, url: String, schemaName: String, table: String,
      user: String, password: String, checkpoint: String,
      batchSize: Int = 10000, maxConnections: Int = 0,
      availableNow: Boolean = false): StreamingQuery = {
    val writer = feed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        landBatch(b.toDF(), pk, ordering, tsCol, opCol, url, schemaName, table,
          user, password, batchSize, maxConnections)
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }
}
