package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed CDC replay — the core semantic of the reference.
  *
  * The reference applies a DMS changefeed row-at-a-time against Postgres:
  * `Op='D'` → DELETE WHERE pk, `Op='U'` → INSERT ... ON CONFLICT (pk) DO
  * UPDATE, else plain INSERT
  * (/root/reference/src/postgres/postgres_operator_impl.rs:300-404). The
  * final state after replaying an ordered feed is therefore
  * *last-writer-wins per primary key, with a trailing delete removing the
  * key*.
  *
  * Spark-first re-expression: that is ONE map-side-combined aggregation
  * over ONE hash shuffle by pk — `max_by(full row, ordering)` per key,
  * then drop keys whose winning op is a delete. Because an aggregation
  * combines before the exchange, the shuffle carries ~one candidate row
  * per key per input partition (the keyspace), not the whole changefeed —
  * and high-churn keys can't skew it. No per-row round trips, no driver
  * loop, no `.collect()`.
  */
object CdcApply {

  /** DMS service columns injected by the migration task; dropped before
    * landing (reference: postgres_operator_impl.rs:205-210). */
  val ServiceColumns: Seq[String] = Seq("Op", "_dms_ingestion_timestamp")

  def stripServiceColumns(df: DataFrame): DataFrame =
    df.drop(ServiceColumns: _*)

  /** Replay an ordered changefeed to its final state.
    *
    * @param cdc     changefeed rows carrying the full row image + an op column
    * @param pk      primary-key columns (composite keys supported, as in the
    *                reference's comma-joined pk list)
    * @param ordering columns establishing the feed order (e.g. ingestion
    *                timestamp, file sequence); later rows win
    * @param opCol   name of the operation column, values I/U/D
    */
  def latestState(
      cdc: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      opCol: String = "Op"): DataFrame = {
    // max_by(row, ordering) instead of a row_number window: an aggregation
    // combines map-side, so the shuffle carries ONE candidate row per key
    // per input partition instead of every CDC row, and no per-key sort is
    // needed. For high-churn keys (the common CDC shape) this is the
    // difference between shuffling the changefeed and shuffling the keyspace.
    val nonPk = cdc.columns.filterNot(c => pk.contains(c) || c == opCol)
    val payload = struct(col(opCol).as("__op") +: nonPk.map(col): _*)
    val winner = cdc
      .groupBy(pk.map(col): _*)
      .agg(max_by(payload, struct(ordering: _*)).as("__w"))
    winner
      .filter(col("__w").getField("__op") =!= "D")
      .select(pk.map(col) ++ nonPk.map(c => col("__w").getField(c).as(c)): _*)
  }

  /** Merge a change batch into an existing base state —
    * INSERT ... ON CONFLICT DO UPDATE + DELETE, set-at-once.
    *
    * Semantics: every key present in `changes` takes its last change row
    * (or disappears, if that last change is a delete); keys untouched by
    * `changes` keep their base row. Base and changes must share the
    * non-service schema; `changes` additionally carries `opCol` and
    * `ordering`.
    *
    * Implementation: tag base rows as sequence-zero inserts, union, and
    * run the same single-shuffle LWW window. Union is narrow (no extra
    * shuffle) so the whole merge still costs one exchange by pk.
    */
  def upsert(
      base: DataFrame,
      changes: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      opCol: String = "Op"): DataFrame = {
    val dataCols = base.columns.filterNot(ServiceColumns.contains)
    // Types of the ordering expressions, so base rows can carry typed nulls
    // (union needs identical schemas on both branches).
    val ordTypes = changes.select(ordering: _*).schema.fields.map(_.dataType)
    val ordNames = ordTypes.indices.map(i => s"__ord$i")
    val seqed = changes.select(
      dataCols.map(col) ++
        Seq(col(opCol).as("__op"), lit(1).as("__seq")) ++
        ordering.zip(ordNames).map { case (c, n) => c.as(n) }: _*)
    val based = base.select(
      dataCols.map(col) ++
        Seq(lit("I").as("__op"), lit(0).as("__seq")) ++
        ordTypes.zip(ordNames).map { case (t, n) => lit(null).cast(t).as(n) }: _*)
    latestState(
      based.unionByName(seqed), pk, col("__seq") +: ordNames.map(col), "__op")
      .drop("__seq" +: ordNames: _*)
  }

  /** Apply a delete set: remove every base row whose pk appears in
    * `deleteKeys` (reference: table_query.rs DeleteRows). A left-anti join;
    * Catalyst broadcasts the delete side when it is small, which is the
    * common CDC shape (few deletes vs a huge base).
    */
  def applyDeletes(base: DataFrame, deleteKeys: DataFrame, pk: Seq[String]): DataFrame =
    base.join(deleteKeys.select(pk.map(col): _*).distinct(), pk, "left_anti")

  /** Compact a changefeed to its NET effect: at most one change row per
    * key, such that replaying the compacted feed over ANY base produces
    * the same state as replaying the raw feed ([[upsert]]-equivalence,
    * property-tested). This is the batch-apply trick the reference's
    * row-at-a-time loop (postgres_operator_impl.rs:300-404) pays for on
    * every row of a churny feed: a key updated 10,000 times in a batch
    * needs ONE upsert at the target, not 10,000.
    *
    * Net-op rules (first/last op per key in feed order):
    *   - last = 'D'  → net 'D' (tombstone; payload nulled). With
    *     `dropEphemeral=true`, a key whose FIRST op is 'I' (born inside
    *     the batch) emits nothing instead — valid only when the target
    *     provably lacks the key (fresh load); the default keeps the
    *     tombstone so compaction is safe against any base.
    *   - last ≠ 'D' → 'I' if the first op is 'I' (key is new), else 'U';
    *     payload is the last row image (LWW).
    *
    * Spark shape: ONE aggregation over ONE hash exchange by pk —
    * `min_by(op, ord)` + `max_by(row, ord)` combine map-side, so the
    * shuffle carries ~two candidates per key per input partition (the
    * keyspace), not the churn. The window/`lead` formulation (scd2History)
    * must shuffle and sort every feed row; compaction's whole point is
    * that the output is the keyspace, so the aggregate shape wins at any
    * churn ratio above 1.
    */
  def compact(
      cdc: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      opCol: String = "Op",
      dropEphemeral: Boolean = false): DataFrame = {
    val nonPk = cdc.columns.filterNot(c => pk.contains(c) || c == opCol)
    val ord = struct(ordering: _*)
    val agged = cdc
      .groupBy(pk.map(col): _*)
      .agg(
        min_by(col(opCol), ord).as("__first_op"),
        max_by(col(opCol), ord).as("__last_op"),
        max_by(struct(nonPk.map(col): _*), ord).as("__last"))
    val kept =
      if (dropEphemeral)
        agged.filter(!(col("__first_op") === "I" && col("__last_op") === "D"))
      else agged
    kept
      .withColumn(opCol,
        when(col("__last_op") === "D", lit("D"))
          .when(col("__first_op") === "I", lit("I"))
          .otherwise(lit("U")))
      .select(pk.map(col) ++ Seq(col(opCol)) ++ nonPk.map(c =>
        when(col(opCol) =!= "D", col("__last").getField(c)).otherwise(lit(null)).as(c)): _*)
  }

  /** Changefeed SANITY AUDIT — the pre-replay health report the
    * reference has no answer to: its row-at-a-time loop silently
    * *absorbs* malformed feeds (an INSERT for a live key becomes an
    * upsert, a DELETE for a dead key is a no-op,
    * postgres_operator_impl.rs:300-404), so feed corruption — a lost
    * file, a resent batch, an out-of-order task restart — lands as
    * quietly-wrong data. This audit makes the feed's op-sequence
    * violations a first-class report BEFORE replay:
    *
    *   - `dup_ord`        — two rows with identical (pk, ordering): the
    *                        LWW winner is ambiguous; replay is
    *                        nondeterministic until resolved
    *   - `orphan_op`      — a key's FIRST op is not 'I': the feed starts
    *                        mid-history (missing full-load or lost file)
    *   - `insert_on_live` — an 'I' for a key whose previous op left it
    *                        live: a resent/overlapping batch
    *   - `delete_on_dead` — a 'D' directly after a 'D': double delivery
    *
    * One exchange by pk + per-key sort (the scd2History window shape —
    * per-key cost is that key's own rows), flags from a single `lag`
    * pass, then an aggregation over only the FLAGGED rows; all four
    * anomaly rows always present (zero-count included) so a consumer
    * can gate on `n > 0` without existence checks. When `dup_ord > 0`
    * the other counts can vary within the tied group — feed order is
    * genuinely ambiguous there, which is exactly what `dup_ord` reports.
    *
    * Output: `anomaly`, `n` (flagged rows), `n_keys` (distinct pks). */
  def auditFeed(
      cdc: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      opCol: String = "Op"): DataFrame = {
    require(pk.nonEmpty, "auditFeed: at least one pk column")
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ordering: _*)
    val ordS = struct(ordering: _*)
    val flagged = cdc.select(
      struct(pk.map(col): _*).as("__k"),
      col(opCol).as("__op"),
      lag(col(opCol), 1).over(w).as("__prev"),
      coalesce(lag(ordS, 1).over(w) === ordS, lit(false)).as("__dup"))
    val melted = flagged.select(col("__k"), explode(array(
      struct(lit("dup_ord").as("anomaly"), col("__dup").as("flag")),
      struct(lit("orphan_op").as("anomaly"),
        (col("__prev").isNull && col("__op") =!= "I").as("flag")),
      struct(lit("insert_on_live").as("anomaly"),
        (col("__op") === "I" && col("__prev").isNotNull && col("__prev") =!= "D").as("flag")),
      struct(lit("delete_on_dead").as("anomaly"),
        (col("__op") === "D" && col("__prev") === "D").as("flag")))).as("a"))
      .filter(col("a.flag"))
      .groupBy(col("a.anomaly").as("anomaly"))
      .agg(count(lit(1)).as("__n"), countDistinct(col("__k")).as("__nk"))
    val kinds = cdc.sparkSession.range(1).select(explode(array(
      Seq("dup_ord", "orphan_op", "insert_on_live", "delete_on_dead")
        .map(lit): _*)).as("anomaly"))
    kinds.join(melted, Seq("anomaly"), "left")
      .select(col("anomaly"),
        coalesce(col("__n"), lit(0L)).as("n"),
        coalesce(col("__nk"), lit(0L)).as("n_keys"))
  }

  /** Align the SCHEMA ERAS of an evolved changefeed so one replay can
    * run across a DDL boundary — the tolerant complement to the strict
    * schema guard. A long-lived DMS feed is not one schema: `ALTER TABLE
    * ADD COLUMN` mid-stream means early files lack the column and late
    * files carry it (a drop is the mirror image). The reference ABORTS
    * the table on any such drift (cdc_operator.rs:171-186) — correct for
    * validation, useless for replaying history across the DDL; graft
    * keeps that strict policy as the default ([[SchemaGuard]]) and
    * offers this explicit opt-in for the replay-across-DDL case.
    *
    * Each feed era is padded to the union schema with TYPED nulls
    * (missing-column semantics under `ADD COLUMN` are exactly NULL for
    * pre-DDL rows), columns ordered by first appearance across eras,
    * then unioned — a narrow, zero-shuffle plan: the aligned feed goes
    * into [[latestState]]/[[scd2History]] at the usual one-exchange
    * cost. A column whose TYPE differs between eras is refused loudly:
    * null-padding can't express a type change, and a silent cast is the
    * corruption the schema guard exists to stop.
    *
    * Spark's own `mergeSchema=true` parquet option solves the same
    * problem at scan time when all eras live in one directory tree;
    * this operator covers the catalog case — era file sets discovered
    * separately (the A6 catalog's date-partitioned listing) and read as
    * separate frames. The two compose: a mergeSchema scan IS a one-era
    * input here (proven equal in the spec).
    */
  def alignEvolved(feeds: Seq[DataFrame]): DataFrame = {
    require(feeds.nonEmpty, "alignEvolved: at least one feed era")
    val order = scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.types.DataType]()
    feeds.zipWithIndex.foreach { case (df, i) =>
      df.schema.fields.foreach { f =>
        order.get(f.name) match {
          case None => order(f.name) = f.dataType
          case Some(dt) => require(dt == f.dataType,
            s"alignEvolved: column '${f.name}' changes type across eras " +
              s"($dt vs ${f.dataType} in era $i) — type drift cannot be " +
              "null-padded; resolve it explicitly before aligning")
        }
      }
    }
    val cols = order.toSeq
    feeds.map { df =>
      val have = df.columns.toSet
      df.select(cols.map { case (n, dt) =>
        if (have(n)) col(n) else lit(null).cast(dt).as(n)
      }: _*)
    }.reduce(_ unionByName _)
  }

  /** Point-in-time snapshot — replay only the changes at or before
    * `asOf` into the base. This is the time-travel the reference's
    * validate implicitly assumes away (it compares CURRENT states,
    * cdc_operator.rs's replay runs the whole feed): reconstruct what the
    * target looked like at T from the same base + changefeed, e.g. to
    * validate against a target backup, re-run a downstream job "as of"
    * a cutoff, or audit when a divergence first appeared.
    *
    * The cutoff is a plain filter UNDER the one-exchange [[upsert]], so
    * Catalyst applies it scan-adjacent — below any join and below the
    * LWW exchange (plan-pinned): an as-of snapshot never shuffles rows
    * beyond the horizon. When `tsCol` is a raw scan column it also
    * pushes into parquet row-group pruning; a rebuilt/computed column
    * (like the nanos-derived feed here) filters right above the scan.
    *
    * @param tsCol the changefeed's event-time column; rows with
    *              `tsCol > asOf` are beyond the snapshot horizon
    */
  def snapshotAsOf(
      base: DataFrame,
      changes: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      tsCol: Column,
      asOf: Column,
      opCol: String = "Op"): DataFrame =
    upsert(base, changes.filter(tsCol <= asOf), pk, ordering, opCol)

  /** SCD2 (slowly-changing-dimension type-2) HISTORY — the changefeed as a
    * version table instead of a final state: one row per surviving version
    * with its validity interval, the auditable complement of
    * [[latestState]].
    *
    * The reference only ever materializes the feed's endpoint (replay to
    * current rows, postgres_operator_impl.rs:300-404); every intermediate
    * version is destroyed by the upsert. SCD2 keeps them: each I/U event
    * opens a version valid from its own event time until the NEXT event
    * for the same key (of any op — an update supersedes, a delete closes),
    * and a version nothing superseded is the key's current row. Deletes
    * close the prior interval but emit no version themselves, so a key
    * whose last event is a delete has history and no current row — exactly
    * the "state at time T" source [[snapshotAsOf]] reconstructs by
    * re-replaying; here T is an output column instead of a query parameter.
    *
    * Validity boundaries are integer microseconds (TimeCols.micros —
    * exact for both timestamp physical encodings, mirrors DuckDB's
    * `epoch_us`, same exact-boundary trick as the as-of join),
    * half-open `[valid_from_us, valid_to_us)`, `valid_to_us` null while
    * current. `is_current` is 0/1 bigint for engine-portable hashing.
    *
    * Unlike [[latestState]] this IS a window (`lead` over the pk
    * partition): the output keeps ~every input row, so there is no
    * combiner win to chase — one hash exchange by pk, one per-key sort,
    * output streams. Parallelism is the keyspace; per-task sort cost is a
    * key's own churn, which is the irreducible cost of emitting that key's
    * versions in order.
    *
    * @param ordering feed order within a key (e.g. event time + sequence);
    *                 later rows supersede earlier ones
    * @param tsCol    event-time column stamping the validity boundaries
    */
  def scd2History(
      cdc: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      tsCol: Column,
      opCol: String = "Op"): DataFrame = {
    val reserved = Seq("valid_from_us", "valid_to_us", "is_current")
    reserved.foreach(r => require(
      !cdc.columns.contains(r), s"scd2History: input already has a '$r' column"))
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ordering: _*)
    cdc
      .withColumn("valid_from_us", graft.util.TimeCols.toMicros(cdc, tsCol))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("is_current",
        when(col("valid_to_us").isNull, lit(1L)).otherwise(lit(0L)))
      .drop(opCol)
  }

  /** Incrementally extend an SCD2 history with a new changefeed batch —
    * the maintenance half of [[scd2History]]: `scd2Merge(scd2History(F),
    * B)` row-equals `scd2History(F ∪ B)` (property-tested over random
    * feeds × random split points) whenever every batch event sorts after
    * the history's events for its key — the append-only contract a
    * changefeed tail satisfies by construction (the reference's loop
    * consumes files in exactly this order, s3_operator.rs file sequencing
    * + postgres_operator_impl.rs:300-404).
    *
    * Rebuilding a 100 TB history to absorb a GB-sized daily batch would
    * re-shuffle and re-sort every key ever seen; the incremental form
    * costs: one window over the BATCH only (batch-sized sort), one
    * aggregate of the batch to its first-event-per-key (keyspace of the
    * batch, map-side combined), and ONE join of the history against that
    * (typically broadcast-sized) aggregate — touched keys' current
    * versions close at the batch's first event time, every other history
    * row passes through byte-identical. No history-wide window, no
    * history shuffle.
    *
    * A batch event ordering-BEFORE a touched key's current version would
    * corrupt the interval algebra (a version closing before it opened);
    * that contract violation raises loudly at execution time instead of
    * landing a negative-length interval.
    */
  def scd2Merge(
      history: DataFrame,
      batch: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      tsCol: Column,
      opCol: String = "Op"): DataFrame = {
    val newVersions = scd2History(batch, pk, ordering, tsCol, opCol)
    // The ordering-first batch event per key (any op — updates supersede,
    // deletes close) carries the µs boundary that closes the key's
    // current version. min_by keeps this correct for arbitrary ordering
    // columns, not just ts-ordered feeds.
    val firstUs = batch
      .groupBy(pk.map(col): _*)
      .agg(min_by(graft.util.TimeCols.toMicros(batch, tsCol), struct(ordering: _*))
        .as("__first_us"))
    val touched = col("__first_us").isNotNull && col("is_current") === 1L
    history
      .join(broadcast(firstUs), pk, "left")
      .withColumn("valid_to_us",
        when(touched && col("__first_us") < col("valid_from_us"),
          raise_error(concat(
            lit("scd2Merge: batch event at µs "), col("__first_us"),
            lit(" precedes the current version opening at µs "),
            col("valid_from_us"),
            lit(" — the batch is not an append-only tail of this history")))
            .cast("long"))
          .when(touched, col("__first_us"))
          .otherwise(col("valid_to_us")))
      .withColumn("is_current", when(touched, lit(0L)).otherwise(col("is_current")))
      .drop("__first_us")
      .unionByName(newVersions)
  }

  /** The state at time T read OUT of an SCD2 history: the one version per
    * key whose half-open validity interval covers T (`valid_from_us <= T
    * < valid_to_us`, open intervals run to ∞). A key deleted before T has
    * no covering version and is absent — the same semantics
    * [[snapshotAsOf]] produces by re-replaying the feed, but as a plain
    * FILTER over an already-landed history table: no window, no exchange,
    * no feed re-read. This is what makes SCD2 a queryable time-travel
    * surface rather than just a landing format (the reference's validate
    * re-replays for every horizon, cdc_operator.rs::validate) — and on a
    * parquet landing sorted/clustered by `valid_from_us` the two interval
    * predicates prune row groups, so a point-in-time read touches only
    * files whose version ranges straddle T.
    *
    * Parity contract (tested): over the history of feed F,
    * `stateAt(scd2History(F), T)` row-equals `latestState(F ≤ T)`.
    *
    * @param atUs the horizon in integer microseconds (the history's
    *             native validity unit; `unix_micros(lit(ts))` converts)
    */
  def stateAt(history: DataFrame, atUs: Column): DataFrame =
    history.filter(col("valid_from_us") <= atUs &&
      (col("valid_to_us").isNull || atUs < col("valid_to_us")))

  /** Duration-weighted rollup of an SCD2 history onto a fixed time grid —
    * the "what was the average X, weighted by how long it held" read that
    * point-in-time snapshots ([[stateAt]]) structurally can't answer: a
    * version worth 10 that held for 23 hours must count 23× the version
    * worth 500 that held for one. Deleted spans (no covering version)
    * contribute no weight, exactly as the interval algebra says.
    *
    * Each version row explodes to the grid buckets its
    * `[valid_from_us, min(valid_to_us, horizonUs))` interval overlaps
    * (`sequence` + `explode`, fan-out = interval span / grain, guarded),
    * weight = exact overlap in µs; then ONE hash aggregation by (bucket,
    * groupCols). All arithmetic is engine-portable integers: values go
    * through decimal(18,2) → centi-units, the weighted mean is integer
    * floor division — no per-row double rounding anywhere.
    *
    * At 100 TB the fan-out is the thing to watch: rows × (span/grain)
    * must not explode. The guard raises loudly per-row when a single
    * interval would emit more than `maxBucketsPerRow` buckets (a
    * years-long current version × minute grain is a misconfiguration,
    * not a workload), and the aggregation combines map-side so the
    * shuffle carries ~(buckets × groups), not the exploded rows.
    *
    * Output: bucket_us (bucket start, µs), groupCols…, weight_us,
    * weighted_sum_centi_us (exact integer Σ centivalue·weight, one final
    * double cast), wavg_milli (exact ⌊1000·Σ(v·w)/Σw⌋).
    *
    * Reference anchor: the reference can only re-replay per horizon
    * (cdc_operator.rs::validate); a weighted rollup over its row-loop
    * landing would be a client-side scan per bucket. */
  def scd2TimeWeighted(
      history: DataFrame,
      valueCol: Column,
      grainUs: Long,
      horizonUs: Long,
      groupCols: Seq[Column] = Nil,
      maxBucketsPerRow: Long = 65536L): DataFrame = {
    require(grainUs > 0, s"scd2TimeWeighted: grainUs must be positive, got $grainUs")
    val from = col("valid_from_us")
    val to = least(coalesce(col("valid_to_us"), lit(horizonUs)), lit(horizonUs))
    val b0 = expr(s"valid_from_us div $grainUs")
    val bHi = expr(s"__to_m1 div $grainUs")
    history
      .withColumn("__vc", (valueCol.cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("__to", to)
      .filter(col("__to") > from) // clip: intervals opening at/after the horizon
      .withColumn("__to_m1", col("__to") - 1)
      .withColumn("__nb", bHi - b0 + 1)
      .withColumn("__guard", when(col("__nb") > maxBucketsPerRow,
        raise_error(concat(lit(s"scd2TimeWeighted: an interval spans more than " +
          s"$maxBucketsPerRow buckets at grain ${grainUs}us — raise the grain " +
          "or maxBucketsPerRow ("), col("__nb").cast("string"), lit(" buckets)"))))
        .otherwise(lit(null)))
      .filter(col("__guard").isNull)
      .withColumn("__b", explode(sequence(b0, bHi)))
      .withColumn("__w",
        least((col("__b") + 1) * grainUs, col("__to")) -
          greatest(col("__b") * grainUs, from))
      .groupBy((col("__b") * grainUs).as("bucket_us") +: groupCols: _*)
      .agg(
        sum(col("__w")).as("weight_us"),
        sum((col("__vc") * col("__w")).cast("decimal(38,0)")).as("__ws"))
      // the sum stays an exact integer (centi-value·µs) until ONE final
      // double cast — both engines round the same exact integer once;
      // dividing first would round twice and can differ in the last ulp
      .withColumn("weighted_sum_centi_us", col("__ws").cast("double"))
      .withColumn("wavg_milli", expr("__ws * 10 div weight_us"))
      .drop("__ws")
  }

  /** A15: TEMPORAL ALIGNMENT of two SCD2 histories on a shared key — the
    * SQL:2011 temporal inner join. For every key, emit one row per
    * maximal interval where BOTH histories have a live version, carrying
    * both payloads and the clipped validity `[max(starts), min(ends))`
    * (an open `valid_to_us` = ∞; the output end is null only when both
    * inputs are open). The read behind "which plan was each customer on
    * while each address was current" — [[stateAt]] answers it for ONE
    * instant, this aligns ALL of time in one pass.
    *
    * The reference's validate compares two CURRENT states
    * (cdc_operator.rs:171-224); aligning full histories is the temporal
    * generalization it has no primitive for.
    *
    * Plan: a plain equi-join on the key columns with the overlap
    * predicate (`l.from < r.end && r.from < l.end`, half-open — touching
    * versions share no instant and do NOT match) riding as the join
    * residual — one exchange per side, hashed by key, versions of a key
    * meet in one partition. No bucket replication (cf.
    * [[graft.operators.RangeJoin.intervalOverlap]]): the key equi-side
    * already co-locates, and per-key version counts are churn-bounded, so
    * the within-key pair work is quadratic only in one key's OWN version
    * count — the same skew argument as [[scd2History]]'s window. Output
    * size is linear in total version count: intersecting two per-key
    * interval PARTITIONS yields ≤ n_l + n_r − 1 overlaps per key.
    *
    * Both inputs must carry `valid_from_us` / `valid_to_us` (the
    * [[scd2History]] contract); non-key payload columns must not collide
    * — alias one side. `is_current` (derivable: end is null) and other
    * shared names are refused loudly.
    */
  def scd2Align(left: DataFrame, right: DataFrame, pk: Seq[String]): DataFrame = {
    val validity = Seq("valid_from_us", "valid_to_us")
    require(pk.nonEmpty, "scd2Align: at least one key column")
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      (pk ++ validity).foreach(c => require(df.columns.contains(c),
        s"scd2Align: $side side lacks column '$c' (scd2History contract)"))
    }
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- pk -- validity
    require(shared.isEmpty,
      s"scd2Align: both sides carry payload column(s) ${shared.mkString(", ")} — alias one side")

    val open = Long.MaxValue
    def bounded(side: String) = Seq(
      col("valid_from_us").as(s"__${side}f"),
      coalesce(col("valid_to_us"), lit(open)).as(s"__${side}t"))
    val lPay = left.columns.filterNot(c => pk.contains(c) || validity.contains(c))
    val rPay = right.columns.filterNot(c => pk.contains(c) || validity.contains(c))
    val l = left.select(pk.map(col) ++ lPay.map(col) ++ bounded("l"): _*)
    val r = right.select(pk.map(col) ++ rPay.map(col) ++ bounded("r"): _*)
    l.join(r, pk)
      .filter(col("__lf") < col("__rt") && col("__rf") < col("__lt"))
      .withColumn("valid_from_us", greatest(col("__lf"), col("__rf")))
      .withColumn("valid_to_us", {
        val e = least(col("__lt"), col("__rt"))
        when(e === open, lit(null).cast("long")).otherwise(e)
      })
      .drop("__lf", "__lt", "__rf", "__rt")
  }

  /** B5: LAG-AWARE VALIDATE — classify WHY each target row differs,
    * using the changefeed's own history as the explanation: the
    * reference's validate (cdc_operator.rs:171-224, rust_pgdatadiff
    * payload) can say rows MISMATCH; it cannot tell a replica that is
    * merely BEHIND (holding a state that legitimately existed and was
    * since superseded) from one that DIVERGED (holding a state the feed
    * never produced). Per key the target is classified:
    *
    *  - `in_sync`      — payload equals the key's CURRENT version
    *  - `behind`       — payload equals a SUPERSEDED version; the
    *                     matched version's `valid_to_us` is when the
    *                     replica stopped being right, so the class's
    *                     `worst_us` = min over keys = the replica's
    *                     worst-case staleness horizon (a deleted key's
    *                     lingering last image also lands here — stale,
    *                     not corrupt)
    *  - `diverged`     — the key exists in the history but NO version
    *                     ever carried this payload: real corruption
    *  - `unknown_key`  — the target holds a key the feed never emitted
    *  - `missing`      — the feed's current state has the key, the
    *                     target does not
    *
    * Output: a FIXED 5-row report (zero counts included, the A13 spine
    * convention) with `n_keys` and `worst_us`.
    *
    * Plan: one [[scd2History]] (checkpointed — it feeds the match join,
    * the key-existence probe, and the missing leg), one key-equi join
    * with the null-safe payload comparison as residual (versions of a
    * key are churn-bounded; a payload can recur across versions — e.g. a
    * value that flip-flops — so the LATEST matching version, one
    * map-side-combined `max_by` per key, decides the class), one
    * left-anti-shaped leg for `missing`, and a constant class spine.
    * Payload recurrence also means `behind` picks the most charitable
    * reading: the most recent time the replica was right.
    */
  def explainDiff(
      cdc: DataFrame,
      target: DataFrame,
      pk: Seq[String],
      ordering: Seq[Column],
      tsCol: Column,
      opCol: String = "Op"): DataFrame = {
    val spark = cdc.sparkSession
    import spark.implicits._
    require(pk.nonEmpty, "explainDiff: at least one key column")
    val payload = target.columns.filterNot(pk.contains)
    require(payload.nonEmpty, "explainDiff: target has no payload columns")
    payload.foreach(c => require(cdc.columns.contains(c),
      s"explainDiff: target payload column '$c' not in the feed"))

    val hist = scd2History(cdc, pk, ordering, tsCol, opCol)
      .select((pk ++ payload).map(col) ++
        Seq(col("valid_from_us"), col("valid_to_us"), col("is_current")): _*)
      .localCheckpoint() // feeds the match join, the key probe, the missing leg

    val h = hist.select(
      pk.map(c => col(c).as(s"__h_$c")) ++
        payload.map(c => col(c).as(s"__h_$c")) ++
        Seq(col("valid_from_us").as("__vf"), col("valid_to_us").as("__vt"),
          col("is_current").as("__cur")): _*)
    val matchCond = pk.map(c => col(c) === col(s"__h_$c")).reduce(_ && _) &&
      payload.map(c => col(c) <=> col(s"__h_$c")).reduce(_ && _)
    val histKeys = hist.select(pk.map(col): _*).distinct()
      .withColumn("__known", lit(1))
    val classified = target
      .join(h, matchCond, "left")
      .groupBy(pk.map(col): _*)
      .agg(max_by(
        struct(col("__cur"), col("__vt"), col("__vf")),
        struct(col("__vf"))).as("__best"))
      .join(histKeys, pk, "left")
      .select(
        when(col("__best.__cur") === 1L, "in_sync")
          .when(col("__best.__vf").isNotNull, "behind")
          .when(col("__known").isNotNull, "diverged")
          .otherwise("unknown_key").as("class"),
        when(col("__best.__cur") =!= 1L, col("__best.__vt")).as("__w"))

    val missing = hist.filter(col("is_current") === 1L)
      .select(pk.map(col): _*)
      .join(target.select(pk.map(col): _*), pk, "left_anti")
      .select(lit("missing").as("class"), lit(null).cast("long").as("__w"))

    val spine = Seq("in_sync", "behind", "diverged", "unknown_key", "missing")
      .toDF("class")
    spine.join(
      classified.unionByName(missing)
        .groupBy("class")
        .agg(count(lit(1)).as("__n"), min(col("__w")).as("__worst")),
      Seq("class"), "left")
      .select(col("class"),
        coalesce(col("__n"), lit(0L)).as("n_keys"),
        col("__worst").as("worst_us"))
  }

  /** B4: TEMPORAL DIFF of two SCD2 histories — the all-of-time
    * generalization of the reference's validate (cdc_operator.rs:171-224
    * compares two CURRENT states; this compares EVERY instant). Output:
    * one row per maximal interval of constant (left version, right
    * version) where the two histories DISAGREE, classified as
    * `mismatch` (both live, compared payloads differ), `only_left`
    * (left live, right has no covering version), `only_right`. Intervals
    * where both sides are live with equal payloads, or neither is live,
    * are silent — an empty result IS "the replicas agreed at all times".
    * The lagging/lossy-replica audit: `stateAt(l,T) ≠ stateAt(r,T)`
    * exactly when some diff row covers T (property-tested).
    *
    * Plan — three exchanges, no windows, output linear in version count:
    *  1. boundary spine: every version start/end from both sides,
    *     deduped and sorted per key inside ONE map-side-combined
    *     `collect_set` aggregate (state = the key's own distinct
    *     boundary instants, churn-bounded like [[scd2History]]'s sort);
    *     adjacent boundaries become half-open segments via
    *     `zip_with`+`explode` — no window, no second exchange.
    *  2. each side left-joins the segments on the key equi-columns with
    *     the containment residual (`from <= seg.start < end`) — the
    *     segment side already carries the aggregate's hash partitioning,
    *     so Catalyst reuses it; per-key work is (segments × versions) of
    *     that key's OWN churn.
    * Every boundary is some version's endpoint, so consecutive segments
    * differ in at least one side's covering version: emitted intervals
    * are maximal by construction.
    *
    * Contract: inputs are [[scd2History]] outputs (per-key versions form
    * a PARTITION — non-overlapping). Overlapping versions would match a
    * segment twice and duplicate rows; the partition property is
    * guaranteed by construction for any scd2History/scd2Merge landing.
    * Both sides must carry the same `compare` columns; comparison is
    * null-safe (`<=>`). Zero-length versions (`from == to`, a same-µs
    * supersede) cover no instant and never match — exact half-open
    * semantics.
    */
  def scd2Diff(
      left: DataFrame,
      right: DataFrame,
      pk: Seq[String],
      compare: Seq[String]): DataFrame = {
    val validity = Seq("valid_from_us", "valid_to_us")
    require(pk.nonEmpty, "scd2Diff: at least one key column")
    require(compare.nonEmpty, "scd2Diff: at least one compare column")
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      (pk ++ validity ++ compare).foreach(c => require(df.columns.contains(c),
        s"scd2Diff: $side side lacks column '$c'"))
    }
    val open = Long.MaxValue
    def prep(df: DataFrame, p: String) = df.select(
      pk.map(c => col(c).as(s"__${p}_$c")) ++ Seq(
        col("valid_from_us").as(s"__${p}f"),
        coalesce(col("valid_to_us"), lit(open)).as(s"__${p}t")) ++
        compare.map(c => col(c).as(s"${p}_$c")): _*)
    // each side feeds the boundary spine AND its cover join — without a
    // checkpoint Spark re-computes the whole upstream (scan + history
    // window) once per consumer (seen in the plan audit: 4 Window nodes
    // for 2 histories); the materialized versions are far smaller than
    // their producing plan (the Triangles/E2d-canon pattern)
    val l = prep(left, "l").localCheckpoint()
    val r = prep(right, "r").localCheckpoint()

    def boundsOf(df: DataFrame, p: String) = {
      val keys = pk.map(c => col(s"__${p}_$c").as(c))
      df.select(keys :+ col(s"__${p}f").as("__b"): _*)
        .unionByName(df.filter(col(s"__${p}t") =!= open)
          .select(keys :+ col(s"__${p}t").as("__b"): _*))
    }
    val segs = boundsOf(l, "l").unionByName(boundsOf(r, "r"))
      .groupBy(pk.map(col): _*)
      .agg(array_sort(collect_set(col("__b"))).as("__bs"))
      .withColumn("__seg", explode(zip_with(
        col("__bs"),
        concat(slice(col("__bs"), lit(2), size(col("__bs"))), array(lit(open))),
        (s, e) => struct(s.as("s"), e.as("e")))))
      .select(pk.map(col) :+ col("__seg.s").as("__s") :+ col("__seg.e").as("__e"): _*)

    def cover(segsDf: DataFrame, side: DataFrame, p: String) = {
      val cond = pk.map(c => col(c) === col(s"__${p}_$c")).reduce(_ && _) &&
        col(s"__${p}f") <= col("__s") && col("__s") < col(s"__${p}t")
      segsDf.join(side, cond, "left").drop(pk.map(c => s"__${p}_$c"): _*)
    }
    val joined = cover(cover(segs, l, "l"), r, "r")

    val lLive = col("__lf").isNotNull
    val rLive = col("__rf").isNotNull
    val payloadsEqual = compare.map(c => col(s"l_$c") <=> col(s"r_$c")).reduce(_ && _)
    joined
      .filter((lLive || rLive) && !(lLive && rLive && payloadsEqual))
      .select(pk.map(col) ++ Seq(
        col("__s").as("valid_from_us"),
        when(col("__e") === open, lit(null).cast("long"))
          .otherwise(col("__e")).as("valid_to_us"),
        when(lLive && rLive, "mismatch")
          .when(lLive, "only_left").otherwise("only_right").as("diff_kind")) ++
        compare.flatMap(c => Seq(col(s"l_$c"), col(s"r_$c"))): _*)
  }
}
