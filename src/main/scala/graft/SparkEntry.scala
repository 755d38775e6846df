package graft

import graft.cdc.CdcApply
import graft.diff.DataDiff
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract: one query per operator from SURVEY.md §2, plus a DuckDB
  * oracle for every SQL-expressible one. Column names/types are aligned
  * between the Spark plan and the oracle (computed ints → bigint, decimal
  * sums → double, timestamps → formatted strings) so the driver's
  * sort-columns-then-hash compare is exact.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- shared

  /** The derived DMS-style changefeed over `events`: pk=user_id, ordered by
    * (ts, event_id), Op: signup→I, click→D, else U. The oracle derives the
    * identical feed in SQL (SURVEY §3). */
  private def eventsCdc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn(
      "Op",
      when(col("event_type") === "signup", "I")
        .when(col("event_type") === "click", "D")
        .otherwise("U"))

  private val cdcSql =
    """SELECT *,
      |  CASE WHEN event_type='signup' THEN 'I'
      |       WHEN event_type='click' THEN 'D' ELSE 'U' END AS op
      |FROM events""".stripMargin

  /** Deterministically perturbed copy of `orders` — the "target" side for
    * the diff operators (drop %101 keys, mutate %97 totals, add %103 ghost
    * rows). Both engines derive it identically. */
  private def perturbedOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val kept = o
      .filter(!(col("o_orderkey") % 101 === 0))
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))
    val ghosts = o
      .filter(col("o_orderkey") % 103 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
    kept.unionByName(ghosts)
  }

  // D12 funnel parameters — both engines derive the same report from them
  private val FunnelSteps = Seq("signup", "view", "purchase")
  private val FunnelWindowUs = 48L * 3600L * 1000000L
  // D14 path analysis: consecutive steps further apart than this don't count
  private val PathGapUs = 24L * 3600L * 1000000L

  private val ordersCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  private val perturbedOrdersSql = {
    val keptCols = ordersCols.map {
      case "o_totalprice" =>
        "CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice"
      case c => c
    }.mkString(", ")
    val ghostCols = ordersCols.map {
      case "o_orderkey" => "o_orderkey + 1000000 AS o_orderkey"
      case c => c
    }.mkString(", ")
    s"""SELECT $keptCols FROM orders WHERE o_orderkey % 101 <> 0
       |UNION ALL
       |SELECT $ghostCols FROM orders WHERE o_orderkey % 103 = 0""".stripMargin
  }

  // --------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ TextEntries.queries ++ VectorEntries.queries ++ ExtraEntries.queries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1: grouped aggregation, decimal-exact sums surfaced as doubles
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,2)") - col("l_discount").cast("decimal(8,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // D2: join + agg; dimension side broadcast
    "q3_join" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_total"))
    }),

    // D3: top-k per group via window
    "q_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 3)
    }),

    // D3n: the same top-k via the NATIVE whole-operator path
    // (graft.plans.TopKPerGroup — custom LogicalPlan + Strategy +
    // bounded-heap SparkPlan): one pass after the shuffle, no per-group
    // sort; must hash-match the window formulation's oracle exactly
    "q_topk_native" -> ((s, dir) =>
      graft.operators.TopK.perGroup(
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)),

    // D4: sessionization (30-min gap) — lag + running-sum windows
    "events_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn(
          "new_s",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
            .otherwise(0))
        .withColumn(
          "session_id",
          sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"))
    }),

    // D12: ordered funnel — signup → view → purchase, each step within
    // 48h of the previous, earliest-qualifying-event resolution; the
    // whole cascade is three frame-less window minima over ONE
    // user-partitioned exchange (no join per step)
    "events_funnel" -> ((s, dir) =>
      graft.operators.Funnel.funnel(
        Tables.events(s, dir), "user_id", col("ts"), "event_type",
        FunnelSteps, FunnelWindowUs)),

    // D12u: the funnel's per-user detail — every user's resolved step
    // times hash-compare against the oracle cascade, a far stronger
    // gate than the one-row summary
    "events_funnel_users" -> ((s, dir) =>
      graft.operators.Funnel.funnelUsers(
        Tables.events(s, dir), "user_id", col("ts"), "event_type",
        FunnelSteps, FunnelWindowUs)),

    // D13: cohort retention — cohort = first-activity week, week index
    // by integer epoch-µs division (no calendar/week-start semantics to
    // disagree on), distinct actives per (cohort, offset)
    "events_retention" -> ((s, dir) =>
      graft.operators.Funnel.cohortRetention(
        Tables.events(s, dir), "user_id", col("ts"))),

    // D14: event-path transition matrix — the empirical Markov chain over
    // per-user streams (lead over ONE user exchange, then a |types|²
    // aggregate); steps further apart than 24h are session-cut
    "events_paths" -> ((s, dir) =>
      graft.operators.Markov.transitions(
        Tables.events(s, dir), "user_id", unix_micros(col("ts")), "event_type",
        Seq(col("ts"), col("event_id")), PathGapUs)),

    // D16: per-user trailing-window activity — daily rollup + a 7-day
    // RANGE frame (not ROWS: absent days must still age out); integer
    // epoch-day axis so the frame bounds mean the same in both engines
    "events_rolling" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("sv"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("n_7d", sum(col("n_events")).over(w))
        .withColumn("active_days_7d", count(lit(1)).over(w).cast("bigint"))
        .withColumn("sum_value_7d", sum(col("sv")).over(w).cast("double"))
        .drop("sv")
    }),

    // D15: hourly volume anomalies — the exact-integer 3σ test
    // (n·x − S)² > 9·(n·Q − S²) over the per-type hourly rollup
    "events_anomalies" -> ((s, dir) =>
      graft.operators.Anomaly.hourlyVolume(
        Tables.events(s, dir), col("ts"), "event_type")),

    // D5: time-bucketed rollup (batch twin of the streaming agg)
    "events_window_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // D5m: incremental rollup maintenance — the landed hourly rollup
    // absorbs a new batch by merging PARTIAL aggregates (batch + keyspace
    // cost), provably equal to rebuilding over the whole feed (the oracle
    // aggregates everything). Split by event_id so both legs are real.
    "events_rollup_merge" -> ((s, dir) => {
      import graft.operators.Rollup
      val ev = Tables.events(s, dir).select(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("event_type"), col("value"), col("event_id"))
      val specs = Seq(
        Rollup.Spec("n_events", lit(1L), Rollup.Count),
        Rollup.Spec("sum_value", col("value").cast("decimal(18,2)"), Rollup.Sum),
        Rollup.Spec("max_event_id", col("event_id"), Rollup.Max))
      val keys = Seq("hour_ts", "event_type")
      val landed = Rollup.build(ev.filter(col("event_id") % 10 =!= 0), keys, specs)
      val batch = Rollup.build(ev.filter(col("event_id") % 10 === 0), keys, specs)
      Rollup.merge(landed, batch, keys, specs)
        .withColumn("sum_value", col("sum_value").cast("double"))
    }),

    // A1: CDC replay to final state (single shuffle LWW window)
    "cdc_apply_latest" -> ((s, dir) => {
      CdcApply.latestState(
        eventsCdc(s, dir),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")))
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("value").as("last_value"),
          col("event_type").as("last_type"))
    }),

    // A13: pre-replay feed sanity audit — op-sequence violations the
    // reference's row-at-a-time loop silently absorbs (resent batches,
    // missing full-load, double deliveries) surfaced as a 4-row report
    "cdc_audit" -> ((s, dir) =>
      CdcApply.auditFeed(
        eventsCdc(s, dir),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")))),

    // A14: replay ACROSS a DDL boundary — the feed's early era predates
    // ADD COLUMN value (the column is absent there), the late era carries
    // it; alignEvolved pads the early era with typed nulls so one
    // one-exchange replay covers both. Users last touched pre-DDL land
    // with a null value, exactly the post-ALTER table state.
    "cdc_evolve" -> ((s, dir) => {
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val cdc = eventsCdc(s, dir)
      val early = cdc.filter(col("ts") < split).drop("value")
      val late = cdc.filter(col("ts") >= split)
      CdcApply.latestState(
        CdcApply.alignEvolved(Seq(early, late)),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")))
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("value").as("last_value"),
          col("event_type").as("last_type"))
    }),

    // A2: upsert a late batch into the replayed early state; must equal a
    // full replay (CDC merge associativity)
    "cdc_upsert" -> ((s, dir) => {
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val cdc = eventsCdc(s, dir)
      val base = CdcApply.latestState(
        cdc.filter(col("ts") < split), Seq("user_id"), Seq(col("ts"), col("event_id")))
      val changes = cdc.filter(col("ts") >= split)
      CdcApply.upsert(base, changes, Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("value").as("last_value"),
          col("event_type").as("last_type"))
    }),

    // A3: delete application via anti-join (broadcast when small)
    "cdc_delete" -> ((s, dir) => {
      val deletes = Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_custkey"))
      CdcApply.applyDeletes(Tables.customer(s, dir), deletes, Seq("c_custkey"))
    }),

    // A4: full snapshot: LOAD table (customer) + CDC feed updating
    // c_acctbal / deleting clicked keys, merged in one plan
    "cdc_snapshot" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val ev = Tables.events(s, dir)
      val chg = ev.join(cust, ev("user_id") === cust("c_custkey"))
        .select(
          cust("c_custkey"),
          cust("c_name"),
          cust("c_nationkey"),
          ev("value").as("c_acctbal"),
          cust("c_mktsegment"),
          when(ev("event_type") === "click", "D").otherwise("U").as("Op"),
          ev("ts"),
          ev("event_id"))
      CdcApply.upsert(cust, chg, Seq("c_custkey"), Seq(col("ts"), col("event_id")))
    }),

    // A4t: TIME-TRAVEL snapshot — the same merge with the changefeed cut
    // at an as-of horizon: reconstruct the target's state at T from base
    // + feed (validate against a backup, audit when a divergence began).
    // The cutoff filter sits under the one-exchange upsert and lands
    // scan-adjacent, below the join (plan-pinned) — rows beyond the
    // horizon are dropped before anything shuffles.
    "cdc_snapshot_asof" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val ev = Tables.events(s, dir)
      val chg = ev.join(cust, ev("user_id") === cust("c_custkey"))
        .select(
          cust("c_custkey"),
          cust("c_name"),
          cust("c_nationkey"),
          ev("value").as("c_acctbal"),
          cust("c_mktsegment"),
          when(ev("event_type") === "click", "D").otherwise("U").as("Op"),
          ev("ts"),
          ev("event_id"))
      CdcApply.snapshotAsOf(
        cust, chg, Seq("c_custkey"), Seq(col("ts"), col("event_id")),
        col("ts"), lit("2024-01-18 00:00:00").cast("timestamp"))
    }),

    // A10: SCD2 history — the changefeed as a version table: every
    // surviving version with its half-open validity interval and a
    // current-row flag (one pk exchange + lead window; CdcApply.scd2History)
    "cdc_scd2" -> ((s, dir) => {
      CdcApply.scd2History(
        eventsCdc(s, dir)
          .select("user_id", "event_id", "ts", "value", "event_type", "Op"),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")),
        tsCol = col("ts"))
        .select(
          col("user_id"), col("event_id"), col("value"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
    }),

    // A10t: point-in-time read of the SCD2 history — state at T as a
    // plain interval FILTER over the version table (no window, no
    // exchange, no feed re-read; CdcApply.stateAt). The parity twin of
    // cdc_snapshot_asof's re-replay, from the landed history instead.
    "cdc_scd2_asof" -> ((s, dir) => {
      CdcApply.stateAt(
        CdcApply.scd2History(
          eventsCdc(s, dir)
            .select("user_id", "event_id", "ts", "value", "event_type", "Op"),
          pk = Seq("user_id"),
          ordering = Seq(col("ts"), col("event_id")),
          tsCol = col("ts")),
        unix_micros(lit("2024-01-18 00:00:00").cast("timestamp")))
        .select(
          col("user_id"), col("event_id"), col("value"), col("event_type"),
          col("valid_from_us"))
    }),

    // A10m: INCREMENTAL SCD2 maintenance — extend a landed history with a
    // new changefeed batch (CdcApply.scd2Merge): the batch windows over
    // itself only, the history is touched by one broadcast join against
    // the batch's first-event-per-key, and the result must row-equal the
    // full-feed rebuild — which is exactly what the oracle computes.
    "cdc_scd2_merge" -> ((s, dir) => {
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val cdc = eventsCdc(s, dir)
        .select("user_id", "event_id", "ts", "value", "event_type", "Op")
      val history = CdcApply.scd2History(
        cdc.filter(col("ts") < split),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")),
        tsCol = col("ts"))
      CdcApply.scd2Merge(
        history, cdc.filter(col("ts") >= split),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")),
        tsCol = col("ts"))
        .select(
          col("user_id"), col("event_id"), col("value"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
    }),

    // A10w: duration-weighted rollup of the SCD2 history onto a daily
    // grid — "average held value per day, weighted by how long each
    // version held", the read stateAt can't answer. Versions explode to
    // the days they overlap (guarded fan-out), ONE hash agg; exact
    // integer centi·µs arithmetic end to end, one final double cast.
    "cdc_scd2_weighted" -> ((s, dir) => {
      CdcApply.scd2TimeWeighted(
        CdcApply.scd2History(
          eventsCdc(s, dir)
            .select("user_id", "event_id", "ts", "value", "event_type", "Op"),
          pk = Seq("user_id"),
          ordering = Seq(col("ts"), col("event_id")),
          tsCol = col("ts")),
        valueCol = col("value"),
        grainUs = 86400000000L,           // 1 day
        horizonUs = 1706745600000000L,    // 2024-02-01T00:00:00Z closes open versions
        groupCols = Seq(col("event_type")))
    }),

    // A15: TEMPORAL ALIGNMENT of two SCD2 histories on the shared key —
    // the SQL:2011 temporal inner join: per user, every maximal interval
    // where BOTH attribute streams (the feed split by event_id parity)
    // have a live version, validity clipped to the intersection. One
    // key-equi join with the overlap residual; no bucket replication.
    "cdc_scd2_align" -> ((s, dir) => {
      val cdc = eventsCdc(s, dir)
        .select("user_id", "event_id", "ts", "value", "event_type", "Op")
      def histOf(parity: Int, p: String) = CdcApply.scd2History(
        cdc.filter(col("event_id") % 2 === parity),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")),
        tsCol = col("ts"))
        .select(col("user_id"),
          col("event_id").as(s"${p}_event_id"),
          col("value").as(s"${p}_value"),
          col("valid_from_us"), col("valid_to_us"))
      CdcApply.scd2Align(histOf(0, "a"), histOf(1, "b"), Seq("user_id"))
        .select("user_id", "a_event_id", "a_value", "b_event_id", "b_value",
          "valid_from_us", "valid_to_us")
    }),

    // B4: TEMPORAL DIFF of two SCD2 histories — left = the full feed's
    // history, right = a lossy replica's (5% of events dropped): one row
    // per maximal interval where the two histories disagree, classified
    // mismatch / only_left / only_right. The all-of-time validate: the
    // reference compares the two CURRENT states, this compares every
    // instant the feeds ever covered.
    "cdc_scd2_diff" -> ((s, dir) => {
      val cdc = eventsCdc(s, dir)
        .select("user_id", "event_id", "ts", "value", "Op")
      def histOf(feed: DataFrame) = CdcApply.scd2History(
        feed, pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")), tsCol = col("ts"))
        .select("user_id", "event_id", "value", "valid_from_us", "valid_to_us")
      CdcApply.scd2Diff(
        histOf(cdc), histOf(cdc.filter(col("event_id") % 20 =!= 0)),
        pk = Seq("user_id"), compare = Seq("event_id", "value"))
    }),

    // A11: changefeed NET-EFFECT compaction — at most one change row per
    // key (first/last op per key via min_by/max_by over ONE exchange),
    // upsert-equivalent to the raw feed by construction (property-tested).
    // Payload surfaced with ts as epoch-µs so both engines hash identically.
    "cdc_compact" -> ((s, dir) => {
      CdcApply.compact(
        eventsCdc(s, dir)
          .select("user_id", "event_id", "ts", "value", "event_type", "Op"),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")))
        .select(
          col("user_id"), col("Op").as("op"),
          col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"), col("event_type"))
    }),

    // A10t × E37: the SCD2 landing-layout loop closed — land the history
    // range-clustered on `valid_from_us` (the axis every stateAt read
    // filters on), then prove from FOOTERS alone how many row groups a
    // point-in-time read's `valid_from_us <= T` predicate skips. T
    // derives from the landed domain with integer arithmetic (mn +
    // (mx-mn)/4) so the oracle computes the identical bound; the audit
    // lower bound = mn makes the one-sided predicate a closed range
    // that prunes exactly where `<= T` prunes.
    "prune_audit_scd2" -> ((s, dir) => {
      val out = s"${RunPaths.pruneBase(dir)}/scd2_hist"
      CdcApply.scd2History(
        eventsCdc(s, dir)
          .select("user_id", "event_id", "ts", "value", "event_type", "Op"),
        pk = Seq("user_id"),
        ordering = Seq(col("ts"), col("event_id")),
        tsCol = col("ts"))
        .select(
          col("user_id"), col("event_id"), col("value"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("is_current"))
        .repartitionByRange(8, col("valid_from_us"))
        .sortWithinPartitions("valid_from_us")
        .write.mode("overwrite").parquet(out)
      val dom = s.read.parquet(out).agg(
        min(col("valid_from_us")), max(col("valid_from_us"))).head()
      val (mn, mx) = (dom.getLong(0), dom.getLong(1))
      graft.sources.PruneAudit.audit(s, out, "valid_from_us",
        mn, mn + (mx - mn) / 4)
    }),

    // B1: row-level diff (full-outer join on pk, null-safe compare)
    "diff_rowlevel" -> ((s, dir) => {
      DataDiff.rowDiff(Tables.orders(s, dir), perturbedOrders(s, dir), Seq("o_orderkey"))
    }),

    // B2: chunk-hash compare — map-side hash sums per pk-range chunk
    "diff_chunk" -> ((s, dir) => {
      DataDiff.chunkDiff(
        Tables.orders(s, dir),
        perturbedOrders(s, dir),
        floor(col("o_orderkey") / 1000.0).cast("bigint"))
    }),

    // B2b: reference-fidelity positional chunking — chunks are
    // chunkSize-ROW ranges in pk order and startPosition skips rows
    // (rust_pgdatadiff payload semantics); global positions computed
    // without a single-partition window (DataDiff.withOrderedPosition)
    "diff_chunk_ordered" -> ((s, dir) => {
      DataDiff.orderedChunkDiff(
        Tables.orders(s, dir), perturbedOrders(s, dir),
        Seq("o_orderkey"), chunkSize = 500, startPosition = 100)
    }),

    // B3: count-only compare
    "diff_count" -> ((s, dir) => {
      DataDiff.countDiff(Tables.orders(s, dir), perturbedOrders(s, dir), "orders")
    }),

    // B5: LAG-AWARE VALIDATE — the replica fixture: state as of the
    // feed's 80% time horizon (behind), minus every 13th key (missing),
    // values bumped on every 7th (diverged), plus ghost keys the feed
    // never emitted (unknown_key); the history explains each class.
    // Ghost ids are NEGATIVE (-u-1) so they can never collide with a
    // real key at ANY scale — a positive offset (the old +10^7) lands
    // exactly on ScaleUp's per-copy key stride at sf1, merging ghosts
    // into real users and double-keying the replica.
    "cdc_explain_diff" -> ((s, dir) => {
      val cdc = eventsCdc(s, dir)
        .select("user_id", "event_id", "ts", "value", "Op")
      val us = graft.util.TimeCols.toMicros(cdc, col("ts"))
      val mm = cdc.agg(min(us), max(us)).head()
      val t = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) * 4L / 5L
      val replica = CdcApply.latestState(
          cdc.filter(us <= t), Seq("user_id"),
          Seq(col("ts"), col("event_id")))
        .select("user_id", "event_id", "value")
        .filter(col("user_id") % 13 =!= 0)
        .withColumn("value",
          when(col("user_id") % 7 === 0, col("value") + 1).otherwise(col("value")))
        .unionByName(cdc.filter(col("user_id") % 11 === 0)
          .select((-col("user_id") - 1L).as("user_id"),
            lit(0L).as("event_id"), lit(0.0).as("value"))
          .distinct())
      CdcApply.explainDiff(cdc, replica, Seq("user_id"),
        Seq(col("ts"), col("event_id")), col("ts"))
    }),

    // E64: PSI drift between the two diff-fixture snapshots — "has the
    // population moved" where B1-B3 ask "are the rows equal": integer
    // nats×10⁴ per bin before any sum, so the transcendental statistic
    // still hash-matches
    "table_drift" -> ((s, dir) =>
      graft.operators.PsiDrift.psi(
        Tables.orders(s, dir), perturbedOrders(s, dir), Seq("o_totalprice"))),

    // A0: the full validate orchestration as one report row — counts,
    // positional chunk compare, row-level drill-down GATED to mismatched
    // chunks (rows-on-mismatch). The oracle computes the UNGATED row
    // diff count, so the hash match also proves the gate loses nothing.
    "cdc_validate" -> ((s, dir) => {
      graft.cdc.CdcOperator.validate(
        Tables.orders(s, dir), perturbedOrders(s, dir), Seq("o_orderkey"),
        "orders", graft.cdc.CdcOperator.ValidateConfig(chunkSize = 500))
    }),

    // A0 (scale option): the same orchestration with portable-hash
    // chunking — inserts/deletes shift nothing, so only chunks holding
    // damaged keys mismatch and the row pass reads just those
    "cdc_validate_hash" -> ((s, dir) => {
      graft.cdc.CdcOperator.validate(
        Tables.orders(s, dir), perturbedOrders(s, dir), Seq("o_orderkey"),
        "orders", graft.cdc.CdcOperator.ValidateConfig(
          chunkSize = 500, orderedChunks = false))
    }),

    // A0g: SAMPLED screening validate — 40% of the hash chunks, chosen by
    // a salted portable hash of the chunk id, so both sides sample the
    // SAME deterministic keyspace fraction and every report number is
    // exact on the sample. The 100 TB screening dial: catch drift daily
    // at 40% of the cost, escalate to sampleBp=10000 on a mismatch.
    "cdc_validate_sampled" -> ((s, dir) => {
      graft.cdc.CdcOperator.validate(
        Tables.orders(s, dir), perturbedOrders(s, dir), Seq("o_orderkey"),
        "orders", graft.cdc.CdcOperator.ValidateConfig(
          chunkSize = 500, orderedChunks = false, sampleBp = 4000))
    }),

    // A0k: SKEWED-pk validate (r12 verdict item 5) — the same validate
    // pair over a fixture where 1% of all rows collapse onto ONE hot
    // user_id (composite pk (user_id, event_id) stays unique, but every
    // pk-keyed exchange sees the hot key's mass in one partition-key
    // prefix). Sweep-green here at sf10 is the artifact behind SURVEY
    // §5's AQE-skew claim: ordered chunking range-repartitions on the
    // skewed prefix, hash chunking shuffles h32(pk) — both must stay
    // exact under the hot key.
    "cdc_validate_skew" -> ((s, dir) => {
      graft.cdc.CdcOperator.validate(
        skewedEvents(s, dir), perturbedSkewedEvents(s, dir),
        Seq("user_id", "event_id"), "events_skew",
        graft.cdc.CdcOperator.ValidateConfig(chunkSize = 500))
    }),
    "cdc_validate_hash_skew" -> ((s, dir) => {
      graft.cdc.CdcOperator.validate(
        skewedEvents(s, dir), perturbedSkewedEvents(s, dir),
        Seq("user_id", "event_id"), "events_skew",
        graft.cdc.CdcOperator.ValidateConfig(
          chunkSize = 500, orderedChunks = false))
    })
  )

  /** The skew fixture both engines derive identically: events with 1% of
    * rows re-keyed to user_id 42 (the hot key), ts/props dropped (their
    * physical encodings don't round-trip to identical VARCHAR in both
    * engines) and value carried as exact µ-fixed-point (floor before the
    * bigint cast — DuckDB's double→bigint cast rounds where Spark's
    * truncates). */
  private def skewedEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      when(col("event_id") % 100 === 0, 42L).otherwise(col("user_id")).as("user_id"),
      col("event_type"),
      floor(col("value") * lit(1000000d)).cast("long").as("value_fp"))

  private val skewedEventsSql =
    """SELECT event_id,
      |  CASE WHEN event_id % 100 = 0 THEN 42 ELSE user_id END AS user_id,
      |  event_type,
      |  CAST(floor(value * 1000000) AS BIGINT) AS value_fp
      |FROM events""".stripMargin

  /** perturbedOrders' recipe on the skew fixture: drop %101 keys, +1 the
    * %97 values, add %103 ghosts at +1e8. */
  private def perturbedSkewedEvents(s: SparkSession, dir: String): DataFrame = {
    val e = skewedEvents(s, dir)
    val kept = e
      .filter(!(col("event_id") % 101 === 0))
      .withColumn("value_fp",
        when(col("event_id") % 97 === 0, col("value_fp") + 1)
          .otherwise(col("value_fp")))
    val ghosts = e.filter(col("event_id") % 103 === 0)
      .withColumn("event_id", col("event_id") + 100000000L)
    kept.unionByName(ghosts)
  }

  private val perturbedSkewedEventsSql =
    s"""WITH se AS ($skewedEventsSql)
       |SELECT event_id, user_id, event_type,
       |  CASE WHEN event_id % 97 = 0 THEN value_fp + 1 ELSE value_fp END AS value_fp
       |FROM se WHERE NOT (event_id % 101 = 0)
       |UNION ALL
       |SELECT event_id + 100000000, user_id, event_type, value_fp
       |FROM se WHERE event_id % 103 = 0""".stripMargin

  // --------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] =
    coreOracleSql ++ TextEntries.oracleSql ++ VectorEntries.oracleSql ++ ExtraEntries.oracleSql

  private def coreOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT c_mktsegment, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority""".stripMargin,

    "q_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,

    // native operator must reproduce the window semantics bit-for-bit
    "q_topk_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,

    "events_sessionize" ->
      """WITH s AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |s2 AS (
        |  SELECT user_id, event_id,
        |         CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(event_id) AS first_event, max(event_id) AS last_event
        |FROM s2 GROUP BY user_id, session_id""".stripMargin,

    // min-qualifying cascade as three grouped minima — the windowed
    // Spark cascade resolves the identical earliest-qualifying times
    "events_funnel" -> {
      val Seq(s1, s2, s3) = FunnelSteps
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |t1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = '$s1' GROUP BY 1),
         |t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
         |       WHERE event_type = '$s2' AND us > t1 AND us <= t1 + $FunnelWindowUs GROUP BY 1),
         |t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
         |       WHERE event_type = '$s3' AND us > t2 AND us <= t2 + $FunnelWindowUs GROUP BY 1)
         |SELECT s1 AS users_step1, s2 AS users_step2, s3 AS users_step3,
         |  CAST(CASE WHEN s1 > 0 THEN floor(s2 * 10000.0 / s1) ELSE 0 END AS BIGINT) AS conv2_bp,
         |  CAST(CASE WHEN s2 > 0 THEN floor(s3 * 10000.0 / s2) ELSE 0 END AS BIGINT) AS conv3_bp
         |FROM (SELECT (SELECT count(*) FROM t1) s1, (SELECT count(*) FROM t2) s2,
         |             (SELECT count(*) FROM t3) s3)""".stripMargin
    },

    // every user's per-step times, nullable where unreached
    "events_funnel_users" -> {
      val Seq(s1, s2, s3) = FunnelSteps
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |t1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = '$s1' GROUP BY 1),
         |t2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN t1 USING (user_id)
         |       WHERE event_type = '$s2' AND us > t1 AND us <= t1 + $FunnelWindowUs GROUP BY 1),
         |t3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN t2 USING (user_id)
         |       WHERE event_type = '$s3' AND us > t2 AND us <= t2 + $FunnelWindowUs GROUP BY 1)
         |SELECT u.user_id, t1.t1 AS step1_us, t2.t2 AS step2_us, t3.t3 AS step3_us
         |FROM (SELECT DISTINCT user_id FROM events) u
         |LEFT JOIN t1 USING (user_id)
         |LEFT JOIN t2 USING (user_id)
         |LEFT JOIN t3 USING (user_id)""".stripMargin
    },

    // '//' = DuckDB integral division = the query's `div` on positives
    "events_retention" ->
      """WITH w AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1),
        |a AS (SELECT c.cohort AS cohort_week, w.wk - c.cohort AS week_k,
        |             count(DISTINCT w.user_id) AS active_users
        |      FROM w JOIN c USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort AS cohort_week, count(*) AS cohort_size FROM c GROUP BY 1)
        |SELECT a.cohort_week, a.week_k, a.active_users, s.cohort_size,
        |  CAST(floor(a.active_users * 10000.0 / s.cohort_size) AS BIGINT) AS retention_bp
        |FROM a JOIN s USING (cohort_week)""".stripMargin,

    // lead over the same (user, ts, event_id) order, 24h session cut;
    // probabilities as integral-division basis points — all-integer output
    "events_paths" ->
      s"""WITH s AS (SELECT user_id, event_type AS prev_type, epoch_us(ts) AS us,
         |    lead(event_type) OVER w AS next_type,
         |    lead(epoch_us(ts)) OVER w AS next_us
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |c AS (SELECT prev_type, next_type, count(*) AS cnt FROM s
         |      WHERE next_type IS NOT NULL AND next_us - us <= $PathGapUs GROUP BY 1, 2),
         |t AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1)
         |SELECT c.prev_type, c.next_type, CAST(c.cnt AS BIGINT) AS cnt,
         |  CAST(c.cnt * 10000 // t.tot AS BIGINT) AS p_bp,
         |  CAST(row_number() OVER (PARTITION BY c.prev_type
         |                          ORDER BY c.cnt DESC, c.next_type ASC) AS BIGINT) AS rk
         |FROM c JOIN t USING (prev_type)""".stripMargin,

    // '//' = integral epoch-day; RANGE 6 PRECEDING on that integer axis
    "events_rolling" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(day AS BIGINT) AS day, n_events,
        |  CAST(sum(n_events) OVER w AS BIGINT) AS n_7d,
        |  CAST(count(*) OVER w AS BIGINT) AS active_days_7d,
        |  CAST(sum(sv) OVER w AS DOUBLE) AS sum_value_7d
        |FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day
        |                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    // the z² test multiplied through by n²: exact integers on both sides
    // (HUGEINT here, DECIMAL(38,0) engine-side — the squares overflow
    // BIGINT at realistic feed scale); surfaced dev2/bound9 are the
    // exact values' double images
    "events_anomalies" ->
      """WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |             event_type, CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(cnt) AS BIGINT) AS s,
        |         CAST(sum(CAST(cnt AS HUGEINT)*cnt) AS HUGEINT) AS q
        |       FROM h GROUP BY 1)
        |SELECT h.event_type, h.hour_ts, h.cnt,
        |  CAST((CAST(st.n AS HUGEINT)*h.cnt - st.s)*(CAST(st.n AS HUGEINT)*h.cnt - st.s) AS DOUBLE) AS dev2,
        |  CAST(9*(CAST(st.n AS HUGEINT)*st.q - CAST(st.s AS HUGEINT)*st.s) AS DOUBLE) AS bound9,
        |  (CAST(st.n AS HUGEINT)*h.cnt - st.s)*(CAST(st.n AS HUGEINT)*h.cnt - st.s)
        |    > 9*(CAST(st.n AS HUGEINT)*st.q - CAST(st.s AS HUGEINT)*st.s) AS is_anomaly
        |FROM h JOIN st USING (event_type)""".stripMargin,

    "events_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "events_rollup_merge" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  max(event_id) AS max_event_id
        |FROM events GROUP BY 1, 2""".stripMargin,

    "cdc_apply_latest" ->
      s"""WITH cdc AS ($cdcSql),
         |r AS (
         |  SELECT user_id, event_id, value, event_type, op,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM cdc)
         |SELECT user_id, event_id AS last_event_id, value AS last_value, event_type AS last_type
         |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // the same lag pass over the same per-key order; the VALUES spine
    // keeps zero-count anomaly rows present in both engines
    "cdc_audit" ->
      s"""WITH cdc AS ($cdcSql),
         |w AS (
         |  SELECT user_id, op,
         |         lag(op) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_op,
         |         COALESCE((ts, event_id) =
         |           lag((ts, event_id)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
         |           FALSE) AS dup
         |  FROM cdc),
         |f AS (
         |  SELECT 'dup_ord' AS anomaly, user_id FROM w WHERE dup
         |  UNION ALL
         |  SELECT 'orphan_op', user_id FROM w WHERE prev_op IS NULL AND op <> 'I'
         |  UNION ALL
         |  SELECT 'insert_on_live', user_id FROM w
         |  WHERE op = 'I' AND prev_op IS NOT NULL AND prev_op <> 'D'
         |  UNION ALL
         |  SELECT 'delete_on_dead', user_id FROM w WHERE op = 'D' AND prev_op = 'D'),
         |agg AS (
         |  SELECT anomaly, count(*) AS n, count(DISTINCT user_id) AS n_keys
         |  FROM f GROUP BY anomaly)
         |SELECT k.anomaly, COALESCE(agg.n, 0) AS n, COALESCE(agg.n_keys, 0) AS n_keys
         |FROM (VALUES ('dup_ord'), ('orphan_op'), ('insert_on_live'),
         |             ('delete_on_dead')) k(anomaly)
         |LEFT JOIN agg ON agg.anomaly = k.anomaly""".stripMargin,

    // the two schema eras rebuilt literally: early rows carry a typed NULL
    // where the pre-DDL feed lacked the column, then the same LWW replay
    "cdc_evolve" ->
      s"""WITH cdc AS ($cdcSql),
         |f AS (
         |  SELECT user_id, event_id, ts, event_type, props,
         |         CAST(NULL AS DOUBLE) AS value, op
         |  FROM cdc WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
         |  UNION ALL
         |  SELECT user_id, event_id, ts, event_type, props, value, op
         |  FROM cdc WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
         |r AS (
         |  SELECT user_id, event_id, value, event_type, op,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM f)
         |SELECT user_id, event_id AS last_event_id, value AS last_value, event_type AS last_type
         |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // upsert(replay(early), late) == replay(all): the oracle is the full replay
    "cdc_upsert" ->
      s"""WITH cdc AS ($cdcSql),
         |r AS (
         |  SELECT user_id, event_id, value, event_type, op,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM cdc)
         |SELECT user_id, event_id AS last_event_id, value AS last_value, event_type AS last_type
         |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin,

    "cdc_delete" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')""".stripMargin,

    "cdc_snapshot" ->
      """WITH chg AS (
        |  SELECT e.user_id AS c_custkey, c.c_name, c.c_nationkey,
        |         e.value AS c_acctbal, c.c_mktsegment,
        |         CASE WHEN e.event_type = 'click' THEN 'D' ELSE 'U' END AS op,
        |         row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM events e JOIN customer c ON c.c_custkey = e.user_id),
        |last AS (SELECT * FROM chg WHERE rn = 1)
        |SELECT c.c_custkey, c.c_name, c.c_nationkey,
        |       COALESCE(l.c_acctbal, c.c_acctbal) AS c_acctbal,
        |       c.c_mktsegment
        |FROM customer c LEFT JOIN last l ON c.c_custkey = l.c_custkey
        |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin,

    // the full-snapshot oracle with the feed cut at the as-of horizon
    "cdc_snapshot_asof" ->
      """WITH chg AS (
        |  SELECT e.user_id AS c_custkey, c.c_name, c.c_nationkey,
        |         e.value AS c_acctbal, c.c_mktsegment,
        |         CASE WHEN e.event_type = 'click' THEN 'D' ELSE 'U' END AS op,
        |         row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |  WHERE e.ts <= TIMESTAMP '2024-01-18 00:00:00'),
        |last AS (SELECT * FROM chg WHERE rn = 1)
        |SELECT c.c_custkey, c.c_name, c.c_nationkey,
        |       COALESCE(l.c_acctbal, c.c_acctbal) AS c_acctbal,
        |       c.c_mktsegment
        |FROM customer c LEFT JOIN last l ON c.c_custkey = l.c_custkey
        |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin,

    // lead over ALL ops (updates supersede, deletes close), D rows
    // filtered after — mirrors scd2History's window-then-filter exactly
    "cdc_scd2" ->
      s"""WITH cdc AS ($cdcSql),
         |v AS (
         |  SELECT user_id, event_id, value, event_type, op,
         |         epoch_us(ts) AS valid_from_us,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM cdc)
         |SELECT user_id, event_id, value, event_type, valid_from_us, valid_to_us,
         |       CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM v WHERE op <> 'D'""".stripMargin,

    // incremental merge must equal the full-feed rebuild: the oracle IS
    // the cdc_scd2 window over the whole feed
    "cdc_scd2_merge" ->
      s"""WITH cdc AS ($cdcSql),
         |v AS (
         |  SELECT user_id, event_id, value, event_type, op,
         |         epoch_us(ts) AS valid_from_us,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM cdc)
         |SELECT user_id, event_id, value, event_type, valid_from_us, valid_to_us,
         |       CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM v WHERE op <> 'D'""".stripMargin,

    // the SCD2 history filtered to the version covering T — same window
    // CTE as cdc_scd2, then the interval predicate
    "cdc_scd2_asof" ->
      s"""WITH cdc AS ($cdcSql),
         |v AS (
         |  SELECT user_id, event_id, value, event_type, op,
         |         epoch_us(ts) AS valid_from_us,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM cdc)
         |SELECT user_id, event_id, value, event_type, valid_from_us
         |FROM v
         |WHERE op <> 'D'
         |  AND valid_from_us <= epoch_us(TIMESTAMP '2024-01-18 00:00:00')
         |  AND (valid_to_us IS NULL OR epoch_us(TIMESTAMP '2024-01-18 00:00:00') < valid_to_us)""".stripMargin,

    // duration-weighted daily rollup of the history: same window CTE as
    // cdc_scd2, intervals clipped at the horizon, unnested to the days
    // they overlap, exact centi·µs integer weights (HUGEINT in DuckDB,
    // decimal(38,0) in Spark), ONE final double cast of the same integer
    "cdc_scd2_weighted" ->
      s"""WITH cdc AS ($cdcSql),
         |v AS (
         |  SELECT user_id, value, event_type, op,
         |         epoch_us(ts) AS valid_from_us,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
         |  FROM cdc),
         |h AS (
         |  SELECT event_type,
         |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
         |         valid_from_us,
         |         least(coalesce(valid_to_us, 1706745600000000), 1706745600000000) AS to_us
         |  FROM v WHERE op <> 'D'),
         |e AS (
         |  SELECT event_type, vc, valid_from_us, to_us,
         |         unnest(generate_series(valid_from_us // 86400000000, (to_us - 1) // 86400000000)) AS b
         |  FROM h WHERE to_us > valid_from_us),
         |w AS (
         |  SELECT event_type, vc, b,
         |         least((b + 1) * 86400000000, to_us) - greatest(b * 86400000000, valid_from_us) AS ov
         |  FROM e)
         |SELECT b * 86400000000 AS bucket_us, event_type,
         |       CAST(sum(ov) AS BIGINT) AS weight_us,
         |       CAST(sum(CAST(vc AS HUGEINT) * ov) AS DOUBLE) AS weighted_sum_centi_us,
         |       CAST(sum(CAST(vc AS HUGEINT) * ov) * 10 // sum(ov) AS BIGINT) AS wavg_milli
         |FROM w GROUP BY 1, 2""".stripMargin,

    // footer audit of the query-landed SCD2 history: DuckDB sees the
    // SAME files' metadata, derives the same integer bound from the
    // landed domain, and the whole summary — byte counts included —
    // compares exactly (the prune_audit pattern over the A10t landing)
    "prune_audit_scd2" ->
      s"""WITH dom AS (
         |  SELECT min(valid_from_us) AS d_mn, max(valid_from_us) AS d_mx
         |  FROM '/tmp/graft_prune_audit/${RunPaths.currentTag}/scd2_hist/*.parquet'),
         |b AS (SELECT d_mn AS lo, d_mn + (d_mx - d_mn) // 4 AS hi FROM dom),
         |rg AS (
         |  SELECT file_name, row_group_id,
         |    max(row_group_num_rows) AS rows,
         |    sum(total_compressed_size) AS bytes,
         |    max(CASE WHEN path_in_schema = 'valid_from_us'
         |             THEN CAST(stats_min_value AS BIGINT) END) AS mn,
         |    max(CASE WHEN path_in_schema = 'valid_from_us'
         |             THEN CAST(stats_max_value AS BIGINT) END) AS mx
         |  FROM parquet_metadata('/tmp/graft_prune_audit/${RunPaths.currentTag}/scd2_hist/*.parquet')
         |  GROUP BY 1, 2),
         |p AS (SELECT rows, bytes,
         |    CASE WHEN rg.mn IS NOT NULL AND (rg.mx < b.lo OR rg.mn > b.hi)
         |         THEN 1 ELSE 0 END AS pruned FROM rg, b)
         |SELECT count(*) AS row_groups,
         |  CAST(sum(pruned) AS BIGINT) AS rg_pruned,
         |  CAST(sum(rows) AS BIGINT) AS rows_total,
         |  CAST(sum(rows * pruned) AS BIGINT) AS rows_pruned,
         |  CAST(sum(bytes) AS BIGINT) AS bytes_total,
         |  CAST(sum(bytes * pruned) AS BIGINT) AS bytes_pruned
         |FROM p""".stripMargin,

    // first/last op per key via two row_number passes (DuckDB mirror of
    // min_by/max_by over the same (ts, event_id) ordering); net op =
    // D if last is D, I if first is I, else U; payload = last image,
    // nulled on tombstones
    "cdc_compact" ->
      s"""WITH cdc AS ($cdcSql),
         |r AS (
         |  SELECT user_id, event_id, ts, value, event_type, op,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
         |  FROM cdc),
         |f AS (SELECT user_id, op AS first_op FROM r WHERE rn_a = 1),
         |l AS (SELECT user_id, event_id, ts, value, event_type, op AS last_op
         |      FROM r WHERE rn_d = 1)
         |SELECT l.user_id,
         |  CASE WHEN l.last_op = 'D' THEN 'D'
         |       WHEN f.first_op = 'I' THEN 'I' ELSE 'U' END AS op,
         |  CASE WHEN l.last_op <> 'D' THEN l.event_id END AS event_id,
         |  CASE WHEN l.last_op <> 'D' THEN epoch_us(l.ts) END AS ts_us,
         |  CASE WHEN l.last_op <> 'D' THEN l.value END AS value,
         |  CASE WHEN l.last_op <> 'D' THEN l.event_type END AS event_type
         |FROM l JOIN f ON l.user_id = f.user_id""".stripMargin,

    // two parity-split histories (each the cdc_scd2 window over its own
    // feed half), overlap-joined on the key, validity clipped to the
    // intersection; an open end (NULL) is +∞ on both sides
    "cdc_scd2_align" ->
      s"""WITH cdc AS ($cdcSql),
         |a0 AS (
         |  SELECT user_id, event_id AS a_event_id, value AS a_value, op,
         |         epoch_us(ts) AS a_from,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS a_to
         |  FROM cdc WHERE event_id % 2 = 0),
         |b0 AS (
         |  SELECT user_id, event_id AS b_event_id, value AS b_value, op,
         |         epoch_us(ts) AS b_from,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b_to
         |  FROM cdc WHERE event_id % 2 = 1),
         |a AS (SELECT * FROM a0 WHERE op <> 'D'),
         |b AS (SELECT * FROM b0 WHERE op <> 'D')
         |SELECT a.user_id, a_event_id, a_value, b_event_id, b_value,
         |       greatest(a_from, b_from) AS valid_from_us,
         |       CASE WHEN a_to IS NULL THEN b_to
         |            WHEN b_to IS NULL THEN a_to
         |            ELSE least(a_to, b_to) END AS valid_to_us
         |FROM a JOIN b ON a.user_id = b.user_id
         |WHERE a_from < coalesce(b_to, 9223372036854775807)
         |  AND b_from < coalesce(a_to, 9223372036854775807)""".stripMargin,

    // the same segment construction: boundary spine = every version
    // start/end from both sides (UNION dedups), lead closes each segment
    // (last stays open = NULL), each side left-joined on key + containment;
    // versions are half-open so zero-length ones never cover a segment
    "cdc_scd2_diff" ->
      s"""WITH cdc AS ($cdcSql),
         |l0 AS (
         |  SELECT user_id, event_id, value, op, epoch_us(ts) AS f,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
         |  FROM cdc),
         |l AS (SELECT * FROM l0 WHERE op <> 'D'),
         |r0 AS (
         |  SELECT user_id, event_id, value, op, epoch_us(ts) AS f,
         |         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
         |  FROM cdc WHERE event_id % 20 <> 0),
         |r AS (SELECT * FROM r0 WHERE op <> 'D'),
         |b AS (
         |  SELECT user_id, f AS b FROM l UNION SELECT user_id, t FROM l WHERE t IS NOT NULL
         |  UNION SELECT user_id, f FROM r UNION SELECT user_id, t FROM r WHERE t IS NOT NULL),
         |seg AS (
         |  SELECT user_id, b AS s,
         |         lead(b) OVER (PARTITION BY user_id ORDER BY b) AS e
         |  FROM b),
         |j AS (
         |  SELECT seg.user_id, seg.s, seg.e,
         |         l.event_id AS l_event_id, l.value AS l_value, l.f IS NOT NULL AS ll,
         |         r.event_id AS r_event_id, r.value AS r_value, r.f IS NOT NULL AS rl
         |  FROM seg
         |  LEFT JOIN l ON l.user_id = seg.user_id
         |    AND l.f <= seg.s AND seg.s < coalesce(l.t, 9223372036854775807)
         |  LEFT JOIN r ON r.user_id = seg.user_id
         |    AND r.f <= seg.s AND seg.s < coalesce(r.t, 9223372036854775807))
         |SELECT user_id, s AS valid_from_us, e AS valid_to_us,
         |  CASE WHEN ll AND rl THEN 'mismatch'
         |       WHEN ll THEN 'only_left' ELSE 'only_right' END AS diff_kind,
         |  l_event_id, r_event_id, l_value, r_value
         |FROM j
         |WHERE (ll OR rl) AND NOT (ll AND rl
         |  AND l_event_id IS NOT DISTINCT FROM r_event_id
         |  AND l_value IS NOT DISTINCT FROM r_value)""".stripMargin,

    "diff_rowlevel" -> {
      val mism = ordersCols.filterNot(_ == "o_orderkey")
        .map(c => s"s.$c IS DISTINCT FROM t.$c").mkString(" OR ")
      s"""WITH tgt AS ($perturbedOrdersSql)
         |SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
         |  CASE WHEN s.o_orderkey IS NULL THEN 'target_only'
         |       WHEN t.o_orderkey IS NULL THEN 'source_only'
         |       WHEN $mism THEN 'mismatch' END AS diff_status
         |FROM orders s FULL OUTER JOIN tgt t ON s.o_orderkey = t.o_orderkey
         |WHERE s.o_orderkey IS NULL OR t.o_orderkey IS NULL OR $mism""".stripMargin
    },

    "diff_chunk" -> {
      val rowHash = graft.text.PortableHash.duckH32(
        "concat_ws('|', " +
          ordersCols.map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")")
      s"""WITH tgt AS ($perturbedOrdersSql),
         |sa AS (
         |  SELECT CAST(floor(o_orderkey / 1000.0) AS BIGINT) AS chunk_id,
         |         count(*) AS src_rows, sum($rowHash) AS sh
         |  FROM orders GROUP BY 1),
         |ta AS (
         |  SELECT CAST(floor(o_orderkey / 1000.0) AS BIGINT) AS chunk_id,
         |         count(*) AS tgt_rows, sum($rowHash) AS th
         |  FROM tgt GROUP BY 1)
         |SELECT COALESCE(sa.chunk_id, ta.chunk_id) AS chunk_id,
         |       CAST(COALESCE(src_rows, 0) AS BIGINT) AS src_rows,
         |       CAST(COALESCE(tgt_rows, 0) AS BIGINT) AS tgt_rows,
         |       (src_rows IS NOT DISTINCT FROM tgt_rows AND sh IS NOT DISTINCT FROM th) AS chunks_match
         |FROM sa FULL OUTER JOIN ta ON sa.chunk_id = ta.chunk_id""".stripMargin
    },

    "diff_chunk_ordered" -> {
      val rowHash = graft.text.PortableHash.duckH32(
        "concat_ws('|', " +
          ordersCols.map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")")
      s"""WITH tgt AS ($perturbedOrdersSql),
         |sp AS (
         |  SELECT $rowHash AS h,
         |         row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
         |  FROM orders),
         |tp AS (
         |  SELECT $rowHash AS h,
         |         row_number() OVER (ORDER BY o_orderkey) - 1 AS pos
         |  FROM tgt),
         |sa AS (
         |  SELECT CAST(floor(pos / 500.0) AS BIGINT) AS chunk_id,
         |         count(*) AS src_rows, sum(h) AS sh
         |  FROM sp WHERE pos >= 100 GROUP BY 1),
         |ta AS (
         |  SELECT CAST(floor(pos / 500.0) AS BIGINT) AS chunk_id,
         |         count(*) AS tgt_rows, sum(h) AS th
         |  FROM tp WHERE pos >= 100 GROUP BY 1)
         |SELECT COALESCE(sa.chunk_id, ta.chunk_id) AS chunk_id,
         |       CAST(COALESCE(src_rows, 0) AS BIGINT) AS src_rows,
         |       CAST(COALESCE(tgt_rows, 0) AS BIGINT) AS tgt_rows,
         |       (src_rows IS NOT DISTINCT FROM tgt_rows AND sh IS NOT DISTINCT FROM th) AS chunks_match
         |FROM sa FULL OUTER JOIN ta ON sa.chunk_id = ta.chunk_id""".stripMargin
    },

    "diff_count" ->
      s"""WITH tgt AS ($perturbedOrdersSql)
         |SELECT 'orders' AS tbl,
         |       (SELECT count(*) FROM orders) AS src_rows,
         |       (SELECT count(*) FROM tgt) AS tgt_rows,
         |       (SELECT count(*) FROM orders) = (SELECT count(*) FROM tgt) AS counts_match""".stripMargin,

    // same replica construction (80%-horizon latest state, drops, bumps,
    // negative-id ghosts), same history classification: the latest
    // payload-matching version decides (row_number mirror of max_by),
    // missing = current keys absent from the replica; fixed 5-class
    // spine. Classification is per KEY (distinct replica ids — the
    // operator's groupBy(pk)), not per replica row
    "cdc_explain_diff" ->
      s"""WITH cdc AS ($cdcSql),
         |mm AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM cdc),
         |tt AS (SELECT mn + (mx - mn) * 4 // 5 AS t FROM mm),
         |le AS (
         |  SELECT user_id, event_id, value, op FROM (
         |    SELECT user_id, event_id, value, op,
         |           row_number() OVER (PARTITION BY user_id
         |             ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM cdc CROSS JOIN tt WHERE epoch_us(ts) <= t) WHERE rn = 1),
         |rep AS (
         |  SELECT user_id, event_id,
         |         CASE WHEN user_id % 7 = 0 THEN value + 1 ELSE value END AS value
         |  FROM le WHERE op <> 'D' AND user_id % 13 <> 0
         |  UNION ALL
         |  SELECT DISTINCT -user_id - 1, 0, 0.0 FROM cdc WHERE user_id % 11 = 0),
         |hv AS (
         |  SELECT * FROM (
         |    SELECT user_id, event_id, value, op, epoch_us(ts) AS vf,
         |           lead(epoch_us(ts)) OVER (PARTITION BY user_id
         |             ORDER BY ts, event_id) AS vt
         |    FROM cdc) WHERE op <> 'D'),
         |m AS (
         |  SELECT r.user_id, h.vf, h.vt,
         |         CASE WHEN h.vt IS NULL THEN 1 ELSE 0 END AS cur,
         |         row_number() OVER (PARTITION BY r.user_id ORDER BY h.vf DESC) AS rn
         |  FROM rep r JOIN hv h ON h.user_id = r.user_id
         |    AND h.event_id IS NOT DISTINCT FROM r.event_id
         |    AND h.value IS NOT DISTINCT FROM r.value),
         |mb AS (SELECT user_id, vf, vt, cur FROM m WHERE rn = 1),
         |cls AS (
         |  SELECT r.user_id,
         |    CASE WHEN mb.cur = 1 THEN 'in_sync'
         |         WHEN mb.vf IS NOT NULL THEN 'behind'
         |         WHEN k.user_id IS NOT NULL THEN 'diverged'
         |         ELSE 'unknown_key' END AS class,
         |    CASE WHEN mb.cur IS NULL OR mb.cur <> 1 THEN mb.vt END AS w
         |  FROM (SELECT DISTINCT user_id FROM rep) r
         |  LEFT JOIN mb ON mb.user_id = r.user_id
         |  LEFT JOIN (SELECT DISTINCT user_id FROM hv) k ON k.user_id = r.user_id),
         |miss AS (
         |  SELECT 'missing' AS class, CAST(NULL AS BIGINT) AS w
         |  FROM (SELECT user_id FROM hv WHERE vt IS NULL) c
         |  WHERE NOT EXISTS (SELECT 1 FROM rep r WHERE r.user_id = c.user_id)),
         |allc AS (SELECT class, w FROM cls UNION ALL SELECT class, w FROM miss),
         |sp(class) AS (VALUES ('in_sync'), ('behind'), ('diverged'),
         |                     ('unknown_key'), ('missing'))
         |SELECT sp.class, coalesce(cnt.n, 0) AS n_keys, cnt.worst AS worst_us
         |FROM sp LEFT JOIN (
         |  SELECT class, count(*) AS n, min(w) AS worst FROM allc GROUP BY 1) cnt
         |USING (class)""".stripMargin,

    // same reference-anchored equi-width bins (clamped edges), Laplace
    // +1, per-bin ⌊ln·10⁴⌋ BEFORE the sum, HUGEINT products — the s·l
    // terms are non-negative so // mirrors div
    "table_drift" ->
      s"""WITH stats AS (
         |  SELECT min(CAST(o_totalprice AS DOUBLE)) AS mn,
         |         max(CAST(o_totalprice AS DOUBLE)) AS mx
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |rb AS (
         |  SELECT CASE WHEN mx = mn THEN 0 ELSE
         |    least(9, greatest(0, CAST(floor(
         |      (CAST(o_totalprice AS DOUBLE) - mn) * 10.0 / (mx - mn)) AS BIGINT)))
         |  END AS bin
         |  FROM orders CROSS JOIN stats WHERE o_totalprice IS NOT NULL),
         |cb AS (
         |  SELECT CASE WHEN mx = mn THEN 0 ELSE
         |    least(9, greatest(0, CAST(floor(
         |      (CAST(o_totalprice AS DOUBLE) - mn) * 10.0 / (mx - mn)) AS BIGINT)))
         |  END AS bin
         |  FROM ($perturbedOrdersSql) CROSS JOIN stats WHERE o_totalprice IS NOT NULL),
         |ac AS (SELECT bin, count(*) AS c FROM rb GROUP BY 1),
         |bc AS (SELECT bin, count(*) AS c FROM cb GROUP BY 1),
         |j AS (
         |  SELECT s.bin, coalesce(ac.c, 0) + 1 AS a, coalesce(bc.c, 0) + 1 AS b
         |  FROM (SELECT unnest(generate_series(0, 9)) AS bin) s
         |  LEFT JOIN ac USING (bin) LEFT JOIN bc USING (bin)),
         |w AS (
         |  SELECT bin, a, b,
         |         sum(a) OVER () AS ta, sum(b) OVER () AS tb
         |  FROM j),
         |t AS (
         |  SELECT CAST(a AS HUGEINT) * tb AS ab, CAST(b AS HUGEINT) * ta AS ba,
         |         ta, tb
         |  FROM w)
         |SELECT 'o_totalprice' AS col_name,
         |  CAST(sum((ab - ba) * CAST(floor(ln(CAST(ab AS DOUBLE) / CAST(ba AS DOUBLE))
         |       * 10000.0) AS HUGEINT))
         |    // (CAST(max(ta) AS HUGEINT) * CAST(max(tb) AS HUGEINT)) AS BIGINT) AS psi_e4,
         |  CAST(max(ta) - 10 AS BIGINT) AS n_ref,
         |  CAST(max(tb) - 10 AS BIGINT) AS n_cur
         |FROM t""".stripMargin,

    "cdc_validate" -> {
      val rowHash = graft.text.PortableHash.duckH32(
        "concat_ws('|', " +
          ordersCols.map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")")
      val mism = ordersCols.filterNot(_ == "o_orderkey")
        .map(c => s"s.$c IS DISTINCT FROM t.$c").mkString(" OR ")
      s"""WITH tgt AS ($perturbedOrdersSql),
         |sp AS (SELECT $rowHash AS h, row_number() OVER (ORDER BY o_orderkey) - 1 AS pos FROM orders),
         |tp AS (SELECT $rowHash AS h, row_number() OVER (ORDER BY o_orderkey) - 1 AS pos FROM tgt),
         |sa AS (SELECT CAST(floor(pos / 500.0) AS BIGINT) AS chunk_id,
         |              count(*) AS src_rows, sum(h) AS sh FROM sp GROUP BY 1),
         |ta AS (SELECT CAST(floor(pos / 500.0) AS BIGINT) AS chunk_id,
         |              count(*) AS tgt_rows, sum(h) AS th FROM tp GROUP BY 1),
         |chunks AS (
         |  SELECT (src_rows IS NOT DISTINCT FROM tgt_rows AND sh IS NOT DISTINCT FROM th) AS ok
         |  FROM sa FULL OUTER JOIN ta ON sa.chunk_id = ta.chunk_id),
         |rd AS (
         |  SELECT count(*) AS n
         |  FROM orders s FULL OUTER JOIN tgt t ON s.o_orderkey = t.o_orderkey
         |  WHERE s.o_orderkey IS NULL OR t.o_orderkey IS NULL OR $mism)
         |SELECT 'orders' AS tbl,
         |  (SELECT count(*) FROM orders) AS src_rows,
         |  (SELECT count(*) FROM tgt) AS tgt_rows,
         |  (SELECT count(*) FROM orders) = (SELECT count(*) FROM tgt) AS counts_match,
         |  (SELECT count(*) FROM chunks WHERE NOT ok) AS chunks_mismatched,
         |  (SELECT n FROM rd) AS rows_differing""".stripMargin
    },

    "cdc_validate_hash" -> {
      val rowHash = graft.text.PortableHash.duckH32(
        "concat_ws('|', " +
          ordersCols.map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")")
      val mism = ordersCols.filterNot(_ == "o_orderkey")
        .map(c => s"s.$c IS DISTINCT FROM t.$c").mkString(" OR ")
      // portable-hash chunk id: h32 of the pk string, mod 1e6, / 500.
      // floor, not a bare cast: DuckDB's / yields DOUBLE and its
      // double→bigint cast ROUNDS where Spark's truncates
      val chunkOf = s"CAST(floor((${graft.text.PortableHash.duckH32(
        "COALESCE(CAST(o_orderkey AS VARCHAR), 'NULL')")} % 1000000) / 500.0) AS BIGINT)"
      s"""WITH tgt AS ($perturbedOrdersSql),
         |sa AS (SELECT $chunkOf AS chunk_id, count(*) AS src_rows, sum($rowHash) AS sh
         |       FROM orders GROUP BY 1),
         |ta AS (SELECT $chunkOf AS chunk_id, count(*) AS tgt_rows, sum($rowHash) AS th
         |       FROM tgt GROUP BY 1),
         |chunks AS (
         |  SELECT (src_rows IS NOT DISTINCT FROM tgt_rows AND sh IS NOT DISTINCT FROM th) AS ok
         |  FROM sa FULL OUTER JOIN ta ON sa.chunk_id = ta.chunk_id),
         |rd AS (
         |  SELECT count(*) AS n
         |  FROM orders s FULL OUTER JOIN tgt t ON s.o_orderkey = t.o_orderkey
         |  WHERE s.o_orderkey IS NULL OR t.o_orderkey IS NULL OR $mism)
         |SELECT 'orders' AS tbl,
         |  (SELECT count(*) FROM orders) AS src_rows,
         |  (SELECT count(*) FROM tgt) AS tgt_rows,
         |  (SELECT count(*) FROM orders) = (SELECT count(*) FROM tgt) AS counts_match,
         |  (SELECT count(*) FROM chunks WHERE NOT ok) AS chunks_mismatched,
         |  (SELECT n FROM rd) AS rows_differing""".stripMargin
    },

    "cdc_validate_sampled" -> {
      val rowHash = graft.text.PortableHash.duckH32(
        "concat_ws('|', " +
          ordersCols.map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")")
      val mism = ordersCols.filterNot(_ == "o_orderkey")
        .map(c => s"s.$c IS DISTINCT FROM t.$c").mkString(" OR ")
      val chunkOf = s"CAST(floor((${graft.text.PortableHash.duckH32(
        "COALESCE(CAST(o_orderkey AS VARCHAR), 'NULL')")} % 1000000) / 500.0) AS BIGINT)"
      val samp = s"(${graft.text.PortableHash.duckH32(
        "'vsamp:'||CAST(cid AS VARCHAR)")} % 10000) < 4000"
      s"""WITH tgt AS ($perturbedOrdersSql),
         |ss AS (SELECT * FROM (SELECT *, $chunkOf AS cid FROM orders) WHERE $samp),
         |ts AS (SELECT * FROM (SELECT *, $chunkOf AS cid FROM tgt) WHERE $samp),
         |sa AS (SELECT cid AS chunk_id, count(*) AS src_rows, sum($rowHash) AS sh
         |       FROM ss GROUP BY 1),
         |ta AS (SELECT cid AS chunk_id, count(*) AS tgt_rows, sum($rowHash) AS th
         |       FROM ts GROUP BY 1),
         |chunks AS (
         |  SELECT (src_rows IS NOT DISTINCT FROM tgt_rows AND sh IS NOT DISTINCT FROM th) AS ok
         |  FROM sa FULL OUTER JOIN ta ON sa.chunk_id = ta.chunk_id),
         |rd AS (
         |  SELECT count(*) AS n
         |  FROM ss s FULL OUTER JOIN ts t ON s.o_orderkey = t.o_orderkey
         |  WHERE s.o_orderkey IS NULL OR t.o_orderkey IS NULL OR $mism)
         |SELECT 'orders' AS tbl,
         |  (SELECT count(*) FROM ss) AS src_rows,
         |  (SELECT count(*) FROM ts) AS tgt_rows,
         |  (SELECT count(*) FROM ss) = (SELECT count(*) FROM ts) AS counts_match,
         |  (SELECT count(*) FROM chunks WHERE NOT ok) AS chunks_mismatched,
         |  (SELECT n FROM rd) AS rows_differing""".stripMargin
    },

    // A0k: the validate oracles over the hot-key fixture — identical
    // machinery to cdc_validate/_hash with the composite (user_id,
    // event_id) pk and the skew derivation CTEs
    "cdc_validate_skew" -> {
      val rowHash = graft.text.PortableHash.duckH32(
        "concat_ws('|', " +
          skewCols.map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")")
      val mism = skewCols.filterNot(skewPk.contains)
        .map(c => s"s.$c IS DISTINCT FROM t.$c").mkString(" OR ")
      s"""WITH src AS ($skewedEventsSql),
         |tgt AS ($perturbedSkewedEventsSql),
         |sp AS (SELECT $rowHash AS h, row_number() OVER (ORDER BY user_id, event_id) - 1 AS pos FROM src),
         |tp AS (SELECT $rowHash AS h, row_number() OVER (ORDER BY user_id, event_id) - 1 AS pos FROM tgt),
         |sa AS (SELECT CAST(floor(pos / 500.0) AS BIGINT) AS chunk_id,
         |              count(*) AS src_rows, sum(h) AS sh FROM sp GROUP BY 1),
         |ta AS (SELECT CAST(floor(pos / 500.0) AS BIGINT) AS chunk_id,
         |              count(*) AS tgt_rows, sum(h) AS th FROM tp GROUP BY 1),
         |chunks AS (
         |  SELECT (src_rows IS NOT DISTINCT FROM tgt_rows AND sh IS NOT DISTINCT FROM th) AS ok
         |  FROM sa FULL OUTER JOIN ta ON sa.chunk_id = ta.chunk_id),
         |rd AS (
         |  SELECT count(*) AS n
         |  FROM src s FULL OUTER JOIN tgt t
         |    ON s.user_id = t.user_id AND s.event_id = t.event_id
         |  WHERE s.event_id IS NULL OR t.event_id IS NULL OR $mism)
         |SELECT 'events_skew' AS tbl,
         |  (SELECT count(*) FROM src) AS src_rows,
         |  (SELECT count(*) FROM tgt) AS tgt_rows,
         |  (SELECT count(*) FROM src) = (SELECT count(*) FROM tgt) AS counts_match,
         |  (SELECT count(*) FROM chunks WHERE NOT ok) AS chunks_mismatched,
         |  (SELECT n FROM rd) AS rows_differing""".stripMargin
    },

    "cdc_validate_hash_skew" -> {
      val rowHash = graft.text.PortableHash.duckH32(
        "concat_ws('|', " +
          skewCols.map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")")
      val mism = skewCols.filterNot(skewPk.contains)
        .map(c => s"s.$c IS DISTINCT FROM t.$c").mkString(" OR ")
      val pkStr = "concat_ws('|', " + skewPk
        .map(c => s"COALESCE(CAST($c AS VARCHAR), chr(1)||'NULL')").mkString(", ") + ")"
      val chunkOf =
        s"CAST(floor((${graft.text.PortableHash.duckH32(pkStr)} % 1000000) / 500.0) AS BIGINT)"
      s"""WITH src AS ($skewedEventsSql),
         |tgt AS ($perturbedSkewedEventsSql),
         |sa AS (SELECT $chunkOf AS chunk_id, count(*) AS src_rows, sum($rowHash) AS sh
         |       FROM src GROUP BY 1),
         |ta AS (SELECT $chunkOf AS chunk_id, count(*) AS tgt_rows, sum($rowHash) AS th
         |       FROM tgt GROUP BY 1),
         |chunks AS (
         |  SELECT (src_rows IS NOT DISTINCT FROM tgt_rows AND sh IS NOT DISTINCT FROM th) AS ok
         |  FROM sa FULL OUTER JOIN ta ON sa.chunk_id = ta.chunk_id),
         |rd AS (
         |  SELECT count(*) AS n
         |  FROM src s FULL OUTER JOIN tgt t
         |    ON s.user_id = t.user_id AND s.event_id = t.event_id
         |  WHERE s.event_id IS NULL OR t.event_id IS NULL OR $mism)
         |SELECT 'events_skew' AS tbl,
         |  (SELECT count(*) FROM src) AS src_rows,
         |  (SELECT count(*) FROM tgt) AS tgt_rows,
         |  (SELECT count(*) FROM src) = (SELECT count(*) FROM tgt) AS counts_match,
         |  (SELECT count(*) FROM chunks WHERE NOT ok) AS chunks_mismatched,
         |  (SELECT n FROM rd) AS rows_differing""".stripMargin
    }
  )

  private val skewCols = Seq("event_id", "user_id", "event_type", "value_fp")
  private val skewPk = Seq("user_id", "event_id")
}
