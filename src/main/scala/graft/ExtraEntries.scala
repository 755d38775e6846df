package graft

import graft.operators.AsofJoin
import graft.text.TextOps
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Additional validation/warehouse operators (SURVEY §2 D7–D9):
  * as-of join, corpus vocabulary stats, referential-integrity audit. */
object ExtraEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D7: backward as-of join — each purchase event picks up the same
    // user's most recent prior view (union + carry-forward window, one
    // shuffle; purchases and views genuinely interleave in time)
    "asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(struct(col("event_id"), col("value")), col("event_id")).as("w"))
        .select(col("user_id"), col("ts"),
          col("w.event_id").as("view_event_id"), col("w.value").as("view_value"))
      AsofJoin.backward(purchases, views, Seq("user_id"), "ts", "ts",
        Seq("view_event_id", "view_value"))
        .select(col("event_id"), col("user_id"),
          col("value").as("purchase_value"),
          col("asof_view_event_id"), col("asof_view_value"))
    }),

    // D7f: FORWARD as-of — each purchase picks up the same user's next
    // view at or after it (attribution's "what did they do next");
    // identical single-shuffle plan with the per-key sort reversed
    "asof_join_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(struct(col("event_id"), col("value")), col("event_id")).as("w"))
        .select(col("user_id"), col("ts"),
          col("w.event_id").as("view_event_id"), col("w.value").as("view_value"))
      AsofJoin.forward(purchases, views, Seq("user_id"), "ts", "ts",
        Seq("view_event_id", "view_value"))
        .select(col("event_id"), col("user_id"),
          col("value").as("purchase_value"),
          col("asof_view_event_id"), col("asof_view_value"))
    }),

    // D7t: TOLERANCED as-of — a prior view only counts within a 1-hour
    // window (stale matches become misses, the attribution-window
    // semantic); integer-microsecond boundary, exact in both engines
    "asof_join_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(struct(col("event_id"), col("value")), col("event_id")).as("w"))
        .select(col("user_id"), col("ts"),
          col("w.event_id").as("view_event_id"), col("w.value").as("view_value"))
      AsofJoin.backward(purchases, views, Seq("user_id"), "ts", "ts",
        Seq("view_event_id", "view_value"),
        tolerance = Some(lit(3600L * 1000 * 1000)))
        .select(col("event_id"), col("user_id"),
          col("value").as("purchase_value"),
          col("asof_view_event_id"), col("asof_view_value"))
    }),

    // D11: point-in-interval RANGE join with NO equi key — every event
    // attributed to the signup "activation windows" it falls inside
    // (window = [signup ts, +1..7 min)), then rolled up per window.
    // Grain-bucketed equi join (RangeJoin), never a nested loop; 1-minute
    // grain ≈ the window span, so ≤ 8 replicas per interval.
    "range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val pts = ev.select(col("event_id").as("point_id"), col("ts").as("pt_ts"))
      val iv = ev.filter(col("event_type") === "signup")
        .select(
          col("event_id").as("interval_id"),
          unix_micros(col("ts")).as("iv_start_us"),
          (unix_micros(col("ts")) +
            (col("event_id") % 7 + 1) * lit(60L * 1000 * 1000)).as("iv_end_us"))
      graft.operators.RangeJoin.pointInInterval(
        pts, col("pt_ts"), iv, col("iv_start_us"), col("iv_end_us"),
        grainUs = 60L * 1000 * 1000)
        .groupBy(col("interval_id"))
        .agg(
          count(lit(1)).as("n_points"),
          min(col("point_id")).as("first_point"),
          max(col("point_id")).as("last_point"))
    }),

    // D11o: interval-OVERLAP join — signup activation windows vs purchase
    // "settlement windows": which campaigns were live while a purchase was
    // settling. Both sides replicate to 1-minute grain buckets; each
    // overlapping pair is attributed to the single bucket holding
    // max(starts), so the bucket equi-join emits it exactly once with no
    // distinct pass. Rolled up per signup window.
    "range_join_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val minUs = 60L * 1000 * 1000
      val su = ev.filter(col("event_type") === "signup")
        .select(
          col("event_id").as("signup_id"),
          unix_micros(col("ts")).as("su_s_us"),
          (unix_micros(col("ts")) + (col("event_id") % 7 + 1) * lit(minUs))
            .as("su_e_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(
          col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("pu_s_us"),
          (unix_micros(col("ts")) + (col("event_id") % 5 + 1) * lit(minUs))
            .as("pu_e_us"))
      graft.operators.RangeJoin.intervalOverlap(
        su, col("su_s_us"), col("su_e_us"),
        pu, col("pu_s_us"), col("pu_e_us"),
        grainUs = minUs)
        .groupBy(col("signup_id"))
        .agg(
          count(lit(1)).as("n_overlaps"),
          min(col("purchase_id")).as("first_purchase"),
          max(col("purchase_id")).as("last_purchase"))
    }),

    // E61: edit-distance join via deletion-neighborhood blocking — all
    // unordered customer-name pairs within Levenshtein 1 (digit typos).
    // The naive condition would plan a 1500×1500 nested loop; blocking
    // makes it a hash-equi join on 8-byte variant keys + an exact
    // threshold-bounded residual, duplicates killed output-side.
    "fuzzy_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val a = c.select(col("c_custkey").as("a_id"), col("c_name").as("a_name"))
      val b = c.select(col("c_custkey").as("b_id"), col("c_name").as("b_name"))
      graft.operators.FuzzyJoin.editDistanceJoin(a, "a_name", b, "b_name", maxDist = 1)
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "a_name", "b_id", "b_name", "edit_dist")
    }),

    // D11c: interval coalescing — per-user activity RUNS from per-event
    // windows ([ts, ts + 1..7 min)): overlapping-or-touching windows
    // merge into maximal disjoint spans (half-open union is lossless).
    // One exchange by user, per-key sort = that user's own event count.
    "range_coalesce" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val minUs = 60L * 1000 * 1000
      val iv = ev.select(
        col("user_id"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + (col("event_id") % 7 + 1) * lit(minUs))
          .as("e_us"))
      graft.operators.RangeJoin.coalesceIntervals(
        iv, Seq("user_id"), col("s_us"), col("e_us"))
    }),

    // D17: per-user DAILY resampling of the purchase-value series — one
    // row per user per epoch-aligned day inside the user's own span,
    // valued by LOCF and by linear interpolation (the gap-fill read a
    // bucket rollup can't express: sampleless days still emit). Both
    // windows ride one exchange; even the interpolated double is
    // oracle-exact (identical IEEE expression tree), surfaced bp-floored.
    "events_resample" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      graft.operators.Resample.gridFill(
        ev, Seq("user_id"), col("ts"), col("value"),
        tieBreak = col("event_id"), grainUs = 86400000000L)
        .select(col("user_id"), col("tick_us"), col("v_locf"),
          floor(col("v_interp") * 10000.0).cast("long").as("v_interp_bp"))
    }),

    // D18: per-type value TREND — exact-integer OLS slope (milli-units
    // per day) + r² in bp from one map-side-combined power-sum pass; the
    // "did the content drift" monitor next to events_anomalies' volume 3σ
    "events_trend" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Trend.perGroup(
        ev, Seq("event_type"),
        graft.util.TimeCols.toMicros(ev, col("ts")), col("value"),
        xOffsetS = 1500000000L)
    }),

    // D19: event-type CO-OCCURRENCE — "users who do A also do B":
    // support/confidence/lift in exact integer bp over per-user baskets;
    // pair generation local to each basket row (no self-join)
    "events_cooccur" -> ((s, dir) =>
      graft.operators.Cooccur.pairs(
        Tables.events(s, dir), "user_id", "event_type")),

    // D20: strongest hourly-volume CHANGEPOINT per event type — WHERE
    // the level shifted (D15 flags which hours are anomalous; this
    // locates the split): all-integer binary-segmentation statistic,
    // earliest-hour tie-break, one rollup + tiny-frame window + argmax
    "events_changepoint" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.operators.Changepoint.strongestShift(
        ev, Seq("event_type"), graft.util.TimeCols.toMicros(ev, col("ts")))
    }),

    // E65: Zipf exponent per source — the distribution-health number:
    // top-256 term log-log fit, every ln collapsed to an integer per
    // term (E55 discipline), exact OLS on the integer points (D18 sums)
    "text_zipf" -> ((s, dir) =>
      graft.text.Zipf.fit(
        Tables.documents(s, dir), Seq("source"), col("text"))),

    // D8: vocabulary statistics — term frequency + document frequency
    "text_vocab" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .filter(col("tf") >= 5)
    }),

    // D10: exact interpolated quantiles per group (sort-based aggregate);
    // identical linear interpolation of identical doubles in both engines,
    // basis-point floored for hash-stable output
    "q_quantiles" -> ((s, dir) => {
      def pbp(p: Double, n: String) =
        floor(expr(s"percentile(value, $p)") * 10000.0).cast("long").as(n)
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(pbp(0.25, "p25_bp"), pbp(0.5, "p50_bp"), pbp(0.75, "p75_bp"),
          count(lit(1)).as("n"))
    }),

    // D10s: SAMPLED per-group quantile estimate — the scale path for
    // D10: KMV-style bottom-k hash sample via the native top-k operator,
    // deterministic and engine-reproducible, so even the ESTIMATE is
    // oracle-checked bit-for-bit (DuckDB derives the identical sample)
    "q_quantiles_sampled" -> ((s, dir) =>
      graft.operators.SampledQuantiles.perGroup(
        Tables.events(s, dir), "event_type", "event_id", "value", 256,
        Seq(0.25 -> "p25_bp", 0.5 -> "p50_bp", 0.75 -> "p75_bp"))),

    // D22: inter-event DWELL quantiles — exact p50/p90/p99 of the gap
    // since the user's previous event, per arriving event type: the
    // "how long do users idle before doing X" read. One user-keyed
    // window (lag), then the D10 exact-percentile aggregate; first
    // events have no predecessor and drop.
    "events_dwell" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("__us"), col("event_id"))
      def pus(p: Double, n: String) =
        floor(expr(s"percentile(__gap, $p)")).cast("long").as(n)
      ev.withColumn("__us", graft.util.TimeCols.toMicros(ev, col("ts")))
        .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
        .filter(col("__gap").isNotNull)
        .groupBy(col("event_type"))
        .agg(pus(0.5, "p50_us"), pus(0.9, "p90_us"), pus(0.99, "p99_us"),
          count(lit(1)).as("n"))
    }),

    // D9: referential-integrity audit — orphan counts per FK relation
    // (left-anti joins; parents broadcast when small)
    "ref_integrity" -> ((s, dir) => {
      def orphans(child: DataFrame, fk: String, parent: DataFrame, pk: String,
          label: String): DataFrame =
        child.join(parent.select(col(pk)), child(fk) === parent(pk), "left_anti")
          .agg(count(lit(1)).as("orphans"))
          .select(lit(label).as("relation"), col("orphans"))
      val o = Tables.orders(s, dir); val c = Tables.customer(s, dir)
      val l = Tables.lineitem(s, dir); val p = Tables.part(s, dir)
      val e = Tables.events(s, dir)
      orphans(o, "o_custkey", c, "c_custkey", "orders->customer")
        .unionByName(orphans(l, "l_orderkey", o, "o_orderkey", "lineitem->orders"))
        .unionByName(orphans(l, "l_partkey", p, "p_partkey", "lineitem->part"))
        .unionByName(orphans(e, "user_id", c, "c_custkey", "events->customer"))
    }),

    // E34: KMV set-overlap profile — estimate two key columns' distinct
    // counts, union, intersection and Jaccard from bottom-k hash
    // synopses BEFORE paying the join's shuffle; deterministic integer
    // math over portable hashes, so even the estimates oracle-check
    // bit-for-bit (sides under k distinct are exact — both regimes run
    // across the sf ladder)
    "key_overlap" -> ((s, dir) =>
      graft.operators.KeyOverlap.profile(
        Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey", KeyOverlapK)),

    // E35: bloom-pruned semi-join — lineitems of urgent orders, with the
    // probe side filtered by the build keys' bloom BEFORE its exchange;
    // the closing exact join makes the bloom invisible to the result, so
    // the whole composition oracle-checks against the plain IN-subquery
    "bloom_semijoin" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      graft.operators.BloomPrune
        .semiJoin(Tables.lineitem(s, dir), "l_orderkey", urgent, "o_orderkey",
          expectedItems = 1L << 20, fpp = 0.02)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // E35a: bloom-screened anti-join — rows failing the bloom are
    // guaranteed non-matches and bypass the join entirely (map-only);
    // only bloom-passing candidates pay the exchange + exact anti-join
    "bloom_antijoin" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      graft.operators.BloomPrune
        .antiJoin(Tables.lineitem(s, dir), "l_orderkey", urgent, "o_orderkey",
          expectedItems = 1L << 20, fpp = 0.02)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // E36: one-pass table profile — every column's nulls / KMV distinct
    // estimate / min / max from a single scan and one bounded-state
    // aggregation; float/timestamp columns pre-cast to decimal/date so
    // the string renderings (and thus the estimates' hash inputs) are
    // engine-portable and the whole profile oracle-checks bit-for-bit
    "table_profile" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice_dec"),
        col("o_orderdate").cast("date").as("o_orderdate_day"))
      graft.operators.TableProfile.profile(o, o.columns.toSeq, KeyOverlapK)
    }),

    // E37: row-group pruning audit — land orders range-sorted (each
    // file a contiguous o_orderkey run), then measure from FOOTERS ONLY
    // what a stats-aware scan of `o_orderkey BETWEEN 1000 AND 2499`
    // would skip; proves (or disproves) a layout's worth before anyone
    // re-clusters a 100 TB table
    "prune_audit" -> ((s, dir) => {
      val out = s"${RunPaths.pruneBase(dir)}/orders"
      Tables.orders(s, dir)
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(out)
      graft.sources.PruneAudit.audit(s, out, "o_orderkey", 1000L, 2499L)
    }),

    // E37d: the audit over a DATE key — the layout real lakes carry
    // (the DMS catalog lands by date, s3_operator.rs:133-210): land
    // orders date-clustered, then measure what a one-year scan skips.
    // DATE stats are INT32 days in the footer — exact in both engines,
    // so the summary oracle-checks bit-for-bit like the long audit
    "prune_audit_date" -> ((s, dir) => {
      val out = s"${RunPaths.pruneBase(dir)}/orders_bydate"
      Tables.orders(s, dir)
        .withColumn("o_date", col("o_orderdate").cast("date"))
        .repartitionByRange(8, col("o_date"))
        .sortWithinPartitions("o_date")
        .write.mode("overwrite").parquet(out)
      graft.sources.PruneAudit.auditDate(s, out, "o_date",
        java.time.LocalDate.of(1997, 1, 1), java.time.LocalDate.of(1997, 12, 31))
    }),

    // E18z × E37: the layout loop closed — land lineitem Z-ORDERED on
    // (l_orderkey, l_partkey), then audit BOTH dimensions with a
    // 1/8th-of-domain range each. A single-column sort would prune one
    // dimension and nothing on the other; the z-curve's tiles prune on
    // both, and the two summary rows prove it from footers alone. The
    // ranges derive from each key's min/max (integer arithmetic, so
    // the oracle computes the identical bounds from the same table)
    "prune_audit_zorder" -> ((s, dir) => {
      val out = s"${RunPaths.pruneBase(dir)}/lineitem_z"
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      graft.sources.Compaction.zorderBy(
        li, out, Seq("l_orderkey", "l_partkey"), numFiles = 16)
      val dom = li.agg(
        min(col("l_orderkey")).as("omn"), max(col("l_orderkey")).as("omx"),
        min(col("l_partkey")).as("pmn"), max(col("l_partkey")).as("pmx")).head()
      def range(mn: Long, mx: Long): (Long, Long) = (mn, mn + (mx - mn) / 8)
      val (oLo, oHi) = range(dom.getLong(0), dom.getLong(1))
      val (pLo, pHi) = range(dom.getLong(2), dom.getLong(3))
      graft.sources.PruneAudit.audit(s, out, "l_orderkey", oLo, oHi)
        .withColumn("dim", lit("l_orderkey"))
        .unionByName(
          graft.sources.PruneAudit.audit(s, out, "l_partkey", pLo, pHi)
            .withColumn("dim", lit("l_partkey")))
    }),

    // E36h: equi-width histogram — fixed-op-order IEEE double bucketing
    // so another engine buckets bit-identically; clamped edges, one
    // map-side-combinable pass
    "table_histogram" -> ((s, dir) =>
      graft.operators.TableProfile.histogram(
        Tables.orders(s, dir), "o_totalprice", 24, 0.0, 600000.0))
  )

  val KeyOverlapK = 256 // bottom-k synopsis size (E34)

  private val normToksSql =
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"

  def oracleSql: Map[String, String] = Map(
    "asof_join" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view'),
        |v2 AS (SELECT user_id, ts, event_id AS view_event_id, value AS view_value
        |       FROM v WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.value AS purchase_value,
        |       v2.view_event_id AS asof_view_event_id,
        |       v2.view_value AS asof_view_value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN v2 ON p.user_id = v2.user_id AND p.ts >= v2.ts""".stripMargin,

    // DuckDB's ASOF comparison flipped to <= IS the forward join
    "asof_join_forward" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view'),
        |v2 AS (SELECT user_id, ts, event_id AS view_event_id, value AS view_value
        |       FROM v WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.value AS purchase_value,
        |       v2.view_event_id AS asof_view_event_id,
        |       v2.view_value AS asof_view_value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN v2 ON p.user_id = v2.user_id AND p.ts <= v2.ts""".stripMargin,

    // the backward ASOF with stale matches nulled at the exact
    // integer-microsecond boundary (epoch_us mirrors unix_micros)
    "asof_join_tolerance" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'view'),
        |v2 AS (SELECT user_id, ts, event_id AS view_event_id, value AS view_value
        |       FROM v WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.value AS purchase_value,
        |       CASE WHEN v2.ts IS NOT NULL AND epoch_us(p.ts) - epoch_us(v2.ts) <= 3600000000
        |            THEN v2.view_event_id END AS asof_view_event_id,
        |       CASE WHEN v2.ts IS NOT NULL AND epoch_us(p.ts) - epoch_us(v2.ts) <= 3600000000
        |            THEN v2.view_value END AS asof_view_value
        |FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN v2 ON p.user_id = v2.user_id AND p.ts >= v2.ts""".stripMargin,

    // the bucketed equi join must equal the plain (IEJoin-planned)
    // range predicate; epoch_us mirrors unix_micros exactly
    "range_join" ->
      """WITH iv AS (
        |  SELECT event_id AS interval_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e_us
        |  FROM events WHERE event_type = 'signup'),
        |pt AS (SELECT event_id AS point_id, epoch_us(ts) AS p_us FROM events)
        |SELECT interval_id, count(*) AS n_points,
        |       min(point_id) AS first_point, max(point_id) AS last_point
        |FROM iv JOIN pt ON pt.p_us >= iv.s_us AND pt.p_us < iv.e_us
        |GROUP BY interval_id""".stripMargin,

    "range_join_overlap" ->
      """WITH su AS (
        |  SELECT event_id AS signup_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e_us
        |  FROM events WHERE event_type = 'signup'),
        |pu AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + (event_id % 5 + 1) * 60000000 AS e_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT signup_id, count(*) AS n_overlaps,
        |       min(purchase_id) AS first_purchase,
        |       max(purchase_id) AS last_purchase
        |FROM su JOIN pu ON su.s_us < pu.e_us AND pu.s_us < su.e_us
        |GROUP BY signup_id""".stripMargin,

    // deletion-variant blocking (variants(x) = {x} ∪ single-deletions):
    // ed(a,b) <= 1 guarantees a shared variant (sub at i → del_i equal;
    // ins/del → the shorter IS a deletion of the longer; equality is the
    // identity variant), so the block is COMPLETE for the predicate and
    // the levenshtein verify keeps it exact — same structure the engine
    // uses, but the oracle still scores every candidate with the real
    // metric. The naive n² cross join measured 135 s at sf0.1 (hours at
    // sf1); this is 5 s with row-identical output.
    "fuzzy_join" ->
      """WITH v AS (
        |  SELECT c_custkey, c_name,
        |    unnest(list_append(list_transform(range(1, len(c_name) + 1),
        |      i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)), c_name)) AS var
        |  FROM customer),
        |cand AS (
        |  SELECT DISTINCT a.c_custkey AS ak, b.c_custkey AS bk
        |  FROM v a JOIN v b ON a.var = b.var AND a.c_custkey < b.c_custkey)
        |SELECT a.c_custkey AS a_id, a.c_name AS a_name,
        |       b.c_custkey AS b_id, b.c_name AS b_name,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
        |FROM cand JOIN customer a ON a.c_custkey = cand.ak
        |          JOIN customer b ON b.c_custkey = cand.bk
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    "range_coalesce" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e
        |  FROM events),
        |w AS (SELECT user_id, s, e,
        |        max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM iv),
        |r AS (SELECT user_id, s, e,
        |        sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY user_id ORDER BY s, e
        |            ROWS UNBOUNDED PRECEDING) AS run
        |      FROM w)
        |SELECT user_id, min(s) AS start_us, max(e) AS end_us,
        |       count(*) AS n_merged
        |FROM r GROUP BY user_id, run""".stripMargin,

    // the same union-onto-one-axis + carry formulation: ticks and samples
    // share the time axis, IGNORE NULLS window scans carry the straddling
    // sample in each direction; sample-before-tick ordering at an equal
    // instant matches Spark's (__side asc), and tie-null ordering never
    // decides (ticks and samples always differ in side)
    "events_resample" ->
      """WITH s AS (
        |  SELECT user_id AS k, epoch_us(ts) AS t, event_id AS tie, value AS v
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT k, (min(t) + 86399999999) // 86400000000 AS lo,
        |         max(t) // 86400000000 AS hi
        |  FROM s GROUP BY k),
        |ticks AS (
        |  SELECT k, unnest(generate_series(lo, hi)) * 86400000000 AS t
        |  FROM b WHERE lo <= hi),
        |u AS (
        |  SELECT k, t, CAST(NULL AS BIGINT) AS tie, CAST(NULL AS DOUBLE) AS v, 1 AS side
        |  FROM ticks
        |  UNION ALL SELECT k, t, tie, v, 0 AS side FROM s),
        |w AS (
        |  SELECT k, t, side,
        |    last_value(v IGNORE NULLS) OVER fw AS pv,
        |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER fw AS pt,
        |    last_value(v IGNORE NULLS) OVER bw AS nv,
        |    last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS) OVER bw AS nt
        |  FROM u
        |  WINDOW
        |    fw AS (PARTITION BY k ORDER BY t ASC, side ASC, tie ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    bw AS (PARTITION BY k ORDER BY t DESC, side ASC, tie DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT k AS user_id, t AS tick_us, pv AS v_locf,
        |  CAST(floor((CASE WHEN nt = pt THEN pv
        |    ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
        |    END) * 10000.0) AS BIGINT) AS v_interp_bp
        |FROM w WHERE side = 1""".stripMargin,

    // identical statistic in HUGEINT; argmax mirrored as row_number over
    // (score DESC, hour ASC); score surfaced as the double image of the
    // same exact integer on both engines
    "events_changepoint" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, h, c,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS k,
        |         sum(c) OVER (PARTITION BY event_type ORDER BY h) AS sk,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         sum(c) OVER (PARTITION BY event_type) AS s
        |  FROM b),
        |t AS (
        |  SELECT event_type, h, k, sk, n, s,
        |         (CAST(k*s - n*sk AS HUGEINT) * CAST(k*s - n*sk AS HUGEINT) * 1000000)
        |           // (CAST(k AS HUGEINT) * CAST(n - k AS HUGEINT)) AS t
        |  FROM w WHERE k < n),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY t DESC, h ASC) AS rn
        |  FROM t)
        |SELECT event_type, h AS split_bucket, CAST(t AS DOUBLE) AS score,
        |  CAST(sk * 1000 // k AS BIGINT) AS mean_before_milli,
        |  CAST((s - sk) * 1000 // (n - k) AS BIGINT) AS mean_after_milli,
        |  n AS n_buckets
        |FROM r WHERE rn = 1""".stripMargin,

    // pair = ordered self-join per user over the deduped (id, item)
    // set; all divisions non-negative so // mirrors div exactly; lift's
    // int64-overflowing product rides HUGEINT
    "events_cooccur" ->
      """WITH it AS (SELECT DISTINCT user_id AS id, event_type AS item FROM events),
        |n AS (SELECT count(DISTINCT id) AS N FROM it),
        |c AS (SELECT item, count(*) AS cnt FROM it GROUP BY 1),
        |p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_n
        |      FROM it a JOIN it b ON a.id = b.id AND a.item < b.item GROUP BY 1, 2)
        |SELECT item_a, item_b, pair_n, ca.cnt AS n_a, cb.cnt AS n_b,
        |  pair_n * 10000 // N AS support_bp,
        |  pair_n * 10000 // ca.cnt AS conf_ab_bp,
        |  pair_n * 10000 // cb.cnt AS conf_ba_bp,
        |  CAST(CAST(pair_n AS HUGEINT) * N * 10000
        |       // (CAST(ca.cnt AS HUGEINT) * cb.cnt) AS BIGINT) AS lift_bp
        |FROM p
        |JOIN c ca ON ca.item = item_a
        |JOIN c cb ON cb.item = item_b
        |CROSS JOIN n""".stripMargin,

    // the same power sums in HUGEINT (128-bit, exact), the same
    // sign-split floor-free integer division, the same end-stage double
    // expression for r² — identical IEEE tree on identical integers
    "events_trend" ->
      """WITH s AS (
        |  SELECT event_type,
        |         CAST(epoch_us(ts) // 1000000 - 1500000000 AS HUGEINT) AS x,
        |         CAST(floor(value * 1000) AS HUGEINT) AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
        |  FROM s GROUP BY 1),
        |d AS (
        |  SELECT event_type, n,
        |         n*sxy - sx*sy AS num, n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
        |  FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN dx > 0 THEN
        |    (CASE WHEN num < 0 THEN -1 ELSE 1 END) * ((86400 * abs(num)) // dx)
        |  END AS BIGINT) AS slope_milli_per_day,
        |  CAST(CASE WHEN dx > 0 AND dy > 0 THEN
        |    floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) * 10000.0
        |          / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)))
        |  END AS BIGINT) AS r2_bp
        |FROM d""".stripMargin,

    // identical rank rule (count desc, token asc), identical per-term
    // integer-nats collapse, identical HUGEINT power sums and sign-split
    // division; r2 from the same end-stage double tree
    "text_zipf" ->
      s"""WITH c AS (
         |  SELECT source, tok, count(*) AS c FROM (
         |    SELECT source, unnest($normToksSql) AS tok FROM documents)
         |  WHERE tok <> '' GROUP BY 1, 2),
         |r AS (
         |  SELECT source, c,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY c DESC, tok ASC) AS r
         |  FROM c),
         |p AS (
         |  SELECT source,
         |         CAST(floor(ln(CAST(r AS DOUBLE)) * 10000.0) AS HUGEINT) AS x,
         |         CAST(floor(ln(CAST(c AS DOUBLE)) * 10000.0) AS HUGEINT) AS y
         |  FROM r WHERE r <= 256),
         |a AS (
         |  SELECT source, CAST(count(*) AS HUGEINT) AS n,
         |         sum(x) AS sx, sum(y) AS sy,
         |         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
         |  FROM p GROUP BY 1),
         |d AS (
         |  SELECT source, n,
         |         n*sxy - sx*sy AS num, n*sxx - sx*sx AS dx, n*syy - sy*sy AS dy
         |  FROM a)
         |SELECT source, CAST(n AS BIGINT) AS n_terms,
         |  CAST(CASE WHEN dx > 0 THEN
         |    (CASE WHEN num > 0 THEN -1 ELSE 1 END) * ((10000 * abs(num)) // dx)
         |  END AS BIGINT) AS zipf_e4,
         |  CAST(CASE WHEN dx > 0 AND dy > 0 THEN
         |    floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) * 10000.0
         |          / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)))
         |  END AS BIGINT) AS r2_bp
         |FROM d""".stripMargin,

    "text_vocab" ->
      s"""SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM (SELECT doc_id, unnest($normToksSql) AS tok FROM documents)
         |GROUP BY tok HAVING count(*) >= 5""".stripMargin,

    "q_quantiles" ->
      """SELECT event_type,
        |  CAST(floor(quantile_cont(value, 0.25) * 10000.0) AS BIGINT) AS p25_bp,
        |  CAST(floor(quantile_cont(value, 0.5) * 10000.0) AS BIGINT) AS p50_bp,
        |  CAST(floor(quantile_cont(value, 0.75) * 10000.0) AS BIGINT) AS p75_bp,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    // same lag-over-user formulation; quantile_cont is DuckDB's twin of
    // Spark's exact linear-interpolating percentile (the D10 precedent)
    "events_dwell" ->
      """WITH g AS (
        |  SELECT event_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT event_type,
        |  CAST(floor(quantile_cont(gap, 0.5)) AS BIGINT) AS p50_us,
        |  CAST(floor(quantile_cont(gap, 0.9)) AS BIGINT) AS p90_us,
        |  CAST(floor(quantile_cont(gap, 0.99)) AS BIGINT) AS p99_us,
        |  count(*) AS n
        |FROM g WHERE gap IS NOT NULL GROUP BY event_type""".stripMargin,

    "q_quantiles_sampled" ->
      s"""WITH h AS (SELECT event_type, event_id, value,
         |  ${graft.text.PortableHash.duckH32("CAST(event_id AS VARCHAR)")} AS hh FROM events),
         |r AS (SELECT event_type, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY hh ASC, event_id ASC) AS rk
         |  FROM h)
         |SELECT event_type,
         |  CAST(floor(quantile_cont(value, 0.25) * 10000.0) AS BIGINT) AS p25_bp,
         |  CAST(floor(quantile_cont(value, 0.5) * 10000.0) AS BIGINT) AS p50_bp,
         |  CAST(floor(quantile_cont(value, 0.75) * 10000.0) AS BIGINT) AS p75_bp,
         |  count(*) AS sample_n
         |FROM r WHERE rk <= 256 GROUP BY event_type""".stripMargin,

    "key_overlap" -> {
      val k = KeyOverlapK
      def est(n: String, tau: String): String =
        s"CASE WHEN $n < $k OR $tau <= 0 THEN $n ELSE ${k - 1} * 4294967296 // $tau END"
      s"""WITH ah AS (SELECT DISTINCT ${graft.text.PortableHash.duckH32("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
         |ak AS (SELECT h FROM ah WHERE h IS NOT NULL ORDER BY h LIMIT $k),
         |bh AS (SELECT DISTINCT ${graft.text.PortableHash.duckH32("CAST(c_custkey AS VARCHAR)")} AS h FROM customer),
         |bk AS (SELECT h FROM bh WHERE h IS NOT NULL ORDER BY h LIMIT $k),
         |sa AS (SELECT count(*) AS n_a, coalesce(max(h), 0) AS tau_a FROM ak),
         |sb AS (SELECT count(*) AS n_b, coalesce(max(h), 0) AS tau_b FROM bk),
         |m AS (SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
         |  SELECT h, 1 AS in_a, 0 AS in_b FROM ak
         |  UNION ALL SELECT h, 0, 1 FROM bk) GROUP BY h),
         |u AS (SELECT * FROM m ORDER BY h LIMIT $k),
         |su AS (SELECT count(*) AS n_u, coalesce(max(h), 0) AS tau_u,
         |  CAST(coalesce(sum(in_a * in_b), 0) AS BIGINT) AS k_common FROM u)
         |SELECT
         |  CAST(${est("n_a", "tau_a")} AS BIGINT) AS est_a,
         |  CAST(${est("n_b", "tau_b")} AS BIGINT) AS est_b,
         |  CAST(${est("n_u", "tau_u")} AS BIGINT) AS est_union,
         |  CAST(CASE WHEN n_u = 0 THEN 0
         |    ELSE k_common * (${est("n_u", "tau_u")}) // n_u END AS BIGINT) AS est_intersect,
         |  CAST(CASE WHEN n_u = 0 THEN 0
         |    ELSE k_common * 10000 // n_u END AS BIGINT) AS jaccard_bp
         |FROM sa, sb, su""".stripMargin
    },

    "ref_integrity" ->
      """SELECT 'orders->customer' AS relation, count(*) AS orphans
        |FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'lineitem->orders', count(*) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'lineitem->part', count(*) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |UNION ALL
        |SELECT 'events->customer', count(*) FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)""".stripMargin,

    "table_profile" -> {
      val k = KeyOverlapK
      def colRow(c: String, renderedSql: String): String = {
        val kmv =
          s"""(SELECT CASE WHEN count(*) < $k OR coalesce(max(h), 0) <= 0 THEN count(*)
             |        ELSE ${k - 1} * 4294967296 // max(h) END
             |  FROM (SELECT DISTINCT ${graft.text.PortableHash.duckH32(renderedSql)} AS h
             |        FROM base WHERE $c IS NOT NULL ORDER BY h LIMIT $k))""".stripMargin
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  CAST($kmv AS BIGINT) AS n_distinct_est,
           |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
           |FROM base""".stripMargin
      }
      val cols = Seq(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice_dec", "o_orderdate_day")
      s"""WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         |  CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice_dec,
         |  CAST(o_orderdate AS DATE) AS o_orderdate_day FROM orders)
         |${cols.map(c => colRow(c, s"CAST($c AS VARCHAR)")).mkString("\nUNION ALL\n")}""".stripMargin
    },

    // the bloom is a pre-shuffle superset screen closed by an exact
    // join, so the oracle is the plain IN-subquery semi-join
    "bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,

    "bloom_antijoin" ->
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem l
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderpriority = '1-URGENT'
        |     AND o.o_orderkey = l.l_orderkey)
        |GROUP BY l_returnflag""".stripMargin,

    // the audit reads footer stats; DuckDB's parquet_metadata() sees the
    // SAME footers of the query-landed files, so the whole summary —
    // byte counts included — compares exactly
    "prune_audit" ->
      s"""WITH rg AS (
        |  SELECT file_name, row_group_id,
        |    max(row_group_num_rows) AS rows,
        |    sum(total_compressed_size) AS bytes,
        |    max(CASE WHEN path_in_schema = 'o_orderkey'
        |             THEN CAST(stats_min_value AS BIGINT) END) AS mn,
        |    max(CASE WHEN path_in_schema = 'o_orderkey'
        |             THEN CAST(stats_max_value AS BIGINT) END) AS mx
        |  FROM parquet_metadata('/tmp/graft_prune_audit/${RunPaths.currentTag}/orders/*.parquet')
        |  GROUP BY 1, 2),
        |p AS (SELECT rows, bytes,
        |    CASE WHEN mn IS NOT NULL AND (mx < 1000 OR mn > 2499)
        |         THEN 1 ELSE 0 END AS pruned FROM rg)
        |SELECT count(*) AS row_groups,
        |  CAST(sum(pruned) AS BIGINT) AS rg_pruned,
        |  CAST(sum(rows) AS BIGINT) AS rows_total,
        |  CAST(sum(rows * pruned) AS BIGINT) AS rows_pruned,
        |  CAST(sum(bytes) AS BIGINT) AS bytes_total,
        |  CAST(sum(bytes * pruned) AS BIGINT) AS bytes_pruned
        |FROM p""".stripMargin,

    // date stats render as ISO strings in parquet_metadata — cast back
    // to DATE and the comparison is the same INT32 days-order the
    // Spark leg applies
    "prune_audit_date" ->
      s"""WITH rg AS (
        |  SELECT file_name, row_group_id,
        |    max(row_group_num_rows) AS rows,
        |    sum(total_compressed_size) AS bytes,
        |    max(CASE WHEN path_in_schema = 'o_date'
        |             THEN CAST(stats_min_value AS DATE) END) AS mn,
        |    max(CASE WHEN path_in_schema = 'o_date'
        |             THEN CAST(stats_max_value AS DATE) END) AS mx
        |  FROM parquet_metadata('/tmp/graft_prune_audit/${RunPaths.currentTag}/orders_bydate/*.parquet')
        |  GROUP BY 1, 2),
        |p AS (SELECT rows, bytes,
        |    CASE WHEN mn IS NOT NULL
        |           AND (mx < DATE '1997-01-01' OR mn > DATE '1997-12-31')
        |         THEN 1 ELSE 0 END AS pruned FROM rg)
        |SELECT count(*) AS row_groups,
        |  CAST(sum(pruned) AS BIGINT) AS rg_pruned,
        |  CAST(sum(rows) AS BIGINT) AS rows_total,
        |  CAST(sum(rows * pruned) AS BIGINT) AS rows_pruned,
        |  CAST(sum(bytes) AS BIGINT) AS bytes_total,
        |  CAST(sum(bytes * pruned) AS BIGINT) AS bytes_pruned
        |FROM p""".stripMargin,

    // both audit ranges derive from the key domains with integer
    // arithmetic ('//' here, Long division in the query) so the two
    // engines compute identical bounds from the same table
    "prune_audit_zorder" ->
      s"""WITH dom AS (
        |  SELECT min(l_orderkey) AS d_omn, max(l_orderkey) AS d_omx,
        |         min(l_partkey) AS d_pmn, max(l_partkey) AS d_pmx
        |  FROM lineitem),
        |b AS (
        |  SELECT d_omn AS o_lo, d_omn + (d_omx - d_omn) // 8 AS o_hi,
        |         d_pmn AS p_lo, d_pmn + (d_pmx - d_pmn) // 8 AS p_hi
        |  FROM dom),
        |rg AS (
        |  SELECT file_name, row_group_id,
        |    max(row_group_num_rows) AS rows,
        |    sum(total_compressed_size) AS bytes,
        |    max(CASE WHEN path_in_schema = 'l_orderkey'
        |             THEN CAST(stats_min_value AS BIGINT) END) AS omn,
        |    max(CASE WHEN path_in_schema = 'l_orderkey'
        |             THEN CAST(stats_max_value AS BIGINT) END) AS omx,
        |    max(CASE WHEN path_in_schema = 'l_partkey'
        |             THEN CAST(stats_min_value AS BIGINT) END) AS pmn,
        |    max(CASE WHEN path_in_schema = 'l_partkey'
        |             THEN CAST(stats_max_value AS BIGINT) END) AS pmx
        |  FROM parquet_metadata('/tmp/graft_prune_audit/${RunPaths.currentTag}/lineitem_z/*.parquet')
        |  GROUP BY 1, 2),
        |po AS (SELECT rows, bytes,
        |    CASE WHEN omn IS NOT NULL AND (omx < b.o_lo OR omn > b.o_hi)
        |         THEN 1 ELSE 0 END AS pruned FROM rg, b),
        |pp AS (SELECT rows, bytes,
        |    CASE WHEN pmn IS NOT NULL AND (pmx < b.p_lo OR pmn > b.p_hi)
        |         THEN 1 ELSE 0 END AS pruned FROM rg, b)
        |SELECT 'l_orderkey' AS dim, count(*) AS row_groups,
        |  CAST(sum(pruned) AS BIGINT) AS rg_pruned,
        |  CAST(sum(rows) AS BIGINT) AS rows_total,
        |  CAST(sum(rows * pruned) AS BIGINT) AS rows_pruned,
        |  CAST(sum(bytes) AS BIGINT) AS bytes_total,
        |  CAST(sum(bytes * pruned) AS BIGINT) AS bytes_pruned
        |FROM po
        |UNION ALL
        |SELECT 'l_partkey' AS dim, count(*) AS row_groups,
        |  CAST(sum(pruned) AS BIGINT) AS rg_pruned,
        |  CAST(sum(rows) AS BIGINT) AS rows_total,
        |  CAST(sum(rows * pruned) AS BIGINT) AS rows_pruned,
        |  CAST(sum(bytes) AS BIGINT) AS bytes_total,
        |  CAST(sum(bytes * pruned) AS BIGINT) AS bytes_pruned
        |FROM pp""".stripMargin,

    // same fixed-order double arithmetic → identical bucketing
    "table_histogram" ->
      """SELECT LEAST(23, GREATEST(0,
        |    CAST(FLOOR((o_totalprice - 0.0) * 24.0 / 600000.0) AS BIGINT))) AS bucket,
        |  count(*) AS n
        |FROM orders WHERE o_totalprice IS NOT NULL
        |GROUP BY 1""".stripMargin
  )
}
