package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream —
  * the two classic event-sequence reports a validation/analytics
  * warehouse runs next to sessionization (D4) and rollups (D5).
  *
  * Funnel: for an ordered list of step event-types, a user reaches step
  * i+1 when an event of that type lands STRICTLY AFTER their step-i
  * time and within `windowUs`. Each user's step times resolve through
  * the earliest-qualifying-event rule (min qualifying timestamp), which
  * makes the result order-free and deterministic.
  *
  * Shape at scale: the step cascade is N unordered window minima over
  * ONE user-partitioned exchange — no per-user sort (the windows are
  * frame-less), no join per step, no event collected to the driver; the
  * per-user resolution then collapses in the same partitioning (the
  * groupBy reuses the window's hash partitioning) and only the
  * funnel-width summary row leaves the executors.
  *
  * Retention: cohort(user) = the user's first-activity week; the report
  * counts distinct active users per (cohort week, weeks since). Weeks
  * are pure integer arithmetic on epoch-microseconds (`us div 7 days`),
  * not calendar truncation — engine-identical by construction, no
  * locale/week-start semantics. Cost: one per-user min (map-side
  * combined), one user-keyed join that reuses the aggregation's
  * partitioning, one (cohort, week) count-distinct.
  *
  * Reference scope note: the reference has no event-analytics surface;
  * this extends the D family (SURVEY §2) the way D4/D5 do.
  */
object Funnel {

  private val WeekUs = 7L * 86400L * 1000000L

  /** Per-user resolution: one row per user with `step<i>_us` = the
    * cascade's epoch-µs time for step i (null = unreached). The
    * per-user detail the summary aggregates — and the stronger
    * correctness surface (every user's times hash-compare, not just
    * the funnel widths). */
  def funnelUsers(
      events: DataFrame, userCol: String, tsCol: Column, typeCol: String,
      steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2, s"funnel: need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    val byUser = Window.partitionBy(userCol)
    val us = events.withColumn("__us", unix_micros(tsCol))
    // t_0 = min ts of step 0; t_i = min ts of step i in (t_{i-1}, t_{i-1}+window]
    val cascaded = steps.zipWithIndex.foldLeft(us) { case (df, (step, i)) =>
      val qualifies =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step &&
          col(s"__t${i - 1}").isNotNull &&
          col("__us") > col(s"__t${i - 1}") &&
          col("__us") <= col(s"__t${i - 1}") + windowUs
      df.withColumn(s"__t$i", min(when(qualifies, col("__us"))).over(byUser))
    }
    val stepAggs = steps.indices.map(i => max(col(s"__t$i")).as(s"step${i + 1}_us"))
    cascaded
      .groupBy(col(userCol))
      .agg(stepAggs.head, stepAggs.tail: _*)
  }

  /** One summary row: users reaching each step + step-over-step
    * conversion in basis points. `steps` must be distinct types. */
  def funnel(
      events: DataFrame, userCol: String, tsCol: Column, typeCol: String,
      steps: Seq[String], windowUs: Long): DataFrame = {
    val perUser = funnelUsers(events, userCol, tsCol, typeCol, steps, windowUs)
    // count(col), not sum(when): on an EMPTY events input sum yields
    // NULL while the SQL twin's counts yield 0 — count keeps parity
    val reached = steps.indices.map(i =>
      count(col(s"step${i + 1}_us")).as(s"users_step${i + 1}"))
    val summary = perUser.agg(reached.head, reached.tail: _*)
    // an empty previous step reports conversion 0 rather than dividing
    // by zero (ANSI mode throws; the oracle mirrors with CASE)
    val convs = (1 until steps.size).map(i =>
      when(col(s"users_step$i") > 0,
        graft.text.TextOps.bp(col(s"users_step${i + 1}"), col(s"users_step$i")))
        .otherwise(0L).as(s"conv${i + 1}_bp"))
    summary.select(
      steps.indices.map(i => col(s"users_step${i + 1}")) ++ convs: _*)
  }

  /** (cohort_week, week_k, active_users, cohort_size, retention_bp):
    * distinct active users per cohort and integer week offset, with the
    * retention rate against the cohort's size (= its week-0 actives,
    * which by construction is every member). Weeks are epoch-µs
    * integer division. */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: Column): DataFrame = {
    // `div` (integral) rather than `/`: double division truncated can
    // misround within half an ulp of a week boundary; div cannot
    val weeks = events
      .select(col(userCol).as("__u"), unix_micros(tsCol).as("__us"))
      .select(col("__u"), expr(s"__us div ${WeekUs}L").as("__wk"))
    val cohort = weeks.groupBy("__u").agg(min(col("__wk")).as("__cohort"))
    val active = weeks.join(cohort, "__u")
      .groupBy(col("__cohort").as("cohort_week"),
        (col("__wk") - col("__cohort")).as("week_k"))
      .agg(countDistinct(col("__u")).as("active_users"))
    val sizes = cohort.groupBy(col("__cohort").as("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    active.join(sizes, "cohort_week")
      .withColumn("retention_bp",
        graft.text.TextOps.bp(col("active_users"), col("cohort_size")))
  }
}
