package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, NumericType, TimestampNTZType, TimestampType}

/** Point-in-interval (range) join WITHOUT an equi key, grain-bucketed.
  *
  * Spark plans a pure non-equi join condition (`p.ts >= i.start AND p.ts <
  * i.end`) as a broadcast nested-loop or cartesian join — every (point,
  * interval) pair is tested, O(|P|·|I|) work and a broadcast that falls
  * over once neither side is tiny. The reference never needs this shape
  * (its validate joins are pk-equi, cdc_operator_payload.rs:247-293), but
  * temporal analytics — "which maintenance window was this event inside",
  * "attribute each reading to its campaign flight" — are exactly this
  * join, and at 100 TB the nested loop is a non-starter.
  *
  * Scale path (standard interval-partitioning): quantize time into
  * `grainUs` buckets. A point belongs to exactly ONE bucket; an interval
  * is replicated to every bucket it overlaps (`sequence` + `explode`).
  * The join becomes an EQUI join on the bucket id plus an exact residual
  * range filter — hash-partitioned, AQE/skew-aware, no nested loop, and
  * each matching (point, interval) pair is emitted exactly once because
  * the point's single bucket meets each interval's replica set at most
  * once. Both sides bucket with the same exact floor-division (integer
  * `pmod` subtraction — no double rounding at bucket edges, negatives
  * included), so boundary timestamps can't land in different buckets.
  *
  * Cost: interval replication = ceil(span/grain) rows — `grainUs` trades
  * interval fan-out against per-bucket point density. The sweet spot is
  * grain ≈ typical interval span: ~1-2 replicas per interval and point
  * groups of span/grain density. A pathological interval (one row
  * spanning years at second grain) would silently explode into millions
  * of replicas; `maxBucketsPerInterval` refuses that LOUDLY at execution
  * time (`raise_error` in the replica-count expression — codegen'd, zero
  * cost on the happy path).
  *
  * Intervals are half-open `[start, end)`; empty/inverted intervals match
  * nothing. Timestamp columns are normalized to integer microseconds
  * (`unix_micros`, the engine-portable boundary used by the as-of join);
  * numeric columns are taken as-is (cast to long), so the same operator
  * serves value-range joins (price bands, id ranges).
  */
object RangeJoin {

  private val Internal = Seq("__p_us", "__s_us", "__e_us", "__bkt")

  /** Exact floor division over the FULL long range: subtract the
    * nonnegative `pmod` remainder (floor semantics for negatives), then
    * divide in integer space via Catalyst's `IntegralDivide` (SQL `div`).
    * Spark's `/` is double division — exact only below 2^53, and this
    * operator advertises value-range joins on arbitrary longs (snowflake
    * ids exceed 2^53), where a misrounded quotient silently lands a
    * boundary value in the wrong bucket. */
  private def bucketOf(us: Column, grainUs: Long): Column = {
    val exact = GraftBridge.expression(us - pmod(us, lit(grainUs)))
    GraftBridge.column(
      new IntegralDivide(exact, GraftBridge.expression(lit(grainUs))))
  }

  /** Normalize a time/value column to long (timestamps of either physical
    * encoding → exact integer microseconds via TimeCols, mirroring the
    * oracle's `epoch_us`; integrals as-is). Other temporal-ish types are
    * refused loudly — `cast("long")` on a timestamp would yield epoch
    * SECONDS, a silent 10^6 unit error flowing into wrong buckets. */
  private def asLong(df: DataFrame, c: Column): Column =
    df.select(c).schema.head.dataType match {
      case dt @ (TimestampType | TimestampNTZType) => graft.util.TimeCols.micros(c, dt)
      case _: NumericType | BooleanType => c.cast("long")
      case other => throw new IllegalArgumentException(
        s"RangeJoin: range axis has unsupported type $other — pass a " +
          "timestamp or numeric column")
    }

  /** Data-derived grain recommendation — see [[suggestGrain]]. All units
    * are the normalized long space (µs for timestamps). `warning` is set
    * when the span distribution makes the suggestion risky: a worst-case
    * interval would trip the replication guard, or heavy span skew means
    * no single grain serves both tails well. */
  final case class GrainSuggestion(
      grainUs: Long,
      p50SpanUs: Long,
      p99SpanUs: Long,
      maxSpanUs: Long,
      p99Replicas: Long,
      maxReplicas: Long,
      warning: Option[String])

  /** Derive `grainUs` from the data instead of hand-tuning it: the sweet
    * spot is grain ≈ typical interval span (~1-2 replicas per interval,
    * point buckets of comparable density), so the suggestion is the MEDIAN
    * span, with the p99/max span tails reported as replica counts at that
    * grain. One aggregation over the intervals (`percentile_approx` — a
    * native codegen'd sketch agg, mergeable map-side partials, one row to
    * the driver), so pricing the knob costs a single cheap pass, not a
    * parameter sweep of join runs.
    *
    * Warnings, not silent clamps (the [[pointInInterval]] guard philosophy):
    *  - worst-case replication `ceil(max_span/grain)+1 > maxBucketsPerInterval`
    *    → the join WOULD refuse at execution time; widen the grain or split
    *    the pathological intervals first.
    *  - p99 span ≥ 100× median → span skew: one grain can't serve both
    *    tails (short intervals want fine buckets, long ones fan out);
    *    consider splitting the interval set by span regime.
    */
  def suggestGrain(
      intervals: DataFrame,
      startTs: Column,
      endTs: Column,
      maxBucketsPerInterval: Int = 4096): GrainSuggestion = {
    val iv = intervals
      .select(asLong(intervals, startTs).as("__s"), asLong(intervals, endTs).as("__e"))
      .filter(col("__s") < col("__e"))
      .select((col("__e") - col("__s")).as("__span"))
    val row = iv.agg(
      percentile_approx(col("__span"), array(lit(0.5), lit(0.99)), lit(10000)),
      max(col("__span")), count(lit(1))).head()
    require(row.getLong(2) > 0, "suggestGrain: no valid (start < end) intervals")
    val ps = row.getSeq[Long](0)
    val (p50, p99, maxSpan) = (ps(0), ps(1), row.getLong(1))
    val grain = math.max(1L, p50)
    def replicas(span: Long): Long = (span + grain - 1) / grain + 1
    val warning =
      if (replicas(maxSpan) > maxBucketsPerInterval)
        Some(s"an interval spans ${replicas(maxSpan)} buckets at grain=$grain " +
          s"(guard $maxBucketsPerInterval): the join would refuse; widen the " +
          "grain or split pathological intervals")
      else if (p99 >= 100L * grain)
        Some(s"heavy span skew (p99=$p99 vs median=$p50): no single grain " +
          "serves both tails; consider splitting the interval set by span")
      else None
    GrainSuggestion(grain, p50, p99, maxSpan, replicas(p99), replicas(maxSpan), warning)
  }

  /** All (point, interval) pairs with `start <= point < end`. Output =
    * every `points` column followed by every `intervals` column; the two
    * sides must not share names (alias before joining — refused loudly).
    *
    * @param grainUs bucket width in the same units as the normalized
    *                columns (microseconds for timestamps)
    * @param maxBucketsPerInterval execution-time guard on per-interval
    *                replication (fan-out bomb refusal, not silent truncation)
    */
  def pointInInterval(
      points: DataFrame,
      pointTs: Column,
      intervals: DataFrame,
      startTs: Column,
      endTs: Column,
      grainUs: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(grainUs > 0, s"pointInInterval: grainUs must be positive, got $grainUs")
    require(maxBucketsPerInterval > 0,
      s"pointInInterval: maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"pointInInterval: both sides carry column(s) ${shared.mkString(", ")} — alias one side")
    Internal.foreach { r =>
      require(!points.columns.contains(r) && !intervals.columns.contains(r),
        s"pointInInterval: input already has a '$r' column")
    }

    val p = points
      .withColumn("__p_us", asLong(points, pointTs))
      .withColumn("__bkt", bucketOf(col("__p_us"), grainUs))

    val iv0 = intervals
      .withColumn("__s_us", asLong(intervals, startTs))
      .withColumn("__e_us", asLong(intervals, endTs))
      .filter(col("__s_us") < col("__e_us"))
    // last bucket = the one containing end-1 (half-open end)
    val b0 = bucketOf(col("__s_us"), grainUs)
    val b1 = bucketOf(col("__e_us") - 1, grainUs)
    // the guard lives inside the sequence bound, so it cannot be pruned
    // away and costs nothing unless the branch is taken
    val b1Guarded = when(b1 - b0 < lit(maxBucketsPerInterval.toLong), b1)
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval grain buckets " +
          s"(grainUs=$grainUs; widen the grain or raise maxBucketsPerInterval): start_us="),
        col("__s_us"), lit(" end_us="), col("__e_us"))).cast("long"))
    val iv = iv0.withColumn("__bkt", explode(sequence(b0, b1Guarded)))

    p.join(iv, "__bkt")
      .filter(col("__p_us") >= col("__s_us") && col("__p_us") < col("__e_us"))
      .drop(Internal: _*)
  }

  private val OverlapInternal = Seq("__ls", "__le", "__rs", "__re", "__bkt")

  /** All (left, right) interval pairs that OVERLAP: `l.start < r.end AND
    * r.start < l.end` (both half-open `[start, end)`; touching intervals —
    * one's end equal to the other's start — do NOT overlap). The
    * interval×interval sibling of [[pointInInterval]]: session-vs-campaign
    * attribution, maintenance-window conflict detection, validity-interval
    * reconciliation between two SCD2 histories.
    *
    * Same grain-bucket scale path — both sides replicate to the buckets
    * they cover, the join is EQUI on the bucket id plus the exact overlap
    * residual — with one extra problem pointInInterval doesn't have: an
    * overlapping pair shares EVERY bucket the overlap region covers, so
    * the raw bucket join emits it once per shared bucket. Deduplicating
    * with `distinct` would pay a second full shuffle of the output; instead
    * each pair is attributed to ONE canonical bucket — the bucket holding
    * `greatest(l.start, r.start)`, the overlap region's first instant,
    * which provably lies in both replica sets (overlap ⇒ max(starts) <
    * min(ends) ⇒ bucketOf(max starts) is covered by both sides) — and the
    * join keeps a pair only where `__bkt` IS that bucket. Exactly-once
    * output, zero extra exchanges: the filter is a codegen'd integer
    * comparison riding the join's residual.
    *
    * Per-side replication is guarded by `maxBucketsPerInterval` exactly as
    * in [[pointInInterval]] (loud `raise_error`, not silent truncation);
    * [[suggestGrain]] prices the grain knob from either side's span
    * distribution. Output = every `left` column then every `right` column;
    * sides must not share names.
    */
  def intervalOverlap(
      left: DataFrame,
      leftStart: Column,
      leftEnd: Column,
      right: DataFrame,
      rightStart: Column,
      rightEnd: Column,
      grainUs: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(grainUs > 0, s"intervalOverlap: grainUs must be positive, got $grainUs")
    require(maxBucketsPerInterval > 0,
      s"intervalOverlap: maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalOverlap: both sides carry column(s) ${shared.mkString(", ")} — alias one side")
    OverlapInternal.foreach { r =>
      require(!left.columns.contains(r) && !right.columns.contains(r),
        s"intervalOverlap: input already has a '$r' column")
    }

    def replicate(df: DataFrame, startTs: Column, endTs: Column,
        sName: String, eName: String): DataFrame = {
      val withBounds = df
        .withColumn(sName, asLong(df, startTs))
        .withColumn(eName, asLong(df, endTs))
        .filter(col(sName) < col(eName))
      val b0 = bucketOf(col(sName), grainUs)
      val b1 = bucketOf(col(eName) - 1, grainUs)
      val b1Guarded = when(b1 - b0 < lit(maxBucketsPerInterval.toLong), b1)
        .otherwise(raise_error(concat(
          lit(s"RangeJoin: interval spans more than $maxBucketsPerInterval grain buckets " +
            s"(grainUs=$grainUs; widen the grain or raise maxBucketsPerInterval): start_us="),
          col(sName), lit(" end_us="), col(eName))).cast("long"))
      withBounds.withColumn("__bkt", explode(sequence(b0, b1Guarded)))
    }

    val l = replicate(left, leftStart, leftEnd, "__ls", "__le")
    val r = replicate(right, rightStart, rightEnd, "__rs", "__re")

    l.join(r, "__bkt")
      .filter(
        col("__ls") < col("__re") && col("__rs") < col("__le") &&
          col("__bkt") === bucketOf(greatest(col("__ls"), col("__rs")), grainUs))
      .drop(OverlapInternal: _*)
  }

  /** COALESCE overlapping-or-touching intervals per key into maximal
    * disjoint runs — the validity-run builder: activity spans from
    * per-event windows, maintenance-calendar flattening, SCD2 interval
    * hygiene before a temporal join. Half-open `[start, end)` union is
    * contiguous when `next.start <= running max end`, so merging touching
    * intervals ([0,10) ∪ [10,20) = [0,20)) is lossless — the run set is
    * the connected components of the touch graph and therefore UNIQUE,
    * independent of any tie order inside the window (the engine-parity
    * argument for the oracle).
    *
    * Plan: one exchange by key, per-key sort by (start, end), a running
    * `max(end)` marks run starts, a running sum numbers them, and one
    * aggregation emits (key, run start, run end, n_merged). Per-key cost
    * = that key's own interval count (the scd2History skew argument:
    * output ≈ input, no global sort). Inverted/empty intervals (start >=
    * end) carry no span and are dropped, mirroring the join operators.
    *
    * Output: key columns + `start_us`, `end_us`, `n_merged`. */
  def coalesceIntervals(
      df: DataFrame, keys: Seq[String], startTs: Column, endTs: Column): DataFrame = {
    require(keys.nonEmpty, "coalesceIntervals: at least one key column")
    import org.apache.spark.sql.expressions.Window
    Seq("__s", "__e", "__pm", "__run").foreach { r =>
      require(!df.columns.contains(r),
        s"coalesceIntervals: input already has a '$r' column")
    }
    val iv = df
      .withColumn("__s", asLong(df, startTs))
      .withColumn("__e", asLong(df, endTs))
      .filter(col("__s") < col("__e"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__s"), col("__e"))
    iv
      .withColumn("__pm",
        max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__run",
        sum(when(col("__pm").isNull || col("__s") > col("__pm"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys.map(col) :+ col("__run")): _*)
      .agg(
        min(col("__s")).as("start_us"),
        max(col("__e")).as("end_us"),
        count(lit(1)).as("n_merged"))
      .drop("__run")
  }
}
