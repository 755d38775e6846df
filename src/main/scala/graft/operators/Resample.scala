package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D17: per-key time-grid RESAMPLING with gap fill — turn an irregular
  * event stream into a regular series: one row per key per grid tick,
  * valued by last-observation-carried-forward and by linear
  * interpolation between the straddling samples. The time-series-engine
  * primitive (QuestDB `SAMPLE BY` + `FILL(PREV/LINEAR)`, Timescale
  * `time_bucket_gapfill`/`interpolate`) a plain time-bucket rollup
  * (D5) cannot express: buckets with NO sample must still emit a row,
  * valued from their neighbors.
  *
  * Grid: epoch-aligned ticks `k·grainUs` clipped to each key's OWN
  * sample span `[min ts, max ts]` — every tick therefore has a sample
  * at-or-before AND at-or-after it, so both fills are total (no
  * leading/trailing nulls, no extrapolation policy to get wrong).
  *
  * Spark-first plan, ONE logical pattern = the as-of carry
  * ([[AsofJoin]]): ticks and samples are unioned onto one time axis and
  * a per-key ordered window carries the nearest sample value/timestamp
  * to each tick — forward for LOCF (`last(..) ignoreNulls` ascending)
  * and backward for the interpolation partner (same window descending).
  * Both windows share one hash exchange by key (two sorts, zero extra
  * shuffles); the per-key grid is generated from a map-side-combined
  * min/max aggregate, and its size is LOUDLY guarded (`raise_error`, the
  * [[RangeJoin]] convention) — a key spanning years at a millisecond
  * grain is a config error, not a silent 10^10-row fan-out.
  *
  * Interpolation arithmetic: `pv + (nv − pv) · (t−pt)/(nt−pt)` with the
  * quotient computed double-from-int64 — both engines evaluate the same
  * IEEE expression tree on identical inputs, so even the interpolated
  * double is oracle-exact; a sample landing ON a tick short-circuits to
  * its own value (the 0/0 guard). Sample ties on one instant are broken
  * by the caller's `tieBreak` column — determinism is the caller's
  * contract, same as [[graft.cdc.CdcApply.scd2History]]'s ordering.
  *
  * Output: key columns + `tick_us` + `v_locf` (double, an exact copy of
  * the carried sample) + `v_interp` (double).
  */
object Resample {

  private val Internal =
    Seq("__t", "__side", "__tie", "__v", "__st", "__pv", "__pt", "__nv", "__nt")

  def gridFill(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: Column,
      valueCol: Column,
      tieBreak: Column,
      grainUs: Long,
      maxTicksPerKey: Int = 100000): DataFrame = {
    require(keyCols.nonEmpty, "Resample.gridFill: at least one key column")
    require(grainUs > 0, s"Resample.gridFill: grainUs must be positive, got $grainUs")
    require(maxTicksPerKey > 0,
      s"Resample.gridFill: maxTicksPerKey must be positive, got $maxTicksPerKey")
    Internal.foreach(r => require(!df.columns.contains(r),
      s"Resample.gridFill: input already has a '$r' column"))

    val tUs = graft.util.TimeCols.toMicros(df, tsCol)
    val samples = df.select(
      keyCols.map(col) ++ Seq(
        tUs.as("__t"), lit(0).as("__side"), tieBreak.cast("long").as("__tie"),
        valueCol.cast("double").as("__v")): _*)

    // per-key span → aligned tick indices; floor/ceil division is exact
    // on the positive epoch axis. A span shorter than one aligned grain
    // step yields an empty grid for that key (lo > hi), not a fabricated
    // tick.
    val lo = expr(s"(min(__t) + ${grainUs - 1}) div $grainUs")
    val hi = expr(s"max(__t) div $grainUs")
    val bounds = samples
      .groupBy(keyCols.map(col): _*)
      .agg(lo.as("__lo"), hi.as("__hi"))
      .filter(col("__lo") <= col("__hi"))
    val hiGuarded = when(col("__hi") - col("__lo") < lit(maxTicksPerKey.toLong), col("__hi"))
      .otherwise(raise_error(concat(
        lit(s"Resample: key grid exceeds $maxTicksPerKey ticks at grain " +
          s"${grainUs}us (widen the grain or raise maxTicksPerKey): lo="),
        col("__lo"), lit(" hi="), col("__hi"))).cast("long"))
    val ticks = bounds
      .withColumn("__k", explode(sequence(col("__lo"), hiGuarded)))
      .withColumn("__t", col("__k") * grainUs)
      .select(keyCols.map(col) ++ Seq(
        col("__t"), lit(1).as("__side"), lit(null).cast("long").as("__tie"),
        lit(null).cast("double").as("__v")): _*)

    // one time axis: at an equal instant samples (__side=0) sort BEFORE
    // ticks in both scan directions, so a sample exactly ON a tick is
    // that tick's neighbor on both sides
    val u = samples.unionByName(ticks)
      .withColumn("__st", when(col("__side") === 0, col("__t")))
    val fwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val interp = {
      val frac = (col("__t") - col("__pt")).cast("double") /
        (col("__nt") - col("__pt")).cast("double")
      when(col("__nt") === col("__pt"), col("__pv"))
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) * frac)
    }
    u
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__pt", last(col("__st"), ignoreNulls = true).over(fwd))
      .withColumn("__nv", last(col("__v"), ignoreNulls = true).over(bwd))
      .withColumn("__nt", last(col("__st"), ignoreNulls = true).over(bwd))
      .filter(col("__side") === 1)
      .withColumn("tick_us", col("__t"))
      .withColumn("v_locf", col("__pv"))
      .withColumn("v_interp", interp)
      .select(keyCols.map(col) ++ Seq(col("tick_us"), col("v_locf"), col("v_interp")): _*)
  }
}
