package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D20: CHANGEPOINT detection over per-group hourly volume — WHERE the
  * level shifted, the locating companion to D15's "which hours are
  * anomalous" z-test (the reference validates row parity; D15 says a
  * feed broke, this says WHEN). Binary-segmentation statistic, single
  * strongest split per group: maximize over split points k the scaled
  * between-segment contrast
  *
  *    T_k = ⌊(k·S − N·S_k)² · 10⁶ / (k·(N−k))⌋
  *
  * (the CUSUM/F-statistic numerator with the variance term dropped —
  * monotone-equivalent for LOCATING the split) — ALL-INTEGER: A_k =
  * k·S − N·S_k stays in int64 for any realistic frame (k ≤ hours, S =
  * total events), A_k² rides DECIMAL(38,0)/HUGEINT, the ⌊·⌋ division is
  * non-negative so truncation ≡ floor across engines. Ties break to the
  * EARLIEST split hour (deterministic, both engines).
  *
  * Plan: one map-side-combined rollup to (group, hour) counts — the
  * shuffle carries the tiny observed-hours frame, never events — then
  * prefix sums via a window over that frame (the D15 shape: frame size
  * = a group's own observed hours), then ONE map-side-combinable
  * `max_by` argmax per group carrying (split hour, the prefix sums) so
  * the segment means come out of the same row, no second pass. Output
  * per group: the split hour, the score, exact milli-count means before
  * and after, and the observed-hour count.
  *
  * A group with < 2 observed hours has no interior split and is absent.
  */
object Changepoint {

  /** @param tsUs event time in integer epoch microseconds
    * @param grainUs bucket width (default 1 hour) */
  def strongestShift(
      df: DataFrame,
      groupCols: Seq[String],
      tsUs: Column,
      grainUs: Long = 3600L * 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "Changepoint: at least one group column")
    require(grainUs > 0, "Changepoint: grainUs must be positive")
    val byHour = df
      .withColumn("__tus", tsUs)
      .withColumn("__h", expr(s"__tus div ${grainUs}L"))
      .groupBy(groupCols.map(col) :+ col("__h"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    val dec = "decimal(38,0)"
    val scored = byHour
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__sk", sum(col("__c")).over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      .withColumn("__s", sum(col("__c")).over(Window.partitionBy(groupCols.map(col): _*)))
      // interior splits only: segment = hours 1..k vs k+1..N
      .filter(col("__k") < col("__n"))
      .withColumn("__a", col("__k") * col("__s") - col("__n") * col("__sk"))
      .withColumn("__t",
        expr(s"(CAST(__a AS $dec) * CAST(__a AS $dec) * 1000000)" +
          s" div (CAST(__k AS $dec) * CAST(__n - __k AS $dec))"))
    scored
      .groupBy(groupCols.map(col): _*)
      .agg(
        max_by(
          struct(col("__h"), col("__t"), col("__k"), col("__sk"),
            col("__n"), col("__s")),
          // strongest score, ties to the EARLIEST hour
          struct(col("__t"), (-col("__h")).as("__nh"))).as("__best"))
      .select(
        groupCols.map(col) ++ Seq(
          col("__best.__h").as("split_bucket"),
          // the exact decimal drives the argmax; the SURFACED score is
          // its double image (same integer → same double both engines —
          // the raw decimal can exceed int64 at corpus scale)
          col("__best.__t").cast("double").as("score"),
          expr("__best.__sk * 1000 div __best.__k").as("mean_before_milli"),
          expr("(__best.__s - __best.__sk) * 1000 div (__best.__n - __best.__k)")
            .as("mean_after_milli"),
          col("__best.__n").as("n_buckets")): _*)
  }
}
