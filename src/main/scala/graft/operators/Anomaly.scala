package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Volume-anomaly detection over the hourly event rollup — the
  * observability query a CDC/analytics feed runs next to its rollups
  * (the reference's validation loop checks row parity; this flags WHEN
  * a feed's volume broke).
  *
  * The z-score test is evaluated in EXACT integer arithmetic so both
  * engines agree bit-for-bit — no mean, no sqrt, no doubles:
  *
  *   |x − μ| > 3σ  ⟺  (n·x − S)² > 9·(n·Q − S²)
  *
  * with per-type hour count n, Σx = S, Σx² = Q (multiply the population
  * z² = (x−S/n)² / ((nQ−S²)/n²) through by n²). Strict inequality; a
  * zero-variance type never flags. Stats are over OBSERVED hours — an
  * absent (zero-event) hour is a liveness question, not a volume one.
  *
  * Shape: one map-side-combinable aggregate collapses the feed to the
  * (type, hour) rollup; the window runs over that tiny frame. The squared
  * terms ride DECIMAL(38,0) (the Changepoint discipline, oracle HUGEINT):
  * n·x and S pass 2⁶³ long before any realistic feed ends, and a LongType
  * square would wrap silently under non-ANSI arithmetic and flip
  * `is_anomaly`. The verdict compares the exact decimals; the SURFACED
  * dev2/bound9 are their double images (same integer → same double on
  * both engines).
  */
object Anomaly {

  def hourlyVolume(events: DataFrame, tsCol: Column, typeCol: String): DataFrame = {
    val hourly = events
      .groupBy(
        date_format(date_trunc("hour", tsCol), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
    val dec = "decimal(38,0)"
    hourly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("q", sum(expr(s"CAST(cnt AS $dec) * CAST(cnt AS $dec)")).over(w))
      .withColumn("__dev", expr(s"CAST(n AS $dec) * CAST(cnt AS $dec) - CAST(s AS $dec)"))
      .withColumn("__dev2", expr("__dev * __dev"))
      .withColumn("__bound9",
        expr(s"9 * (CAST(n AS $dec) * q - CAST(s AS $dec) * CAST(s AS $dec))"))
      .withColumn("is_anomaly", col("__dev2") > col("__bound9"))
      .select(col("event_type"), col("hour_ts"), col("cnt"),
        col("__dev2").cast("double").as("dev2"),
        col("__bound9").cast("double").as("bound9"),
        col("is_anomaly"))
  }
}
