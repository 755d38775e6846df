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
  * (type, hour) rollup; the window runs over that tiny frame. Long
  * arithmetic holds while n·x and S stay under ~3·10⁹ (squares under
  * 2⁶³) — months of hourly buckets at millions of events/hour.
  */
object Anomaly {

  def hourlyVolume(events: DataFrame, tsCol: Column, typeCol: String): DataFrame = {
    val hourly = events
      .groupBy(
        date_format(date_trunc("hour", tsCol), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
    val dev = col("n") * col("cnt") - col("s")
    hourly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("q", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("dev2", dev * dev)
      .withColumn("bound9", lit(9L) * (col("n") * col("q") - col("s") * col("s")))
      .withColumn("is_anomaly", col("dev2") > col("bound9"))
      .select("event_type", "hour_ts", "cnt", "dev2", "bound9", "is_anomaly")
  }
}
