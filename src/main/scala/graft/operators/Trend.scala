package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** D18: per-group LINEAR TREND (ordinary least squares of a value over
  * event time) with an EXACT integer slope — the "is this feed's value
  * drifting" monitor next to D15's volume anomalies (the reference
  * validates row parity; trend answers whether the *content* moved).
  *
  * One map-side-combinable aggregation per group over the five OLS power
  * sums (n, Σx, Σy, Σxy, Σx², Σy²) in DECIMAL(38,0) — no window, no
  * second pass, shuffle carries one row per group. From the exact sums:
  *
  *  - `slope_milli_per_day` = sign·(86400·|n·Σxy − Σx·Σy| div (n·Σx² −
  *    (Σx)²)) — exact integer division; sign split out because Spark's
  *    `div` truncates toward zero while DuckDB's `//` floors, and the
  *    two agree only on non-negative numerators (the same portability
  *    trick as the wavg rollup). x = event time in whole SECONDS
  *    recentered by a caller offset, y = value in floored MILLI-units:
  *    with |x| ≤ ~10⁹ and |y| ≤ ~10⁹ the worst term n·Σxy stays under
  *    10³⁸ up to ~10⁹ rows per group — the envelope is documented, not
  *    silently exceeded (decimal overflow → null, never a wrong number).
  *  - `r2_bp` = ⌊num²·10⁴ / (dx·dy)⌋ computed in doubles FROM the exact
  *    integer sums at the very end — num² overflows any fixed decimal,
  *    but the final expression tree is identical IEEE arithmetic on
  *    identical integers in both engines (the events_resample
  *    precedent), so even this column is oracle-exact. Null when a
  *    group is degenerate (constant x or constant y).
  *
  * y-scaling by `floor(y·1000)` is deterministic IEEE multiply-then-
  * floor — identical in Spark and DuckDB on the same parquet doubles.
  */
object Trend {

  /** @param xUs      event time in integer epoch microseconds
    * @param y        value column (double)
    * @param xOffsetS constant subtracted from x AFTER µs→s conversion —
    *                 recentering keeps Σx² in the exact envelope; pick
    *                 any constant near the data's epoch (both engines
    *                 must use the same one) */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      xUs: Column,
      y: Column,
      xOffsetS: Long): DataFrame =
    finish(powerSums(df, groupCols, xUs, y, xOffsetS), groupCols)

  /** The five OLS power sums per group — a plain (thus also STREAMING-
    * legal) grouped aggregation; [[graft.streaming.TrendStream]] runs
    * this same expression tree incrementally, so the split is the
    * batch/stream sharing seam, not an implementation detail. */
  private[graft] def powerSums(
      df: DataFrame,
      groupCols: Seq[String],
      xUs: Column,
      y: Column,
      xOffsetS: Long): DataFrame = {
    require(groupCols.nonEmpty, "Trend.perGroup: at least one group column")
    val dec = DecimalType(38, 0)
    df.withColumn("__xus", xUs)
      .withColumn("__x", (expr("__xus div 1000000") - lit(xOffsetS)).cast(dec))
      .withColumn("__y", floor(y * lit(1000)).cast(dec))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
  }

  /** Slope + r² from the exact power sums (shared batch/stream finish). */
  private[graft] def finish(sums: DataFrame, groupCols: Seq[String]): DataFrame =
    sums
      .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__dx", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__dy", col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .select(
        groupCols.map(col) ++ Seq(
          col("__n").cast("long").as("n"),
          when(col("__dx") > 0,
            when(col("__num") < 0, lit(-1L)).otherwise(lit(1L)) *
              expr("86400 * abs(__num) div __dx"))
            .otherwise(lit(null).cast("long")).as("slope_milli_per_day"),
          when(col("__dx") > 0 && col("__dy") > 0,
            floor(col("__num").cast("double") * col("__num").cast("double") *
              lit(10000.0) /
              (col("__dx").cast("double") * col("__dy").cast("double")))
              .cast("long"))
            .otherwise(lit(null).cast("long")).as("r2_bp")): _*)
}
