package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for each left row, attach the nearest right
  * row (by `timeCol`) with the same key — the most recent at-or-before
  * one (`backward`, the default direction everywhere) or the earliest
  * at-or-after one (`forward`), optionally only when the match lies
  * within a time tolerance.
  *
  * Spark lacks a native as-of join; the naive formulation (theta-join on
  * `l.key = r.key AND r.ts <= l.ts` + groupBy max) fans out to every
  * earlier right row per left row. This implementation is the
  * union-and-carry plan: tag both sides, union (narrow), and run ONE
  * window per key ordered by time where `last(right_payload,
  * ignoreNulls)` carries the nearest right values onto left rows
  * (ascending order carries forward = backward join; descending order
  * carries backward = forward join). Cost is a single hash shuffle by
  * key + per-key sort — the same shape as a sort-merge join, with no
  * fan-out, so it survives 100 TB inputs and skewed keys (AQE)
  * unchanged.
  */
object AsofJoin {

  /** Most recent right row with `rightTime` ≤ the left row's `leftTime`.
    *
    * @param left      probe side (keeps all its rows and columns)
    * @param right     reference side; its `payload` columns are attached
    * @param keyCols   equality keys present on both sides
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right columns to carry (attached as `asof_<name>`;
    *                  null when no matching right row exists)
    * @param tolerance max allowed |leftTime − rightTime| for a match to
    *                  count: integer MICROSECONDS for timestamp columns
    *                  (exact — mirrors epoch_us in the oracle), native
    *                  units via a double cast otherwise. None = any
    *                  distance, the classic as-of.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCols, leftTime, rightTime, payload,
      forwardDir = false, tolerance)

  /** Earliest right row with `rightTime` ≥ the left row's `leftTime` —
    * the "next event" direction (first reading after a probe, next
    * heartbeat after a deploy). Same single-shuffle plan as [[backward]]
    * with the per-key sort reversed. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, keyCols, leftTime, rightTime, payload,
      forwardDir = true, tolerance)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      forwardDir: Boolean,
      tolerance: Option[Column]): DataFrame = {
    val leftCols = left.columns
    // the carried struct names the matched time "__rt" beside the
    // payload fields — a payload column of that name would make the
    // struct's getField calls ambiguous; refuse instead of mis-reading
    require(!payload.contains("__rt"),
      "payload column name __rt collides with the as-of join's matched-time " +
        "field; rename it before joining")
    // ONE carried column: the whole right payload + the matched row's
    // time as a struct. The struct is non-null exactly when a right row
    // exists, so a matched row whose payload VALUE is null stays that
    // row's null (per-column carries would skip back to an older
    // non-null value), and the tolerance check reads the matched time
    // off the same window pass.
    val rStruct = struct(
      col(rightTime).as("__rt") +: payload.map(col): _*)
    val rStructType = right.select(rStruct.as("__p")).schema("__p").dataType
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(rStructType).as("__p")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"), rStruct.as("__p")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // common ordering axis; right rows order before left rows at equal
    // time in BOTH directions (a right row AT the left timestamp matches
    // — "nearest at-or-before/at-or-after ts"), so __side ascends while
    // only the time axis flips
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(if (forwardDir) col("__t").desc else col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
    val matched = tolerance match {
      case None => col("__c").isNotNull
      case Some(tol) =>
        // integer micros for timestamps (either physical encoding —
        // TimeCols.micros) so the boundary is exact; native units via a
        // double cast for genuinely numeric axes
        def toNum(c: Column) = right.schema(rightTime).dataType match {
          case dt @ (org.apache.spark.sql.types.TimestampType |
                     org.apache.spark.sql.types.TimestampNTZType) =>
            graft.util.TimeCols.micros(c, dt)
          case _ => c.cast("double")
        }
        val rt = toNum(col("__c").getField("__rt"))
        val gap =
          if (forwardDir) rt - toNum(col("__t"))
          else toNum(col("__t")) - rt
        col("__c").isNotNull && gap <= tol
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => when(matched, col("__c").getField(c)).as(s"asof_$c")): _*)
  }
}
