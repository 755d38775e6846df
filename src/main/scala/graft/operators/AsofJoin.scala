package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join: for each left row, attach the most
  * recent right row (by `timeCol`) with the same key and time ≤ the left
  * row's time.
  *
  * Spark lacks a native as-of join; the naive formulation (theta-join on
  * `l.key = r.key AND r.ts <= l.ts` + groupBy max) fans out to every
  * earlier right row per left row. This implementation is the
  * union-and-carry-forward plan: tag both sides, union (narrow), and run
  * ONE window per key ordered by time where `last(right_payload,
  * ignoreNulls)` carries the latest right values forward onto left rows.
  * Cost is a single hash shuffle by key + per-key sort — the same shape as
  * a sort-merge join, with no fan-out, so it survives 100 TB inputs and
  * skewed keys (AQE) unchanged.
  */
object AsofJoin {

  /** @param left      probe side (keeps all its rows and columns)
    * @param right     reference side; its `payload` columns are attached
    * @param keyCols   equality keys present on both sides
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right columns to carry (attached as-is; null when no
    *                  earlier right row exists)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // common ordering axis; right rows order before left rows at equal time
    // (a right row AT the left timestamp matches — "most recent ≤ ts")
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__c_$c").as(s"asof_$c")): _*)
  }
}
