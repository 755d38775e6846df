package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence transition analysis: the empirical Markov chain over
  * per-user event streams.
  *
  * The reference validates CDC event streams row-by-row
  * (/root/reference/src/cdc/cdc_operator.rs drives per-table replay);
  * this operator answers the analytics question next to that feed —
  * "given a user just did X, what do they do next?" — the path/journey
  * report every product-analytics stack ships alongside funnels.
  *
  * Shape: ONE exchange by `userCol` computes every consecutive
  * (prev, next) step via `lead`; the transition matrix is then a
  * |types|² aggregate — map-side combinable, and tiny regardless of
  * input scale, so the second window (per-prev totals and ranks) runs
  * over kilobytes even at 100 TB of events. Steps separated by more
  * than `gapUs` are cut, so paths never span sessions.
  *
  * All outputs are integers (counts, basis points by integral division,
  * ranks), making the result bit-exact across engines.
  */
object Markov {

  /** Corpus transition matrix: one row per observed (prev_type, next_type)
    * step with count, per-prev probability in basis points, and rank of
    * the next type within the prev (by count desc, name asc).
    *
    * @param orderCols total order of each user's stream (ties must be
    *                  broken — pass the event id after the timestamp)
    * @param gapUs     steps whose timestamps are further apart than this
    *                  are dropped (session boundary), in epoch-µs
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      tsUs: Column,
      typeCol: String,
      orderCols: Seq[Column],
      gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(orderCols: _*)
    val steps = events
      .withColumn("__us", tsUs)
      .withColumn("__next_type", lead(col(typeCol), 1).over(byUser))
      .withColumn("__next_us", lead(col("__us"), 1).over(byUser))
      .filter(col("__next_type").isNotNull &&
        col("__next_us") - col("__us") <= gapUs)
    val counts = steps
      .groupBy(col(typeCol).as("prev_type"), col("__next_type").as("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val perPrev = Window.partitionBy(col("prev_type"))
    counts
      .withColumn("tot", sum(col("cnt")).over(perPrev))
      .withColumn("p_bp", expr("cnt * 10000 div tot"))
      .withColumn("rk", row_number()
        .over(perPrev.orderBy(col("cnt").desc, col("next_type").asc))
        .cast("bigint"))
      .drop("tot")
  }
}
