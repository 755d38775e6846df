package graft.streaming

import graft.operators.Trend
import org.apache.spark.sql.{Column, DataFrame}

/** D18s: STREAMING trend monitor — the running OLS slope/r² per group,
  * maintained continuously over a live feed. The batch operator's power
  * sums are plain commutative grouped aggregates, so the streaming form
  * IS the batch form run in update/complete mode: state per group is
  * exactly the six DECIMAL(38,0) sums (bounded by group cardinality, not
  * event volume — the D15/E56s state argument), and after ANY prefix of
  * microbatches the emitted rows equal `Trend.perGroup` over the events
  * seen so far (parity-tested across microbatch splits). No
  * mapGroupsWithState needed: the sums ARE the sufficient statistic, and
  * Spark's streaming aggregation already checkpoints them durably.
  *
  * The drift companion to the batch trend: land it with
  * `.writeStream.outputMode("update")` and every touched group re-emits
  * its refreshed slope each microbatch.
  */
object TrendStream {

  def runningTrend(
      stream: DataFrame,
      groupCols: Seq[String],
      xUs: Column,
      y: Column,
      xOffsetS: Long): DataFrame =
    Trend.finish(
      Trend.powerSums(stream, groupCols, xUs, y, xOffsetS), groupCols)
}
