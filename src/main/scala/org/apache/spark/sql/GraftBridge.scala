package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge. Spark 4 made these conversions
  * `private[sql]` (`classic.ExpressionUtils`); extensions that define
  * native expressions (graft.functions.H32) need this two-liner in the
  * sql package — the conventional pattern for Catalyst extension libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan — `Dataset.ofRows`
    * is `private[sql]`; whole-operator extensions (graft.plans.TopKPerGroup)
    * need it to hand their node to the analyzer/planner. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Apply the optimizer's floating-point normalization (0.0 == -0.0,
    * one canonical NaN) to an expression used as a grouping/partitioning
    * key. The NormalizeFloatingNumbers rule does this automatically for
    * Aggregate/Window/Join keys but does not know custom logical nodes
    * (graft.plans.TopKPerGroup), so the node's builder normalizes its own
    * keys. No-op for non-floating types. */
  def normalizeFloatingKey(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** Idempotently add a planner strategy to the session (the runtime
    * complement of GraftExtensions.injectPlannerStrategy, for sessions
    * built without the extension). */
  def ensureStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }
}
