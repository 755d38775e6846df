package graft.operators

import graft.plans.{GraftStrategies, TopKPerGroup}
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.types.LongType

/** Column-API entry to the native top-k-per-group operator
  * (graft.plans.TopKPerGroup): same results as
  * `row_number().over(Window.partitionBy(groups).orderBy(order))` +
  * `filter(rk <= k)`, but executed as one bounded-heap pass after the
  * hash shuffle instead of a full per-group sort — O(n log k) with
  * #groups × k rows of state, no sort of discarded rows.
  */
object TopK {

  /** @param df      input
    * @param groupBy group key column names (empty = global top-k)
    * @param orderBy sort keys — pass `col(...).desc` / `.asc`; include
    *                enough tiebreakers to make the ranking deterministic
    *                (same contract as row_number)
    * @param k       rows kept per group
    * @param rankCol name of the appended 1-based rank column (long) */
  def perGroup(
      df: DataFrame,
      groupBy: Seq[String],
      orderBy: Seq[Column],
      k: Int,
      rankCol: String = "rk"): DataFrame = {
    val spark = df.sparkSession
    require(orderBy.nonEmpty,
      "topK.perGroup requires at least one orderBy column (row_number refuses to run without ORDER BY, and an empty ordering would keep k arbitrary rows)")
    GraftBridge.ensureStrategy(spark, GraftStrategies)
    // route the order columns through a throwaway sortWithinPartitions so
    // the ANALYZER converts/resolves them into catalyst SortOrder (the
    // Column layer's internal sort nodes are session-bound and not
    // serializable; hand-wrapping them would ship them into tasks)
    val analyzedSort = df.sortWithinPartitions(orderBy: _*).queryExecution.analyzed
    val (order, child) = analyzedSort match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(
        s"unexpected analyzed plan for sort extraction: ${other.nodeName}")
    }
    val resolver = spark.sessionState.analyzer.resolver
    require(!child.output.exists(a => resolver(a.name, rankCol)),
      s"rank column '$rankCol' collides with an existing column; pass a distinct rankCol")
    // normalize float/double group keys (0.0 == -0.0, canonical NaN) so
    // grouping matches Aggregate/Window semantics — the optimizer's
    // NormalizeFloatingNumbers rule does not visit custom nodes, and the
    // normalized expr must ALSO drive the shuffle hash, hence logical-layer
    val groups = groupBy.map(n => child.output.find(a => resolver(a.name, n)).getOrElse(
      throw new IllegalArgumentException(
        s"group column '$n' not found among ${child.output.map(_.name).mkString(", ")}")))
      .map(a => GraftBridge.normalizeFloatingKey(a))
    GraftBridge.ofRows(spark, TopKPerGroup(
      groups, order, k,
      AttributeReference(rankCol, LongType, nullable = false)(),
      child))
  }
}
