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
}
