package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native functions
  * for SQL users, so `spark.sql("SELECT graft_h32(text) ...")` works
  * alongside the Column API.
  *
  * Enable via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: plans graft.plans.TopKPerGroup nodes
    ext.injectPlannerStrategy(_ => GraftStrategies)
    ext.injectFunction((
      new FunctionIdentifier("graft_h32"),
      new ExpressionInfo(
        classOf[graft.functions.H32].getName, "graft_h32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_h32 takes exactly one argument")
        graft.functions.H32(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(
        classOf[graft.functions.KmvDistinct].getName, "graft_kmv_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kmv_distinct(hash_col, k)")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_distinct k must be an integer literal, got $other")
        }
        graft.functions.KmvDistinct(args.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_heavy_hitter_candidates"),
      new ExpressionInfo(
        classOf[graft.functions.MisraGries].getName, "graft_heavy_hitter_candidates"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "graft_heavy_hitter_candidates(item_col, k) or (item_col, weight_col, k)")
        val k = args.last match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitter_candidates k must be an integer literal, got $other")
        }
        val weight =
          // cast int-typed SQL weights up to long so the common
          // `graft_heavy_hitter_candidates(item, cnt, 10)` just works
          if (args.length == 3) org.apache.spark.sql.catalyst.expressions.Cast(
            args(1), org.apache.spark.sql.types.LongType)
          else org.apache.spark.sql.catalyst.expressions.Literal(1L)
        graft.functions.MisraGries(args.head, weight, k).toAggregateExpression()
      }))
  }
}
