package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native argmin assignment against a broadcast-sized centroid set —
  * the flat-quantizer hot path (ivfAssign / ivfTrain rounds / SemDeDup
  * assignment) folded into ONE codegen'd scalar call per corpus row.
  *
  * The declarative form (crossJoin(broadcast(centroids)) → n·K distance
  * rows → min_by struct aggregate) has the right SHUFFLE shape (partial
  * agg collapses the fan-out map-side) but a wrong LOCAL shape at
  * scale: min_by's struct buffer is not hash-aggregable, so Spark
  * plans a SortAggregate — a local sort of all n·K distance rows
  * (~1e8 rows × wide payload at sf10; the sweep measured the flat
  * assignment at ~230 s where this loop does the same arithmetic in
  * seconds). Here the K×(n, s_0..s_{dims-1}) table rides the plan as a
  * reference object — the same K rows the broadcast shipped — and each
  * row resolves in a tight K·dims integer loop with NO row blow-up, no
  * aggregate, no exchange at all.
  *
  * Bit-exactness with the declarative form (and so with the DuckDB
  * oracles): the loop replays the exact Catalyst expression sequence —
  * per dim `n·q_i − s_i` in wrapping long arithmetic, `Math.pow(term,
  * 2.0)` (Catalyst's Pow), left-associative double sum (reduce(_ + _);
  * `0.0 + t0 == t0` exactly since every term is non-negative), divide
  * by `(n·n).toDouble` — and the (dist, group)-ascending tie-break is
  * the same total order min_by used. Argmin is iteration-order-free
  * (strict improvement or equal-dist-smaller-group), so collect order
  * never matters.
  *
  * 100 TB note: K here is the broadcast-bounded flat-quantizer size
  * (K ≈ √n for bounded-cluster SemDeDup, ≤ a few thousand in every
  * gate); beyond that the two-level tree ([[graft.similarity.Knn.treeAssign]])
  * is the assignment path and this expression serves its level-1/level-2
  * argmins per level.
  */
final case class CentroidSet(
    dims: Int,
    groups: Array[Long],
    ns: Array[Long],
    sums: Array[Array[Long]])
  extends Serializable {
  require(groups.nonEmpty, "CentroidSet: no centroids")
  require(groups.length == ns.length && ns.length == sums.length,
    "CentroidSet: ragged arrays")

  /** Called from generated code. Returns the argmin group id. */
  def nearest(qv: ArrayData): Long = {
    val k = groups.length
    var bestD = Double.PositiveInfinity
    var bestG = Long.MaxValue
    var c = 0
    while (c < k) {
      val n = ns(c)
      val s = sums(c)
      var sum = 0.0
      var i = 0
      while (i < dims) {
        sum += Math.pow((n * qv.getLong(i) - s(i)).toDouble, 2.0)
        i += 1
      }
      val d = sum / (n * n).toDouble
      if (d < bestD || (d == bestD && groups(c) < bestG)) {
        bestD = d; bestG = groups(c)
      }
      c += 1
    }
    bestG
  }
}

/** `nearest(qv)` over a plan-shipped [[CentroidSet]]; `groupType` is the
  * original centroid-id type (int for label-derived centroids, long for
  * hash/tree groups) so downstream schemas are unchanged. */
case class NearestCentroid(
    child: Expression, model: CentroidSet, groupType: DataType)
    extends UnaryExpression {
  require(groupType == LongType || groupType == IntegerType,
    s"NearestCentroid: group type must be int or bigint, got $groupType")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = groupType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val g = model.nearest(input.asInstanceOf[ArrayData])
    if (groupType == IntegerType) g.toInt else g
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidSet", model, classOf[CentroidSet].getName)
    val cast = if (groupType == IntegerType) "(int)" else ""
    defineCodeGen(ctx, ev, c => s"$cast$m.nearest($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
