package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The whole two-level (multi-probe) tree assignment as ONE codegen'd
  * scalar call — the 100 TB SemDeDup assignment path with zero
  * aggregation: level-1 top-`probe` cell selection and the level-2
  * composite argmin both run inside a tight loop against the
  * plan-shipped quantizer ([[NearestCentroid]]'s pattern, applied to
  * the tree). The declarative form paid an ObjectHashAggregate
  * (collect_list + array_sort ranking) plus a SortAggregate (min_by's
  * struct buffer) over n·(probe·k2) rows per corpus pass; here a row
  * never fans out at all.
  *
  * Bit-exactness with the declarative [[graft.similarity.Knn.treeAssign]]
  * (pinned by the unchanged oracles + SimilaritySpec):
  *  - level-1 selection keeps the `probe` smallest cells by the same
  *    (dist, cell) ascending order the array_sort ranking used (and the
  *    probe=1 special case is exactly [[CentroidSet.nearest]]'s rule);
  *  - level-2 scores ONLY the probed cells' children with the same
  *    scaled distance sequence (wrapping-long diffs, Math.pow(t, 2.0),
  *    left-assoc double sum, /(n·n)) and the same GLOBAL
  *    (dist, cell·k2+child) composite tie-break;
  *  - a vector whose every probed cell is childless (possible only when
  *    the serve corpus strays from the training corpus into a cell that
  *    lost all members in the final Lloyd round) returns the
  *    NO_CHILD sentinel and the caller drops the row — the declarative
  *    inner join's row-drop semantics, made explicit.
  */
final case class TreeCentroidSet(
    dims: Int,
    k2: Long,
    probe: Int,
    cells: Array[Long], cellNs: Array[Long], cellSums: Array[Array[Long]],
    childCell: Array[Long], childIds: Array[Long],
    childNs: Array[Long], childSums: Array[Array[Long]])
  extends Serializable {
  require(dims >= 1 && probe >= 1 && cells.nonEmpty && childCell.nonEmpty,
    "TreeCentroidSet: empty quantizer")
  require(cells.length == cellNs.length && cellNs.length == cellSums.length,
    "TreeCentroidSet: ragged level-1")
  require(childCell.length == childIds.length &&
    childIds.length == childNs.length && childNs.length == childSums.length,
    "TreeCentroidSet: ragged level-2")

  // per-executor child index: cell id -> positions in the child arrays
  @transient private lazy val childrenOf: java.util.HashMap[java.lang.Long, Array[Int]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Int]]()
    val byCell = childCell.indices.groupBy(childCell(_))
    byCell.foreach { case (c, idxs) => m.put(c, idxs.toArray) }
    m
  }

  private def dist(qv: ArrayData, n: Long, s: Array[Long]): Double = {
    var sum = 0.0
    var i = 0
    while (i < dims) {
      sum += Math.pow((n * qv.getLong(i) - s(i)).toDouble, 2.0)
      i += 1
    }
    sum / (n * n).toDouble
  }

  /** Composite cluster id (cell·k2 + child), or NO_CHILD if every probed
    * cell is childless. Called from generated code. */
  def assign(qv: ArrayData): Long = {
    // level-1: the `probe` smallest cells by (dist, cell) ascending —
    // bounded insertion, identical order to the array_sort ranking
    val pN = math.min(probe, cells.length)
    val bd = new Array[Double](pN)
    val bg = new Array[Long](pN)
    java.util.Arrays.fill(bd, Double.PositiveInfinity)
    java.util.Arrays.fill(bg, Long.MaxValue)
    var c = 0
    while (c < cells.length) {
      val d = dist(qv, cellNs(c), cellSums(c))
      val g = cells(c)
      if (d < bd(pN - 1) || (d == bd(pN - 1) && g < bg(pN - 1))) {
        var j = pN - 1
        while (j > 0 && (d < bd(j - 1) || (d == bd(j - 1) && g < bg(j - 1)))) {
          bd(j) = bd(j - 1); bg(j) = bg(j - 1); j -= 1
        }
        bd(j) = d; bg(j) = g
      }
      c += 1
    }
    // level-2: global (dist, composite) argmin over the probed cells'
    // children only
    var bestD = Double.PositiveInfinity
    var bestComposite = TreeCentroidSet.NO_CHILD
    var found = false
    var p = 0
    while (p < pN) {
      if (bd(p) != Double.PositiveInfinity) {
        val idxs = childrenOf.get(bg(p))
        if (idxs != null) {
          var x = 0
          while (x < idxs.length) {
            val ci = idxs(x)
            val d2 = dist(qv, childNs(ci), childSums(ci))
            val composite = bg(p) * k2 + childIds(ci)
            if (!found || d2 < bestD || (d2 == bestD && composite < bestComposite)) {
              bestD = d2; bestComposite = composite; found = true
            }
            x += 1
          }
        }
      }
      p += 1
    }
    if (found) bestComposite else TreeCentroidSet.NO_CHILD
  }
}

object TreeCentroidSet {
  /** Sentinel mapped to SQL NULL by [[TreeCentroidAssign]]; composites
    * are non-negative so it can never collide. */
  final val NO_CHILD: Long = Long.MinValue
}

/** Per-cell child table for the Lloyd LEVEL-2 reassignment rounds
  * ([[graft.similarity.Knn.ivfTrain2]]): each row's argmin runs only
  * over ITS OWN cell's current children by the (dist, child) order —
  * the per-round min_by SortAggregate over n·k2 rows, folded into one
  * codegen'd call like the assignment folds. */
final case class CellChildren(
    dims: Int,
    childCell: Array[Long], childIds: Array[Long],
    childNs: Array[Long], childSums: Array[Array[Long]])
  extends Serializable {
  require(dims >= 1 && childCell.nonEmpty, "CellChildren: empty child table")
  require(childCell.length == childIds.length &&
    childIds.length == childNs.length && childNs.length == childSums.length,
    "CellChildren: ragged arrays")

  @transient private lazy val childrenOf: java.util.HashMap[java.lang.Long, Array[Int]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Int]]()
    childCell.indices.groupBy(childCell(_)).foreach {
      case (c, idxs) => m.put(c, idxs.toArray)
    }
    m
  }

  /** Argmin child of `cell` by (dist, child) ascending; NO_CHILD when
    * the cell has no children (the old inner join's row-drop, surfaced
    * — cannot occur for a cell that contributed to the sums). */
  def nearestChild(qv: ArrayData, cell: Long): Long = {
    val idxs = childrenOf.get(cell)
    if (idxs == null) return TreeCentroidSet.NO_CHILD
    var bestD = Double.PositiveInfinity
    var bestC = Long.MaxValue
    var x = 0
    while (x < idxs.length) {
      val ci = idxs(x)
      var sum = 0.0
      var i = 0
      val n = childNs(ci)
      val s = childSums(ci)
      while (i < dims) {
        sum += Math.pow((n * qv.getLong(i) - s(i)).toDouble, 2.0)
        i += 1
      }
      val d = sum / (n * n).toDouble
      val c = childIds(ci)
      if (d < bestD || (d == bestD && c < bestC)) { bestD = d; bestC = c }
      x += 1
    }
    bestC
  }
}

/** `nearestChild(qv, cell)` over a plan-shipped [[CellChildren]]. */
case class NearestChild(left: Expression, right: Expression, model: CellChildren)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_child requires (array<bigint>, bigint), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_child"

  override protected def nullSafeEval(qv: Any, cell: Any): Any = {
    val v = model.nearestChild(qv.asInstanceOf[ArrayData], cell.asInstanceOf[Long])
    if (v == TreeCentroidSet.NO_CHILD) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellChildren", model, classOf[CellChildren].getName)
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${lGen.code}
      ${rGen.code}
      long ${ev.value} = (${lGen.isNull} || ${rGen.isNull})
        ? ${TreeCentroidSet.NO_CHILD}L
        : $m.nearestChild(${lGen.value}, ${rGen.value});
      boolean ${ev.isNull} = ${ev.value} == ${TreeCentroidSet.NO_CHILD}L;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestChild =
    copy(left = newLeft, right = newRight)
}

case class TreeCentroidAssign(child: Expression, model: TreeCentroidSet)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tree_assign requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null input or childless probes
  override def prettyName: String = "graft_tree_assign"

  override protected def nullSafeEval(input: Any): Any = {
    val v = model.assign(input.asInstanceOf[ArrayData])
    if (v == TreeCentroidSet.NO_CHILD) null else java.lang.Long.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("treeCentroidSet", model,
      classOf[TreeCentroidSet].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = ${childGen.isNull}
        ? ${TreeCentroidSet.NO_CHILD}L
        : $m.assign(${childGen.value});
      boolean ${ev.isNull} =
        ${childGen.isNull} || ${ev.value} == ${TreeCentroidSet.NO_CHILD}L;""")
  }

  override protected def withNewChildInternal(newChild: Expression): TreeCentroidAssign =
    copy(child = newChild)
}
