package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The centroid classifier's serve path folded into ONE scalar pass
  * over the document text — the (b) preference tier from SURVEY §2: a
  * native codegen'd `Expression` where the declarative composition
  * (explode → tf groupBy → broadcast join → score groupBy → argmax
  * window) is wasteful in a hot path. The relational serve path blows
  * each doc up into (doc × position) rows just to collapse them again
  * two shuffles later; at sf10 that explode was the suite's most
  * expensive per-byte query (144 s, r12 verdict item 4). Here the same
  * exact-Long arithmetic rides a single whole-stage-codegen projection:
  * per char position, one hash-map probe of the n-char window against
  * the vocab (the SAME vocabulary-sized table the broadcast join
  * shipped — it travels inside the plan instead) and C integer adds.
  * Zero shuffle, zero blow-up; the corpus is read once.
  *
  * Semantics are BIT-IDENTICAL to [[graft.text.Classifier.predictCentroid]]
  * (property-pinned in ClassifierSpec):
  *   - score(c) = Σ_positions w_ppm(gram at position, c), exact Long —
  *     equal to the join path's Σ_grams tf·w by commutativity;
  *   - a class COMPETES only if ≥1 of the doc's grams has a weight row
  *     for it (the inner join's row-existence semantics — NOT "score 0
  *     for everyone": an all-negative doc must not leak a no-overlap
  *     class into the argmax). Tracked as a per-gram class bitmask;
  *   - argmax ties break to the lexicographically (UTF8-binary)
  *     smallest class; docs matching no trained gram — including null
  *     and shorter-than-n texts — fall back to the smallest class.
  *
  * 100 TB shape: the model is vocab-sized (the minCount floor keeps it
  * bounded by the corpus's FREQUENT vocabulary — measured saturating,
  * 2030→9897 rows over a 100× corpus decade), so plan-shipping it is
  * the same mass the broadcast join already moved, and scoring is
  * embarrassingly parallel with no exchange at any scale.
  */
final case class CentroidFoldModel(
    n: Int,
    classes: Array[String],      // ascending UTF8-binary order; (0) = fallback
    grams: Array[String],
    weights: Array[Array[Long]], // per gram: length C, 0 where no (cls,gram) row
    masks: Array[Long])          // per gram: bit c set iff (classes(c),gram) row exists
  extends Serializable {
  require(n >= 1, s"CentroidFoldModel: n must be >= 1, got $n")
  require(classes.nonEmpty, "CentroidFoldModel: no classes")
  require(classes.length <= 64,
    s"CentroidFoldModel: class bitmask holds <= 64 classes, got ${classes.length}")

  // rebuilt lazily on each executor — UTF8String keys never serialize
  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](grams.length * 2)
    var i = 0
    while (i < grams.length) { m.put(UTF8String.fromString(grams(i)), i); i += 1 }
    m
  }
  @transient private lazy val classesU8: Array[UTF8String] =
    classes.map(UTF8String.fromString)

  /** Called from generated code; null/short text → fallback class. */
  def predict(text: UTF8String): UTF8String = {
    if (text == null) return classesU8(0)
    val t = text.toLowerCase
    val len = t.numChars()
    val c = classes.length
    val scores = new Array[Long](c)
    var mask = 0L
    var i = 0
    val last = len - n
    while (i <= last) {
      val idx = index.get(t.substring(i, i + n))
      if (idx != null) {
        val gi = idx.intValue()
        val w = weights(gi)
        var k = 0
        while (k < c) { scores(k) += w(k); k += 1 }
        mask |= masks(gi)
      }
      i += 1
    }
    if (mask == 0L) return classesU8(0)
    // first index achieving the max among COMPETING classes = min cls
    var best = Long.MinValue
    var bestIdx = 0
    var k = 0
    while (k < c) {
      if (((mask >>> k) & 1L) == 1L && scores(k) > best) { best = scores(k); bestIdx = k }
      k += 1
    }
    classesU8(bestIdx)
  }
}

case class CentroidPredict(child: Expression, model: CentroidFoldModel)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_centroid_predict requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = false // null text → fallback class
  override def prettyName: String = "graft_centroid_predict"

  override def eval(input: InternalRow): Any =
    model.predict(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidFoldModel", model,
      classOf[CentroidFoldModel].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} =
          $m.predict(${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidPredict =
    copy(child = newChild)
}
