package graft.functions

import java.nio.ByteBuffer
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native
  * `TypedImperativeAggregate`: the buffer holds at most k (item, count)
  * counters, so the exchange carries ≤ k entries per group per map task
  * regardless of input size — where the declarative alternative
  * (group by item, filter on the global total) shuffles the ENTIRE
  * key space to answer a question about its top handful. At corpus
  * scale that is the difference between a bounded sketch merge and a
  * vocabulary-sized shuffle.
  *
  * Items carry a WEIGHT (`weight` expression, long): an input row adds
  * its weight to its item's counter, so the summary answers both "which
  * tokens dominate occurrences" (weight 1) and "which sources dominate
  * the token budget" (weight = tokens per row). Null items, null weights
  * and zero weights are skipped; negative weights throw — they would
  * silently void the guarantee.
  *
  * Guarantee (the classic MG bound, preserved under the mergeable-
  * summaries merge of Agarwal et al., and by the insert-then-bound
  * update which IS that merge with a singleton): every item whose true
  * total weight exceeds W/(k+1) — W the total input weight — is present
  * in the output. The output is therefore a SUPERSET of the heavy
  * hitters at any threshold ≥ W/(k+1). The summary's membership beyond
  * that guarantee depends on partitioning, so callers wanting a
  * deterministic final answer re-count the candidates exactly and
  * filter on the true threshold (one tiny candidate-only aggregation) —
  * see `TextOps.heavyHitters` / `heavyHittersWeighted`; the composed
  * result is bit-exact and oracle-checkable even though the sketch in
  * the middle is not.
  *
  * eval returns the candidate items sorted (bytewise), counts dropped:
  * MG counts are UNDER-estimates (off by ≤ W/(k+1)) and the exact
  * re-count pass supersedes them.
  *
  * Amortized cost: a full-buffer miss inserts the newcomer, then
  * subtracts the buffer's MINIMUM counter from all k+1 entries and drops
  * the zeros (with k+1 entries the minimum IS the (k+1)-th largest, so
  * this is exactly the merge's bound step). Each O(k) sweep removes
  * (k+1)·min of counter mass, and mass only enters with arriving weight,
  * so sweep work totals O(input) over the stream.
  */
case class MisraGries(
    child: Expression,
    weight: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JHashMap[UTF8String, java.lang.Long]]
  with BinaryLike[Expression] {

  require(k >= 1, "Misra-Gries needs at least one counter")

  override def left: Expression = child
  override def right: Expression = weight

  // type check belongs post-analysis: at construction the children may be
  // unresolved attributes whose dataType is not yet known
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"Misra-Gries summarizes strings, got ${child.dataType}")
    else if (weight.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"Misra-Gries weight must be a long, got ${weight.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): JHashMap[UTF8String, java.lang.Long] =
    new JHashMap[UTF8String, java.lang.Long]()

  override def update(
      buf: JHashMap[UTF8String, java.lang.Long],
      input: InternalRow): JHashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    val wv = weight.eval(input)
    if (v != null && wv != null) {
      val w = wv.asInstanceOf[Long]
      if (w < 0L) throw new IllegalArgumentException(
        s"Misra-Gries weight must be non-negative, got $w")
      if (w > 0L) {
        val s = v.asInstanceOf[UTF8String]
        val cur = buf.get(s)
        if (cur != null) buf.put(s, java.lang.Long.valueOf(cur.longValue() + w)) // key already interned; put keeps it
        else {
          buf.put(s.clone(), java.lang.Long.valueOf(w)) // clone: the row's UTF8String aliases a reused buffer
          if (buf.size > k) boundByMin(buf)
        }
      }
    }
    buf
  }

  /** Restore the k-bound after a single overflow insert: with k+1 entries
    * the minimum counter is the (k+1)-th largest, so subtracting it from
    * everyone (and dropping zeros) is the merge's bound step. */
  private def boundByMin(buf: JHashMap[UTF8String, java.lang.Long]): Unit = {
    var m = Long.MaxValue
    val vs = buf.values().iterator()
    while (vs.hasNext) { val c = vs.next().longValue(); if (c < m) m = c }
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.longValue() - m
      if (c <= 0L) it.remove() else e.setValue(c)
    }
  }

  /** Mergeable-summaries merge: sum counters, then restore the k-bound
    * by subtracting the (k+1)-th largest count from every counter and
    * dropping the non-positive — same error bound as update's sweeps. */
  override def merge(
      buf: JHashMap[UTF8String, java.lang.Long],
      other: JHashMap[UTF8String, java.lang.Long]): JHashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      // other's keys come from deserialize/its own clones — safe to adopt
      val nv: java.lang.Long =
        if (cur == null) e.getValue
        else java.lang.Long.valueOf(cur.longValue() + e.getValue.longValue())
      buf.put(e.getKey, nv)
    }
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next().longValue(); i += 1 }
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - 1 - k) // (k+1)-th largest
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        val c = e.getValue.longValue() - m
        if (c <= 0L) es.remove() else e.setValue(c)
      }
    }
    buf
  }

  override def eval(buf: JHashMap[UTF8String, java.lang.Long]): Any = {
    val arr = buf.keySet().toArray(new Array[AnyRef](buf.size))
    java.util.Arrays.sort(arr, null) // UTF8String is Comparable (bytewise)
    new GenericArrayData(arr)
  }

  override def serialize(buf: JHashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val sz = buf.entrySet().iterator()
    while (sz.hasNext) bytes += 12 + sz.next().getKey.numBytes()
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[UTF8String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JHashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(UTF8String.fromBytes(b), java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGries =
    copy(child = newLeft, weight = newRight)
}
