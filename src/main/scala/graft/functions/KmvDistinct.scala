package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** K-minimum-values distinct-count sketch as a native
  * `TypedImperativeAggregate` — the (b)-tier Catalyst extension for an
  * aggregation built-ins cannot express efficiently: the declarative
  * formulation (rank all hashes per group, keep k) shuffles EVERY value,
  * while this buffer keeps only the k smallest distinct hashes per
  * partition, so the exchange carries ≤ k longs per group per map task
  * regardless of input size — the shape that makes corpus-wide distinct
  * counting feasible at 100 TB.
  *
  * Determinism is the point: fed engine-portable hashes (PortableHash
  * .h32), the k smallest distinct values — and therefore the integer
  * estimate floor((k−1)·2³² / kth_min) — are REPRODUCIBLE in any engine,
  * so unlike HLL-style sketches the result is oracle-checkable bit-for-
  * bit (DuckDB: DISTINCT hash ORDER BY LIMIT k, same formula). Groups
  * with fewer than k distinct hashes return the exact count.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BottomKHashAgg {

  require(k >= 2, "KMV needs k >= 2 (k = 1 cannot separate estimate from exact)")

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    if (n < k) n.toLong
    else {
      val kth = buf.last().longValue()
      if (kth <= 0L) n.toLong // degenerate (hash space exhausted at 0)
      else (k - 1).toLong * 4294967296L / kth
    }
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** The k smallest distinct hashes themselves, evaluated as a sorted
  * ascending long array — the SYNOPSIS the estimate is derived from,
  * for consumers that combine synopses across columns or tables
  * (set-overlap profiling, graft.operators.KeyOverlap). Same buffer,
  * same ≤ k-longs-per-map-task exchange; groups with fewer than k
  * distinct hashes return them all (the exact regime). */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BottomKHashAgg {

  require(k >= 1, "bottom-k needs k >= 1")

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_bottom_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}

/** Shared buffer mechanics of the KMV family: the aggregation state is
  * the k smallest DISTINCT long hashes seen (a TreeSet pruned from the
  * top), merged by union-and-prune — so partial aggregation ships ≤ k
  * longs per group per map task no matter the input size. Subclasses
  * choose what to derive from the synopsis in eval. */
abstract class BottomKHashAgg
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  def child: Expression
  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def nullable: Boolean = false
}
