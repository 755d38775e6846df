package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension: top-k rows per group WITHOUT a per-group
  * sort — the custom-LogicalPlan / Strategy / SparkPlan tier of the
  * extension ladder (SURVEY §2 D3n), for the one shape where composing
  * built-ins is asymptotically wasteful.
  *
  * The standard formulation (`row_number().over(partitionBy...orderBy)`
  * + `filter(rk <= k)`) sorts EVERY group's full row set to keep k of
  * them: O(n log n) comparisons per group and a WindowExec that
  * materializes each partition's groups in memory or spills. This
  * operator keeps a k-bounded heap per group in one pass after the same
  * hash shuffle — O(n log k), state = #groups × k rows per partition,
  * nothing else buffered, no sort of the discarded (n − k) rows.
  * At 100 TB with billions of small groups the window's sorts dominate
  * the stage; the heap pass streams.
  *
  * Same contract as the window form, including the emitted rank column
  * (`order` ties broken by the caller adding tiebreaker sort keys, as
  * with row_number).
  */
case class TopKPerGroup(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] to [[TopKPerGroupExec]]. Injected via
  * GraftExtensions (spark.sql.extensions) or at runtime by
  * graft.operators.TopK. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(p, o, k, rank, child) =>
      TopKPerGroupExec(p, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One-pass bounded-heap top-k per group. Requires child rows clustered
  * by the group key (the planner inserts the hash exchange — the SAME
  * single shuffle the window form pays, with no sort after it). Each
  * task holds (#groups in its partition) × k rows; incoming rows that
  * cannot beat their group's current k-th are discarded without copying.
  */
case class TopKPerGroupExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val pExprs = partitionExprs
    val ord = order
    val outAttrs = output
    val rank = rankAttr
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      // codegen'd ordering over the SortOrder spec: compare(a,b) < 0 ⇔ a
      // ranks before b; the scala PriorityQueue's head is then the WORST
      // kept row — the eviction candidate
      val ordering: Ordering[InternalRow] = GenerateOrdering.generate(ord, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) h += row.copy()
            else if (ordering.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
            h += row.copy() // rows AND keys copied out of the scan's reused buffers
            heaps.put(key.copy(), h)
        }
      }
      val joined = new JoinedRow
      val rankHolder = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(outAttrs, childOutput :+ rank)
      heaps.valuesIterator.flatMap { h =>
        // dequeueAll yields worst-first; reversed = rank order 1..k
        val ranked = h.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (r, i) =>
          rankHolder.setLong(0, i + 1L)
          outProj(joined(r, rankHolder))
        }
      }
    }, preservesPartitioning = true)
  }
}
