package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, SortPrefix, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SortPrefixUtils, SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.StructType

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
  *
  * Memory safety: the heap state is byte-tracked (UnsafeRow sizes + a
  * per-entry overhead constant). A task whose state exceeds
  * `spark.graft.topk.maxHeapBytes` (default 64 MiB) abandons the heap
  * strategy mid-stream and degrades to the spillable sort it was built
  * to avoid: held rows + remaining input go through an
  * [[UnsafeExternalRowSorter]] (task-memory-managed, spills to disk —
  * the same machinery as SortExec/WindowExec) sorted by
  * (group key, order), then a streaming rank pass emits the first k per
  * group. Identical output, graceful degradation for pathological
  * group-cardinality partitions instead of an executor OOM.
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

  // formatted explain shows what the operator keeps and in which order,
  // like Window/SortAggregate do for their specs
  override def verboseStringWithOperatorId(): String = {
    val groups =
      if (partitionExprs.isEmpty) "(global)" else partitionExprs.mkString(", ")
    s"""$formattedNodeName
       |Group keys: $groups
       |Order: ${order.mkString(", ")}
       |k: $k, rank column: ${rankAttr.name}
       |""".stripMargin
  }

  // size metrics aggregate per-task values as "total (min, med, max)" in
  // the SQL UI — each task reports its own peak ONCE (SortExec's "peak
  // memory" convention), so the true cross-task peak is the displayed
  // `max` stat; the names say "task peak" because the headline total is a
  // SUM of per-task peaks, not a peak
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"),
    "peakHeapBytes" -> SQLMetrics.createSizeMetric(sparkContext, "task peak heap state"),
    "sortFallbackTasks" -> SQLMetrics.createMetric(sparkContext, "sort-fallback tasks"),
    "sortPeakMemory" -> SQLMetrics.createSizeMetric(sparkContext, "task fallback sort peak memory"))

  /** Conservative JVM overhead per live heap entry beyond the row bytes
    * (HashMap node + boxed key + PriorityQueue slot). */
  private val perEntryOverhead = 64L

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val pExprs = partitionExprs
    val ord = order
    val outAttrs = output
    val rank = rankAttr
    val maxHeapBytes =
      conf.getConfString("spark.graft.topk.maxHeapBytes", (64L * 1024 * 1024).toString).toLong
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    val peakHeapBytes = longMetric("peakHeapBytes")
    val sortFallbackTasks = longMetric("sortFallbackTasks")
    val sortPeakMemory = longMetric("sortPeakMemory")
    val overhead = perEntryOverhead
    val childSchema = StructType(childOutput.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable, a.metadata)))

    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // codegen'd ordering over the SortOrder spec: compare(a,b) < 0 ⇔ a
      // ranks before b; the scala PriorityQueue's head is then the WORST
      // kept row — the eviction candidate
      val ordering: Ordering[InternalRow] = GenerateOrdering.generate(ord, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      var heldBytes = 0L
      var heldPeak = 0L // running high-water mark: evictions can SHRINK heldBytes
      var fellBack = false
      while (!fellBack && iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        def unsafeCopy(r: InternalRow): UnsafeRow = r match {
          case u: UnsafeRow => u.copy()
          case other => toUnsafe(other).copy()
        }
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) {
              val kept = unsafeCopy(row)
              heldBytes += kept.getSizeInBytes + overhead
              h += kept
            } else if (ordering.compare(row, h.head) < 0) {
              val evicted = h.dequeue()
              val kept = unsafeCopy(row)
              heldBytes += kept.getSizeInBytes - evicted.getSizeInBytes
              h += kept
            }
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](
              ordering.on[UnsafeRow](identity))
            val kept = unsafeCopy(row) // rows AND keys copied out of the scan's reused buffers
            val keyCopy = key.copy()
            heldBytes += kept.getSizeInBytes + keyCopy.getSizeInBytes + 2 * overhead
            h += kept
            heaps.put(keyCopy, h)
        }
        if (heldBytes > heldPeak) heldPeak = heldBytes
        if (heldBytes > maxHeapBytes) fellBack = true
      }
      // task-local copy starts at the init value; one set() = this task's
      // peak. A max() against .value here would be a no-op dressed as
      // cross-task semantics — the driver MERGES task values by adding.
      peakHeapBytes.set(heldPeak)

      val joined = new JoinedRow
      val rankHolder = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(outAttrs, childOutput :+ rank)

      if (!fellBack) {
        numGroups += heaps.size
        heaps.valuesIterator.flatMap { h =>
          // dequeueAll yields worst-first; reversed = rank order 1..k
          val ranked = h.dequeueAll.reverse
          ranked.iterator.zipWithIndex.map { case (r, i) =>
            rankHolder.setLong(0, i + 1L)
            numOutputRows += 1
            outProj(joined(r, rankHolder))
          }
        }
      } else {
        // ---- spillable sort fallback ----
        // Held rows are still exact candidates (discarded rows were beaten
        // by k better rows of their group and can never rank ≤ k), so the
        // union of heap contents + remaining input sorted by
        // (group, order) and rank-scanned gives the identical answer.
        sortFallbackTasks += 1
        val groupSort = pExprs.map(e => SortOrder(e, Ascending))
        val fullSort = groupSort ++ ord
        val sortOrdering: Ordering[InternalRow] =
          GenerateOrdering.generate(fullSort, childOutput)
        val boundFirst = BindReferences.bindReference(fullSort.head, childOutput)
        val prefixComparator = SortPrefixUtils.getPrefixComparator(boundFirst)
        val prefixExpr = SortPrefix(boundFirst)
        val prefixProjection = UnsafeProjection.create(Seq(prefixExpr))
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            val prefix = prefixProjection.apply(row)
            result.isNull = prefix.isNullAt(0)
            result.value = if (result.isNull) prefixExpr.nullValue else prefix.getLong(0)
            result
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          childSchema, sortOrdering, prefixComparator, prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, false)
        heaps.valuesIterator.foreach(_.foreach(sorter.insertRow))
        heaps.clear()
        while (iter.hasNext) {
          val row = iter.next()
          sorter.insertRow(row match {
            case u: UnsafeRow => u
            case other => toUnsafe(other)
          })
        }
        val sorted = sorter.sort()
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          sortPeakMemory.set(sorter.getPeakMemoryUsage) // this task's peak; stats show max
        })
        // streaming rank pass: group transition = binary change of the
        // (normalized) key projection; sorted order within a group IS rank
        // order. After float normalization, ordering-equality of the group
        // prefix coincides with binary key equality for atomic key types,
        // so binary-equal keys are contiguous — the same grouping the heap
        // path uses.
        var currentKey: UnsafeRow = null
        var currentRank = 0L
        sorted.flatMap { row =>
          val key = keyProj(row)
          if (currentKey == null || key != currentKey) {
            currentKey = key.copy()
            currentRank = 1L
            numGroups += 1
          } else currentRank += 1
          if (currentRank <= kLocal) {
            rankHolder.setLong(0, currentRank)
            numOutputRows += 1
            Some(outProj(joined(row, rankHolder)))
          } else None
        }
      }
    }, preservesPartitioning = true)
  }
}
