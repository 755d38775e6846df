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

  /** DataFrame from a (possibly custom) logical plan — `Dataset.ofRows`
    * is `private[sql]`; whole-operator extensions (graft.plans.TopKPerGroup)
    * need it to hand their node to the analyzer/planner. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Apply the optimizer's floating-point normalization (0.0 == -0.0,
    * one canonical NaN) to an expression used as a grouping/partitioning
    * key. The NormalizeFloatingNumbers rule does this automatically for
    * Aggregate/Window/Join keys but does not know custom logical nodes
    * (graft.plans.TopKPerGroup), so the node's builder normalizes its own
    * keys. No-op for non-floating types. */
  def normalizeFloatingKey(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** Idempotently add a planner strategy to the session (the runtime
    * complement of GraftExtensions.injectPlannerStrategy, for sessions
    * built without the extension). */
  def ensureStrategy(spark: SparkSession, s: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Append a 0-based global position column in the DataFrame's CURRENT
    * partition/row order, staying on InternalRows end to end.
    *
    * The public-API route (`df.rdd.zipWithIndex()` + `createDataFrame`)
    * pays the internal→external format conversion the optimization guide
    * warns about (§1.4): every UnsafeRow is decoded to a boxed external
    * Row, a Seq is rebuilt per row, and `createDataFrame` re-encodes each
    * field through per-row CatalystTypeConverters — and BOTH of
    * zipWithIndex's passes (the partition-size count job and the real
    * one) pay the decode. Here both passes iterate raw UnsafeRows; the
    * output row is one buffer copy plus a 2-field wrapper.
    *
    * zipWithIndex semantics (the per-partition size job, the offset
    * arithmetic, the resulting order) are IDENTICAL — callers must
    * already ensure the input order is deterministic (unique sort key). */
  def zipWithPosition(df: DataFrame, posCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    val schema = StructType(df.schema.fields :+
      StructField(posCol, LongType, nullable = false))
    val indexed = df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      it.map { case (row, i) =>
        // row.copy(): the scan/sort reuses its UnsafeRow buffer per
        // partition; downstream operators may buffer references
        new JoinedRow(row.copy(), new GenericInternalRow(Array[Any](i))): InternalRow
      }
    }
    cs.internalCreateDataFrame(indexed, schema)
  }

  /** Eager local checkpoint that KEEPS a hash layout: repartition by
    * `keys` into `numPartitions`, materialize, and return a DataFrame
    * whose LogicalRDD DECLARES HashPartitioning(keys, numPartitions) —
    * so every later equi-join or aggregation on `keys` plans with no
    * exchange on this side.
    *
    * Dataset.localCheckpoint is supposed to carry the physical plan's
    * partitioning into the LogicalRDD, but under AQE the adaptive root
    * reports UnknownPartitioning, so every checkpoint reads back
    * layout-less and each downstream consumer re-exchanges it (observed:
    * PageRank's per-round edge join re-shuffled the checkpointed edge
    * list every round). This helper declares the layout it just
    * produced; the declaration is sound because `repartition(n, keys)`
    * IS murmur3(keys) % n row placement, and the partition-count guard
    * below turns any future AQE interference into a loud failure instead
    * of a silently wrong co-partitioned join. */
  def localCheckpointHashPartitioned(
      df: DataFrame, keys: Seq[String], numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    val shuffled = df.repartition(numPartitions, keys.map(df.apply): _*)
    val qe = shuffled.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager, like Dataset.localCheckpoint(eager = true)
    require(rdd.getNumPartitions == numPartitions,
      s"localCheckpointHashPartitioned: expected $numPartitions partitions, " +
        s"got ${rdd.getNumPartitions} — the declared hash layout would be wrong")
    val resolver = cs.sessionState.analyzer.resolver
    val attrs = qe.analyzed.output
    val exprs = keys.map(k => attrs.find(a => resolver(a.name, k)).getOrElse(
      throw new IllegalArgumentException(
        s"localCheckpointHashPartitioned: no column '$k' in ${attrs.map(_.name)}")))
    classic.Dataset.ofRows(cs,
      LogicalRDD(attrs, rdd, HashPartitioning(exprs, numPartitions))(cs))
  }
}
