package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LM training-data prep: stream documents in a
  * deterministic order (by `idCol`) and cut the concatenated token
  * stream into `budget`-token sequences — the standard concat-then-chunk
  * pretraining layout. Each document reports the global offset of its
  * first token and the sequence (bin) that token lands in.
  *
  * Scale design: the global running sum is computed WITHOUT a
  * single-partition window and WITHOUT a sampled range shuffle. Order
  * buckets derive deterministically from the ordering key's value range
  * (one tiny min/max aggregate), per-bucket cumulative sums run as
  * parallel windows, and the #buckets per-bucket totals broadcast back
  * as offsets. Determinism matters because the bucketed plan is consumed
  * twice — a sampled RangePartitioner can re-sample different boundaries
  * per consumption and silently corrupt the offsets (see
  * DataDiff.withOrderedPosition for the same trap). Value-range buckets
  * assume `idCol` is roughly uniform over its range (true for dense ids;
  * a skewed id distribution degrades parallelism, not correctness).
  */
object Packing {

  /** Output: all input columns + `start_tok` (global 0-based offset of
    * the doc's first token) and `seq_id` (= start_tok / budget).
    * `idCol` must be unique: tied ordering keys would make the running
    * sum's per-row split ambiguous. */
  def packSequences(
      df: DataFrame, idCol: String, nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$idCol must be numeric for value-range bucketing, got ${df.schema(idCol).dataType}")
    val mm = df.agg(
      min(col(idCol)).cast("double").as("lo"),
      max(col(idCol)).cast("double").as("hi"),
      count(lit(1)).as("rows"),
      count(col(idCol)).as("nonNullIds")).head()
    require(mm.getLong(2) == mm.getLong(3),
      s"$idCol contains NULLs — ordering is undefined; filter or assign ids first")
    if (mm.getLong(2) == 0L) // empty input: keep the output contract, zero rows
      return df.withColumn("start_tok", lit(0L)).withColumn("seq_id", lit(0L))
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val span = math.max(hi - lo, 1e-9)
    val bucket = least(lit(parts - 1),
      floor((col(idCol).cast("double") - lit(lo)) / lit(span) * parts)).cast("int")
    val local = df.withColumn("__b", bucket)
      .withColumn("__csum",
        sum(col(nTokensCol)).over(Window.partitionBy("__b").orderBy(col(idCol))))
    // exclusive prefix over the ≤`parts` bucket totals via a triangular
    // self-join (B² ≤ parts² rows): no partition-less window anywhere in
    // the library, even on config-bounded inputs
    val btot = local.groupBy("__b").agg(max("__csum").as("__btot"))
    val offsets = btot.as("a")
      .join(broadcast(btot.as("b")), col("b.__b") < col("a.__b"), "left")
      .groupBy(col("a.__b").as("__b"))
      .agg(coalesce(sum(col("b.__btot")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__b")
      .withColumn("start_tok", col("__off") + col("__csum") - col(nTokensCol))
      .withColumn("seq_id", floor(col("start_tok") / budget.toDouble).cast("long"))
      .drop("__b", "__csum", "__off")
  }
}
