package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.PortableHash

/** Deterministic global corpus shuffle + contiguous sharding — the
  * training-order writer: a training run wants its corpus in a
  * well-mixed, REPRODUCIBLE order (same seed → same order on any
  * cluster size), cut into N equal contiguous shards so each trainer
  * rank streams one dense file range instead of sampling all files.
  *
  * The permutation is the portable h60 of `seed:id` (engine-free, so
  * the oracle replays it exactly), ties broken by id — a total order.
  * The global 0-based rank comes from
  * [[graft.diff.DataDiff.withOrderedPosition]]: range-repartition by
  * the hash key + per-partition sort + zipWithIndex — ONE range
  * exchange, no single-partition window, the same machinery the
  * positional chunk compare trusts at 100 TB. Shard `⌊pos·n/total⌋`
  * makes shard sizes differ by at most one row, and shard boundaries
  * align with the rank order, so `write.partitionBy("shard")` lands
  * each shard as a dense contiguous range of the permutation.
  *
  * `total` is one `count()` up front — on parquet sources a
  * metadata-only job, and the price of closed-form balanced shards
  * (the alternative, `pos mod n`, balances but interleaves: every
  * trainer would read every file).
  */
object CorpusShuffle {

  /** Input rows + `pos` (0-based shuffle rank) + `shard` (0..nShards-1,
    * contiguous in rank, sizes differing by ≤ 1). */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      seed: Long,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"shuffleShards: nShards must be positive, got $nShards")
    val total = df.count()
    val keyed = df.withColumn("__sk",
      PortableHash.h60(concat(lit(s"shuffle:$seed:"), col(idCol).cast("string"))))
    val ranked = graft.diff.DataDiff.withOrderedPosition(
      keyed, Seq("__sk", idCol), "pos")
    if (total == 0) ranked.drop("__sk").withColumn("shard", lit(0L))
    else ranked
      .withColumn("shard", expr(s"pos * $nShards div $total"))
      .drop("__sk")
  }
}
