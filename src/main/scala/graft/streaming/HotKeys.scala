package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming hot-key / hot-token monitor: a sharded Misra-Gries summary
  * maintained continuously with `mapGroupsWithState` — the streaming twin
  * of the batch `graft.functions.MisraGries` aggregate, carrying the same
  * N/(k+1) superset guarantee over an encodable `Map[String, Long]`
  * state. (Twin in guarantee, not in summary: this unweighted fold uses
  * classic drop-the-newcomer sweeps, the batch aggregate the weighted
  * insert-then-bound variant — beyond the guarantee their candidate sets
  * may differ, so don't diff stream state against a batch sketch.)
  *
  * Sharding makes it scale: items are routed to `shards` state groups by
  * portable hash, so state work parallelizes across executors while each
  * item's ENTIRE count still lands in exactly one shard. The per-shard MG
  * guarantee — every item with count > n_shard/(k+1) survives — therefore
  * implies the global one: n_shard ≤ N, so any item above N/(k+1)
  * globally is above its own shard's floor and is present in that shard's
  * summary. Union of the latest per-shard summaries = a candidate
  * superset of the stream's heavy hitters at any threshold ≥ N/(k+1),
  * exactly like the batch sketch; re-count candidates exactly (batch, on
  * the landed data) when a deterministic answer is needed.
  *
  * Use it to watch ingest skew live: hottest join keys, boilerplate
  * tokens, runaway sources — the signal that decides salting
  * ([[graft.operators.SkewJoin]]) or quarantine before a nightly batch
  * job would discover the problem.
  */
object HotKeysStream {

  /** An item routed to its state shard. */
  case class Keyed(shard: Int, item: String)

  /** A shard's current summary: items seen routed here (`n`), and the MG
    * counters (≤ k entries; counts are under-estimates by ≤ n/(k+1)). */
  case class ShardHot(shard: Int, n: Long, counters: Map[String, Long])

  /** Route a column's values to `shards` state groups by portable hash
    * (deterministic across runs and engines, so a shard's identity is
    * stable under restart and reprocessing). Nulls are dropped — the
    * batch aggregate ignores them too. */
  def asSharded(df: DataFrame, itemCol: String, shards: Int): Dataset[Keyed] = {
    require(shards >= 1, "need at least one shard")
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(itemCol).isNotNull)
      .select(
        // hash the same string rendering that becomes the item: h32 only
        // accepts strings, and routing must follow the item's identity
        pmod(graft.text.PortableHash.h32(col(itemCol).cast("string")), lit(shards.toLong))
          .cast("int").as("shard"),
        col(itemCol).cast("string").as("item"))
      .as[Keyed]
  }

  /** The classic (unweighted) MG update fold, mutably per microbatch
    * invocation (one to-mutable/to-immutable conversion per shard per
    * batch, not per element): present → +1; room → insert 1; full miss →
    * decrement-all sweep, newcomer discarded. */
  private def fold(
      init: Map[String, Long], items: Iterator[String], k: Int): (Map[String, Long], Long) = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    m ++= init
    var added = 0L
    items.foreach { it =>
      added += 1L
      m.get(it) match {
        case Some(c) => m.update(it, c + 1L)
        case None if m.size < k => m.update(it, 1L)
        case None =>
          val dead = m.iterator.collect { case (s, 1L) => s }.toList
          m.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(m.remove)
      }
    }
    (m.toMap, added)
  }

  /** Continuously maintained per-shard summaries. Emits each updated
    * shard's CURRENT summary every microbatch (Update output mode); the
    * live answer is the LATEST row per shard — `latestPerShard` collapses
    * a memory/landed sink accordingly. State is ≤ k counters per shard,
    * forever — no TTL needed, the sketch's size is its eviction policy. */
  def hotKeys(items: Dataset[Keyed], k: Int): Dataset[ShardHot] = {
    require(k >= 1, "need at least one counter")
    val spark = items.sparkSession
    import spark.implicits._
    items
      .groupByKey(_.shard)
      .mapGroupsWithState[ShardHot, ShardHot](GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[Keyed], state: GroupState[ShardHot]) =>
          val prev = state.getOption.getOrElse(ShardHot(shard, 0L, Map.empty))
          val (counters, added) = fold(prev.counters, rows.map(_.item), k)
          val now = ShardHot(shard, prev.n + added, counters)
          state.update(now)
          now
      }
  }

  /** Collapse an Update-mode sink of [[ShardHot]] rows to the latest
    * summary per shard and union the candidate items — the stream's
    * current heavy-hitter candidate set (superset of every item above
    * N/(k+1); counts are MG under-estimates, re-count for exactness). */
  def latestPerShard(sink: DataFrame): DataFrame =
    sink.groupBy(col("shard"))
      .agg(max_by(struct(col("n"), col("counters")), col("n")).as("w"))
      .select(col("shard"), col("w.n").as("n"),
        // OUTER: a shard whose counters emptied (all-distinct traffic
        // sweeping every counter away) still reports its n, item = null
        explode_outer(col("w.counters")).as(Seq("item", "mg_count")))
}
