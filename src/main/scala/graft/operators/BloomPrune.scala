package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned semi-join: filter the BIG probe side with a bloom built
  * over the build side's keys BEFORE the probe's shuffle, then close
  * with the exact semi-join. The bloom admits false positives only, and
  * the exact join removes them — so the result is bit-identical to
  * `probe ⋉ build` while the probe exchange carries candidate rows only.
  *
  * When it pays at 100 TB: the build side is too big to broadcast as
  * rows (say 10⁸ keys ≈ GBs of rows), but its KEY SET fits a bloom at a
  * few bits per key (10⁸ keys @ 2% fpp ≈ 100 MB — still too big; @ 10⁷
  * ≈ 10 MB — fine). With a 1% probe hit rate, the probe exchange
  * shrinks ~100×: the shuffle that dominated the join becomes a rounding
  * error, for the price of one extra scan of the build side (cheap — it
  * was going to be scanned anyway) and a map-side filter that stays in
  * whole-stage codegen. This is exactly Spark's own runtime bloom filter
  * (InjectRuntimeFilter), made explicit, composable, and usable where
  * the optimizer's heuristics decline to inject it.
  *
  * Shuffle shape: the bloom aggregation is a TypedImperativeAggregate
  * with map-side partials — each task reduces its rows to ONE bloom
  * buffer, so the build scan's exchange carries one blob per task, never
  * the key set. The blob returns to the driver as a single scalar (the
  * one bounded driver artifact, like `head()` on a 1-row aggregate) and
  * re-enters the probe plan as a binary literal; `might_contain` is
  * codegen'd, so the pruning filter rides the probe scan's
  * WholeStageCodegen stage before its exchange.
  *
  * Both sides hash through `xxhash64(key)` on the key's NATIVE type —
  * no per-row cast on the 100 TB probe path — so `semiJoin` requires
  * the two key types to match exactly (xxhash64 of int ≠ xxhash64 of
  * long for equal values; a silent mismatch would prune everything).
  * Null keys hash to the seed and pass the bloom; the closing exact
  * join drops them (semi-join nulls never match) — same null semantics
  * as the plain semi-join.
  *
  * Reference analogue: the validate path's chunk gating
  * (cdc_operator_payload.rs:247-293) applies the same principle — a
  * cheap superset screen bounds what the expensive exact pass reads.
  */
object BloomPrune {

  /** Hard ceiling on the filter size (256 Mbit = 32 MB). The aggregation
    * allocates one bloom buffer PER MAP TASK, so an unbounded size is an
    * executor OOM, not a big driver object — the same hazard Spark's own
    * runtime filter caps via `runtime.bloomFilter.maxNumBits`. Refused
    * loudly rather than clamped: a silent clamp would degrade the
    * requested fpp invisibly. */
  val MaxNumBits: Long = 1L << 28

  /** Build a serialized bloom over `xxhash64(key)` of the build side.
    * `expectedItems` sizes the filter (overshoot is safe: fpp only
    * improves); `fpp` is the target false-positive rate at that size.
    *
    * The engine applies its own SILENT clamps: BloomFilterAggregate
    * mins the requested items/bits against the session confs
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4,000,000) and `...maxNumBits` (default 2²⁶) — a request above
    * either would build a smaller filter whose real fpp degrades
    * invisibly. This module's contract is to refuse loudly instead,
    * so both conf caps are enforced here as hard requirements; raise
    * the session confs to build genuinely bigger filters. */
  def buildBloom(
      build: DataFrame, buildKey: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    def confLong(key: String, fallback: Long): Long =
      scala.util.Try(build.sparkSession.conf.get(key).toLong).getOrElse(fallback)
    val engineMaxItems =
      confLong("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", 4000000L)
    val engineMaxBits =
      confLong("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", 1L << 26)
    require(expectedItems <= engineMaxItems,
      s"expectedItems=$expectedItems exceeds the engine cap " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumItems=$engineMaxItems — " +
        "BloomFilterAggregate would clamp it SILENTLY and degrade the " +
        "requested fpp; raise the conf or lower the request")
    // tiny expectedItems × lax fpp can optimize to 0 bits — an invalid
    // (and useless) filter; one word is the smallest honest bloom
    val numBits = math.max(64L, BloomFilter.optimalNumOfBits(expectedItems, fpp))
    val bitCap = math.min(MaxNumBits, engineMaxBits)
    require(numBits <= bitCap,
      s"bloom of $expectedItems items @ fpp=$fpp needs $numBits bits > " +
        s"cap $bitCap (module cap $MaxNumBits — one buffer PER MAP TASK, this " +
        s"size risks executor OOM; engine cap " +
        s"spark.sql.optimizer.runtime.bloomFilter.maxNumBits=$engineMaxBits, " +
        "beyond which the engine clamps silently); raise fpp, raise the " +
        "conf, or prune the build side first")
    val hashed = XxHash64(Seq(GraftBridge.expression(col(buildKey))), 42L)
    val agg = new BloomFilterAggregate(
      hashed, Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.select(GraftBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** The pruning filter alone: probe rows whose key MIGHT be in the
    * bloom (superset of the true semi-join — compose with an exact
    * join to close). Stays in the probe scan's codegen stage. */
  def mightContain(probe: DataFrame, probeKey: String, bloom: Array[Byte]): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(GraftBridge.expression(col(probeKey))), 42L)))

  /** Exact semi-join `probe ⋉ build` with the probe side bloom-pruned
    * before its exchange. The build leg dedupes to distinct keys first —
    * its partial aggregate dedupes map-side, and the distinct's exchange
    * doubles as the join's build exchange (same key partitioning). */
  def semiJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long = 4000000L, fpp: Double = 0.02): DataFrame = {
    requireSameKeyType(probe, probeKey, build, buildKey)
    val bloom = buildBloom(build, buildKey, expectedItems, fpp)
    probe.where(mightContain(probe, probeKey, bloom))
      .join(distinctKeys(build, buildKey), col(probeKey) === col("__bp_key"), "left_semi")
  }

  /** Exact anti-join `probe ▷ build` with the bloom splitting the probe
    * map-side: rows that FAIL the screen are guaranteed non-matches (a
    * bloom has no false negatives) and flow straight to the output
    * without touching the join — only the bloom-passing candidates pay
    * the exchange + exact anti-join that removes false positives. Two
    * map-only passes over the probe replace one full-probe shuffle; at a
    * low hit rate the join leg is ~hit-rate-sized. Null probe keys pass
    * the screen (xxhash64 of null = seed) and reach the exact leg, which
    * keeps them — null never equals a build key — matching the plain
    * anti-join's null semantics. */
  def antiJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long = 4000000L, fpp: Double = 0.02): DataFrame = {
    requireSameKeyType(probe, probeKey, build, buildKey)
    val bloom = buildBloom(build, buildKey, expectedItems, fpp)
    val screen = mightContain(probe, probeKey, bloom)
    probe.where(!screen).unionByName(
      probe.where(screen)
        .join(distinctKeys(build, buildKey), col(probeKey) === col("__bp_key"), "left_anti"))
  }

  private def requireSameKeyType(
      probe: DataFrame, probeKey: String, build: DataFrame, buildKey: String): Unit = {
    val pt = probe.schema(probeKey).dataType
    val bt = build.schema(buildKey).dataType
    require(pt == bt,
      s"bloom join key types must match exactly ($probeKey: $pt vs $buildKey: $bt) — " +
        "xxhash64 is type-sensitive; cast one side explicitly first")
  }

  private def distinctKeys(build: DataFrame, buildKey: String): DataFrame =
    build.select(col(buildKey).as("__bp_key"))
      .where(col("__bp_key").isNotNull).distinct()
}
