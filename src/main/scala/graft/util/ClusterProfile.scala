package graft.util

/** The documented CLUSTER configuration profile for this library — what
  * a deployment on a real multi-executor cluster should set, as code so
  * tests can run the gates under it (AqeSpec) instead of asserting it
  * in prose.
  *
  * Local test/bench sessions pin `spark.sql.shuffle.partitions` to the
  * core count because a single-JVM local run has no AQE stats worth
  * re-planning around and tiny fixed partitioning keeps plans readable.
  * On a cluster the profile inverts that: set partitions HIGH (2-3× the
  * total cores — the map-side width ceiling) and let AQE's coalescing
  * shrink post-shuffle reads to `advisoryPartitionSizeInBytes`; enable
  * skew-join splitting so a hot key (the A0k gate's shape) splits into
  * advisory-sized chunks instead of stalling one task.
  *
  * Every graft operator is AQE-safe by construction and TESTED under
  * forced re-optimization (AqeSpec): plan-level pins (native folds, no
  * SortAggregate, bucketed exchange-free serves, DPP index reads)
  * survive because they are properties of the COMPILED plan AQE starts
  * from, not of the runtime read layout it may wrap in AQEShuffleRead
  * nodes; where a runtime broadcast conversion would be harmful the
  * operator already pins `hint("merge")` (Winnow.sourceOverlap,
  * LangModel.jsDivergence — an AQE broadcast of a corpus-mass side
  * measured an OOM at the sf10 decade leg).
  */
object ClusterProfile {

  /** Recommended session conf for a cluster with `totalCores` executor
    * cores. Pair with `spark.sql.files.maxPartitionBytes=256m` (scan
    * split size) at the source when inputs are few huge files. */
  def recommended(totalCores: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> (totalCores * 3).toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128m",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
    "spark.sql.session.timeZone" -> "UTC")

  /** The same profile with thresholds squeezed so AQE re-optimization,
    * partition coalescing AND skew-join splitting all actually fire on
    * kilobyte-scale test fixtures — what AqeSpec drives the gates
    * through. Not for production: advisory sizes this small shred real
    * shuffles into confetti. */
  def aggressiveForTests: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4k",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8k",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
}
