package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Integer fixed-point PageRank over an undirected pair graph.
  *
  * Completes the graph-analytics family next to
  * `Dedup.connectedComponents`: components say WHICH docs cluster,
  * PageRank says which doc is most CENTRAL inside the near-dup graph —
  * an alternative keeper signal to quality-argmax canonicalization
  * (a hub that many variants point at is usually the original).
  *
  * All arithmetic is integer fixed-point so the result is bit-exact
  * across engines (the oracle unrolls the same iterations in SQL):
  *  - total rank mass ≈ `scaleFp`, split evenly at init
  *    (r₀ = scaleFp div n — NORMALIZED, so intermediate sums are bounded
  *    by scaleFp regardless of graph size: 85·scaleFp never overflows a
  *    long, where an unnormalized per-node init would at billions of
  *    nodes);
  *  - iteration: r'(v) = base + 85·Σ_{u∼v}(r(u) div deg(u)) div 100,
  *    base = 15·(scaleFp div n) div 100 — every division integral, every
  *    operand positive, so Spark's truncating `div` and DuckDB's flooring
  *    `//` agree.
  *
  * Scale shape: the edge list is materialized once (`localCheckpoint` —
  * upstream pair generation is the expensive part and must not re-run
  * 2×iters times) and each iteration is one join keyed on the edge
  * source + one map-side-combinable aggregate keyed on the destination —
  * the classic Pregel step as two exchanges over edge-count rows. Rank
  * state is node-sized and checkpointed per round (lineage never grows).
  *
  * Early convergence detection (the `ivfTrain` Lloyd pattern): the
  * iteration map F is a deterministic function of the rank vector, so
  * once r' = F(r) equals r exactly (integer fixed-point — equality is
  * bit-equality, no epsilon), every remaining round reproduces r and
  * stopping is PROVABLY equal to running them out — which is why the
  * fixed-round unrolled oracle stays exact. The changed-row signal
  * rides the round's OWN materialization: the previous rank joins into
  * the next-rank plan (node-sized, co-keyed, the join output carries
  * both r' and the previous r as `__old`), `localCheckpoint`
  * materializes that joined frame, and the disagreement test is a
  * `filter(r =!= __old).isEmpty` scan of the round's own checkpointed
  * (node-sized, in-memory) rows — no plan re-runs, and no external-Row
  * decode hop (an accumulator-feeding mapPartitions would deserialize
  * every node row AND erase the join's partitioning, forcing a
  * rank-side exchange back in each round). On regular graphs (every
  * near-dup clique, for one) the fixed point arrives in 2-3 rounds and
  * the remaining edge joins are skipped.
  *
  * Precondition: `edges` holds each undirected pair once (a < b), as the
  * dedup pair generators emit them.
  */
object PageRank {

  def pageRank(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int = 10,
      scaleFp: Long = 1000000000000L): DataFrame =
    pageRankCounted(edges, aCol, bCol, iters, scaleFp)._1

  /** [[pageRank]] plus the number of Pregel rounds actually executed —
    * lets tests pin that the fixed-point early stop fired (rounds <
    * iters) while the result stays bit-equal to the full run. */
  private[graft] def pageRankCounted(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int,
      scaleFp: Long): (DataFrame, Int) = {
    val spark = edges.sparkSession
    // Pregel partitioning (guide §2.4 — remove shuffles outright): the
    // edge list is hash-partitioned by `src` ONCE and localCheckpoint
    // preserves that layout in the LogicalRDD, so each round's edge join
    // reuses it. `deg` aggregates on the same key (no exchange) and the
    // round's rank-side join output is hash(src)-partitioned too — the
    // only per-round edge-mass exchange left is the groupBy(dst), the
    // one Pregel fundamentally requires. (The old shape re-exchanged the
    // edge list on EVERY round: iters × edge-mass shuffles.)
    val parts = spark.sessionState.conf.numShufflePartitions
    // localCheckpointHashPartitioned, NOT plain localCheckpoint: under
    // AQE a Dataset checkpoint reads back as UnknownPartitioning, so the
    // "partition once, join every round exchange-free" design silently
    // degraded to one edge-mass exchange PER ROUND (r15 pin caught it);
    // the bridge helper declares the hash(src) layout it materializes
    val und = org.apache.spark.sql.GraftBridge.localCheckpointHashPartitioned(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst"))),
      Seq("src"), parts)
    // deg inherits und's layout; declaring it keeps the per-round rd join
    // exchange-free on the deg side too (node-sized, one-time cost)
    val deg = org.apache.spark.sql.GraftBridge.localCheckpointHashPartitioned(
      und.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src"), parts)
    val n = deg.count()
    if (n == 0) return (emptyResult(spark), 0)
    val perNode = scaleFp / n
    val base = 15L * perNode / 100L
    var r = deg.select(col("src").as("id"), lit(perNode).as("r"))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val rd = r.withColumnRenamed("id", "src").join(deg, Seq("src"))
        .select(col("src"), expr("r div deg").as("c"))
      val s = und.join(rd, Seq("src")).groupBy("dst").agg(sum(col("c")).as("sm"))
      val next0 = s.select(col("dst").as("id"), (lit(base) + expr("85 * sm div 100")).as("r"))
      // inner join is lossless ONLY because `und` holds both directions
      // (undirected precondition): every node re-appears as a dst each
      // round, so next0's node set equals r's. On a directed edge list
      // this would silently drop sink nodes from the rank state.
      // The convergence signal reads the round's OWN materialization:
      // __old rides the checkpointed (node-sized, in-memory) rows and the
      // disagreement test is a scan of that cache — no plan re-runs, no
      // external-Row decode hop (the old accumulator-feeding mapPartitions
      // deserialized every node row AND erased the join's partitioning,
      // forcing a rank-side exchange back in each round).
      val joined = next0.join(r.select(col("id"), col("r").as("__old")), "id")
        .localCheckpoint()
      converged = joined.filter(col("r") =!= col("__old")).isEmpty
      r = joined.select("id", "r")
      it += 1
    }
    (r.withColumnRenamed("id", "src").join(deg, Seq("src"))
      .select(col("src").as("doc_id"), col("deg"), col("r").as("pr_fp")), it)
  }

  private def emptyResult(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("deg", LongType),
        StructField("pr_fp", LongType))))
}
