package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.PortableHash

/** KMV set-overlap profile of two key columns — the join-planning
  * pre-check: estimate each side's distinct keys, their union,
  * intersection and Jaccard BEFORE paying the join's shuffle (a join
  * whose estimated hit rate is ~0 is a bug or a filter opportunity; one
  * near 100% may broadcast). The bottom-k distinct-hash synopses
  * (Beyer et al., SIGMOD 2007) make every estimate a pure integer
  * function of deterministic portable hashes, so — like the KMV
  * distinct sketch it extends — the whole profile is oracle-checkable
  * bit-for-bit against an independent engine.
  *
  * Shuffle shape at scale: each side reduces to its bottom-k DISTINCT
  * hashes via the KMV synopsis aggregate (graft.functions.KmvBottomK) —
  * partial buffers keep ≤ k longs, so each side's exchange carries ≤ k
  * longs per map task (a global-top-k operator here would ship the FULL
  * distinct hash set to one reducer); the cross-side math runs on ≤ 2k
  * rows. Nothing joins the key spaces themselves.
  *
  * Correctness of the combined synopsis: the k smallest hashes of A∪B
  * are each among their own side's k smallest, so merging the two
  * side synopses and keeping the k smallest reconstructs the union's
  * bottom-k exactly; membership flags preserved through the merge give
  * K∩ = |{h ∈ U_k : h ∈ A ∧ h ∈ B}|, and Jaccard ≈ K∩/|U_k| (uniform
  * hashes make U_k a uniform sample of A∪B).
  *
  * Output (one row, all long): est_a, est_b, est_union, est_intersect,
  * jaccard_bp. Sides with fewer than k distinct keys are EXACT; null
  * keys are ignored on both sides.
  */
object KeyOverlap {

  def profile(
      a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      k: Int): DataFrame = {
    require(k >= 2, "KMV overlap needs k >= 2")

    def bottomK(df: DataFrame, key: String): DataFrame =
      df.select(PortableHash.h32(col(key).cast("string")).as("h"))
        .agg(PortableHash.kmvBottomK(col("h"), k).as("hs"))
        .select(explode(col("hs")).as("h"))
        // the synopsis feeds BOTH its side's stats and the merged union —
        // pin the ≤ k rows so the scan+aggregate plan runs once
        .localCheckpoint()

    val ak = bottomK(a, aKey)
    val bk = bottomK(b, bKey)
    val sideA = ak.agg(count(lit(1)).as("n_a"), coalesce(max("h"), lit(0L)).as("tau_a"))
    val sideB = bk.agg(count(lit(1)).as("n_b"), coalesce(max("h"), lit(0L)).as("tau_b"))
    val merged = ak.select(col("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionByName(bk.select(col("h"), lit(0L).as("in_a"), lit(1L).as("in_b")))
      .groupBy("h").agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    // ≤ 2k merged rows; orderBy+limit plans as TakeOrderedAndProject
    val uStats = merged.orderBy(col("h").asc).limit(k)
      .agg(count(lit(1)).as("n_u"), coalesce(max("h"), lit(0L)).as("tau_u"),
        coalesce(sum(col("in_a") * col("in_b")), lit(0L)).as("k_common"))

    // (k−1)·2³² / τ, exact below k — same estimator as KmvDistinct.eval
    def est(n: String, tau: String): String =
      s"CASE WHEN $n < $k OR $tau <= 0 THEN $n ELSE ${(k - 1).toLong}L * 4294967296L div $tau END"

    sideA.crossJoin(sideB).crossJoin(uStats)
      .selectExpr(
        s"${est("n_a", "tau_a")} AS est_a",
        s"${est("n_b", "tau_b")} AS est_b",
        s"${est("n_u", "tau_u")} AS est_union",
        "k_common", "n_u")
      .selectExpr(
        "est_a", "est_b", "est_union",
        // |A∩B| ≈ J · |A∪B|; K∩/n_u over the union sample IS J
        "CASE WHEN n_u = 0 THEN 0L ELSE k_common * est_union div n_u END AS est_intersect",
        "CASE WHEN n_u = 0 THEN 0L ELSE k_common * 10000L div n_u END AS jaccard_bp")
  }
}
