package graft.operators

import graft.text.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group quantile ESTIMATION over a bounded deterministic sample —
  * the 100 TB companion to the exact sort-based `percentile` (SURVEY §2
  * D10): exact quantiles must see every value, so their cost is
  * corpus-sized no matter the engine; at scale the standard answer is a
  * sketch. This one is a KMV-style bottom-k hash sample: the k rows per
  * group with the SMALLEST portable hash of their row id form a uniform
  * sample that is
  *
  *  - deterministic and ENGINE-REPRODUCIBLE (the oracle derives the
  *    identical sample — the estimate is checked bit-for-bit, unlike any
  *    RNG reservoir), and
  *  - mergeable: the bottom-k of a union is the bottom-k of the merged
  *    bottom-k's, which is exactly the native bounded-heap top-k
  *    operator's partial state — one shuffle, O(n log k) comparisons,
  *    k rows per group of state, discarded rows never copied.
  *
  * Estimate error is the usual sampling 1/√k; `sample_n` is emitted so
  * consumers can see when a group was small enough to be exact
  * (sample_n < k ⇒ the sample IS the group). */
object SampledQuantiles {

  /** @param df       input
    * @param groupCol group key
    * @param idCol    row identity (hashed for sample selection — any
    *                 stable unique id; ties on the 32-bit hash broken by
    *                 the id itself so selection is total)
    * @param valueCol numeric column whose quantiles are estimated
    * @param k        sample size per group
    * @param quantiles (q, output column name) pairs; emitted as
    *                 floor(percentile·10000) basis points (engine-exact) */
  def perGroup(
      df: DataFrame, groupCol: String, idCol: String, valueCol: String,
      k: Int, quantiles: Seq[(Double, String)]): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    require(quantiles.nonEmpty, "need at least one quantile")
    val hashed = df.select(
      col(groupCol), col(idCol), col(valueCol),
      PortableHash.h32(col(idCol).cast("string")).as("__h"))
    val sampled = TopK.perGroup(
      hashed, Seq(groupCol), Seq(col("__h").asc, col(idCol).asc), k, rankCol = "__rk")
    def pbp(q: Double, name: String): Column =
      floor(expr(s"percentile(`$valueCol`, $q)") * 10000.0).cast("long").as(name)
    sampled.groupBy(col(groupCol)).agg(
      pbp(quantiles.head._1, quantiles.head._2),
      quantiles.tail.map { case (q, n) => pbp(q, n) } :+
        count(lit(1)).as("sample_n"): _*)
  }
}
