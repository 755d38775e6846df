package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield-Lund-Thorup, JACM 2007): a WEIGHTED sample
  * without replacement of k rows, with per-row Horvitz-Thompson weights
  * that make subset-sum estimates unbiased — "give me 10k docs whose
  * token-weighted statistics stand in for the whole corpus".
  *
  * The scheme: each row draws u ∈ (0,1] and gets priority q = w/u; the k
  * highest-priority rows are the sample; τ = the (k+1)-th priority is the
  * threshold, and every sampled row's estimator weight is ŵ = max(w, τ).
  * Heavy rows (w ≥ τ) enter deterministically with their own weight;
  * light rows enter with probability w/τ and are re-weighted to τ, so
  * E[Σ ŵ over sampled rows matching any predicate] = the true Σ w —
  * within-sample variance is provably near-optimal among k-sample
  * schemes. Unlike rate-based [[graft.text.TextOps.stratifiedSample]]
  * (fraction per stratum) or the count cap [[graft.text.TextOps.sourceCap]]
  * (uniform draw), the draw here is IMPORTANCE-weighted AND the output
  * carries the reweighting needed for unbiased downstream estimation.
  *
  * Determinism (the oracle story): u is a salted portable hash of the id —
  * u = (h+1)/2³², h ∈ [0, 2³²) — so q = w·2³²/(h+1), computed as ONE
  * IEEE-754 multiply then ONE divide on exactly-representable integer
  * inputs. Both engines run the identical two correctly-rounded ops →
  * bit-identical priorities, identical sample, identical ŵ (the E46/D10
  * portable-doubles discipline). No RNG state; re-runs and engines agree.
  *
  * Scale shape: the top-(k+1) runs on the native bounded-heap plan
  * ([[TopK.perGroup]] with no group key — map-side partial heaps, ONE
  * k-sized heap of state, never a global sort), τ is a 1-row aggregate of
  * the (k+1)-row result joined back by broadcast. A 100 TB corpus pays a
  * scan plus k+1 rows of shuffle.
  *
  * Rows with NULL or non-positive weight carry no sampling mass and are
  * excluded (w ≤ 0 can never win a draw; including them would divide by
  * zero in the estimator).
  *
  * Output: every input column + `priority` (double) + `ht_weight` (double,
  * = max(w, τ); = w when the corpus has ≤ k eligible rows, where the
  * "sample" is exhaustive and estimation is exact).
  */
object PrioritySample {

  private val Internal = Seq("__w", "__h", "__rk")

  /** @param df        input
    * @param idCol     unique row id (the hash seed and tiebreaker)
    * @param weight    sampling weight expression (tokens, bytes, cost…)
    * @param k         sample size
    * @param salt      hash-family salt: different salts give independent
    *                  samples over the same corpus */
  def sample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "pri"): DataFrame =
    sampled(df, idCol, weight, Seq.empty, k, salt)

  /** Per-GROUP priority sampling: an independent k-sample with its own
    * threshold τ_g per stratum (language, source, quality tier) — the
    * weighted, estimator-carrying sibling of
    * [[graft.text.TextOps.sourceCap]]'s uniform count cap. Same plan with
    * the group key on the heap exchange (k+1 rows of state per group, no
    * per-group sort); τ becomes one row per group, broadcast back. */
  def samplePerGroup(
      df: DataFrame,
      idCol: String,
      weight: Column,
      groups: Seq[String],
      k: Int,
      salt: String = "pri"): DataFrame = {
    require(groups.nonEmpty,
      "PrioritySample.samplePerGroup: pass group columns (use sample() for global)")
    sampled(df, idCol, weight, groups, k, salt)
  }

  private def sampled(
      df: DataFrame, idCol: String, weight: Column,
      groups: Seq[String], k: Int, salt: String): DataFrame = {
    require(k > 0, s"PrioritySample: k must be positive, got $k")
    Internal.foreach { r =>
      require(!df.columns.contains(r), s"PrioritySample: input already has a '$r' column")
    }
    require(!df.columns.contains("priority") && !df.columns.contains("ht_weight"),
      "PrioritySample: input already has a 'priority'/'ht_weight' column")
    val eligible = df
      .withColumn("__w", weight.cast("long"))
      .filter(col("__w") > 0)
      .withColumn("__h",
        graft.text.PortableHash.h32(concat(lit(s"$salt:"), col(idCol).cast("string"))))
      // q = w · 2³² / (h+1): exactly-representable inputs, one rounded
      // multiply, one rounded divide — bit-identical across engines
      .withColumn("priority",
        col("__w").cast("double") * lit(4294967296.0) / (col("__h") + 1).cast("double"))
    val topK1 = TopK.perGroup(
      eligible, groups, Seq(col("priority").desc, col(idCol).asc), k + 1, rankCol = "__rk")
    val kept =
      if (groups.isEmpty) {
        val tau = topK1.agg(
          max(when(col("__rk") === (k + 1), col("priority"))).as("__tau"))
        topK1.filter(col("__rk") <= k).crossJoin(broadcast(tau))
      } else {
        val tau = topK1.groupBy(groups.map(col): _*).agg(
          max(when(col("__rk") === (k + 1), col("priority"))).as("__tau"))
        topK1.filter(col("__rk") <= k).join(broadcast(tau), groups, "left")
      }
    kept
      .withColumn("ht_weight",
        greatest(col("__w").cast("double"), coalesce(col("__tau"), lit(0.0))))
      .drop("__tau")
      .drop(Internal: _*)
  }
}
