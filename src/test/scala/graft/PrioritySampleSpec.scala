package graft

import graft.operators.PrioritySample
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Priority sampling (SURVEY §2 E47): the sample IS the top-k by the
  * deterministic priority, the Horvitz-Thompson weight is max(w, τ) with
  * τ the (k+1)-th priority, heavy rows enter with their own weight,
  * degenerate inputs behave, and the plan is the native bounded heap. */
class PrioritySampleSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows(ws: Seq[Long]): DataFrame =
    ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")

  test("E47: sample = top-k by priority; ht_weight = max(w, (k+1)-th priority)") {
    val df = rows((1L to 40L).map(i => i * 7 % 13 + 1))
    // exhaustive run exposes every row's priority (τ is null there)
    val all = PrioritySample.sample(df, "id", col("w"), k = 1000)
      .select($"id", $"w", $"priority", $"ht_weight")
      .as[(Long, Long, Double, Double)].collect()
    assert(all.length == 40)
    assert(all.forall { case (_, w, _, ht) => ht == w.toDouble }) // exhaustive ⇒ ŵ = w
    val ranked = all.sortBy { case (id, _, q, _) => (-q, id) }
    val k = 10
    val tau = ranked(k)._3
    val expected = ranked.take(k).map { case (id, w, q, _) =>
      (id, q, math.max(w.toDouble, tau)) }.toSet
    val got = PrioritySample.sample(df, "id", col("w"), k)
      .select($"id", $"priority", $"ht_weight")
      .as[(Long, Double, Double)].collect().toSet
    assert(got == expected)
  }

  test("E47: a heavy row enters deterministically with its own weight") {
    val df = rows(Seq.fill(30)(1L) :+ (1L << 40))
    val got = PrioritySample.sample(df, "id", col("w"), k = 3)
      .select($"id", $"w", $"ht_weight").as[(Long, Long, Double)].collect()
    val heavy = got.filter(_._2 == (1L << 40))
    assert(heavy.length == 1) // w·2³²/(h+1) ≥ w > any light priority
    assert(heavy.head._3 == (1L << 40).toDouble) // w ≥ τ ⇒ ŵ = w, no reweighting
    // light survivors are reweighted UP to τ (τ > 1 with 30 light rows)
    assert(got.filter(_._2 == 1L).forall(_._3 > 1.0))
  }

  test("E47: null / zero / negative weights carry no mass") {
    val df = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-4L)), (4L, None))
      .toDF("id", "w")
    val got = PrioritySample.sample(df, "id", col("w"), k = 10)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("E47: deterministic per salt; independent samples across salts") {
    val df = rows(Seq.fill(200)(1L))
    def ids(salt: String) =
      PrioritySample.sample(df, "id", col("w"), k = 5, salt = salt)
        .select($"id").as[Long].collect().toSet
    assert(ids("a") == ids("a"))
    assert(ids("a") != ids("b"))
  }

  test("E47g: per-group sampling — independent k and τ per stratum") {
    // stratum a: 30 rows; stratum b: 2 rows (under k → exhaustive, ŵ = w)
    val df = ((1L to 30L).map(i => (i, 5L, "a")) ++ Seq((100L, 7L, "b"), (101L, 9L, "b")))
      .toDF("id", "w", "g")
    val got = PrioritySample.samplePerGroup(df, "id", col("w"), Seq("g"), k = 4)
      .select($"g", $"id", $"w", $"ht_weight")
      .as[(String, Long, Long, Double)].collect()
    assert(got.count(_._1 == "a") == 4)
    assert(got.count(_._1 == "b") == 2)
    // exhausted stratum carries no reweighting; cut stratum reweights up
    assert(got.filter(_._1 == "b").forall(r => r._4 == r._3.toDouble))
    assert(got.filter(_._1 == "a").forall(_._4 > 5.0))
    // per-group τ equals the group's own (k+1)-th priority: check via the
    // exhaustive run of stratum a alone
    val aOnly = PrioritySample.sample(
      df.filter($"g" === "a"), "id", col("w"), k = 1000)
      .select($"id", $"priority").as[(Long, Double)].collect()
      .sortBy { case (id, q) => (-q, id) }
    val tauA = aOnly(4)._2
    assert(got.filter(_._1 == "a").forall(_._4 == math.max(5.0, tauA)))
  }

  test("E47: Horvitz-Thompson estimator is unbiased — Σŵ averages to Σw across salts") {
    // the whole point of carrying ht_weight: Σ over sampled rows of ŵ
    // estimates the corpus total Σw without bias. 64 independent samples
    // (distinct salts = distinct hash draws) of k=10 from 40 rows; the
    // MEAN of the estimates must land near the true total while single
    // draws scatter. Deterministic: fixed salt list, fixed data.
    val df = rows((1L to 40L))
    val trueTotal = (1L to 40L).sum.toDouble
    val estimates = (1 to 64).map { i =>
      PrioritySample.sample(df, "id", col("w"), k = 10, salt = s"unbias-$i")
        .agg(sum($"ht_weight")).as[Double].head()
    }
    val mean = estimates.sum / estimates.size
    assert(math.abs(mean - trueTotal) / trueTotal < 0.10,
      s"mean estimate $mean vs true $trueTotal (estimates: ${estimates.take(8)}...)")
    // and the spread is real (the estimator is not degenerate)
    assert(estimates.distinct.size > 10)
  }

  test("E47: runs on the native bounded-heap plan, no window, no global sort") {
    val p = PrioritySample.sample(rows((1L to 50L)), "id", col("w"), k = 5)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("TopKPerGroup") && !p.contains("Window"),
      s"PrioritySample must run on the native top-k plan:\n$p")
  }
}
