package graft

import graft.operators.Cooccur
import org.apache.spark.sql.functions._

/** D19: basket co-occurrence / association rules. */
class CooccurSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], maxBasket: Int = 4096) =
    Cooccur.pairs(rows.toDF("id", "it"), "id", "it", maxBasket)
      .select("item_a", "item_b", "pair_n", "n_a", "n_b",
        "support_bp", "conf_ab_bp", "conf_ba_bp", "lift_bp")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap

  test("hand case: counts, confidences, and lift are exact bp") {
    // 4 users: {a,b}, {a,b}, {a}, {b,c} → N=4, n_a=3, n_b=3, n_c=1
    val rows = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b",
      3L -> "a", 4L -> "b", 4L -> "c",
      1L -> "a") // duplicate event: baskets dedup
    val out = run(rows)
    val ab = out(("a", "b"))
    // pair_n=2, support 2/4=5000, conf both 2/3=6666, lift 2·4/(3·3)=8888
    assert(ab == (("a", "b", 2L, 3L, 3L, 5000L, 6666L, 6666L, 8888L)))
    val bc = out(("b", "c"))
    // pair_n=1, support 2500, conf b→c 3333, c→b 10000, lift 4/(3·1)=13333
    assert(bc == (("b", "c", 1L, 3L, 1L, 2500L, 3333L, 10000L, 13333L)))
    assert(!out.contains(("a", "c")) && !out.contains(("c", "a")))
    assert(out.size == 2)
  }

  test("pairs are unordered and canonical: (a,b) only, never (b,a)") {
    val out = run(Seq(1L -> "z", 1L -> "a"))
    assert(out.keySet == Set(("a", "z")))
  }

  test("property: matches brute force on random baskets") {
    val rnd = new scala.util.Random(1919)
    val rows = Seq.fill(300)((rnd.nextInt(40).toLong, s"i${rnd.nextInt(8)}"))
    val out = run(rows)
    val baskets = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val itemN = rows.distinct.groupBy(_._2).view.mapValues(_.map(_._1).toSet.size.toLong).toMap
    val pairN = baskets.values.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.keySet == pairN.keySet)
    pairN.foreach { case ((a, b), pn) =>
      val (na, nb) = (itemN(a), itemN(b))
      val want = (a, b, pn, na, nb, pn * 10000 / n, pn * 10000 / na,
        pn * 10000 / nb, pn * n * 10000 / (na * nb))
      assert(out((a, b)) == want, s"pair ($a,$b)")
    }
  }

  test("oversized basket raises loudly instead of detonating") {
    val rows = (0 until 10).map(i => (1L, s"i$i"))
    val e = intercept[Exception](run(rows, maxBasket = 4))
    assert(e.getMessage.contains("maxBasket"))
  }

  test("plan: no self-join of the basket table — pair generation is local") {
    val df = Cooccur.pairs(Seq((1L, "a"), (1L, "b")).toDF("id", "it"), "id", "it")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"got:\n$plan")
    // the one keyless join is the 1-row N scalar broadcast (the E55
    // vocab pattern) — anything more would be a basket-basket join
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1, s"got:\n$plan")
    // pair explosion is a generate over the basket array, not a join
    assert(plan.contains("Generate"), s"expected local pair explosion:\n$plan")
  }
}
