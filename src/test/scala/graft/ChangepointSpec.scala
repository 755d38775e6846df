package graft

import graft.operators.Changepoint
import org.apache.spark.sql.functions._

/** D20: strongest volume changepoint per group. */
class ChangepointSpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 3600L * 1000000L

  private def run(rows: Seq[(String, Long)]) =
    Changepoint.strongestShift(rows.toDF("g", "t_us"), Seq("g"), col("t_us"))
      .select("g", "split_bucket", "score", "mean_before_milli",
        "mean_after_milli", "n_buckets")
      .as[(String, Long, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("a planted level shift is located exactly, means exact in milli") {
    // 5 hours at 2 events, then 5 hours at 10 events → split after hour 4
    val rows = (0 until 5).flatMap(h => Seq.fill(2)(("a", h * H + 7L))) ++
      (5 until 10).flatMap(h => Seq.fill(10)(("a", h * H + 7L)))
    val out = run(rows)
    val (_, split, score, mb, ma, n) = out("a")
    assert(split == 4L && n == 10L)
    assert(mb == 2000L && ma == 10000L)
    // A = k·S − N·S_k = 5·60 − 10·10 = 200; T = 200²·10⁶/(5·5)
    assert(score == 200.0 * 200.0 * 1000000.0 / 25.0)
  }

  test("flat volume scores zero; ties break to the earliest hour") {
    val rows = (0 until 6).flatMap(h => Seq.fill(3)(("flat", h * H)))
    val out = run(rows)
    val (_, split, score, mb, ma, _) = out("flat")
    // every split has A=0 → all scores 0 → earliest interior split wins
    assert(score == 0.0 && split == 0L && mb == 3000L && ma == 3000L)
  }

  test("single-bucket groups are absent; groups are independent") {
    val rows = Seq(("one", 5 * H)) ++
      (0 until 4).flatMap(h => Seq.fill(h + 1)(("ramp", h * H)))
    val out = run(rows)
    assert(!out.contains("one"))
    assert(out.contains("ramp"))
  }

  test("property: matches brute force over random volumes") {
    val rnd = new scala.util.Random(2020)
    val rows = for {
      g <- Seq("g0", "g1"); h <- 0 until 12
      _ <- 0 until (1 + rnd.nextInt(20))
    } yield (g, h * H + rnd.nextInt(1000).toLong)
    val out = run(rows)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val byH = rs.groupBy(_._2 / H).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = byH.size.toLong
      val s = byH.map(_._2).sum
      val best = byH.zipWithIndex.dropRight(1).map { case ((h, _), i) =>
        val k = i + 1L
        val sk = byH.take(i + 1).map(_._2).sum
        val a = BigInt(k * s - n * sk)
        val t = (a * a * 1000000) / (BigInt(k) * (n - k))
        (t, -h, k, sk, h)
      }.max
      val (t, _, k, sk, h) = best
      val want = (g, h, t.toDouble, sk * 1000 / k, (s - sk) * 1000 / (n - k), n)
      assert(out(g) == want, s"group $g")
    }
  }

  test("plan: rollup then tiny-frame window then one argmax — no join") {
    val plan = Changepoint.strongestShift(
      Seq(("g", 0L), ("g", H)).toDF("g", "t_us"), Seq("g"), col("t_us"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"got:\n$plan")
  }
}
