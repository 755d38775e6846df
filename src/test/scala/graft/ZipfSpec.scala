package graft

import graft.text.Zipf
import org.apache.spark.sql.functions._

/** E65: Zipf-exponent fit per corpus slice. */
class ZipfSpec extends SparkSpecBase {
  import spark.implicits._

  // a corpus where word w_r appears exactly n(r) times, one group
  private def corpus(g: String, freqs: Seq[Int]) = {
    val words = freqs.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(f"w$i%03d")
    }
    Seq((g, words.mkString(" ")))
  }

  private def run(rows: Seq[(String, String)], topN: Int = 256) =
    Zipf.fit(rows.toDF("source", "text"), Seq("source"), col("text"), topN)
      .select("source", "n_terms", "zipf_e4", "r2_bp")
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("an exact power law fits with exponent ~1 and near-perfect r2") {
    // f(r) = 7200/r for r = 1..24 — exactly Zipf with s = 1
    val freqs = (1 to 24).map(r => 7200 / r)
    val out = run(corpus("pow", freqs))
    val (n, zipf, r2) = out("pow")
    assert(n == 24L)
    // integer flooring of ln and of 7200/r wobbles the fit slightly
    assert(zipf.exists(z => z > 9500L && z < 10500L), s"zipf=$zipf")
    assert(r2.exists(_ > 9900L), s"r2=$r2")
  }

  test("a flat (templated) distribution fits near exponent 0") {
    val out = run(corpus("flat", Seq.fill(20)(50)))
    val (_, zipf, _) = out("flat")
    // all counts equal → y constant → slope 0 exactly (num = 0)
    assert(zipf == Some(0L))
  }

  test("property: matches a BigInt/Math.log brute force; groups independent") {
    val rnd = new scala.util.Random(6565)
    val gs = Seq("g0", "g1").map(g => g -> Seq.fill(30)(1 + rnd.nextInt(400)))
    val out = run(gs.flatMap { case (g, f) => corpus(g, f) }, topN = 20)
    gs.foreach { case (g, freqs) =>
      // mirror: counts ranked desc with token-asc ties, top 20
      val ranked = freqs.zipWithIndex
        .map { case (n, i) => (f"w$i%03d", n) }
        .sortBy { case (tok, n) => (-n, tok) }.take(20)
      val pts = ranked.zipWithIndex.map { case ((_, n), i) =>
        (BigInt(math.floor(math.log((i + 1).toDouble) * 10000.0).toLong),
          BigInt(math.floor(math.log(n.toDouble) * 10000.0).toLong))
      }
      val m = BigInt(pts.size)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val num = m * pts.map(p => p._1 * p._2).sum - sx * sy
      val dx = m * pts.map(p => p._1 * p._1).sum - sx * sx
      val dy = m * pts.map(p => p._2 * p._2).sum - sy * sy
      val zipf = if (dx > 0) Some((-num.sign * ((BigInt(10000) * num.abs) / dx)).toLong) else None
      val r2 = if (dx > 0 && dy > 0)
        Some(math.floor(num.toDouble * num.toDouble * 10000.0 / (dx.toDouble * dy.toDouble)).toLong)
      else None
      assert(out(g) == ((pts.size.toLong, zipf, r2)), s"group $g")
    }
  }

  test("degenerate inputs are refused or null out cleanly") {
    val e = intercept[IllegalArgumentException](
      Zipf.fit(Seq(("g", "a b")).toDF("source", "text"), Seq("source"), col("text"), 2))
    assert(e.getMessage.contains("topN"))
    // a single distinct term: dx = 0 → nulls, not division blowups
    val out = run(Seq(("one", "a a a a")))
    assert(out("one") == ((1L, None, None)))
  }
}
