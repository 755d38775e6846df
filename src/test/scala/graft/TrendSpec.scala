package graft

import graft.operators.Trend
import org.apache.spark.sql.functions._

/** D18: per-group exact OLS trend. */
class TrendSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Double)], offsetS: Long = 0L) =
    Trend.perGroup(rows.toDF("g", "x_us", "v"), Seq("g"), col("x_us"), col("v"), offsetS)
      .select("g", "n", "slope_milli_per_day", "r2_bp")
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("perfect line: exact slope, r2 = 10000 bp; sign handled on the way down") {
    // y rises 2.0 per day: x in days (µs), y = 2·day → slope 2000 milli/day
    val day = 86400L * 1000000L
    val up = (0 to 4).map(i => ("up", i * day, 2.0 * i))
    val dn = (0 to 4).map(i => ("dn", i * day, -1.5 * i))
    val out = run(up ++ dn)
    assert(out("up") == ((5L, Some(2000L), Some(10000L))))
    assert(out("dn") == ((5L, Some(-1500L), Some(10000L))))
  }

  test("degenerate groups: constant y → slope 0 with null r2; single point → nulls") {
    val day = 86400L * 1000000L
    val out = run(Seq(
      ("flat", 0L, 7.0), ("flat", day, 7.0), ("flat", 2 * day, 7.0),
      ("one", day, 3.0)))
    assert(out("flat") == ((3L, Some(0L), None))) // dy = 0
    assert(out("one") == ((1L, None, None))) // dx = 0
  }

  test("property: matches BigInt brute force on random data (offset applied)") {
    val rnd = new scala.util.Random(1818)
    val rows = Seq.fill(200)((s"g${rnd.nextInt(3)}",
      1500000000000000L + rnd.nextInt(1 << 30).toLong * 1000L,
      rnd.nextDouble() * 200 - 100))
    val offset = 1500000000L
    val out = run(rows, offset)
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val xs = rs.map(r => BigInt(r._2 / 1000000L - offset))
      val ys = rs.map(r => BigInt(math.floor(r._3 * 1000).toLong))
      val n = BigInt(rs.size)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val num = n * sxy - sx * sy
      val dx = n * xs.map(x => x * x).sum - sx * sx
      val dy = n * ys.map(y => y * y).sum - sy * sy
      val slope = if (dx > 0) Some((num.sign * ((BigInt(86400) * num.abs) / dx)).toLong) else None
      val r2 = if (dx > 0 && dy > 0)
        Some(math.floor(num.toDouble * num.toDouble * 10000.0 / (dx.toDouble * dy.toDouble)).toLong)
      else None
      assert(out(g) == ((rs.size.toLong, slope, r2)), s"group $g")
    }
  }

  test("plan: one aggregation, no window, no join") {
    val plan = Trend.perGroup(Seq(("g", 1L, 1.0)).toDF("g", "x_us", "v"),
      Seq("g"), col("x_us"), col("v"), 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.toLowerCase.contains("join"),
      s"expected a single aggregation, got:\n$plan")
  }
}
