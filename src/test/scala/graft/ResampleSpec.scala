package graft

import graft.operators.Resample
import org.apache.spark.sql.functions._

/** D17: per-key grid resampling with LOCF + linear interpolation. */
class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Double)], grain: Long,
      maxTicks: Int = 100000) = {
    val df = rows.toDF("k", "t_us", "tie", "v")
      .withColumn("ts", timestamp_micros(col("t_us")))
    Resample.gridFill(df, Seq("k"), col("ts"), col("v"), col("tie"), grain, maxTicks)
      .select("k", "tick_us", "v_locf", "v_interp")
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2))
  }

  test("hand case: locf carries, interp is linear, grid clips to the span") {
    // samples at 5, 25 with values 10, 30; grain 10 → ticks 10, 20
    val out = run(Seq(("k", 5L, 1L, 10.0), ("k", 25L, 2L, 30.0)), grain = 10L)
    assert(out.map(r => (r._2, r._3)).toSeq == Seq((10L, 10.0), (20L, 10.0)))
    // interp: at t=10: 10 + 20*(5/20) = 15; at t=20: 10 + 20*(15/20) = 25
    assert(out.map(_._4).toSeq == Seq(15.0, 25.0))
  }

  test("a sample exactly on a tick short-circuits to its own value") {
    val out = run(Seq(("k", 0L, 1L, 7.0), ("k", 10L, 2L, 9.0), ("k", 20L, 3L, 11.0)),
      grain = 10L)
    assert(out.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 7.0, 7.0), (10L, 9.0, 9.0), (20L, 11.0, 11.0)))
  }

  test("sample ties on one instant resolve by the tie-break column, both directions") {
    // two samples at t=10: tie 1 → v=1, tie 2 → v=2. prev picks the LAST
    // in (t, tie) order (v=2); the interpolation partner from above picks
    // the FIRST (v=1) — both deterministic
    val out = run(Seq(("k", 0L, 9L, 0.0), ("k", 10L, 1L, 1.0), ("k", 10L, 2L, 2.0),
      ("k", 20L, 9L, 4.0)), grain = 5L)
    val at10 = out.find(_._2 == 10L).get
    assert(at10._3 == 2.0 && at10._4 == 2.0) // on-tick: nt==pt → pv
    val at5 = out.find(_._2 == 5L).get
    assert(at5._3 == 0.0) // locf from t=0
    // interp at 5: prev (0,0.0), next = min-tie sample at 10 → 1.0 → 0.5
    assert(at5._4 == 0.5)
  }

  test("keys are independent; a key spanning less than one aligned step emits nothing") {
    val out = run(Seq(
      ("a", 0L, 1L, 1.0), ("a", 100L, 2L, 2.0),
      ("b", 101L, 1L, 5.0), ("b", 103L, 2L, 6.0)), grain = 100L)
    assert(out.forall(_._1 == "a") && out.map(_._2).toSeq == Seq(0L, 100L))
  }

  test("grid totality: every tick has non-null locf and interp, bounds within samples") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map(i =>
      ("k", rnd.nextInt(100000).toLong, i.toLong, rnd.nextDouble() * 100))
    val out = run(rows, grain = 777L)
    assert(out.nonEmpty)
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    assert(out.forall(r => r._2 >= mn && r._2 <= mx && r._2 % 777L == 0))
    assert(!out.exists(r => r._3.isNaN || r._4.isNaN))
    // interp stays within the straddling values' range → global range
    val (vmin, vmax) = (rows.map(_._4).min, rows.map(_._4).max)
    assert(out.forall(r => r._4 >= vmin && r._4 <= vmax))
  }

  test("oversized per-key grid is refused loudly, not fanned out") {
    val e = intercept[Exception] {
      run(Seq(("k", 0L, 1L, 1.0), ("k", 1000000L, 2L, 2.0)), grain = 10L, maxTicks = 100)
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("Resample"))
  }

  test("plan: both windows share one exchange by key") {
    val df = Seq(("k", 0L, 1L, 1.0), ("k", 100L, 2L, 2.0)).toDF("k", "t_us", "tie", "v")
      .withColumn("ts", timestamp_micros(col("t_us")))
    val plan = Resample.gridFill(df, Seq("k"), col("ts"), col("v"), col("tie"), 10L)
      .queryExecution.executedPlan.toString
    // exchanges: one for the bounds aggregation, one hash-by-key reused by
    // both window sorts (plus AQE reads); no third hash exchange on k
    val hashByK = "hashpartitioning\\(k".r.findAllIn(plan).size
    assert(hashByK <= 3, s"expected bounded exchanges on k, got $hashByK in:\n$plan")
    assert(plan.contains("Window"))
  }
}
