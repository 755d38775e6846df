package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** D12/D13 micro-data semantics: step ordering, window cutoffs, the
  * strictly-after rule, earliest-qualifying resolution, and the
  * one-exchange plan shape. */
class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 3600L * 1000000L // µs per hour

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "us", "event_type")
      .select($"user_id", timestamp_micros($"us").as("ts"), $"event_type")

  private def run(df: org.apache.spark.sql.DataFrame, windowUs: Long = 48 * H) =
    Funnel.funnel(df, "user_id", col("ts"), "event_type",
      Seq("a", "b", "c"), windowUs)
      .as[(Long, Long, Long, Long, Long)].head()

  test("a full in-order pass converts; order violations do not") {
    val df = ev(
      (1L, 1 * H, "a"), (1L, 2 * H, "b"), (1L, 3 * H, "c"), // converts
      (2L, 1 * H, "b"), (2L, 2 * H, "a"), (2L, 3 * H, "c"), // b before a: step2 misses
      (3L, 1 * H, "a"), (3L, 2 * H, "c"), (3L, 3 * H, "b")) // c before b: step3 misses
    // user 2: a at 2H, no b after -> step1 only
    // user 3: a, b at 3H, but c was at 2H (before b) -> steps 1,2
    assert(run(df) == (3L, 2L, 1L, 6666L, 5000L))
  }

  test("the step window cuts off: outside 48h does not qualify") {
    val df = ev(
      (1L, 0L, "a"), (1L, 48 * H, "b"), (1L, 49 * H, "c"),      // b exactly at 48h: in
      (2L, 0L, "a"), (2L, 48 * H + 1, "b"), (2L, 49 * H, "c"))  // 1µs past: out
    assert(run(df) == (2L, 1L, 1L, 5000L, 10000L))
  }

  test("strictly-after: a same-timestamp next step does not qualify") {
    val df = ev((1L, H, "a"), (1L, H, "b"), (1L, 2 * H, "c"))
    assert(run(df) == (1L, 0L, 0L, 0L, 0L))
  }

  test("earliest qualifying event resolves the step time deterministically") {
    // first b at 2H starts the c-window; c at 51H is outside b@2H+48h even
    // though a later b (at 10H) would have admitted it — min-resolution
    // is what the oracle computes, pinned here
    val df = ev(
      (1L, 1 * H, "a"), (1L, 2 * H, "b"), (1L, 10 * H, "b"), (1L, 51 * H, "c"))
    assert(run(df) == (1L, 1L, 0L, 10000L, 0L))
  }

  test("cohort retention: integer week offsets from first activity") {
    val W = 7L * 86400L * 1000000L
    val df = ev(
      (1L, 1 * W + 1, "a"), (1L, 2 * W + 1, "a"), (1L, 4 * W + 1, "a"),
      (2L, 2 * W + 1, "a"), (2L, 2 * W + 2, "a"))
    val got = Funnel.cohortRetention(df, "user_id", col("ts"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 1L, 1L, 10000L), (1L, 1L, 1L, 1L, 10000L),
      (1L, 3L, 1L, 1L, 10000L), (2L, 0L, 1L, 1L, 10000L)))
  }

  test("randomized equivalence with a sequential reference") {
    val rnd = new scala.util.Random(4711)
    for (trial <- 0 until 6) {
      val w = (1 + rnd.nextInt(20)) * H
      val rows = (0 until 200).map { _ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong * H / 2,
          Seq("a", "b", "c", "x")(rnd.nextInt(4)))
      }
      // sequential reference: earliest-qualifying cascade per user
      def t(us: Seq[(Long, String)], step: String, after: Option[Long]): Option[Long] =
        after match {
          case None => us.collect { case (ts, s) if s == step => ts }.minOption
          case Some(a) => us.collect {
            case (ts, s) if s == step && ts > a && ts <= a + w => ts }.minOption
        }
      val byUser = rows.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq)
      val refTs = byUser.map { case (_, us) =>
        val t1 = t(us, "a", None)
        val t2 = t1.flatMap(x => t(us, "b", Some(x)))
        val t3 = t2.flatMap(x => t(us, "c", Some(x)))
        (t1.isDefined, t2.isDefined, t3.isDefined)
      }.toSeq
      val (e1, e2, e3) = (refTs.count(_._1).toLong, refTs.count(_._2).toLong,
        refTs.count(_._3).toLong)
      val got = run(ev(rows: _*), w)
      assert((got._1, got._2, got._3) == ((e1, e2, e3)),
        s"trial $trial w=${w / H}h got=$got expected=($e1,$e2,$e3)")
    }
  }

  test("plan: the funnel cascade costs one user exchange, no joins") {
    val p = Funnel.funnel(
      graft.util.Tables.events(spark, sf("sf0.001")),
      "user_id", col("ts"), "event_type",
      Seq("signup", "view", "purchase"), 48 * H)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), s"funnel must not join per step:\n${p.take(1200)}")
    assert("hashpartitioning\\(user_id".r.findAllIn(p).length <= 2,
      "cascade + per-user collapse must reuse the user partitioning")
  }
}
