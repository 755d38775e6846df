package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Grain-bucketed point-in-interval join (SURVEY §2 D11): equality with the
  * naive cross-filter on micro data, half-open boundary exactness, the
  * exactly-once match guarantee across bucket-spanning intervals, the
  * fan-out guard, and the no-nested-loop plan pin. */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def points(ts: Long*): DataFrame =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("point_id", "p_ts")

  private def intervals(iv: (Long, Long)*): DataFrame =
    iv.zipWithIndex.map { case ((s, e), i) => (100L + i, s, e) }
      .toDF("interval_id", "s_ts", "e_ts")

  private def joined(p: DataFrame, iv: DataFrame, grain: Long): DataFrame =
    RangeJoin.pointInInterval(p, col("p_ts"), iv, col("s_ts"), col("e_ts"), grain)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("point_id", "interval_id").as[(Long, Long)].collect().toSet

  test("D11: equals the naive range predicate across grains (incl. bucket-spanning intervals)") {
    val p = points(0L, 5L, 10L, 99L, 100L, 101L, 250L, 999L)
    val iv = intervals((0L, 10L), (5L, 105L), (100L, 101L), (240L, 260L), (400L, 500L))
    val naive = pairs(p.join(iv, col("p_ts") >= col("s_ts") && col("p_ts") < col("e_ts")))
    for (grain <- Seq(1L, 7L, 10L, 64L, 1000L))
      assert(pairs(joined(p, iv, grain)) == naive, s"grain=$grain")
  }

  test("D11: half-open boundaries — start inclusive, end exclusive") {
    val out = pairs(joined(points(10L, 20L), intervals((10L, 20L)), 3L))
    assert(out == Set((0L, 100L))) // ts=10 in, ts=20 (the end) out
  }

  test("D11: a bucket-spanning interval matches a point exactly once") {
    // interval spans 5 grain buckets; the point sits mid-interval
    val out = joined(points(25L), intervals((0L, 50L)), 10L)
    assert(out.count() == 1L)
  }

  test("D11: empty and inverted intervals match nothing") {
    assert(joined(points(5L), intervals((5L, 5L), (9L, 3L)), 2L).count() == 0L)
  }

  test("D11: timestamp columns normalize to exact integer microseconds") {
    val p = points(0L).withColumn("p_ts", timestamp_micros(lit(1500000L)))
    val iv = intervals((1500000L, 1500001L), (1500001L, 1500002L))
    assert(pairs(joined(p, iv, 1000000L)) == Set((0L, 100L)))
  }

  test("D11: fan-out bomb refused loudly at execution time") {
    val e = intercept[Exception] {
      joined(points(5L), intervals((0L, 1000000L)), 1L, max = 100).count()
    }
    assert(e.getMessage.contains("grain buckets"))
  }

  private def joined(p: DataFrame, iv: DataFrame, grain: Long, max: Int): DataFrame =
    RangeJoin.pointInInterval(p, col("p_ts"), iv, col("s_ts"), col("e_ts"), grain, max)

  test("D11: shared column names refused") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        points(1L), col("p_ts"),
        intervals((0L, 2L)).withColumnRenamed("s_ts", "p_ts"),
        col("p_ts"), col("e_ts"), 10L)
    }
    assert(e.getMessage.contains("p_ts"))
  }

  test("D11: bucket assignment is exact beyond 2^53 (value-range joins on big longs)") {
    // 2^53 = 9007199254740992: doubles can no longer represent every long,
    // so a double-space quotient misrounds. Snowflake-style ids live here.
    val base = 9007199254740992L // 2^53, exactly at the cliff
    val grain = 1000L
    // points straddling a bucket boundary far above 2^53: the boundary
    // value base+1000 opens bucket k+1; base+999 closes bucket k
    val p = points(base - 1L, base, base + 999L, base + 1000L, base + 1001L,
      Long.MaxValue - 5L)
    val iv = intervals(
      (base - 500L, base + 1000L),          // ends exactly at the boundary
      (base + 1000L, base + 2000L),         // starts exactly at the boundary
      (Long.MaxValue - 10L, Long.MaxValue)) // top of the long range
    val naive = pairs(p.join(iv, col("p_ts") >= col("s_ts") && col("p_ts") < col("e_ts")))
    assert(naive.nonEmpty)
    for (g <- Seq(1L, 7L, grain))
      assert(pairs(joined(p, iv, g)) == naive, s"grain=$g")
  }

  test("D11g: suggestGrain lands on the median span and the join works at that grain") {
    // 60 short intervals (span 100) + 5 longer ones (span 1000): the
    // sweet spot is the typical span, not the mean dragged up by the tail
    val iv = intervals(
      ((0 until 60).map(i => (i * 1000L, i * 1000L + 100L)) ++
        (0 until 5).map(i => (100000L + i * 2000L, 101000L + i * 2000L))): _*)
    val g = RangeJoin.suggestGrain(iv, col("s_ts"), col("e_ts"))
    assert(g.grainUs == 100L, g)
    assert(g.p50SpanUs == 100L && g.maxSpanUs == 1000L)
    assert(g.warning.isEmpty, g)
    // the suggestion actually serves the join: equality with naive
    val p = points(50L, 150L, 100500L, 7030L)
    val naive = pairs(p.join(iv, col("p_ts") >= col("s_ts") && col("p_ts") < col("e_ts")))
    assert(pairs(joined(p, iv, g.grainUs)) == naive)
  }

  test("D11g: warns when a pathological interval would trip the replication guard") {
    // median span 10 → grain 10; one interval spanning 10_000_000 would
    // replicate into ~1e6 buckets, far past the guard
    val iv = intervals(
      ((0 until 20).map(i => (i * 100L, i * 100L + 10L)) :+ (0L, 10000000L)): _*)
    val g = RangeJoin.suggestGrain(iv, col("s_ts"), col("e_ts"))
    assert(g.maxReplicas > 4096L)
    assert(g.warning.exists(_.contains("refuse")), g)
  }

  test("D11g: warns on heavy span skew (p99 >= 100x median)") {
    // 90 spans of 10, 10 spans of 100000: p99 lands in the long tail
    val iv = intervals(
      ((0 until 90).map(i => (i * 1000L, i * 1000L + 10L)) ++
        (0 until 10).map(i => (1000000L + i * 200000L, 1100000L + i * 200000L))): _*)
    val g = RangeJoin.suggestGrain(iv, col("s_ts"), col("e_ts"), maxBucketsPerInterval = 100000)
    assert(g.warning.exists(_.contains("skew")), g)
  }

  test("D11g: no valid intervals is loud") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.suggestGrain(intervals((5L, 5L), (9L, 3L)), col("s_ts"), col("e_ts"))
    }
    assert(e.getMessage.contains("no valid"))
  }

  private def intervalsB(iv: (Long, Long)*): DataFrame =
    iv.zipWithIndex.map { case ((s, e), i) => (500L + i, s, e) }
      .toDF("b_id", "b_s", "b_e")

  private def overlapped(a: DataFrame, b: DataFrame, grain: Long,
      max: Int = 4096): DataFrame =
    RangeJoin.intervalOverlap(
      a, col("s_ts"), col("e_ts"), b, col("b_s"), col("b_e"), grain, max)

  private def opairs(df: DataFrame): Set[(Long, Long)] =
    df.select("interval_id", "b_id").as[(Long, Long)].collect().toSet

  test("D11o: equals the naive overlap predicate across grains, each pair exactly once") {
    val a = intervals((0L, 10L), (5L, 105L), (100L, 101L), (240L, 260L), (400L, 500L))
    val b = intervalsB((0L, 1L), (9L, 12L), (50L, 300L), (100L, 101L), (500L, 600L))
    val naive = a.join(b, col("s_ts") < col("b_e") && col("b_s") < col("e_ts"))
      .select("interval_id", "b_id").as[(Long, Long)].collect()
    assert(naive.length == naive.toSet.size)
    for (grain <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = overlapped(a, b, grain).select("interval_id", "b_id")
        .as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"grain=$grain emitted duplicates")
      assert(got.toSet == naive.toSet, s"grain=$grain")
    }
  }

  test("D11o: randomized fuzz — equals the naive overlap join at random grains") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val a = intervals((1 to 60).map { _ =>
        val s = rnd.nextInt(2000).toLong; (s, s + 1 + rnd.nextInt(300)) }: _*)
      val b = intervalsB((1 to 60).map { _ =>
        val s = rnd.nextInt(2000).toLong; (s, s + 1 + rnd.nextInt(300)) }: _*)
      val naive = a.join(b, col("s_ts") < col("b_e") && col("b_s") < col("e_ts"))
        .select("interval_id", "b_id").as[(Long, Long)].collect().toSet
      for (grain <- Seq(1L + rnd.nextInt(7), 37L, 512L)) {
        val got = overlapped(a, b, grain).select("interval_id", "b_id")
          .as[(Long, Long)].collect()
        assert(got.length == got.toSet.size, s"trial $trial grain=$grain dups")
        assert(got.toSet == naive, s"trial $trial grain=$grain")
      }
    }
  }

  test("D11o: half-open semantics — touching intervals do not overlap") {
    // a ends exactly where b starts: [0,10) vs [10,20) share no instant
    assert(overlapped(intervals((0L, 10L)), intervalsB((10L, 20L)), 3L).count() == 0L)
    // one-instant overlap: [0,11) vs [10,20)
    assert(opairs(overlapped(intervals((0L, 11L)), intervalsB((10L, 20L)), 3L)) ==
      Set((100L, 500L)))
  }

  test("D11o: a long overlap region spanning many buckets still emits once") {
    // overlap region [100, 1000) covers 90 ten-unit buckets
    val out = overlapped(intervals((0L, 1000L)), intervalsB((100L, 2000L)), 10L)
    assert(out.count() == 1L)
  }

  test("D11o: empty/inverted intervals on either side match nothing") {
    assert(overlapped(intervals((5L, 5L)), intervalsB((0L, 100L)), 2L).count() == 0L)
    assert(overlapped(intervals((0L, 100L)), intervalsB((9L, 3L)), 2L).count() == 0L)
  }

  test("D11o: fan-out guard fires per side") {
    val e = intercept[Exception] {
      overlapped(intervals((0L, 5L)), intervalsB((0L, 1000000L)), 1L, max = 100).count()
    }
    assert(e.getMessage.contains("grain buckets"))
  }

  test("D11o: plan is an equi join on the bucket — no nested loop, no cartesian") {
    val plan = overlapped(intervals((0L, 100L)), intervalsB((50L, 70L)), 10L)
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("D11c: coalesce merges overlapping AND touching intervals, keeps gaps, per key") {
    val iv = Seq(
      ("u1", 0L, 10L), ("u1", 10L, 20L), ("u1", 25L, 30L), // touch-merge, then gap
      ("u1", 5L, 8L),                                       // contained
      ("u2", 0L, 100L), ("u2", 10L, 20L), ("u2", 90L, 150L), // chain through containment
      ("u2", 7L, 3L), ("u2", 4L, 4L))                        // inverted/empty dropped
      .toDF("k", "s", "e")
    val got = graft.operators.RangeJoin
      .coalesceIntervals(iv, Seq("k"), col("s"), col("e"))
      .select($"k", $"start_us", $"end_us", $"n_merged")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("u1", 0L, 20L, 3L), ("u1", 25L, 30L, 1L),
      ("u2", 0L, 150L, 3L)))
  }

  test("D11c: random intervals — runs are disjoint, separated, and cover exactly the union") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val data = (1 to 80).map { _ =>
        val s = rnd.nextInt(500).toLong
        (s"k${rnd.nextInt(3)}", s, s + 1 + rnd.nextInt(40))
      }
      val got = graft.operators.RangeJoin
        .coalesceIntervals(data.toDF("k", "s", "e"), Seq("k"), col("s"), col("e"))
        .select($"k", $"start_us", $"end_us", $"n_merged")
        .as[(String, Long, Long, Long)].collect()
      // counts conserve the input
      assert(got.map(_._4).sum == data.size, s"trial $trial")
      got.groupBy(_._1).foreach { case (k, runs) =>
        val sorted = runs.sortBy(_._2)
        // strictly separated (not even touching — else they'd have merged)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 < b._2, s"trial $trial $k: $a, $b")
          case _ =>
        }
        // exact union: covered points of the runs == covered points of inputs
        val covered = sorted.flatMap(r => r._2 until r._3).toSet
        val expect = data.filter(_._1 == k).flatMap(d => d._2 until d._3).toSet
        assert(covered == expect, s"trial $trial $k")
      }
    }
  }

  test("D11: plan is an equi join on the bucket — no nested loop, no cartesian") {
    val plan = joined(points(1L, 2L), intervals((0L, 100L)), 10L)
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
