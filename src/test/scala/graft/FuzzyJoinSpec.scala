package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** E61: deletion-neighborhood blocked edit-distance join. */
class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  /** Classic DP Levenshtein — the test oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // substitutions, insertions, deletions, transposition (= 2 subs),
  // exact dup, and far-apart strings
  private val names = Seq(
    "alpha", "alpah", "alphax", "alph", "aloha", "alpha",
    "beta", "bta", "betta", "bteta",
    "gamma", "delta", "x", "", "xy")

  private def sides(ns: Seq[String]) = {
    val l = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("a_id", "a_name")
    val r = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("b_id", "b_name")
    (l, r)
  }

  test("E61: blocked join equals the naive cross join at d=1 and d=2") {
    val (l, r) = sides(names)
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceJoin(l, "a_name", r, "b_name", d)
        .select("a_id", "b_id", "edit_dist").as[(Long, Long, Long)]
        .collect().sorted.toSeq
      val want = (for {
        (a, i) <- names.zipWithIndex
        (b, j) <- names.zipWithIndex
        dist = lev(a, b) if dist <= d
      } yield (i.toLong, j.toLong, dist.toLong)).sorted
      assert(got == want, s"d=$d")
      assert(got.size == got.distinct.size, s"d=$d: duplicate pairs emitted")
    }
  }

  test("E61: null keys match nothing; empty strings match each other") {
    val l = Seq((1L, "ab"), (2L, null)).toDF("a_id", "a_name")
    val r = Seq((10L, "ab"), (11L, null), (12L, "")).toDF("b_id", "b_name")
    val got = FuzzyJoin.editDistanceJoin(l, "a_name", r, "b_name", 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    // "ab" matches "ab" (0) and "" (2); nulls appear nowhere
    assert(got == Seq((1L, 10L), (1L, 12L)))
  }

  test("E61: over-long keys are refused loudly, not silently exploded") {
    val (l, r) = sides(Seq("a" * 80))
    val e = intercept[Exception] {
      FuzzyJoin.editDistanceJoin(l, "a_name", r, "b_name", 1, maxLen = 64)
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxLen")), s"got: $e")
  }

  test("E61: shared column names and bad maxDist are refused") {
    val (l, _) = sides(names)
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(l, "a_name", l, "a_name", 1)
    }
    val r = l.select(col("a_id").as("b_id"), col("a_name").as("b_name"))
    intercept[IllegalArgumentException] {
      FuzzyJoin.editDistanceJoin(l, "a_name", r, "b_name", 3)
    }
  }

  test("E61: plans as an equi join — no nested loop, no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val (l, r) = sides(names)
    val plan = FuzzyJoin.editDistanceJoin(l, "a_name", r, "b_name", 2)
      .queryExecution.executedPlan
    val bad = plan.collect {
      case p: BroadcastNestedLoopJoinExec => p
      case p: CartesianProductExec => p
    }
    assert(bad.isEmpty, s"fuzzy join planned a nested loop:\n$plan")
  }
}
