package graft

import graft.operators.TopK
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Native top-k-per-group operator (graft.plans.TopKPerGroup): the
  * custom LogicalPlan/Strategy/SparkPlan tier. Must reproduce the window
  * formulation exactly while planning with no WindowExec and no sort. */
class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("D3n: native top-k equals the window formulation on real data") {
    val orders = graft.util.Tables.orders(spark, sf("sf0.001"))
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaWindow = orders
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter($"rk" <= 3)
      .collect().map(_.toSeq).toSet
    val native = TopK.perGroup(orders, Seq("o_custkey"),
      Seq($"o_totalprice".desc, $"o_orderkey".asc), k = 3)
    assert(native.collect().map(_.toSeq).toSet == viaWindow)
    assert(native.columns.toSeq ==
      Seq("o_custkey", "o_orderkey", "o_totalprice", "rk"))
  }

  test("D3n: plan has the native exec, one exchange, no window, no sort") {
    val orders = graft.util.Tables.orders(spark, sf("sf0.001"))
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val native = TopK.perGroup(orders, Seq("o_custkey"),
      Seq($"o_totalprice".desc), k = 2)
    val p = native.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), "native top-k must not plan a window")
    assert(!p.contains("Sort"), "native top-k must not sort anything")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly the hash shuffle, got $exchanges\n$p")
  }

  test("D3n: groups smaller than k, ties, and rank determinism") {
    val d = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 1.0),
      (2L, 20L, 9.0)).toDF("g", "id", "score")
    val r = TopK.perGroup(d, Seq("g"), Seq($"score".desc, $"id".asc), k = 3)
      .select($"g", $"id", $"rk").as[(Long, Long, Long)].collect().toSet
    // ties broken by id asc, exactly like row_number; group 2 yields its
    // single row at rank 1
    assert(r == Set((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (2L, 20L, 1L)))
  }

  test("D3n: empty groupBy = global top-k") {
    val d = (1L to 100L).map(i => (i, (i * 37) % 101)).toDF("id", "score")
    val r = TopK.perGroup(d, Seq.empty, Seq($"score".desc, $"id".asc), k = 2)
      .select($"id", $"score", $"rk").as[(Long, Long, Long)].collect().toSet
    val expected = (1L to 100L).map(i => (i, (i * 37) % 101))
      .sortBy { case (id, s) => (-s, id) }.take(2).zipWithIndex
      .map { case ((id, s), i) => (id, s, i + 1L) }.toSet
    assert(r == expected)
  }

  test("D3n: float group keys normalize (0.0 == -0.0, one NaN group) like window keys") {
    // the optimizer's NormalizeFloatingNumbers rule does not visit custom
    // nodes; TopK.perGroup normalizes its own keys — 0.0 and -0.0 must be
    // ONE group (and hash to one partition), NaN one group
    val d = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L), (Double.NaN, 4L), (1.0, 5L))
      .toDF("g", "id")
    val native = TopK.perGroup(d, Seq("g"), Seq($"id".asc), k = 10)
      .select($"id", $"rk").as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"id".asc)
    val viaWindow = d.withColumn("rk", row_number().over(w).cast("bigint"))
      .select($"id", $"rk").as[(Long, Long)].collect().toSet
    assert(native == viaWindow)
    // -0.0 joined 0.0's group, so id=2 ranks second there
    assert(native.contains((2L, 2L)))
  }

  test("D3n: input validation — empty orderBy and rank-column collision refused") {
    val d = Seq((1L, 2L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      TopK.perGroup(d, Seq("g"), Seq.empty, k = 1)
    }
    intercept[IllegalArgumentException] {
      TopK.perGroup(d, Seq("g"), Seq($"v".desc), k = 1, rankCol = "V") // resolver-aware
    }
  }

  test("D3n: sort-fallback under a tiny heap budget produces identical output") {
    // a pathological partition (many distinct groups) must degrade to the
    // spillable sort instead of OOMing the heap map; output is identical
    val prev = spark.conf.getOption("spark.graft.topk.maxHeapBytes")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.graft.topk.maxHeapBytes", "4096") // force mid-stream fallback
    // AQE hides the exec inside query-stage wrappers; turn it off so the
    // metrics assertion can reach the node
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = (1L to 20000L).map(i => (i % 4000, i, (i * 37) % 101)).toDF("g", "id", "score")
      val native = TopK.perGroup(d, Seq("g"), Seq($"score".desc, $"id".asc), k = 3)
      val rows = native.collect().map(_.toSeq).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"score".desc, $"id".asc)
      val viaWindow = d.withColumn("rk", row_number().over(w).cast("bigint"))
        .filter($"rk" <= 3).collect().map(_.toSeq).toSet
      assert(rows == viaWindow)
      // the fallback actually fired, and the operator is observable: at
      // least one task reported sort-fallback in the SQLMetrics
      val execs = native.queryExecution.executedPlan.collect {
        case t: graft.plans.TopKPerGroupExec => t
      }
      assert(execs.nonEmpty, "TopKPerGroupExec not found in executed plan")
      assert(execs.head.metrics("sortFallbackTasks").value > 0,
        "expected the sort fallback to trigger under the 4 KiB budget")
      assert(execs.head.metrics("numOutputRows").value == rows.size)
      // per-task peak metrics: each task reports its own peak once, names
      // say so (the driver-side aggregate is a SUM of task peaks; the true
      // max lives in the size-metric stats) — no cross-task max() cosplay
      assert(execs.head.metrics("peakHeapBytes").name.contains("task peak heap state"))
      assert(execs.head.metrics("peakHeapBytes").value > 0,
        "tasks held heap state before falling back, peak must be reported")
      assert(execs.head.metrics("sortPeakMemory").name
        .contains("task fallback sort peak memory"))
      assert(execs.head.metrics("sortPeakMemory").value > 0,
        "the fallback sorter ran, its task peak memory must be reported")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxHeapBytes", v)
        case None => spark.conf.unset("spark.graft.topk.maxHeapBytes")
      }
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("D10s: sampled quantiles are deterministic, bounded, and near the exact answer") {
    import graft.operators.SampledQuantiles
    val ev = graft.util.Tables.events(spark, sf("sf0.001"))
    val est = SampledQuantiles.perGroup(
      ev, "event_type", "event_id", "value", 256, Seq(0.5 -> "p50_bp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // deterministic: a second evaluation is bit-identical (hash sample,
    // no RNG state)
    val again = SampledQuantiles.perGroup(
      ev, "event_type", "event_id", "value", 256, Seq(0.5 -> "p50_bp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est == again)
    // sample bounded by k; estimate within sampling tolerance of exact
    val exact = ev.groupBy($"event_type")
      .agg(floor(expr("percentile(value, 0.5)") * 10000.0).cast("long").as("p"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    est.foreach { case (g, (p50, sampleN)) =>
      assert(sampleN <= 256)
      val (exactP, n) = exact(g)
      if (n <= 256) assert(p50 == exactP, s"group $g fits the sample: must be exact")
      else {
        // value is in [0,1]-ish basis points; 1/sqrt(256) ~ 6% of range
        assert(math.abs(p50 - exactP) <= 2000,
          s"group $g estimate $p50 too far from exact $exactP")
      }
    }
  }

  test("D3n: works through spark.sql extensions registration too") {
    // the SparkSpecBase session registers GraftExtensions: the strategy
    // is present even before TopK.perGroup's defensive ensureStrategy
    val strategies = spark.sessionState.planner.extraPlanningStrategies ++
      spark.sessionState.experimentalMethods.extraStrategies
    assert(strategies.contains(graft.plans.GraftStrategies))
  }
}
