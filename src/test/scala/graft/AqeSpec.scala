package graft

import org.apache.spark.sql.functions._

/** AQE re-optimization gates (the cluster profile, util.ClusterProfile):
  * the skew gate stays green and bit-identical with skew-join splitting
  * ACTIVELY firing, splitting demonstrably engages in this session
  * shape, and the plan-level pins (native folds, no SortAggregate,
  * custom strategies) survive the adaptive re-plan. */
class AqeSpec extends SparkSpecBase {

  /** A sibling session (shared SparkContext, own SQLConf) running the
    * squeezed-thresholds profile so AQE mechanisms fire on kB fixtures. */
  private lazy val aqe = {
    val s = spark.newSession()
    graft.util.ClusterProfile.aggressiveForTests.foreach { case (k, v) =>
      s.conf.set(k, v)
    }
    s
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE reaches its final plan
    df.queryExecution.executedPlan.toString
  }

  test("A0k: skew validate gates are green and bit-identical under forced skew-join splitting") {
    for (q <- Seq("cdc_validate_skew", "cdc_validate_hash_skew")) {
      val base = SparkEntry.queries(q)(spark, sf("sf0.01"))
        .collect().map(_.toString).sorted.toSeq
      val under = SparkEntry.queries(q)(aqe, sf("sf0.01"))
        .collect().map(_.toString).sorted.toSeq
      assert(under == base, s"$q diverged under the aggressive AQE profile")
      assert(base.nonEmpty)
    }
  }

  test("skew-join splitting actually engages in this session shape (hot-key join)") {
    import aqe.implicits._
    // 1 hot key carrying ~all rows vs a uniform side — the canonical
    // shape skewedPartitionFactor=1 + 8k threshold must split; disable
    // broadcast so the join is sort-merge (the only splittable form)
    val prev = aqe.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = aqe.range(200000)
        .select(when($"id" % 100 =!= 0, lit(7L)).otherwise($"id").as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("v"))
      val small = aqe.range(5000).select(($"id" % 1000).as("k"), $"id".as("w"))
      val joined = big.join(small, "k").groupBy("k").agg(count(lit(1)).as("n"))
      val plan = finalPlan(joined)
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"),
        s"AQE did not finalize:\n${plan.take(800)}")
      assert(plan.contains("skewed"),
        s"skew splitting did not engage — profile broken?\n${plan.take(3000)}")
    } finally aqe.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plan pins survive AQE re-optimization (native folds, custom strategy, no SortAggregate)") {
    // the pins are properties of the compiled plan AQE starts from —
    // assert them on the FINAL adaptive plan, not the static explain
    val ia = finalPlan(SparkEntry.queries("emb_ivf_assign")(aqe, sf("sf0.001")))
    assert(ia.contains("graft_nearest_centroid") && !ia.contains("SortAggregate"),
      s"ivfAssign pin lost under AQE:\n${ia.take(1500)}")
    val ta = finalPlan(SparkEntry.queries("emb_tree_assign")(aqe, sf("sf0.001")))
    assert(ta.contains("graft_tree_assign") && !ta.contains("SortAggregate"),
      s"treeAssign pin lost under AQE:\n${ta.take(1500)}")
    val tk = finalPlan(SparkEntry.queries("q_topk_native")(aqe, sf("sf0.001")))
    assert(tk.contains("TopKPerGroup"),
      s"TopKPerGroup strategy lost under AQE:\n${tk.take(1500)}")
    val pq = finalPlan(SparkEntry.queries("emb_pq_codes")(aqe, sf("sf0.001")))
    assert(!pq.contains("SortAggregate"),
      s"PQ packed argmin pin lost under AQE:\n${pq.take(2000)}")
  }

  test("bucketed index serve stays exchange-free on the index legs under AQE") {
    // the indexed dedup serve: its pin is "the index side joins without
    // an Exchange" — AQE may wrap reads but must not ADD exchanges.
    // Each session's run REBUILDS (overwrites) the index, so evaluate
    // one fully (plan + rows) before starting the other
    def run(s: org.apache.spark.sql.SparkSession): (String, Seq[String]) = {
      val df = SparkEntry.queries("dedup_incremental_indexed")(s, sf("sf0.001"))
      val rows = df.collect().map(_.toString).sorted.toSeq
      (df.queryExecution.executedPlan.toString, rows)
    }
    val (pAqe, rAqe) = run(aqe)
    val (pBase, rBase) = run(spark)
    val nAqe = "Exchange".r.findAllIn(pAqe).length
    val nBase = "Exchange".r.findAllIn(pBase).length
    assert(nAqe <= nBase,
      s"aggressive AQE profile added exchanges: $nAqe vs $nBase")
    assert(rAqe == rBase)
  }
}
