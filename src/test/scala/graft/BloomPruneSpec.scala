package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.BloomPrune

/** E35: bloom-pruned semi-join — exactness, superset screen, plan shape. */
class BloomPruneSpec extends SparkSpecBase {
  import spark.implicits._

  // dup keys both sides, probe keys far outside the build range, nulls
  private def probe = spark.range(0, 4000)
    .select((col("id") % 997).as("k"), col("id").as("payload"))
    .unionByName(Seq((null.asInstanceOf[java.lang.Long], 99999L))
      .toDF("k", "payload").select(col("k").cast("long").as("k"), col("payload")))
  private def build = spark.range(0, 600)
    .select((col("id") % 300).as("k"))
    .unionByName(Seq(null.asInstanceOf[java.lang.Long]).toDF("k")
      .select(col("k").cast("long").as("k")))

  private def sortedRows(df: DataFrame) =
    df.orderBy("k", "payload").collect().toSeq

  test("E35: semiJoin is bit-identical to the plain exact semi-join") {
    val got = BloomPrune.semiJoin(probe, "k", build, "k", expectedItems = 1024)
    val want = probe.join(build.where(col("k").isNotNull),
      Seq("k"), "left_semi")
    assert(sortedRows(got.select("k", "payload")) == sortedRows(want))
    // sanity: the screen actually excludes something AND keeps something
    assert(got.count() > 0)
    assert(got.count() < probe.count())
  }

  test("E35: mightContain is a superset screen (no false negatives at any fpp)") {
    // tiny bloom forced into heavy false-positive territory — the screen
    // may pass extra rows but must never drop a true match
    val bloom = BloomPrune.buildBloom(build, "k", expectedItems = 8, fpp = 0.5)
    val screened = probe.where(BloomPrune.mightContain(probe, "k", bloom))
    val truth = probe.join(build.where(col("k").isNotNull), Seq("k"), "left_semi")
    assert(truth.join(screened, Seq("k", "payload"), "left_anti").count() == 0,
      "bloom screen dropped a true semi-join row")
  }

  test("E35a: antiJoin is bit-identical to the plain exact anti-join, nulls kept") {
    val got = BloomPrune.antiJoin(probe, "k", build, "k", expectedItems = 1024)
    val want = probe.join(build.where(col("k").isNotNull), Seq("k"), "left_anti")
    assert(sortedRows(got.select("k", "payload")) == sortedRows(want))
    // the null-key probe row never matches, so the anti-join keeps it
    assert(got.where(col("k").isNull).count() == 1)
    // and even a saturated bloom (everything passes the screen) stays exact
    val tiny = BloomPrune.antiJoin(probe, "k", build, "k",
      expectedItems = 2, fpp = 0.9)
    assert(sortedRows(tiny.select("k", "payload")) == sortedRows(want))
  }

  test("E35a: semi and anti partition the probe exactly") {
    val semi = BloomPrune.semiJoin(probe, "k", build, "k", expectedItems = 1024)
    val anti = BloomPrune.antiJoin(probe, "k", build, "k", expectedItems = 1024)
    assert(semi.count() + anti.count() == probe.count())
    assert(semi.join(anti, Seq("k", "payload"), "inner").count() == 0)
  }

  test("E35: empty and all-null build sides yield the empty result") {
    val empty = spark.range(0).select(col("id").as("k"))
    assert(BloomPrune.semiJoin(probe, "k", empty, "k", expectedItems = 8).count() == 0)
    val allNull = Seq(null.asInstanceOf[java.lang.Long]).toDF("k")
      .select(col("k").cast("long").as("k"))
    assert(BloomPrune.semiJoin(probe, "k", allNull, "k", expectedItems = 8).count() == 0)
  }

  test("E35: an executor-OOM-sized bloom is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      BloomPrune.buildBloom(build, "k", expectedItems = 1L << 40, fpp = 0.01)
    }
    // a request this big first exceeds the engine's silent item clamp —
    // the refusal must name the conf so the caller can decide
    assert(e.getMessage.contains("maxNumItems"))
  }

  test("E35: requests above the engine's SILENT clamps are refused loudly") {
    // items above spark.sql.optimizer.runtime.bloomFilter.maxNumItems
    // (default 4,000,000) would be clamped invisibly by the aggregate
    val e1 = intercept[IllegalArgumentException] {
      BloomPrune.buildBloom(build, "k", expectedItems = 4000001L, fpp = 0.02)
    }
    assert(e1.getMessage.contains("maxNumItems"))
    // ...and bits above maxNumBits likewise; shrink the session cap and
    // a previously-fine request must now refuse, naming the conf
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "1024")
    try {
      val e2 = intercept[IllegalArgumentException] {
        BloomPrune.buildBloom(build, "k", expectedItems = 100000L, fpp = 0.02)
      }
      assert(e2.getMessage.contains("maxNumBits"))
    } finally
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
    // within both caps still builds
    assert(BloomPrune.buildBloom(build, "k", 1024L, 0.02).nonEmpty)
  }

  test("E35: key type mismatch is refused loudly") {
    val intBuild = build.select(col("k").cast("int").as("k"))
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(probe, "k", intBuild, "k")
    }
    assert(e.getMessage.contains("type"))
  }

  test("E35: the might_contain filter runs on the probe scan side, below its exchange") {
    // force the shuffle regime — at 100 TB the build side doesn't
    // broadcast, and THAT is the plan where pre-exchange pruning pays
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = BloomPrune.semiJoin(probe, "k", build, "k", expectedItems = 1024)
      df.count() // settle AQE so executedPlan is final
      def strip(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val plan = strip(df.queryExecution.executedPlan)
      val filters = plan.collect {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.toString.contains("might_contain") => f
      }
      assert(filters.nonEmpty, s"no might_contain filter in plan:\n$plan")
      // pre-exchange: the pruning filter's subtree must contain no shuffle
      assert(filters.forall(_.collect { case e: ShuffleExchangeExec => e }.isEmpty),
        "might_contain filter sits above an exchange — pruning happened too late")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
