package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.TableProfile

/** E36: one-pass table profile — exactness and single-scan plan shape. */
class TableProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("E36: nulls, exact distinct (below k), min/max and row counts are right") {
    val df = Seq(
      (1L, "a", java.lang.Double.valueOf(1.5)),
      (2L, "b", java.lang.Double.valueOf(2.5)),
      (2L, null, java.lang.Double.valueOf(2.5)),
      (3L, "a", null)
    ).toDF("k", "s", "v")
    val rows = TableProfile.profile(df, Seq("k", "s", "v"), k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(rows("k") == ((4L, 0L, 3L, "1", "3")))
    assert(rows("s") == ((4L, 1L, 2L, "a", "b")))
    assert(rows("v") == ((4L, 1L, 2L, "1.5", "2.5")))
  }

  test("E36: profiling n columns costs ONE scan and one bounded aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-profile").toString
    try {
      spark.range(0, 1000)
        .select(col("id"), (col("id") % 7).as("m"), col("id").cast("string").as("s"))
        .write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
      val prof = TableProfile.profile(df, Seq("id", "m", "s"), k = 16)
      assert(prof.count() == 3)
      val plan = prof.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collect { case f: FileSourceScanExec => f }
      assert(scans.size == 1,
        s"profile of 3 columns must scan the table once, found ${scans.size} scans")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("E36: estimate regime is deterministic across partitionings") {
    val df = spark.range(0, 5000).select(col("id"))
    val runs = for (parts <- Seq(1, 7)) yield
      TableProfile.profile(df.repartition(parts), Seq("id"), k = 64)
        .collect().map(_.toSeq).toSeq
    assert(runs.distinct.size == 1, "profile must not depend on partitioning")
    val est = runs.head.head(3).asInstanceOf[Long]
    assert(math.abs(est - 5000L) * 100 <= 5000L * 30, s"est=$est")
  }

  test("E36h: histogram buckets exactly, clamps tails, excludes nulls") {
    val df = Seq[java.lang.Double](0.0, 5.0, 9.99, 10.0, 25.0, -3.0, 199.0, null)
      .toDF("v")
    val got = TableProfile.histogram(df, "v", 10, 0.0, 100.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // width 10: 0,5,9.99 -> b0; 10 -> b1; 25 -> b2; -3 clamps to b0;
    // 199 clamps to b9; null excluded
    assert(got == Map(0L -> 4L, 1L -> 1L, 2L -> 1L, 9L -> 1L))
  }

  test("E36h: NaN is excluded, infinities clamp to the edge buckets") {
    val df = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 50.0)
      .toDF("v")
    val got = TableProfile.histogram(df, "v", 10, 0.0, 100.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("E36h: histogram counts every non-null row (no dropped tails)") {
    val df = spark.range(0, 1000).select((col("id") * 3 - 500).cast("double").as("v"))
    val total = TableProfile.histogram(df, "v", 7, 0.0, 100.0)
      .agg(sum("n")).head().getLong(0)
    assert(total == 1000L)
  }

  test("E36: unknown columns are refused loudly") {
    val df = Seq((1, "x")).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      TableProfile.profile(df, Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
