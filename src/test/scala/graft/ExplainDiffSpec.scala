package graft

import graft.cdc.CdcApply
import org.apache.spark.sql.functions._

/** B5: lag-aware validate — classify WHY target rows differ. */
class ExplainDiffSpec extends SparkSpecBase {
  import spark.implicits._

  // feed: (pk, seq, v, op) with ts = seq µs
  private def feed(rows: (Long, Long, Double, String)*) =
    rows.toDF("pk", "seq", "v", "Op")
      .withColumn("ts", timestamp_micros(col("seq")))

  private def run(cdc: org.apache.spark.sql.DataFrame,
                  target: Seq[(Long, Double)]) =
    CdcApply.explainDiff(cdc, target.toDF("pk", "v"), Seq("pk"),
      Seq(col("seq")), col("ts"))
      .select("class", "n_keys", "worst_us")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("all five classes, fixed spine, behind's worst horizon") {
    val cdc = feed(
      (1L, 10L, 1.0, "I"), (1L, 20L, 2.0, "U"), // key 1: 1.0 until 20, then 2.0
      (2L, 10L, 5.0, "I"),                      // key 2: current 5.0
      (3L, 10L, 7.0, "I"), (3L, 30L, 8.0, "U"), // key 3
      (4L, 10L, 9.0, "I"), (4L, 40L, 0.0, "D"), // key 4: deleted
      (5L, 10L, 3.0, "I"))                      // key 5: current, absent in target
    val out = run(cdc, Seq(
      1L -> 1.0,   // superseded at 20 → behind (worst 20)
      2L -> 5.0,   // current → in_sync
      3L -> 7.5,   // never existed → diverged
      4L -> 9.0,   // deleted key's stale image → behind (worst 40)
      99L -> 0.0)) // feed never saw → unknown_key
    assert(out == Map(
      "in_sync" -> ((1L, None)),
      "behind" -> ((2L, Some(20L))),
      "diverged" -> ((1L, None)),
      "unknown_key" -> ((1L, None)),
      "missing" -> ((1L, None)))) // key 5
  }

  test("identical replica: everything in_sync, every other class zero") {
    val cdc = feed((1L, 10L, 1.0, "I"), (2L, 10L, 2.0, "I"), (2L, 20L, 3.0, "U"))
    val out = run(cdc, Seq(1L -> 1.0, 2L -> 3.0))
    assert(out == Map(
      "in_sync" -> ((2L, None)), "behind" -> ((0L, None)),
      "diverged" -> ((0L, None)), "unknown_key" -> ((0L, None)),
      "missing" -> ((0L, None))))
  }

  test("a flip-flopped payload matches its LATEST occurrence (charitable reading)") {
    // value 1.0 held twice: [10,20) and [30,40); target holding 1.0 is
    // behind as of 40 (the most recent time it was right), not 20
    val cdc = feed(
      (1L, 10L, 1.0, "I"), (1L, 20L, 2.0, "U"),
      (1L, 30L, 1.0, "U"), (1L, 40L, 3.0, "U"))
    val out = run(cdc, Seq(1L -> 1.0))
    assert(out("behind") == ((1L, Some(40L))))
  }

  test("lag CLI lands the report explainDiff computes") {
    val root = java.nio.file.Files.createTempDirectory("graft_cli_lag").toString
    val cdc = feed(
      (1L, 10L, 1.0, "I"), (1L, 20L, 2.0, "U"),
      (2L, 10L, 5.0, "I"), (3L, 10L, 7.0, "I"))
    cdc.coalesce(1).write.parquet(s"$root/feed")
    Seq(1L -> 1.0, 2L -> 5.0, 9L -> 9.9).toDF("pk", "v")
      .coalesce(1).write.parquet(s"$root/target")
    graft.tools.Cli.main(Array("lag", "--feed", s"$root/feed",
      "--target", s"$root/target", "--pk", "pk", "--ts-col", "ts",
      "--order-col", "seq", "--out", s"$root/rep"))
    val got = spark.read.parquet(s"$root/rep")
      .select("class", "n_keys", "worst_us")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "in_sync" -> ((1L, None)), "behind" -> ((1L, Some(20L))),
      "diverged" -> ((0L, None)), "unknown_key" -> ((1L, None)),
      "missing" -> ((1L, None))))
    // print mode must not throw
    graft.tools.Cli.main(Array("lag", "--feed", s"$root/feed",
      "--target", s"$root/target", "--pk", "pk", "--ts-col", "ts",
      "--order-col", "seq"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("payload columns absent from the feed are refused") {
    val cdc = feed((1L, 10L, 1.0, "I"))
    val e = intercept[IllegalArgumentException](
      CdcApply.explainDiff(cdc, Seq((1L, "x")).toDF("pk", "nope"),
        Seq("pk"), Seq(col("seq")), col("ts")))
    assert(e.getMessage.contains("nope"))
  }
}
