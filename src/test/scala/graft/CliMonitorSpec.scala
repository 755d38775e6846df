package graft

import graft.tools.Cli
import org.apache.spark.sql.functions._

/** A0b/D15/D18/D20: the `monitor` CLI lands exactly what the three
  * library operators compute. */
class CliMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  test("monitor CLI lands anomalies, changepoints, and trend matching the library") {
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("graft_cli_mon").toString
    val H = 3600L * 1000L // ms per hour
    // type "a": 23 quiet hours then a 12× spike hour (a long baseline —
    // with few hours the spike inflates its own variance and 3σ masks);
    // value ramps per hour
    val rows =
      (0 until 23).flatMap(h => Seq.fill(3)(("a", new Timestamp(h * H), h * 2.0))) ++
        Seq.fill(36)(("a", new Timestamp(23 * H), 12.0)) ++
        (0 until 7).map(h => ("b", new Timestamp(h * H), 5.0))
    val df = rows.toDF("event_type", "ts", "value")
    df.coalesce(1).write.parquet(s"$root/feed")
    Cli.main(Array("monitor", "--in", s"$root/feed", "--ts-col", "ts",
      "--group-col", "event_type", "--value-col", "value",
      "--out", s"$root/rep"))
    val tsUs = graft.util.TimeCols.toMicros(df, col("ts"))

    val gotAnom = spark.read.parquet(s"$root/rep/anomalies")
      .select("event_type", "hour_ts").as[(String, String)].collect().toSet
    val wantAnom = graft.operators.Anomaly.hourlyVolume(df, col("ts"), "event_type")
      .filter(col("is_anomaly"))
      .select("event_type", "hour_ts").as[(String, String)].collect().toSet
    assert(gotAnom == wantAnom && gotAnom.exists(_._1 == "a"))

    val gotShift = spark.read.parquet(s"$root/rep/changepoints")
      .select("event_type", "split_bucket").as[(String, Long)].collect().toSet
    val wantShift = graft.operators.Changepoint
      .strongestShift(df, Seq("event_type"), tsUs)
      .select("event_type", "split_bucket").as[(String, Long)].collect().toSet
    assert(gotShift == wantShift)
    // the spike is both the anomaly and the located split boundary
    assert(gotShift.contains(("a", 22L)))

    val gotTrend = spark.read.parquet(s"$root/rep/trend")
      .select("event_type", "n", "slope_milli_per_day")
      .as[(String, Long, Option[Long])].collect().toSet
    val wantTrend = graft.operators.Trend
      .perGroup(df, Seq("event_type"), tsUs, col("value"), 0L)
      .select("event_type", "n", "slope_milli_per_day")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(gotTrend == wantTrend)
    // flat type b: slope exactly 0
    assert(wantTrend.exists(t => t._1 == "b" && t._3 == Some(0L)))
    // print mode must not throw
    Cli.main(Array("monitor", "--in", s"$root/feed", "--ts-col", "ts",
      "--group-col", "event_type"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("drift CLI lands the PSI report PsiDrift computes") {
    val root = java.nio.file.Files.createTempDirectory("graft_cli_drift").toString
    val ref = (0 until 200).map(i => i * 1.0).toDF("v")
    val cur = (0 until 180).map(i => i * 1.0 + 40).toDF("v")
    ref.coalesce(1).write.parquet(s"$root/ref")
    cur.coalesce(1).write.parquet(s"$root/cur")
    Cli.main(Array("drift", "--ref", s"$root/ref", "--cur", s"$root/cur",
      "--cols", "v", "--out", s"$root/rep"))
    val got = spark.read.parquet(s"$root/rep")
      .select("col_name", "psi_e4", "n_ref", "n_cur")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = graft.operators.PsiDrift
      .psi(spark.read.parquet(s"$root/ref"), spark.read.parquet(s"$root/cur"), Seq("v"))
      .select("col_name", "psi_e4", "n_ref", "n_cur")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want && got.head._2 > 0L)
    // print mode must not throw
    Cli.main(Array("drift", "--ref", s"$root/ref", "--cur", s"$root/cur", "--cols", "v"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
