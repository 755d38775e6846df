package graft

import graft.tools.Cli
import org.apache.spark.sql.functions._

/** A0b/A10s: the `scd2` CLI drives the streaming history landing
  * end-to-end — two invocations over a growing parquet changefeed, the
  * second RESUMING from the checkpoint, must land exactly the history
  * batch scd2History computes over the whole feed. */
class CliScd2Spec extends SparkSpecBase {
  import spark.implicits._

  test("scd2 CLI two-invocation round-trip equals batch scd2History") {
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false },
      "duckdb JDBC driver jar not present in offline cache")
    import java.sql.{DriverManager, Timestamp}
    val root = java.nio.file.Files.createTempDirectory("graft_cli_scd2").toString
    val feedDir = s"$root/feed"; val ckpt = s"$root/ckpt"
    val url = s"jdbc:duckdb:$root/hist.db"
    def t(s: Long) = new Timestamp(s * 1000L)
    val feed1 = Seq(
      TsChange(1, 1, "I", "one-v1", t(1000)), TsChange(1, 2, "U", "one-v2", t(2000)),
      TsChange(2, 1, "I", "two-v1", t(1000)))
    val feed2 = Seq(
      TsChange(1, 3, "U", "one-v3", t(3000)), TsChange(2, 2, "D", "-", t(2000)),
      TsChange(3, 1, "I", "three-v1", t(2000)))
    def run(create: Boolean): Unit = {
      val base = Array("scd2", "--in", feedDir, "--pk", "id", "--ts-col", "ts",
        "--order-col", "seq", "--url", url, "--schema", "graft_cli",
        "--table", "history", "--checkpoint", ckpt, "--max-connections", "1")
      Cli.main(if (create) base :+ "--create" else base)
    }
    feed1.toDF().coalesce(1).write.mode("append").parquet(feedDir)
    run(create = true) // invocation 1: DDL + drain feed1
    feed2.toDF().coalesce(1).write.mode("append").parquet(feedDir)
    run(create = false) // invocation 2: resume, fold feed2 only
    assert(!spark.sparkContext.isStopped, "CLI must reuse, not stop, the session")

    val conn = DriverManager.getConnection(url)
    val got =
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            "SELECT id, seq, name, valid_from_us, valid_to_us, is_current FROM graft_cli.history")
          val buf = Set.newBuilder[(Long, Long, String, Long, Option[Long], Long)]
          while (rs.next()) {
            val vto = rs.getLong(5)
            val vtoOpt = if (rs.wasNull()) None else Some(vto)
            buf += ((rs.getLong(1), rs.getLong(2), rs.getString(3),
              rs.getLong(4), vtoOpt, rs.getLong(6)))
          }
          buf.result()
        } finally st.close()
      } finally conn.close()
    val oracle = graft.cdc.CdcApply.scd2History(
        (feed1 ++ feed2).toDF(), Seq("id"), Seq(col("seq")), col("ts"))
      .select($"id", $"seq", $"name", $"valid_from_us", $"valid_to_us", $"is_current")
      .as[(Long, Long, String, Long, Option[Long], Long)].collect().toSet
    assert(got == oracle, s"CLI-landed history $got != batch scd2History $oracle")
    // the delete closed two-v1 and left key 2 with no current row
    assert(!got.exists(r => r._1 == 2L && r._6 == 1L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("scd2 weighted CLI lands the rollup CdcApply.scd2TimeWeighted computes") {
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("graft_cli_scd2w").toString
    def t(us: Long) = new Timestamp(us / 1000L) // whole-ms fixture times
    val feed = Seq(
      (1L, 1L, "I", 1.00, t(100000000L)),
      (1L, 2L, "U", 2.00, t(150000000L)),
      (1L, 3L, "D", 0.00, t(230000000L)),
      (2L, 1L, "I", 4.00, t(120000000L)))
      .toDF("id", "seq", "Op", "value", "ts")
    feed.coalesce(1).write.parquet(s"$root/feed")
    Cli.main(Array("scd2", "weighted", "--in", s"$root/feed",
      "--pk", "id", "--ts-col", "ts", "--order-col", "seq",
      "--value-col", "value", "--grain-us", "100000000",
      "--horizon-us", "300000000", "--out", s"$root/roll"))
    val got = spark.read.parquet(s"$root/roll")
      .select("bucket_us", "weight_us", "weighted_sum_centi_us", "wavg_milli")
      .as[(Long, Long, Double, Long)].collect().toSet
    val want = graft.cdc.CdcApply.scd2TimeWeighted(
        graft.cdc.CdcApply.scd2History(feed, Seq("id"), Seq(col("seq")), col("ts")),
        col("value"), 100000000L, 300000000L)
      .select("bucket_us", "weight_us", "weighted_sum_centi_us", "wavg_milli")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == want)
    // spot check: bucket [1e8, 2e8) holds key1 v=1.00 for 50s then v=2.00
    // for 50s, plus key2 v=4.00 for 80s — wavg = ⌊1000·(50·1+50·2+80·4)/180⌋
    val b1 = got.find(_._1 == 100000000L).get
    assert(b1._2 == 180000000L && b1._3 == 4.7e10 && b1._4 == 2611L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("scd2 diff CLI (feed mode) lands what CdcApply.scd2Diff computes") {
    import java.sql.Timestamp
    val root = java.nio.file.Files.createTempDirectory("graft_cli_scd2d").toString
    def t(s: Long) = new Timestamp(s * 1000L)
    val full = Seq(
      TsChange(1, 1, "I", "a", t(1000)), TsChange(1, 2, "U", "b", t(2000)),
      TsChange(2, 1, "I", "x", t(1500)), TsChange(2, 2, "D", "-", t(2500)),
      TsChange(3, 1, "I", "z", t(1000)))
    val lossy = full.filterNot(c => c.id == 1 && c.seq == 2) // lost one update
      .filterNot(c => c.id == 3) // lost a whole key
    full.toDF().coalesce(1).write.parquet(s"$root/left")
    lossy.toDF().coalesce(1).write.parquet(s"$root/right")
    Cli.main(Array("scd2", "diff", "--left", s"$root/left", "--right", s"$root/right",
      "--pk", "id", "--compare", "name", "--ts-col", "ts", "--order-col", "seq",
      "--out", s"$root/diff"))
    val got = spark.read.parquet(s"$root/diff")
      .select("id", "valid_from_us", "valid_to_us", "diff_kind", "l_name", "r_name")
      .as[(Long, Long, Option[Long], String, Option[String], Option[String])]
      .collect().toSet
    def hist(rows: Seq[TsChange]) = graft.cdc.CdcApply.scd2History(
      rows.toDF(), Seq("id"), Seq(col("seq")), col("ts"))
      .select("id", "name", "valid_from_us", "valid_to_us")
    val want = graft.cdc.CdcApply.scd2Diff(hist(full), hist(lossy), Seq("id"), Seq("name"))
      .select("id", "valid_from_us", "valid_to_us", "diff_kind", "l_name", "r_name")
      .as[(Long, Long, Option[Long], String, Option[String], Option[String])]
      .collect().toSet
    assert(got == want && got.nonEmpty)
    // the lost update: left=b, right still a → mismatch from t=2000
    assert(got.exists(r => r._1 == 1L && r._4 == "mismatch"
      && r._5 == Some("b") && r._6 == Some("a")))
    // the lost key: only_left for key 3's whole open version
    assert(got.exists(r => r._1 == 3L && r._4 == "only_left" && r._3.isEmpty))
    // summary mode (no --out) must not throw; history mode round-trips too
    Cli.main(Array("scd2", "diff", "--left", s"$root/left", "--right", s"$root/right",
      "--pk", "id", "--compare", "name", "--ts-col", "ts", "--order-col", "seq"))
    hist(full).write.parquet(s"$root/lh")
    hist(lossy).write.parquet(s"$root/rh")
    Cli.main(Array("scd2", "diff", "--left", s"$root/lh", "--right", s"$root/rh",
      "--pk", "id", "--compare", "name", "--history", "--out", s"$root/diff2"))
    val got2 = spark.read.parquet(s"$root/diff2")
      .select("id", "valid_from_us", "valid_to_us", "diff_kind", "l_name", "r_name")
      .as[(Long, Long, Option[Long], String, Option[String], Option[String])]
      .collect().toSet
    assert(got2 == want)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
