package graft

import graft.streaming.HotKeysStream
import graft.tools.Cli
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** A0b/E32s: the `hotkeys` CLI drives the streaming skew monitor
  * end-to-end — two invocations over a growing parquet feed, the second
  * RESUMING sketch state from the checkpoint, must land exactly the
  * summaries an uninterrupted two-batch stream produces. */
class CliHotkeysSpec extends SparkSpecBase {
  import spark.implicits._

  test("hotkeys CLI two-invocation round-trip equals latestPerShard of one stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_hot").toString
    val feed = s"$dir/feed"; val ckpt = s"$dir/ckpt"; val upd = s"$dir/upd"
    val (shards, k) = (2, 4)
    val b1 = Seq.fill(30)("hot") ++ (1 to 20).map(i => s"u$i")
    val b2 = Seq.fill(25)("hot2") ++ (21 to 40).map(i => s"u$i")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"shard", $"n", $"item", $"mg_count")
        .collect().map(_.toSeq).toSet

    // invocation 1 folds file 1; invocation 2 resumes and folds file 2 only
    b1.toDF("k").coalesce(1).write.mode("append").parquet(feed)
    Cli.main(Array("hotkeys", "--in", feed, "--key", "k",
      "--k", k.toString, "--shards", shards.toString,
      "--checkpoint", ckpt, "--updates", upd))
    b2.toDF("k").coalesce(1).write.mode("append").parquet(feed)
    Cli.main(Array("hotkeys", "--in", feed, "--key", "k",
      "--k", k.toString, "--shards", shards.toString,
      "--checkpoint", ckpt, "--updates", upd))
    val got = rows(HotKeysStream.latestPerShard(spark.read.parquet(upd)))
    assert(!spark.sparkContext.isStopped, "CLI must reuse, not stop, the session")

    // the uninterrupted twin: one in-process stream, same two batches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val q = HotKeysStream.hotKeys(
        HotKeysStream.asSharded(input.toDF().withColumnRenamed("value", "k"), "k", shards), k)
      .writeStream.format("memory").queryName("cli_hot_twin")
      .outputMode("update").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val want = rows(HotKeysStream.latestPerShard(spark.table("cli_hot_twin")))
      assert(got == want,
        s"CLI-landed sketch diverged from the uninterrupted stream:\ngot  $got\nwant $want")
      assert(got.exists(_(2) == "hot") && got.exists(_(2) == "hot2"),
        "both known-heavy items must be candidates")
    } finally q.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("hotkeys CLI: --checkpoint alone resumes into the SAME derived updates dir") {
    // The resume foot-gun: checkpoint pinned but updates defaulting to a
    // fresh temp dir would drop quiet shards from the printed sketch. The
    // default updates dir is derived from the checkpoint path, so two
    // checkpoint-only invocations accumulate into one landing.
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_hot2").toString
    val feed = s"$dir/feed"; val ckpt = s"$dir/ckpt"
    // shard("only", 2) is fixed; all traffic lands in ONE shard, and batch
    // 2 touches nothing new — a fresh updates dir on invocation 2 would
    // show zero shards
    Seq.fill(10)("only").toDF("k").coalesce(1).write.mode("append").parquet(feed)
    Cli.main(Array("hotkeys", "--in", feed, "--key", "k",
      "--k", "4", "--shards", "2", "--checkpoint", ckpt))
    Cli.main(Array("hotkeys", "--in", feed, "--key", "k",
      "--k", "4", "--shards", "2", "--checkpoint", ckpt))
    val upd = s"${ckpt.stripSuffix("/")}_updates"
    val live = HotKeysStream.latestPerShard(spark.read.parquet(upd))
    val items = live.select($"item").collect().map(_.getString(0)).filter(_ != null)
    assert(items.contains("only"),
      s"prior landed counts lost on checkpoint-only resume: ${items.toSeq}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
