package graft

import graft.dedup.Dedup
import graft.text.TextOps
import graft.tools.Cli

/** A0b/E2b-idx: the `index` CLI subcommands drive the persisted dedup
  * index end-to-end — build → screen → append → screen → compact — and
  * return exactly the pairs the library calls produce on the same data.
  * The spec's active session is reused by the CLI (and must survive it);
  * standalone invocations create their own metastore-backed session. */
class CliIndexSpec extends SparkSpecBase {
  import spark.implicits._

  test("index build/screen/append/compact round-trip matches the library") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_idx").toString
    val corpus = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n")).toDF("doc_id", "text")
    val batch1 = Seq((10L, "a b c d e f g"), (11L, "p q r s t u v")).toDF("doc_id", "text")
    val accepted = Seq((11L, "p q r s t u v")).toDF("doc_id", "text")
    val batch2 = Seq((12L, "p q r s t u v"), (13L, "z x c v b n m")).toDF("doc_id", "text")
    corpus.write.parquet(s"$dir/corpus")
    batch1.write.parquet(s"$dir/batch1")
    accepted.write.parquet(s"$dir/accepted")
    batch2.write.parquet(s"$dir/batch2")
    def pairsOf(path: String) =
      spark.read.parquet(path).collect().map(_.toSeq).toSet
    try {
      Cli.main(Array("index", "build", "--name", "graft_cli_idx",
        "--corpus", s"$dir/corpus", "--buckets", "4"))
      assert(spark.catalog.tableExists("graft_cli_idx_postings"), "CLI built in THIS session")

      Cli.main(Array("index", "screen", "--name", "graft_cli_idx",
        "--batch", s"$dir/batch1", "--tau-bp", "9999", "--out", s"$dir/screen1"))
      val lib1 = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_cli_idx", batch1, "doc_id", "text", tauBp = 9999)
        .collect().map(_.toSeq).toSet
      assert(pairsOf(s"$dir/screen1") == lib1)
      assert(lib1.exists(_.head == 10L), "the known duplicate must surface")

      Cli.main(Array("index", "append", "--name", "graft_cli_idx",
        "--batch", s"$dir/accepted"))
      Cli.main(Array("index", "screen", "--name", "graft_cli_idx",
        "--batch", s"$dir/batch2", "--tau-bp", "9999", "--out", s"$dir/screen2"))
      val lib2 = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_cli_idx", batch2, "doc_id", "text", tauBp = 9999)
        .collect().map(_.toSeq).toSet
      assert(pairsOf(s"$dir/screen2") == lib2)
      assert(lib2.exists(r => r.head == 12L && r(1) == 11L),
        "the delta-leg duplicate must surface through the CLI-appended index")

      Cli.main(Array("index", "compact", "--name", "graft_cli_idx"))
      assert(!spark.catalog.tableExists("graft_cli_idx_postings_delta"))
      Cli.main(Array("index", "screen", "--name", "graft_cli_idx",
        "--batch", s"$dir/batch2", "--tau-bp", "9999", "--out", s"$dir/screen3"))
      assert(pairsOf(s"$dir/screen3") == lib2, "compaction must not change CLI answers")

      // the CLI reused (and did not stop) the suite's session
      assert(!spark.sparkContext.isStopped)
    } finally {
      Seq("postings", "sizes", "meta", "postings_delta", "sizes_delta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS graft_cli_idx_$s"))
    }
  }

  test("land subcommand rewrites layout without changing the row set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_land").toString
    val rows = (1L to 1000L).map(i => (i, (i * 7919) % 1000, s"doc $i"))
    rows.toDF("id", "v", "text").write.parquet(s"$dir/in")
    def rowSet(path: String) =
      spark.read.parquet(path).collect().map(_.toSeq).toSet
    def files(path: String) =
      new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))

    Cli.main(Array("land", "--in", s"$dir/in", "--out", s"$dir/sized",
      "--max-records", "250"))
    assert(rowSet(s"$dir/sized") == rowSet(s"$dir/in"))
    assert(files(s"$dir/sized") >= 4, "250-record cap over 1000 rows needs >=4 files")

    Cli.main(Array("land", "--in", s"$dir/in", "--out", s"$dir/z",
      "--zorder", "id,v", "--files", "4"))
    assert(rowSet(s"$dir/z") == rowSet(s"$dir/in"))
    assert(files(s"$dir/z") == 4)
    assert(!spark.sparkContext.isStopped)
  }

  test("profile subcommand reports the exact hot keys the library computes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_prof").toString
    // one hot key (30% of rows) over a spread of cold ones, plus a
    // weight column that crowns a DIFFERENT key by weighted share
    val rows = Seq.fill(300)(("hot", 1L)) ++
      (1 to 700).map(i => (s"c$i", if (i <= 10) 50L else 1L))
    rows.toDF("k", "w").write.parquet(s"$dir/in")

    Cli.main(Array("profile", "--in", s"$dir/in", "--key", "k",
      "--den", "10", "--out", s"$dir/by_rows"))
    val byRows = spark.read.parquet(s"$dir/by_rows")
      .select($"k", $"weight").as[(String, Long)].collect().toMap
    assert(byRows == Map("hot" -> 300L), "row-share profile must find exactly the hot key")

    Cli.main(Array("profile", "--in", s"$dir/in", "--key", "k",
      "--weight", "w", "--den", "10", "--out", s"$dir/by_w"))
    val byW = spark.read.parquet(s"$dir/by_w")
      .select($"k", $"weight").as[(String, Long)].collect().toMap
    // total weight = 300 + 10*50 + 690 = 1490; only "hot" (300) crosses 149
    val expected = TextOps.heavyHittersWeighted(
        spark.read.parquet(s"$dir/in").withColumn("k", $"k".cast("string")),
        "k", $"w", 10, 9)
      .select($"k", $"weight").as[(String, Long)].collect().toMap
    assert(byW == expected)
    assert(byW.contains("hot"))

    // two-table form prints the overlap profile the library computes
    (1L to 50L).toDF("k2").write.parquet(s"$dir/other")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.main(Array("profile", "--in", s"$dir/in", "--key", "k",
        "--in2", s"$dir/other", "--key2", "k2", "--kmv-k", "64"))
    }
    val lib = graft.operators.KeyOverlap.profile(
        spark.read.parquet(s"$dir/in"), "k",
        spark.read.parquet(s"$dir/other"), "k2", 64)
      .head()
    val line = out.toString.linesIterator.find(_.contains("overlap vs")).getOrElse(
      fail(s"no overlap line in CLI output:\n$out"))
    assert(line.contains(s"jaccard_bp=${lib.getLong(4)}"))
    assert(line.contains(s"est_union=${lib.getLong(2)}"))
    assert(!spark.sparkContext.isStopped)
  }

  test("profile --hist prints and writes the library's histogram") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_hist").toString
    (0 until 100).map(_.toDouble).toDF("v").write.parquet(s"$dir/in")
    Cli.main(Array("profile", "--in", s"$dir/in", "--hist", "v",
      "--lo", "0", "--hi", "100", "--buckets", "4", "--out", s"$dir/hist"))
    val got = spark.read.parquet(s"$dir/hist")
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 25L), (1L, 25L), (2L, 25L), (3L, 25L)))
    assert(!spark.sparkContext.isStopped)
  }

  test("profile --prune reports the library's pruning audit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_prune").toString
    for (i <- 0 until 4)
      spark.range(i * 100, (i + 1) * 100).select($"id".as("k"))
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.main(Array("profile", "--in", s"$dir/in", "--prune", "k",
        "--lo", "100", "--hi", "199"))
    }
    val line = out.toString.linesIterator.find(_.contains("prune audit"))
      .getOrElse(fail(s"no prune line in CLI output:\n$out"))
    assert(line.contains("row_groups=4 pruned=3"))
    assert(line.contains("rows=400 rows_pruned=300"))
    assert(!spark.sparkContext.isStopped)
  }

  test("profile --spans prints the library's grain suggestion and warnings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_spans").toString
    // µs-valued long spans: mostly 60s intervals plus a multi-hour outlier
    // to trip the span-skew warning path
    val s = 1000000L
    val rows = (1 to 200).map(i => (i * 3600 * s, i * 3600 * s + 60 * s)) :+
      ((0L, 50000L * 3600 * s))
    rows.toDF("st", "en").write.parquet(s"$dir/in")
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.main(Array("profile", "--in", s"$dir/in", "--spans", "st,en"))
    }
    val lib = graft.operators.RangeJoin.suggestGrain(
      spark.read.parquet(s"$dir/in"), $"st", $"en")
    val line = out.toString.linesIterator.find(_.contains("spans st..en"))
      .getOrElse(fail(s"no spans line in CLI output:\n$out"))
    assert(line.contains(s"grain_us=${lib.grainUs}"))
    assert(line.contains(s"max_replicas=${lib.maxReplicas}"))
    assert(lib.warning.isDefined, "the outlier interval must produce a warning")
    assert(out.toString.linesIterator.exists(_.contains("WARNING")),
      s"CLI must surface the library warning:\n$out")
    assert(!spark.sparkContext.isStopped)
  }

  test("compact subcommand rewrites a changefeed to the library's net effect") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_compact").toString
    val feed = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),          // churny key nets to one row
      (2L, 1L, "I", "x"), (2L, 2L, "D", "-"),          // born-and-deleted
      (3L, 1L, "U", "c"))                              // pre-existing key updated
      .toDF("pk", "seq", "Op", "v")
    feed.write.parquet(s"$dir/in")
    Cli.main(Array("compact", "--in", s"$dir/in", "--out", s"$dir/out",
      "--pk", "pk", "--order-col", "seq"))
    val got = spark.read.parquet(s"$dir/out")
      .select($"pk", $"Op", $"v").as[(Long, String, Option[String])].collect().toSet
    val lib = graft.cdc.CdcApply.compact(
      feed, Seq("pk"), Seq(org.apache.spark.sql.functions.col("seq")))
      .select($"pk", $"Op", $"v").as[(Long, String, Option[String])].collect().toSet
    assert(got == lib && got.size == 3)
    // the ephemeral key drops under the flag
    Cli.main(Array("compact", "--in", s"$dir/in", "--out", s"$dir/out2",
      "--pk", "pk", "--order-col", "seq", "--drop-ephemeral"))
    val kept = spark.read.parquet(s"$dir/out2").select($"pk").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    assert(!spark.sparkContext.isStopped)
  }

  test("profile --cols runs the one-pass table profile the library computes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_tprof").toString
    Seq((1L, "a"), (2L, "b"), (2L, null)).toDF("k", "s")
      .write.parquet(s"$dir/in")
    Cli.main(Array("profile", "--in", s"$dir/in", "--cols", "all",
      "--kmv-k", "64", "--out", s"$dir/prof"))
    val got = spark.read.parquet(s"$dir/prof")
      .orderBy("col_name").collect().map(_.toSeq).toSeq
    val lib = graft.operators.TableProfile
      .profile(spark.read.parquet(s"$dir/in"), Seq("k", "s"), 64)
      .orderBy("col_name").collect().map(_.toSeq).toSeq
    assert(got == lib)
    assert(got.map(_.head) == Seq("k", "s"))
    assert(!spark.sparkContext.isStopped)
  }
}
