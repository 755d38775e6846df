package graft

import graft.tools.Cli

/** A0b: the `audit` and `shuffle` CLI faces drive A13/E60 end-to-end
  * and agree with the library calls on the same data. */
class CliAuditShuffleSpec extends SparkSpecBase {
  import spark.implicits._

  test("audit lands the library's report; a clean feed flags nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_audit").toString
    val dirty = Seq(
      ("k1", "I", 1L), ("k1", "I", 2L), // insert on live
      ("k2", "U", 1L)                   // orphan
    ).toDF("k", "Op", "seq")
    dirty.write.parquet(s"$dir/dirty")
    Cli.main(Array("audit", "--in", s"$dir/dirty", "--pk", "k",
      "--order-col", "seq", "--out", s"$dir/report"))
    val fromCli = spark.read.parquet(s"$dir/report")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fromLib = graft.cdc.CdcApply.auditFeed(
      dirty, Seq("k"), Seq(org.apache.spark.sql.functions.col("seq")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromCli == fromLib)
    assert(fromCli("insert_on_live") == (1L, 1L) && fromCli("orphan_op") == (1L, 1L))

    // clean feed: no exit even under --strict, all-zero report
    val clean = Seq(("a", "I", 1L), ("a", "U", 2L)).toDF("k", "Op", "seq")
    clean.write.parquet(s"$dir/clean")
    Cli.main(Array("audit", "--in", s"$dir/clean", "--pk", "k",
      "--order-col", "seq", "--strict", "--out", s"$dir/report2"))
    val r2 = spark.read.parquet(s"$dir/report2").collect()
    assert(r2.length == 4 && r2.forall(_.getLong(1) == 0L))
    assert(!spark.sparkContext.isStopped)
  }

  test("shuffle lands contiguous balanced shard dirs in rank order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_shuf").toString
    (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
      .write.parquet(s"$dir/corpus")
    Cli.main(Array("shuffle", "--in", s"$dir/corpus", "--out", s"$dir/shards",
      "--id", "doc_id", "--seed", "42", "--shards", "4"))
    val landed = spark.read.parquet(s"$dir/shards")
    assert(landed.count() == 100)
    val sizes = landed.groupBy("shard").count()
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L) && sizes.values.forall(_ == 25L))
    // each shard directory holds one file whose rows are rank-sorted —
    // the "trainer streams its shard sequentially" promise
    for (s <- 0 to 3) {
      val files = new java.io.File(s"$dir/shards/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s should land as one file")
      val pos = spark.read.parquet(files.head.getPath)
        .select("pos").as[Long].collect().toSeq
      assert(pos == pos.sorted, s"shard $s rows must be in rank order")
      assert(pos == (s * 25L until (s + 1) * 25L), s"shard $s must be a dense rank range")
    }
  }
}
