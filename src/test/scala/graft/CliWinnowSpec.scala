package graft

import graft.tools.Cli
import org.apache.spark.sql.functions._

/** A0b/E51/E53: the `winnow` and `passages` CLIs drive the passage-dedup
  * surfaces end to end and equal the library answers. */
class CliWinnowSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("winnow build/screen round-trip equals the library answer") {
    val root = tmp("graft_cli_winnow")
    val corpusPath = s"$root/corpus.parquet"
    val batchPath = s"$root/batch.parquet"
    val outPath = s"$root/pairs.parquet"
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text")
    docs.filter($"doc_id" % 10 =!= 0).write.parquet(corpusPath)
    docs.filter($"doc_id" % 10 === 0).write.parquet(batchPath)
    try {
      Cli.main(Array("winnow", "build", "--in", corpusPath,
        "--name", "graft_cli_widx", "--buckets", "4"))
      Cli.main(Array("winnow", "screen", "--name", "graft_cli_widx",
        "--in", batchPath, "--out", outPath))
      val got = spark.read.parquet(outPath).collect().map(_.toSeq).toSet
      val lib = graft.text.Winnow.screenIndexed(
        spark, "graft_cli_widx",
        spark.read.parquet(batchPath), "doc_id", "text", 2L)
        .collect().map(_.toSeq).toSet
      assert(got == lib && got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_cli_widx_fps")
      spark.sql("DROP TABLE IF EXISTS graft_cli_widx_meta")
    }
  }

  test("passages excision lands the cleaned corpus") {
    val root = tmp("graft_cli_pass")
    val inPath = s"$root/docs.parquet"
    val outPath = s"$root/clean.parquet"
    val passage = "0123456789abcdefghij"
    Seq(
      1L -> s"aaa${passage}bbb",
      2L -> s"xx${passage}yy",
      3L -> "something else entirely..")
      .toDF("doc_id", "text").write.parquet(inPath)
    Cli.main(Array("passages", "--in", inPath, "--out", outPath, "--k", "20"))
    val got = spark.read.parquet(outPath)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (0L, s"aaa${passage}bbb"))
    assert(got(2L) == (20L, "xxyy"))
    assert(got(3L)._1 == 0L)
    // --sample-bp passes through to the keyspace screen: the library
    // call at the same bp must land the identical corpus, and the full
    // 10000 default equals exact mode (already asserted above)
    val outSampled = s"$root/clean_s.parquet"
    Cli.main(Array("passages", "--in", inPath, "--out", outSampled,
      "--k", "20", "--sample-bp", "3000"))
    val gotS = spark.read.parquet(outSampled)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val libS = graft.dedup.Passage.exciseDuplicates(
      spark.read.parquet(inPath), "doc_id", "text", 20, 3000)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(gotS == libS && gotS.size == 3)
  }
}
