package graft

import graft.text.LangModel
import graft.tools.Cli
import org.apache.spark.sql.functions._

/** A0b/E55/E55-idx/E56s/D14: the `lm` and `paths` CLI faces drive the
  * LM lifecycle (build + serve + drift) and the path report; served
  * outputs equal the library calls. */
class CliLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("lm build/score round-trip equals the library answer") {
    val root = tmp("graft_cli_lm")
    val trainPath = s"$root/train.parquet"
    val batchPath = s"$root/batch.parquet"
    val outPath = s"$root/out.parquet"
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text")
    docs.filter($"doc_id" % 7 =!= 0).write.parquet(trainPath)
    docs.filter($"doc_id" % 7 === 0).write.parquet(batchPath)
    try {
      Cli.main(Array("lm", "build", "--in", trainPath, "--name", "graft_cli_lm_idx",
        "--buckets", "4"))
      Cli.main(Array("lm", "score", "--in", batchPath, "--name", "graft_cli_lm_idx",
        "--out", outPath))
      val got = spark.read.parquet(outPath).collect().map(_.toSeq).toSet
      val lib = LangModel.scoreIndexed(spark, "graft_cli_lm_idx",
        spark.read.parquet(batchPath), "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(got === lib && got.nonEmpty)
    } finally Seq("_lm", "_ctx", "_meta").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS graft_cli_lm_idx$sfx"))
  }

  test("lm drift lands the same row the library computes") {
    val root = tmp("graft_cli_drift")
    val refPath = s"$root/ref.parquet"
    val inPath = s"$root/in.parquet"
    val outPath = s"$root/drift.parquet"
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text")
    docs.filter($"doc_id" % 2 === 0).write.parquet(refPath)
    docs.filter($"doc_id" % 2 === 1).write.parquet(inPath)
    Cli.main(Array("lm", "drift", "--ref-docs", refPath, "--in", inPath,
      "--out", outPath))
    val got = spark.read.parquet(outPath).collect().map(_.toSeq).toSet
    val lib = LangModel.jsDivergenceVsCounts(
      LangModel.unigramCounts(spark.read.parquet(refPath), "text"),
      spark.read.parquet(inPath), "text").collect().map(_.toSeq).toSet
    assert(got === lib)
  }

  test("paths lands the same transition matrix the library computes") {
    val root = tmp("graft_cli_paths")
    val outPath = s"$root/paths.parquet"
    Cli.main(Array("paths", "--in", s"${sf("sf0.001")}/events.parquet",
      "--gap-min", "1440", "--out", outPath))
    val got = spark.read.parquet(outPath).collect().map(_.toSeq).toSet
    val ev = graft.util.Tables.events(spark, sf("sf0.001"))
    val lib = graft.operators.Markov.transitions(
      ev, "user_id", unix_micros(col("ts")), "event_type",
      Seq(col("ts"), col("event_id")), 1440L * 60000000L)
      .collect().map(_.toSeq).toSet
    assert(got === lib && got.nonEmpty)
  }
}
