package graft

import graft.text.Classifier
import graft.tools.Cli
import org.apache.spark.sql.functions._

/** A0b/E52: the `classify` CLI drives the classifier lifecycle — train +
  * persist, predict through the saved model — and the served predictions
  * equal the library call. */
class CliClassifySpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("classify train/predict round-trip equals the library answer") {
    val root = tmp("graft_classify")
    val trainPath = s"$root/train.parquet"
    val testPath = s"$root/test.parquet"
    val model = s"$root/model"
    val outPath = s"$root/out.parquet"
    val docs = TextEntries.langSpiked(spark, sf("sf0.001"))
    docs.filter($"doc_id" % 5 =!= 0).write.parquet(trainPath)
    docs.filter($"doc_id" % 5 === 0).write.parquet(testPath)

    Cli.main(Array("classify", "train", "--in", trainPath, "--label", "lang",
      "--model", model, "--n", TextEntries.ClassifierN.toString))
    Cli.main(Array("classify", "predict", "--in", testPath, "--model", model,
      "--out", outPath))

    val got = spark.read.parquet(outPath)
      .as[(Long, String)].collect().toMap
    val w = Classifier.trainCentroid(
      spark.read.parquet(trainPath), "lang", "text", TextEntries.ClassifierN)
    val lib = Classifier.predictCentroid(
      spark.read.parquet(testPath), "doc_id", "text", w, TextEntries.ClassifierN)
      .as[(Long, String)].collect().toMap
    assert(got == lib)
    assert(got.nonEmpty)
  }

  test("classify train --min-count floors the persisted vocab like the library call") {
    val root = tmp("graft_classify_mc")
    val trainPath = s"$root/train.parquet"
    val model = s"$root/model"
    TextEntries.langSpiked(spark, sf("sf0.001")).filter($"doc_id" % 5 =!= 0)
      .write.parquet(trainPath)
    // n=3: the trigram vocab has a genuine rare tail at sf0.001 (every
    // BIGRAM on this corpus occurs >= 5 times, which left the first
    // version of this floor assertion vacuous at 635 == 635)
    Cli.main(Array("classify", "train", "--in", trainPath, "--label", "lang",
      "--model", model, "--n", "3", "--min-count", "5"))
    val saved = Classifier.load(spark, model).weights
      .collect().map(_.toSeq).toSet
    val lib = Classifier.trainCentroid(
      spark.read.parquet(trainPath), "lang", "text", 3, 1000000L, minCount = 5L)
      .collect().map(_.toSeq).toSet
    assert(saved == lib)
    // the floor must actually bind on this corpus
    val unfloored = Classifier.trainCentroid(
      spark.read.parquet(trainPath), "lang", "text", 3).count()
    assert(saved.size < unfloored)
  }

  test("save/load round-trips the weight table and the n-gram order") {
    val root = tmp("graft_classify_rt")
    val w = Classifier.trainCentroid(
      Seq(("a", "aaab"), ("b", "cccd")).toDF("cls", "text"), "cls", "text", n = 2)
    Classifier.save(spark, Classifier.CentroidModel(w, 2), root)
    val m = Classifier.load(spark, root)
    assert(m.n == 2)
    assert(m.weights.collect().map(_.toSeq).toSet == w.collect().map(_.toSeq).toSet)
  }
}
