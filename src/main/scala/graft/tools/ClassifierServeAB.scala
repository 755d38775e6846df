package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.TextEntries
import graft.text.Classifier

/** A/B of the two classifier SERVE paths over the gate's own spiked
  * corpus (r12 verdict item 4): the relational path (explode → tf
  * groupBy → broadcast join → score groupBy → argmax window) against
  * the fold path ([[graft.functions.CentroidPredict]] — one codegen'd
  * scan, zero shuffle). Both paths are bit-identical by ClassifierSpec's
  * parity pins; this tool measures the FACTOR at tier scale, training
  * once outside the timed region (training is shared cost — the serve
  * explode was what made classifier_confusion the suite's most
  * expensive per-byte query at sf10, 144 s in the r12 sweep).
  *
  * Usage: runMain graft.tools.ClassifierServeAB [sfDir]
  * Emits one JSON line (decade-log shape, loads recorded).
  */
object ClassifierServeAB {
  private def loadavg(): Seq[Double] =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).toSeq.map(_.toDouble)
      finally src.close()
    } catch { case _: Throwable => Seq.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val loadStart = loadavg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = TextEntries.langSpiked(spark, sfDir).localCheckpoint()
    val held = docs.filter(col("doc_id") % 5 === 0).localCheckpoint()
    val n = held.count()
    val w = Classifier.trainCentroid(
      docs.filter(col("doc_id") % 5 =!= 0), "lang", "text",
      TextEntries.ClassifierN, TextEntries.ClassifierScale,
      TextEntries.ClassifierMinCount).localCheckpoint()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def confusionOf(pred: org.apache.spark.sql.DataFrame): Long =
      pred.join(held.select(col("doc_id"), col("lang").as("lang_actual")), "doc_id")
        .groupBy("lang_actual", "pred").agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
    val (nJoin, joinS) = timed(confusionOf(
      Classifier.predictCentroid(held, "doc_id", "text", w, TextEntries.ClassifierN)))
    val (nFold, foldS) = timed(confusionOf(
      Classifier.predictCentroidFold(held, "doc_id", "text", w, TextEntries.ClassifierN)))
    require(nJoin == nFold && nJoin == n,
      s"serve paths disagree on doc count: join=$nJoin fold=$nFold held=$n")
    val load = (loadStart ++ loadavg()).mkString("[", ",", "]")
    println(s"""{"metric":"classifier_serve_ab","sf":"$sfDir","n_held":$n,""" +
      s""""join_s":$joinS,"fold_s":$foldS,""" +
      s""""factor":${if (foldS > 0) joinS / foldS else -1},"load":$load}""")
    spark.stop()
  }
}
