package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round instrumentation: dump `.explain("formatted")` for
  * every declared query (or an argv subset) without running the final
  * action — plan-shape evidence for plans/rNN/<query>_{before,after}.txt.
  *
  * Caveat: "no action" holds only for fully-lazy queries. Several
  * declared queries do EAGER work at DataFrame-construction time
  * (PageRank's iteration loop with per-round localCheckpoint, BPE
  * training's per-round collects, withOrderedPosition's zipWithIndex
  * partition-count job, the *_indexed/_incremental index builds), so a
  * dump of those runs most of the query at SPARK_GRAFT_SF_DIR scale —
  * point SPARK_GRAFT_SF_DIR at a small dataset when only the shape
  * matters. Unknown query-name args are reported to stderr instead of
  * being silently ignored.
  *
  * Session conf mirrors Bench exactly so the captured plan is the plan
  * the bench runs (same shuffle partitions, AQE, timezone).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: PlanDump <outDir> [queryName...]")
    val outDir = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val selected =
      if (args.length == 1) SparkEntry.queries
      else {
        val asked = args.drop(1).toSet
        asked.diff(SparkEntry.queries.keySet).toSeq.sorted.foreach(q =>
          System.err.println(s"[plandump] unknown query name: $q"))
        SparkEntry.queries.view.filterKeys(asked).toMap
      }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), txt)
      } catch { case e: Throwable =>
        Files.writeString(Paths.get(s"$outDir/$name.txt"),
          s"PLAN FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
