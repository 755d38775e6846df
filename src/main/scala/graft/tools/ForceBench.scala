package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Honest-cost bench for queries whose `count()` plan LEGALLY collapses:
  * Spark ≥3.4 propagates distinct keys, so a final left join against a
  * per-key aggregate is eliminated when no column is consumed — Bench's
  * `count()` then measures scan+nothing (dedup_passages was the first
  * recorded case, text_perplexity the second). This tool forces every
  * output column through `sum(xxhash64(struct(*)))`, which no rule can
  * prune, at the same session shape as Bench (local[N], N shuffle
  * partitions, same warmup). Use for the `*_forced` rows in
  * BENCH_decade jsonl records; the driver's count()-based BENCH numbers
  * stay the comparable contract.
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ForceBench q1 q2".
  */
object ForceBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val selected =
      if (args.isEmpty) graft.SparkEntry.queries
      else graft.SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // bit_xor, not sum: a 64-bit hash sum overflows under ANSI mode
      fn(spark, sfDir).select(xxhash64(struct(col("*"))).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"forced","unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
