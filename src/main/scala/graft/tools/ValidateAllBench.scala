package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.CdcOperator
import graft.cdc.CdcOperator.{ValidateConfig, ValidateTask}

/** Table-COUNT scaling measurement for A0e (r13 verdict item 7): the
  * listener test proves validateAll's jobs overlap; this records what
  * the overlap is worth at catalog scale — wall clock for a 100-table
  * validate at `--table-parallelism` 1 / 4 / 16 on the same fixture,
  * one JSON line for the BENCH jsonl.
  *
  * Fixture: the events table hash-sliced into N disjoint (source,
  * target) pairs per `user_id % N` — each slice a small table (the
  * catalog-of-small-tables shape where per-table job latency, not data
  * volume, dominates and the driver-side serialization of eager
  * actions is the bottleneck a pool hides). Slices are written to
  * parquet once so every parallelism level pays identical scan work,
  * and every 7th table gets one perturbed row so the runs also exercise
  * the drill-down path, not just the all-match fast exit.
  *
  * Usage: runMain graft.tools.ValidateAllBench [sfDir] [nTables]
  */
object ValidateAllBench {
  private def loadavg(): Seq[Double] =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).toSeq.map(_.toDouble)
      finally src.close()
    } catch { case _: Throwable => Seq.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nTables = args.lift(1).map(_.toInt).getOrElse(100)
    val loadStart = loadavg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_vab").toString
    val ev = graft.util.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    // land the catalog once: source partitioned by slice; target identical
    // except one flipped row in every 7th slice
    ev.withColumn("__t", pmod(col("user_id"), lit(nTables.toLong)))
      .write.partitionBy("__t").mode("overwrite").parquet(s"$root/src")
    ev.withColumn("__t", pmod(col("user_id"), lit(nTables.toLong)))
      .withColumn("value",
        when(pmod(col("user_id"), lit(nTables.toLong)) % 7 === 0 &&
          col("event_id") === min(col("event_id"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(
              pmod(col("user_id"), lit(nTables.toLong)))),
          col("value") + 1.0).otherwise(col("value")))
      .write.partitionBy("__t").mode("overwrite").parquet(s"$root/tgt")
    val nRows = spark.read.parquet(s"$root/src").count()

    def tasks(): Seq[ValidateTask] = (0 until nTables).map { i =>
      ValidateTask(
        spark.read.parquet(s"$root/src/__t=$i"),
        spark.read.parquet(s"$root/tgt/__t=$i"),
        Seq("event_id"), s"t$i")
    }
    val cfg = ValidateConfig(chunkSize = 1000, orderedChunks = false)
    def timed(p: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = CdcOperator.validateAll(tasks(), cfg, parallelism = p)
      ((System.nanoTime() - t0) / 1e9, rows.size.toLong)
    }
    // warmup absorbs scan/codegen costs so levels are comparable
    timed(4)
    val legs = Seq(1, 4, 16).map { p =>
      val (s, n) = timed(p)
      require(n == nTables.toLong, s"expected $nTables reports, got $n")
      p -> s
    }
    val legsJson = legs.map { case (p, s) => s""""p$p":$s""" }.mkString(",")
    val load = (loadStart ++ loadavg()).mkString("[", ",", "]")
    println(s"""{"metric":"validate_all","sf":"$sfDir","tables":$nTables,""" +
      s""""rows":$nRows,$legsJson,"load":$load}""")
    spark.stop()
  }
}
