package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    RunPaths.pin(sfDir) // oracle SQL must name the run's landings
    new java.io.File(outDir).mkdirs()
    // A query that throws must POISON the artifact, not vanish from it:
    // round 8 proved a 5-query breakage can read as "75/76 green" to
    // anyone diffing only the JSON. Failures are collected, summarized,
    // dumped to _failures.json, and turn the exit code nonzero.
    val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try {
        // repartition(1), NOT coalesce(1): coalesce collapses the whole
        // query pipeline into ONE task (a 500 k-doc fold ran
        // single-threaded); repartition keeps upstream parallelism and
        // only the (small) result crosses one exchange into one file
        fn(spark, sfDir).repartition(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name -> Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracle = SparkEntry.oracleSql
    // Any oracle that reads a /tmp landing must name THIS run's landing
    // (the one the query lambdas derived from sfDir) — a stale or default
    // tag silently zeroes the comparison instead of erroring.
    oracle.foreach { case (k, sql) =>
      if (sql.contains("/tmp/graft_prune_audit/"))
        require(sql.contains(s"/tmp/graft_prune_audit/${RunPaths.tag(sfDir)}/"),
          s"oracle '$k' names a prune-audit landing that is not this run's " +
            s"(expected tag ${RunPaths.tag(sfDir)})")
    }
    val json = oracle
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failures.nonEmpty) {
      val fj = failures.map { case (k, m) => s"${q(k)}: ${q(m.take(500))}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/_failures.json"), fj)
      System.err.println(
        s"[verify] FAILED ${failures.size}/${SparkEntry.queries.size}: " +
          failures.map(_._1).sorted.mkString(", "))
    }
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
