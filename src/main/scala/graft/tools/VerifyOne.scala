package graft.tools

import graft.{RunPaths, SparkEntry}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Single-query slice of [[graft.Verify]] for fast iteration: runs only the
  * named queries and writes an oracle_sql.json restricted to them, so
  * `tools/check.py <sfDir> <outDir>` gates just the slice.
  *
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <query> [query...]
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    RunPaths.pin(sfDir)
    new java.io.File(outDir).mkdirs()
    names.toSeq.sorted.foreach { name =>
      val t0 = System.nanoTime()
      // repartition(1) not coalesce(1) — same single-file contract,
      // parallel upstream (see Verify)
      SparkEntry.queries(name)(spark, sfDir).repartition(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[verify-one] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
