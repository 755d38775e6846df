package graft.tools

import java.time.Instant

import graft.cdc.CdcOperator
import graft.cdc.CdcOperator.{SnapshotConfig, ValidateConfig}
import graft.sources.DmsFileCatalog.{AbsolutePath, DateAware, FullLoadOnly, Mode}
import org.apache.spark.sql.SparkSession

/** Command-line client — the graft equivalent of the reference's
  * `dms-cdc-operator-client validate` (dms-cdc-operator-client/src/main.rs),
  * same option surface, Spark execution:
  *
  * {{{
  * sbt "runMain graft.tools.Cli validate
  *   --bucket-prefix file:/data/landing --database-name mydb
  *   [--database-schema public] [--included-tables a,b] [--excluded-tables c]
  *   [--mode date-aware|full-load-only|absolute-path] [--start-date ISO]
  *   [--stop-date ISO] [--chunk-size 1000] [--start-position 0]
  *   [--only-snapshot | --only-datadiff] [--target-parquet dir]"
  * }}}
  *
  * Snapshot replays each selected table to current state (written to
  * `--target-parquet/<table>` when given); datadiff validates replayed
  * state against the target parquet.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty || args.head != "validate") {
      System.err.println("usage: Cli validate --bucket-prefix <uri> --database-name <db> [options]")
      sys.exit(2)
    }
    val opts = parse(args.tail)
    def req(k: String): String = opts.getOrElse(k,
      { System.err.println(s"missing required --$k"); sys.exit(2); "" })

    val mode: Mode = opts.getOrElse("mode", "date-aware") match {
      case "full-load-only" => FullLoadOnly
      case "absolute-path"  => AbsolutePath(req("absolute-path"))
      case "date-aware" =>
        val start = opts.get("start-date").map(Instant.parse).getOrElse {
          System.err.println("start_date is required for DateAware mode"); sys.exit(2); Instant.EPOCH
        }
        DateAware(start, opts.get("stop-date").map(Instant.parse))
      case other =>
        System.err.println(s"unknown mode: $other"); sys.exit(2); FullLoadOnly
    }

    // --pk "users=id;lineitem=l_orderkey,l_linenumber" (composite keys by comma)
    val pkByTable: Map[String, Seq[String]] =
      opts.get("pk").map(_.split(';').toSeq.flatMap { e =>
        e.split('=') match {
          case Array(t, cols) => Some(t -> cols.split(',').toSeq)
          case _ => System.err.println(s"bad --pk entry: $e"); sys.exit(2); None
        }
      }.toMap).getOrElse(Map.empty)

    val cfg = SnapshotConfig(
      bucketPrefix = req("bucket-prefix"),
      databaseName = req("database-name"),
      schemaName = opts.getOrElse("database-schema", "public"),
      includedTables = opts.get("included-tables").map(_.split(',').toSeq).getOrElse(Seq.empty),
      excludedTables = opts.get("excluded-tables").map(_.split(',').toSeq).getOrElse(Seq.empty),
      mode = mode,
      pkByTable = pkByTable)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val onlyDatadiff = opts.contains("only-datadiff")
    val onlySnapshot = opts.contains("only-snapshot")

    val states = CdcOperator.snapshot(spark, cfg)
    println(s"[cli] tables: ${states.map(_.table).mkString(", ")}")

    if (!onlyDatadiff) {
      opts.get("target-parquet").foreach { out =>
        states.foreach { t =>
          t.state.write.mode("overwrite").parquet(s"$out/${t.table}")
          println(s"[cli] snapshot ${t.table}: ${t.state.count()} rows -> $out/${t.table}")
        }
      }
      if (opts.get("target-parquet").isEmpty)
        states.foreach(t => println(s"[cli] snapshot ${t.table}: ${t.state.count()} rows"))
    }

    if (!onlySnapshot) {
      opts.get("target-parquet").foreach { out =>
        val vcfg = ValidateConfig(
          chunkSize = opts.getOrElse("chunk-size", "1000").toLong,
          startPosition = opts.getOrElse("start-position", "0").toLong,
          onlyCount = opts.contains("only-count"))
        states.foreach { t =>
          val target = spark.read.parquet(s"$out/${t.table}")
          val pk = cfg.pkByTable.getOrElse(t.table, Seq(t.state.columns.head))
          val report = CdcOperator.validate(t.state, target, pk, t.table, vcfg).head()
          println(s"[cli] validate ${t.table}: $report")
        }
      }
    }
    spark.stop()
  }

  private def parse(args: Seq[String]): Map[String, String] = {
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case flag :: tail if flag.startsWith("--") =>
        val key = flag.stripPrefix("--")
        tail match {
          case v :: t2 if !v.startsWith("--") => loop(t2, acc + (key -> v))
          case _ => loop(tail, acc + (key -> "true")) // boolean flag
        }
      case _ :: tail => loop(tail, acc)
    }
    loop(args.toList, Map.empty)
  }
}
