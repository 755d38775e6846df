package graft

import java.nio.file.{Files, Path}

import scala.sys.process._

import graft.cdc.CdcApply
import graft.pg.{Ddl, Reflect, SqlWriter}
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Integration tests against a LIVE PostgreSQL server (C6/A0 execution
  * layer). The container ships postgres 15 but no JDBC driver jar, so the
  * JDBC transport itself (JdbcSink) cannot run here; instead every piece
  * of SQL graft GENERATES — DDL, reflection queries, CDC upsert/delete
  * statements — is executed through psql against a real server, and
  * Reflect runs end-to-end through a psql-backed QueryRunner. Tests
  * self-cancel when no server is reachable, so the suite stays green in
  * postgres-less environments.
  */
class PgLiveSpec extends SparkSpecBase {
  import spark.implicits._

  private val tmp: Path = {
    val d = Files.createTempDirectory("graft-pglive")
    d.toFile.setReadable(true, false)
    d.toFile.setExecutable(true, false) // postgres OS user must cd here
    d
  }

  /** Run one psql invocation as the postgres OS user from a directory it
    * can read. Returns (exit code, stdout, stderr). */
  private def psql(args: Seq[String], stdin: Option[String] = None): (Int, String, String) = {
    val cmd = Seq("runuser", "-u", "postgres", "--", "psql",
      "-v", "ON_ERROR_STOP=1", "-X", "-q", "-At", "-F", "\t") ++ args
    val out = new StringBuilder
    val err = new StringBuilder
    val logger = ProcessLogger(
      l => { out.append(l).append('\n') },
      l => { err.append(l).append('\n') })
    val p = Process(cmd, tmp.toFile)
    val rc = stdin match {
      case Some(s) => (p #< new java.io.ByteArrayInputStream(s.getBytes("UTF-8"))).!(logger)
      case None    => p.!(logger)
    }
    (rc, out.toString, err.toString)
  }

  private lazy val live: Boolean = {
    val up = try psql(Seq("-c", "SELECT 1"))._1 == 0 catch { case _: Exception => false }
    if (up) {
      psql(Seq("-c", "DROP SCHEMA IF EXISTS graft_it CASCADE"))
      assert(psql(Seq("-c", Ddl.createSchema("graft_it")))._1 == 0)
    }
    up
  }

  /** Reflect.QueryRunner over psql: tab-separated, tuples-only output. */
  private def psqlRunner: Reflect.QueryRunner = sqlText => {
    val (rc, out, err) = psql(Seq("-c", sqlText))
    assert(rc == 0, s"psql failed for: $sqlText\n$err")
    out.linesIterator.filter(_.nonEmpty).map(_.split("\t", -1).toSeq).toSeq
  }

  /** Execute generated statements; DELETEs come without a terminator
    * (JdbcSink executes them one-per-addBatch), so add one for psql. */
  private def execSql(statements: Seq[String]): Unit = {
    val script = statements.map(s => if (s.trim.endsWith(";")) s else s + ";").mkString("\n")
    val (rc, _, err) = psql(Seq.empty, stdin = Some(script))
    assert(rc == 0, s"psql batch failed:\n$err")
  }

  test("A0 live: reflected pk and columns match the created table") {
    assume(live, "no live postgres")
    execSql(Seq(Ddl.createTable("graft_it", "users",
      ListMap("id" -> "bigint", "region" -> "text", "tags" -> "text[]",
        "name" -> "character varying"),
      Seq("id", "region")) + ";"))
    assert(Reflect.primaryKey(psqlRunner, "graft_it", "users") == Seq("id", "region"))
    val cols = Reflect.tableColumns(psqlRunner, "graft_it", "users").toMap
    assert(cols("id") == "bigint")
    assert(cols("tags") == "text[]") // information_schema says ARRAY; Reflect normalizes
    assert(cols("name") == "character varying")
  }

  test("A0 live: tablesInSchema honors include/exclude subqueries") {
    assume(live, "no live postgres")
    execSql(Seq(
      Ddl.createTable("graft_it", "t_a", ListMap("id" -> "bigint"), Seq("id")) + ";",
      Ddl.createTable("graft_it", "t_b", ListMap("id" -> "bigint"), Seq("id")) + ";"))
    val all = Reflect.tablesInSchema(psqlRunner, "graft_it")
    assert(Set("t_a", "t_b").subsetOf(all.toSet))
    assert(Reflect.tablesInSchema(psqlRunner, "graft_it", included = Seq("t_a")) == Seq("t_a"))
    assert(!Reflect.tablesInSchema(psqlRunner, "graft_it", excluded = Seq("t_b")).contains("t_b"))
  }

  test("C5 live: generated upsert/delete statements replay CDC to the same state as Spark") {
    assume(live, "no live postgres")
    execSql(Seq(Ddl.createTable("graft_it", "cdc_t",
      ListMap("id" -> "bigint", "v" -> "text"), Seq("id")) + ";"))
    // out-of-the-box CDC batch: inserts, an update, a delete, a re-insert,
    // plus a value that exercises single-quote escaping
    val batch = Seq(
      ("I", 1L, "one"), ("I", 2L, "two"), ("I", 3L, "it's three"),
      ("U", 2L, "two-v2"), ("D", 3L, "ignored"), ("I", 4L, "four"),
      ("D", 4L, "ignored"), ("I", 4L, "four-back"))
      .toDF("Op", "id", "v")
    val stmts = SqlWriter.upsertStatements(batch.coalesce(1), "graft_it", "cdc_t", Seq("id"))
      .collect().toSeq
    execSql(stmts)
    val pgState = psqlRunner("SELECT id, v FROM graft_it.cdc_t ORDER BY id")
      .map(r => (r(0).toLong, r(1))).toMap
    val sparkState = CdcApply.latestState(
      batch.withColumn("__seq", monotonically_increasing_id()),
      Seq("id"), Seq(col("__seq"))).drop("__seq")
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(pgState == sparkState)
    assert(pgState == Map(1L -> "one", 2L -> "two-v2", 4L -> "four-back"))
  }

  test("C2 live: Spark-schema-derived CREATE TABLE executes for diverse types") {
    assume(live, "no live postgres")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DecimalType(12, 2)), StructField("score", DoubleType),
      StructField("active", BooleanType), StructField("created", TimestampType),
      StructField("tags", ArrayType(StringType))))
    val cols = ListMap(schema.fields.map(f =>
      f.name -> graft.pg.TypeMapper.sparkToPg(f.dataType)): _*)
    execSql(Seq(Ddl.createTable("graft_it", "typed_t", cols, Seq("id")) + ";"))
    val reflected = Reflect.tableColumns(psqlRunner, "graft_it", "typed_t").toMap
    assert(reflected.keySet == schema.fieldNames.toSet)
    assert(Reflect.primaryKey(psqlRunner, "graft_it", "typed_t") == Seq("id"))
    assert(reflected("tags") == "text[]")
  }

  test("A5 live: reflected columns feed the schema-drift guard end-to-end") {
    assume(live, "no live postgres")
    import graft.cdc.CdcOperator
    import graft.cdc.CdcOperator.SnapshotConfig
    // source table has (id, v); the landing parquet carries an EXTRA
    // column — the live-reflected column set must abort the table, the
    // reference's behavior (cdc_operator.rs:171-186)
    execSql(Seq(Ddl.createTable("graft_it", "guard_t",
      ListMap("id" -> "bigint", "v" -> "text"), Seq("id")) + ";"))
    val root = java.nio.file.Files.createTempDirectory("graft-live-guard")
    def land(table: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tdir = root.resolve(s"landing/db/graft_it/$table/2024/02/14")
      java.nio.file.Files.createDirectories(tdir)
      val tmp = java.nio.file.Files.createTempDirectory("p")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, tdir.resolve("LOAD00000001.parquet"))
    }
    land("guard_t", Seq((1L, "a", "rogue")).toDF("id", "v", "extra"))
    land("clean_t", Seq((1L, "a")).toDF("id", "v"))
    execSql(Seq(Ddl.createTable("graft_it", "clean_t",
      ListMap("id" -> "bigint", "v" -> "text"), Seq("id")) + ";"))
    val cfg = SnapshotConfig(
      bucketPrefix = s"$root/landing", databaseName = "db", schemaName = "graft_it",
      pkByTable = Map("guard_t" -> Seq("id"), "clean_t" -> Seq("id")),
      columnResolver = t => Reflect.tableColumns(psqlRunner, "graft_it", t).map(_._1))
    assert(CdcOperator.snapshot(spark, cfg).map(_.table) == Seq("clean_t"))
  }

  test("C5 live: chunked insertStatements land all rows") {
    assume(live, "no live postgres")
    execSql(Seq(Ddl.createTable("graft_it", "bulk_t",
      ListMap("id" -> "bigint", "v" -> "text"), Seq("id")) + ";"))
    val df = spark.range(0, 100).select($"id", concat(lit("v"), $"id").as("v"))
    val stmts = SqlWriter.insertStatements(df, "graft_it", "bulk_t", rowsPerStatement = 7)
      .collect().toSeq.map(_ + ";")
    execSql(stmts)
    assert(psqlRunner("SELECT count(*), min(id), max(id) FROM graft_it.bulk_t").head ==
      Seq("100", "0", "99"))
  }
}
