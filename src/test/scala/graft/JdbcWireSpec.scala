package graft

import java.nio.file.Files
import java.sql.DriverManager

import scala.collection.immutable.ListMap

import graft.pg.{Ddl, JdbcSink, Reflect, SqlWriter}
import org.apache.spark.sql.functions._

/** C6 JDBC wire-transport integration (reference:
  * postgres_operator_impl.rs:201-404 runs over a live Postgres wire).
  *
  * The offline build environment carries no Postgres JDBC driver jar
  * (resolution attempt documented in README), but JdbcSink's execution
  * layer is driver-agnostic — plain `java.sql.DriverManager` +
  * `addBatch`/`executeBatch`, and Spark's generic JDBC source — so the
  * DuckDB JDBC driver already present in the offline cache (wired onto the
  * TEST classpath only, build.sbt) exercises the identical code path
  * against a live embedded database: real connections, real batches, real
  * ON CONFLICT upserts (DuckDB shares Postgres's upsert syntax). Tests
  * self-cancel when the driver jar is absent.
  */
class JdbcWireSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val driverLoaded: Boolean =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: Throwable => false }

  private def withDb(f: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-jdbc-wire")
    f(s"jdbc:duckdb:${dir.resolve("wire.db")}")
  }

  private def exec(url: String, statements: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try statements.foreach(st.execute) finally st.close()
    } finally conn.close()
  }

  private def queryRows(url: String, sql: String): Seq[Seq[String]] = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        val n = rs.getMetaData.getColumnCount
        val buf = Seq.newBuilder[Seq[String]]
        while (rs.next()) buf += (1 to n).map(i => String.valueOf(rs.getString(i)))
        buf.result()
      } finally st.close()
    } finally conn.close()
  }

  test("C6 wire: applyCdc lands inserts, upserts and deletes over a live JDBC connection") {
    assume(driverLoaded, "duckdb JDBC driver jar not present in offline cache")
    withDb { url =>
      exec(url,
        Ddl.createSchema("graft_wire"),
        Ddl.createTable("graft_wire", "accounts",
          ListMap("id" -> "bigint", "name" -> "text", "balance" -> "bigint"),
          Seq("id")))
      // one ordered CDC stream: inserts, an update, a delete, a re-insert;
      // single partition so statement order is the feed order (a real run
      // partitions by pk upstream so per-key order is preserved)
      val feed = Seq(
        (1L, "alice", 10L, "I"),
        (2L, "bob", 20L, "I"),
        (3L, "carol", 30L, "I"),
        (1L, "alice2", 15L, "U"),
        (2L, "bob", 20L, "D"),
        (4L, "dave", 40L, "I"))
        .toDF("id", "name", "balance", "Op")
        .coalesce(1)
      // batchSize=2 forces multiple executeBatch round-trips
      JdbcSink.applyCdc(feed, url, "graft_wire", "accounts",
        primaryKeys = Seq("id"), user = "", password = "", batchSize = 2)
      val got = queryRows(url,
        "SELECT id, name, balance FROM graft_wire.accounts ORDER BY id")
      assert(got == Seq(
        Seq("1", "alice2", "15"),
        Seq("3", "carol", "30"),
        Seq("4", "dave", "40")))
    }
  }

  test("C6 wire: applyCdc upsert of a NEW key inserts (ON CONFLICT arm untaken)") {
    assume(driverLoaded, "duckdb JDBC driver jar not present in offline cache")
    withDb { url =>
      exec(url,
        Ddl.createSchema("graft_wire"),
        Ddl.createTable("graft_wire", "t",
          ListMap("id" -> "bigint", "v" -> "text"), Seq("id")))
      val feed = Seq((7L, "x", "U"), (7L, "y", "U")).toDF("id", "v", "Op").coalesce(1)
      JdbcSink.applyCdc(feed, url, "graft_wire", "t", Seq("id"), "", "")
      assert(queryRows(url, "SELECT id, v FROM graft_wire.t") == Seq(Seq("7", "y")))
    }
  }

  test("C6 wire: bulk append via Spark's JDBC writer, service columns stripped") {
    assume(driverLoaded, "duckdb JDBC driver jar not present in offline cache")
    withDb { url =>
      // pre-create via graft's own DDL — the DMS landing flow (Spark 4's
      // table-existence probe rethrows DuckDB's unclassifiable missing-
      // table error, and auto-create is not the path under test anyway)
      exec(url,
        Ddl.createSchema("graft_wire"),
        Ddl.createTable("graft_wire", "landed",
          ListMap("id" -> "bigint", "name" -> "text"), Seq("id")))
      val load = Seq(
        (1L, "a", "2024-01-01 00:00:00"),
        (2L, "b", "2024-01-01 00:00:01"),
        (3L, "c", "2024-01-01 00:00:02"))
        .toDF("id", "name", "_dms_ingestion_timestamp")
      // maxConnections=1: embedded DuckDB allows one writer transaction at
      // a time; the knob exists precisely to cap writer parallelism
      JdbcSink.append(load, url, "graft_wire", "landed", "", "", maxConnections = 1)
      val got = queryRows(url, "SELECT id, name FROM graft_wire.landed ORDER BY id")
      assert(got == Seq(Seq("1", "a"), Seq("2", "b"), Seq("3", "c")))
      // the DMS service column must not have landed
      val cols = queryRows(url,
        "SELECT column_name FROM information_schema.columns " +
          "WHERE table_schema='graft_wire' AND table_name='landed'").map(_.head)
      assert(cols.toSet == Set("id", "name"))
    }
  }

  test("C5: word-form ops classify by first letter — UPDATE must not become a delete") {
    // a contains("D") test would turn "UPDATE" into DELETE-by-pk
    val df = Seq(
      (1L, "a", "INSERT"), (2L, "b", "UPDATE"), (3L, "c", "DELETE"), (4L, "d", "u"))
      .toDF("id", "v", "Op").coalesce(1)
    val stmts = SqlWriter.upsertStatements(df, "s", "t", Seq("id")).collect().toSeq
    assert(stmts.count(_.startsWith("DELETE")) == 1, stmts.mkString("\n"))
    assert(stmts.exists(s => s.contains("(2, 'b')") && s.contains("ON CONFLICT")))
    assert(stmts.exists(s => s.contains("(4, 'd')") && s.contains("ON CONFLICT")))
    assert(stmts.exists(s => s.contains("(1, 'a')") && !s.contains("ON CONFLICT")))
  }

  test("C6 wire: Reflect.tableColumns over a live JDBC QueryRunner") {
    assume(driverLoaded, "duckdb JDBC driver jar not present in offline cache")
    withDb { url =>
      exec(url,
        Ddl.createSchema("graft_wire"),
        Ddl.createTable("graft_wire", "users",
          ListMap("id" -> "bigint", "name" -> "text"), Seq("id")))
      val runner: Reflect.QueryRunner = sql => queryRows(url, sql)
      val cols = Reflect.tableColumns(runner, "graft_wire", "users")
      assert(cols.map(_._1) == Seq("id", "name"))
    }
  }
}
