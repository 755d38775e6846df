package graft.pg

import scala.collection.immutable.ListMap

/** Postgres DDL/DML statement generation — the reference's query surface
  * (/root/reference/src/postgres/table_query.rs) as pure functions.
  * Column order is preserved (the reference uses an IndexMap).
  */
object Ddl {

  def findAllColumns(schema: String, table: String): String =
    s"""SELECT column_name, data_type
       |FROM information_schema.columns
       |WHERE table_schema = '$schema'
       |AND table_name = '$table'""".stripMargin

  def findTablesForSchema(schema: String, subquery: String): String =
    s"""SELECT table_name
       |FROM information_schema.tables
       |WHERE table_schema = '$schema' $subquery""".stripMargin.trim

  def findPrimaryKey(table: String, schema: String): String =
    s"""SELECT a.attname
       |FROM pg_index i
       |JOIN pg_attribute a ON a.attrelid = i.indrelid
       |AND a.attnum = ANY(i.indkey)
       |WHERE i.indrelid = '$schema.$table'::regclass
       |AND i.indisprimary""".stripMargin

  def createSchema(schema: String): String =
    s"CREATE SCHEMA IF NOT EXISTS $schema"

  def dropSchema(schema: String): String =
    s"DROP SCHEMA IF EXISTS $schema CASCADE"

  /** CREATE TABLE with ordered columns and optional composite pk
    * (reference: table_query.rs CreateTable). */
  def createTable(
      schema: String,
      table: String,
      columnTypes: ListMap[String, String],
      primaryKeys: Seq[String]): String = {
    val cols = columnTypes.map { case (c, t) => s"$c $t" }.mkString(",")
    val pk =
      if (primaryKeys.nonEmpty) s",PRIMARY KEY (${primaryKeys.mkString(",")})"
      else ""
    s"CREATE TABLE IF NOT EXISTS $schema.$table ($cols$pk)"
  }

  /** DELETE by (composite) pk tuple (reference: table_query.rs DeleteRows). */
  def deleteRows(
      schema: String, table: String,
      pkCols: Seq[String], pkValues: Seq[String]): String =
    s"DELETE FROM $schema.$table WHERE (${pkCols.mkString(",")})=(${pkValues.mkString(",")})"

  /** INSERT ... [ON CONFLICT (pk) DO UPDATE SET ...] — the reference's
    * upsert statement shape (postgres_operator_impl.rs:352-389). Note the
    * reference appends ON CONFLICT after the statement terminator
    * (`...);` + clause — invalid Postgres); graft emits the clause before
    * the terminator. The SET list excludes the conflict-target pk columns:
    * re-assigning them is a no-op in Postgres (the conflict row already
    * has those values) and a hard error in engines that forbid writing
    * constrained columns (DuckDB). All-pk tables degrade to DO NOTHING. */
  def upsert(
      schema: String, table: String,
      columns: Seq[String], values: Seq[String],
      primaryKeys: Seq[String], isUpdate: Boolean): String = {
    val base =
      s"INSERT INTO $schema.$table (${columns.mkString(", ")}) VALUES (${values.mkString(", ")})"
    if (!isUpdate) s"$base;"
    else {
      // case-insensitive: callers reflect pk names from the catalog and
      // column names from a DataFrame — re-including the conflict-target
      // column on a case mismatch is a hard error in DuckDB and defeats
      // the all-pk DO NOTHING degrade
      val sets = columns.zip(values)
        .filterNot { case (c, _) => primaryKeys.exists(_.equalsIgnoreCase(c)) }
        .map { case (c, v) => s"$c = $v" }.mkString(", ")
      val action = if (sets.isEmpty) "DO NOTHING" else s"DO UPDATE SET $sets"
      s"$base ON CONFLICT (${primaryKeys.mkString(",")}) $action;"
    }
  }

  /** Multi-row INSERT for a chunk (postgres_operator_impl.rs:258-266). */
  def insertChunk(
      schema: String, table: String,
      columns: Seq[String], rows: Seq[Seq[String]]): String = {
    val values = rows.map(r => s"(${r.mkString(", ")})").mkString(", ")
    s"INSERT INTO $schema.$table (${columns.mkString(", ")}) VALUES $values"
  }

  /** include/exclude/all table-selection subquery
    * (postgres_operator_impl.rs:123-160). */
  def tableFilterSubquery(included: Seq[String], excluded: Seq[String]): String =
    if (included.nonEmpty)
      s"AND table_name IN (${included.map(t => s"'$t'").mkString(", ")})"
    else if (excluded.nonEmpty)
      s"AND table_name NOT IN (${excluded.map(t => s"'$t'").mkString(", ")})"
    else ""
}
