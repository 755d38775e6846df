package graft.pg

/** Live-database schema reflection — executes Ddl's information_schema /
  * pg_index queries the way the reference's operator does
  * (/root/reference/src/postgres/postgres_operator_impl.rs:65-167:
  * `get_table_columns`, `get_primary_key`, `get_tables_in_schema`), so the
  * primary key and column set come from the database instead of config or
  * a first-column guess.
  *
  * All logic runs over a caller-supplied `QueryRunner` (`sql => rows of
  * strings`) so it is unit-testable without a live server; `runner(cfg)`
  * provides the JDBC-backed one.
  */
object Reflect {

  /** Executes one SQL query, returns rows as string columns. */
  type QueryRunner = String => Seq[Seq[String]]

  /** JDBC-backed runner: one short-lived connection per call (reflection
    * runs a handful of times per snapshot — pooling is not worth a dep). */
  def runner(cfg: PgConfig): QueryRunner = sql => {
    val conn = cfg.connect()
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        val n = rs.getMetaData.getColumnCount
        val buf = Seq.newBuilder[Seq[String]]
        while (rs.next()) buf += (1 to n).map(rs.getString)
        buf.result()
      } finally st.close()
    } finally conn.close()
  }

  /** Primary-key columns of schema.table, in index order
    * (postgres_operator_impl.rs:91-110; empty when the table has no pk). */
  def primaryKey(run: QueryRunner, schema: String, table: String): Seq[String] =
    run(Ddl.findPrimaryKey(table, schema)).map(_.head)

  /** Ordered (column, data_type) pairs with the reference's ARRAY→text[]
    * normalization (postgres_operator_impl.rs:65-89). */
  def tableColumns(run: QueryRunner, schema: String, table: String): Seq[(String, String)] =
    run(Ddl.findAllColumns(schema, table)).collect {
      case Seq(name, dt) => name -> (if (dt == "ARRAY") "text[]" else dt)
    }

  /** Tables in a schema under include/exclude selection
    * (postgres_operator_impl.rs:123-167). */
  def tablesInSchema(
      run: QueryRunner, schema: String,
      included: Seq[String] = Seq.empty,
      excluded: Seq[String] = Seq.empty): Seq[String] =
    run(Ddl.findTablesForSchema(schema, Ddl.tableFilterSubquery(included, excluded)))
      .map(_.head)

  /** pk resolver for CdcOperator.SnapshotConfig: reflect from the source
    * database, degrade to empty (→ the operator's guess path) on any
    * connection/query failure rather than failing the whole snapshot. */
  def pkResolver(cfg: PgConfig, schema: String): String => Seq[String] = {
    val run = runner(cfg)
    table =>
      try primaryKey(run, schema, table)
      catch {
        case e: Exception =>
          System.err.println(s"[graft] pk reflection failed for '$schema.$table': ${e.getMessage}")
          Seq.empty
      }
  }

  /** Column-set resolver for the snapshot path's schema-drift guard
    * (CdcOperator.SnapshotConfig.columnResolver): the reference compares
    * the LOAD parquet schema against the source table's
    * information_schema columns and aborts on drift
    * (cdc_operator.rs:171-186). Degrades to empty (guard inert) on
    * reflection failure, same policy as pkResolver. */
  def columnResolver(cfg: PgConfig, schema: String): String => Seq[String] = {
    val run = runner(cfg)
    table =>
      try tableColumns(run, schema, table).map(_._1)
      catch {
        case e: Exception =>
          System.err.println(s"[graft] column reflection failed for '$schema.$table': ${e.getMessage}")
          Seq.empty
      }
  }
}
