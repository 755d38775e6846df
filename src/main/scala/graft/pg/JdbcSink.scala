package graft.pg

import java.sql.DriverManager

import graft.cdc.CdcApply
import org.apache.spark.sql.DataFrame

/** Landing DataFrames in a live Postgres — the reference's target-DB write
  * path, distributed. Plain appends ride Spark's built-in JDBC sink
  * (partition-parallel batched INSERTs); CDC upserts execute the
  * SqlWriter-generated statements per partition, each executor holding one
  * connection — the 1000-executor analogue of the reference's pooled
  * row-at-a-time writes.
  *
  * No live database exists in this container, so this class is exercised
  * only at the statement-generation layer in tests; the execution path is
  * the thin loop below.
  */
object JdbcSink {

  /** Bulk append via Spark's JDBC writer (LOAD-file landing). */
  def append(df: DataFrame, url: String, schema: String, table: String,
      user: String, password: String): Unit =
    CdcApply.stripServiceColumns(df)
      .write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", s"$schema.$table")
      .option("user", user)
      .option("password", password)
      .option("batchsize", 10000)
      .mode("append")
      .save()

  /** Execute CDC upsert/delete statements per partition (CDC-file landing).
    * `delayMsPerBatch` throttles writes every `batchSize` statements — the
    * distributed analogue of the reference's DELAY_INSERT/INSERT_DELAY/
    * ROWS_PER_DF backpressure knobs (postgres_operator_impl.rs:407-438),
    * applied per executor rather than on one writer thread. */
  def applyCdc(df: DataFrame, url: String, schema: String, table: String,
      primaryKeys: Seq[String], user: String, password: String,
      batchSize: Int = 10000, delayMsPerBatch: Long = 0L): Unit = {
    SqlWriter.upsertStatements(df, schema, table, primaryKeys)
      .foreachPartition { (stmts: Iterator[String]) =>
        val conn = DriverManager.getConnection(url, user, password)
        try {
          val st = conn.createStatement()
          var n = 0
          stmts.foreach { s =>
            st.execute(s)
            n += 1
            if (delayMsPerBatch > 0 && n % batchSize == 0)
              Thread.sleep(delayMsPerBatch)
          }
          st.close()
        } finally conn.close()
      }
  }
}
