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

  /** Bulk append via Spark's JDBC writer (LOAD-file landing).
    * `maxConnections` bounds concurrent writer connections — the
    * reference's `--max-connections` pool cap (main.rs:61-66) — via the
    * JDBC writer's numPartitions coalesce. */
  def append(df: DataFrame, url: String, schema: String, table: String,
      user: String, password: String, maxConnections: Int = 100): Unit =
    CdcApply.stripServiceColumns(df)
      .write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", s"$schema.$table")
      .option("user", user)
      .option("password", password)
      .option("batchsize", 10000)
      .option("numPartitions", maxConnections)
      .mode("append")
      .save()

  /** Execute CDC upsert/delete statements per partition (CDC-file landing).
    * Statements accumulate via addBatch/executeBatch in `batchSize` groups;
    * `delayMsPerBatch` sleeps between batches — the distributed analogue of
    * the reference's DELAY_INSERT/INSERT_DELAY/ROWS_PER_DF backpressure
    * knobs (postgres_operator_impl.rs:407-438). The throttle is per TASK
    * (one per partition): with T concurrent tasks the target sees up to T
    * parallel streams, so size the delay against
    * partitions × statements/sec, not a single writer. */
  def applyCdc(df: DataFrame, url: String, schema: String, table: String,
      primaryKeys: Seq[String], user: String, password: String,
      batchSize: Int = 10000, delayMsPerBatch: Long = 0L): Unit =
    execute(SqlWriter.upsertStatements(df, schema, table, primaryKeys),
      url, user, password, batchSize, delayMsPerBatch)

  /** Execute a distributed set of SQL statements per partition — the
    * shared landing loop behind [[applyCdc]] and the streaming SCD2
    * landing ([[graft.streaming.Scd2Landing]]): one connection per task,
    * addBatch/executeBatch in `batchSize` groups, optional per-task
    * inter-batch delay (backpressure, see [[applyCdc]]). */
  def execute(statements: org.apache.spark.sql.Dataset[String],
      url: String, user: String, password: String,
      batchSize: Int = 10000, delayMsPerBatch: Long = 0L): Unit = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(delayMsPerBatch >= 0, s"delayMsPerBatch must be >= 0, got $delayMsPerBatch")
    statements.foreachPartition { (stmts: Iterator[String]) =>
      if (stmts.hasNext) { // skip connection setup for empty partitions
        val conn = DriverManager.getConnection(url, user, password)
        try {
          val st = conn.createStatement()
          var inBatch = 0
          stmts.foreach { s =>
            st.addBatch(s)
            inBatch += 1
            if (inBatch == batchSize) {
              st.executeBatch()
              inBatch = 0
              if (delayMsPerBatch > 0) Thread.sleep(delayMsPerBatch)
            }
          }
          if (inBatch > 0) st.executeBatch()
          st.close()
        } finally conn.close()
      }
    }
  }
}
