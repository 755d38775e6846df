package graft.pg

import graft.cdc.CdcApply
import org.apache.spark.sql.{DataFrame, Row}

/** Distributed SQL-statement generation for landing DataFrames in Postgres.
  *
  * The reference builds INSERT batches on a single thread from a whole
  * in-memory DataFrame (postgres_operator_impl.rs:201-298). Here statement
  * generation happens per partition — each executor renders its own rows —
  * so at 100 TB no driver ever materializes data. The output is a
  * Dataset[String] of statements (or is handed directly to JdbcSink, which
  * executes per partition).
  */
object SqlWriter {

  /** Chunked multi-row INSERTs per partition, DMS service columns dropped
    * (reference drops Op/_dms_ingestion_timestamp before landing). */
  def insertStatements(
      df: DataFrame,
      schema: String,
      table: String,
      rowsPerStatement: Int = 10000): org.apache.spark.sql.Dataset[String] = {
    val clean = CdcApply.stripServiceColumns(df)
    val columns = clean.columns.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    clean.mapPartitions { rows =>
      rows.grouped(rowsPerStatement).map { chunk =>
        Ddl.insertChunk(schema, table, columns, chunk.map(renderRow))
      }
    }
  }

  /** Per-row upsert statements honoring the Op column: D → DELETE by pk,
    * U → INSERT ON CONFLICT UPDATE, I → INSERT
    * (reference: postgres_operator_impl.rs:300-404). */
  def upsertStatements(
      df: DataFrame,
      schema: String,
      table: String,
      primaryKeys: Seq[String],
      opCol: String = "Op"): org.apache.spark.sql.Dataset[String] = {
    val dataCols = df.columns.filterNot(c => CdcApply.ServiceColumns.contains(c)).toSeq
    val pkIdx = primaryKeys.map(df.columns.indexOf(_))
    val dataIdx = dataCols.map(df.columns.indexOf(_))
    val opIdx = df.columns.indexOf(opCol)
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { rows =>
      rows.map { r =>
        // classify on the FIRST letter: DMS writes single letters, but a
        // word-form feed ("UPDATE") must not match a contains("D") test
        // and become a delete
        val op = Option(r.get(opIdx)).map(_.toString.trim.toUpperCase).getOrElse("")
        if (op.startsWith("D"))
          Ddl.deleteRows(schema, table, primaryKeys,
            pkIdx.map(i => ValueRenderer.render(r.get(i))))
        else
          Ddl.upsert(schema, table, dataCols,
            dataIdx.map(i => ValueRenderer.render(r.get(i))),
            primaryKeys, isUpdate = op.startsWith("U"))
      }
    }
  }

  private def renderRow(r: Row): Seq[String] =
    (0 until r.length).map(i => ValueRenderer.render(r.get(i)))
}
