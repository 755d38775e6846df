package graft.cdc

import org.apache.spark.sql.types.StructType

/** Schema-drift detection between a parquet file and the source table —
  * the reference aborts a table when a LOAD file carries a column the
  * source table lacks, ignoring the DMS service columns
  * (/root/reference/src/cdc/cdc_operator.rs:171-186). graft reports the
  * full drift (added / dropped / retyped) instead of just a boolean.
  */
object SchemaGuard {

  case class Drift(
      added: Seq[String],     // in file, not in table
      dropped: Seq[String],   // in table, not in file
      retyped: Seq[(String, String, String)]) { // name, tableType, fileType
    def isEmpty: Boolean = added.isEmpty && dropped.isEmpty && retyped.isEmpty
  }

  /** Compare a parquet file schema against the expected table columns
    * (name → type string), ignoring DMS service columns. */
  def diff(fileSchema: StructType, tableColumns: Map[String, String]): Drift = {
    val fileCols = fileSchema.fields
      .filterNot(f => CdcApply.ServiceColumns.contains(f.name))
    val added = fileCols.map(_.name).filterNot(tableColumns.contains)
    val dropped = tableColumns.keys.toSeq
      .filterNot(fileCols.map(_.name).contains)
    val retyped = fileCols.flatMap { f =>
      tableColumns.get(f.name) match {
        case Some(t) if t != f.dataType.simpleString =>
          Some((f.name, t, f.dataType.simpleString))
        case _ => None
      }
    }
    Drift(added.toSeq, dropped, retyped.toSeq)
  }

  /** The reference's go/no-go: any column in the file missing from the
    * table schema aborts (added columns only). */
  def hasBlockingDrift(fileSchema: StructType, tableColumns: Map[String, String]): Boolean =
    diff(fileSchema, tableColumns).added.nonEmpty

  /** Name-only variant for the snapshot path, where the expected column
    * set comes from config or information_schema reflection (types are
    * not part of the reference's go/no-go). Returns the offending
    * columns: file columns (minus service + caller-ignored columns)
    * absent from the table. */
  def blockingColumns(
      fileSchema: StructType,
      tableColumns: Seq[String],
      ignore: Seq[String] = Seq.empty): Seq[String] =
    fileSchema.fields.map(_.name)
      .filterNot(c => CdcApply.ServiceColumns.contains(c) || ignore.contains(c))
      .filterNot(tableColumns.contains)
      .toSeq
}
