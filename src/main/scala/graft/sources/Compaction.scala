package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-file sizing for snapshot/CDC landing — the small-file problem
  * at 100 TB: a 1000-task replay writing one file per task per table
  * floods the catalog with KB-scale parquet, and every later scan pays
  * per-file open cost. Landing through a REBALANCE hint lets AQE coalesce
  * or split shuffle output to evenly sized partitions at runtime, and
  * `maxRecordsPerFile` caps the top end; together they produce
  * similar-sized, bounded files regardless of upstream partitioning or
  * skew.
  */
object Compaction {

  /** Write `df` as parquet with evenly sized output files of at most
    * `maxRecordsPerFile` rows. */
  def landSized(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.hint("rebalance")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
