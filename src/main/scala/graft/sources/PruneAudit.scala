package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-group pruning audit: given a landed parquet table and a range
  * predicate `lo ≤ c ≤ hi`, report how many row groups (and rows and
  * compressed bytes) the column's min/max statistics would let a
  * stats-aware scan SKIP — the measurement half of the layout
  * operators ([[Compaction.zOrderLand]], sorted landings,
  * [[Bucketed]]): a z-order that doesn't move `bytes_pruned` did
  * nothing for that predicate, and this query proves it either way
  * before anyone pays for a re-layout of a 100 TB table.
  *
  * Shape at scale: footers only — the audit reads file METADATA, never
  * data pages; work is one footer per file, distributed over the
  * executors (a 100k-file lake audits in one small stage). A row group
  * is counted prunable iff its stats exist and `max < lo ∨ min > hi`;
  * missing stats mean the scan must read the group, so they count as
  * kept — same rule an engine applies.
  *
  * Keys are INT64 (refused loudly otherwise): integer stats are exact
  * in every engine, so the whole audit — down to the byte counts —
  * oracle-checks bit-for-bit against DuckDB's `parquet_metadata()`
  * over the same files.
  *
  * Reference analogue: the catalog's pruned listing
  * (s3_operator.rs:133-210) skips whole FILES by date; this audits the
  * finer row-group tier the reference cannot see.
  */
object PruneAudit {

  /** One summary row: row_groups, rg_pruned, rows_total, rows_pruned,
    * bytes_total, bytes_pruned (compressed bytes, all columns of the
    * pruned groups — what the scan would not fetch). */
  def audit(
      spark: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty audit range [$lo, $hi]")
    val paths = spark.read.parquet(dir).inputFiles.sorted
    require(paths.nonEmpty, s"no parquet files under $dir")
    import spark.implicits._
    val perGroup = spark.sparkContext
      .parallelize(paths.toSeq, math.min(paths.length, 32))
      .flatMap { p =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(p), new Configuration()))
        try {
          reader.getFooter.getBlocks.asScala.map { b =>
            val chunk = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(throw new IllegalArgumentException(
                s"column $c not found in $p"))
            val tn = chunk.getPrimitiveType.getPrimitiveTypeName
            require(tn == PrimitiveTypeName.INT64,
              s"prune audit supports INT64 key columns; $c is $tn")
            val st = chunk.getStatistics
            val has = st != null && st.hasNonNullValue()
            val mn = if (has) st.genericGetMin.asInstanceOf[java.lang.Long].longValue else 0L
            val mx = if (has) st.genericGetMax.asInstanceOf[java.lang.Long].longValue else 0L
            val bytes = b.getColumns.asScala.map(_.getTotalSize).sum
            val pruned = has && (mx < lo || mn > hi)
            (b.getRowCount, bytes, if (pruned) 1L else 0L)
          }.toSeq
        } finally reader.close()
      }
      .toDF("rows", "bytes", "pruned")
    perGroup.agg(
      count(lit(1)).as("row_groups"),
      sum(col("pruned")).as("rg_pruned"),
      sum(col("rows")).as("rows_total"),
      sum(col("rows") * col("pruned")).as("rows_pruned"),
      sum(col("bytes")).as("bytes_total"),
      sum(col("bytes") * col("pruned")).as("bytes_pruned"))
  }
}
