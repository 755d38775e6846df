package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Row-group pruning audit: given a landed parquet table and a range
  * predicate `lo ≤ c ≤ hi`, report how many row groups (and rows and
  * compressed bytes) the column's min/max statistics would let a
  * stats-aware scan SKIP — the measurement half of the layout
  * operators ([[Compaction.zorderBy]], sorted landings,
  * [[Bucketed]]): a z-order that doesn't move `bytes_pruned` did
  * nothing for that predicate, and this query proves it either way
  * before anyone pays for a re-layout of a 100 TB table.
  *
  * Shape at scale: footers only — the audit reads file METADATA, never
  * data pages; work is one footer per file, distributed over the
  * executors (a 100k-file lake audits in one small stage). The
  * session's Hadoop configuration travels to the tasks in a broadcast
  * [[SerializableConfiguration]], so object-store settings set at the
  * session level (`spark.hadoop.fs.s3a.*` credentials, endpoints)
  * apply to the footer reads exactly as they do to a normal scan.
  * A row group is counted prunable iff its stats exist and
  * `max < lo ∨ min > hi`; missing stats mean the scan must read the
  * group, so they count as kept — same rule an engine applies.
  *
  * Key types (each refused loudly on mismatch):
  *  - INT64 via [[audit]] — integer stats are exact in every engine,
  *    so the audit oracle-checks bit-for-bit against DuckDB's
  *    `parquet_metadata()` over the same files.
  *  - DATE (INT32 days-since-epoch) via [[auditDate]] — also exact;
  *    the stats are plain ints under the logical annotation.
  *  - STRING (BINARY/UTF8) via [[auditString]] — compared UNSIGNED
  *    lexicographically (parquet's binary sort order), and
  *    truncation-aware: writers may truncate long binary stats, but
  *    only ever rounding min DOWN and max UP, so the truncated values
  *    are valid bounds and `max < lo ∨ min > hi` stays sound — a
  *    truncated footer can under-prune, never mis-prune.
  *
  * Reference analogue: the catalog's pruned listing
  * (s3_operator.rs:133-210) skips whole FILES by date; this audits the
  * finer row-group tier the reference cannot see.
  */
object PruneAudit {

  /** Per-type prune decision, evaluated executor-side per row group.
    * Implementations must be serializable and refuse a mismatched
    * column type loudly rather than mis-compare. */
  private sealed trait KeyRange extends Serializable {
    def pruned(chunk: ColumnChunkMetaData, file: String): Boolean

    /** stats, or None when absent/empty — absent stats never prune. */
    protected final def stats(chunk: ColumnChunkMetaData): Option[Statistics[_]] =
      Option(chunk.getStatistics).filter(_.hasNonNullValue())
  }

  private final case class LongRange(lo: Long, hi: Long) extends KeyRange {
    def pruned(chunk: ColumnChunkMetaData, file: String): Boolean = {
      val tn = chunk.getPrimitiveType.getPrimitiveTypeName
      require(tn == PrimitiveTypeName.INT64,
        s"audit(lo: Long, hi: Long) supports INT64 key columns; " +
          s"${chunk.getPath.toDotString} is $tn in $file " +
          "(dates → auditDate, strings → auditString)")
      stats(chunk).exists { st =>
        val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
        val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
        mx < lo || mn > hi
      }
    }
  }

  private final case class DateRange(loDays: Int, hiDays: Int) extends KeyRange {
    def pruned(chunk: ColumnChunkMetaData, file: String): Boolean = {
      val pt = chunk.getPrimitiveType
      val isDate = pt.getPrimitiveTypeName == PrimitiveTypeName.INT32 &&
        pt.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
      require(isDate,
        s"auditDate needs a DATE (INT32/date) key column; " +
          s"${chunk.getPath.toDotString} is ${pt.getPrimitiveTypeName}" +
          s"/${pt.getLogicalTypeAnnotation} in $file")
      stats(chunk).exists { st =>
        val mn = st.genericGetMin.asInstanceOf[java.lang.Integer].intValue
        val mx = st.genericGetMax.asInstanceOf[java.lang.Integer].intValue
        mx < loDays || mn > hiDays
      }
    }
  }

  private final case class StringRange(lo: Array[Byte], hi: Array[Byte])
      extends KeyRange {
    def pruned(chunk: ColumnChunkMetaData, file: String): Boolean = {
      val pt = chunk.getPrimitiveType
      val isStr = pt.getPrimitiveTypeName == PrimitiveTypeName.BINARY &&
        pt.getLogicalTypeAnnotation
          .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      require(isStr,
        s"auditString needs a STRING (BINARY/UTF8) key column; " +
          s"${chunk.getPath.toDotString} is ${pt.getPrimitiveTypeName}" +
          s"/${pt.getLogicalTypeAnnotation} in $file")
      stats(chunk).exists { st =>
        // footer min is a LOWER bound, max an UPPER bound (writers
        // truncate min down / max up) — the prune test stays sound
        val mn = st.genericGetMin.asInstanceOf[Binary].getBytes
        val mx = st.genericGetMax.asInstanceOf[Binary].getBytes
        java.util.Arrays.compareUnsigned(mx, lo) < 0 ||
          java.util.Arrays.compareUnsigned(mn, hi) > 0
      }
    }
  }

  /** Audit an INT64 key column against `lo ≤ c ≤ hi`. */
  def audit(
      spark: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty audit range [$lo, $hi]")
    auditImpl(spark, dir, c, LongRange(lo, hi))
  }

  /** Audit a DATE key column against `lo ≤ c ≤ hi` (inclusive dates). */
  def auditDate(
      spark: SparkSession, dir: String, c: String,
      lo: java.time.LocalDate, hi: java.time.LocalDate): DataFrame = {
    require(!lo.isAfter(hi), s"empty audit range [$lo, $hi]")
    auditImpl(spark, dir, c, DateRange(lo.toEpochDay.toInt, hi.toEpochDay.toInt))
  }

  /** Audit a STRING key column against `lo ≤ c ≤ hi`, unsigned-UTF-8
    * lexicographic (parquet's binary order). */
  def auditString(
      spark: SparkSession, dir: String, c: String,
      lo: String, hi: String): DataFrame = {
    val (lb, hb) = (lo.getBytes("UTF-8"), hi.getBytes("UTF-8"))
    require(java.util.Arrays.compareUnsigned(lb, hb) <= 0,
      s"empty audit range [$lo, $hi]")
    auditImpl(spark, dir, c, StringRange(lb, hb))
  }

  /** One summary row: row_groups, rg_pruned, rows_total, rows_pruned,
    * bytes_total, bytes_pruned (compressed bytes, all columns of the
    * pruned groups — what the scan would not fetch). */
  private def auditImpl(
      spark: SparkSession, dir: String, c: String,
      range: KeyRange): DataFrame = {
    val paths = spark.read.parquet(dir).inputFiles.sorted
    require(paths.nonEmpty, s"no parquet files under $dir")
    import spark.implicits._
    val hadoopConf = taskHadoopConf(spark)
    val perGroup = spark.sparkContext
      .parallelize(paths.toSeq, math.min(paths.length, 32))
      .flatMap { p =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(p), hadoopConf.value.value))
        try {
          reader.getFooter.getBlocks.asScala.map { b =>
            val chunk = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(throw new IllegalArgumentException(
                s"column $c not found in $p"))
            val bytes = b.getColumns.asScala.map(_.getTotalSize).sum
            val pruned = range.pruned(chunk, p)
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

  /** The Hadoop configuration the footer tasks open files with. The
    * session's conf (spark.hadoop.* — s3a credentials, endpoints,
    * timeouts) must travel with the task: a Configuration built
    * executor-side from `new Configuration()` sees only classpath XML
    * and breaks on exactly the object-store lakes this audit targets. */
  private def taskHadoopConf(spark: SparkSession) =
    spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))

  /** Test hook: what a TASK (not the driver) observes for `key` in the
    * Hadoop configuration it opens footers with — proves session-level
    * `spark.hadoop.*` settings reach the executor-side reads via the
    * same [[taskHadoopConf]] broadcast [[auditImpl]] uses. */
  private[graft] def executorConfProbe(spark: SparkSession, key: String): String = {
    val hadoopConf = taskHadoopConf(spark)
    spark.sparkContext.parallelize(Seq(1), 1)
      .map(_ => String.valueOf(hadoopConf.value.value.get(key)))
      .collect().head
  }
}
