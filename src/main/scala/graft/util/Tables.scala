package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated test corpus.
  *
  * Mirrors the reference's single-file parquet ingestion
  * (/root/reference/src/dataframe/dataframe_ops.rs:49-88) but as a lazy
  * distributed scan: Spark's parquet source gives column pruning and
  * predicate pushdown for free, where the reference buffers whole S3
  * objects in memory.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonicalize an event-time column to TimestampType regardless of
    * which physical encoding the parquet producer chose — the reference
    * reads whatever DMS wrote (dataframe_ops.rs:49-88), and the driver's
    * generator has shipped three encodings of `events.ts` across rounds:
    *  - TIMESTAMP(NANOS), surfacing as INT64 under the
    *    `spark.sql.legacy.parquet.nanosAsLong=true` every graft session
    *    sets → rebuild with exact integer division (`div`, not `/` —
    *    epoch-nanos exceed 2^53, double math would lose precision);
    *  - TIMESTAMP(MICROS) `isAdjustedToUTC=false` → TIMESTAMP_NTZ → the
    *    cast to TimestampType is exact (identity on field values) under
    *    the UTC session timezone every graft session pins;
    *  - TIMESTAMP(MICROS) `isAdjustedToUTC=true` → already TimestampType.
    * Works on streaming DataFrames too (pure column rewrite).
    * Every downstream query lambda sees ONE canonical type. */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType          => df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      case TimestampNTZType  => df.withColumn(c, col(c).cast(TimestampType))
      case TimestampType     => df
      case other => throw new IllegalArgumentException(
        s"Tables.normalizeTs: column '$c' has unhandled time encoding $other")
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(table(spark, dir, "events"), "ts")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
