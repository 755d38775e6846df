package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Exact integer-microsecond normalization of event-time columns.
  *
  * The engine-portable time boundary everywhere in graft is epoch
  * MICROSECONDS as a long (mirrors DuckDB's `epoch_us` in the oracles) —
  * a double epoch would round differently engine to engine and flip rows
  * sitting exactly ON a tolerance/bucket/validity boundary.
  *
  * Two timestamp physical types reach us from parquet (the reference
  * ingests whatever DMS wrote, dataframe_ops.rs:49-88, so graft must read
  * both): TIMESTAMP (instant, `isAdjustedToUTC=true`) and TIMESTAMP_NTZ
  * (local datetime, `isAdjustedToUTC=false`). Every graft session pins
  * `spark.sql.session.timeZone=UTC`, so the NTZ→instant cast is the
  * identity on the wall-clock field values and `unix_micros` after it is
  * exact. Anything else (DATE, strings, numerics) is REFUSED loudly —
  * the silent alternative (`cast("long")` on a timestamp yields epoch
  * SECONDS) is a 10^6 unit error that would flow through joins unnoticed.
  */
object TimeCols {

  /** `c` (of DataType `dt`) as exact epoch microseconds. */
  def micros(c: Column, dt: DataType): Column = dt match {
    case TimestampType    => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"TimeCols.micros: expected TIMESTAMP or TIMESTAMP_NTZ, got $other — " +
        "normalize the column to a timestamp type first (a silent numeric " +
        "cast would mis-unit the time axis)")
  }

  /** [[micros]] with the type resolved from `df`'s plan. */
  def toMicros(df: DataFrame, c: Column): Column =
    micros(c, df.select(c).schema.head.dataType)
}
