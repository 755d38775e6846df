package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.PortableHash

/** One-pass table profile: per-column null counts, KMV distinct
  * estimates, and min/max — the "know your table before you pay for it"
  * companion to the per-key skew profile (Misra-Gries, E32) and the
  * cross-table overlap estimate (KMV, E34). A profile answers the
  * planning questions a 100 TB join/filter hinges on — is this column
  * null-riddled, near-unique, or low-cardinality; what range does a
  * partition filter have to cover — without paying per-column scans.
  *
  * Shape at scale: ONE aggregation over ONE scan computes every
  * column's stats simultaneously — n columns profiled for the I/O cost
  * of one pass, where the naive per-column loop scans the table n
  * times. The aggregation state is bounded: count/min/max are scalars
  * and each KMV buffer holds ≤ k longs, so the single-reducer exchange
  * carries O(cols · k) longs total, input-size-independent. The result
  * row unpivots to one row per column via `stack` (pure projection —
  * nothing returns to the driver).
  *
  * Determinism: distinct estimates ride the portable-hash KMV sketch
  * (graft.functions.KmvDistinct), so even the ESTIMATES oracle-check
  * bit-for-bit; min/max are rendered through a string cast, exact for
  * the integer/decimal/date/string columns profiles target (float
  * columns: mind engine float-formatting differences before comparing
  * across engines).
  *
  * Reference analogue: dataframe_ops.rs's count/describe surface —
  * generalized to the full-column sweep a lake table needs.
  */
object TableProfile {

  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn__$c"),
        PortableHash.kmvDistinct(
          PortableHash.h32(col(c).cast("string")), k).as(s"nd__$c"),
        min(col(c)).cast("string").as(s"mn__$c"),
        max(col(c)).cast("string").as(s"mx__$c"))
    } :+ count(lit(1)).as("n__all")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', n__all, n__all - nn__$c, nd__$c, mn__$c, mx__$c").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct_est, min_s, max_s)")
  }
}
