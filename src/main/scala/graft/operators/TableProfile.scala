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
    require(cols.distinct.size == cols.size,
      s"duplicate columns: ${cols.diff(cols.distinct).distinct.mkString(", ")}")
    // names are spliced into generated aliases and the stack SQL — keep
    // them plain identifiers rather than escaping per dialect corner
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profile needs plain identifier column names, got: ${cols.mkString(", ")}")
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

  /** Equi-width histogram over `[lo, hi)`: bucket i covers
    * `[lo + i·w, lo + (i+1)·w)` with `w = (hi − lo) / buckets`;
    * out-of-range values (±∞ included) clamp into the edge buckets (so
    * every counted row lands somewhere — a histogram that silently
    * drops tails misreads a skewed column); nulls and NaN are excluded
    * (NaN has no ordering position, and engines disagree on casting it
    * to integer). Map-side combinable group-by on a codegen'd
    * arithmetic bucket — one scan, ≤ `buckets` rows out.
    *
    * The bucket index is computed in IEEE double arithmetic with a fixed
    * operation order (`(v − lo) · buckets / (hi − lo)`), so the same
    * formula in another engine buckets identically bit-for-bit — the
    * histogram oracle-checks exactly, like the rest of the profile. */
  def histogram(
      df: DataFrame, c: String, buckets: Int,
      lo: Double, hi: Double): DataFrame = {
    require(buckets >= 1, "histogram needs at least one bucket")
    require(lo < hi, s"histogram range is empty: [$lo, $hi)")
    val idx = floor((col(c).cast("double") - lit(lo)) * lit(buckets.toDouble)
      / lit(hi - lo)).cast("long")
    df.where(col(c).isNotNull && !isnan(col(c).cast("double")))
      .select(least(lit(buckets - 1L), greatest(lit(0L), idx)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
