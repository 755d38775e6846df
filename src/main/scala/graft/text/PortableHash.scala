package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashes.
  *
  * `h32(x)` = the first 8 hex chars of md5(utf8(x)) parsed as an unsigned
  * 32-bit integer, carried in a LongType. The same value is computable in
  * any engine with md5 (DuckDB: `cast('0x'||substr(md5(x),1,8) as bigint)`),
  * which is what makes MinHash/SimHash/fingerprint results verifiable
  * against an independent oracle, unlike engine-private hashes
  * (xxhash64 here, ahash in the reference's polars).
  *
  * md5 is a codegen'd Catalyst expression, so h32 compositions stay inside
  * WholeStageCodegen — no UDF in the per-row path.
  */
object PortableHash {
  /** Unsigned 32-bit md5 prefix as LongType — via the native codegen'd
    * H32 expression (graft.functions.H32); semantically equal to
    * `conv(substring(md5(c),1,8),16,10).cast("long")`. */
  def h32(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.H32(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Seeded variant: independent hash family member per seed (used as the
    * "permutation" of MinHash). */
  def h32(seed: Int, c: Column): Column =
    h32(concat(lit(s"$seed:"), c))

  /** Lane variant: bytes [4*lane, 4*lane+4) of one md5 as an unsigned
    * 32-bit value — four independent hashes per digest, so k seeded
    * hashes cost ceil(k/4) md5s instead of k (the MinHash permutation
    * family uses seed = perm/4, lane = perm%4). */
  def h32Lane(seed: Int, lane: Int, c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.H32(
        org.apache.spark.sql.GraftBridge.expression(concat(lit(s"$seed:"), c)), lane))

  def h32Lane(lane: Int, c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.H32(org.apache.spark.sql.GraftBridge.expression(c), lane))

  /** 60-bit md5 prefix (first 15 hex chars) as LongType — the join-key
    * hash for shingle postings: collisions are ~n²/2⁶¹ (negligible at
    * corpus scale, and DETERMINISTIC — both engines compute the same md5,
    * so the oracle compare stays exact even on a collision), while the
    * shuffled key shrinks from a ~40-byte string to 8 bytes. 15 hex chars
    * keep the value below 2⁶⁰, safely inside a signed 64-bit in both
    * Spark and DuckDB.
    * Composed from lanes 0 and 1 of ONE native H32 digest (the memo makes
    * the second lane read free): first 60 bits = lane0 ∥ lane1[31:4] —
    * identical to parsing the 15-char hex prefix, without materializing
    * the hex string. */
  def h60(c: Column): Column =
    shiftleft(h32Lane(0, c), 28) + shiftright(h32Lane(1, c), 4)

  /** KMV distinct-count sketch aggregate over portable hashes (native
    * TypedImperativeAggregate, graft.functions.KmvDistinct): shuffles
    * ≤ k longs per group per map task instead of every value, yet the
    * integer estimate is engine-reproducible (feed it [[h32]]). */
  def kmvDistinct(hashed: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.KmvDistinct(
        org.apache.spark.sql.GraftBridge.expression(hashed), k)
        .toAggregateExpression())

  /** The k smallest distinct hashes as a sorted array (same buffer and
    * ≤ k-longs-per-map-task exchange as [[kmvDistinct]]) — the raw
    * synopsis, for cross-table set-operation estimates. */
  def kmvBottomK(hashed: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.KmvBottomK(
        org.apache.spark.sql.GraftBridge.expression(hashed), k)
        .toAggregateExpression())

  /** DuckDB SQL fragment computing the identical value. */
  def duckH32(expr: String): String =
    s"cast(('0x'||substr(md5($expr),1,8)) as bigint)"

  /** DuckDB twin of [[h60]]. */
  def duckH60(expr: String): String =
    s"cast(('0x'||substr(md5($expr),1,15)) as bigint)"

  def duckH32(seed: Int, expr: String): String =
    duckH32(s"'$seed:'||$expr")

  def duckH32Lane(seed: Int, lane: Int, expr: String): String =
    s"cast(('0x'||substr(md5('$seed:'||$expr),${1 + 8 * lane},8)) as bigint)"

  def duckH32Lane(lane: Int, expr: String): String =
    s"cast(('0x'||substr(md5($expr),${1 + 8 * lane},8)) as bigint)"
}
