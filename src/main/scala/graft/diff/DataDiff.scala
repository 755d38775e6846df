package graft.diff

import graft.text.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed table diff — the reference's `validate` path.
  *
  * The reference shells out to rust_pgdatadiff
  * (/root/reference/src/cdc/cdc_operator.rs:247-293), which compares two
  * Postgres databases chunk-by-chunk: row counts first, then md5 hashes
  * over pk-ordered chunks of `chunk_size` rows from `start_position`,
  * drilling into unequal chunks for row-level differences.
  *
  * Spark-first re-expression, designed for the 100 TB case:
  *  - `rowDiff` is a single full-outer join on pk: both sides shuffle by
  *    pk exactly once; column comparison is a codegen'd null-safe equality
  *    over the joined row. Output only the differing keys, so the result
  *    stays small even when the inputs are enormous.
  *  - `chunkDiff` aggregates each side map-side into one order-independent
  *    hash sum per pk-range chunk *before* any data moves: the shuffle
  *    carries ~rows/chunk_size hash rows, not data rows — the distributed
  *    version of "compare hashes first, rows only on mismatch".
  *  - `countDiff` is a pure aggregate (no join, no wide rows).
  */
object DataDiff {

  /** Row-level diff of two tables sharing a schema, keyed by pk.
    * Returns one row per differing key with status:
    * 'source_only' | 'target_only' | 'mismatch'.
    */
  def rowDiff(source: DataFrame, target: DataFrame, pk: Seq[String]): DataFrame = {
    val valueCols = source.columns.filterNot(pk.contains)
    val s = source.select(
      struct(pk.map(col): _*).as("__pk"),
      struct(valueCols.map(col): _*).as("__sv"))
    val t = target.select(
      struct(pk.map(col): _*).as("__pk"),
      struct(valueCols.map(col): _*).as("__tv"))
    val joined = s.join(t, Seq("__pk"), "full_outer")
    val status = when(col("__sv").isNull, lit("target_only"))
      .when(col("__tv").isNull, lit("source_only"))
      .when(!(col("__sv") <=> col("__tv")), lit("mismatch"))
    joined
      .withColumn("__status", status)
      .filter(col("__status").isNotNull)
      .select(pk.map(k => col(s"__pk.$k").as(k)) :+ col("__status").as("diff_status"): _*)
  }

  /** Chunked hash compare. Chunks are keyed by a deterministic pk-derived
    * chunk id (pk-range chunking: `chunkOf` maps a row to its chunk), so
    * both sides chunk identically without a global sort. Per chunk we
    * compare row counts and an order-independent sum of portable row
    * hashes. Returns (chunk_id, src_rows, tgt_rows, chunks_match).
    */
  def chunkDiff(
      source: DataFrame,
      target: DataFrame,
      chunkOf: org.apache.spark.sql.Column): DataFrame = {
    def sideAgg(df: DataFrame, n: String, h: String) = {
      val rowHash = PortableHash.h32(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*))
      df.withColumn("__chunk", chunkOf)
        .withColumn("__h", rowHash)
        .groupBy("__chunk")
        .agg(count(lit(1)).as(n), sum(col("__h")).as(h))
    }
    val s = sideAgg(source, "src_rows", "__sh")
    val t = sideAgg(target, "tgt_rows", "__th")
    s.join(t, Seq("__chunk"), "full_outer")
      .select(
        col("__chunk").as("chunk_id"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"),
        coalesce(col("tgt_rows"), lit(0L)).as("tgt_rows"),
        (col("src_rows") <=> col("tgt_rows") && col("__sh") <=> col("__th"))
          .as("chunks_match"))
  }

  /** Count-only compare (DiffPayload.only_count). */
  def countDiff(source: DataFrame, target: DataFrame, label: String): DataFrame =
    source.agg(count(lit(1)).as("src_rows"))
      .crossJoin(target.agg(count(lit(1)).as("tgt_rows")))
      .select(
        lit(label).as("tbl"),
        col("src_rows"),
        col("tgt_rows"),
        (col("src_rows") === col("tgt_rows")).as("counts_match"))
}
