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

  /** Portable whole-row hash. NULLs are encoded with an explicit
    * sentinel before concat_ws — concat_ws silently SKIPS nulls, so
    * without it (NULL,'a') and ('a',NULL) hash identically and a real
    * difference validates clean. DuckDB twin in SparkEntry's diff_chunk
    * oracles: COALESCE(CAST(c AS VARCHAR), chr(1)||'NULL'). */
  private def rowHash(columns: Seq[String]) =
    PortableHash.h32(concat_ws("|",
      columns.map(c => coalesce(col(c).cast("string"), lit("\u0001NULL"))): _*))

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
      df.withColumn("__chunk", chunkOf)
        .withColumn("__h", rowHash(df.columns.toSeq))
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

  /** Exact 0-based global position of each row in pk order, WITHOUT a
    * single-partition global window: range-repartition + sort by pk (so
    * partition i's keys all precede partition i+1's), then
    * `RDD.zipWithIndex` — its per-partition count job and the data job
    * share ONE shuffle lineage, so the sampled range boundaries are
    * computed exactly once and the cumulative offsets are consistent by
    * construction. A pure-DataFrame variant (spark_partition_id + window
    * + broadcast offsets) is subtly wrong here: the plan is consumed
    * twice and a re-executed range exchange may re-sample different
    * boundaries, silently corrupting positions. The RDD hop costs one
    * row (de)serialization on the validate path only — the price of
    * keeping the reference's "chunk_size rows from start_position"
    * semantics computable at 100 TB.
    */
  def withOrderedPosition(df: DataFrame, pk: Seq[String], posCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, pk.map(col): _*)
      .sortWithinPartitions(pk.map(col): _*)
    // internal-row zip (GraftBridge): the old `.rdd.zipWithIndex()` +
    // `createDataFrame(Row.fromSeq)` route decoded every UnsafeRow to
    // boxed objects and re-encoded it through per-row reflection — in
    // BOTH of zipWithIndex's passes (guide §1.4's format-conversion tax).
    // Order semantics are unchanged; pk uniqueness (the operator's
    // existing contract) is what makes the position deterministic.
    org.apache.spark.sql.GraftBridge.zipWithPosition(sorted, posCol)
  }

  /** Reference-fidelity chunk compare: chunk N = rows
    * [N*chunkSize, (N+1)*chunkSize) in pk order, skipping the first
    * `startPosition` ROWS (rust_pgdatadiff's chunk/start_position payload,
    * cdc_operator.rs:247-293) — unlike `chunkDiff`'s pk-range chunks,
    * `start_position` here really means "skip the first N rows" and chunk
    * count tracks table size. Positions are computed independently per
    * side, so as in the reference, a single inserted row shifts every
    * later chunk. */
  def orderedChunkDiff(
      source: DataFrame,
      target: DataFrame,
      pk: Seq[String],
      chunkSize: Long,
      startPosition: Long = 0L): DataFrame =
    orderedChunkDiffRanges(source, target, pk, chunkSize, startPosition)
      .select("chunk_id", "src_rows", "tgt_rows", "chunks_match")

  /** [[orderedChunkDiff]] plus each chunk's per-side pk-interval bounds
    * (`lo`/`hi`, as pk structs) — the drill-down input: a mismatched
    * chunk's [lo, hi] interval is what the row-level pass re-reads, so
    * "rows only on mismatch" (the reference's validate contract) costs a
    * range-restricted scan instead of a second global sort. The bounds
    * ride along in the same aggregation — no extra pass. */
  def orderedChunkDiffRanges(
      source: DataFrame,
      target: DataFrame,
      pk: Seq[String],
      chunkSize: Long,
      startPosition: Long = 0L): DataFrame = {
    def sideAgg(df: DataFrame, n: String, h: String, lo: String, hi: String) = {
      // project to pk + row hash BEFORE the range exchange + sort + zip:
      // the hash already condenses every column, so carrying the full row
      // through the position machinery only widens the shuffle (guide
      // §2.3 "project before the exchange" — on a 9-column orders side
      // this shrinks the sorted/zipped row to pk + one long)
      val slim = df.withColumn("__h", rowHash(df.columns.toSeq))
        .select(pk.map(col) :+ col("__h"): _*)
      val positioned = withOrderedPosition(slim, pk, "__pos")
        .filter(col("__pos") >= startPosition)
        .withColumn("__chunk", floor(col("__pos") / chunkSize.toDouble).cast("long"))
      // single-column pk (the common case): min/max on the RAW column —
      // primitive aggregation buffers keep the per-chunk agg a
      // HashAggregate with map-side partials, so the exchange carries
      // ~one partial row per (chunk × partition). min/max over a STRUCT
      // is not hash-aggregable (immutable buffer type) and forces a
      // SortAggregate + extra sort of the whole positioned frame;
      // composite pks still pay it, single-field structs provably
      // satisfy struct(min(a)) = min(struct(a)).
      if (pk.size == 1)
        positioned.groupBy("__chunk")
          .agg(count(lit(1)).as(n), sum(col("__h")).as(h),
            min(col(pk.head)).as("__lo1"), max(col(pk.head)).as("__hi1"))
          .select(col("__chunk"), col(n), col(h),
            struct(col("__lo1").as(pk.head)).as(lo),
            struct(col("__hi1").as(pk.head)).as(hi))
      else
        positioned
          .withColumn("__pk", struct(pk.map(col): _*))
          .groupBy("__chunk")
          .agg(count(lit(1)).as(n), sum(col("__h")).as(h),
            min(col("__pk")).as(lo), max(col("__pk")).as(hi))
    }
    val s = sideAgg(source, "src_rows", "__sh", "src_lo", "src_hi")
    val t = sideAgg(target, "tgt_rows", "__th", "tgt_lo", "tgt_hi")
    s.join(t, Seq("__chunk"), "full_outer")
      .select(
        col("__chunk").as("chunk_id"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"),
        coalesce(col("tgt_rows"), lit(0L)).as("tgt_rows"),
        (col("src_rows") <=> col("tgt_rows") && col("__sh") <=> col("__th"))
          .as("chunks_match"),
        // least/greatest skip NULLs, so a chunk present on one side only
        // still yields a usable drill-down interval
        least(col("src_lo"), col("tgt_lo")).as("lo"),
        greatest(col("src_hi"), col("tgt_hi")).as("hi"))
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
