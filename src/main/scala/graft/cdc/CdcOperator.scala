package graft.cdc

import java.time.Instant

import graft.diff.DataDiff
import graft.sources.{DmsFileCatalog, TableSelector}
import graft.sources.DmsFileCatalog.{AbsolutePath, CatalogedFile, DateAware, FullLoadOnly, Mode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top-level orchestration — the Spark-native equivalent of the reference's
  * CDCOperator (/root/reference/src/cdc/cdc_operator.rs) and its payloads
  * (snapshot_payload.rs, validate_payload.rs, cdc_operator_payload.rs).
  *
  * `snapshot` replays every selected table's DMS files to a current-state
  * DataFrame; `validate` diffs replayed state against a target. Where the
  * reference walks tables sequentially with an async buffer and lands rows
  * one statement at a time, here each table is ONE declarative plan —
  * scan → window → (optional) sink — and the cluster parallelizes within
  * and across tables.
  */
object CdcOperator {

  /** Mirror of the reference's CLI/payload surface (cdc_operator_payload.rs).
    * `bucketPrefix` is any Hadoop-FS URI prefix (s3a://bucket/prefix,
    * file:/...); Postgres URLs become JDBC coordinates when a live sink is
    * attached.
    *
    * Primary-key resolution order per table: explicit `pkByTable` config →
    * `pkResolver` (wired to `graft.pg.Reflect.pkResolver` when a source
    * Postgres URL is available — the reference's `get_primary_key` path,
    * cdc_operator.rs:96-137) → first-data-column guess as a loud last
    * resort.
    *
    * `asOfMs`: time-travel horizon — only files already WRITTEN
    * (mtime) at that wall-clock instant replay, so the snapshot is the
    * state the target would have held at T (validate against a backup,
    * audit when a divergence began). File-level, so post-horizon files
    * are never read at all; a table whose every file postdates the
    * horizon didn't exist at T and is skipped like an empty listing. */
  case class SnapshotConfig(
      bucketPrefix: String,
      databaseName: String,
      schemaName: String = "public",
      includedTables: Seq[String] = Seq.empty,
      excludedTables: Seq[String] = Seq.empty,
      mode: Mode = FullLoadOnly,
      pkByTable: Map[String, Seq[String]] = Map.empty,
      pkResolver: String => Seq[String] = _ => Seq.empty,
      columnsByTable: Map[String, Seq[String]] = Map.empty,
      columnResolver: String => Seq[String] = _ => Seq.empty,
      asOfMs: Option[Long] = None)

  /** `orderedChunks = true` (default) follows the reference exactly:
    * chunks are `chunkSize`-row ranges in pk order and `startPosition`
    * skips that many rows (rust_pgdatadiff payload). `false` switches to
    * hash-range chunking — positions never computed, one shuffle fewer —
    * for the very largest tables.
    * @param sampleBp screening mode: validate only the chunks whose
    *                  salted portable hash falls under `sampleBp`/10000 —
    *                  a DETERMINISTIC fraction of the keyspace (hash
    *                  chunks are pk-derived, so both sides sample the
    *                  same keys and every report number is exact on the
    *                  sample). 10000 = full validation. Requires hash
    *                  chunking: positional chunks sample row POSITIONS,
    *                  which shift under inserts. */
  case class ValidateConfig(
      chunkSize: Long = 1000,
      startPosition: Long = 0,
      onlyCount: Boolean = false,
      orderedChunks: Boolean = true,
      sampleBp: Long = 10000)

  case class TableState(table: String, state: DataFrame, files: Seq[CatalogedFile])

  /** Discover tables under the prefix (directory names at the table level
    * of the DMS layout) and apply include/exclude selection. */
  def discoverTables(spark: SparkSession, cfg: SnapshotConfig): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(
      s"${cfg.bucketPrefix}/${cfg.databaseName}/${cfg.schemaName}")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
    TableSelector.select(all, cfg.includedTables, cfg.excludedTables)
  }

  /** pk resolution: config → database reflection → first-DATA-column
    * guess (never a DMS service column or the catalog's internal tags —
    * the raw frame's first column is often "Op", which would make LWW
    * replay key on the op code). A wrong pk silently changes replay
    * semantics, so the guess is the loud last resort. A reflected pk is
    * used only when EVERY reflected column exists in the frame: silently
    * truncating a composite pk to the columns that happen to match (a
    * case-mismatched column, a dropped column) would LWW-collapse
    * distinct keys — worse than falling through with a warning. None
    * only when the table has no data columns at all. */
  def resolvePk(cfg: SnapshotConfig, table: String, columns: Seq[String]): Option[Seq[String]] = {
    val internal = CdcApply.ServiceColumns ++ Seq("_seq", "_is_load")
    cfg.pkByTable.get(table).orElse {
      val reflected = cfg.pkResolver(table)
      val missing = reflected.filterNot(columns.contains)
      if (reflected.nonEmpty && missing.isEmpty) Some(reflected)
      else {
        if (missing.nonEmpty)
          System.err.println(s"[graft] reflected pk for '$table' names column(s) " +
            s"absent from the files (${missing.mkString(", ")}); ignoring reflection")
        columns.filterNot(internal.contains).headOption.map { c =>
          System.err.println(s"[graft] no pk configured or reflected for '$table'; guessing '$c'")
          Seq(c)
        }
      }
    }
  }

  /** Replay one table's cataloged files to current state. LOAD rows form
    * the base; CDC rows replay on top in file-sequence order — one plan,
    * one shuffle by pk (CdcApply). */
  def replayTable(
      spark: SparkSession,
      cfg: SnapshotConfig,
      table: String): Option[TableState] = {
    val listed = DmsFileCatalog.listFiles(
      spark, cfg.bucketPrefix, cfg.databaseName, cfg.schemaName, table, cfg.mode)
    // as-of horizon cuts the CATALOG: files not yet written at T never
    // read — the file-granular twin of CdcApply.snapshotAsOf's row filter
    val files = cfg.asOfMs.fold(listed)(t => listed.filter(_.modifiedMs <= t))
    if (files.isEmpty) return None
    val df = DmsFileCatalog.readTable(spark, files)
    if (df.columns.isEmpty) return None
    // schema-drift guard (reference parity, cdc_operator.rs:171-186): a
    // file column absent from the source table's column set aborts the
    // table LOUDLY — replaying it would land data the source can't hold.
    // The expected set comes from explicit config or live reflection;
    // with neither, the guard is inert (nothing to compare against).
    val expectedCols = cfg.columnsByTable.getOrElse(table, cfg.columnResolver(table))
    if (expectedCols.nonEmpty) {
      val drifted = SchemaGuard.blockingColumns(
        df.schema, expectedCols, ignore = Seq("_seq", "_is_load"))
      if (drifted.nonEmpty) {
        System.err.println(s"[graft] SCHEMA DRIFT: table '$table' files carry column(s) " +
          s"${drifted.mkString(", ")} absent from the source table — skipping the table " +
          "(matching the reference's abort)")
        return None
      }
    }
    val pk = resolvePk(cfg, table, df.columns.toSeq) match {
      case Some(p) => p
      case None    => return None
    }
    val hasOp = df.columns.contains("Op")
    val state =
      if (!hasOp) CdcApply.stripServiceColumns(df.drop("_seq", "_is_load"))
      else {
        // LOAD rows count as inserts at their sequence; trailing deletes drop keys
        val withOp = df.withColumn("Op",
          when(col("_is_load"), lit("I")).otherwise(col("Op")))
        CdcApply.latestState(withOp, pk, Seq(col("_seq")))
          .drop("_seq", "_is_load")
      }
    Some(TableState(table, state, files))
  }

  /** The reference's `snapshot`: replay every selected table. Landing the
    * returned states (parquet/JDBC) is the caller's choice of sink.
    *
    * Tables overlap on a bounded driver pool: replay is mostly lazy plan
    * construction, but the per-table file LISTING is driver-side
    * filesystem IO — at 1000 tables a sequential walk leaves the cluster
    * idle between listings. Results keep discovery order. */
  def snapshot(
      spark: SparkSession, cfg: SnapshotConfig, parallelism: Int = 8): Seq[TableState] =
    parTables(discoverTables(spark, cfg), parallelism)(t => replayTable(spark, cfg, t))
      .flatten

  /** One table's validate inputs for [[validateAll]]. */
  case class ValidateTask(
      source: DataFrame, target: DataFrame, pk: Seq[String], table: String)

  /** Validate MANY tables with their eager actions overlapped: each
    * [[validate]] runs cache-materialize / isEmpty / driver-merge
    * collects sequentially from the driver, so a 1000-table loop idles
    * the cluster between small jobs. Tables are submitted from a bounded
    * thread pool (Spark's scheduler interleaves the resulting jobs; use
    * `spark.scheduler.mode=FAIR` to stop a huge table from starving
    * small ones), each under its own job group
    * (`graft-validate-<table>`) for UI attribution. Returns each table's
    * one-row report, in task order — identical rows to a sequential
    * loop. */
  def validateAll(
      tasks: Seq[ValidateTask],
      cfg: ValidateConfig = ValidateConfig(),
      parallelism: Int = 8): Seq[org.apache.spark.sql.Row] =
    parTables(tasks, parallelism) { t =>
      val sc = t.source.sparkSession.sparkContext
      sc.setJobGroup(s"graft-validate-${t.table}", s"validate ${t.table}")
      try validate(t.source, t.target, t.pk, t.table, cfg).head()
      finally sc.clearJobGroup()
    }

  /** Bounded-pool map preserving input order; parallelism 1 (or a single
    * item) degrades to a plain sequential map with no pool. Failures
    * propagate, and on failure the pool is shut down HARD (shutdownNow):
    * queued not-yet-started tables are cancelled so a caller reasoning
    * "failure ⇒ later tables untouched" stays approximately right —
    * up to `parallelism` tables that were already in flight may still
    * complete their side effects, which a sequential loop cannot exhibit;
    * callers needing strict prefix semantics should pass parallelism=1.
    * Spark contexts are thread-safe for concurrent job submission;
    * job-group/description properties are thread-local. */
  private[graft] def parTables[A, B](items: Seq[A], parallelism: Int)(f: A => B): Seq[B] = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    if (parallelism == 1 || items.sizeIs <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, items.size))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val fs = items.map(a => scala.concurrent.Future(f(a)))
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(fs),
          scala.concurrent.duration.Duration.Inf)
      } catch {
        case t: Throwable => pool.shutdownNow(); throw t
      } finally pool.shutdown()
    }
  }

  /** Chunks per merge bucket: bad-interval merge windows sort at most
    * this many CHUNK rows per task (not data rows), whatever the table
    * size. */
  private val MergeBucketChunks = 1L << 16

  /** Bad-chunk count up to which interval merging runs on the driver
    * (bounded collect from the already-cached chunk report): localized
    * damage — the common case — costs ZERO extra Spark stages, and the
    * merged intervals become a literal local relation that both side
    * restrictions reuse for free. Above this, the fully distributed
    * [[mergedBadIntervals]] takes over (the early-insert case where most
    * chunks shift). */
  private val MergeCollectLimit = 4096

  /** Driver-side fast path: merge runs of ADJACENT bad chunk ids. Both
    * `lo` and `hi` are non-decreasing in chunk_id (per-side bounds are
    * position-sorted; least/greatest of non-decreasing sequences stay
    * non-decreasing), so a run's envelope is simply (first lo, last hi) —
    * pure chunk-id arithmetic, no pk value comparisons, no type
    * assumptions. Value-overlapping but non-adjacent intervals stay
    * unmerged (a few more broadcast ranges), and a merged run's envelope
    * may cover pk GAP points between its chunks — a sound superset:
    * restriction applies the same predicate to both sides, so no pk pair
    * is split and rows equal on both sides add nothing to the diff
    * (property-tested against the distributed merge in CdcPropertySpec).
    * Returns None when the bad set exceeds `limit`. */
  private[graft] def mergedOnDriver(
      chunkReport: DataFrame, limit: Int): Option[DataFrame] = {
    val bad = chunkReport.filter(!col("chunks_match"))
      .select(col("chunk_id"), col("lo"), col("hi"))
      .orderBy("chunk_id").limit(limit + 1).collect()
    if (bad.length > limit) return None
    val runs = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    var prevId = Long.MinValue
    bad.foreach { r =>
      val id = r.getLong(0)
      if (runs.nonEmpty && id == prevId + 1) runs.last(1) = r.get(2) // extend: hi := last hi
      else runs += Array[Any](r.get(1), r.get(2))
      prevId = id
    }
    val spark = chunkReport.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__lo", chunkReport.schema("lo").dataType),
      org.apache.spark.sql.types.StructField("__hi", chunkReport.schema("hi").dataType)))
    import scala.jdk.CollectionConverters._
    Some(spark.createDataFrame(
      runs.map(a => org.apache.spark.sql.Row(a(0), a(1))).asJava, schema))
  }

  /** Merge adjacent/overlapping mismatched-chunk pk intervals into runs
    * before the (nested-loop) range join: one early insert shifts EVERY
    * later positional chunk, so the bad set is typically a few long runs —
    * merging turns rows×chunks comparisons into rows×runs.
    *
    * Distributed: in POSITIONAL mode the bad set can be ~rows/chunkSize
    * (a first-row insert damages every chunk), so a single-partition
    * `Window.orderBy` here would sort a data-scale set in one task at
    * 100 TB. Instead chunk ids bucket into fixed-width ranges (chunk_id
    * order == interval order — per-side chunk bounds are position-sorted
    * and `least`/`greatest` of non-decreasing sequences stay
    * non-decreasing): run-start detection = per-bucket windowed prefixes
    * + cross-bucket offsets from a triangular join over the (tiny,
    * ≤ badChunks/2¹⁶) bucket summaries. Every window is partitioned; the
    * only unbounded structure left is the bucket-summary join, which is
    * chunk-count/2¹⁶-sized. */
  private[graft] def mergedBadIntervals(
      chunkReport: DataFrame, bucketChunks: Long = MergeBucketChunks): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bad = chunkReport.filter(!col("chunks_match"))
      .select(col("chunk_id").as("__cid"), col("lo").as("__lo"), col("hi").as("__hi"))
      .withColumn("__mb", floor(col("__cid") / lit(bucketChunks.toDouble)).cast("long"))
    val wB = Window.partitionBy("__mb").orderBy("__cid")
    // prefix max(hi) = local windowed prefix ∨ max over all earlier buckets
    val bHi = bad.groupBy("__mb").agg(max(col("__hi")).as("__bHi"))
    val bPrev = bHi.as("a")
      .join(broadcast(bHi.as("b")), col("b.__mb") < col("a.__mb"), "left")
      .groupBy(col("a.__mb").as("__mb")).agg(max(col("b.__bHi")).as("__bPrevHi"))
    val flagged = bad.join(broadcast(bPrev), Seq("__mb"))
      .withColumn("__lPrevHi",
        max(col("__hi")).over(wB.rowsBetween(Window.unboundedPreceding, -1)))
      // greatest skips NULLs: null only for the global first interval
      .withColumn("__prevHi", greatest(col("__lPrevHi"), col("__bPrevHi")))
      .withColumn("__isStart",
        (col("__prevHi").isNull || col("__lo") > col("__prevHi")).cast("long"))
      .withColumn("__lStarts",
        sum(col("__isStart")).over(wB.rowsBetween(Window.unboundedPreceding, 0)))
    // run id = starts before-or-at me, globally: local prefix + bucket offset
    val bStarts = flagged.groupBy("__mb").agg(sum(col("__isStart")).as("__bs"))
    val sOff = bStarts.as("a")
      .join(broadcast(bStarts.as("b")), col("b.__mb") < col("a.__mb"), "left")
      .groupBy(col("a.__mb").as("__mb"))
      .agg(coalesce(sum(col("b.__bs")), lit(0L)).as("__sOff"))
    flagged.join(broadcast(sOff), Seq("__mb"))
      .withColumn("__grp", col("__sOff") + col("__lStarts"))
      .groupBy("__grp")
      .agg(min(col("__lo")).as("__lo"), max(col("__hi")).as("__hi"))
      .drop("__grp")
  }

  /** The reference's `validate` (rust_pgdatadiff): per-table diff of
    * replayed state vs target — counts first, then chunked hashes, then
    * row-level drill-down ONLY into mismatched chunks (the reference
    * fetches rows per unequal chunk, cdc_operator.rs:247-293). Returns
    * one summary row per table.
    *
    * The chunk report is small (~rows/chunkSize) and is materialized
    * eagerly so the row-level pass can be gated on it: a clean table
    * never pays the full-outer pk join — its validate is counts + chunk
    * hashes, full stop. When chunks DO mismatch, both sides are
    * broadcast-semi-joined down to the mismatched chunks' pk intervals
    * (ordered mode) or chunk-hash ids (hash-range mode) before the row
    * join, so the row-level cost scales with the damage, not the table. */
  def validate(
      source: DataFrame,
      target: DataFrame,
      pk: Seq[String],
      table: String,
      cfg: ValidateConfig = ValidateConfig()): DataFrame = {
    if (cfg.onlyCount) return DataDiff.countDiff(source, target, table)
    require(cfg.sampleBp > 0 && cfg.sampleBp <= 10000,
      s"validate: sampleBp must be in (0, 10000], got ${cfg.sampleBp}")
    require(cfg.sampleBp == 10000 || !cfg.orderedChunks,
      "validate: sampled screening (sampleBp < 10000) requires hash chunking " +
        "(orderedChunks = false) — positional chunks sample row positions, " +
        "which shift under inserts, so the two sides would sample different keys")
    val pkStruct = struct(pk.map(col): _*)
    // hash-mode chunk id (pk-derived, engine-portable) — also the sampling
    // unit for screening mode; see the orderedChunks=false branch below
    val hashPkStr = concat_ws("|",
      pk.map(c => coalesce(col(c).cast("string"), lit("\u0001NULL"))): _*)
    val hashChunkOf = (pmod(graft.text.PortableHash.h32(hashPkStr), lit(1000000))
      .cast("long") / lit(cfg.chunkSize)).cast("long")
    // screening: both sides keep only the deterministically sampled chunks
    // BEFORE any aggregation — the chunk shuffle, the counts, and the row
    // drill-down all shrink to the sampled fraction of the keyspace
    val (vSource, vTarget) =
      if (cfg.sampleBp == 10000) (source, target)
      else {
        val keep = pmod(
          graft.text.PortableHash.h32(
            concat(lit("vsamp:"), hashChunkOf.cast("string"))),
          lit(10000L)) < cfg.sampleBp
        (source.filter(keep), target.filter(keep))
      }
    // (chunk report, row-restriction of a side to mismatched chunks)
    val (chunks, restrict): (DataFrame, DataFrame => DataFrame) =
      if (cfg.orderedChunks) {
        // reference semantics: chunkSize ROWS per chunk in pk order,
        // startPosition skips rows (cdc_operator.rs:247-293)
        // localCheckpoint, not cache(): validate() is already eager (the
        // rows-on-mismatch gate materializes the report below), the
        // returned counts/badChunks legs keep reading it after this
        // function returns, and a cache() entry would outlive the query
        // in CacheManager with no unpersist hook; checkpointed blocks
        // are ContextCleaner-collected with the query's RDD
        val ch = DataDiff.orderedChunkDiffRanges(
          vSource, vTarget, pk, cfg.chunkSize, cfg.startPosition).localCheckpoint()
        // evaluated once, on first use (i.e. only when chunks DID
        // mismatch), then shared by both side restrictions
        lazy val merged = mergedOnDriver(ch, MergeCollectLimit.toInt)
          .getOrElse(mergedBadIntervals(ch))
        (ch, df => df.join(broadcast(merged),
          pkStruct >= col("__lo") && pkStruct <= col("__hi"), "left_semi"))
      } else {
        // scale option: hash pk tuple into chunkSize-row-scale ranges;
        // startPosition degrades to a chunk-id floor. Membership in a
        // mismatched chunk is exact (chunk id is pk-derived), so the
        // drill-down is a semi-join on the chunk id itself — and unlike
        // positional chunks, an insert/delete shifts NOTHING, so the
        // gate prunes to just the damaged chunks. The hash is the
        // engine-portable h32 (not Spark-private murmur): chunk ids are
        // reproducible across engines/runs, so a chunk report can be
        // compared against any other system's. NULL pk parts carry a
        // 'NULL' sentinel (concat_ws skips nulls silently, which would
        // merge chunks of different-arity NULL tuples); the oracle
        // mirrors the same literal.
        // localCheckpoint, not cache() — same lifecycle rationale as the
        // ordered branch above
        val ch = DataDiff.chunkDiff(vSource, vTarget, hashChunkOf)
          .filter(col("chunk_id") >= cfg.startPosition).localCheckpoint()
        val badIds = ch.filter(!col("chunks_match"))
          .select(col("chunk_id").as("__chunk"))
        (ch, df => df.withColumn("__chunk", hashChunkOf)
          .join(broadcast(badIds), Seq("__chunk"), "left_semi")
          .drop("__chunk"))
      }
    // counts fall out of the (cached) chunk report when no rows were
    // skipped — no extra scan of either table; with startPosition > 0
    // the skipped rows are uncounted in chunks, so pay the count agg
    val counts =
      if (cfg.startPosition == 0L)
        chunks.agg(
          coalesce(sum(col("src_rows")), lit(0L)).as("src_rows"),
          coalesce(sum(col("tgt_rows")), lit(0L)).as("tgt_rows"))
          .select(lit(table).as("tbl"), col("src_rows"), col("tgt_rows"),
            (col("src_rows") === col("tgt_rows")).as("counts_match"))
      else DataDiff.countDiff(vSource, vTarget, table)
    val badChunks = chunks.filter(!col("chunks_match"))
      .agg(count(lit(1)).as("chunks_mismatched")).withColumn("tbl", lit(table))
    // rows only on mismatch: a clean chunk report short-circuits the
    // row-level join entirely (isEmpty materializes the cached report)
    val anyBad = !chunks.filter(!col("chunks_match")).isEmpty
    val rows =
      if (!anyBad)
        source.sparkSession.range(1)
          .select(lit(0L).as("rows_differing"), lit(table).as("tbl"))
      else
        DataDiff.rowDiff(restrict(vSource), restrict(vTarget), pk)
          .groupBy("diff_status").count()
          .agg(sum(col("count")).as("rows_differing")).withColumn("tbl", lit(table))
    counts
      .join(badChunks, "tbl")
      .join(rows, "tbl")
      .select(col("tbl"), col("src_rows"), col("tgt_rows"), col("counts_match"),
        col("chunks_mismatched"),
        coalesce(col("rows_differing"), lit(0L)).as("rows_differing"))
  }
}
