package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output-file sizing for snapshot/CDC landing — the small-file problem
  * at 100 TB: a 1000-task replay writing one file per task per table
  * floods the catalog with KB-scale parquet, and every later scan pays
  * per-file open cost. Landing through a REBALANCE hint lets AQE coalesce
  * or split shuffle output to evenly sized partitions at runtime, and
  * `maxRecordsPerFile` caps the top end; together they produce
  * similar-sized, bounded files regardless of upstream partitioning or
  * skew.
  */
object Compaction {

  /** Write `df` as parquet with evenly sized output files of at most
    * `maxRecordsPerFile` rows. */
  def landSized(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.hint("rebalance")
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Z-ORDER layout: land `df` clustered on SEVERAL numeric columns at
    * once, so parquet min/max stats prune scans filtered on ANY of them.
    * A plain `sortBy(x)` localizes x per file but leaves every other
    * column's per-file range at the full domain — at 100 TB that is the
    * difference between reading 1/Nth of the files and reading all of
    * them for a `WHERE y = ...` query. Interleaving the bits of each
    * column's rank bucket (the Morton / Z curve) makes file boundaries
    * approximate hyper-rectangles: with F files over d dimensions each
    * file spans ≈ F^(-1/d) of EVERY dimension.
    *
    * Mechanics: one aggregation computes each column's min/max (a
    * driver-sized row, not a data collect); each column scales to a
    * 16-bit rank bucket; the buckets' bits interleave into a single
    * z-value via shift/or expressions (codegen'd, no UDF); rows then
    * `repartitionByRange` + sort on that z-value and land sized. The
    * z column is dropped before write — it exists only to order rows.
    *
    * Columns must be numeric/timestamp (anything `cast("double")` keeps
    * an order for). Up to 4 columns (4 use 15 bits each so the key stays
    * off the long's sign bit) — locality per dimension degrades
    * geometrically with d anyway, so high-d layouts belong to the ANN
    * index instead. */
  def zorderBy(
      df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, maxRecordsPerFile: Long = Long.MaxValue): Unit = {
    require(cols.nonEmpty && cols.size <= 4, "z-order takes 1-4 columns")
    require(numFiles > 0, "numFiles must be positive")
    // bits*cols must stay OFF the long's sign bit: 4×16 would put the
    // last column's top bit at bit 63, flipping z negative for half its
    // domain and splitting the curve at the two's-complement wrap (one
    // unprunable file straddling the max/min corners). 63/cols keeps
    // every z non-negative: 1-3 cols → 16 bits, 4 cols → 15.
    val bits = math.min(16, 63 / cols.length)
    // two actions read df (the stats agg, then the clustered write) —
    // pay its plan once; callers landing a frame too large to persist
    // should checkpoint upstream themselves
    val cached = df.persist()
    try {
      val aggs = cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c")))
      val stats = cached.agg(aggs.head, aggs.tail: _*).head()
      val buckets: Seq[Column] = cols.map { c =>
        val mn = stats.getAs[Double](s"__mn_$c")
        val mx = stats.getAs[Double](s"__mx_$c")
        val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
        least(lit((1 << bits) - 1), greatest(lit(0),
          ((col(c).cast("double") - lit(mn)) / lit(span) * lit(((1 << bits) - 1).toDouble))
            .cast("long")))
      }
      val z = (0 until bits).flatMap { i =>
        buckets.zipWithIndex.map { case (b, j) =>
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * cols.length + j)
        }
      }.reduce(_ bitwiseOR _)
      cached.withColumn("__z", z)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write
        .mode("overwrite")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .parquet(path)
    } finally cached.unpersist()
  }
}
