package graft.sources

import java.time.Instant

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** DMS S3 layout discovery — the reference's S3Operator
  * (/root/reference/src/s3/s3_operator.rs) over the Hadoop FileSystem API,
  * so the same code serves s3a://, hdfs:// and file:// URIs.
  *
  * Layout: `<prefix>/<database>/<schema>/<table>/<YYYY>/<MM>/<DD>/<file>.parquet`
  * with full-load files named `LOAD*` and CDC files timestamped. Modes
  * (s3_operator.rs:11-29):
  *  - DateAware: LOAD files + CDC files modified in [startDate, stopDate)
  *  - FullLoadOnly: only LOAD* files
  *  - AbsolutePath: one explicit file
  *
  * LOAD files order first, then CDC files by (modification time, name) —
  * the replay sequence (the reference rotates LOAD files to the front,
  * s3_operator.rs:181-188). The listing itself is metadata-only.
  */
object DmsFileCatalog {

  sealed trait Mode
  /** `startSlackDays` widens the PATH-date pruning bound below
    * `startDate` (default 1 day of clock skew between path date and
    * mtime). Operators ingesting late-uploaded historical partitions —
    * a backfill whose path date is far older than its mtime — must
    * widen it (or the partition is never listed, regardless of mtime);
    * the secondary mtime filter still decides file-by-file. */
  case class DateAware(
      startDate: Instant, stopDate: Option[Instant],
      startSlackDays: Int = 1) extends Mode
  case object FullLoadOnly extends Mode
  case class AbsolutePath(path: String) extends Mode

  case class CatalogedFile(path: String, isLoad: Boolean, seq: Long, modifiedMs: Long)

  /** DMS names full-load files `LOAD<seq>.parquet` — key on the basename
    * PREFIX, so a CDC file that merely contains "LOAD" somewhere in its
    * name is not misclassified. */
  def isLoadFile(name: String): Boolean = name.startsWith("LOAD")
  def isFirstLoadFile(name: String): Boolean = name == "LOAD00000001.parquet" || name == "LOAD00000001"

  def tablePrefix(prefix: String, database: String, schema: String, table: String): String =
    s"$prefix/$database/$schema/$table"

  /** List and order a table's parquet files per mode. */
  def listFiles(
      spark: SparkSession,
      prefix: String, database: String, schema: String, table: String,
      mode: Mode): Seq[CatalogedFile] = mode match {
    case AbsolutePath(p) =>
      // real mtime (one getFileStatus RPC): the previous hardcoded 0
      // made an as-of horizon silently keep the file for ANY requested
      // instant — the exact backup-audit query the horizon exists for.
      // When the filesystem can't answer, MaxValue makes every horizon
      // EXCLUDE the file: an empty snapshot errs loud instead of
      // labeling the current state as "the state at T".
      val mtime =
        try {
          val path = new Path(p)
          path.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getFileStatus(path).getModificationTime
        } catch { // fatal throwables (OOM, interrupt) must propagate, not
          // mutate into "file written after every horizon"
          case scala.util.control.NonFatal(_) => Long.MaxValue
        }
      Seq(CatalogedFile(p, isLoadFile(p.split('/').last), 0L, mtime))
    case m =>
      val dir = new Path(tablePrefix(prefix, database, schema, table))
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) return Seq.empty
      // DateAware never lists the whole table prefix: `YYYY/MM/DD`
      // partition directories outside [startDate, stopDate] are pruned
      // BEFORE any listing descends into them — the Hadoop-FS analogue of
      // the reference's `start_after(start_date_path)` pagination
      // (s3_operator.rs:147-175), which skips all keys lexicographically
      // before the start date's path. With years of CDC files the old
      // full recursive listing is an unbounded driver-side scan.
      val candidates = (m match {
        case DateAware(start, stop, slack) => listDatePruned(fs, dir, start, stop, slack)
        case _ => listRecursive(fs, dir)
      }).filter(f => f.getPath.getName.endsWith(".parquet") || isLoadFile(f.getPath.getName))
      val selected = m match {
        case FullLoadOnly => candidates.filter(f => isLoadFile(f.getPath.getName))
        case DateAware(start, stop, _) =>
          // mtime window stays as the secondary, file-granular check
          candidates.filter { f =>
            val name = f.getPath.getName
            val mod = f.getModificationTime
            isLoadFile(name) ||
              (mod > start.toEpochMilli && stop.forall(s => mod < s.toEpochMilli))
          }
        case AbsolutePath(_) => Seq.empty // unreachable
      }
      val ordered = selected.sortBy { f =>
        // LOAD files first (by name), then CDC files by (mtime, name)
        val load = isLoadFile(f.getPath.getName)
        (if (load) 0 else 1, if (load) 0L else f.getModificationTime, f.getPath.getName)
      }
      ordered.zipWithIndex.map { case (f, i) =>
        CatalogedFile(f.getPath.toString, isLoadFile(f.getPath.getName),
          i.toLong, f.getModificationTime)
      }
  }

  /** Bounded listing for DateAware mode: walk the table prefix treating
    * plausible-date directory levels as `YYYY` / `YYYY/MM` / `YYYY/MM/DD`
    * partitions and descend only into those whose date range can
    * intersect [startDate - 1 day, stopDate]. Partition-prefix bounds
    * compare as lexicographic (y, m, d) tuples — an unknown month/day
    * widens to its extreme, so a prefix is pruned only when provably
    * outside the window.
    *
    * Two deliberate safety margins: (a) the start bound is slackened by
    * one day because the PATH date (transaction date) and the MTIME the
    * secondary filter checks come from different clocks — a batch for
    * 23:59 can be uploaded after midnight, and pruning by exact path
    * date would silently drop it from the incremental run that owns it;
    * (b) only plausible date components prune (4-digit year, month 1-12,
    * day 1-31) — files at the table root, non-numeric subtrees, and
    * numeric-but-not-a-date subtrees (a `42/` partition) are always
    * listed, so pruning never loses a file it can't date from the path
    * alone. */
  private def listDatePruned(
      fs: FileSystem, dir: Path,
      start: Instant, stop: Option[Instant],
      startSlackDays: Int = 1): Seq[org.apache.hadoop.fs.FileStatus] = {
    import java.time.{LocalDate, ZoneOffset}
    val ord = Ordering.Tuple3[Int, Int, Int]
    // clock-skew / backfill slack (DateAware.startSlackDays)
    val s = LocalDate.ofInstant(start, ZoneOffset.UTC).minusDays(startSlackDays.toLong)
    val startT = (s.getYear, s.getMonthValue, s.getDayOfMonth)
    val stopT = stop.map { i =>
      val t = LocalDate.ofInstant(i, ZoneOffset.UTC)
      (t.getYear, t.getMonthValue, t.getDayOfMonth)
    }
    def inWindow(y: Int, m: Option[Int], d: Option[Int]): Boolean = {
      val hi = (y, m.getOrElse(12), d.getOrElse(31))
      val lo = (y, m.getOrElse(1), d.getOrElse(1))
      ord.gteq(hi, startT) && stopT.forall(t => ord.lteq(lo, t))
    }
    def num(name: String, lo: Int, hi: Int): Option[Int] =
      if (name.nonEmpty && name.forall(_.isDigit) && name.length <= 4) {
        val v = name.toInt
        if (v >= lo && v <= hi) Some(v) else None
      } else None
    def year(name: String) =
      if (name.length == 4) num(name, 1970, 2999) else None
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    val root = fs.listStatus(dir)
    buf ++= root.filter(_.isFile)
    for (yDir <- root.filter(_.isDirectory)) year(yDir.getPath.getName) match {
      case Some(y) if !inWindow(y, None, None) => // pruned: never listed
      case Some(y) =>
        val months = fs.listStatus(yDir.getPath)
        buf ++= months.filter(_.isFile)
        for (mDir <- months.filter(_.isDirectory)) num(mDir.getPath.getName, 1, 12) match {
          case Some(mo) if !inWindow(y, Some(mo), None) => // pruned
          case Some(mo) =>
            val days = fs.listStatus(mDir.getPath)
            buf ++= days.filter(_.isFile)
            for (dDir <- days.filter(_.isDirectory)) num(dDir.getPath.getName, 1, 31) match {
              case Some(d) if !inWindow(y, Some(mo), Some(d)) => // pruned
              case _ => buf ++= listRecursive(fs, dDir.getPath)
            }
          case None => buf ++= listRecursive(fs, mDir.getPath)
        }
      case None => buf ++= listRecursive(fs, yDir.getPath)
    }
    buf.toSeq
  }

  private def listRecursive(fs: FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val it = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  /** Read a cataloged table as one DataFrame, tagging each row with its
    * file sequence (the CDC replay ordering key) and load/cdc origin —
    * the inputs CdcApply.latestState / Snapshot need. One scan, no
    * per-file driver loop. */
  def readTable(spark: SparkSession, files: Seq[CatalogedFile]): DataFrame = {
    import org.apache.spark.sql.functions._
    if (files.isEmpty) return spark.emptyDataFrame
    // key by basename: input_file_name() URI normalization varies by
    // filesystem, but DMS file names (LOAD*, timestamped CDC) are unique
    // within a table
    def basename(p: String) = p.split('/').last
    val seqMap = typedLit(files.map(f => basename(f.path) -> f.seq).toMap)
    val loadMap = typedLit(files.map(f => basename(f.path) -> f.isLoad).toMap)
    val nameCol = element_at(split(input_file_name(), "/"), -1)
    spark.read.parquet(files.map(_.path): _*)
      .withColumn("_seq", element_at(seqMap, nameCol))
      .withColumn("_is_load", element_at(loadMap, nameCol))
  }
}
