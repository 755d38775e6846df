package graft

import java.nio.file.{Files, Path, Paths}
import java.time.Instant

import graft.sources.DmsFileCatalog
import graft.sources.DmsFileCatalog._
import org.apache.spark.sql.functions._

/** DMS file catalog over a synthesized on-disk layout (SURVEY §2 A6):
  * LOAD-first ordering, mode filtering, sequence tagging. */
class CatalogSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("graft-dms")
    val tableDir = dir.resolve("prefix/db/public/users/2024/02/14")
    Files.createDirectories(tableDir)
    // write three parquet files: one LOAD, two CDC — CDC mtimes ordered
    def write(name: String, rows: Seq[(Long, String, String)], mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-part")
      rows.toDF("id", "v", "Op").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = tableDir.resolve(name)
      Files.copy(part, dest)
      dest.toFile.setLastModified(mtime)
    }
    val t0 = Instant.parse("2024-02-14T10:00:00Z").toEpochMilli
    write("LOAD00000001.parquet", Seq((1L, "a", "I"), (2L, "b", "I")), t0)
    write("20240214-101000000.parquet", Seq((1L, "a2", "U")), t0 + 60000)
    write("20240214-102000000.parquet", Seq((2L, "-", "D")), t0 + 120000)
    dir
  }

  private def list(mode: Mode) =
    DmsFileCatalog.listFiles(spark, s"$root/prefix", "db", "public", "users", mode)

  test("A6: full-load-only returns just LOAD files") {
    val files = list(FullLoadOnly)
    assert(files.map(f => f.path.split('/').last) == Seq("LOAD00000001.parquet"))
    assert(files.head.isLoad)
  }

  test("A6: date-aware keeps LOAD + CDC in window, LOAD first") {
    val start = Instant.parse("2024-02-14T10:00:30Z")
    val files = list(DateAware(start, None))
    assert(files.map(_.path.split('/').last) ==
      Seq("LOAD00000001.parquet", "20240214-101000000.parquet", "20240214-102000000.parquet"))
    assert(files.map(_.seq) == Seq(0L, 1L, 2L))
    // stop date excludes the last CDC file
    val stopped = list(DateAware(start, Some(Instant.parse("2024-02-14T10:01:30Z"))))
    assert(stopped.map(_.path.split('/').last) ==
      Seq("LOAD00000001.parquet", "20240214-101000000.parquet"))
  }

  test("A6: LOAD files always included regardless of window (reference quirk)") {
    val late = Instant.parse("2024-02-14T10:05:00Z")
    val files = list(DateAware(late, None))
    assert(files.exists(_.isLoad))
    assert(files.count(!_.isLoad) == 0)
  }

  test("A6: absolute path mode wraps a single file") {
    val files = list(AbsolutePath("/x/y/LOAD1.parquet"))
    assert(files.map(_.path) == Seq("/x/y/LOAD1.parquet"))
    assert(files.head.isLoad)
  }

  test("A6+A4: readTable tags rows with sequence; replay yields final state") {
    val start = Instant.parse("2024-02-14T09:00:00Z")
    val files = list(DateAware(start, None))
    val df = DmsFileCatalog.readTable(spark, files)
    assert(df.columns.contains("_seq") && df.columns.contains("_is_load"))
    val state = graft.cdc.CdcApply.latestState(
      df, Seq("id"), Seq(col("_seq")))
      .select("id", "v").as[(Long, String)].collect().toMap
    // id=1 updated to a2; id=2 deleted by last CDC file
    assert(state == Map(1L -> "a2"))
  }

  test("A6: date partitions before startDate are pruned, never listed") {
    // an in-window MTIME inside an out-of-window DATE DIR: the old
    // full-recursive listing would have kept it via the mtime filter; the
    // date-pruned walk must never descend into 2023/… at all
    val t0 = Instant.parse("2024-02-14T10:00:00Z").toEpochMilli
    def write(rel: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-part")
      Seq((1L, "x", "I")).toDF("id", "v", "Op").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = root.resolve(s"prefix/db/public/pruned/$rel")
      Files.createDirectories(dest.getParent)
      Files.copy(part, dest)
      dest.toFile.setLastModified(mtime)
    }
    write("2023/01/01/20230101-000000000.parquet", t0 + 60000) // stale dir, fresh mtime
    write("2024/02/14/20240214-101000000.parquet", t0 + 60000)
    write("LOAD00000001.parquet", t0) // root LOAD always survives
    val start = Instant.parse("2024-02-01T00:00:00Z")
    val names = DmsFileCatalog.listFiles(
      spark, s"$root/prefix", "db", "public", "pruned", DateAware(start, None))
      .map(_.path.split('/').last)
    assert(names == Seq("LOAD00000001.parquet", "20240214-101000000.parquet"))
  }

  test("A6: prune keeps 1-day path slack and never dates non-date numeric dirs") {
    val t0 = Instant.parse("2024-02-14T10:00:00Z").toEpochMilli
    def write(rel: String, mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("graft-part")
      Seq((1L, "x", "I")).toDF("id", "v", "Op").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = root.resolve(s"prefix/db/public/slack/$rel")
      Files.createDirectories(dest.getParent)
      Files.copy(part, dest)
      dest.toFile.setLastModified(mtime)
    }
    // path date one day BEFORE startDate, mtime in window: the upload
    // clock lags the transaction-date path — must survive the prune
    write("2024/02/13/20240213-235900000.parquet", t0 + 60000)
    // numeric but not a plausible date: always listed, never misdated
    write("42/something.parquet", t0 + 60000)
    // genuinely old: pruned
    write("2023/11/30/20231130-000000000.parquet", t0 + 60000)
    val start = Instant.parse("2024-02-14T00:00:00Z")
    val names = DmsFileCatalog.listFiles(
      spark, s"$root/prefix", "db", "public", "slack", DateAware(start, None))
      .map(_.path.split('/').last).toSet
    assert(names == Set("20240213-235900000.parquet", "something.parquet"))
    // a backfilled partition (path date months old, in-window mtime) is
    // invisible at the default slack but reachable by widening it
    val widened = DmsFileCatalog.listFiles(
      spark, s"$root/prefix", "db", "public", "slack",
      DateAware(start, None, startSlackDays = 120))
      .map(_.path.split('/').last).toSet
    assert(widened.contains("20231130-000000000.parquet"))
  }

  test("A6: isLoadFile keys on the LOAD basename prefix only") {
    assert(DmsFileCatalog.isLoadFile("LOAD00000001.parquet"))
    assert(!DmsFileCatalog.isLoadFile("20240214-LOADED.parquet"))
  }

  test("A6: missing table dir lists empty") {
    assert(DmsFileCatalog.listFiles(
      spark, s"$root/prefix", "db", "public", "nope", FullLoadOnly).isEmpty)
  }
}
