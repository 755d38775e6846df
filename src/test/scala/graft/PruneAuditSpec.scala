package graft

import org.apache.spark.sql.functions._

import graft.sources.PruneAudit

/** E37: row-group pruning audit over parquet footer statistics. */
class PruneAuditSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame) = {
    val r = df.head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("E37: a range-clustered layout prunes exactly the disjoint groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    // four files with KNOWN disjoint key ranges: [0,250), [250,500), ...
    for (i <- 0 until 4)
      spark.range(i * 250, (i + 1) * 250).select(col("id").as("k"))
        .coalesce(1).write.mode("append").parquet(dir)
    val (groups, pruned, rows, rowsPruned, bytes, bytesPruned) =
      one(PruneAudit.audit(spark, dir, "k", 250L, 499L))
    assert(groups == 4L)
    assert(pruned == 3L, "the three files disjoint from [250,499] must prune")
    assert(rows == 1000L && rowsPruned == 750L)
    assert(bytes > 0L && bytesPruned > 0L && bytesPruned < bytes)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("E37: an unclustered layout proves it prunes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-flat").toString
    // every file spans the whole keyspace (round-robin): stats can't help
    spark.range(0, 1000).select((col("id") % 997).as("k"))
      .repartition(4).write.mode("overwrite").parquet(dir)
    val (groups, pruned, rows, rowsPruned, _, bytesPruned) =
      one(PruneAudit.audit(spark, dir, "k", 100L, 199L))
    assert(groups >= 4L && rows == 1000L)
    assert(pruned == 0L && rowsPruned == 0L && bytesPruned == 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("E37: non-INT64 key columns are refused loudly by the long audit") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-str").toString
    Seq("a", "b").toDF("s").write.mode("overwrite").parquet(dir)
    val e = intercept[Exception] {
      PruneAudit.audit(spark, dir, "s", 0L, 1L).collect()
    }
    assert(e.getMessage.contains("INT64") ||
      Option(e.getCause).exists(_.getMessage.contains("INT64")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("A10t: a valid_from_us-clustered SCD2 landing prunes point-in-time reads") {
    // the scaladoc claim on CdcApply.stateAt: on a landing clustered by
    // valid_from_us the interval predicates prune row groups, so a
    // point-in-time read touches only files whose version ranges straddle
    // T. Land a churny history range-clustered and measure with E37.
    import graft.cdc.CdcApply
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-scd2").toString
    val s = 1000000L
    // 40 keys × 50 versions, event times spread over [0, 2000 s)
    val feed = (for { k <- 1 to 40; v <- 0 until 50 } yield
        (k.toLong, (v * 40 + k).toLong, "U", s"v$v"))
      .toDF("pk", "seq", "Op", "v")
      .withColumn("ts", timestamp_micros(col("seq") * s))
    val hist = CdcApply.scd2History(feed, Seq("pk"), Seq(col("seq")), col("ts"))
      .localCheckpoint() // consumed twice: landing + in-memory oracle
    graft.sources.Compaction.zorderBy(hist, dir, Seq("valid_from_us"), numFiles = 4)
    // stateAt's first predicate is valid_from_us <= T — an early horizon
    // must skip every row group living entirely after it
    val T = 300L * s
    val (groups, pruned, _, rowsPruned, _, _) =
      one(PruneAudit.audit(spark, dir, "valid_from_us", Long.MinValue, T))
    assert(groups >= 4L, s"expected a multi-group landing, got $groups")
    assert(pruned > 0L && pruned < groups,
      s"an early horizon must prune some but not all groups ($pruned/$groups)")
    assert(rowsPruned > 0L)
    // and the landed history answers the point-in-time read identically
    val landed = CdcApply.stateAt(spark.read.parquet(dir), lit(T))
      .select("pk", "v").as[(Long, String)].collect().toSet
    val mem = CdcApply.stateAt(hist, lit(T))
      .select("pk", "v").as[(Long, String)].collect().toSet
    assert(landed == mem && landed.nonEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("E37: session-level hadoop settings provably reach the footer tasks") {
    // the round-6 defect: executor-side `new Configuration()` sees only
    // classpath XML, so session-held s3a credentials never reached the
    // footer reads. The fix broadcasts the session conf; prove a TASK
    // (not the driver) observes a key set only at session level.
    spark.conf.set("fs.graft.probe", "task-visible")
    try {
      assert(PruneAudit.executorConfProbe(spark, "fs.graft.probe") == "task-visible")
      assert(new org.apache.hadoop.conf.Configuration().get("fs.graft.probe") == null,
        "probe key must NOT be visible to a from-scratch Configuration " +
          "or this test proves nothing")
      // and the audit itself still returns the oracle row under the fix
      val dir = java.nio.file.Files.createTempDirectory("graft-prune-conf").toString
      spark.range(0, 100).select(col("id").as("k"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val (groups, pruned, rows, _, _, _) =
        one(PruneAudit.audit(spark, dir, "k", 200L, 300L))
      assert(groups == 1L && pruned == 1L && rows == 100L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    } finally spark.conf.unset("fs.graft.probe")
  }

  test("E37d: date-clustered layout prunes disjoint date ranges exactly") {
    import java.time.LocalDate
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-date").toString
    val base = LocalDate.of(2024, 1, 1)
    // four files, each a contiguous 10-day run: [Jan 1..10], [11..20], ...
    for (i <- 0 until 4)
      spark.range(i * 10, (i + 1) * 10)
        .select(date_add(lit(java.sql.Date.valueOf(base)), col("id").cast("int")).as("d"))
        .coalesce(1).write.mode("append").parquet(dir)
    val (groups, pruned, rows, rowsPruned, _, bytesPruned) =
      one(PruneAudit.auditDate(spark, dir, "d",
        base.plusDays(10), base.plusDays(19))) // exactly file 2
    assert(groups == 4L && rows == 40L)
    assert(pruned == 3L && rowsPruned == 30L && bytesPruned > 0L)
    // long audit on a date column refuses loudly
    val e = intercept[Exception] {
      PruneAudit.audit(spark, dir, "d", 0L, 1L).collect()
    }
    assert(e.getMessage.contains("INT64") ||
      Option(e.getCause).exists(_.getMessage.contains("INT64")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("E37s: string-clustered layout prunes unsigned-lexicographic ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-strk").toString
    // four files with disjoint key prefixes: a*, b*, c*, d*
    for (p <- Seq("a", "b", "c", "d"))
      spark.range(0, 50).select(concat(lit(p), format_string("%03d", col("id"))).as("s"))
        .coalesce(1).write.mode("append").parquet(dir)
    val (groups, pruned, rows, rowsPruned, _, _) =
      one(PruneAudit.auditString(spark, dir, "s", "b", "b~")) // ~ > digits: all b*
    assert(groups == 4L && rows == 200L)
    assert(pruned == 3L && rowsPruned == 150L)
    // date audit on a string column refuses loudly
    val e = intercept[Exception] {
      PruneAudit.auditDate(spark, dir, "s",
        java.time.LocalDate.of(2024, 1, 1), java.time.LocalDate.of(2024, 2, 1)).collect()
    }
    assert(e.getMessage.contains("DATE") ||
      Option(e.getCause).exists(_.getMessage.contains("DATE")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
