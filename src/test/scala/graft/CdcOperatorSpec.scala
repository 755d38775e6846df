package graft

import java.nio.file.{Files, Path}
import java.time.Instant

import graft.cdc.CdcOperator
import graft.cdc.CdcOperator.{SnapshotConfig, ValidateConfig}
import graft.sources.DmsFileCatalog.DateAware
import org.apache.spark.sql.functions._

/** End-to-end orchestration: multi-table discovery, selection, replay,
  * validate — the reference's CDCOperator::snapshot/validate loop. */
class CdcOperatorSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("graft-op")
    def write(table: String, name: String, rows: Seq[(Long, String, String)], mtime: Long): Unit = {
      val tdir = dir.resolve(s"landing/mydb/public/$table/2024/02/14")
      Files.createDirectories(tdir)
      val tmp = Files.createTempDirectory("p")
      rows.toDF("id", "v", "Op").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dest = tdir.resolve(name)
      Files.copy(part, dest)
      dest.toFile.setLastModified(mtime)
    }
    val t0 = Instant.parse("2024-02-14T10:00:00Z").toEpochMilli
    write("users", "LOAD00000001.parquet", Seq((1L, "a", "I"), (2L, "b", "I")), t0)
    write("users", "20240214-1.parquet", Seq((2L, "b2", "U"), (3L, "c", "I")), t0 + 60000)
    write("orders", "LOAD00000001.parquet", Seq((10L, "x", "I")), t0)
    write("skipme", "LOAD00000001.parquet", Seq((99L, "z", "I")), t0)
    dir
  }

  private def cfg = SnapshotConfig(
    bucketPrefix = s"$root/landing",
    databaseName = "mydb",
    excludedTables = Seq("skipme"),
    mode = DateAware(Instant.parse("2024-02-14T09:00:00Z"), None),
    pkByTable = Map("users" -> Seq("id"), "orders" -> Seq("id")))

  test("discovery honors exclude list and sorts tables") {
    assert(CdcOperator.discoverTables(spark, cfg) == Seq("orders", "users"))
  }

  test("snapshot replays every selected table to current state") {
    val states = CdcOperator.snapshot(spark, cfg).map(s => s.table -> s).toMap
    assert(states.keySet == Set("orders", "users"))
    val users = states("users").state.select("id", "v").as[(Long, String)].collect().toMap
    assert(users == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(!states("users").state.columns.contains("Op"))
    assert(states("orders").state.count() == 1)
  }

  test("as-of horizon replays only files already written at T") {
    val t0 = Instant.parse("2024-02-14T10:00:00Z").toEpochMilli
    // horizon between the LOAD (t0) and the CDC file (t0+60s): users is
    // the load-only state, the later update/insert never read
    val asOf = cfg.copy(asOfMs = Some(t0 + 30000))
    val states = CdcOperator.snapshot(spark, asOf).map(s => s.table -> s).toMap
    val users = states("users").state.select("id", "v").as[(Long, String)].collect().toMap
    assert(users == Map(1L -> "a", 2L -> "b"))
    assert(states("users").files.forall(_.modifiedMs <= t0 + 30000))
    // horizon before anything existed: the table is skipped entirely
    assert(CdcOperator.snapshot(spark, cfg.copy(asOfMs = Some(t0 - 1))).isEmpty)
  }

  test("pk comes from the resolver when config omits the table") {
    // users deliberately missing from pkByTable: reflection supplies it.
    // Wrong-pk replay would keep both versions of id=2; the resolver pk
    // must produce the same LWW state as explicit config.
    var asked = List.empty[String]
    val reflCfg = cfg.copy(
      pkByTable = Map("orders" -> Seq("id")),
      pkResolver = t => { asked ::= t; if (t == "users") Seq("id") else Seq.empty })
    val users = CdcOperator.snapshot(spark, reflCfg).find(_.table == "users").get.state
    assert(asked.contains("users"))
    val m = users.select("id", "v").as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("resolver columns absent from the frame fall through to the guess") {
    assert(CdcOperator.resolvePk(
      cfg.copy(pkByTable = Map.empty, pkResolver = _ => Seq("not_a_column")),
      "users", Seq("Op", "id", "v")) == Some(Seq("id")))
  }

  test("A5: schema drift aborts the table loudly, clean tables proceed") {
    // users files carry data columns (id, v); declaring the source table
    // as (id) only makes 'v' blocking drift → users must be skipped,
    // orders (declared fully) must proceed — cdc_operator.rs:171-186
    val guarded = cfg.copy(columnsByTable =
      Map("users" -> Seq("id"), "orders" -> Seq("id", "v")))
    assert(CdcOperator.snapshot(spark, guarded).map(_.table) == Seq("orders"))
    // reflection-supplied column sets drive the same guard
    val viaResolver = cfg.copy(
      columnResolver = t => if (t == "users") Seq("id") else Seq("id", "v"))
    assert(CdcOperator.snapshot(spark, viaResolver).map(_.table) == Seq("orders"))
    // an exactly-matching column set replays normally (service columns
    // and catalog internals never count as drift)
    val ok = cfg.copy(columnsByTable =
      Map("users" -> Seq("id", "v"), "orders" -> Seq("id", "v")))
    assert(CdcOperator.snapshot(spark, ok).map(_.table) == Seq("orders", "users"))
  }

  test("validate reports counts, chunk mismatches, and differing rows") {
    val users = CdcOperator.snapshot(spark, cfg)
      .find(_.table == "users").get.state
    val target = users.withColumn("v",
      when($"id" === 2L, lit("tampered")).otherwise($"v"))
      .filter($"id" =!= 3L)
    val report = CdcOperator.validate(users, target, Seq("id"), "users").head()
    assert(report.getAs[Long]("src_rows") == 3L)
    assert(report.getAs[Long]("tgt_rows") == 2L)
    assert(!report.getAs[Boolean]("counts_match"))
    assert(report.getAs[Long]("rows_differing") == 2L) // one mismatch + one source_only
    assert(report.getAs[Long]("chunks_mismatched") >= 1L)
  }

  test("interval merge is distributed: runs span merge buckets, windows partitioned") {
    // synthetic chunk report, bucketChunks=2 so runs cross bucket borders:
    // chunks 0-2 chain ([1,5]∪[4,8]∪[8,9] — the 1↔2 link crosses the
    // bucket-0/bucket-1 boundary), 3-4 chain, 6 is clean and breaks nothing
    def pkS(v: Long) = struct(lit(v).as("id"))
    val report = Seq(
      (0L, false, 1L, 5L), (1L, false, 4L, 8L), (2L, false, 8L, 9L),
      (3L, false, 11L, 12L), (4L, false, 12L, 20L), (6L, true, 30L, 40L))
      .toDF("chunk_id", "chunks_match", "l", "h")
      .select($"chunk_id", $"chunks_match",
        struct($"l".as("id")).as("lo"), struct($"h".as("id")).as("hi"))
    val merged = CdcOperator.mergedBadIntervals(report, bucketChunks = 2L)
    val runs = merged.select($"__lo.id", $"__hi.id").as[(Long, Long)].collect().toSet
    assert(runs == Set((1L, 9L), (11L, 20L)))
    // scale pin: no partition-less window anywhere in the merge plan
    val windows = merged.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "interval merge planned a partition-less window")
  }

  test("validate plan contains no partition-less window (ordered mode)") {
    val users = CdcOperator.snapshot(spark, cfg).find(_.table == "users").get.state
    val target = users.withColumn("v",
      when($"id" === 2L, lit("tampered")).otherwise($"v"))
    val report = CdcOperator.validate(users, target, Seq("id"), "users")
    val windows = report.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "validate planned a partition-less window")
    assert(report.head().getAs[Long]("rows_differing") == 1L) // still correct end-to-end
  }

  test("validate onlyCount short-circuits to the count compare") {
    val users = CdcOperator.snapshot(spark, cfg).find(_.table == "users").get.state
    val report = CdcOperator.validate(users, users, Seq("id"), "users",
      ValidateConfig(onlyCount = true))
    assert(report.columns.toSeq == Seq("tbl", "src_rows", "tgt_rows", "counts_match"))
    assert(report.head().getAs[Boolean]("counts_match"))
  }

  test("B2b: global positions are exact across partitions") {
    import graft.diff.DataDiff
    // deliberately unsorted, many partitions: positions must equal the
    // rank in pk order, 0-based, gap-free — the broadcast-offset path has
    // to agree with a plain global sort
    val df = spark.range(0, 1000).select((($"id" * 7919) % 1000).as("k")).repartition(13)
    val pos = DataDiff.withOrderedPosition(df, Seq("k"), "pos")
      .select("k", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(pos.map(_._1).toSeq == (0L until 1000L))
    assert(pos.map(_._2).toSeq == (0L until 1000L)) // k dense → pos == k
  }

  test("B2b: ordered chunks skip startPosition rows and shift on insert") {
    import graft.diff.DataDiff
    val src = spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("v"))
    // target inserts one row at the front: every later chunk shifts
    val tgt = src.unionByName(Seq((-1L, -2L)).toDF("k", "v"))
    val d = DataDiff.orderedChunkDiff(src, tgt, Seq("k"), chunkSize = 10, startPosition = 20)
      .collect().map(r => r.getAs[Long]("chunk_id") -> r.getAs[Boolean]("chunks_match")).toMap
    // positions < 20 skipped on both sides → chunks 0,1 absent
    assert(!d.contains(0L) && !d.contains(1L))
    // with the insert, target rows at pos p hold key p-1 → all chunks differ
    assert(d.keys.min == 2L && d.values.forall(_ == false))
    // identical sides: all chunks match, count respects the skip
    val clean = DataDiff.orderedChunkDiff(src, src, Seq("k"), 10, 20).collect()
    assert(clean.length == 8 && clean.forall(_.getAs[Boolean]("chunks_match")))
  }

  test("B2: chunk hashes detect null-position swaps (concat_ws null skip)") {
    import graft.diff.DataDiff
    val src = Seq((1L, Option("a"), Option.empty[String])).toDF("k", "v1", "v2")
    val tgt = Seq((1L, Option.empty[String], Option("a"))).toDF("k", "v1", "v2")
    val d = DataDiff.chunkDiff(src, tgt, lit(0L)).collect()
    assert(d.length == 1 && !d.head.getAs[Boolean]("chunks_match"),
      "(NULL,'a') vs ('a',NULL) must not hash-collide")
    // and a NULL vs the literal sentinel-free string still differs
    val tgt2 = Seq((1L, Option("NULL"), Option.empty[String])).toDF("k", "v1", "v2")
    val d2 = DataDiff.chunkDiff(tgt, tgt2, lit(0L)).collect()
    assert(!d2.head.getAs[Boolean]("chunks_match"))
  }

  test("validateAll overlaps tables on a bounded pool with unchanged reports") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
    // four tables with enough volume that each validate runs several jobs,
    // and with real damage so the row drill-down path participates too
    val tasks = (0 until 4).map { i =>
      val src = spark.range(0, 20000)
        .select(($"id" + i * 100000L).as("id"), concat(lit("v"), $"id").as("v"))
      val tgt = src.filter($"id" % 5001L =!= 3L)
      CdcOperator.ValidateTask(src, tgt, Seq("id"), s"partab_$i")
    }
    val vcfg = ValidateConfig(chunkSize = 500)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val windows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null && g.startsWith("graft-validate-partab_"))
          starts.put(js.jobId, (g, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) windows.add((s._1, s._2, je.time))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val par = CdcOperator.validateAll(tasks, vcfg, parallelism = 4)
      // identical reports, in task order, vs the sequential loop
      val seqR = tasks.map(t =>
        CdcOperator.validate(t.source, t.target, t.pk, t.table, vcfg).head())
      assert(par == seqR)
      assert(par.forall(_.getAs[Long]("rows_differing") > 0L), "damage must surface")
      // wait for the (async) listener bus to drain, then require that two
      // jobs from DIFFERENT table groups overlapped in scheduler time
      val deadline = System.currentTimeMillis() + 15000
      var snapshotSize = -1
      while (System.currentTimeMillis() < deadline &&
          (windows.size != snapshotSize || windows.isEmpty)) {
        snapshotSize = windows.size
        Thread.sleep(300)
      }
      val ws = windows.toArray(Array.empty[(String, Long, Long)]).toSeq
      assert(ws.map(_._1).distinct.size >= 2, s"jobs from >=2 tables expected, got $ws")
      val concurrent = ws.exists { case (g1, s1, e1) =>
        ws.exists { case (g2, s2, e2) => g1 != g2 && s1 < e2 && s2 < e1 }
      }
      assert(concurrent,
        s"expected overlapping job windows from different tables, got $ws")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("identical tables validate clean") {
    val users = CdcOperator.snapshot(spark, cfg).find(_.table == "users").get.state
    val report = CdcOperator.validate(users, users, Seq("id"), "users")
    // rows-only-on-mismatch: a clean chunk report must short-circuit the
    // row-level pass — the report plan never full-outer-joins the tables
    // row-level (rowDiff's __sv/__tv value structs are its fingerprint)
    val plan = report.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__sv"), "clean validate must not build the row-level join")
    val r = report.head()
    assert(r.getAs[Boolean]("counts_match"))
    assert(r.getAs[Long]("chunks_mismatched") == 0L)
    assert(r.getAs[Long]("rows_differing") == 0L)
  }

  test("A0g: sampled screening validates exactly the deterministic chunk subset") {
    import graft.diff.DataDiff
    import graft.text.PortableHash
    val src = spark.range(0, 800)
      .select($"id".as("k"), ($"id" * 7).cast("string").as("v"))
    val tgt = src
      .withColumn("v", when($"k" % 83 === 0, lit("tampered")).otherwise($"v"))
      .filter($"k" =!= 111L)
    // the sampled-keyspace oracle, derived independently: rows whose hash
    // chunk id falls under the salted draw
    val chunkOf = (pmod(PortableHash.h32(
      coalesce($"k".cast("string"), lit("NULL"))), lit(1000000))
      .cast("long") / lit(50L)).cast("long")
    val keep = pmod(PortableHash.h32(
      concat(lit("vsamp:"), chunkOf.cast("string"))), lit(10000L)) < 3000L
    val (srcS, tgtS) = (src.filter(keep), tgt.filter(keep))
    val report = CdcOperator.validate(src, tgt, Seq("k"), "t",
      ValidateConfig(chunkSize = 50, orderedChunks = false, sampleBp = 3000)).head()
    // counts cover exactly the sampled keyspace on both sides
    assert(report.getAs[Long]("src_rows") == srcS.count())
    assert(report.getAs[Long]("tgt_rows") == tgtS.count())
    // the row drill-down finds exactly the sample's damage
    assert(report.getAs[Long]("rows_differing") == DataDiff.rowDiff(srcS, tgtS, Seq("k")).count())
    // the sample is a genuine subset (screening, not a re-run of full)
    assert(report.getAs[Long]("src_rows") < 800L && report.getAs[Long]("src_rows") > 0L)
    // full-coverage run still reports everything
    val full = CdcOperator.validate(src, tgt, Seq("k"), "t",
      ValidateConfig(chunkSize = 50, orderedChunks = false)).head()
    assert(full.getAs[Long]("rows_differing") == DataDiff.rowDiff(src, tgt, Seq("k")).count())
    assert(full.getAs[Long]("rows_differing") >= report.getAs[Long]("rows_differing"))
    // ordered chunks + sampling is refused loudly
    val e = intercept[IllegalArgumentException] {
      CdcOperator.validate(src, tgt, Seq("k"), "t",
        ValidateConfig(chunkSize = 50, sampleBp = 3000))
    }
    assert(e.getMessage.contains("hash chunking"))
  }

  test("gated row drill-down equals the full row diff, both chunk modes") {
    import graft.diff.DataDiff
    val src = spark.range(0, 500)
      .select($"id".as("k"), ($"id" * 3).cast("string").as("v"))
    // tamper two rows, drop one, add one — damage spread across chunks
    val tgt = src
      .withColumn("v", when($"k" === 37L || $"k" === 412L, lit("tampered")).otherwise($"v"))
      .filter($"k" =!= 250L)
      .unionByName(Seq((900L, "extra")).toDF("k", "v"))
    val full = DataDiff.rowDiff(src, tgt, Seq("k")).count()
    for (ordered <- Seq(true, false)) {
      val report = CdcOperator.validate(src, tgt, Seq("k"), "t",
        ValidateConfig(chunkSize = 50, orderedChunks = ordered)).head()
      assert(report.getAs[Long]("rows_differing") == full,
        s"orderedChunks=$ordered must find every differing row via mismatched chunks only")
      assert(report.getAs[Long]("chunks_mismatched") >= 1L)
    }
    // and a perturbed report is identical between modes on the users fixture
    val users = CdcOperator.snapshot(spark, cfg).find(_.table == "users").get.state
    val target = users.withColumn("v",
      when($"id" === 2L, lit("tampered")).otherwise($"v")).filter($"id" =!= 3L)
    val a = CdcOperator.validate(users, target, Seq("id"), "users").head()
    val b = CdcOperator.validate(users, target, Seq("id"), "users",
      ValidateConfig(orderedChunks = false)).head()
    assert(a.getAs[Long]("rows_differing") == b.getAs[Long]("rows_differing"))
    // startPosition > 0: counts come from the dedicated aggregate (the
    // chunk report no longer covers skipped rows) and stay FULL-table
    val skipped = CdcOperator.validate(src, tgt, Seq("k"), "t",
      ValidateConfig(chunkSize = 50, startPosition = 100)).head()
    assert(skipped.getAs[Long]("src_rows") == 500L)
    assert(skipped.getAs[Long]("tgt_rows") == 500L) // 499 kept + 1 ghost
  }
}
