package graft

import graft.cdc.{CdcApply, SchemaGuard}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC operator semantics on controlled micro-data (SURVEY §2 A1–A3, A5). */
class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  private def feed = Seq(
    // pk, seq, op, value
    (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),          // update wins
    (2L, 1L, "I", "x"), (2L, 2L, "D", "-"),          // deleted key vanishes
    (3L, 1L, "I", "c"),                              // plain insert
    (4L, 1L, "I", "d"), (4L, 2L, "D", "-"), (4L, 3L, "I", "e") // delete then re-insert
  ).toDF("pk", "seq", "Op", "v")

  test("A1: latestState is last-writer-wins with trailing-delete removal") {
    val out = CdcApply.latestState(feed, Seq("pk"), Seq(col("seq")))
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "b", 3L -> "c", 4L -> "e"))
  }

  test("A2: upsert(base, changes) == replay(all)") {
    val base = CdcApply.latestState(feed.filter($"seq" <= 1), Seq("pk"), Seq(col("seq")))
    val changes = feed.filter($"seq" > 1)
    val merged = CdcApply.upsert(base, changes, Seq("pk"), Seq(col("seq")))
      .select("pk", "v").as[(Long, String)].collect().toMap
    val full = CdcApply.latestState(feed, Seq("pk"), Seq(col("seq")))
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(merged == full)
  }

  test("A3: applyDeletes is a pk anti-join") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pk", "v")
    val dels = Seq(2L, 9L).toDF("pk")
    val out = CdcApply.applyDeletes(base, dels, Seq("pk"))
      .select("pk").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("A8: service columns dropped") {
    val df = Seq((1L, "I", "ts", "x")).toDF("pk", "Op", "_dms_ingestion_timestamp", "v")
    assert(CdcApply.stripServiceColumns(df).columns.toSeq == Seq("pk", "v"))
  }

  test("A5: schema guard flags added columns, ignores service columns") {
    val fileSchema = StructType(Seq(
      StructField("id", LongType), StructField("newcol", StringType),
      StructField("Op", StringType),
      StructField("_dms_ingestion_timestamp", StringType)))
    val tableCols = Map("id" -> "bigint", "oldcol" -> "string")
    val d = SchemaGuard.diff(fileSchema, tableCols)
    assert(d.added == Seq("newcol"))
    assert(d.dropped == Seq("oldcol"))
    assert(SchemaGuard.hasBlockingDrift(fileSchema, tableCols))
    assert(!SchemaGuard.hasBlockingDrift(
      StructType(Seq(StructField("id", LongType))), tableCols))
  }

  test("A5: retyped columns reported") {
    val fileSchema = StructType(Seq(StructField("id", StringType)))
    val d = SchemaGuard.diff(fileSchema, Map("id" -> "bigint"))
    assert(d.retyped == Seq(("id", "bigint", "string")))
  }

  test("A4t: snapshotAsOf replays only changes at or before the horizon") {
    val base = Seq((1L, "a0"), (2L, "b0"), (3L, "c0")).toDF("pk", "v")
    val chg = Seq(
      (1L, 10L, "U", "a1"), (1L, 20L, "U", "a2"), // second update beyond T
      (2L, 15L, "D", "-"),                        // delete inside T
      (3L, 25L, "U", "c1"),                       // update beyond T
      (4L, 12L, "I", "d1")                        // insert inside T
    ).toDF("pk", "ts", "Op", "v")
    val out = CdcApply.snapshotAsOf(
      base, chg, Seq("pk"), Seq(col("ts")), col("ts"), lit(16L))
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a1", 3L -> "c0", 4L -> "d1"))
  }

  test("A4t: horizon past the feed equals full upsert; before it equals base") {
    val base = Seq((1L, "a0"), (2L, "b0")).toDF("pk", "v")
    val chg = Seq((1L, 10L, "U", "a1"), (2L, 11L, "D", "-"), (5L, 12L, "I", "e1"))
      .toDF("pk", "ts", "Op", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pk", "v").as[(Long, String)].collect().toMap
    val all = rows(CdcApply.upsert(base, chg, Seq("pk"), Seq(col("ts"))))
    assert(rows(CdcApply.snapshotAsOf(
      base, chg, Seq("pk"), Seq(col("ts")), col("ts"), lit(999L))) == all)
    assert(rows(CdcApply.snapshotAsOf(
      base, chg, Seq("pk"), Seq(col("ts")), col("ts"), lit(0L))) == rows(base))
  }

  private def scd2Feed = feed
    .withColumn("ts", timestamp_micros(col("seq") * 1000000L))

  test("A10: scd2History — one row per surviving version, intervals closed by the NEXT event of any op") {
    val out = CdcApply.scd2History(scd2Feed, Seq("pk"), Seq(col("seq")), col("ts"))
      .select("pk", "v", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, String, Long, Option[Long], Long)].collect()
      .map { case (pk, v, f, t, c) => (pk, v) -> ((f, t, c)) }.toMap
    assert(out.size == 6) // every non-D event is a version; D rows emit nothing
    val s = 1000000L
    assert(out((1L, "a")) == ((1 * s, Some(2 * s), 0L))) // superseded by the update
    assert(out((1L, "b")) == ((2 * s, None, 1L)))        // current
    assert(out((2L, "x")) == ((1 * s, Some(2 * s), 0L))) // closed by the delete
    assert(out((3L, "c")) == ((1 * s, None, 1L)))
    // delete-then-reinsert: old version closed at the delete's time, the
    // re-insert opens later — the [2s, 3s) gap IS the deleted period
    assert(out((4L, "d")) == ((1 * s, Some(2 * s), 0L)))
    assert(out((4L, "e")) == ((3 * s, None, 1L)))
  }

  test("A10: at most one current version per key, none for keys ending in a delete") {
    val cur = CdcApply.scd2History(scd2Feed, Seq("pk"), Seq(col("seq")), col("ts"))
      .groupBy("pk").agg(sum("is_current").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(cur == Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("A10: current versions reproduce latestState exactly") {
    val hist = CdcApply.scd2History(scd2Feed, Seq("pk"), Seq(col("seq")), col("ts"))
      .filter($"is_current" === 1L).select("pk", "v")
      .as[(Long, String)].collect().toMap
    val latest = CdcApply.latestState(scd2Feed, Seq("pk"), Seq(col("seq")))
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(hist == latest)
  }

  test("A10t: stateAt(history, T) == latestState(feed cut at T) at EVERY horizon") {
    // the parity contract that makes SCD2 a time-travel surface: reading
    // the version covering T out of the history must equal re-replaying
    // the feed cut at T. Horizons: before the feed, on every event time,
    // between events, after the feed.
    val hist = CdcApply.scd2History(scd2Feed, Seq("pk"), Seq(col("seq")), col("ts"))
    val s = 1000000L
    for (t <- Seq(0L, 1 * s, 3 * s / 2, 2 * s, 5 * s / 2, 3 * s, 100 * s)) {
      val got = CdcApply.stateAt(hist, lit(t))
        .select("pk", "v").as[(Long, String)].collect().toMap
      val want = CdcApply.latestState(
          scd2Feed.filter(unix_micros($"ts") <= t), Seq("pk"), Seq(col("seq")))
        .select("pk", "v").as[(Long, String)].collect().toMap
      assert(got == want, s"horizon $t µs")
    }
  }

  test("A10t: stateAt agrees with snapshotAsOf when the history includes the base as initial load") {
    // base rows = I events at -∞ (valid_from before every feed event):
    // the filter-over-history reconstruction must equal the re-replay one
    val base = Seq((1L, "a0"), (2L, "x0"), (9L, "z0")).toDF("pk", "v")
    val chg = scd2Feed // ops at seq 1..3
    val asIload = base
      .withColumn("seq", lit(0L)).withColumn("Op", lit("I"))
      .withColumn("ts", timestamp_micros(lit(0L)))
      .select("pk", "seq", "Op", "v", "ts")
    val hist = CdcApply.scd2History(
      asIload.unionByName(chg), Seq("pk"), Seq(col("seq")), col("ts"))
    val s = 1000000L
    for (t <- Seq(0L, 1 * s, 2 * s, 3 * s, 100 * s)) {
      val got = CdcApply.stateAt(hist, lit(t))
        .select("pk", "v").as[(Long, String)].collect().toMap
      val want = CdcApply.snapshotAsOf(
          base, chg, Seq("pk"), Seq(col("seq")), unix_micros(col("ts")), lit(t))
        .select("pk", "v").as[(Long, String)].collect().toMap
      assert(got == want, s"horizon $t µs")
    }
  }

  test("A10m: scd2Merge(history(prefix), batch) == scd2History(full) on the fixture") {
    def hist(df: org.apache.spark.sql.DataFrame) =
      CdcApply.scd2History(df, Seq("pk"), Seq(col("seq")), col("ts"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pk", "v", "valid_from_us", "valid_to_us", "is_current")
        .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    val merged = CdcApply.scd2Merge(
      hist(scd2Feed.filter($"seq" <= 1)), scd2Feed.filter($"seq" > 1),
      Seq("pk"), Seq(col("seq")), col("ts"))
    assert(rows(merged) == rows(hist(scd2Feed)))
  }

  test("A10m property: merge == full rebuild over random feeds × random split points") {
    // random ops, COLLIDING event times (several seqs share a ts), and a
    // split cutting lexicographically through (ts, seq) — so ties straddle
    // the history/batch boundary, the hardest case for the close logic
    val rnd = new scala.util.Random(92620813L)
    def hist(df: org.apache.spark.sql.DataFrame) =
      CdcApply.scd2History(df, Seq("pk"), Seq(col("ts"), col("seq")), col("ts"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("pk", "v", "valid_from_us", "valid_to_us", "is_current")
        .as[(Long, String, Long, Option[Long], Long)].collect().toSet
    for (trial <- 1 to 8) {
      val raw = (1L to 8L).flatMap { k =>
        (1L to (1 + rnd.nextInt(5)).toLong).map { s =>
          (k, s, (s / 2 + 1) * 1000000L, // ts collides across adjacent seqs
            Seq("I", "U", "D")(rnd.nextInt(3)), s"v$trial-$k-$s")
        }
      }
      val tSplit = (1 + rnd.nextInt(3)) * 1000000L
      val sSplit = rnd.nextInt(5).toLong
      val (pre, post) = raw.partition { case (_, s, us, _, _) =>
        us < tSplit || (us == tSplit && s <= sSplit)
      }
      if (pre.nonEmpty && post.nonEmpty) {
        def df(r: Seq[(Long, Long, Long, String, String)]) = r
          .toDF("pk", "seq", "us", "Op", "v")
          .withColumn("ts", timestamp_micros($"us")).drop("us")
        val merged = CdcApply.scd2Merge(
          hist(df(pre)), df(post), Seq("pk"), Seq(col("ts"), col("seq")), col("ts"))
        assert(rows(merged) == rows(hist(df(raw))), s"trial $trial")
      }
    }
  }

  test("A10m: one batch-sized window, no history window, broadcast close join") {
    // the scale contract: merging a batch into a LANDED history must not
    // re-window the history — exactly one Window (the batch's own), and
    // the close join rides a broadcast of the batch keyspace
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2-merge").toString
    CdcApply.scd2History(scd2Feed.filter($"seq" <= 1), Seq("pk"), Seq(col("seq")), col("ts"))
      .write.mode("overwrite").parquet(dir)
    val landed = spark.read.parquet(dir)
    val p = CdcApply.scd2Merge(
      landed, scd2Feed.filter($"seq" > 1), Seq("pk"), Seq(col("seq")), col("ts"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("\\(\\d+\\) Window".r.findAllIn(p).size == 1,
      s"merge must window ONLY the batch:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the close join should broadcast the batch's first-event aggregate:\n$p")
  }

  test("A10m: an out-of-order batch (event before the current version) raises loudly") {
    val hist = CdcApply.scd2History(
      scd2Feed.filter($"seq" <= 2), Seq("pk"), Seq(col("seq")), col("ts"))
    // pk 1's current version opened at 2s; a "new" batch event at 1s
    // violates the append-only tail contract
    val stale = Seq((1L, 9L, "U", "late"))
      .toDF("pk", "seq", "Op", "v")
      .withColumn("ts", timestamp_micros(lit(1000000L)))
    val e = intercept[Exception] {
      CdcApply.scd2Merge(hist, stale, Seq("pk"), Seq(col("seq")), col("ts"))
        .collect()
    }
    assert(e.getMessage.contains("scd2Merge"), s"got: ${e.getMessage}")
  }

  test("A10: reserved output column collision refused loudly") {
    val bad = scd2Feed.withColumn("valid_to_us", lit(0L))
    val e = intercept[IllegalArgumentException] {
      CdcApply.scd2History(bad, Seq("pk"), Seq(col("seq")), col("ts"))
    }
    assert(e.getMessage.contains("valid_to_us"))
  }

  test("A11: compact nets each key to one row with the right op and last payload") {
    val out = CdcApply.compact(feed, Seq("pk"), Seq(col("seq")))
      .select("pk", "Op", "v").as[(Long, String, Option[String])].collect()
      .map { case (k, op, v) => k -> ((op, v)) }.toMap
    assert(out == Map(
      1L -> (("I", Some("b"))), // I,U → net insert of the last image
      2L -> (("D", None)),      // I,D → tombstone with nulled payload (dropEphemeral=false keeps the tombstone)
      3L -> (("I", Some("c"))), // single insert passes through
      4L -> (("I", Some("e"))))) // I,D,I → net insert of the final image
  }

  test("A11: compact marks keys not born in the batch as U, not I") {
    val updatesOnly = Seq((9L, 1L, "U", "p"), (9L, 2L, "U", "q")).toDF("pk", "seq", "Op", "v")
    val out = CdcApply.compact(updatesOnly, Seq("pk"), Seq(col("seq")))
      .select("pk", "Op", "v").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((9L, "U", "q")))
  }

  test("A11: dropEphemeral removes keys born AND deleted inside the batch") {
    val out = CdcApply.compact(feed, Seq("pk"), Seq(col("seq")), dropEphemeral = true)
      .select("pk").as[Long].collect().toSet
    // key 2 was inserted and deleted within the batch → no output row at all
    assert(out == Set(1L, 3L, 4L))
  }

  test("A11 property: upsert(base, compact(F)) == upsert(base, F) on random feeds") {
    // the scaladoc's upsert-equivalence claim, over seeded-random feeds:
    // arbitrary op strings per key (including semantically odd ones — D on
    // a key the base lacks, U before any I), random base coverage
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 10) {
      val rows = (1L to 10L).flatMap { k =>
        (1L to rnd.nextInt(5).toLong).map { s =>
          (k, s, Seq("I", "U", "D")(rnd.nextInt(3)), s"v$trial-$k-$s")
        }
      }
      if (rows.nonEmpty) {
        val f = rows.toDF("pk", "seq", "Op", "v")
        val base = (1L to 10L).filter(_ => rnd.nextBoolean())
          .map(k => (k, s"base$k")).toDF("pk", "v")
        def state(changes: org.apache.spark.sql.DataFrame) =
          CdcApply.upsert(base, changes, Seq("pk"), Seq(col("seq")))
            .select("pk", "v").as[(Long, String)].collect().toMap
        val compacted = CdcApply.compact(f, Seq("pk"), Seq(col("seq")))
        assert(state(compacted) == state(f), s"trial $trial")
      }
    }
  }

  test("A11 property: dropEphemeral upsert-equivalent when the base lacks batch-born keys") {
    val rnd = new scala.util.Random(813L)
    for (trial <- 1 to 10) {
      val rows = (1L to 10L).flatMap { k =>
        (1L to (1 + rnd.nextInt(4)).toLong).map { s =>
          (k, s, Seq("I", "U", "D")(rnd.nextInt(3)), s"v$trial-$k-$s")
        }
      }
      // dropEphemeral's precondition: the target provably lacks keys born
      // in the batch — base only over keys whose FIRST feed op is not 'I'
      val bornInBatch = rows.groupBy(_._1).collect {
        case (k, rs) if rs.minBy(_._2)._3 == "I" => k
      }.toSet
      val f = rows.toDF("pk", "seq", "Op", "v")
      val base = (1L to 10L).filterNot(bornInBatch)
        .filter(_ => rnd.nextBoolean()).map(k => (k, s"base$k")).toDF("pk", "v")
      def state(changes: org.apache.spark.sql.DataFrame) =
        CdcApply.upsert(base, changes, Seq("pk"), Seq(col("seq")))
          .select("pk", "v").as[(Long, String)].collect().toMap
      val compacted = CdcApply.compact(f, Seq("pk"), Seq(col("seq")), dropEphemeral = true)
      assert(state(compacted) == state(f), s"trial $trial")
    }
  }

  test("A11: compact is one hash aggregation — a single exchange, no window sort") {
    val p = CdcApply.compact(feed, Seq("pk"), Seq(col("seq")))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1,
      s"compact should shuffle exactly once by pk:\n$p")
    assert(!p.contains("Window"), s"compact must be the aggregate shape, not a window:\n$p")
  }

  test("A10w: time-weighted rollup — hand-computed buckets, delete gap, horizon clip") {
    // grain 100, horizon 400; one key's versions:
    //   [20,150) v=1.00 | [150,230) v=2.00 | deleted [230,260) | [260,∞) v=3.00
    val hist = Seq(
      (1L, 1.00, 20L, Some(150L)),
      (1L, 2.00, 150L, Some(230L)),
      (1L, 3.00, 260L, None: Option[Long])
    ).toDF("pk", "value", "valid_from_us", "valid_to_us")
    val out = CdcApply.scd2TimeWeighted(hist, col("value"),
        grainUs = 100L, horizonUs = 400L)
      .select("bucket_us", "weight_us", "weighted_sum_centi_us", "wavg_milli")
      .as[(Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    // b0: 80µs of 1.00      → ws = 100·80          wavg = 1000
    // b1: 50 of 1.00 + 50 of 2.00 → 5000+10000     wavg = 1500
    // b2: 30 of 2.00 + 40 of 3.00 → 6000+12000, weight 70 (30µs deleted) → ⌊180000/70⌋
    // b3: 100 of 3.00 (open version clipped at 400)
    assert(out == Map(
      0L   -> ((0L, 80L, 8000.0, 1000L)),
      100L -> ((100L, 100L, 15000.0, 1500L)),
      200L -> ((200L, 70L, 18000.0, 2571L)),
      300L -> ((300L, 100L, 30000.0, 3000L))))
  }

  test("A10w property: bucket weights conserve each interval's clipped span") {
    val rnd = new scala.util.Random(407133L)
    for (trial <- 1 to 3) {
      val H = 1000L
      val rows = (1L to 30L).map { k =>
        val f = rnd.nextInt(900).toLong
        val t = if (rnd.nextBoolean()) Some(f + 1 + rnd.nextInt(300)) else None
        (k, (1 + rnd.nextInt(500)) / 100.0, f, t)
      }
      val hist = rows.toDF("pk", "value", "valid_from_us", "valid_to_us")
      val grain = 1L + rnd.nextInt(200)
      val got = CdcApply.scd2TimeWeighted(hist, col("value"), grain, H)
        .agg(sum("weight_us")).as[Long].head()
      val want = rows.map { case (_, _, f, t) =>
        math.max(0L, math.min(t.getOrElse(H), H) - f)
      }.sum
      assert(got == want, s"trial $trial grain=$grain")
    }
  }

  test("A10w: a span wider than maxBucketsPerRow raises loudly") {
    val hist = Seq((1L, 1.00, 0L, Some(400L)))
      .toDF("pk", "value", "valid_from_us", "valid_to_us")
    val e = intercept[Exception] {
      CdcApply.scd2TimeWeighted(hist, col("value"), grainUs = 100L,
        horizonUs = 400L, maxBucketsPerRow = 2L).collect()
    }
    assert(e.getMessage != null)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("scd2TimeWeighted")), msgs(e).mkString(" | "))
  }
}
