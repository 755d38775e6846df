package graft

import graft.cdc.CdcApply
import graft.streaming.CdcStream
import graft.streaming.CdcStream.KeyedChange
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.util.Random

case class Change(pk: Long, seq: Long, op: String, v: String)

/** Randomized-model evidence that the distributed CDC replay equals a naive
  * sequential replay (the reference's row-at-a-time semantics) on arbitrary
  * feeds, at arbitrary batch splits, and through the streaming variant. */
class CdcPropertySpec extends SparkSpecBase {
  import spark.implicits._

  /** The reference's semantics, literally: apply ops one at a time in feed
    * order (D deletes the key, I/U set it). */
  private def naiveReplay(feed: Seq[Change]): Map[Long, String] =
    feed.sortBy(_.seq).foldLeft(Map.empty[Long, String]) { (m, c) =>
      if (c.op == "D") m - c.pk else m.updated(c.pk, c.v)
    }

  private def randomFeed(rnd: Random, n: Int): List[Change] =
    List.tabulate(n) { i =>
      Change(
        pk = rnd.nextInt(13).toLong,
        seq = i.toLong,
        op = Seq("I", "U", "D")(rnd.nextInt(3)),
        v = rnd.alphanumeric.take(6).mkString)
    }

  test("A1 property: distributed latestState == sequential replay (20 random feeds)") {
    val rnd = new Random(42)
    (1 to 20).foreach { trial =>
      val feed = randomFeed(rnd, rnd.nextInt(120) + 1)
      val got = CdcApply.latestState(
        feed.toDF().withColumnRenamed("op", "Op"), Seq("pk"), Seq(col("seq")))
        .select("pk", "v").as[(Long, String)].collect().toMap
      assert(got == naiveReplay(feed), s"trial $trial diverged")
    }
  }

  test("A2 property: upsert(replay(prefix), suffix) == replay(whole) at random splits") {
    val rnd = new Random(7)
    (1 to 12).foreach { trial =>
      val feed = randomFeed(rnd, rnd.nextInt(100) + 2)
      val split = rnd.nextInt(feed.size)
      val (early, late) = feed.splitAt(split)
      val base = CdcApply.latestState(
        early.toDF().withColumnRenamed("op", "Op"), Seq("pk"), Seq(col("seq")))
      val got =
        if (late.isEmpty) base.select("pk", "v").as[(Long, String)].collect().toMap
        else CdcApply.upsert(base, late.toDF().withColumnRenamed("op", "Op"),
          Seq("pk"), Seq(col("seq")))
          .select("pk", "v").as[(Long, String)].collect().toMap
      assert(got == naiveReplay(feed), s"trial $trial split $split diverged")
    }
  }

  test("A9 property: streaming state (non-deleted keys) == batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(99)
    (1 to 4).foreach { trial =>
      val feed = randomFeed(rnd, rnd.nextInt(40) + 2)
      val input = MemoryStream[KeyedChange]
      val name = s"cdc_prop_$trial"
      val q = CdcStream.latestState(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        val (a, b) = feed.splitAt(feed.size / 2)
        Seq(a, b).filter(_.nonEmpty).foreach { batch =>
          input.addData(batch.map(c => KeyedChange(c.pk.toString, c.seq, c.op, c.v)))
          q.processAllAvailable()
        }
        val last = spark.table(name)
          .groupBy("pk").agg(max(struct($"seq", $"op", $"payload")).as("s"))
          .select($"pk", $"s.op".as("op"), $"s.payload".as("payload"))
          .as[(String, String, String)].collect()
        val streamed = last.collect { case (pk, op, v) if op != "D" => pk.toLong -> v }.toMap
        assert(streamed == naiveReplay(feed), s"trial $trial diverged")
      } finally q.stop()
    }
  }

  test("A0 property: driver fast-path merge and distributed merge cover identical keys") {
    // random monotone chunk reports (lo/hi non-decreasing in chunk_id, as
    // orderedChunkDiffRanges guarantees), random bad subsets: the two
    // merge strategies produce different RUN sets (adjacent-id vs
    // value-overlap) but must cover EXACTLY the same pk points — that is
    // the semi-join contract the drill-down relies on
    val rnd = new Random(11)
    for (trial <- 1 to 10) {
      val n = 5 + rnd.nextInt(20)
      var lo = 0L; var hi = 0L
      val rows = (0L until n).map { cid =>
        lo = lo + rnd.nextInt(6)
        hi = math.max(hi + rnd.nextInt(6), lo)
        (cid, rnd.nextBoolean(), lo, hi)
      }
      val report = rows.toDF("chunk_id", "ok", "l", "h")
        .select($"chunk_id", (!$"ok").as("chunks_match"),
          struct($"l".as("k")).as("lo"), struct($"h".as("k")).as("hi"))
      val driver = graft.cdc.CdcOperator.mergedOnDriver(report, 10000).get
        .select($"__lo.k", $"__hi.k").as[(Long, Long)].collect()
      val dist = graft.cdc.CdcOperator.mergedBadIntervals(report, bucketChunks = 4L)
        .select($"__lo.k", $"__hi.k").as[(Long, Long)].collect()
      val bad = rows.filter(_._2).map(r => (r._3, r._4))
      def covered(ivs: Seq[(Long, Long)], p: Long) = ivs.exists(i => p >= i._1 && p <= i._2)
      (0L to (hi + 2)).foreach { p =>
        val want = covered(bad, p)
        // distributed (value-overlap) merge covers EXACTLY the bad union;
        // the driver (adjacent-id) merge may additionally cover gap
        // points BETWEEN merged adjacent chunks — a sound superset (both
        // sides restrict with the same predicate, so no pair is split
        // and equal rows add nothing to the diff) but never less
        assert(covered(dist.toSeq, p) == want, s"trial $trial: distributed coverage differs at $p")
        if (want) assert(covered(driver.toSeq, p), s"trial $trial: driver lost coverage at $p")
        if (covered(driver.toSeq, p) && !want) {
          // any extra point must be bracketed by bad coverage on both
          // sides (it lies inside a merged run's envelope)
          assert(bad.exists(_._1 <= p) && bad.exists(_._2 >= p),
            s"trial $trial: driver covered $p outside the bad envelope")
        }
      }
    }
  }

  test("B1 property: rowDiff(x, x) is empty; statuses mirror on swap") {
    val rnd = new Random(5)
    val feed = randomFeed(rnd, 60)
    val df = feed.toDF()
    assert(graft.diff.DataDiff.rowDiff(df, df, Seq("pk", "seq")).count() == 0)
    val tgt = df.filter($"seq" % 3 =!= 0)
      .withColumn("v", when($"seq" % 5 === 0, lit("x")).otherwise($"v"))
    val ab = graft.diff.DataDiff.rowDiff(df, tgt, Seq("pk", "seq"))
      .groupBy("diff_status").count().as[(String, Long)].collect().toMap
    val ba = graft.diff.DataDiff.rowDiff(tgt, df, Seq("pk", "seq"))
      .groupBy("diff_status").count().as[(String, Long)].collect().toMap
    assert(ab.getOrElse("source_only", 0L) == ba.getOrElse("target_only", 0L))
    assert(ab.getOrElse("mismatch", 0L) == ba.getOrElse("mismatch", 0L))
  }
}
