package graft

import graft.text.{PortableHash, Winnow}
import org.apache.spark.sql.functions._

import scala.util.Random

/** E53 winnowing fingerprints: the selection predicate against a
  * sequential reference, the paper's recall guarantee, density, and the
  * candidate-pair report. */
class WinnowSpec extends SparkSpecBase {
  import spark.implicits._

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Sequential reference: all positions achieving some full frame's
    * minimum (graft's tie policy), 1-based positions. */
  private def reference(t: String, k: Int, w: Int): Set[(Int, Long)] = {
    if (t.length < k) return Set.empty
    val hs = (1 to t.length - k + 1).map(p => p -> h60(t.substring(p - 1, p - 1 + k)))
    val sel = for {
      j <- 0 to hs.length - w // full frames only
      frame = hs.slice(j, j + w)
      m = frame.map(_._2).min
      (p, h) <- frame if h == m
    } yield (p, h)
    sel.toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int, w: Int): Map[Long, Set[(Int, Long)]] =
    Winnow.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2.toInt, r._3)).toSet).toMap
      .withDefaultValue(Set.empty)

  test("h60 column matches the sequential md5-prefix value") {
    val got = Seq("winnow").toDF("s").select(PortableHash.h60($"s")).as[Long].head()
    assert(got == h60("winnow"))
  }

  test("selection equals the sequential reference on random text") {
    val rnd = new Random(7)
    for (trial <- 0 until 6) {
      val k = 3 + rnd.nextInt(3)
      val w = 2 + rnd.nextInt(4)
      val docs = (0 until 6).map { i =>
        i.toLong -> (0 until 10 + rnd.nextInt(60)).map(_ => "abcd "(rnd.nextInt(5))).mkString
      }
      val got = run(docs, k, w)
      docs.foreach { case (id, t) =>
        assert(got(id) == reference(t, k, w), s"trial $trial k=$k w=$w doc $id '$t'")
      }
    }
  }

  test("guarantee: a shared span of length k+w-1 shares a fingerprint") {
    val rnd = new Random(13)
    val k = 5; val w = 4
    for (trial <- 0 until 10) {
      def noise(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val span = noise(k + w - 1) // exactly the detection threshold
      val docs = Seq(1L -> (noise(20) + span + noise(20)), 2L -> (noise(9) + span + noise(31)))
      val got = run(docs, k, w)
      val shared = got(1L).map(_._2) intersect got(2L).map(_._2)
      assert(shared.nonEmpty, s"trial $trial span '$span' produced no shared fingerprint")
    }
  }

  test("density lands near 2/(w+1) and short docs yield nothing") {
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id", "text")
    val nPos = docs.select(
      sum(greatest(length($"text") - 19, lit(0)))).as[Long].head()
    val nFps = Winnow.fingerprints(docs, "doc_id", "text", 20, 8).count()
    val density = nFps.toDouble / nPos
    assert(density > 0.15 && density < 0.30, s"density $density")
    // below k+w-1 chars there is no full frame
    assert(run(Seq(1L -> "x" * 26), 20, 8)(1L).isEmpty)
    assert(run(Seq(1L -> "x" * 27), 20, 8)(1L).nonEmpty)
  }

  test("indexed screen: bucketed exchange-free serve equals the direct join, params guarded") {
    import graft.text.Winnow
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select($"doc_id", $"text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    Winnow.writeIndex(corpus, "doc_id", "text", "graft_pin_widx",
      buckets = 4, k = 20, w = 8)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val serve = Winnow.screenIndexed(
        spark, "graft_pin_widx", batch, "doc_id", "text", 2L)
      val plan = serve.queryExecution.executedPlan
      def isIdx(f: FileSourceScanExec) =
        f.tableIdentifier.exists(_.table.startsWith("graft_pin_widx"))
      val idxScans = plan.collect { case f: FileSourceScanExec if isIdx(f) => f }
      assert(idxScans.nonEmpty && idxScans.forall(_.bucketedScan),
        "index must be read as a bucketed scan")
      // no shuffle may sit between the index scan and the JOIN that
      // consumes it (exchanges above the join move the candidate-sized
      // result, which is fine) — the PlanSpec openIdx traversal
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      var shuffledBeforeJoin = false
      def openIdx(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => isIdx(f)
        case _: SortMergeJoinExec | _: BroadcastHashJoinExec |
             _: ShuffledHashJoinExec | _: BroadcastNestedLoopJoinExec =>
          p.children.foreach(openIdx); false // join absorbs the scan
        case e: ShuffleExchangeExec =>
          val o = e.children.exists(openIdx)
          if (o) shuffledBeforeJoin = true
          o
        case _ => p.children.map(openIdx).exists(identity)
      }
      openIdx(plan)
      assert(!shuffledBeforeJoin, "corpus index was shuffled before its join")
      // serve == the direct fingerprint join over the same subsets
      import graft.text.{Winnow => W}
      val cFps = W.fingerprints(corpus, "doc_id", "text", 20, 8)
        .select($"doc_id".as("corpus_id"), $"fp").distinct()
      val capped = cFps.groupBy("fp")
        .agg(countDistinct($"corpus_id").as("df"))
        .filter($"df" <= graft.dedup.Dedup.DefaultMaxDf).select("fp")
      val bFps = W.fingerprints(batch, "doc_id", "text", 20, 8)
        .select($"doc_id".as("batch_id"), $"fp").distinct()
      val direct = bFps.join(cFps.join(capped, "fp"), "fp")
        .groupBy("batch_id", "corpus_id").agg(count(lit(1)).as("shared_fps"))
        .filter($"shared_fps" >= 2L)
        .collect().map(_.toSeq).toSet
      assert(serve.collect().map(_.toSeq).toSet == direct)
      // a mismatched-parameter serve must refuse loudly, not return []
      // (screenIndexed reads k/w from meta, so the guard is the missing
      // index case)
      val err = intercept[IllegalArgumentException] {
        Winnow.screenIndexed(spark, "graft_no_such_widx", batch, "doc_id", "text", 2L)
      }
      assert(err.getMessage.contains("not found"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_pin_widx_fps")
      spark.sql("DROP TABLE IF EXISTS graft_pin_widx_meta")
    }
  }

  test("source overlap measures shared passages between groups, exactly") {
    def noise(seed: Int, n: Int) = {
      val r = new Random(seed); (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val shared = noise(50, 60)
    val docs = Seq(
      (1L, "s1", noise(1, 40) + shared),
      (2L, "s1", noise(2, 80)),
      (3L, "s2", shared + noise(3, 40)),
      (4L, "s3", noise(4, 100))).toDF("doc_id", "source", "text")
    val got = graft.text.Winnow.sourceOverlap(docs, "doc_id", "text", "source", 5, 4)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // s1 and s2 share the planted passage's fingerprints; each also has
    // private noise, so 0 < overlap < 10000
    val s12 = got(("s1", "s2"))
    assert(s12._5 > 0 && s12._6 > 0 && s12._6 < 10000)
    // disjoint noise may still collide on a rare short gram; overlap with
    // s3 must stay far below the planted pair's
    got.get(("s1", "s3")).foreach(p => assert(p._6 < s12._6))
    got.get(("s2", "s3")).foreach(p => assert(p._6 < s12._6))
    // symmetry of the sizes: n_a matches the group's own fingerprint count
    val fps = graft.text.Winnow.fingerprints(docs, "doc_id", "text", 5, 4)
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .select($"source", $"fp").distinct()
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(s12._3 == fps("s1") && s12._4 == fps("s2"))
  }

  test("candidate pairs find planted near-dups and respect the df cap") {
    def noise(seed: Int, n: Int) = {
      val r = new Random(seed); (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val passage = noise(99, 80)
    val docs = Seq(
      1L -> (noise(1, 50) + passage),
      2L -> (passage + noise(2, 50)),
      3L -> noise(3, 130))
    val pairs = Winnow.candidatePairs(
      docs.toDF("doc_id", "text"), "doc_id", "text", 5, 4, minShared = 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    // a df cap of 1 excludes every shared fingerprint -> no pairs at all
    val capped = Winnow.candidatePairs(
      docs.toDF("doc_id", "text"), "doc_id", "text", 5, 4, minShared = 1L, maxDf = 1L)
    assert(capped.count() == 0)
  }
}
