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
