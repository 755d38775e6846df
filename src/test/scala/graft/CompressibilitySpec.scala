package graft

import graft.text.Compressibility

/** E33: deflate-compressibility quality signal (codec-boundary op). */
class CompressibilitySpec extends SparkSpecBase {
  import spark.implicits._

  test("E33: repetitive text compresses far below prose; gibberish barely at all") {
    val rnd = new scala.util.Random(5)
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders back across the quiet meadow before the evening rain begins"
    val docs = Seq(
      (1L, Seq.fill(200)("spam spam spam").mkString(" ")), // boilerplate
      (2L, Seq.fill(12)(prose).mkString(". ")), // prose, some repetition
      (3L, Seq.fill(1600)(('!' + rnd.nextInt(90)).toChar).mkString)) // gibberish
      .toDF("doc_id", "text")
    val got = Compressibility.compressionStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(got(1L) < 500L, s"boilerplate should compress >20x, got ${got(1L)} bp")
    assert(got(1L) < got(2L) && got(2L) < got(3L),
      s"ratio must order boilerplate < prose < gibberish: $got")
    assert(got(3L) > 7000L, s"near-random text should stay near-incompressible, got ${got(3L)} bp")
  }

  test("E33: deterministic across partitionings; empty and null text report 10000") {
    val docs = (1L to 300L).map(i => (i, if (i % 7 == 0) "" else s"doc $i " * (i % 5).toInt))
      .toDF("doc_id", "text")
    val one = Compressibility.compressionStats(docs.repartition(1), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val many = Compressibility.compressionStats(docs.repartition(7), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(one == many, "result must not depend on partitioning")
    // i%5==0 gives "" via the repeat-0 branch too; all empties → 10000
    assert(one.filter(_._2 == 0L).forall(_._4 == 10000L))
    val withNull = Seq((1L, null: String)).toDF("doc_id", "text")
    val n = Compressibility.compressionStats(withNull, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().head
    assert(n == ((1L, 0L, 0L, 10000L)))
  }

  test("E33: compressionCheck — round-trip and bounds hold; raw_bytes is the UTF-8 length") {
    val docs = Seq(
      (1L, "plain ascii doc " * 40),
      (2L, "umlauts äöü and 日本語 bytes"), // multi-byte UTF-8: chars ≠ bytes
      (3L, ""),
      (4L, null: String),
      (5L, Seq.fill(500)("spam").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Compressibility.compressionCheck(docs, "doc_id", "text")
      .as[(Long, Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.values.forall(r => r._3 && r._4), s"invariants failed: $got")
    assert(got(1L)._2 == "plain ascii doc ".getBytes("UTF-8").length * 40L)
    assert(got(2L)._2 == "umlauts äöü and 日本語 bytes".getBytes("UTF-8").length.toLong)
    assert(got(3L)._2 == 0L && got(4L)._2 == 0L)
  }
}
