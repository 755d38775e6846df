package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusShuffle

/** E60: deterministic global shuffle + contiguous sharding. */
class CorpusShuffleSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus(n: Int) =
    (1L to n.toLong).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("E60: pos is an exact permutation and the order is seed-deterministic") {
    val df = corpus(500)
    val a = CorpusShuffle.shuffleShards(df, "doc_id", seed = 42L, nShards = 4)
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    val b = CorpusShuffle.shuffleShards(df, "doc_id", seed = 42L, nShards = 4)
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "same seed must reproduce the identical order")
    assert(a.map(_._2).sorted.toSeq == (0L until 500L), "pos must be a 0..n-1 bijection")
    val c = CorpusShuffle.shuffleShards(df, "doc_id", seed = 43L, nShards = 4)
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.map(_._2).toSeq != c.map(_._2).toSeq, "a different seed must permute differently")
  }

  test("E60: shards are balanced within one row and contiguous in rank") {
    for (n <- Seq(1, 7, 500); shards <- Seq(1, 3, 8)) {
      val out = CorpusShuffle.shuffleShards(corpus(n), "doc_id", 7L, shards)
        .select("shard", "pos").as[(Long, Long)].collect()
      val bySize = out.groupBy(_._1).view.mapValues(_.length).toMap
      assert(bySize.values.max - bySize.values.min <= 1, s"n=$n shards=$shards sizes $bySize")
      // contiguity: shard s's rank range ends before shard s+1's begins
      val ranges = out.groupBy(_._1).view
        .mapValues(v => (v.map(_._2).min, v.map(_._2).max)).toMap
      ranges.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(x, y) => assert(ranges(x)._2 < ranges(y)._1, s"n=$n shards=$shards")
        case _ =>
      }
      // shard id tracks rank: ⌊pos·k/total⌋ is monotone in pos
      assert(out.sortBy(_._2).map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    }
  }

  test("E60: empty corpus yields an empty result, not a division by zero") {
    val out = CorpusShuffle.shuffleShards(
      corpus(5).filter(lit(false)), "doc_id", 7L, 4)
    assert(out.count() == 0)
  }
}
