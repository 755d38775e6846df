package graft

import graft.diff.DataDiff
import graft.text.Packing

import scala.util.Random

/** Randomized-model evidence for the order-dependent pipeline operators:
  * global positions and packed offsets must equal their sequential models
  * on arbitrary inputs under arbitrary partitioning — these are exactly
  * the operators where a distributed implementation can silently diverge
  * (sampled range boundaries, inconsistent offsets) while passing a
  * fixed-fixture test. */
class PipelinePropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("B2b property: withOrderedPosition == rank in pk order (10 random frames)") {
    val rnd = new Random(11)
    (1 to 10).foreach { trial =>
      val n = rnd.nextInt(400) + 5
      // non-dense, shuffled, possibly negative keys
      val keys = rnd.shuffle((0 until n).map(_ => rnd.nextLong() % 100000).distinct.toList)
      val df = keys.toDF("k").repartition(rnd.nextInt(12) + 1)
      val got = DataDiff.withOrderedPosition(df, Seq("k"), "pos")
        .as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
      assert(got == (0L until keys.size.toLong), s"trial $trial diverged")
    }
  }

  test("E13 property: packSequences == sequential prefix sum (10 random frames)") {
    val rnd = new Random(23)
    (1 to 10).foreach { trial =>
      val n = rnd.nextInt(300) + 2
      val docs = rnd.shuffle((0 until n).map(_ => rnd.nextLong() % 50000).distinct.toList)
        .map(id => (id, rnd.nextInt(40).toLong + 1))
      val budget = rnd.nextInt(200) + 10
      val df = docs.toDF("doc_id", "nt").repartition(rnd.nextInt(9) + 1)
      val got = Packing.packSequences(df, "doc_id", "nt", budget)
        .select($"doc_id", $"nt", $"start_tok", $"seq_id")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      var cum = 0L
      got.foreach { case (_, nt, start, seq) =>
        assert(start == cum && seq == start / budget, s"trial $trial diverged at start=$start")
        cum += nt
      }
    }
  }
}
