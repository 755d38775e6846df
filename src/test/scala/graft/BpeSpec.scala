package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** Distributed BPE training (SURVEY §2 E49): equivalence with a
  * sequential reference implementation over random corpora, the classic
  * fixture, encode-reproduces-training, and stopping rules. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- sequential reference: classic BPE on a word-frequency table ----
  private def refMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(
      words0: Map[String, Long], rounds: Int, minCount: Long):
      (List[(String, String, Long)], Map[List[String], Long]) = {
    var words = words0.map { case (w, c) => w.split("").toList -> c }
      .groupMapReduce(_._1)(_._2)(_ + _)
    var merges = List.empty[(String, String, Long)]
    var r = 0
    var stop = false
    while (r < rounds && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best.filter(_._2 >= minCount) match {
        case None => stop = true
        case Some(((a, b), n)) =>
          merges :+= (a, b, n)
          words = words.toSeq.map { case (s, c) => refMerge(s, a, b) -> c }
            .groupMapReduce(_._1)(_._2)(_ + _)
          r += 1
      }
    }
    (merges, words)
  }

  test("E49: the classic fixture learns the expected first merges") {
    // "low"×5 "lowest"×2: 'l o' and 'o w' both appear 7 times; 'l o' wins
    // lexicographically, then '(lo) w' at 7, then 'low e'? no — 'e s'/'s t'
    // at 2 each: 'e s' wins, then '(es) t'
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest")).toDF("text")
    val merges = Bpe.train(corpus, "text", rounds = 4, minCount = 2)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) == Seq(
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "s", 2L), ("es", "t", 2L)))
  }

  test("E49: distributed training equals the sequential reference on random corpora") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      // small alphabet → dense pair collisions, the interesting regime;
      // runs of repeated chars exercise the overlap rule
      val words = (1 to 40).map { _ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => "abc" (rnd.nextInt(3))).mkString
      }
      val corpus = words.toDF("text")
      val got = Bpe.train(corpus, "text", rounds = 6, minCount = 2)
        .map(m => (m.left, m.right, m.pairCount))
      val wordCounts = words.groupMapReduce(identity)(_ => 1L)(_ + _)
      val (expect, _) = refTrain(wordCounts, 6, 2L)
      assert(got == expect, s"trial $trial: $got vs $expect (words: $words)")
    }
  }

  test("E49: encode with the learned rules reproduces training's final symbol state") {
    val words = Seq("aaab", "abab", "bbaa", "aaaa", "abba")
    val corpus = words.toDF("text")
    val merges = Bpe.train(corpus, "text", rounds = 4, minCount = 1)
    val got = Bpe.encode(words.distinct.toDF("text"), "text", merges)
      .select($"text", $"bpe_syms").as[(String, Seq[String])].collect().toMap
    val (_, refWords) = refTrain(words.groupMapReduce(identity)(_ => 1L)(_ + _),
      4, 1L)
    val refByWord = refWords.keys.map(s => s.mkString -> s).toMap
    words.distinct.foreach { w =>
      assert(got(w).toList == refByWord(w), s"word $w")
    }
  }

  test("E49: replayCounts reproduces every trained pair count; a corrupted rule list breaks it") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++ Seq.fill(3)("newer"))
      .toDF("text")
    val merges = Bpe.train(corpus, "text", rounds = 5, minCount = 2)
    assert(merges.nonEmpty)
    val replay = Bpe.replayCounts(corpus, "text", merges)
    assert(replay.toSeq == merges.map(_.pairCount),
      s"replay ${replay.toSeq} vs trained ${merges.map(_.pairCount)}")
    // swap the first two rules: the replayed state for rule 2 is wrong,
    // so at least one count must diverge — the invariant really bites
    if (merges.length >= 2) {
      val swapped = Seq(merges(1), merges(0)) ++ merges.drop(2)
      val bad = Bpe.replayCounts(corpus, "text", swapped)
      assert(bad.toSeq != swapped.map(_.pairCount),
        "replay failed to detect a reordered rule list")
    }
    // empty rule list is a no-op, not an error
    assert(Bpe.replayCounts(corpus, "text", Seq.empty).isEmpty)
  }

  test("E49: stops when the best pair falls under minCount; rounds=0 learns nothing") {
    val corpus = Seq("ab", "cd", "ef").toDF("text") // every pair count 1
    assert(Bpe.train(corpus, "text", rounds = 5, minCount = 2).isEmpty)
    assert(Bpe.train(corpus, "text", rounds = 0).isEmpty)
    // multi-token docs: pairs never cross word boundaries
    val m = Bpe.train(Seq("xy xy xy").toDF("text"), "text", rounds = 1, minCount = 2)
    assert(m.map(x => (x.left, x.right, x.pairCount)) == Seq(("x", "y", 3L)))
  }
}
