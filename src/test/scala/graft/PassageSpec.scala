package graft

import graft.dedup.Passage
import org.apache.spark.sql.functions._

import scala.util.Random

/** E51 duplicated-passage excision: hand-built cases with known spans,
  * then randomized equivalence against a sequential reference that
  * applies the same policy naively (group all k-windows by string,
  * keeper = min doc id, cut merged spans everywhere else). */
class PassageSpec extends SparkSpecBase {
  import spark.implicits._

  /** Sequential reference: same semantics, brute force. */
  private def reference(
      docs: Seq[(Long, String)], k: Int,
      keepWin: String => Boolean = _ => true): Map[Long, (Long, String)] = {
    val occs = for {
      (id, t) <- docs
      p <- 0 to (t.length - k) if t.length >= k
      w = t.substring(p, p + k) if keepWin(w)
    } yield (w, id, p)
    val keeper = occs.groupBy(_._1)
      .filter { case (_, os) => os.map(_._2).distinct.size >= 2 }
      .map { case (w, os) => w -> os.map(_._2).min }
    val toCut = occs.collect {
      case (w, id, p) if keeper.get(w).exists(_ != id) => (id, p)
    }
    val spansByDoc = toCut.groupBy(_._1).map { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val spans = sorted.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
          (acc.head._1, math.max(acc.head._2, p + k)) :: acc.tail
        case (acc, p) => (p, p + k) :: acc
      }.reverse
      id -> spans
    }
    docs.map { case (id, t) =>
      val spans = spansByDoc.getOrElse(id, Nil)
      val removed = spans.map { case (s, e) => e - s }.sum.toLong
      val kept = new StringBuilder
      var last = 0
      spans.foreach { case (s, e) => kept ++= t.substring(last, s); last = e }
      kept ++= t.substring(last)
      id -> (removed, kept.toString)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, String)] =
    Passage.exciseDuplicates(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, String)].collect()
      .map { case (id, n, t) => id -> (n, t) }.toMap

  test("a shared passage is kept in the smallest doc id and cut elsewhere") {
    val passage = "0123456789" // k = 10 -> exactly one shared window
    val docs = Seq(
      1L -> s"aaa${passage}bbb",
      2L -> s"xx${passage}yy",
      3L -> "unrelated text entirely")
    val got = run(docs, 10)
    assert(got(1L) == (0L, s"aaa${passage}bbb")) // keeper: untouched
    assert(got(2L) == (10L, "xxyy"))
    assert(got(3L) == (0L, "unrelated text entirely"))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // shared run of 12 chars with k=10 -> 3 overlapping windows in doc 2,
    // excised as ONE 12-char span, not three 10-char cuts
    val shared = "abcdefghijkl"
    val docs = Seq(1L -> s"__${shared}__", 2L -> s"ZZ${shared}ZZ")
    val got = run(docs, 10)
    assert(got(1L)._1 == 0L)
    assert(got(2L) == (12L, "ZZZZ"))
  }

  test("within-doc repetition alone is not cut (cross-doc metric)") {
    val docs = Seq(
      1L -> "repeatrepeatrepeatrepeat", // self-repetition, no partner doc
      2L -> "no overlap here at all..")
    val got = run(docs, 10)
    assert(got(1L)._1 == 0L)
    assert(got(2L)._1 == 0L)
  }

  test("docs shorter than k pass through untouched") {
    val docs = Seq(1L -> "tiny", 2L -> "tiny", 3L -> "also small")
    val got = run(docs, 10)
    assert(got.values.forall(_._1 == 0L))
    assert(got(1L)._2 == "tiny" && got(2L)._2 == "tiny")
  }

  test("multibyte text cuts on character positions, not bytes") {
    // é (2 UTF-8 bytes) and 中 (3 bytes) stress the char-vs-byte axis:
    // Spark substring counts characters, so spans align with the
    // sequential reference (and with DuckDB's substr in the oracle)
    val passage = "héllo wörld 中文本 xx" // 18 chars, k=18 -> 1 shared window
    val docs = Seq(
      1L -> s"aä${passage}öz",
      2L -> s"ü中${passage}",
      3L -> "unrelated ascii text here")
    val got = run(docs, 18)
    assert(got(1L) == (0L, s"aä${passage}öz"))
    assert(got(2L) == (18L, "ü中"))
    assert(got(3L)._1 == 0L)
  }

  test("randomized equivalence with the sequential reference") {
    val rnd = new Random(42)
    for (trial <- 0 until 8) {
      val k = 4 + rnd.nextInt(4) // 4..7
      // small alphabet forces plenty of genuine cross-doc repeats
      def txt(n: Int) = (0 until n).map(_ => "abcab!"(rnd.nextInt(6))).mkString
      val base = (0 until 12).map(i => i.toLong -> txt(6 + rnd.nextInt(40)))
      // splice shared passages between random doc pairs
      val docs = base.map { case (id, t) =>
        if (rnd.nextBoolean() && id > 0) {
          val donor = base(rnd.nextInt(id.toInt))._2
          val take = math.min(donor.length, k + rnd.nextInt(8))
          id -> (t + donor.take(take))
        } else id -> t
      }
      val exp = reference(docs, k)
      val got = run(docs, k)
      assert(got == exp, s"trial $trial k=$k docs=$docs")
    }
  }

  test("E51w: winnow-screened excision is bit-equal to the unscreened operator when k >= wk+ww-1") {
    // randomized corpora with spliced shared passages LONGER than the
    // winnow guarantee (k ≥ wk+ww−1 ⇒ every dup host is a candidate);
    // some splices shorter than k stay un-excised in BOTH forms
    val rnd = new Random(7)
    val (wk, ww) = (4, 3)
    val k = wk + ww - 1 + rnd.nextInt(3) // 6..8, always >= the guarantee
    def txt(n: Int) = (0 until n).map(_ => "abcdab! "(rnd.nextInt(8))).mkString
    val base = (0 until 14).map(i => i.toLong -> txt(10 + rnd.nextInt(50)))
    val docs = base.map { case (id, t) =>
      if (id % 3 == 1 && id > 0) {
        val donor = base(rnd.nextInt(id.toInt))._2
        id -> (t + donor.take(math.min(donor.length, k + 2 + rnd.nextInt(10))))
      } else id -> t
    }
    val full = run(docs, k)
    val screened = Passage.exciseDuplicatesWinnowed(
      docs.toDF("doc_id", "text"), "doc_id", "text", k, wk, ww)
      .as[(Long, Long, String)].collect()
      .map { case (id, n, t) => id -> (n, t) }.toMap
    assert(screened == full)
    // and something was actually excised, so the equality isn't vacuous
    assert(full.values.exists(_._1 > 0L), s"no dup mass in fixture: $docs")
    // guarantee violation refused loudly
    val e = intercept[IllegalArgumentException] {
      Passage.exciseDuplicatesWinnowed(
        docs.toDF("doc_id", "text"), "doc_id", "text", wk + ww - 2, wk, ww)
    }
    assert(e.getMessage.contains("guarantee"))
  }

  test("sampled keyspace mode equals the reference restricted to the same slice") {
    // the slice predicate is the SAME portable h32 both engines compute
    def inSlice(bp: Int)(w: String): Boolean =
      graft.functions.H32.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w)) % 10000 < bp
    val rnd = new Random(99)
    def txt(n: Int) = (0 until n).map(_ => "abcab!"(rnd.nextInt(6))).mkString
    val base = (0 until 12).map(i => i.toLong -> txt(20 + rnd.nextInt(40)))
    val docs = base.map { case (id, t) =>
      if (id % 2 == 1) {
        val donor = base(rnd.nextInt(id.toInt))._2
        id -> (t + donor.take(math.min(donor.length, 12)))
      } else id -> t
    }
    val k = 4
    // a fat slice so SOME dup windows survive it (tiny alphabet => the
    // window set is dense in hash space) and a thin one exercising the
    // mostly-filtered shape; 10000 must reproduce exact mode bit-for-bit
    for (bp <- Seq(5000, 500, 10000)) {
      val exp = reference(docs, k, inSlice(bp))
      val got = Passage.exciseDuplicates(
        docs.toDF("doc_id", "text"), "doc_id", "text", k, bp)
        .as[(Long, Long, String)].collect()
        .map { case (id, n, t) => id -> (n, t) }.toMap
      assert(got == exp, s"bp=$bp")
      if (bp == 10000) assert(got == reference(docs, k))
    }
    // sampled mode must still CUT something in the fat slice for the
    // assertion above to mean anything
    assert(reference(docs, k, inSlice(5000)).values.exists(_._1 > 0))
    // out-of-range sampleBp refused loudly
    val e = intercept[IllegalArgumentException] {
      Passage.exciseDuplicates(docs.toDF("doc_id", "text"), "doc_id", "text", k, 0)
    }
    assert(e.getMessage.contains("sampleBp"))
  }
}
