package graft

import graft.text.Classifier
import org.apache.spark.sql.functions._

/** E52 contrastive-centroid classifier: weight semantics, exact-integer
  * scoring, deterministic tie-breaks, and the train→serve round trip. */
class ClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private def weightsOf(rows: Seq[(String, String)], n: Int = 2, scale: Long = 300L) =
    Classifier.trainCentroid(rows.toDF("cls", "text"), "cls", "text", n, scale)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("class-unique grams keep their ppm weight; shared grams center to zero") {
    // a: "aaab" -> aa,aa,ab (tot 3); b: "cccd" -> cc,cc,cd (tot 3);
    // every gram is class-unique, so w = 2p - p = p = floor(cnt*300/3)
    val m = weightsOf(Seq(("a", "aaab"), ("b", "cccd")))
    assert(m(("a", "aa")) == 200L && m(("a", "ab")) == 100L)
    assert(m(("b", "cc")) == 200L && m(("b", "cd")) == 100L)
    // identical distributions -> every weight exactly 0
    val z = weightsOf(Seq(("a", "xy"), ("b", "xy")))
    assert(z.values.forall(_ == 0L))
  }

  test("minCount floor drops corpus-rare grams without moving surviving weights") {
    // "aa" occurs 2x in class a and 1x in class b (corpus total 3);
    // "ab"/"ac"/"cd" occur once each (total 1). At minCount=2 the rare grams
    // vanish; the survivor's weight must equal its UNfloored value —
    // class totals are pre-floor, so ppm normalization is untouched.
    val rows = Seq(("a", "aaab"), ("b", "aacd"))
    val unfloored = Classifier.trainCentroid(
      rows.toDF("cls", "text"), "cls", "text", 2, 300L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val floored = Classifier.trainCentroid(
      rows.toDF("cls", "text"), "cls", "text", 2, 300L, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(floored.keySet === Set(("a", "aa"), ("b", "aa")))
    for (k <- floored.keySet) assert(floored(k) === unfloored(k), k)
    // minCount = 1 reproduces the unfloored table bit-for-bit
    val explicit1 = Classifier.trainCentroid(
      rows.toDF("cls", "text"), "cls", "text", 2, 300L, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(explicit1 === unfloored)
    // invalid floor refused loudly
    val e = intercept[IllegalArgumentException] {
      Classifier.trainCentroid(rows.toDF("cls", "text"), "cls", "text", 2, 300L, 0L)
    }
    assert(e.getMessage.contains("minCount"))
  }

  test("training lowercases before feature extraction") {
    val m = weightsOf(Seq(("a", "ABAB"), ("b", "cd")))
    // class a grams arrive lowercased; unique to a -> w = p
    assert(m(("a", "ab")) == 200L && m(("a", "ba")) == 100L)
    assert(!m.keys.exists { case (_, g) => g.exists(_.isUpper) })
  }

  test("prediction is the exact-integer argmax, ties to the smaller class") {
    // symmetric classes -> all-zero weights -> tie on every doc -> "a"
    val w = Classifier.trainCentroid(
      Seq(("a", "xyxy"), ("b", "xyxy")).toDF("cls", "text"), "cls", "text", n = 2)
    val pred = Classifier.predictCentroid(
      Seq((1L, "xy")).toDF("doc_id", "text"), "doc_id", "text", w, n = 2)
      .as[(Long, String)].collect().toMap
    assert(pred(1L) == "a")
  }

  test("docs with no trained gram fall back to the smallest class") {
    val w = Classifier.trainCentroid(
      Seq(("b", "xxxx"), ("c", "yyyy")).toDF("cls", "text"), "cls", "text", n = 2)
    val pred = Classifier.predictCentroid(
      Seq((1L, "zz"), (2L, "")).toDF("doc_id", "text"), "doc_id", "text", w, n = 2)
      .as[(Long, String)].collect().toMap
    assert(pred == Map(1L -> "b", 2L -> "b"))
  }

  test("train -> serve separates distinct char distributions") {
    val train = Seq(
      ("de", "der hund und die katze und der mann"),
      ("de", "das ist ein und der und"),
      ("en", "the dog and the cat and the man"),
      ("en", "this is a thing and the other")).toDF("cls", "text")
    val w = Classifier.trainCentroid(train, "cls", "text", n = 2)
    val pred = Classifier.predictCentroid(
      Seq((1L, "der und das"), (2L, "the and this")).toDF("doc_id", "text"),
      "doc_id", "text", w, n = 2)
      .as[(Long, String)].collect().toMap
    assert(pred == Map(1L -> "de", 2L -> "en"))
  }

  test("fold serve path is bit-identical to the join path (randomized parity)") {
    val rnd = new scala.util.Random(13)
    val alphabets = Seq("ab", "abc ", "xyzäöü", "日本語中文", "a b\tc\nd")
    val train = (0 until 40).map { i =>
      val alpha = alphabets(i % alphabets.length)
      val txt = (0 until 3 + rnd.nextInt(30))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (s"c${i % 5}", txt)
    }
    for (n <- Seq(1, 2, 3)) {
      val w = Classifier.trainCentroid(
        train.toDF("cls", "text"), "cls", "text", n, scale = 1000L)
      val docs = (0 until 60).map { i =>
        val alpha = alphabets(rnd.nextInt(alphabets.length))
        val txt =
          if (i % 11 == 0) null
          else if (i % 7 == 0) ""
          else (0 until rnd.nextInt(20))
            .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        (i.toLong, txt)
      }.toDF("doc_id", "text")
      val joinPath = Classifier.predictCentroid(docs, "doc_id", "text", w, n)
        .as[(Long, String)].collect().toMap
      val foldPath = Classifier.predictCentroidFold(docs, "doc_id", "text", w, n)
        .as[(Long, String)].collect().toMap
      assert(foldPath === joinPath, s"n=$n")
    }
  }

  test("fold path excludes classes with no weight row for any doc gram") {
    // scale=1 floors every ppm to 0 -> all weights 0. A doc matching
    // only class-b grams must predict "b" (the join path's inner-join
    // semantics: "a" never enters the argmax). A naive 0-filled fold
    // would tie a/b at 0 and leak "a" — the per-gram class bitmask is
    // what keeps the two paths identical.
    val w = Classifier.trainCentroid(
      Seq(("a", "xyz"), ("b", "uvw")).toDF("cls", "text"),
      "cls", "text", n = 2, scale = 1L)
    assert(w.agg(max(abs($"w_ppm"))).head().getLong(0) == 0L)
    val docs = Seq((1L, "uv"), (2L, "yz"), (3L, "qq")).toDF("doc_id", "text")
    val fold = Classifier.predictCentroidFold(docs, "doc_id", "text", w, n = 2)
      .as[(Long, String)].collect().toMap
    val join = Classifier.predictCentroid(docs, "doc_id", "text", w, n = 2)
      .as[(Long, String)].collect().toMap
    assert(join == Map(1L -> "b", 2L -> "a", 3L -> "a"))
    assert(fold === join)
  }

  test("fold caps: >64 classes and over-byte models fall back to the join path (parity at the boundary)") {
    // 70 classes: the Long bitmask can't hold them — predictCentroidFold
    // must auto-fall-back to predictCentroid and return the identical map
    val manyCls = (0 until 70).map(i => (f"c$i%02d", s"t$i text $i body"))
    val wMany = Classifier.trainCentroid(
      manyCls.toDF("cls", "text"), "cls", "text", n = 2)
    val docs = (0 until 30).map(i => (i.toLong, s"t${i % 70} text")).toDF("doc_id", "text")
    val foldMany = Classifier.predictCentroidFold(docs, "doc_id", "text", wMany, n = 2)
      .as[(Long, String)].collect().toMap
    val joinMany = Classifier.predictCentroid(docs, "doc_id", "text", wMany, n = 2)
      .as[(Long, String)].collect().toMap
    assert(foldMany === joinMany)
    // the Column form can't fall back — it refuses loudly instead
    assert(intercept[IllegalArgumentException] {
      Classifier.foldModel(wMany, n = 2)
    }.getMessage.contains("64"))

    // byte cap: same weights, cap squeezed under the model's footprint —
    // the fold must serve through the join path and stay bit-identical
    val w = Classifier.trainCentroid(
      Seq(("a", "der hund und die katze"), ("b", "the dog and the cat"))
        .toDF("cls", "text"), "cls", "text", n = 2)
    val docs2 = Seq((1L, "der und"), (2L, "the and"), (3L, null: String))
      .toDF("doc_id", "text")
    val (cls, bytes) = Classifier.foldModelStats(w)
    assert(cls == 2L && bytes > 0L)
    val foldCapped = Classifier.predictCentroidFold(
      docs2, "doc_id", "text", w, n = 2, maxModelBytes = bytes - 1)
      .as[(Long, String)].collect().toMap
    val join = Classifier.predictCentroid(docs2, "doc_id", "text", w, n = 2)
      .as[(Long, String)].collect().toMap
    assert(foldCapped === join)
    // exactly AT the cap the fold path still serves (boundary inclusive)
    val foldAt = Classifier.predictCentroidFold(
      docs2, "doc_id", "text", w, n = 2, maxModelBytes = bytes)
      .as[(Long, String)].collect().toMap
    assert(foldAt === join)
    // and foldModel itself enforces the same cap loudly
    assert(intercept[IllegalArgumentException] {
      Classifier.foldModel(w, n = 2, maxBytes = 1L)
    }.getMessage.contains("bytes"))
  }

  test("lang classification on the spiked corpus beats 95% held-out accuracy") {
    val docs = TextEntries.langSpiked(spark, sf("sf0.001"))
    val w = Classifier.trainCentroid(
      docs.filter($"doc_id" % 5 =!= 0), "lang", "text", n = TextEntries.ClassifierN)
    val scored = Classifier.predictCentroid(
      docs.filter($"doc_id" % 5 === 0), "doc_id", "text", w,
      n = TextEntries.ClassifierN)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val (hit, tot) = scored.agg(
      sum(when($"pred" === $"lang", 1L).otherwise(0L)), count(lit(1)))
      .as[(Long, Long)].head()
    assert(tot > 0 && hit * 100L >= tot * 95L, s"accuracy $hit/$tot")
  }
}
