package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** E32: Misra-Gries heavy-hitter summary (native TypedImperativeAggregate)
  * and the exact two-pass composition built on it. */
class MisraGriesSpec extends SparkSpecBase {

  // A stream that FORCES decrement sweeps and merge truncation: a few
  // heavy items buried in a long all-distinct tail (each tail token is
  // unique, so with small k the buffer constantly fills and sweeps).
  private def stream(heavy: Map[String, Int], tail: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    rnd.shuffle(
      heavy.toSeq.flatMap { case (s, c) => Seq.fill(c)(s) } ++
        (1 to tail).map(i => s"tail:$i"))
  }

  test("E32: MG candidates ⊇ every item above N/(k+1), any partitioning") {
    import spark.implicits._
    val heavy = Map("alpha" -> 400, "beta" -> 250, "gamma" -> 120)
    val data = stream(heavy, tail = 3000) // N = 3770
    val k = 15 // guarantee floor N/16 ≈ 235 — alpha and beta must survive
    val n = data.size
    val must = heavy.filter { case (_, c) => c.toLong * (k + 1) > n }.keySet
    assert(must == Set("alpha", "beta")) // the trial is non-trivial
    for (parts <- Seq(1, 4, 13)) {
      val cand = data.toDF("s").repartition(parts)
        .agg(TextOps.heavyHitterCandidates($"s", k).as("c"))
        .as[Seq[String]].head()
      assert(cand.size <= k, s"summary exceeded k at $parts partitions")
      assert(must.subsetOf(cand.toSet),
        s"guaranteed heavy hitter missing at $parts partitions: " +
          (must -- cand.toSet).mkString(","))
      assert(cand == cand.sorted, "candidates not emitted sorted")
    }
  }

  test("E32: exact two-pass heavyHitters equals brute force, any partitioning") {
    import spark.implicits._
    val heavy = Map("the" -> 900, "of" -> 500, "and" -> 260, "rare" -> 40)
    // tail tokens must survive TextOps.norm as single tokens ("t17", not
    // "tail:17" which normalizes into TWO tokens and changes N)
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(
      heavy.toSeq.flatMap { case (s, c) => Seq.fill(c)(s) } ++
        (1 to 2000).map(i => s"t$i"))
    val docs = data.grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
    val den = 16
    val toks = docs.select(explode(TextOps.tokens($"text")).as("tok"))
    val nTok = toks.count()
    assert(nTok == data.size.toLong) // normalization kept one token per item
    val brute = toks
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .filter($"tf" * den > nTok)
      .as[(String, Long)].collect().toMap
    assert(brute.nonEmpty && !brute.contains("rare")) // threshold really cuts
    for (parts <- Seq(1, 7)) {
      val got = TextOps.heavyHitters(docs.repartition(parts), "text", den, k = den - 1)
        .select($"tok", $"tf").as[(String, Long)].collect().toMap
      assert(got == brute, s"exact composition diverged at $parts partitions")
    }
  }

  test("E32: grouped MG — per-group guarantee holds independently") {
    import spark.implicits._
    val rows =
      Seq.fill(300)(("en", "hot")) ++ (1 to 600).map(i => ("en", s"e:$i")) ++
        Seq.fill(80)(("de", "heiss")) ++ (1 to 100).map(i => ("de", s"d:$i"))
    val byGroup = rows.toDF("g", "s").repartition(5)
      .groupBy("g").agg(TextOps.heavyHitterCandidates($"s", 8).as("c"))
      .as[(String, Seq[String])].collect().toMap
    assert(byGroup("en").contains("hot")) // 300 > 900/9
    assert(byGroup("de").contains("heiss")) // 80 > 180/9
  }

  test("E32: nulls ignored; empty input yields an empty summary") {
    import spark.implicits._
    val cand = Seq(Some("x"), None, Some("x"), None)
      .toDF("s")
      .agg(TextOps.heavyHitterCandidates($"s", 4))
      .as[Seq[String]].head()
    assert(cand == Seq("x"))
    val empty = Seq.empty[String].toDF("s")
      .agg(TextOps.heavyHitterCandidates($"s", 4))
      .as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  test("E32: graft_heavy_hitter_candidates callable from SQL, 2- and 3-arg") {
    import spark.implicits._
    Seq("a", "a", "b").toDF("s").createOrReplaceTempView("mg_in")
    val got = spark.sql(
      "SELECT graft_heavy_hitter_candidates(s, 4) AS c FROM mg_in")
      .as[Seq[String]].head()
    assert(got == Seq("a", "b"))
    // weighted form; an INT weight column casts up to long implicitly
    Seq(("a", 1), ("b", 100)).toDF("s", "w").createOrReplaceTempView("mg_w")
    val w = spark.sql(
      "SELECT graft_heavy_hitter_candidates(s, w, 1) AS c FROM mg_w")
      .as[Seq[String]].head()
    assert(w == Seq("b"), "the single counter must hold the weight-dominant item")
  }

  test("E32w: weighted MG — guarantee over total WEIGHT, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // one item with huge weight spread over few rows, buried under many
    // light distinct rows (their count dwarfs their weight)
    val rows = rnd.shuffle(
      Seq.fill(10)(("whale", 500L)) ++ // weight 5000
        (1 to 2000).map(i => (s"m$i", 2L))) // weight 4000
    val k = 7 // floor = 9000/8 = 1125 < 5000
    for (parts <- Seq(1, 5)) {
      val cand = rows.toDF("s", "w").repartition(parts)
        .agg(TextOps.weightedHeavyHitterCandidates($"s", $"w", k).as("c"))
        .as[Seq[String]].head()
      assert(cand.size <= k)
      assert(cand.contains("whale"), s"weighted heavy item lost at $parts partitions")
    }
  }

  test("E32w: exact weighted composition equals brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = rnd.shuffle(
      Seq.fill(40)(("hub", 100L)) ++ Seq.fill(30)(("mid", 60L)) ++
        (1 to 500).map(i => (s"site$i", 7L)))
    val df = rows.toDF("source", "ntok")
    val den = 8
    val total = rows.map(_._2).sum
    val brute = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter { case (_, w) => w * den > total }.toMap
    // hub 4000 and mid 1800 both exceed 9300/8; the 7-weight tail does not
    assert(brute.keySet == Set("hub", "mid"))
    for (parts <- Seq(1, 6)) {
      val got = TextOps.heavyHittersWeighted(
          df.repartition(parts), "source", $"ntok", den, k = den - 1)
        .select($"source", $"weight").as[(String, Long)].collect().toMap
      assert(got == brute, s"weighted composition diverged at $parts partitions")
    }
  }

  test("E32w: null items are excluded from the report AND the denominator") {
    import spark.implicits._
    // if null rows' weight counted toward the total, "a" (30 of 90)
    // would miss the 1/2 threshold; excluded entirely, 30 of 30 passes
    val df = Seq((Some("a"), 30L), (None, 60L)).toDF("s", "w")
    val got = TextOps.heavyHittersWeighted(df, "s", $"w", den = 2, k = 3)
      .select($"s", $"weight").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 30L))
  }

  test("E32w: zero weights are skipped, negative weights refuse loudly") {
    import spark.implicits._
    val cand = Seq(("a", 5L), ("b", 0L), ("a", 3L))
      .toDF("s", "w")
      .agg(TextOps.weightedHeavyHitterCandidates($"s", $"w", 4))
      .as[Seq[String]].head()
    assert(cand == Seq("a")) // b's zero-weight row added nothing
    val e = intercept[Exception] {
      Seq(("a", -1L)).toDF("s", "w")
        .agg(TextOps.weightedHeavyHitterCandidates($"s", $"w", 4))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("E32 property: guarantee and exact composition hold on random weighted streams (10 trials)") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    (1 to 10).foreach { trial =>
      val nHeavy = rnd.nextInt(4) + 1
      val heavy = (1 to nHeavy).map(h => s"hot$h" -> (rnd.nextInt(400) + 100L)).toMap
      val nTail = rnd.nextInt(1500) + 200
      val rows = rnd.shuffle(
        heavy.toSeq.flatMap { case (s, w) => // heavy weight split over 1..5 rows
          val parts = rnd.nextInt(5) + 1
          Seq.fill(parts - 1)((s, w / parts)) :+ (s, w - (w / parts) * (parts - 1))
        } ++ (1 to nTail).map(i => (s"t$i", rnd.nextInt(3) + 1L)))
      val k = rnd.nextInt(20) + 4
      val w = rows.map(_._2).sum
      val df = rows.toDF("s", "w").repartition(rnd.nextInt(7) + 1)
      // (a) the sketch alone: superset of everything above W/(k+1)
      val cand = df.agg(TextOps.weightedHeavyHitterCandidates($"s", $"w", k))
        .as[Seq[String]].head().toSet
      val must = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter { case (_, c) => c * (k + 1) > w }.keySet
      assert(must.subsetOf(cand), s"trial $trial: missing ${must -- cand} (k=$k)")
      // (b) the composition: bit-equal to brute force at den = k+1
      val den = k + 1
      val brute = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .filter { case (_, c) => c * den > w }.toMap
      val got = TextOps.heavyHittersWeighted(df, "s", $"w", den, k)
        .select($"s", $"weight").as[(String, Long)].collect().toMap
      assert(got == brute, s"trial $trial diverged (k=$k, den=$den)")
    }
  }

  test("E32: heavyHitters refuses a k too small for the threshold") {
    import spark.implicits._
    val docs = Seq("a b c").toDF("text")
    val e = intercept[IllegalArgumentException] {
      TextOps.heavyHitters(docs, "text", den = 100, k = 50)
    }
    assert(e.getMessage.contains("k + 1 >= den") ||
      e.getMessage.contains("cannot guarantee"))
  }
}
