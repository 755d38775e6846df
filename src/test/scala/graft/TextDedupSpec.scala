package graft

import graft.dedup.Dedup
import graft.text.{PortableHash, TextOps}
import org.apache.spark.sql.functions._

/** Micro-data semantics of the text + dedup operators (E1–E4, E8–E11). */
class TextDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("h32 matches the md5-prefix reference value") {
    // md5('abc') = 900150983cd24fb0...; first 8 hex = 0x90015098 = 2416005272
    val got = Seq("abc").toDF("s").select(PortableHash.h32($"s")).as[Long].head()
    assert(got == 2416005272L)
    // seeded variant prefixes "<seed>:"
    val seeded = Seq("x").toDF("s").select(PortableHash.h32(7, $"s")).as[Long].head()
    val direct = Seq("7:x").toDF("s").select(PortableHash.h32($"s")).as[Long].head()
    assert(seeded == direct)
  }

  test("normalization and shingling") {
    val sh = Seq("The  quick, BROWN fox!").toDF("t")
      .select(TextOps.shingles($"t").as("s")).as[Seq[String]].head()
    assert(sh == Seq("the quick brown", "quick brown fox"))
    // short docs collapse to a whole-text shingle
    val short = Seq("only two").toDF("t")
      .select(TextOps.shingles($"t").as("s")).as[Seq[String]].head()
    assert(short == Seq("only two"))
  }

  test("langid argmax tie-breaks in marker order") {
    // no markers at all -> all scores 0 -> first language wins
    val pred = Seq("zzz qqq").toDF("text")
      .select(TextOps.langPredict(TextOps.langScores($"text"))).as[String].head()
    assert(pred == "en")
    val de = Seq("der hund und das ist ein").toDF("text")
      .select(TextOps.langPredict(TextOps.langScores($"text"))).as[String].head()
    assert(de == "de")
  }

  test("exact dedup groups normalized variants") {
    val df = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "different")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .select("keeper_id", "n_docs").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("ngram jaccard computes exact basis points") {
    // a: {x y z, y z w}; b: {x y z, y z q} -> common 1, union 3 -> 3333 bp
    val df = Seq((1L, "x y z w"), (2L, "x y z q")).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 3000)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L, 2L, 2L, 3333L)))
    // below threshold -> filtered
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 3400).count() == 0)
  }

  test("E38: containment computes exact basis points from the smaller side") {
    // excerpt ⊂ doc: excerpt shingles {a b c, b c d} all inside the long
    // doc's {a b c, b c d, c d e, d e f} → containment 2/2 = 10000 bp,
    // jaccard 2/4 = 5000 bp
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text", tauBp = 9000)
      .select("id_a", "id_b", "common", "n_a", "n_b", "containment_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 4L, 2L, 10000L)))
  }

  test("E38: containment keeps subset pairs a jaccard threshold loses") {
    // 16-token doc vs its first 5 tokens: containment 10000 bp, jaccard
    // 3/14 ≈ 2142 bp — the excerpt shape only containment can gate on
    val long = (1 to 16).map(i => s"t$i").mkString(" ")
    val excerpt = (1 to 5).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, long), (2L, excerpt)).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text", tauBp = 9999).count() == 1)
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 6000).count() == 0)
  }

  test("E38: containment respects the maxDf candidate cap like jaccard") {
    // the only shared shingle is hot (df=3 > maxDf=2) → no candidates
    val df = Seq((1L, "x y z a1 b1"), (2L, "x y z a2 b2"), (3L, "x y z a3 b3"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text", tauBp = 1, maxDf = 2).count() == 0)
    assert(Dedup.containmentPairs(df, "doc_id", "text", tauBp = 1, maxDf = Long.MaxValue).count() == 3)
  }

  test("minhash LSH finds exact duplicates with certainty") {
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "h i j k l m n"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text", tauBp = 9999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // identical docs always share every band
  }

  test("E3: indexed incremental minhash finds cross-side dups from the stored index") {
    val corpus = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n")).toDF("doc_id", "text")
    val batch = Seq((10L, "a b c d e f g"), (11L, "z y x w v u t")).toDF("doc_id", "text")
    Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_mh_t", buckets = 4)
    Dedup.writeMinhashIndex(spark, "graft_mh_t", buckets = 4)
    try {
      val pairs = Dedup.minhashLshPairsIndexed(
        spark, "graft_mh_t", batch, "doc_id", "text", tauBp = 9999)
        .select($"batch_id", $"corpus_id", $"jaccard_bp")
        .as[(Long, Long, Long)].collect().toSet
      // the identical doc surfaces (identical sigs share every band);
      // the unrelated batch doc matches nothing
      assert(pairs == Set((10L, 1L, 10000L)))
      // parameter-mismatch guard: serving with a different w / band
      // layout than the index was built with must FAIL LOUDLY — a silent
      // empty join would pass every duplicate
      val eW = intercept[IllegalArgumentException] {
        Dedup.minhashLshPairsIndexed(spark, "graft_mh_t", batch, "doc_id", "text",
          tauBp = 9999, w = 5)
      }
      assert(eW.getMessage.contains("w=3"))
      val eB = intercept[IllegalArgumentException] {
        Dedup.minhashLshPairsIndexed(spark, "graft_mh_t", batch, "doc_id", "text",
          tauBp = 9999, numPerm = 8, bands = 2)
      }
      assert(eB.getMessage.contains("num_perm"))
      val eMissing = intercept[IllegalArgumentException] {
        Dedup.incrementalNgramPairsIndexed(spark, "graft_nope", batch, "doc_id", "text", 9999)
      }
      assert(eMissing.getMessage.contains("not found"))
    } finally {
      Seq("postings", "sizes", "minhash", "meta", "minhash_meta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS graft_mh_t_$s"))
    }
  }

  test("E2b-delta: appended index answers like a full rebuild; compaction folds it") {
    val corpus0 = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n")).toDF("doc_id", "text")
    val accepted = Seq((3L, "p q r s t u v")).toDF("doc_id", "text")
    val full = corpus0.unionByName(accepted)
    val batch = Seq(
      (10L, "a b c d e f g"), // dup of base doc 1
      (11L, "p q r s t u v"), // dup of DELTA doc 3 — only reachable through the delta leg
      (12L, "q w e r t y u")).toDF("doc_id", "text")
    Dedup.writeNgramIndex(corpus0, "doc_id", "text", "graft_dl_t", buckets = 4)
    Dedup.writeMinhashIndex(spark, "graft_dl_t", buckets = 4)
    try {
      Dedup.appendToNgramIndex(accepted, "doc_id", "text", "graft_dl_t")
      // exact serve: base ∪ delta must equal screening against the full corpus
      val served = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_dl_t", batch, "doc_id", "text", tauBp = 9999)
        .collect().map(_.toSeq).toSet
      val direct = Dedup.incrementalNgramPairs(
        full, batch, "doc_id", "text", tauBp = 9999)
        .collect().map(_.toSeq).toSet
      assert(served == direct)
      assert(served.exists(r => r.head == 11L), "delta-leg duplicate must surface")
      // minhash serve: the append also wrote the delta's banded buckets
      val servedMh = Dedup.minhashLshPairsIndexed(
        spark, "graft_dl_t", batch, "doc_id", "text", tauBp = 9999)
        .select($"batch_id", $"corpus_id", $"jaccard_bp")
        .as[(Long, Long, Long)].collect().toSet
      assert(servedMh == Set((10L, 1L, 10000L), (11L, 3L, 10000L)))
      // id-freshness guard: re-appending an existing doc id must refuse
      val clash = intercept[IllegalArgumentException] {
        Dedup.appendToNgramIndex(
          Seq((3L, "anything at all here")).toDF("doc_id", "text"),
          "doc_id", "text", "graft_dl_t")
      }
      assert(clash.getMessage.contains("already present"))
      // layering MinHash over an un-compacted index must refuse (bucket
      // rows and postings have to stay leg-aligned)
      val stale = intercept[IllegalArgumentException] {
        Dedup.writeMinhashIndex(spark, "graft_dl_t", buckets = 4)
      }
      assert(stale.getMessage.contains("compact"))
      // second append into the SAME delta tables, then compact: deltas
      // fold into the base, answers unchanged
      Dedup.appendToNgramIndex(
        Seq((4L, "m n b v c x z")).toDF("doc_id", "text"),
        "doc_id", "text", "graft_dl_t")
      Dedup.compactNgramIndex(spark, "graft_dl_t")
      Seq("postings_delta", "sizes_delta", "minhash_delta").foreach(s =>
        assert(!spark.catalog.tableExists(s"graft_dl_t_$s"), s"$s must be folded"))
      val afterCompact = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_dl_t", batch, "doc_id", "text", tauBp = 9999)
        .collect().map(_.toSeq).toSet
      assert(afterCompact == direct, "compaction must not change answers")
      val mhAfter = Dedup.minhashLshPairsIndexed(
        spark, "graft_dl_t", batch, "doc_id", "text", tauBp = 9999)
        .select($"batch_id", $"corpus_id", $"jaccard_bp")
        .as[(Long, Long, Long)].collect().toSet
      assert(mhAfter == servedMh, "compaction must not change minhash answers")
      // REBUILD invalidation: a fresh writeNgramIndex must take the old
      // MinHash layer down with it — a stale banded-bucket table would
      // pass its own meta guard and silently serve candidates from the
      // old corpus
      Dedup.writeNgramIndex(corpus0, "doc_id", "text", "graft_dl_t", buckets = 4)
      Seq("minhash", "minhash_meta").foreach(s =>
        assert(!spark.catalog.tableExists(s"graft_dl_t_$s"),
          s"$s must not survive a corpus rebuild"))
      val noLayer = intercept[IllegalArgumentException] {
        Dedup.minhashLshPairsIndexed(spark, "graft_dl_t", batch, "doc_id", "text", 9999)
      }
      assert(noLayer.getMessage.contains("not found"))
    } finally {
      Seq("postings", "sizes", "minhash", "meta", "minhash_meta",
        "postings_delta", "sizes_delta", "minhash_delta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS graft_dl_t_$s"))
    }
  }

  test("E2b-delta: crashed append and crashed compaction are refused/resumed, never double-counted") {
    val corpus0 = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n")).toDF("doc_id", "text")
    val acc1 = Seq((3L, "p q r s t u v")).toDF("doc_id", "text")
    val batch = Seq((10L, "a b c d e f g"), (11L, "p q r s t u v")).toDF("doc_id", "text")
    def serveIds(b: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalNgramPairsIndexed(
        spark, "graft_cr_t", b, "doc_id", "text", tauBp = 9999)
        .select($"batch_id").as[Long].collect().toSet
    Dedup.writeNgramIndex(corpus0, "doc_id", "text", "graft_cr_t", buckets = 4)
    try {
      // --- crashed FIRST append: sizes_delta landed, postings_delta didn't ---
      Dedup.appendToNgramIndex(acc1, "doc_id", "text", "graft_cr_t")
      graft.sources.Bucketed.dropWithLocation(spark, "graft_cr_t_postings_delta")
      // serve survives: base leg only (under-recall, not an error)
      assert(serveIds(batch) == Set(10L), "partial append must serve the base leg only")
      // a RETRY of the same batch is refused LOUDLY: the batch ids are
      // visible through sizes_delta even though postings never landed —
      // the first-ever append has no other delta leg to make them visible
      val retry = intercept[IllegalArgumentException] {
        Dedup.appendToNgramIndex(acc1, "doc_id", "text", "graft_cr_t")
      }
      assert(retry.getMessage.contains("already present"))
      // documented repair: drop the deltas, re-append the delta batches
      graft.sources.Bucketed.dropWithLocation(spark, "graft_cr_t_sizes_delta")
      Dedup.appendToNgramIndex(acc1, "doc_id", "text", "graft_cr_t")
      assert(serveIds(batch) == Set(10L, 11L))

      // --- crashed compaction, window A: deltas set aside, fold not run ---
      Seq("postings", "sizes").foreach(t => spark.sql(
        s"ALTER TABLE graft_cr_t_${t}_delta RENAME TO graft_cr_t_${t}_delta_folding"))
      assert(serveIds(batch) == Set(10L),
        "set-aside delta must under-recall, never fail or double-count")
      // id freshness holds across the crash: the folding ids still guard
      val retry2 = intercept[IllegalArgumentException] {
        Dedup.appendToNgramIndex(acc1, "doc_id", "text", "graft_cr_t")
      }
      assert(retry2.getMessage.contains("already present"))
      Dedup.compactNgramIndex(spark, "graft_cr_t") // resumes the fold
      assert(serveIds(batch) == Set(10L, 11L), "resumed compaction restores full recall")

      // --- crashed compaction, window B: fold completed, drop didn't ---
      val acc2 = Seq((4L, "z y x w v u t")).toDF("doc_id", "text")
      val batch2 = Seq((12L, "z y x w v u t")).toDF("doc_id", "text")
      Dedup.appendToNgramIndex(acc2, "doc_id", "text", "graft_cr_t")
      Seq(("postings", Seq("__sh")), ("sizes", Seq("__id"))).foreach { case (t, keys) =>
        spark.sql(s"ALTER TABLE graft_cr_t_${t}_delta RENAME TO graft_cr_t_${t}_delta_folding")
        graft.sources.Bucketed.rewrite(
          spark.table(s"graft_cr_t_$t")
            .unionByName(spark.table(s"graft_cr_t_${t}_delta_folding")),
          s"graft_cr_t_$t", 4, keys)
      }
      Dedup.compactNgramIndex(spark, "graft_cr_t") // must detect + drop, NOT re-fold
      Seq("postings_delta_folding", "sizes_delta_folding", "postings_delta", "sizes_delta")
        .foreach(s => assert(!spark.catalog.tableExists(s"graft_cr_t_$s"),
          s"$s must be gone after the resumed compaction"))
      // a re-fold would duplicate doc 4's postings and inflate `common`
      // past the true intersection — compare full rows to a fresh rebuild
      val after = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_cr_t", batch2, "doc_id", "text", tauBp = 9999)
        .collect().map(_.toSeq).toSet
      Dedup.writeNgramIndex(corpus0.unionByName(acc1).unionByName(acc2),
        "doc_id", "text", "graft_cr_ref", buckets = 4)
      val ref = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_cr_ref", batch2, "doc_id", "text", tauBp = 9999)
        .collect().map(_.toSeq).toSet
      assert(after == ref, "resumed compaction must serve exactly like a fresh rebuild")
      assert(after.nonEmpty)
    } finally {
      Seq("graft_cr_t", "graft_cr_ref").foreach { n =>
        Seq("postings", "sizes", "meta", "postings_delta", "sizes_delta",
          "postings_delta_folding", "sizes_delta_folding")
          .foreach(s => spark.sql(s"DROP TABLE IF EXISTS ${n}_$s"))
      }
    }
  }

  test("simhash: identical docs at hamming 0, banding returns each pair once") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "v w x y z"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.count { case (a, b, h) => a == 1L && b == 2L && h == 0L } == 1)
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("ngram maxDf cap: hot shingles skip candidate generation but still score") {
    // docs 1,2 share a distinctive shingle; 'a a a' is hot (in all docs)
    val df = Seq(
      (1L, "a a a x y z"), (2L, "a a a x y z"), (3L, "a a a q r s"), (4L, "a a a t u v")
    ).toDF("doc_id", "text")
    // maxDf = MaxValue exercises the exact all-pairs branch (the default
    // is the capped branch, which the 'capped' call below pins)
    val uncapped = Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 9000,
        maxDf = Long.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 9000, maxDf = 3)
      .select("id_a", "id_b", "jaccard_bp").as[(Long, Long, Long)].collect()
    // the identical pair (1,2) survives the cap, with the SAME exact score
    assert(uncapped == Set((1L, 2L)))
    assert(capped.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(capped.head._3 == 10000L) // hot shingles still counted in Jaccard
  }

  test("E2-gate: sampled candidacy is a subset screen with exact scores; bp=10000 is the identity") {
    // randomized corpus: near-dup pairs (base doc + tailed copy) plus
    // unrelated docs — the docsNear shape the gate runs on
    val rnd = new scala.util.Random(42)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")
    val base = (0L until 40L).map { i =>
      (i, Seq.fill(12 + rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val spiked = base ++ base.filter(_._1 % 3 == 0)
      .map { case (i, t) => (i + 1000L, t + " dup tail marker") }
    val df = spiked.toDF("doc_id", "text")
    val full = Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 6000)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // a generous slice so the tiny corpus keeps some candidates
    val sampled = Dedup.ngramJaccardPairsSampled(
        df, "doc_id", "text", tauBp = 6000, sampleBp = 3000)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // subset screen: every sampled row appears VERBATIM in the full
    // answer (the slice changes candidacy, never the exact metric)
    assert(sampled.subsetOf(full), s"sampled rows not in full: ${sampled -- full}")
    assert(sampled.nonEmpty, "slice killed every candidate — test corpus too small")
    // bp=10000 keeps the whole keyspace: identical to the unsampled op
    val identity = Dedup.ngramJaccardPairsSampled(
        df, "doc_id", "text", tauBp = 6000, sampleBp = 10000)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(identity == full)
    // sampled components REFINE the full partition: sampled edges are a
    // subset, so no sampled cluster may span two full clusters
    val ids = df.select(col("doc_id").as("id"))
    val fullComp = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 6000)
          .select("id_a", "id_b"), ids)
      .select(col("id"), col("comp").as("full_comp"))
    val sampComp = Dedup.connectedComponents(
        Dedup.ngramJaccardPairsSampled(
          df, "doc_id", "text", tauBp = 6000, sampleBp = 3000)
          .select("id_a", "id_b"), ids)
      .select(col("id"), col("comp").as("samp_comp"))
    val straddlers = sampComp.join(fullComp, "id")
      .groupBy("samp_comp")
      .agg(countDistinct("full_comp").as("n"))
      .filter(col("n") > 1)
      .count()
    assert(straddlers == 0L,
      s"$straddlers sampled cluster(s) straddle full clusters — not a refinement")
  }

  test("ngram maxDf cap: constructing the DataFrame launches zero Spark jobs") {
    val df = Seq(
      (1L, "a a a x y z"), (2L, "a a a x y z"), (3L, "a a a q r s")
    ).toDF("doc_id", "text")
    // any job fired during construction inherits this group; the capped
    // branch used to run an eager hot.count() here (round-3 verdict #3)
    spark.sparkContext.setJobGroup("graft-construct-probe", "plan construction must be lazy")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", tauBp = 9000, maxDf = 3)
    spark.sparkContext.clearJobGroup()
    val constructionJobs =
      spark.sparkContext.statusTracker.getJobIdsForGroup("graft-construct-probe")
    assert(constructionJobs.isEmpty,
      s"plan construction launched job(s): ${constructionJobs.mkString(",")}")
    // executing afterwards still yields the capped result (notice fires
    // via the observed metric at execution time)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }

  test("bucketed ANN multiprobe reaches hamming-1 neighbor buckets") {
    val dir = sf("sf0.001")
    val e = graft.util.Tables.embeddings(spark, dir)
    val qs = e.filter($"vec_id" < 20)
    val noProbe = graft.similarity.Knn.bucketed(e, qs, "vec_id", "embedding", 10, 64).count()
    val probed = graft.similarity.Knn.bucketed(e, qs, "vec_id", "embedding", 10, 64, probes = 1).count()
    assert(probed >= noProbe) // strictly more candidate coverage
  }

  test("E13: packing yields a gap-free token stream and budget-aligned bins") {
    import graft.text.Packing
    // adversarial order + many partitions: cumulative offsets must be exact
    val d = spark.range(0, 500)
      .select((($"id" * 7919) % 500).as("doc_id"), (($"id" % 7) + 1).as("n"))
      .repartition(11)
    val out = Packing.packSequences(d, "doc_id", "n", budget = 100)
      .select($"doc_id", $"n", $"start_tok", $"seq_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // start_tok is the exclusive prefix sum in doc_id order
    var cum = 0L
    out.foreach { case (_, n, start, seq) =>
      assert(start == cum, s"expected $cum got $start")
      assert(seq == start / 100)
      cum += n
    }
  }

  test("E13: packing keeps its output contract on empty input, rejects non-numeric ids") {
    import graft.text.Packing
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n")
    val out = Packing.packSequences(empty, "doc_id", "n", 100)
    assert(out.columns.toSeq == Seq("doc_id", "n", "start_tok", "seq_id"))
    assert(out.count() == 0)
    val strIds = Seq(("doc-1", 5L)).toDF("doc_id", "n")
    intercept[IllegalArgumentException] {
      Packing.packSequences(strIds, "doc_id", "n", 100)
    }
  }

  test("E21: quantile filter cuts exactly the bottom fraction per stratum, ties by id") {
    val d = (1 to 8).map(i => (i.toLong, "a", i.toLong * 10))
      .++(Seq((100L, "b", 5L), (101L, "b", 5L), (102L, "b", 5L)))
      .toDF("doc_id", "lang", "score")
    val kept = TextOps.quantileFilter(d, "lang", "score", "doc_id", 1, 4)
      .select($"doc_id").as[Long].collect().toSet
    // drops floor(n/4) per stratum: a (n=8) loses ranks 1-2 = ids 1,2;
    // b (n=3) floors to 0 dropped, all three tied rows survive
    assert(kept == Set(3L, 4L, 5L, 6L, 7L, 8L, 100L, 101L, 102L))
    // NULL scores rank LAST (SQL ASC default), never auto-dropped
    val withNull = Seq((1L, "a", Option(10L)), (2L, "a", Option(20L)),
      (3L, "a", Option(30L)), (4L, "a", Option.empty[Long]))
      .toDF("doc_id", "lang", "score")
    val keptN = TextOps.quantileFilter(withNull, "lang", "score", "doc_id", 1, 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptN == Set(2L, 3L, 4L)) // rank 1 = id 1 (lowest score) dropped
  }

  test("E21: quantile filter on a skewed stratum — partitioned windows only, exact cut") {
    // 'en' dominates 90/100 rows (the skew case round-3 verdict #4 flags):
    // the cut must stay exact AND the plan must contain no partition-less
    // window (previously the whole stratum sorted in one window task)
    val rows = (1 to 90).map(i => (i.toLong, "en", (i % 9).toLong)) ++
      (91 to 100).map(i => (i.toLong, "de", (i % 5).toLong))
    val d = rows.toDF("doc_id", "lang", "score")
    val out = TextOps.quantileFilter(d, "lang", "score", "doc_id", 1, 4)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "quantileFilter planned a partition-less (single-task) window")
    // oracle: driver-side rank over (score, id) per stratum
    val expected = rows.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._3, r._1))
      sorted.zipWithIndex.collect { case ((id, _, _), i) if (i + 1) * 4 > g.size => id }
    }.toSet
    assert(out.select($"doc_id").as[Long].collect().toSet == expected)
  }

  test("E14: repetition picks the most frequent token, smallest on ties") {
    val d = Seq((1L, "a b b c"), (2L, "x y")).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(d, "doc_id", "text")
      .select($"doc_id", $"top_tok", $"top_cnt", $"n_tokens", $"rep_bp")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, "b", 2L, 4L, 5000L), (2L, "x", 1L, 2L, 5000L)))
  }

  test("E2d: connected components label chains, singletons, and converge past one hop") {
    import graft.dedup.Dedup
    // chain 5-4-3-2-1 (needs >1 propagation round), pair (10,11), singleton 20
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (30L, 99L), (99L, 31L)).toDF("id_a", "id_b")
    val ids = (Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L, 30L, 31L)).toDF("id")
    val comp = Dedup.connectedComponents(pairs, ids)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L)
    // an endpoint absent from ids (99) still conducts: 30 and 31 merge,
    // and the conduit gets an output row (matching the SQL oracle)
    assert(comp(30L) == 30L && comp(31L) == 30L && comp(99L) == 30L)
  }

  test("E2d: components match driver-side union-find on random and path graphs") {
    import graft.dedup.Dedup
    val rnd = new scala.util.Random(12345)
    def check(edges: Seq[(Long, Long)], n: Int): Unit = {
      // oracle: union-find attaching the larger root under the smaller,
      // so each tree root IS its component's min label
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      // BOTH execution paths must match: the driver union-find fast path
      // (default limit) and the distributed star algorithm (limit 0)
      val viaDriver = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), (0L until n.toLong).toDF("id"))
        .as[(Long, Long)].collect().toMap
      assert(viaDriver == expected, s"driver CC mismatch on $n nodes / ${edges.length} edges")
      val viaStars = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), (0L until n.toLong).toDF("id"),
        driverEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      assert(viaStars == expected, s"star CC mismatch on $n nodes / ${edges.length} edges")
    }
    // random graphs around the connectivity threshold (many mid-size comps)
    for (_ <- 1 to 2) {
      val n = 60
      check(Seq.fill(55)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }, n)
    }
    // a 50-node path — the adversarial diameter case the star algorithm
    // must crush in O(log^2) rounds (plain propagation needs 50)
    check((0L until 49L).map(i => (i, i + 1)), 50)
  }

  test("E2d: both paths emit rows for endpoints absent from ids, including component roots") {
    import graft.dedup.Dedup
    // ids deliberately ⊊ endpoints: node 1 is a component ROOT (the min,
    // hence the label) that appears ONLY as a pair endpoint, node 50 is a
    // non-root conduit, and node 7 is an isolated id. The root case is the
    // one the driver union-find dropped (its parent map only gains keys
    // for merge losers); both adaptive paths must emit the identical row
    // set regardless of which one the edge count selects.
    val pairs = Seq((1L, 9L), (9L, 3L), (20L, 50L), (50L, 21L)).toDF("id_a", "id_b")
    val ids = Seq(3L, 9L, 20L, 21L, 7L).toDF("id")
    val expected = Map(
      1L -> 1L, 9L -> 1L, 3L -> 1L,   // root 1 not in ids, still labeled
      20L -> 20L, 50L -> 20L, 21L -> 20L, // conduit 50 not in ids
      7L -> 7L)
    for (lim <- Seq(1 << 20, 0)) {
      val got = Dedup.connectedComponents(pairs, ids, driverEdgeLimit = lim)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"driverEdgeLimit=$lim: row set diverged")
    }
    // property: random graphs where ids cover only a strict subset of
    // endpoints (and some components' minima are endpoint-only)
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 2) {
      val n = 40
      val edges = Seq.fill(35)((rnd.nextLong(n), rnd.nextLong(n)))
        .filter { case (a, b) => a != b }
      // drop all ids < 10 — any component whose min is < 10 has an
      // endpoint-only root; keep a couple of isolated ids too
      val ids2 = (10L until n.toLong).toDF("id")
      val viaDriver = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), ids2).as[(Long, Long)].collect().toMap
      val viaStars = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), ids2, driverEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      assert(viaDriver == viaStars,
        s"trial $trial: adaptive paths disagree when ids ⊊ endpoints")
    }
  }

  test("E2d-inc: incremental equals full recompute on random edge splits (property)") {
    // any partition of a random graph's edges into (old, new) must give
    // the same labels whether merged incrementally through the star
    // summary or computed in one shot — including multi-batch chains
    val rnd = new scala.util.Random(98765)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(45)((rnd.nextLong(n), rnd.nextLong(n)))
        .filter { case (a, b) => a != b }
      val ids = (0L until n.toLong)
      val cut = rnd.nextInt(edges.length + 1)
      val (oldE, newE) = edges.splitAt(cut)
      val oldIds = ids.filter(_ < n / 2)
      val newIds = ids.filter(_ >= n / 2)
      // note: old edges may touch "new" ids — connectedComponents conducts
      // through endpoints absent from ids, so the split is safe
      // alternate paths per trial: driver union-find and distributed stars
      val lim = if (trial % 2 == 0) 0 else 1 << 20
      val labels0 = Dedup.connectedComponents(
        oldE.toDF("id_a", "id_b"), oldIds.toDF("id"), driverEdgeLimit = lim)
      val inc = Dedup.incrementalComponents(
        labels0, newE.toDF("id_a", "id_b"), newIds.toDF("id"), driverEdgeLimit = lim)
        .as[(Long, Long)].collect().toMap
      val full = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), ids.toDF("id"))
        .as[(Long, Long)].collect().toMap
      assert(inc == full, s"trial $trial (cut=$cut, lim=$lim): incremental diverged from full")
    }
  }

  test("E2d-inc: the iterative merge is batch-bounded — untouched components never materialize") {
    // 1000 two-node components; one new pair touches exactly ONE of them
    // (and one brand-new doc). The iterative loop's old-side input must be
    // that single component's star edges — not the other 999's.
    val labels = (0L until 1000L).flatMap(c =>
      Seq((2 * c, 2 * c), (2 * c + 1, 2 * c))).toDF("id", "comp")
    val newPairs = Seq((5000L, 41L)).toDF("id_a", "id_b") // touches comp 40 only
    val probes = Seq(5000L, 41L).toDF("id") // endpoints ∪ (new id 5000)
    val (starEdges, touchedIds, untouched) =
      graft.dedup.Dedup.touchedSubgraph(labels, probes)
    assert(starEdges.as[(Long, Long)].collect().toSet == Set((41L, 40L)),
      "exactly the touched component's star edges enter the loop")
    assert(touchedIds.as[Long].collect().toSet == Set(40L, 41L))
    assert(untouched.count() == 1998L, "the other 999 components pass through")
    // the split is also a broadcast-only plan: no exchange on the labels
    // side of either semi/anti probe (the corpus-sized input)
    val plans = Seq(starEdges, untouched).map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"touched-split must probe via broadcast:\n$p")
    }
    // and end-to-end the labeling equals a full recompute
    val inc = Dedup.incrementalComponents(
      labels, newPairs, Seq(5000L).toDF("id")).as[(Long, Long)].collect().toMap
    assert(inc(5000L) == 40L && inc(41L) == 40L && inc(40L) == 40L)
    assert(inc.size == 2001 && inc(999L * 2) == 1998L)
  }

  test("E2d-inc: incremental components equal a full recompute, including cross-component merges") {
    // old graph: {1-2} {3-4} {5} → labels; new batch doc 10 bridges the
    // two existing COMPONENTS (1-2 and 3-4 must merge through it), doc 11
    // attaches to 5, doc 12 is isolated
    val oldPairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val oldIds = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val labels0 = Dedup.connectedComponents(oldPairs, oldIds)
    val newPairs = Seq((10L, 2L), (10L, 4L), (11L, 5L)).toDF("id_a", "id_b")
    val newIds = Seq(10L, 11L, 12L).toDF("id")
    val inc = Dedup.incrementalComponents(labels0, newPairs, newIds)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(
      oldPairs.unionByName(newPairs), oldIds.unionByName(newIds))
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 1L,
      5L -> 5L, 11L -> 5L, 12L -> 12L),
      "doc 10 must merge components {1,2} and {3,4} into one")
  }

  test("E2d-inc: a re-passed already-labeled id keeps its label, one row per id") {
    // regression: newIds contains id 4, already labeled in component 3,
    // which no new pair touches. The batch-bounded merge must NOT emit
    // both the untouched (4,3) row and a relabeled (4,4) singleton.
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("id", "comp")
    val newPairs = Seq((10L, 1L)).toDF("id_a", "id_b")
    val newIds = Seq(10L, 4L).toDF("id")
    val rows = Dedup.incrementalComponents(labels, newPairs, newIds)
      .as[(Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq(1L, 2L, 3L, 4L, 10L), "exactly one row per id")
    assert(rows.toMap == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 10L -> 1L))
  }

  test("E15: decontamination flags shingle overlap with the benchmark, zero rows kept") {
    import graft.dedup.Decontaminate
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown" trigram
      (2L, "completely different words here")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown cat")).toDF("doc_id", "text")
    val r = Decontaminate.overlap(corpus, bench, "doc_id", "text")
      .select($"doc_id", $"n_overlap", $"contaminated")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 1L, true), (2L, 0L, false)))
  }

  test("E22: dup-ngram share counts repeated shingles within a doc") {
    val d = Seq(
      (1L, "a b c a b c a b c"), // shingles: abc bca cab abc bca cab abc -> 7 total, 3 distinct
      (2L, "x y z w")).toDF("doc_id", "text") // 2 shingles, both distinct
    val r = TextOps.dupNgramStats(d, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 7L, 3L, 5714L), (2L, 2L, 2L, 0L)))
  }

  test("E24: token-budget sampler keeps the deterministic hash-order prefix per stratum") {
    val docs = (1L to 20L).map(i => (i, if (i <= 10) "en" else "de", 100L))
      .toDF("doc_id", "lang", "n_tokens")
    // budget 0 keeps nothing; huge budget keeps everything
    assert(TextOps.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens",
      Map.empty, 0L).count() == 0)
    assert(TextOps.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens",
      Map.empty, 1000000L).count() == 20)
    // budget 250 per stratum: exactly 3 docs of 100 tokens each (the doc
    // crossing the line is kept — budgets are floors)
    val kept = TextOps.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens",
      Map.empty, 250L)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 3L, "de" -> 3L))
    // deterministic: same pick on re-run, and per-lang budgets bind
    val again = TextOps.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens",
      Map("en" -> 100L), 250L)
    assert(again.filter($"lang" === "en").count() == 1)
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      TextOps.tokenBudgetSample(docs, "doc_id", "lang", "n_tokens", Map.empty, 250L)
        .select("doc_id").as[Long].collect().toSet)
  }

  test("E43: source cap bounds each source at k docs, deterministic draw, native heap plan") {
    val docs = (1L to 30L).map(i => (i, if (i <= 20) "big.com" else "small.org"))
      .toDF("doc_id", "source")
    val kept = TextOps.sourceCap(docs, "doc_id", "source", 5)
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("big.com" -> 5L, "small.org" -> 5L))
    // under-cap sources survive whole
    val loose = TextOps.sourceCap(docs, "doc_id", "source", 25)
    assert(loose.filter($"source" === "small.org").count() == 10)
    // deterministic: identical survivor set on re-run
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      TextOps.sourceCap(docs, "doc_id", "source", 5)
        .select("doc_id").as[Long].collect().toSet)
    // the scale contract: the native bounded-heap operator, not a window
    val p = kept.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("TopKPerGroup") && !p.contains("Window"),
      s"sourceCap must run on the native top-k plan:\n$p")
  }

  test("E25: segment dedup keeps first occurrence corpus-wide and reassembles") {
    import graft.dedup.Dedup
    val d = Seq(
      (1L, "a b c d"),  // segs(2): "a b", "c d"
      (2L, "a b x y"),  // "a b" dup -> dropped; "x y" kept
      (3L, "c d a b")). // both dup -> empty doc
      toDF("doc_id", "text")
    val r = Dedup.dedupSegments(d, "doc_id", "text", segTokens = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 2L, 0L, "")))
  }

  test("E28: overlapping chunks cover every token, clip the tail, one window for short docs") {
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val r = TextOps.chunkOverlap(d, "doc_id", "text", sizeTok = 4, stride = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(x => (x._1, x._2)).toSeq
    assert(r == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L), (1L, 1L, "t3 t4 t5 t6", 4L),
      (1L, 2L, "t5 t6 t7 t8", 4L), (1L, 3L, "t7 t8 t9 t10", 4L),
      (2L, 0L, "a b", 2L)))
  }

  test("E25: segment dedup invariants hold on random corpora") {
    import graft.dedup.Dedup
    val rnd = new scala.util.Random(777)
    // small vocab + repeated phrases → plenty of cross-doc segment dups
    val vocab = Vector("red", "blue", "green", "gold")
    val docs = (1L to 30L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val r = Dedup.dedupSegments(df, "doc_id", "text", segTokens = 3)
      .as[(Long, Long, Long, String)].collect()
    val original = docs.toMap
    assert(r.length == docs.length) // every doc reports, even fully-deduped
    // (a) clean text = the doc's own kept segments in order → its token
    // stream is a subsequence of the original's
    r.foreach { case (id, nSeg, nKept, clean) =>
      assert(nKept <= nSeg)
      val toks = original(id).split(" ").toSeq
      val keptToks = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
      var idx = 0
      keptToks.foreach { t =>
        idx = toks.indexOf(t, idx)
        assert(idx >= 0, s"doc $id: kept token '$t' breaks subsequence order")
        idx += 1
      }
    }
    // (b) the kept segments are globally unique: re-running dedup on the
    // cleaned corpus drops nothing
    val cleaned = r.toSeq.filter(_._4.nonEmpty).map(x => (x._1, x._4)).toDF("doc_id", "text")
    val again = Dedup.dedupSegments(cleaned, "doc_id", "text", segTokens = 3)
      .as[(Long, Long, Long, String)].collect()
    // note: reassembly can create NEW cross-boundary segments when a doc
    // lost interior segments, so compare on docs whose text was UNCHANGED
    val unchanged = r.filter { case (id, nSeg, nKept, clean) =>
      nSeg == nKept && clean == original(id)
    }.map(_._1).toSet
    again.filter(x => unchanged.contains(x._1)).foreach { case (id, nSeg, nKept, _) =>
      assert(nSeg == nKept, s"doc $id lost segments on an idempotent re-run")
    }
  }

  test("E29: top terms rank by tf then rarity then token, integer score") {
    val d = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana common common")).toDF("doc_id", "text")
    // df: apple=1, banana=2, common=2
    val r = TextOps.topTerms(d, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(r == Set(
      (1L, "apple", 2L, 1L, 20000L, 1L),  // tf 2, rarest
      (1L, "banana", 1L, 2L, 5000L, 2L),  // tf-tie with common broken by... df tie too, token order
      (2L, "common", 2L, 2L, 10000L, 1L),
      (2L, "banana", 1L, 2L, 5000L, 2L)))
  }

  test("E26: ngram top-k ranks continuations by count with deterministic ties") {
    val d = Seq((1L, "a b c a b c"), (2L, "a b d")).toDF("doc_id", "text")
    // trigrams: (a b->c)x2 [doc1], (b c->a), (c a->b), (a b->d)
    val r = TextOps.ngramTopK(d, "text", k = 3)
      .as[(String, String, Long, Long)].collect().toSet
    assert(r == Set(
      ("a b", "c", 2L, 1L), ("a b", "d", 1L, 2L),
      ("b c", "a", 1L, 1L), ("c a", "b", 1L, 1L)))
  }

  test("E30: PII redaction scrubs emails/IPs/phones with audit counts") {
    val d = Seq(
      (1L, "mail me at jo.doe+x@some-host.io or jo@b.co today"),
      (2L, "server 10.0.0.1 talks to 192.168.255.3"),
      (3L, "call +1 555-123-4567 maybe"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val r = TextOps.redactPii(d, "doc_id", "text")
      .select($"doc_id", $"clean_text", $"n_email", $"n_ip", $"n_phone")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, "mail me at <EMAIL> or <EMAIL> today", 2L, 0L, 0L)))
    assert(r(1) == ((2L, "server <IP> talks to <IP>", 0L, 2L, 0L)))
    assert(r(2)._2 == "call <PHONE> maybe" && r(2)._5 == 1L)
    assert(r(3) == ((4L, "nothing sensitive here", 0L, 0L, 0L)))
  }

  test("E31: novelty = share of shingles unique to the doc corpus-wide") {
    val d = Seq(
      (1L, "a b c d e"),   // shares 'a b c'..'c d e' with doc 2
      (2L, "a b c d e"),   // identical: zero novel
      (3L, "p q r s t")).toDF("doc_id", "text") // fully novel
    val r = TextOps.noveltyStats(d, "doc_id", "text")
      .select($"doc_id", $"n_shingles", $"n_novel", $"novel_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 3L, 0L, 0L)))
    assert(r(1) == ((2L, 3L, 0L, 0L)))
    assert(r(2) == ((3L, 3L, 3L, 10000L)))
  }

  test("quality ratios floor to basis points") {
    val bp = Seq(("abcde12345", 10L)).toDF("t", "n")
      .select(TextOps.bp(lit(5L), lit(10L))).as[Long].head()
    assert(bp == 5000L)
    assert(Seq(1).toDF("x").select(TextOps.bp(lit(1L), lit(3L))).as[Long].head() == 3333L)
  }

  test("E2d-canon: canonicalPerComponent keeps the best doc, ties to min id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 8L), (9L, 8L))
      .toDF("id", "comp")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L), (8L, 4L), (9L, 4L))
      .toDF("id", "q")
    val out = Dedup.canonicalPerComponent(labels, quality)
      .select("id", "comp", "canonical_id", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // comp 1: max q=9 shared by {2,3} → 2 wins the tie; comp 7 singleton
    // keeps itself; comp 8: tie at q=4 between {8,9} → 8
    assert(out == Set(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (7L, 7L, 7L, true),
      (8L, 8L, 8L, true), (9L, 8L, 8L, false)))
  }

  test("E38c: containment verdict keeps the SUPERSET — longer doc wins even with a larger id, length ties to min id") {
    // excerpt (short, SMALL id) embedded in a superset (long, LARGE id):
    // a min-id policy would keep the excerpt; the length-quality argmax
    // must keep the superset. Second cluster: equal lengths → smallest id.
    val body = ("the quick brown fox jumps over the lazy dog and keeps running " * 8)
    val docs = Seq(
      (1L, body.take(120)),          // excerpt, id smaller
      (50L, body),                   // superset, id larger — must win
      (60L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (61L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")) // identical → tie on length → 60
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", 8000L)
    val labels = Dedup.connectedComponents(
      pairs.select("id_a", "id_b"), docs.select($"doc_id".as("id")))
    val m = Dedup.canonicalPerComponent(
        labels, docs.select($"doc_id".as("id"), length($"text").cast("long").as("q")))
      .select("id", "canonical_id", "keep")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, c, k) => id -> ((c, k)) }.toMap
    assert(m(1L) == ((50L, false)), s"excerpt must drop: $m")
    assert(m(50L) == ((50L, true)), s"superset must survive: $m")
    assert(m(60L) == ((60L, true)) && m(61L) == ((60L, false)), s"tie to min id: $m")
  }

  test("E2d-canon: exactly one keeper per component, always a member") {
    val rnd = new scala.util.Random(7)
    val ids = (1L to 60L)
    val labels = ids.map(i => (i, i % 9)).toSeq.toDF("id", "comp")
    val quality = ids.map(i => (i, rnd.nextInt(5).toLong)).toSeq.toDF("id", "q")
    val rows = Dedup.canonicalPerComponent(labels, quality)
      .select("id", "comp", "canonical_id", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.length == 60)
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.count(_._4) == 1)
      val canon = members.map(_._3).distinct
      assert(canon.length == 1 && members.exists(m => m._1 == canon.head && m._4))
    }
  }

  test("E2c-lp: leak-proof split never separates a near-dup pair; doc-hash split does") {
    import org.apache.spark.sql.functions._
    val lp = SparkEntry.queries("data_split_leakproof")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // clusters are split-atomic by construction AND by observation
    lp.values.groupBy(_._1).foreach { case (_, members) =>
      assert(members.map(_._2).toSet.size == 1, "a cluster straddles splits")
    }
    // the leak the operator exists to prevent is REAL on this corpus:
    // the plain doc-hash split separates at least one near-dup pair
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(
      TextEntries.docsNear(spark, sf("sf0.001")), // the query's corpus
      "doc_id", "text", TextEntries.Tau)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    def docBucket(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex.take(8), 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    assert(pairs.exists { case (a, b) => docBucket(a) != docBucket(b) },
      "fixture should contain a pair the naive split separates")
    // and every one of those pairs is co-located by the leak-proof split
    pairs.foreach { case (a, b) => assert(lp(a)._2 == lp(b)._2) }
  }

  test("E59 property: prefix filtering equals exact all-pairs across random corpora and taus") {
    import spark.implicits._
    val rnd = new scala.util.Random(593317L)
    for (trial <- 1 to 3) {
      // small vocab so real overlaps occur; doc lengths straddle the
      // whole-doc-shingle fallback (n < w) and normal shingling
      val docs = (1L to 40L).map { i =>
        val n = 2 + rnd.nextInt(20)
        (i, (0 until n).map(_ => "w" + rnd.nextInt(25)).mkString(" "))
      }.toDF("doc_id", "text")
      for (tau <- Seq(2000L, 5000L, 8000L, 10000L)) {
        val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", tau,
            maxDf = Long.MaxValue)
          .collect().map(_.toSeq).toSet
        val pre = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", tau)
          .collect().map(_.toSeq).toSet
        assert(pre === exact, s"trial $trial tau=$tau")
      }
    }
  }

  test("E59 regression: positional bound must use matched ranks, not prefix lengths") {
    import spark.implicits._
    // A's 4 shingles are all shared (df=2); B adds 4 df=1 boundary
    // shingles that are globally RARER, pushing the shared ones deep
    // into B's suffix. The qualifying pair (J = 4/9... = 0.5 ≥ 0.35) has
    // cp = 2 prefix-prefix matches, and the prefix-LENGTH bound
    // cp + min(n_a−p_a, n_b−p_b) = 2 + min(1, 2) = 3 < α = 4 pruned it;
    // the matched-rank bound 2 + min(4−2, 8−6) = 4 keeps it.
    val a = "x1 x2 x3 x4 x5 x6"
    val b = a + " y1 y2 y3 y4"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pre = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3500L)
      .collect().map(_.toSeq).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3500L,
        maxDf = Long.MaxValue)
      .collect().map(_.toSeq).toSet
    assert(exact.size === 1, "fixture must contain exactly the engineered pair")
    assert(exact.head(2) === 4L, "common") // 4 shared shingles
    assert(pre === exact)
  }

  test("E59: prefix answer on the real corpus is the exact all-pairs answer") {
    val real = TextEntries.docsNear(spark, sf("sf0.001"))
    val exact = Dedup.ngramJaccardPairs(real, "doc_id", "text", 6000L,
        maxDf = Long.MaxValue)
      .collect().map(_.toSeq).toSet
    val pre = Dedup.ngramJaccardPairsPrefix(real, "doc_id", "text", 6000L)
      .collect().map(_.toSeq).toSet
    assert(pre === exact)
    assert(pre.nonEmpty)
  }
}
