package graft

import graft.multimodal.Media
import graft.similarity.{Knn, VectorOps}
import graft.util.Tables
import org.apache.spark.sql.functions._

/** ANN recall vs brute force + multimodal pipeline shape (E6, E7, E12). */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("E39: SQ8 codes are the exact integer affine quantization; degenerate dims and clamps") {
    // milli-units after VectorOps.quantize: dim0 [0,2000], dim1 [1000,1000]
    // (degenerate), dim2 [0,5000]
    val df = Seq(
      (1L, Array(0.0f, 1.0f, 5.0f)),
      (2L, Array(1.0f, 1.0f, 2.5f)),
      (3L, Array(2.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val (mn, mx) = Knn.sqBounds(Knn.sqTrain(df, "embedding"), 3)
    assert(mn.toSeq == Seq(0L, 1000L, 0L) && mx.toSeq == Seq(2000L, 1000L, 5000L))
    val codes = Knn.sqEncode(df, "vec_id", "embedding", mn, mx)
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes(1L) == Seq(0L, 0L, 255L), "corpus min codes 0, max codes 255")
    assert(codes(2L) == Seq(127L, 0L, 127L), "midpoints floor-divide exactly")
    assert(codes(3L) == Seq(255L, 0L, 0L))
    // an out-of-corpus vector clamps into the trained range (standard SQ)
    val out = Knn.sqEncode(
        Seq((9L, Array(-1.0f, 7.0f, 9.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", mn, mx)
      .as[(Long, Seq[Long])].collect().head._2
    assert(out == Seq(0L, 0L, 255L))
  }

  test("E44: semanticDedup drops lower-priority within-cluster dups, keeps cross-cluster ones") {
    // two well-separated clusters on orthogonal axes; centroids from a
    // labeled seed set. 1,2 near-identical (same cluster → 2 dropped);
    // 3 is cluster A but far from 1 (survives); 10,11 identical in
    // cluster B (11 dropped). Cross-cluster similarity never compares.
    val seed = Seq(
      (100L, Array(1.0f, 0.0f), 0),
      (101L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val cents = Knn.centroidSums(seed, "label", "embedding", 2)
    val corpus = Seq(
      (1L, Array(1.0f, 0.10f)),
      (2L, Array(1.0f, 0.11f)),   // cos(1,2) ≈ 1 → dropped (id 1 wins)
      (3L, Array(1.0f, -0.9f)),   // same cluster as 1, dissimilar → kept
      (10L, Array(0.1f, 1.0f)),
      (11L, Array(0.1f, 1.0f))).toDF("vec_id", "embedding") // exact dup → 11 dropped
    val out = Knn.semanticDedup(corpus, cents, "vec_id", "embedding", 9500L, 2)
      .as[(Long, Int)].collect().toMap
    assert(out.keySet == Set(1L, 3L, 10L))
    assert(out(1L) == 0 && out(3L) == 0 && out(10L) == 1)
  }

  test("E45: PQ train/encode — codebook shape, deterministic codes, exact reconstruction on separated data") {
    import graft.similarity.Pq
    // two tight groups per subspace half: codebook must place a centroid
    // on each, and codes must be identical for identical vectors
    val corpus = (0L until 16L).map { i =>
      val hi = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(hi, hi, hi * 2, hi * 2))
    }.toDF("vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, ksub = 2, iters = 2, dims = 4)
    assert(cb.count() <= 4 && cb.select("sub").distinct().count() == 2)
    val codes = Pq.encode(corpus, cb, "vec_id", "embedding", m = 2, dims = 4)
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes.values.forall(_.length == 2))
    // identical vectors → identical codes; the two groups get distinct codes
    assert(codes(0L) == codes(2L) && codes(1L) == codes(3L))
    assert(codes(0L) != codes(1L))
    // determinism across re-runs (hash init, integer math)
    val again = Pq.encode(corpus,
        Pq.train(corpus, "vec_id", "embedding", 2, 2, 2, 4),
        "vec_id", "embedding", 2, 4)
      .as[(Long, Seq[Long])].collect().toMap
    assert(again == codes)
  }

  test("E45: ADC distance equals the exact table-sum and ranks separated groups correctly") {
    import graft.similarity.Pq
    val corpus = (0L until 16L).map { i =>
      val hi = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(hi, hi, hi * 2, hi * 2))
    }.toDF("vec_id", "embedding")
    val cb = Pq.train(corpus, "vec_id", "embedding", 2, 2, 2, 4)
    val codes = Pq.encode(corpus, cb, "vec_id", "embedding", 2, 4)
    val qs = corpus.filter($"vec_id" === 0L)
    val got = Pq.adcSearch(codes, cb, qs, "vec_id", "embedding", k = 15, m = 2, dims = 4)
      .select($"neighbor_id", $"adc_dist").as[(Long, Long)].collect().toMap
    // same-group members (even ids) sit on their centroid: ADC distance 0;
    // other-group members are 4 dims of 2.0 resp 4.0 milli-gap away
    (2L until 16L by 2).foreach(i => assert(got(i) == 0L, s"even $i"))
    (1L until 16L by 2).foreach(i =>
      assert(got(i) == 2L * 2000L * 2000L + 2L * 4000L * 4000L, s"odd $i"))
    // the recall gate's truth leg agrees on the grouping
    val l2 = Pq.bruteForceL2(corpus, qs, "vec_id", "embedding", 15)
      .select($"neighbor_id", $"l2_dist").as[(Long, Long)].collect().toMap
    (2L until 16L by 2).foreach(i => assert(l2(i) == 0L))
  }

  test("E45b: IVF+PQ hits are a subset of the unpruned ADC search with identical distances") {
    import graft.similarity.Pq
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val cb = Pq.train(e, "vec_id", "embedding", 4, 8, 2, 64)
    val codes = Pq.encode(e, cb, "vec_id", "embedding", 4, 64)
    val qs = e.filter($"vec_id" < 3)
    val full = Pq.adcSearch(codes, cb, qs, "vec_id", "embedding", 60, 4, 64)
      .select($"query_id", $"neighbor_id", $"adc_dist")
      .as[(Long, Long, Long)].collect().map { case (q, n, d) => (q, n) -> d }.toMap
    val coarse = Knn.centroidSums(e, "label", "embedding", 64)
    val corpus = codes.join(
      Knn.ivfAssign(e, coarse, "vec_id", "embedding", 64)
        .withColumnRenamed("vec_id", "vid"), "vid")
    val pruned = Pq.ivfAdcSearch(corpus, coarse, cb, qs,
      "vec_id", "embedding", 10, 4, 64, 2)
      .select($"query_id", $"neighbor_id", $"adc_dist")
      .as[(Long, Long, Long)].collect()
    assert(pruned.nonEmpty)
    pruned.foreach { case (q, n, d) =>
      assert(full.get((q, n)).contains(d),
        s"ivfpq pair ($q,$n)=$d but full ADC says ${full.get((q, n))}")
    }
  }

  test("E45d: with an exact residual codebook, residual IVFADC returns EXACT L2 distances") {
    import graft.similarity.Pq
    // two coarse clusters at ±10, each with two ±1 patterns (2 copies
    // each, so centroids are exact). Residuals collapse to the SAME two
    // points per subspace in every cluster — a ksub=2 codebook represents
    // them perfectly, so ADC distance = true L2 for every candidate
    // (raw-space PQ with the same budget cannot: 4 distinct raw values
    // per subspace into 2 centroids). The Jégou residual argument as an
    // exact identity instead of a statistical claim.
    val corpus = Seq(
      (1L, 11.0f, 0), (2L, 11.0f, 0), (3L, 9.0f, 0), (4L, 9.0f, 0),
      (5L, -9.0f, 1), (6L, -9.0f, 1), (7L, -11.0f, 1), (8L, -11.0f, 1))
      .map { case (id, v, lab) => (id, Array(v, v, v, v), lab) }
      .toDF("vec_id", "embedding", "label")
    val coarse = Knn.centroidSums(corpus, "label", "embedding", 4)
    val resid = Pq.residuals(corpus, coarse, "vec_id", "embedding", 4)
    // residuals are exactly ±1000 milli on every dim
    val rqs = resid.select($"vid", $"rq").as[(Long, Seq[Long])].collect().toMap
    assert(rqs(1L) == Seq(1000L, 1000L, 1000L, 1000L) &&
      rqs(7L) == Seq(-1000L, -1000L, -1000L, -1000L), rqs.toString)
    val cb = Seq(
      (0, 0L, 2L, 1000L, 1000L), (0, 1L, 2L, -1000L, -1000L),
      (1, 0L, 2L, 1000L, 1000L), (1, 1L, 2L, -1000L, -1000L))
      .toDF("sub", "cluster", "n", "c_0", "c_1")
    val codes = Pq.encodeQ(resid, cb, "vid", $"rq", m = 2, dims = 4)
    val idx = codes.join(resid.select($"vid", $"cluster"), "vid")
    val qs = corpus.filter($"vec_id" === 1L)
    val got = Pq.ivfAdcSearchResidual(idx, coarse, cb, qs,
      "vec_id", "embedding", k = 10, m = 2, dims = 4, nprobe = 2)
      .select($"neighbor_id", $"adc_dist").as[(Long, Long)].collect().toMap
    val exact = Pq.bruteForceL2(corpus, qs, "vec_id", "embedding", 10)
      .select($"neighbor_id", $"l2_dist").as[(Long, Long)].collect().toMap
    assert(got == exact, s"adc=$got l2=$exact")
    assert(got(2L) == 0L && got(3L) == 4L * 2000L * 2000L &&
      got(5L) == 4L * 20000L * 20000L && got(7L) == 4L * 22000L * 22000L)
    // the trained path is deterministic across re-runs
    val t1 = Pq.encodeQ(resid, Pq.trainQ(resid, "vid", $"rq", 2, 2, 3, 4),
      "vid", $"rq", 2, 4).as[(Long, Seq[Long])].collect().toMap
    val t2 = Pq.encodeQ(resid, Pq.trainQ(resid, "vid", $"rq", 2, 2, 3, 4),
      "vid", $"rq", 2, 4).as[(Long, Seq[Long])].collect().toMap
    assert(t1 == t2)
  }

  test("E7: bucketed ANN results are a subset of brute-force with identical scores") {
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter($"vec_id" < 20)
    val brute = Knn.bruteForce(e, qs, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"cos_bp")
      .as[(Long, Long, Long)].collect().map { case (q, n, c) => (q, n) -> c }.toMap
    val approx = Knn.bucketed(e, qs, "vec_id", "embedding", 10, 64)
      .select($"query_id", $"neighbor_id", $"cos_bp")
      .as[(Long, Long, Long)].collect()
    // every approx hit must carry the exact same cosine the brute path computed
    approx.foreach { case (q, n, c) =>
      assert(brute.get((q, n)).forall(_ == c),
        s"bucketed pair ($q,$n) scored $c but brute says ${brute.get((q, n))}")
    }
  }

  test("E7d: IVF search scores match brute force on shared hits; nprobe=K recovers brute top-k") {
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter($"vec_id" < 5)
    val cents = Knn.centroidSums(e, "label", "embedding", 64)
    val brute = Knn.bruteForce(e, qs, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"cos_bp")
      .as[(Long, Long, Long)].collect().map { case (q, n, c) => (q, n) -> c }.toMap
    val ivf = Knn.ivfSearch(e, cents, qs, "vec_id", "embedding", 10, 64, nprobe = 3)
      .select($"query_id", $"neighbor_id", $"cos_bp")
      .as[(Long, Long, Long)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, n, c) =>
      assert(brute.get((q, n)).forall(_ == c),
        s"ivf pair ($q,$n) scored $c but brute says ${brute.get((q, n))}")
    }
    // probing every cluster makes IVF exhaustive: exact brute-force top-k
    val nClusters = cents.count().toInt
    val full = Knn.ivfSearch(e, cents, qs, "vec_id", "embedding", 10, 64, nprobe = nClusters)
      .select($"query_id", $"neighbor_id", $"cos_bp")
      .as[(Long, Long, Long)].collect().map { case (q, n, c) => (q, n) -> c }.toMap
    assert(full == brute)
  }

  test("E7f: ivfTrain objective is monotone over rounds and beats the init; recall holds") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val k = 8
    // Lloyd guarantee: the objective (sum of min scaled distances) is
    // non-increasing round over round — pinned across 0..3 rounds
    val objs = (0 to 3).map { t =>
      Knn.ivfObjective(e,
        Knn.ivfTrain(e, "vec_id", "embedding", k, t, 64),
        "vec_id", "embedding", 64)
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"objective must not increase: $objs")
    }
    assert(objs.last < objs.head, s"training must improve on the hash init: $objs")
    // serving quality with the TRAINED quantizer, against brute-force
    // ground truth. Recall at a FIXED nprobe is not theoretically
    // monotone in training rounds (tighter clusters can concentrate a
    // query's neighbors differently), so the pinned invariants are the
    // ones Lloyd/IVF actually guarantee: recall is monotone in nprobe,
    // and probing every cluster recovers brute force exactly.
    val qs = e.filter(col("vec_id") < 5)
    val truth = Knn.bruteForce(e, qs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val trained = Knn.ivfTrain(e, "vec_id", "embedding", k, 2, 64)
    def recall(nprobe: Int): Double = {
      val got = Knn.ivfSearch(e, trained, qs, "vec_id", "embedding", 10, 64, nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    assert(r3 >= r1 - 1e-9, s"recall must be monotone in nprobe: $r1 -> $r3")
    assert(r3 > 0.0, "trained IVF must recover some true neighbors")
    val nClusters = trained.count().toInt
    assert(recall(nClusters) == 1.0, "probing every trained cluster must equal brute force")
  }

  test("E7e: persisted IVF index serves identical results and prunes to probed clusters") {
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter($"vec_id" < 5)
    val cents = Knn.centroidSums(e, "label", "embedding", 64)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Knn.ivfWriteIndex(e, cents, "vec_id", "embedding", 64, idx)
    val served = Knn.ivfSearchIndex(spark, idx, cents, qs, "vec_id", "embedding", 10, 64, 3)
    val inline = Knn.ivfSearch(e, cents, qs, "vec_id", "embedding", 10, 64, 3)
    assert(served.collect().toSet == inline.collect().toSet)
    // the index scan must carry a DYNAMIC cluster partition filter: only
    // the probed clusters' directories are read
    val pf = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("dynamicpruningexpression(cluster"),
      s"index scan should dynamically prune by cluster partition, got: $pf")
  }

  test("E7e: ivfAppendIndex serves appended vectors identically to a full rebuild") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val base = e.filter(col("vec_id") % 7 =!= 0)
    val batch = e.filter(col("vec_id") % 7 === 0)
    val cents = Knn.centroidSums(e, "label", "embedding", 64)
    val qs = e.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    Knn.ivfWriteIndex(base, cents, "vec_id", "embedding", 64, idx)
    Knn.ivfAppendIndex(batch, cents, "vec_id", "embedding", 64, idx)
    val served = Knn.ivfSearchIndex(spark, idx, cents, qs, "vec_id", "embedding", 10, 64, 3)
      .collect().map(_.toSeq).toSet
    // oracle: the index rebuilt from scratch over the full corpus
    val full = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString
    Knn.ivfWriteIndex(e, cents, "vec_id", "embedding", 64, full)
    val rebuilt = Knn.ivfSearchIndex(spark, full, cents, qs, "vec_id", "embedding", 10, 64, 3)
      .collect().map(_.toSeq).toSet
    assert(served == rebuilt, "appended index must answer like a full rebuild")
    assert(served.nonEmpty)
    // re-appending the same batch must refuse: duplicated vectors would
    // compete in every probed top-k
    val clash = intercept[IllegalArgumentException] {
      Knn.ivfAppendIndex(batch, cents, "vec_id", "embedding", 64, idx)
    }
    assert(clash.getMessage.contains("already present"))
  }

  test("E45c: persisted IVF+PQ index — served ≡ inline, DPP prune, append ≡ rebuild, dup refusal") {
    import graft.similarity.Pq
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val qs = e.filter($"vec_id" < 5)
    val coarse = Knn.centroidSums(e, "label", "embedding", 64)
    val cb = Pq.train(e, "vec_id", "embedding", 4, 8, 2, 64)
    val idx = java.nio.file.Files.createTempDirectory("graft-pq-idx").toString
    Pq.writeIndex(e, coarse, cb, "vec_id", "embedding", 4, 64, idx)
    val served = Pq.searchIndex(spark, idx, coarse, cb, qs,
      "vec_id", "embedding", 10, 4, 64, 3)
    val inline = {
      val corpus = Pq.encode(e, cb, "vec_id", "embedding", 4, 64)
        .join(Knn.ivfAssign(e, coarse, "vec_id", "embedding", 64)
          .withColumnRenamed("vec_id", "vid"), "vid")
      Pq.ivfAdcSearch(corpus, coarse, cb, qs, "vec_id", "embedding", 10, 4, 64, 3)
    }
    assert(served.collect().toSet == inline.collect().toSet)
    // code scan must carry the dynamic cluster partition filter
    val pf = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("dynamicpruningexpression(cluster"),
      s"PQ index scan should dynamically prune by cluster partition, got: $pf")
    // append ≡ rebuild, duplicate refusal
    val base = e.filter($"vec_id" % 7 =!= 0)
    val batch = e.filter($"vec_id" % 7 === 0)
    val idx2 = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    Pq.writeIndex(base, coarse, cb, "vec_id", "embedding", 4, 64, idx2)
    Pq.appendIndex(batch, coarse, cb, "vec_id", "embedding", 4, 64, idx2)
    val appended = Pq.searchIndex(spark, idx2, coarse, cb, qs,
      "vec_id", "embedding", 10, 4, 64, 3).collect().map(_.toSeq).toSet
    assert(appended == served.collect().map(_.toSeq).toSet,
      "appended PQ index must answer like the full build")
    val clash = intercept[IllegalArgumentException] {
      Pq.appendIndex(batch, coarse, cb, "vec_id", "embedding", 4, 64, idx2)
    }
    assert(clash.getMessage.contains("already present"))
  }

  test("E45d: the persisted residual index serves identically with cluster DPP") {
    import graft.similarity.Pq
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val qs = e.filter($"vec_id" < 5)
    val coarse = Knn.centroidSums(e, "label", "embedding", 64)
    val resid = Pq.residuals(e, coarse, "vec_id", "embedding", 64).localCheckpoint()
    val cb = Pq.trainQ(resid, "vid", $"rq", 4, 8, 2, 64)
    val idx = java.nio.file.Files.createTempDirectory("graft-pqr-idx").toString
    Pq.writeIndexResidual(e, coarse, cb, "vec_id", "embedding", 4, 64, idx)
    val served = Pq.searchIndexResidual(spark, idx, coarse, cb, qs,
      "vec_id", "embedding", 10, 4, 64, 3)
    val inline = {
      val corpus = Pq.encodeQ(resid, cb, "vid", $"rq", 4, 64)
        .join(resid.select($"vid", $"cluster"), "vid")
      Pq.ivfAdcSearchResidual(corpus, coarse, cb, qs, "vec_id", "embedding", 10, 4, 64, 3)
    }
    assert(served.collect().toSet == inline.collect().toSet)
    assert(served.count() > 0)
    val pf = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
      .linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("dynamicpruningexpression(cluster"),
      s"residual index scan should dynamically prune by cluster, got: $pf")
  }

  test("E46: centroid drift — zero on identity, exact on a known shift, null one-sided") {
    // trained: cluster 0 = {(1,1),(3,3)} sum (4,4) n 2; cluster 1 = {(10,0)}
    def sums(rows: Seq[(Long, Array[Float], Int)]) =
      Knn.centroidSums(rows.toDF("vec_id", "embedding", "label"), "label", "embedding", 2)
    val trained = sums(Seq(
      (1L, Array(1.0f, 1.0f), 0), (2L, Array(3.0f, 3.0f), 0), (3L, Array(10.0f, 0.0f), 1)))
    // identity: drift2 exactly 0.0 for both clusters
    val zero = Knn.centroidDrift(trained, trained, 2)
      .select($"cluster", $"drift2").as[(Long, Option[Double])].collect().toMap
    assert(zero == Map(0L -> Some(0.0), 1L -> Some(0.0)))
    // known shift: cluster 0's members move to {(2,2)} (n'=1, S'=(2000,2000))
    // drift per dim = (1·4000 − 2·2000)²/(2·1)² = 0 — centroid unchanged;
    // cluster 1 moves (10,0) → (10,4): drift = (0 − 4000)²/1 = 1.6e7 on dim 1
    val current = sums(Seq(
      (9L, Array(2.0f, 2.0f), 0), (8L, Array(10.0f, 4.0f), 1), (7L, Array(5.0f, 5.0f), 2)))
    val got = Knn.centroidDrift(trained, current, 2)
      .select($"cluster", $"n_trained", $"n_current", $"drift2")
      .as[(Long, Option[Long], Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((Some(2L), Some(1L), Some(0.0))))
    assert(got(1L) == ((Some(1L), Some(1L), Some(4000.0 * 4000.0))))
    assert(got(2L) == ((None, Some(1L), None))) // never-trained cluster: null side
    // vanished cluster (trained-only) also surfaces with nulls
    val gone = Knn.centroidDrift(trained, sums(Seq((9L, Array(1.0f, 1.0f), 0))), 2)
      .select($"cluster", $"n_current").as[(Long, Option[Long])].collect().toMap
    assert(gone(1L).isEmpty)
  }

  test("E44/E44t: two-level quantizer — children refine their cell; tree dedup kills within-cell dups") {
    // 4 well-separated level-1 regions on orthogonal axes, each with two
    // internal sub-groups — k1=4, k2=2
    val rows = for {
      (axis, cell) <- Seq((0, 0), (1, 1), (2, 2), (3, 3))
      sub <- 0 to 1
      copy <- 0 to 2
    } yield {
      val v = Array.fill(4)(0.0f)
      v(axis) = 10.0f
      v((axis + 1) % 4) = if (sub == 0) 1.0f else -1.0f
      (cell.toLong * 100 + sub * 10 + copy, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val (l1, l2) = Knn.ivfTrain2(corpus, "vec_id", "embedding", 4, 2, 3, 4)
    assert(l2.count() <= 4L * 2L) // ≤ k1·k2 cells
    val tree = Knn.treeAssign(corpus, l1, l2, "vec_id", "embedding", 2, 4)
      .as[(Long, Long)].collect().toMap
    // level-2 refines level-1: the composite's cell component equals the
    // flat level-1 argmin for every vector
    val flat1 = Knn.ivfAssign(corpus, l1, "vec_id", "embedding", 4)
      .as[(Long, Long)].collect().toMap
    tree.foreach { case (vid, cluster) =>
      assert(cluster / 2 == flat1(vid), s"vid $vid: tree cell ${cluster / 2} != flat ${flat1(vid)}")
    }
    // identical vectors share a (cell, child)
    val byVec = rows.groupBy { case (_, v) => v.toSeq }.values
    byVec.foreach { group =>
      val cells = group.map { case (id, _) => tree(id) }.toSet
      assert(cells.size == 1, s"identical vectors split: $group -> $cells")
    }
    // tree dedup kills the within-cell dup: ids 0,1,2 are identical —
    // semanticDedupAssigned keeps only the lowest id of each identical set
    val assigned = corpus.join(
      Knn.treeAssign(corpus, l1, l2, "vec_id", "embedding", 2, 4), "vec_id")
    val kept = Knn.semanticDedupAssigned(assigned, "vec_id", "embedding", "cluster", 9999L)
      .select($"vec_id").as[Long].collect().toSet
    byVec.foreach { group =>
      val ids = group.map(_._1)
      assert(kept.intersect(ids.toSet) == Set(ids.min),
        s"dup group $ids: kept ${kept.intersect(ids.toSet)}")
    }
  }

  test("E44t: multi-probe descent — probe=k1 EQUALS the flat composite argmin; probe=1 is the greedy path") {
    // vectors deliberately placed so the greedy descent is WRONG for
    // some of them: real embeddings from the fixture corpus give the
    // level-1 cells ragged boundaries where the nearest child can live
    // in the runner-up cell — exactly the failure multi-probe fixes
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val (k1, k2) = (4, 2)
    val (l1, l2) = Knn.ivfTrain2(e, "vec_id", "embedding", k1, k2, 2, 64)
    // the tree's level-2 set flattened to composite ids = the flat
    // centroid set the descent approximates
    val flatCents = l2.select(
      ($"cell" * k2.toLong + $"group").as("group") +:
        $"n" +: (0 until 64).map(i => col(s"s_$i")): _*)
    val flat = Knn.ivfAssign(e, flatCents, "vec_id", "embedding", 64)
      .as[(Long, Long)].collect().toMap
    // probing ALL cells = considering every child with the same
    // (dist, composite) tie-break — must equal flat EXACTLY
    val full = Knn.treeAssign(e, l1, l2, "vec_id", "embedding", k2, 64, probe = k1)
      .as[(Long, Long)].collect().toMap
    assert(full === flat)
    // probe=1 equals the historical greedy path bit-for-bit
    val greedy = Knn.treeAssign(e, l1, l2, "vec_id", "embedding", k2, 64)
      .as[(Long, Long)].collect().toMap
    val greedyExplicit = Knn.treeAssign(e, l1, l2, "vec_id", "embedding", k2, 64, probe = 1)
      .as[(Long, Long)].collect().toMap
    assert(greedyExplicit === greedy)
    // agreement with flat is MONOTONE in probe: if greedy agrees on a
    // vector, the flat argmin child lives in the rank-1 cell, which
    // every probe level includes — and the (dist, composite) tie-break
    // then picks the same child. So probe=2 ⊇ greedy's agreement set.
    def agreeCount(m: Map[Long, Long]): Int = m.count { case (k, v) => flat(k) == v }
    val p2 = Knn.treeAssign(e, l1, l2, "vec_id", "embedding", k2, 64, probe = 2)
      .as[(Long, Long)].collect().toMap
    assert(agreeCount(p2) >= agreeCount(greedy),
      s"probe=2 agreement ${agreeCount(p2)} < greedy ${agreeCount(greedy)}")
    assert(intercept[IllegalArgumentException] {
      Knn.treeAssign(e, l1, l2, "vec_id", "embedding", k2, 64, probe = 0)
    }.getMessage.contains("probe"))
  }

  test("E7c/E44t: native argmin folds equal the declarative forms (randomized, ties included)") {
    // the pre-r13 declarative forms (crossJoin + min_by / ranking +
    // min_by) reconstructed here as the reference; the folds must match
    // bit-for-bit, INCLUDING on engineered distance ties (a duplicated
    // centroid under two group ids — the (dist, group) tie-break must
    // always pick the smaller id, so the duplicate id never appears)
    import graft.similarity.VectorOps
    val rnd = new scala.util.Random(31)
    val dims = 8
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.fill(dims)((rnd.nextGaussian() * 2).toFloat).toSeq)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    def distExpr = (0 until dims)
      .map(i => pow(col("n") * element_at(col("qv"), i + 1) - col(s"s_$i"), 2))
      .reduce(_ + _) / (col("n") * col("n")).cast("double")
    val pPrep = corpus.select(col("vec_id").as("vid"),
      VectorOps.quantize(col("embedding")).as("qv"))
    // ---- flat: centroids with group 0 DUPLICATED as group 99
    val base = Knn.centroidSums(
      corpus.withColumn("g", pmod(col("vec_id"), lit(5L))), "g", "embedding", dims)
    val cents = base.unionByName(
      base.filter(col("group") === 0L).withColumn("group", lit(99L)))
    val fold = Knn.ivfAssign(corpus, cents, "vec_id", "embedding", dims)
      .as[(Long, Long)].collect().toMap
    val ref = pPrep.crossJoin(broadcast(cents)).withColumn("__d", distExpr)
      .groupBy("vid")
      .agg(min_by(col("group"), struct(col("__d"), col("group"))).as("cluster"))
      .as[(Long, Long)].collect().toMap
    assert(fold == ref && fold.size == 120)
    // the tie was really exercised and broke to the smaller id
    assert(ref.values.exists(_ == 0L) && !ref.values.exists(_ == 99L))
    // ---- tree: every probe level vs the declarative ranking + min_by
    val (k1, k2) = (3, 2)
    val (l1, l2) = Knn.ivfTrain2(corpus, "vec_id", "embedding", k1, k2, 2, dims)
    for (probe <- 1 to k1) {
      val foldT = Knn.treeAssign(corpus, l1, l2, "vec_id", "embedding", k2, dims, probe)
        .as[(Long, Long)].collect().toMap
      val cells = pPrep.crossJoin(broadcast(l1)).withColumn("__d", distExpr)
        .groupBy(col("vid"))
        .agg(
          slice(array_sort(collect_list(struct(col("__d"), col("group")))),
            1, probe).as("__cells"),
          first(col("qv")).as("qv"))
        .select(col("vid"), col("qv"), explode(col("__cells")).as("__c"))
        .select(col("vid"), col("qv"), col("__c.group").as("cell"))
      val refT = cells.join(broadcast(l2), Seq("cell")).withColumn("__d", distExpr)
        .groupBy(col("vid"))
        .agg(min_by(struct(col("cell"), col("group").as("child")),
          struct(col("__d"), col("cell") * lit(k2.toLong) + col("group"))).as("__b"))
        .select(col("vid"),
          (col("__b.cell") * lit(k2.toLong) + col("__b.child")).as("cluster"))
        .as[(Long, Long)].collect().toMap
      assert(foldT == refT, s"probe=$probe")
    }
  }

  test("E44t: treeAssign on an empty quantizer level is empty-in/empty-out, not a refusal") {
    // training on an empty corpus yields empty levels; assignment must
    // return an empty (idCol, cluster) frame — the historical
    // broadcast-join form's behavior — instead of throwing
    val l1Cols = Seq($"group", $"n") ++ (0 until 4).map(i => col(s"s_$i"))
    val l2Cols = Seq($"cell", $"group", $"n") ++ (0 until 4).map(i => col(s"s_$i"))
    val emptyL1 = Seq((0L, 1L, 0L, 0L, 0L, 0L))
      .toDF("group", "n", "s_0", "s_1", "s_2", "s_3")
      .filter(lit(false)).select(l1Cols: _*)
    val fullL2 = Seq((0L, 0L, 1L, 0L, 0L, 0L, 0L))
      .toDF("cell", "group", "n", "s_0", "s_1", "s_2", "s_3")
    val emptyL2 = fullL2.filter(lit(false)).select(l2Cols: _*)
    val corpus = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    for ((l1, l2) <- Seq(
        (emptyL1, emptyL2),
        (emptyL1, fullL2),
        (Seq((0L, 1L, 0L, 0L, 0L, 0L)).toDF("group", "n", "s_0", "s_1", "s_2", "s_3"), emptyL2))) {
      val out = Knn.treeAssign(corpus, l1, l2, "vec_id", "embedding", 2, 4)
      assert(out.columns.toSeq == Seq("vec_id", "cluster"))
      assert(out.count() == 0L)
    }
  }

  test("E45: packed argmin refuses loudly when dist2 exceeds the pack range") {
    import graft.similarity.Pq
    // quantized magnitudes of ~1e9 per dim put dist2 ~1e18 past the
    // 2^63/65536 ≈ 1.4e14 packing bound — without the guard the pack
    // wraps negative and returns silently wrong codes (ADVICE r13)
    val sane = (0L until 8L).map(i =>
      (i, Array.fill(4)(if (i % 2 == 0) 1.0f else -1.0f)))
      .toDF("vec_id", "embedding")
    val cb = Pq.train(sane, "vec_id", "embedding", m = 2, ksub = 2, iters = 1, dims = 4)
    val huge = Seq((99L, Array(1e6f, 1e6f, 1e6f, 1e6f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pq.encode(huge, cb, "vec_id", "embedding", m = 2, dims = 4).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(chain.contains("packed-argmin"), s"unexpected: $chain")
    // and the guard is inert for in-contract data: same codes as before
    val codes = Pq.encode(sane, cb, "vec_id", "embedding", 2, 4)
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes.values.forall(_.length == 2))
  }

  test("E6: brute-force kNN self-excluded, ranked, exactly k rows per query") {
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val out = Knn.bruteForce(e, e.filter($"vec_id" < 3), "vec_id", "embedding", 5)
    val perQuery = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(perQuery.values.forall(_ == 5))
    assert(out.filter($"query_id" === $"neighbor_id").count() == 0)
    val ranks = out.filter($"query_id" === 0).orderBy($"rnk").select("rnk")
      .as[Long].collect().toSeq
    assert(ranks == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("E5 quantization: identical vectors score exactly 10000 or 9999 bp") {
    val df = Seq((1L, Array(0.1f, 0.2f, 0.3f)), (2L, Array(0.1f, 0.2f, 0.3f)))
      .toDF("vec_id", "embedding")
    val pairs = Knn.embeddingDupPairs(df, "vec_id", "embedding", 9500L, 3)
      .select("cos_bp").as[Long].collect()
    assert(pairs.length == 1 && pairs.head >= 9999L)
  }

  test("E12: media pipeline preserves ids and derives deterministic metadata") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val meta = Media.extractMeta(Media.asMediaTable(docs, "doc_id", "text"))
    assert(meta.count() == docs.count())
    val row = meta.filter($"doc_id" === 0).head()
    assert(row.n_bytes > 0)
    assert(row.checksum.length == 32)
    assert(row.frame_count == row.n_bytes % 30 + 1)
    // second run is bit-identical (stub codec is deterministic)
    val again = Media.extractMeta(Media.asMediaTable(docs, "doc_id", "text"))
      .filter($"doc_id" === 0).head()
    assert(again == row)
  }

  test("E12: metaColumns fast path equals the mapPartitions codec path, no object hop") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val media = Media.asMediaTable(docs, "doc_id", "text")
    val viaColumns = Media.metaColumns(media.toDF())
    // codegen'd all the way: no DeserializeToObject / mapPartitions in
    // the fast-path plan (the whole point of the column formulation)
    val plan = viaColumns.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      s"fast path must stay inside codegen:\n$plan")
    // and it computes EXACTLY what the codec-boundary path computes
    val cols = Seq("doc_id", "mime", "n_bytes", "checksum", "width", "height", "frame_count")
    val a = viaColumns.select(cols.map(col): _*).collect().toSet
    val b = Media.extractMeta(media).toDF().select(cols.map(col): _*).collect().toSet
    assert(a == b)
  }
}
