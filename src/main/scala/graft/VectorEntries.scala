package graft

import graft.multimodal.Media
import graft.similarity.{Knn, Pq, VectorOps}
import graft.text.TextOps
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity + multimodal queries (SURVEY §2 E5–E7, E12) and
  * DuckDB oracles. Vector math is integer-quantized (VectorOps) so cosine
  * scores and LSH buckets are bit-identical across engines.
  */
object VectorEntries {

  val Dims = 64
  val TauBp = 9500L
  val K = 10
  val NProbe = 3
  val TrainK = 8
  val TrainIters = 2
  val PqM = 4      // PQ subspaces (dims/m = 16 dims each)
  val PqKsub = 8   // centroids per subspace codebook
  val PqIters = 2  // Lloyd rounds per subspace (mirrors TrainIters)
  val TreeProbe = 2 // level-1 cells probed at assignment (multi-probe descent)

  /** Tier-scaled quantizer sizes (r12 verdict item 2): the SemDeDup gate
    * Ks grow with the corpus instead of staying fixture-pinned — fixed K
    * makes cluster size (and so the within-cell pair mass) grow
    * QUADRATICALLY with the corpus, which is why the old K=8/label-K
    * gates were documented-inviable at sf10. The 100 TB configuration is
    * K ≈ √n (bounded clusters: pair mass n²/K ≈ n^1.5):
    *   - flat:  K  = max(4, ⌊√n⌋)
    *   - tree:  k1 = k2 = max(2, ⌊√⌊√n⌋⌋)  (composite K = k1·k2 ≈ √n)
    * Both engines evaluate the same rule on the same exact count (IEEE
    * double sqrt + floor agree bit-for-bit for counts ≪ 2⁵³), so the
    * oracle's unrolled Lloyd runs at the identical K per tier. */
  def kFlat(n: Long): Int =
    math.max(4L, math.floor(math.sqrt(n.toDouble)).toLong).toInt
  def kQuad(n: Long): Int =
    math.max(2L, math.floor(math.sqrt(math.floor(math.sqrt(n.toDouble)))).toLong).toInt
  /** DuckDB twins — kdef CTEs the oracles prepend (count over the same
    * clean training corpus the Spark lambdas count). */
  private val kFlatSql =
    "kdef AS (SELECT greatest(4, CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) AS kk FROM embeddings)"
  private val kQuadSql =
    "kdef AS (SELECT greatest(2, CAST(floor(sqrt(floor(sqrt(CAST(count(*) AS DOUBLE))))) AS BIGINT)) AS kq FROM embeddings)"
  private val kQ = "(SELECT kq FROM kdef)"

  /** E44t's trained two-level quantizer, trained ONCE per (session,
    * corpus) and shared by `emb_tree_assign` / `dedup_semantic_tree` —
    * each used to pay both Lloyd levels independently (~8 s of every
    * gate run, r11 verdict item 3). The localCheckpoints are the
    * in-suite artifact; in production the tree is a persisted model like
    * the classifier's ([[graft.text.Classifier.save]] pattern) and the
    * serve paths load it. The DuckDB oracles still retrain inline —
    * sharing a materialization is a cost choice, not a semantics
    * change (both queries trained on the SAME clean corpus before). */
  private val treeModelMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame, Int)]
  /** (level1, level2, kq): the tier-scaled two-level quantizer —
    * k1 = k2 = [[kQuad]](n) from the clean corpus count, so the tree is
    * the configuration the 100 TB path actually uses at every tier
    * (composite K ≈ √n; the oracle derives the same kq in its kdef CTE). */
  private def treeModel(s: SparkSession, dir: String): (DataFrame, DataFrame, Int) = {
    // drop entries whose session is stopped so the memo can't pin
    // localCheckpoint'd frames for the JVM lifetime (r12 advice)
    treeModelMemo.keysIterator
      .filter(_._1.sparkContext.isStopped).foreach(treeModelMemo.remove)
    treeModelMemo.getOrElseUpdate((s, dir), {
      val e = Tables.embeddings(s, dir)
      val kq = kQuad(e.count())
      val (l1, l2) = Knn.ivfTrain2(
        e, "vec_id", "embedding", kq, kq, TrainIters, Dims)
      (l1.localCheckpoint(), l2.localCheckpoint(), kq)
    })
  }

  /** embeddings ∪ exact duplicates of every 10th vector (+100000). */
  private def embDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
  }

  private val embDupSql =
    """SELECT vec_id, embedding FROM embeddings
      |UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0""".stripMargin

  // ------------------------------------------------------- oracle helpers

  private val q = VectorOps.duckQuantize("embedding")
  private def prepSql(corpus: String) =
    s"""SELECT vec_id, q, ${VectorOps.duckQdot("q", "q")} AS sd,
       |       ${VectorOps.duckSketch("q")} AS bucket
       |FROM (SELECT vec_id, $q AS q FROM ($corpus))""".stripMargin

  private def treeSums =
    (0 until Dims).map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
  private def treeDist(c: String, t: String) = (0 until Dims)
    .map(i => s"power($c.n * $t.q[${i + 1}] - $c.s_$i, 2)").mkString(" + ")

  /** E44t's two-level-Lloyd training unrolled as a WITH-body prefix: both
    * levels' fixed rounds over `embeddings`, ending at the trained
    * centroid tables `l1` (level-1 cells) and `l2` (per-cell children).
    * `emb_tree_assign` assigns the training corpus through it;
    * `dedup_semantic_tree` assigns the dup-augmented corpus — sharing the
    * text keeps the two oracles' quantizer identical by construction.
    * Level-1 is emb_ivf_train's recipe at the tier-scaled kq (the kdef
    * CTE — [[kQuad]]'s DuckDB twin); level-2 repeats it INSIDE each cell
    * (join on cell instead of a cross join — each vector sees only its
    * own cell's children). */
  private lazy val treeTrainCtesSql: String = {
    val sums = treeSums
    def distOf(c: String) = treeDist(c, "v")
    def distVc(c: String) = treeDist(c, "vc")
    val h = graft.text.PortableHash.duckH32("CAST(vec_id AS VARCHAR)")
    s"""$kQuadSql,
       |v AS MATERIALIZED (SELECT vec_id, $q AS q FROM embeddings),
       |a0 AS (SELECT vec_id, $h % $kQ AS g FROM v),
       |c1 AS (SELECT g, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM v JOIN a0 USING (vec_id) GROUP BY g),
       |d1 AS (SELECT v.vec_id, c1.g, (${distOf("c1")}) / CAST(c1.n * c1.n AS DOUBLE) AS dist
       |       FROM v CROSS JOIN c1),
       |a1 AS (SELECT vec_id, g FROM (
       |  SELECT vec_id, g, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, g ASC) AS rk
       |  FROM d1) WHERE rk = 1),
       |c2 AS (SELECT g, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM v JOIN a1 USING (vec_id) GROUP BY g),
       |d2 AS (SELECT v.vec_id, c2.g, (${distOf("c2")}) / CAST(c2.n * c2.n AS DOUBLE) AS dist
       |       FROM v CROSS JOIN c2),
       |a2 AS (SELECT vec_id, g FROM (
       |  SELECT vec_id, g, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, g ASC) AS rk
       |  FROM d2) WHERE rk = 1),
       |l1 AS (SELECT g, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM v JOIN a2 USING (vec_id) GROUP BY g),
       |dc AS (SELECT v.vec_id, l1.g, (${distOf("l1")}) / CAST(l1.n * l1.n AS DOUBLE) AS dist
       |       FROM v CROSS JOIN l1),
       |vc AS MATERIALIZED (SELECT v.vec_id, v.q, cellof.g AS cell
       |      FROM v JOIN (SELECT vec_id, g FROM (
       |        SELECT vec_id, g, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, g ASC) AS rk
       |        FROM dc) WHERE rk = 1) cellof USING (vec_id)),
       |b0 AS (SELECT vec_id, $h % $kQ AS ch FROM vc),
       |s1 AS (SELECT cell, ch, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM vc JOIN b0 USING (vec_id) GROUP BY cell, ch),
       |e1 AS (SELECT vc.vec_id, s1.ch, (${distVc("s1")}) / CAST(s1.n * s1.n AS DOUBLE) AS dist
       |       FROM vc JOIN s1 ON vc.cell = s1.cell),
       |b1 AS (SELECT vec_id, ch FROM (
       |  SELECT vec_id, ch, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, ch ASC) AS rk
       |  FROM e1) WHERE rk = 1),
       |s2 AS (SELECT cell, ch, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM vc JOIN b1 USING (vec_id) GROUP BY cell, ch),
       |e2 AS (SELECT vc.vec_id, s2.ch, (${distVc("s2")}) / CAST(s2.n * s2.n AS DOUBLE) AS dist
       |       FROM vc JOIN s2 ON vc.cell = s2.cell),
       |b2 AS (SELECT vec_id, ch FROM (
       |  SELECT vec_id, ch, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, ch ASC) AS rk
       |  FROM e2) WHERE rk = 1),
       |l2 AS (SELECT cell, ch, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM vc JOIN b2 USING (vec_id) GROUP BY cell, ch)""".stripMargin
  }

  /** knn_brute's oracle — also the truth leg of knn_recall. */
  private val knnBruteSql =
    s"""WITH prep AS (
       |  SELECT vec_id, q, ${VectorOps.duckQdot("q", "q")} AS sd
       |  FROM (SELECT vec_id, $q AS q FROM embeddings)),
       |qs AS (SELECT * FROM prep WHERE vec_id < 5),
       |scored AS (
       |  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorOps.duckCosineBp(VectorOps.duckQdot("c.q", "qs.q"), "c.sd", "qs.sd")} AS cos_bp
       |  FROM prep c JOIN qs ON c.vec_id <> qs.vec_id)
       |SELECT query_id, neighbor_id, rnk, cos_bp FROM (
       |  SELECT query_id, neighbor_id, cos_bp,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_bp DESC, neighbor_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= $K""".stripMargin

  /** knn_ivf's oracle — also the measured leg of knn_recall. */
  private val knnIvfSql = {
    val sums = (0 until Dims).map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
    val dist = (0 until Dims)
      .map(i => s"power(c.n * v.q[${i + 1}] - c.s_$i, 2)").mkString(" + ")
    s"""WITH v0 AS (SELECT vec_id, $q AS q FROM embeddings),
       |v AS (SELECT vec_id, q, ${VectorOps.duckQdot("q", "q")} AS sd FROM v0),
       |c AS (SELECT label, CAST(count(*) AS BIGINT) AS n, $sums
       |      FROM (SELECT label, $q AS q FROM embeddings) GROUP BY label),
       |d AS (SELECT v.vec_id, v.q, v.sd, c.label,
       |        ($dist) / CAST(c.n * c.n AS DOUBLE) AS dist
       |      FROM v CROSS JOIN c),
       |ranked AS (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, label ASC) AS rk
       |  FROM d),
       |asg AS (SELECT vec_id, q, sd, label AS cluster FROM ranked WHERE rk = 1),
       |probes AS (SELECT vec_id AS qid, q AS qq, sd AS qsd, label AS cluster
       |  FROM ranked WHERE vec_id < 5 AND rk <= $NProbe),
       |scored AS (
       |  SELECT p.qid AS query_id, a.vec_id AS neighbor_id,
       |    ${VectorOps.duckCosineBp(VectorOps.duckQdot("a.q", "p.qq"), "a.sd", "p.qsd")} AS cos_bp
       |  FROM asg a JOIN probes p ON a.cluster = p.cluster AND a.vec_id <> p.qid)
       |SELECT query_id, neighbor_id, rnk, cos_bp FROM (
       |  SELECT query_id, neighbor_id, cos_bp,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_bp DESC, neighbor_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= $K""".stripMargin
  }

  // -------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E5: embedding near-dup pairs (sketch buckets -> exact cosine verify)
    "dedup_embed" -> ((s, dir) =>
      Knn.embeddingDupPairs(embDup(s, dir), "vec_id", "embedding", TauBp, Dims)),

    // E6: brute-force exact top-k (query side broadcast, corpus scanned once)
    "knn_brute" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Knn.bruteForce(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", K)
    }),

    // E7: bucketed ANN over the dup-augmented corpus (each query's
    // duplicate guarantees a same-bucket neighbor)
    "knn_bucketed" -> ((s, dir) => {
      val c = embDup(s, dir)
      val qs = c.filter(col("vec_id") % 10 === 0 && col("vec_id") < 50)
      Knn.bucketed(c, qs, "vec_id", "embedding", K, Dims)
    }),

    // E7b: IVF coarse-quantizer training — exact integer centroid sums
    // per label (one map-side-combined aggregation)
    "emb_centroids" -> ((s, dir) => {
      Knn.centroidSums(Tables.embeddings(s, dir), "label", "embedding", Dims)
        .withColumnRenamed("group", "label")
    }),

    // E7c: IVF assignment — nearest centroid per vector in pure integer
    // arithmetic (scaled distances), centroids broadcast
    "emb_ivf_assign" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = Knn.centroidSums(e, "label", "embedding", Dims)
      Knn.ivfAssign(e, cents, "vec_id", "embedding", Dims)
    }),

    // E7f: iterative IVF training — Lloyd rounds from a deterministic
    // hash init, exact integer centroid sums every round; the DuckDB
    // oracle mirrors the SAME fixed rounds, so the trained quantizer is
    // engine-reproducible (early convergence stop provably equals
    // running out the rounds — Lloyd fixed point)
    "emb_ivf_train" -> ((s, dir) =>
      Knn.ivfTrain(Tables.embeddings(s, dir), "vec_id", "embedding",
        TrainK, TrainIters, Dims)
        .withColumnRenamed("group", "cluster")),

    // E44t: TWO-LEVEL tree assignment — the 100 TB SemDeDup path: each
    // vector resolves in n·(k1+probe·k2) distance rows instead of flat
    // n·(k1·k2). Level-1 Lloyd trained as emb_ivf_train; level-2 runs
    // exact integer Lloyd INSIDE every level-1 cell in one job (cell id
    // on the aggregation key); composite cluster = cell·k2 + child;
    // the MULTI-PROBE descent (top-TreeProbe cells, global composite
    // argmin) recovers the flat-agreement the greedy descent loses at
    // scale. The oracle unrolls both levels' fixed rounds (early
    // convergence stop provably equals running them out — Lloyd fixed
    // point); the tree is trained once per gate run ([[treeModel]]).
    "emb_tree_assign" -> ((s, dir) => {
      val (l1, l2, kq) = treeModel(s, dir)
      Knn.treeAssign(Tables.embeddings(s, dir), l1, l2,
        "vec_id", "embedding", kq, Dims, TreeProbe)
    }),

    // E7d: IVF search — queries probe their nprobe nearest centroids and
    // score only those clusters' vectors (the search half of the index)
    "knn_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = Knn.centroidSums(e, "label", "embedding", Dims)
      Knn.ivfSearch(e, cents, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", K, Dims, NProbe)
    }),

    // E7r: ANN RECALL — the eval every approximate index needs before it
    // serves: per query, how many of the exact top-k the IVF probe run
    // actually returned. Exact integers (hit counts + basis points), so
    // the measurement itself is oracle-checkable — a recall harness you
    // can run at corpus scale (both legs are the already-scaling brute /
    // IVF operators; the join is k-rows-per-query sized).
    "knn_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e.filter(col("vec_id") < 5)
      val exact = Knn.bruteForce(e, qs, "vec_id", "embedding", K)
        .select(col("query_id"), col("neighbor_id"))
      val cents = Knn.centroidSums(e, "label", "embedding", Dims)
      val approx = Knn.ivfSearch(e, cents, qs, "vec_id", "embedding", K, Dims, NProbe)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_bp", TextOps.bp(col("n_hit"), col("n_exact")))
    }),

    // E44: SemDeDup — cluster-scoped semantic dedup (assign to nearest
    // centroid, pairwise cosine ONLY within the cluster, drop vectors
    // with a lower-id neighbor ≥ tau). The dup-augmented corpus
    // guarantees every copy shares its original's cluster and dies there.
    // Centroids are one hash-init assignment round over K = kFlat(n)
    // pseudo-labels (r12 verdict item 2: the fixture's label-K made the
    // within-cluster pair mass quadratic in the corpus — K ≈ √n keeps
    // clusters bounded at every tier, sf10 included)
    "dedup_semantic" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val kk = kFlat(e.count())
      val pl = e.select(
        (graft.text.PortableHash.h32(col("vec_id").cast("string")) % kk.toLong)
          .as("pl"),
        col("embedding"))
      val cents = Knn.centroidSums(pl, "pl", "embedding", Dims)
      Knn.semanticDedup(embDup(s, dir), cents, "vec_id", "embedding", TauBp, Dims)
    }),

    // E44×E44t: SemDeDup over the TREE-assigned clusters — the 100 TB
    // composition END TO END: two-level Lloyd trained on the clean
    // corpus (n·(k1+k2) assignment instead of flat n·K), the
    // dup-augmented corpus pushed through both levels, then the same
    // greedy lower-id drop within each composite cell·k2+child cluster.
    // dedup_semantic gates the flat path; this gates the scale path.
    "dedup_semantic_tree" -> ((s, dir) => {
      val (l1, l2, kq) = treeModel(s, dir)
      val corpus = embDup(s, dir)
      val assigned = Knn.treeAssign(
        corpus, l1, l2, "vec_id", "embedding", kq, Dims, TreeProbe)
      Knn.semanticDedupAssigned(
        corpus.join(assigned, "vec_id"), "vec_id", "embedding", "cluster", TauBp)
    }),

    // E39: INT8 scalar quantization of the corpus — float32 → 1 byte/dim
    // (8x smaller vectors in flight and at rest, the candidate-pass I/O
    // play at 100 TB). Train (per-dim integer bounds) + encode (exact
    // integer affine codes) are engine-bit-identical; the output digests
    // each vector's code array as exact integers so the WHOLE quantizer
    // is oracle-checked end to end.
    "emb_sq_codes" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val (mn, mx) = Knn.sqBounds(Knn.sqTrain(e, "embedding"), Dims)
      Knn.sqEncode(e, "vec_id", "embedding", mn, mx)
        .select(
          col("vid").as("vec_id"),
          aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
          aggregate(
            transform(col("codes"), (c, i) => c * (i.cast("long") + lit(1L))),
            lit(0L), (a, x) => a + x).as("code_wsum"),
          array_max(col("codes")).as("code_max"))
    }),

    // E39r: the quantizer's RECALL gate — top-k measured in SQ8 code
    // space vs the exact top-k, per query (the knn_recall pattern): how
    // much ranking the 8x compression actually costs, as exact integers,
    // before the quantized corpus serves a candidate pass.
    "knn_sq_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e.filter(col("vec_id") < 5)
      val exact = Knn.bruteForce(e, qs, "vec_id", "embedding", K)
        .select(col("query_id"), col("neighbor_id"))
      val (mn, mx) = Knn.sqBounds(Knn.sqTrain(e, "embedding"), Dims)
      val approx = Knn.sqBruteForce(e, qs, "vec_id", "embedding", mn, mx, K)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_bp", TextOps.bp(col("n_hit"), col("n_exact")))
    }),

    // E45: PQ codebook training — m independent integer-Lloyd runs in
    // one job (subspace rides the aggregation key); truncated-mean
    // centroids so both engines compute identical codebooks
    "emb_pq_train" -> ((s, dir) =>
      Pq.train(Tables.embeddings(s, dir), "vec_id", "embedding",
        PqM, PqKsub, PqIters, Dims)),

    // E45: PQ encode — 64 float dims → m one-byte codes (64x smaller);
    // codes surfaced as columns so the full codebook+assignment chain is
    // hash-checked end to end
    "emb_pq_codes" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cb = Pq.train(e, "vec_id", "embedding", PqM, PqKsub, PqIters, Dims)
      Pq.encode(e, cb, "vec_id", "embedding", PqM, Dims)
        .select(col("vid").as("vec_id") +:
          (0 until PqM).map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
    }),

    // E45a: ADC search — asymmetric distance from full-precision queries
    // to the coded corpus via per-query lookup tables (reads codes,
    // never raw vectors: the PQ I/O story), exact int64 end to end
    "knn_pq_adc" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cb = Pq.train(e, "vec_id", "embedding", PqM, PqKsub, PqIters, Dims)
      val codes = Pq.encode(e, cb, "vec_id", "embedding", PqM, Dims)
      Pq.adcSearch(codes, cb, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", K, PqM, Dims)
    }),

    // E45b: IVF+PQ — the composed billion-scale stack: coarse probes
    // bound WHICH vectors are scored (1/K·nprobe of the corpus), ADC
    // bounds WHAT is read per candidate (m bytes, not the floats)
    "knn_ivfpq" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val coarse = Knn.centroidSums(e, "label", "embedding", Dims)
      val cb = Pq.train(e, "vec_id", "embedding", PqM, PqKsub, PqIters, Dims)
      val corpus = Pq.encode(e, cb, "vec_id", "embedding", PqM, Dims)
        .join(Knn.ivfAssign(e, coarse, "vec_id", "embedding", Dims)
          .withColumnRenamed("vec_id", "vid"), "vid")
      Pq.ivfAdcSearch(corpus, coarse, cb, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", K, PqM, Dims, NProbe)
    }),

    // E50: PCA spectrum, oracle-checkable face — DuckDB has no
    // eigensolver (raw eigenvalues ride PcaSpec), but it CAN recompute
    // the exact-integer covariance trace from the raw vectors, and the
    // eigen INVARIANTS (unit, orthogonal, Cv=λv residual, PSD, trace
    // preservation) are verified in-query per component
    "emb_pca_spectrum" -> ((s, dir) =>
      graft.similarity.Pca.spectrumChecked(
        Tables.embeddings(s, dir), "embedding", Dims, 16)),

    // E46: quantizer drift — trained centroids (full corpus, by label)
    // vs the current members (every 10th vector gone, label 7 vanished
    // entirely → null current side): the index-rebuild trigger, measured
    "emb_ivf_drift" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val trained = Knn.centroidSums(e, "label", "embedding", Dims)
      val current = Knn.centroidSums(
        e.filter(col("vec_id") % 10 =!= 0 && col("label") =!= 7),
        "label", "embedding", Dims)
      Knn.centroidDrift(trained, current, Dims)
    }),

    // E45d: residual IVF+PQ — IVFADC as published (Jégou 2011 §IV): the
    // codebook quantizes r = x − c(x) instead of x, so the m·ksub budget
    // spends itself on within-cluster variance only; the per-query ADC
    // table is rebuilt per probed cluster from the query's residual
    "knn_ivfpq_residual" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val coarse = Knn.centroidSums(e, "label", "embedding", Dims)
      // residuals feed train, encode, and the cluster join — pay the
      // assignment once (at scale a user persists this frame)
      val resid = Pq.residuals(e, coarse, "vec_id", "embedding", Dims)
        .localCheckpoint()
      val cb = Pq.trainQ(resid, "vid", col("rq"), PqM, PqKsub, PqIters, Dims)
      val corpus = Pq.encodeQ(resid, cb, "vid", col("rq"), PqM, Dims)
        .join(resid.select(col("vid"), col("cluster")), "vid")
      Pq.ivfAdcSearchResidual(corpus, coarse, cb, e.filter(col("vec_id") < 5),
        "vec_id", "embedding", K, PqM, Dims, NProbe)
    }),

    // E45dr: the residual recall gate — residual IVFADC top-k vs the
    // exact squared-L2 truth, per query (the E45r pattern on the
    // residual path; read next to knn_pq_recall it shows what residual
    // encoding buys at the same m·ksub budget)
    "knn_pqr_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e.filter(col("vec_id") < 5)
      val exact = Pq.bruteForceL2(e, qs, "vec_id", "embedding", K)
        .select(col("query_id"), col("neighbor_id"))
      val coarse = Knn.centroidSums(e, "label", "embedding", Dims)
      val resid = Pq.residuals(e, coarse, "vec_id", "embedding", Dims)
        .localCheckpoint()
      val cb = Pq.trainQ(resid, "vid", col("rq"), PqM, PqKsub, PqIters, Dims)
      val corpus = Pq.encodeQ(resid, cb, "vid", col("rq"), PqM, Dims)
        .join(resid.select(col("vid"), col("cluster")), "vid")
      val approx = Pq.ivfAdcSearchResidual(corpus, coarse, cb, qs,
        "vec_id", "embedding", K, PqM, Dims, NProbe)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_bp", TextOps.bp(col("n_hit"), col("n_exact")))
    }),

    // E45r: the PQ recall gate — ADC top-k vs the exact squared-L2
    // top-k (the metric ADC approximates), per query, exact integers
    "knn_pq_recall" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e.filter(col("vec_id") < 5)
      val exact = Pq.bruteForceL2(e, qs, "vec_id", "embedding", K)
        .select(col("query_id"), col("neighbor_id"))
      val cb = Pq.train(e, "vec_id", "embedding", PqM, PqKsub, PqIters, Dims)
      val codes = Pq.encode(e, cb, "vec_id", "embedding", PqM, Dims)
      val approx = Pq.adcSearch(codes, cb, qs, "vec_id", "embedding", K, PqM, Dims)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_bp", TextOps.bp(col("n_hit"), col("n_exact")))
    }),

    // E12: multimodal metadata — the codec-free column fast path (pure
    // md5/length expressions, no DeserializeToObject); extractMeta's
    // mapPartitions twin is the template for true codec calls and is
    // equality-pinned against this in MediaSpec
    "mm_meta" -> ((s, dir) => {
      val media = Media.asMediaTable(Tables.documents(s, dir), "doc_id", "text")
      Media.metaColumns(media.toDF())
    }),

    // E12b: frame sampling + resize — typed fan-out over the media table
    "mm_frames" -> ((s, dir) => {
      val media = Media.asMediaTable(Tables.documents(s, dir), "doc_id", "text")
      Media.sampleFrames(Media.extractMeta(media)).toDF()
    })
  )

  // -------------------------------------------------------------- oracles

  /** The SQ8 code vectors as a DuckDB CTE chain (mirrors sqTrain +
    * sqEncode exactly — all int64): q0 milli-units, b per-dim bounds,
    * cd per-(vector,dim) codes, cv the reassembled code arrays. */
  private val sqCodesCte =
    s"""q0 AS (SELECT vec_id, $q AS q FROM embeddings),
       |g AS (SELECT unnest(generate_series(1, $Dims)) AS i),
       |b AS (SELECT g.i AS dim, min(q0.q[g.i]) AS mn, max(q0.q[g.i]) AS mx
       |      FROM q0 CROSS JOIN g GROUP BY 1),
       |cd AS (SELECT q0.vec_id, b.dim,
       |        CASE WHEN b.mx > b.mn
       |             THEN ((least(b.mx, greatest(b.mn, q0.q[b.dim])) - b.mn) * 255) // (b.mx - b.mn)
       |             ELSE 0 END AS code
       |      FROM q0 CROSS JOIN b),
       |cv AS (SELECT vec_id, list(code ORDER BY dim) AS q FROM cd GROUP BY vec_id)""".stripMargin

  /** The PQ train+encode chain as a DuckDB CTE block (mirrors Pq.train /
    * Pq.encode exactly — all int64, truncated `//` division matching
    * Spark's `div`): sv subvectors, a0 hash init, two unrolled Lloyd
    * rounds (centroids → argmin reassign), cb the final codebook, enc
    * the per-(vector,subspace) code assignment. */
  private val pqCte: String = {
    val dsub = Dims / PqM
    val sums = (0 until dsub).map(i => s"CAST(sum(sq[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
    val cents = (0 until dsub).map(i => s"s_$i // n AS c_$i").mkString(", ")
    def dist(sv: String, c: String) = (0 until dsub)
      .map(i => s"($sv.sq[${i + 1}] - $c.c_$i) * ($sv.sq[${i + 1}] - $c.c_$i)").mkString(" + ")
    def round(prev: String, n: String, c: String, d: String, a: String) =
      s"""$n AS (SELECT sub, g, CAST(count(*) AS BIGINT) AS n, $sums
         |       FROM sv JOIN $prev USING (vec_id, sub) GROUP BY sub, g),
         |$c AS (SELECT sub, g, n, $cents FROM $n),
         |$d AS (SELECT sv.vec_id, sv.sub, $c.g, (${dist("sv", c)}) AS dist
         |       FROM sv JOIN $c ON sv.sub = $c.sub),
         |$a AS (SELECT vec_id, sub, g FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, g ASC) AS rk
         |  FROM $d) WHERE rk = 1)""".stripMargin
    s"""v AS (SELECT vec_id, $q AS q FROM embeddings),
       |subs AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS sub),
       |sv AS (SELECT vec_id, sub, q[sub*$dsub+1 : sub*$dsub+$dsub] AS sq
       |       FROM v CROSS JOIN subs),
       |a0 AS (SELECT vec_id, sub,
       |         ${graft.text.PortableHash.duckH32(
                    "CAST(vec_id AS VARCHAR)||':'||CAST(sub AS VARCHAR)")} % $PqKsub AS g
       |       FROM sv),
       |${round("a0", "n1", "c1", "d1", "a1")},
       |${round("a1", "n2", "c2", "d2", "a2")},
       |n3 AS (SELECT sub, g, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM sv JOIN a2 USING (vec_id, sub) GROUP BY sub, g),
       |cb AS (SELECT sub, g AS cluster, n, $cents FROM n3),
       |enc AS (SELECT vec_id, sub, cluster FROM (
       |  SELECT sv.vec_id, sv.sub, cb.cluster, (${dist("sv", "cb")}) AS dist,
       |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub
       |                       ORDER BY (${dist("sv", "cb")}) ASC, cb.cluster ASC) AS rk
       |  FROM sv JOIN cb ON sv.sub = cb.sub) WHERE rk = 1)""".stripMargin
  }

  /** knn_pq_adc's oracle body — also the measured leg of knn_pq_recall. */
  private val knnPqAdcSql: String = {
    val dsub = Dims / PqM
    def dist(sv: String, c: String) = (0 until dsub)
      .map(i => s"($sv.sq[${i + 1}] - $c.c_$i) * ($sv.sq[${i + 1}] - $c.c_$i)").mkString(" + ")
    s"""WITH $pqCte,
       |qsv AS (SELECT * FROM sv WHERE vec_id < 5),
       |tbl AS (SELECT qsv.vec_id AS qid, qsv.sub, cb.cluster,
       |          (${dist("qsv", "cb")}) AS td
       |        FROM qsv JOIN cb ON qsv.sub = cb.sub),
       |sc AS (SELECT enc.vec_id, tbl.qid, CAST(sum(tbl.td) AS BIGINT) AS adc_dist
       |       FROM enc JOIN tbl ON enc.sub = tbl.sub AND enc.cluster = tbl.cluster
       |                         AND enc.vec_id <> tbl.qid
       |       GROUP BY enc.vec_id, tbl.qid)
       |SELECT query_id, neighbor_id, rnk, adc_dist FROM (
       |  SELECT qid AS query_id, vec_id AS neighbor_id, adc_dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC) AS rnk
       |  FROM sc)
       |WHERE rnk <= $K""".stripMargin
  }

  /** knn_ivfpq's oracle: the pqCte's codebook/codes + the knn_ivf-style
    * coarse assignment/probes (rational scaled distances), candidates
    * restricted to probed clusters, ADC-summed, top-k. */
  private val knnIvfPqSql: String = {
    val dsub = Dims / PqM
    val sums = (0 until Dims).map(i => s"CAST(sum(cq[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
    val cdist = (0 until Dims)
      .map(i => s"power(cc.n * v.q[${i + 1}] - cc.s_$i, 2)").mkString(" + ")
    def dist(sv: String, c: String) = (0 until dsub)
      .map(i => s"($sv.sq[${i + 1}] - $c.c_$i) * ($sv.sq[${i + 1}] - $c.c_$i)").mkString(" + ")
    s"""WITH $pqCte,
       |cc AS (SELECT label, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM (SELECT label, $q AS cq FROM embeddings) GROUP BY label),
       |cd AS (SELECT v.vec_id, cc.label,
       |         ($cdist) / CAST(cc.n * cc.n AS DOUBLE) AS dist
       |       FROM v CROSS JOIN cc),
       |cranked AS (SELECT vec_id, label,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, label ASC) AS rk
       |  FROM cd),
       |casg AS (SELECT vec_id, label AS cluster FROM cranked WHERE rk = 1),
       |probes AS (SELECT vec_id AS qid, label AS cluster
       |  FROM cranked WHERE vec_id < 5 AND rk <= $NProbe),
       |qsv AS (SELECT * FROM sv WHERE vec_id < 5),
       |tbl AS (SELECT qsv.vec_id AS qid, qsv.sub, cb.cluster AS code,
       |          (${dist("qsv", "cb")}) AS td
       |        FROM qsv JOIN cb ON qsv.sub = cb.sub),
       |cand AS (SELECT casg.vec_id, p.qid
       |         FROM casg JOIN probes p ON casg.cluster = p.cluster
       |         WHERE casg.vec_id <> p.qid),
       |sc AS (SELECT c.vec_id, c.qid, CAST(sum(tbl.td) AS BIGINT) AS adc_dist
       |       FROM cand c
       |       JOIN enc ON enc.vec_id = c.vec_id
       |       JOIN tbl ON tbl.qid = c.qid AND tbl.sub = enc.sub AND tbl.code = enc.cluster
       |       GROUP BY c.vec_id, c.qid)
       |SELECT query_id, neighbor_id, rnk, adc_dist FROM (
       |  SELECT qid AS query_id, vec_id AS neighbor_id, adc_dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC) AS rnk
       |  FROM sc)
       |WHERE rnk <= $K""".stripMargin
  }

  /** knn_ivfpq_residual's oracle — the full IVFADC chain in CTEs:
    * coarse sums → integer centroids → rational-distance assignment →
    * residual vectors → residual-space Lloyd rounds (rsv replaces
    * pqCte's sv, same init/tie-break discipline) → residual codes →
    * per-(query, probed-cluster) residual ADC tables → candidate scoring
    * restricted to probed clusters → top-k. */
  private val knnIvfPqResidualSql: String = {
    val dsub = Dims / PqM
    val csums = (0 until Dims).map(i => s"CAST(sum(cq[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
    val cdist = (0 until Dims)
      .map(i => s"power(cc.n * v.q[${i + 1}] - cc.s_$i, 2)").mkString(" + ")
    val iccList = (0 until Dims).map(i => s"s_$i // n").mkString(", ")
    val sums = (0 until dsub).map(i => s"CAST(sum(sq[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
    val cents = (0 until dsub).map(i => s"s_$i // n AS c_$i").mkString(", ")
    def dist(sv: String, c: String) = (0 until dsub)
      .map(i => s"($sv.sq[${i + 1}] - $c.c_$i) * ($sv.sq[${i + 1}] - $c.c_$i)").mkString(" + ")
    def round(prev: String, n: String, c: String, d: String, a: String) =
      s"""$n AS (SELECT sub, g, CAST(count(*) AS BIGINT) AS n, $sums
         |       FROM rsv JOIN $prev USING (vec_id, sub) GROUP BY sub, g),
         |$c AS (SELECT sub, g, n, $cents FROM $n),
         |$d AS (SELECT rsv.vec_id, rsv.sub, $c.g, (${dist("rsv", c)}) AS dist
         |       FROM rsv JOIN $c ON rsv.sub = $c.sub),
         |$a AS (SELECT vec_id, sub, g FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, g ASC) AS rk
         |  FROM $d) WHERE rk = 1)""".stripMargin
    s"""WITH v AS (SELECT vec_id, $q AS q FROM embeddings),
       |cc AS (SELECT label, CAST(count(*) AS BIGINT) AS n, $csums
       |       FROM (SELECT label, $q AS cq FROM embeddings) GROUP BY label),
       |icc AS (SELECT label, [$iccList] AS cc FROM cc),
       |cd AS (SELECT v.vec_id, cc.label,
       |         ($cdist) / CAST(cc.n * cc.n AS DOUBLE) AS dist
       |       FROM v CROSS JOIN cc),
       |cranked AS (SELECT vec_id, label,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, label ASC) AS rk
       |  FROM cd),
       |casg AS (SELECT vec_id, label AS cluster FROM cranked WHERE rk = 1),
       |probes AS (SELECT vec_id AS qid, label AS cluster
       |  FROM cranked WHERE vec_id < 5 AND rk <= $NProbe),
       |rv AS (SELECT v.vec_id, casg.cluster,
       |         list_transform(generate_series(1, $Dims), i -> v.q[i] - icc.cc[i]) AS rq
       |       FROM v JOIN casg USING (vec_id) JOIN icc ON icc.label = casg.cluster),
       |subs AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS sub),
       |rsv AS (SELECT vec_id, sub, rq[sub*$dsub+1 : sub*$dsub+$dsub] AS sq
       |        FROM rv CROSS JOIN subs),
       |a0 AS (SELECT vec_id, sub,
       |         ${graft.text.PortableHash.duckH32(
                    "CAST(vec_id AS VARCHAR)||':'||CAST(sub AS VARCHAR)")} % $PqKsub AS g
       |       FROM rsv),
       |${round("a0", "n1", "c1", "d1", "a1")},
       |${round("a1", "n2", "c2", "d2", "a2")},
       |n3 AS (SELECT sub, g, CAST(count(*) AS BIGINT) AS n, $sums
       |       FROM rsv JOIN a2 USING (vec_id, sub) GROUP BY sub, g),
       |rcb AS (SELECT sub, g AS cluster, n, $cents FROM n3),
       |renc AS (SELECT vec_id, sub, cluster FROM (
       |  SELECT rsv.vec_id, rsv.sub, rcb.cluster, (${dist("rsv", "rcb")}) AS dist,
       |    row_number() OVER (PARTITION BY rsv.vec_id, rsv.sub
       |                       ORDER BY (${dist("rsv", "rcb")}) ASC, rcb.cluster ASC) AS rk
       |  FROM rsv JOIN rcb ON rsv.sub = rcb.sub) WHERE rk = 1),
       |qrv AS (SELECT p.qid, p.cluster,
       |          list_transform(generate_series(1, $Dims), i -> v.q[i] - icc.cc[i]) AS rq
       |        FROM probes p JOIN v ON v.vec_id = p.qid
       |        JOIN icc ON icc.label = p.cluster),
       |qrsv AS (SELECT qid, cluster, sub, rq[sub*$dsub+1 : sub*$dsub+$dsub] AS sq
       |         FROM qrv CROSS JOIN subs),
       |tbl AS (SELECT qrsv.qid, qrsv.cluster, qrsv.sub, rcb.cluster AS code,
       |          (${dist("qrsv", "rcb")}) AS td
       |        FROM qrsv JOIN rcb ON qrsv.sub = rcb.sub),
       |cand AS (SELECT casg.vec_id, casg.cluster, p.qid
       |         FROM casg JOIN probes p USING (cluster)
       |         WHERE casg.vec_id <> p.qid),
       |sc AS (SELECT c.vec_id, c.qid, CAST(sum(tbl.td) AS BIGINT) AS adc_dist
       |       FROM cand c
       |       JOIN renc ON renc.vec_id = c.vec_id
       |       JOIN tbl ON tbl.qid = c.qid AND tbl.cluster = c.cluster
       |                AND tbl.sub = renc.sub AND tbl.code = renc.cluster
       |       GROUP BY c.vec_id, c.qid)
       |SELECT query_id, neighbor_id, rnk, adc_dist FROM (
       |  SELECT qid AS query_id, vec_id AS neighbor_id, adc_dist,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc_dist ASC, vec_id ASC) AS rnk
       |  FROM sc)
       |WHERE rnk <= $K""".stripMargin
  }

  /** knn_pq_recall's truth leg: exact int64 squared-L2 brute force. */
  private val knnBruteL2Sql: String = {
    val dist = (0 until Dims)
      .map(i => s"(c.q[${i + 1}] - qs.q[${i + 1}]) * (c.q[${i + 1}] - qs.q[${i + 1}])").mkString(" + ")
    s"""WITH v AS (SELECT vec_id, $q AS q FROM embeddings),
       |qs AS (SELECT * FROM v WHERE vec_id < 5),
       |scored AS (
       |  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(($dist) AS BIGINT) AS l2_dist
       |  FROM v c JOIN qs ON c.vec_id <> qs.vec_id)
       |SELECT query_id, neighbor_id, rnk, l2_dist FROM (
       |  SELECT query_id, neighbor_id, l2_dist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY l2_dist ASC, neighbor_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= $K""".stripMargin
  }

  /** knn_sq_recall's measured leg: brute-force top-k over the CODE arrays
    * (same prep/score/rank shape as knnBruteSql). */
  private val knnSqBruteSql =
    s"""WITH $sqCodesCte,
       |prep AS (SELECT vec_id, q, ${VectorOps.duckQdot("q", "q")} AS sd FROM cv),
       |qs AS (SELECT * FROM prep WHERE vec_id < 5),
       |scored AS (
       |  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorOps.duckCosineBp(VectorOps.duckQdot("c.q", "qs.q"), "c.sd", "qs.sd")} AS cos_bp
       |  FROM prep c JOIN qs ON c.vec_id <> qs.vec_id)
       |SELECT query_id, neighbor_id, rnk, cos_bp FROM (
       |  SELECT query_id, neighbor_id, cos_bp,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_bp DESC, neighbor_id ASC) AS rnk
       |  FROM scored)
       |WHERE rnk <= $K""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // E50: the eigen invariants are literal trues (verified in-query —
    // DuckDB has no eigensolver), but trace_q is REAL cross-engine
    // arithmetic: n²·trace(cov) = Σ_d (n·Σq_d² − (Σq_d)²) recomputed
    // from the raw vectors in exact integers
    "emb_pca_spectrum" ->
      s"""WITH g AS (SELECT unnest(generate_series(1, $Dims)) AS i),
         |q0 AS (SELECT $q AS qv FROM embeddings),
         |per AS (SELECT g.i AS dim, CAST(count(*) AS BIGINT) AS n,
         |          CAST(sum(qv[g.i]*qv[g.i]) AS BIGINT) AS sxx,
         |          CAST(sum(qv[g.i]) AS BIGINT) AS sx
         |        FROM q0 CROSS JOIN g GROUP BY 1),
         |tr AS (SELECT CAST(sum(CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx) AS BIGINT) AS trace_q
         |       FROM per)
         |SELECT CAST(c.c AS BIGINT) AS component,
         |  true AS ok_unit, true AS ok_orth, true AS ok_eig,
         |  true AS ok_psd, true AS ok_trace, tr.trace_q
         |FROM (SELECT unnest(generate_series(1, 16)) AS c) c CROSS JOIN tr""".stripMargin,

    // the trained PQ codebook itself — sub, cluster, n, truncated-mean
    // coordinates; every Lloyd round is unrolled in the CTE
    "emb_pq_train" ->
      s"""WITH $pqCte
         |SELECT * FROM cb""".stripMargin,

    // per-vector code columns (the enc CTE pivoted to c0..c{m-1})
    "emb_pq_codes" -> {
      val cols = (0 until PqM)
        .map(i => s"CAST(max(CASE WHEN sub = $i THEN cluster END) AS BIGINT) AS c$i")
        .mkString(", ")
      s"""WITH $pqCte
         |SELECT vec_id, $cols FROM enc GROUP BY vec_id""".stripMargin
    },

    "knn_pq_adc" -> knnPqAdcSql,

    "knn_ivfpq" -> knnIvfPqSql,

    "knn_ivfpq_residual" -> knnIvfPqResidualSql,

    "emb_ivf_drift" -> {
      val sums = (0 until Dims).map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
      val num = (0 until Dims)
        .map(i => s"(CAST(c.n*t.s_$i - t.n*c.s_$i AS DOUBLE) * CAST(c.n*t.s_$i - t.n*c.s_$i AS DOUBLE))")
        .mkString(" + ")
      val den = "(CAST(t.n AS DOUBLE) * CAST(c.n AS DOUBLE))"
      s"""WITH t AS (SELECT label, CAST(count(*) AS BIGINT) AS n, $sums
         |           FROM (SELECT label, $q AS q FROM embeddings) GROUP BY label),
         |c AS (SELECT label, CAST(count(*) AS BIGINT) AS n, $sums
         |      FROM (SELECT label, $q AS q FROM embeddings
         |            WHERE vec_id % 10 <> 0 AND label <> 7) GROUP BY label)
         |SELECT COALESCE(t.label, c.label) AS cluster,
         |       t.n AS n_trained, c.n AS n_current,
         |       CASE WHEN t.n IS NOT NULL AND c.n IS NOT NULL
         |            THEN ($num) / ($den * $den) END AS drift2
         |FROM t FULL OUTER JOIN c ON t.label = c.label""".stripMargin
    },

    // residual recall against the exact truth — both legs already-oracled
    "knn_pqr_recall" ->
      s"""SELECT e.query_id, count(*) AS n_exact,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(floor(count(a.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
         |FROM ($knnBruteL2Sql) e
         |LEFT JOIN ($knnIvfPqResidualSql) a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY e.query_id""".stripMargin,

    // recall@k of ADC against the exact squared-L2 truth, both legs
    // already-oracled searches composed as subqueries
    "knn_pq_recall" ->
      s"""SELECT e.query_id, count(*) AS n_exact,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(floor(count(a.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
         |FROM ($knnBruteL2Sql) e
         |LEFT JOIN ($knnPqAdcSql) a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY e.query_id""".stripMargin,

    // recall@k of the SQ8 code-space search against the brute-force
    // truth — both legs already-oracled searches composed as subqueries
    "knn_sq_recall" ->
      s"""SELECT e.query_id, count(*) AS n_exact,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(floor(count(a.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
         |FROM ($knnBruteSql) e
         |LEFT JOIN ($knnSqBruteSql) a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY e.query_id""".stripMargin,

    // per-dim integer bounds over the SAME milli-unit quantization, then
    // the SAME clamped integer affine code: (x-mn)*255 // (mx-mn) — all
    // int64, no float anywhere, so the digests hash-match exactly.
    // dim is 1-based here = the 0-based element index + 1 on the Spark
    // side, so code_wsum weights align.
    "emb_sq_codes" ->
      s"""WITH q AS (SELECT vec_id, $q AS q FROM embeddings),
         |g AS (SELECT unnest(generate_series(1, $Dims)) AS i),
         |b AS (SELECT g.i AS dim, min(q.q[g.i]) AS mn, max(q.q[g.i]) AS mx
         |      FROM q CROSS JOIN g GROUP BY 1),
         |c AS (SELECT q.vec_id, b.dim,
         |        CASE WHEN b.mx > b.mn
         |             THEN ((least(b.mx, greatest(b.mn, q.q[b.dim])) - b.mn) * 255) // (b.mx - b.mn)
         |             ELSE 0 END AS code
         |      FROM q CROSS JOIN b)
         |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
         |       CAST(sum(code * dim) AS BIGINT) AS code_wsum,
         |       CAST(max(code) AS BIGINT) AS code_max
         |FROM c GROUP BY vec_id""".stripMargin,

    // assignment CTE = emb_ivf_assign's argmin over the dup-augmented
    // corpus, then within-cluster pairs and the greedy lower-id drop;
    // centroids = one hash-init round over kFlat(n) pseudo-labels (kdef
    // mirrors the Spark lambda's K ≈ √n — bounded clusters at sf10)
    "dedup_semantic" -> {
      val sums = (0 until Dims).map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
      val dist = (0 until Dims)
        .map(i => s"power(c.n * v.q[${i + 1}] - c.s_$i, 2)").mkString(" + ")
      val h = graft.text.PortableHash.duckH32("CAST(vec_id AS VARCHAR)")
      s"""WITH $kFlatSql,
         |corpus AS ($embDupSql),
         |v0 AS (SELECT vec_id, $q AS q FROM corpus),
         |v AS MATERIALIZED (SELECT vec_id, q, ${VectorOps.duckQdot("q", "q")} AS sd FROM v0),
         |c AS (SELECT label, CAST(count(*) AS BIGINT) AS n, $sums
         |      FROM (SELECT $h % (SELECT kk FROM kdef) AS label, $q AS q
         |            FROM embeddings) GROUP BY label),
         |-- argmin as a hash aggregate over SLIM (vec_id, label, dist) rows:
         |-- min(struct(dist, label)) is Spark's (dist, group) tie-break
         |-- exactly, and the n·K distance set never materializes with the
         |-- vector payload attached (the row_number-window form OOM'd the
         |-- oracle at sf10's 1e8 rows — q/sd rode through the sort)
         |d AS (SELECT v.vec_id, c.label,
         |        ($dist) / CAST(c.n * c.n AS DOUBLE) AS dist
         |      FROM v CROSS JOIN c),
         |am AS (SELECT vec_id, (min(struct_pack(d := dist, l := label))).l AS cluster
         |       FROM d GROUP BY vec_id),
         |-- MATERIALIZED: asg is referenced three times (both pair-join
         |-- sides + the final anti-join); inlined, DuckDB re-runs the
         |-- n·K argmin pipeline concurrently per reference and the
         |-- combination OOMs at sf10 — materialized it is 220 k rows
         |asg AS MATERIALIZED (SELECT v.vec_id, v.q, v.sd, am.cluster
         |        FROM v JOIN am USING (vec_id)),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE ${VectorOps.duckCosineBp(VectorOps.duckQdot("a.q", "b.q"), "a.sd", "b.sd")} >= $TauBp)
         |SELECT vec_id, cluster FROM asg
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin
    },

    "dedup_embed" ->
      s"""WITH prep AS (${prepSql(embDupSql)})
         |SELECT id_a, id_b, cos_bp FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${VectorOps.duckCosineBp(VectorOps.duckQdot("a.q", "b.q"), "a.sd", "b.sd")} AS cos_bp
         |  FROM prep a JOIN prep b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE cos_bp >= $TauBp""".stripMargin,

    "knn_brute" -> knnBruteSql,

    "knn_bucketed" ->
      s"""WITH prep AS (${prepSql(embDupSql)}),
         |qs AS (SELECT * FROM prep WHERE vec_id % 10 = 0 AND vec_id < 50),
         |scored AS (
         |  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${VectorOps.duckCosineBp(VectorOps.duckQdot("c.q", "qs.q"), "c.sd", "qs.sd")} AS cos_bp
         |  FROM prep c JOIN qs ON c.bucket = qs.bucket AND c.vec_id <> qs.vec_id)
         |SELECT query_id, neighbor_id, rnk, cos_bp FROM (
         |  SELECT query_id, neighbor_id, cos_bp,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos_bp DESC, neighbor_id ASC) AS rnk
         |  FROM scored)
         |WHERE rnk <= $K""".stripMargin,

    "emb_centroids" -> {
      val sums = (0 until Dims).map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s_$i").mkString(",\n  ")
      s"""SELECT label, count(*) AS n,
         |  $sums
         |FROM (SELECT label, $q AS q FROM embeddings)
         |GROUP BY label""".stripMargin
    },

    "emb_ivf_assign" -> {
      val sums = (0 until Dims).map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
      val dist = (0 until Dims)
        .map(i => s"power(c.n * v.q[${i + 1}] - c.s_$i, 2)").mkString(" + ")
      s"""WITH v AS (SELECT vec_id, $q AS q FROM embeddings),
         |c AS (SELECT label, CAST(count(*) AS BIGINT) AS n, $sums
         |      FROM (SELECT label, $q AS q FROM embeddings) GROUP BY label),
         |d AS (SELECT v.vec_id, c.label,
         |        ($dist) / CAST(c.n * c.n AS DOUBLE) AS dist
         |      FROM v CROSS JOIN c)
         |SELECT vec_id, label AS cluster FROM (
         |  SELECT vec_id, label,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, label ASC) AS rk
         |  FROM d)
         |WHERE rk = 1""".stripMargin
    },

    "emb_ivf_train" -> {
      val sums = (0 until Dims).map(i => s"CAST(sum(q[${i + 1}]) AS BIGINT) AS s_$i").mkString(", ")
      def distOf(c: String) = (0 until Dims)
        .map(i => s"power($c.n * v.q[${i + 1}] - $c.s_$i, 2)").mkString(" + ")
      s"""WITH v AS (SELECT vec_id, $q AS q FROM embeddings),
         |a0 AS (SELECT vec_id,
         |         ${graft.text.PortableHash.duckH32("CAST(vec_id AS VARCHAR)")} % $TrainK AS g
         |       FROM v),
         |c1 AS (SELECT g, CAST(count(*) AS BIGINT) AS n, $sums
         |       FROM v JOIN a0 USING (vec_id) GROUP BY g),
         |d1 AS (SELECT v.vec_id, c1.g,
         |         (${distOf("c1")}) / CAST(c1.n * c1.n AS DOUBLE) AS dist
         |       FROM v CROSS JOIN c1),
         |a1 AS (SELECT vec_id, g FROM (
         |  SELECT vec_id, g,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, g ASC) AS rk
         |  FROM d1) WHERE rk = 1),
         |c2 AS (SELECT g, CAST(count(*) AS BIGINT) AS n, $sums
         |       FROM v JOIN a1 USING (vec_id) GROUP BY g),
         |d2 AS (SELECT v.vec_id, c2.g,
         |         (${distOf("c2")}) / CAST(c2.n * c2.n AS DOUBLE) AS dist
         |       FROM v CROSS JOIN c2),
         |a2 AS (SELECT vec_id, g FROM (
         |  SELECT vec_id, g,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, g ASC) AS rk
         |  FROM d2) WHERE rk = 1)
         |SELECT g AS cluster, CAST(count(*) AS BIGINT) AS n, $sums
         |FROM v JOIN a2 USING (vec_id) GROUP BY g""".stripMargin
    },

    // E44t: both levels unrolled — level-1 is emb_ivf_train's recipe at
    // the tier-scaled kq; level-2 repeats it INSIDE each cell (join on cell instead
    // of a cross join — each vector sees only its own cell's children);
    // assignment probes the top-TreeProbe level-1 cells (rk <= probe
    // over dc, the same distance table the training descent used) and
    // the final argmin mirrors treeAssign's GLOBAL (dist, cell·k2+ch)
    // composite tie-break across the probed cells' children
    "emb_tree_assign" ->
      s"""WITH $treeTrainCtesSql,
         |pc AS (SELECT vec_id, g AS cell FROM (
         |  SELECT vec_id, g, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, g ASC) AS rk
         |  FROM dc) WHERE rk <= $TreeProbe),
         |vp AS (SELECT v.vec_id, v.q, pc.cell FROM v JOIN pc USING (vec_id)),
         |f AS (SELECT vp.vec_id, vp.cell, l2.ch, (${treeDist("l2", "vp")}) / CAST(l2.n * l2.n AS DOUBLE) AS dist
         |      FROM vp JOIN l2 ON vp.cell = l2.cell)
         |SELECT vec_id, CAST(cell * $kQ + ch AS BIGINT) AS cluster FROM (
         |  SELECT vec_id, cell, ch,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC, ch ASC) AS rk
         |  FROM f) WHERE rk = 1""".stripMargin,

    // E44×E44t: the tree trained on `embeddings` (shared prefix), the
    // DUP corpus assigned through both levels (top-TreeProbe l1 cells,
    // then the GLOBAL (dist, cell·k2+ch) composite argmin over those
    // cells' children in l2 — treeAssign's multi-probe tie-break),
    // then dedup_semantic's within-cluster lower-id drop over the
    // composite cell·k2+child clusters
    "dedup_semantic_tree" ->
      s"""WITH $treeTrainCtesSql,
         |u AS (SELECT vec_id, q, ${VectorOps.duckQdot("q", "q")} AS sd
         |      FROM (SELECT vec_id, $q AS q FROM ($embDupSql))),
         |ud AS (SELECT u.vec_id, l1.g, (${treeDist("l1", "u")}) / CAST(l1.n * l1.n AS DOUBLE) AS dist
         |       FROM u CROSS JOIN l1),
         |uc AS (SELECT u.vec_id, u.q, u.sd, cellof.g AS cell
         |       FROM u JOIN (SELECT vec_id, g FROM (
         |         SELECT vec_id, g, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, g ASC) AS rk
         |         FROM ud) WHERE rk <= $TreeProbe) cellof USING (vec_id)),
         |uf AS (SELECT uc.vec_id, uc.q, uc.sd, uc.cell, l2.ch,
         |         (${treeDist("l2", "uc")}) / CAST(l2.n * l2.n AS DOUBLE) AS dist
         |       FROM uc JOIN l2 ON uc.cell = l2.cell),
         |asg AS (SELECT vec_id, q, sd, CAST(cell * $kQ + ch AS BIGINT) AS cluster FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC, ch ASC) AS rk
         |  FROM uf) WHERE rk = 1),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE ${VectorOps.duckCosineBp(VectorOps.duckQdot("a.q", "b.q"), "a.sd", "b.sd")} >= $TauBp)
         |SELECT vec_id, cluster FROM asg
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,

    "knn_ivf" -> knnIvfSql,

    // recall@k of the IVF run against the brute-force truth, both legs
    // the already-checked oracles composed as subqueries
    "knn_recall" ->
      s"""SELECT e.query_id, count(*) AS n_exact,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(floor(count(a.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
         |FROM ($knnBruteSql) e
         |LEFT JOIN ($knnIvfSql) a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY e.query_id""".stripMargin,

    "mm_meta" ->
      """SELECT doc_id, 'application/octet-stream' AS mime,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS checksum,
        |  octet_length(encode(text)) % 640 + 1 AS width,
        |  octet_length(encode(text)) % 480 + 1 AS height,
        |  octet_length(encode(text)) % 30 + 1 AS frame_count
        |FROM documents""".stripMargin,

    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id, md5(text) AS checksum,
        |    octet_length(encode(text)) % 640 + 1 AS width,
        |    octet_length(encode(text)) % 480 + 1 AS height,
        |    octet_length(encode(text)) % 30 + 1 AS frame_count
        |  FROM documents)
        |SELECT doc_id, i AS frame_idx,
        |  md5(checksum || ':' || i) AS frame_checksum,
        |  (width + 1) // 2 AS out_width,
        |  (height + 1) // 2 AS out_height
        |FROM m, unnest(generate_series(1, frame_count, 7)) AS t(i)""".stripMargin
  )
}
