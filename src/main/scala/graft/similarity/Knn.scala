package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns.
  *
  * Scale design: the corpus is never self-cross-joined. Brute-force kNN
  * broadcasts the (small) query set against the distributed corpus — one
  * scan, no shuffle of the corpus. The bucketed variant assigns each vector
  * a 16-bit random-hyperplane sketch and joins on the bucket key, so
  * candidate generation is linear in bucket-pair sizes; at 100 TB the
  * bucket column also serves as a partition key so lookups prune partitions.
  */
object Knn {

  /** Final top-k by (cos_bp desc, vid asc) per query via the NATIVE
    * bounded-heap operator (graft.plans.TopKPerGroup): per-query groups
    * are candidate-set-sized — the entire corpus for brute force — so the
    * window form's per-group sort is the dominant cost at scale, while
    * the heap pass keeps k rows per query and never sorts the rest
    * (2.5x faster already at the 10x bench scale). */
  private def topkPerQuery(scored: DataFrame, k: Int): DataFrame =
    graft.operators.TopK.perGroup(scored, Seq("qid"),
      Seq(col("cos_bp").desc, col("vid").asc), k, rankCol = "rnk")
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rnk"), col("cos_bp"))

  /** Corpus with quantized vectors + exact self-dot. */
  def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
      col(idCol).as("vid"),
      VectorOps.quantize(col(vecCol)).as("qv"))
      .withColumn("self_dot", VectorOps.qdot(col("qv"), col("qv")))

  /** Score every (corpus, query) pair — queries broadcast — and keep the
    * per-query top-k. Both frames carry the prepared shape:
    * corpus (vid, qv, self_dot), queries (qid, qqv, qself). */
  private def bruteTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored = c.join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("dot", VectorOps.qdot(col("qv"), col("qqv")))
      .withColumn("cos_bp", VectorOps.cosineBp(col("dot"), col("self_dot"), col("qself")))
    topkPerQuery(scored, k)
  }

  /** Exact top-k cosine neighbors for each query vector (excluding self).
    * Output: query_id, neighbor_id, rnk, cos_bp. */
  def bruteForce(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    bruteTopK(
      prepared(corpus, idCol, vecCol),
      prepared(queries, idCol, vecCol)
        .select(col("vid").as("qid"), col("qv").as("qqv"), col("self_dot").as("qself")),
      k)

  /** Top-k cosine neighbors measured IN SQ8 CODE SPACE (the quantizer's
    * recall leg, E39): both sides encode through the same trained bounds
    * and score over the one-byte codes — exactly what a memory-resident
    * candidate pass over a quantized 100 TB corpus computes. Same
    * broadcast + bounded-heap shape as [[bruteForce]]. */
  def sqBruteForce(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      mn: Array[Long], mx: Array[Long], k: Int): DataFrame = {
    def prep(df: DataFrame) = sqEncode(df, idCol, vecCol, mn, mx)
      .select(col("vid"), col("codes").as("qv"))
      .withColumn("self_dot", VectorOps.qdot(col("qv"), col("qv")))
    bruteTopK(
      prep(corpus),
      prep(queries)
        .select(col("vid").as("qid"), col("qv").as("qqv"), col("self_dot").as("qself")),
      k)
  }

  /** Sketch-bucketed approximate neighbors: candidates share the 16-bit
    * hyperplane sketch; exact cosine + top-k within candidates. Trades
    * recall for a candidate set ~n/2^16 per bucket.
    *
    * `probes` > 0 turns on multiprobe: each query also searches every
    * bucket within hamming `probes` of its own sketch (16 extra buckets
    * per hamming step) — the standard fix for isolated queries landing in
    * singleton buckets and silently returning nothing. The corpus side is
    * untouched, so the probe fan-out rides the (broadcast) query side.
    */
  def bucketed(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int,
      probes: Int = 0): DataFrame = {
    require(probes <= 1, "only hamming<=1 multiprobe supported")
    val c = prepared(corpus, idCol, vecCol)
      .withColumn("bucket", VectorOps.sketch(col("qv"), dims))
    val q0 = prepared(queries, idCol, vecCol)
      .withColumn("bucket", VectorOps.sketch(col("qv"), dims))
      .select(col("vid").as("qid"), col("qv").as("qqv"),
        col("self_dot").as("qself"), col("bucket"))
    val q =
      if (probes == 0) q0
      else q0.select(col("qid"), col("qqv"), col("qself"),
        explode(array(col("bucket") +:
          (0 until 16).map(b => col("bucket").bitwiseXOR(lit(1L << b))): _*))
          .as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("dot", VectorOps.qdot(col("qv"), col("qqv")))
      .withColumn("cos_bp", VectorOps.cosineBp(col("dot"), col("self_dot"), col("qself")))
    topkPerQuery(scored, k)
  }

  /** Per-group centroid SUMS of quantized vectors (exact integers —
    * dividing by the count happens scaled, see ivfAssign). The coarse-
    * quantizer training step of an IVF index: one map-side-combined
    * aggregation over the corpus. Output: group, n, s_0..s_{dims-1}. */
  def centroidSums(df: DataFrame, groupCol: String, vecCol: String, dims: Int): DataFrame = {
    val q = VectorOps.quantize(col(vecCol)).as("__q")
    df.select(col(groupCol).as("group"), q)
      .groupBy("group")
      .agg(count(lit(1)).as("n"),
        (0 until dims).map(i => sum(element_at(col("__q"), i + 1)).as(s"s_$i")): _*)
  }

  /** Iterative IVF coarse-quantizer training — Lloyd's algorithm in the
    * same exact integer arithmetic as [[centroidSums]]/[[ivfAssign]],
    * so every round (and therefore the trained index) is
    * engine-reproducible. Init is a deterministic portable hash of the
    * vector id into k clusters; each round recomputes centroid SUMS from
    * the current assignment (map-side-combined aggregation, K rows) and
    * reassigns by broadcast argmin — per round: one aggregation + one
    * scan, no corpus shuffle beyond the sums.
    *
    * Runs `iters` reassignment rounds with early convergence detection
    * (one isEmpty job per round, like connectedComponents): when no
    * vector changed cluster the algorithm is at a Lloyd fixed point, so
    * stopping early provably equals running the remaining rounds — which
    * is why the fixed-round oracle stays exact. Assignments
    * localCheckpoint per round to truncate lineage (swap `checkpoint`
    * on a cluster for durability). Output matches [[centroidSums]]:
    * group, n, s_0..s_{dims-1} — drop-in for [[ivfSearch]] /
    * [[ivfWriteIndex]]. */
  def ivfTrain(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dims: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val p = prepared(corpus, idCol, vecCol).select(col("vid"), col("qv")).localCheckpoint()
    var assign = p.select(col("vid"),
      pmod(graft.text.PortableHash.h32(col("vid").cast("string")), lit(k.toLong))
        .as("group"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val next = nearestCentroids(p, sumsOfAssign(p, assign, dims), dims, keep = 1)
        .select(col("vid"), col("group")).localCheckpoint()
      converged = next
        .join(assign.withColumnRenamed("group", "__old"), "vid")
        .filter(col("group") =!= col("__old")).isEmpty
      assign = next
      it += 1
    }
    sumsOfAssign(p, assign, dims)
  }

  /** Centroid sums of an explicit (vid, group) assignment over a
    * prepared (vid, qv) corpus. */
  private def sumsOfAssign(p: DataFrame, assign: DataFrame, dims: Int): DataFrame =
    p.join(assign, "vid")
      .groupBy("group")
      .agg(count(lit(1)).as("n"),
        (0 until dims).map(i => sum(element_at(col("qv"), i + 1)).as(s"s_$i")): _*)

  /** Lloyd objective of a centroid set over a corpus: Σ_v min_c of the
    * scaled squared distance (exact |v − S_c/n_c|²·n_c²/n_c² rationals
    * evaluated in double only for the final sum). Monotonically
    * non-increasing over [[ivfTrain]] rounds — the training-progress
    * measure a test can pin without relying on recall luck. */
  def ivfObjective(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, dims: Int): Double =
    prepared(corpus, idCol, vecCol).select(col("vid"), col("qv"))
      .crossJoin(broadcast(centroids)).withColumn("__d", scaledDist2(dims))
      .groupBy("vid").agg(min(col("__d")).as("__dm"))
      .agg(sum(col("__dm"))).head().getDouble(0)

  /** Scaled squared distance to a centroid given as (n, s_0..s_{dims-1})
    * sums: argmin over centroids c of |v - S_c/n_c|² equals argmin of
    * |n_c·v - S_c|² / n_c², computed entirely in int64 — no float
    * rounding, so the result is engine-portable. The division happens as
    * a double ONLY for comparison (values differ by >= 1/n² when not
    * tied, far above double noise at these magnitudes). */
  private def scaledDist2(dims: Int) =
    (0 until dims)
      .map(i => pow(col("n") * element_at(col("qv"), i + 1) - col(s"s_$i"), 2))
      .reduce(_ + _) / (col("n") * col("n")).cast("double")

  /** Rank vectors' centroids by distance, keep the `keep` nearest.
    * Input must carry vid/qv; centroids are K rows (broadcast-sized).
    *
    * keep=1 (the corpus-sized assignment path) is an argmin computed by
    * the NATIVE fold expression ([[graft.functions.NearestCentroid]]):
    * the K-row centroid table rides the plan as a reference object and
    * every corpus row resolves in one codegen'd K·dims loop — zero row
    * blow-up, zero aggregate, zero exchange. (The previous min_by
    * aggregation had the right shuffle shape but planned a
    * SortAggregate — min_by's struct buffer is not hash-aggregable — so
    * every assignment paid a LOCAL SORT of all n·K distance rows; the
    * fold is bit-identical by construction, see the expression's
    * Scaladoc, and pinned by the unchanged oracles + SimilaritySpec.)
    * keep>1 (query-side probing, small by construction) keeps the
    * window form. Ties break on (dist, group) ascending in both forms.
    *
    * PRECONDITION: `vid` is unique in `p`. The fold path maps one input
    * row to one output row; a duplicated vid yields duplicated (equal)
    * assignment rows where the historical min_by groupBy collapsed them
    * — callers own the contract (every graft corpus carries a unique
    * id; dedupe vids first if yours doesn't). */
  private def nearestCentroids(p: DataFrame, centroids: DataFrame, dims: Int, keep: Int): DataFrame = {
    lazy val maybeSet = collectCentroidSet(centroids, dims)
    if (keep == 1 && maybeSet.isDefined) {
      val (set, gType) = maybeSet.get
      val carried = p.columns.filterNot(_ == "vid")
      val nearestCol = org.apache.spark.sql.GraftBridge.column(
        graft.functions.NearestCentroid(
          org.apache.spark.sql.GraftBridge.expression(col("qv")), set, gType))
      p.select(col("vid") +: nearestCol.as("group") +: carried.map(col): _*)
    } else {
      // keep>1 probing, an EMPTY centroid set (whose declarative cross
      // join correctly yields zero assignments), or a centroid table
      // past the plan-footprint cap (collectCentroidSet returns None —
      // the broadcast window form is the bit-identical fallback: same
      // scaled int64 distances, same (dist, group) tie-break)
      val joined = p.crossJoin(broadcast(centroids)).withColumn("__d", scaledDist2(dims))
      val w = Window.partitionBy(col("vid")).orderBy(col("__d").asc, col("group").asc)
      joined.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= keep)
    }
  }

  /** Hard cap on centroid tables serialized INTO the plan (the
    * NearestCentroid / TreeCentroidAssign reference objects). K·dims
    * longs are tiny by construction (K ≈ √n tops out ~10⁴ at 10⁸
    * vectors → ~5 MB), but nothing used to stop a caller passing an
    * unbounded "centroid" table and bloating every task binary
    * silently; past the cap the flat path falls back to the broadcast
    * window form and [[treeAssign]] refuses loudly. */
  val CentroidPlanMaxBytes: Long = 64L << 20

  /** The K-row centroid table as a plan-shippable [[graft.functions.CentroidSet]]
    * (+ the original group type — int for label centroids, long for
    * hash/tree groups). The collect is K rows, the exact set a broadcast
    * would ship; None for an empty table OR one past
    * [[CentroidPlanMaxBytes]] (callers fall back to the broadcast
    * window form, which ships the same rows per-executor instead of
    * per-plan). */
  private def collectCentroidSet(
      centroids: DataFrame, dims: Int): Option[(graft.functions.CentroidSet, org.apache.spark.sql.types.DataType)] = {
    val gType = centroids.schema("group").dataType
    // size check AFTER the collect (rows.length, not a count() action —
    // a pre-count would re-execute the whole centroid lineage; the
    // collect moves the same rows the broadcast fallback would)
    val rows = centroids.select(
      col("group").cast("long") +: col("n").cast("long") +:
        (0 until dims).map(i => col(s"s_$i").cast("long")): _*).collect()
    if (rows.isEmpty) None
    else if (rows.length.toLong * (dims + 2L) * 8L > CentroidPlanMaxBytes) {
      System.err.println(
        s"[graft] nearestCentroids: ${rows.length} centroids × $dims dims " +
          s"exceeds the plan-footprint cap ($CentroidPlanMaxBytes B) — " +
          "using the broadcast window form")
      None
    }
    else Some((graft.functions.CentroidSet(
      dims,
      rows.map(_.getLong(0)),
      rows.map(_.getLong(1)),
      rows.map(r => Array.tabulate(dims)(i => r.getLong(2 + i)))), gType))
  }

  /** Exact nearest-centroid assignment (IVF coarse quantization) in pure
    * integer arithmetic. Centroids are broadcast (there are K of them);
    * the corpus is scanned once. Output: idCol, cluster. */
  def ivfAssign(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, dims: Int): DataFrame =
    nearestCentroids(
      prepared(corpus, idCol, vecCol).select(col("vid"), col("qv")),
      centroids, dims, keep = 1)
      .select(col("vid").as(idCol), col("group").as("cluster"))

  /** nprobe nearest-centroid probes for a query set, ready for the
    * candidate join: qid, qqv, qself, cluster. */
  private[similarity] def queryProbes(
      queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, dims: Int, nprobe: Int): DataFrame =
    nearestCentroids(prepared(queries, idCol, vecCol), centroids, dims, keep = nprobe)
      .select(col("vid").as("qid"), col("qv").as("qqv"),
        col("self_dot").as("qself"), col("group").as("cluster"))

  /** Exact-cosine top-k of an assigned corpus (vid, qv, self_dot,
    * cluster) against broadcast probes. */
  private def topkAgainstProbes(c: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = c.join(broadcast(probes), Seq("cluster"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("dot", VectorOps.qdot(col("qv"), col("qqv")))
      .withColumn("cos_bp", VectorOps.cosineBp(col("dot"), col("self_dot"), col("qself")))
    topkPerQuery(scored, k)
  }

  /** Serve kNN from the IVF index (the search half of E7b/E7c): each
    * query probes its `nprobe` nearest centroids and scores ONLY corpus
    * vectors assigned to those clusters — the recall/cost dial of a
    * classical IVF index. Corpus vectors carry their (single) cluster
    * assignment, so probing several clusters never yields duplicate
    * candidates. Query probes are broadcast; the corpus is scanned once
    * with no corpus-side shuffle before the candidate join. For repeated
    * serving, persist the assignment with [[ivfWriteIndex]] instead of
    * recomputing it per query batch. Output matches bruteForce:
    * query_id, neighbor_id, rnk, cos_bp. */
  def ivfSearch(
      corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int, nprobe: Int): DataFrame = {
    val c = nearestCentroids(prepared(corpus, idCol, vecCol), centroids, dims, keep = 1)
      .select(col("vid"), col("qv"), col("self_dot"), col("group").as("cluster"))
    topkAgainstProbes(c, queryProbes(queries, centroids, idCol, vecCol, dims, nprobe), k)
  }

  /** Materialize the IVF index: quantized corpus vectors + self-dots,
    * written PARTITIONED BY cluster. A later search touches only its
    * probed clusters' directories — with K clusters and nprobe probes,
    * 1/K·nprobe of the index is read, which is the entire point of IVF
    * at 100 TB. Assignment cost is paid once at build time, not per
    * query batch. */
  def ivfWriteIndex(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, dims: Int, path: String): Unit =
    nearestCentroids(prepared(corpus, idCol, vecCol), centroids, dims, keep = 1)
      .select(col("vid"), col("qv"), col("self_dot"), col("group").as("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Accept a batch of NEW vectors into a persisted [[ivfWriteIndex]]
    * index without rebuilding it: the batch is assigned against the SAME
    * centroids the index was built with and appended into the existing
    * cluster directories — cost scales with the batch, and serving needs
    * no delta logic at all because parquet partition dirs absorb the new
    * files (DPP still prunes to probed clusters). The vector-family twin
    * of the dedup index's append path; quantizer drift is the caller's
    * compaction trigger: re-run [[ivfTrain]] + [[ivfWriteIndex]] when the
    * appended mass shifts the data distribution. */
  def ivfAppendIndex(
      batch: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, dims: Int, path: String,
      checkIds: Boolean = true): Unit = {
    if (checkIds) {
      // a re-appended batch (retry, overlapping feeds) would duplicate
      // vectors silently — each copy then competes in top-k and displaces
      // a true neighbor. One column-pruned scan of the index's id column;
      // disable only when the caller guarantees id freshness.
      val spark = batch.sparkSession
      val existing = spark.read.parquet(path).select(col("vid"))
      val clash = prepared(batch, idCol, vecCol).select("vid")
        .join(existing, Seq("vid"), "left_semi")
      require(clash.isEmpty,
        "ivfAppendIndex: batch vector ids already present in the index (e.g. " +
          clash.take(3).map(_.get(0)).mkString(", ") +
          ") — appending would duplicate them in every probed top-k; " +
          "dedupe ids or rebuild with ivfWriteIndex")
    }
    nearestCentroids(prepared(batch, idCol, vecCol), centroids, dims, keep = 1)
      .select(col("vid"), col("qv"), col("self_dot"), col("group").as("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(path)
  }

  /** Serve kNN from a persisted [[ivfWriteIndex]] index. The broadcast
    * probe join's cluster keys drive dynamic partition pruning on the
    * index scan, so only probed cluster directories are read. */
  def ivfSearchIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dims: Int, nprobe: Int): DataFrame =
    topkAgainstProbes(spark.read.parquet(path),
      queryProbes(queries, centroids, idCol, vecCol, dims, nprobe), k)

  /** E39: INT8 scalar quantization (SQ8) training — per-dimension [min,
    * max] over the milli-unit-quantized corpus. The storage/bandwidth
    * scale play for embedding corpora: float32 → one byte per dimension
    * (8x smaller in flight and at rest), the difference between an
    * ANN candidate pass that reads 100 TB of vectors and one that reads
    * 12.5 TB. Everything stays in exact integer space (the VectorOps
    * convention), so codes are bit-identical in every engine — no float
    * rounding anywhere in train or encode.
    *
    * One map-side-combined aggregation (posexplode → groupBy(dim) hash
    * agg: the shuffle carries dims × input-partitions partial rows, not
    * the corpus); output is `dims` rows (dim, mn, mx). */
  def sqTrain(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(VectorOps.quantize(col(vecCol))).as(Seq("dim", "x")))
      .groupBy("dim").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** Collect trained bounds to driver arrays (dims rows — driver-sized by
    * construction, like the LSH hyperplanes), for embedding as literals
    * in the encode plan. */
  def sqBounds(train: DataFrame, dims: Int): (Array[Long], Array[Long]) = {
    val rows = train.select(col("dim"), col("mn"), col("mx")).collect()
    require(rows.length == dims,
      s"sqBounds: trained ${rows.length} dims, expected $dims")
    val mn = new Array[Long](dims)
    val mx = new Array[Long](dims)
    rows.foreach { r => mn(r.getInt(0)) = r.getLong(1); mx(r.getInt(0)) = r.getLong(2) }
    (mn, mx)
  }

  /** SQ8 encode: exact integer affine code per dimension,
    * `((clamp(x) - mn) * 255) div (mx - mn)` ∈ [0, 255] (floor division
    * on a clamped nonnegative numerator — no rounding-rule divergence
    * between engines; a degenerate dimension mn = mx codes as 0). Bounds
    * ride the plan as literal arrays: no join, no broadcast variable,
    * fully codegen'd `transform`. Out-of-corpus vectors clamp into the
    * trained range, the standard SQ behavior. */
  def sqEncode(
      df: DataFrame, idCol: String, vecCol: String,
      mn: Array[Long], mx: Array[Long]): DataFrame = {
    val mnA = array(mn.map(lit): _*)
    val mxA = array(mx.map(lit): _*)
    val codes = transform(VectorOps.quantize(col(vecCol)), (x, i) => {
      val lo = element_at(mnA, i + 1)
      val hi = element_at(mxA, i + 1)
      val clamped = least(hi, greatest(lo, x))
      when(hi > lo,
        org.apache.spark.sql.GraftBridge.column(
          new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.GraftBridge.expression((clamped - lo) * lit(255L)),
            org.apache.spark.sql.GraftBridge.expression(hi - lo))))
        .otherwise(lit(0L))
    })
    df.select(col(idCol).as("vid"), codes.as("codes"))
  }

  /** SemDeDup-style CLUSTER-SCOPED semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its nearest centroid, then
    * compare pairs ONLY within a cluster and drop any vector that has a
    * higher-priority (lower-id) same-cluster neighbor at cosine ≥ tauBp.
    * The greedy priority rule keeps exactly the first vector of every
    * semantic-duplicate chain — deterministic, engine-portable, no RNG.
    *
    * The design point vs [[embeddingDupPairs]] (global sketch buckets):
    * candidate mass here is Σ cluster² — the caller sizes K so clusters
    * stay bounded (K ~ √n keeps cluster² ~ n), and cross-cluster
    * near-dups are MISSED BY DESIGN, the recall/cost trade the SemDeDup
    * paper makes for web-scale corpora. Shuffle shape: one exchange by
    * cluster for the pair join (AQE splits skewed clusters), one
    * broadcast-able anti-join of the drop set; the corpus is never
    * globally self-joined.
    *
    * Output: vec `idCol`, cluster, for every SURVIVING vector. */
  def semanticDedup(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, tauBp: Long, dims: Int): DataFrame = {
    val assigned = nearestCentroids(
      prepared(corpus, idCol, vecCol), centroids, dims, keep = 1)
      .select(col("vid"), col("qv"), col("self_dot"), col("group").as("cluster"))
    semanticDropCore(assigned, tauBp).select(col("vid").as(idCol), col("cluster"))
  }

  /** [[semanticDedup]] over an EXPLICIT cluster column — the entry the
    * two-level quantizer feeds ([[treeAssign]]'s cells are the scopes),
    * and the hook for any external clustering (labels, a persisted
    * index's partitions). Same greedy keep-lowest-id rule, same shuffle
    * shape. Output: idCol, cluster (surviving vectors). */
  def semanticDedupAssigned(
      corpus: DataFrame, idCol: String, vecCol: String, clusterCol: String,
      tauBp: Long): DataFrame = {
    val assigned = corpus.select(
      col(idCol).as("vid"),
      VectorOps.quantize(col(vecCol)).as("qv"),
      col(clusterCol).as("cluster"))
      .withColumn("self_dot", VectorOps.qdot(col("qv"), col("qv")))
    semanticDropCore(assigned, tauBp).select(col("vid").as(idCol), col("cluster"))
  }

  /** Shared SemDeDup core over an assigned (vid, qv, self_dot, cluster)
    * frame: within-cluster pairs, drop any vector with a lower-id
    * same-cluster neighbor at ≥ tauBp cosine.
    *
    * The assigned frame is consumed THREE times (both pair legs + the
    * final anti-join), and for the tree path it carries the multi-probe
    * descent — the r14 before-plan re-ran the whole assignment per leg
    * (40 uncached corpus scans in dedup_semantic_tree). localCheckpointed
    * here (eager; ContextCleaner-cleaned, unlike a cache() entry, which
    * a lazy plan-builder can never unpersist): it is the SemDeDup
    * working set (vid, quantized vec, cluster), the frame a production
    * run would materialize anyway. */
  private def semanticDropCore(assigned0: DataFrame, tauBp: Long): DataFrame = {
    val assigned = assigned0.localCheckpoint()
    val l = assigned.select(col("cluster"), col("vid").as("id_a"),
      col("qv").as("qa"), col("self_dot").as("da"))
    val r = assigned.select(col("cluster"), col("vid").as("id_b"),
      col("qv").as("qb"), col("self_dot").as("db"))
    val dropped = l.join(r, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorOps.cosineBp(
        VectorOps.qdot(col("qa"), col("qb")), col("da"), col("db")) >= tauBp)
      .select(col("id_b").as("vid")).distinct()
    assigned.join(dropped, Seq("vid"), "left_anti")
      .select(col("vid"), col("cluster"))
  }

  /** TWO-LEVEL (hierarchical) coarse quantizer — the assignment-cost fix
    * that keeps bounded-cluster SemDeDup sub-quadratic end to end: flat
    * assignment at K = k1·k2 cells costs n·K distance rows, the tree
    * resolves each vector in n·(k1+k2) (level-1 argmin, then argmin among
    * that cell's k2 children only). Level 2 runs exact integer Lloyd
    * independently inside EVERY level-1 cell in ONE job — the cell id
    * rides the aggregation key, the [[Pq.train]] recipe — with the same
    * hash init (`h32(vid) % k2`), truncated-integer sums, and
    * (dist, child) tie-break as [[ivfTrain]], so the tree is
    * engine-reproducible. Children provably refine their parent: level-2
    * centroids aggregate only their own cell's members, so a vector's
    * child always lives inside its level-1 cell.
    *
    * Returns (level1, level2): level1 in [[centroidSums]] shape (group =
    * cell), level2 with columns cell, group (child), n, s_0..s_{dims-1}.
    * `tools.SemDedupScale` measures flat-vs-tree at sf0.1/1/10. */
  def ivfTrain2(
      corpus: DataFrame, idCol: String, vecCol: String,
      k1: Int, k2: Int, iters: Int, dims: Int): (DataFrame, DataFrame) = {
    require(k1 >= 1 && k2 >= 1, s"k1/k2 must be >= 1, got $k1/$k2")
    val l1 = ivfTrain(corpus, idCol, vecCol, k1, iters, dims)
    val cells = nearestCentroids(
      prepared(corpus, idCol, vecCol).select(col("vid"), col("qv")), l1, dims, keep = 1)
      .select(col("vid"), col("qv"), col("group").as("cell"))
      .localCheckpoint()
    var assign = cells.select(col("vid"), col("cell"),
      pmod(graft.text.PortableHash.h32(col("vid").cast("string")), lit(k2.toLong))
        .as("child"))
      .localCheckpoint()
    def sums(a: DataFrame): DataFrame =
      cells.join(a.select(col("vid"), col("child")), "vid")
        .groupBy(col("cell"), col("child"))
        .agg(count(lit(1)).as("n"),
          (0 until dims).map(i => sum(element_at(col("qv"), i + 1)).as(s"s_$i")): _*)
    for (_ <- 0 until iters) {
      // reassign within the OWN cell only, via the native per-row child
      // argmin (graft.functions.NearestChild) — the per-round join +
      // min_by SortAggregate over n·k2 rows is gone; the per-round
      // child table ships as a reference object (K-row collect, the
      // same rows the broadcast moved). (dist, child) tie-break as the
      // old struct(__d, group) min_by. A cell that contributed to the
      // sums always has children, so the null filter is a no-op guard.
      val rows = sums(assign).select(
        col("cell").cast("long") +: col("child").cast("long") +:
          col("n").cast("long") +:
          (0 until dims).map(i => col(s"s_$i").cast("long")): _*).collect()
      val cs = graft.functions.CellChildren(
        dims,
        rows.map(_.getLong(0)), rows.map(_.getLong(1)), rows.map(_.getLong(2)),
        rows.map(r => Array.tabulate(dims)(i => r.getLong(3 + i))))
      val childCol = org.apache.spark.sql.GraftBridge.column(
        graft.functions.NearestChild(
          org.apache.spark.sql.GraftBridge.expression(col("qv")),
          org.apache.spark.sql.GraftBridge.expression(col("cell")), cs))
      assign = cells
        .select(col("vid"), col("cell"), childCol.as("child"))
        .filter(col("child").isNotNull)
        .localCheckpoint()
    }
    (l1, sums(assign).withColumnRenamed("child", "group"))
  }

  /** Assign every vector through the two-level tree: level-1 ranking
    * over k1 cells, then argmin among the probed cells' children —
    * n·(k1+probe·k2) distance rows instead of flat n·(k1·k2). The
    * composite cluster id `cell·k2 + child` is stable and disjoint
    * across cells.
    *
    * `probe` is the descent-recall dial (the E7d nprobe pattern applied
    * to ASSIGNMENT): greedy probe=1 descends only the nearest level-1
    * cell and diverges from the flat argmin whenever the true nearest
    * child lives in the runner-up cell — measured 85.4% → 71.7%
    * agreement across the sf0.1 → sf10 decade legs (BENCH_decade_r16).
    * Probing the top-p cells and taking the GLOBAL (dist, composite-id)
    * argmin over their p·k2 children recovers it; at probe = k1 the
    * result provably EQUALS the flat argmin over the composite centroid
    * set (all children considered, same tie-break — pinned in
    * SimilaritySpec). Ties break on (dist, cell·k2+child), which inside
    * a single cell reduces to the old (dist, child) rule, so probe=1 is
    * bit-identical to the historical greedy path.
    *
    * Scale shape of the probe>1 cell selection: no corpus-sized window —
    * one map-side-combinable aggregation collects each vector's k1
    * (dist, cell) pairs (k1 structs of 16 bytes, bounded by the centroid
    * count), array-sorts, keeps `probe`; qv rides the same aggregation
    * via first() so there is no join-back. Output: idCol, cluster. */
  def treeAssign(
      corpus: DataFrame, level1: DataFrame, level2: DataFrame,
      idCol: String, vecCol: String, k2: Int, dims: Int,
      probe: Int = 1): DataFrame = {
    require(probe >= 1, s"treeAssign: probe must be >= 1, got $probe")
    val p = prepared(corpus, idCol, vecCol).select(col("vid"), col("qv"))
    // both levels ride the plan as ONE reference object and every row
    // resolves in a single codegen'd call — no ranking aggregate, no
    // min_by SortAggregate, no fan-out (see TreeCentroidAssign's
    // bit-exactness note; the declarative form this replaces is
    // preserved in git history and pinned equal by SimilaritySpec)
    val l1Rows = level1.select(
      col("group").cast("long") +: col("n").cast("long") +:
        (0 until dims).map(i => col(s"s_$i").cast("long")): _*).collect()
    val l2Rows = level2.select(
      col("cell").cast("long") +: col("group").cast("long") +:
        col("n").cast("long") +:
        (0 until dims).map(i => col(s"s_$i").cast("long")): _*).collect()
    // empty quantizer level (e.g. trained on an empty corpus): every
    // vector's probed cells are childless, so the assignment is empty —
    // the historical broadcast-join form's empty-in/empty-out behavior,
    // preserved instead of a require()
    if (l1Rows.isEmpty || l2Rows.isEmpty)
      return p.select(col("vid").as(idCol), lit(0L).as("cluster"))
        .filter(lit(false))
    require(
      (l1Rows.length.toLong + l2Rows.length.toLong) * (dims + 3L) * 8L
        <= CentroidPlanMaxBytes,
      s"treeAssign: quantizer tables (${l1Rows.length} cells + " +
        s"${l2Rows.length} children × $dims dims) exceed the plan-footprint " +
        s"cap ($CentroidPlanMaxBytes B) — retrain with smaller k1·k2")
    val set = graft.functions.TreeCentroidSet(
      dims, k2.toLong, probe,
      l1Rows.map(_.getLong(0)), l1Rows.map(_.getLong(1)),
      l1Rows.map(r => Array.tabulate(dims)(i => r.getLong(2 + i))),
      l2Rows.map(_.getLong(0)), l2Rows.map(_.getLong(1)), l2Rows.map(_.getLong(2)),
      l2Rows.map(r => Array.tabulate(dims)(i => r.getLong(3 + i))))
    val assignCol = org.apache.spark.sql.GraftBridge.column(
      graft.functions.TreeCentroidAssign(
        org.apache.spark.sql.GraftBridge.expression(col("qv")), set))
    p.select(col("vid").as(idCol), assignCol.as("cluster"))
      // a vector whose every probed cell is childless: the inner join's
      // row-drop semantics, surfaced as the expression's NULL
      .filter(col("cluster").isNotNull)
  }

  /** Quantizer DRIFT — the measurement behind the index-rebuild trigger
    * the append paths ([[ivfAppendIndex]], [[Pq.appendIndex]]) delegate
    * to the caller: per cluster, the squared distance between the
    * TRAINED centroid and the centroid of the cluster's CURRENT members,
    * in the same scaled-rational arithmetic as the assignment —
    * |S/n − S'/n'|² = Σ_i (n'·S_i − n·S'_i)² / (n·n')². The differences
    * are exact int64; each is squared and summed as an explicit
    * left-assoc double chain, and the denominator is squared by explicit
    * multiplication (never `pow`), so both engines run the identical
    * IEEE sequence and the doubles hash-match.
    *
    * One-sided clusters surface with null counts instead of vanishing:
    * a trained cluster with no current members (`n_current` null) means
    * the data moved away from it; a current cluster never trained
    * (`n_trained` null) cannot happen with argmin assignment but does
    * when `current` comes from labels — both are rebuild signals.
    *
    * Cost: both inputs are K-row centroid-sum frames ([[centroidSums]] /
    * [[ivfTrain]] output) — this is a K-row full-outer join, a scan of
    * nothing; the corpus was already paid when the sums were built.
    * Exact while |n'·S_i| < 2⁶³ (counts × milli-sums — holds through
    * ~10⁹-vector clusters). Output: cluster, n_trained, n_current,
    * drift2 (null when one-sided). CLI: `Cli ann drift` prints
    * worst-first. */
  def centroidDrift(trained: DataFrame, current: DataFrame, dims: Int): DataFrame = {
    val t = trained.select((col("group").as("cluster") +: col("n").as("__nt") +:
      (0 until dims).map(i => col(s"s_$i").as(s"__t_$i"))): _*)
    val c = current.select((col("group").as("cluster") +: col("n").as("__nc") +:
      (0 until dims).map(i => col(s"s_$i").as(s"__c_$i"))): _*)
    val num = (0 until dims).map { i =>
      val d = (col("__nc") * col(s"__t_$i") - col("__nt") * col(s"__c_$i")).cast("double")
      d * d
    }.reduce(_ + _)
    val den = col("__nt").cast("double") * col("__nc").cast("double")
    t.join(c, Seq("cluster"), "full_outer")
      .select(
        col("cluster"),
        col("__nt").as("n_trained"),
        col("__nc").as("n_current"),
        when(col("__nt").isNotNull && col("__nc").isNotNull, num / (den * den))
          .as("drift2"))
  }

  /** Embedding near-dup pairs: sketch-bucket candidates, exact cosine
    * verify at tauBp. Output: id_a, id_b, cos_bp. */
  def embeddingDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      tauBp: Long, dims: Int): DataFrame = {
    val p = prepared(df, idCol, vecCol)
      .withColumn("bucket", VectorOps.sketch(col("qv"), dims))
    val l = p.select(col("bucket"), col("vid").as("id_a"),
      col("qv").as("qa"), col("self_dot").as("da"))
    val r = p.select(col("bucket"), col("vid").as("id_b"),
      col("qv").as("qb"), col("self_dot").as("db"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", VectorOps.qdot(col("qa"), col("qb")))
      .withColumn("cos_bp", VectorOps.cosineBp(col("dot"), col("da"), col("db")))
      .filter(col("cos_bp") >= tauBp)
      .select(col("id_a"), col("id_b"), col("cos_bp"))
      .distinct()
  }
}
