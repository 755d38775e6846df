package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ, Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the codebook half of the classical
  * IVF+PQ billion-scale ANN stack ([[Knn.ivfTrain]] being the coarse
  * half, [[Knn.sqTrain]] the scalar alternative): each vector is split
  * into `m` subvectors, each subspace gets its own `ksub`-centroid
  * codebook, and a vector compresses to `m` one-byte codes — 64 float32
  * dims → 4 bytes here (64× smaller), with distances served from
  * per-query lookup tables instead of the raw vectors (ADC, asymmetric
  * distance computation).
  *
  * Everything runs in the exact integer space of [[VectorOps.quantize]]
  * (milli-unit longs): centroids are TRUNCATED integer division of sums
  * (`div` — matches DuckDB's `//` on integers exactly), distances are
  * pure int64 squared-L2, ties break by cluster id — so train, encode,
  * and ADC search are all engine-bit-identical and oracle-checkable,
  * the same discipline as the IVF/SQ8 family.
  *
  * Scale shape: training aggregates per (subspace, cluster) — m·ksub
  * rows, map-side combined; assignment is a broadcast argmin over
  * m·ksub centroid rows; ADC scoring shuffles (vector, query) partial
  * sums, never the raw corpus; nothing is ever all-pairs.
  */
object Pq {

  /** (vid, sub, sq) from an ALREADY-integer vector expression — the shared
    * splitter under [[subvectors]] (quantized floats) and the residual
    * path (integer differences). */
  private[similarity] def subvectorsQ(
      df: DataFrame, idCol: String, qvec: Column, m: Int, dims: Int): DataFrame = {
    require(dims % m == 0, s"PQ: dims=$dims not divisible by m=$m subspaces")
    val dsub = dims / m
    df.select(col(idCol).as("vid"),
      explode(array((0 until m).map(s =>
        struct(lit(s.toLong).as("sub"), slice(qvec, s * dsub + 1, dsub).as("sq"))): _*))
        .as("__e"))
      .select(col("vid"), col("__e.sub").as("sub"), col("__e.sq").as("sq"))
  }

  /** (vid, sub, sq) — each quantized vector split into `m` contiguous
    * subvectors of dims/m milli-unit longs. */
  private[similarity] def subvectors(
      df: DataFrame, idCol: String, vecCol: String, m: Int, dims: Int): DataFrame =
    subvectorsQ(df, idCol, VectorOps.quantize(col(vecCol)), m, dims)

  /** Truncated integer division — Spark's IntegralDivide (`div`), which
    * rounds toward zero exactly like DuckDB's integer `//`. */
  private def tdiv(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Exact int64 squared L2 between a subvector column and centroid
    * columns c_0..c_{dsub-1}. */
  private def dist2(sq: Column, dsub: Int): Column =
    (0 until dsub).map { i =>
      val d = element_at(sq, i + 1) - col(s"c_$i")
      d * d
    }.reduce(_ + _)

  /** Centroids of an explicit (vid, sub, group) assignment: per
    * (subspace, cluster) counts and truncated-mean coordinates.
    * Output: sub, cluster, n, c_0..c_{dsub-1}. */
  private def centroidsOf(sv: DataFrame, assign: DataFrame, dsub: Int): DataFrame =
    sv.join(assign, Seq("vid", "sub"))
      .groupBy(col("sub"), col("group"))
      .agg(count(lit(1)).as("n"),
        (0 until dsub).map(i => sum(element_at(col("sq"), i + 1)).as(s"s_$i")): _*)
      .select(col("sub") +: col("group").as("cluster") +: col("n") +:
        (0 until dsub).map(i => tdiv(col(s"s_$i"), col("n")).as(s"c_$i")): _*)

  /** Reassign every (vid, sub) to its nearest centroid — broadcast argmin
    * over the m·ksub codebook rows, combining map-side; ties break
    * (dist, cluster) ascending. The ordering PACKS into one long —
    * dist2 is an exact nonnegative int64 and cluster < PackK — so the
    * aggregate is a plain hash `min` (a min_by struct buffer is not
    * hash-aggregable and planned a SortAggregate over every corpus·ksub
    * candidate row). Exact while dist2 < 2⁶³/PackK ≈ 1.4e14, i.e.
    * |x| ≤ ~2·10³ floats at dsub ≤ 64 — the same magnitude contract the
    * int64 dist2 itself already carries for unit-scale embeddings, and
    * ENFORCED per candidate row: a dist2 beyond the packed range raises
    * instead of wrapping negative and returning silently wrong codes. */
  private val PackK = 65536L
  // largest dist2 the pack can carry without wrapping: dist2·PackK +
  // cluster must stay < 2⁶³. Exceeding it is a DATA contract violation
  // (quantized magnitudes ≳ 2·10³ at dsub ≤ 64) that non-ANSI Spark
  // would otherwise turn into a silently-wrong argmin, so the guard is
  // enforced per candidate row — one long compare inside the same
  // codegen'd projection, no extra pass (measured in the BENCH suite's
  // PQ rows: noise-band).
  private val MaxPackDist2 = (Long.MaxValue - (PackK - 1)) / PackK
  private def assignTo(sv: DataFrame, codebook: DataFrame, dsub: Int): DataFrame = {
    val d = dist2(col("sq"), dsub)
    val guarded = when(d <= lit(MaxPackDist2), d).otherwise(raise_error(concat(
      lit(s"PQ.assignTo: dist2 exceeds the packed-argmin range (2^63/$PackK); " +
        "quantized sub-vector magnitudes are outside the int64 contract: "),
      d.cast("string"))))
    sv.join(broadcast(codebook), Seq("sub"))
      .withColumn("__p", guarded * lit(PackK) + col("cluster"))
      .groupBy(col("vid"), col("sub"))
      .agg(pmod(min(col("__p")), lit(PackK)).as("group"))
  }

  /** Train the PQ codebooks: `iters` Lloyd rounds per subspace from a
    * deterministic hash init (`h32(vid:sub) % ksub`), exactly the
    * [[Knn.ivfTrain]] recipe applied independently in each of the `m`
    * subspaces — one job trains all m codebooks at once (the subspace is
    * just part of the aggregation key). Early-converged subspaces are at
    * a Lloyd fixed point, so running the remaining rounds is the
    * identity and the fixed-round oracle stays exact.
    * Output: sub, cluster, n, c_0..c_{dims/m-1}. */
  def train(
      corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, dims: Int): DataFrame =
    trainQ(corpus, idCol, VectorOps.quantize(col(vecCol)), m, ksub, iters, dims)

  /** [[train]] over an already-integer vector expression (the residual
    * path trains on integer differences, not quantized floats). */
  def trainQ(
      corpus: DataFrame, idCol: String, qvec: Column,
      m: Int, ksub: Int, iters: Int, dims: Int): DataFrame = {
    require(ksub >= 1, s"PQ: ksub must be >= 1, got $ksub")
    require(ksub <= PackK, s"PQ: ksub must be <= $PackK (code packing), got $ksub")
    val dsub = dims / m
    val sv = subvectorsQ(corpus, idCol, qvec, m, dims).localCheckpoint()
    var assign = sv.select(col("vid"), col("sub"),
      pmod(graft.text.PortableHash.h32(
        concat(col("vid").cast("string"), lit(":"), col("sub").cast("string"))),
        lit(ksub.toLong)).as("group"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      assign = assignTo(sv, centroidsOf(sv, assign, dsub), dsub).localCheckpoint()
    }
    centroidsOf(sv, assign, dsub)
  }

  /** Encode the corpus against a trained codebook: m one-byte codes per
    * vector (nearest centroid per subspace, broadcast argmin), packed in
    * subspace order. Output: vid, codes (array<bigint> of length m). */
  def encode(
      corpus: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int, dims: Int): DataFrame =
    encodeQ(corpus, codebook, idCol, VectorOps.quantize(col(vecCol)), m, dims)

  /** [[encode]] over an already-integer vector expression. */
  def encodeQ(
      corpus: DataFrame, codebook: DataFrame,
      idCol: String, qvec: Column, m: Int, dims: Int): DataFrame =
    assignTo(subvectorsQ(corpus, idCol, qvec, m, dims), codebook, dims / m)
      .groupBy(col("vid"))
      .agg(array_sort(collect_list(struct(col("sub"), col("group")))).as("__sc"))
      .select(col("vid"),
        transform(col("__sc"), e => e.getField("group")).as("codes"))

  /** ADC top-k: exact-integer asymmetric distance from full-precision
    * queries to the PQ-coded corpus. Per query the distance to EVERY
    * (subspace, centroid) pair is tabulated once (queries × m × ksub
    * rows — broadcast-sized by construction), then a coded vector's
    * distance is the sum of m table lookups — the ADC trick that reads
    * codes, never raw vectors, which is the entire I/O story of PQ at
    * 100 TB. Shuffle carries (vector, query) partial sums (map-side
    * combined); top-k rides the native bounded-heap operator.
    * Output: query_id, neighbor_id, rnk, adc_dist. */
  def adcSearch(
      corpusCodes: DataFrame, codebook: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int, dims: Int): DataFrame = {
    val dsub = dims / m
    val table = subvectors(queries, idCol, vecCol, m, dims)
      .withColumnRenamed("vid", "qid")
      .join(codebook, Seq("sub"))
      .select(col("qid"), col("sub"), col("cluster"),
        dist2(col("sq"), dsub).as("__td"))
    val scored = corpusCodes
      .select(col("vid"), posexplode(col("codes")).as(Seq("__p", "cluster")))
      .withColumn("sub", col("__p").cast("int"))
      .join(broadcast(table), Seq("sub", "cluster"))
      .filter(col("vid") =!= col("qid"))
      .groupBy(col("vid"), col("qid"))
      .agg(sum(col("__td")).as("adc_dist"))
    graft.operators.TopK.perGroup(scored, Seq("qid"),
      Seq(col("adc_dist").asc, col("vid").asc), k, rankCol = "rnk")
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rnk"), col("adc_dist"))
  }

  /** IVF+PQ — the composed billion-scale serving stack (Jégou 2011 §V):
    * queries probe their `nprobe` nearest COARSE centroids
    * ([[Knn.queryProbes]], the IVF half), and only vectors assigned to
    * those clusters are scored — by ADC over their m-byte codes, never
    * their raw floats. At 100 TB the scan reads 1/K·nprobe of the
    * corpus (cluster-partitioned, DPP-prunable exactly like
    * [[Knn.ivfSearchIndex]]) and each candidate costs m byte-lookups:
    * the two multiplicative reductions the stack exists for.
    *
    * `corpus` carries (vid, codes, cluster) — build it once with
    * [[encode]] + [[Knn.ivfAssign]] and persist partitioned by cluster.
    * Output: query_id, neighbor_id, rnk, adc_dist. */
  def ivfAdcSearch(
      corpus: DataFrame, coarseCentroids: DataFrame, codebook: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, m: Int, dims: Int, nprobe: Int): DataFrame = {
    val dsub = dims / m
    val probes = Knn.queryProbes(queries, coarseCentroids, idCol, vecCol, dims, nprobe)
      .select(col("qid"), col("cluster"))
    val table = subvectors(queries, idCol, vecCol, m, dims)
      .withColumnRenamed("vid", "qid")
      .join(codebook.withColumnRenamed("cluster", "code"), Seq("sub"))
      .select(col("qid"), col("sub"), col("code"), dist2(col("sq"), dsub).as("__td"))
    val scored = corpus
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vid") =!= col("qid"))
      .select(col("vid"), col("qid"), posexplode(col("codes")).as(Seq("__p", "code")))
      .withColumn("sub", col("__p").cast("int"))
      .join(broadcast(table), Seq("qid", "sub", "code"))
      .groupBy(col("vid"), col("qid"))
      .agg(sum(col("__td")).as("adc_dist"))
    graft.operators.TopK.perGroup(scored, Seq("qid"),
      Seq(col("adc_dist").asc, col("vid").asc), k, rankCol = "rnk")
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rnk"), col("adc_dist"))
  }

  /** Materialize the IVF+PQ index: m-byte codes + coarse cluster,
    * written PARTITIONED BY cluster — serving reads 1/K·nprobe of the
    * directories (dynamic partition pruning) and m code bytes per row,
    * the two multiplicative reductions of the stack at rest. The
    * [[Knn.ivfWriteIndex]] pattern for coded corpora; codebook and
    * coarse centroids stay with the caller (K + m·ksub rows — catalog
    * scale, not corpus scale). */
  def writeIndex(
      corpus: DataFrame, coarse: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int, dims: Int, path: String): Unit =
    encode(corpus, codebook, idCol, vecCol, m, dims)
      .join(Knn.ivfAssign(corpus, coarse, idCol, vecCol, dims)
        .withColumnRenamed(idCol, "vid"), "vid")
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Accept NEW vectors into a persisted [[writeIndex]] index at batch
    * cost: encoded against the SAME codebook, assigned against the SAME
    * coarse centroids, appended into the cluster directories (DPP keeps
    * pruning — parquet partition dirs absorb the files). Duplicate ids
    * are refused loudly ([[Knn.ivfAppendIndex]]'s argument: each copy
    * would compete in every probed top-k); codebook drift is the
    * caller's rebuild trigger — measure it with [[Knn.centroidDrift]]. */
  def appendIndex(
      batch: DataFrame, coarse: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int, dims: Int, path: String,
      checkIds: Boolean = true): Unit = {
    if (checkIds) {
      val existing = batch.sparkSession.read.parquet(path).select(col("vid"))
      val clash = batch.select(col(idCol).as("vid"))
        .join(existing, Seq("vid"), "left_semi")
      require(clash.isEmpty,
        "Pq.appendIndex: batch vector ids already present in the index (e.g. " +
          clash.take(3).map(_.get(0)).mkString(", ") +
          ") — appending would duplicate them in every probed top-k; " +
          "dedupe ids or rebuild with writeIndex")
    }
    encode(batch, codebook, idCol, vecCol, m, dims)
      .join(Knn.ivfAssign(batch, coarse, idCol, vecCol, dims)
        .withColumnRenamed(idCol, "vid"), "vid")
      .write.mode("append").partitionBy("cluster").parquet(path)
  }

  /** Serve [[ivfAdcSearch]] from a persisted [[writeIndex]] index — the
    * broadcast probe join's cluster keys drive dynamic partition pruning
    * on the code scan. */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      coarse: DataFrame, codebook: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int, dims: Int,
      nprobe: Int): DataFrame =
    ivfAdcSearch(spark.read.parquet(path), coarse, codebook, queries,
      idCol, vecCol, k, m, dims, nprobe)

  /** [[writeIndex]] for the RESIDUAL path (E45d): codes quantize
    * r = x − c(x) against the residual codebook, landed with the coarse
    * cluster as the partition key — the serve side reads 1/K·nprobe of
    * the directories and rebuilds its ADC tables per probed cluster.
    * Codebook must come from [[trainQ]] over [[residuals]] of the SAME
    * coarse centroids. */
  def writeIndexResidual(
      corpus: DataFrame, coarse: DataFrame, codebook: DataFrame,
      idCol: String, vecCol: String, m: Int, dims: Int, path: String): Unit = {
    val resid = residuals(corpus, coarse, idCol, vecCol, dims)
    encodeQ(resid, codebook, "vid", col("rq"), m, dims)
      .join(resid.select(col("vid"), col("cluster")), "vid")
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
  }

  /** Serve [[ivfAdcSearchResidual]] from a persisted
    * [[writeIndexResidual]] index (dynamic partition pruning on the
    * cluster directories, per-probed-cluster residual ADC tables). */
  def searchIndexResidual(
      spark: org.apache.spark.sql.SparkSession, path: String,
      coarse: DataFrame, codebook: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int, dims: Int,
      nprobe: Int): DataFrame =
    ivfAdcSearchResidual(spark.read.parquet(path), coarse, codebook, queries,
      idCol, vecCol, k, m, dims, nprobe)

  /** Coarse centroids as INTEGER coordinate arrays: cc_i = s_i div n
    * (truncated division, engine-exact) from a [[Knn.centroidSums]]-shaped
    * frame. The residual reference points — K rows, broadcast wherever
    * used. Output: cluster, cc (array<bigint> of length dims). */
  def integerCentroids(coarse: DataFrame, dims: Int): DataFrame =
    coarse.select(col("group").as("cluster"),
      array((0 until dims).map(i => tdiv(col(s"s_$i"), col("n"))): _*).as("cc"))

  /** Residual vectors r = x − c(x) against each vector's assigned coarse
    * centroid — what IVFADC proper encodes (Jégou 2011 §IV): residuals
    * concentrate around 0 once the coarse quantizer has soaked up the
    * between-cluster variance, so the SAME codebook budget (m·ksub
    * centroids) quantizes them far more finely than raw vectors. All
    * integer: quantized milli-units minus truncated-mean centroid coords.
    * Output: vid, cluster, rq (array<bigint>). */
  def residuals(
      corpus: DataFrame, coarse: DataFrame,
      idCol: String, vecCol: String, dims: Int): DataFrame =
    corpus.select(col(idCol).as("vid"), VectorOps.quantize(col(vecCol)).as("__qv"))
      .join(Knn.ivfAssign(corpus, coarse, idCol, vecCol, dims)
        .withColumnRenamed(idCol, "vid"), "vid")
      .join(broadcast(integerCentroids(coarse, dims)), "cluster")
      .select(col("vid"), col("cluster"),
        zip_with(col("__qv"), col("cc"), (a, b) => a - b).as("rq"))

  /** IVF+PQ with RESIDUAL encoding — IVFADC as published: codes quantize
    * r = x − c(x) (see [[residuals]]), and the per-query ADC table is
    * rebuilt per PROBED cluster from the query's residual against that
    * cluster's centroid (q − c, split into subvectors, tabulated against
    * the codebook). Table size = queries × nprobe × m × ksub — broadcast
    * per query batch. The extra nprobe factor over [[ivfAdcSearch]]'s
    * table buys the recall that residual concentration delivers; corpus
    * cost is unchanged (1/K·nprobe of the codes read, m lookups each).
    *
    * `corpus` carries (vid, cluster, codes) where codes came from
    * [[encodeQ]] over [[residuals]] with a [[trainQ]] residual codebook.
    * Output: query_id, neighbor_id, rnk, adc_dist. */
  def ivfAdcSearchResidual(
      corpus: DataFrame, coarse: DataFrame, codebook: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, m: Int, dims: Int, nprobe: Int): DataFrame = {
    val dsub = dims / m
    require(dims % m == 0, s"PQ: dims=$dims not divisible by m=$m subspaces")
    val probes = Knn.queryProbes(queries, coarse, idCol, vecCol, dims, nprobe)
      .select(col("qid"), col("cluster"))
    val qr = queries
      .select(col(idCol).as("qid"), VectorOps.quantize(col(vecCol)).as("__qv"))
      .join(probes, "qid")
      .join(broadcast(integerCentroids(coarse, dims)), "cluster")
      .select(col("qid"), col("cluster"),
        zip_with(col("__qv"), col("cc"), (a, b) => a - b).as("rq"))
    val qsv = qr.select(col("qid"), col("cluster"),
      explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"), slice(col("rq"), s * dsub + 1, dsub).as("sq"))): _*))
        .as("__e"))
      .select(col("qid"), col("cluster"),
        col("__e.sub").as("sub"), col("__e.sq").as("sq"))
    val table = qsv
      .join(codebook.withColumnRenamed("cluster", "code"), Seq("sub"))
      .select(col("qid"), col("cluster"), col("sub"), col("code"),
        dist2(col("sq"), dsub).as("__td"))
    val scored = corpus
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vid") =!= col("qid"))
      .select(col("vid"), col("qid"), col("cluster"),
        posexplode(col("codes")).as(Seq("__p", "code")))
      .withColumn("sub", col("__p").cast("int"))
      .join(broadcast(table), Seq("qid", "cluster", "sub", "code"))
      .groupBy(col("vid"), col("qid"))
      .agg(sum(col("__td")).as("adc_dist"))
    graft.operators.TopK.perGroup(scored, Seq("qid"),
      Seq(col("adc_dist").asc, col("vid").asc), k, rankCol = "rnk")
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rnk"), col("adc_dist"))
  }

  /** Exact integer squared-L2 brute-force top-k — the truth leg of the
    * PQ recall gate (ADC approximates THIS metric, not cosine). Same
    * broadcast + bounded-heap shape as [[Knn.bruteForce]]. */
  def bruteForceL2(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def prep(df: DataFrame) =
      df.select(col(idCol).as("vid"), VectorOps.quantize(col(vecCol)).as("qv"))
    val scored = prep(corpus)
      .join(broadcast(prep(queries).select(col("vid").as("qid"), col("qv").as("qqv"))),
        col("vid") =!= col("qid"))
      .withColumn("l2_dist",
        aggregate(zip_with(col("qv"), col("qqv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
    graft.operators.TopK.perGroup(scored, Seq("qid"),
      Seq(col("l2_dist").asc, col("vid").asc), k, rankCol = "rnk")
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rnk"), col("l2_dist"))
  }
}
