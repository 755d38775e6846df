package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): per document, hash every k-char window, slide a frame of
  * w consecutive hashes, and keep each frame's MINIMUM. The kept set is
  * a position-robust sketch with two guarantees the paper proves:
  * any substring shared between two docs of length ≥ k+w−1 contributes
  * at least one IDENTICAL fingerprint to both (no false negatives above
  * the threshold), and the expected density is ~2/(w+1) — a corpus
  * sketched at a guaranteed-recall detection threshold in a fraction of
  * the positions.
  *
  * This is the sublinear companion to [[graft.dedup.Passage]]: passage
  * excision screens ALL k-windows (exact, linear mass); a winnowed
  * postings index carries ~2/(w+1) of that mass and still finds every
  * ≥ k+w−1 shared span, which is the index you'd build FIRST over
  * 100 TB to route near-dup candidates before any exact pass.
  *
  * Tie policy: the paper keeps the rightmost minimal hash per frame;
  * rightmost-of-equals needs a composite argmin whose tie rule no two
  * engines are guaranteed to share, so graft keeps ALL positions that
  * achieve some full frame's minimum. Selection is then a pure
  * predicate — `h(p) = min(frame)` for some frame containing p —
  * deterministic in any engine, at worst epsilon denser on hash-equal
  * repeats. Both guarantees above are unaffected (they only need "a
  * frame minimum is kept").
  *
  * Shape at scale: two window functions over per-doc position order —
  * partitioned BY DOCUMENT, so the sort is doc-local (never a global
  * sort), pipelined in one exchange of (id, pos, 8-byte hash). Frame 1
  * computes each full frame's min (`rows current..w−1 following` +
  * frame-completeness count); frame 2 reflects that min back onto the
  * positions it selects (`rows w−1 preceding..current` max of full-frame
  * minima — equality with the position's own hash is exactly "I am some
  * full frame's min"). No join, no explode beyond the k-gram pass, no
  * UDF.
  *
  * Reference scope note: the reference engine has no corpus operator
  * family; this extends the mandated LLM-pipeline surface (SURVEY §2 E).
  */
object Winnow {

  /** Selected fingerprints: (`idCol`, pos, fp) — one row per kept
    * position; docs shorter than k+w−1 chars have no full frame and
    * yield no fingerprint (the paper's threshold is undefined there). */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 2, s"Winnow.fingerprints: k must be >= 2, got $k")
    require(w >= 1, s"Winnow.fingerprints: w must be >= 1, got $w")
    // the window enumeration is Passage's — one definition, two surfaces
    val grams = graft.dedup.Passage.windowsOf(docs, idCol, textCol, k)
      .select(col("id"), col("pos"), PortableHash.h60(col("win")).as("h"))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val fwd = byDoc.rowsBetween(0, w - 1)
    val back = byDoc.rowsBetween(-(w - 1), 0)
    grams
      .withColumn("mh", min(col("h")).over(fwd))
      .withColumn("full", count(lit(1)).over(fwd) === w)
      .withColumn("selmax", max(when(col("full"), col("mh"))).over(back))
      .filter(col("h") === col("selmax"))
      // pos as long: the oracle's generate_series is BIGINT, and the
      // driver's compare is strictest on matching physical types
      .select(col("id").as(idCol), col("pos").cast("long").as("pos"),
        col("h").as("fp"))
  }

  /** Candidate near-dup pairs from the winnowed index: docs sharing
    * ≥ `minShared` distinct fingerprints, with shared count — the MOSS
    * report, and the routing table an exact pass ([[graft.dedup.Passage]],
    * Jaccard verify) would consume at scale. `maxDf` is the standard
    * postings skew cap ([[graft.dedup.Dedup.DefaultMaxDf]] rationale):
    * a boilerplate fingerprint in df docs would emit df²/2 pairs, so
    * hot fingerprints are excluded from pair GENERATION — candidate
    * fan-out is bounded at maxDf² per fingerprint regardless of skew. */
  def candidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long,
      maxDf: Long = graft.dedup.Dedup.DefaultMaxDf): DataFrame = {
    // the sketch is consumed by BOTH the df cap and the pair join (whose
    // self-join legs would re-derive it again): localCheckpoint it — it
    // is the ~2/(w+1) winnowed fraction of the window mass, the artifact
    // writeIndex persists at scale — instead of re-running the
    // corpus-mass fingerprint pass (windows + md5 + frame minima) once
    // per consumer (the r14 before-plan scanned the corpus 8× with zero
    // reuse). Eager localCheckpoint, NOT cache(): a cache() entry from a
    // lazy plan-builder has no unpersist hook and accumulates in
    // CacheManager across a long session; checkpointed blocks are
    // ContextCleaner-collected once the query's RDD is unreachable
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct().localCheckpoint()
    val cold = fps.groupBy("fp")
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val post = fps.join(cold, "fp")
    // both sides are corpus-mass postings: merge hints keep the pair
    // join shuffle-side (same rationale as sourceOverlap — a runtime
    // broadcast conversion of a side this size is an OOM, not a win)
    post.as("a").hint("merge").join(post.as("b").hint("merge"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Source-pair CONTENT-overlap matrix — the dedup-planning report:
    * for every pair of values of `groupCol` (e.g. crawl source), the
    * exact Jaccard of their winnowed-fingerprint sets, in basis points.
    * Token-level overlap saturates on corpora sharing a vocabulary;
    * fingerprints measure shared PASSAGES (≥ k+w−1 chars), which is
    * what decides where a cross-source [[graft.dedup.Passage]] /
    * [[candidatePairs]] run will actually find something. Cost: the
    * per-doc fingerprint pass, one distinct (group, fp) projection,
    * and a fingerprint-keyed self-join whose per-key fan-out is
    * bounded by the NUMBER OF GROUPS (each fp appears once per group
    * after the distinct) — no df cap needed, no doc-pair blow-up.
    * For corpora too large even for the fingerprint pass, the KMV
    * synopsis estimate ([[graft.operators.KeyOverlap]]) is the
    * screen-of-the-screen. */
  def sourceOverlap(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      k: Int, w: Int): DataFrame = {
    // merge hints on every corpus-scale join side: the (group, fp) set
    // is corpus-mass — a runtime broadcast conversion (AQE reads a
    // compressed shuffle-stat, not the hydrated relation) measured an
    // OOM at the sf10 decade leg, and at 100 TB no side of these joins
    // fits anywhere; only the group-count-sized `sizes` may broadcast.
    // localCheckpointed (eager, ContextCleaner-cleaned — see
    // candidatePairs): consumed by sizes AND both pair-join legs — the
    // r14 before-plan re-ran the whole fingerprint pass per consumer
    // (16 corpus scans)
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .join(docs.select(col(idCol), col(groupCol).as("__g")).hint("merge"), idCol)
      .select(col("__g"), col("fp")).distinct().localCheckpoint()
    val sizes = fps.groupBy("__g").agg(count(lit(1)).as("n"))
    val common = fps.as("a").hint("merge").join(fps.as("b").hint("merge"),
        col("a.fp") === col("b.fp") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("source_a"), col("b.__g").as("source_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("__g").as("source_a"), col("n").as("n_a")), "source_a")
      .join(sizes.select(col("__g").as("source_b"), col("n").as("n_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("common"),
        TextOps.bp(col("common"), col("n_a") + col("n_b") - col("common"))
          .as("overlap_bp"))
  }

  /** Persist a corpus's winnowed index: `<name>_fps` — the distinct
    * (doc, fingerprint) postings BUCKETED by fingerprint — plus a meta
    * record of (k, w, buckets, maxDf). The E2b-idx steady state for the
    * passage screen: each arriving batch pays only its own
    * fingerprinting plus a join that reads the index WITHOUT shuffling
    * it (the bucket layout IS the join partitioning — only the small
    * batch side moves), and NO corpus text is read at serve time. The
    * index carries ~2/(w+1) of the corpus's k-gram mass — the winnowing
    * guarantee means a batch doc sharing ≥ k+w−1 chars with ANY indexed
    * doc still surfaces.
    *
    * The df skew cap is applied at BUILD time (hot boilerplate
    * fingerprints never enter the index) so serving needs no index-wide
    * df aggregation — the cap is a build parameter recorded in meta,
    * not a per-query shuffle. Delta append/compact maintenance would
    * follow [[graft.dedup.Dedup.appendToNgramIndex]]'s recipe verbatim
    * (same Bucketed delta tables); not duplicated here. */
  def writeIndex(
      corpus: DataFrame, idCol: String, textCol: String,
      name: String, buckets: Int, k: Int, w: Int,
      maxDf: Long = graft.dedup.Dedup.DefaultMaxDf): Unit = {
    val spark = corpus.sparkSession
    // cached: the df cap and the written join both read it (build-time
    // only; unpersisted after the write lands)
    val fps = fingerprints(corpus, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("fp").as("__fp")).distinct().cache()
    val cold = fps.groupBy("__fp")
      .agg(countDistinct(col("__id")).as("df"))
      .filter(col("df") <= maxDf).select("__fp")
    graft.sources.Bucketed.overwrite(
      fps.join(cold, "__fp"), s"${name}_fps", buckets, Seq("__fp"))
    fps.unpersist()
    graft.sources.Bucketed.overwritePlain(
      spark.range(1).select(
        lit(k.toLong).as("k"), lit(w.toLong).as("w"),
        lit(buckets.toLong).as("buckets"), lit(maxDf).as("max_df")),
      s"${name}_meta")
  }

  /** Screen a batch against a persisted [[writeIndex]] index: pairs
    * (batch_id, corpus_id, shared_fps) with ≥ `minShared` shared
    * fingerprints. Refuses an index built with different (k, w) loudly
    * instead of silently joining disjoint fingerprint spaces. */
  def screenIndexed(
      spark: org.apache.spark.sql.SparkSession, name: String,
      batch: DataFrame, idCol: String, textCol: String,
      minShared: Long): DataFrame = {
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"winnow index '$name' not found — build it with Winnow.writeIndex first")
    val meta = spark.table(s"${name}_meta").head()
    val (k, w) = (meta.getAs[Number]("k").intValue(), meta.getAs[Number]("w").intValue())
    val bFps = fingerprints(batch, idCol, textCol, k, w)
      .select(col(idCol).as("batch_id"), col("fp").as("__fp")).distinct()
    spark.table(s"${name}_fps")
      .select(col("__id").as("corpus_id"), col("__fp"))
      .join(bFps, "__fp")
      .groupBy("batch_id", "corpus_id")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
