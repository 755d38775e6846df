package graft.dedup

import graft.text.{PortableHash, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Deduplication operators for LLM-corpus pipelines, each designed around
  * its shuffle shape at 100 TB:
  *
  *  - exact: one hash-groupBy on a 16-byte fingerprint (map-side partial
  *    aggregation; the shuffle carries fingerprints, not documents).
  *  - n-gram Jaccard: explode to (shingle, doc) postings and self-join on
  *    the shingle key — the classic inverted-index plan; cost is linear in
  *    postings + candidate pairs, never O(n²) docs.
  *  - MinHash+LSH: constant-size signature per doc (k portable hashes),
  *    banded bucket join so only same-bucket docs ever meet; exact Jaccard
  *    verify on the (tiny) candidate set.
  *  - SimHash: 64-bit signature as two 32-bit halves; 16-bit chunk bands
  *    give EXACT candidate recall for hamming ≤ 3 by pigeonhole.
  *
  * All hashes are engine-portable (PortableHash.h32) so every stage is
  * verifiable against the DuckDB oracle.
  */
object Dedup {

  /** Default document-frequency cap for n-gram candidate generation: a
    * shingle in more than this many documents is treated as boilerplate
    * and skipped during candidate generation (still scored). Bounds the
    * per-shingle candidate fan-out at maxDf² regardless of corpus skew. */
  val DefaultMaxDf: Long = 128L

  /** Exact dedup on normalized-text fingerprint.
    * Returns (fp, keeper_id = min id, n_docs). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Raw (id, shingle) postings — duplicates possible when a shingle
    * repeats within a document. Map-only (scan → tokenize → explode); the
    * building block that lets callers push filters BEFORE the distinct's
    * shuffle. Tokens are materialized behind a projection boundary before
    * shingling so the tokenizer runs once per row, not once per element_at
    * (see shinglesFromTokens). */
  private[dedup] def postingsRaw(df: DataFrame, idCol: String, textCol: String, w: Int) =
    df.select(col(idCol).as("__id"), TextOps.tokens(col(textCol)).as("__t"))
      .select(col("__id"), explode(TextOps.shinglesFromTokens(col("__t"), w)).as("__sh"))

  /** Distinct (id, shingle) postings for a corpus. */
  private[dedup] def postings(df: DataFrame, idCol: String, textCol: String, w: Int) =
    postingsRaw(df, idCol, textCol, w).distinct()

  /** Distinct (id, h60(shingle)) postings — the Jaccard-family variant:
    * every downstream shuffle (distinct, df-count, inverted-index
    * self-join, per-doc sizes) carries an 8-byte int instead of the
    * shingle text, which at 100 TB is the difference between shuffling
    * terabytes of n-gram strings and shuffling their fixed-width keys.
    * Delegates to the canonical [[TextOps.hashedShinglePostings]] so the
    * whole dedup family and noveltyStats share ONE pipeline. MinHash
    * rides the same table — its signature lanes hash the h60 key's
    * decimal rendering (mirrored in the oracle), so no dedup operator
    * ever shuffles shingle strings. */
  private[dedup] def hashedPostings(df: DataFrame, idCol: String, textCol: String, w: Int) =
    TextOps.hashedShinglePostings(df, idCol, textCol, w)

  /** Exact Jaccard scoring of candidate pairs against full postings —
    * the sorted-array form [[ngramJaccardPairsPrefix]] pioneered: each
    * doc's sorted distinct shingle array joins in ONCE per side
    * (pair-count rows carrying ~n·8 bytes) and a codegen'd
    * array_intersect computes common. The previous row-form fanned each
    * candidate out by its full postings list (candidate × postings rows
    * through a two-step join + a pair groupBy) and then joined doc sizes
    * twice more — four pair-mass exchanges where two suffice, plus the
    * fan-out mass itself. */
  private def verifiedJaccard(
      candidates: DataFrame, post: DataFrame, tauBp: Long): DataFrame = {
    val docArrs = post.groupBy("__id")
      .agg(sort_array(collect_list(col("__sh"))).as("__arr"))
    candidates
      .join(docArrs.select(col("__id").as("id_a"), col("__arr").as("__arr_a")), "id_a")
      .join(docArrs.select(col("__id").as("id_b"), col("__arr").as("__arr_b")), "id_b")
      .withColumn("common", size(array_intersect(col("__arr_a"), col("__arr_b"))).cast("long"))
      .withColumn("n_a", size(col("__arr_a")).cast("long"))
      .withColumn("n_b", size(col("__arr_b")).cast("long"))
      .withColumn("jaccard_bp",
        TextOps.bp(col("common"), col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard_bp") >= tauBp)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
  }

  /** All pairs (id_a < id_b) with shingle-set Jaccard ≥ tauBp/10000.
    * Output: id_a, id_b, common, n_a, n_b, jaccard_bp.
    *
    * `maxDf` caps candidate generation for skewed corpora: shingles
    * appearing in more than maxDf documents are excluded from the
    * inverted-index join (a shingle shared by k docs costs k² candidate
    * rows), but STILL count toward the exact Jaccard of surviving
    * candidates. Recall trade: a pair whose overlap is exclusively hot
    * shingles is missed — the standard prefix-filtering compromise.
    *
    * The cap is the DEFAULT ([[DefaultMaxDf]]): on a skewed corpus one
    * boilerplate shingle shared by k docs costs k² candidate rows, which
    * at 100 TB is a job-killing skew bomb. Pass `maxDf = Long.MaxValue`
    * to opt into exact all-pairs when the corpus is known to be clean. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tauBp: Long,
      w: Int = 3,
      maxDf: Long = DefaultMaxDf): DataFrame =
    overlapPairs(df, idCol, textCol, w, maxDf)
      .withColumn("jaccard_bp",
        TextOps.bp(col("common"), col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard_bp") >= tauBp)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")

  /** SAMPLED-CANDIDACY variant of [[ngramJaccardPairs]]: candidate pairs
    * come only from shingles whose portable h32 lands in the first
    * `sampleBp`/10000 of hash space (AND under the df cap); the Jaccard
    * of every surviving candidate is still exact over ALL shingles. The
    * same deterministic keyspace-screen trick as the E51s passage gate
    * ([[graft.dedup.Passage]] `sampleBp`), generalized to the inverted-
    * index pair family: because the slice selects WHOLE shingles (every
    * posting of a sliced shingle is kept), both engines enumerate the
    * identical candidate set and the compare stays exact — while the
    * candidate-generation mass (and an independent oracle's pair
    * explosion) shrinks ~10000/sampleBp×. A near-dup pair sharing m
    * shingles is screened with P ≈ 1−(1−bp/10000)^m — the scale-gate
    * recall contract, NOT a production recall loss (the production
    * queries run unsampled; this is the oracle-feasibility dial for
    * third-decade correctness gates, where the full pair oracle is
    * resource-bound).
    *
    * The slice keeps a shingle's true document frequency intact (whole
    * shingles in or out), so the df cap reads identically on the sliced
    * postings — hot boilerplate that survives the slice is still capped
    * out of candidacy, exactly like the unsampled operator. */
  def ngramJaccardPairsSampled(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tauBp: Long,
      sampleBp: Int,
      w: Int = 3,
      maxDf: Long = DefaultMaxDf): DataFrame = {
    require(sampleBp >= 1 && sampleBp <= 10000,
      s"ngramJaccardPairsSampled: sampleBp must be in [1, 10000], got $sampleBp")
    if (sampleBp == 10000) ngramJaccardPairs(df, idCol, textCol, tauBp, w, maxDf)
    else {
      val post = hashedPostings(df, idCol, textCol, w).localCheckpoint()
      val sliced = post.filter(
        PortableHash.h32(concat(lit("sngram:"), col("__sh").cast("string")))
          % 10000 < sampleBp)
      val hot = sliced.groupBy("__sh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDf).select("__sh")
      val cool = sliced.join(broadcast(hot), Seq("__sh"), "left_anti")
      val candidates = cool.select(col("__id").as("id_a"), col("__sh"))
        .join(cool.select(col("__id").as("id_b"), col("__sh")), "__sh")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      verifiedJaccard(candidates, post, tauBp)
    }
  }

  /** All pairs (id_a < id_b) with Jaccard ≥ tauBp/10000 via PREFIX
    * FILTERING (Bayardo/Ma/Srikant "All Pairs", Chaudhuri SSJoin) — the
    * LOSSLESS scale strategy next to [[ngramJaccardPairs]]'s maxDf cap:
    * instead of dropping hot shingles (recall-affecting when it fires),
    * each document indexes only its p = n − ceil(τ·n) + 1 globally
    * RAREST shingles (order: df asc, then hash asc — total and
    * engine-free). Guarantee: for any qualifying pair, common ≥ τ·max(n_a,
    * n_b), so the globally-smallest shared shingle has per-doc rank
    * ≤ n − common + 1 ≤ p on BOTH sides — the prefix-prefix join cannot
    * miss it, and the exact verify pass restores full counts. At τ=0.6
    * the index carries ~40% of the postings, the candidate fan-out is
    * bounded by the rarest-shingle df (hot shingles land deep in every
    * suffix and never generate candidates), and the answer is
    * bit-identical to exact all-pairs — tested randomized and
    * oracle-checked against the UNCAPPED pair SQL.
    *
    * Cost note: pays one extra postings pass (df-count + per-doc rank
    * window) to buy the smaller self-join; wins when the corpus has any
    * hot-key mass — which at 100 TB it always does. */
  def ngramJaccardPairsPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tauBp: Long,
      w: Int = 3): DataFrame = {
    require(tauBp > 0 && tauBp <= 10000, s"tauBp must be in (0, 10000], got $tauBp")
    val post = hashedPostings(df, idCol, textCol, w).localCheckpoint()
    // df for SHARED shingles only (df ≥ 2), left-joined with default 1:
    // on a real corpus most shingles are singletons, and joining the full
    // df table back would sort a postings-sized side against a near-
    // postings-sized side — the shared-only table is the small minority
    // that can actually tie-break ranks differently
    val dfreq = post.groupBy("__sh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
    val byRarity = Window.partitionBy("__id").orderBy(col("__df"), col("__sh"))
    val prefix = post.join(dfreq, Seq("__sh"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(1L)))
      .withColumn("__rk", row_number().over(byRarity))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__id")))
      // p = n − ceil(τ·n) + 1, ceil by integer arithmetic
      .filter(col("__rk") <= col("__n") - expr(s"(($tauBp * __n) + 9999) div 10000") + 1)
      .select(col("__id"), col("__sh"), col("__n"), col("__rk"))
    // prefix-overlap counted DIRECTLY in the self-join (the aggregation
    // IS the candidate set — no distinct + postings re-join, which on a
    // coincidence-heavy corpus explodes candidate×postings rows), then
    // the POSITIONAL bound prunes before any verify: a qualifying pair
    // needs common ≥ α = ceil(τ(n_a+n_b)/(1+τ)). Every shared shingle
    // NOT matched prefix-to-prefix lives in at least one doc's suffix,
    // so it is globally GREATER than every prefix-matched shingle — in
    // each doc it must sit at a rank strictly above that doc's largest
    // matched rank. Hence common ≤ cp + min(n_a − max_rk_a, n_b −
    // max_rk_b). (Bounding with the prefix LENGTHS instead — min(n−p) —
    // is unsound: a shared shingle in prefix_a ∩ suffix_b consumes only
    // b's slack, and the min over-prunes true pairs.)
    val cp = prefix
      .select(col("__id").as("id_a"), col("__sh"), col("__n").as("n_a"), col("__rk").as("rk_a"))
      .join(prefix
        .select(col("__id").as("id_b"), col("__sh"), col("__n").as("n_b"), col("__rk").as("rk_b")),
        "__sh")
      .filter(col("id_a") < col("id_b"))
      // LENGTH filter (AllPairs): J ≥ τ forces common ≥ τ·max(n_a,n_b)
      // and common ≤ min(n_a,n_b), so min·10000 ≥ max·τBp — a per-pair
      // predicate on columns already in the joined row, pruning
      // mismatched-size candidates BEFORE the aggregation pays for them
      .filter(least(col("n_a"), col("n_b")) * 10000 >=
        greatest(col("n_a"), col("n_b")) * tauBp)
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("__cp"),
        max(col("rk_a")).as("__mra"), max(col("rk_b")).as("__mrb"))
      .filter(col("__cp") +
        least(col("n_a") - col("__mra"), col("n_b") - col("__mrb")) >=
        expr(s"($tauBp * (n_a + n_b) + ${10000 + tauBp} - 1) div ${10000 + tauBp}"))
      .select("id_a", "id_b")
    // exact verify on the survivors: each doc's sorted shingle array
    // joins in ONCE per side (pair-count rows carrying ~n·8 bytes), and
    // a codegen'd array_intersect computes the full common — no
    // candidate×postings explosion
    val docArrs = post.groupBy("__id")
      .agg(sort_array(collect_list(col("__sh"))).as("__arr"))
    cp
      .join(docArrs.select(col("__id").as("id_a"), col("__arr").as("__arr_a")), "id_a")
      .join(docArrs.select(col("__id").as("id_b"), col("__arr").as("__arr_b")), "id_b")
      .withColumn("common", size(array_intersect(col("__arr_a"), col("__arr_b"))).cast("long"))
      .withColumn("n_a", size(col("__arr_a")).cast("long"))
      .withColumn("n_b", size(col("__arr_b")).cast("long"))
      .withColumn("jaccard_bp",
        TextOps.bp(col("common"), col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard_bp") >= tauBp)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
  }

  /** All pairs (id_a < id_b) with shingle CONTAINMENT ≥ tauBp/10000 —
    * containment = common / min(n_a, n_b), the overlap seen from the
    * SMALLER document. Catches what Jaccard structurally cannot: a short
    * doc embedded whole in a much longer one (boilerplate wrapping,
    * quote-the-article spam, prompt+completion supersets) scores
    * common/n_small ≈ 1 here but common/(n_a+n_b-common) ≈ n_small/n_big
    * ≈ 0 on the Jaccard scale, so no Jaccard threshold can keep it
    * without drowning in noise. Same inverted-index machinery, same
    * maxDf skew cap, same h60 8-byte shuffles as [[ngramJaccardPairs]] —
    * only the final metric differs. */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tauBp: Long,
      w: Int = 3,
      maxDf: Long = DefaultMaxDf): DataFrame =
    overlapPairs(df, idCol, textCol, w, maxDf)
      .withColumn("containment_bp",
        TextOps.bp(col("common"), least(col("n_a"), col("n_b"))))
      .filter(col("containment_bp") >= tauBp)
      .select("id_a", "id_b", "common", "n_a", "n_b", "containment_bp")

  /** Shared pair-overlap core for the n-gram metrics: every candidate
    * pair (id_a < id_b) with its exact common-shingle count and both set
    * sizes, BEFORE any metric/threshold — Jaccard and containment are
    * one projection away, so they share candidate generation, the maxDf
    * cap, and the execution-time recall notice. */
  private def overlapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int,
      maxDf: Long): DataFrame = {
    // NO materialization (no cache, no checkpoint): the postings feed up
    // to five consumers, but all five subtrees are canonically identical
    // up to their exchanges, so ReuseExchange/AQE stage reuse computes
    // the expensive map stage (scan → tokenize → shingle → md5) ONCE and
    // every consumer re-reads the same shuffle files — the behavior a
    // cache() bought, without its costs: a cache() entry from a lazy
    // plan-builder has no unpersist hook, accumulates in CacheManager
    // across a 153-query session, and lets a later same-plan query
    // silently hit an earlier query's cache; an eager localCheckpoint
    // would fire jobs at plan-construction time, breaking the lazy-API
    // contract (pinned: "constructing the DataFrame launches zero
    // jobs"). Shuffle-file reuse is also the shape that survives 100 TB,
    // where corpus postings exceed any storage-memory budget.
    val post = hashedPostings(df, idCol, textCol, w)
    if (maxDf == Long.MaxValue) {
      // exact all-pairs: count common shingles directly in the inverted-
      // index join — one pass, no candidate re-join
      val sizes = post.groupBy("__id").agg(count(lit(1)).as("__n"))
      val a = post.select(col("__id").as("id_a"), col("__sh"))
      val b = post.select(col("__id").as("id_b"), col("__sh"))
      val common = a.join(b, "__sh")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("common"))
      common
        .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "n_b"), "id_b")
        .select("id_a", "id_b", "common", "n_a", "n_b")
    } else {
      // skew-capped: candidate pairs AND their cool-shingle overlap come
      // from one self-join on cool shingles (direct count, no distinct /
      // re-join pass over the bulk); the exact common then adds the hot-
      // shingle overlap computed only for surviving pairs — at 100 TB the
      // quadratic fan-out is bounded by maxDf² per shingle, and the hot
      // correction touches |candidates| × |hot postings per doc| rows
      // the cap is recall-affecting when it actually fires: the hot count
      // rides the plan as an OBSERVED METRIC and a once-per-session
      // listener says so loudly when an executed query dropped candidates
      // — constructing this DataFrame launches zero jobs (an eager count
      // here would fire a Spark job at plan-construction time, surprising
      // in a lazy API and serializing an extra job before the main query)
      val hot = CapNotice.attach(
        post.groupBy("__sh").agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxDf).select("__sh"),
        maxDf)
      val coolPost = post.join(broadcast(hot), Seq("__sh"), "left_anti")
      val coolCommon = coolPost.select(col("__id").as("id_a"), col("__sh"))
        .join(coolPost.select(col("__id").as("id_b"), col("__sh")), "__sh")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("common_cool"))
      // ONE doc-keyed side table answers everything the candidate pairs
      // still need: the doc's distinct-shingle count AND its (sorted)
      // hot shingles, so the hot-shingle correction is an inline
      // array_intersect on the joined pair row. The old shape re-joined
      // the pair set four more times (candidates×hotPost by id_a, then
      // by (id_b, __sh), a groupBy back to pairs, a left join onto
      // coolCommon) plus two separate sizes joins — six pair-mass
      // exchanges where two suffice (guide §2.4). Per-doc hot arrays are
      // bounded by the number of boilerplate shingles a doc contains
      // (small by construction — hot shingles are the rare df > maxDf
      // tail), and intersecting two sorted distinct arrays counts
      // exactly the pair's hot co-occurrences, as the old join did.
      val hotArr = post.join(broadcast(hot), Seq("__sh"), "left_semi")
        .groupBy("__id").agg(sort_array(collect_list(col("__sh"))).as("__hsh"))
      val sizes = post.groupBy("__id").agg(count(lit(1)).as("__n"))
      val side = sizes.join(hotArr, Seq("__id"), "left")
      coolCommon
        .join(side.select(col("__id").as("id_a"), col("__n").as("n_a"),
          col("__hsh").as("__ha")), "id_a")
        .join(side.select(col("__id").as("id_b"), col("__n").as("n_b"),
          col("__hsh").as("__hb")), "id_b")
        .withColumn("common", col("common_cool") +
          when(col("__ha").isNull || col("__hb").isNull, lit(0L))
            .otherwise(size(array_intersect(col("__ha"), col("__hb"))).cast("long")))
        .select("id_a", "id_b", "common", "n_a", "n_b")
    }
  }

  /** Execution-time recall notice for the maxDf cap (see
    * [[ngramJaccardPairs]]): the hot-shingle count is attached to the plan
    * as a named observed metric, and a once-per-session
    * QueryExecutionListener prints the warning when a query that ACTUALLY
    * EXECUTED dropped candidates. Keeps plan construction lazy — no job
    * runs until the caller's first action — and costs nothing at scale
    * (CollectMetrics aggregates ride the existing hot-shingle rows). */
  private object CapNotice {
    val Prefix = "graft.ngram.maxdf"
    private val nextId = new java.util.concurrent.atomic.AtomicLong()
    // weak keys: a stopped/discarded session must stay GC-able — a strong
    // static set would pin every SparkSession (and its listener) forever
    // in long-lived multi-session JVMs
    private val registered = java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

    def attach(hot: DataFrame, maxDf: Long): DataFrame = {
      val spark = hot.sparkSession
      if (registered.add(spark))
        spark.listenerManager.register(new QueryExecutionListener {
          override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith(Prefix) && row.getAs[Long]("hot_count") > 0L)
                System.err.println(s"[graft] ngramJaccardPairs: maxDf=${row.getAs[Long]("max_df")} " +
                  s"excluded ${row.getAs[Long]("hot_count")} boilerplate shingle(s) from candidate " +
                  "generation; pairs overlapping ONLY in those shingles are not recalled " +
                  "(pass maxDf=Long.MaxValue for exact all-pairs)")
            }
          override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
        })
      hot.observe(s"$Prefix.${nextId.incrementAndGet()}",
        count(lit(1)).as("hot_count"), max(lit(maxDf)).as("max_df"))
    }
  }

  /** MinHash signatures from a postings table: ONE pass over (id, shingle)
    * computes all numPerm seeded hashes, then a single map-side-combined
    * groupBy takes the mins — the shuffle carries numPerm longs per doc,
    * never shingles. (A per-doc array-transform formulation re-evaluates
    * the shingle pipeline once per permutation — 12× the md5 work.)
    *
    * Permutation i is lane i%4 of md5("(i/4):"+shingle) — four independent
    * 32-bit hashes per digest, so 12 permutations cost 3 md5s per posting
    * row instead of 12 (H32's same-input memo makes the lane reads free). */
  def minhashSignaturesFromPostings(post: DataFrame, numPerm: Int): DataFrame = {
    val withH = post.select(
      col("__id") +:
        (0 until numPerm).map(i =>
          PortableHash.h32Lane(i / 4, i % 4, col("__sh")).as(s"__h$i")): _*)
    withH.groupBy("__id").agg(
      min(col("__h0")).as("sig_0"),
      (1 until numPerm).map(i => min(col(s"__h$i")).as(s"sig_$i")): _*)
  }

  /** MinHash signatures for a corpus. Output: __id, sig_0..sig_{numPerm-1}.
    * Signatures are computed over the h60-hashed postings (the permutation
    * lanes hash "seed:" + the h60 key's decimal digits) — identical
    * collision behavior to hashing shingle text at corpus scale, with the
    * upstream shuffles carrying 8-byte keys instead of n-gram strings. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String, numPerm: Int, w: Int = 3): DataFrame =
    minhashSignaturesFromPostings(hashedPostings(df, idCol, textCol, w), numPerm)

  /** MinHash+LSH near-dup pairs: banded bucket join → candidate pairs →
    * exact Jaccard verification. Same output schema as ngramJaccardPairs
    * (verified candidates only — LSH recall bounds which pairs surface).
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tauBp: Long,
      numPerm: Int = 12,
      bands: Int = 4,
      w: Int = 3): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    // postings computed once and cached: signatures, sizes, and the verify
    // join all read the same materialization — h60-keyed, so every shuffle
    // and the cache itself carry 8-byte ints, never shingle strings
    val post = hashedPostings(df, idCol, textCol, w).localCheckpoint()
    val banded = bandedBuckets(
      minhashSignaturesFromPostings(post, numPerm), numPerm, bands).localCheckpoint()
    val l = banded.select(col("band"), col("bucket"), col("__id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("__id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // exact Jaccard verify bounded to the candidate set — the join fans out
    // by candidate postings, not corpus postings²
    verifiedJaccard(candidates, post, tauBp)
  }

  /** Persist the corpus's banded MinHash buckets next to a
    * [[writeNgramIndex]] index — derived FROM the postings table, so no
    * corpus text is touched: signatures hash the already-stored h60 keys.
    * Written as `<name>_minhash` (band, bucket, id), bucketed by the LSH
    * bucket value, so the serve-side candidate join reads it
    * exchange-free like the postings. */
  def writeMinhashIndex(
      spark: SparkSession, name: String, buckets: Int,
      numPerm: Int = 12, bands: Int = 4): Unit = {
    // serve legs pair minhash table i with postings/sizes table i (a
    // doc's bucket rows and postings must live in the SAME leg, or the
    // exact-verify probe misses) — so the base minhash may only be built
    // from the base postings; fold an outstanding delta first
    require(!spark.catalog.tableExists(s"${name}_postings_delta") &&
        !spark.catalog.tableExists(s"${name}_postings_delta_folding"),
      s"index '$name' has an un-compacted append delta — run compactNgramIndex " +
        "before layering MinHash, so bucket rows and postings stay leg-aligned")
    graft.sources.Bucketed.overwrite(
      bandedBuckets(
        minhashSignaturesFromPostings(spark.table(s"${name}_postings"), numPerm),
        numPerm, bands),
      s"${name}_minhash", buckets, Seq("bucket"))
    graft.sources.Bucketed.overwritePlain(
      spark.range(1).select(
        lit(numPerm.toLong).as("num_perm"), lit(bands.toLong).as("bands"),
        lit(buckets.toLong).as("buckets")),
      s"${name}_minhash_meta")
  }

  /** Incremental MinHash+LSH dedup served from a persisted index: batch
    * docs band-join the stored corpus buckets (cross-side candidates
    * only), then exact Jaccard verification runs against the stored
    * postings, bounded to the candidate set. Per-batch cost = batch
    * signatures + two co-partitioned joins; the corpus contributes only
    * its (constant-width) bucket rows and the candidate docs' postings —
    * nothing is re-tokenized, re-hashed, or re-signed. Output matches
    * [[incrementalNgramPairs]]: batch_id, corpus_id, common, n_batch,
    * n_corpus, jaccard_bp — with LSH recall bounding which pairs surface
    * (same trade as [[minhashLshPairs]] vs exact all-pairs). */
  def minhashLshPairsIndexed(
      spark: SparkSession, name: String, batch: DataFrame,
      idCol: String, textCol: String, tauBp: Long,
      numPerm: Int = 12, bands: Int = 4, w: Int = 3): DataFrame = {
    requireIndexMeta(spark, s"${name}_meta", "w" -> w.toLong)
    requireIndexMeta(spark, s"${name}_minhash_meta",
      "num_perm" -> numPerm.toLong, "bands" -> bands.toLong)
    val bPost = hashedPostings(batch, idCol, textCol, w).localCheckpoint()
    val bBanded = bandedBuckets(
      minhashSignaturesFromPostings(bPost, numPerm), numPerm, bands)
    val bSizes = bPost.groupBy("__id").agg(count(lit(1)).as("n_batch"))
    // one serve pass per index leg (base + append delta): candidates from
    // that leg's banded buckets, exact verify against the SAME leg's
    // postings/sizes (a doc's bucket rows and postings always live in the
    // same leg), results concatenated — every corpus-side read bucketed
    minhashIndexLegs(spark, name).map { case (cBanded, cPost, cSizes) =>
      val candidates = bBanded.select(col("band"), col("bucket"), col("__id").as("batch_id"))
        .join(cBanded.select(col("band"), col("bucket"), col("__id").as("corpus_id")),
          Seq("band", "bucket"))
        .select("batch_id", "corpus_id")
        .distinct()
      // exact verify bounded to candidates: fan by candidate × batch
      // postings, then probe the stored corpus postings on (corpus_id, __sh)
      val common = candidates
        .join(bPost.select(col("__id").as("batch_id"), col("__sh")), "batch_id")
        .join(cPost.select(col("__id").as("corpus_id"), col("__sh")), Seq("corpus_id", "__sh"))
        .groupBy("batch_id", "corpus_id")
        .agg(count(lit(1)).as("common"))
      common
        .join(bSizes.withColumnRenamed("__id", "batch_id"), "batch_id")
        .join(cSizes.select(col("__id").as("corpus_id"), col("__n").as("n_corpus")), "corpus_id")
        .withColumn("jaccard_bp",
          TextOps.bp(col("common"), col("n_batch") + col("n_corpus") - col("common")))
        .filter(col("jaccard_bp") >= tauBp)
        .select("batch_id", "corpus_id", "common", "n_batch", "n_corpus", "jaccard_bp")
    }.reduce(_ unionByName _)
  }

  /** (banded buckets, postings, sizes) legs of a MinHash-layered index:
    * base tables plus the append delta when present. */
  private def minhashIndexLegs(
      spark: SparkSession, name: String): Seq[(DataFrame, DataFrame, DataFrame)] = {
    val base = (spark.table(s"${name}_minhash"),
      spark.table(s"${name}_postings"), spark.table(s"${name}_sizes"))
    // all three delta tables must exist (crashed append / mid-compaction
    // states under-recall rather than fail — see ngramIndexLegs)
    if (spark.catalog.tableExists(s"${name}_minhash_delta") &&
        spark.catalog.tableExists(s"${name}_postings_delta") &&
        spark.catalog.tableExists(s"${name}_sizes_delta"))
      Seq(base, (spark.table(s"${name}_minhash_delta"),
        spark.table(s"${name}_postings_delta"), spark.table(s"${name}_sizes_delta")))
    else Seq(base)
  }

  /** (band, bucket, __id) rows from a signature table — one projection
    * computes every band bucket, then explodes, so the signature pipeline
    * runs once, not once per band. Shared by the self-join LSH, the index
    * writer, and the indexed serve path: build and serve MUST agree on
    * the band layout or buckets never collide. */
  private def bandedBuckets(sigs: DataFrame, numPerm: Int, bands: Int): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col(s"sig_${b * rows + r}").cast("string"))
      struct(lit(b).as("band"),
        PortableHash.h32(concat_ws(",", slice: _*)).as("bucket"))
    }
    sigs
      .select(col("__id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("__id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Incremental dedup: near-dup pairs BETWEEN a new batch and an existing
    * corpus (never within either side) — the steady-state shape of a
    * training-data pipeline, where each incoming batch is screened against
    * everything already ingested. Output: batch_id, corpus_id, common,
    * n_batch, n_corpus, jaccard_bp.
    *
    * The corpus side of the inverted-index join carries only postings whose
    * shingle also occurs in the batch (semi-join first), so the cost scales
    * with the BATCH, not the corpus — the property that matters when the
    * corpus is 100 TB and the batch is a day's crawl. */
  def incrementalNgramPairs(
      corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, tauBp: Long, w: Int = 3): DataFrame = {
    val bPost = hashedPostings(batch, idCol, textCol, w).localCheckpoint()
    // corpus side: semi-join on the RAW shingle strings BEFORE hashing —
    // probing a broadcast set is cheaper than md5, so the full corpus
    // scan pays tokenize+probe only and the (expensive) h60 runs on the
    // tiny batch-matching survivor set. Then distinct; the only
    // corpus-derived shuffle is over those survivors. (distinct commutes
    // with the filter, and the deterministic h60 with both.)
    val bShingles = postingsRaw(batch, idCol, textCol, w).select("__sh").distinct()
    val cPost = postingsRaw(corpus, idCol, textCol, w)
      .join(broadcast(bShingles), Seq("__sh"), "left_semi")
      .select(col("__id"), PortableHash.h60(col("__sh")).as("__sh"))
      .distinct()
      .localCheckpoint()
    val bSizes = bPost.groupBy("__id").agg(count(lit(1)).as("n_batch"))
    val common = bPost.select(col("__id").as("batch_id"), col("__sh"))
      .join(cPost.select(col("__id").as("corpus_id"), col("__sh")), "__sh")
      .groupBy("batch_id", "corpus_id")
      .agg(count(lit(1)).as("common"))
      .localCheckpoint()
    // full |shingles(corpus doc)| is needed for exact Jaccard, but only
    // for CANDIDATE docs: re-shingle just those documents (a semi-join on
    // candidate ids prunes the corpus scan) instead of aggregating the
    // entire corpus postings per batch. NO broadcast hint: the candidate
    // set is bounded by the CORPUS (one hot shingle can match most of
    // it), so forcing a broadcast is an OOM hazard — AQE picks broadcast
    // itself whenever the set is actually small
    val candIds = common.select(col("corpus_id").as(idCol)).distinct()
    val cSizes = hashedPostings(
      corpus.join(candIds, Seq(idCol), "left_semi"),
      idCol, textCol, w)
      .groupBy("__id").agg(count(lit(1)).as("n_corpus"))
    common
      .join(bSizes.withColumnRenamed("__id", "batch_id"), "batch_id")
      .join(cSizes.withColumnRenamed("__id", "corpus_id"), "corpus_id")
      .withColumn("jaccard_bp",
        TextOps.bp(col("common"), col("n_batch") + col("n_corpus") - col("common")))
      .filter(col("jaccard_bp") >= tauBp)
      .select("batch_id", "corpus_id", "common", "n_batch", "n_corpus", "jaccard_bp")
  }

  /** Persist a corpus's n-gram dedup index: `<name>_postings` — the
    * distinct (doc, h60-shingle) postings BUCKETED + sorted by the shingle
    * hash — and `<name>_sizes` — one (doc, |shingles|) row per doc,
    * bucketed by doc id. This is the steady-state answer to incremental
    * dedup's per-batch corpus cost: [[incrementalNgramPairs]] re-reads and
    * re-tokenizes the ENTIRE corpus on every batch (map-only, but a
    * 100 TB scan per daily increment); with the index, each batch pays
    * only its own tokenization plus a join that reads the compact
    * postings table WITHOUT shuffling it (the bucket layout IS the join
    * partitioning — only the small batch side moves). Sizes are derived
    * by reading back the written postings (no second tokenization pass,
    * no corpus-wide cache).
    *
    * Index maintenance: [[appendToNgramIndex]] accepts a screened batch
    * into the index as a same-bucket-layout DELTA (serve paths read
    * base ∪ delta, each leg exchange-free); [[compactNgramIndex]] folds
    * the delta back into single sorted base tables. Steady state is
    * append-per-batch + compact on a slow cadence — never a full corpus
    * rebuild. */
  def writeNgramIndex(
      corpus: DataFrame, idCol: String, textCol: String,
      name: String, buckets: Int, w: Int = 3): Unit = {
    val spark = corpus.sparkSession
    graft.sources.Bucketed.overwrite(
      hashedPostings(corpus, idCol, textCol, w), s"${name}_postings", buckets, Seq("__sh"))
    graft.sources.Bucketed.overwrite(
      spark.table(s"${name}_postings")
        .groupBy("__id").agg(count(lit(1)).as("__n")),
      s"${name}_sizes", buckets, Seq("__id"))
    // a fresh build invalidates EVERYTHING derived from the previous
    // corpus: the append deltas AND the base MinHash layer — a stale
    // banded-bucket table would pass its own meta guard and silently
    // serve candidates from the old corpus (docs only in the new corpus
    // could never surface). Re-layer with writeMinhashIndex after.
    Seq(s"${name}_postings_delta", s"${name}_sizes_delta", s"${name}_minhash_delta",
        s"${name}_postings_delta_folding", s"${name}_sizes_delta_folding",
        s"${name}_minhash_delta_folding",
        s"${name}_minhash", s"${name}_minhash_meta")
      .foreach(graft.sources.Bucketed.dropWithLocation(spark, _))
    // build parameters persisted beside the data: serve paths REFUSE an
    // index built with different parameters instead of silently joining
    // disjoint key spaces and reporting "no duplicates"; the bucket count
    // is stored so appends write layout-compatible deltas
    graft.sources.Bucketed.overwritePlain(
      spark.range(1).select(lit(w.toLong).as("w"), lit(buckets.toLong).as("buckets")),
      s"${name}_meta")
  }

  /** Accept a screened batch into a persisted n-gram index WITHOUT
    * rebuilding it: the batch's postings/sizes land in
    * `<name>_postings_delta` / `<name>_sizes_delta`, bucketed with the
    * SAME layout (bucket count from the index meta) so the serve paths
    * read the delta exactly like the base — bucketed scan, no exchange.
    * If a MinHash layer exists ([[writeMinhashIndex]]), the batch's
    * banded buckets are appended to `<name>_minhash_delta` with the
    * stored numPerm/bands, keeping both serve paths complete. Repeated
    * appends accumulate file sets inside the same delta tables;
    * [[compactNgramIndex]] folds them into the base.
    *
    * `checkIds` (default on) refuses a batch whose doc ids already exist
    * in the index — a duplicate id would double that doc's size row and
    * corrupt every Jaccard it participates in. The check is one
    * column-pruned scan of the compact sizes tables; switch it off only
    * when the caller guarantees id freshness. */
  def appendToNgramIndex(
      batch: DataFrame, idCol: String, textCol: String, name: String,
      checkIds: Boolean = true): Unit = {
    val spark = batch.sparkSession
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"index '$name' not found — build it with writeNgramIndex first")
    val meta = spark.table(s"${name}_meta").head()
    val w = meta.getAs[Number]("w").intValue()
    val buckets = meta.getAs[Number]("buckets").intValue()
    val bPost = hashedPostings(batch, idCol, textCol, w).cache()
    if (checkIds) {
      // the guard scans every SIZES surface that exists — base, delta, and
      // a compaction's set-aside `_folding` table — each gated on ITS OWN
      // existence, not the serve paths' postings_delta gate: sizes land
      // first (below), so a crash between the sizes and postings writes
      // leaves the batch ids visible HERE even on a first-ever append, and
      // a mid-compaction crash can't hide already-accepted ids either
      val existing = Seq(s"${name}_sizes", s"${name}_sizes_delta", s"${name}_sizes_delta_folding")
        .filter(spark.catalog.tableExists)
        .map(t => spark.table(t).select("__id"))
        .reduce(_ unionByName _)
      val clash = bPost.select("__id").distinct()
        .join(existing, Seq("__id"), "left_semi")
      require(clash.isEmpty,
        s"appendToNgramIndex: batch doc ids already present in index '$name' " +
          "(e.g. " + clash.take(3).map(_.get(0)).mkString(", ") +
          ") — appending would double their size rows; dedupe ids or rebuild")
    }
    // the three delta appends are not one atomic commit. SIZES LAND
    // FIRST deliberately: the id-freshness guard scans the sizes legs, so
    // after a crash anywhere past this first write, a RETRY of the same
    // batch is refused loudly instead of double-appending postings
    // (double postings inflate common counts and fabricate duplicates —
    // silent corruption; a partially-appended batch only under-recalls
    // until repaired). Repair = drop the *_delta tables and re-append
    // the delta batches, or compact-after-verify.
    graft.sources.Bucketed.append(
      bPost.groupBy("__id").agg(count(lit(1)).as("__n")),
      s"${name}_sizes_delta", buckets, Seq("__id"))
    graft.sources.Bucketed.append(
      bPost, s"${name}_postings_delta", buckets, Seq("__sh"))
    if (spark.catalog.tableExists(s"${name}_minhash_meta")) {
      val mh = spark.table(s"${name}_minhash_meta").head()
      graft.sources.Bucketed.append(
        bandedBuckets(
          minhashSignaturesFromPostings(bPost, mh.getAs[Number]("num_perm").intValue()),
          mh.getAs[Number]("num_perm").intValue(), mh.getAs[Number]("bands").intValue()),
        s"${name}_minhash_delta", mh.getAs[Number]("buckets").intValue(), Seq("bucket"))
    }
    bPost.unpersist()
  }

  /** Fold the delta tables of a [[appendToNgramIndex]]-maintained index
    * back into single sorted base tables (base := base ∪ delta, delta
    * dropped). Rewrites go through a temp table + catalog rename so the
    * union can read the base it replaces; cost is one pass over the
    * index — run it on a slow cadence (weekly against daily appends),
    * not per batch. Serve results are identical before and after.
    *
    * Crash safety: each delta is first renamed aside to
    * `<table>_delta_folding` — ONE atomic catalog op that removes it from
    * every serve path BEFORE any data moves — then folded into its base
    * and dropped. A crash anywhere mid-compaction therefore UNDER-RECALLS
    * (the set-aside docs are temporarily invisible to serves, like an
    * in-flight append) but can never double-count: the corrupting state
    * — one doc's rows served from base AND delta at once — is
    * unreachable. The next compactNgramIndex call RESUMES: a leftover
    * folding table is folded if its docs are absent from the base
    * (probed by one id — folds are atomic table swaps and doc ids never
    * span legs) or just dropped if the fold had already completed. The
    * append guard keeps set-aside ids visible throughout
    * (`_sizes_delta_folding` is in its scan), so id freshness holds
    * across a crashed compaction too. */
  def compactNgramIndex(spark: SparkSession, name: String): Unit = {
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"index '$name' not found — build it with writeNgramIndex first")
    val buckets = spark.table(s"${name}_meta").head().getAs[Number]("buckets").intValue()
    val mhBuckets =
      if (spark.catalog.tableExists(s"${name}_minhash_meta"))
        spark.table(s"${name}_minhash_meta").head().getAs[Number]("buckets").intValue()
      else buckets
    val legs = Seq(
      (s"${name}_minhash", mhBuckets, Seq("bucket")),
      (s"${name}_postings", buckets, Seq("__sh")),
      (s"${name}_sizes", buckets, Seq("__id")))
    // resume any folding left by a crashed earlier compaction before
    // touching this round's deltas (also frees the _folding names)
    legs.foreach { case (base, b, keys) => resumeFold(spark, base, b, keys) }
    // hide: retire each delta from the serve paths atomically. Order
    // follows the serve gates — minhash_delta first (gates the minhash
    // leg), then postings_delta (gates the ngram leg), sizes last; the
    // legs helpers additionally require ALL their delta tables, so any
    // intermediate state serves base-only instead of erroring
    legs.foreach { case (base, _, _) =>
      val delta = s"${base}_delta"
      if (spark.catalog.tableExists(delta))
        spark.sql(s"ALTER TABLE $delta RENAME TO ${base}_delta_folding")
    }
    legs.foreach { case (base, b, keys) => resumeFold(spark, base, b, keys) }
  }

  /** Fold `<base>_delta_folding` into `base` when present. Whether the
    * data move already happened (crash between a completed rewrite and
    * the drop) is decided by probing one doc id: the fold is an atomic
    * table swap and ids never span legs, so any folding id present in
    * the base means only the drop remained. */
  private def resumeFold(
      spark: SparkSession, base: String, buckets: Int, keys: Seq[String]): Unit = {
    val folding = s"${base}_delta_folding"
    if (spark.catalog.tableExists(folding)) {
      val probe = spark.table(folding).select(col("__id")).limit(1).collect()
      val alreadyFolded = probe.headOption.exists(r =>
        !spark.table(base).filter(col("__id") === lit(r.get(0))).limit(1).isEmpty)
      if (probe.nonEmpty && !alreadyFolded)
        graft.sources.Bucketed.rewrite(
          spark.table(base).unionByName(spark.table(folding)), base, buckets, keys)
      graft.sources.Bucketed.dropWithLocation(spark, folding)
    }
  }

  /** The (postings, sizes) legs of an index: the base tables plus, when
    * present, the append delta. Serving joins each leg separately and
    * unions the RESULTS — a `union` of the scans would erase the bucketed
    * output partitioning and re-introduce the exchange the index exists
    * to avoid. Doc ids never span legs (append enforces freshness), so
    * leg results concatenate without re-aggregation. */
  private def ngramIndexLegs(
      spark: SparkSession, name: String): Seq[(DataFrame, DataFrame)] = {
    val base = (spark.table(s"${name}_postings"), spark.table(s"${name}_sizes"))
    // BOTH delta tables must exist before the leg serves: a crashed
    // append or mid-compaction state (one of the pair written/renamed)
    // then under-recalls instead of failing on a missing table
    if (spark.catalog.tableExists(s"${name}_postings_delta") &&
        spark.catalog.tableExists(s"${name}_sizes_delta"))
      Seq(base, (spark.table(s"${name}_postings_delta"), spark.table(s"${name}_sizes_delta")))
    else Seq(base)
  }

  /** Fail fast when a serve call's parameters disagree with the ones the
    * index was built with — a w/numPerm/bands mismatch makes every join
    * key miss and the screening silently passes all duplicates. One-row
    * catalog read at construction; the clear error beats laziness here. */
  private def requireIndexMeta(
      spark: SparkSession, metaTable: String, expect: (String, Long)*): Unit = {
    require(spark.catalog.tableExists(metaTable),
      s"index metadata table '$metaTable' not found — build the index first " +
        "(writeNgramIndex / writeMinhashIndex) in this warehouse")
    val row = spark.table(metaTable).head()
    expect.foreach { case (k, v) =>
      val got = row.getAs[Number](k).longValue()
      require(got == v,
        s"index '$metaTable' was built with $k=$got but serve requested $k=$v — " +
          "rebuild the index or pass matching parameters")
    }
  }

  /** Incremental batch-vs-corpus dedup served from a persisted
    * [[writeNgramIndex]] index. Same output as [[incrementalNgramPairs]]
    * (batch_id, corpus_id, common, n_batch, n_corpus, jaccard_bp), but
    * the corpus side is the bucketed postings table: the inverted-index
    * join reads it exchange-free (plan-pinned in PlanSpec), full per-doc
    * sizes come from the persisted sizes table, and NO corpus text is
    * read, tokenized, or hashed at query time. Per-batch cost = batch
    * tokenization + one co-partitioned join — the shape that holds when
    * the corpus is 100 TB and the batch is a day's crawl. */
  def incrementalNgramPairsIndexed(
      spark: SparkSession, name: String, batch: DataFrame,
      idCol: String, textCol: String, tauBp: Long, w: Int = 3): DataFrame = {
    requireIndexMeta(spark, s"${name}_meta", "w" -> w.toLong)
    val bPost = hashedPostings(batch, idCol, textCol, w).localCheckpoint()
    val bSizes = bPost.groupBy("__id").agg(count(lit(1)).as("n_batch"))
    // one serve join per index leg (base, and the append delta when
    // present), results concatenated: each leg's postings/sizes read
    // bucketed and exchange-free; doc ids never span legs
    ngramIndexLegs(spark, name).map { case (cPost, cSizes) =>
      val common = bPost.select(col("__id").as("batch_id"), col("__sh"))
        .join(cPost.select(col("__id").as("corpus_id"), col("__sh")), "__sh")
        .groupBy("batch_id", "corpus_id")
        .agg(count(lit(1)).as("common"))
      common
        .join(bSizes.withColumnRenamed("__id", "batch_id"), "batch_id")
        .join(cSizes.select(col("__id").as("corpus_id"), col("__n").as("n_corpus")), "corpus_id")
        .withColumn("jaccard_bp",
          TextOps.bp(col("common"), col("n_batch") + col("n_corpus") - col("common")))
        .filter(col("jaccard_bp") >= tauBp)
        .select("batch_id", "corpus_id", "common", "n_batch", "n_corpus", "jaccard_bp")
    }.reduce(_ unionByName _)
  }

  /** Connected components over near-dup pairs — the grouping step that
    * turns pairwise evidence (from any of the pair generators above)
    * into dedup CLUSTERS with a canonical keeper: every doc gets
    * `comp` = the minimum doc id reachable through the pair graph.
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round rewires
    * every node's larger neighbors (large-star) then its smaller
    * neighbors (small-star) to the locally-known minimum. Unlike plain
    * min-label propagation — whose rounds equal the graph DIAMETER and
    * re-shuffle the full edge set every round — the edge set here
    * contracts toward a star per component and the round count is
    * O(log² n) even for path graphs, so one boilerplate ladder chaining
    * thousands of docs can't force thousands of full-edge shuffles at
    * corpus scale. At the fixed point the edges ARE the answer: (node,
    * component-min) stars.
    *
    * Throws on non-convergence — downstream dedup keeps/drops documents
    * based on these labels, so a possibly-split labeling must never be
    * returned silently. Each round localCheckpoints to truncate lineage —
    * on a cluster, point `spark.checkpoint.dir` at durable storage and
    * swap in `checkpoint` for fault tolerance. */
  /** Edge count up to which components run as a DRIVER union-find from a
    * bounded collect: near-dup graphs are usually sparse relative to the
    * corpus (pairs ≪ docs), and the star algorithm's per-round fixed
    * cost (two windowed passes + checkpoint + convergence job) dwarfs
    * the actual work on a small graph. Same adaptive shape as validate's
    * interval merge: localized graphs cost ZERO iterative Spark stages,
    * big graphs take the distributed path. The collect is a typed
    * Dataset of (Long, Long) pairs — 2²⁰ specialized tuples ≈ 50 MB of
    * driver heap (not generic Rows, whose ~10× object overhead would
    * make the old "16 MB" claim false) — safe at default driver memory. */
  private val DriverCcEdgeLimit = 1 << 20

  def connectedComponents(
      pairs: DataFrame, ids: DataFrame, maxIter: Int = 30,
      driverEdgeLimit: Int = DriverCcEdgeLimit): DataFrame = {
    // canonical big→small orientation; pay the (possibly expensive) pair
    // plan ONCE
    var edges = pairs.select(
        greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    // driver fast path: bounded collect + union-find (larger root under
    // smaller, so every root IS its component min — label-identical to
    // the star fixed point, property-tested against it). Long ids only
    // (the library's doc-id type); anything else takes the generic
    // distributed path.
    val longKeys = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    val sparkFp = pairs.sparkSession
    import sparkFp.implicits._
    val smallSample: Array[(Long, Long)] =
      if (longKeys)
        edges.select(col("src").as("_1"), col("dst").as("_2"))
          .as[(Long, Long)].limit(driverEdgeLimit + 1).collect()
      else Array.empty[(Long, Long)]
    if (longKeys && smallSample.length <= driverEdgeLimit) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // track EVERY endpoint, not just merge losers: a component root
      // never becomes a `parent` key, so labeling parent.keys alone would
      // drop the output row for a root absent from `ids` — diverging from
      // the distributed path, which emits ids ∪ src ∪ dst (the conduit
      // contract below). Both adaptive paths must return the same row set.
      val nodes = scala.collection.mutable.HashSet.empty[Long]
      smallSample.foreach { case (a, b) =>
        nodes += a; nodes += b
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = nodes.toSeq.map(n => (n, find(n))).toDF("id", "comp")
      return ids.select(col("id"))
        .unionByName(labels.select(col("id")))
        .distinct()
        .join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    }
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
    var converged = edges.isEmpty
    var it = 0
    while (!converged && it < maxIter) {
      // large-star: for every node u, attach each LARGER neighbor v to
      // min(Γ(u) ∪ {u}) — a window min instead of a groupBy+re-join, so
      // each star op is ONE pass over the (shrinking) edge set; output
      // keeps the big→small invariant because the min is ≤ u < v
      val undirected = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val ls = undirected
        .withColumn("__mn", least(min(col("dst")).over(wSrc), col("src")))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("__mn").as("dst"))
        .distinct()
      // small-star: every node's SMALLER neighbors (all of them, given
      // the orientation) plus itself collapse onto their common min;
      // both output branches explode from one windowed pass
      val next = ls
        .withColumn("__mn", min(col("dst")).over(wSrc))
        .select(explode(array(
          struct(col("src").as("src"), col("__mn").as("dst")),
          struct(col("dst").as("src"), col("__mn").as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      edges = next
      it += 1
      // fixed-point test in ONE small job on the materialized round: a
      // big→small edge set is the final star decomposition iff every src
      // has exactly one target and no src is another edge's dst (then
      // ls/ss are identities and each star root is its component min) —
      // detected on the round the stars FORM, not one equality-check
      // round later
      val nonStar = next.groupBy("src")
        .agg(countDistinct(col("dst")).as("__nd"))
        .filter(col("__nd") > 1).select(col("src"))
        .unionByName(next.select(col("src"))
          .intersect(next.select(col("dst").as("src"))))
      converged = nonStar.isEmpty
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter large-star/small-star rounds — " +
          "component labels would be unreliable; raise maxIter")
    // nodes = ids ∪ pair endpoints: an endpoint missing from `ids` must
    // still CONDUCT connectivity (and gets an output row), or two docs
    // joined only through it would silently land in separate components
    val starLabels = edges.select(col("src").as("id"), col("dst").as("comp"))
    ids.select(col("id"))
      .unionByName(edges.select(col("src").as("id")))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()
      .join(starLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Incremental connected components — the labeling twin of the
    * append-only index path: after a screened batch is ACCEPTED, its
    * dup pairs (batch↔corpus and batch↔batch) must merge into the
    * existing component labeling without recomputing over the full
    * historical pair set. The existing labels ARE a star decomposition
    * (id → component min), and stars preserve connectivity exactly —
    * so components of (label stars ∪ new pairs) equal components of
    * (all old pairs ∪ new pairs).
    *
    * The merge is BATCH-BOUNDED, not corpus-bounded: only components
    * actually TOUCHED by a new-pair endpoint enter the iterative loop.
    * A new pair can only change labels of components containing one of
    * its endpoints — every other component's labeling is already the
    * fixed point over its own edges — so the corpus contributes one
    * broadcast semi/anti scan of `labels` (splitting it into the touched
    * slice and the untouched complement, which passes through verbatim
    * with NO star-edge materialization and zero iterative rounds), and
    * the loop runs over |touched slice| + |new pairs| edges only. The
    * touched comp-id set is bounded by 2·|newPairs| (8-byte ids), so the
    * broadcast is a day's-batch-sized build side against a 100 TB label
    * table. With batch-scale edge counts the loop itself usually takes
    * [[connectedComponents]]' driver fast path — zero Spark stages.
    *
    * `labels`: (id, comp) from a previous [[connectedComponents]] (or
    * this function). `newPairs`: (id_a, id_b). `newIds`: ids of the
    * accepted batch (isolated new docs must still get a label row).
    * Output: (id, comp) for every old + new id — equal to a full
    * recompute, which is exactly what the oracle checks.
    *
    * A `newIds` id that is ALREADY labeled (a replayed/re-accepted
    * batch) counts as a touch probe too: its component's star edges
    * enter the relabel subgraph, so it keeps its old label instead of
    * resurfacing as a self-labeled singleton NEXT TO the untouched
    * branch's verbatim row — one id, one output row, always. */
  def incrementalComponents(
      labels: DataFrame, newPairs: DataFrame, newIds: DataFrame,
      maxIter: Int = 30, driverEdgeLimit: Int = DriverCcEdgeLimit): DataFrame = {
    // all three inputs are read several times below (touched-set
    // discovery, the semi/anti split, the loop's edge/id unions) — pay
    // their plans ONCE. Without this a labels frame that is itself a
    // live computation (e.g. a previous connectedComponents run, as in
    // the driver's bench query) re-executes per reference; the same
    // pattern connectedComponents uses for its pair plan.
    val labelsCk = labels.select(col("id"), col("comp")).localCheckpoint()
    val pairsCk = newPairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val newIdsCk = newIds.select(col("id")).localCheckpoint()
    // no distinct here — touchedSubgraph distincts its probe input
    val probes = pairsCk.select(col("id_a").as("id"))
      .unionByName(pairsCk.select(col("id_b").as("id")))
      .unionByName(newIdsCk)
    val (starEdges, touchedIds, untouched) = touchedSubgraph(labelsCk, probes)
    val relabeled = connectedComponents(
      starEdges.unionByName(pairsCk),
      touchedIds.unionByName(newIdsCk),
      maxIter, driverEdgeLimit)
    untouched.select(col("id"), col("comp")).unionByName(relabeled)
  }

  /** Split an existing labeling around a batch's touch probes (new-pair
    * endpoints ∪ batch ids): (star edges of components containing a
    * probe, ids of those components' members, untouched label rows
    * passed through verbatim). Exposed package-private so tests can pin
    * the batch-boundedness — a batch touching 1 of N components
    * materializes ONE component's star edges, not N−1. */
  private[graft] def touchedSubgraph(
      labels: DataFrame, probeIds: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val endpoints = probeIds.select(col("id")).distinct()
    // old comp labels of the batch's probes — batch-sized by
    // construction; both probes broadcast so no labels scan ever shuffles
    val touched = labels.join(broadcast(endpoints), Seq("id"), "left_semi")
      .select(col("comp")).distinct()
    val touchedLabels = labels.join(broadcast(touched), Seq("comp"), "left_semi")
    val untouched = labels.join(broadcast(touched), Seq("comp"), "left_anti")
    val starEdges = touchedLabels
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("id_a"), col("comp").as("id_b"))
    (starEdges, touchedLabels.select(col("id")), untouched)
  }

  /** Canonical-document selection — the decision step that turns a
    * components labeling into the dedup VERDICT a pipeline acts on:
    * within every cluster keep the single best document (highest
    * `quality`, ties to the smallest id) and mark the rest as drops
    * pointing at their keeper. This is the reference pipeline's
    * "keep one per duplicate group" materialized as data, so the
    * keep/drop set is auditable before any row is discarded
    * (reference: the keeper notion in dedup tooling; cluster labels
    * from [[connectedComponents]] / [[incrementalComponents]]).
    *
    * Scale shape: one key-partitioned join of `labels` with `quality`
    * on id, one map-side-combinable `max_by` argmax per component
    * (shuffle carries ~one row per cluster), and one join back on
    * `comp` to stamp every member. No windows, no driver state; a
    * giant cluster costs one combiner chain, not a sort.
    *
    * @param labels  (id, comp) — a components labeling
    * @param quality (id, q)    — an orderable per-doc score; every
    *                labeled id must appear (inner join semantics:
    *                unscored docs drop from the output loudly via
    *                count checks in tests rather than silently keeping)
    * @return (id, comp, canonical_id, keep)
    */
  def canonicalPerComponent(labels: DataFrame, quality: DataFrame): DataFrame = {
    // both consumers below (the per-cluster argmax and the stamp-back
    // join) read this — pay the labels+quality plans once, the same
    // pattern incrementalComponents uses for its inputs
    val j = labels.select(col("id"), col("comp"))
      .join(quality.select(col("id"), col("q")), Seq("id"))
      .localCheckpoint()
    // argmax by (q, -id): highest quality wins, ties to the SMALLEST id —
    // struct ordering is lexicographic so negating the id flips the tie
    // direction without a second aggregation pass
    val best = j
      .groupBy(col("comp"))
      .agg(max_by(col("id"), struct(col("q"), (-col("id")).as("nid"))).as("canonical_id"))
    j.select(col("id"), col("comp"))
      .join(best, Seq("comp"))
      .select(col("id"), col("comp"), col("canonical_id"),
        (col("id") === col("canonical_id")).as("keep"))
  }

  /** Segment-level dedup with reassembly — the span-granular op between
    * whole-doc exact dedup and pair-based near-dup: split every doc into
    * fixed `segTokens`-token segments, keep only the FIRST occurrence of
    * each distinct segment corpus-wide (first = smallest (doc, position)),
    * and rebuild each doc from its surviving segments in order. This is
    * how repeated boilerplate spans (headers, license blocks, navigation
    * chrome) are stripped while the unique remainder of each page
    * survives.
    *
    * Scale shape: segments join on their h60 fingerprint — the shuffle
    * carries (8-byte hash, doc, idx), never segment text, and the keeper
    * table is one row per DISTINCT segment. Reassembly aggregates each
    * doc's own segments (array_sort over collect_list), so no global
    * ordering is needed. Output: idCol, n_segments, n_kept, clean_text
    * ('' when every segment was boilerplate). */
  def dedupSegments(
      df: DataFrame, idCol: String, textCol: String, segTokens: Int = 32): DataFrame = {
    val nseg = greatest(ceil(size(col("__t")) / lit(segTokens.toDouble)).cast("int"), lit(1))
    val segs = df
      .select(col(idCol).as("__id"), TextOps.tokens(col(textCol)).as("__t"))
      .select(col("__id"), posexplode(
        transform(sequence(lit(0), nseg - 1), i =>
          concat_ws(" ", slice(col("__t"), i * segTokens + 1, lit(segTokens))))))
      .select(col("__id"), col("pos").as("__idx"),
        col("col").as("__seg"), PortableHash.h60(col("col")).as("__h"))
    val keeper = segs.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__idx"))).as("__k"))
    segs.join(keeper, "__h")
      .withColumn("__keep",
        col("__id") === col("__k.__id") && col("__idx") === col("__k.__idx"))
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__idx"), col("__seg"))))),
          s => s.getField("__seg"))).as("clean_text"))
  }

  /** 64-bit SimHash as two unsigned 32-bit halves (hi, lo) over distinct
    * shingles — lanes 0 and 1 of ONE md5 per shingle (independent 32-bit
    * slices; one digest instead of two). Output: id, sim_hi, sim_lo. */
  def simhash(df: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame = {
    val post = postings(df, idCol, textCol, w)
      .withColumn("__h_hi", PortableHash.h32Lane(0, col("__sh")))
      .withColumn("__h_lo", PortableHash.h32Lane(1, col("__sh")))
    def bitSums(h: String, prefix: String) = (0 until 32).map(i =>
      sum(when(shiftright(col(h), i) % 2 === 1, 1).otherwise(-1)).as(s"$prefix$i"))
    val sums = post.groupBy(col("__id"))
      .agg(bitSums("__h_hi", "hi").head,
        (bitSums("__h_hi", "hi").tail ++ bitSums("__h_lo", "lo")): _*)
    def pack(prefix: String) = (0 until 32)
      .map(i => when(col(s"$prefix$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("__id").as("id"),
      pack("hi").as("sim_hi"), pack("lo").as("sim_lo"))
  }

  /** SimHash near-dup pairs with hamming ≤ maxHamming (≤ 3 for exact
    * recall: 4 16-bit chunks, pigeonhole). Output: id_a, id_b, hamming. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, w: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    val sh = simhash(df, idCol, textCol, w).localCheckpoint()
    val chunks = Seq(
      shiftright(col("sim_hi"), 16), col("sim_hi") % 65536,
      shiftright(col("sim_lo"), 16), col("sim_lo") % 65536)
    // single projection + explode: the simhash aggregation runs once, not
    // once per chunk branch
    val banded = sh.select(
      col("id"), col("sim_hi"), col("sim_lo"),
      explode(array(chunks.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("chunk"), c.as("cv"))
      }: _*)).as("ch"))
      .select(col("ch.chunk").as("chunk"), col("ch.cv").as("cv"),
        col("id"), col("sim_hi"), col("sim_lo"))
    val l = banded.select(col("chunk"), col("cv"), col("id").as("id_a"),
      col("sim_hi").as("hi_a"), col("sim_lo").as("lo_a"))
    val r = banded.select(col("chunk"), col("cv"), col("id").as("id_b"),
      col("sim_hi").as("hi_b"), col("sim_lo").as("lo_b"))
    l.join(r, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(expr("hi_a ^ hi_b")) + bit_count(expr("lo_a ^ lo_b")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
