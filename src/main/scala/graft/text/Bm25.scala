package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a parquet corpus: top-k documents per
  * query, scored by the Okapi BM25 family (k1 = 1.2, b = 0.75) — the
  * targeted-selection / contamination-drill-down primitive of a training
  * corpus ("pull the docs most relevant to this benchmark prompt", "what
  * does the corpus say about X"). The companion to
  * [[graft.dedup.Decontaminate]]: that flags shingle OVERLAP, this ranks
  * topical RELEVANCE.
  *
  * Scoring, exact-arithmetic edition. The classical form is
  * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
  * `idf = ln((N−df+0.5)/(df+0.5)+1)`. Two changes make every score an
  * engine-portable integer without changing the ranking character:
  *
  *  - the tf saturation term is cleared of fractions at k1=6/5, b=3/4,
  *    avgdl=L/N: `tf·(k1+1)/(tf+k1(1−b+b·dl/avgdl)) =
  *    44·L·tf / (20·L·tf + 6·L + 18·dl·N)` — exact int64 numerator and
  *    denominator, ONE correctly-rounded double division.
  *  - `ln` (whose libm rounding is not portable across engines) is
  *    replaced by the odds ratio it compresses:
  *    `idf = (2N−2df+1)/(2df+1)` — the same rare-term-heavy monotone
  *    family (BM25's idf is ln of exactly this plus one), again one
  *    exact-int division. Rare terms weigh more steeply than with ln;
  *    for top-k retrieval that sharpens rather than degrades.
  *
  * Each (doc, term) contribution is then `floor(idf · tfpart · 1000)` —
  * two correctly-rounded multiplies and a floor, bit-identical in any
  * IEEE-754 engine — and a doc's score is the INTEGER sum of its matched
  * terms' contributions: order-free, so distributed aggregation cannot
  * perturb it (the portable-doubles discipline of E46/D10, pushed one
  * step further: only the last mile is FP, and it is floored before any
  * reordering can touch it).
  *
  * Scale shape: postings (doc, term, tf) and document frequencies are
  * map-side-combined aggregations of the corpus — the same two shuffles
  * an inverted index costs to build. Queries broadcast (a query set is
  * small by nature); the per-(query, doc) aggregation shuffles only
  * MATCHED postings (corpus terms that appear in some query), never the
  * corpus × queries product; the final top-k runs on the native
  * bounded-heap plan (one k-heap per query, no per-query sort). Corpus
  * stats (N, L) ride along as a broadcast 1-row join — no eager action,
  * the whole thing is one declarative plan. Int64 bounds: exact while
  * 44·L·max(tf) < 2⁶³ (L = total corpus tokens) — at 10¹⁴ tokens and
  * tf ≤ 10⁴ the products still fit.
  *
  * Tokens are [[TextOps.tokens]] normalized, empties dropped; `dl` counts
  * a doc's non-empty tokens; docs with no tokens still count in N.
  * Output: queryId, docId, `n_terms` (matched query terms), `score_milli`
  * (the integer score), `rk` (1-based, ties broken by docId).
  */
object Bm25 {

  /** @param k top documents kept per query */
  def search(
      corpus: DataFrame,
      docId: String,
      textCol: String,
      queries: DataFrame,
      queryId: String,
      queryTextCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"Bm25: k must be positive, got $k")

    val toks = corpus.select(
      col(docId),
      filter(TextOps.tokens(col(textCol)), t => t =!= "").as("__t"))
    val dl = toks.select(col(docId), size(col("__t")).cast("long").as("__dl"))
    // (doc, term) → tf, with dl riding the grouping key (constant per doc)
    val tf = toks
      .select(col(docId), size(col("__t")).cast("long").as("__dl"),
        explode(col("__t")).as("__tok"))
      .groupBy(col(docId), col("__dl"), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val stats = dl.agg(
      count(lit(1)).as("__n"), coalesce(sum(col("__dl")), lit(0L)).as("__l"))

    scoreAndRank(tf, stats, queries, queryId, queryTextCol, docId, k)
  }

  /** Shared scoring tail over a postings frame (docId, __dl, __tok, __tf)
    * and a 1-row (__n, __l) stats frame — identical between the inline
    * path and the persisted-index serve, so they answer bit-identically. */
  private def scoreAndRank(
      tf: DataFrame, stats: DataFrame, queries: DataFrame,
      queryId: String, queryTextCol: String, docId: String, k: Int): DataFrame = {
    val qtok = queries.select(
      col(queryId),
      explode(array_distinct(filter(TextOps.tokens(col(queryTextCol)), t => t =!= "")))
        .as("__tok"))

    // restrict postings to query terms BEFORE anything else: every posting
    // of a matched term survives the semi-join, so df computed on the
    // matched subset equals df on the corpus — and shrinks from
    // corpus-vocabulary-sized to query-vocabulary-sized (broadcast-able)
    val matched = tf.join(broadcast(qtok.select(col("__tok")).distinct()), "__tok")
    val dfreq = matched.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))

    val idf = (lit(2L) * col("__n") - lit(2L) * col("__df") + lit(1L)).cast("double") /
      (lit(2L) * col("__df") + lit(1L)).cast("double")
    val tfp = (lit(44L) * col("__l") * col("__tf")).cast("double") /
      (lit(20L) * col("__l") * col("__tf") + lit(6L) * col("__l") +
        lit(18L) * col("__dl") * col("__n")).cast("double")
    val termMilli = floor((idf * tfp) * lit(1000.0)).cast("long")

    val scored = matched
      .join(broadcast(dfreq), "__tok")
      .join(broadcast(qtok), "__tok")
      .crossJoin(broadcast(stats))
      .groupBy(col(queryId), col(docId))
      .agg(count(lit(1)).as("n_terms"), sum(termMilli).as("score_milli"))

    graft.operators.TopK.perGroup(
      scored, Seq(queryId), Seq(col("score_milli").desc, col(docId).asc), k)
  }

  /** Materialize the retrieval index: the postings frame (doc, dl, term,
    * tf) landed as a table BUCKETED BY TERM plus a 1-row stats table —
    * corpus tokenization is paid ONCE, and every later query batch reads
    * postings with no text in sight (the [[graft.dedup.Dedup.writeNgramIndex]]
    * pattern for ranked retrieval). Bucketing by term makes the serve
    * path's per-term df aggregation exchange-free on the postings scan;
    * the only exchange a query pays is the matched-postings → (query,
    * doc) scoring aggregation. */
  def writeIndex(
      corpus: DataFrame, docId: String, textCol: String,
      name: String, buckets: Int): Unit = {
    require(buckets > 0, s"Bm25.writeIndex: buckets must be positive, got $buckets")
    val toks = corpus.select(
      col(docId),
      filter(TextOps.tokens(col(textCol)), t => t =!= "").as("__t"))
    val tf = toks
      .select(col(docId).as("__id"), size(col("__t")).cast("long").as("__dl"),
        explode(col("__t")).as("__tok"))
      .groupBy(col("__id"), col("__dl"), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    graft.sources.Bucketed.overwrite(tf, s"${name}_postings", buckets, Seq("__tok"))
    val stats = toks.select(size(col("__t")).cast("long").as("__dl"))
      .agg(count(lit(1)).as("__n"), coalesce(sum(col("__dl")), lit(0L)).as("__l"))
      .withColumn("id_col", lit(docId))
    graft.sources.Bucketed.overwritePlain(stats, s"${name}_meta")
  }

  /** Serve [[search]] from a persisted [[writeIndex]] index — same
    * scoring tail, postings read from the bucketed table, corpus stats
    * (N, L) from the frozen build-time meta (a later corpus append means
    * rebuild — stats and df must describe the same postings). */
  def searchIndex(
      spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, queryId: String, queryTextCol: String,
      k: Int): DataFrame = {
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"Bm25 index '$name' not found — build it with writeIndex first")
    val meta = spark.table(s"${name}_meta").head()
    val docId = meta.getAs[String]("id_col")
    val tf = spark.table(s"${name}_postings").withColumnRenamed("__id", docId)
    val stats = spark.table(s"${name}_meta").select(col("__n"), col("__l"))
    scoreAndRank(tf, stats, queries, queryId, queryTextCol, docId, k)
  }
}
