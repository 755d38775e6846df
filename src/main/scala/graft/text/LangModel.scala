package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus language-model scoring for training-data curation.
  *
  * Two classic curation signals the reference's feed-validation loop has
  * no analytics twin for, both standard in large-corpus pipelines:
  *
  *  - '''Perplexity filtering''' ([[bigramNll]]): train an add-one-smoothed
  *    bigram LM on the corpus itself, score every document's negative
  *    log-likelihood — outlier docs (boilerplate, non-language, encoding
  *    junk) surface at both extremes of avg NLL.
  *  - '''Source divergence''' ([[jsDivergence]]): Jensen–Shannon divergence
  *    between per-source unigram distributions — the quantitative input to
  *    data-mixture design (which sources are near-duplicates of each other
  *    distribution-wise, which add diversity).
  *
  * Engine-portability: every transcendental is collapsed to an integer
  * IMMEDIATELY (`round(ln(x) · 10⁴)` per distinct bigram, `round(term ·
  * 10⁹)` per token term) and only integers are ever summed, so aggregation
  * order cannot perturb the result — the oracle compare is bit-exact, not
  * tolerance-based. A raw double sum would depend on partition order; a
  * per-term-rounded integer sum does not.
  *
  * Scale shape: everything is groupBy over exploded n-grams (map-side
  * combinable; shuffles carry distinct-type counts, not token instances)
  * plus one broadcast scalar (vocabulary size / source totals). No
  * collect, no windows over the corpus.
  */
object LangModel {

  /** Per-document NLL under the corpus's own add-one bigram LM.
    *
    * p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), V = unigram vocabulary.
    * Output: id, n_bigrams, nll_e4 (−Σ ln p in nats × 10⁴, integer),
    * avg_nll_e4 (integral division). Docs with < 2 tokens score 0.
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the token array behind a projection boundary — Catalyst
    // does not CSE inside higher-order-function lambdas (SURVEY §7)
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("t"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(t)-2), i -> named_struct('w1', t[i], 'w2', t[i+1]))")).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // per-doc bigram multiplicities first: the corpus-level counts then
    // aggregate the (much smaller) distinct-per-doc frame, and the scoring
    // join carries one row per (doc, bigram type), not per token instance.
    // Materialized ONCE — c2, and the scoring join both consume it, and
    // without the checkpoint each consumer re-runs the corpus tokenize+
    // explode+aggregate from scratch (Catalyst does not CSE shared
    // DataFrame lineage): 4 corpus passes become 2 (this + vocab)
    val docBi = bi.groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("k"))
      .localCheckpoint()
    val c2 = docBi.groupBy("w1", "w2").agg(sum("k").as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = toks.select(explode(col("t")).as("w")).agg(countDistinct(col("w")).as("v"))
    val lp = c2.join(c1, "w1").crossJoin(broadcast(vocab))
      .withColumn("lp_e4",
        round(log((col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")) * 10000)
          .cast("long"))
      .select("w1", "w2", "lp_e4")
    val perDoc = docBi.join(lp, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"), (-sum(col("k") * col("lp_e4"))).as("nll_e4"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_e4"), lit(0L)).as("nll_e4"))
      .withColumn("avg_nll_e4",
        when(col("n_bigrams") > 0, expr("nll_e4 div n_bigrams")).otherwise(lit(0L)))
  }

  /** Persist a trained bigram LM as a SERVING index (the E2b-idx steady
    * state applied to perplexity): `{name}_lm` (w1, w2, c2) bucketed by
    * the bigram join key, `{name}_ctx` (w1, c1) bucketed by context,
    * `{name}_meta` (v = train vocabulary).
    *
    * COUNTS are stored, not log-probs: one serve-side formula
    * `ln((coalesce(c2,0)+1)/(coalesce(c1,0)+V))` then covers all three
    * lookup outcomes — seen bigram, unseen bigram under a seen context,
    * fully-unseen context — and scoring a doc the model trained on is
    * bit-identical to [[bigramNll]]'s inline score (tested).
    */
  def writeLmIndex(corpus: DataFrame, textCol: String, name: String, buckets: Int): Unit = {
    val toks = corpus.select(TextOps.tokens(col(textCol)).as("t"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> named_struct('w1', t[i], 'w2', t[i+1]))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // one corpus pass feeds both landed tables (the c1 derivation would
    // otherwise re-run the whole bigram extraction)
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2")).localCheckpoint()
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val v = toks.select(explode(col("t")).as("w")).agg(countDistinct(col("w")).as("v"))
    graft.sources.Bucketed.overwrite(c2, s"${name}_lm", buckets, Seq("w1", "w2"))
    graft.sources.Bucketed.overwrite(c1, s"${name}_ctx", buckets, Seq("w1"))
    graft.sources.Bucketed.overwritePlain(v, s"${name}_meta")
  }

  /** Score a batch against a persisted [[writeLmIndex]] model WITHOUT
    * touching the training corpus: the batch pays its own bigram
    * extraction plus two left joins that read the index exchange-free
    * (bucket layout = join partitioning; the batch side alone shuffles).
    * Output schema = [[bigramNll]]. */
  def scoreIndexed(
      spark: org.apache.spark.sql.SparkSession, name: String,
      batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(spark.catalog.tableExists(s"${name}_meta"),
      s"LM index '$name' not found — build it with LangModel.writeLmIndex first")
    val toks = batch.select(col(idCol), TextOps.tokens(col(textCol)).as("t"))
    val docBi = toks.filter(size(col("t")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(t)-2), i -> named_struct('w1', t[i], 'w2', t[i+1]))")).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("k"))
    val perDoc = docBi
      .join(spark.table(s"${name}_lm"), Seq("w1", "w2"), "left")
      .join(spark.table(s"${name}_ctx"), Seq("w1"), "left")
      .crossJoin(broadcast(spark.table(s"${name}_meta")))
      .withColumn("lp_e4",
        round(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * 10000).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_bigrams"), (-sum(col("k") * col("lp_e4"))).as("nll_e4"))
    batch.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_e4"), lit(0L)).as("nll_e4"))
      .withColumn("avg_nll_e4",
        when(col("n_bigrams") > 0, expr("nll_e4 div n_bigrams")).otherwise(lit(0L)))
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * bigrams: pmi = ln(p(w1,w2) / (p₁(w1)·p₂(w2))) with position
    * marginals (w1 as first element, w2 as second), so the three
    * distributions live on the same bigram-instance space and integer
    * counts determine everything: pmi_e4 = round(ln((c12·N)/(c1f·c2f))·10⁴)
    * — exact integer multiplications first, ONE double division, the same
    * expression tree as the oracle. The products ride DECIMAL(38,0)
    * (oracle: HUGEINT): c12·N and c1f·c2f can exceed 2⁶³ at corpus scale
    * (N is total bigram INSTANCES), and a LongType product would wrap
    * silently under Spark's non-ANSI arithmetic while DuckDB errors —
    * the house discipline for count products (Cooccur lift, PsiDrift,
    * Changepoint).
    *
    * Scale shape: `minCount` prunes the bigram-type frame BEFORE the
    * marginal joins; the global top-k is `orderBy().limit(k)` — Spark's
    * TakeOrderedAndProject, per-partition heaps + one k-row merge, never
    * a full sort; the rank window then runs over k rows.
    */
  def collocations(docs: DataFrame, textCol: String, minCount: Long, k: Int): DataFrame = {
    val toks = docs.select(TextOps.tokens(col(textCol)).as("t"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> named_struct('w1', t[i], 'w2', t[i+1]))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    // four consumers (both marginals, the total, the scored join) — one
    // corpus pass instead of four
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).localCheckpoint()
    val c1f = c12.groupBy("w1").agg(sum("c12").as("c1f"))
    val c2f = c12.groupBy("w2").agg(sum("c12").as("c2f"))
    val n2 = c12.agg(sum("c12").as("n2"))
    val top = c12.filter(col("c12") >= minCount)
      .join(c1f, "w1").join(c2f, "w2").crossJoin(broadcast(n2))
      .withColumn("pmi_e4",
        round(log((col("c12").cast("decimal(38,0)") * col("n2").cast("decimal(38,0)")).cast("double") /
          (col("c1f").cast("decimal(38,0)") * col("c2f").cast("decimal(38,0)")).cast("double")) * 10000).cast("long"))
      .select("w1", "w2", "c12", "pmi_e4")
      .orderBy(col("pmi_e4").desc, col("w1").asc, col("w2").asc)
      .limit(k)
    top.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("pmi_e4").desc, col("w1").asc, col("w2").asc)).cast("bigint"))
  }

  /** Pairwise Jensen–Shannon divergence between per-source unigram
    * distributions: JSD(P,Q) = ½ KL(P‖M) + ½ KL(Q‖M), M = (P+Q)/2.
    *
    * Output per unordered source pair (src_a < src_b): n_union (union
    * vocabulary size), jsd_nn (nano-nats, integer — 0 identical,
    * ln 2 · 10⁹ ≈ 6.93·10⁸ disjoint), jsd_bp (basis points of a nat).
    *
    * The pair table is a broadcast of the (assumed few) sources; the one
    * real exchange keys on (pair, token). That assumption is ENFORCED:
    * the pair matrix is O(S²) and the token-expansion join O(S·vocab),
    * so `maxSources` refuses loudly (execution-time raise_error, the
    * Cooccur maxBasket pattern) instead of detonating on a 10k-source
    * corpus. The default guard sits at 4096 — ~8.4M pairs, the point
    * where the matrix itself stops being a sane deliverable — so the
    * common 10²–10³-source corpus never trips it; tighten it per call
    * when driving from a pipeline that expects few sources. (The
    * pre-round-16 default of 64 broke previously-working 65+-source
    * corpora; a guard against quadratic blowup shouldn't fire at a
    * scale the plan handles in seconds.) The count rides a global
    * window over the S-row totals frame — a single tiny exchange, no
    * self-join, still fully lazy.
    */
  def jsDivergence(docs: DataFrame, srcCol: String, textCol: String,
      maxSources: Int = 4096): DataFrame = {
    val toksCol = TextOps.tokens(col(textCol))
    // materialized once: totals, and the pair-expansion join both read it
    val c = docs.select(col(srcCol).as("src"), explode(toksCol).as("w"))
      .groupBy("src", "w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val t = c.groupBy("src").agg(sum("cnt").as("tot"))
      .withColumn("__n_src", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("tot",
        when(col("__n_src") > maxSources, raise_error(concat(
          lit("jsDivergence: corpus has "), col("__n_src").cast("string"),
          lit(s" sources (> maxSources=$maxSources) — the O(S²) pair matrix "
            + "and O(S·vocab) expansion join are refused; raise maxSources "
            + "only if this scale is intended"))))
          .otherwise(col("tot")))
      .drop("__n_src")
    val pairs = t.as("x").crossJoin(t.as("y"))
      .filter(col("x.src") < col("y.src"))
      .select(col("x.src").as("src_a"), col("x.tot").as("tot_a"),
        col("y.src").as("src_b"), col("y.tot").as("tot_b"))
    val e = c.join(broadcast(pairs), col("src") === col("src_a") || col("src") === col("src_b"))
      .groupBy("src_a", "src_b", "tot_a", "tot_b", "w")
      .agg(
        sum(when(col("src") === col("src_a"), col("cnt")).otherwise(lit(0L))).as("ca"),
        sum(when(col("src") === col("src_b"), col("cnt")).otherwise(lit(0L))).as("cb"))
    e.withColumn("term_nn", jsdTermNn(col("ca"), col("cb"), col("tot_a"), col("tot_b")))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_union"), sum(col("term_nn")).as("jsd_nn"))
      // per-term rounding can push a ≈0 JSD a hair negative; clamp BEFORE
      // the integral division (div truncates, DuckDB // floors — they only
      // agree on non-negatives)
      .withColumn("jsd_bp", expr("greatest(jsd_nn, 0L) div 100000"))
  }

  /** One token's JSD contribution in integer nano-nats — shared by the
    * pairwise matrix and the drift monitor so the two can never diverge. */
  private def jsdTermNn(ca: Column, cb: Column, totA: Column, totB: Column): Column = {
    val pa = ca.cast("double") / totA.cast("double")
    val pb = cb.cast("double") / totB.cast("double")
    val term =
      (when(ca > 0, pa * log(lit(2.0) * pa / (pa + pb))).otherwise(lit(0.0)) +
        when(cb > 0, pb * log(lit(2.0) * pb / (pa + pb))).otherwise(lit(0.0))) / lit(2.0)
    round(term * lit(1.0e9)).cast("long")
  }

  /** Unigram count table (w, cnt) — the reference artifact the drift
    * monitor compares against; land it wherever fits the deployment. */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** DRIFT MONITOR: JSD of a batch's unigram distribution against a
    * frozen reference count table — one row (n_union, jsd_nn, jsd_bp).
    * Identical term math to [[jsDivergence]] (shared helper), so
    * monitoring source B against reference A reproduces the pairwise
    * matrix's (A,B) entry exactly — tested. Runs per-microbatch on a
    * stream via foreachBatch: the reference is batch-built and frozen,
    * each arriving batch pays one vocab-keyed join against it. */
  def jsDivergenceVsCounts(ref: DataFrame, batch: DataFrame, textCol: String): DataFrame = {
    val b = unigramCounts(batch, textCol)
    val rTot = ref.agg(sum("cnt").as("tot_a"))
    val bTot = b.agg(sum("cnt").as("tot_b"))
    ref.select(col("w"), col("cnt").as("ca"))
      .join(b.select(col("w"), col("cnt").as("cb")), Seq("w"), "full_outer")
      .select(coalesce(col("ca"), lit(0L)).as("ca"), coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(rTot)).crossJoin(broadcast(bTot))
      .withColumn("term_nn", jsdTermNn(col("ca"), col("cb"), col("tot_a"), col("tot_b")))
      .agg(count(lit(1)).as("n_union"), sum(col("term_nn")).as("jsd_nn"))
      .withColumn("jsd_bp", expr("greatest(jsd_nn, 0L) div 100000"))
  }
}
