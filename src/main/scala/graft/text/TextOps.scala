package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: normalization,
  * tokenization, shingling, language-ID, quality metrics, fingerprints.
  *
  * All are compositions of `org.apache.spark.sql.functions` (codegen'd, no
  * UDFs) with exact DuckDB-SQL twins (see SparkEntry oracles), so every
  * operator is verifiable against an independent engine. Ratios are surfaced
  * as floor'd basis points (integer) — engine-portable, unlike rounded
  * doubles.
  */
object TextOps {

  /** Canonical normalization: lowercase, non-alphanumerics → single space,
    * trim. DuckDB twin: trim(regexp_replace(lower(x),'[^a-z0-9]+',' ','g')). */
  def norm(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Tokens of the normalized text (single-space separated after norm). */
  def tokens(c: Column): Column = split(norm(c), " ")

  /** Whitespace token count on the RAW text. */
  def wsTokenCount(c: Column): Column = size(split(c, "\\s+")).cast("long")

  /** BPE-ish unit count: runs of word chars or single non-word-non-space. */
  val BpePattern = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"
  def bpeCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0))).cast("long")

  /** Word w-shingles from an already-materialized token ARRAY column.
    * IMPORTANT: pass a bound column (project `tokens(text)` into its own
    * column first) — if `t` is the raw tokenization expression, Catalyst
    * inlines the whole lower+regexp+split pipeline into every element_at
    * inside the lambda: w re-tokenizations per shingle per row. */
  def shinglesFromTokens(t: Column, w: Int = 3): Column =
    when(size(t) >= w,
      transform(
        sequence(lit(1), size(t) - lit(w - 1)),
        i => concat_ws(" ", (0 until w).map(k => element_at(t, i + lit(k))): _*)))
      .otherwise(array(concat_ws(" ", t)))

  /** Word w-shingles over normalized tokens; docs shorter than w collapse to
    * a single whole-text shingle so every doc has ≥1 feature. Convenience
    * form for one-shot use — hot paths should project tokens first and use
    * shinglesFromTokens (see Dedup.postings). */
  def shingles(c: Column, w: Int = 3): Column =
    shinglesFromTokens(tokens(c), w)

  /** Count of tokens belonging to a marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  /** Language marker lexicons (tiny n-gram-free heuristic profiles). */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"))

  /** Per-language scores + argmax prediction (tie-break by Markers order). */
  def langScores(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    Markers.map { case (lang, words) => lang -> markerCount(t, words) }
  }

  def langPredict(scores: Seq[(String, Column)]): Column = {
    // en wins ties vs all; then de vs the rest; etc.
    val langs = scores.map(_._1)
    val cols = scores.toMap
    langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), rest) =>
      val later = langs.drop(i + 1)
      when(later.map(o => cols(lang) >= cols(o)).reduce(_ && _), lit(lang))
        .otherwise(rest)
    }
  }

  /** floor(10000 * num / den) as bigint — portable ratio encoding. */
  def bp(num: Column, den: Column): Column =
    floor(num * lit(10000.0) / den).cast("long")

  /** Count of chars matching a regex char class, via strip-and-diff. */
  def charClassCount(c: Column, clazz: String): Column =
    (length(c) - length(regexp_replace(c, clazz, ""))).cast("long")

  /** Whole-document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(norm(c))

  /** Min portable hash over the doc's shingles (a 1-perm minhash — the
    * rolling-hash-min document sketch). */
  def minShingleHash(c: Column, w: Int = 3): Column =
    array_min(transform(shingles(c, w), s => PortableHash.h32(s)))

  /** Deterministic per-stratum downsampling: keep a row iff its portable
    * hash bucket (over the id, salted) falls below the stratum's rate in
    * basis points. The standard corpus-rebalancing op (by language /
    * source / quality tier) without RNG state — reproducible across
    * runs, engines, and cluster sizes, and a doc keeps or loses its slot
    * independently of every other doc, so re-running on a grown corpus
    * never flips earlier decisions. Map-only: no shuffle. */
  def stratifiedSample(
      df: org.apache.spark.sql.DataFrame, idCol: String, strataCol: String,
      ratesBp: Map[String, Long], defaultBp: Long): org.apache.spark.sql.DataFrame = {
    require((ratesBp.values ++ Seq(defaultBp)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val bucket = PortableHash.h32(concat(lit("samp:"), col(idCol).cast("string"))) % 10000
    val rate = ratesBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Per-source document cap: keep at most `cap` docs per source, the
    * over-representation guard of web-corpus pipelines (a handful of
    * template-heavy domains can otherwise dominate the training mix).
    * Priority is a salted portable hash of the id — a deterministic
    * uniform draw, so the kept subset is a fair sample of the source,
    * reproducible across runs and engines, with no RNG state.
    *
    * Complements [[stratifiedSample]] (rate-based: keeps a FRACTION,
    * grows with the source) with a COUNT bound: a source's survivors
    * never exceed `cap` no matter how large it gets. Runs on the native
    * bounded-heap top-k plan (graft.plans.TopKPerGroup): one exchange by
    * source, k rows of state per source, no per-source sort — on a
    * billion-doc source the window form would sort the whole source to
    * keep 300 rows. */
  def sourceCap(
      df: org.apache.spark.sql.DataFrame, idCol: String, sourceCol: String,
      cap: Int): org.apache.spark.sql.DataFrame = {
    val pri = PortableHash.h32(concat(lit("cap:"), col(idCol).cast("string")))
    graft.operators.TopK.perGroup(
      df.withColumn("__pri", pri), Seq(sourceCol),
      Seq(col("__pri").asc, col(idCol).asc), cap)
      .drop("__pri")
  }

  /** Per-stratum quantile filter: drop the bottom `dropNum/dropDen`
    * fraction of rows per stratum by score — the "cut the worst quartile
    * per language" step of a quality pipeline. Rank-based and
    * integer-exact (`rank·den > n·num` — no float quantile boundaries,
    * so results are engine-portable and insensitive to score
    * distribution). Ties break by `idCol` so the cut is deterministic.
    *
    * Scale shape: the rank is NEVER one window partition per stratum (a
    * 90%-English corpus would sort 90% of itself in a single task).
    * Instead rank = (rows in the stratum with a strictly smaller score)
    * + (position among same-score rows by id): the first term is a
    * cumulative sum over per-(stratum, score) COUNT rows — score-
    * cardinality-sized, like [[repetitionStats]]'s count windows — and
    * the second partitions by (stratum, score), so a stratum's rows
    * spread across as many tasks as it has distinct scores. Degenerate
    * only if one (stratum, score) pair dominates the corpus — a
    * constant-score stratum, where no score order exists to thin by
    * anyway. */
  def quantileFilter(
      df: org.apache.spark.sql.DataFrame, strataCol: String, scoreCol: String,
      idCol: String, dropNum: Int, dropDen: Int): org.apache.spark.sql.DataFrame = {
    require(dropDen > 0 && dropNum >= 0 && dropNum < dropDen,
      s"drop fraction must be in [0,1): $dropNum/$dropDen")
    import org.apache.spark.sql.expressions.Window
    // NULLS LAST to match SQL engines' ASC default (Spark's asc is
    // nulls-first): a NULL score must not silently rank as "worst"
    val gcounts = df.groupBy(col(strataCol).as("__st"), col(scoreCol).as("__sc"))
      .agg(count(lit(1)).as("__gc"))
    val wCum = Window.partitionBy("__st").orderBy(col("__sc").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = gcounts
      .withColumn("__before", coalesce(sum(col("__gc")).over(wCum), lit(0L)))
      .withColumn("__n", sum(col("__gc")).over(Window.partitionBy("__st")))
      .select("__st", "__sc", "__before", "__n")
    val wLocal = Window.partitionBy(col(strataCol), col(scoreCol)).orderBy(col(idCol).asc)
    // null-safe join keys: a NULL score (or stratum) forms its own rank
    // group and must still find its count row
    df.withColumn("__lrk", row_number().over(wLocal).cast("long"))
      .join(cum, col(strataCol) <=> col("__st") && col(scoreCol) <=> col("__sc"))
      .filter((col("__before") + col("__lrk")) * dropDen > col("__n") * dropNum)
      .drop("__lrk", "__st", "__sc", "__before", "__n")
  }

  /** Gopher-style duplicate n-gram share WITHIN a document: the fraction
    * of a doc's w-shingles that are repeats of an earlier shingle in the
    * same doc (1 - distinct/total). The companion signal to
    * [[repetitionStats]] — a page that loops a whole phrase scores high
    * here even when no single token dominates. Map-only (array ops per
    * row, no shuffle, stays in codegen). Output: idCol, n_ngrams,
    * n_distinct, dup_bp. */
  def dupNgramStats(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      w: Int = 3): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol), shinglesFromTokens(col("__t"), w).as("__sh"))
      .select(col(idCol),
        size(col("__sh")).cast("long").as("n_ngrams"),
        size(array_distinct(col("__sh"))).cast("long").as("n_distinct"))
      .withColumn("dup_bp", bp(col("n_ngrams") - col("n_distinct"), col("n_ngrams")))

  /** Token-budget mixture sampler — the "data mixing" step of a training
    * pipeline: each stratum (language / source / quality tier) gets a
    * TOKEN budget, and docs are taken in deterministic salted-hash order
    * within their stratum until the budget is spent (the doc that
    * crosses the line is kept — budgets are floors, not ceilings, so a
    * stratum is never left under-filled by one long doc). Unlike rate-
    * based [[stratifiedSample]], budgets express the thing mixture specs
    * actually state: "30B tokens of code, 5B of wiki". Deterministic:
    * same corpus → same pick, and a doc's position in the hash order
    * never changes as the corpus grows, so re-mixes only ever extend the
    * kept prefix per stratum.
    *
    * Scale design (same pattern as [[Packing.packSequences]]): the
    * running sum is NEVER a one-partition-per-stratum window. The hash
    * order key is uniform over [0, 2³²) BY CONSTRUCTION, so value-range
    * buckets need no sampling and no min/max pass: per-(stratum, bucket)
    * cumulative sums run as parallel windows, the #strata × #buckets
    * bucket totals broadcast back as offsets, and the per-row "tokens
    * before me" is offset + local cumsum − own tokens. Deterministic
    * buckets make the double consumption of the bucketed plan safe (the
    * sampled-range-shuffle trap documented in
    * DataDiff.withOrderedPosition). */
  def tokenBudgetSample(
      df: org.apache.spark.sql.DataFrame, idCol: String, strataCol: String,
      tokensCol: String, budgets: Map[String, Long], defaultBudget: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = PortableHash.h32(concat(lit("mix:"), col(idCol).cast("string")))
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val bucket = floor(h / lit(4294967296.0 / parts)).cast("int")
    val local = df.withColumn("__h", h).withColumn("__b", bucket)
      .withColumn("__csum", sum(col(tokensCol)).over(
        Window.partitionBy(col(strataCol), col("__b"))
          .orderBy(col("__h").asc, col(idCol).asc)))
    val offsets = local.groupBy(col(strataCol), col("__b"))
      .agg(max(col("__csum")).as("__btot"))
      .withColumn("__off", coalesce(
        sum(col("__btot")).over(Window.partitionBy(col(strataCol))
          .orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(strataCol), col("__b"), col("__off"))
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    local.join(broadcast(offsets), Seq(strataCol, "__b"))
      .filter(col("__off") + col("__csum") - col(tokensCol) < budget)
      .drop("__h", "__b", "__csum", "__off")
  }

  /** Corpus n-gram LM statistics: top-k continuations per 2-token prefix
    * by trigram count (ties broken by token order, deterministic). The
    * building block for n-gram generation scoring / junk detection.
    * Explode → map-side-combined count → native bounded-heap rank over
    * COUNT rows (vocabulary-sized groups, never raw positions).
    * Output: prefix, next_tok, cnt, rk. */
  def ngramTopK(
      df: org.apache.spark.sql.DataFrame, textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    val tri = df.select(tokens(col(textCol)).as("__t"))
      .select(explode(when(size(col("__t")) >= 3,
        transform(sequence(lit(1), size(col("__t")) - 2), i =>
          struct(
            concat_ws(" ", element_at(col("__t"), i), element_at(col("__t"), i + 1)).as("prefix"),
            element_at(col("__t"), i + 2).as("next_tok"))))).as("__g"))
      .select(col("__g.prefix").as("prefix"), col("__g.next_tok").as("next_tok"))
    // native bounded-heap rank (graft.plans.TopKPerGroup) instead of a
    // row_number window: same shuffle, no per-prefix sort of the full
    // continuation set — O(n log k) over the vocabulary-sized count rows
    graft.operators.TopK.perGroup(
      tri.groupBy("prefix", "next_tok").agg(count(lit(1)).as("cnt")),
      Seq("prefix"), Seq(col("cnt").desc, col("next_tok").asc), k, "rk")
  }

  /** Per-doc top-k DISTINCTIVE terms — tf·idf-shaped keyword extraction
    * with an integer-portable score: score = tf·10000/df (term frequency
    * in the doc over document frequency in the corpus), ranked per doc
    * with deterministic ties (higher tf, then lower df, then token
    * order). No floating-point idf logs, so the ranking reproduces
    * bit-for-bit in any engine. Shuffles: one groupBy for per-doc tf,
    * one for corpus df (both map-side combined), one token-keyed join,
    * and a native bounded-heap rank over COUNT rows. Output: idCol,
    * token, tf, df, score_bp, rk. */
  def topTerms(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int = 3): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy("__id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // native bounded-heap rank instead of a row_number window: the
    // per-doc sort of every scored term disappears; only k rows per doc
    // are ever buffered
    graft.operators.TopK.perGroup(
      tf.join(dfreq, "token").withColumn("score_bp", bp(col("tf"), col("df"))),
      Seq("__id"), Seq(col("tf").desc, col("df").asc, col("token").asc), k, "rk")
      .select(col("__id").as(idCol), col("token"), col("tf"), col("df"),
        col("score_bp"), col("rk"))
  }

  /** Overlapping-window chunking — retrieval/serving prep: cut each doc
    * into `sizeTok`-token windows starting every `stride` tokens
    * (stride < size ⇒ overlap), last window clipped, short docs emit one
    * window. Chunk count = ceil(max(len−size,0)/stride)+1, so the final
    * window always reaches the last token and nothing is emitted past
    * it. Map-only (array ops + explode, no shuffle). Output: idCol,
    * chunk_idx, chunk_text, n_tokens. */
  def chunkOverlap(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      sizeTok: Int = 32, stride: Int = 24): org.apache.spark.sql.DataFrame = {
    require(stride >= 1 && sizeTok >= stride,
      s"need 1 <= stride <= size, got size=$sizeTok stride=$stride")
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("__n",
        greatest(ceil((size(col("__t")) - sizeTok) / lit(stride.toDouble)).cast("int"),
          lit(0)) + 1)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), col("__n") - 1),
        i => slice(col("__t"), i * stride + 1, lit(sizeTok)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", col("col")).as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** PII redaction patterns, ordered: each is valid and IDENTICAL in
    * meaning under both Java regex (Spark) and RE2 (DuckDB) — no
    * backreferences, no lookaround — so redaction is oracle-verifiable.
    * Email strictly first: its local part would otherwise be eaten as a
    * phone-ish digit run. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d[\\d\\- ]{7,}\\d", "<PHONE>"))

  /** PII scrubbing — the redaction pass every shareable training corpus
    * needs: emails, IPv4s and phone-shaped digit runs are replaced with
    * typed sentinels, with a per-class match count for audit. Map-only
    * (regexp_replace chains inside codegen, no shuffle); patterns apply
    * in [[PiiPatterns]] order on both engines, so the oracle reproduces
    * the exact output text. Output: idCol, clean_text, n_email, n_ip,
    * n_phone. */
  def redactPii(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val counts = PiiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    val cleaned = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    df.select(col(idCol) +: cleaned.as("clean_text") +: counts: _*)
  }

  /** THE canonical (doc, h60-shingle) distinct postings pipeline —
    * tokenize → w-shingle → h60 → distinct, with the hash applied BEFORE
    * the distinct so even the first shuffle carries 8-byte keys. Single
    * source of truth for every postings consumer (the dedup family
    * delegates here; oracles mirror it as one shared SQL fragment) — a
    * normalization or hash change lands everywhere at once instead of
    * silently diverging. Output: __id, __sh (long). */
  def hashedShinglePostings(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      w: Int = 3): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__t"))
      .select(col("__id"), explode(shinglesFromTokens(col("__t"), w)).as("__sh"))
      .select(col("__id"), PortableHash.h60(col("__sh")).as("__sh"))
      .distinct()

  /** Corpus-novelty score: the share of a doc's distinct w-shingles that
    * appear in NO other document — high novel_bp separates unique content
    * (or unique gibberish) from boilerplate that shares its phrasing
    * corpus-wide. The complement of [[dupNgramStats]] (within-doc) at
    * corpus scope. Shuffle shape: distinct postings on h60 keys, a
    * map-side-combined df count, one join of postings to the
    * vocabulary-sized count table, one per-doc agg — never all-pairs.
    * Output: idCol, n_shingles, n_novel, novel_bp. */
  def noveltyStats(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      w: Int = 3): org.apache.spark.sql.DataFrame = {
    val post = hashedShinglePostings(df, idCol, textCol, w)
    val dfreq = post.groupBy("__sh").agg(count(lit(1)).as("__df"))
    post.join(dfreq, "__sh")
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1L, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novel_bp", bp(col("n_novel"), col("n_shingles")))
  }

  /** Gopher-style repetition signal: the share of a document's tokens
    * taken by its single most frequent token (ties broken by the
    * lexicographically smallest token, so the result is deterministic).
    * High rep_bp flags boilerplate / degenerate pages. One explode +
    * two-level aggregation, map-side combined end to end — the winner is
    * an argmax aggregate over per-token COUNTS, so no window and no rank
    * operator at all. Output: idCol, top_tok, top_cnt, n_tokens, rep_bp. */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val counts = df
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("__tok"))
      .groupBy("__id", "__tok").agg(count(lit(1)).as("__cnt"))
    // the k=1 rank is an ARGMAX: one hash aggregate computes the total
    // and the winner together — fully map-side combinable, no window
    // buffering and no rank operator at all. min of a (−cnt, token)
    // struct = highest count, lexicographically smallest token on ties —
    // the same deterministic ordering the window form used.
    counts
      .groupBy("__id").agg(
        sum("__cnt").as("__total"),
        min(struct((-col("__cnt")).as("nc"), col("__tok").as("t"))).as("__m"))
      .select(col("__id").as(idCol), col("__m.t").as("top_tok"),
        (-col("__m.nc")).as("top_cnt"), col("__total").as("n_tokens"),
        bp(-col("__m.nc"), col("__total")).as("rep_bp"))
  }

  /** Misra-Gries heavy-hitter candidate summary aggregate (native
    * TypedImperativeAggregate, graft.functions.MisraGries): ≤ k
    * (item, count) entries shuffled per group per map task, output a
    * guaranteed SUPERSET of every item with frequency > N/(k+1). Feed
    * string items (tokens); compose with an exact re-count for a
    * deterministic final answer — see [[heavyHitters]]. */
  def heavyHitterCandidates(item: Column, k: Int): Column =
    weightedHeavyHitterCandidates(item, lit(1L), k)

  /** Weighted variant: each row adds `weight` (long, non-negative) to its
    * item's counter — guaranteed superset of every item above W/(k+1) of
    * the TOTAL weight. "Which sources dominate the token budget" is this
    * with weight = tokens per row. */
  def weightedHeavyHitterCandidates(item: Column, weight: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.MisraGries(
        org.apache.spark.sql.GraftBridge.expression(item),
        org.apache.spark.sql.GraftBridge.expression(weight), k)
        .toAggregateExpression())

  /** EXACT corpus heavy hitters — every token appearing in strictly more
    * than 1/den of all token occurrences — via the classic two-pass
    * sketch-then-verify plan: pass 1 aggregates a Misra-Gries candidate
    * summary (≤ k entries per map task cross the exchange, never the
    * vocabulary) together with the total token count; pass 2 re-counts
    * ONLY the ≤ k candidates exactly (an InSet filter cuts the shuffle to
    * candidate tokens) and applies the true threshold. k + 1 ≥ den makes
    * the MG superset guarantee cover the threshold, so the composition is
    * bit-exact and oracle-checkable even though the sketch's membership
    * beyond the guarantee varies with partitioning. The declarative
    * alternative shuffles the entire vocabulary to find its top ~30 rows
    * — at corpus scale this plan's exchanges stay candidate-sized.
    * Output: tok, tf, share_bp (integer-div basis points). */
  def heavyHitters(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      den: Int, k: Int): org.apache.spark.sql.DataFrame =
    heavyHittersWeightedWithStats(
      df.select(explode(tokens(col(textCol))).as("tok")),
      "tok", lit(1L), den, k, Nil)._1
      .withColumnRenamed("weight", "tf")

  /** EXACT weighted heavy hitters — every item holding strictly more than
    * 1/den of the TOTAL weight — same two-pass plan with per-row weights:
    * "which sources exceed 1/den of the corpus token budget", answered
    * without shuffling the (at 100 TB: millions-deep) item space.
    * Null ITEMS are excluded entirely (neither reported nor counted in
    * the total — mirror any SQL twin with `WHERE item IS NOT NULL`).
    * Output: itemCol, weight, share_bp. */
  def heavyHittersWeighted(
      df: org.apache.spark.sql.DataFrame, itemCol: String, weightCol: Column,
      den: Int, k: Int): org.apache.spark.sql.DataFrame =
    heavyHittersWeightedWithStats(df, itemCol, weightCol, den, k, Nil)._1

  /** [[heavyHittersWeighted]] that additionally evaluates caller-supplied
    * aggregate columns (e.g. a count or a KMV distinct of the item) IN
    * the sketch pass's single aggregation, returned as the Row's fields
    * after [cand, n] — so a profiling caller pays no extra input scan.
    * The repo's recurring trap is exactly such a consumer re-running the
    * scan for numbers pass 1 already had in hand. */
  def heavyHittersWeightedWithStats(
      df: org.apache.spark.sql.DataFrame, itemCol: String, weightCol: Column,
      den: Int, k: Int, extraAggs: Seq[Column]): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Row) = {
    require(k + 1 >= den,
      s"k=$k cannot guarantee the 1/$den threshold: need k + 1 >= den " +
        "(MG misses items only below W/(k+1))")
    // null items carry no information about ANY key's share: drop them
    // before both passes so they neither appear nor inflate the total
    // (the SQL GROUP BY NULL group the sketch could never report)
    val rows = df.filter(col(itemCol).isNotNull)
      .select(col(itemCol), weightCol.cast("long").as("__w"))
    // one job, one row: candidates, total weight and caller extras
    val head = rows
      .agg(weightedHeavyHitterCandidates(col(itemCol), col("__w"), k).as("cand"),
        (coalesce(sum(col("__w")), lit(0L)).as("n") +: extraAggs): _*)
      .head()
    val cand = head.getSeq[String](0)
    val n = head.getLong(1)
    val hot = rows.filter(col(itemCol).isin(cand: _*))
      .groupBy(itemCol).agg(sum(col("__w")).as("weight"))
      .filter(col("weight") * den > lit(n))
      .withColumn("share_bp", expr(s"weight * 10000 div ${n}L"))
    (hot, head)
  }
}
