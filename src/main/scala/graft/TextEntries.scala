package graft

import graft.dedup.{Decontaminate, Dedup, Survivorship}
import graft.text.{Packing, PortableHash, TextOps}
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup queries (SURVEY §2 E1–E4, E8–E11) and their
  * DuckDB oracles. Oracle SQL is generated from the same Scala constants
  * (marker lexicons, seeds, band layout) the Spark operators use, so the
  * two sides cannot drift.
  */
object TextEntries {

  // corpora with injected duplicates, derived identically in both engines:
  // exact dups (+100000, every 10th doc) and near-dups with a 4-token tail
  // (+200000, every 17th doc)
  private def docsDup(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
  }

  private[graft] def docsNear(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" graft dup tail marker")).as("text")))
  }

  private def docsAll(s: SparkSession, dir: String): DataFrame =
    docsDup(s, dir).unionByName(
      Tables.documents(s, dir).filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" graft dup tail marker")).as("text")))

  /** Corpus spiked with EXCERPTS: every 13th doc also appears as its own
    * first 150 characters — a short doc contained whole in a long one,
    * the shape containment catches and Jaccard structurally cannot
    * (common/n_small ≈ 1 vs common/union ≈ n_small/n_big). */
  private def docsContain(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 300000L).as("doc_id"),
        substring(col("text"), 1, 150).as("text")))
  }

  /** Corpus spiked with TWO tailed near-dup copies of every 13th doc —
    * {base, +400000, +500000} are pairwise similar, so the pair graph
    * carries real 3-cliques for the triangle audit (E63). */
  private def docsTri(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 400000L).as("doc_id"),
        concat(col("text"), lit(" graft tri tail one")).as("text")))
      .unionByName(d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" graft tri tail two")).as("text")))
  }

  private val docsTriSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 400000, text || ' graft tri tail one' FROM documents WHERE doc_id % 13 = 0
      |UNION ALL SELECT doc_id + 500000, text || ' graft tri tail two' FROM documents WHERE doc_id % 13 = 0""".stripMargin

  private val docsContainSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 300000, substr(text, 1, 150) FROM documents WHERE doc_id % 13 = 0""".stripMargin

  private val docsDupSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0""".stripMargin
  private val docsNearSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 200000, text || ' graft dup tail marker' FROM documents WHERE doc_id % 17 = 0""".stripMargin
  private val docsAllSql =
    s"""$docsDupSql
       |UNION ALL SELECT doc_id + 200000, text || ' graft dup tail marker' FROM documents WHERE doc_id % 17 = 0""".stripMargin

  // ------------------------------------------------ shared SQL fragments

  private val normSql =
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
  private val toksSql = s"string_split($normSql, ' ')"
  /** shingle list over toks `t` (matches TextOps.shingles w=3). */
  private val shingleListSql =
    """CASE WHEN len(t) >= 3
      |     THEN list_transform(generate_series(1, len(t)-2), i -> t[i]||' '||t[i+1]||' '||t[i+2])
      |     ELSE [array_to_string(t, ' ')] END""".stripMargin

  /** postings CTE body over a named corpus CTE. */
  private def postOverSql(cte: String) =
    s"""SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, unnest($shingleListSql) AS s
       |  FROM (SELECT doc_id, $toksSql AS t FROM $cte))""".stripMargin
  private val postSql = postOverSql("corpus")

  /** hashed-postings CTE body (mirrors Dedup.hashedPostings: h60 applied
    * BEFORE the DISTINCT; md5 is identical in both engines so even a
    * collision — which would merge two shingles on both sides alike —
    * keeps the compare exact). */
  private def hashedPostOverSql(cte: String) =
    s"""SELECT DISTINCT doc_id, ${PortableHash.duckH60("s")} AS s FROM (
       |  SELECT doc_id, unnest($shingleListSql) AS s
       |  FROM (SELECT doc_id, $toksSql AS t FROM $cte))""".stripMargin

  private def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString(", ")

  private val StopWords = TextOps.Markers.head._2 // english markers

  // -------------------------------------------------------------- queries

  val Tau: Long = 6000L // jaccard_bp threshold for near-dup pairs
  val TauContain: Long = 8000L // containment_bp threshold (E38)
  val NumPerm = 12
  val Bands = 4
  val PackBudget = 512L // tokens per packed training sequence
  val SampleRates = Map("en" -> 4000L, "zh" -> 10000L) // basis points kept
  val SampleDefaultBp = 7000L
  val SegTokens = 16 // segment size for span-level dedup
  val MixBudgets = Map("en" -> 5000L) // token budgets per lang (E24)
  val MixDefaultBudget = 2000L
  val LmTopK = 3 // continuations kept per prefix (E26)
  // deterministic PII spikes for E30 (appended by doc_id residue, both engines)
  val PiiSpikeA = " contact a.user+tag@example-site.org or 10.20.30.44"
  val PiiSpikeB = " call +1 555-123-4567 now"
  val KmvK = 64 // KMV sketch size (E27)
  val HhDen = 200 // heavy hitter = tok with tf > N/200 of all tokens (E32)
  val HhK = 255 // MG counters; k+1 ≥ den ⟹ candidate set ⊇ true answer
  val SrcDen = 20 // dominant source = > 1/20 of the corpus token budget
  val SrcK = 63 // weighted-MG counters for the source profile
  val ChunkSize = 32 // tokens per retrieval chunk (E28)
  val ChunkStride = 24
  // max docs kept per source (E43) — sized to BIND at the driver's gate
  // scale (sf0.01 has 25 docs/source), so the oracle checks the cap
  // actually cutting, not just ranking
  val SourceCap = 15
  // priority-sample size (E47) — well under sf0.01's 5000 docs so the
  // threshold τ genuinely cuts (an exhaustive "sample" would test nothing)
  val PrioritySampleK = 100
  val Bm25K = 5 // docs kept per query (E48)
  val BpeRounds = 20 // merge rules learned (E49, rows-only)
  // duplicated-passage excision window (E51): the minimum duplicated
  // span length, the role the suffix-array threshold plays in Lee 2022
  val PassageK = 40
  val PassageSampleBp = 200 // E51s: 2% window keyspace — sf10-oracle-feasible
  // E2s-gate: 2% shingle-keyspace candidate screen for the pair family —
  // the third-decade (sf100) oracle-feasibility dial; production pair
  // queries stay unsampled
  val NgramSampleBp = 200
  // winnowing (E53): k-gram size and frame width — detection guaranteed
  // for shared spans >= k+w-1 = 27 chars at ~2/(w+1) fingerprint density
  val WinnowK = 20
  val WinnowW = 8
  val WinnowTau = 2L // candidate pair = >= 2 shared fingerprints
  val ClassifierN = 3 // char-ngram order (E52)
  val ClassifierScale = 1000000L // centroid weights in integer ppm
  // open-vocab bound: grams with corpus-wide count below this are
  // dropped from the weight table (the weight table otherwise grows
  // with the corpus's Zipf tail — the r11-verdict sf10 confusion leg)
  val ClassifierMinCount = 3L
  // E52 corpus spike: the driver's synthetic docs carry a random `lang`
  // label over IDENTICAL token soup — no classifier can learn a label
  // independent of the text. Real corpora differ in character
  // distribution per language, so (the PiiSpike pattern) both engines
  // append the same per-lang function-word phrase, twice, making the
  // label a genuine function of the text the model must recover.
  val PrIters = 10 // PageRank iterations (E57)
  val PrScale = 1000000000000L // PageRank fixed-point mass (E57)
  val CollocMin = 5L // bigram support floor for PMI collocations (E58)
  val CollocK = 100 // collocations kept (E58)
  val LangSpikeRep = 2
  val LangSpikes: Seq[(String, String)] = Seq(
    "en" -> " the and is not of to in that it was",
    "de" -> " der und das ist nicht zu in dass es war",
    "fr" -> " le la et est ne pas dans que il fut",
    "es" -> " el la y es no de en que lo fue",
    "zh" -> " de shi bu le zai wo you ta zhe zhong")

  /** The lang-spiked corpus (doc_id, lang, text) — E52's input, derived
    * identically by [[langSpikedSql]]. */
  private[graft] def langSpiked(s: SparkSession, dir: String): DataFrame = {
    val spike = LangSpikes.foldLeft(lit(""): org.apache.spark.sql.Column) {
      case (acc, (l, m)) => when(col("lang") === l, lit(m * LangSpikeRep)).otherwise(acc)
    }
    Tables.documents(s, dir).select(
      col("doc_id"), col("lang"), concat(col("text"), spike).as("text"))
  }

  private[graft] lazy val langSpikedSql = {
    val cases = LangSpikes
      .map { case (l, m) => s"WHEN '$l' THEN '${m * LangSpikeRep}'" }
      .mkString(" ")
    s"SELECT doc_id, lang, text || CASE lang $cases ELSE '' END AS text FROM documents"
  }

  /** E52's weight table, trained ONCE per (session, corpus) and shared
    * by `classifier_train` / `classifier_predict` / `classifier_confusion`
    * — the three used to EACH pay the corpus-scale training pass
    * (~14 s of every gate run, r10 verdict nit). The localCheckpoint is
    * the in-suite artifact; in production the Cli persists the model
    * (`Cli classifier train` → [[graft.text.Classifier.save]]) and
    * serve/eval load it, which is the layout this memo mirrors. The
    * DuckDB oracles still retrain inline — sharing a materialization is
    * a cost choice, not a semantics change. */
  private val classifierModelMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def classifierWeights(s: SparkSession, dir: String): DataFrame = {
    // drop entries whose session is stopped so the memo can't pin
    // localCheckpoint'd frames for the JVM lifetime (r12 advice)
    classifierModelMemo.keysIterator
      .filter(_._1.sparkContext.isStopped).foreach(classifierModelMemo.remove)
    classifierModelMemo.getOrElseUpdate((s, dir),
      graft.text.Classifier.trainCentroid(
        langSpiked(s, dir).filter(col("doc_id") % 5 =!= 0), "lang", "text",
        ClassifierN, ClassifierScale, ClassifierMinCount).localCheckpoint())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E10: token counting — whitespace, BPE-ish regex, normalized
    "text_tokens" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextOps.bpeCount(col("text")).as("n_bpe_units"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_norm_tokens"))
    }),

    // E9: quality metrics (integer counts + basis-point ratios)
    "text_quality" -> ((s, dir) => {
      val t = col("text")
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(t).cast("long").as("n_chars"),
        TextOps.wsTokenCount(t).as("n_tokens"),
        TextOps.charClassCount(t, "[.,!?;:]").as("n_punct"),
        TextOps.charClassCount(t, "[0-9]").as("n_digit"),
        TextOps.markerCount(TextOps.tokens(t), StopWords).as("n_stop"),
        TextOps.bp(TextOps.charClassCount(t, "[a-zA-Z]"), length(t)).as("alpha_bp"),
        TextOps.bp(TextOps.markerCount(TextOps.tokens(t), StopWords),
          TextOps.wsTokenCount(t)).as("stop_bp"))
    }),

    // E8: language-ID marker scores + argmax prediction
    "text_langid" -> ((s, dir) => {
      val scores = TextOps.langScores(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id") +:
          scores.map { case (l, c) => c.as(s"score_$l") } :+
          TextOps.langPredict(scores).as("pred_lang"): _*)
    }),

    // E11: document fingerprints (md5 of normalized + min shingle hash)
    "text_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.minShingleHash(col("text")).as("min_shingle_h"))
    }),

    // E1: exact dedup via fingerprint groupBy
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docsDup(s, dir), "doc_id", "text")),

    // E2: n-gram Jaccard pairs (inverted-index join)
    "dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docsNear(s, dir), "doc_id", "text", Tau)),

    // E2-gate: the SAMPLED-CANDIDACY screen — candidates only from a
    // deterministic 2% slice of the shingle keyspace, metric still exact
    // over all shingles. The E51s keyspace-screen generalized to the
    // pair family: the third-decade (sf100) correctness gate where the
    // full pair oracle is resource-bound
    "dedup_ngram_sampled" -> ((s, dir) =>
      Dedup.ngramJaccardPairsSampled(
        docsNear(s, dir), "doc_id", "text", Tau, NgramSampleBp)),

    // E38: containment near-dup — the metric that catches a short doc
    // embedded whole in a long one (excerpt/boilerplate supersets),
    // same inverted-index machinery and skew cap as dedup_ngram
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(docsContain(s, dir), "doc_id", "text", TauContain)),

    // E3: MinHash+LSH candidates, exact-verified
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLshPairs(docsNear(s, dir), "doc_id", "text", Tau, NumPerm, Bands)),

    // E59: prefix-filtered Jaccard pairs — the LOSSLESS candidate
    // strategy (each doc indexes only its rarest p = n−ceil(τn)+1
    // shingles); must hash-match the UNCAPPED exact all-pairs oracle
    "dedup_ngram_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPairsPrefix(docsNear(s, dir), "doc_id", "text", Tau)),

    // E4: SimHash pairs, hamming <= 3 with exact banded recall
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(docsAll(s, dir), "doc_id", "text")),

    // E2d: dedup clustering — near-dup pairs grouped into connected
    // components, every doc labeled with its canonical keeper (min id)
    "dedup_components" -> ((s, dir) => {
      val docs = docsNear(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Tau)
      Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
    }),

    // E2d-gate: components over the SAMPLED pair screen — same closure,
    // candidate edges from the 2% shingle slice; the sf100 gate twin of
    // dedup_components (sampled edges ⊆ full edges, so these components
    // REFINE the full partition — pinned in DedupSpec)
    "dedup_components_sampled" -> ((s, dir) => {
      val docs = docsNear(s, dir)
      val pairs = Dedup.ngramJaccardPairsSampled(
        docs, "doc_id", "text", Tau, NgramSampleBp)
      Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
    }),

    // E63: TRIANGLES + local clustering coefficient over the near-dup
    // pair graph — the candidate-graph density audit: a true dup cluster
    // is near-clique (lcc → 10000 bp), a low-lcc star is one hub chaining
    // unrelated docs (the over-merge failure mode of components). Corpus
    // spiked with TWO tailed copies of every 13th doc so 3-cliques exist.
    "graph_triangles" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(docsTri(s, dir), "doc_id", "text", Tau)
      graft.operators.Triangles.perNode(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("degree"),
          col("triangles"), col("lcc_bp"))
    }),

    // E62: SURVIVORSHIP — the golden record per near-dup cluster: field-
    // wise merge under per-column rules (mode for the categoricals, max
    // length, min id as the surviving key) — the MDM read E2d-canon's
    // whole-row election can't express. Spiked dups inherit their base
    // doc's metadata via the derived base id; n_chars re-derived from the
    // member's own text so the near-dup tail actually differentiates.
    "dedup_golden" -> ((s, dir) => {
      val docs = docsNear(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Tau)
      val comp = Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
      val baseMeta = Tables.documents(s, dir)
        .select(col("doc_id").as("base_id"), col("lang"), col("source"))
      val members = docs.join(comp, "doc_id")
        .withColumn("base_id",
          when(col("doc_id") >= 200000L, col("doc_id") - 200000L)
            .otherwise(col("doc_id")))
        .join(baseMeta, "base_id")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("component_id", "doc_id", "lang", "source", "n_chars")
      Survivorship.goldenRecord(members, "component_id", Seq(
        "lang" -> Survivorship.ModeRule,
        "source" -> Survivorship.ModeRule,
        "n_chars" -> Survivorship.MaxRule,
        "doc_id" -> Survivorship.MinRule))
    }),

    // E2d-inc: INCREMENTAL clustering — labels for the old docs come from
    // a prior components run; the new docs' pairs merge into them via the
    // star summary (≤1 edge per old node, never the historical pair set).
    // Final labels must equal the full recompute — the oracle IS
    // dedup_components' transitive closure over all pairs.
    "dedup_components_incremental" -> ((s, dir) => {
      val docs = docsNear(s, dir)
      // both the old-side labeling and the new-side merge filter this —
      // pay pair generation ONCE (each consumer's own localCheckpoint
      // would otherwise re-run the expensive inverted-index join)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Tau)
        .select("id_a", "id_b").localCheckpoint()
      def isNew(c: org.apache.spark.sql.Column) = c % 5 === 3
      val labels0 = Dedup.connectedComponents(
        pairs.filter(!isNew(col("id_a")) && !isNew(col("id_b"))),
        docs.filter(!isNew(col("doc_id"))).select(col("doc_id").as("id")))
      Dedup.incrementalComponents(
        labels0,
        pairs.filter(isNew(col("id_a")) || isNew(col("id_b"))),
        docs.filter(isNew(col("doc_id"))).select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
    }),

    // E2d-canon: the dedup VERDICT — per duplicate cluster keep the one
    // best doc (highest alpha ratio, ties to smallest id), everything
    // else marked as a drop pointing at its keeper. Components turn
    // pairs into clusters; this turns clusters into the keep/drop set a
    // pipeline actually applies.
    "dedup_canonical" -> ((s, dir) => {
      val docs = docsNear(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Tau)
      val labels = Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select(col("doc_id").as("id")))
      val quality = docs.select(col("doc_id").as("id"),
        TextOps.bp(TextOps.charClassCount(col("text"), "[a-zA-Z]"),
          length(col("text"))).as("q"))
      Dedup.canonicalPerComponent(labels, quality)
        .select(col("id").as("doc_id"), col("comp").as("component_id"),
          col("canonical_id"), col("keep"))
    }),

    // E38c: the containment VERDICT — components over containment pairs,
    // keeper = the LONGEST doc (ties to smallest id): supersets survive,
    // excerpts drop — the policy that makes sense for THIS metric (the
    // Jaccard keeper maximizes quality among near-equals; a containment
    // cluster is excerpt-inside-superset, where the superset holds
    // strictly more content). Same components + argmax machinery as
    // dedup_canonical, only the quality column differs.
    "dedup_containment_canonical" -> ((s, dir) => {
      val docs = docsContain(s, dir)
      val pairs = Dedup.containmentPairs(docs, "doc_id", "text", TauContain)
      val labels = Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select(col("doc_id").as("id")))
      val quality = docs.select(col("doc_id").as("id"),
        length(col("text")).cast("long").as("q"))
      Dedup.canonicalPerComponent(labels, quality)
        .select(col("id").as("doc_id"), col("comp").as("component_id"),
          col("canonical_id"), col("keep"))
    }),

    // E2b: incremental dedup — the near-dup variants as the incoming batch
    // screened against the original corpus (cross-side pairs only)
    "dedup_incremental" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val batch = Tables.documents(s, dir).filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" graft dup tail marker")).as("text"))
      Dedup.incrementalNgramPairs(corpus, batch, "doc_id", "text", Tau)
    }),

    // E2b-indexed: the steady-state variant — incremental dedup served
    // from a PERSISTED bucketed postings+sizes index. Build (the one-time
    // amortized cost) + serve in one entry; the serve join reads the
    // corpus postings exchange-free and touches no corpus text
    // (plan-pinned in PlanSpec). Result must equal dedup_incremental.
    "dedup_incremental_indexed" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val batch = Tables.documents(s, dir).filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" graft dup tail marker")).as("text"))
      Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_inc_idx", buckets = 8)
      Dedup.incrementalNgramPairsIndexed(s, "graft_inc_idx", batch, "doc_id", "text", Tau)
    }),

    // E3-indexed: incremental MinHash+LSH from the same persisted index —
    // corpus banded buckets derived from the stored h60 postings (no text
    // touched at build OR serve), batch candidates verified exactly
    // against the stored postings
    "dedup_minhash_incremental" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val batch = Tables.documents(s, dir).filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" graft dup tail marker")).as("text"))
      Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_mh_idx", buckets = 8)
      Dedup.writeMinhashIndex(s, "graft_mh_idx", buckets = 8, NumPerm, Bands)
      Dedup.minhashLshPairsIndexed(s, "graft_mh_idx", batch, "doc_id", "text",
        Tau, NumPerm, Bands)
    }),

    // E2b-delta: index MAINTENANCE — build the index from a partial
    // corpus, accept the remaining docs via appendToNgramIndex (a
    // same-bucket-layout delta; no rebuild), then serve base ∪ delta.
    // The oracle screens the batch against the FULL corpus: the appended
    // index must answer exactly like one rebuilt from scratch.
    "dedup_incremental_delta" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus0 = docs.filter(col("doc_id") % 5 =!= 3)
      val accepted = docs.filter(col("doc_id") % 5 === 3)
      val batch = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" graft dup tail marker")).as("text"))
      Dedup.writeNgramIndex(corpus0, "doc_id", "text", "graft_delta_idx", buckets = 8)
      Dedup.appendToNgramIndex(accepted, "doc_id", "text", "graft_delta_idx")
      Dedup.incrementalNgramPairsIndexed(s, "graft_delta_idx", batch, "doc_id", "text", Tau)
    }),

    // E13: sequence packing — concat-then-chunk token-budget bins with a
    // deterministic-bucket global cumsum (no single-partition window)
    "text_pack" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(
        col("doc_id"), TextOps.wsTokenCount(col("text")).as("n_tokens"))
      Packing.packSequences(d, "doc_id", "n_tokens", PackBudget)
        .select("doc_id", "n_tokens", "start_tok", "seq_id")
    }),

    // E14: repetition scoring — share of tokens taken by the most
    // frequent token (boilerplate/degenerate-page signal)
    "text_repetition" -> ((s, dir) =>
      TextOps.repetitionStats(Tables.documents(s, dir), "doc_id", "text")),

    // E22: within-doc duplicate n-gram share (the Gopher dup-ngram
    // filter; phrase-loop twin of text_repetition)
    "text_dupngrams" -> ((s, dir) =>
      TextOps.dupNgramStats(Tables.documents(s, dir), "doc_id", "text")),

    // E24: token-budget mixture sampling — per-language token budgets
    // taken in deterministic hash order (the "data mixing" op)
    "data_mixture" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), TextOps.wsTokenCount(col("text")).as("n_tokens"))
      TextOps.tokenBudgetSample(d, "doc_id", "lang", "n_tokens", MixBudgets, MixDefaultBudget)
    }),

    // E25: segment-level dedup with reassembly — repeated spans stripped
    // corpus-wide, unique remainder of each doc survives
    "dedup_segments" -> ((s, dir) =>
      Dedup.dedupSegments(Tables.documents(s, dir), "doc_id", "text", SegTokens)),

    // E26: corpus n-gram LM stats — top-k continuations per 2-token
    // prefix by trigram count
    "text_ngram_lm" -> ((s, dir) =>
      TextOps.ngramTopK(Tables.documents(s, dir), "text", LmTopK)),

    // E28: overlapping-window chunking (RAG/serving prep) — 32-token
    // windows every 24 tokens, clipped tail, map-only
    "text_chunks" -> ((s, dir) =>
      TextOps.chunkOverlap(Tables.documents(s, dir), "doc_id", "text",
        ChunkSize, ChunkStride)),

    // E29: per-doc top-k distinctive terms (integer tf/df score,
    // engine-portable ranking)
    "text_topterms" -> ((s, dir) =>
      TextOps.topTerms(Tables.documents(s, dir), "doc_id", "text", LmTopK)),

    // E27: KMV distinct sketch (native TypedImperativeAggregate) next
    // to the exact count it approximates — deterministic, so the
    // estimate itself is oracle-checked bit-for-bit
    "vocab_sketch" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      toks.groupBy("lang").agg(
        PortableHash.kmvDistinct(PortableHash.h32(col("tok")), KmvK).as("est_distinct"),
        countDistinct(col("tok")).as("exact_distinct"))
    }),

    // E32: EXACT corpus heavy hitters by two-pass Misra-Gries sketch +
    // candidate-only re-count — exchanges stay candidate-sized (≤ k per
    // map task) instead of vocabulary-sized, yet the composed result is
    // bit-exact, so the oracle checks the scale plan's answer directly
    "text_heavy_hitters" -> ((s, dir) =>
      TextOps.heavyHitters(Tables.documents(s, dir), "text", HhDen, HhK)),

    // E32w: WEIGHTED heavy hitters — which sources dominate the corpus
    // token budget (> 1/20 of all tokens), weight = tokens per doc; at
    // real scale the item space is millions of domains, and this plan
    // never shuffles it — sketch + candidate re-count, bit-exact
    "data_source_share" -> ((s, dir) =>
      TextOps.heavyHittersWeighted(
        Tables.documents(s, dir)
          .select(col("source"),
            // null text contributes NO weight, matching the oracle's
            // len(NULL)=NULL-skipped-by-sum — stated explicitly rather
            // than relying on size()'s null semantics (the legacy
            // sizeOfNull flag would turn it into -1, which the weighted
            // MG refuses loudly)
            when(col("text").isNull, lit(0L))
              .otherwise(size(TextOps.tokens(col("text"))).cast("long"))
              .as("ntok")),
        "source", col("ntok"), SrcDen, SrcK)),

    // E33: deflate-compressibility, oracle-checkable face — DuckDB has
    // no deflate (ratio_bp rides CompressibilitySpec), but raw_bytes is
    // real cross-engine arithmetic (strlen) and the lossless round-trip
    // + worst-case-bound contracts are verified in-task per doc
    "text_compress" -> ((s, dir) =>
      graft.text.Compressibility.compressionCheck(
        Tables.documents(s, dir), "doc_id", "text")),

    // E30: PII redaction — emails/IPs/phones scrubbed to typed sentinels
    // with per-class audit counts; PII spiked into the synthetic corpus
    // deterministically (mirrored in the oracle) so the patterns really
    // fire at every scale
    "text_redact" -> ((s, dir) =>
      TextOps.redactPii(
        Tables.documents(s, dir).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 7 === 0, lit(PiiSpikeA))
              .when(col("doc_id") % 11 === 0, lit(PiiSpikeB))
              .otherwise(lit(""))).as("text")),
        "doc_id", "text")),

    // E31: corpus-novelty score — share of a doc's distinct shingles
    // appearing in no other doc (corpus-scope complement of E22)
    "text_novelty" -> ((s, dir) =>
      TextOps.noveltyStats(Tables.documents(s, dir), "doc_id", "text")),

    // E55: perplexity filtering — per-doc NLL under the corpus's own
    // add-one bigram LM, integer nats×10⁴ (per-bigram-rounded, so the
    // compare is bit-exact, not tolerance-based)
    "text_perplexity" -> ((s, dir) =>
      graft.text.LangModel.bigramNll(Tables.documents(s, dir), "doc_id", "text")),

    // E55-idx: perplexity SERVING from the persisted LM index — build on
    // the %7≠0 split, score the %7=0 batch (real OOV bigrams and
    // contexts); the serve reads the bucketed counts exchange-free and
    // never touches the training corpus
    "text_perplexity_indexed" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      graft.text.LangModel.writeLmIndex(
        d.filter(col("doc_id") % 7 =!= 0), "text", "graft_lm_idx", buckets = 8)
      graft.text.LangModel.scoreIndexed(
        s, "graft_lm_idx", d.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    }),

    // E58: collocation mining — top-k adjacent bigrams by integer PMI
    // (position-marginal probabilities, minCount-pruned before joins)
    "text_collocations" -> ((s, dir) =>
      graft.text.LangModel.collocations(
        Tables.documents(s, dir), "text", CollocMin, CollocK)),

    // E56: data-mixture design signal — pairwise Jensen–Shannon
    // divergence between per-source unigram distributions, nano-nats
    "source_divergence" -> ((s, dir) =>
      graft.text.LangModel.jsDivergence(Tables.documents(s, dir), "source", "text")),

    // E57: integer fixed-point PageRank over the near-dup pair graph —
    // which doc is most CENTRAL in its duplicate cluster (hubs that many
    // variants point at), next to components' WHICH-cluster answer
    "graph_pagerank" -> ((s, dir) =>
      graft.operators.PageRank.pageRank(
        Dedup.ngramJaccardPairs(docsNear(s, dir), "doc_id", "text", Tau),
        "id_a", "id_b", PrIters, PrScale)),

    // E15: benchmark decontamination — corpus docs sharing shingles with
    // a (broadcast) benchmark set; every corpus doc reported
    "text_decontaminate" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Decontaminate.overlap(
        d.filter(col("doc_id") % 50 =!= 0), d.filter(col("doc_id") % 50 === 0),
        "doc_id", "text")
    }),

    // E48: BM25 retrieval — every 100th doc's first 8 tokens become a
    // query, ranked against the rest of the corpus; integer scores
    // (rational tf-saturation + odds-idf, floored milli contributions)
    "text_bm25" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = d.filter(col("doc_id") % 100 =!= 0).select("doc_id", "text")
      val qs = d.filter(col("doc_id") % 100 === 0)
        .select(
          col("doc_id").as("query_id"),
          concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext"))
      graft.text.Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext",
        k = Bm25K)
    }),

    // E49: distributed BPE merge learning, oracle-checkable face — the
    // greedy in-word fold has no RE2-portable SQL twin (the raw merge
    // list rides BpeSpec's sequential-reference equivalence), so the
    // gate verifies the REPLAY invariant in-query: every round's trained
    // pair count re-derived from the word table via merges 1..r−1 must
    // match exactly, plus rule well-formedness (each side is a char or
    // an earlier merge's output) and the minCount floor
    "text_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select("text")
      val merges = graft.text.Bpe.train(docs, "text", rounds = BpeRounds, minCount = 5L)
      val replay = graft.text.Bpe.replayCounts(docs, "text", merges)
      val produced = scala.collection.mutable.Set.empty[String]
      merges.zipWithIndex.map { case (m, i) =>
        val wellformed = m.left.nonEmpty && m.right.nonEmpty &&
          (m.left.length == 1 || produced(m.left)) &&
          (m.right.length == 1 || produced(m.right))
        produced += (m.left + m.right)
        (m.round.toLong, wellformed, m.pairCount >= 5L, replay(i) == m.pairCount)
      }.toDF("round", "ok_wellformed", "ok_floor", "ok_replay")
    }),

    // E49e: BPE ENCODE, oracle-checkable face — the decode identity IS
    // SQL-expressible: concatenating a doc's symbols must reproduce its
    // normalized text with spaces removed, and the word count is real
    // cross-engine arithmetic; symbol-count bounds are checked in-query
    "text_bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val merges = graft.text.Bpe.train(docs, "text", rounds = BpeRounds, minCount = 5L)
      val words = size(filter(TextOps.tokens(col("text")), t => t =!= ""))
      graft.text.Bpe.encode(docs, "text", merges)
        .select(col("doc_id"),
          array_join(col("bpe_syms"), "").as("decoded"),
          words.cast("long").as("n_words"),
          (size(col("bpe_syms")) >= words &&
            size(col("bpe_syms")) <= length(array_join(col("bpe_syms"), "")))
            .as("ok_bounds"))
    }),

    // E51: cross-document duplicated-passage excision (exact substring
    // dedup, Lee 2022) — every 40-char window shared by >= 2 docs keeps
    // one copy (the smallest doc id) and is cut everywhere else; the
    // base corpus already carries real shared passages, no spike needed
    "dedup_passages" -> ((s, dir) =>
      graft.dedup.Passage.exciseDuplicates(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", PassageK)),

    // E51s: the same excision over a deterministic 2% window-keyspace
    // slice — the sf10 gate row for E51 (the full-keyspace oracle is
    // disk-bound at that tier; the screen shrinks its grouped sort 50×
    // while both engines still stream every window of every doc)
    "dedup_passages_sampled" -> ((s, dir) =>
      graft.dedup.Passage.exciseDuplicates(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", PassageK, PassageSampleBp)),

    // E51w: the E53→E51 COMPOSITION the 100 TB path runs — winnow
    // fingerprints route docs sharing any ≥ wk+ww−1-char passage into a
    // candidate subcorpus; full excision runs over candidates only.
    // k=40 ≥ 20+8−1 ⇒ bit-equal to the unscreened dedup_passages (the
    // composed recall contract, oracle-pinned)
    "dedup_passages_winnowed" -> ((s, dir) =>
      graft.dedup.Passage.exciseDuplicatesWinnowed(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", PassageK, WinnowK, WinnowW)),

    // E53: winnowing fingerprints (MOSS) — each doc's guaranteed-recall
    // sketch at ~2/(w+1) density; the sublinear screen in front of E51
    "text_winnow" -> ((s, dir) =>
      graft.text.Winnow.fingerprints(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", WinnowK, WinnowW)),

    // E53p: the MOSS report — candidate pairs sharing >= tau winnowed
    // fingerprints, hot fingerprints capped out of pair generation
    "dedup_winnow" -> ((s, dir) =>
      graft.text.Winnow.candidatePairs(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", WinnowK, WinnowW, WinnowTau)),

    // E54: source-pair content overlap — exact Jaccard of winnowed
    // fingerprint sets per source pair, the report that decides where a
    // cross-source dedup run will actually find shared passages
    "source_overlap" -> ((s, dir) =>
      graft.text.Winnow.sourceOverlap(
        Tables.documents(s, dir).select("doc_id", "source", "text"),
        "doc_id", "text", "source", WinnowK, WinnowW)),

    // E53-idx: the winnowed index SERVED — corpus fingerprints persisted
    // bucketed-by-fingerprint with the df cap baked in at build, a new
    // batch screened against them with the index side exchange-free and
    // no corpus text touched at serve time (plan-pinned)
    "dedup_winnow_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      graft.text.Winnow.writeIndex(
        d.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        "graft_winnow_idx", buckets = 8, WinnowK, WinnowW)
      graft.text.Winnow.screenIndexed(
        s, "graft_winnow_idx",
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", WinnowTau)
    }),

    // E52: contrastive-centroid classifier TRAINING — per-class char
    // trigram weights in integer ppm, centered per gram, learned on the
    // doc_id%5!=0 split of the lang-spiked corpus (one shared training
    // pass, [[classifierWeights]])
    "classifier_train" -> ((s, dir) => classifierWeights(s, dir)),

    // E52p: classifier SERVING — held-out docs scored against the
    // broadcast weight table, exact-integer argmax; `lang_actual` rides
    // along so the artifact doubles as the accuracy record (100% at
    // sf0.001 — the label is recoverable by construction, see LangSpikes).
    // The model comes from [[classifierWeights]]' shared materialization
    // — serving references the weight table twice (broadcast join +
    // fallback class) and in production loads it from parquet anyway.
    // Served through the FOLD path (r12 verdict item 4): the same
    // exact-integer argmax as predictCentroid, but one codegen'd scan
    // per doc instead of explode + two shuffles + window — and the
    // actual label rides the same scan, so the whole query is a single
    // corpus pass with zero exchange. Bit-equivalence to the join path
    // is property-pinned in ClassifierSpec; the oracle is unchanged.
    "classifier_predict" -> ((s, dir) => {
      langSpiked(s, dir).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("lang").as("lang_actual"),
          graft.text.Classifier.centroidPredictColumn(
            classifierWeights(s, dir), col("text"), ClassifierN).as("pred"))
    }),

    // E52e: classifier EVALUATION — the held-out confusion matrix, one
    // exact-integer row per (actual, predicted) pair; closes the
    // train → serve → eval loop in the oracle record (scored from the
    // SAME weight table the train query landed, never a retrain)
    "classifier_confusion" -> ((s, dir) => {
      langSpiked(s, dir).filter(col("doc_id") % 5 === 0)
        .select(col("lang").as("lang_actual"),
          graft.text.Classifier.centroidPredictColumn(
            classifierWeights(s, dir), col("text"), ClassifierN).as("pred"))
        .groupBy("lang_actual", "pred")
        .agg(count(lit(1)).as("n"))
    }),

    // E48b: BM25 served from the PERSISTED index — corpus tokenized once
    // at build, the serve path reads bucketed postings + frozen stats and
    // must answer exactly like the inline path (same oracle as text_bm25)
    "text_bm25_indexed" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = d.filter(col("doc_id") % 100 =!= 0).select("doc_id", "text")
      val qs = d.filter(col("doc_id") % 100 === 0)
        .select(
          col("doc_id").as("query_id"),
          concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8)).as("qtext"))
      graft.text.Bm25.writeIndex(corpus, "doc_id", "text", "graft_bm25_idx", buckets = 8)
      graft.text.Bm25.searchIndex(s, "graft_bm25_idx", qs, "query_id", "qtext",
        k = Bm25K)
    }),

    // E20: the capstone composition — quality filter → exact dedup →
    // stratified sample → sequence packing, one declarative plan end to
    // end (what a real ingest run chains; every stage is the operator
    // checked individually above)
    "pipeline_e2e" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val dup = d.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
      val q = d.unionByName(dup).filter(col("n_chars") >= 120)
      val keepers = Dedup.exact(q, "doc_id", "text")
        .select(col("keeper_id").as("doc_id"))
      val sampled = TextOps.stratifiedSample(
        q.join(keepers, "doc_id"), "doc_id", "lang", SampleRates, SampleDefaultBp)
      Packing.packSequences(
        sampled.withColumn("n_tokens", TextOps.wsTokenCount(col("text"))),
        "doc_id", "n_tokens", PackBudget)
        .select("doc_id", "lang", "n_tokens", "start_tok", "seq_id")
    }),

    // E21: quality gating — cut the bottom quartile per language by
    // stop-word ratio (rank-based, integer-exact quantile boundary)
    "quality_filter" -> ((s, dir) => {
      val t = col("text")
      val scored = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextOps.bp(TextOps.markerCount(TextOps.tokens(t), StopWords),
          TextOps.wsTokenCount(t)).as("stop_bp"))
      TextOps.quantileFilter(scored, "lang", "stop_bp", "doc_id", 1, 4)
    }),

    // E60: deterministic global shuffle + contiguous sharding — the
    // training-order writer: seeded portable-hash permutation rank (one
    // range exchange via the positional machinery, no global window),
    // shards = ⌊pos·n/total⌋ so sizes differ by ≤1 and each shard is a
    // dense contiguous range of the permutation
    "data_shuffle" -> ((s, dir) =>
      graft.operators.CorpusShuffle.shuffleShards(
        Tables.documents(s, dir).select("doc_id"), "doc_id",
        seed = 7L, nShards = 8)),

    // E19: corpus rebalancing — deterministic per-language downsampling
    // (en kept at 40%, zh boosted to 100%, everything else 70%)
    "data_sample" -> ((s, dir) =>
      TextOps.stratifiedSample(
        Tables.documents(s, dir).select("doc_id", "lang", "source"),
        "doc_id", "lang", SampleRates, SampleDefaultBp)),

    // E43: per-source document CAP — the over-representation guard (at
    // most N docs per source, priority = deterministic hash draw), on the
    // native bounded-heap top-k plan: no per-source sort, k rows of state
    // per source no matter how big the source
    "data_source_cap" -> ((s, dir) =>
      TextOps.sourceCap(
        Tables.documents(s, dir).select("doc_id", "lang", "source"),
        "doc_id", "source", SourceCap)),

    // E47: priority sampling — k docs drawn ∝ length, with Horvitz-
    // Thompson weights for unbiased subset-sum estimation downstream;
    // bounded-heap top-(k+1), floored doubles for a hash-stable gate
    "data_priority_sample" -> ((s, dir) =>
      graft.operators.PrioritySample.sample(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", length(col("text")), k = PrioritySampleK)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("w"),
          floor(col("priority")).cast("long").as("pri_fl"),
          floor(col("ht_weight")).cast("long").as("ht_fl"))),

    // E2c-lp: LEAKAGE-PROOF split (E2c × E2d) — the eval-hygiene rule
    // dedup practice exists to serve: near-duplicate docs must never
    // straddle train/test, so the split hashes the CLUSTER id (every
    // doc labels with its component min), not the doc id. A test doc
    // with a near-twin in train is a leaked answer, and doc-hash splits
    // leak exactly the duplicated mass that matters most
    "data_split_leakproof" -> ((s, dir) => {
      val docs = docsNear(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Tau)
      val comp = Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
      val bucket = graft.text.PortableHash.h32(
        concat(lit("split:"), col("component_id").cast("string"))) % 100
      comp.select(
        col("doc_id"), col("component_id"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
    }),

    // E2c-lp-gate: the leak-proof split over the SAMPLED component
    // labels — the sf100 gate twin of data_split_leakproof (the screen
    // changes which clusters merge, never the split rule)
    "data_split_leakproof_sampled" -> ((s, dir) => {
      val docs = docsNear(s, dir)
      val pairs = Dedup.ngramJaccardPairsSampled(
        docs, "doc_id", "text", Tau, NgramSampleBp)
      val comp = Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), docs.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("comp").as("component_id"))
      val bucket = graft.text.PortableHash.h32(
        concat(lit("split:"), col("component_id").cast("string"))) % 100
      comp.select(
        col("doc_id"), col("component_id"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
    }),

    // pipeline staple: deterministic train/val/test assignment by portable
    // hash bucket (stable across runs and engines, no RNG state)
    "data_split" -> ((s, dir) => {
      val bucket = graft.text.PortableHash.h32(
        concat(lit("split:"), col("doc_id").cast("string"))) % 100
      Tables.documents(s, dir).select(
        col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
    })
  )

  // -------------------------------------------------------------- oracles

  /** text_bm25's oracle — also the contract for the indexed serve. */
  private val bm25Sql: String =
      s"""WITH ct AS (
         |  SELECT doc_id, list_filter($toksSql, x -> x <> '') AS t
         |  FROM documents WHERE doc_id % 100 <> 0),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM ct),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |                 CAST(COALESCE(sum(dl), 0) AS BIGINT) AS l FROM dl),
         |tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
         |       FROM (SELECT ct.doc_id, dl.dl, unnest(ct.t) AS tok
         |             FROM ct JOIN dl USING (doc_id))
         |       GROUP BY doc_id, dl, tok),
         |qt AS (SELECT doc_id AS query_id,
         |         array_to_string(list_slice($toksSql, 1, 8), ' ') AS qtext
         |       FROM documents WHERE doc_id % 100 = 0),
         |qtok AS (SELECT DISTINCT query_id, tok FROM (
         |           SELECT query_id, unnest(string_split(qtext, ' ')) AS tok FROM qt)
         |         WHERE tok <> ''),
         |matched AS (SELECT tf.* FROM tf
         |            WHERE tok IN (SELECT DISTINCT tok FROM qtok)),
         |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
         |          FROM matched GROUP BY tok),
         |scored AS (
         |  SELECT query_id, doc_id,
         |    CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum(CAST(floor((
         |      (CAST(2*n - 2*df + 1 AS DOUBLE) / CAST(2*df + 1 AS DOUBLE)) *
         |      (CAST(44*l*tf AS DOUBLE) /
         |       CAST(20*l*tf + 6*l + 18*dl*n AS DOUBLE))) * 1000.0) AS BIGINT))
         |      AS BIGINT) AS score_milli
         |  FROM matched
         |  JOIN dfreq USING (tok) JOIN qtok USING (tok) CROSS JOIN stats
         |  GROUP BY query_id, doc_id)
         |SELECT query_id, doc_id, n_terms, score_milli, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score_milli DESC, doc_id ASC) AS rk FROM scored)
         |WHERE rk <= $Bm25K""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // E33: booleans are in-task-verified invariants (no deflate twin);
    // raw_bytes is real cross-engine arithmetic (UTF-8 byte length)
    "text_compress" ->
      """SELECT doc_id, CAST(coalesce(strlen(text), 0) AS BIGINT) AS raw_bytes,
        |  true AS ok_roundtrip, true AS ok_bounds
        |FROM documents""".stripMargin,

    // E49: the replay/wellformed/floor invariants are in-query-verified
    // (no sequential-fold twin); the row spine pins rounds learned
    "text_bpe_train" ->
      s"""SELECT CAST(r.range + 1 AS BIGINT) AS round, true AS ok_wellformed,
         |  true AS ok_floor, true AS ok_replay
         |FROM range($BpeRounds) r""".stripMargin,

    // E49e: decoded text and word count are REAL cross-engine values —
    // the decode identity makes them recomputable from the raw text
    "text_bpe_encode" ->
      s"""SELECT doc_id, replace($normSql, ' ', '') AS decoded,
         |  CAST(len(list_filter($toksSql, x -> x <> '')) AS BIGINT) AS n_words,
         |  true AS ok_bounds
         |FROM documents""".stripMargin,

    "text_tokens" ->
      s"""SELECT doc_id,
         |  len(regexp_split_to_array(text, '\\s+')) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpe_units,
         |  len($toksSql) AS n_norm_tokens
         |FROM documents""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id,
         |  length(text) AS n_chars,
         |  len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         |  len(list_filter($toksSql, x -> x IN (${inList(StopWords)}))) AS n_stop,
         |  CAST(floor((length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) * 10000.0 / length(text)) AS BIGINT) AS alpha_bp,
         |  CAST(floor(len(list_filter($toksSql, x -> x IN (${inList(StopWords)}))) * 10000.0
         |       / len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS stop_bp
         |FROM documents""".stripMargin,

    "text_langid" -> {
      val scoreExprs = TextOps.Markers.map { case (l, ws) =>
        s"len(list_filter(t, x -> x IN (${inList(ws)}))) AS score_$l"
      }.mkString(",\n  ")
      val langs = TextOps.Markers.map(_._1)
      val caseExpr = langs.init.zipWithIndex.map { case (l, i) =>
        val conds = langs.drop(i + 1).map(o => s"score_$l >= score_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ") + s" ELSE '${langs.last}'"
      s"""SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
         |  CASE $caseExpr END AS pred_lang
         |FROM (SELECT doc_id, $toksSql AS t,
         |  $scoreExprs
         |FROM documents)""".stripMargin
    },

    "text_fingerprint" ->
      s"""SELECT doc_id, md5($normSql) AS fp,
         |  list_min(list_transform($shingleListSql, s -> ${PortableHash.duckH32("s")})) AS min_shingle_h
         |FROM (SELECT doc_id, text, $toksSql AS t FROM documents)""".stripMargin,

    "dedup_exact" ->
      s"""WITH corpus AS ($docsDupSql)
         |SELECT md5($normSql) AS fp, min(doc_id) AS keeper_id, count(*) AS n_docs
         |FROM corpus GROUP BY 1""".stripMargin,

    // mirrors the default skew cap: candidates only from shingles with
    // df <= DefaultMaxDf; exact Jaccard still scored over ALL shingles
    "dedup_ngram" -> dedupNgramSql,

    "dedup_ngram_sampled" -> dedupNgramSampledSql,

    "dedup_components_sampled" ->
      s"""${closureOverPairsSql(dedupNgramSampledSql)}
         |SELECT doc_id, component_id FROM comp""".stripMargin,

    // same candidate machinery, containment denominator: least(n_a, n_b)
    "dedup_containment" -> dedupContainmentSql,

    // undirected transitive closure of the near-dup pairs: min reachable
    // id per doc == the converged min-label propagation
    "dedup_components" ->
      s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id_a, id_b FROM ($dedupNgramSql)),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
         |          UNION SELECT id_b, id_a FROM e0),
         |nodes AS MATERIALIZED (SELECT doc_id AS id FROM ($docsNearSql)),
         |reach(id, anc) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id)
         |SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS component_id
         |FROM reach GROUP BY id""".stripMargin,

    // canonical a<b edges straight from the pair oracle; triangles by
    // WEDGE EXPLOSION instead of the ordered 3-clique self-join: each
    // node's higher-neighbor list explodes into (v, w) wedges on ONE
    // edge scan, a wedge is a triangle iff (v, w) is itself an edge —
    // the same a<b<c orientation (each triangle counted once at its
    // lowest corner). The 3-way e×e×e self-join re-executed the pair
    // chain per pipeline under DuckDB 1.0.0 (15+ min at sf1); the wedge
    // shape measures 37 s with row-identical output. Corners exploded
    // back per node; lcc in integer basis points, exact floor division.
    "graph_triangles" ->
      s"""WITH p AS (${ngramPairsSqlOver(docsTriSql, "sa.n + sb.n - common", "jaccard_bp", Tau)}),
         |e AS MATERIALIZED (SELECT DISTINCT id_a AS a, id_b AS b FROM p),
         |nb AS (SELECT u, list(v ORDER BY v) AS hi FROM (
         |         SELECT a AS u, b AS v FROM e) GROUP BY u),
         |w AS (SELECT u, unnest(flatten(list_transform(hi, x ->
         |        list_transform(list_filter(hi, y -> y > x), y -> {'v': x, 'w': y})))) AS pr
         |      FROM nb),
         |t AS (SELECT w.u, pr['v'] AS v, pr['w'] AS wv FROM w
         |      JOIN e ON e.a = pr['v'] AND e.b = pr['w']),
         |d AS (SELECT id, count(*) AS degree FROM (
         |  SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY 1),
         |tc AS (SELECT id, count(*) AS tri FROM (
         |  SELECT u AS id FROM t UNION ALL SELECT v FROM t
         |  UNION ALL SELECT wv FROM t) GROUP BY 1)
         |SELECT d.id AS doc_id, d.degree,
         |  CAST(coalesce(tc.tri, 0) AS BIGINT) AS triangles,
         |  CAST(CASE WHEN d.degree >= 2
         |       THEN 2 * coalesce(tc.tri, 0) * 10000 // (d.degree * (d.degree - 1))
         |       ELSE 0 END AS BIGINT) AS lcc_bp
         |FROM d LEFT JOIN tc ON tc.id = d.id""".stripMargin,

    // same closure → per-cluster field-wise survivorship: mode = (count
    // desc, value asc) via row_number — exactly the operator's min_by
    // over (−count, value) tie order; extremal fields in one aggregate
    "dedup_golden" ->
      s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id_a, id_b FROM ($dedupNgramSql)),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
         |          UNION SELECT id_b, id_a FROM e0),
         |nodes AS MATERIALIZED (SELECT doc_id AS id FROM ($docsNearSql)),
         |reach(id, anc) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS component_id
         |         FROM reach GROUP BY id),
         |m AS (
         |  SELECT c.component_id, n.doc_id, d.lang, d.source,
         |         CAST(length(n.text) AS BIGINT) AS n_chars
         |  FROM comp c
         |  JOIN ($docsNearSql) n ON n.doc_id = c.doc_id
         |  JOIN documents d ON d.doc_id =
         |    CASE WHEN n.doc_id >= 200000 THEN n.doc_id - 200000 ELSE n.doc_id END),
         |gl AS (SELECT component_id, lang FROM (
         |  SELECT component_id, lang,
         |         row_number() OVER (PARTITION BY component_id
         |           ORDER BY count(*) DESC, lang ASC) AS rn
         |  FROM m WHERE lang IS NOT NULL GROUP BY component_id, lang)
         |  WHERE rn = 1),
         |gsrc AS (SELECT component_id, source FROM (
         |  SELECT component_id, source,
         |         row_number() OVER (PARTITION BY component_id
         |           ORDER BY count(*) DESC, source ASC) AS rn
         |  FROM m WHERE source IS NOT NULL GROUP BY component_id, source)
         |  WHERE rn = 1),
         |ga AS (SELECT component_id, max(n_chars) AS n_chars,
         |              min(doc_id) AS doc_id, count(*) AS n_members
         |       FROM m GROUP BY component_id)
         |SELECT ga.component_id, gl.lang, gsrc.source, ga.n_chars,
         |       ga.doc_id, ga.n_members
         |FROM ga
         |LEFT JOIN gl USING (component_id)
         |LEFT JOIN gsrc USING (component_id)""".stripMargin,

    // the incremental merge must land exactly where a full recompute
    // lands — same closure, same oracle text as dedup_components
    "dedup_components_incremental" ->
      s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id_a, id_b FROM ($dedupNgramSql)),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
         |          UNION SELECT id_b, id_a FROM e0),
         |nodes AS MATERIALIZED (SELECT doc_id AS id FROM ($docsNearSql)),
         |reach(id, anc) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id)
         |SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS component_id
         |FROM reach GROUP BY id""".stripMargin,

    // closure → per-cluster quality argmax (ties to min id) → keep/drop.
    // The quality expression IS text_quality's alpha_bp, so the verdict
    // is reproducible from already-oracle-checked parts.
    "dedup_canonical" ->
      s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id_a, id_b FROM ($dedupNgramSql)),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
         |          UNION SELECT id_b, id_a FROM e0),
         |nodes AS MATERIALIZED (SELECT doc_id AS id FROM ($docsNearSql)),
         |reach(id, anc) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS component_id
         |         FROM reach GROUP BY id),
         |q AS (SELECT doc_id,
         |        CAST(floor((length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) * 10000.0
         |             / length(text)) AS BIGINT) AS q
         |      FROM ($docsNearSql)),
         |j AS (SELECT c.doc_id, c.component_id, q.q
         |      FROM comp c JOIN q USING (doc_id)),
         |best AS (SELECT component_id, max(q) AS mq FROM j GROUP BY 1),
         |canon AS (SELECT j.component_id, min(j.doc_id) AS canonical_id
         |          FROM j JOIN best ON j.component_id = best.component_id AND j.q = best.mq
         |          GROUP BY 1)
         |SELECT j.doc_id, j.component_id, canon.canonical_id,
         |       (j.doc_id = canon.canonical_id) AS keep
         |FROM j JOIN canon ON j.component_id = canon.component_id""".stripMargin,
    // closure over containment pairs + per-cluster argmax on LENGTH
    // (ties to smallest id) — supersets survive, excerpts drop
    "dedup_containment_canonical" ->
      s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id_a, id_b FROM ($dedupContainmentSql)),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
         |          UNION SELECT id_b, id_a FROM e0),
         |nodes AS MATERIALIZED (SELECT doc_id AS id FROM ($docsContainSql)),
         |reach(id, anc) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS component_id
         |         FROM reach GROUP BY id),
         |q AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS q
         |      FROM ($docsContainSql)),
         |j AS (SELECT c.doc_id, c.component_id, q.q
         |      FROM comp c JOIN q USING (doc_id)),
         |best AS (SELECT component_id, max(q) AS mq FROM j GROUP BY 1),
         |canon AS (SELECT j.component_id, min(j.doc_id) AS canonical_id
         |          FROM j JOIN best ON j.component_id = best.component_id AND j.q = best.mq
         |          GROUP BY 1)
         |SELECT j.doc_id, j.component_id, canon.canonical_id,
         |       (j.doc_id = canon.canonical_id) AS keep
         |FROM j JOIN canon ON j.component_id = canon.component_id""".stripMargin
  ) ++ oracleSql2

  /** Candidate-capped n-gram pair oracle, metric-parameterized — Jaccard
    * and containment share candidate generation exactly as the Spark
    * operators share [[Dedup]]'s overlapPairs core. */
  private def ngramPairsSqlOver(
      corpusSql: String, denom: String, metricName: String, tau: Long) =
      // SELF-JOIN-FREE shape: per-shingle doc lists exploded into
      // ordered pairs on ONE scan of the postings — because DuckDB 1.0.0
      // re-executes multi-referenced CTEs per consumer pipeline (the
      // MATERIALIZED hint does not rescue CTEs joined against
      // themselves): the old post/cpost self-join shape measured 621 s
      // at sf1 where this shape measures ~4 s, bit-identically.
      //
      // CANDIDATE-BOUNDED explosion (r10 ADVICE): pairs are generated
      // ONLY from shingles under the df cap, so pair mass is
      // sum_{df<=maxDf}(df²) — the same candidate-mass bound the Spark
      // side's capped inverted index rides; one ubiquitous shingle no
      // longer costs a quadratic explosion here. `common` still counts
      // ALL shared shingles (hot included): for the surviving candidate
      // pairs it is |shingles(a) ∩ shingles(b)| via per-doc shingle
      // lists (postings are DISTINCT per (doc_id, s), so the intersect
      // length equals the pair-explosion count). Semantics are exactly
      // the original capped-candidacy + full-verify contract.
      s"""WITH corpus AS ($corpusSql),
         |post AS (${hashedPostOverSql("corpus")}),
         |byS AS (SELECT count(*) AS df,
         |          list(doc_id ORDER BY doc_id) AS ds FROM post GROUP BY s),
         |cand AS (SELECT DISTINCT p['a'] AS id_a, p['b'] AS id_b FROM (
         |    SELECT unnest(flatten(list_transform(ds, x ->
         |      list_transform(list_filter(ds, y -> y > x),
         |                     y -> {'a': x, 'b': y})))) AS p
         |    FROM byS WHERE df <= ${Dedup.DefaultMaxDf})),
         |dl AS (SELECT doc_id, list(s) AS ss FROM post GROUP BY doc_id),
         |agg AS (SELECT id_a, id_b,
         |          CAST(length(list_intersect(da.ss, db.ss)) AS BIGINT) AS common
         |        FROM cand JOIN dl da ON da.doc_id = id_a
         |                  JOIN dl db ON db.doc_id = id_b),
         |sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY 1)
         |SELECT id_a, id_b, common, sa.n AS n_a, sb.n AS n_b,
         |  CAST(floor(common * 10000.0 / ($denom)) AS BIGINT) AS $metricName
         |FROM agg JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         |WHERE CAST(floor(common * 10000.0 / ($denom)) AS BIGINT) >= $tau""".stripMargin

  private lazy val dedupNgramSql =
    ngramPairsSqlOver(docsNearSql, "sa.n + sb.n - common", "jaccard_bp", Tau)

  /** E2-gate oracle: candidacy restricted to the deterministic
    * `NgramSampleBp`/10000 slice of the shingle keyspace (h32 over the
    * h60 key's decimal rendering — the slice picks WHOLE shingles, so
    * both engines enumerate the identical candidate set), df cap read on
    * the sliced postings (slice keeps a shingle's true df intact), exact
    * intersect/sizes over ALL shingles of candidate docs only — which is
    * what keeps this oracle feasible at sf100 where the full pair
    * oracle's explosion is resource-bound. `post` is MATERIALIZED: it
    * feeds three consumers and DuckDB re-executes inlined CTEs per
    * pipeline (the sf10-sweep lesson). */
  private lazy val dedupNgramSampledSql = {
    val screen = PortableHash.duckH32("'sngram:'||CAST(s AS VARCHAR)") +
      s" % 10000 < $NgramSampleBp"
    s"""WITH corpus AS ($docsNearSql),
       |post AS MATERIALIZED (${hashedPostOverSql("corpus")}),
       |spost AS (SELECT doc_id, s FROM post WHERE $screen),
       |byS AS (SELECT count(*) AS df,
       |          list(doc_id ORDER BY doc_id) AS ds FROM spost GROUP BY s),
       |cand AS (SELECT DISTINCT p['a'] AS id_a, p['b'] AS id_b FROM (
       |    SELECT unnest(flatten(list_transform(ds, x ->
       |      list_transform(list_filter(ds, y -> y > x),
       |                     y -> {'a': x, 'b': y})))) AS p
       |    FROM byS WHERE df <= ${Dedup.DefaultMaxDf})),
       |cdocs AS (SELECT DISTINCT doc_id FROM (
       |    SELECT id_a AS doc_id FROM cand
       |    UNION ALL SELECT id_b AS doc_id FROM cand)),
       |dl AS (SELECT doc_id, list(s) AS ss
       |       FROM post JOIN cdocs USING (doc_id) GROUP BY doc_id),
       |agg AS (SELECT id_a, id_b,
       |          CAST(length(list_intersect(da.ss, db.ss)) AS BIGINT) AS common
       |        FROM cand JOIN dl da ON da.doc_id = id_a
       |                  JOIN dl db ON db.doc_id = id_b),
       |sizes AS (SELECT doc_id, count(*) AS n
       |          FROM post JOIN cdocs USING (doc_id) GROUP BY doc_id)
       |SELECT id_a, id_b, common, sa.n AS n_a, sb.n AS n_b,
       |  CAST(floor(common * 10000.0 / (sa.n + sb.n - common)) AS BIGINT) AS jaccard_bp
       |FROM agg JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       |WHERE CAST(floor(common * 10000.0 / (sa.n + sb.n - common)) AS BIGINT) >= $Tau""".stripMargin
  }

  /** Transitive closure + labels over an arbitrary pair SQL — shared by
    * the sampled gate twins of dedup_components / data_split_leakproof
    * (the unsampled originals keep their verbatim SQL: the driver hashes
    * oracle text, so rewriting them risks a no-op diff churn). */
  private def closureOverPairsSql(pairsSql: String): String =
    s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id_a, id_b FROM ($pairsSql)),
       |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
       |          UNION SELECT id_b, id_a FROM e0),
       |nodes AS MATERIALIZED (SELECT doc_id AS id FROM ($docsNearSql)),
       |reach(id, anc) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id),
       |comp AS (
       |  SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS component_id
       |  FROM reach GROUP BY id)""".stripMargin

  /** E59 oracle: UNCAPPED exact all-pairs — the prefix filter is
    * lossless, so its answer must equal the no-cap ground truth (the
    * oracle needn't model the prefix at all). */
  private lazy val dedupNgramExactSql =
    // self-join-free explosion like ngramPairsSqlOver but over ALL
    // shingles — the uncapped all-pairs ground truth the lossless
    // prefix filter must equal; here the sum(df²) pair mass is
    // INTRINSIC to the semantics (a hot shingle's pairs are real
    // answers), not an oracle artifact, so no candidate bound applies
    // (DuckDB 1.0.0 re-executes self-joined CTEs; see the shape note
    // in ngramPairsSqlOver)
    s"""WITH corpus AS ($docsNearSql),
       |post AS (${hashedPostOverSql("corpus")}),
       |byS AS (SELECT s, list(doc_id ORDER BY doc_id) AS ds FROM post GROUP BY s),
       |pe AS (SELECT unnest(flatten(list_transform(ds, x ->
       |         list_transform(list_filter(ds, y -> y > x),
       |                        y -> {'a': x, 'b': y})))) AS p
       |       FROM byS),
       |common AS (SELECT p['a'] AS id_a, p['b'] AS id_b,
       |             CAST(count(*) AS BIGINT) AS common FROM pe GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY 1)
       |SELECT id_a, id_b, common, sa.n AS n_a, sb.n AS n_b,
       |  CAST(floor(common * 10000.0 / (sa.n + sb.n - common)) AS BIGINT) AS jaccard_bp
       |FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
       |WHERE CAST(floor(common * 10000.0 / (sa.n + sb.n - common)) AS BIGINT) >= $Tau""".stripMargin

  private lazy val dedupContainmentSql =
    ngramPairsSqlOver(docsContainSql, "least(sa.n, sb.n)", "containment_bp", TauContain)

  /** MinHash signature min-exprs over a postings CTE exposing (doc_id, s):
    * permutation lanes hash "seed:" + the h60 key's decimal rendering —
    * mirrors Dedup.minhashSignaturesFromPostings over hashedPostings
    * (Spark's concat coerces the long to the same decimal string). */
  private lazy val mhSigExprs: String = (0 until NumPerm).map(i =>
    s"min(${PortableHash.duckH32Lane(i / 4, i % 4, "CAST(s AS VARCHAR)")}) AS sig_$i"
  ).mkString(",\n  ")

  /** Banded (band, bucket, doc_id) rows from a signature CTE (mirrors
    * Dedup.bandedBuckets — build and serve must share the layout). */
  private def mhBandSelects(sigsCte: String): String = {
    val rows = NumPerm / Bands
    (0 until Bands).map { b =>
      val slice = (0 until rows).map(r => s"sig_${b * rows + r}").mkString("||','||")
      s"SELECT $b AS band, ${PortableHash.duckH32(slice)} AS bucket, doc_id FROM $sigsCte"
    }.mkString("\nUNION ALL ")
  }

  /** E51 oracle — same semantics with NO hashing (DuckDB groups the raw
    * window strings), which is the proof the Spark side's 60-bit screen
    * is semantics-free. Reconstruction mirrors the fold: gap segments
    * between removed spans plus the tail, concatenated in position order. */
  private lazy val dedupPassagesSql = dedupPassagesSqlAt(10000)

  /** `sampleBp` < 10000 mirrors the Spark side's deterministic window-
    * keyspace screen ([[graft.dedup.Passage]]): dup grouping restricted
    * to windows whose portable h32 lands in the first bp/10000 of hash
    * space — the sf10-disk-feasible variant of the same string-exact
    * semantics (the filter shrinks the grouped sort 10000/bp× while the
    * full corpus still streams through both engines). */
  private def dedupPassagesSqlAt(sampleBp: Int) =
    dedupPassagesSqlOver(
      "corpus AS (SELECT doc_id, text FROM documents)", "corpus", sampleBp)

  /** The excision stack parameterized on its WINDOW SOURCE: `winSrc` is
    * the CTE windows are enumerated from (the candidate subcorpus in
    * the winnow-screened composition), while the final pass-through
    * SELECT always covers the full `corpus` — non-candidates come back
    * untouched, exactly like the Spark side's anti-join leg. */
  private def dedupPassagesSqlOver(
      corpusDef: String, winSrc: String, sampleBp: Int) = {
    val k = PassageK
    val screen =
      if (sampleBp >= 10000) ""
      else s" WHERE ${graft.text.PortableHash.duckH32(s"substr(text, pos, $k)")} % 10000 < $sampleBp"
    s"""WITH $corpusDef,
       |pos AS (
       |  SELECT doc_id, text, unnest(generate_series(1, length(text) - ${k - 1})) AS pos
       |  FROM $winSrc WHERE length(text) >= $k),
       |w AS (SELECT doc_id, pos, substr(text, pos, $k) AS win FROM pos$screen),
       |dup AS (
       |  SELECT win, min(doc_id) AS keeper FROM w
       |  GROUP BY win HAVING count(DISTINCT doc_id) >= 2),
       |occ AS (
       |  SELECT w.doc_id, w.pos FROM w JOIN dup USING (win)
       |  WHERE w.doc_id <> dup.keeper),
       |brk AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN pos > coalesce(max(pos + $k) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |      THEN 1 ELSE 0 END AS b
       |  FROM occ),
       |isl AS (
       |  SELECT doc_id, pos, sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM brk),
       |iv AS (
       |  SELECT doc_id, min(pos) AS s, max(pos) + $k AS e
       |  FROM isl GROUP BY doc_id, island),
       |seg AS (
       |  SELECT doc_id,
       |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS b,
       |    s AS t FROM iv
       |  UNION ALL
       |  SELECT doc_id, max(e) AS b, NULL AS t FROM iv GROUP BY doc_id),
       |cleaned AS (
       |  SELECT c.doc_id,
       |    string_agg(
       |      CASE WHEN seg.t IS NULL THEN substr(c.text, seg.b)
       |           ELSE substr(c.text, seg.b, seg.t - seg.b) END,
       |      '' ORDER BY seg.b) AS text_clean
       |  FROM corpus c JOIN seg ON seg.doc_id = c.doc_id
       |  GROUP BY c.doc_id),
       |removed AS (SELECT doc_id, sum(e - s) AS nr FROM iv GROUP BY doc_id)
       |SELECT c.doc_id,
       |  CAST(coalesce(r.nr, 0) AS BIGINT) AS n_removed,
       |  coalesce(cl.text_clean, c.text) AS text_clean
       |FROM corpus c
       |LEFT JOIN cleaned cl ON cl.doc_id = c.doc_id
       |LEFT JOIN removed r ON r.doc_id = c.doc_id""".stripMargin
  }

  /** E52 shared CTE stack: spiked corpus → train-split n-gram counts →
    * ppm (`//` = DuckDB integral division = Spark's `div` on positives)
    * → per-gram contrastive centering, mirroring trainCentroid. */
  private lazy val classifierWeightsCtes = {
    val n = ClassifierN
    s"""corpus AS ($langSpikedSql),
       |train AS (
       |  SELECT lang AS cls, lower(text) AS t FROM corpus WHERE doc_id % 5 <> 0),
       |tpos AS (
       |  SELECT cls, t, unnest(generate_series(1, length(t) - ${n - 1})) AS i
       |  FROM train WHERE length(t) >= $n),
       |tg AS (SELECT cls, substr(t, i, $n) AS gram FROM tpos),
       |counts AS (SELECT cls, gram, count(*) AS cnt FROM tg GROUP BY 1, 2),
       |totals AS (SELECT cls, sum(cnt) AS tot FROM counts GROUP BY 1),
       |ppm AS (
       |  SELECT counts.cls, counts.gram, counts.cnt,
       |         (counts.cnt * $ClassifierScale) // totals.tot AS p
       |  FROM counts JOIN totals USING (cls)),
       |nc AS (SELECT count(*) AS c FROM totals),
       |-- minCount vocab floor folded into the centering window pass
       |-- (whole grams drop, so survivors' centering sums are untouched;
       |-- class totals are pre-floor — ppm normalization unchanged)
       |weights AS (
       |  SELECT cls, gram, w_ppm FROM (
       |    SELECT cls, gram,
       |           CAST(nc.c * p - sum(p) OVER (PARTITION BY gram) AS BIGINT) AS w_ppm,
       |           sum(cnt) OVER (PARTITION BY gram) AS gtot
       |    FROM ppm, nc)
       |  WHERE gtot >= $ClassifierMinCount)""".stripMargin
  }

  /** E53 oracle CTE stack over a named corpus CTE: the same two window
    * functions over the same portable h60 — frame minima then the
    * reflect-back max — so the selected set is engine-independent by
    * construction. `pre` prefixes the CTE names so two stacks (corpus +
    * batch) compose in one query; the final CTE is `<pre>fps`. */
  private def winnowFpsStack(corpusCte: String, pre: String): String = {
    val (k, w) = (WinnowK, WinnowW)
    val h60 = PortableHash.duckH60(s"substr(text, pos, $k)")
    s"""${pre}pos AS (
       |  SELECT doc_id, text, unnest(generate_series(1, length(text) - ${k - 1})) AS pos
       |  FROM $corpusCte WHERE length(text) >= $k),
       |${pre}g AS (SELECT doc_id, pos, $h60 AS h FROM ${pre}pos),
       |${pre}mh AS (
       |  SELECT doc_id, pos, h,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mh,
       |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) = $w AS frame_full
       |  FROM ${pre}g),
       |${pre}sel AS (
       |  SELECT doc_id, pos, h,
       |    max(CASE WHEN frame_full THEN mh END) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS selmax
       |  FROM ${pre}mh),
       |${pre}fps AS (SELECT doc_id, pos, h AS fp FROM ${pre}sel WHERE h = selmax)""".stripMargin
  }

  private lazy val winnowFpsCtes =
    s"""corpus AS (SELECT doc_id, text FROM documents),
       |${winnowFpsStack("corpus", "")}""".stripMargin

  /** E52 prediction CTE stack: weights + held-out scoring + argmax +
    * fallback — shared by the per-doc prediction and confusion oracles. */
  private lazy val classifierPredictCtes = {
    val n = ClassifierN
    s"""$classifierWeightsCtes,
       |heldout AS (
       |  SELECT doc_id, lang, lower(text) AS t FROM corpus WHERE doc_id % 5 = 0),
       |hpos AS (
       |  SELECT doc_id, t, unnest(generate_series(1, length(t) - ${n - 1})) AS i
       |  FROM heldout WHERE length(t) >= $n),
       |hg AS (SELECT doc_id, substr(t, i, $n) AS gram FROM hpos),
       |tf AS (SELECT doc_id, gram, count(*) AS tf FROM hg GROUP BY 1, 2),
       |scored AS (
       |  SELECT tf.doc_id, w.cls, sum(tf.tf * w.w_ppm) AS score
       |  FROM tf JOIN weights w USING (gram) GROUP BY 1, 2),
       |best AS (SELECT doc_id, max(score) AS b FROM scored GROUP BY 1),
       |pred AS (
       |  SELECT s.doc_id, min(s.cls) AS pred
       |  FROM scored s JOIN best ON best.doc_id = s.doc_id AND s.score = best.b
       |  GROUP BY 1),
       |fb AS (SELECT min(cls) AS f FROM weights)""".stripMargin
  }

  /** E57 oracle: the SAME integer fixed-point iterations, unrolled as
    * CTEs from the same PrIters/PrScale constants the Spark side uses
    * (recursive CTEs can't aggregate in the recursive term). Every
    * operand is a positive integer, so DuckDB's flooring `//` and
    * Spark's truncating `div` agree at every step. */
  private lazy val pageRankSql: String = {
    // Every unrolled iteration consumes exactly ONE edge CTE (carrying
    // the source degree on each edge row) and the previous rank CTE
    // (carrying the constant base on each rank row) — DuckDB 1.0.0
    // re-executes multiply-referenced CTEs per consumer pipeline, so the
    // old shape (deg joined twice per iteration + a c0 scalar subquery)
    // re-ran the whole pair-generation chain ~30x at sf1. Grouping by
    // dst IS the node spine: und is symmetric, so every node has an
    // in-edge and the old deg spine join was a no-op filter.
    val iters = (1 to PrIters).map { i =>
      s"""r$i AS (SELECT u.dst AS id,
         |  max(p.base) + 85 * CAST(sum(p.r // u.deg) AS BIGINT) // 100 AS r,
         |  max(p.base) AS base
         |  FROM und2 u JOIN r${i - 1} p ON u.src = p.id GROUP BY u.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH prpairs AS MATERIALIZED (SELECT id_a, id_b FROM ($dedupNgramSql)),
       |und AS (SELECT id_a AS src, id_b AS dst FROM prpairs
       |        UNION ALL SELECT id_b, id_a FROM prpairs),
       |und2 AS MATERIALIZED (SELECT src, dst,
       |        count(*) OVER (PARTITION BY src) AS deg FROM und),
       |deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM und2 GROUP BY 1),
       |c0 AS (SELECT $PrScale // count(*) AS pn,
       |              (15 * ($PrScale // count(*))) // 100 AS base FROM deg),
       |r0 AS (SELECT src AS id, pn AS r, base FROM deg CROSS JOIN c0),
       |$iters
       |SELECT deg.src AS doc_id, CAST(deg.deg AS BIGINT) AS deg,
       |       CAST(r$PrIters.r AS BIGINT) AS pr_fp
       |FROM r$PrIters JOIN deg ON r$PrIters.id = deg.src""".stripMargin
  }

  private def oracleSql2: Map[String, String] = Map(
    "dedup_passages" -> dedupPassagesSql,

    // E51w: the winnow screen mirrored in SQL — candidate docs share a
    // fingerprint with another doc; the excision stack then enumerates
    // windows from the candidate subcorpus only, pass-through over all
    "dedup_passages_winnowed" -> dedupPassagesSqlOver(
      s"""corpus AS (SELECT doc_id, text FROM documents),
         |${winnowFpsStack("corpus", "w")},
         |wshared AS (
         |  SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM wfps)
         |  GROUP BY fp HAVING count(*) >= 2),
         |wcand AS (SELECT DISTINCT doc_id FROM wfps JOIN wshared USING (fp)),
         |ccorpus AS (SELECT corpus.doc_id, corpus.text FROM corpus JOIN wcand USING (doc_id))""".stripMargin,
      "ccorpus", 10000),
    "dedup_passages_sampled" -> dedupPassagesSqlAt(PassageSampleBp),

    // E55: add-one bigram LM; ln collapsed to integer nats×10⁴ per
    // DISTINCT bigram before any sum — aggregation order cannot move the
    // result, so the compare is bit-exact despite the transcendental
    "text_perplexity" ->
      s"""WITH toks AS MATERIALIZED (SELECT doc_id, $toksSql AS t FROM documents),
         |bi AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
         |    i -> {'w1': t[i], 'w2': t[i+1]})) AS u
         |  FROM toks WHERE len(t) >= 2),
         |db AS MATERIALIZED (SELECT doc_id, u['w1'] AS w1, u['w2'] AS w2, count(*) AS k
         |       FROM bi GROUP BY 1, 2, 3),
         |c2 AS MATERIALIZED (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c2 FROM db GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         |v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)),
         |lp AS (SELECT c2.w1, c2.w2,
         |    CAST(round(ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)) * 10000) AS BIGINT) AS lp_e4
         |  FROM c2 JOIN c1 USING (w1) CROSS JOIN v),
         |pd AS (SELECT db.doc_id, CAST(sum(db.k) AS BIGINT) AS n_bigrams,
         |    CAST(-sum(db.k * lp.lp_e4) AS BIGINT) AS nll_e4
         |  FROM db JOIN lp ON db.w1 = lp.w1 AND db.w2 = lp.w2 GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(COALESCE(pd.nll_e4, 0) AS BIGINT) AS nll_e4,
         |  CAST(CASE WHEN COALESCE(pd.n_bigrams, 0) > 0
         |       THEN pd.nll_e4 // pd.n_bigrams ELSE 0 END AS BIGINT) AS avg_nll_e4
         |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,

    // E55-idx: the oracle retrains the %7≠0 counts inline and scores the
    // batch through the same one-formula lookup (coalesced counts)
    "text_perplexity_indexed" ->
      s"""WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
         |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
         |ttoks AS MATERIALIZED (SELECT $toksSql AS t FROM train),
         |tbi AS (SELECT unnest(list_transform(generate_series(1, len(t)-1),
         |    i -> {'w1': t[i], 'w2': t[i+1]})) AS u FROM ttoks WHERE len(t) >= 2),
         |c2 AS MATERIALIZED (SELECT u['w1'] AS w1, u['w2'] AS w2, CAST(count(*) AS BIGINT) AS c2
         |       FROM tbi GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
         |v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM ttoks)),
         |btoks AS (SELECT doc_id, $toksSql AS t FROM batch),
         |bbi AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
         |    i -> {'w1': t[i], 'w2': t[i+1]})) AS u FROM btoks WHERE len(t) >= 2),
         |db AS MATERIALIZED (SELECT doc_id, u['w1'] AS w1, u['w2'] AS w2, count(*) AS k
         |       FROM bbi GROUP BY 1, 2, 3),
         |lp AS (SELECT db.doc_id, db.k,
         |    CAST(round(ln(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
         |        / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)) * 10000) AS BIGINT) AS lp_e4
         |  FROM db LEFT JOIN c2 ON db.w1 = c2.w1 AND db.w2 = c2.w2
         |          LEFT JOIN c1 ON db.w1 = c1.w1
         |          CROSS JOIN v),
         |pd AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
         |       CAST(-sum(k * lp_e4) AS BIGINT) AS nll_e4 FROM lp GROUP BY 1)
         |SELECT b.doc_id, CAST(COALESCE(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(COALESCE(pd.nll_e4, 0) AS BIGINT) AS nll_e4,
         |  CAST(CASE WHEN COALESCE(pd.n_bigrams, 0) > 0
         |       THEN pd.nll_e4 // pd.n_bigrams ELSE 0 END AS BIGINT) AS avg_nll_e4
         |FROM batch b LEFT JOIN pd USING (doc_id)""".stripMargin,

    // E58: PMI with position marginals; exact integer products FIRST
    // (HUGEINT here, DECIMAL(38,0) on the Spark side — c12·N overflows
    // BIGINT at corpus scale), one double division — the identical
    // expression tree on both sides
    "text_collocations" ->
      s"""WITH toks AS (SELECT $toksSql AS t FROM documents),
         |bi AS (SELECT unnest(list_transform(generate_series(1, len(t)-1),
         |    i -> {'w1': t[i], 'w2': t[i+1]})) AS u FROM toks WHERE len(t) >= 2),
         |c12 AS MATERIALIZED (SELECT u['w1'] AS w1, u['w2'] AS w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM bi GROUP BY 1, 2),
         |c1f AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1f FROM c12 GROUP BY 1),
         |c2f AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2f FROM c12 GROUP BY 1),
         |n2 AS (SELECT CAST(sum(c12) AS BIGINT) AS n2 FROM c12),
         |scored AS (SELECT c12.w1, c12.w2, c12.c12,
         |    CAST(round(ln(CAST(CAST(c12.c12 AS HUGEINT) * n2.n2 AS DOUBLE)
         |        / CAST(CAST(c1f.c1f AS HUGEINT) * c2f.c2f AS DOUBLE)) * 10000) AS BIGINT) AS pmi_e4
         |  FROM c12 JOIN c1f USING (w1) JOIN c2f USING (w2) CROSS JOIN n2
         |  WHERE c12.c12 >= $CollocMin),
         |ranked AS (SELECT *, row_number() OVER (ORDER BY pmi_e4 DESC, w1 ASC, w2 ASC) AS rk
         |           FROM scored)
         |SELECT w1, w2, c12, pmi_e4, CAST(rk AS BIGINT) AS rk
         |FROM ranked WHERE rk <= $CollocK""".stripMargin,

    // E56: JSD between per-source unigram distributions; each token term
    // collapsed to integer nano-nats before summation (same structural
    // expression tree as the Spark side — IEEE doubles agree, only ln's
    // last ulp is at stake and the 10⁻⁹ grid absorbs it)
    "source_divergence" ->
      s"""WITH toksrc AS (SELECT source AS src, unnest($toksSql) AS w FROM documents),
         |c AS MATERIALIZED (SELECT src, w, count(*) AS cnt FROM toksrc GROUP BY 1, 2),
         |t AS MATERIALIZED (SELECT src, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY 1),
         |pr AS (SELECT x.src AS src_a, x.tot AS tot_a, y.src AS src_b, y.tot AS tot_b
         |       FROM t x JOIN t y ON x.src < y.src),
         |e AS (SELECT pr.src_a, pr.src_b, pr.tot_a, pr.tot_b, c.w,
         |    CAST(sum(CASE WHEN c.src = pr.src_a THEN c.cnt ELSE 0 END) AS BIGINT) AS ca,
         |    CAST(sum(CASE WHEN c.src = pr.src_b THEN c.cnt ELSE 0 END) AS BIGINT) AS cb
         |  FROM c JOIN pr ON c.src = pr.src_a OR c.src = pr.src_b
         |  GROUP BY 1, 2, 3, 4, 5),
         |tm AS (SELECT src_a, src_b,
         |    CAST(round((CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE)) * ln(2.0 * (CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE)) / ((CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE)) + (CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE)))) ELSE 0.0 END
         |       + CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE)) * ln(2.0 * (CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE)) / ((CAST(ca AS DOUBLE) / CAST(tot_a AS DOUBLE)) + (CAST(cb AS DOUBLE) / CAST(tot_b AS DOUBLE)))) ELSE 0.0 END) / 2.0 * 1000000000.0) AS BIGINT) AS term_nn
         |  FROM e)
         |SELECT src_a, src_b, count(*) AS n_union,
         |  CAST(sum(term_nn) AS BIGINT) AS jsd_nn,
         |  CAST(greatest(CAST(sum(term_nn) AS BIGINT), 0) // 100000 AS BIGINT) AS jsd_bp
         |FROM tm GROUP BY 1, 2""".stripMargin,

    "graph_pagerank" -> pageRankSql,

    "dedup_ngram_prefix" -> dedupNgramExactSql,

    "text_winnow" ->
      s"""WITH $winnowFpsCtes
         |SELECT doc_id, pos, fp FROM fps""".stripMargin,

    // pairwise Jaccard of per-source distinct fingerprint sets; the
    // corpus CTE carries `source` through the same winnow stack
    "source_overlap" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |${winnowFpsStack("corpus", "")},
         |sfp AS (
         |  SELECT DISTINCT d.source AS g, fps.fp
         |  FROM fps JOIN documents d ON d.doc_id = fps.doc_id),
         |sizes AS (SELECT g, count(*) AS n FROM sfp GROUP BY 1),
         |common AS (
         |  SELECT a.g AS source_a, b.g AS source_b, count(*) AS common
         |  FROM sfp a JOIN sfp b ON a.fp = b.fp AND a.g < b.g
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, common,
         |  CAST(floor(common * 10000.0 / (sa.n + sb.n - common)) AS BIGINT) AS overlap_bp
         |FROM common
         |JOIN sizes sa ON sa.g = source_a
         |JOIN sizes sb ON sb.g = source_b""".stripMargin,

    // the indexed screen must equal the direct batch-vs-corpus
    // fingerprint join; the build-time df cap mirrors as a HAVING on
    // the corpus postings
    "dedup_winnow_incremental" ->
      s"""WITH wcorpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |wbatch AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |${winnowFpsStack("wcorpus", "c")},
         |${winnowFpsStack("wbatch", "b")},
         |cdfp AS (SELECT DISTINCT doc_id, fp FROM cfps),
         |ccold AS (
         |  SELECT fp FROM cdfp GROUP BY fp
         |  HAVING count(DISTINCT doc_id) <= ${graft.dedup.Dedup.DefaultMaxDf}),
         |cpost AS (SELECT doc_id, fp FROM cdfp JOIN ccold USING (fp)),
         |bdfp AS (SELECT DISTINCT doc_id, fp FROM bfps)
         |SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
         |       count(*) AS shared_fps
         |FROM bdfp b JOIN cpost c ON b.fp = c.fp
         |GROUP BY 1, 2 HAVING count(*) >= $WinnowTau""".stripMargin,

    "dedup_winnow" ->
      s"""WITH $winnowFpsCtes,
         |dfp AS (SELECT DISTINCT doc_id, fp FROM fps),
         |cold AS (
         |  SELECT fp FROM dfp GROUP BY fp
         |  HAVING count(DISTINCT doc_id) <= ${graft.dedup.Dedup.DefaultMaxDf}),
         |post AS (SELECT doc_id, fp FROM dfp JOIN cold USING (fp))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       count(*) AS shared_fps
         |FROM post a JOIN post b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $WinnowTau""".stripMargin,

    "classifier_train" ->
      s"""WITH $classifierWeightsCtes
         |SELECT cls, gram, w_ppm FROM weights""".stripMargin,

    "classifier_predict" ->
      s"""WITH $classifierPredictCtes
         |SELECT h.doc_id, h.lang AS lang_actual, coalesce(p.pred, fb.f) AS pred
         |FROM heldout h LEFT JOIN pred p ON p.doc_id = h.doc_id, fb""".stripMargin,

    // the same prediction stack grouped to the confusion matrix
    "classifier_confusion" ->
      s"""WITH $classifierPredictCtes
         |SELECT h.lang AS lang_actual, coalesce(p.pred, fb.f) AS pred,
         |       count(*) AS n
         |FROM heldout h LEFT JOIN pred p ON p.doc_id = h.doc_id, fb
         |GROUP BY 1, 2""".stripMargin,

    "dedup_minhash" -> {
      s"""WITH corpus AS ($docsNearSql),
         |post AS (${hashedPostOverSql("corpus")}),
         |sizes AS (SELECT doc_id, count(*) AS n FROM post GROUP BY 1),
         |sigs AS (SELECT doc_id, $mhSigExprs FROM post GROUP BY doc_id),
         |banded AS (${mhBandSelects("sigs")}),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM banded l JOIN banded r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
         |vcommon AS (
         |  SELECT c.id_a, c.id_b, count(*) AS common
         |  FROM cand c
         |  JOIN post a ON a.doc_id = c.id_a
         |  JOIN post b ON b.doc_id = c.id_b AND b.s = a.s
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, common, sa.n AS n_a, sb.n AS n_b,
         |  CAST(floor(common * 10000.0 / (sa.n + sb.n - common)) AS BIGINT) AS jaccard_bp
         |FROM vcommon JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         |WHERE CAST(floor(common * 10000.0 / (sa.n + sb.n - common)) AS BIGINT) >= $Tau""".stripMargin
    },

    "dedup_incremental" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (SELECT doc_id + 200000 AS doc_id, text || ' graft dup tail marker' AS text
         |          FROM documents WHERE doc_id % 17 = 0),
         |bpost AS (${hashedPostOverSql("batch")}),
         |-- common joins only batch-matching corpus postings (mirrors the
         |-- Spark side's string prefilter-then-hash); csizes below counts
         |-- each candidate doc's FULL shingle set
         |cpost AS (SELECT DISTINCT doc_id, ${PortableHash.duckH60("s")} AS s FROM (
         |  SELECT doc_id, unnest($shingleListSql) AS s
         |  FROM (SELECT doc_id, $toksSql AS t FROM corpus))
         |  WHERE s IN (SELECT unnest($shingleListSql)
         |              FROM (SELECT $toksSql AS t FROM batch))),
         |cfull AS (${hashedPostOverSql("corpus")}),
         |bsizes AS (SELECT doc_id, count(*) AS n FROM bpost GROUP BY 1),
         |csizes AS (SELECT doc_id, count(*) AS n FROM cfull GROUP BY 1),
         |common AS (
         |  SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, count(*) AS common
         |  FROM bpost b JOIN cpost c ON b.s = c.s GROUP BY 1, 2)
         |SELECT batch_id, corpus_id, common, bs.n AS n_batch, cs.n AS n_corpus,
         |  CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) AS jaccard_bp
         |FROM common JOIN bsizes bs ON bs.doc_id = batch_id
         |JOIN csizes cs ON cs.doc_id = corpus_id
         |WHERE CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) >= $Tau""".stripMargin,

    // cross-side LSH: batch bands vs corpus bands, exact verify on the
    // full postings — mirrors the persisted-index serve path exactly
    "dedup_minhash_incremental" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (SELECT doc_id + 200000 AS doc_id, text || ' graft dup tail marker' AS text
         |          FROM documents WHERE doc_id % 17 = 0),
         |cpost AS (${hashedPostOverSql("corpus")}),
         |bpost AS (${hashedPostOverSql("batch")}),
         |csigs AS (SELECT doc_id, $mhSigExprs FROM cpost GROUP BY doc_id),
         |bsigs AS (SELECT doc_id, $mhSigExprs FROM bpost GROUP BY doc_id),
         |cbanded AS (${mhBandSelects("csigs")}),
         |bbanded AS (${mhBandSelects("bsigs")}),
         |cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |  FROM bbanded b JOIN cbanded c ON b.band = c.band AND b.bucket = c.bucket),
         |vcommon AS (
         |  SELECT cand.batch_id, cand.corpus_id, count(*) AS common
         |  FROM cand
         |  JOIN bpost bp ON bp.doc_id = cand.batch_id
         |  JOIN cpost cp ON cp.doc_id = cand.corpus_id AND cp.s = bp.s
         |  GROUP BY 1, 2),
         |bsizes AS (SELECT doc_id, count(*) AS n FROM bpost GROUP BY 1),
         |csizes AS (SELECT doc_id, count(*) AS n FROM cpost GROUP BY 1)
         |SELECT batch_id, corpus_id, common, bs.n AS n_batch, cs.n AS n_corpus,
         |  CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) AS jaccard_bp
         |FROM vcommon JOIN bsizes bs ON bs.doc_id = batch_id
         |JOIN csizes cs ON cs.doc_id = corpus_id
         |WHERE CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) >= $Tau""".stripMargin,

    // the indexed serve path must produce EXACTLY the pairs the direct
    // operator produces — the oracle is the plain full-postings join
    "dedup_incremental_indexed" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (SELECT doc_id + 200000 AS doc_id, text || ' graft dup tail marker' AS text
         |          FROM documents WHERE doc_id % 17 = 0),
         |bpost AS (${hashedPostOverSql("batch")}),
         |cpost AS (${hashedPostOverSql("corpus")}),
         |bsizes AS (SELECT doc_id, count(*) AS n FROM bpost GROUP BY 1),
         |csizes AS (SELECT doc_id, count(*) AS n FROM cpost GROUP BY 1),
         |common AS (
         |  SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, count(*) AS common
         |  FROM bpost b JOIN cpost c ON b.s = c.s GROUP BY 1, 2)
         |SELECT batch_id, corpus_id, common, bs.n AS n_batch, cs.n AS n_corpus,
         |  CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) AS jaccard_bp
         |FROM common JOIN bsizes bs ON bs.doc_id = batch_id
         |JOIN csizes cs ON cs.doc_id = corpus_id
         |WHERE CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) >= $Tau""".stripMargin,

    // the appended (base ∪ delta) index must answer exactly like an index
    // rebuilt over the full corpus — so the oracle IS the full-corpus
    // screen, identical to dedup_incremental_indexed's
    "dedup_incremental_delta" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |batch AS (SELECT doc_id + 200000 AS doc_id, text || ' graft dup tail marker' AS text
         |          FROM documents WHERE doc_id % 17 = 0),
         |bpost AS (${hashedPostOverSql("batch")}),
         |cpost AS (${hashedPostOverSql("corpus")}),
         |bsizes AS (SELECT doc_id, count(*) AS n FROM bpost GROUP BY 1),
         |csizes AS (SELECT doc_id, count(*) AS n FROM cpost GROUP BY 1),
         |common AS (
         |  SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, count(*) AS common
         |  FROM bpost b JOIN cpost c ON b.s = c.s GROUP BY 1, 2)
         |SELECT batch_id, corpus_id, common, bs.n AS n_batch, cs.n AS n_corpus,
         |  CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) AS jaccard_bp
         |FROM common JOIN bsizes bs ON bs.doc_id = batch_id
         |JOIN csizes cs ON cs.doc_id = corpus_id
         |WHERE CAST(floor(common * 10000.0 / (bs.n + cs.n - common)) AS BIGINT) >= $Tau""".stripMargin,

    "text_pack" ->
      s"""SELECT doc_id, n_tokens,
         |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok,
         |  CAST(floor(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $PackBudget.0) AS BIGINT) AS seq_id
         |FROM (SELECT doc_id, len(regexp_split_to_array(text, '\\s+')) AS n_tokens
         |      FROM documents)""".stripMargin,

    "text_repetition" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |counts AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
         |ranked AS (SELECT doc_id, tok, cnt,
         |    sum(cnt) OVER (PARTITION BY doc_id) AS total,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok ASC) AS rk
         |  FROM counts)
         |SELECT doc_id, tok AS top_tok, CAST(cnt AS BIGINT) AS top_cnt,
         |  CAST(total AS BIGINT) AS n_tokens,
         |  CAST(floor(cnt * 10000.0 / total) AS BIGINT) AS rep_bp
         |FROM ranked WHERE rk = 1""".stripMargin,

    "text_dupngrams" ->
      s"""SELECT doc_id,
         |  CAST(len(l) AS BIGINT) AS n_ngrams,
         |  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,
         |  CAST(floor((len(l) - len(list_distinct(l))) * 10000.0 / len(l)) AS BIGINT) AS dup_bp
         |FROM (SELECT doc_id, $shingleListSql AS l
         |      FROM (SELECT doc_id, $toksSql AS t FROM documents))""".stripMargin,

    "data_mixture" -> {
      val budgetCase = "CASE " + MixBudgets.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN lang = '$k' THEN $v" }
        .mkString(" ") + s" ELSE $MixDefaultBudget END"
      s"""SELECT doc_id, lang, n_tokens FROM (
         |  SELECT doc_id, lang, n_tokens,
         |    COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_toks,
         |    $budgetCase AS budget
         |  FROM (SELECT doc_id, lang,
         |          CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
         |          ${PortableHash.duckH32("'mix:'||CAST(doc_id AS VARCHAR)")} AS h
         |        FROM documents))
         |WHERE before_toks < budget""".stripMargin
    },

    "dedup_segments" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |segs AS (
         |  SELECT doc_id, u['idx'] AS idx, u['seg'] AS seg FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(0, GREATEST(CAST(ceil(len(t) / $SegTokens.0) AS INT), 1) - 1),
         |      i -> {'idx': i, 'seg': array_to_string(t[(i*$SegTokens+1):(i*$SegTokens+$SegTokens)], ' ')})) AS u
         |    FROM toks)),
         |ranked AS (SELECT doc_id, idx, seg,
         |    row_number() OVER (PARTITION BY ${PortableHash.duckH60("seg")}
         |                       ORDER BY doc_id, idx) AS rk
         |  FROM segs)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_segments,
         |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  COALESCE(string_agg(CASE WHEN rk = 1 THEN seg END, ' ' ORDER BY idx), '') AS clean_text
         |FROM ranked GROUP BY doc_id""".stripMargin,

    "text_ngram_lm" ->
      s"""WITH toks AS (SELECT $toksSql AS t FROM documents),
         |tri AS (SELECT unnest(list_transform(generate_series(1, len(t) - 2),
         |    i -> {'p': t[i]||' '||t[i+1], 'n': t[i+2]})) AS u FROM toks),
         |counts AS (SELECT u['p'] AS prefix, u['n'] AS next_tok, count(*) AS cnt
         |           FROM tri GROUP BY 1, 2),
         |ranked AS (SELECT prefix, next_tok, CAST(cnt AS BIGINT) AS cnt,
         |    row_number() OVER (PARTITION BY prefix ORDER BY cnt DESC, next_tok ASC) AS rk
         |  FROM counts)
         |SELECT prefix, next_tok, cnt, CAST(rk AS BIGINT) AS rk
         |FROM ranked WHERE rk <= $LmTopK""".stripMargin,

    "text_topterms" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |ranked AS (
         |  SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
         |    CAST(dfreq.df AS BIGINT) AS df,
         |    CAST(floor(tf.tf * 10000.0 / dfreq.df) AS BIGINT) AS score_bp,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.token ASC) AS rk
         |  FROM tf JOIN dfreq ON tf.token = dfreq.token)
         |SELECT doc_id, token, tf, df, score_bp, CAST(rk AS BIGINT) AS rk
         |FROM ranked WHERE rk <= $LmTopK""".stripMargin,

    "text_chunks" ->
      s"""SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |  array_to_string(t[(i*$ChunkStride+1):(i*$ChunkStride+$ChunkSize)], ' ') AS chunk_text,
         |  CAST(len(t[(i*$ChunkStride+1):(i*$ChunkStride+$ChunkSize)]) AS BIGINT) AS n_tokens
         |FROM (SELECT doc_id, t,
         |        unnest(generate_series(0,
         |          GREATEST(CAST(ceil((len(t) - $ChunkSize) / $ChunkStride.0) AS INT), 0))) AS i
         |      FROM (SELECT doc_id, $toksSql AS t FROM documents))""".stripMargin,

    "vocab_sketch" ->
      s"""WITH toks AS (SELECT lang, unnest($toksSql) AS tok FROM documents),
         |hashes AS (SELECT DISTINCT lang, ${PortableHash.duckH32("tok")} AS h FROM toks),
         |ranked AS (SELECT lang, h,
         |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rk FROM hashes),
         |agg AS (SELECT lang, max(CASE WHEN rk <= $KmvK THEN h END) AS kth,
         |               max(rk) AS nd FROM ranked GROUP BY 1),
         |ex AS (SELECT lang, count(DISTINCT tok) AS exact_distinct FROM toks GROUP BY 1)
         |SELECT agg.lang,
         |  CASE WHEN nd < $KmvK THEN nd
         |       ELSE (${KmvK - 1} * 4294967296) // kth END AS est_distinct,
         |  ex.exact_distinct
         |FROM agg JOIN ex ON agg.lang = ex.lang""".stripMargin,

    "text_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest($toksSql) AS tok FROM documents),
         |n AS (SELECT count(*) AS n FROM t)
         |SELECT tok, count(*) AS tf,
         |  count(*) * 10000 // (SELECT n FROM n) AS share_bp
         |FROM t GROUP BY tok
         |HAVING count(*) * $HhDen > (SELECT n FROM n)""".stripMargin,

    "data_source_share" ->
      // WHERE mirrors the operator's null-item exclusion: a NULL source
      // is neither reported nor counted in the total
      s"""WITH t AS (SELECT source, len($toksSql) AS ntok FROM documents WHERE source IS NOT NULL),
         |w AS (SELECT CAST(sum(ntok) AS BIGINT) AS w FROM t)
         |SELECT source, CAST(sum(ntok) AS BIGINT) AS weight,
         |  CAST(sum(ntok) AS BIGINT) * 10000 // (SELECT w FROM w) AS share_bp
         |FROM t GROUP BY source
         |HAVING CAST(sum(ntok) AS BIGINT) * $SrcDen > (SELECT w FROM w)""".stripMargin,

    "text_redact" -> {
      // patterns interpolate from the SAME PiiPatterns constants the Spark
      // operator uses; DuckDB standard strings keep backslashes literal
      val Seq(email, ip, phone) = TextOps.PiiPatterns.map(_._2)
      val Seq(emailR, ipR, phoneR) = TextOps.PiiPatterns.map(_._3)
      s"""WITH spiked AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 7 = 0 THEN '${PiiSpikeA.replace("'", "''")}'
         |         WHEN doc_id % 11 = 0 THEN '${PiiSpikeB.replace("'", "''")}'
         |         ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$email', '$emailR', 'g'), '$ip', '$ipR', 'g'), '$phone', '$phoneR', 'g') AS clean_text,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '$ip')) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phone
         |FROM spiked""".stripMargin
    },

    "text_novelty" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |post AS (${hashedPostOverSql("corpus")}),
         |dfreq AS (SELECT s, count(*) AS df FROM post GROUP BY 1)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(floor(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT) AS novel_bp
         |FROM post JOIN dfreq USING (s) GROUP BY doc_id""".stripMargin,

    "text_decontaminate" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
         |bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
         |cpost AS (${postOverSql("corpus")}),
         |bset AS (SELECT DISTINCT s FROM (${postOverSql("bench")})),
         |hits AS (SELECT cpost.doc_id, count(*) AS n
         |  FROM cpost JOIN bset ON cpost.s = bset.s GROUP BY 1)
         |SELECT corpus.doc_id,
         |  CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_overlap,
         |  COALESCE(hits.n, 0) > 0 AS contaminated
         |FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id""".stripMargin,

    "pipeline_e2e" -> {
      val bucket = PortableHash.duckH32("'samp:'||CAST(doc_id AS VARCHAR)") + " % 10000"
      val rateCase = SampleRates.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN lang = '$k' THEN $v" }.mkString(" ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text, lang, n_chars FROM documents
         |  UNION ALL SELECT doc_id + 100000, text, lang, n_chars
         |  FROM documents WHERE doc_id % 10 = 0),
         |q AS (SELECT * FROM corpus WHERE n_chars >= 120),
         |keepers AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5($normSql)),
         |dd AS (SELECT q.* FROM q JOIN keepers USING (doc_id)),
         |samp AS (SELECT * FROM dd WHERE $bucket < CASE $rateCase ELSE $SampleDefaultBp END),
         |toks AS (SELECT doc_id, lang,
         |  len(regexp_split_to_array(text, '\\s+')) AS n_tokens FROM samp)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok,
         |  CAST(floor(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $PackBudget.0) AS BIGINT) AS seq_id
         |FROM toks""".stripMargin
    },

    "data_source_cap" -> {
      val pri = PortableHash.duckH32("'cap:'||CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, lang, source, rk FROM (
         |  SELECT doc_id, lang, source,
         |    row_number() OVER (PARTITION BY source
         |                       ORDER BY $pri ASC, doc_id ASC) AS rk
         |  FROM documents) WHERE rk <= $SourceCap""".stripMargin
    },

    "text_bm25" -> bm25Sql,

    // the indexed serve must produce EXACTLY the inline answer
    "text_bm25_indexed" -> bm25Sql,


    "data_priority_sample" -> {
      val h = PortableHash.duckH32("'pri:'||CAST(doc_id AS VARCHAR)")
      s"""WITH w AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS w, $h AS h
         |  FROM documents WHERE length(text) > 0),
         |q AS (SELECT doc_id, w,
         |  CAST(w AS DOUBLE) * 4294967296.0 / CAST(h + 1 AS DOUBLE) AS pri FROM w),
         |r AS (SELECT doc_id, w, pri,
         |  row_number() OVER (ORDER BY pri DESC, doc_id ASC) AS rk FROM q),
         |tau AS (SELECT max(CASE WHEN rk = ${PrioritySampleK + 1} THEN pri END) AS tau
         |        FROM r WHERE rk <= ${PrioritySampleK + 1})
         |SELECT doc_id, w,
         |  CAST(floor(pri) AS BIGINT) AS pri_fl,
         |  CAST(floor(greatest(CAST(w AS DOUBLE), COALESCE(tau, 0.0))) AS BIGINT) AS ht_fl
         |FROM r, tau WHERE rk <= $PrioritySampleK""".stripMargin
    },

    "data_shuffle" -> {
      val key = PortableHash.duckH60("'shuffle:7:'||CAST(doc_id AS VARCHAR)")
      s"""WITH r AS (
         |  SELECT doc_id,
         |         row_number() OVER (ORDER BY $key, doc_id) - 1 AS pos
         |  FROM documents)
         |SELECT doc_id, pos,
         |       pos * 8 // (SELECT count(*) FROM documents) AS shard
         |FROM r""".stripMargin
    },

    "data_sample" -> {
      val bucket = PortableHash.duckH32("'samp:'||CAST(doc_id AS VARCHAR)") + " % 10000"
      val rateCase = SampleRates.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN lang = '$k' THEN $v" }.mkString(" ")
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE $bucket < CASE $rateCase ELSE $SampleDefaultBp END""".stripMargin
    },

    "quality_filter" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    CAST(floor(len(list_filter($toksSql, x -> x IN (${inList(StopWords)}))) * 10000.0
         |         / len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS stop_bp
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, lang, stop_bp,
         |    row_number() OVER (PARTITION BY lang ORDER BY stop_bp ASC, doc_id ASC) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM scored)
         |SELECT doc_id, lang, stop_bp FROM ranked WHERE rk * 4 > n * 1""".stripMargin,

    "data_split" -> {
      val bucket = PortableHash.duckH32("'split:'||CAST(doc_id AS VARCHAR)") + " % 100"
      s"""SELECT doc_id,
         |  CASE WHEN $bucket < 80 THEN 'train'
         |       WHEN $bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },

    // the sf100 gate twin: same split rule over the sampled-screen
    // component labels
    "data_split_leakproof_sampled" -> {
      val bucket = PortableHash.duckH32(
        "'split:'||CAST(component_id AS VARCHAR)") + " % 100"
      s"""${closureOverPairsSql(dedupNgramSampledSql)}
         |SELECT doc_id, component_id,
         |  CASE WHEN $bucket < 80 THEN 'train'
         |       WHEN $bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM comp""".stripMargin
    },

    // same transitive closure as dedup_components, split hashed on the
    // component min — so whole clusters move between splits together
    "data_split_leakproof" -> {
      val bucket = PortableHash.duckH32(
        "'split:'||CAST(component_id AS VARCHAR)") + " % 100"
      s"""WITH RECURSIVE e0 AS MATERIALIZED (SELECT id_a, id_b FROM ($dedupNgramSql)),
         |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM e0
         |          UNION SELECT id_b, id_a FROM e0),
         |nodes AS MATERIALIZED (SELECT doc_id AS id FROM ($docsNearSql)),
         |reach(id, anc) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (
         |  SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS component_id
         |  FROM reach GROUP BY id)
         |SELECT doc_id, component_id,
         |  CASE WHEN $bucket < 80 THEN 'train'
         |       WHEN $bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM comp""".stripMargin
    },

    "dedup_simhash" -> {
      def sums(h: String, p: String) = (0 until 32).map(i =>
        s"sum(CASE WHEN ($h >> $i) % 2 = 1 THEN 1 ELSE -1 END) AS $p$i").mkString(",\n  ")
      def pack(p: String) = (0 until 32).map(i =>
        s"(CASE WHEN $p$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      s"""WITH corpus AS ($docsAllSql),
         |post AS ($postSql),
         |hs AS (SELECT doc_id, ${PortableHash.duckH32Lane(0, "s")} AS hh,
         |              ${PortableHash.duckH32Lane(1, "s")} AS hl FROM post),
         |sums AS (SELECT doc_id,
         |  ${sums("hh", "hi")},
         |  ${sums("hl", "lo")}
         |  FROM hs GROUP BY doc_id),
         |sh2 AS (SELECT doc_id, ${pack("hi")} AS sim_hi, ${pack("lo")} AS sim_lo FROM sums)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo)) AS BIGINT) AS hamming
         |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo)) <= 3""".stripMargin
    }
  )
}
