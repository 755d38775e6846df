package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.PortableHash

/** Cross-document duplicated-passage EXCISION — the "exact substring
  * deduplication" step of an LLM data pipeline (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): find
  * every k-char window whose exact text appears in ≥ 2 distinct
  * documents, keep the occurrence in the smallest doc id that carries
  * it, and CUT the duplicated spans out of every other document —
  * leaving exactly one copy of each shared passage in the corpus.
  * Document-level dedup ([[Dedup]]) drops whole near-identical docs;
  * this removes the boilerplate/quotation passages that survive it
  * because their host documents are otherwise distinct.
  *
  * The paper builds a corpus-wide suffix array — a sequential,
  * single-machine construction. The distributed re-expression works on
  * the fixed-length window fingerprint set instead (every dup of length
  * ≥ k contains a duplicated k-window, so k is the minimum match length
  * exactly as the suffix-array threshold is):
  *
  *  1. one pass explodes each doc into (pos, 60-bit window hash) — the
  *     only corpus-scale shuffle, 8-byte keys with map-side partial
  *     distinct, never the window strings;
  *  2. hashes seen in ≥ 2 docs (a corpus-duplication-rate-sized set)
  *     broadcast back as a semi-join screen, so the second pass
  *     re-derives window STRINGS for screened positions only and
  *     confirms duplication string-exact — a 60-bit collision can
  *     therefore never fabricate a false duplicate, and equal strings
  *     always share a hash, so the result is exact while the big side
  *     never shuffles more than 8-byte keys;
  *  3. per doc, the to-remove positions merge into maximal spans
  *     (gaps-and-islands over a per-doc window — partitioned by doc id,
  *     never a global sort) and a codegen'd left fold over the span
  *     array rebuilds the retained text. No UDF anywhere.
  *
  * Keeper policy: for each distinct window string, the smallest doc id
  * containing it keeps ALL its occurrences (within-doc repetition is
  * E22's metric, not this one); every other doc's occurrences are cut.
  * Deterministic, order-free, and DuckDB-expressible — the oracle
  * mirrors the semantics with no hashing at all, which is itself the
  * proof the screen is semantics-free.
  *
  * Reference scope note: the reference engine has no corpus operator
  * family; this extends the mandated LLM-pipeline surface (SURVEY §2 E).
  */
object Passage {

  /** (id, pos, win): every k-char window of every doc, 1-based. Shared
    * with [[graft.text.Winnow]] — the two surfaces must enumerate
    * windows identically or their oracle contracts silently diverge. */
  private[graft] def windowsOf(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs
      .filter(length(col(textCol)) >= k)
      .select(col(idCol).as("id"),
        explode(sequence(lit(1), length(col(textCol)) - (k - 1))).as("pos"),
        col(textCol).as("__t"))
      .select(col("id"), col("pos"), col("__t").substr(col("pos"), lit(k)).as("win"))

  /** Deterministic window-KEYSPACE screen: keep windows whose portable
    * h32 lands in the first `sampleBp`/10000 of hash space. Equal
    * strings always share an h32, so the slice is consistent per
    * distinct window — dup detection, keeper choice and excision over
    * the sampled keyspace are the full operator's semantics restricted
    * to a deterministic 1/(10000/bp) of window space, mirrored exactly
    * by the oracle (the A0g `sampleBp` screen applied to windows).
    * This is what makes a string-exact sf10 oracle disk-feasible: the
    * oracle's grouped sort shrinks 10000/bp× while BOTH engines still
    * scan the full corpus and enumerate every window (r12 verdict
    * item 1 — the full-keyspace oracle out-spilled the disk on
    * ~500 M grouped window strings). The h32 rides the same md5 digest
    * the h60 join key already pays (lane memo), so sampled mode adds
    * no second digest. */
  private def keyspaceScreen(w: DataFrame, sampleBp: Int): DataFrame = {
    require(sampleBp >= 1 && sampleBp <= 10000,
      s"Passage: sampleBp must be in [1, 10000], got $sampleBp")
    if (sampleBp == 10000) w
    else w.filter(PortableHash.h32(col("win")) % 10000 < sampleBp)
  }

  /** Duplicated windows, string-exact: (win, keeper) for every k-char
    * string present in ≥ 2 distinct docs; `keeper` = min doc id.
    * `sampleBp` < 10000 restricts to the deterministic keyspace slice
    * (see [[keyspaceScreen]]); 10000 = the full exact operator. */
  def duplicatedWindows(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      sampleBp: Int = 10000): DataFrame = {
    val wh = keyspaceScreen(windowsOf(docs, idCol, textCol, k), sampleBp)
      .withColumn("h", PortableHash.h60(col("win")))
    // pass 1: the 8-byte screen — hashes carried by >= 2 distinct docs
    val dupH = wh.groupBy("h")
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= 2).select("h")
    // pass 2: string-exact confirmation over the screened subset only;
    // dupH is duplication-rate-sized, so the join broadcasts and the
    // corpus-scale side never exchanges window strings
    wh.join(broadcast(dupH), "h")
      .groupBy("win")
      .agg(countDistinct(col("id")).as("nd"), min(col("id")).as("keeper"))
      .filter(col("nd") >= 2)
      .select("win", "keeper")
  }

  /** Rebuild `t` with the (sorted, disjoint) spans `ivs` removed:
    * a left fold appending the gap before each span, then the tail. */
  private[dedup] def cutSpans(t: Column, ivs: Column): Column =
    aggregate(
      ivs,
      struct(lit(1).as("last"), lit("").as("acc")),
      (st, iv) => struct(
        iv.getField("e").as("last"),
        concat(st.getField("acc"),
          t.substr(st.getField("last"),
            iv.getField("s") - st.getField("last"))).as("acc")),
      st => concat(st.getField("acc"),
        t.substr(st.getField("last"), length(t) - st.getField("last") + 1)))

  /** Winnow-SCREENED excision — the composition the 100 TB path runs
    * (SURVEY §2: E53 is "the screen you'd build in front of E51"):
    * instead of shuffling every k-char window hash of every doc, the
    * corpus first pays only the winnowed fingerprint pass (density
    * 2/(w+1) of the window mass), docs sharing ≥ 1 fingerprint with
    * any other doc become the CANDIDATE subcorpus, and the full
    * [[exciseDuplicates]] machinery runs over candidates only.
    * Non-candidates pass through untouched.
    *
    * Recall contract: the winnowing guarantee (Schleimer 2003) says two
    * docs sharing any substring of length ≥ wk+ww−1 share a selected
    * fingerprint — so with k ≥ wk+ww−1 (enforced) EVERY host of every
    * duplicated k-window is a candidate, the keeper choice sees the
    * same host set, and the composed result is BIT-EQUAL to the
    * unscreened operator (pinned in PassageSpec and by the driver
    * oracle, which mirrors the composition). What the screen buys at
    * scale: the all-windows shuffle is paid only by the duplicated
    * fraction of the corpus, not all of it. */
  def exciseDuplicatesWinnowed(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, wk: Int, ww: Int): DataFrame = {
    require(k >= wk + ww - 1,
      s"Passage.exciseDuplicatesWinnowed: excision window k=$k below the " +
        s"winnow guarantee wk+ww-1=${wk + ww - 1} — the screen would drop " +
        "real duplicates; raise k or shrink (wk, ww)")
    // the winnow sketch feeds the shared-fp screen AND the candidate
    // join; localCheckpoint it (≈2/(ww+1) of the window mass — the
    // screen's whole point is that this is the SMALL derivative) instead
    // of re-running the fingerprint pass per consumer. `cand` is
    // doc-id-sized and read by both the semi- and anti-join legs below —
    // checkpoint it too (the r14 before-plan re-derived the entire
    // screen for each leg: 30 corpus scans for the composed query).
    // Eager localCheckpoint, NOT cache(): no unpersist hook exists in a
    // lazy plan-builder, and checkpointed blocks are ContextCleaner-
    // collected once the query's RDD is unreachable
    val fps = graft.text.Winnow.fingerprints(docs, idCol, textCol, wk, ww)
      .select(col(idCol).as("id"), col("fp")).distinct().localCheckpoint()
    // postings are distinct (id, fp): count(*) per fp = distinct hosts
    val shared = fps.groupBy("fp").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("fp")
    val cand = fps.join(shared, "fp").select("id").distinct()
      .select(col("id").as(idCol)).localCheckpoint()
    // the candidate SUBCORPUS is read 4× inside exciseDuplicates (two
    // dup-window passes, the occurrence pass, the final rebuild join) —
    // checkpoint it once: it is the duplicated fraction of the corpus,
    // the working set this screen exists to shrink, so materializing it
    // is the scale-intended shape (vs. re-running semi-join + scan per
    // pass)
    val candidates = docs.join(cand, Seq(idCol), "left_semi").localCheckpoint()
    val excised = exciseDuplicates(candidates, idCol, textCol, k)
    val untouched = docs.join(cand, Seq(idCol), "left_anti")
      .select(col(idCol), lit(0L).as("n_removed"),
        col(textCol).as("text_clean"))
    excised.unionByName(untouched)
  }

  /** Excise duplicated passages: returns one row per input doc with
    * `n_removed` (chars cut, 0 if untouched) and `text_clean`. */
  def exciseDuplicates(
      docs: DataFrame, idCol: String, textCol: String, k: Int,
      sampleBp: Int = 10000): DataFrame = {
    require(k >= 2, s"Passage.exciseDuplicates: k must be >= 2, got $k")
    // occ below needs no keyspace filter of its own: the inner join on
    // `dup` (which only ever holds sampled windows) restricts it exactly
    val dup = duplicatedWindows(docs, idCol, textCol, k, sampleBp)
    // occurrences to remove: every screened position whose window is a
    // confirmed duplicate and whose doc is not the keeper. `dup` is the
    // same duplication-rate-sized set pass 2 broadcasts — forcing the
    // broadcast here too keeps the corpus-scale side from ever
    // exchanging raw window strings (the design claim PlanSpec pins),
    // instead of leaving the choice to statistics
    val occ = windowsOf(docs, idCol, textCol, k)
      .join(broadcast(dup), "win")
      .filter(col("id") =!= col("keeper"))
      .select("id", "pos")
    // gaps-and-islands per doc: a new span starts where pos clears every
    // earlier window's end
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val prevMaxEnd = max(col("pos") + k)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = occ
      .withColumn("brk",
        when(col("pos") > coalesce(prevMaxEnd, lit(-1)), 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy("id", "island")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + k).as("e"))
    val perDoc = spans.groupBy("id")
      .agg(
        array_sort(collect_list(struct(col("s"), col("e")))).as("ivs"),
        sum(col("e") - col("s")).cast("long").as("n_removed"))
    docs.select(col(idCol).as("id"), col(textCol).as("__t"))
      .join(perDoc, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        when(col("ivs").isNull, col("__t"))
          .otherwise(cutSpans(col("__t"), col("ivs"))).as("text_clean"))
  }
}
