package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule learning (Sennrich 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-training
  * step of an LLM data pipeline, run where the data is instead of
  * streaming a 100 TB corpus through a single-node trainer.
  *
  * Classic BPE trains on the WORD FREQUENCY TABLE, not the corpus: the
  * corpus collapses to (word, count) once — vocabulary-sized, the only
  * corpus-scale pass — and every merge round then costs one map-side-
  * combined pair-count aggregation over that table plus a broadcast
  * rewrite. Per round: count adjacent symbol pairs weighted by word
  * count (one exchange of pair partials), pick the most frequent pair
  * (count desc, then lexicographic — deterministic), and rewrite every
  * word's symbol sequence with the greedy LEFT-TO-RIGHT non-overlapping
  * merge. The rewrite is a per-word left fold expressed with
  * `aggregate()` over the symbol array — codegen'd, no UDF; sequential
  * only WITHIN a word (bounded by word length), embarrassingly parallel
  * across words.
  *
  * Determinism: ties in pair counts break lexicographically, the fold is
  * deterministic, so the learned merge list is a pure function of the
  * corpus. The greedy in-word fold has no sequential-state SQL twin
  * (lookbehind is Java-only), so the raw merge list is test-verified by
  * the randomized equivalence test against a sequential reference
  * implementation (BpeSpec); the DRIVER gate checks the in-query
  * invariants instead — [[replayCounts]] (every round's trained pair
  * count re-derived from the word table) and the encode-side decode
  * identity (concatenating a doc's symbols reproduces its normalized
  * text, which a second engine CAN recompute).
  */
object Bpe {

  /** One learned rule. */
  final case class Merge(round: Int, left: String, right: String, pairCount: Long)

  /** The greedy left-to-right merge of (a, b) → a+b over a symbol array,
    * as a codegen'd left fold: append each symbol, or — when the
    * accumulator ends with `a` and the symbol is `b` — replace that tail
    * with the merged symbol. A token merged in this round equals a+b and
    * can never re-trigger (a+b ≠ a), which is exactly the non-overlap
    * rule of sequential BPE. */
  private[graft] def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** (word, cnt, syms) frequency table of a corpus — the one corpus-scale
    * pass; symbols start as single characters. */
  def wordTable(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(filter(TextOps.tokens(col(textCol)), t => t =!= "")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("word"), ""))

  /** Learn up to `rounds` merges; stops early when the best remaining
    * pair falls below `minCount`. Returns the merge list in order. */
  def train(
      corpus: DataFrame, textCol: String,
      rounds: Int, minCount: Long = 2L): Seq[Merge] = {
    require(rounds >= 0, s"Bpe.train: rounds must be >= 0, got $rounds")
    var words = wordTable(corpus, textCol).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val best = words
        .select(col("cnt"),
          // guard single-symbol words: sequence(0, -1) DESCENDS in Spark,
          // and explode of the null when-branch drops the row
          explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(
                element_at(col("syms"), i + 1).as("a"),
                element_at(col("syms"), i + 2).as("b"))))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      best.headOption.filter(_.getLong(2) >= minCount) match {
        case None => exhausted = true
        case Some(row) =>
          val (a, b, n) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(r + 1, a, b, n)
          words = words
            .withColumn("syms", mergeFold(col("syms"), a, b))
            .localCheckpoint()
          r += 1
      }
    }
    merges.result()
  }

  /** Encode a text column with a learned merge list: the same greedy fold
    * applied rule by rule in training order — so encoding the training
    * corpus reproduces training's final symbol state exactly. Output
    * adds `bpe_syms` (array<string>) per row, whole-text (tokens
    * re-segmented per word then concatenated). */
  /** Persist the learned rule list (ordered) — the tokenizer artifact a
    * serving system loads; round-trips exactly through [[loadMerges]]. */
  def saveMerges(
      spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.toDF().write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    import spark.implicits._
    spark.read.parquet(path).as[Merge].collect().sortBy(_.round).toSeq
  }

  /** Replay verification of a learned merge list — the driver-gate
    * invariant that certifies training WITHOUT a sequential-fold SQL
    * twin: because training round r counts adjacent pairs in the state
    * reached by merges 1..r−1, re-deriving that count from the word
    * table (apply merges 1..r−1, count adjacent (left_r, right_r)
    * positions, weight by word count) must reproduce `pairCount_r`
    * EXACTLY for every round. A wrong fold, a wrong argmax, or a
    * corrupted rule list breaks the equality somewhere.
    *
    * Cost: ONE job over the VOCAB-sized word table. Unlike training —
    * where each round's argmax is a global decision that forces an
    * action per round — the replay knows every rule upfront, so the
    * whole per-word trajectory (count pair r in the state after merges
    * 1..r−1, apply fold r, repeat) is expressible as a CHAIN OF
    * PROJECTIONS over the word table, with each round's count landing in
    * its own column and one final aggregation summing all rounds'
    * weighted counts at once. The r14 shape ran 2·rounds jobs (a count
    * action + a localCheckpoint materialization per round) whose
    * fixed job overhead dominated at vocab scale; the r13 shape was
    * worse still (rounds²/2 nested folds in one projection, 12.2 s at
    * rounds=24 — guide §1.2). Chained single-name projections keep the
    * plan LINEAR in rounds: each step references the previous step's
    * attribute, so no fold subtree is ever duplicated. Returns one
    * count per merge, in round order. */
  def replayCounts(
      corpus: DataFrame, textCol: String, merges: Seq[Merge]): Array[Long] = {
    if (merges.isEmpty) return Array.empty
    def pairsInWord(m: Merge) = when(size(col("__s")) < 2, lit(0L)).otherwise(
      aggregate(sequence(lit(1), size(col("__s")) - 1), lit(0L),
        (acc, j) => acc + when(
          element_at(col("__s"), j) === lit(m.left) &&
            element_at(col("__s"), j + 1) === lit(m.right), 1L).otherwise(0L)))
    var words = wordTable(corpus, textCol).withColumn("__s", col("syms"))
    merges.zipWithIndex.foreach { case (m, i) =>
      words = words.withColumn(s"__c$i", pairsInWord(m))
      // advance the replayed state — skipped after the last round (no
      // later count reads it)
      if (i < merges.length - 1)
        words = words.withColumn("__s", mergeFold(col("__s"), m.left, m.right))
    }
    val row = words.agg(
      coalesce(sum(col("cnt") * col("__c0")), lit(0L)),
      (1 until merges.length).map(i =>
        coalesce(sum(col("cnt") * col(s"__c$i")), lit(0L))): _*).head()
    Array.tabulate(merges.length)(row.getLong)
  }

  def encode(
      df: DataFrame, textCol: String, merges: Seq[Merge],
      out: String = "bpe_syms"): DataFrame =
    // deliberately `rounds` STATICALLY nested folds per token, not one
    // double fold over a literal rule array: higher-order functions are
    // interpreted either way, and the r15 A/B (Profile bpe_encode_flat
    // vs bpe_encode_nested, sf0.1/32c, 3 reps in one JVM) measured the
    // rule-array form 15-20% SLOWER — per-element struct field reads and
    // a re-evaluated concat(l, r) cost more than the deep-but-constant-
    // folded nested tree saves
    df.withColumn("__toks", filter(TextOps.tokens(col(textCol)), t => t =!= ""))
      .withColumn(out,
        flatten(transform(col("__toks"),
          w => merges.foldLeft(split(w, ""): Column)(
            (acc, m) => mergeFold(acc, m.left, m.right)))))
      .drop("__toks")
}
