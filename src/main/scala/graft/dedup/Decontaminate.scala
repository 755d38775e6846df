package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share
  * w-gram shingles with a benchmark/eval set, the standard
  * train-test-overlap hygiene step in LM data pipelines (GPT-3-style
  * n-gram overlap checks, window size parameterized).
  *
  * Scale design: the benchmark side is tiny relative to the training
  * corpus, so its distinct shingle set is broadcast; the corpus postings
  * are scanned once with no corpus-side shuffle before the per-doc
  * count aggregation (map-side combined). Every corpus doc appears in
  * the output — zero-overlap docs report n_overlap = 0 — so the result
  * can drive a filter without a second pass.
  */
object Decontaminate {

  /** Output: idCol, n_overlap (distinct shared shingles), contaminated. */
  def overlap(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, w: Int = 3): DataFrame = {
    val bset = Dedup.postings(bench, idCol, textCol, w).select(col("__sh")).distinct()
    // probe the broadcast benchmark set BEFORE any dedup: the corpus
    // side is a map-only scan+filter, and the distinct (needed because
    // n_overlap counts DISTINCT shared shingles) shuffles only the
    // survivors — at 100 TB that is the difference between shuffling
    // the corpus's entire shingle stream and its benchmark overlap
    val cpost = Dedup.postingsRaw(corpus, idCol, textCol, w)
      .join(broadcast(bset), "__sh")
      .distinct()
    val hits = cpost
      .groupBy("__id").agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol).as("__id"))
      .join(hits, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))
  }
}
