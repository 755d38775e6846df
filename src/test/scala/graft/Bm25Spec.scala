package graft

import graft.text.Bm25
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** BM25 retrieval (SURVEY §2 E48): hand-computed integer scores, ranking
  * behavior (tf saturation + rare-term weighting), edge cases, and the
  * broadcast/bounded-heap plan shape. */
class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  test("E48: integer scores match the closed-form arithmetic on a tiny corpus") {
    // N=3, L=6. Query "cat fish": cat df=2, fish df=1.
    // idf_cat = 3/5, idf_fish = 5/3; tfp = 264·tf/(120·tf + 36 + 54·dl)
    // d1: cat tf=1 dl=2 → 264/264 = 1.0 → floor(0.6·1.0·1000) = 600
    // d2: cat tf=2 dl=3 → 528/438, ·0.6 → 723; fish 264/318·5/3 → 1383
    val corpus = Seq((1L, "cat dog"), (2L, "cat cat fish"), (3L, "bird"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "cat fish")).toDF("query_id", "qtext")
    val got = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 5)
      .select($"query_id", $"doc_id", $"n_terms", $"score_milli", $"rk")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 2L, 2L, 723L + 1383L, 1L), (10L, 1L, 1L, 600L, 2L)))
  }

  test("E48: rare terms outweigh common ones; tf saturates instead of growing linearly") {
    // "the" is in every doc (df=N → idf minimal); "quark" in one
    val corpus = Seq(
      (1L, "the the the the quark"), (2L, "the alpha"), (3L, "the beta"),
      (4L, "the gamma"), (5L, "the delta")).toDF("doc_id", "text")
    val qs = Seq((1L, "the quark")).toDF("query_id", "qtext")
    val got = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 5)
      .select($"doc_id", $"rk").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L) // the quark doc wins despite others matching "the"
    // saturation: 4× tf of "the" must not 4× the score — doc 1's score is
    // dominated by quark's idf, and every "the"-only doc scores similar
    val scores = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 5)
      .select($"doc_id", $"score_milli").as[(Long, Long)].collect().toMap
    val theOnly = scores.filterKeys(_ != 1L).values
    assert(theOnly.max < theOnly.min * 2, scores.toString)
  }

  test("E48: docs with no query terms are absent; empty texts count toward N only") {
    val corpus = Seq((1L, "x y"), (2L, ""), (3L, "z")).toDF("doc_id", "text")
    val qs = Seq((1L, "x"), (2L, "")).toDF("query_id", "qtext")
    val got = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 3)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L))) // q2 has no terms, docs 2/3 match nothing
  }

  test("E48: k bounds each query's results with deterministic tie-break") {
    val corpus = (1L to 10L).map(i => (i, "same words here")).toDF("doc_id", "text")
    val qs = Seq((1L, "same words")).toDF("query_id", "qtext")
    val got = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 4)
      .select($"doc_id", $"rk").as[(Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L)) // equal scores → id order
  }

  test("E48b: the persisted index serves bit-identically to the inline path") {
    val corpus = Seq(
      (1L, "cat dog mouse"), (2L, "cat cat fish heron"), (3L, "bird dog"),
      (4L, ""), (5L, "heron heron cat")).toDF("doc_id", "text")
    val qs = Seq((10L, "cat fish"), (11L, "dog"), (12L, "")).toDF("query_id", "qtext")
    Bm25.writeIndex(corpus, "doc_id", "text", "graft_bm25_t", buckets = 4)
    val served = Bm25.searchIndex(spark, "graft_bm25_t", qs, "query_id", "qtext", k = 3)
      .collect().map(_.toSeq).toSet
    val inline = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 3)
      .collect().map(_.toSeq).toSet
    assert(served == inline)
    assert(served.nonEmpty)
    // a missing index refuses loudly
    val e = intercept[IllegalArgumentException] {
      Bm25.searchIndex(spark, "graft_bm25_missing", qs, "query_id", "qtext", 3)
    }
    assert(e.getMessage.contains("not found"))
  }

  test("E48b/A0b: the bm25 CLI build/search round-trip equals the library answer") {
    val root = java.nio.file.Files.createTempDirectory("graft_bm25_cli").toString
    val corpus = Seq((1L, "cat dog"), (2L, "cat cat fish"), (3L, "bird"))
      .toDF("doc_id", "text")
    val qs = Seq((10L, "cat fish")).toDF("query_id", "qtext")
    corpus.write.parquet(s"$root/docs.parquet")
    qs.write.parquet(s"$root/qs.parquet")
    graft.tools.Cli.main(Array("bm25", "build", "--in", s"$root/docs.parquet",
      "--name", "graft_bm25_cli_idx", "--buckets", "4"))
    graft.tools.Cli.main(Array("bm25", "search", "--name", "graft_bm25_cli_idx",
      "--queries", s"$root/qs.parquet", "--query-id", "query_id",
      "--query-text", "qtext", "--k", "5", "--out", s"$root/out.parquet"))
    val got = spark.read.parquet(s"$root/out.parquet").collect().map(_.toSeq).toSet
    val lib = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", 5)
      .collect().map(_.toSeq).toSet
    assert(got == lib && got.nonEmpty)
  }

  test("E48: plan — broadcast joins + native heap; no sort-merge join, no per-query sort") {
    val corpus = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val qs = Seq((1L, "a")).toDF("query_id", "qtext")
    val p = Bm25.search(corpus, "doc_id", "text", qs, "query_id", "qtext", k = 2)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("TopKPerGroup") && !p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
