package graft.tools

import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round micro-profiler: time named sub-pipelines of the hot
  * operators with the noop sink (guide §1.4) inside ONE JVM so stage
  * ratios are comparable (cross-invocation absolute numbers on this host
  * swing 2×+; see BASELINE.md variance protocol). Not a declared query —
  * measurement instrumentation only. */
object Profile {
  private def time(spark: SparkSession, name: String)(df: => DataFrame): Unit = {
    spark.sparkContext.setJobDescription(name)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"PROFILE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    spark.sparkContext.setJobDescription(null)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, sfDir)
    val sel = if (args.isEmpty) Set.empty[String] else args.toSet
    def on(n: String) = sel.isEmpty || sel.contains(n)
    val reps = sys.env.getOrElse("PROFILE_REPS", "2").toInt
    for (_ <- 1 to reps) {
      if (on("docs_scan")) time(spark, "docs_scan")(docs)
      if (on("docs_tokens")) time(spark, "docs_tokens")(
        docs.select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("t")))
      if (on("postings_raw")) time(spark, "postings_raw")(
        docs.select(col("doc_id").as("__id"), graft.text.TextOps.tokens(col("text")).as("__t"))
          .select(col("__id"),
            explode(graft.text.TextOps.shinglesFromTokens(col("__t"), 3)).as("__sh")))
      if (on("postings_hashed_nodistinct")) time(spark, "postings_hashed_nodistinct")(
        docs.select(col("doc_id").as("__id"), graft.text.TextOps.tokens(col("text")).as("__t"))
          .select(col("__id"),
            explode(graft.text.TextOps.shinglesFromTokens(col("__t"), 3)).as("__sh"))
          .select(col("__id"), graft.text.PortableHash.h60(col("__sh")).as("__sh")))
      if (on("postings_distinct")) time(spark, "postings_distinct")(
        graft.text.TextOps.hashedShinglePostings(docs, "doc_id", "text", 3))
      if (on("ngram_pairs")) time(spark, "ngram_pairs")(
        graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 6000L))
      if (on("winnow_windows")) time(spark, "winnow_windows")(
        graft.dedup.Passage.windowsOf(docs, "doc_id", "text", 20))
      if (on("winnow_hashed")) time(spark, "winnow_hashed")(
        graft.dedup.Passage.windowsOf(docs, "doc_id", "text", 20)
          .select(col("id"), col("pos"), graft.text.PortableHash.h60(col("win")).as("h")))
      if (on("winnow_fps")) time(spark, "winnow_fps")(
        graft.text.Winnow.fingerprints(docs, "doc_id", "text", 20, 8))
      // map-only winnow candidate (no exchange, no sort, no window): all
      // per-doc arithmetic as array HOFs — A/B against the window form
      if (on("winnow_fps_maponly")) time(spark, "winnow_fps_maponly") {
        val (k, w) = (20, 8)
        val t = col("text")
        docs.filter(length(t) >= k + w - 1)
          .select(col("doc_id"), t.as("__t"))
          .select(col("doc_id"),
            transform(sequence(lit(1), length(col("__t")) - (k - 1)),
              p => graft.text.PortableHash.h60(col("__t").substr(p, lit(k)))).as("__hs"))
          .select(col("doc_id"), col("__hs"),
            transform(sequence(lit(1), size(col("__hs")) - (w - 1)),
              i => array_min(slice(col("__hs"), i, lit(w)))).as("__mins"))
          .select(col("doc_id"),
            explode(filter(
              transform(sequence(lit(1), size(col("__hs"))),
                p => struct(p.as("pos"), element_at(col("__hs"), p).as("fp"))),
              s => {
                val p = s.getField("pos")
                val lo = greatest(p - (w - 1), lit(1))
                val hi = least(p, size(col("__hs")) - (w - 1))
                exists(slice(col("__mins"), lo, hi - lo + 1),
                  m => m === s.getField("fp"))
              })).as("pf"))
          .select(col("doc_id"), col("pf.pos").cast("long").as("pos"),
            col("pf.fp").as("fp"))
      }
      // --- BPE encode form A/B (shared pre-trained rules, one JVM) ---
      lazy val bpeMerges = graft.text.Bpe.train(docs, "text", rounds = 20, minCount = 5L)
      if (on("bpe_encode_flat")) time(spark, "bpe_encode_flat") {
        // the REJECTED r15 candidate: one double fold over a literal rule
        // array (O(1) expression size) — measured 15-20% slower than the
        // nested form because HOFs are interpreted either way and the
        // per-element struct reads + re-evaluated concat(l, r) dominate
        def mergeFoldDyn(syms: org.apache.spark.sql.Column,
            a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          aggregate(syms, array().cast("array<string>"),
            (acc, x) => when(
              size(acc) > 0 && element_at(acc, -1) === a && x === b,
              concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
              .otherwise(concat(acc, array(x))))
        val rules = array(bpeMerges.map(m =>
          struct(lit(m.left).as("l"), lit(m.right).as("r"))): _*)
        docs.select(col("doc_id"), col("text"))
          .withColumn("__toks", filter(graft.text.TextOps.tokens(col("text")), t => t =!= ""))
          .withColumn("bpe_syms",
            flatten(transform(col("__toks"), w =>
              aggregate(rules, split(w, ""),
                (acc, rule) => mergeFoldDyn(acc, rule.getField("l"), rule.getField("r"))))))
          .drop("__toks")
      }
      if (on("bpe_encode_nested")) time(spark, "bpe_encode_nested") {
        // the pre-r15 form: `rounds` statically nested folds per token
        val d = docs.select(col("doc_id"), col("text"))
          .withColumn("__toks", filter(graft.text.TextOps.tokens(col("text")), t => t =!= ""))
        d.withColumn("bpe_syms",
          flatten(transform(col("__toks"),
            w => bpeMerges.foldLeft(split(w, ""): org.apache.spark.sql.Column)(
              (acc, m) => graft.text.Bpe.mergeFold(acc, m.left, m.right)))))
          .drop("__toks")
      }
      // --- overlapPairs stage breakdown (replicated from Dedup) ---
      lazy val post = graft.text.TextOps.hashedShinglePostings(docs, "doc_id", "text", 3).cache()
      lazy val hot = post.groupBy("__sh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > 128L).select("__sh")
      lazy val coolPost = post.join(broadcast(hot), Seq("__sh"), "left_anti")
      if (on("p_hot")) time(spark, "p_hot")(hot)
      if (on("p_cool_common")) time(spark, "p_cool_common")(
        coolPost.select(col("__id").as("id_a"), col("__sh"))
          .join(coolPost.select(col("__id").as("id_b"), col("__sh")), "__sh")
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("common_cool")))
      if (on("p_cool_common_arr")) time(spark, "p_cool_common_arr")(
        coolPost.groupBy("__sh").agg(sort_array(collect_list(col("__id"))).as("ids"))
          .filter(size(col("ids")) >= 2)
          .select(explode(flatten(transform(col("ids"), (x, i) =>
            transform(slice(col("ids"), i + lit(2), size(col("ids")) - i - 1),
              y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
          .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .agg(count(lit(1)).as("common_cool")))
      if (on("p_pairs_full")) time(spark, "p_pairs_full")(
        graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 6000L))
      if (on("p_counts")) {
        val docsN = docs.count()
        val postN = post.count()
        val shN = post.select("__sh").distinct().count()
        val coolN = coolPost.count()
        val candN = coolPost.select(col("__id").as("id_a"), col("__sh"))
          .join(coolPost.select(col("__id").as("id_b"), col("__sh")), "__sh")
          .filter(col("id_a") < col("id_b")).count()
        val pairN = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 6000L).count()
        println(s"PROFILE counts docs=$docsN post=$postN sh=$shN cool=$coolN cooccur=$candN pairs=$pairN")
      }
      // unpersist whenever post was materialized this rep (also in the
      // default all-stages run): a fresh copy is cached per rep, and with
      // PROFILE_REPS>1 the leaked copies evict each other and skew the
      // very stage ratios the tool exists to compare
      if (on("p_hot") || on("p_cool_common") || on("p_cool_common_arr") || on("p_counts"))
        post.unpersist()
    }
    spark.stop()
  }
}
