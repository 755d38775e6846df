package graft

import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-chain ingest soak (VERDICT r5 #5): the steady-state loop —
  * screen → accept (appendToNgramIndex) → label (incrementalComponents)
  * → ivfAppendIndex — composed over 20 consecutive batches with a
  * mid-sequence compactNgramIndex, checking at three checkpoints that
  * the index serve, the cluster labels, and the IVF search all equal
  * from-scratch rebuilds. The pieces are individually tested elsewhere;
  * this pins the delta-over-delta / label-churn drift a year of daily
  * batches would accumulate. */
class SoakSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dims = 8
  private def embOf(id: Long): Array[Float] =
    Array.tabulate(Dims)(i => (((id * 31 + i * 17) % 23) - 11).toFloat)
  private def novelText(id: Long): String =
    (0 until 10).map(j => s"w${id}x$j").mkString(" ")

  test("20-batch ingest soak: serve, labels, and IVF equal from-scratch rebuilds") {
    val corpus = (1L to 8L).map(id => (id, novelText(id))).toDF("doc_id", "text")
    val corpusDocs = (1L to 8L).map(id => id -> novelText(id))
    val dir = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val idxPath = s"$dir/ivf"
    Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_soak_idx", buckets = 4)
    val centroids = Knn.ivfTrain(
      corpusDocs.map { case (id, _) => (id, embOf(id)) }.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3, iters = 4, dims = Dims).cache()
    Knn.ivfWriteIndex(
      corpusDocs.map { case (id, _) => (id, embOf(id)) }.toDF("vec_id", "embedding"),
      centroids, "vec_id", "embedding", Dims, idxPath)

    var labels = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      corpus.select(col("doc_id").as("id")))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val allPairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val allIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rnd = new scala.util.Random(424242)

    def checkpoint(tag: String): Unit = {
      // probe batch: one echo of an already-ingested doc + one novel doc
      val pool = corpusDocs ++ accepted
      val echo = pool(rnd.nextInt(pool.size))._2
      val probe = Seq((9001L, echo), (9002L, novelText(9002L))).toDF("doc_id", "text")
      val servedLive = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_soak_idx", probe, "doc_id", "text", tauBp = 6000)
        .collect().map(_.toSeq).toSet
      Dedup.writeNgramIndex(
        (corpusDocs ++ accepted).toDF("doc_id", "text"),
        "doc_id", "text", "graft_soak_ref", buckets = 4)
      val servedRebuilt = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_soak_ref", probe, "doc_id", "text", tauBp = 6000)
        .collect().map(_.toSeq).toSet
      assert(servedLive == servedRebuilt,
        s"$tag: appended/compacted index serve diverged from a fresh rebuild")
      assert(servedLive.exists(_.head == 9001L), s"$tag: the echoed probe must surface")

      val incLabels = labels.as[(Long, Long)].collect().toMap
      val fullLabels = Dedup.connectedComponents(
        allPairs.toSeq.toDF("id_a", "id_b"),
        (1L to 8L).toDF("id").unionByName(allIds.toSeq.toDF("id")))
        .as[(Long, Long)].collect().toMap
      assert(incLabels == fullLabels,
        s"$tag: incrementally maintained labels diverged from a full recompute")

      val queries = (9001L to 9003L).map(id => (id, embOf(id))).toDF("vec_id", "embedding")
      def searchOf(path: String) = Knn.ivfSearchIndex(
        spark, path, centroids, queries, "vec_id", "embedding",
        k = 5, dims = Dims, nprobe = 2).collect().map(_.toSeq).toSet
      val refPath = s"$dir/ivf_ref_$tag"
      Knn.ivfWriteIndex(
        (corpusDocs.map(_._1) ++ accepted.map(_._1))
          .map(id => (id, embOf(id))).toDF("vec_id", "embedding"),
        centroids, "vec_id", "embedding", Dims, refPath)
      assert(searchOf(idxPath) == searchOf(refPath),
        s"$tag: appended IVF index search diverged from a fresh rebuild")
    }

    try {
      for (b <- 1 to 20) {
        val docs: Seq[(Long, String)] = (0 until 4).map { i =>
          val id = 100L + b * 10 + i
          val roll = rnd.nextDouble()
          val pool = corpusDocs ++ accepted
          if (roll < 0.45) (id, pool(rnd.nextInt(pool.size))._2) // dup of something ingested
          else (id, novelText(id))
        }
        val batch = docs.toDF("doc_id", "text")
        val pairs = Dedup.incrementalNgramPairsIndexed(
          spark, "graft_soak_idx", batch, "doc_id", "text", tauBp = 6000)
          .select(col("batch_id"), col("corpus_id")).cache()
        val dup = pairs.select(col("batch_id").as("doc_id")).distinct()
        val survivors = batch.join(dup, Seq("doc_id"), "left_anti")
          .as[(Long, String)].collect().toSeq
        if (survivors.nonEmpty) {
          Dedup.appendToNgramIndex(
            survivors.toDF("doc_id", "text"), "doc_id", "text", "graft_soak_idx")
          Knn.ivfAppendIndex(
            survivors.map { case (id, _) => (id, embOf(id)) }.toDF("vec_id", "embedding"),
            centroids, "vec_id", "embedding", Dims, idxPath)
        }
        labels = Dedup.incrementalComponents(
          labels,
          pairs.select(col("batch_id").as("id_a"), col("corpus_id").as("id_b")),
          batch.select(col("doc_id").as("id")))
        // labels is consumed repeatedly (next batch + checkpoints); pin the
        // rows so the lineage doesn't re-run the whole history each time
        labels = labels.localCheckpoint()
        allPairs ++= pairs.as[(Long, Long)].collect()
        allIds ++= docs.map(_._1)
        accepted ++= survivors
        pairs.unpersist()
        if (b == 10) Dedup.compactNgramIndex(spark, "graft_soak_idx")
        if (b == 7 || b == 14 || b == 20) checkpoint(s"batch $b")
      }
      assert(accepted.size >= 20, "the soak must actually accept a meaningful doc stream")
      assert(allPairs.nonEmpty, "the soak must actually observe duplicates")
    } finally {
      Seq("graft_soak_idx", "graft_soak_ref").foreach { n =>
        Seq("postings", "sizes", "meta", "postings_delta", "sizes_delta",
          "postings_delta_folding", "sizes_delta_folding")
          .foreach(s => spark.sql(s"DROP TABLE IF EXISTS ${n}_$s"))
      }
    }
  }
}
