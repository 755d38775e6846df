package graft

import graft.similarity.{Knn, Pq}
import graft.tools.Cli
import graft.util.Tables
import org.apache.spark.sql.functions._

/** A0b/E7e/E45c/E46: the `ann` CLI drives the vector-index lifecycle —
  * build (raw and PQ), serve, append with the duplicate guard, and the
  * drift readout — and every served answer equals the library call. */
class CliAnnSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("ann build/search (raw IVF) round-trip equals the library answer") {
    val dir = sf("sf0.001")
    val emb = s"$dir/embeddings.parquet"
    val index = tmp("graft_ann_raw")
    val qsPath = tmp("graft_ann_q") + "/qs.parquet"
    val outPath = tmp("graft_ann_o") + "/out.parquet"
    val e = Tables.embeddings(spark, dir)
    e.filter($"vec_id" < 5).write.parquet(qsPath)
    Cli.main(Array("ann", "build", "--in", emb, "--index", index,
      "--clusters", "6", "--iters", "2"))
    Cli.main(Array("ann", "search", "--index", index, "--queries", qsPath,
      "--k", "10", "--nprobe", "3", "--out", outPath))
    val got = spark.read.parquet(outPath).collect().map(_.toSeq).toSet
    val cents = Knn.ivfTrain(e, "vec_id", "embedding", 6, 2, 64)
    val lib = Knn.ivfSearch(e, cents, e.filter($"vec_id" < 5),
      "vec_id", "embedding", 10, 64, 3).collect().map(_.toSeq).toSet
    assert(got == lib)
    assert(got.nonEmpty)
  }

  test("ann build --pq / search / append / drift lifecycle") {
    val dir = sf("sf0.001")
    val e = Tables.embeddings(spark, dir)
    val root = tmp("graft_ann_pq")
    val basePath = s"$root/base.parquet"; val batchPath = s"$root/batch.parquet"
    val index = s"$root/index"; val qsPath = s"$root/qs.parquet"
    val out1 = s"$root/out1.parquet"; val out2 = s"$root/out2.parquet"
    e.filter($"vec_id" % 7 =!= 0).write.parquet(basePath)
    e.filter($"vec_id" % 7 === 0).write.parquet(batchPath)
    e.filter($"vec_id" < 5).write.parquet(qsPath)
    Cli.main(Array("ann", "build", "--in", basePath, "--index", index,
      "--clusters", "6", "--iters", "2", "--pq", "4,8,2"))
    Cli.main(Array("ann", "search", "--index", index, "--queries", qsPath,
      "--k", "10", "--nprobe", "3", "--out", out1))
    assert(spark.read.parquet(out1).count() > 0)
    // append the held-out batch, duplicate re-append refuses
    Cli.main(Array("ann", "append", "--in", batchPath, "--index", index))
    val clash = intercept[IllegalArgumentException] {
      Cli.main(Array("ann", "append", "--in", batchPath, "--index", index))
    }
    assert(clash.getMessage.contains("already present"))
    // post-append serve equals the library stack over the FULL corpus
    // with the BASE-trained centroids/codebook (read back from the index)
    Cli.main(Array("ann", "search", "--index", index, "--queries", qsPath,
      "--k", "10", "--nprobe", "3", "--out", out2))
    val cents = spark.read.parquet(s"$index/centroids.parquet")
    val cb = spark.read.parquet(s"$index/codebook.parquet")
    val corpus = Pq.encode(e, cb, "vec_id", "embedding", 4, 64)
      .join(Knn.ivfAssign(e, cents, "vec_id", "embedding", 64)
        .withColumnRenamed("vec_id", "vid"), "vid")
    val lib = Pq.ivfAdcSearch(corpus, cents, cb, e.filter($"vec_id" < 5),
      "vec_id", "embedding", 10, 4, 64, 3).collect().map(_.toSeq).toSet
    assert(spark.read.parquet(out2).collect().map(_.toSeq).toSet == lib)
    // drift readout runs worst-first without error (smoke over stdout)
    Cli.main(Array("ann", "drift", "--in", basePath, "--index", index, "--top", "3"))
  }

  test("ann recall measures the persisted index against brute-force truth") {
    val dir = sf("sf0.001")
    val emb = s"$dir/embeddings.parquet"
    val index = tmp("graft_ann_rc")
    val outPath = tmp("graft_ann_rco") + "/recall.parquet"
    Cli.main(Array("ann", "build", "--in", emb, "--index", index,
      "--clusters", "6", "--iters", "2"))
    Cli.main(Array("ann", "recall", "--in", emb, "--index", index,
      "--k", "10", "--nprobe", "3", "--sample-bp", "300", "--out", outPath))
    val got = spark.read.parquet(outPath)
      .select("query_id", "n_exact", "n_hit", "recall_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // the CLI answer equals the library composition over the SAME
    // deterministic sample and the SAME persisted index
    val e = Tables.embeddings(spark, dir)
    val qs = e.filter(pmod(
      graft.text.PortableHash.h32($"vec_id".cast("string")), lit(10000L)) < 300)
    val exact = Knn.bruteForce(e, qs, "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id")
    val approx = Knn.ivfSearchIndex(spark, s"$index/vectors",
      spark.read.parquet(s"$index/centroids.parquet"), qs,
      "vec_id", "embedding", 10, 64, 3)
      .select($"query_id", $"neighbor_id", lit(1L).as("hit"))
    val lib = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy($"query_id")
      .agg(count(lit(1)).as("n_exact"), sum(coalesce($"hit", lit(0L))).as("n_hit"))
      .withColumn("recall_bp", graft.text.TextOps.bp($"n_hit", $"n_exact"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSet == lib.toSet)
    got.foreach { case (_, nExact, nHit, bp) =>
      assert(nHit <= nExact && bp >= 0L && bp <= 10000L)
    }
    // a sample too narrow to select any query refuses loudly
    val e2 = intercept[IllegalArgumentException] {
      Cli.main(Array("ann", "recall", "--in", emb, "--index", index,
        "--sample-bp", "0"))
    }
    assert(e2.getMessage.contains("sample"), e2.getMessage)
  }

  test("ann tune-probe returns the smallest p hitting the target agreement") {
    val dir = sf("sf0.001")
    val emb = s"$dir/embeddings.parquet"
    val (k1, k2, iters, sampleBp) = (6, 2, 2, 2000)
    // library-side truth: agreement at every p over the SAME sample and
    // the SAME full-corpus tree, scanned linearly
    val e = Tables.embeddings(spark, dir).localCheckpoint()
    val (l1, l2) = Knn.ivfTrain2(e, "vec_id", "embedding", k1, k2, iters, 64)
    val sample = e.filter(pmod(
      graft.text.PortableHash.h32($"vec_id".cast("string")), lit(10000L)) < sampleBp)
    val n = sample.count(); assert(n > 0)
    val flatCents = l2.select(
      ($"cell" * k2.toLong + $"group").as("group") +:
        $"n" +: (0 until 64).map(i => col(s"s_$i")): _*)
    val flat = Knn.ivfAssign(sample, flatCents, "vec_id", "embedding", 64)
      .withColumnRenamed("cluster", "__f")
    def agree(p: Int): Long = flat
      .join(Knn.treeAssign(sample, l1, l2, "vec_id", "embedding", k2, 64, p), "vec_id")
      .agg(sum(when($"__f" === $"cluster", 1L).otherwise(0L))).head().getLong(0) * 10000L / n
    val curve = (1 to k1).map(p => p -> agree(p))
    // full probe == flat (the binary search's termination guarantee)
    assert(curve.last._2 == 10000L)
    for (target <- Seq(9000, 10000)) {
      val expected = curve.find(_._2 >= target).get._1
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) {
        Cli.main(Array("ann", "tune-probe", "--in", emb,
          "--k1", k1.toString, "--k2", k2.toString, "--iters", iters.toString,
          "--target-bp", target.toString, "--sample-bp", sampleBp.toString))
      }
      val out = buf.toString
      val got = "smallest p=(\\d+)".r.findFirstMatchIn(out).map(_.group(1).toInt)
      assert(got.contains(expected), s"target=$target out=$out curve=$curve")
    }
  }
}
