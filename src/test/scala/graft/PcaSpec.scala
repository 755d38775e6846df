package graft

import graft.similarity.Pca
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Distributed PCA (SURVEY §2 E50): known-axes fixtures, orthonormal
  * components with a descending spectrum, projection variance equals the
  * eigenvalue, reconstruction, and determinism. */
class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("E50: recovers the principal axis of a line-shaped 2D cloud") {
    // points on the (1,1) diagonal ± tiny (1,-1) noise: first component
    // must be (1,1)/√2, and the spectrum must be wildly lopsided
    val pts = (-10 to 10).map { i =>
      (i.toLong, Array(i.toFloat + 0.01f * (i % 3), i.toFloat - 0.01f * (i % 3)))
    }.toDF("id", "embedding")
    val m = Pca.fit(pts, "embedding", dims = 2, k = 2)
    val c0 = m.components(0)
    val r = 1.0 / math.sqrt(2.0)
    assert(close(c0(0), r, 1e-3) && close(c0(1), r, 1e-3), c0.toSeq.toString)
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1),
      m.eigenvalues.toSeq.toString)
  }

  test("E50: components are orthonormal and the spectrum descends (real embeddings)") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val m = Pca.fit(e, "embedding", dims = 64, k = 8)
    for (i <- 0 until 8; j <- i until 8) {
      val dot = (0 until 64).map(d => m.components(i)(d) * m.components(j)(d)).sum
      if (i == j) assert(close(dot, 1.0, 1e-9), s"|c$i| = $dot")
      else assert(math.abs(dot) < 1e-9, s"c${i}.c${j} = $dot")
    }
    m.eigenvalues.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, m.eigenvalues.toSeq.toString)
      case _ =>
    }
    assert(m.eigenvalues.last >= 0.0 - 1e-6)
  }

  test("E50: projected first-component variance equals the first eigenvalue") {
    val pts = (-10 to 10).map(i => (i.toLong, Array(i.toFloat, 2.0f * i))).toDF("id", "embedding")
    val m = Pca.fit(pts, "embedding", 2, 1)
    val proj = Pca.transform(pts, "embedding", m)
      .select(element_at($"pca", 1)).as[Double].collect()
    val mean = proj.sum / proj.length
    val popVar = proj.map(x => (x - mean) * (x - mean)).sum / proj.length
    assert(close(popVar, m.eigenvalues(0), 1e-9), s"$popVar vs ${m.eigenvalues(0)}")
  }

  test("E50: all-components projection reconstructs the centered data") {
    val pts = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(-1.0f, 0.5f, 2.0f)),
      (3L, Array(4.0f, -2.0f, 0.0f)), (4L, Array(0.0f, 1.0f, -1.0f)))
      .toDF("id", "embedding")
    val m = Pca.fit(pts, "embedding", 3, 3)
    val rows = Pca.transform(pts, "embedding", m)
      .select($"id", $"embedding", $"pca")
      .as[(Long, Seq[Float], Seq[Double])].collect()
    rows.foreach { case (_, x, p) =>
      (0 until 3).foreach { i =>
        val rec = m.mean(i) + (0 until 3).map(j => p(j) * m.components(j)(i)).sum
        assert(close(rec, x(i) * 1000.0, 1e-6), s"dim $i: $rec vs ${x(i) * 1000.0}")
      }
    }
  }

  test("E50: whitening gives every output dimension unit variance; degenerate spectrum refused") {
    val pts = (-10 to 10).map(i => (i.toLong, Array(i.toFloat, 2.0f * i + 0.3f * (i % 4))))
      .toDF("id", "embedding")
    val m = Pca.fit(pts, "embedding", 2, 2)
    val proj = Pca.transform(pts, "embedding", m, whiten = true)
      .select($"pca").as[Seq[Double]].collect()
    (0 until 2).foreach { j =>
      val xs = proj.map(_(j))
      val mean = xs.sum / xs.length
      val popVar = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(close(popVar, 1.0, 1e-9), s"dim $j variance $popVar")
    }
    // perfectly collinear data → zero second eigenvalue → loud refusal
    val line = (-5 to 5).map(i => (i.toLong, Array(i.toFloat, i.toFloat))).toDF("id", "embedding")
    val m2 = Pca.fit(line, "embedding", 2, 2)
    val e = intercept[IllegalArgumentException] {
      Pca.transform(line, "embedding", m2, whiten = true)
    }
    assert(e.getMessage.contains("spectrum"))
    // dropping the degenerate component (k=1) whitens fine
    val ok = Pca.transform(line, "embedding", Pca.fit(line, "embedding", 2, 1), whiten = true)
      .select($"pca").as[Seq[Double]].collect()
    val xs = ok.map(_.head); val mn = xs.sum / xs.length
    assert(close(xs.map(x => (x - mn) * (x - mn)).sum / xs.length, 1.0, 1e-9))
  }

  test("E50/E49: model artifacts round-trip bit-exactly through parquet") {
    val pts = (-10 to 10).map(i => (i.toLong, Array(i.toFloat, 2.0f * i))).toDF("id", "embedding")
    val m = Pca.fit(pts, "embedding", 2, 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-models").toString
    Pca.save(spark, m, s"$dir/pca")
    val m2 = Pca.load(spark, s"$dir/pca")
    assert(m2.mean.toSeq == m.mean.toSeq)
    assert(m2.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    assert(m2.eigenvalues.toSeq == m.eigenvalues.toSeq && m2.totalVariance == m.totalVariance)
    import graft.text.Bpe
    val merges = Bpe.train(Seq("low low lowest").toDF("text"), "text", 3, minCount = 1)
    Bpe.saveMerges(spark, merges, s"$dir/bpe")
    assert(Bpe.loadMerges(spark, s"$dir/bpe") == merges)
  }

  test("E50/A0b: the pca CLI fit/project round-trip equals the library answer") {
    val root = java.nio.file.Files.createTempDirectory("graft_pca_cli").toString
    val pts = (-10 to 10).map(i => (i.toLong, Array(i.toFloat, 2.0f * i)))
      .toDF("id", "embedding")
    pts.write.parquet(s"$root/emb.parquet")
    graft.tools.Cli.main(Array("pca", "fit", "--in", s"$root/emb.parquet",
      "--model", s"$root/model", "--dims", "2", "--k", "1"))
    graft.tools.Cli.main(Array("pca", "project", "--in", s"$root/emb.parquet",
      "--model", s"$root/model", "--out", s"$root/proj"))
    val got = spark.read.parquet(s"$root/proj")
      .select($"id", element_at($"pca", 1)).as[(Long, Double)].collect().toMap
    val lib = Pca.transform(pts, "embedding", Pca.fit(pts, "embedding", 2, 1))
      .select($"id", element_at($"pca", 1)).as[(Long, Double)].collect().toMap
    assert(got == lib && got.nonEmpty)
  }

  test("E50: the fit is deterministic (exact integer moments + fixed Jacobi sweeps)") {
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(200)
    val a = Pca.fit(e, "embedding", 64, 4)
    val b = Pca.fit(e, "embedding", 64, 4)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.mean.toSeq == b.mean.toSeq)
  }

  test("E50: spectrumChecked — every invariant green; trace_q equals the brute-force integer trace") {
    val e = Tables.embeddings(spark, sf("sf0.001"))
    val rows = Pca.spectrumChecked(e, "embedding", 64, 8)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Long)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 8L))
    rows.foreach { r =>
      assert(r._2 && r._3 && r._4 && r._5 && r._6, s"invariant failed: $r")
    }
    // brute-force n²·trace from the raw vectors, all BigInt — the same
    // number the DuckDB oracle recomputes
    val vecs = e.select($"embedding").as[Seq[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
    val n = BigInt(vecs.length)
    val trace = (0 until 64).map { d =>
      val sx = vecs.map(v => BigInt(v(d))).sum
      val sxx = vecs.map(v => BigInt(v(d)) * BigInt(v(d))).sum
      n * sxx - sx * sx
    }.sum
    assert(rows.forall(_._7 == trace.toLong), s"trace_q ${rows.head._7} != $trace")
  }
}
