package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

/** The ScaleUp fixture generator's invariants (tools/ScaleUp.scala):
  * the per-copy embedding transform must preserve norms and within-copy
  * geometry exactly (so per-copy dedup/ANN ground truth matches the
  * source corpus), no two copy CHAINS may compose to the same transform
  * (chained sf1 → sf10 scale-ups; a collision mints bit-equal vectors
  * under distinct vec_ids = artificial dup mass — the first version of
  * this spec caught chains (0, j) ≡ (j, 0) through the then-verbatim
  * copy 0), and the key stride must clear the source's whole key span
  * (a fixed 10M stride built a chained sf10 customer table with 1.5M
  * rows but 285k distinct keys).
  */
class ScaleUpSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkVecs(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { v =>
      (v.toLong, Array.tabulate(64)(i => ((v * 131 + i * 17) % 23 - 11).toFloat / 7f))
    }

  private def embed(k: Int, src: Seq[(Long, Array[Float])]) =
    ScaleUp.embedCopy(src.toDF("vec_id", "embedding"), k)
      .as[(Long, Array[Float])].collect().sortBy(_._1).map(_._2)

  test("copy transform preserves norms and within-copy dot products exactly") {
    val src = mkVecs(6)
    val base = src.map(_._2)
    for (k <- Seq(0, 1, 5, 63, 64, 70)) {
      val out = embed(k, src)
      // per-dim products are EXACT doubles (s·x·y with s = ±1) and the
      // transform only permutes + pairwise-cancels signs, so the product
      // MULTISET must match bit-for-bit; comparing sums would re-test
      // Double summation order, not the transform
      def prods(a: Array[Float], b: Array[Float]): Seq[Double] =
        a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.toSeq.sorted
      for (i <- base.indices; j <- i until base.length)
        assert(prods(out(i), out(j)) === prods(base(i), base(j)),
          s"copy $k changed <v$i,v$j>")
    }
  }

  test("no two copy chains compose to the same transform") {
    // every (k, j) chain a sf0.1→sf1→sf10 build uses, plus the collision
    // classes a weaker transform falls into: rotation saturation (k and
    // k+64 share a rotation), equal total rotation (k+j = k'+j'), and
    // identity-composition ((0,j) vs (j,0), the class the first version
    // of this spec caught). All 121 composed transforms must be distinct
    // — as a property of the TRANSFORM, not of one lucky probe: the
    // probes are structurally different (a one-hot basis vector, a
    // dense all-distinct ramp, and the period-23 cycle), and two chains
    // collide only if they agree on EVERY probe.
    val probes: Seq[Array[Float]] = Seq(
      Array.tabulate(64)(i => if (i == 3) 1f else 0f),
      Array.tabulate(64)(i => (i + 1).toFloat / 8f),
      mkVecs(1).head._2)
    val src = probes.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val chains = for (k <- 0 to 10; j <- 0 to 10) yield (k, j)
    val outs = chains.map { case (k, j) =>
      val afterK = ScaleUp.embedCopy(src.toDF("vec_id", "embedding"), k)
      (k, j) -> ScaleUp.embedCopy(afterK, j)
        .as[(Long, Array[Float])].collect().sortBy(_._1)
        .map(_._2.toSeq).toSeq
    }
    val collided = outs.groupBy(_._2).filter(_._2.size > 1)
    assert(collided.isEmpty,
      s"colliding chains: ${collided.values.map(_.map(_._1)).mkString("; ")}")
  }

  test("embedCopy refuses non-64-dim embeddings loudly") {
    val bad = Seq((1L, Array.tabulate(32)(_.toFloat))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      ScaleUp.embedCopy(bad, 1).collect()
    }
    assert(e.getMessage.contains("expected 64-dim embedding"),
      s"unexpected error: ${e.getMessage}")
  }

  test("keyStride names the empty table instead of NPE-ing") {
    val dir = java.nio.file.Files.createTempDirectory("scaleup_empty").toString
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val real = spark.read.parquet(sf("sf0.001") + s"/$t.parquet")
      val df = if (t == "part") real.limit(0) else real.limit(1)
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val e = intercept[IllegalArgumentException] {
      ScaleUp.keyStride(spark, dir)
    }
    assert(e.getMessage.contains("'part' is empty"), e.getMessage)
  }

  test("sign masks are pairwise distinct over a 100-copy run") {
    val masks = (0 until 100).map(k => ScaleUp.signMask(k).toSeq)
    assert(masks.distinct.size === 100)
  }

  test("key stride clears the source's key span") {
    val stride = ScaleUp.keyStride(spark, sf("sf0.001"))
    assert(stride % 10000000L === 0L)
    val maxOrder = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .agg(max(col("o_orderkey"))).head().getLong(0)
    assert(stride > maxOrder)
  }
}
