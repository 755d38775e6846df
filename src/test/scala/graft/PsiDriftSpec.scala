package graft

import graft.operators.PsiDrift
import org.apache.spark.sql.functions._

/** E64: PSI drift between two table snapshots. */
class PsiDriftSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(ref: Seq[Double], cur: Seq[Double], buckets: Int = 10) =
    PsiDrift.psi(ref.toDF("x"), cur.toDF("x"), Seq("x"), buckets)
      .select("col_name", "psi_e4", "n_ref", "n_cur")
      .as[(String, Long, Long, Long)].collect().head

  test("identical snapshots have exactly zero PSI") {
    val xs = (0 until 200).map(i => i * 0.5)
    val (c, psi, nr, nc) = run(xs, xs)
    assert(c == "x" && psi == 0L && nr == 200L && nc == 200L)
  }

  test("a shifted population scores positive; out-of-range mass clamps to edge bins") {
    val ref = (0 until 100).map(_.toDouble)
    val cur = (0 until 100).map(_ + 500.0) // all beyond ref max → bin 9
    val (_, psi, _, _) = run(ref, cur)
    assert(psi > 20000L, s"expected a large PSI, got $psi") // way past the 0.25 rule
  }

  test("property: matches a BigInt/Math.log brute force (mixed drift)") {
    val rnd = new scala.util.Random(6464)
    val ref = Seq.fill(300)(rnd.nextDouble() * 100)
    val cur = Seq.fill(260)(rnd.nextDouble() * 120 - 5) // wider + shifted
    val B = 10
    val (_, psi, nr, nc) = run(ref, cur, B)
    assert(nr == 300L && nc == 260L)
    val mn = ref.min; val mx = ref.max
    def bin(x: Double) =
      if (mx == mn) 0 else math.min(B - 1, math.max(0, math.floor((x - mn) * B / (mx - mn)).toInt))
    val a = (0 until B).map(i => BigInt(ref.count(bin(_) == i) + 1))
    val b = (0 until B).map(i => BigInt(cur.count(bin(_) == i) + 1))
    val (ta, tb) = (a.sum, b.sum)
    val want = (0 until B).map { i =>
      val ab = a(i) * tb; val ba = b(i) * ta
      val l = BigInt(math.floor(math.log(ab.toDouble / ba.toDouble) * 10000.0).toLong)
      (ab - ba) * l
    }.sum / (ta * tb)
    assert(psi == want.toLong, s"psi $psi vs brute $want")
  }

  test("E64s: per-microbatch PSI vs a frozen reference (foreachBatch, the E56s shape)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ref = (0 until 200).map(i => i * 0.5).toDF("x").localCheckpoint()
    val live = Seq.tabulate(120)(i => i * 0.9 + 10.0)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val scores = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = input.toDF().toDF("x").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val r = PsiDrift.psi(ref, b, Seq("x")).collect().head
        scores.synchronized { scores += ((id, r.getLong(1))) }
        ()
      }.start()
    try {
      val (h1, h2) = live.splitAt(50)
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      val byBatch = scores.toMap
      // each microbatch scores exactly what the batch operator scores on
      // it — offline-calibrated thresholds transfer unchanged
      for ((half, id) <- Seq((h1, 0L), (h2, 1L))) {
        val direct = PsiDrift.psi(ref, half.toDF("x"), Seq("x"))
          .collect().head.getLong(1)
        assert(byBatch(id) == direct, s"batch $id")
        assert(direct > 0L) // shifted halves: real drift measured
      }
    } finally q.stop()
  }

  test("missing columns and degenerate bucket counts are refused") {
    val df = Seq(1.0).toDF("x")
    val e1 = intercept[IllegalArgumentException](PsiDrift.psi(df, df, Seq("nope")))
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException](PsiDrift.psi(df, df, Seq("x"), 1))
    assert(e2.getMessage.contains("buckets"))
  }

  test("a constant reference column reports NULL psi without killing siblings") {
    // equi-width bins are undefined when mn == mx; a silent PSI 0 would
    // hide total drift, and the pre-round-16 raise_error killed every
    // OTHER column of a multi-column profile over one constant flag
    // column (r10 ADVICE). NULL is the per-column signal; the healthy
    // sibling column still gets its real measurement from the same call.
    val ref = Seq.tabulate(50)(i => (7.0, i.toDouble)).toDF("flag", "x")
    val cur = Seq.tabulate(50)(i => (7.0, i + 1000.0)).toDF("flag", "x")
    val got = PsiDrift.psi(ref, cur, Seq("flag", "x"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got("flag") === None) // degenerate: NULL, not 0, not an abort
    assert(got("x").exists(_ > 2500L), got.toString) // total shift: large PSI
    // all-null reference is the same no-geometry case
    val refN = Seq.fill[(Option[Double], Double)](5)((None, 1.0)).toDF("flag", "x")
    val gotN = PsiDrift.psi(refN, cur.select(col("flag").cast("double"), col("x")),
      Seq("flag")).collect().head
    assert(gotN.isNullAt(1))
  }
}
