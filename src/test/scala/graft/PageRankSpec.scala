package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpecBase {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Sequential reference: the SAME integer fixed-point recurrence, one
    * map per iteration — the distributed operator must match it exactly. */
  private def refPr(edges: Seq[(Long, Long)], iters: Int, scale: Long): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size
    val per = scale / n
    val base = 15L * per / 100L
    var r = deg.keys.map(_ -> per).toMap
    for (_ <- 1 to iters) {
      val sums = und.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = sums.map { case (id, s) => id -> (base + 85L * s / 100L) }
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 10) = {
    val df = edges.toDF("id_a", "id_b")
    PageRank.pageRank(df, "id_a", "id_b", iters, Scale)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("E57: distributed iterations equal the sequential recurrence exactly") {
    // star ∪ pair ∪ triangle — three shapes in one graph
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
    val exp = refPr(edges, 10, Scale)
    val got = run(edges)
    assert(got.keySet === exp.keySet)
    for ((id, (_, pr)) <- got) assert(pr === exp(id), s"node $id")
  }

  test("E57: a hub outranks its leaves; symmetric nodes tie") {
    val got = run(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(got(2L)._2 === got(3L)._2 && got(3L)._2 === got(4L)._2)
    assert(got(1L)._2 > got(2L)._2)
    assert(got(1L)._1 === 3L && got(2L)._1 === 1L) // degrees
  }

  test("E57: disconnected components don't exchange mass") {
    // pair {1,2} and pair {3,4}: all four symmetric → identical ranks
    val got = run(Seq((1L, 2L), (3L, 4L)))
    assert(got.values.map(_._2).toSet.size === 1)
    assert(got(1L)._1 === 1L) // degree carried through
  }

  test("E57 property: exact equality vs the sequential recurrence on random graphs") {
    val rnd = new scala.util.Random(57335711L)
    for (trial <- 1 to 5) {
      val n = 6 + rnd.nextInt(15)
      val edges = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val iters = 3 + rnd.nextInt(5)
        val exp = refPr(edges, iters, Scale)
        val got = run(edges, iters)
        assert(got.keySet === exp.keySet, s"trial $trial nodes")
        for ((id, (_, pr)) <- got)
          assert(pr === exp(id), s"trial $trial node $id (n=$n iters=$iters)")
      }
    }
  }

  test("E57: the fixed-point early stop fires on a regular graph and stays bit-equal") {
    // 4-cycle: 2-regular, per-node init 10^12/4 divisible by deg and 100,
    // so round 1 reproduces the init exactly — fixed point immediately
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val (df, rounds) = PageRank.pageRankCounted(
      cyc.toDF("id_a", "id_b"), "id_a", "id_b", 10, Scale)
    assert(rounds < 10, s"expected an early stop, ran all $rounds rounds")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exp = refPr(cyc, 10, Scale) // the FULL 10-round sequential run
    for ((id, pr) <- exp) assert(got(id) === pr, s"node $id")

    // an asymmetric graph must NOT trip the stop before its fixed point:
    // equality with the full sequential run is the invariant either way
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val (df2, rounds2) = PageRank.pageRankCounted(
      star.toDF("id_a", "id_b"), "id_a", "id_b", 10, Scale)
    val got2 = df2.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exp2 = refPr(star, 10, Scale)
    for ((id, pr) <- exp2) assert(got2(id) === pr, s"star node $id (rounds=$rounds2)")
  }

  test("E57: empty edge set yields an empty, well-typed result") {
    val empty = PageRank.pageRank(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "id_a", "id_b", 10, Scale)
    assert(empty.columns.toSeq === Seq("doc_id", "deg", "pr_fp"))
    assert(empty.count() === 0L)
  }
}
