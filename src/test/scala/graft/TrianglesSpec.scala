package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._

/** E63: triangle counting + local clustering coefficient. */
class TrianglesSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]) =
    Triangles.perNode(edges.toDF("s", "d"), "s", "d")
      .select("id", "degree", "triangles", "lcc_bp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("triangle, pendant, and isolated-pair shapes") {
    // K3 {1,2,3} + pendant 4 on 3 + disjoint edge {5,6}
    val out = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L)))
    assert(out(1L) == ((2L, 1L, 10000L)))
    assert(out(2L) == ((2L, 1L, 10000L)))
    // node 3: degree 3, one triangle of the 3 possible pairs → 1/3 = 3333 bp
    assert(out(3L) == ((3L, 1L, 3333L)))
    assert(out(4L) == ((1L, 0L, 0L))) // degree < 2 → lcc 0
    assert(out(5L) == ((1L, 0L, 0L)))
    assert(out(6L) == ((1L, 0L, 0L)))
  }

  test("duplicate, reversed, and self-loop edges canonicalize away") {
    val clean = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val noisy = run(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L),
      (1L, 3L), (2L, 2L), (3L, 3L)))
    assert(noisy == clean)
  }

  test("K4 is all-clique: every node lcc = 10000, 3 triangles each") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val out = run(k4)
    (1L to 4L).foreach(i => assert(out(i) == ((3L, 3L, 10000L))))
  }

  test("property: matches brute-force on a random graph (hubs included)") {
    val rnd = new scala.util.Random(63_63)
    // a hub (node 0 connected to everyone) plus random edges — exercises
    // the degree-orientation path where the hub ranks last
    val n = 24
    val hub = (1 until n).map(i => (0L, i.toLong))
    val rand = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val edges = (hub ++ rand).filter(e => e._1 != e._2)
    val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = canon.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val bruteTri = (0L until n.toLong).map { v =>
      val nb = adj.getOrElse(v, Set.empty).toSeq
      v -> nb.combinations(2).count(p => canon.contains((math.min(p(0), p(1)), math.max(p(0), p(1)))))
    }.toMap
    val out = run(edges)
    (0L until n.toLong).filter(adj.contains).foreach { v =>
      val (deg, tri, lcc) = out(v)
      assert(deg == adj(v).size.toLong, s"degree of $v")
      assert(tri == bruteTri(v).toLong, s"triangles of $v: got $tri want ${bruteTri(v)}")
      val want = if (deg >= 2) 2L * tri * 10000L / (deg * (deg - 1)) else 0L
      assert(lcc == want, s"lcc of $v")
    }
  }

  test("plan: key-equi joins only, no cartesian") {
    val plan = Triangles.perNode(Seq((1L, 2L)).toDF("s", "d"), "s", "d")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"expected key-equi joins, got:\n$plan")
  }
}
