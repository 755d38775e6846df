package graft

import graft.cdc.CdcApply
import org.apache.spark.sql.functions._

/** B4: temporal diff of two SCD2 histories. */
class Scd2DiffSpec extends SparkSpecBase {
  import spark.implicits._

  // (key, payload, from, to) with to = None meaning open
  private def hist(rows: Seq[(String, String, Long, Option[Long])]) = {
    rows.toDF("k", "v", "valid_from_us", "__to")
      .withColumn("valid_to_us", col("__to")).drop("__to")
  }

  private def diff(l: Seq[(String, String, Long, Option[Long])],
                   r: Seq[(String, String, Long, Option[Long])]) =
    CdcApply.scd2Diff(hist(l), hist(r), Seq("k"), Seq("v"))
      .select("k", "valid_from_us", "valid_to_us", "diff_kind", "l_v", "r_v")
      .as[(String, Long, Option[Long], String, Option[String], Option[String])]
      .collect().toSet

  test("mismatch, only_left, only_right, and silent agreement in one key") {
    // left:  [0,100)=a  [100,200)=b  [200,∞)=c
    // right: [0,100)=a  [100,150)=X            [250,∞)=c
    val out = diff(
      Seq(("u", "a", 0L, Some(100L)), ("u", "b", 100L, Some(200L)),
        ("u", "c", 200L, None)),
      Seq(("u", "a", 0L, Some(100L)), ("u", "X", 100L, Some(150L)),
        ("u", "c", 250L, None)))
    assert(out == Set(
      ("u", 100L, Some(150L), "mismatch", Some("b"), Some("X")),
      ("u", 150L, Some(200L), "only_left", Some("b"), None),
      ("u", 200L, Some(250L), "only_left", Some("c"), None)))
    // [0,100) agree → silent; [250,∞) agree → silent
  }

  test("identical histories diff to empty; empty right side is all only_left") {
    val h = Seq(("u", "a", 0L, Some(10L)), ("u", "b", 10L, None),
      ("w", "z", 5L, Some(7L)))
    assert(diff(h, h).isEmpty)
    val onlyL = diff(h, Seq.empty)
    assert(onlyL == Set(
      ("u", 0L, Some(10L), "only_left", Some("a"), None),
      ("u", 10L, None, "only_left", Some("b"), None),
      ("w", 5L, Some(7L), "only_left", Some("z"), None)))
  }

  test("diff is antisymmetric: swapping sides swaps kinds and payload columns") {
    val l = Seq(("u", "a", 0L, Some(50L)), ("u", "b", 50L, None))
    val r = Seq(("u", "a", 25L, None))
    val fwd = diff(l, r)
    val bwd = diff(r, l)
    def flip(kind: String) = kind match {
      case "only_left" => "only_right"
      case "only_right" => "only_left"
      case k => k
    }
    assert(bwd == fwd.map { case (k, f, t, kind, lv, rv) => (k, f, t, flip(kind), rv, lv) })
  }

  test("property: diff rows cover T exactly when stateAt disagrees (random histories)") {
    val rnd = new scala.util.Random(424242)
    // two random per-key interval partitions with random payloads
    def randHist() = (0 until 3).flatMap { ki =>
      val cuts = (Seq(rnd.nextInt(100).toLong) ++
        Seq.fill(6)(rnd.nextInt(1000).toLong)).distinct.sorted
      cuts.zipWithIndex.map { case (c, i) =>
        val to = if (i == cuts.size - 1) None else Some(cuts(i + 1))
        (s"k$ki", s"v${rnd.nextInt(4)}", c, to)
      }
    }
    val lRows = randHist()
    val rRows = randHist()
    val rows = diff(lRows, rRows)
    // sample instants: every boundary and boundary±1
    val instants = (lRows ++ rRows)
      .flatMap(v => Seq(v._3) ++ v._4.toSeq).flatMap(b => Seq(b - 1, b, b + 1))
      .distinct.filter(_ >= 0)
    def liveAt(h: Seq[(String, String, Long, Option[Long])], k: String, t: Long) =
      h.find(v => v._1 == k && v._3 <= t && v._4.forall(t < _)).map(_._2)
    for (k <- Seq("k0", "k1", "k2"); t <- instants) {
      val lv = liveAt(lRows, k, t)
      val rv = liveAt(rRows, k, t)
      val covering = rows.filter(d => d._1 == k && d._2 <= t && d._3.forall(t < _))
      if (lv == rv) assert(covering.isEmpty, s"$k@$t: agree but diff row $covering")
      else {
        assert(covering.size == 1, s"$k@$t: expected one diff row, got $covering")
        val d = covering.head
        assert(d._5 == lv && d._6 == rv, s"$k@$t: payloads $d vs ($lv,$rv)")
        val kind = (lv, rv) match {
          case (Some(_), Some(_)) => "mismatch"
          case (Some(_), None) => "only_left"
          case _ => "only_right"
        }
        assert(d._4 == kind, s"$k@$t: kind ${d._4} vs $kind")
      }
    }
  }

  test("missing and empty compare/key columns are refused") {
    val h = hist(Seq(("u", "a", 0L, None)))
    val e1 = intercept[IllegalArgumentException](
      CdcApply.scd2Diff(h, h, Seq("k"), Seq("nope")))
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException](
      CdcApply.scd2Diff(h, h, Seq("k"), Seq.empty))
    assert(e2.getMessage.contains("compare"))
  }

  test("plan: key-equi joins only, no cartesian, one aggregate for the spine") {
    val h = hist(Seq(("u", "a", 0L, None)))
    val plan = CdcApply.scd2Diff(h, h, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"expected key-equi joins, got:\n$plan")
  }
}
