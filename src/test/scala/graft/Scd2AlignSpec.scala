package graft

import graft.cdc.CdcApply
import org.apache.spark.sql.functions._

/** A15: temporal alignment of two SCD2 histories. */
class Scd2AlignSpec extends SparkSpecBase {
  import spark.implicits._

  // (key, payload, from, to) with to = None meaning open
  private def hist(name: String, rows: Seq[(String, String, Long, Option[Long])]) = {
    rows.toDF("k", name, "valid_from_us", "__to")
      .withColumn("valid_to_us", col("__to")).drop("__to")
  }

  test("overlapping versions intersect; touching ones do not match") {
    val a = hist("plan", Seq(
      ("u1", "basic", 0L, Some(100L)),
      ("u1", "pro", 100L, None)))
    val b = hist("city", Seq(
      ("u1", "rome", 50L, Some(150L)),
      ("u1", "oslo", 150L, None)))
    val out = CdcApply.scd2Align(a, b, Seq("k"))
      .select("k", "plan", "city", "valid_from_us", "valid_to_us")
      .as[(String, String, String, Long, Option[Long])].collect().toSet
    assert(out == Set(
      ("u1", "basic", "rome", 50L, Some(100L)),
      ("u1", "pro", "rome", 100L, Some(150L)),
      ("u1", "pro", "oslo", 150L, None)))
  }

  test("no cross-key matches; both-open intervals stay open; empty intersections drop") {
    val a = hist("plan", Seq(("u1", "p", 0L, Some(10L)), ("u2", "q", 0L, None)))
    val b = hist("city", Seq(("u1", "c", 10L, Some(20L)), ("u2", "d", 5L, None)))
    val out = CdcApply.scd2Align(a, b, Seq("k"))
      .select("k", "plan", "city", "valid_from_us", "valid_to_us")
      .as[(String, String, String, Long, Option[Long])].collect().toSet
    // u1: [0,10) vs [10,20) touch only — nothing; u2: both open from max(0,5)
    assert(out == Set(("u2", "q", "d", 5L, None)))
  }

  test("alignment is symmetric in coverage: total covered span = intersection of spans") {
    // randomized: two per-key interval partitions (scd2 histories are
    // partitions of [first, ∞)); the aligned intervals must exactly tile
    // the intersection of the two keys' covered spans
    val rnd = new scala.util.Random(7)
    val cuts1 = (Seq(0L) ++ Seq.fill(5)(rnd.nextInt(1000).toLong)).distinct.sorted
    val cuts2 = (Seq(0L) ++ Seq.fill(5)(rnd.nextInt(1000).toLong)).distinct.sorted
    def part(name: String, cuts: Seq[Long]) = hist(name,
      cuts.zipWithIndex.map { case (c, i) =>
        val to = if (i == cuts.size - 1) None else Some(cuts(i + 1))
        ("k", s"$name$i", c, to)
      })
    val out = CdcApply.scd2Align(part("a", cuts1), part("b", cuts2), Seq("k"))
      .select("valid_from_us", "valid_to_us")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    // tiles: start at max of firsts, contiguous, last open
    assert(out.head._1 == math.max(cuts1.head, cuts2.head))
    out.sliding(2).foreach {
      case Array((_, Some(e)), (f, _)) => assert(e == f)
      case _ =>
    }
    assert(out.last._2.isEmpty)
    // interval count = |distinct cut points inside the intersection|
    val lo = math.max(cuts1.head, cuts2.head)
    val expected = (cuts1 ++ cuts2).filter(_ >= lo).distinct.size
    assert(out.length == expected)
  }

  test("colliding payload names and missing validity columns are refused") {
    val a = hist("v", Seq(("k", "x", 0L, None)))
    val e1 = intercept[IllegalArgumentException](CdcApply.scd2Align(a, a, Seq("k")))
    assert(e1.getMessage.contains("alias one side"))
    val b = a.drop("valid_to_us")
    val e2 = intercept[IllegalArgumentException](
      CdcApply.scd2Align(a, b.withColumnRenamed("v", "w"), Seq("k")))
    assert(e2.getMessage.contains("valid_to_us"))
  }

  test("plan: one equi-join on the key, no cartesian") {
    val a = hist("plan", Seq(("u1", "p", 0L, None)))
    val b = hist("city", Seq(("u1", "c", 0L, None)))
    val plan = CdcApply.scd2Align(a, b, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"expected an equi-join on the key, got:\n$plan")
  }
}
