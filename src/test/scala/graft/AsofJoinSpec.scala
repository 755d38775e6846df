package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** Edge semantics of the backward as-of join (D7). */
class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 15L, "p3"), (3L, 5L, "p4")
  ).toDF("k", "t", "name")

  private def right = Seq(
    (1L, 5L, "a"), (1L, 15L, "b"), (1L, 25L, "c"), (2L, 15L, "d")
  ).toDF("k", "t", "v")

  test("picks the most recent right row at or before each left time") {
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"name", $"asof_v").as[(String, String)].collect().toMap
    assert(out("p1") == "a")   // t=10 -> right t=5
    assert(out("p2") == "b")   // t=20 -> right t=15 (not 25: future excluded)
    assert(out("p3") == "d")   // equal timestamps match (<=)
    assert(out("p4") == null)  // no earlier right row -> null
  }

  test("left rows and columns are preserved exactly") {
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("k", "t", "name", "asof_v"))
  }

  test("empty right side yields all-null payloads") {
    val out = AsofJoin.backward(left, right.limit(0), Seq("k"), "t", "t", Seq("v"))
    assert(out.filter($"asof_v".isNotNull).count() == 0)
    assert(out.count() == 4)
  }

  test("multiple payload columns carried consistently from the same row") {
    val r2 = Seq((1L, 5L, "a", 100L), (1L, 15L, "b", 200L))
      .toDF("k", "t", "v", "n")
    val out = AsofJoin.backward(left.filter($"k" === 1L), r2,
      Seq("k"), "t", "t", Seq("v", "n"))
      .select($"name", $"asof_v", $"asof_n").as[(String, String, Long)]
      .collect().map { case (a, b, c) => a -> ((b, c)) }.toMap
    assert(out("p1") == ("a", 100L))
    assert(out("p2") == ("b", 200L))
  }

  test("a matched row's null payload value stays null (no skip-back)") {
    val r2 = Seq((1L, 5L, Some("a")), (1L, 15L, Option.empty[String]))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(left.filter($"k" === 1L), r2,
      Seq("k"), "t", "t", Seq("v"))
      .select($"name", $"asof_v").as[(String, Option[String])].collect().toMap
    assert(out("p1") == Some("a"))
    assert(out("p2") == None) // matched right t=15 carries ITS null, not t=5's "a"
  }

  test("forward picks the earliest right row at or after each left time") {
    val out = AsofJoin.forward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"name", $"asof_v").as[(String, String)].collect().toMap
    assert(out("p1") == "b")   // t=10 -> right t=15
    assert(out("p2") == "c")   // t=20 -> right t=25 (not 15: past excluded)
    assert(out("p3") == "d")   // equal timestamps match (>=)
    assert(out("p4") == null)  // k=3 has no right rows
  }

  test("tolerance nulls matches beyond the window, in native units") {
    // backward at t=20 matches right t=15 (gap 5); tolerance 4 rejects it,
    // tolerance 5 keeps it (boundary inclusive)
    def run(tol: Long) =
      AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
        tolerance = Some(lit(tol)))
        .select($"name", $"asof_v").as[(String, String)].collect().toMap
    assert(run(5L)("p2") == "b")
    assert(run(4L)("p2") == null)
    assert(run(4L)("p3") == "d") // gap 0 always inside
  }

  test("tolerance on timestamps is exact integer microseconds") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val l2 = Seq((1L, ts(10000L), "p")).toDF("k", "t", "name")
    val r2 = Seq((1L, ts(6000L), "x")).toDF("k", "t", "v")
    def run(tolMicros: Long) =
      AsofJoin.backward(l2, r2, Seq("k"), "t", "t", Seq("v"),
        tolerance = Some(lit(tolMicros)))
        .select($"asof_v").as[String].head()
    assert(run(4000000L) == "x")  // gap is exactly 4s = 4e6 µs
    assert(run(3999999L) == null)
  }
  test("a payload column named __rt is refused loudly") {
    val r2 = right.withColumnRenamed("v", "__rt")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(left, r2, Seq("k"), "t", "t", Seq("__rt"))
    }
    assert(e.getMessage.contains("__rt"))
  }
}
