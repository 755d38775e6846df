package graft

import graft.dedup.Survivorship
import graft.dedup.Survivorship.{LatestRule, MaxRule, MinRule, ModeRule}
import org.apache.spark.sql.functions._

/** E62: field-wise survivorship merge per cluster. */
class SurvivorshipSpec extends SparkSpecBase {
  import spark.implicits._

  private val records = Seq(
    // cluster 1: segment mode = "auto" (2 votes), balance max 90,
    // latest-by-seq name = "n3"
    (1L, 10L, "auto", 50.0, 1L, "n1"),
    (1L, 11L, "auto", 90.0, 2L, "n2"),
    (1L, 12L, "bike", 10.0, 3L, "n3"),
    // cluster 2: mode tie auto/bike 1-1 → smallest value wins = "auto"
    (2L, 20L, "bike", 5.0, 9L, "m1"),
    (2L, 21L, "auto", 5.0, 8L, "m2")
  ).toDF("cluster", "id", "segment", "balance", "seq", "name")

  test("mode, max, min, latest compose into one golden row per cluster") {
    val out = Survivorship.goldenRecord(records, "cluster", Seq(
      "segment" -> ModeRule,
      "balance" -> MaxRule,
      "id" -> MinRule,
      "name" -> LatestRule(col("seq"))))
      .select("cluster", "segment", "balance", "id", "name", "n_members")
      .as[(Long, String, Double, Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "auto", 90.0, 10L, "n3", 3L),
      (2L, "auto", 5.0, 20L, "m1", 2L)))
  }

  test("mode ignores nulls; an all-null field yields a null golden value") {
    val r = Seq(
      (1L, Some("x"), 1L), (1L, None, 2L), (1L, None, 3L),
      (2L, None, 4L)
    ).toDF("cluster", "tag", "id")
    val out = Survivorship.goldenRecord(r, "cluster",
      Seq("tag" -> ModeRule, "id" -> MinRule))
      .select("cluster", "tag", "id")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, Some("x"), 1L), (2L, None, 4L)))
  }

  test("mode over a numeric column restores the declared type") {
    val r = Seq((1L, 7, 1L), (1L, 7, 2L), (1L, 9, 3L)).toDF("cluster", "n", "id")
    val out = Survivorship.goldenRecord(r, "cluster", Seq("n" -> ModeRule))
    assert(out.schema("n").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.select("n").as[Int].collect().toSeq == Seq(7))
  }

  test("pure order-rule path takes a single aggregation (no mode machinery)") {
    val plan = Survivorship.goldenRecord(records, "cluster",
      Seq("balance" -> MaxRule, "id" -> MinRule))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join:\n$plan")
  }

  test("unknown, duplicate, and empty rule sets are refused") {
    intercept[IllegalArgumentException](
      Survivorship.goldenRecord(records, "cluster", Seq.empty))
    intercept[IllegalArgumentException](
      Survivorship.goldenRecord(records, "cluster", Seq("nope" -> ModeRule)))
    intercept[IllegalArgumentException](
      Survivorship.goldenRecord(records, "cluster",
        Seq("id" -> MinRule, "id" -> MaxRule)))
  }

  test("golden output is column-order stable: cluster, rules in declaration order, n_members") {
    val out = Survivorship.goldenRecord(records, "cluster", Seq(
      "name" -> LatestRule(col("seq")), "segment" -> ModeRule))
    assert(out.columns.toSeq == Seq("cluster", "name", "segment", "n_members"))
  }
}
