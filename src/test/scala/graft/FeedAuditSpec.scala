package graft

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply

/** A13: changefeed op-sequence sanity audit. */
class FeedAuditSpec extends SparkSpecBase {
  import spark.implicits._

  private def report(rows: Seq[(String, String, Long)], pk: Seq[String] = Seq("k")) = {
    val df = rows.toDF("k", "Op", "seq")
    CdcApply.auditFeed(df, pk, Seq(col("seq")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("A13: each anomaly class is counted; clean keys contribute nothing") {
    val r = report(Seq(
      ("k1", "I", 1L), ("k1", "U", 2L), ("k1", "D", 3L), // clean
      ("k2", "U", 1L),                                   // orphan
      ("k3", "I", 1L), ("k3", "I", 2L),                  // insert on live
      ("k4", "I", 1L), ("k4", "D", 2L), ("k4", "D", 3L), // delete on dead
      ("k5", "I", 1L), ("k5", "U", 2L), ("k5", "U", 2L)  // duplicate ordering
    ))
    assert(r == Map(
      "dup_ord" -> (1L, 1L),
      "orphan_op" -> (1L, 1L),
      "insert_on_live" -> (1L, 1L),
      "delete_on_dead" -> (1L, 1L)))
  }

  test("A13: a clean feed reports all four anomalies with zero counts") {
    val r = report(Seq(
      ("a", "I", 1L), ("a", "U", 2L), ("b", "I", 1L), ("b", "D", 2L)))
    assert(r.keySet == Set("dup_ord", "orphan_op", "insert_on_live", "delete_on_dead"))
    assert(r.values.forall(_ == (0L, 0L)))
  }

  test("A13: n vs n_keys distinguishes churn from spread; composite pk works") {
    val df = Seq(
      ("a", 1, "U", 1L), ("a", 1, "U", 2L), // orphan once (first row only)
      ("a", 2, "U", 1L),                    // different composite key: its own orphan
      ("b", 1, "I", 1L), ("b", 1, "I", 2L), ("b", 1, "I", 3L) // 2 inserts on live
    ).toDF("k1", "k2", "Op", "seq")
    val r = CdcApply.auditFeed(df, Seq("k1", "k2"), Seq(col("seq")))
      .as[(String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r("orphan_op") == (2L, 2L))
    assert(r("insert_on_live") == (2L, 1L))
    assert(r("dup_ord") == (0L, 0L))
  }
}
