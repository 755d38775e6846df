package graft

import graft.operators.Markov
import org.apache.spark.sql.functions._

class MarkovSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)], gapUs: Long) = {
    // (user, us, type); event id = row index for tie-breaks
    val df = rows.zipWithIndex
      .map { case ((u, us, t), i) => (u, us, t, i.toLong) }
      .toDF("user_id", "us", "event_type", "event_id")
    Markov.transitions(df, "user_id", col("us"), "event_type",
      Seq(col("us"), col("event_id")), gapUs)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  test("D14: transition counts, session gap cut, probabilities and ranks") {
    val got = run(Seq(
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "a"), (1L, 10000L, "c"),
      (2L, 0L, "a"), (2L, 5L, "b")), gapUs = 100L)
    // u1: a→b, b→a (a→c cut by the 100µs gap); u2: a→b
    assert(got === Set(
      ("a", "b", 2L, 10000L, 1L),
      ("b", "a", 1L, 10000L, 1L)))
  }

  test("D14: per-prev probability splits in basis points, rank by count then name") {
    val got = run(Seq(
      (1L, 0L, "x"), (1L, 1L, "y"),
      (2L, 0L, "x"), (2L, 1L, "y"),
      (3L, 0L, "x"), (3L, 1L, "z")), gapUs = 100L)
    // x → y twice, x → z once: 6666 bp / 3333 bp, ranks 1 and 2
    assert(got === Set(
      ("x", "y", 2L, 6666L, 1L),
      ("x", "z", 1L, 3333L, 2L)))
  }

  test("D14: count ties rank by next_type name") {
    val got = run(Seq(
      (1L, 0L, "x"), (1L, 1L, "z"),
      (2L, 0L, "x"), (2L, 1L, "y")), gapUs = 100L)
    assert(got === Set(
      ("x", "y", 1L, 5000L, 1L),
      ("x", "z", 1L, 5000L, 2L)))
  }

  test("D14: a user's stream never leaks into another user's transitions") {
    val got = run(Seq((1L, 0L, "a"), (2L, 1L, "b")), gapUs = 1000L)
    assert(got.isEmpty)
  }
}
