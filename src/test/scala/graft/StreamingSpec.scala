package graft

import graft.streaming.{CdcStream, EventAgg}
import graft.streaming.CdcStream.KeyedChange
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC apply + windowed aggregation (SURVEY §2 A9, D6) driven
  * through MemoryStream microbatches. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("A9: stream latestState keeps LWW state across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedChange]
    val q = CdcStream.latestState(input.toDS())
      .writeStream.format("memory").queryName("cdc_state")
      .outputMode("update").start()
    try {
      input.addData(
        KeyedChange("1", 1, "I", "a"), KeyedChange("2", 1, "I", "x"))
      q.processAllAvailable()
      input.addData(
        KeyedChange("1", 2, "U", "b"),   // newer seq wins
        KeyedChange("2", 0, "U", "stale"), // stale seq ignored
        KeyedChange("3", 1, "D", "-"))
      q.processAllAvailable()
      val rows = spark.table("cdc_state")
        .groupBy("pk").agg(max(struct($"seq", $"op", $"payload")).as("s"))
        .select($"pk", $"s.op", $"s.payload")
        .as[(String, String, String)].collect()
        .map { case (k, o, p) => k -> ((o, p)) }.toMap
      assert(rows("1") == ("U", "b"))
      assert(rows("2") == ("I", "x")) // stale update did not overwrite
      assert(rows("3") == ("D", "-")) // delete emitted for sink-side removal
    } finally q.stop()
  }

  test("E1s: streaming exact dedup emits each fingerprint's first doc once") {
    import graft.streaming.StreamDedup
    import graft.streaming.StreamDedup.FpDoc
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FpDoc]
    val q = StreamDedup.firstSeen(input.toDS())
      .writeStream.format("memory").queryName("dedup_state")
      .outputMode("update").start()
    try {
      input.addData(FpDoc("f1", 10), FpDoc("f1", 7), FpDoc("f2", 3))
      q.processAllAvailable()
      input.addData(FpDoc("f1", 1), FpDoc("f3", 5)) // f1 re-arrival dropped
      q.processAllAvailable()
      val rows = spark.table("dedup_state")
        .as[(String, Long)].collect().toMap
      // min-id within the first microbatch wins; later arrivals never emit
      assert(rows == Map("f1" -> 7L, "f2" -> 3L, "f3" -> 5L))
      assert(spark.table("dedup_state").count() == 3) // exactly once each
    } finally q.stop()
  }

  test("E1s: stream fingerprints match batch Dedup.exact normalization") {
    import graft.streaming.StreamDedup
    val d = Seq((1L, "Hello, World!"), (2L, "hello   world")).toDF("doc_id", "text")
    val fps = StreamDedup.asFingerprinted(d, "doc_id", "text")
      .collect().map(_.fp).distinct
    assert(fps.length == 1) // same normalized fingerprint → one key
  }

  test("D6: watermarked hourly window agg over a bounded stream") {
    val dir = sf("sf0.001")
    // FileStreamSource wants a directory; stage the single file into one
    val staged = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventAgg.hourly(stream)
      .writeStream.format("memory").queryName("ev_agg")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_agg")
        .agg(sum($"n_events")).as[Long].head()
      val expected = spark.read.parquet(s"$dir/events.parquet").count()
      assert(got == expected)
    } finally q.stop()
  }
}
