package graft

import graft.operators.Resample
import graft.streaming.ResampleStream
import graft.streaming.ResampleStream.RsEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** D17s: streamed resample ticks ≡ batch gridFill, bit-equal doubles. */
class ResampleStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val G = 1000L // grain for tests

  test("streamed ticks across microbatch splits equal batch gridFill bit-for-bit") {
    val rnd = new scala.util.Random(1717)
    // strictly increasing per key, some samples exactly on ticks
    val events = (0 until 3).flatMap { k =>
      var ts = 100L + rnd.nextInt(500)
      (0 until 40).map { _ =>
        val e = RsEvent(k.toLong, ts, rnd.nextDouble() * 100 - 50)
        ts += (if (rnd.nextBoolean()) G * (1 + rnd.nextInt(3)) // lands on-grid sometimes
               else 1L + rnd.nextInt(2500))
        e
      }
    }
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RsEvent]
    val q = ResampleStream.ticks(input.toDS(), G)
      .writeStream.outputMode("append")
      .format("memory").queryName("rs_sink").start()
    try {
      val batches = events.grouped(37).toSeq
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("rs_sink")
        .select("k", "tick_us", "v_locf", "v_interp")
        .as[(Long, Long, Double, Double)].collect().toSet
      val want = Resample.gridFill(
          events.toDF("k", "ts_us", "v")
            .withColumn("ts", timestamp_micros(col("ts_us"))),
          Seq("k"), col("ts"), col("v"), tieBreak = col("ts_us"), grainUs = G)
        .select("k", "tick_us", "v_locf", "v_interp")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(got == want, {
        val missing = want -- got; val extra = got -- want
        s"missing=${missing.take(3)} extra=${extra.take(3)}"
      })
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("regressing or tied event times raise loudly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RsEvent]
    val q = ResampleStream.ticks(input.toDS(), G)
      .writeStream.outputMode("append")
      .format("memory").queryName("rs_sink2").start()
    try {
      input.addData(RsEvent(1L, 5000L, 1.0)); q.processAllAvailable()
      input.addData(RsEvent(1L, 5000L, 2.0)) // tie with held sample
      val e = intercept[Exception](q.processAllAvailable())
      assert(e.getMessage != null)
    } finally q.stop()
  }

  test("open tail emits nothing until the closing sample arrives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RsEvent]
    val q = ResampleStream.ticks(input.toDS(), G)
      .writeStream.outputMode("append")
      .format("memory").queryName("rs_sink3").start()
    try {
      input.addData(RsEvent(7L, 1500L, 10.0)); q.processAllAvailable()
      assert(spark.table("rs_sink3").isEmpty) // no tick determined yet
      input.addData(RsEvent(7L, 4200L, 20.0)); q.processAllAvailable()
      val got = spark.table("rs_sink3")
        .select("tick_us", "v_locf").as[(Long, Double)].collect().toSet
      // ticks 2000,3000,4000 now determined, all LOCF = 10.0
      assert(got == Set((2000L, 10.0), (3000L, 10.0), (4000L, 10.0)))
    } finally q.stop()
  }
}
