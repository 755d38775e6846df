package graft

import graft.operators.Trend
import graft.streaming.TrendStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** D18s: streaming trend ≡ batch trend after every microbatch prefix. */
class TrendStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("complete-mode running trend equals the batch answer after each microbatch") {
    val rnd = new scala.util.Random(181818)
    val rows = Seq.fill(120)((s"g${rnd.nextInt(3)}",
      1500000000000000L + rnd.nextInt(1 << 30).toLong * 1000L,
      rnd.nextDouble() * 50 - 25))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val q = TrendStream.runningTrend(
      input.toDF().toDF("g", "x_us", "v"),
      Seq("g"), col("x_us"), col("v"), 1500000000L)
      .writeStream.outputMode("complete")
      .format("memory").queryName("trend_sink").start()
    try {
      val (b1, rest) = rows.splitAt(40)
      val (b2, b3) = rest.splitAt(40)
      var seen = Seq.empty[(String, Long, Double)]
      for (batch <- Seq(b1, b2, b3)) {
        input.addData(batch: _*); q.processAllAvailable()
        seen = seen ++ batch
        val got = spark.table("trend_sink")
          .select("g", "n", "slope_milli_per_day", "r2_bp")
          .as[(String, Long, Option[Long], Option[Long])].collect().toSet
        val want = Trend.perGroup(seen.toDF("g", "x_us", "v"),
            Seq("g"), col("x_us"), col("v"), 1500000000L)
          .select("g", "n", "slope_milli_per_day", "r2_bp")
          .as[(String, Long, Option[Long], Option[Long])].collect().toSet
        assert(got == want, s"after ${seen.size} events")
      }
    } finally q.stop()
  }
}
