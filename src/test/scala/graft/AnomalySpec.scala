package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpecBase {
  import spark.implicits._

  // (type, hour-index, events-in-hour) → one row per event
  private def feed(cells: Seq[(String, Int, Int)]) =
    cells.flatMap { case (t, h, n) =>
      (0 until n).map(i => (t, new java.sql.Timestamp(1700000000000L + h * 3600000L + i), i))
    }.toDF("event_type", "ts", "pad")

  test("D15: a planted 10x spike flags; steady hours do not") {
    // 20 steady hours of 10 plus one hour of 100:
    // n=21 S=300 Q=12000; spike dev²=(2100−300)²=3.24e6 > 9·(nQ−S²)=1.458e6
    val df = feed((0 until 20).map(h => ("a", h, 10)) :+ (("a", 20, 100)))
    val got = Anomaly.hourlyVolume(df, col("ts"), "event_type")
      .collect().map(r => r.getLong(2) -> r.getBoolean(5)).toMap
    assert(got(100L) === true)
    assert(got(10L) === false)
    val spike = Anomaly.hourlyVolume(df, col("ts"), "event_type")
      .filter(col("cnt") === 100).collect().head
    assert(spike.getDouble(3) === 3240000.0 && spike.getDouble(4) === 1458000.0)
  }

  test("D15: zero-variance types never flag; types are independent") {
    val df = feed(
      (0 until 5).map(h => ("flat", h, 7)) ++
        ((0 until 20).map(h => ("spiky", h, 10)) :+ (("spiky", 20, 100))))
    val got = Anomaly.hourlyVolume(df, col("ts"), "event_type")
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getBoolean(5)).toMap
    assert(got.filter(_._1._1 == "flat").values.forall(_ == false))
    assert(got(("spiky", 100L)) === true)
    assert(got.count(_._2) === 1)
  }

  test("D15: a mild wobble stays under the 3-sigma bound") {
    // alternating 9/11 around mean 10: max dev² = (20·11−200)² = 400·n²…
    val df = feed((0 until 20).map(h => ("w", h, if (h % 2 == 0) 9 else 11)))
    val got = Anomaly.hourlyVolume(df, col("ts"), "event_type").collect()
    assert(got.forall(!_.getBoolean(5)))
  }
}
