package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.{Tables, TimeCols}

/** The time-axis encoding contract: the driver's generator has shipped
  * `events.ts` as TIMESTAMP(NANOS)-as-long, µs TIMESTAMP_NTZ, and µs-UTC
  * across regenerations — round 8 ended RED because the code hard-bound
  * one encoding. These tests pin the canonicalization for ALL THREE (and
  * the loud refusal beyond them) directly, so the next regeneration is a
  * no-op instead of a five-query breakage. */
class TimeColsSpec extends SparkSpecBase {
  import spark.implicits._

  // one instant, three encodings; the value exceeds 2^53 NANOS so the
  // nanos leg would corrupt under double math (the `div` exactness claim)
  private val us = 1705536000123456L // 2024-01-18 00:00:00.123456 UTC

  test("normalizeTs: nanos-as-long rebuilds exact micros past 2^53") {
    val df = Seq(us * 1000L).toDF("ts")
    assert(df.schema("ts").dataType == LongType)
    val out = Tables.normalizeTs(df, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == us)
  }

  test("normalizeTs: TIMESTAMP_NTZ casts to the identical wall-clock instant under UTC") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    // TimestampNTZType round-trips through parquet as µs isAdjustedToUTC=false
    // — the driver's current events encoding
    Seq(us).toDF("u")
      .select(timestamp_micros($"u").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(raw, "ts")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == us)
  }

  test("normalizeTs: TimestampType passes through untouched") {
    val df = Seq(us).toDF("u").select(timestamp_micros($"u").as("ts"))
    assert(Tables.normalizeTs(df, "ts").select(unix_micros($"ts")).as[Long].head() == us)
  }

  test("normalizeTs: an unhandled encoding is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeTs(Seq("2024-01-18").toDF("ts"), "ts")
    }
    assert(e.getMessage.contains("unhandled time encoding"))
  }

  test("TimeCols.micros: both timestamp types yield the same exact micros") {
    val df = Seq(us).toDF("u").select(
      timestamp_micros($"u").as("t"),
      timestamp_micros($"u").cast(TimestampNTZType).as("tn"))
    val got = df.select(
      TimeCols.micros($"t", df.schema("t").dataType),
      TimeCols.micros($"tn", df.schema("tn").dataType)).as[(Long, Long)].head()
    assert(got == ((us, us)))
  }

  test("TimeCols.micros: non-timestamp types are refused, never silently mis-united") {
    // the failure mode this guards: cast("long") on a timestamp is epoch
    // SECONDS — a 10^6 unit error that would flow through joins unnoticed
    val e = intercept[IllegalArgumentException] {
      TimeCols.micros(col("d"), DateType)
    }
    assert(e.getMessage.contains("TIMESTAMP"))
  }
}
