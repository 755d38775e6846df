package graft

import graft.operators.Rollup
import graft.operators.Rollup.{Count, Max, Spec, Sum}
import graft.streaming.RollupLanding
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming rollup maintenance (SURVEY §2 D5s): kill/restart equals the
  * whole-feed build, batch-id replay lands nothing, a crashed partial
  * version is overwritten, old versions are pruned. */
class RollupLandingSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType),
    StructField("id", LongType)))
  private val specs = Seq(
    Spec("n", lit(1L), Count), Spec("s", col("v"), Sum), Spec("mx", col("id"), Max))
  private val keys = Seq("k")

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def canon(df: DataFrame): Set[(String, Long, Option[Long], Option[Long])] =
    df.select(col("k"), col("n"), col("s"), col("mx"))
      .as[(String, Long, Option[Long], Option[Long])].collect().toSet

  test("D5s: drain / append / drain equals the whole-feed build (kill/restart shape)") {
    val feed = tmp("graft-rlf"); val land = tmp("graft-rll"); val ckpt = tmp("graft-rlc")
    val p1 = Seq(("a", 10L, 1L), ("b", 5L, 2L), ("a", 1L, 3L))
    val p2 = Seq(("a", 7L, 4L), ("c", 2L, 5L))
    def run(): Unit = {
      val q = RollupLanding.start(spark, feed, schema, identity,
        keys, specs, land, ckpt)
      q.awaitTermination()
    }
    p1.toDF("k", "v", "id").write.mode("append").parquet(feed)
    run() // phase 1 drains, then the query STOPS (the kill)
    p2.toDF("k", "v", "id").write.mode("append").parquet(feed)
    run() // restart absorbs only the increment
    val got = canon(RollupLanding.read(spark, land).get)
    val oracle = canon(Rollup.build((p1 ++ p2).toDF("k", "v", "id"), keys, specs))
    assert(got == oracle)
  }

  test("D5s: a replayed batch id lands nothing; the landed state is unchanged") {
    val land = tmp("graft-rlr")
    val b = Seq(("x", 3L, 1L)).toDF("k", "v", "id")
    assert(RollupLanding.landBatch(b, 5L, keys, specs, land))
    val before = canon(RollupLanding.read(spark, land).get)
    assert(!RollupLanding.landBatch(b, 5L, keys, specs, land)) // same id
    assert(!RollupLanding.landBatch(b, 3L, keys, specs, land)) // older id
    assert(canon(RollupLanding.read(spark, land).get) == before)
  }

  test("D5s: a crashed partial version (no _SUCCESS) is invisible and overwritten by the replay") {
    val land = tmp("graft-rlp")
    assert(RollupLanding.landBatch(
      Seq(("x", 1L, 1L)).toDF("k", "v", "id"), 0L, keys, specs, land))
    // simulate a crash mid-write of batch 1: partial dir, no _SUCCESS
    val partial = java.nio.file.Paths.get(land, "v1")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.write(partial.resolve("part-junk.parquet"), Array[Byte](1, 2))
    // readers ignore it
    assert(canon(RollupLanding.read(spark, land).get) ==
      Set(("x", 1L, Some(1L), Some(1L))))
    // the replay of batch 1 overwrites the partial and lands
    assert(RollupLanding.landBatch(
      Seq(("x", 2L, 2L)).toDF("k", "v", "id"), 1L, keys, specs, land))
    assert(canon(RollupLanding.read(spark, land).get) ==
      Set(("x", 2L, Some(3L), Some(2L))))
  }

  test("D5s/A0b: the rollup CLI two-invocation round-trip equals the whole-feed build") {
    val feed = tmp("graft-rcf"); val land = tmp("graft-rcl"); val ckpt = tmp("graft-rcc")
    val p1 = Seq(("a", 10L, 1L), ("b", 5L, 2L))
    val p2 = Seq(("a", 7L, 4L), ("c", 2L, 5L))
    def run(): Unit = graft.tools.Cli.main(Array(
      "rollup", "--in", feed, "--keys", "k", "--landing", land,
      "--sum", "v", "--max", "id", "--checkpoint", ckpt))
    p1.toDF("k", "v", "id").write.mode("append").parquet(feed)
    run()
    p2.toDF("k", "v", "id").write.mode("append").parquet(feed)
    run()
    val got = RollupLanding.read(spark, land).get
      .select(col("k"), col("n_rows"), col("sum_v"), col("max_id"))
      .as[(String, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      ("a", 2L, Some(17L), Some(4L)),
      ("b", 1L, Some(5L), Some(2L)),
      ("c", 1L, Some(2L), Some(5L))))
  }

  test("D5s: only the newest version and one predecessor survive a landing") {
    val land = tmp("graft-rlv")
    (0L to 3L).foreach(i => assert(RollupLanding.landBatch(
      Seq(("x", i, i)).toDF("k", "v", "id"), i, keys, specs, land)))
    val dirs = new java.io.File(land).listFiles().map(_.getName).filter(_.startsWith("v"))
    assert(dirs.toSet == Set("v2", "v3"), dirs.mkString(","))
    assert(canon(RollupLanding.read(spark, land).get) ==
      Set(("x", 4L, Some(6L), Some(3L))))
  }
}
