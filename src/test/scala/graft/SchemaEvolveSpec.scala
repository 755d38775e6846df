package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply

/** A14: schema-era alignment for replay across a DDL boundary. */
class SchemaEvolveSpec extends SparkSpecBase {
  import spark.implicits._

  // era 1: before ADD COLUMN score; era 2: after
  private def era1 = Seq(
    (1L, "a", "I", 1L), (2L, "b", "I", 2L), (1L, "a2", "U", 3L)
  ).toDF("id", "name", "Op", "seq")
  private def era2 = Seq(
    (2L, "b2", 0.5, "U", 4L), (3L, "c", 0.9, "I", 5L)
  ).toDF("id", "name", "score", "Op", "seq")

  test("A14: added column is null for pre-DDL rows; replay crosses the DDL") {
    val aligned = CdcApply.alignEvolved(Seq(era1, era2))
    // first-appearance column order: era1's columns, then the addition
    assert(aligned.columns.toSeq == Seq("id", "name", "Op", "seq", "score"))
    val state = CdcApply.latestState(aligned, Seq("id"), Seq(col("seq")))
      .select("id", "name", "score").as[(Long, String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    // id=1 last touched pre-DDL → score null; 2 and 3 post-DDL
    assert(state == Seq(
      (1L, "a2", None), (2L, "b2", Some(0.5)), (3L, "c", Some(0.9))))
  }

  test("A14: a dropped column is the mirror image (late rows null)") {
    val aligned = CdcApply.alignEvolved(Seq(era2, era1))
    val state = CdcApply.latestState(aligned, Seq("id"), Seq(col("seq")))
      .select("id", "score").as[(Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(state == Seq((1L, None), (2L, Some(0.5)), (3L, Some(0.9))))
  }

  test("A14: a type change across eras is refused loudly") {
    val e2bad = Seq((3L, 7, "I", 5L)).toDF("id", "name", "Op", "seq") // name: int
    val e = intercept[IllegalArgumentException] {
      CdcApply.alignEvolved(Seq(era1, e2bad))
    }
    assert(e.getMessage.contains("changes type"))
    intercept[IllegalArgumentException] { CdcApply.alignEvolved(Nil) }
  }

  test("A14: composes with a mergeSchema parquet scan (one-era input)") {
    val dir = Files.createTempDirectory("graft_evolve_").toString
    era1.coalesce(1).write.parquet(s"$dir/era=1")
    era2.coalesce(1).write.parquet(s"$dir/era=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      .drop("era")
    val viaMerge = CdcApply.latestState(merged, Seq("id"), Seq(col("seq")))
      .select("id", "name", "score").as[(Long, String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    val viaAlign = CdcApply.latestState(
      CdcApply.alignEvolved(Seq(era1, era2)), Seq("id"), Seq(col("seq")))
      .select("id", "name", "score").as[(Long, String, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(viaMerge == viaAlign)
  }
}
