package graft

import graft.operators.Rollup
import graft.operators.Rollup.{Count, Max, Min, Spec, Sum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance (SURVEY §2 D5m): merge(build(A),
  * build(B)) ≡ build(A ∪ B) over random splits and merge chains, schema
  * stability across generations, null behavior, loud drift refusal, and
  * the one-exchange merge plan over landed partials. */
class RollupSpec extends SparkSpecBase {
  import spark.implicits._

  private val keys = Seq("k")
  private def specs = Seq(
    Spec("n", lit(1L), Count),
    Spec("s", col("v").cast("decimal(18,2)"), Sum),
    Spec("mn", col("v"), Min),
    Spec("mx", col("id"), Max))

  private def rows(data: Seq[(String, Double, Long)]): DataFrame =
    data.toDF("k", "v", "id")

  private def canon(df: DataFrame): Set[(String, Long, Option[BigDecimal], Option[Double], Option[Long])] =
    df.select(col("k"), col("n"), col("s"), col("mn"), col("mx"))
      .as[(String, Long, Option[BigDecimal], Option[Double], Option[Long])]
      .collect().toSet

  test("D5m: merge(build(A), build(B)) == build(A ∪ B) over random splits and chains") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val data = (1L to 60L).map(i =>
        (s"k${rnd.nextInt(5)}", rnd.nextInt(1000) / 100.0, i))
      val parts = data.groupBy(_ => rnd.nextInt(3)).values.toSeq
      val whole = Rollup.build(rows(data), keys, specs)
      val merged = parts.map(p => Rollup.build(rows(p), keys, specs))
        .reduce((a, b) => Rollup.merge(a, b, keys, specs))
      assert(canon(merged) == canon(whole), s"trial $trial")
      // schema stability: a re-merged rollup has the fresh-build shape
      // (names + types; nullability legitimately differs on summed counts)
      assert(merged.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        whole.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"trial $trial schema drifted")
    }
  }

  test("D5m: nulls — sum/min/max skip nulls, count counts rows, all-null groups stay null") {
    val a = Seq(("g", Some(1.5), 1L), ("g", None, 2L), ("h", None, 3L))
      .toDF("k", "v", "id")
    val b = Seq(("h", Option.empty[Double], 4L)).toDF("k", "v", "id")
    val m = Rollup.merge(
      Rollup.build(a, keys, specs), Rollup.build(b, keys, specs), keys, specs)
    val got = canon(m)
    assert(got == Set(
      ("g", 2L, Some(BigDecimal("1.50")), Some(1.5), Some(2L)),
      ("h", 2L, None, None, Some(4L))))
  }

  test("D5m: schema drift between landed and delta is refused loudly") {
    val built = Rollup.build(rows(Seq(("a", 1.0, 1L))), keys, specs)
    val e = intercept[IllegalArgumentException] {
      Rollup.merge(built, built.withColumn("extra", lit(1)), keys, specs)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("D5m: merging two landed rollups costs one exchange of the keyspace") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    Rollup.build(rows(Seq(("a", 1.0, 1L), ("b", 2.0, 2L))), keys, specs)
      .write.parquet(s"$dir/landed")
    Rollup.build(rows(Seq(("a", 3.0, 3L))), keys, specs)
      .write.parquet(s"$dir/delta")
    val m = Rollup.merge(
      spark.read.parquet(s"$dir/landed"), spark.read.parquet(s"$dir/delta"),
      keys, specs)
    val plan = m.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(canon(m) == Set(
      ("a", 2L, Some(BigDecimal("4.00")), Some(1.0), Some(3L)),
      ("b", 1L, Some(BigDecimal("2.00")), Some(2.0), Some(2L))))
  }
}
