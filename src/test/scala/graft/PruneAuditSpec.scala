package graft

import org.apache.spark.sql.functions._

import graft.sources.PruneAudit

/** E37: row-group pruning audit over parquet footer statistics. */
class PruneAuditSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame) = {
    val r = df.head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("E37: a range-clustered layout prunes exactly the disjoint groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    // four files with KNOWN disjoint key ranges: [0,250), [250,500), ...
    for (i <- 0 until 4)
      spark.range(i * 250, (i + 1) * 250).select(col("id").as("k"))
        .coalesce(1).write.mode("append").parquet(dir)
    val (groups, pruned, rows, rowsPruned, bytes, bytesPruned) =
      one(PruneAudit.audit(spark, dir, "k", 250L, 499L))
    assert(groups == 4L)
    assert(pruned == 3L, "the three files disjoint from [250,499] must prune")
    assert(rows == 1000L && rowsPruned == 750L)
    assert(bytes > 0L && bytesPruned > 0L && bytesPruned < bytes)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("E37: an unclustered layout proves it prunes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-flat").toString
    // every file spans the whole keyspace (round-robin): stats can't help
    spark.range(0, 1000).select((col("id") % 997).as("k"))
      .repartition(4).write.mode("overwrite").parquet(dir)
    val (groups, pruned, rows, rowsPruned, _, bytesPruned) =
      one(PruneAudit.audit(spark, dir, "k", 100L, 199L))
    assert(groups >= 4L && rows == 1000L)
    assert(pruned == 0L && rowsPruned == 0L && bytesPruned == 0L)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("E37: non-INT64 key columns are refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune-str").toString
    Seq("a", "b").toDF("s").write.mode("overwrite").parquet(dir)
    val e = intercept[Exception] {
      PruneAudit.audit(spark, dir, "s", 0L, 1L).collect()
    }
    assert(e.getMessage.contains("INT64") ||
      Option(e.getCause).exists(_.getMessage.contains("INT64")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
