package graft

import graft.operators.KeyOverlap

/** E34: KMV set-overlap profile (join-planning pre-check). */
class KeyOverlapSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long, Long) =
    df.as[(Long, Long, Long, Long, Long)].head()

  test("E34: exact below k — counts, intersection and jaccard are the true values") {
    val a = (1L to 80L).toDF("k")
    val b = (61L to 100L).toDF("k") // overlap 61..80 = 20, union 100
    val (ea, eb, eu, ei, j) = one(KeyOverlap.profile(a, "k", b, "k", 256))
    assert((ea, eb, eu, ei) == ((80L, 40L, 100L, 20L)))
    assert(j == 20L * 10000L / 100L)
  }

  test("E34: estimate regime — within KMV tolerance, deterministic across partitionings") {
    // 6000 ∪ 4000 with 2000 common → union 8000, jaccard 0.25
    val a = (1L to 6000L).toDF("k")
    val b = (4001L to 8000L).toDF("k")
    val k = 128
    val runs = for (parts <- Seq(1, 7)) yield
      one(KeyOverlap.profile(a.repartition(parts), "k", b.repartition(parts), "k", k))
    assert(runs.distinct.size == 1, "profile must be independent of partitioning")
    val (ea, eb, eu, ei, j) = runs.head
    def within(got: Long, truth: Long, relPct: Int): Boolean =
      math.abs(got - truth) * 100 <= truth.toLong * relPct
    assert(within(ea, 6000, 25), s"est_a=$ea")
    assert(within(eb, 4000, 25), s"est_b=$eb")
    assert(within(eu, 8000, 25), s"est_union=$eu")
    assert(within(ei, 2000, 40), s"est_intersect=$ei") // J and U errors compound
    assert(within(j, 2500, 40), s"jaccard_bp=$j")
  }

  test("E34: synopsis pass is one partial-combined KMV aggregation, never a key-space shuffle") {
    // the property that holds at 100 TB: each side's exchange carries
    // ≤ k longs per map task (partial graft_kmv_bottom_k buffers), not
    // the distinct hash set — pin the aggregate and the absence of a
    // distinct/TopK before it
    val a = (1L to 100L).toDF("k")
    val p = a.select(graft.text.PortableHash.h32($"k".cast("string")).as("h"))
      .agg(graft.text.PortableHash.kmvBottomK($"h", 16))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ObjectHashAggregate"), s"KMV synopsis must aggregate via ObjectHashAggregate:\n$p")
    assert(p.contains("partial_graft_kmv_bottom_k"), s"synopsis must combine map-side:\n$p")
    assert(!p.contains("TopKPerGroup") && !p.contains("HashAggregate keys=[h"),
      s"no distinct or global rank of the hash set may precede the synopsis:\n$p")
  }

  test("E34: disjoint sides report zero intersection; empty and null-only sides are zeros") {
    val a = (1L to 500L).toDF("k")
    val b = (10001L to 10500L).toDF("k")
    val (_, _, _, ei, j) = one(KeyOverlap.profile(a, "k", b, "k", 64))
    assert(ei == 0L && j == 0L)
    val empty = Seq.empty[Long].toDF("k")
    val nulls = Seq[Option[Long]](None, None).toDF("k")
    val (ea2, eb2, eu2, ei2, j2) = one(KeyOverlap.profile(empty, "k", nulls, "k", 64))
    assert((ea2, eb2, eu2, ei2, j2) == ((0L, 0L, 0L, 0L, 0L)))
  }
}
