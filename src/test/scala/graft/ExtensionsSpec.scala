package graft

/** graft_h32 availability in plain SQL — GraftExtensions is installed on
  * the shared test session via `withExtensions` (SparkSpecBase). */
class ExtensionsSpec extends SparkSpecBase {

  test("graft_h32 callable from SQL through SparkSessionExtensions") {
    val got = spark.sql("SELECT graft_h32('abc') AS h").collect().head.getLong(0)
    assert(got == 2416005272L) // first 8 hex chars of md5('abc')
  }

  test("graft_h32 rejects non-string input at analysis time") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_h32(CAST(1 AS INT))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_h32"))
  }

  test("graft_h32 in SQL equals the Column API h32") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("x", "yz", "").toDF("s")
    df.createOrReplaceTempView("h32_in")
    val viaSql = spark.sql("SELECT graft_h32(s) AS h FROM h32_in").as[Long].collect().toSeq
    val viaCol = df.select(graft.text.PortableHash.h32(col("s"))).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("E27: graft_kmv_distinct callable from SQL") {
    import spark.implicits._
    Seq("a", "b", "c", "a").toDF("s").createOrReplaceTempView("kmv_in")
    val got = spark.sql(
      "SELECT graft_kmv_distinct(graft_h32(s), 64) AS d FROM kmv_in")
      .as[Long].head()
    assert(got == 3L)
  }

  test("E27: KMV sketch — exact under k, bit-exact estimate over k, merge-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.PortableHash
    // under k distinct hashes: the exact distinct count, duplicates ignored
    val small = Seq("a", "b", "c", "a", "b").toDF("s")
    val exact = small.agg(PortableHash.kmvDistinct(PortableHash.h32($"s"), 64))
      .as[Long].head()
    assert(exact == 3L)
    // over k: estimate must equal (k-1)*2^32 / (k-th smallest distinct
    // hash), computed independently here — and be identical no matter
    // how the input is partitioned (exercises serialize/merge)
    val n = 5000
    val df = (1 to n).map(i => s"v:$i").toDF("s")
    val hashes = df.select(PortableHash.h32($"s").as("h"))
      .distinct().as[Long].collect().sorted
    val expected = 63L * 4294967296L / hashes(63)
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts)
        .agg(PortableHash.kmvDistinct(PortableHash.h32($"s"), 64))
        .as[Long].head()
      assert(got == expected, s"KMV estimate differs at $parts partitions")
    }
    // sanity: the estimate lands in the right ballpark for n=5000
    assert(expected > n / 2 && expected < n * 2, s"estimate $expected wildly off $n")
    // grouped: each group sketches independently
    val grouped = Seq.tabulate(200)(i => (i % 2, s"g:$i")).toDF("g", "s")
      .groupBy("g").agg(PortableHash.kmvDistinct(PortableHash.h32($"s"), 64).as("e"))
      .as[(Int, Long)].collect().toMap
    assert(grouped.size == 2 && grouped.values.forall(_ > 50L))
  }
}
