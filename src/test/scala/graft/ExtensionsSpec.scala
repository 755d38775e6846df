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
}
