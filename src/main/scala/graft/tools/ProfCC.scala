package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the dedup_components pipeline. */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profcc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val near = docs.unionByName(docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" graft dup tail marker")).as("text")))
    val pairs = time("build pairs plan") {
      graft.dedup.Dedup.ngramJaccardPairs(near, "doc_id", "text", 6000L)
    }
    val p = time("materialize pairs") { pairs.select("id_a", "id_b").cache().count() }
    println(s"[profcc] n_pairs = $p")
    val comp = time("cc on cached pairs") {
      graft.dedup.Dedup.connectedComponents(
        pairs.select("id_a", "id_b"), near.select(col("doc_id").as("id")))
        .count()
    }
    println(s"[profcc] n_labels = $comp")
    time("full query fresh") {
      val pairs2 = graft.dedup.Dedup.ngramJaccardPairs(near, "doc_id", "text", 6000L)
      graft.dedup.Dedup.connectedComponents(
        pairs2.select("id_a", "id_b"), near.select(col("doc_id").as("id"))).count()
    }
    spark.stop()
  }
}
