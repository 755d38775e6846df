package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for operator tuning: times each named plan piece. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.text.{PortableHash, TextOps}

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" graft dup tail marker")).as("text")))

    time("tokens only") {
      corpus.select(col("doc_id"), TextOps.tokens(col("text")).as("t")).count()
    }
    val post = corpus
      .select(col("doc_id").as("__id"), TextOps.tokens(col("text")).as("__t"))
      .select(col("__id"), explode(TextOps.shinglesFromTokens(col("__t"))).as("__sh"))
      .distinct()
    time("postings count") { post.count() }
    val hashed = post
      .withColumn("__h_hi", PortableHash.h32(concat(lit("hi:"), col("__sh"))))
      .withColumn("__h_lo", PortableHash.h32(concat(lit("lo:"), col("__sh"))))
    time("hashed count") { hashed.count() }
    def bitSums(h: String, prefix: String) = (0 until 32).map(i =>
      sum(when(shiftright(col(h), i) % 2 === 1, 1).otherwise(-1)).as(s"$prefix$i"))
    val sums = hashed.groupBy(col("__id"))
      .agg(bitSums("__h_hi", "hi").head,
        (bitSums("__h_hi", "hi").tail ++ bitSums("__h_lo", "lo")): _*)
    time("64-way bit sums") { sums.count() }
    def pack(prefix: String) = (0 until 32)
      .map(i => when(col(s"$prefix$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sh = sums.select(col("__id").as("id"),
      pack("hi").as("sim_hi"), pack("lo").as("sim_lo"))
    time("packed simhash") { sh.count() }
    time("full simhashPairs") {
      graft.dedup.Dedup.simhashPairs(corpus, "doc_id", "text").count()
    }
    // minhash stage breakdown — h60 postings, the pipeline the operator
    // actually runs (minhashLshPairs signs hashed keys, not strings)
    val post2 = TextOps.hashedShinglePostings(corpus, "doc_id", "text").cache()
    time("mh: postings cache") { post2.count() }
    val sigs = graft.dedup.Dedup.minhashSignaturesFromPostings(post2, 12).cache()
    time("mh: signatures") { sigs.count() }
    val bandStructs = (0 until 4).map { b =>
      val slice = (0 until 3).map(r => col(s"sig_${b * 3 + r}").cast("string"))
      struct(lit(b).as("band"), PortableHash.h32(concat_ws(",", slice: _*)).as("bucket"))
    }
    val banded = sigs.select(col("__id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("__id"), col("bb.band").as("band"), col("bb.bucket").as("bucket")).cache()
    time("mh: banded cache") { banded.count() }
    val cand = banded.select(col("band"), col("bucket"), col("__id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("__id").as("id_b")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct().cache()
    time("mh: candidates") { cand.count() }
    val sizes = post2.groupBy("__id").agg(count(lit(1)).as("__n"))
    val common = cand
      .join(post2.select(col("__id").as("id_a"), col("__sh")), "id_a")
      .join(post2.select(col("__id").as("id_b"), col("__sh")), Seq("id_b", "__sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    time("mh: verify") {
      common
        .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "n_b"), "id_b")
        .count()
    }
    time("mh: full operator fresh") {
      graft.dedup.Dedup.minhashLshPairs(corpus, "doc_id", "text", 6000L).count()
    }
    spark.stop()
  }
}
