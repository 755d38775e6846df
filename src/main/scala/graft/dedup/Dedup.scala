package graft.dedup

import graft.text.{PortableHash, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-corpus pipelines, each designed around
  * its shuffle shape at 100 TB:
  *
  *  - exact: one hash-groupBy on a 16-byte fingerprint (map-side partial
  *    aggregation; the shuffle carries fingerprints, not documents).
  *  - n-gram Jaccard: explode to (shingle, doc) postings and self-join on
  *    the shingle key — the classic inverted-index plan; cost is linear in
  *    postings + candidate pairs, never O(n²) docs.
  *  - MinHash+LSH: constant-size signature per doc (k portable hashes),
  *    banded bucket join so only same-bucket docs ever meet; exact Jaccard
  *    verify on the (tiny) candidate set.
  *  - SimHash: 64-bit signature as two 32-bit halves; 16-bit chunk bands
  *    give EXACT candidate recall for hamming ≤ 3 by pigeonhole.
  *
  * All hashes are engine-portable (PortableHash.h32) so every stage is
  * verifiable against the DuckDB oracle.
  */
object Dedup {

  /** Exact dedup on normalized-text fingerprint.
    * Returns (fp, keeper_id = min id, n_docs). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Distinct (id, shingle) postings for a corpus. */
  private def postings(df: DataFrame, idCol: String, textCol: String, w: Int) =
    df.select(col(idCol).as("__id"),
        explode(TextOps.shingles(col(textCol), w)).as("__sh"))
      .distinct()

  /** All pairs (id_a < id_b) with shingle-set Jaccard ≥ tauBp/10000.
    * Output: id_a, id_b, common, n_a, n_b, jaccard_bp. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tauBp: Long,
      w: Int = 3): DataFrame = {
    val post = postings(df, idCol, textCol, w).cache()
    val sizes = post.groupBy("__id").agg(count(lit(1)).as("__n"))
    val a = post.select(col("__id").as("id_a"), col("__sh"))
    val b = post.select(col("__id").as("id_b"), col("__sh"))
    val common = a.join(b, "__sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "n_b"), "id_b")
      .withColumn("jaccard_bp",
        TextOps.bp(col("common"), col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard_bp") >= tauBp)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
  }

  /** MinHash signatures: numPerm portable seeded hash-mins per doc.
    * Output: id, sig_0..sig_{numPerm-1}. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String, numPerm: Int, w: Int = 3): DataFrame = {
    val sh = TextOps.shingles(col(textCol), w)
    val sigs = (0 until numPerm).map(i =>
      array_min(transform(sh, s => PortableHash.h32(i, s))).as(s"sig_$i"))
    df.select(col(idCol).as("__id") +: sigs: _*)
  }

  /** MinHash+LSH near-dup pairs: banded bucket join → candidate pairs →
    * exact Jaccard verification. Same output schema as ngramJaccardPairs
    * (verified candidates only — LSH recall bounds which pairs surface).
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tauBp: Long,
      numPerm: Int = 12,
      bands: Int = 4,
      w: Int = 3): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val sigs = minhashSignatures(df, idCol, textCol, numPerm, w)
    // one row per (band, bucketHash, id); bucket = portable hash of the
    // band's signature slice
    val banded = (0 until bands).map { b =>
      val slice = (0 until rows).map(r => col(s"sig_${b * rows + r}").cast("string"))
      sigs.select(
        lit(b).as("band"),
        PortableHash.h32(concat_ws(",", slice: _*)).as("bucket"),
        col("__id"))
    }.reduce(_ unionByName _)
    val l = banded.select(col("band"), col("bucket"), col("__id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("__id").as("id_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    // exact Jaccard verify bounded to the candidate set — the join fans out
    // by candidate postings, not corpus postings²
    val post = postings(df, idCol, textCol, w).cache()
    val sizes = post.groupBy("__id").agg(count(lit(1)).as("__n"))
    val common = candidates
      .join(post.select(col("__id").as("id_a"), col("__sh")), "id_a")
      .join(post.select(col("__id").as("id_b"), col("__sh")), Seq("id_b", "__sh"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "n_b"), "id_b")
      .withColumn("jaccard_bp",
        TextOps.bp(col("common"), col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard_bp") >= tauBp)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard_bp")
  }

  /** 64-bit SimHash as two unsigned 32-bit halves (hi, lo) over distinct
    * shingles. Output: id, sim_hi, sim_lo. */
  def simhash(df: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame = {
    val post = postings(df, idCol, textCol, w)
      .withColumn("__h_hi", PortableHash.h32(concat(lit("hi:"), col("__sh"))))
      .withColumn("__h_lo", PortableHash.h32(concat(lit("lo:"), col("__sh"))))
    def bitSums(h: String, prefix: String) = (0 until 32).map(i =>
      sum(when(shiftright(col(h), i) % 2 === 1, 1).otherwise(-1)).as(s"$prefix$i"))
    val sums = post.groupBy(col("__id"))
      .agg(bitSums("__h_hi", "hi").head,
        (bitSums("__h_hi", "hi").tail ++ bitSums("__h_lo", "lo")): _*)
    def pack(prefix: String) = (0 until 32)
      .map(i => when(col(s"$prefix$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("__id").as("id"),
      pack("hi").as("sim_hi"), pack("lo").as("sim_lo"))
  }

  /** SimHash near-dup pairs with hamming ≤ maxHamming (≤ 3 for exact
    * recall: 4 16-bit chunks, pigeonhole). Output: id_a, id_b, hamming. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, w: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    val sh = simhash(df, idCol, textCol, w)
    val chunks = Seq(
      shiftright(col("sim_hi"), 16), col("sim_hi") % 65536,
      shiftright(col("sim_lo"), 16), col("sim_lo") % 65536)
    val banded = chunks.zipWithIndex.map { case (c, i) =>
      sh.select(lit(i).as("chunk"), c.as("cv"),
        col("id"), col("sim_hi"), col("sim_lo"))
    }.reduce(_ unionByName _)
    val l = banded.select(col("chunk"), col("cv"), col("id").as("id_a"),
      col("sim_hi").as("hi_a"), col("sim_lo").as("lo_a"))
    val r = banded.select(col("chunk"), col("cv"), col("id").as("id_b"),
      col("sim_hi").as("hi_b"), col("sim_lo").as("lo_b"))
    l.join(r, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(expr("hi_a ^ hi_b")) + bit_count(expr("lo_a ^ lo_b")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
