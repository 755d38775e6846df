package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger benchmark corpus from an existing sf directory for
  * scaling smoke tests (BENCH at sf1): N id-shifted copies of every
  * table, constructed so per-copy structure is IDENTICAL to the source
  * and copies never interact:
  *
  *  - all entity keys shift by copy*10M consistently across tables, so
  *    referential joins (orders⋈customer, lineitem⋈part/supplier,
  *    events.user_id) fan out 10× without orphaning anything;
  *  - document text gets a per-copy suffix appended to EVERY token —
  *    within-copy shingle/near-dup structure is preserved exactly, while
  *    cross-copy shingles never collide (otherwise 10 verbatim copies of
  *    each doc would add an artificial 45-pair clique per document and
  *    the dedup queries would measure the construction, not the scale);
  *  - embeddings rotate circularly by the copy index — norms and
  *    intra-copy geometry exact, cross-copy cosines uncorrelated;
  *  - entity names (c_name, s_name) get per-copy suffixes pairwise ≥ 3
  *    edits apart, so edit-distance joins keep their within-copy ground
  *    truth instead of gaining a quadratic cross-copy duplicate mass;
  *  - dimension tables (region, nation) stay single-copy, as a real
  *    scale-up would.
  *
  * Feeds the decade bench legs AND the large-scale oracle gates (the
  * full sf1 sweep in CORRECTNESS_sf1_r15.md, the sf10 family gate) —
  * the construction invariants above are what keep the DuckDB oracles
  * viable there. Written under target/ so it never enters git.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Off = 10000000L

    def write(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val all = (0 until copies).map(k => f(base, k)).reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t -> $out/$t.parquet (${copies}x)")
    }
    def shifted(d: DataFrame, k: Int, keys: String*): DataFrame =
      keys.foldLeft(d)((acc, c) => acc.withColumn(c, col(c) + lit(k * Off)))

    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    // entity NAMES get a per-copy suffix whose pairwise edit distance is
    // ≥ 3 (each fixed-width base-36 digit tripled: two distinct suffixes
    // differ in ≥ 3 character positions; copy 0 differs in length) — the
    // fuzzy-join analogue of the ts-disjointness note below: 10 copies
    // of the SAME name are 45 true ed=0 pairs, so an unsuffixed scale-up
    // makes the edit-distance join's ground truth itself quadratic and
    // measures the construction, not the scale (observed: fuzzy_join
    // 34× per decade unsuffixed vs the join's real candidate growth).
    val nameWidth = Integer.toString(math.max(copies - 1, 1), 36).length
    def nameSuffix(k: Int): String = {
      val s = Integer.toString(k, 36)
      val padded = "0" * (nameWidth - s.length) + s
      " " + padded.flatMap(c => s"$c$c$c")
    }
    def renamed(d: DataFrame, k: Int, nameCol: String): DataFrame =
      if (k == 0) d
      else d.withColumn(nameCol, concat(col(nameCol), lit(nameSuffix(k))))
    write("customer")((d, k) => renamed(shifted(d, k, "c_custkey"), k, "c_name"))
    write("supplier")((d, k) => renamed(shifted(d, k, "s_suppkey"), k, "s_name"))
    write("part")((d, k) => shifted(d, k, "p_partkey"))
    write("orders")((d, k) => shifted(d, k, "o_orderkey", "o_custkey"))
    write("lineitem")((d, k) => shifted(d, k, "l_orderkey", "l_partkey", "l_suppkey"))
    // ts shifts into DISJOINT per-copy windows: the time axis is a join
    // key for the no-equi-key operators (range join, as-of), where
    // overlapping copies would interact — cross-copy (point, interval)
    // candidate mass grows QUADRATICALLY with copies sharing a window,
    // so an unshifted scale-up measures the construction, not the scale
    // (observed: 25× per decade on range_join vs ~1.5× once disjoint).
    // Same reason document text gets per-copy suffixes. The stride is
    // derived from the SOURCE's own span (+2 days slack) so chained
    // scale-ups (sf1 → sf10, span already 10 windows wide) stay disjoint.
    locally {
      val ev = graft.util.Tables.normalizeTs(
        spark.read.parquet(s"$src/events.parquet"), "ts")
      val mm = ev.agg(min(col("ts")).cast("long"), max(col("ts")).cast("long")).head()
      val strideDays = (mm.getLong(1) - mm.getLong(0)) / 86400L + 2
      val all = (0 until copies).map { k =>
        shifted(ev, k, "event_id", "user_id")
          .withColumn("ts", col("ts") + expr(s"INTERVAL '${k * strideDays}' DAY"))
      }.reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/events.parquet")
      println(s"[scaleup] events -> $out/events.parquet (${copies}x, " +
        s"ts stride $strideDays days)")
    }
    // per-copy token suffix in [a-z0-9] (base-36 survives normalization),
    // FIXED-WIDTH zero-padded so suffixes are prefix-free: with variable
    // width, source token "x1" in copy 1 ("x1"+"1") and "x" in copy 37
    // ("x"+"11") would both become "x11" — a cross-copy shingle collision
    // that re-introduces the artificial clique this suffix exists to
    // prevent. Equal-length suffixes can only collide when equal.
    val sufWidth = Integer.toString(math.max(copies - 1, 1), 36).length
    def copySuffix(k: Int): String = {
      val s = Integer.toString(k, 36)
      "0" * (sufWidth - s.length) + s
    }
    write("documents") { (d, k) =>
      val s = shifted(d, k, "doc_id")
      if (k == 0) s
      else s.withColumn("text",
        // copy k's shingles are disjoint from copy j's for ANY copy count
        regexp_replace(col("text"), "(\\S+)", "$1" + copySuffix(k)))
    }
    write("embeddings") { (d, k) =>
      val s = shifted(d, k, "vec_id")
      // circular rotation by k mod dims (rotation 0 = verbatim copy —
      // only reached when copies exceed the dimensionality); slice args
      // must stay within the 64-dim array for any copy count
      val r = k % 64
      if (r == 0) s
      else s.withColumn("embedding",
        concat(slice(col("embedding"), lit(r + 1), size(col("embedding")) - r),
          slice(col("embedding"), lit(1), lit(r))))
    }
    spark.stop()
  }
}
