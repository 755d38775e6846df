package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger benchmark corpus from an existing sf directory for
  * scaling smoke tests (BENCH at sf1): N id-shifted copies of every
  * table, constructed so per-copy structure is IDENTICAL to the source
  * and copies never interact:
  *
  *  - all entity keys shift by copy*stride consistently across tables,
  *    so referential joins (orders⋈customer, lineitem⋈part/supplier,
  *    events.user_id) fan out 10× without orphaning anything. The
  *    stride is derived from the SOURCE's own key span (next multiple
  *    of 10M above the largest key in any shifted column) — a FIXED
  *    stride collides chained scale-ups: sf1 keys already span 10
  *    strides, so shifting copy j by j·10M lands chain (k, j) on key
  *    v + (k+j)·10M — duplicate keys with divergent payloads (observed:
  *    a chained sf10 customer table with 1.5M rows but 285k distinct
  *    keys). Mirrors the ts-span logic below;
  *  - document text gets a per-copy suffix appended to EVERY token —
  *    within-copy shingle/near-dup structure is preserved exactly, while
  *    cross-copy shingles never collide (otherwise 10 verbatim copies of
  *    each doc would add an artificial 45-pair clique per document and
  *    the dedup queries would measure the construction, not the scale);
  *  - embeddings rotate circularly by the copy index AND flip a
  *    per-copy deterministic sign pattern — norms and intra-copy
  *    geometry exact, cross-copy cosines uncorrelated, and chained
  *    scale-ups can't recreate a copy (see [[embedCopy]]);
  *  - entity names (c_name, s_name) get per-copy suffixes pairwise ≥ 3
  *    edits apart, so edit-distance joins keep their within-copy ground
  *    truth instead of gaining a quadratic cross-copy duplicate mass;
  *  - dimension tables (region, nation) stay single-copy, as a real
  *    scale-up would;
  *  - every value transform (name/token suffix, embedding mask) applies
  *    to copy 0 TOO: a verbatim copy 0 makes chains (0, j) and (j, 0)
  *    compose to the same transform — bit-equal names/texts/vectors
  *    under different keys, i.e. artificial cross-copy dup pairs that
  *    the dedup and fuzzy-join measurements would report as real mass
  *    (caught by ScaleUpSpec's chain-distinctness test).
  *
  * Feeds the decade bench legs AND the large-scale oracle gates (the
  * full sf1 sweep in CORRECTNESS_sf1_r15.md, the sf10 family gate) —
  * the construction invariants above are what keep the DuckDB oracles
  * viable there. Written under target/ so it never enters git.
  */
object ScaleUp {
  /** Deterministic ±1 sign per (copy, dim), splitmix64 parity. */
  def signMask(k: Int): Array[Float] = Array.tabulate(64) { i =>
    var z = k.toLong * 64 + i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    if (((z ^ (z >>> 31)) & 1L) == 1L) -1f else 1f
  }

  /** Copy-k embedding transform: circular rotation + per-copy ±1 sign
    * mask. Rotation alone collides: it saturates at the dimensionality
    * (copies 64.. repeat copies 0..), and CHAINED scale-ups (sf1 → sf10)
    * compose rotations additively, so any two chains with equal total
    * rotation (k+j) yield bit-equal vectors under different vec_ids —
    * an artificial cross-copy dup clique that the semantic-dedup
    * measurements would report as real mass. The deterministic sign
    * flip per (copy, dim) preserves norms and every within-copy dot
    * product EXACTLY (s_i² = 1), keeps cross-copy cosines uncorrelated,
    * and makes composed transforms (rotate∘flip∘rotate∘flip) collide
    * only on identical chains: masks are effectively random 64-bit
    * patterns, so distinct chains disagree somewhere with overwhelming
    * margin. The mask applies to copy 0 TOO (rotation 0 + mask m_0) —
    * a verbatim copy 0 makes chains (0, j) and (j, 0) compose to the
    * same transform (m_j∘rot_j in both orders around an identity).
    */
  def embedCopy(s: DataFrame, k: Int): DataFrame = {
    val r = k % 64
    // the sign mask is a 64-element literal; zip_with against any other
    // width would silently null-pad (dims < 64) or truncate the mask
    // (dims > 64), producing corrupt vectors — refuse loudly per row
    val checked = when(size(col("embedding")) === 64, col("embedding"))
      .otherwise(raise_error(concat(
        lit("ScaleUp.embedCopy: expected 64-dim embedding, got "),
        size(col("embedding")).cast("string"))))
    val rotated =
      if (r == 0) checked
      else concat(
        slice(checked, lit(r + 1), size(checked) - r),
        slice(checked, lit(1), lit(r)))
    s.withColumn("embedding",
      zip_with(rotated, typedLit(signMask(k)), (x, m) => x * m))
  }

  /** Key stride for this invocation: the next multiple of 10M above the
    * largest key in any shifted column of the source — so chained
    * scale-ups shift past the source's whole key span instead of
    * landing copies on each other (see the class doc).
    */
  def keyStride(spark: SparkSession, src: String): Long = {
    val Off = 10000000L
    val keyCols = Seq(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    val maxKey = keyCols.flatMap { case (t, cs) =>
      val aggs = cs.map(c => max(col(c).cast("long")))
      val row = spark.read.parquet(s"$src/$t.parquet")
        .agg(aggs.head, aggs.tail: _*).head()
      // max() over an empty table is null — getLong would NPE opaquely
      cs.indices.map { i =>
        require(!row.isNullAt(i),
          s"ScaleUp.keyStride: source table '$t' is empty " +
            s"(max(${cs(i)}) is null) — cannot derive a key stride from it")
        row.getLong(i)
      }
    }.max
    (maxKey / Off + 1) * Off
  }

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
    val stride = keyStride(spark, src)
    println(s"[scaleup] key stride $stride")

    def write(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val all = (0 until copies).map(k => f(base, k)).reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t -> $out/$t.parquet (${copies}x)")
    }
    def shifted(d: DataFrame, k: Int, keys: String*): DataFrame =
      keys.foldLeft(d)((acc, c) => acc.withColumn(c, col(c) + lit(k * stride)))

    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    // entity NAMES get a per-copy suffix whose pairwise edit distance is
    // ≥ 3 (each fixed-width base-36 digit tripled: two distinct suffixes
    // differ in ≥ 3 character positions; copy 0 gets its equal-length
    // ' 000…' suffix too, so every pair of copies differs in ≥ 3) — the
    // fuzzy-join analogue of the ts-disjointness note below: 10 copies
    // of the SAME name are 45 true ed=0 pairs, so an unsuffixed scale-up
    // makes the edit-distance join's ground truth itself quadratic and
    // measures the construction, not the scale (observed: fuzzy_join
    // 34× per decade unsuffixed vs the join's real candidate growth).
    // Copy 0 is suffixed too (class doc: chain (0,j) vs (j,0)); a
    // common appended suffix never changes within-copy edit distances.
    val nameWidth = Integer.toString(math.max(copies - 1, 1), 36).length
    def nameSuffix(k: Int): String = {
      val s = Integer.toString(k, 36)
      val padded = "0" * (nameWidth - s.length) + s
      " " + padded.flatMap(c => s"$c$c$c")
    }
    def renamed(d: DataFrame, k: Int, nameCol: String): DataFrame =
      d.withColumn(nameCol, concat(col(nameCol), lit(nameSuffix(k))))
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
      // copy k's shingles are disjoint from copy j's for ANY copy count;
      // copy 0 is suffixed too (class doc: chain (0,j) vs (j,0))
      shifted(d, k, "doc_id").withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1" + copySuffix(k)))
    }
    write("embeddings") { (d, k) =>
      embedCopy(shifted(d, k, "vec_id"), k)
    }
    spark.stop()
  }
}
