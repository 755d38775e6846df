package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape guards: the properties ExplainAudit verified once, pinned as
  * tests so optimizer-visible regressions (lost pushdown, vanished
  * broadcast, surprise shuffles) fail loudly. */
class PlanSpec extends SparkSpecBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf("sf0.001"))
      .queryExecution.explainString(FormattedMode)

  test("q1_agg: shipdate filter pushed to the parquet scan, columns pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters"))
    assert(p.contains("LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan should not read unused columns")
  }

  test("A12: a ts predicate pushes THROUGH normalizeTs into the events scan") {
    // Tables.events casts TIMESTAMP_NTZ → TimestampType; under the pinned
    // UTC session tz the cast is monotone, so Catalyst unwraps it
    // (UnwrapCastInBinaryComparison) and the horizon filter must still
    // reach PushedFilters on the NTZ scan — at 100 TB this is row-group
    // pruning vs a full read of the feed
    import org.apache.spark.sql.functions._
    // only the native timestamp encodings can push (nanos-as-long rebuilds
    // ts arithmetically — no scan column to push onto; filter sits right
    // above the scan instead)
    assume(spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .schema("ts").dataType != org.apache.spark.sql.types.LongType,
      "nanos-long encoding: ts is computed, scan-pushdown pin not applicable")
    val p = graft.util.Tables.events(spark, sf("sf0.001"))
      .filter(col("ts") <= lit("2024-01-18 00:00:00").cast("timestamp"))
      .select("event_id", "ts")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(ts"),
      s"the ts horizon must reach the parquet scan:\n$p")
  }

  test("q3_join: dimension side broadcast") {
    assert(plan("q3_join").contains("BroadcastHashJoin"))
  }

  test("cdc_delete: delete set broadcast anti-join") {
    val p = plan("cdc_delete")
    assert(p.contains("BroadcastHashJoin LeftAnti") || p.contains("LeftAnti BuildRight"))
  }

  test("cdc_apply_latest: exactly one exchange (single shuffle by pk)") {
    val p = plan("cdc_apply_latest")
    // formatted mode lists each node once in the detail section as "(N) Exchange"
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle, plan had $exchanges")
  }

  test("diff_rowlevel: full-outer sort-merge join on pk") {
    assert(plan("diff_rowlevel").contains("SortMergeJoin FullOuter"))
  }

  test("diff_chunk: partial aggregation before the exchange (hash sums combine map-side)") {
    val p = plan("diff_chunk")
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_"), "expected map-side partial aggregation")
  }

  test("text queries stay UDF-free") {
    // higher-order-function lambdas (filter/transform) are expression-level
    // and legitimately fall out of whole-stage codegen; what must never
    // appear is an actual UDF node
    Seq("text_tokens", "text_quality", "text_langid", "text_fingerprint").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q should not contain UDF nodes")
    }
    // the lambda-free query keeps full codegen
    assert(plan("text_tokens").linesIterator.exists(_.contains("* Project")),
      "text_tokens lost whole-stage codegen")
  }

  test("E22/E24/E26: new text operators have the intended shuffle shapes") {
    // dup-ngram share is map-only: array ops per row, zero exchanges
    val dup = plan("text_dupngrams")
    assert(!"\\(\\d+\\) Exchange".r.findAllIn(dup).hasNext,
      "text_dupngrams must not shuffle")
    // mixture sampling must never run a one-partition-per-stratum
    // window over the full data: its big window partitions by
    // (stratum, value-range bucket) — Packing's histogram pattern
    val mix = plan("data_mixture")
    assert(mix.contains("hashpartitioning(lang"),
      "data_mixture window must partition by stratum")
    assert("hashpartitioning\\(lang[^,]*, __b".r.findFirstIn(mix).isDefined,
      s"the full-data window must include the __b bucket in its partitioning:\n${mix.take(1500)}")
    // ngram LM: count aggregation combines map-side before the exchange
    val lm = plan("text_ngram_lm")
    assert(lm.contains("partial_count"), "ngram counts must combine map-side")
    assert(!lm.contains("ScalaUDF") && !lm.contains("BatchEvalPython"))
    // the text rankers run on the native bounded-heap operator — no
    // WindowExec, no per-group sort of the scored rows
    assert(lm.contains("TopKPerGroup") && !lm.contains("Window"),
      "ngram LM rank must be the native top-k, not a window")
    val tt = plan("text_topterms")
    assert(tt.contains("TopKPerGroup") && !tt.contains("Window"),
      "topTerms rank must be the native top-k, not a window")
    // repetition's k=1 rank is an argmax AGGREGATE — no window, no rank
    // operator, partial-aggregated map-side
    val rep = plan("text_repetition")
    assert(!rep.contains("Window") && !rep.contains("TopKPerGroup"),
      "repetition must be a pure aggregate")
    assert(rep.contains("partial_min") || rep.contains("partial_"),
      "repetition argmax must combine map-side")
  }

  test("E51/E52/E53: round-10 operators have the intended shuffle shapes") {
    // passage excision: the dup-hash screen comes back as a BROADCAST
    // (the corpus-scale side never sort-merge-joins), everything codegen'd
    val pe = plan("dedup_passages")
    assert(pe.contains("BroadcastExchange"),
      "the duplicated-hash screen must broadcast")
    assert(!pe.contains("SortMergeJoin"),
      s"no corpus-side sort-merge join expected:\n${pe.take(1500)}")
    assert(!pe.contains("ScalaUDF") && !pe.contains("BatchEvalPython"))
    // classifier serving (fold path, r13): ONE codegen'd scan — the
    // weight table travels inside the plan as the CentroidPredict
    // reference object, so the serve plan has NO join, NO exchange and
    // NO window at all (the strongest possible shape pin)
    val cp = plan("classifier_predict")
    assert(cp.contains("graft_centroid_predict"),
      s"serving must go through the native fold expression:\n${cp.take(1500)}")
    assert(!cp.contains("Exchange") && !cp.contains("Join") && !cp.contains("Window"),
      s"fold serving must be a single scan:\n${cp.take(1500)}")
    assert(!cp.contains("ScalaUDF") && !cp.contains("BatchEvalPython"))
    // winnowing: both frames ride ONE doc-partitioned sort — exactly one
    // hash exchange in the whole plan, and the h60 digest is the native
    // memoized expression (one md5 per gram, two lane reads)
    val wn = plan("text_winnow")
    assert("hashpartitioning".r.findAllIn(wn).length == 1,
      s"winnow must shuffle exactly once:\n${wn.take(1500)}")
    assert(wn.contains("graft_h32"))
    assert(!wn.contains("ScalaUDF") && !wn.contains("BatchEvalPython"))
  }

  test("E7c/E44t/E45: vector assignment plans are native folds — no SortAggregate") {
    // flat argmin: the centroid table rides the plan; the old min_by
    // struct buffer planned a SortAggregate over all n·K distance rows
    val ia = plan("emb_ivf_assign")
    assert(ia.contains("graft_nearest_centroid"),
      s"ivfAssign must go through the native argmin:\n${ia.take(1500)}")
    assert(!ia.contains("SortAggregate"),
      s"no n·K local sort in assignment:\n${ia.take(1500)}")
    // two-level tree: both levels fold into one call — the serve plan
    // has no join/aggregate at all beyond the corpus scan
    val ta = plan("emb_tree_assign")
    assert(ta.contains("graft_tree_assign"),
      s"treeAssign must go through the native fold:\n${ta.take(1500)}")
    assert(!ta.contains("SortAggregate") && !ta.contains("ObjectHashAggregate"),
      s"no ranking/argmin aggregate in tree assignment:\n${ta.take(1500)}")
    // PQ encode: the (dist, cluster) ordering packs into one long, so
    // the subspace argmin is a plain hash min
    val pq = plan("emb_pq_codes")
    assert(!pq.contains("SortAggregate"),
      s"PQ encode must hash-aggregate the packed argmin:\n${pq.take(2000)}")
  }

  test("E25: segment dedup joins on the h60 fingerprint, not segment text") {
    val p = plan("dedup_segments")
    // the keeper join's exchanges hash-partition on the __h hash column
    assert(p.contains("hashpartitioning(__h"),
      s"segment join must key on the 8-byte fingerprint, got:\n${p.take(2000)}")
  }

  test("bucketed tables: equi-join and groupBy on the bucket key are exchange-free") {
    import graft.sources.Bucketed
    import org.apache.spark.sql.functions._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val o = graft.util.Tables.orders(spark, sf("sf0.001"))
      val l = graft.util.Tables.lineitem(spark, sf("sf0.001"))
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Bucketed.write(o, "b_orders", buckets = 8, keys = Seq("o_orderkey"))
      Bucketed.write(l, "b_lineitem", buckets = 8, keys = Seq("o_orderkey"))
      val joined = Bucketed.colocatedJoin(spark, "b_orders", "b_lineitem", Seq("o_orderkey"))
      val jp = joined.queryExecution.explainString(FormattedMode)
      assert("\\(\\d+\\) Exchange".r.findAllIn(jp).isEmpty,
        s"bucketed join should not shuffle:\n$jp")
      assert(jp.contains("SortMergeJoin"))
      assert(joined.count() > 0)
      // aggregation on the bucket key also skips its exchange
      val agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(sum("l_quantity"))
      val ap = agg.queryExecution.explainString(FormattedMode)
      assert("\\(\\d+\\) Exchange".r.findAllIn(ap).isEmpty,
        s"bucketed agg should not shuffle:\n$ap")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed overwrite clears a NON-default (external) prior location") {
    import graft.sources.Bucketed
    val tmp = java.nio.file.Files.createTempDirectory("graft_ext_tbl").toFile
    val extDir = new java.io.File(tmp, "ext")
    try {
      import spark.implicits._
      Seq((1L, "old")).toDF("k", "v").write.parquet(extDir.getAbsolutePath)
      spark.sql(s"CREATE TABLE ext_loc_tbl (k BIGINT, v STRING) USING parquet LOCATION '${extDir.getAbsolutePath}'")
      // overwrite must look up the REAL registered location (not the default
      // warehouse path) so the stale external directory cannot survive
      Bucketed.overwrite(Seq((2L, "new")).toDF("k", "v"), "ext_loc_tbl",
        buckets = 2, keys = Seq("k"))
      assert(spark.table("ext_loc_tbl").as[(Long, String)].collect().toSeq == Seq((2L, "new")))
      assert(!extDir.exists(), "stale external table directory must be cleared")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ext_loc_tbl")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
  }

  test("bucketed rewrite reads its own target, clears crash debris, keeps bucketing") {
    import graft.sources.Bucketed
    import spark.implicits._
    try {
      Bucketed.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "rw_t", 2, Seq("k"))
      // debris from a hypothetical earlier crashed rewrite must not block
      Bucketed.write(Seq((9L, "stale")).toDF("k", "v"), "rw_t_rewrite_old", 2, Seq("k"))
      // the rewrite input READS the table being replaced (the compaction shape)
      Bucketed.rewrite(
        spark.table("rw_t").unionByName(Seq((3L, "c")).toDF("k", "v")),
        "rw_t", 2, Seq("k"))
      assert(spark.table("rw_t").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(!spark.catalog.tableExists("rw_t_rewrite_tmp"))
      assert(!spark.catalog.tableExists("rw_t_rewrite_old"))
      // bucket metadata survived the rename: groupBy on the key is exchange-free
      val agg = spark.table("rw_t").groupBy("k").count()
      assert("\\(\\d+\\) Exchange".r
        .findAllIn(agg.queryExecution.explainString(FormattedMode)).isEmpty,
        "rewritten table lost its bucketing")
    } finally {
      Seq("rw_t", "rw_t_rewrite_tmp", "rw_t_rewrite_old")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("dedup_incremental_indexed: index read bucketed + exchange-free, no corpus text") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    val corpus = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_pin_idx", buckets = 4)
    val batch = corpus.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" graft dup tail marker")).as("text"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // concrete physical tree
    // force the sort-merge regime: at 100 TB neither side of the postings
    // join broadcasts, and THAT is the plan whose corpus side must not
    // shuffle (at test scale Spark would broadcast the batch and bypass
    // bucketing entirely because it has no benefit there)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val serve = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_pin_idx", batch, "doc_id", "text", 6000L)
      val plan = serve.queryExecution.executedPlan
      def isIdx(f: FileSourceScanExec) =
        f.tableIdentifier.exists(_.table.startsWith("graft_pin_idx"))
      val idxScans = plan.collect { case f: FileSourceScanExec if isIdx(f) => f }
      assert(idxScans.nonEmpty, "serve plan reads the persisted index tables")
      assert(idxScans.forall(_.bucketedScan), "index must be read as a bucketed scan")
      // the bucket layout IS the join partitioning: between an index scan
      // and the first join that consumes it there must be NO shuffle —
      // only the (small) batch side moves. (Shuffles ABOVE the join are
      // fine: they move the candidate-sized join result, not the index.)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      var shuffledBeforeJoin = false
      def openIdx(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => isIdx(f)
        case _: SortMergeJoinExec | _: BroadcastHashJoinExec |
             _: ShuffledHashJoinExec | _: BroadcastNestedLoopJoinExec =>
          p.children.foreach(openIdx); false // join absorbs the scan
        case e: ShuffleExchangeExec =>
          val o = e.children.exists(openIdx)
          if (o) shuffledBeforeJoin = true
          o
        case _ => p.children.map(openIdx).exists(identity)
      }
      openIdx(plan)
      assert(!shuffledBeforeJoin, "corpus index was shuffled before its join")
      // no corpus re-tokenization: the only text-bearing scan is the batch
      val textScans = plan.collect {
        case f: FileSourceScanExec if f.output.exists(_.name == "text") => f
      }
      assert(textScans.size <= 1, "corpus text re-scanned at serve time")
      // and the indexed result is the direct operator's result exactly
      val direct = Dedup.incrementalNgramPairs(
        corpus, batch, "doc_id", "text", 6000L).collect().map(_.toSeq).toSet
      assert(serve.collect().map(_.toSeq).toSet == direct)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_pin_idx_postings")
      spark.sql("DROP TABLE IF EXISTS graft_pin_idx_sizes")
    }
  }

  test("dedup_incremental_delta: BOTH index legs read bucketed + exchange-free") {
    import graft.dedup.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val corpus0 = docs.filter(col("doc_id") % 5 =!= 3)
    val accepted = docs.filter(col("doc_id") % 5 === 3)
    val batch = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" graft dup tail marker")).as("text"))
    Dedup.writeNgramIndex(corpus0, "doc_id", "text", "graft_pin_dl", buckets = 4)
    Dedup.appendToNgramIndex(accepted, "doc_id", "text", "graft_pin_dl")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // the 100 TB regime
    try {
      val serve = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_pin_dl", batch, "doc_id", "text", 6000L)
      val plan = serve.queryExecution.executedPlan
      def isIdx(f: FileSourceScanExec) =
        f.tableIdentifier.exists(_.table.startsWith("graft_pin_dl"))
      val idxScans = plan.collect { case f: FileSourceScanExec if isIdx(f) => f }
      // base + delta legs: two postings scans and two sizes scans
      val scanned = idxScans.flatMap(_.tableIdentifier.map(_.table)).toSet
      assert(scanned == Set("graft_pin_dl_postings", "graft_pin_dl_postings_delta",
        "graft_pin_dl_sizes", "graft_pin_dl_sizes_delta"),
        s"expected all four index tables scanned, got $scanned")
      assert(idxScans.forall(_.bucketedScan),
        "base AND delta must be read as bucketed scans")
      // no index scan may sit under a shuffle before its consuming join
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      var shuffledBeforeJoin = false
      def openIdx(p: SparkPlan): Boolean = p match {
        case f: FileSourceScanExec => isIdx(f)
        case _: SortMergeJoinExec | _: BroadcastHashJoinExec |
             _: ShuffledHashJoinExec | _: BroadcastNestedLoopJoinExec =>
          p.children.foreach(openIdx); false
        case e: ShuffleExchangeExec =>
          val o = e.children.exists(openIdx)
          if (o) shuffledBeforeJoin = true
          o
        case _ => p.children.map(openIdx).exists(identity)
      }
      openIdx(plan)
      assert(!shuffledBeforeJoin, "an index leg was shuffled before its join")
      // and the answer equals screening against the FULL corpus directly
      val direct = Dedup.incrementalNgramPairs(
        docs, batch, "doc_id", "text", 6000L).collect().map(_.toSeq).toSet
      assert(serve.collect().map(_.toSeq).toSet == direct)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("postings", "sizes", "meta", "postings_delta", "sizes_delta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS graft_pin_dl_$s"))
    }
  }

  test("salted skew join equals the plain join and scatters the hot key") {
    import graft.operators.SkewJoin
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 10k rows of one hot key + a tail of cold keys
    val big = spark.range(0, 10000).select(
      when($"id" < 9000, 1L).otherwise($"id").as("k"), $"id".as("payload"))
    val dim = Seq((1L, "hot"), (9500L, "cold")).toDF("k", "name")
    val salted = SkewJoin.saltedEquiJoin(big, dim, Seq("k"), salts = 8)
    val plain = big.join(dim, "k")
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "name").exceptAll(
      plain.select("k", "payload", "name")).isEmpty)
    // the hot key's rows really do spread across salt sub-keys
    val spread = big.withColumn("__salt", pmod(hash(big.columns.map(col): _*), lit(8)))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(spread == 8, s"hot key used $spread of 8 salts")
  }

  test("compaction: sized landing bounds records per output file") {
    import graft.sources.Compaction
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // skewed input partitioning: one fat partition + many empties
    val df = spark.range(0, 10000).toDF("id").repartition(64)
    Compaction.landSized(df, out, maxRecordsPerFile = 1000)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val counts = files.map(f => spark.read.parquet(f.getPath).count())
    assert(counts.sum == 10000L)
    assert(counts.forall(_ <= 1000L), s"file sizes: ${counts.mkString(",")}")
    assert(counts.count(_ < 100L) <= 1, "rebalance should not leave tiny files")
  }

  test("compaction: z-order layout localizes EVERY clustered column per file") {
    import graft.sources.Compaction
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-z").toString + "/t"
    // two independent pseudo-uniform columns over [0, 10000)
    val df = spark.range(40000).select(
      pmod(hash(col("id")), lit(10000)).cast("long").as("x"),
      pmod(hash(col("id") * 7 + 3), lit(10000)).cast("long").as("y"))
    Compaction.zorderBy(df, out, Seq("x", "y"), numFiles = 16)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 12, s"range partitioner produced ${files.length} files")
    val spans = files.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (avgX, avgY) = (
      spans.map(_._1).sum.toDouble / spans.length,
      spans.map(_._2).sum.toDouble / spans.length)
    // 16 files over 2 dims ≈ 4×4 tiles: each file should span ≈1/4 of BOTH
    // domains (a single-column sort leaves the other column ≈ the full
    // 10000); 0.55 leaves room for range-sampler boundary slop
    assert(avgX < 10000 * 0.55, s"x not localized: avg per-file span $avgX")
    assert(avgY < 10000 * 0.55, s"y not localized: avg per-file span $avgY")
    assert(spark.read.parquet(out).count() == 40000L)
  }

  test("driver contract: entry() returns rows; every query has a runnable plan") {
    assert(SparkEntry.entry(spark).count() > 0)
    // rendering oracle SQL requires the run tag pinned (Verify does this;
    // an unpinned read throws rather than baking a wrong landing path)
    graft.RunPaths.pin("testdata")
    // every oracle key corresponds to a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("RunPaths: reading the tag unpinned is loud, and pin() is what Verify renders with") {
    val ex = intercept[IllegalStateException](graft.RunPaths.freshUnpinnedProbe())
    assert(ex.getMessage.contains("RunPaths.pin"))
  }

  test("cdc_snapshot_asof: the horizon filter sits on the scan, below the join") {
    val p = plan("cdc_snapshot_asof")
    // ts is REBUILT from the parquet long (nanos div 1000), so the cutoff
    // can't become a parquet row-group predicate — the guarantee is that
    // it filters scan-adjacent, before the join and the LWW exchange
    // "(N) Filter" rows are the detail section (the tree prints "Filter (N)");
    // the cutoff literal appears in the Condition line just below its header
    val filterId = "\\((\\d+)\\) Filter".r.findAllMatchIn(p)
      .filter(m => p.substring(m.start, math.min(p.length, m.start + 600))
        .contains("2024-01-18"))
      .map(_.group(1).toInt).toSeq
    val joinId = "\\((\\d+)\\) BroadcastHashJoin".r.findFirstMatchIn(p).map(_.group(1).toInt)
    assert(filterId.nonEmpty, "as-of cutoff filter missing from the plan")
    assert(joinId.nonEmpty && filterId.min < joinId.get,
      "cutoff must apply below the join (numbering is children-first)")
  }

  test("as-of joins cost one shuffle per side (no fan-out theta join)") {
    for (q <- Seq("asof_join", "asof_join_forward", "asof_join_tolerance")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must not fan out")
      // union-and-carry: the only join-like structure is the window pass;
      // exchanges = the two side aggregations' + the window's hash
      // partitionings, never a per-row range join
      assert(p.contains("Window"), s"$q should run as one window pass")
    }
  }

  test("data_source_share: the re-count's candidate filter reaches the parquet scan") {
    // the weighted recount filters on a plain column (source), so the
    // candidate probe should push into the scan — at 100 TB the second
    // pass reads only candidate sources' row groups
    val p = SparkEntry.queries("data_source_share")(spark, sf("sf0.001"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("In(source"),
      s"candidate-source filter must push to the scan:\n$p")
  }

  test("text_heavy_hitters: MG sketch combines map-side; re-count filters by InSet before the exchange") {
    // pass 1 (inside heavyHitters) is a TypedImperativeAggregate — pin it
    // on the final plan's pieces instead: the returned plan IS pass 2
    val df = SparkEntry.queries("text_heavy_hitters")(spark, sf("sf0.001"))
    val p = df.queryExecution.explainString(FormattedMode)
    // candidate filter runs before the aggregation exchange, as a set probe
    // (>10 literals converts In → InSet), so the shuffle carries only
    // candidate tokens
    assert(p.contains("INSET") || p.contains("InSet") || p.contains(" IN ("),
      s"recount should filter tokens by the candidate set probe:\n$p")
    assert(p.contains("HashAggregate"), "recount is a hash aggregation")
    // and the sketch pass itself: partial MG aggregation on the map side
    val sketch = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(org.apache.spark.sql.functions.explode(
        graft.text.TextOps.tokens(org.apache.spark.sql.functions.col("text"))).as("tok"))
      .agg(graft.text.TextOps.heavyHitterCandidates(
        org.apache.spark.sql.functions.col("tok"), 255))
      .queryExecution.explainString(FormattedMode)
    assert(sketch.contains("ObjectHashAggregate"),
      s"MG must aggregate via ObjectHashAggregate (typed buffer):\n$sketch")
    assert(sketch.contains("partial_graft_misra_gries"),
      s"MG must combine map-side (partial aggregation):\n$sketch")
  }
  test("A0h: hash-mode drill-down probe exchanges are candidate-sized (chunk gate below)") {
    // the row-level drill-down in hash-range mode full-outer-joins the
    // two sides by pk — at 100 TB that exchange must carry only rows of
    // DAMAGED chunks, never the table. The gate is an exact broadcast
    // semi-join on the (≤ 1e6/chunkSize, here ≤ 10⁴) bad chunk ids —
    // strictly tighter than a bloom screen over the same set (no false
    // positives, same map-side placement), so composing BloomPrune here
    // would only loosen it. Pin: every shuffle feeding the full-outer
    // join has the LeftSemi broadcast gate BELOW it.
    import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftSemi}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
    import org.apache.spark.sql.functions._
    import graft.cdc.CdcOperator
    val src = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val tgt = src.withColumn("v", when(col("k") === 7, lit(-1L)).otherwise(col("v")))
    val report = CdcOperator.validate(src, tgt, Seq("k"), "t",
      CdcOperator.ValidateConfig(chunkSize = 100, orderedChunks = false))
    val row = report.head() // finalize AQE so executedPlan is the real one
    assert(row.getAs[Long]("rows_differing") == 1L)
    def all(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      p +: kids.flatMap(all)
    }
    val nodes = all(report.queryExecution.executedPlan)
    val fo = nodes.collect { case j: BaseJoinExec if j.joinType == FullOuter => j }
    assert(fo.size == 1, s"expected exactly the drill-down full-outer join, got ${fo.size}")
    fo.head.children.foreach { side =>
      val sub = all(side)
      val exchanges = sub.collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.nonEmpty, "full-outer side must reach its pk exchange")
      val gated = exchanges.exists(e => all(e.asInstanceOf[SparkPlan]).exists {
        case b: BroadcastHashJoinExec => b.joinType == LeftSemi
        case _ => false
      })
      assert(gated,
        "chunk gate must sit BELOW the pk exchange so the shuffle carries " +
          "only damaged-chunk candidates:\n" + side.treeString)
    }
  }

  test("ordered-position chunking: slim zip input, hash-aggregable chunk stats (single pk)") {
    import org.apache.spark.sql.functions._
    val o = graft.util.Tables.orders(spark, sf("sf0.001"))
    val p = graft.diff.DataDiff
      .orderedChunkDiffRanges(o, o.limit(100), Seq("o_orderkey"), 50)
      .queryExecution.explainString(FormattedMode)
    // r14 win, pinned: the zip carries pk + row-hash ONLY — the full
    // 9-column orders row must never ride the range exchange / sort / zip
    assert(p.contains("Scan ExistingRDD"), s"zip boundary missing:\n${p.take(1200)}")
    assert(p.contains("__pos") && p.contains("__h"))
    assert(!p.contains("o_orderpriority") && !p.contains("o_totalprice"),
      "zip input must be projected to pk + row hash before the exchange")
    // r15 win, pinned: a single-column pk aggregates its chunk bounds on
    // the RAW column (primitive buffers → HashAggregate with map-side
    // partials); min/max over a pk STRUCT would force a SortAggregate +
    // an extra sort of the whole positioned frame
    assert(!p.contains("SortAggregate"),
      s"single-pk chunk agg must stay hash-aggregable:\n${p.take(1500)}")
    assert(p.contains("partial_min") && p.contains("partial_max"),
      "chunk bounds must combine map-side")
  }

  test("pagerank shape: partition-declaring checkpoint — co-keyed agg and join are exchange-free") {
    import org.apache.spark.sql.functions._
    // the PageRank/Triangles edge layout rests on this: the edge list is
    // repartition(src)-ed ONCE and the checkpoint DECLARES that layout,
    // so every round's deg aggregation and edge join add no exchange on
    // the checkpointed side. A plain Dataset.localCheckpoint loses the
    // layout under AQE (UnknownPartitioning — this pin was added the day
    // that was discovered); GraftBridge.localCheckpointHashPartitioned
    // is the fix, and this test fails if Spark ever invalidates it.
    val parts = spark.sessionState.conf.numShufflePartitions
    val und = org.apache.spark.sql.GraftBridge.localCheckpointHashPartitioned(
      spark.range(200)
        .select(col("id").as("src"), ((col("id") + 7) % 100).as("dst")),
      Seq("src"), parts)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    val dp = deg.queryExecution.explainString(FormattedMode)
    assert("\\(\\d+\\) Exchange".r.findAllIn(dp).isEmpty,
      s"deg aggregation must reuse the checkpointed partitioning:\n$dp")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = und.join(deg, Seq("src"))
      val jp = joined.queryExecution.explainString(FormattedMode)
      assert("\\(\\d+\\) Exchange".r.findAllIn(jp).isEmpty,
        s"the per-round edge join must not re-exchange either side:\n$jp")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed write/append land exactly one file set per bucket") {
    import graft.sources.Bucketed
    import org.apache.spark.sql.functions._
    // the r14 writer alignment claim, asserted on the actual file list:
    // repartition onto the writer's own bucket function means `buckets`
    // files per write, not (input partitions × buckets) shards
    def files(table: String): Seq[String] = {
      val loc = new java.net.URI(
        spark.sessionState.catalog
          .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
          .location.toString).getPath
      new java.io.File(loc).listFiles.toSeq.map(_.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
    }
    try {
      val df = spark.range(1000)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
        .repartition(32) // many input partitions — the unaligned shape
      Bucketed.write(df, "fc_t", buckets = 8, keys = Seq("k"))
      assert(files("fc_t").size == 8,
        s"write must land one file per bucket, got ${files("fc_t").size}")
      Bucketed.append(
        spark.range(1000, 1500).select(col("id").as("k"), (col("id") % 97).as("v"))
          .repartition(16),
        "fc_t", buckets = 8, keys = Seq("k"))
      assert(files("fc_t").size <= 16,
        s"append must add at most one file set per bucket, got ${files("fc_t").size}")
    } finally spark.sql("DROP TABLE IF EXISTS fc_t")
  }

  test("dedup_ngram_prefix: every join is key-equi, never a fan-out theta join") {
    // the lossless path's scale claim rests on ALL pair work being
    // hash-partitionable: the prefix-prefix self-join keys on the shared
    // shingle, the verify pass keys on the pair ids — a cartesian or
    // broadcast-nested-loop anywhere means the positional/length filters
    // became post-join predicates and the plan explodes at corpus scale
    val p = plan("dedup_ngram_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "prefix pair generation must not fan out")
    // the length + positional prunes act on the aggregated candidate set
    // BEFORE the verify joins: the final exact intersection must see
    // pair-count rows, so the docArrs joins sit ABOVE the cp aggregate
    assert(p.contains("array_intersect"), "exact verify must be the codegen'd intersection")
  }
}
