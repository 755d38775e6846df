package graft

import graft.streaming.{CdcStream, EventAgg}
import graft.streaming.CdcStream.KeyedChange
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Multi-column changefeed row for the schema-generic stream tests
  * (top-level: MemoryStream needs a stable product encoder). */
case class McChange(id: Long, seq: Long, Op: String, name: String, amount: Double)

/** Document row for the continuous-ingest screening test. */
case class IngestDoc(doc_id: Long, text: String)

/** Timestamped changefeed row for the streaming SCD2 landing test. */
case class TsChange(id: Long, seq: Long, Op: String, name: String, ts: java.sql.Timestamp)

/** Streaming CDC apply + windowed aggregation (SURVEY §2 A9, D6) driven
  * through MemoryStream microbatches. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("A9: schema-generic latestStateRows lands a multi-column table, parity with batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[McChange]
    val q = CdcStream.latestStateRows(input.toDF(), Seq("id"), "seq", "Op")
      .writeStream.format("memory").queryName("cdc_rows")
      .outputMode("update").start()
    val feed = Seq(
      McChange(1, 1, "I", "a", 1.0), McChange(2, 1, "I", "x", 5.0),
      McChange(1, 2, "U", "b", 2.5), McChange(2, 0, "U", "stale", 9.9),
      McChange(3, 1, "I", "c", 3.0), McChange(3, 2, "D", "-", 0.0))
    try {
      input.addData(feed.take(2): _*)
      q.processAllAvailable()
      input.addData(feed.drop(2): _*)
      q.processAllAvailable()
      // final landed state = last emitted winner per key, deletes removed
      val streamState = spark.table("cdc_rows")
        .groupBy("id").agg(max(struct($"seq", $"Op", $"name", $"amount")).as("w"))
        .filter($"w.Op" =!= "D")
        .select($"id", $"w.name".as("name"), $"w.amount".as("amount"))
        .as[(Long, String, Double)].collect().toSet
      // batch twin over the identical feed
      val batchState = graft.cdc.CdcApply.latestState(
          feed.toDF(), Seq("id"), Seq(col("seq")))
        .select($"id", $"name", $"amount")
        .as[(Long, String, Double)].collect().toSet
      assert(streamState == batchState)
      assert(streamState == Set((1L, "b", 2.5), (2L, "x", 5.0)))
      // the full row (every column, typed) was carried through state
      assert(spark.table("cdc_rows").columns.toSeq ==
        Seq("id", "seq", "Op", "name", "amount"))
    } finally q.stop()
  }

  test("A9: checkpointed file-to-file CDC apply survives a kill/restart") {
    // End-to-end durability: readStream(parquet) → latestStateRows →
    // per-batch parquet landing, checkpointed, killed, RESTARTED.
    // foreachBatch is the landing path because an Update-mode stateful
    // operator cannot use the append-only file sink directly; per-batch
    // appends are idempotent under the final LWW read, which is exactly
    // how a real lake landing tolerates batch replay after recovery.
    // State runs on RocksDB — the provider a cluster deployment uses when
    // keyed state exceeds executor heap (spark.sql.streaming.stateStore
    // .providerClass=...state.RocksDBStateStoreProvider); checkpoint
    // recovery must restore it bit-for-bit.
    val root = java.nio.file.Files.createTempDirectory("graft-durable")
    val (srcDir, ckpt, outDir) =
      (s"$root/src", s"$root/ckpt", s"$root/out")
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // key 1's phase-2 update is STALE (seq 3 < restored seq 5): only a
    // restart that actually recovers phase-1 state suppresses it
    val feed1 = Seq(
      McChange(1, 5, "I", "one-v5", 1.0), McChange(2, 1, "I", "two-v1", 2.0),
      McChange(3, 1, "I", "three-v1", 3.0))
    val feed2 = Seq(
      McChange(1, 3, "U", "one-stale", 9.9), McChange(2, 2, "U", "two-v2", 2.5),
      McChange(4, 1, "I", "four-v1", 4.0), McChange(3, 2, "D", "-", 0.0))
    def start() = {
      val changes = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[McChange].schema)
        .parquet(srcDir)
      CdcStream.latestStateRows(changes, Seq("id"), "seq", "Op")
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .start()
    }
    try {
      feed1.toDF().write.mode("append").parquet(srcDir)
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop() // kill after phase 1
      feed2.toDF().write.mode("append").parquet(srcDir)
      val q2 = start() // resume from the same checkpoint
      try q2.processAllAvailable() finally q2.stop()
      // the DIRECT recovery probe: with phase-1 state restored,
      // latestStateRows suppresses the stale seq-3 update (5 > 3) and the
      // row never lands; with state lost, the stale row wins its (empty)
      // group and IS emitted — the LWW read below would mask that, so
      // assert absence on the raw landed rows first
      assert(spark.read.parquet(outDir).filter($"name" === "one-stale").isEmpty,
        "restart emitted a stale update — checkpoint state was not recovered")
      val landed = spark.read.parquet(outDir)
        .groupBy("id").agg(max(struct($"seq", $"Op", $"name", $"amount")).as("w"))
        .filter($"w.Op" =!= "D")
        .select($"id", $"w.name".as("name"))
        .as[(Long, String)].collect().toSet
      // batch-replay oracle over the full feed
      val oracle = graft.cdc.CdcApply.latestState(
          (feed1 ++ feed2).toDF(), Seq("id"), Seq(col("seq")))
        .select($"id", $"name").as[(Long, String)].collect().toSet
      assert(landed == oracle)
      assert(landed == Set((1L, "one-v5"), (2L, "two-v2"), (4L, "four-v1")),
        "restart lost or corrupted recovered state")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("A9+C6: streaming CDC lands in a live JDBC table, idempotent across kill/restart") {
    // the full composition: readStream → latestStateRows (LWW winners)
    // → JdbcLanding (idempotent ON CONFLICT upserts + pk deletes) into a
    // LIVE embedded JDBC database, checkpointed, killed mid-pipeline,
    // restarted. The landed TABLE (not a lake of appends) must equal the
    // batch-replay oracle: no duplicate rows, no lost updates, stale
    // replays suppressed by the recovered state.
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false },
      "duckdb JDBC driver jar not present in offline cache")
    import java.sql.DriverManager
    val root = java.nio.file.Files.createTempDirectory("graft-jdbc-stream")
    val (srcDir, ckpt) = (s"$root/src", s"$root/ckpt")
    val url = s"jdbc:duckdb:$root/land.db"
    def exec(statements: String*): Unit = {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try statements.foreach(st.execute) finally st.close()
      } finally conn.close()
    }
    exec(
      graft.pg.Ddl.createSchema("graft_stream"),
      graft.pg.Ddl.createTable("graft_stream", "accounts",
        scala.collection.immutable.ListMap(
          "id" -> "bigint", "seq" -> "bigint", "name" -> "text", "amount" -> "double precision"),
        Seq("id")))
    val feed1 = Seq(
      McChange(1, 5, "I", "one-v5", 1.0), McChange(2, 1, "I", "two-v1", 2.0),
      McChange(3, 1, "I", "three-v1", 3.0))
    val feed2 = Seq(
      McChange(1, 3, "U", "one-stale", 9.9), McChange(2, 2, "U", "two-v2", 2.5),
      McChange(4, 1, "I", "four-v1", 4.0), McChange(3, 2, "D", "-", 0.0))
    def start() = {
      val changes = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[McChange].schema)
        .parquet(srcDir)
      graft.streaming.JdbcLanding.start(
        CdcStream.latestStateRows(changes, Seq("id"), "seq", "Op"),
        Seq("id"), "Op", url, "graft_stream", "accounts", "", "",
        ckpt, batchSize = 2, maxConnections = 1)
    }
    feed1.toDF().write.mode("append").parquet(srcDir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill after phase 1
    feed2.toDF().write.mode("append").parquet(srcDir)
    val q2 = start() // resume from the same checkpoint
    try q2.processAllAvailable() finally q2.stop()
    val conn = DriverManager.getConnection(url)
    val got =
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            "SELECT id, name, amount FROM graft_stream.accounts ORDER BY id")
          val buf = Seq.newBuilder[(Long, String, Double)]
          while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getDouble(3)))
          buf.result()
        } finally st.close()
      } finally conn.close()
    // batch-replay oracle over the concatenated feed (deletes applied)
    val oracle = graft.cdc.CdcApply.latestState(
        (feed1 ++ feed2).toDF(), Seq("id"), Seq(col("seq")))
      .select($"id", $"name", $"amount")
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    assert(got == oracle, s"landed table $got != batch oracle $oracle")
    assert(got.map(_._1) == Seq(1L, 2L, 4L), "delete must have removed key 3")
    assert(got.head._2 == "one-v5", "stale replay overwrote a newer row")
  }

  test("A10s: streaming SCD2 landing — history table equals batch scd2History across kill/restart, re-delivery is a no-op") {
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false },
      "duckdb JDBC driver jar not present in offline cache")
    import java.sql.{DriverManager, Timestamp}
    val root = java.nio.file.Files.createTempDirectory("graft-scd2-stream")
    val (srcDir, ckpt) = (s"$root/src", s"$root/ckpt")
    val url = s"jdbc:duckdb:$root/hist.db"
    def exec(statements: String*): Unit = {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try statements.foreach(st.execute) finally st.close()
      } finally conn.close()
    }
    // history's natural key (id, valid_from_us) = the conflict target
    exec(
      graft.pg.Ddl.createSchema("graft_scd2"),
      graft.pg.Ddl.createTable("graft_scd2", "history",
        scala.collection.immutable.ListMap(
          "id" -> "bigint", "seq" -> "bigint", "name" -> "text",
          "ts" -> "timestamp", "valid_from_us" -> "bigint",
          "valid_to_us" -> "bigint", "is_current" -> "bigint"),
        Seq("id", "valid_from_us")))
    def t(s: Long) = new Timestamp(s * 1000L)
    val feed1 = Seq( // within-batch supersession on id 1
      TsChange(1, 1, "I", "one-v1", t(1000)), TsChange(1, 2, "U", "one-v2", t(2000)),
      TsChange(2, 1, "I", "two-v1", t(1000)), TsChange(3, 1, "I", "three-v1", t(1000)))
    val feed2 = Seq( // cross-batch supersession, a closing delete, a new key
      TsChange(1, 3, "U", "one-v3", t(3000)), TsChange(3, 2, "D", "-", t(2000)),
      TsChange(4, 1, "I", "four-v1", t(2000)))
    def start() = {
      val changes = spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[TsChange].schema)
        .parquet(srcDir)
      graft.streaming.Scd2Landing.start(
        changes, Seq("id"), Seq(col("seq")), col("ts"), "Op",
        url, "graft_scd2", "history", "", "", ckpt,
        batchSize = 2, maxConnections = 1)
    }
    feed1.toDF().write.mode("append").parquet(srcDir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill after phase 1
    feed2.toDF().write.mode("append").parquet(srcDir)
    val q2 = start() // resume from the same checkpoint
    try q2.processAllAvailable() finally q2.stop()
    def landed(): Set[(Long, Long, String, Long, Option[Long], Long)] = {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            "SELECT id, seq, name, valid_from_us, valid_to_us, is_current FROM graft_scd2.history")
          val buf = Set.newBuilder[(Long, Long, String, Long, Option[Long], Long)]
          while (rs.next()) {
            val vto = rs.getLong(5)
            val vtoOpt = if (rs.wasNull()) None else Some(vto)
            buf += ((rs.getLong(1), rs.getLong(2), rs.getString(3), rs.getLong(4), vtoOpt, rs.getLong(6)))
          }
          buf.result()
        } finally st.close()
      } finally conn.close()
    }
    val got = landed()
    val oracle = graft.cdc.CdcApply.scd2History(
        (feed1 ++ feed2).toDF(), Seq("id"), Seq(col("seq")), col("ts"))
      .select($"id", $"seq", $"name", $"valid_from_us", $"valid_to_us", $"is_current")
      .as[(Long, Long, String, Long, Option[Long], Long)].collect().toSet
    assert(got == oracle, s"landed history $got != batch scd2History $oracle")
    // the delete left id 3 with history but no current row; id 1 has 3 versions
    assert(got.count(_._1 == 1L) == 3 && got.count(r => r._1 == 1L && r._6 == 1L) == 1)
    assert(got.exists(_._1 == 3L) && !got.exists(r => r._1 == 3L && r._6 == 1L))
    // at-least-once: re-delivering the LAST batch directly must change nothing
    graft.streaming.Scd2Landing.landBatch(
      feed2.toDF(), Seq("id"), Seq(col("seq")), col("ts"), "Op",
      url, "graft_scd2", "history", "", "", batchSize = 2, maxConnections = 1)
    assert(landed() == got, "replayed batch mutated the landed history")
  }

  test("A10s property: SCD2 landing converges under random batch boundaries × random crash/replay points") {
    // the scaladoc's at-least-once argument (statement families disjoint ⇒
    // commute ⇒ replay converges), exercised instead of asserted: random
    // feeds cut into random batches; each batch may first crash mid-apply
    // (a random PREFIX of its statements executes) and is then re-landed
    // in full — possibly twice (re-delivery). Every schedule must land the
    // exact batch scd2History of the whole feed.
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false },
      "duckdb JDBC driver jar not present in offline cache")
    import java.sql.{DriverManager, Timestamp}
    val rnd = new scala.util.Random(91L)
    for (trial <- 1 to 5) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-scd2-prop$trial")
      val url = s"jdbc:duckdb:$root/hist.db"
      def exec(statements: Seq[String]): Unit = {
        val conn = DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try statements.foreach(st.execute) finally st.close()
        } finally conn.close()
      }
      exec(Seq(
        graft.pg.Ddl.createSchema("graft_scd2"),
        graft.pg.Ddl.createTable("graft_scd2", "history",
          scala.collection.immutable.ListMap(
            "id" -> "bigint", "seq" -> "bigint", "name" -> "text",
            "ts" -> "timestamp", "valid_from_us" -> "bigint",
            "valid_to_us" -> "bigint", "is_current" -> "bigint"),
          Seq("id", "valid_from_us"))))
      // globally ordered events: seq-major interleaving of keys, ts = the
      // global position — so per-key ts follows seq (the landing's feed
      // contract: per-key event-time ordered ACROSS batches) and any
      // batch cut respects it; op strings arbitrary (D closes, rest version)
      val perKey = (1L to 5L).map(k => k -> (1 + rnd.nextInt(4))).toMap
      val ordered = perKey.toSeq
        .flatMap { case (k, n) => (1 to n).map(s => (k, s.toLong)) }
        .sortBy { case (k, s) => (s, k) }
        .zipWithIndex.map { case ((k, s), i) =>
          TsChange(k, s, Seq("I", "U", "D")(rnd.nextInt(3)), s"v$trial-$k-$s",
            new Timestamp((i + 1) * 1000L))
        }
      // cut into 1..4 batches at random boundaries
      val nBatches = 1 + rnd.nextInt(4)
      val cuts = (Seq(0, ordered.size) ++
        Seq.fill(nBatches - 1)(rnd.nextInt(ordered.size + 1))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => ordered.slice(a, b) }
        .filter(_.nonEmpty)
      def land(b: Seq[TsChange]): Unit = graft.streaming.Scd2Landing.landBatch(
        b.toDF(), Seq("id"), Seq(col("seq")), col("ts"), "Op",
        url, "graft_scd2", "history", "", "", batchSize = 2, maxConnections = 1)
      batches.foreach { b =>
        if (rnd.nextBoolean()) { // mid-batch crash: a statement prefix runs
          val stmts = graft.streaming.Scd2Landing.statements(
            b.toDF(), Seq("id"), Seq(col("seq")), col("ts"), "Op",
            "graft_scd2", "history").collect().toSeq
          exec(stmts.take(rnd.nextInt(stmts.size + 1)))
        }
        land(b)
        if (rnd.nextBoolean()) land(b) // at-least-once re-delivery
      }
      val got = {
        val conn = DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          try {
            val rs = st.executeQuery(
              "SELECT id, seq, name, valid_from_us, valid_to_us, is_current FROM graft_scd2.history")
            val buf = Set.newBuilder[(Long, Long, String, Long, Option[Long], Long)]
            while (rs.next()) {
              val vto = rs.getLong(5)
              val vtoOpt = if (rs.wasNull()) None else Some(vto)
              buf += ((rs.getLong(1), rs.getLong(2), rs.getString(3),
                rs.getLong(4), vtoOpt, rs.getLong(6)))
            }
            buf.result()
          } finally st.close()
        } finally conn.close()
      }
      val oracle = graft.cdc.CdcApply.scd2History(
          ordered.toDF(), Seq("id"), Seq(col("seq")), col("ts"))
        .select($"id", $"seq", $"name", $"valid_from_us", $"valid_to_us", $"is_current")
        .as[(Long, Long, String, Long, Option[Long], Long)].collect().toSet
      assert(got == oracle,
        s"trial $trial (batches=${batches.map(_.size)}): $got != $oracle")
    }
  }

  test("D11s: the range join composes with a streaming points side (stream-static, stateless)") {
    // the batch operator IS the streaming operator: bucketing is a pure
    // column rewrite (schema-only type resolution, codegen'd exact
    // division) and the bucket join is stream-static equi — append mode,
    // no state store, each microbatch enriched independently. The static
    // interval side replicates per bucket once per microbatch plan.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val pts = input.toDF().toDF("point_id", "t_us")
    val iv = Seq((10L, 0L, 100L), (20L, 50L, 150L), (30L, 200L, 300L))
      .toDF("interval_id", "s_us", "e_us")
    val joined = graft.operators.RangeJoin.pointInInterval(
      pts, col("t_us"), iv, col("s_us"), col("e_us"), grainUs = 50L)
    val q = joined.writeStream.format("memory").queryName("rj_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, 75L), (2L, 10L), (3L, 250L), (4L, 500L))
      q.processAllAvailable()
      def got() = spark.table("rj_stream")
        .select($"point_id", $"interval_id").as[(Long, Long)].collect().toSet
      // same pairs the batch operator emits: 75 ∈ [0,100)∩[50,150),
      // 10 ∈ [0,100), 250 ∈ [200,300), 500 ∈ nothing
      assert(got() == Set((1L, 10L), (1L, 20L), (2L, 10L), (3L, 30L)))
      input.addData((5L, 149L)) // boundary probe: 149 ∈ [50,150) only
      q.processAllAvailable()
      assert(got() == Set((1L, 10L), (1L, 20L), (2L, 10L), (3L, 30L), (5L, 20L)))
    } finally q.stop()
  }

  test("E2b-idx: continuous ingest screens each microbatch against the persisted index") {
    // the steady-state pipeline end to end: corpus indexed ONCE, then a
    // stream of incoming docs is near-dup-screened per microbatch via the
    // exchange-free indexed join, survivors landed — streaming + index
    // composed exactly as a production ingest would chain them
    import graft.dedup.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "pack my box with five dozen liquor jugs done")).toDF("doc_id", "text")
    Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_ingest_idx", buckets = 4)
    val outDir = java.nio.file.Files.createTempDirectory("graft-ingest").toString + "/out"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestDoc]
    val q = input.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dup = Dedup.incrementalNgramPairsIndexed(
          spark, "graft_ingest_idx", batch, "doc_id", "text", tauBp = 6000L)
          .select(col("batch_id").as("doc_id")).distinct()
        batch.join(dup, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      input.addData(
        IngestDoc(10L, "the quick brown fox jumps over the lazy dog end extra"), // near-dup of 1
        IngestDoc(11L, "completely novel sentence about unrelated subject matter"))
      q.processAllAvailable()
      input.addData(
        IngestDoc(12L, "pack my box with five dozen liquor jugs done"), // exact dup of 2
        IngestDoc(13L, "another genuinely fresh document with new content words"))
      q.processAllAvailable()
      val landed = spark.read.parquet(outDir).select($"doc_id").as[Long].collect().toSet
      assert(landed == Set(11L, 13L), "screening must drop 10 (near-dup) and 12 (exact dup)")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_ingest_idx_postings")
      spark.sql("DROP TABLE IF EXISTS graft_ingest_idx_sizes")
    }
  }

  test("E48b: continuous retrieval — query microbatches served from the persisted BM25 index") {
    // the serving composition: corpus indexed ONCE, a stream of query
    // texts ranked per microbatch via the exchange-friendly indexed path;
    // the union of streamed answers must equal one inline batch search
    import graft.text.Bm25
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow"),
      (4L, "quick foxes pack quartz boxes")).toDF("doc_id", "text")
    Bm25.writeIndex(corpus, "doc_id", "text", "graft_bm25_stream", buckets = 4)
    val outDir = java.nio.file.Files.createTempDirectory("graft-bm25s").toString + "/out"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestDoc]
    val q = input.toDF().toDF("query_id", "qtext").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Bm25.searchIndex(spark, "graft_bm25_stream", batch, "query_id", "qtext", k = 2)
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      input.addData(IngestDoc(100L, "quick fox"), IngestDoc(101L, "liquor jugs"))
      q.processAllAvailable()
      input.addData(IngestDoc(102L, "black quartz"))
      q.processAllAvailable()
      val streamed = spark.read.parquet(outDir).collect().map(_.toSeq).toSet
      val allQs = Seq((100L, "quick fox"), (101L, "liquor jugs"), (102L, "black quartz"))
        .toDF("query_id", "qtext")
      val inline = Bm25.search(corpus, "doc_id", "text", allQs, "query_id", "qtext", 2)
        .collect().map(_.toSeq).toSet
      assert(streamed == inline)
      assert(streamed.nonEmpty)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_bm25_stream_postings")
      spark.sql("DROP TABLE IF EXISTS graft_bm25_stream_meta")
    }
  }

  test("E50s: PCA projection composes with a streaming corpus (stateless column rewrite)") {
    // the model is a batch-fitted artifact; projection is literal
    // multiply-add columns, so it runs on a stream unchanged — append
    // mode, no state store, each microbatch projected independently
    import graft.similarity.Pca
    val fitPts = (-10 to 10).map(i => (i.toLong, Array(i.toFloat, 2.0f * i)))
      .toDF("id", "embedding")
    val model = Pca.fit(fitPts, "embedding", 2, 2)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val projected = Pca.transform(
      input.toDF().toDF("id", "embedding"), "embedding", model)
      .select(col("id"), element_at(col("pca"), 1).as("p1"))
    val q = projected.writeStream.format("memory").queryName("pca_stream")
      .outputMode("append").start()
    try {
      input.addData((100L, Seq(3.0f, 6.0f)), (101L, Seq(-2.0f, 1.0f)))
      q.processAllAvailable()
      val got = spark.table("pca_stream").as[(Long, Double)].collect().toMap
      val batch = Pca.transform(
        Seq((100L, Array(3.0f, 6.0f)), (101L, Array(-2.0f, 1.0f)))
          .toDF("id", "embedding"), "embedding", model)
        .select(col("id"), element_at(col("pca"), 1)).as[(Long, Double)].collect().toMap
      assert(got == batch && got.size == 2)
    } finally q.stop()
  }

  test("E52s: classifier serving composes with a streaming corpus (per-microbatch, model frozen)") {
    // the model is a batch-trained artifact; a doc arrives whole in one
    // row, so each microbatch classifies independently through
    // foreachBatch — no cross-batch state, predictions must equal the
    // one-shot batch call over the same rows
    import graft.text.Classifier
    val train = Seq(("de", "der und das ist der und"), ("en", "the and is that the and"))
      .toDF("cls", "text")
    val model = Classifier.trainCentroid(train, "cls", "text", n = 2)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.Map.empty[Long, String]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Classifier.predictCentroid(batch, "doc_id", "text", model, n = 2)
          .collect().foreach(r => acc.synchronized {
            acc(r.getLong(0)) = r.getString(1)
          })
      }
      .start()
    try {
      input.addData((1L, "der das und"), (2L, "the that and"))
      q.processAllAvailable()
      input.addData((3L, "und der ist"))
      q.processAllAvailable()
      val batchPred = Classifier.predictCentroid(
        Seq((1L, "der das und"), (2L, "the that and"), (3L, "und der ist"))
          .toDF("doc_id", "text"), "doc_id", "text", model, n = 2)
        .as[(Long, String)].collect().toMap
      assert(acc.toMap == batchPred && acc.size == 3)
      assert(acc(1L) == "de" && acc(2L) == "en")
    } finally q.stop()
  }

  test("E52s: the fold serve path streams DIRECTLY — a scalar column, no foreachBatch") {
    // CentroidPredict is a pure per-row expression, so serving composes
    // with writeStream like any projection: zero state, zero shuffle,
    // append mode — the shape foreachBatch + the join path could never
    // give a stream. Predictions must equal the batch fold (itself
    // parity-pinned to the join path in ClassifierSpec).
    import graft.text.Classifier
    val train = Seq(("de", "der und das ist der und"), ("en", "the and is that the and"))
      .toDF("cls", "text")
    val w = Classifier.trainCentroid(train, "cls", "text", n = 2)
    val predCol = Classifier.centroidPredictColumn(w, col("text"), n = 2)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), predCol.as("pred"))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_fold_stream").start()
    try {
      input.addData((1L, "der das und"), (2L, "the that and"))
      q.processAllAvailable()
      input.addData((3L, "und der ist"), (4L, "zzzz"))
      q.processAllAvailable()
      val got = spark.table("graft_fold_stream")
        .as[(Long, String)].collect().toMap
      val batch = Classifier.predictCentroidFold(
        Seq((1L, "der das und"), (2L, "the that and"), (3L, "und der ist"), (4L, "zzzz"))
          .toDF("doc_id", "text"), "doc_id", "text", w, n = 2)
        .as[(Long, String)].collect().toMap
      assert(got == batch && got.size == 4)
      assert(got(1L) == "de" && got(2L) == "en")
    } finally q.stop()
  }

  test("D12s: streaming funnel equals the batch cascade on a time-ordered feed") {
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.{Ev, UserFunnel}
    val H = 3600L * 1000000L
    val W = 48 * H
    val rnd = new scala.util.Random(2718)
    val evs = (0 until 300).map { _ =>
      Ev(rnd.nextInt(15).toLong, rnd.nextInt(200).toLong * H / 4,
        Seq("a", "b", "c", "x")(rnd.nextInt(4)))
    }.sortBy(_.ts_us) // the per-user event-time-order contract
    // sequential batch reference: the earliest-qualifying cascade
    val expect = evs.groupBy(_.user_id).map { case (u, es) =>
      def mn(step: String, after: Option[Long]): Option[Long] = after match {
        case None => es.collect { case e if e.event_type == step => e.ts_us }.minOption
        case Some(a) => es.collect {
          case e if e.event_type == step && e.ts_us > a && e.ts_us <= a + W => e.ts_us
        }.minOption
      }
      val t1 = mn("a", None); val t2 = t1.flatMap(x => mn("b", Some(x)))
      val t3 = t2.flatMap(x => mn("c", Some(x)))
      u -> Seq(t1, t2, t3).map(_.getOrElse(-1L))
    }
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = FunnelStream.funnelUpdates(input.toDS(), Seq("a", "b", "c"), W)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      val (h1, h2) = evs.splitAt(evs.size / 2) // time-ordered split
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      // latest update per user = the final resolution
      val got = spark.table("funnel_stream").as[UserFunnel].collect()
        .zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_._2)._1.steps }
      assert(got == expect, s"stream=$got expected=$expect")
      // and a conversion actually happened somewhere in the fixture
      assert(expect.values.exists(_.forall(_ >= 0)))
    } finally q.stop()
  }

  test("E53s: winnow screen composes with a streaming ingest (per-microbatch vs frozen index)") {
    // the index is a batch-built artifact; a doc arrives whole in one
    // row, so each microbatch screens independently through foreachBatch
    // against the frozen bucketed postings — screened pairs must equal
    // the one-shot batch screen over the same rows
    import graft.text.Winnow
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .as[(Long, String)].collect().toSeq
    Winnow.writeIndex(corpus, "doc_id", "text", "graft_stream_widx",
      buckets = 4, k = 20, w = 8)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.Set.empty[Seq[Any]]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Winnow.screenIndexed(spark, "graft_stream_widx", b, "doc_id", "text", 2L)
          .collect().foreach(r => acc.synchronized { acc += r.toSeq })
      }
      .start()
    try {
      val (half1, half2) = batch.splitAt(batch.size / 2)
      input.addData(half1: _*); q.processAllAvailable()
      input.addData(half2: _*); q.processAllAvailable()
      val oneShot = Winnow.screenIndexed(
        spark, "graft_stream_widx",
        batch.toDF("doc_id", "text"), "doc_id", "text", 2L)
        .collect().map(_.toSeq).toSet
      assert(acc.toSet == oneShot && oneShot.nonEmpty)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_stream_widx_fps")
      spark.sql("DROP TABLE IF EXISTS graft_stream_widx_meta")
    }
  }

  test("E2b-delta: continuous ingest ACCEPTS survivors into the index (screen → append loop)") {
    // the closed steady-state loop a year-long ingest runs: every
    // microbatch is screened against the index (base ∪ deltas), survivors
    // land AND are appended to the delta — so a later batch duplicating an
    // EARLIER BATCH's survivor is caught, not just duplicates of the
    // original corpus. No rebuild anywhere.
    import graft.dedup.Dedup
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end"),
      (2L, "pack my box with five dozen liquor jugs done")).toDF("doc_id", "text")
    Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_loop_idx", buckets = 4)
    val outDir = java.nio.file.Files.createTempDirectory("graft-loop").toString + "/out"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IngestDoc]
    // cluster labels maintained INCREMENTALLY batch over batch (star
    // summary, never the historical pair set) — must end equal to one
    // batch components run over every pair the loop observed
    var labels = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      corpus.select(col("doc_id").as("id")))
    val seenPairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val seenIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pairs = Dedup.incrementalNgramPairsIndexed(
          spark, "graft_loop_idx", batch, "doc_id", "text", tauBp = 6000L)
          .select(col("batch_id"), col("corpus_id")).cache()
        val dup = pairs.select(col("batch_id").as("doc_id")).distinct()
        val survivors = batch.join(dup, Seq("doc_id"), "left_anti").cache()
        if (!survivors.isEmpty) {
          survivors.write.mode("append").parquet(outDir)
          Dedup.appendToNgramIndex(survivors, "doc_id", "text", "graft_loop_idx")
        }
        labels = Dedup.incrementalComponents(
          labels,
          pairs.select(col("batch_id").as("id_a"), col("corpus_id").as("id_b")),
          batch.select(col("doc_id").as("id")))
        seenPairs ++= pairs.as[(Long, Long)].collect()
        seenIds ++= batch.select(col("doc_id")).as[Long].collect()
        pairs.unpersist(); survivors.unpersist()
        ()
      }
      .start()
    try {
      input.addData(
        IngestDoc(10L, "entirely original first wave sentence with distinct words"),
        IngestDoc(11L, "the quick brown fox jumps over the lazy dog end")) // dup of corpus 1
      q.processAllAvailable()
      input.addData(
        IngestDoc(12L, "entirely original first wave sentence with distinct words"), // dup of ACCEPTED 10
        IngestDoc(13L, "second wave genuinely novel document nothing shared here"))
      q.processAllAvailable()
      val landed = spark.read.parquet(outDir).select($"doc_id").as[Long].collect().toSet
      assert(landed == Set(10L, 13L),
        "12 duplicates batch-1 survivor 10 and must be dropped by the APPENDED index; " +
          s"got $landed")
      // incremental labels equal one batch components run over every
      // observed pair — and the cross-batch dup chain 10–12 merged
      val incLabels = labels.as[(Long, Long)].collect().toMap
      val batchLabels = Dedup.connectedComponents(
        seenPairs.toSeq.toDF("id_a", "id_b"),
        (corpus.select(col("doc_id").as("id")))
          .unionByName(seenIds.toSeq.toDF("id")))
        .as[(Long, Long)].collect().toMap
      assert(incLabels == batchLabels)
      assert(incLabels(12L) == incLabels(10L),
        "batch-2 dup must share batch-1 survivor's cluster")
      assert(incLabels(11L) == incLabels(1L),
        "corpus dup must share the corpus doc's cluster")
    } finally {
      q.stop()
      Seq("postings", "sizes", "meta", "postings_delta", "sizes_delta")
        .foreach(s => spark.sql(s"DROP TABLE IF EXISTS graft_loop_idx_$s"))
    }
  }

  test("E1s: firstSeen with a state TTL dedupes identically within the window") {
    import graft.streaming.StreamDedup
    import graft.streaming.StreamDedup.FpDoc
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FpDoc]
    // generous TTL: nothing expires inside the test — results must match
    // the untimed operator exactly; the ProcessingTimeTimeout path (arm +
    // re-arm on re-arrival) is what's being exercised
    val q = StreamDedup.firstSeen(input.toDS(), Some(java.time.Duration.ofHours(1)))
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("update").start()
    // processAllAvailable() HANGS under ProcessingTimeTimeout: timeout
    // evaluation makes shouldRunAnotherBatch always true, so no-data
    // batches run forever and the no-new-data signal never fires. Poll
    // the sink with a deadline instead.
    def awaitCount(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (spark.table("dedup_ttl").count() < n && System.nanoTime() < deadline)
        Thread.sleep(100)
    }
    try {
      input.addData(FpDoc("f1", 10), FpDoc("f1", 7), FpDoc("f2", 3))
      awaitCount(2)
      input.addData(FpDoc("f1", 1), FpDoc("f3", 5))
      awaitCount(3)
      val rows = spark.table("dedup_ttl").as[(String, Long)].collect().toMap
      assert(rows == Map("f1" -> 7L, "f2" -> 3L, "f3" -> 5L))
      assert(spark.table("dedup_ttl").count() == 3)
    } finally q.stop()
  }

  test("A9: stream latestState keeps LWW state across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedChange]
    val q = CdcStream.latestState(input.toDS())
      .writeStream.format("memory").queryName("cdc_state")
      .outputMode("update").start()
    try {
      input.addData(
        KeyedChange("1", 1, "I", "a"), KeyedChange("2", 1, "I", "x"))
      q.processAllAvailable()
      input.addData(
        KeyedChange("1", 2, "U", "b"),   // newer seq wins
        KeyedChange("2", 0, "U", "stale"), // stale seq ignored
        KeyedChange("3", 1, "D", "-"))
      q.processAllAvailable()
      val rows = spark.table("cdc_state")
        .groupBy("pk").agg(max(struct($"seq", $"op", $"payload")).as("s"))
        .select($"pk", $"s.op", $"s.payload")
        .as[(String, String, String)].collect()
        .map { case (k, o, p) => k -> ((o, p)) }.toMap
      assert(rows("1") == ("U", "b"))
      assert(rows("2") == ("I", "x")) // stale update did not overwrite
      assert(rows("3") == ("D", "-")) // delete emitted for sink-side removal
    } finally q.stop()
  }

  test("E1s: streaming exact dedup emits each fingerprint's first doc once") {
    import graft.streaming.StreamDedup
    import graft.streaming.StreamDedup.FpDoc
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FpDoc]
    val q = StreamDedup.firstSeen(input.toDS())
      .writeStream.format("memory").queryName("dedup_state")
      .outputMode("update").start()
    try {
      input.addData(FpDoc("f1", 10), FpDoc("f1", 7), FpDoc("f2", 3))
      q.processAllAvailable()
      input.addData(FpDoc("f1", 1), FpDoc("f3", 5)) // f1 re-arrival dropped
      q.processAllAvailable()
      val rows = spark.table("dedup_state")
        .as[(String, Long)].collect().toMap
      // min-id within the first microbatch wins; later arrivals never emit
      assert(rows == Map("f1" -> 7L, "f2" -> 3L, "f3" -> 5L))
      assert(spark.table("dedup_state").count() == 3) // exactly once each
    } finally q.stop()
  }

  test("E1s: stream fingerprints match batch Dedup.exact normalization") {
    import graft.streaming.StreamDedup
    val d = Seq((1L, "Hello, World!"), (2L, "hello   world")).toDF("doc_id", "text")
    val fps = StreamDedup.asFingerprinted(d, "doc_id", "text")
      .collect().map(_.fp).distinct
    assert(fps.length == 1) // same normalized fingerprint → one key
  }

  test("D4s: streaming sessions close on in-batch gaps and on watermark timeout") {
    import graft.streaming.SessionStream
    import graft.streaming.SessionStream.Ev
    implicit val sqlCtx = spark.sqlContext
    // epoch 0 == the stream's initial watermark and would be dropped as
    // late — base all event times an hour in
    def ts(min: Long) = new java.sql.Timestamp((min + 60) * 60000L)
    def ms(min: Long) = (min + 60) * 60000L
    val input = MemoryStream[Ev]
    val q = SessionStream.sessions(input.toDS(), gapMin = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two bursts 100 min apart IN ONE BATCH -> first closes now
      input.addData(Ev(1, ts(0)), Ev(1, ts(10)), Ev(1, ts(110)), Ev(1, ts(115)))
      q.processAllAvailable()
      val afterBatch = spark.table("sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(afterBatch == Set((1L, ms(0), ms(10), 2L)))
      // an out-of-order (but not late) event EARLIER than the open
      // session's start must extend the session backward
      input.addData(Ev(1, ts(108)))
      q.processAllAvailable()
      // a much later event for user 2 advances the watermark past
      // user 1's open-session deadline -> its trailing session emits
      input.addData(Ev(2, ts(1000)))
      q.processAllAvailable()
      input.addData(Ev(2, ts(1001))) // one more batch so the timeout fires
      q.processAllAvailable()
      val all = spark.table("sessions")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(all.contains((1L, ms(108), ms(115), 3L)),
        s"trailing session missing from $all")
    } finally q.stop()
  }

  test("D6: watermarked hourly window agg over a bounded stream") {
    val dir = sf("sf0.001")
    // FileStreamSource wants a directory; stage the single file into one
    val staged = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // same physical-encoding canonicalization the batch path uses — the
    // driver's generator has shipped ts as nanos-long, µs-NTZ, and µs-UTC
    val stream = graft.util.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(staged.toString), "ts")
    val q = EventAgg.hourly(stream)
      .writeStream.format("memory").queryName("ev_agg")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_agg")
        .agg(sum($"n_events")).as[Long].head()
      val expected = spark.read.parquet(s"$dir/events.parquet").count()
      assert(got == expected)
    } finally q.stop()
  }

  test("D7s: streaming as-of enriches probes from refs across microbatches") {
    import graft.streaming.AsofStream
    import graft.streaming.AsofStream.{Probe, Ref}
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val refIn = MemoryStream[Ref]
    val probeIn = MemoryStream[Probe]
    val q = AsofStream.enrich(refIn.toDS(), probeIn.toDS())
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      refIn.addData(Ref("a", ts(10), "x"), Ref("a", ts(20), "y"))
      probeIn.addData(Probe("a", ts(15), 1), Probe("a", ts(20), 2))
      q.processAllAvailable()
      // next batch: state carries the history; out-of-order + missing-key
      probeIn.addData(Probe("a", ts(25), 3), Probe("a", ts(5), 4), Probe("b", ts(10), 5))
      q.processAllAvailable()
      val rows = spark.table("asof_enrich")
        .select($"probeId", $"asofV").as[(Long, Option[String])].collect().toMap
      assert(rows(1L) == Some("x")) // 15 -> ref@10
      assert(rows(2L) == Some("y")) // equal ts matches (<=)
      assert(rows(3L) == Some("y")) // carried across the batch boundary
      assert(rows(4L) == None)      // out-of-order probe before any ref
      assert(rows(5L) == None)      // key never seen
    } finally q.stop()
  }

  test("D7s: tolerance turns stale references into misses") {
    import graft.streaming.AsofStream
    import graft.streaming.AsofStream.{Probe, Ref}
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val refIn = MemoryStream[Ref]
    val probeIn = MemoryStream[Probe]
    val q = AsofStream.enrich(refIn.toDS(), probeIn.toDS(), toleranceUs = Some(50000L))
      .writeStream.format("memory").queryName("asof_tol")
      .outputMode("append").start()
    try {
      refIn.addData(Ref("a", ts(10), "x"))
      probeIn.addData(Probe("a", ts(60), 1), Probe("a", ts(61), 2))
      q.processAllAvailable()
      val rows = spark.table("asof_tol")
        .select($"probeId", $"asofV").as[(Long, Option[String])].collect().toMap
      assert(rows(1L) == Some("x")) // gap 50ms = tolerance, inclusive
      assert(rows(2L) == None)      // gap 51ms, stale
    } finally q.stop()
  }

  test("D7s: sub-millisecond timestamps keep exact at-or-before semantics") {
    import graft.streaming.AsofStream
    import graft.streaming.AsofStream.{Probe, Ref}
    implicit val sqlCtx = spark.sqlContext
    def tsUs(us: Long) = { // microsecond-precise Timestamp
      val t = new java.sql.Timestamp(us / 1000)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    val refIn = MemoryStream[Ref]
    val probeIn = MemoryStream[Probe]
    val q = AsofStream.enrich(refIn.toDS(), probeIn.toDS())
      .writeStream.format("memory").queryName("asof_us")
      .outputMode("append").start()
    try {
      // ref at 10.9ms, probes straddling it within the same millisecond:
      // ms truncation would hand probe 1 a reference from its future
      refIn.addData(Ref("a", tsUs(10900), "late"), Ref("a", tsUs(9100), "early"))
      probeIn.addData(Probe("a", tsUs(10200), 1), Probe("a", tsUs(10900), 2))
      q.processAllAvailable()
      val rows = spark.table("asof_us")
        .select($"probeId", $"asofV").as[(Long, Option[String])].collect().toMap
      assert(rows(1L) == Some("early")) // 10.2ms: the 10.9ms ref is in its future
      assert(rows(2L) == Some("late"))  // exact-equal microsecond matches
    } finally q.stop()
  }

  test("D7s: watermark prunes ref history down to the reachable carry") {
    import graft.streaming.AsofStream
    import graft.streaming.AsofStream.{Probe, Ref}
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val refIn = MemoryStream[Ref]
    val probeIn = MemoryStream[Probe]
    val q = AsofStream.enrich(refIn.toDS(), probeIn.toDS(),
      watermarkDelay = Some("0 seconds"))
      .writeStream.format("memory").queryName("asof_wm")
      .outputMode("append").start()
    try {
      refIn.addData(Ref("a", ts(10), "x"), Ref("a", ts(20), "y"), Ref("a", ts(30), "z"))
      probeIn.addData(Probe("a", ts(40), 1)) // same batch: wm still 0, no prune yet
      q.processAllAvailable()
      // wm is now 40: this batch's invocation prunes history to [z] after
      // answering; in-order probes keep matching the carried newest ref
      probeIn.addData(Probe("a", ts(45), 2))
      q.processAllAvailable()
      // a LATE probe (behind the watermark) is dropped by the engine
      // before the function runs — the standard watermark contract (with
      // EventTimeTimeout armed for dead-key compaction, Spark filters
      // late input rows): no output row at all, rather than a miss
      probeIn.addData(Probe("a", ts(15), 3))
      q.processAllAvailable()
      val rows = spark.table("asof_wm")
        .select($"probeId", $"asofV").as[(Long, Option[String])].collect().toMap
      assert(rows(1L) == Some("z"))
      assert(rows(2L) == Some("z"))
      assert(!rows.contains(3L), "late probe must be dropped, not answered")
    } finally q.stop()
  }

  test("D7s: parity with the batch as-of join on an in-order feed") {
    import graft.operators.AsofJoin
    import graft.streaming.AsofStream
    import graft.streaming.AsofStream.{Probe, Ref}
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val refs = (1 to 60).map(i =>
      Ref(s"k${rnd.nextInt(4)}", new java.sql.Timestamp(rnd.nextInt(1000).toLong), s"v$i"))
    // distinct (k, ts) on the ref side: at equal (k, ts) the batch window
    // and the stream's same-ts overwrite may pick different writers
    val uniqRefs = refs.groupBy(r => (r.k, r.ts.getTime)).map(_._2.head).toSeq
    val probes = (1 to 80).map(i =>
      Probe(s"k${rnd.nextInt(4)}", new java.sql.Timestamp(rnd.nextInt(1100).toLong), i.toLong))
    val refIn = MemoryStream[Ref]
    val probeIn = MemoryStream[Probe]
    val q = AsofStream.enrich(refIn.toDS(), probeIn.toDS())
      .writeStream.format("memory").queryName("asof_parity")
      .outputMode("append").start()
    try {
      // feed in event-time order, refs and probes interleaved, 3 batches
      val cuts = Seq(300L, 700L, Long.MaxValue)
      var lo = Long.MinValue
      cuts.foreach { hi =>
        refIn.addData(uniqRefs.filter(r => r.ts.getTime > lo && r.ts.getTime <= hi))
        q.processAllAvailable() // refs land before same-window probes
        probeIn.addData(probes.filter(p => p.ts.getTime > lo && p.ts.getTime <= hi))
        q.processAllAvailable()
        lo = hi
      }
      val streamed = spark.table("asof_parity")
        .select($"probeId", $"asofV").as[(Long, Option[String])].collect().toMap
      val batch = AsofJoin.backward(
        probes.toDF("k", "ts", "probeId"), uniqRefs.toDF("k", "ts", "v"),
        Seq("k"), "ts", "ts", Seq("v"))
        .select($"probeId", $"asof_v").as[(Long, Option[String])].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("E32s: asSharded accepts numeric key columns — the join-key case") {
    import graft.streaming.HotKeysStream
    val keyed = HotKeysStream.asSharded((1L to 10L).toDF("uid"), "uid", 4).collect()
    assert(keyed.length == 10 && keyed.forall(k => k.shard >= 0 && k.shard < 4))
    assert(keyed.map(_.item).toSet == (1L to 10L).map(_.toString).toSet)
  }

  test("E32s: sharded streaming Misra-Gries keeps the per-shard guarantee across microbatches") {
    import graft.streaming.HotKeysStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(19)
    // heavy items spread across BOTH microbatches (state must accumulate,
    // not reset) buried in an all-distinct tail that forces sweeps at k=8
    val heavy = Map("alpha" -> 260, "beta" -> 150)
    val all = rnd.shuffle(
      heavy.toSeq.flatMap { case (s, c) => Seq.fill(c)(s) } ++
        (1 to 900).map(i => s"t$i"))
    val (b1, b2) = all.splitAt(all.size / 2)
    val k = 8
    val shards = 4
    val input = MemoryStream[String]
    val q = HotKeysStream.hotKeys(
        HotKeysStream.asSharded(input.toDF(), "value", shards), k)
      .writeStream.format("memory").queryName("hot_keys")
      .outputMode("update").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val live = HotKeysStream.latestPerShard(spark.table("hot_keys"))
        .select($"shard", $"n", $"item").collect()
      val candByShard = live.filter(!_.isNullAt(2)).groupBy(_.getInt(0))
      val nByShard = live.map(r => r.getInt(0) -> r.getLong(1)).toMap
      // independently compute each item's shard + true count, assert the
      // per-shard MG floor: count > n_shard/(k+1) ⟹ present
      val shardOf = HotKeysStream.asSharded(all.toDF("value"), "value", shards)
        .collect().map(kd => kd.item -> kd.shard).toMap
      val counts = all.groupBy(identity).view.mapValues(_.size.toLong)
      assert(nByShard.values.sum == all.size.toLong) // nothing lost across batches
      val mustSurvive = counts.filter { case (it, c) =>
        c * (k + 1) > nByShard(shardOf(it)) }.keySet
      assert(mustSurvive.exists(heavy.contains)) // the trial is non-trivial
      mustSurvive.foreach { it =>
        val present = candByShard(shardOf(it)).exists(_.getString(2) == it)
        assert(present, s"guaranteed hot item '$it' missing from shard ${shardOf(it)}")
      }
      // per-shard state is bounded by k — the sketch IS the eviction policy
      candByShard.values.foreach(rows => assert(rows.length <= k))
    } finally q.stop()
  }

  test("D14s: streamed path steps aggregate to the batch transition matrix") {
    import graft.streaming.PathStream
    import graft.streaming.PathStream.PEv
    val gapUs = 3600L * 1000000L // 1h — small enough to really exercise cuts
    val ev = graft.util.Tables.events(spark, sf("sf0.001"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val batch = graft.operators.Markov.transitions(
      ev, "user_id", unix_micros(col("ts")), "event_type",
      Seq(col("ts"), col("event_id")), gapUs)
      .select("prev_type", "next_type", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // global (µs, id) order → per-user in-order across the batch split,
    // exactly the order the batch window uses
    def us(t: java.sql.Timestamp) = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    val rows = ev.as[PEv].collect().sortBy(e => (us(e.ts), e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PEv]
    val q = PathStream.steps(input.toDS(), gapUs)
      .writeStream.format("memory").queryName("path_steps")
      .outputMode("append").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      input.addData(h1.toSeq: _*); q.processAllAvailable()
      input.addData(h2.toSeq: _*); q.processAllAvailable()
      val got = spark.table("path_steps")
        .groupBy("prev_type", "next_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(batch.nonEmpty)
      assert(got === batch)
    } finally q.stop()
  }

  test("E55s: the persisted LM perplexity-scores a stream per-microbatch, streamed == batch") {
    import graft.text.LangModel
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    LangModel.writeLmIndex(docs.filter(col("doc_id") % 7 =!= 0), "text",
      "graft_stream_lm", buckets = 4)
    val batch = docs.filter(col("doc_id") % 7 === 0)
      .as[(Long, String)].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.Set.empty[Seq[Any]]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        LangModel.scoreIndexed(spark, "graft_stream_lm", b, "doc_id", "text")
          .collect().foreach(r => acc.synchronized { acc += r.toSeq })
        ()
      }
      .start()
    try {
      val (h1, h2) = batch.splitAt(batch.size / 2)
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      val oneShot = LangModel.scoreIndexed(spark, "graft_stream_lm",
        batch.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(acc.toSet === oneShot && oneShot.nonEmpty)
    } finally {
      q.stop()
      Seq("_lm", "_ctx", "_meta").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS graft_stream_lm$sfx"))
    }
  }

  test("E56s: per-microbatch drift monitoring against a frozen reference distribution") {
    import graft.text.LangModel
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val ref = LangModel.unigramCounts(docs.filter(col("doc_id") % 2 === 0), "text")
      .localCheckpoint() // frozen artifact
    val live = docs.filter(col("doc_id") % 2 === 1)
      .as[(Long, String)].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val drifts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val r = LangModel.jsDivergenceVsCounts(ref, b, "text").collect().head
        drifts.synchronized { drifts += ((id, r.getLong(1))) }
        ()
      }
      .start()
    try {
      val (h1, h2) = live.splitAt(live.size / 2)
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      val byBatch = drifts.toMap
      // each microbatch's drift equals the direct batch computation
      for ((half, id) <- Seq((h1, 0L), (h2, 1L))) {
        val direct = LangModel.jsDivergenceVsCounts(
          ref, half.toDF("doc_id", "text"), "text").collect().head.getLong(1)
        assert(byBatch(id) === direct, s"batch $id")
        assert(direct > 0L) // disjoint docs: some real drift measured
      }
    } finally q.stop()
  }

  test("D14s: idle users expire from state; a post-gap event starts fresh, pre-gap pairs") {
    import graft.streaming.PathStream
    import graft.streaming.PathStream.PEv
    // clock base far above zero: Spark's late filter drops rows with
    // event time <= watermark, and the initial watermark is epoch 0
    val base = 1000000000000L
    def ts(ms: Long) = new java.sql.Timestamp(base + ms)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PEv]
    val gapUs = 60L * 1000000L // 1 min
    val q = PathStream.steps(input.toDS(), gapUs)
      .writeStream.format("memory").queryName("path_steps2")
      .outputMode("append").start()
    try {
      input.addData(PEv(1, ts(0), 1, "a"), PEv(2, ts(0), 2, "x"))
      q.processAllAvailable()
      // u1 returns within the gap (pairs), u2 returns far past it (no pair)
      input.addData(PEv(1, ts(30000), 3, "b"), PEv(2, ts(10 * 60000), 4, "y"))
      q.processAllAvailable()
      val got = spark.table("path_steps2")
        .select("user_id", "prev_type", "next_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set((1L, "a", "b")))
    } finally q.stop()
  }
}
