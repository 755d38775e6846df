package graft

import graft.dedup.Dedup
import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Long-chain ingest soak (VERDICT r5 #5): the steady-state loop —
  * screen → accept (appendToNgramIndex) → label (incrementalComponents)
  * → ivfAppendIndex — composed over 20 consecutive batches with a
  * mid-sequence compactNgramIndex, checking at three checkpoints that
  * the index serve, the cluster labels, and the IVF search all equal
  * from-scratch rebuilds. The pieces are individually tested elsewhere;
  * this pins the delta-over-delta / label-churn drift a year of daily
  * batches would accumulate. */
class SoakSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dims = 8
  private def embOf(id: Long): Array[Float] =
    Array.tabulate(Dims)(i => (((id * 31 + i * 17) % 23) - 11).toFloat)
  private def novelText(id: Long): String =
    (0 until 10).map(j => s"w${id}x$j").mkString(" ")

  test("N-cycle streaming crash/resume soak: all four landings equal the batch rebuild") {
    // VERDICT r13 item 6: the single kill/restart durability tests
    // (A9 / A9j / A10s / D5s) extended to N >= 5 crash/resume CYCLES at
    // randomized kill points — one randomized CDC feed cut into random
    // slices; each cycle appends a slice, drains, and STOPS (the kill);
    // the next cycle resumes from the same checkpoint. After the final
    // cycle every landing must equal its whole-feed batch oracle.
    // Scale dial: SOAK_KEYS env (suite default keeps the test tight;
    // the round-evidence leg runs SOAK_KEYS=2000 — see SURVEY notes).
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: Throwable => false },
      "duckdb JDBC driver jar not present in offline cache")
    import java.sql.{DriverManager, Timestamp}
    val rnd = new scala.util.Random(1414L)
    val nKeys = sys.env.get("SOAK_KEYS").map(_.toInt).getOrElse(40)
    val cycles = 6
    val root = java.nio.file.Files.createTempDirectory("graft-stream-soak")
    val url = s"jdbc:duckdb:$root/soak.db"
    def exec(statements: String*): Unit = {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try statements.foreach(st.execute) finally st.close()
      } finally conn.close()
    }
    def query[T](sql: String)(f: java.sql.ResultSet => T): Seq[T] = {
      val conn = DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(sql)
          val buf = Seq.newBuilder[T]
          while (rs.next()) buf += f(rs)
          buf.result()
        } finally st.close()
      } finally conn.close()
    }
    exec(
      graft.pg.Ddl.createSchema("graft_soak"),
      graft.pg.Ddl.createTable("graft_soak", "accounts",
        scala.collection.immutable.ListMap(
          "id" -> "bigint", "seq" -> "bigint", "name" -> "text",
          "ts" -> "timestamp"),
        Seq("id")),
      graft.pg.Ddl.createTable("graft_soak", "history",
        scala.collection.immutable.ListMap(
          "id" -> "bigint", "seq" -> "bigint", "name" -> "text",
          "ts" -> "timestamp", "valid_from_us" -> "bigint",
          "valid_to_us" -> "bigint", "is_current" -> "bigint"),
        Seq("id", "valid_from_us")))
    // globally ordered feed (the SCD2 feed contract: per-key event time
    // follows seq across any batch cut): seq-major interleaving, ts =
    // global position, D closes a key, later seqs may recreate it
    val perKey = (1L to nKeys.toLong).map(k => k -> (1 + rnd.nextInt(7))).toMap
    val ordered = perKey.toSeq
      .flatMap { case (k, n) => (1 to n).map(s => (k, s.toLong)) }
      .sortBy { case (k, s) => (s, k) }
      .zipWithIndex.map { case ((k, s), i) =>
        val op = if (rnd.nextInt(10) == 0) "D" else if (s == 1L) "I" else "U"
        TsChange(k, s, op, s"v-$k-$s", new Timestamp((i + 1) * 1000L))
      }
    // randomized kill points: cut the feed into `cycles` random slices
    val cuts = (Seq(0, ordered.size) ++
      Seq.fill(cycles - 1)(rnd.nextInt(ordered.size + 1))).distinct.sorted
    val slices = cuts.zip(cuts.tail).map { case (a, b) => ordered.slice(a, b) }
      .filter(_.nonEmpty)
    assert(slices.size >= 5, s"degenerate cut: ${slices.size} slices")
    val (srcDir, land) = (s"$root/src", s"$root/land")
    val ckpts = (1 to 4).map(i => s"$root/ckpt$i")
    val feedSchema = org.apache.spark.sql.Encoders.product[TsChange].schema
    def cycleOnce(slice: Seq[TsChange]): Unit = {
      slice.toDF().write.mode("append").parquet(srcDir)
      def changes = spark.readStream.schema(feedSchema).parquet(srcDir)
      // A9: file landing (update-mode LWW state -> parquet appends)
      val qFile = graft.streaming.CdcStream
        .latestStateRows(changes, Seq("id"), "seq", "Op")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpts(0))
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(s"$land/file")
        }.start()
      // A9j: JDBC latest-state landing
      val qJdbc = graft.streaming.JdbcLanding.start(
        graft.streaming.CdcStream.latestStateRows(changes, Seq("id"), "seq", "Op"),
        Seq("id"), "Op", url, "graft_soak", "accounts", "", "",
        ckpts(1), batchSize = 16, maxConnections = 1)
      // A10s: SCD2 history landing
      val qScd2 = graft.streaming.Scd2Landing.start(
        changes, Seq("id"), Seq(col("seq")), col("ts"), "Op",
        url, "graft_soak", "history", "", "", ckpts(2),
        batchSize = 16, maxConnections = 1)
      // D5s: versioned rollup landing (count/sum over the raw feed)
      val qRoll = graft.streaming.RollupLanding.start(
        spark, srcDir, feedSchema, identity, Seq("Op"),
        Seq(graft.operators.Rollup.Spec("n", lit(1L), graft.operators.Rollup.Count),
          graft.operators.Rollup.Spec("sq", col("seq"), graft.operators.Rollup.Sum)),
        s"$land/rollup", ckpts(3))
      try {
        qFile.processAllAvailable(); qJdbc.processAllAvailable()
        qScd2.processAllAvailable(); qRoll.awaitTermination()
      } finally Seq(qFile, qJdbc, qScd2).foreach(_.stop()) // the kill
    }
    slices.foreach(cycleOnce)

    // ---- final state vs whole-feed batch oracles, per landing ----
    val all = ordered.toDF()
    // A9: LWW read over the appended lake
    val fileLanded = spark.read.parquet(s"$land/file")
      .groupBy("id").agg(max(struct($"seq", $"Op", $"name")).as("w"))
      .filter($"w.Op" =!= "D")
      .select($"id", $"w.seq".as("seq"), $"w.name".as("name"))
      .as[(Long, Long, String)].collect().toSet
    val latestOracle = graft.cdc.CdcApply.latestState(all, Seq("id"), Seq(col("seq")))
      .select($"id", $"seq", $"name").as[(Long, Long, String)].collect().toSet
    assert(fileLanded == latestOracle, "A9 file landing diverged after the soak")
    // A9j: the landed JDBC table
    val jdbcLanded = query(
      "SELECT id, seq, name FROM graft_soak.accounts")(rs =>
      (rs.getLong(1), rs.getLong(2), rs.getString(3))).toSet
    assert(jdbcLanded == latestOracle, "A9j JDBC landing diverged after the soak")
    // A10s: the landed history
    val histLanded = query(
      "SELECT id, seq, name, valid_from_us, valid_to_us, is_current FROM graft_soak.history") {
      rs =>
        val vto = rs.getLong(5)
        val vtoOpt = if (rs.wasNull()) None else Some(vto) // before further reads
        (rs.getLong(1), rs.getLong(2), rs.getString(3), rs.getLong(4),
          vtoOpt, rs.getLong(6))
    }.toSet
    val histOracle = graft.cdc.CdcApply.scd2History(
        all, Seq("id"), Seq(col("seq")), col("ts"))
      .select($"id", $"seq", $"name", $"valid_from_us", $"valid_to_us", $"is_current")
      .as[(Long, Long, String, Long, Option[Long], Long)].collect().toSet
    assert(histLanded == histOracle, "A10s SCD2 landing diverged after the soak")
    // D5s: the landed rollup
    val rollLanded = graft.streaming.RollupLanding.read(spark, s"$land/rollup").get
      .select($"Op", $"n", $"sq").as[(String, Long, Option[Long])].collect().toSet
    val rollOracle = graft.operators.Rollup.build(all, Seq("Op"),
        Seq(graft.operators.Rollup.Spec("n", lit(1L), graft.operators.Rollup.Count),
          graft.operators.Rollup.Spec("sq", col("seq"), graft.operators.Rollup.Sum)))
      .select($"Op", $"n", $"sq").as[(String, Long, Option[Long])].collect().toSet
    assert(rollLanded == rollOracle, "D5s rollup landing diverged after the soak")
    assert(histOracle.size > nKeys, "soak must build real multi-version history")
  }

  test("20-batch ingest soak: serve, labels, and IVF equal from-scratch rebuilds") {
    val corpus = (1L to 8L).map(id => (id, novelText(id))).toDF("doc_id", "text")
    val corpusDocs = (1L to 8L).map(id => id -> novelText(id))
    val dir = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val idxPath = s"$dir/ivf"
    Dedup.writeNgramIndex(corpus, "doc_id", "text", "graft_soak_idx", buckets = 4)
    val centroids = Knn.ivfTrain(
      corpusDocs.map { case (id, _) => (id, embOf(id)) }.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3, iters = 4, dims = Dims).cache()
    Knn.ivfWriteIndex(
      corpusDocs.map { case (id, _) => (id, embOf(id)) }.toDF("vec_id", "embedding"),
      centroids, "vec_id", "embedding", Dims, idxPath)

    var labels = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      corpus.select(col("doc_id").as("id")))
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val allPairs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val allIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rnd = new scala.util.Random(424242)

    def checkpoint(tag: String): Unit = {
      // probe batch: one echo of an already-ingested doc + one novel doc
      val pool = corpusDocs ++ accepted
      val echo = pool(rnd.nextInt(pool.size))._2
      val probe = Seq((9001L, echo), (9002L, novelText(9002L))).toDF("doc_id", "text")
      val servedLive = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_soak_idx", probe, "doc_id", "text", tauBp = 6000)
        .collect().map(_.toSeq).toSet
      Dedup.writeNgramIndex(
        (corpusDocs ++ accepted).toDF("doc_id", "text"),
        "doc_id", "text", "graft_soak_ref", buckets = 4)
      val servedRebuilt = Dedup.incrementalNgramPairsIndexed(
        spark, "graft_soak_ref", probe, "doc_id", "text", tauBp = 6000)
        .collect().map(_.toSeq).toSet
      assert(servedLive == servedRebuilt,
        s"$tag: appended/compacted index serve diverged from a fresh rebuild")
      assert(servedLive.exists(_.head == 9001L), s"$tag: the echoed probe must surface")

      val incLabels = labels.as[(Long, Long)].collect().toMap
      val fullLabels = Dedup.connectedComponents(
        allPairs.toSeq.toDF("id_a", "id_b"),
        (1L to 8L).toDF("id").unionByName(allIds.toSeq.toDF("id")))
        .as[(Long, Long)].collect().toMap
      assert(incLabels == fullLabels,
        s"$tag: incrementally maintained labels diverged from a full recompute")

      val queries = (9001L to 9003L).map(id => (id, embOf(id))).toDF("vec_id", "embedding")
      def searchOf(path: String) = Knn.ivfSearchIndex(
        spark, path, centroids, queries, "vec_id", "embedding",
        k = 5, dims = Dims, nprobe = 2).collect().map(_.toSeq).toSet
      val refPath = s"$dir/ivf_ref_$tag"
      Knn.ivfWriteIndex(
        (corpusDocs.map(_._1) ++ accepted.map(_._1))
          .map(id => (id, embOf(id))).toDF("vec_id", "embedding"),
        centroids, "vec_id", "embedding", Dims, refPath)
      assert(searchOf(idxPath) == searchOf(refPath),
        s"$tag: appended IVF index search diverged from a fresh rebuild")
    }

    try {
      for (b <- 1 to 20) {
        val docs: Seq[(Long, String)] = (0 until 4).map { i =>
          val id = 100L + b * 10 + i
          val roll = rnd.nextDouble()
          val pool = corpusDocs ++ accepted
          if (roll < 0.45) (id, pool(rnd.nextInt(pool.size))._2) // dup of something ingested
          else (id, novelText(id))
        }
        val batch = docs.toDF("doc_id", "text")
        val pairs = Dedup.incrementalNgramPairsIndexed(
          spark, "graft_soak_idx", batch, "doc_id", "text", tauBp = 6000)
          .select(col("batch_id"), col("corpus_id")).cache()
        val dup = pairs.select(col("batch_id").as("doc_id")).distinct()
        val survivors = batch.join(dup, Seq("doc_id"), "left_anti")
          .as[(Long, String)].collect().toSeq
        if (survivors.nonEmpty) {
          Dedup.appendToNgramIndex(
            survivors.toDF("doc_id", "text"), "doc_id", "text", "graft_soak_idx")
          Knn.ivfAppendIndex(
            survivors.map { case (id, _) => (id, embOf(id)) }.toDF("vec_id", "embedding"),
            centroids, "vec_id", "embedding", Dims, idxPath)
        }
        labels = Dedup.incrementalComponents(
          labels,
          pairs.select(col("batch_id").as("id_a"), col("corpus_id").as("id_b")),
          batch.select(col("doc_id").as("id")))
        // labels is consumed repeatedly (next batch + checkpoints); pin the
        // rows so the lineage doesn't re-run the whole history each time
        labels = labels.localCheckpoint()
        allPairs ++= pairs.as[(Long, Long)].collect()
        allIds ++= docs.map(_._1)
        accepted ++= survivors
        pairs.unpersist()
        if (b == 10) Dedup.compactNgramIndex(spark, "graft_soak_idx")
        if (b == 7 || b == 14 || b == 20) checkpoint(s"batch $b")
      }
      assert(accepted.size >= 20, "the soak must actually accept a meaningful doc stream")
      assert(allPairs.nonEmpty, "the soak must actually observe duplicates")
    } finally {
      Seq("graft_soak_idx", "graft_soak_ref").foreach { n =>
        Seq("postings", "sizes", "meta", "postings_delta", "sizes_delta",
          "postings_delta_folding", "sizes_delta_folding")
          .foreach(s => spark.sql(s"DROP TABLE IF EXISTS ${n}_$s"))
      }
    }
  }
}
