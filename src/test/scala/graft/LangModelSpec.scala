package graft

import graft.text.LangModel
import org.apache.spark.sql.functions.{col, when}

class LangModelSpec extends SparkSpecBase {
  import spark.implicits._

  test("E55: bigram NLL matches the hand-computed add-one model") {
    // corpus: "a b a", "b a", "x"  →  c2(a,b)=1 c2(b,a)=2, c1(a)=1 c1(b)=2, V=3
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "x")).toDF("doc_id", "text")
    val got = LangModel.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // p(b|a) = (1+1)/(1+3) = 1/2 → round(ln(.5)·1e4)  = −6931
    // p(a|b) = (2+1)/(2+3) = 3/5 → round(ln(.6)·1e4)  = −5108
    assert(got(1L) === ((2L, 6931L + 5108L, (6931L + 5108L) / 2L)))
    assert(got(2L) === ((1L, 5108L, 5108L)))
    assert(got(3L) === ((0L, 0L, 0L))) // <2 tokens: scored zero, still present
  }

  test("E55: repeated bigrams weight the NLL by multiplicity") {
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    // single doc: c2(a,a)=3, c1(a)=3, V=1 → p=(3+1)/(3+1)=1 → lp=0 → nll=0
    val got = LangModel.bigramNll(docs, "doc_id", "text").collect().head
    assert((got.getLong(1), got.getLong(2)) === ((3L, 0L)))
  }

  test("E55-idx: serving the training docs from the index is bit-identical to the inline score") {
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    LangModel.writeLmIndex(docs, "text", "graft_lm_test", buckets = 4)
    try {
      val inline = LangModel.bigramNll(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val served = LangModel.scoreIndexed(spark, "graft_lm_test", docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(served === inline)
      assert(inline.nonEmpty)
    } finally Seq("_lm", "_ctx", "_meta").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS graft_lm_test$sfx"))
  }

  test("E55-idx: OOV bigrams and OOV contexts score through the coalesced formula") {
    val corpus = Seq((1L, "a b")).toDF("doc_id", "text") // c2(a,b)=1 c1(a)=1 V=2
    LangModel.writeLmIndex(corpus, "text", "graft_lm_oov", buckets = 2)
    try {
      val batch = Seq((10L, "a c"), (11L, "z z")).toDF("doc_id", "text")
      val got = LangModel.scoreIndexed(spark, "graft_lm_oov", batch, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // (a,c): unseen bigram, seen ctx → (0+1)/(1+2) → round(−ln 3·1e4) = 10986
      assert(got(10L) === ((1L, 10986L)))
      // (z,z): unseen ctx → (0+1)/(0+2) → 6931
      assert(got(11L) === ((1L, 6931L)))
    } finally Seq("_lm", "_ctx", "_meta").foreach(sfx =>
      spark.sql(s"DROP TABLE IF EXISTS graft_lm_oov$sfx"))
  }

  test("E55-idx: the serve reads both index tables as bucketed scans, unshuffled before their joins") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    LangModel.writeLmIndex(docs.filter(col("doc_id") % 7 =!= 0), "text", "graft_lm_pin", 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val serve = LangModel.scoreIndexed(spark, "graft_lm_pin",
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
      val plan = serve.queryExecution.executedPlan
      def isIdx(f: FileSourceScanExec) =
        f.tableIdentifier.exists(t =>
          t.table == "graft_lm_pin_lm" || t.table == "graft_lm_pin_ctx")
      val idxScans = plan.collect { case f: FileSourceScanExec if isIdx(f) => f }
      assert(idxScans.size === 2 && idxScans.forall(_.bucketedScan),
        "both index tables must be read as bucketed scans")
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
      assert(!shuffledBeforeJoin, "an index table was shuffled before its join")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("_lm", "_ctx", "_meta").foreach(sfx =>
        spark.sql(s"DROP TABLE IF EXISTS graft_lm_pin$sfx"))
    }
  }

  test("E55-idx: a missing index refuses loudly") {
    val batch = Seq((1L, "a b")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      LangModel.scoreIndexed(spark, "graft_lm_nope", batch, "doc_id", "text")
    }
    assert(e.getMessage.contains("graft_lm_nope"))
  }

  test("E58: PMI collocations match hand-computed scores; support floor and ties hold") {
    val docs = Seq((1L, "a b a b c d")).toDF("doc_id", "text")
    // c12: (a,b)=2 (b,a)=1 (b,c)=1 (c,d)=1; N=5
    // c1f: a=2 b=2 c=1; c2f: b=2 a=1 c=1 d=1
    val strict = LangModel.collocations(docs, "text", minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // only (a,b) survives: ln(2·5/(2·2)) = ln 2.5 → 9163
    assert(strict.toSeq === Seq(("a", "b", 2L, 9163L, 1L)))
    val all = LangModel.collocations(docs, "text", minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    // (c,d): ln 5 → 16094 ranks first; the 9163 tie breaks by (w1,w2)
    assert(all.toSeq.sortBy(_._4) === Seq(
      ("c", "d", 16094L, 1L),
      ("a", "b", 9163L, 2L),
      ("b", "a", 9163L, 3L),
      ("b", "c", 9163L, 4L)))
  }

  test("E58: the k cut keeps the pmi-ordered head exactly") {
    val docs = Seq((1L, "a b a b c d")).toDF("doc_id", "text")
    val top2 = LangModel.collocations(docs, "text", minCount = 1L, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    assert(top2.toSeq.sortBy(_._3) === Seq(("c", "d", 1L), ("a", "b", 2L)))
  }

  test("E56: JSD is zero for identical sources, ln2 for disjoint, symmetric-ordered") {
    val docs = Seq(
      (1L, "s1", "a b c"), (2L, "s2", "a b c"), // identical distributions
      (3L, "s3", "x y z")) // disjoint from both
      .toDF("doc_id", "source", "text")
    val got = LangModel.jsDivergence(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    val (nU12, jsd12, bp12) = got(("s1", "s2"))
    assert(nU12 === 3L && jsd12 === 0L && bp12 === 0L)
    // disjoint: JSD = ln 2 ≈ 0.6931·10⁹ nn, up to ±1 nn per rounded term
    for (k <- Seq(("s1", "s3"), ("s2", "s3"))) {
      val (nU, jsd, bp) = got(k)
      assert(nU === 6L)
      assert(math.abs(jsd - 693147181L) <= 6L, s"jsd_nn=$jsd")
      assert(bp === jsd / 100000L)
    }
  }

  test("E56: overlapping distributions land strictly between 0 and ln2") {
    val docs = Seq((1L, "p", "a a b"), (2L, "q", "a b b")).toDF("doc_id", "source", "text")
    val Array(r) = LangModel.jsDivergence(docs, "source", "text").collect()
    val jsd = r.getLong(3)
    assert(jsd > 0L && jsd < 693147181L)
  }

  test("E56: a corpus past maxSources refuses loudly before the O(S^2) pair matrix") {
    val docs = (0 until 5).map(i => (i.toLong, s"s$i", "a b")).toDF("doc_id", "source", "text")
    val e = intercept[Exception](
      LangModel.jsDivergence(docs, "source", "text", maxSources = 3).collect())
    assert(e.getMessage.contains("maxSources"), e.getMessage)
    // at the knob exactly: still served
    assert(LangModel.jsDivergence(docs, "source", "text", maxSources = 5)
      .count() === 10L)
  }

  test("E56: the DEFAULT guard serves a 100-source corpus (r10 ADVICE)") {
    // the pre-round-16 default of 64 turned previously-working corpora
    // into execution-time failures; the guard exists for 10k-source
    // quadratic blowup, not for the common hundreds-of-sources case
    val docs = (0 until 100).map(i => (i.toLong, s"s$i", "a b"))
      .toDF("doc_id", "source", "text")
    assert(LangModel.jsDivergence(docs, "source", "text").count() === 4950L)
  }

  test("E56s: the drift monitor reproduces the pairwise matrix entry exactly") {
    val docs = graft.util.Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") % 7 < 2)
      .withColumn("source", when(col("doc_id") % 7 === 0, "ref").otherwise("live"))
    val pairwise = LangModel.jsDivergence(docs, "source", "text")
      .collect().map(r => r.toSeq.drop(2)).head // (n_union, jsd_nn, jsd_bp) for (live, ref)
    val ref = LangModel.unigramCounts(docs.filter(col("source") === "live"), "text")
    val mon = LangModel.jsDivergenceVsCounts(
      ref, docs.filter(col("source") === "ref"), "text")
      .collect().map(_.toSeq).head
    assert(mon === pairwise)
    // a batch drawn from the reference itself reads zero drift
    val self = LangModel.jsDivergenceVsCounts(
      ref, docs.filter(col("source") === "live"), "text").collect().head
    assert(self.getLong(1) === 0L && self.getLong(2) === 0L)
  }
}
