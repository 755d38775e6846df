package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based corpus classification — the trainable half of quality/
  * language filtering in an LLM data pipeline (the role fastText's
  * supervised classifier plays in CCNet/RefinedWeb-style curation),
  * re-expressed as exact-integer Spark aggregations so the learned
  * model and every prediction oracle-check bit-for-bit.
  *
  * Model: a CONTRASTIVE centroid (Rocchio with negative feedback)
  * classifier over character n-gram counts. Training collapses the
  * labeled corpus to per-class n-gram frequencies — one map-side-
  * combined aggregation, the only corpus-scale pass — normalized to
  * integer parts-per-million by floor division (`(cnt * 1e6) div
  * total(class)`, class-size-bias-free), then CENTERED per gram:
  * `w(g,c) = C·ppm(g,c) − Σ_c' ppm(g,c')` (C = number of classes, a
  * vocab-sized window — never corpus-sized). Centering is what makes
  * the weights discriminative: a gram equally frequent in every class
  * scores exactly 0 everywhere, so corpus-wide boilerplate cannot
  * drown the class signal the way raw centroid dot products do (the
  * naive variant measured 12% on a 5-class task this formulation
  * takes to 100%). All integer, no float anywhere.
  * Serving explodes each doc into n-gram term frequencies,
  * joins the (vocabulary-sized, broadcast) weight table, and scores
  * `Σ tf·w` per class — an exact Long. Ties break to the
  * lexicographically smallest class via max-then-min (never a float,
  * never an engine-dependent argmax).
  *
  * Character n-grams rather than word tokens: they need no
  * language-aware tokenization (zh text has no [a-z0-9] words at all)
  * and are the classic language-ID feature set (Cavnar & Trenkle 1994).
  *
  * Scale shape: train = explode + one groupBy((class, gram)) with
  * partial aggregation — shuffle is vocabulary-mass, not corpus-mass;
  * predict = one groupBy((id, gram)) for tf (doc-local mass), a
  * BROADCAST join against the weight table, one groupBy((id, class)),
  * then two doc-keyed aggregations for the exact argmax. No corpus-
  * sized sort, no window over the whole table, no UDF.
  *
  * Reference scope note: the reference engine has no model surface;
  * this extends the mandated LLM-pipeline family (SURVEY §2 E).
  */
object Classifier {

  /** A trained model: the weight table plus the n-gram order it was
    * trained with — the two must travel together (scoring with a
    * mismatched order silently matches nothing). */
  final case class CentroidModel(weights: DataFrame, n: Int)

  /** Persist a trained model: weight table + a one-row meta record
    * (the Bpe/Pca learned-artifact pattern). */
  def save(
      spark: org.apache.spark.sql.SparkSession,
      model: CentroidModel, path: String): Unit = {
    import spark.implicits._
    model.weights.select("cls", "gram", "w_ppm")
      .write.mode("overwrite").parquet(s"$path/weights.parquet")
    Seq(model.n).toDF("n").write.mode("overwrite").parquet(s"$path/meta.parquet")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): CentroidModel =
    CentroidModel(
      spark.read.parquet(s"$path/weights.parquet").select("cls", "gram", "w_ppm"),
      spark.read.parquet(s"$path/meta.parquet").head().getInt(0))

  /** All n-char windows of `lower(c)`, 1-based; empty if too short. */
  private[text] def grams(c: Column, n: Int): Column = {
    val t = lower(c)
    transform(
      when(length(t) >= n, sequence(lit(1), length(t) - (n - 1)))
        .otherwise(array().cast("array<int>")),
      i => t.substr(i, lit(n)))
  }

  /** Learn contrastive centroid weights: one row per (class, gram) with
    * `w_ppm = C·ppm(g,c) − Σ_c' ppm(g,c')` where
    * `ppm = (count(gram in class) * scale) div total_grams(class)`.
    * Output columns: `cls`, `gram`, `w_ppm`.
    *
    * `minCount` is the open-vocabulary bound: grams whose CORPUS-WIDE
    * count (summed over classes) is below it are dropped from the
    * weight table. On real data the distinct-gram count grows with the
    * corpus (Zipf tail: most grams occur a handful of times) while the
    * class signal lives in the frequent grams — the floor keeps the
    * broadcast table bounded by the corpus's FREQUENT vocabulary
    * instead of its document count. Class totals (`tot`) and the class
    * count C are computed BEFORE the floor, so ppm normalization is
    * unchanged and `minCount = 1` reproduces the unfloored table
    * bit-for-bit. The filter rides the same vocab-sized frame the
    * centering window already shuffles — no extra corpus pass. */
  def trainCentroid(
      docs: DataFrame, classCol: String, textCol: String,
      n: Int = 2, scale: Long = 1000000L, minCount: Long = 1L): DataFrame = {
    require(n >= 1, s"Classifier.trainCentroid: n must be >= 1, got $n")
    require(minCount >= 1, s"Classifier.trainCentroid: minCount must be >= 1, got $minCount")
    // explode positions THEN substring (the Passage.windowsOf shape):
    // whole-stage codegen fuses Generate + Project + partial HashAggregate,
    // so no per-doc ARRAY of window strings is ever materialized — the
    // `explode(grams(...))` form built that array per doc first, and the
    // array materialization dominated the training pass (the corpus-scale
    // leg of the classifier lifecycle). Row-identical to grams(): same
    // lowercase-then-length guard, same 1-based windows.
    val counts = docs
      .select(col(classCol).as("cls"), lower(col(textCol)).as("__t"))
      .filter(length(col("__t")) >= n)
      .select(col("cls"),
        explode(sequence(lit(1), length(col("__t")) - (n - 1))).as("__i"),
        col("__t"))
      .select(col("cls"), col("__t").substr(col("__i"), lit(n)).as("gram"))
      .groupBy("cls", "gram")
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("cls").agg(sum(col("cnt")).as("tot"))
    // `div` (integral division) keeps the normalization exact-Long;
    // `/` would detour through doubles and lose exactness past 2^53
    val ppm = counts.join(totals, "cls")
      .select(col("cls"), col("gram"), col("cnt"),
        expr(s"(cnt * ${scale}L) div tot").as("p"))
    val nCls = totals.agg(count(lit(1)).as("c"))
    // the floor's gram-total rides the SAME window pass as the
    // centering sum (identical partition spec → one Window exec, one
    // exchange+sort — a separate pre-filter window measured 2.4× on the
    // sf10 training leg). The floor drops whole GRAMS, never individual
    // (cls, gram) rows, so centering over the filtered frame equals
    // centering over the full frame for every survivor — filtering
    // after the window is exactly equivalent and costs nothing.
    val w = Window.partitionBy("gram")
    val centered = ppm.crossJoin(broadcast(nCls))
      .withColumn("w_ppm", col("c") * col("p") - sum(col("p")).over(w))
    (if (minCount <= 1L) centered
     else centered
       .withColumn("__gtot", sum(col("cnt")).over(w))
       .filter(col("__gtot") >= minCount))
      .select("cls", "gram", "w_ppm")
  }

  /** Score docs against a learned weight table and predict the argmax
    * class (max score, ties to the smallest class name; docs matching
    * no trained gram fall back to the smallest class with score 0).
    * Output: (`idCol`, `pred`). */
  def predictCentroid(
      docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, n: Int = 2): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(grams(col(textCol), n)).as("gram"))
      .groupBy("id", "gram")
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(broadcast(weights.select(col("gram"), col("cls"), col("w_ppm"))), "gram")
      .groupBy("id", "cls")
      .agg(sum(col("tf") * col("w_ppm")).as("score"))
    // exact argmax in ONE pass over the (doc × class)-sized scored set:
    // a doc-partitioned window max (classes per doc are a handful of
    // rows), then min(cls) among the achievers — the agg-then-self-join
    // shape would re-execute the whole scoring subtree for the max leg
    val pred = scored
      .withColumn("best", max(col("score")).over(Window.partitionBy("id")))
      .filter(col("score") === col("best"))
      .groupBy("id")
      .agg(min(col("cls")).as("pred"))
    // deterministic fallback for docs with zero trained grams
    val fallback = weights.agg(min(col("cls")).as("fb"))
    docs.select(col(idCol).as("id"))
      .join(pred, Seq("id"), "left")
      .crossJoin(broadcast(fallback))
      .select(col("id").as(idCol), coalesce(col("pred"), col("fb")).as("pred"))
  }

  /** Hard cap on the serialized fold model riding the plan (weights +
    * masks + gram strings). Above it the one-scan fold stops being "the
    * same mass the broadcast join ships" and starts bloating every task
    * binary silently — [[predictCentroidFold]] falls back to the
    * parity-pinned broadcast-join path instead, and [[foldModel]]
    * refuses loudly. 64 MB mirrors Spark's own broadcast-size warnings;
    * a minCount-floored model is 3-4 orders of magnitude under it. */
  val FoldModelMaxBytes: Long = 64L << 20

  /** One cheap vocab-sized aggregate estimating the fold model's
    * plan-shipped footprint WITHOUT collecting it: distinct classes and
    * the dominant byte terms (per-gram weight row of C longs + mask +
    * the gram string twice — array + hash index). */
  def foldModelStats(weights: DataFrame): (Long, Long) = {
    val r = weights.agg(
      countDistinct(col("cls")).as("c"),
      countDistinct(col("gram")).as("g"),
      sum(octet_length(col("gram"))).as("gb")).head()
    val c = r.getLong(0)
    val g = r.getLong(1)
    val gramBytes = if (r.isNullAt(2)) 0L else r.getLong(2)
    (c, g * (c * 8L + 8L + 48L) + gramBytes * 2L + c * 64L)
  }

  /** Build the plan-shipped fold model from a trained weight table.
    *
    * The collect is VOCAB-sized, never corpus-sized — the exact row set
    * `predictCentroid` broadcasts to every executor anyway (bounded by
    * the minCount floor; measured saturating 2030→9897 rows over a 100×
    * corpus decade). Classes are sorted in UTF8-binary order so index 0
    * is the fallback/tie-break class, matching the join path's
    * `min(cls)` exactly.
    *
    * Caps, both loud: ≤ 64 classes (the competing-class bitmask is one
    * Long) and ≤ [[FoldModelMaxBytes]] plan footprint — an
    * open-vocabulary model (minCount=1 on a big corpus) must use
    * [[predictCentroid]], which broadcasts per-query instead of
    * serializing into every task binary. [[predictCentroidFold]] makes
    * that fallback automatically. */
  def foldModel(
      weights: DataFrame, n: Int,
      maxBytes: Long = FoldModelMaxBytes): graft.functions.CentroidFoldModel = {
    val rows = weights.select("cls", "gram", "w_ppm").collect()
    locally {
      val classes = rows.iterator.map(_.getString(0)).toSet.size.toLong
      val grams = rows.iterator.map(_.getString(1)).toSet
      val bytes = grams.size.toLong * (classes * 8L + 8L + 48L) +
        grams.iterator.map(_.getBytes("UTF-8").length.toLong).sum * 2L
      require(bytes <= maxBytes,
        s"Classifier.foldModel: model would ship ~$bytes bytes in the plan " +
          s"(cap $maxBytes) — open vocabulary? Train with a minCount " +
          "floor, or serve via predictCentroid (the broadcast-join path)")
    }
    val classes = rows.iterator.map(_.getString(0)).toArray.distinct
      .sortWith((a, b) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0)
    val clsIdx = classes.zipWithIndex.toMap
    val grams = rows.iterator.map(_.getString(1)).toArray.distinct
    val gramIdx = grams.zipWithIndex.toMap
    val w = Array.fill(grams.length)(new Array[Long](classes.length))
    val masks = new Array[Long](grams.length)
    rows.foreach { r =>
      val gi = gramIdx(r.getString(1))
      val ci = clsIdx(r.getString(0))
      w(gi)(ci) = r.getLong(2)
      masks(gi) |= 1L << ci
    }
    graft.functions.CentroidFoldModel(n, classes, grams, w, masks)
  }

  /** The fold serve path as a composable Column: pred for `textCol`
    * under `weights`, computed in one codegen'd pass with NO explode,
    * join, shuffle, or window — see [[graft.functions.CentroidPredict]]
    * for the exact-equivalence argument (property-pinned vs
    * [[predictCentroid]] in ClassifierSpec). Carries [[foldModel]]'s
    * caps (≤ 64 classes, ≤ [[FoldModelMaxBytes]] plan footprint) — a
    * Column can't fall back to a join, so past the caps this THROWS;
    * use [[predictCentroidFold]] for the automatic fallback. */
  def centroidPredictColumn(
      weights: DataFrame, textCol: Column, n: Int = 2,
      maxModelBytes: Long = FoldModelMaxBytes): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.CentroidPredict(
        org.apache.spark.sql.GraftBridge.expression(textCol),
        foldModel(weights, n, maxModelBytes)))

  /** Drop-in fold-path twin of [[predictCentroid]]: same (idCol, pred)
    * output, one corpus scan instead of explode + two shuffles.
    *
    * Auto-fallback: when the trained model exceeds the fold caps
    * (> 64 classes — the bitmask is one Long — or >
    * [[FoldModelMaxBytes]] estimated plan footprint), serves via the
    * bit-identical [[predictCentroid]] broadcast-join path instead,
    * with a stderr notice. The pre-check is one vocab-sized aggregate
    * ([[foldModelStats]]), never a corpus pass. */
  def predictCentroidFold(
      docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, n: Int = 2,
      maxModelBytes: Long = FoldModelMaxBytes): DataFrame = {
    val (classes, bytes) = foldModelStats(weights)
    if (classes > 64 || bytes > maxModelBytes) {
      System.err.println(
        s"[graft] predictCentroidFold: model outside fold caps " +
          s"($classes classes, ~$bytes bytes vs 64 / $maxModelBytes) — " +
          "serving via the broadcast-join path (predictCentroid)")
      predictCentroid(docs, idCol, textCol, weights, n)
    } else
      docs.select(col(idCol),
        centroidPredictColumn(weights, col(textCol), n, maxModelBytes).as("pred"))
  }
}
