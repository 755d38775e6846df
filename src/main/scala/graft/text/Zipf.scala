package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E65: ZIPF-EXPONENT fit per corpus slice — the distribution-health
  * signal for text collections: natural language lands near exponent 1;
  * templated/boilerplate-heavy slices flatten (s « 1, the head is not
  * dominant enough) and near-duplicate-flooded slices steepen — a rank
  * check on what the dedup/quality family should have caught, per
  * source, in one number.
  *
  * Method: rank the top-N terms per group (count desc, token asc — the
  * deterministic tie rule), map each to the integer point
  * `(⌊ln r·10⁴⌋, ⌊ln f·10⁴⌋)` — the E55 discipline: every transcendental
  * collapses to an integer per TERM, before any aggregate, on a double
  * both engines compute from the same exact integers — then fit the
  * log-log line with the D18 power sums in DECIMAL(38,0). The fitted
  * slope is dimensionless (both axes share the 10⁴ scale), surfaced as
  * `zipf_e4` = −slope·10⁴ (positive for Zipfian decay, sign split from
  * the division so truncating `div` ≡ flooring `//`), with `r2_bp`
  * computed in doubles FROM the exact sums (the D18 finish). Output is
  * hash-exact across engines despite two nested transcendentals.
  *
  * Plan: one map-side-combined (group, token) count — the only
  * event-sized exchange — then a window over each group's vocabulary
  * frame capped to topN rows out, then one tiny power-sum aggregate.
  */
object Zipf {

  /** @param topN head size to fit on (the tail is count-quantized —
    *             ln of small integers steps — and off-law by nature) */
  def fit(
      docs: DataFrame,
      groupCols: Seq[String],
      textCol: Column,
      topN: Int = 256): DataFrame = {
    require(groupCols.nonEmpty, "Zipf.fit: at least one group column")
    require(topN >= 3, s"Zipf.fit: need topN >= 3 points, got $topN")
    val dec = "decimal(38,0)"
    val counts = docs
      .select(groupCols.map(col) :+ explode(TextOps.tokens(textCol)).as("__tok"): _*)
      .filter(col("__tok") =!= "")
      .groupBy(groupCols.map(col) :+ col("__tok"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__c").desc, col("__tok").asc)
    val pts = counts
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topN)
      .select(groupCols.map(col) ++ Seq(
        floor(log(col("__r").cast("double")) * lit(10000.0)).cast(dec).as("__x"),
        floor(log(col("__c").cast("double")) * lit(10000.0)).cast(dec).as("__y")): _*)
    pts
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__dx", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__dy", col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .select(
        groupCols.map(col) ++ Seq(
          col("__n").cast("long").as("n_terms"),
          // zipf = −slope; slope = num/dx, both axes already ×10⁴ so the
          // ratio is dimensionless; ×10⁴ again for 4-decimal fixed point
          when(col("__dx") > 0,
            when(col("__num") > 0, lit(-1L)).otherwise(lit(1L)) *
              expr("10000 * abs(__num) div __dx"))
            .otherwise(lit(null).cast("long")).as("zipf_e4"),
          when(col("__dx") > 0 && col("__dy") > 0,
            floor(col("__num").cast("double") * col("__num").cast("double") *
              lit(10000.0) /
              (col("__dx").cast("double") * col("__dy").cast("double")))
              .cast("long"))
            .otherwise(lit(null).cast("long")).as("r2_bp")): _*)
  }
}
