package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E64: PSI (population stability index) drift between two snapshots of
  * a table, per numeric column — the feature-monitoring standard next to
  * the token-distribution JSD (E56): PSI = Σ_i (p_i − q_i)·ln(p_i/q_i)
  * over a fixed bucketing, read as "how far has the CURRENT distribution
  * moved from the REFERENCE" (rule of thumb: <0.1 stable, >0.25 shifted).
  * The reference's validate answers "are the rows equal"; PSI answers
  * "has the population drifted" even when every row is individually
  * valid.
  *
  * Bucketing: `buckets` equi-width bins over the REFERENCE's own
  * [min, max] (one tiny agg, broadcast as a scalar row); current values
  * outside the reference range clamp into the edge bins — out-of-range
  * mass is exactly the drift signal, never dropped. Both engines compute
  * the same double expression for the bin id, so bin assignment is
  * deterministic and identical.
  *
  * Exactness (the E55 integer-nats discipline): counts get Laplace +1
  * per bin (so every ln argument is positive and finite), and each
  * bin's ln collapses to an INTEGER — l_i = ⌊ln((a_i·B)/(b_i·A))·10⁴⌋
  * on the identical double quotient both engines form — BEFORE any sum;
  * the bin term s_i·l_i (s_i = a_i·B − b_i·A, DECIMAL(38,0)/HUGEINT) is
  * always non-negative (s and ln share sign), so the integer sum is
  * order-free and the final `psi_e4 = Σ s_i·l_i div (A·B)` is a
  * truncation of a non-negative quantity — hash-exact across engines,
  * despite PSI being a transcendental statistic.
  *
  * Plan: per column, two map-side-combined bin-count aggregates (the
  * shuffle carries ≤ `buckets` rows), a static bin spine, and scalar
  * broadcasts — nothing event-sized ever joins. One pass per requested
  * column, mirroring TableProfile's per-column loop.
  *
  * Degenerate reference (constant or all-null column): equi-width bins
  * are undefined, so that column's `psi_e4` is NULL — never a silent 0,
  * and never a job-killing error that would take the other columns of a
  * profile run down with it.
  */
object PsiDrift {

  def psi(
      ref: DataFrame,
      cur: DataFrame,
      cols: Seq[String],
      buckets: Int = 10): DataFrame = {
    require(cols.nonEmpty, "PsiDrift: at least one column")
    require(buckets >= 2, s"PsiDrift: need >= 2 buckets, got $buckets")
    cols.foreach { c =>
      require(ref.columns.contains(c), s"PsiDrift: reference lacks column '$c'")
      require(cur.columns.contains(c), s"PsiDrift: current lacks column '$c'")
    }
    val spark = ref.sparkSession
    import spark.implicits._

    val perCol = cols.map { c =>
      val stats = ref.agg(
        min(col(c).cast("double")).as("__mn"),
        max(col(c).cast("double")).as("__mx"))
      def binned(df: DataFrame) = df
        .select(col(c).cast("double").as("__x")).where(col("__x").isNotNull)
        .join(broadcast(stats))
        .select(
          // a constant (or all-null) reference has no bin geometry at
          // all: every current value lands in bin 0 and a population
          // that moved entirely away would read PSI ≈ 0 — drift
          // structurally invisible in exactly the degenerate case.
          // Pre-round-16 this raise_error'd, which killed EVERY other
          // column of a multi-column profile run over one legitimately
          // constant flag column (r10 ADVICE). Now the degenerate
          // column computes through bin 0 and the final select nulls
          // its psi_e4 — NULL is the per-column "no bin geometry"
          // signal; the other columns' results survive.
          when(col("__mx").isNull || col("__mx") === col("__mn"), lit(0L))
            .otherwise(least(lit(buckets - 1L), greatest(lit(0L),
              floor((col("__x") - col("__mn")) * lit(buckets.toDouble) /
                (col("__mx") - col("__mn"))))))
            .as("__bin"))
        .groupBy("__bin").agg(count(lit(1)).as("__c"))
      val spine = spark.range(buckets).select(col("id").as("__bin"))
      val joined = spine
        .join(binned(ref).withColumnRenamed("__c", "__a"), Seq("__bin"), "left")
        .join(binned(cur).withColumnRenamed("__c", "__b"), Seq("__bin"), "left")
        .select(col("__bin"),
          (coalesce(col("__a"), lit(0L)) + 1L).as("__a"), // Laplace +1
          (coalesce(col("__b"), lit(0L)) + 1L).as("__b"))
        .localCheckpoint() // feeds the totals AND the term sum
      // the totals are ONE row (the checkpointed bin spine is `buckets`
      // rows) — pull them down as literals; a joined-with-its-own-agg
      // self-join would collide attribute ids through the checkpoint
      val trow = joined.agg(sum("__a"), sum("__b")).head()
      val (ta, tb) = (trow.getLong(0), trow.getLong(1))
      val dec = "decimal(38,0)"
      joined
        // products in DECIMAL first — a long×long product of two corpus
        // counts wraps silently; the decimal is exact and its double
        // image matches DuckDB's HUGEINT→DOUBLE cast bit-for-bit
        .withColumn("__ab", col("__a").cast(dec) * lit(tb).cast(dec))
        .withColumn("__ba", col("__b").cast(dec) * lit(ta).cast(dec))
        .withColumn("__l", // integer nats×10⁴ per bin, BEFORE any sum
          floor(log(col("__ab").cast("double") / col("__ba").cast("double"))
            * lit(10000.0)).cast(dec))
        .withColumn("__s", col("__ab") - col("__ba"))
        .agg(sum(col("__s") * col("__l")).as("__t"))
        .crossJoin(broadcast(stats)) // 1 row × 1 row: the degeneracy probe
        .select(
          lit(c).as("col_name"),
          when(col("__mx").isNull || col("__mx") === col("__mn"),
            lit(null).cast("long"))
            .otherwise(
              expr(s"__t div (CAST(${ta}L AS DECIMAL(38,0)) * CAST(${tb}L AS DECIMAL(38,0)))"))
            .as("psi_e4"),
          lit(ta - buckets).as("n_ref"),
          lit(tb - buckets).as("n_cur"))
    }
    perCol.reduce(_ unionByName _)
  }
}
