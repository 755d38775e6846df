package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E62: SURVIVORSHIP — the golden-record merge that finishes an entity-
  * resolution chain: after blocking ([[graft.operators.FuzzyJoin]] /
  * [[Dedup]] near-dup pairs) and clustering ([[Dedup.connectedComponents]])
  * decide WHICH field values the one surviving record carries. Where
  * [[Dedup.canonicalPerComponent]] elects one whole ROW per cluster, this
  * merges FIELD-WISE under per-column rules — the master-data-management
  * read (most-frequent segment, highest balance, latest non-null email)
  * that no single member row answers.
  *
  * The reference resolves key collisions row-at-a-time by feed order
  * (postgres_operator_impl.rs:300-404, last writer wins whole-row); a
  * column-granular, frequency-aware merge is the batch generalization it
  * has no primitive for.
  *
  * Rules — all deterministic, all engine-portable (no "first seen" /
  * arbitrary-row semantics anywhere):
  *  - [[ModeRule]]: most frequent value, ties to the SMALLEST value (count
  *    desc, value asc — value order taken on the STRING image the melt
  *    flows through, which is the natural order for the categorical
  *    columns Mode is for) — nulls don't vote;
  *  - [[MaxRule]] / [[MinRule]]: extremal value;
  *  - [[LatestRule]]: value riding the largest order key (`max_by`), ties
  *    to the largest value — set the order unique (the scd2 ordering
  *    contract) if ties matter.
  *
  * Plan, sized for a 100 TB corpus where clusters are small but many:
  * extremal/latest rules ride ONE map-side-combined hash aggregation by
  * cluster (shuffle ≈ one candidate row per cluster per input partition).
  * Mode rules need per-(cluster, value) counts first, which a single
  * aggregation cannot see; all mode columns share ONE melted pass —
  * `(cluster, field, value)` counts → per-(cluster, field) argmax
  * (`min_by` over (−count, value), the tie order above) → one
  * `map_from_entries` fold back to a row per cluster — two exchanges
  * total regardless of how many columns use Mode, with state bounded by
  * a cluster's own distinct values (the skew argument: a hot VALUE
  * collapses map-side; a hot CLUSTER pays only its own distinct count).
  * The final cluster-keyed join of the two branches is exchange-aligned
  * (both sides hash-partitioned by cluster). Mode values melt through a
  * string image (`map` needs one value type); the declared field type is
  * restored with a cast on the way out.
  */
object Survivorship {

  sealed trait Rule
  /** Most frequent non-null value; ties broken to the smallest value. */
  case object ModeRule extends Rule
  case object MaxRule extends Rule
  case object MinRule extends Rule
  /** Value carried by the row with the greatest `order` (nulls lose). */
  final case class LatestRule(order: Column) extends Rule

  /** One golden row per cluster: the cluster column, `n_members`, and one
    * column per rule entry (keeping its input name). */
  def goldenRecord(
      records: DataFrame,
      clusterCol: String,
      rules: Seq[(String, Rule)]): DataFrame = {
    require(rules.nonEmpty, "Survivorship.goldenRecord: at least one rule")
    require(records.columns.contains(clusterCol),
      s"Survivorship.goldenRecord: no cluster column '$clusterCol'")
    val missing = rules.map(_._1).filterNot(records.columns.contains)
    require(missing.isEmpty,
      s"Survivorship.goldenRecord: rule column(s) not in input: ${missing.mkString(", ")}")
    val dup = rules.map(_._1).diff(rules.map(_._1).distinct)
    require(dup.isEmpty,
      s"Survivorship.goldenRecord: duplicate rule for column(s) ${dup.mkString(", ")}")

    val modeCols = rules.collect { case (c, ModeRule) => c }
    val aggExprs = rules.collect[Column] {
      case (c, MaxRule) => max(col(c)).as(c)
      case (c, MinRule) => min(col(c)).as(c)
      case (c, LatestRule(ord)) => max_by(col(c), ord).as(c)
    } :+ count(lit(1)).as("n_members")
    val base = records.groupBy(col(clusterCol)).agg(aggExprs.head, aggExprs.tail: _*)

    if (modeCols.isEmpty) base
    else {
      val melted = records
        .select(col(clusterCol),
          explode(map(modeCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*))
            .as(Seq("__field", "__value")))
        .filter(col("__value").isNotNull)
        .groupBy(col(clusterCol), col("__field"), col("__value"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col(clusterCol), col("__field"))
        .agg(min_by(col("__value"), struct(-col("__n"), col("__value"))).as("__win"))
        .groupBy(col(clusterCol))
        .agg(map_from_entries(collect_list(struct(col("__field"), col("__win"))))
          .as("__modes"))
      val restored = modeCols.map(c =>
        col("__modes").getItem(c).cast(records.schema(c).dataType).as(c))
      base.drop(modeCols: _*)
        .join(melted, Seq(clusterCol), "left")
        .select(col(clusterCol) +:
          rules.map { case (c, r) => if (r == ModeRule)
            restored(modeCols.indexOf(c)) else col(c) } :+
          col("n_members"): _*)
    }
  }
}
