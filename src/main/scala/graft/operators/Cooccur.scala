package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D19: ITEM CO-OCCURRENCE / association rules over per-entity baskets —
  * "users who do A also do B": for every unordered item pair that shares
  * an entity, the support, both directed confidences, and the lift, all
  * in exact integer basis points. The product-analytics read next to
  * D12's funnel (funnel fixes the step order; co-occurrence finds which
  * steps associate at all).
  *
  * Plan — two exchanges, no windows:
  *  1. baskets: `collect_set(item)` per entity (one map-side-combined
  *     exchange by id); each basket emits its own ordered pairs via
  *     sorted-array `transform`×`slice` — pair generation is local to
  *     the basket row, NO self-join, and a basket larger than
  *     `maxBasket` raises loudly instead of detonating quadratically
  *     (the house guard style: item vocabularies are small by nature —
  *     event types, tags, SKU families — and a 10⁶-item "basket" is a
  *     key-quality bug upstream, not a workload).
  *  2. pair counts: one exchange by (a, b).
  *  Item totals ride the same basket pass (explode of the already-
  *  deduped sets, map-side combined); the entity total is one broadcast
  *  scalar (the E55 vocab pattern). Final stamping = two joins against
  *  the item-count table — item-cardinality-sized, broadcastable.
  *
  * lift_bp = ⌊pair_n·N·10⁴ / (n_a·n_b)⌋ computed in DECIMAL(38,0) (the
  * product overflows int64 at corpus scale); all divisions are
  * non-negative so Spark's truncating `div` and DuckDB's flooring `//`
  * agree.
  */
object Cooccur {

  def pairs(
      df: DataFrame,
      idCol: String,
      itemCol: String,
      maxBasket: Int = 4096): DataFrame = {
    val baskets = df
      .groupBy(col(idCol).as("__id"))
      .agg(array_sort(collect_set(col(itemCol))).as("__items"))
      .withColumn("__items",
        when(size(col("__items")) > maxBasket, raise_error(concat(
          lit(s"Cooccur: basket for id "), col("__id").cast("string"),
          lit(s" holds "), size(col("__items")).cast("string"),
          lit(s" distinct items (> maxBasket=$maxBasket) — quadratic pair "
            + "fan-out refused; raise maxBasket only if this is intended"))))
          .otherwise(col("__items")))
      .localCheckpoint() // feeds pair explosion, item counts, AND N

    val n = baskets.agg(count(lit(1)).as("__N"))
    val itemCounts = baskets
      .select(explode(col("__items")).as("__it"))
      .groupBy("__it").agg(count(lit(1)).as("__n"))

    val pairCounts = baskets
      .select(explode(flatten(transform(col("__items"), (x, i) =>
        transform(slice(col("__items"), i + lit(2), size(col("__items"))),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .groupBy(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))

    pairCounts
      .join(itemCounts.select(col("__it").as("item_a"), col("__n").as("n_a")), "item_a")
      .join(itemCounts.select(col("__it").as("item_b"), col("__n").as("n_b")), "item_b")
      .join(broadcast(n))
      .select(
        col("item_a"), col("item_b"), col("pair_n"), col("n_a"), col("n_b"),
        expr("pair_n * 10000 div __N").as("support_bp"),
        expr("pair_n * 10000 div n_a").as("conf_ab_bp"),
        expr("pair_n * 10000 div n_b").as("conf_ba_bp"),
        expr("(CAST(pair_n AS DECIMAL(38,0)) * CAST(__N AS DECIMAL(38,0)) * 10000)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)))")
          .as("lift_bp"))
  }
}
