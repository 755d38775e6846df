package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** E63: TRIANGLE COUNTING + local clustering coefficient over an
  * undirected graph — the density audit for the dedup pair graph sitting
  * between pair generation (E2/E3/E59) and clustering (E2d): a component
  * whose members are pairwise similar (near-clique, lcc → 1) is a true
  * duplicate cluster; a low-lcc star is one hub chaining unrelated docs
  * together — exactly the failure mode that makes connected components
  * over-merge. The reference has no graph surface at all (its validate is
  * row-parity, cdc_operator.rs:171-224); this audits OUR candidate graph.
  *
  * Per node: `degree`, `triangles` (closed wedges through the node), and
  * `lcc_bp` = floor(2·T·10⁴ / (d·(d−1))) — the local clustering
  * coefficient in integer basis points (0 when d < 2), engine-portable.
  *
  * Algorithm: the degree-ordered wedge join (compact-forward; Schank &
  * Wagner 2005, the shape MapReduce triangle counters standardize on).
  * Each undirected edge is ORIENTED from its (degree, id)-smaller
  * endpoint to its larger one; wedges are generated only at a node's
  * out-neighbors and closed against the oriented edge set:
  *
  *  1. canonicalize: `(least, greatest)`, self-loops dropped, duplicates
  *     merged — one exchange + combiner.
  *  2. degrees: endpoint explosion + one map-side-combined count.
  *  3. orient: two key-equi joins stamping each endpoint's degree.
  *  4. wedges: self-join of oriented edges on the source — out-degree
  *     under degree ordering is O(√m) REGARDLESS of hub degree (a
  *     d-degree hub ranks above almost all its neighbors, so its edges
  *     point INTO it), so wedge volume is Σ outdeg² ≤ O(m^{3/2}) instead
  *     of the Σ deg² a hub-sourced join would pay — this is what makes
  *     the operator survive the dedup graph's hottest template cluster.
  *  5. close: one key-equi join of wedges against oriented edges on the
  *     (v, w) pair — every triangle found exactly once.
  *  6. stamp back: explode the 3 corners, count per node, left-join onto
  *     degrees (absent = 0 triangles).
  * All joins are key-equi (plan-pinned: no cartesian); every aggregate is
  * map-side combinable.
  */
object Triangles {

  /** @param edges undirected edge list; rows may be duplicated, reversed,
    *              or self-looped — canonicalized here
    * @return one row per node with ≥1 edge:
    *         `(id, degree, triangles, lcc_bp)` */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // the edge list feeds degrees, orientation, wedges, AND the close
    // join — localCheckpoint so a (possibly expensive) upstream pair
    // generation is paid once, not once per consumer (the E2d-canon
    // pattern); the materialized edge list is far smaller than its
    // producing plan at any scale
    val canon = edges
      .select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()

    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))

    // orientation rank = (degree, id): total order, hubs sort last
    val stamped = canon
      .join(deg.select(col("id").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("__db")), "b")
    def rank(d: String, n: String) = struct(col(d).as("d"), col(n).as("n"))
    val aFirst = rank("__da", "a") < rank("__db", "b")
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val oriented = org.apache.spark.sql.GraftBridge.localCheckpointHashPartitioned(
      stamped.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, rank("__db", "b")).otherwise(rank("__da", "a")).as("__rv")),
      // three consumers (both wedge legs + the close join): pay the
      // degree-stamping joins once, and DECLARE the hash(u) layout so the
      // wedge self-join reads both legs exchange-free (a plain
      // localCheckpoint loses the layout under AQE and both legs
      // re-exchange the oriented edge mass)
      Seq("u"), parts)

    val wedges = oriented.as("x")
      .join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.__rv") < col("y.__rv"))
      .select(col("x.v").as("v"), col("y.v").as("w"), col("x.u").as("u"))
    val triangles = wedges.join(
      oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))

    val perNodeTri = triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("__tri"))

    deg.join(perNodeTri, Seq("id"), "left")
      .select(
        col("id"),
        col("degree"),
        coalesce(col("__tri"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          expr("2 * coalesce(__tri, 0L) * 10000L div (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("lcc_bp"))
  }
}
