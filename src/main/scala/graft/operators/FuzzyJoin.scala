package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) equi-join without the cross product — entity
  * matching over dirty keys: "Custmer#000123" vs "Customer#000123",
  * supplier-name reconciliation between two feeds, dedup of
  * typo-variant identifiers. The reference never needs this shape (its
  * joins are exact pk-equi, cdc_operator_payload.rs:247-293), but a
  * validate between two hand-keyed systems is exactly this join, and a
  * naive `levenshtein(a, b) <= d` condition plans as a nested-loop
  * cross join — O(|L|·|R|) distance computations, a non-starter at
  * scale.
  *
  * Scale path — DELETION-NEIGHBORHOOD blocking (the SymSpell scheme):
  * if `ed(s, t) <= d` then deleting the substituted/deleted positions
  * from `s` (≤ d deletions) and the substituted/inserted positions from
  * `t` (≤ d deletions) reaches the alignment's common subsequence, so
  * the up-to-`d`-deletion variant sets of the two strings intersect —
  * blocking on deletion variants is COMPLETE (no missed pair), and the
  * exact `levenshtein` residual makes it sound. Each side explodes to
  * its ≤ `1 + len + len·(len-1)/2` variants (d ≤ 2), variants hash to
  * 8-byte keys (`xxhash64` — a collision only ADDS a candidate, which
  * the exact verify kills; equal variants always collide, so
  * completeness is unharmed), and the join is hash-EQUI on the variant
  * key: partitioned, AQE-aware, no nested loop. A candidate pair
  * sharing several variants is emitted once per shared variant;
  * duplicates die in one `distinct` over the VERIFIED matches — an
  * output-sized exchange, not a candidate-sized one, because the
  * residual filter runs first (threshold-bounded `levenshtein(l, r, d)`
  * — O(d·len) early-exit, codegen'd — not the full O(len²) matrix).
  *
  * The variant fan-out is quadratic in string length at d=2, so keys
  * longer than `maxLen` are refused LOUDLY (`raise_error` riding the
  * sequence bound, zero cost on the happy path) — this operator joins
  * KEYS (names, codes, ids), not documents; for long-text similarity
  * use the n-gram/MinHash family. Null keys match nothing (dropped
  * before the explode, mirroring SQL equi-join null semantics).
  *
  * Output: every `left` column, every `right` column (sides must not
  * share names — alias first), plus `edit_dist` (bigint, the exact
  * distance ≤ `maxDist`). Duplicate full rows within one side collapse
  * in the final distinct — give rows a unique id column if that
  * matters.
  *
  * Scale caveat — the ANSWER can be quadratic: m rows sharing one key
  * value (or within `maxDist` of it) are m·(m−1)/2 true pairs, and no
  * complete join can emit fewer. If near-identical keys are expected in
  * bulk (replicated feeds, boilerplate names), exact-dedup each side
  * first (E1) and fuzzy-join the representatives — blocking cost and
  * output both return to candidate-mass-linear. Measured: 10 verbatim
  * copies of a customer table turn a 72 s join into a 2,463 s one purely
  * through the 100× true-pair mass (BENCH_decade_r13.jsonl).
  */
object FuzzyJoin {

  private val Internal = Seq("__fv", "__fk", "edit_dist")

  /** All strings reachable from `s` by deleting up to `maxDist`
    * characters (including `s` itself), distinct. `lenChecked` carries
    * the fan-out guard: reading it on an over-long string raises. */
  private def delVariants(s: Column, lenChecked: Column, maxDist: Int): Column = {
    val del1 = when(lenChecked >= 1,
      transform(sequence(lit(1), lenChecked), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, lenChecked))))
      .otherwise(typedLit(Seq.empty[String]))
    val base = concat(array(s), del1)
    val all =
      if (maxDist < 2) base
      else concat(base,
        when(lenChecked >= 2,
          flatten(transform(sequence(lit(1), lenChecked - 1), i =>
            transform(sequence(i + 1, lenChecked), j =>
              concat(
                s.substr(lit(1), i - 1),
                s.substr(i + 1, j - i - 1),
                s.substr(j + 1, lenChecked))))))
          .otherwise(typedLit(Seq.empty[String])))
    array_distinct(all)
  }

  /** All (left, right) row pairs with `levenshtein(leftKey, rightKey)
    * <= maxDist`, plus the exact distance as `edit_dist`.
    *
    * @param maxDist 1 or 2 — the variant fan-out is len^maxDist, and
    *                past 2 the neighborhood scheme stops paying
    * @param maxLen  loud refusal bound on key length (fan-out guard)
    */
  def editDistanceJoin(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      maxDist: Int,
      maxLen: Int = 64): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"editDistanceJoin: maxDist must be 1 or 2, got $maxDist (0 is an exact " +
        "equi-join; >2 wants the n-gram family)")
    require(maxLen > 0, s"editDistanceJoin: maxLen must be positive, got $maxLen")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"editDistanceJoin: both sides carry column(s) ${shared.mkString(", ")} — alias one side")
    Internal.foreach { r =>
      require(!left.columns.contains(r) && !right.columns.contains(r),
        s"editDistanceJoin: input already has a '$r' column")
    }

    def blocked(df: DataFrame, key: String): DataFrame = {
      val s = col(key)
      // the guard lives inside the sequence bound via this checked length,
      // so it cannot be pruned away and costs nothing on the happy path
      val lenChecked = when(length(s) <= lit(maxLen), length(s))
        .otherwise(raise_error(concat(
          lit(s"FuzzyJoin: key longer than maxLen=$maxLen chars (this joins " +
            "keys, not documents; raise maxLen or use the n-gram family): "),
          substring(s, 1, 48))).cast("int"))
      df.where(s.isNotNull)
        .withColumn("__fv", explode(delVariants(s, lenChecked, maxDist)))
        .withColumn("__fk", xxhash64(col("__fv")))
        .drop("__fv")
    }

    blocked(left, leftKey)
      .join(blocked(right, rightKey), "__fk")
      // threshold-bounded levenshtein: -1 past maxDist, O(maxDist·len)
      .withColumn("edit_dist",
        levenshtein(col(leftKey), col(rightKey), maxDist).cast("long"))
      .filter(col("edit_dist") >= 0)
      .drop("__fk")
      .distinct()
  }
}
