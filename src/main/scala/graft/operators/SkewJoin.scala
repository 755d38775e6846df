package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual complement to AQE's
  * skew-join splitting, for when one side's key distribution is so hot
  * (a null-ish default, one giant customer) that a single reducer would
  * receive an entire key's rows.
  *
  * The big side scatters each row to one of `salts` sub-keys via a
  * DETERMINISTIC salt hashed from the whole row (no rand(): a retried
  * task must re-derive identical salts or the shuffle is corrupt); the
  * small side replicates each row `salts` times. The hot key's rows then
  * land on `salts` reducers instead of one. Replication multiplies the
  * small side by `salts` — keep it the dimension side.
  *
  * Finding the hot keys that justify salting is itself a scale problem:
  * profile the key column with `graft.text.TextOps.heavyHitterCandidates`
  * (batch, ≤ k counters cross the exchange) or watch it live with
  * `graft.streaming.HotKeysStream` — both report every key above
  * N/(k+1) of the rows without shuffling the key space.
  */
object SkewJoin {

  /** Inner equi-join of `big` ⋈ `small` on `keys`, with the big side
    * salted `salts` ways. Result equals the unsalted join, row for row. */
  def saltedEquiJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val bigSalted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val smallSalted = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallSalted, keys :+ "__salt").drop("__salt")
  }
}
