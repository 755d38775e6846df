package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintainable rollups: build a keyed aggregate once, then
  * absorb each new batch by MERGING partial aggregates — never re-scanning
  * the raw history. The aggregate twin of [[graft.cdc.CdcApply.scd2Merge]]:
  * at 100 TB the landed rollup is keyspace-sized (millions of rows where
  * the raw feed has trillions), so maintaining `merge(landed, build(batch))`
  * costs the batch plus the keyspace, while the naive alternative —
  * `build(history ∪ batch)` — re-aggregates everything ever ingested.
  *
  * Only ALGEBRAIC aggregates participate (sum / count / min / max): each
  * has a combine that is associative and commutative over partial states,
  * which is exactly the property that makes `merge(build(A), build(B)) ≡
  * build(A ∪ B)` hold for ANY split — the contract the property test
  * drives. Derived measures (avg = sum/count) are finisher arithmetic over
  * the landed columns, not state.
  *
  * Sum partials are widened to their type's FIXPOINT up front (decimal(p,s)
  * → decimal(38,s), integral → long, fractional → double) so a re-merged
  * rollup has the SAME schema as a freshly built one — without this, each
  * merge generation would widen decimals until the contract compare (and
  * any landed-table append) breaks on type mismatch.
  *
  * Plan shape: `build` is one map-side-combined hash aggregation (the
  * exchange carries partial states, not rows); `merge` unions two
  * keyspace-sized frames and re-aggregates — one exchange of the rollup,
  * never of the history.
  */
object Rollup {

  sealed trait Kind
  /** Σ input (null inputs carry nothing; an all-null group sums to null). */
  case object Sum extends Kind
  /** Row count (count(*) semantics; for non-null counts sum a 0/1 flag). */
  case object Count extends Kind
  case object Min extends Kind
  case object Max extends Kind

  /** One aggregate column: `out` = the landed column name, `input` = the
    * measured expression (ignored by Count), `kind` = the combine. */
  final case class Spec(out: String, input: Column, kind: Kind)

  /** The widest type `sum` can produce for an input of type `dt` — summing
    * a column of this type yields the type itself, so partials are stable
    * across merge generations. */
  private def sumFixpoint(dt: DataType): DataType = dt match {
    case d: DecimalType => DecimalType(38, d.scale)
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => LongType
    case _: FloatType | _: DoubleType => DoubleType
    case other => throw new IllegalArgumentException(
      s"Rollup: Sum over unsupported type $other — cast to a numeric first")
  }

  /** Aggregate `df` by the (pre-projected) key columns. */
  def build(df: DataFrame, keys: Seq[String], specs: Seq[Spec]): DataFrame = {
    require(keys.nonEmpty && specs.nonEmpty, "Rollup.build: keys and specs required")
    val aggs = specs.map {
      case Spec(out, input, Sum) =>
        val fix = sumFixpoint(df.select(input).schema.head.dataType)
        sum(input.cast(fix)).cast(fix).as(out)
      case Spec(out, _, Count) => count(lit(1)).as(out)
      case Spec(out, input, Min) => min(input).as(out)
      case Spec(out, input, Max) => max(input).as(out)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Combine two partial rollups of the SAME build: `merge(build(A),
    * build(B)) ≡ build(A ∪ B)`. Schemas must match exactly (a drifted
    * landing is refused loudly, not silently coerced). */
  def merge(landed: DataFrame, delta: DataFrame, keys: Seq[String],
      specs: Seq[Spec]): DataFrame = {
    // names + types must agree; nullability may not (Spark types a summed
    // count as nullable even though the combine never produces null)
    def shape(df: DataFrame) = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(landed) == shape(delta),
      s"Rollup.merge: schema mismatch\n  landed: ${landed.schema.simpleString}" +
        s"\n  delta:  ${delta.schema.simpleString}")
    val expect = (keys ++ specs.map(_.out)).toSet
    require(landed.columns.toSet == expect,
      s"Rollup.merge: landed columns ${landed.columns.mkString(",")} != keys+specs ${expect.mkString(",")}")
    val aggs = specs.map {
      case Spec(out, _, Sum) =>
        val t = landed.select(col(out)).schema.head.dataType
        sum(col(out)).cast(t).as(out)
      case Spec(out, _, Count) => sum(col(out)).as(out)
      case Spec(out, _, Min) => min(col(out)).as(out)
      case Spec(out, _, Max) => max(col(out)).as(out)
    }
    landed.unionByName(delta).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
