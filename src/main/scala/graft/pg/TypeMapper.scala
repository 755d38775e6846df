package graft.pg

import org.apache.spark.sql.types._

/** Postgres ↔ Spark type mapping.
  *
  * Postgres→Postgres-DDL normalization follows the reference
  * (postgres_operator_impl.rs:37-49: information_schema 'ARRAY' → text[]);
  * the Spark mappings are what a Spark reader/writer of the same tables
  * needs (both directions, used by SchemaGuard and JdbcSink).
  */
object TypeMapper {

  /** information_schema.columns data_type → DDL type (reference behavior). */
  def normalizePgType(dataType: String): String =
    if (dataType == "ARRAY") "text[]" else dataType

  /** Postgres data_type → Spark DataType. */
  def pgToSpark(dataType: String): DataType = normalizePgType(dataType) match {
    case "smallint"                    => ShortType
    case "integer"                     => IntegerType
    case "bigint"                      => LongType
    case "real"                        => FloatType
    case "double precision"            => DoubleType
    case t if t.startsWith("numeric")  => DecimalType(38, 18)
    case "boolean"                     => BooleanType
    case "date"                        => DateType
    case t if t.startsWith("timestamp") => TimestampType
    case "bytea"                       => BinaryType
    case "text[]"                      => ArrayType(StringType)
    case _                             => StringType // text, varchar, uuid, json, geometry...
  }

  /** Spark DataType → Postgres DDL type. */
  def sparkToPg(dt: DataType): String = dt match {
    case ShortType           => "smallint"
    case IntegerType         => "integer"
    case LongType            => "bigint"
    case FloatType           => "real"
    case DoubleType          => "double precision"
    case d: DecimalType      => s"numeric(${d.precision},${d.scale})"
    case BooleanType         => "boolean"
    case DateType            => "date"
    case _: TimestampType    => "timestamp"
    case BinaryType          => "bytea"
    case ArrayType(_, _)     => "text[]"
    case _                   => "text"
  }
}
