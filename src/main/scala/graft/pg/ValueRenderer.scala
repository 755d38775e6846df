package graft.pg

import java.sql.{Date, Timestamp}

/** SQL-literal rendering of row values — the reference's RowStruct
  * (/root/reference/src/postgres/postgres_row_struct.rs): strings get
  * `''`-escaped single quotes, decimals render quoted at their scale,
  * dates/timestamps render quoted, NULL renders bare, everything else
  * renders via toString. Geometry strings are wrapped by GeometryType
  * (postgres_geometry_type.rs) before quoting.
  */
object ValueRenderer {

  def render(value: Any): String = value match {
    case null                => "NULL"
    case None                => "NULL"
    case Some(v)             => render(v)
    case s: String           => renderString(s)
    case d: java.math.BigDecimal => s"'${d.toPlainString}'"
    case d: BigDecimal       => s"'${d.bigDecimal.toPlainString}'"
    case d: Date             => s"'$d'"
    case t: Timestamp        => s"'$t'"
    case b: Array[Byte]      => "'\\x" + b.map("%02x".format(_)).mkString + "'"
    case other               => other.toString
  }

  def renderString(s: String): String = {
    val trimmed = s.trim
    val geo = GeometryType(trimmed)
    if (geo.isGeometry) geo.format(trimmed)
    else s"'${s.replace("'", "''")}'"
  }
}
