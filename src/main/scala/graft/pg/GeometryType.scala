package graft.pg

/** PostGIS geometry detection/formatting — the reference's
  * PostgresGeometryType (postgres_geometry_type.rs): values whose prefix
  * (first 30 chars, optionally double-quoted) is an accepted geometry
  * keyword are wrapped as ST_GeomFromText('<wkt>', srid).
  */
case class GeometryType(input: String, srid: Int = 0) {
  import GeometryType._

  private val valueType: String = {
    val prefix = input.take(PrefixLen)
    if (prefix.startsWith("\"") && prefix.endsWith("\""))
      prefix.stripPrefix("\"").stripSuffix("\"")
    else prefix
  }

  def isGeometry: Boolean =
    valueType.indexOf('(') match {
      case -1 => false
      case i  => AcceptedKeywords.contains(valueType.substring(0, i))
    }

  def format(value: String): String = {
    val kw = valueType.indexOf('(') match {
      case -1 => valueType
      case i  => valueType.substring(0, i)
    }
    kw match {
      case Multipolygon => s"ST_GeomFromText('$value', $srid)"
      case _            => valueType
    }
  }
}

object GeometryType {
  val Multipolygon = "MULTIPOLYGON"
  val AcceptedKeywords: Set[String] = Set(Multipolygon)
  val PrefixLen = 30
}
