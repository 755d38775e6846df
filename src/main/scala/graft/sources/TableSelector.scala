package graft.sources

/** include/exclude/all table selection — the reference's TableMode
  * (/root/reference/src/postgres/table_mode.rs + snapshot_payload.rs:
  * table_mode()): a non-empty include list wins, else a non-empty exclude
  * list, else all tables.
  */
object TableSelector {

  sealed trait Mode
  case object AllTables extends Mode
  case object IncludeTables extends Mode
  case object ExcludeTables extends Mode

  def mode(included: Seq[String], excluded: Seq[String]): Mode =
    if (included.nonEmpty) IncludeTables
    else if (excluded.nonEmpty) ExcludeTables
    else AllTables

  def select(all: Seq[String], included: Seq[String], excluded: Seq[String]): Seq[String] =
    mode(included, excluded) match {
      case IncludeTables => all.filter(included.contains)
      case ExcludeTables => all.filterNot(excluded.contains)
      case AllTables     => all
    }
}
