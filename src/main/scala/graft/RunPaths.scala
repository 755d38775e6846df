package graft

/** Per-run landing root for queries that materialize a side-effect
  * layout before auditing it (the E37 prune audits). The root is
  * derived from the data-dir argument, so runs at different scale
  * factors — or two users on one machine — land to isolated
  * locations instead of racing on one hardcoded path; the oracle SQL
  * (dumped by [[Verify]] in the same JVM, after [[Verify]] pins
  * `currentTag`) names the same files.
  */
object RunPaths {
  def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Pinned by Verify before oracle SQL is rendered so it agrees with the
    * query lambdas (which derive the landing from their `dir` argument
    * directly) on the location. Reading it UNPINNED throws rather than
    * silently baking a default tag into oracle SQL that points at a
    * landing no query wrote — the failure mode would otherwise zero the
    * prune-audit comparisons without any error. Query lambdas never read
    * this; only oracle-SQL rendering does, and only Verify renders it. */
  @volatile private var pinnedTag: Option[String] = None

  def pin(dir: String): Unit = { pinnedTag = Some(tag(dir)) }

  private def unpinned: Nothing = throw new IllegalStateException(
    "RunPaths.currentTag read before RunPaths.pin(dir): oracle SQL would " +
      "name a landing path the query lambdas did not write. Call " +
      "RunPaths.pin(<sfDir>) first (Verify does this).")

  def currentTag: String = pinnedTag.getOrElse(unpinned)

  /** Test hook: the unpinned failure path, independent of pin state
    * (tests share one JVM, so another suite may already have pinned). */
  private[graft] def freshUnpinnedProbe(): String =
    (None: Option[String]).getOrElse(unpinned)

  def pruneBase(dir: String): String = s"/tmp/graft_prune_audit/${tag(dir)}"
}
