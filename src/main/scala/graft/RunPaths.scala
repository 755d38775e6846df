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

  /** Pinned by Verify before queries run so oracle SQL agrees with the
    * query lambdas on the landing location; the default keeps ad-hoc
    * single-query calls working. */
  @volatile var currentTag: String = "adhoc"

  def pruneBase(dir: String): String = s"/tmp/graft_prune_audit/${tag(dir)}"
}
