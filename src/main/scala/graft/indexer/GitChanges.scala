package graft.indexer

/** D6 — change-list extraction between two commits (reference
  * update_version.py:47-56: `repo.git.diff(commit1, commit2,
  * name_only=True)` split on newlines).
  *
  * One `git` subprocess per version bump, driver-side by design: the
  * handful of changed paths it returns steers the distributed
  * carry-forward + partial re-index — it is control-plane metadata, not
  * per-row work, so shelling out does not violate the no-driver-loops
  * posture. */
object GitChanges {
  def changedFiles(repoRoot: String, commit1: String, commit2: String): Seq[String] = {
    import scala.sys.process._
    Process(Seq("git", "diff", "--name-only", commit1, commit2),
      new java.io.File(repoRoot)).!!
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }
}
