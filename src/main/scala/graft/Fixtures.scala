package graft

/** Locations of the committed golden-fixture parquet files.
  *
  * The oracle SQL strings embed these paths (DuckDB runs driver-side on
  * the same checkout), so they must resolve wherever the repo actually
  * lives: `GRAFT_REPO_ROOT` env wins, then the process working directory
  * when it looks like this repo, then the canonical `/root/repo`.
  *
  * SF note: the `*_sf001` fixtures are generated from the sf0.01 tables —
  * the scale the driver's correctness gate is contracted to run at. The
  * `media` fixture is scale-independent (it IS the query input).
  */
object Fixtures {
  lazy val repoRoot: String = sys.env.get("GRAFT_REPO_ROOT")
    .orElse(Option(System.getProperty("user.dir"))
      .filter(d => new java.io.File(d, "src/test/resources/golden").isDirectory))
    .getOrElse("/root/repo")

  def golden(name: String): String =
    s"$repoRoot/src/test/resources/golden/$name"
}
