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

  /** SF tag for the per-scale fixtures (`chunks_sf001` etc.), resolved
    * from the sfDir the harness is running against: the `graft.sf.dir`
    * system property (set by Verify from its argument) wins, then the
    * bench env var, then the sf0.01 default (the driver's correctness
    * scale). `sf0.001 → sf0001`, `sf0.01 → sf001`, `sf0.1 → sf01`.
    */
  def sfTag: String = {
    val dir = sys.props.get("graft.sf.dir")
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("sf0.01")
    new java.io.File(dir).getName.replace(".", "")
  }

  /** Per-SF golden fixture: `goldenSf("chunks")` → `.../chunks_sf001
    * .parquet` at the active scale.
    */
  def goldenSf(base: String): String = golden(s"${base}_$sfTag.parquet")
}
