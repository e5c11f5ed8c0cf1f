package graft

/** Per-JVM scratch space for queries that build a persisted index (or
  * staging layout) INSIDE the timed query (q90/q226–q232/q233/q235/q240
  * — the index-lifecycle oracle rows). Plain
  * `Files.createTempDirectory` leaked one tree per bench rep; here every
  * query-local directory lives under ONE per-JVM root that a shutdown
  * hook deletes recursively, so a bench run leaves no new /tmp
  * directories behind. Each call still returns a FRESH subdirectory —
  * reps never trample a previous rep's layout mid-read, and the
  * oracle-visible results are unchanged.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(r)))
    r
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString

  private def deleteRec(p: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      }
    } catch {
      // best-effort: a file pinned by a still-closing Spark handle must
      // not fail JVM shutdown
      case _: Throwable => ()
    }
}
