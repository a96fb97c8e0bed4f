package graft

/** Host-environment helpers for the driver-contract mains. */
object Env {

  /** Spark scratch space (`spark.local.dir`) for shuffle files and
    * spills. This host's root disk shows multi-second I/O stalls under
    * concurrent writers (load dominated by iowait while CPUs idle),
    * which turns every shuffle-heavy query into a latency lottery; the
    * box has ample RAM, so shuffle scratch goes to tmpfs when
    * available. The cluster analog is standard practice: point
    * `spark.local.dir` at fast local SSDs, never at a slow shared
    * volume. Cleaned up at JVM exit.
    */
  lazy val scratchDir: String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) "/dev/shm" else sys.props("java.io.tmpdir")
    val dir = s"$base/graft_local_${queries.runToken}"
    queries.cleanupAtExit(dir)
    dir
  }
}
