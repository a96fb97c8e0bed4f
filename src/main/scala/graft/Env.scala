package graft

/** Host-environment helpers for the driver-contract mains. */
object Env {

  /** Engine-wide session tuning, defined ONCE so the engine, bench,
    * verify, and dev-scratch builders cannot drift:
    *
    * collect_list/collect_set aggregations (the dedup inverted indexes)
    * use ObjectHashAggregate, which silently falls back to SORT-BASED
    * aggregation at 128 hash-map keys (the conservative default) —
    * thread dumps showed the posting-list stages spending their time in
    * the fallback's per-group buffer churn. Small per-group buffers +
    * large heaps make a much higher threshold the right trade at any
    * scale.
    */
  def tuned(b: org.apache.spark.sql.SparkSession.Builder): org.apache.spark.sql.SparkSession.Builder =
    b.config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")

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
