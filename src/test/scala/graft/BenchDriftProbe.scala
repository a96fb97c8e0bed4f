package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for the r14 verdict's bench-drift question: is the
  * q-family's 10-20% cross-round drift suite-POSITION (JVM aging:
  * un-GC'd broadcast/shuffle blocks pile up because ContextCleaner is
  * weak-reference-driven, plus heap/code-cache pressure), or a real
  * regression? Measures the q-family total EARLY (fresh session,
  * post-warmup) and LATE (after a full p-family pass in the same JVM —
  * the exact position Bench gives it), with and without the mitigation
  * (periodic System.gc() every N entries, which lets ContextCleaner
  * actually reclaim broadcast/shuffle state).
  * Usage: sbt "Test/runMain graft.BenchDriftProbe [sfDir] [gcEveryN|0]"
  */
object BenchDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gcEvery = args.lift(1).map(_.toInt).getOrElse(0)
    val spark = Env.tuned(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", Env.scratchDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      queries.Tables.names.foreach(n => queries.Tables.load(spark, sfDir, n).count())
      SparkEntry.queries("q32_limit_offset")(spark, sfDir).count()
    } catch { case _: Throwable => () }

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val qs = all.filter(_._1.startsWith("q"))
    val ps = all.filter(_._1.startsWith("p"))

    def run(entries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]): Double = {
      var i = 0
      val t0 = System.nanoTime()
      entries.foreach { case (name, fn) =>
        try fn(spark, sfDir).count()
        catch { case e: Throwable => println(s"ERR $name: ${e.getMessage}") }
        i += 1
        if (gcEvery > 0 && i % gcEvery == 0) System.gc()
      }
      (System.nanoTime() - t0) / 1e9
    }

    val qEarly = run(qs)
    val pTotal = run(ps)
    val qLate = run(qs)
    println(f"qfamily early=${qEarly}%.1fs late=${qLate}%.1fs " +
      f"(x${qLate / qEarly}%.2f after ${pTotal}%.0fs of p-suite; " +
      f"gcEvery=$gcEvery)")
    spark.stop()
  }
}
