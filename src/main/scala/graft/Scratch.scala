package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // --time: execute (count) each named query twice and print wall times
    // instead of the plan; mirrors Bench's per-query measurement.
    val (time, names) = args.partition(_ == "--time") match {
      case (t, n) => (t.nonEmpty, n)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Env.tuned(SparkSession.builder()).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Env.scratchDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      println(s"========== $name ==========")
      if (time) {
        val passes = sys.env.getOrElse("GRAFT_TIME_PASSES", "2").toInt
        // stall watchdog: if a pass runs past the threshold, dump all
        // thread stacks once so the blocked site is visible (jstack
        // cannot attach to sbt's forked JVM)
        val dumpAfterS = sys.env.getOrElse("GRAFT_STALL_DUMP_S", "0").toInt
        for (i <- 1 to passes) {
          val done = new java.util.concurrent.atomic.AtomicBoolean(false)
          if (dumpAfterS > 0) {
            val w = new Thread(() => {
              Thread.sleep(dumpAfterS * 1000L)
              if (!done.get()) {
                println(s"==== STALL DUMP ($name, >${dumpAfterS}s) ====")
                import scala.jdk.CollectionConverters._
                // RUNNABLE threads first — in a stall they're the story
                Thread.getAllStackTraces.asScala.toSeq
                  .filter(_._2.nonEmpty)
                  .sortBy { case (t, _) => t.getState != Thread.State.RUNNABLE }
                  .foreach { case (t, st) =>
                    println(s"-- ${t.getName} (${t.getState})")
                    st.take(20).foreach(f => println(s"   $f"))
                  }
              }
            })
            w.setDaemon(true)
            w.start()
          }
          val t0 = System.nanoTime()
          // done must flip even when the query throws, or the sleeping
          // watchdog later dumps stacks against whatever runs next
          val n = try SparkEntry.queries(name)(spark, sfDir).count()
            finally done.set(true)
          println(f"  pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        }
      } else {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      }
    }
    spark.stop()
  }
}
