package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    // --time: execute (count) each named query twice and print wall times
    // instead of the plan; mirrors Bench's per-query measurement.
    val (time, names) = args.partition(_ == "--time") match {
      case (t, n) => (t.nonEmpty, n)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", Env.scratchDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      println(s"========== $name ==========")
      if (time) {
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, sfDir).count()
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
