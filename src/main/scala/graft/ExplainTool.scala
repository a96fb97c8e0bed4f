package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print the physical-plan skeleton (exchanges, joins,
  * scans, windows) of named queries — the `.explain` iteration loop the
  * build process runs after each operator goes green, kept as a main so
  * plan regressions are one command away:
  * `runMain graft.ExplainTool p123_source_overlap …`
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = Env.tuned(SparkSession.builder())
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach { n =>
      println(s"========== $n")
      val plan = SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan") ||
        l.contains("Window") || l.contains("Cartesian"))
        .foreach(l => println(l.take(160)))
    }
    spark.stop()
  }
}
