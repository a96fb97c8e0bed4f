package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: does a localCheckpoint preserve hash partitioning
  * into the CC loop's join, or does every round re-shuffle the pinned
  * edge list? Prints the executed plan of one hook step. */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Env.tuned(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("u", "v")
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .repartition(8, col("v"))
      .localCheckpoint()
    val lbls = sym.select(col("u").as("n"))
      .repartition(8, col("n")).distinct()
      .select(col("n"), col("n").as("lbl")).localCheckpoint()
    val nbr = sym.join(lbls.select(col("n").as("v2"), col("lbl"))
          .repartition(8, col("v2")),
        col("v") === col("v2"))
      .select(col("u").as("n"), col("lbl"))
    nbr.collect()
    println(nbr.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
