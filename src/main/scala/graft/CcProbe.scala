package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the connectedComponents fixpoint cost model:
  * materializes the sf0.1 SimHash pair graph once, then times the CC
  * fold under varying loop widths / session confs — the §1 "measure
  * first" harness behind the r20 loop-shape decisions.
  * `runMain graft.CcProbe [loopPartitions ...]`
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Env.tuned(SparkSession.builder()).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_CC_AQE", "true"))
      .config("spark.local.dir", Env.scratchDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.DedupOps
    val docs = graft.queries.Tables.loadSpread(spark, dir, "documents")
    val t0 = System.nanoTime()
    val pairs = DedupOps.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = 1000).localCheckpoint()
    val nPairs = pairs.count()
    println(f"pairs: $nPairs rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val widths = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 4, 2, 1)
    for (w <- widths; rep <- 1 to 2) {
      val t1 = System.nanoTime()
      val n = DedupOps.connectedComponents(pairs, loopPartitions = w).count()
      println(f"cc width=$w rep=$rep: $n labels in ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
