package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, Portable, TextOps}
import graft.queries.Tables

/** Dev-only stage profiler (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("warm tokens")(docs.select(explode(TextOps.tokens(col("text")))).count())
    time("tokens only")(docs.select(explode(TextOps.tokens(col("text")))).count())
    time("shingles HOF")(docs.select(explode(TextOps.shingles(col("text"), 3))).count())
    time("p06 full")(DedupOps.minhashSignatures(docs, "doc_id", "text", 12).count())
    time("p06 again")(DedupOps.minhashSignatures(docs, "doc_id", "text", 12).count())
    time("p05 full")(DedupOps.jaccardPairs(docs, "doc_id", "text", 0.8, 1000).count())
    time("p05 again")(DedupOps.jaccardPairs(docs, "doc_id", "text", 0.8, 1000).count())
    time("p07 full")(DedupOps.lshCandidates(docs, "doc_id", "text", 12, 3).count())
    spark.stop()
  }
}
