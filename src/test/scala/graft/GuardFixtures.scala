package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Shared doubled-corpus fixture for the runtime guards
  * (BroadcastGuardSpec, ShuffleVolumeSpec): sf0.001 with
  * documents+embeddings doubled (ids shifted past the originals),
  * everything else byte-copied. Duplicate CONTENT on purpose: dedup
  * groups, vocab, quantile cuts, panels and sketches all stay fixed,
  * so any broadcast/shuffle that grows with it is corpus-sized.
  */
object GuardFixtures {
  val corpusTables: Set[String] = Set("documents", "embeddings")

  @volatile private var cached: String = _

  def doubledDir(spark: SparkSession, sfDir: String): String = synchronized {
    if (cached == null) {
      val out = Files.createTempDirectory("graft_dbl_corpus").toString
      val shift = 1000000000L
      Tables.names.foreach { n =>
        if (corpusTables(n)) {
          val df = spark.read.parquet(s"$sfDir/$n.parquet")
          val id = if (n == "documents") "doc_id" else "vec_id"
          df.unionAll(df.withColumn(id, col(id) + shift))
            .coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
        } else {
          Files.copy(Paths.get(s"$sfDir/$n.parquet"),
            Paths.get(s"$out/$n.parquet"), StandardCopyOption.REPLACE_EXISTING)
        }
      }
      cached = out
    }
    cached
  }
}
