package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Process-wide materialization of the near-dup pair graph and its
  * connected-component labels — the two tables every curation consumer
  * (dedup rewrite, survivor pick, leakage-safe split, source ranking)
  * derives from.
  *
  * p09 is the one remaining standalone anchor that deliberately
  * rebuilds the banded pair pass per execution (plus the independent
  * DuckDB oracle recomputation every consumer is checked against); the
  * DAG entries (p75, p101) and — since r20 — p29, p42, p63, p68 and
  * p119 go through HERE instead, so pair generation and the CC
  * fixpoint run at most once per (fixture dir) per process and every
  * later consumer pays only a parquet scan. That is the
  * production contract at 100 TB: the pair graph is a shared
  * intermediate table, not a per-query recomputation — on a cluster
  * these are bucketed tables on a shared store, and a second consumer
  * in the same job server reuses them for free.
  *
  * Memoization is keyed by fixture dir; results live under the
  * process-scoped scratch sink (cleaned at JVM exit), so concurrent
  * runs never collide and a re-run in the same process reuses the
  * materialized tables — exactly the amortization the p75 DAG entry
  * measures against the sum of its standalone parts.
  */
object SharedStages {

  private val done =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize (once) and return the base dir holding
    * `spairs/` and `labels/` parquet for the documents table in `dir`.
    */
  private def base(spark: SparkSession, dir: String): String =
    done.computeIfAbsent(dir, { _ =>
      import graft.ops.DedupOps
      val b = sinkDir(s"shared_${Integer.toHexString(dir.hashCode)}")
      val docs = Tables.loadSpread(spark, dir, "documents")
      // Captured at hamming ≤ 8 — the widest consumer (p196's
      // operating curve; p227's dendrogram reads ≤ 4). The ≤ 3
      // consumers read a parquet-pushed `hamming <= 3` filter of the
      // SAME table, which is EXACTLY what a ≤ 3 generation produces:
      // bucketing and the skew cap don't depend on the capture
      // threshold, only the final hamming filter does. One banded
      // pair pass serves every threshold.
      // FIXED 8-way hash layout on every materialized table: the file
      // count must not depend on which session's shuffle width happened
      // to materialize first (a 4-partition writer vs an 8-partition
      // writer changes downstream map-side partial-agg dedup, i.e. the
      // runtime shuffle volumes ShuffleVolumeSpec pins). At 100 TB this
      // is the bucketed-table DDL; here it is an explicit repartition.
      DedupOps.simhashPairs(docs, "doc_id", "text",
          maxHamming = 8, maxBucket = 1000)
        .repartition(8, col("a"))
        .write.mode("overwrite").parquet(s"$b/spairs")
      // the fixpoint consumes the MATERIALIZED pairs: pair generation
      // runs once for every consumer of the shared stage
      DedupOps.connectedComponents(
          spark.read.parquet(s"$b/spairs").where(col("hamming") <= 3))
        .repartition(8, col("n"))
        .write.mode("overwrite").parquet(s"$b/labels")
      b
    })

  /** The banded near-dup candidate pairs (a, b), a < b, at the
    * repo-standard hamming ≤ 3 — a pushed-down filter of the wider
    * shared capture, identical to a direct ≤ 3 pair pass.
    */
  def spairs(spark: SparkSession, dir: String): DataFrame =
    spairsWide(spark, dir, 3)

  /** Pairs at a wider threshold (≤ `maxHamming`, capped at the
    * materialized capture width 8) for the curve/dendrogram consumers.
    */
  def spairsWide(spark: SparkSession, dir: String,
                 maxHamming: Int): DataFrame = {
    require(maxHamming <= 8, s"capture is materialized at <= 8")
    spark.read.parquet(s"${base(spark, dir)}/spairs")
      .where(col("hamming") <= maxHamming)
  }

  /** CC labels as (doc_id, cluster_id); docs in no pair are absent
    * (consumers coalesce to the doc's own id, the singleton cluster).
    */
  def labels(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${base(spark, dir)}/labels")
      .select(col("n").as("doc_id"), col("lbl").as("cluster_id"))

  /** The STANDING-corpus variant (docs with doc_id % 3 ≠ 0 — the
    * corpus side of the p122/p152/p162 ingest split): materialized
    * pair graph + CC labels of the corpus as it stood BEFORE the
    * incoming batch. This is the dedup state a production ingest path
    * maintains incrementally (p162) instead of recomputing — at 100 TB
    * the labels are a bucketed table updated per batch, and the
    * fixpoint over the full corpus never reruns.
    */
  private def corpusBase(spark: SparkSession, dir: String): String =
    done.computeIfAbsent(s"corpus:$dir", { _ =>
      import graft.ops.DedupOps
      val b = sinkDir(s"sharedc_${Integer.toHexString(dir.hashCode)}")
      val corpus = Tables.loadSpread(spark, dir, "documents")
        .where(col("doc_id") % 3 =!= 0)
      DedupOps.simhashPairs(corpus, "doc_id", "text",
          maxHamming = 3, maxBucket = 1000)
        .repartition(8, col("a"))
        .write.mode("overwrite").parquet(s"$b/spairs")
      DedupOps.connectedComponents(spark.read.parquet(s"$b/spairs"))
        .repartition(8, col("n"))
        .write.mode("overwrite").parquet(s"$b/labels")
      // the ingest probe index: capped corpus band table — what every
      // incoming batch (p122/p152/p162/p163) joins against
      DedupOps.corpusBands(corpus, "doc_id", "text", maxBucket = 1000)
        .repartition(8, col("q"), col("qk"))
        .write.mode("overwrite").parquet(s"$b/bands")
      b
    })

  /** Force the shared pair/label materialization — the bench calls this
    * ONCE per run, timed, so the one-time build cost best-of-N minima
    * would otherwise erase is charged transparently as its own line
    * (VERDICT r20 #4). No-op when already built (memoized).
    */
  def warmBase(spark: SparkSession, dir: String): Unit = {
    base(spark, dir); ()
  }

  /** [[warmBase]] for the standing-corpus tables (pairs/labels/bands). */
  def warmCorpus(spark: SparkSession, dir: String): Unit = {
    corpusBase(spark, dir); ()
  }

  /** Standing-corpus CC labels as raw (n, lbl). */
  def corpusLabels(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${corpusBase(spark, dir)}/labels")

  /** Standing-corpus capped band table (ex_id, ex_sh, q, qk). */
  def corpusBands(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${corpusBase(spark, dir)}/bands")
}
