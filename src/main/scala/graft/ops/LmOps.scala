package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model corpus statistics — the integer-exact core of
  * perplexity-style quality filtering (see `Pipeline4` p47 for the
  * oracle-checked entry).
  */
object LmOps {

  /** Per-document bigram conditional-probability scores: corpus bigram
    * counts C2(w1 w2) and prefix counts C1(w1) are built once from ONE
    * tokenization pass, then each document's bigrams join the count
    * tables and score `cond_ppm = C2 * 1e6 // C1` — the integer
    * conditional probability of each transition — averaged per doc.
    * Documents under 2 tokens have no bigrams and drop out.
    *
    * Skew: the join keys are bigram strings, and the hot keys are
    * exactly the most frequent bigrams — Zipf guarantees them. AQE's
    * skew-join split CANNOT fix this join: `OptimizeSkewedJoin` only
    * matches a sort-merge join whose children are bare shuffle stages,
    * and the count-table side has a HashAggregate above its shuffle
    * (verified by plan inspection in PipelineOpsSpec — the rule never
    * fires). So both count-table joins go through
    * [[JoinPatterns.saltedJoin]]: the doc-side rows salt on `doc_id`
    * (deterministic, non-null), the vocabulary-bounded count tables
    * replicate `salts`× — a hot bigram's rows land on `salts`
    * partitions instead of one, at a replication cost bounded by the
    * vocabulary, not the corpus.
    *
    * `singlePass` materializes the exploded bigram stream once
    * (`localCheckpoint`) for its three consumers — the p25/p32
    * convention.
    */
  def bigramLm(docs: DataFrame, id: String, text: String,
               singlePass: Boolean = true, salts: Int = 8): DataFrame = {
    val bgRaw = docs
      .select(col(id).as("doc_id"), explode(TextOps.shingles(col(text), 2)).as("bg"))
    val bg = if (singlePass) bgRaw.localCheckpoint() else bgRaw
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("n2"))
    val c1 = bg.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    val withC2 = JoinPatterns.saltedJoin(bg, c2, "bg", col("doc_id"), salts)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    JoinPatterns.saltedJoin(withC2, c1, "w1", col("doc_id"), salts)
      .select(col("doc_id"), expr("n2 * 1000000 div n1").as("cond_ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(cond_ppm) div count(1)").cast("long").as("avg_cond_ppm"))
  }
}
