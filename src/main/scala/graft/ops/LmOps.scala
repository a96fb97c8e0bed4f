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

  /** Corpus-level pointwise mutual information of adjacent token pairs —
    * the collocation/phrase-mining statistic (which pairs co-occur far
    * more than chance predicts). `pmi = ln(p(w1,w2) / (p(w1) p(w2)))`
    * with `p(w1,w2) = n_pair/M` over bigrams and `p(w) = n1/N` over
    * unigrams, evaluated as ONE double expression
    * `ln((n_pair * N * N) / (M * n1a * n1b))` in identical operation
    * order on every engine, rounded to 6 — so the oracle hash-matches.
    *
    * Scale shape: the only corpus-sized shuffle is the pair-count
    * groupBy. The unigram table is vocabulary-bounded and the totals are
    * one row each — all three join back by BROADCAST, so no second
    * shuffle of the pair table. `minCount` prunes the pair table before
    * the joins (rare pairs dominate the key space under Zipf; the
    * interesting collocations all clear the floor).
    */
  def pmiPairs(docs: DataFrame, text: String,
               minCount: Long, topK: Int): DataFrame = {
    val toks = docs.select(TextOps.tokens(col(text)).as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n1"))
    val uniTotal = uni.agg(sum(col("n1")).as("nn"))
    val pairs = docs
      .select(explode(TextOps.shingles(col(text), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val pairTotal = pairs.agg(sum(col("n_pair")).as("mm"))
    pairs.filter(col("n_pair") >= minCount)
      .join(broadcast(uni.select(col("w").as("w1"), col("n1").as("n1a"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("n1").as("n1b"))), "w2")
      .crossJoin(broadcast(uniTotal))
      .crossJoin(broadcast(pairTotal))
      .select(col("w1"), col("w2"), col("n_pair"),
        expr("round(ln((cast(n_pair as double) * nn * nn) / " +
          "(cast(mm as double) * n1a * n1b)), 6)").as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** BPE merge TRAINING (p99): learn `rounds` merges by the classic
    * greedy loop — count adjacent symbol pairs over the word-frequency
    * table, take the most frequent pair (ties: lexicographic (a, b)),
    * merge it everywhere, repeat. p46 counts one round's merge
    * candidates and p87 APPLIES a learned list; this closes the loop
    * and produces the list. Words are parenthesis-framed symbol
    * sequences (`(b)(a)(t)` — the p87 framing, which makes a literal
    * `replace` a correct non-overlapping left-to-right pair merge).
    *
    * Scale shape: the corpus-sized tokenization collapses to the
    * word-frequency table ONCE (vocabulary-bounded — Heaps' law, not
    * corpus-sized — and persisted); each round is then one
    * vocab-sized pair-count partial agg plus a top-1 TakeOrdered, and
    * the winning pair is a 1-row driver read (the p51-style
    * aggregate-scalar exception) folded into the next round's encode
    * expression. Symbols are assumed not to contain parentheses
    * (whitespace tokens in this corpus cannot).
    */
  def bpeTrainMerges(docs: DataFrame, text: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs
      .select(explode(TextOps.tokens(col(text))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val base = vocab
      .select(regexp_replace(col("term"), "(.)", "($1)").as("enc"), col("freq"))
      .persist()
    var enc = base
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = enc
        .select(regexp_extract_all(col("enc"), lit("\\(([^)]*)\\)"), lit(1))
          .as("s"), col("freq"))
        .select(explode(expr(
          "transform(slice(s, 1, size(s) - 1), (x, i) -> " +
            "named_struct('a', x, 'b', s[i + 1]))")).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty, s"BPE training ran dry at round $r")
      val (a, b, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((r.toLong, a, b, a + b, cnt))
      enc = enc.withColumn("enc",
        call_function("replace", col("enc"), lit(s"($a)($b)"), lit(s"($a$b)")))
    }
    base.unpersist()
    merges.result()
      .toDF("merge_rank", "left_sym", "right_sym", "merged", "pair_count")
  }
}
