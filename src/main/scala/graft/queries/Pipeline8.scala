package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{IndexOps, Portable, ShardOps, TextOps}

/** Round-8 pipeline entries, third batch: the retrieval/layout side of
  * the corpus — positional phrase search, RAG chunking, embedding
  * truncation fidelity, and distributed shard packing.
  */
object Pipeline8 {

  private val wsSql = TextSql.ws

  /** The p95 query phrases — single source of truth: the Spark
    * broadcast table AND the oracle's VALUES list are generated from
    * this Seq. Deliberate shapes: a repeated-token tri-gram ("batch
    * batch batch" — overlapping occurrences must all count), a
    * 3-term phrase, and a phrase with zero corpus hits (the left-join
    * zero path).
    */
  private[graft] val phrases: Seq[String] = Seq(
    "table scan", "hash join", "batch batch batch",
    "stream spark window", "quantum flux")

  private def phraseValuesSql: String =
    phrases.flatMap { p =>
      p.split(" ").zipWithIndex.map { case (t, o) => s"('$p', '$t', $o)" }
    }.mkString(", ")

  /** p96 chunking geometry: 32-token windows every 24 tokens. */
  private val ChunkW = 32
  private val ChunkS = 24

  /** p98 packing geometry: 64-doc prefix buckets, 32 KiB shard budget. */
  private val PackBucket = 64L
  private val PackBudget = 32768L

  /** p99 training depth. */
  private val BpeRounds = 5

  /** DuckDB mirror of [[graft.ops.LmOps.bpeTrainMerges]]: the greedy
    * loop unrolled to `rounds` CTE stages, each picking its round's
    * argmax pair by scalar subquery and folding the literal merge into
    * the next stage's encode — the same data-dependent sequence the
    * Spark loop materializes through its 1-row driver reads.
    */
  private def bpeTrainOracle(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
      WITH w AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
                 FROM (SELECT unnest($wsSql) AS term FROM documents)
                 GROUP BY 1),
      e0 AS (SELECT """ +
      raw"""regexp_replace(term, '(.)', '(\1)', 'g') AS enc, freq FROM w)"""
    for (r <- 1 to rounds) {
      val prev = s"e${r - 1}"
      sb ++= s""",
      s$r AS (SELECT """ +
        raw"""regexp_extract_all(enc, '\(([^)]*)\)', 1) AS s, freq FROM $prev),
      x$r AS (SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS i
              FROM s$r),
      c$r AS (SELECT s[i] AS a, s[i+1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
              FROM x$r GROUP BY 1, 2),
      m$r AS (SELECT a, b, cnt FROM c$r ORDER BY cnt DESC, a, b LIMIT 1),
      e$r AS (SELECT replace(enc,
                '(' || (SELECT a FROM m$r) || ')(' || (SELECT b FROM m$r) || ')',
                '(' || (SELECT a FROM m$r) || (SELECT b FROM m$r) || ')') AS enc,
                freq FROM $prev)"""
    }
    sb ++= "\n      " + (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, a AS left_sym, " +
        s"b AS right_sym, a || b AS merged, cnt AS pair_count FROM m$r")
      .mkString(" UNION ALL ")
    sb ++= "\n      ORDER BY merge_rank"
    sb.result()
  }

  /** The p100 blocklist and its obfuscated injections — single source
    * of truth for the Spark chain AND the oracle SQL. Injections
    * cover the classic evasions: separator insertion ("b.u.y-n0w"),
    * leet digits + spacing ("fr33 m0n3y"), full char-spacing
    * ("c-a-s-i-n-o"), and elongation + leet ("spaaamc0rp").
    */
  private val blocklist = Seq("buynow", "casino", "freemoney", "spamcorp")
  private val spamLetters: Seq[Char] = blocklist.flatMap(_.toSeq).distinct.sorted
  private val spamInjections: Seq[(Long, String)] = Seq(
    7L -> " b.u.y-n0w", 11L -> " fr33 m0n3y",
    13L -> " c-a-s-i-n-o", 17L -> " spaaamc0rp")

  /** DuckDB mirror of [[TextOps.normalizeObfuscated]] over `e`. */
  private def normSql(e: String): String = {
    val base = s"regexp_replace(translate(lower($e), " +
      s"'${TextOps.leetFrom}', '${TextOps.leetTo}'), '[ ._*+!-]', '', 'g')"
    spamLetters.foldLeft(base)((s, c) =>
      s"regexp_replace($s, '$c$c+', '$c', 'g')")
  }

  val all: Seq[Q] = Seq(

    // ---- positional inverted index + phrase search -------------------------
    // p69's BM25 ranks bags of words; this preserves token ORDER — the
    // flat (term, doc, pos) postings table IS the positional index a
    // search build writes, and phrase retrieval is assembled from it
    // without ever self-joining postings: each posting that matches a
    // query term proposes candidate start = pos - offset, and a start
    // with as many matched offsets as the phrase has terms is an
    // occurrence. Overlapping occurrences all count (the repeated-token
    // "batch batch batch" probe), and a phrase with zero hits still
    // reports a row (left join from the phrase dim).
    //
    // Scale shape: ONE broadcast join postings × query-terms (the term
    // filter prunes non-query terms in the scan) + ONE partial-agg
    // keyed (phrase, doc, start) + a phrase-keyed rollup. The postings
    // explode is the only data growth and is the index build itself.
    Q("p95_phrase_index", Some(s"""
      WITH d AS (SELECT doc_id, $wsSql AS ws FROM documents),
      t AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos,
                   unnest(ws) AS term FROM d),
      q(phrase, term, off) AS (VALUES $phraseValuesSql),
      plen AS (SELECT phrase, CAST(count(*) AS BIGINT) AS plen
               FROM q GROUP BY 1),
      c AS (SELECT q.phrase, t.doc_id, t.pos - q.off AS start,
                   count(*) AS nhit
            FROM t JOIN q ON q.term = t.term
            WHERE t.pos - q.off >= 1 GROUP BY 1, 2, 3),
      m AS (SELECT c.phrase, c.doc_id, c.start
            FROM c JOIN plen USING (phrase) WHERE c.nhit = plen.plen)
      SELECT p.phrase, CAST(count(DISTINCT m.doc_id) AS BIGINT) AS n_docs,
             CAST(count(m.doc_id) AS BIGINT) AS n_occ
      FROM plen p LEFT JOIN m ON m.phrase = p.phrase
      GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import spark.implicits._
      val docs = Tables.loadSpread(spark, dir, "documents")
      val post = IndexOps.positionalPostings(docs, "doc_id",
        TextOps.tokens(col("text")))
      val occ = IndexOps.phraseOccurrences(post, "doc_id", phrases)
        .groupBy(col("phrase"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
      phrases.map(Tuple1(_)).toDF("phrase")
        .join(occ, Seq("phrase"), "left")
        .select(col("phrase"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_occ"), lit(0L)).as("n_occ"))
        .orderBy(col("phrase"))
    },

    // ---- RAG overlap-window chunking ---------------------------------------
    // The corpus→retrieval-unit step every RAG/embedding pipeline runs:
    // each document becomes 32-token windows every 24 tokens (8-token
    // overlap so no answer span is cut at a boundary), each chunk
    // carrying its index, token span, and a portable content hash (the
    // chunk's dedup/cache key downstream). A doc shorter than one
    // window still yields exactly one chunk; the last chunk may be
    // short; chunk count = 1 + ceil(max(0, n-W)/S).
    //
    // Scale shape: entirely row-local — transform+slice build the
    // windows inside the scan stage, the explode is the bounded
    // (~n/S per doc) row growth the embedding job itself consumes, and
    // there is NO shuffle (the orderBy is presentation only).
    Q("p96_rag_chunks", Some(s"""
      WITH d AS (SELECT doc_id, $wsSql AS ws FROM documents),
      x AS (SELECT doc_id, ws,
                   unnest(generate_series(0,
                     (greatest(len(ws) - $ChunkW, 0) + ${ChunkS - 1}) // $ChunkS)) AS i
            FROM d),
      c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   CAST(i * $ChunkS + 1 AS BIGINT) AS start_tok,
                   ws[(i * $ChunkS + 1):(i * $ChunkS + $ChunkW)] AS toks
            FROM x)
      SELECT doc_id, chunk_idx, start_tok,
             CAST(len(toks) AS BIGINT) AS n_tok,
             ${Portable.h60Sql("array_to_string(toks, ' ')")} AS chunk_hash
      FROM c ORDER BY doc_id, chunk_idx""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.ragChunks(col("text"), ChunkW, ChunkS)).as("c"))
        .select(col("doc_id"), col("c.idx").as("chunk_idx"),
          (col("c.idx") * ChunkS + 1).as("start_tok"),
          size(col("c.toks")).cast("long").as("n_tok"),
          Portable.h60(array_join(col("c.toks"), " ")).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- matryoshka truncation fidelity ------------------------------------
    // Whether the first 16 of 64 embedding dims retrieve like the full
    // vector — the measurement behind matryoshka-style dimension cuts
    // (4× RAM/bandwidth saved IF fidelity holds). For a fixed 20-query
    // panel: the exact argmax-dot neighbor under the FULL vector vs
    // under the 16-dim prefix, whether they agree, and the full
    // neighbor's RANK under truncated scores (rank 1 = lossless for
    // that query; the rank tail is the recall a truncated first-stage
    // retriever must re-rank away). Scaled-integer dot products
    // (round(x·1e6), the p88/p92 convention) keep both engines exact;
    // ties break toward the smaller vec_id in both.
    //
    // Scale shape: the query panel is FIXED-SIZE (20 queries × 64 dims
    // broadcast — it does not grow with the corpus); one broadcast
    // join + partial-agg computes both dot products in a single pass
    // over the corpus components; argmax is a struct-max aggregate
    // (never a window over the corpus); the rank is one more
    // broadcast-join + count — brute-force exact on purpose, the
    // ground-truth harness IVF/PQ variants are judged against.
    Q("p97_matryoshka_fidelity", Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      q AS (SELECT vec_id AS qid, j, ri AS qi FROM c
            WHERE vec_id % 25 = 0 AND vec_id < 500),
      d AS (SELECT q.qid, c.vec_id AS vid, sum(q.qi * c.ri) AS fulld,
                   sum(CASE WHEN c.j < 16 THEN q.qi * c.ri ELSE 0 END) AS truncd
            FROM c JOIN q ON q.j = c.j AND c.vec_id != q.qid GROUP BY 1, 2),
      f AS (SELECT qid, vid AS full_nn, fulld AS full_score FROM
              (SELECT qid, vid, fulld, row_number() OVER
                 (PARTITION BY qid ORDER BY fulld DESC, vid) AS rn FROM d)
            WHERE rn = 1),
      t AS (SELECT qid, vid AS trunc_nn FROM
              (SELECT qid, vid, row_number() OVER
                 (PARTITION BY qid ORDER BY truncd DESC, vid) AS rn FROM d)
            WHERE rn = 1),
      t0 AS (SELECT f.qid, f.full_nn, d.truncd AS t0
             FROM f JOIN d ON d.qid = f.qid AND d.vid = f.full_nn),
      r AS (SELECT d.qid, CAST(1 + sum(CASE WHEN d.truncd > t0.t0
                     OR (d.truncd = t0.t0 AND d.vid < t0.full_nn)
                   THEN 1 ELSE 0 END) AS BIGINT) AS trunc_rank
            FROM d JOIN t0 ON t0.qid = d.qid GROUP BY 1)
      SELECT f.qid, f.full_nn, t.trunc_nn,
             CAST(CASE WHEN f.full_nn = t.trunc_nn THEN 1 ELSE 0 END
                  AS BIGINT) AS agree,
             CAST(f.full_score AS BIGINT) AS full_score, r.trunc_rank
      FROM f JOIN t ON t.qid = f.qid JOIN r ON r.qid = f.qid
      ORDER BY f.qid""")) { (spark, dir) =>
      val c = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val q = c.where(col("vec_id") % 25 === 0 && col("vec_id") < 500)
        .select(col("vec_id").as("qid"), col("j"), col("ri").as("qi"))
      val d = c.join(broadcast(q), "j")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("qi") * col("ri")).as("fulld"),
          sum(when(col("j") < 16, col("qi") * col("ri")).otherwise(0L))
            .as("truncd"))
      val nn = d.groupBy(col("qid")).agg(
          max(struct(col("fulld"), (-col("vec_id")).as("nv"))).as("f"),
          max(struct(col("truncd"), (-col("vec_id")).as("nv"))).as("t"))
        .select(col("qid"), (-col("f.nv")).as("full_nn"),
          (-col("t.nv")).as("trunc_nn"), col("f.fulld").as("full_score"))
      val t0 = d.join(broadcast(nn.select(col("qid"), col("full_nn"))), "qid")
        .where(col("vec_id") === col("full_nn"))
        .select(col("qid"), col("truncd").as("t0"), col("full_nn"))
      val rank = d.join(broadcast(t0), "qid")
        .groupBy(col("qid"))
        .agg((lit(1L) + sum(when(col("truncd") > col("t0")
            || (col("truncd") === col("t0") && col("vec_id") < col("full_nn")),
          1L).otherwise(0L))).as("trunc_rank"))
      nn.join(rank, "qid")
        .select(col("qid"), col("full_nn"), col("trunc_nn"),
          when(col("full_nn") === col("trunc_nn"), 1L).otherwise(0L)
            .as("agree"),
          col("full_score"), col("trunc_rank"))
        .orderBy(col("qid"))
    },

    // ---- distributed prefix-sum shard packing ------------------------------
    // How a writer cuts 100 TB into ~32 KiB-budget shards in document
    // order WITHOUT the single-partition global window the naive
    // running sum plans to: two-phase distributed scan (per-bucket
    // partial sums → exclusive bucket offsets over the O(#buckets)
    // metadata table → within-bucket windows, every bucket in
    // parallel). Exclusive-prefix div budget assigns shards, so shards
    // are contiguous doc ranges and overshoot the budget by at most
    // one straddling document. The oracle runs the naive global
    // window — the hash match IS the equivalence proof (and
    // ShardPackSpec asserts it against the naive Spark plan too).
    Q("p98_prefix_shard", Some(s"""
      WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS sz FROM documents),
      p AS (SELECT doc_id, sz,
                   sum(sz) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - sz
                     AS pfx
            FROM d)
      SELECT CAST(pfx // $PackBudget AS BIGINT) AS shard_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(sz) AS BIGINT) AS n_chars,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM p GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      ShardOps.packShards(docs, "doc_id", "n_chars",
          bucketWidth = PackBucket, budget = PackBudget)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard_id"))
    },

    // ---- BPE merge training (closes the p46/p87 loop) ----------------------
    // p46 counts one round's merge candidates, p87 APPLIES a learned
    // list — this LEARNS the list: five rounds of the greedy BPE loop
    // (count adjacent symbol pairs weighted by word frequency, merge
    // the most frequent pair, repeat), each round's winner folded into
    // the next round's encode. The oracle unrolls the same five
    // data-dependent rounds as CTE stages with scalar-subquery argmax
    // picks — the hash match proves the full training trajectory, not
    // just one step.
    //
    // Scale shape: the corpus-sized tokenize collapses to the
    // vocabulary-bounded word-frequency table once (persisted); each
    // round is a vocab-sized pair-count partial agg + top-1
    // TakeOrdered, with a 1-row driver read per round (the p51-style
    // aggregate-scalar exception — it reads the ANSWER, not data).
    Q("p99_bpe_train", Some(bpeTrainOracle(BpeRounds))) { (spark, dir) =>
      graft.ops.LmOps.bpeTrainMerges(
        Tables.loadSpread(spark, dir, "documents"), "text", BpeRounds)
        .orderBy(col("merge_rank"))
    },

    // ---- obfuscation-resistant blocklist gating ----------------------------
    // Trust-and-safety filtering that adversaries actually face:
    // blocklist terms hidden by separator insertion, leet digits,
    // char-spacing, and elongation are caught by canonicalizing BOTH
    // the text and the terms into the same space (lower → leet map →
    // strip separators incl. spaces → collapse letter runs). The
    // fixture welds the four classic evasions onto doc_id mod-classes;
    // the raw-substring scan catches none of them (n_raw_visible
    // proves it), the canonical scan catches all. Run collapse is a
    // generated per-letter chain, NOT a `(.)\1+` backreference — the
    // oracle's RE2 has none, and both chains derive from one list.
    //
    // Scale shape: entirely row-local regex/translate work inside the
    // scan stage plus one source-keyed rollup — the cheapest possible
    // gate, which is the point: it runs over ALL 100 TB before
    // anything expensive does.
    Q("p100_blocklist_gate", Some {
      val payload = "text" + spamInjections.map { case (m, s) =>
        s" || CASE WHEN doc_id % $m = 0 THEN '$s' ELSE '' END"
      }.mkString
      val hitCols = blocklist.map { t =>
        val c = TextOps.canonTerm(t, spamLetters)
        s"CAST(sum(CASE WHEN contains(norm, '$c') THEN 1 ELSE 0 END) AS BIGINT) AS n_$t"
      }.mkString(", ")
      val anyHit = blocklist.map { t =>
        val c = TextOps.canonTerm(t, spamLetters)
        s"contains(norm, '$c')"
      }.mkString(" OR ")
      val rawHit = blocklist.map(t => s"contains(lower(payload), '$t')")
        .mkString(" OR ")
      s"""
      WITH d AS (SELECT doc_id, source, $payload AS payload FROM documents),
      n AS (SELECT doc_id, source, payload,
                   ${normSql("payload")} AS norm FROM d)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN $anyHit THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
             CAST(sum(CASE WHEN $rawHit THEN 1 ELSE 0 END) AS BIGINT) AS n_raw_visible,
             $hitCols
      FROM n GROUP BY source ORDER BY source"""
    }) { (spark, dir) =>
      val payload = spamInjections.foldLeft(col("text")) { case (e, (m, s)) =>
        concat(e, when(col("doc_id") % m === 0, lit(s)).otherwise(lit("")))
      }
      val norm = TextOps.normalizeObfuscated(payload, spamLetters)
      val canon = blocklist.map(t => t -> TextOps.canonTerm(t, spamLetters))
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"), payload.as("payload"),
          norm.as("norm"))
      val anyHit = canon.map { case (_, c) => col("norm").contains(c) }
        .reduce(_ || _)
      val rawHit = blocklist.map(t => lower(col("payload")).contains(t))
        .reduce(_ || _)
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(when(anyHit, 1L).otherwise(0L)).as("n_gated")) +:
            (sum(when(rawHit, 1L).otherwise(0L)).as("n_raw_visible")) +:
            canon.map { case (t, c) =>
              sum(when(col("norm").contains(c), 1L).otherwise(0L)).as(s"n_$t")
            }: _*)
        .orderBy(col("source"))
    },

    // ---- leakage-safe cluster-aware train/val/test split -------------------
    // WHY dedup clusters exist: a doc-level hash split puts members of
    // the same near-dup cluster on both sides of the train/eval fence —
    // the eval set then "tests" on paraphrases of training data.
    // Assigning by hash of the CLUSTER id makes straddling impossible
    // by construction; this entry proves it IN THE DATA, computing the
    // straddle count the honest way for both policies: n_leaky_naive
    // (clusters whose members' doc-level hashes land in >1 split —
    // nonzero on the fixture) vs n_leaky_cluster (always 0). 80/10/10
    // via h60(cluster_id) mod 10, deterministic on any cluster.
    //
    // Scale shape: reuses the shared p09/p29 banded-pairs + bounded-CC
    // fixpoint (the p75 curation DAG materializes the same labels once
    // in production); on top of it, split assignment is row-local
    // hashing on the label table and the audit is two cluster/split-
    // keyed partial aggs.
    Q("p101_leakage_split", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      ${Pipeline.clusterLabelsCte},
      asg AS (SELECT d.doc_id,
                     coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                     CASE WHEN ${Portable.h60Sql(
        "concat('split:', CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR))")} % 10 < 8
                          THEN 'train'
                          WHEN ${Portable.h60Sql(
        "concat('split:', CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR))")} % 10 = 8
                          THEN 'val' ELSE 'test' END AS split,
                     CASE WHEN ${Portable.h60Sql(
        "concat('split:', CAST(d.doc_id AS VARCHAR))")} % 10 < 8 THEN 'train'
                          WHEN ${Portable.h60Sql(
        "concat('split:', CAST(d.doc_id AS VARCHAR))")} % 10 = 8 THEN 'val'
                          ELSE 'test' END AS naive_split
              FROM documents d LEFT JOIN lbl l ON l.n = d.doc_id),
      cl AS (SELECT cluster_id, count(DISTINCT naive_split) AS nns,
                    count(DISTINCT split) AS ncs FROM asg GROUP BY 1)
      SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
             CAST(count(DISTINCT CASE WHEN cl.nns > 1 THEN a.cluster_id END)
                  AS BIGINT) AS n_leaky_naive,
             CAST(count(DISTINCT CASE WHEN cl.ncs > 1 THEN a.cluster_id END)
                  AS BIGINT) AS n_leaky_cluster
      FROM asg a JOIN cl USING (cluster_id)
      GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      def splitOf(c: org.apache.spark.sql.Column) = {
        val b = Portable.h60(concat(lit("split:"), c.cast("string"))) % 10
        when(b < 8, "train").when(b === 8, "val").otherwise("test")
      }
      val docs = Tables.loadSpread(spark, dir, "documents")
      // the labels come from the SAME materialized table the p75 DAG
      // uses (SharedStages) — split assignment is row-local hashing on
      // top of it, so the fixpoint cost amortizes across the DAG
      // instead of recurring per consumer
      val asg = docs.select(col("doc_id"))
        .join(SharedStages.labels(spark, dir), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("split", splitOf(col("cluster_id")))
        .withColumn("naive_split", splitOf(col("doc_id")))
      val cl = asg.groupBy(col("cluster_id"))
        .agg(countDistinct(col("naive_split")).as("nns"),
          countDistinct(col("split")).as("ncs"))
      asg.join(cl, "cluster_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          countDistinct(when(col("nns") > 1, col("cluster_id")))
            .as("n_leaky_naive"),
          countDistinct(when(col("ncs") > 1, col("cluster_id")))
            .as("n_leaky_cluster"))
        .orderBy(col("split"))
    }
  )
}
