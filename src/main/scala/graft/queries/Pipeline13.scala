package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Portable, TextOps}

/** Round-9 pipeline entries: the ingest-time incremental dedup path,
  * corpus forensics (source overlap, graph assortativity), and the
  * training-loader accounting ops (sequence packing, vocabulary
  * coverage).
  */
object Pipeline13 {

  private val wsSql = TextSql.ws

  /** Token capacity of one packed training sequence (p124). */
  private val PackCapacity = 256L

  /** Linear-counting correction table for the m=256 HLL (p153):
    * `lc(V) = round(256·ln(256/V))` for V zero registers. Computed
    * ONCE here and embedded as the same integer literals in both the
    * Spark plan and the oracle SQL — the engines never run `ln`
    * themselves, so libm ulp differences can't split the hash. This
    * is the standard small-range estimator HLL switches to when the
    * raw estimate ≤ 2.5m and zero registers exist (the regime daily
    * grains live in; the corpus-scale p121 stays raw).
    */
  private val lcTable: Seq[(Long, Long)] =
    (1L to 256L).map(v => v -> math.round(256.0 * math.log(256.0 / v)))

  /** ONE oracle for both faces of ingest dedup — batch (p122) and
    * streaming foreachBatch (p152). A doc's verdict depends only on
    * the static corpus, so the two entries must hash-match the same
    * SQL; sharing the text makes drift impossible.
    */
  private val incrementalDedupOracle: String = s"""
      WITH ${Pipeline.simhash64Cte},
      blocks AS (SELECT doc_id, 0 AS q, qk0 AS qk FROM sig
                 UNION ALL SELECT doc_id, 1, qk1 FROM sig
                 UNION ALL SELECT doc_id, 2, qk2 FROM sig
                 UNION ALL SELECT doc_id, 3, qk3 FROM sig),
      exb AS (SELECT * FROM blocks WHERE doc_id % 3 <> 0
              QUALIFY COUNT(*) OVER (PARTITION BY q, qk) <= 1000),
      inb AS (SELECT * FROM blocks WHERE doc_id % 3 = 0),
      hits AS (SELECT DISTINCT i.doc_id AS in_id, e.doc_id AS ex_id,
                      bit_count(xor(si.simhash, se.simhash)) AS hamming
               FROM inb i JOIN exb e ON i.q = e.q AND i.qk = e.qk
               JOIN sig si ON si.doc_id = i.doc_id
               JOIN sig se ON se.doc_id = e.doc_id
               WHERE bit_count(xor(si.simhash, se.simhash)) <= 3),
      agg AS (SELECT in_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
                     CAST(MIN(hamming) AS BIGINT) AS min_hamming
              FROM hits GROUP BY 1)
      SELECT d.doc_id,
             coalesce(a.n_dups, 0) AS n_dups,
             coalesce(a.min_hamming, -1) AS min_hamming,
             CAST(CASE WHEN a.in_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS is_dup
      FROM documents d LEFT JOIN agg a ON a.in_id = d.doc_id
      WHERE d.doc_id % 3 = 0 ORDER BY d.doc_id"""

  val all: Seq[Q] = Seq(

    // ---- incremental (ingest-time) near-dup screening ----------------------
    // The dedup path a LIVE corpus actually runs: a new batch arrives
    // (doc_id % 3 = 0 plays the batch; the rest is the standing
    // corpus) and each incoming doc is screened against the corpus
    // WITHOUT re-pairing the corpus against itself — the asymmetric
    // form of the p09 banded-SimHash join (DedupOps.incrementalNearDups).
    // Incoming bands probe the existing bands; the bucket cap guards
    // the EXISTING side (one degenerate corpus key can never explode
    // an ingest); the verdict per incoming doc is (n_dups,
    // min_hamming, is_dup), min_hamming = -1 when nothing matched.
    //
    // Scale shape: |batch| × bucket-width band join — at 100 TB the
    // corpus side is a PRE-banded materialized table (the SharedStages
    // pattern), so an ingest touches only the probed buckets and the
    // quadratic corpus×corpus term never exists.
    Q("p122_incremental_dedup", Some(incrementalDedupOracle)) { (spark, dir) =>
      import graft.ops.DedupOps
      val docs = Tables.loadSpread(spark, dir, "documents")
      // r21: probe the SHARED materialized corpus band table (identical
      // rows: same corpus filter, same maxBucket=1000 cap) instead of
      // re-scanning + re-banding the corpus per execution — the scale
      // comment below was already the design intent; now the code does it
      DedupOps.incrementalNearDupsPreBanded(
          SharedStages.corpusBands(spark, dir),
          incoming = docs.filter(col("doc_id") % 3 === 0),
          id = "doc_id", text = "text",
          maxHamming = 3)
        .select(col("doc_id"), col("n_dups"),
          col("min_hamming").cast("long").as("min_hamming"), col("is_dup"))
        .orderBy(col("doc_id"))
    },

    // ---- cross-source n-gram overlap matrix --------------------------------
    // Corpus forensics before mixing sources into one training set:
    // for every source pair, how many DISCRIMINATIVE 5-gram shingles
    // they share, and the containment of the smaller side —
    // boilerplate detection at the catalog level (two sources sharing
    // 40% of their shingles are the same crawl twice). Discriminative
    // = source-df in [2, 10]: df=1 grams can't overlap anything, and
    // grams in >10 sources are ubiquitous boilerplate that says
    // nothing about any PAIR (and at scale would fan each gram into
    // |S|² pair rows — the cap is the skew guard, mirrored exactly in
    // the oracle).
    //
    // Scale shape: one distinct (source, gram) collapse (map-side
    // combinable), a gram-keyed inverted-index self-join bounded by
    // df ≤ 10 → ≤ 45 pair rows per gram, one pair-keyed count. The
    // pair matrix is O(|sources|²) metadata, never data-sized.
    Q("p123_source_overlap", Some(s"""
      WITH w AS (SELECT source, $wsSql AS ws FROM documents),
      g AS (SELECT DISTINCT source,
                   unnest(${TextSql.shingles("ws", 5)}) AS gm
            FROM w),
      df AS (SELECT gm, COUNT(*) AS sdf FROM g GROUP BY 1),
      gc AS (SELECT g.source, g.gm FROM g JOIN df USING (gm)
             WHERE df.sdf BETWEEN 2 AND 10),
      sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
             FROM gc GROUP BY 1),
      pr AS (SELECT x.source AS sa, y.source AS sb,
                    CAST(COUNT(*) AS BIGINT) AS n_shared
             FROM gc x JOIN gc y ON x.gm = y.gm AND x.source < y.source
             GROUP BY 1, 2)
      SELECT pr.sa, pr.sb, pr.n_shared,
             za.n_grams AS n_grams_a, zb.n_grams AS n_grams_b,
             CAST(pr.n_shared * 1000000
                  // least(za.n_grams, zb.n_grams) AS BIGINT)
               AS containment_ppm
      FROM pr JOIN sz za ON za.source = pr.sa
              JOIN sz zb ON zb.source = pr.sb
      ORDER BY 1, 2""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      // localCheckpoint: sz and pr both consume gc twice — without it
      // Spark re-tokenizes and re-shingles the corpus once per
      // consumer (4 full scans); with it the capped gram table
      // materializes once (the same dedup-of-work the SharedStages
      // parquet tables buy across queries, here within one plan)
      val g = docs
        .select(col("source"),
          explode(TextOps.shingles(col("text"), 5)).as("gm"))
        .distinct()
        .localCheckpoint()
      val gc = g.join(
          g.groupBy(col("gm")).agg(count(lit(1)).as("sdf"))
            .filter(col("sdf").between(2, 10)),
          "gm")
        .select(col("source"), col("gm"))
        .localCheckpoint()
      val sz = gc.groupBy(col("source")).agg(count(lit(1)).as("n_grams"))
      val pr = gc.select(col("gm"), col("source").as("sa"))
        .join(gc.select(col("gm"), col("source").as("sb")), "gm")
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).as("n_shared"))
      pr.join(broadcast(sz.select(col("source").as("sa"),
          col("n_grams").as("n_grams_a"))), "sa")
        .join(broadcast(sz.select(col("source").as("sb"),
          col("n_grams").as("n_grams_b"))), "sb")
        .select(col("sa"), col("sb"), col("n_shared"),
          col("n_grams_a"), col("n_grams_b"),
          expr("n_shared * 1000000 div least(n_grams_a, n_grams_b)")
            .as("containment_ppm"))
        .orderBy(col("sa"), col("sb"))
    },

    // ---- training-sequence packing (concat-and-chop accounting) ------------
    // The loader step between a filtered corpus and a GPU: documents
    // are concatenated in doc order and chopped into fixed
    // 256-token sequences (the GPT-style packing that wastes zero
    // padding), and THIS entry is the accounting a data engineer
    // actually reads off that plan: per pack, how many docs start in
    // it, their token mass, how many straddle the boundary (cross-doc
    // attention leakage sites), and the spilled token volume. All
    // exact integer prefix-sum math.
    //
    // Scale shape: the prefix sum is ShardOps.packShards' two-phase
    // distributed scan (per-bucket partials → O(#buckets) offsets →
    // per-bucket windows) — NOT the naive single-partition global
    // window; the oracle runs the naive window and the hash match is
    // the equivalence proof (the p98 pattern at a different grain).
    Q("p124_sequence_packing", Some(s"""
      WITH d AS (SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS n
                 FROM documents WHERE len($wsSql) > 0),
      p AS (SELECT doc_id, n,
                   sum(n) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                     AS pfx
            FROM d),
      x AS (SELECT doc_id, n, pfx,
                   pfx // $PackCapacity AS pack_id,
                   (pfx + n - 1) // $PackCapacity AS pack_last
            FROM p)
      SELECT CAST(pack_id AS BIGINT) AS pack_id,
             CAST(count(*) AS BIGINT) AS n_docs_started,
             CAST(sum(n) AS BIGINT) AS n_tokens_started,
             CAST(sum(CASE WHEN pack_last > pack_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_straddlers,
             CAST(sum(greatest(0, pfx + n - (pack_id + 1) * $PackCapacity))
               AS BIGINT) AS tokens_spilled
      FROM x GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import graft.ops.ShardOps
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
        .filter(col("n") > 0)
      ShardOps.packShards(d, "doc_id", "n",
          bucketWidth = 512L, budget = PackCapacity)
        .withColumn("pack_last",
          expr(s"(pfx + n - 1) div $PackCapacity"))
        .groupBy(col("shard_id").as("pack_id"))
        .agg(count(lit(1)).as("n_docs_started"),
          sum(col("n")).as("n_tokens_started"),
          sum(when(col("pack_last") > col("shard_id"), 1L).otherwise(0L))
            .as("n_straddlers"),
          sum(greatest(lit(0L),
            col("pfx") + col("n")
              - (col("shard_id") + 1) * lit(PackCapacity)))
            .as("tokens_spilled"))
        .orderBy(col("pack_id"))
    },

    // ---- pre-join skew audit (heavy-hitter report) -------------------------
    // The report you read BEFORE launching a 100 TB join: for each
    // join-key family, the top-5 heavy hitters with their row share in
    // ppm — the keys that need salting or an AQE skew split. Exact
    // counts (the CMS entry estimates; this is the planning-table
    // truth), deterministic tie-break toward the smaller key.
    //
    // Scale shape: one partial-agg count per key family (map-side
    // combinable), then the top-5 runs over the COUNT table — key
    // cardinality, not row count; rank via per-family window on that
    // bounded table.
    Q("p125_skew_audit", Some("""
      WITH c AS (
        SELECT 'events.user_id' AS rel, CAST(user_id AS BIGINT) AS k,
               COUNT(*) AS n FROM events GROUP BY 2
        UNION ALL
        SELECT 'lineitem.l_partkey', CAST(l_partkey AS BIGINT), COUNT(*)
        FROM lineitem GROUP BY 2
        UNION ALL
        SELECT 'orders.o_custkey', CAST(o_custkey AS BIGINT), COUNT(*)
        FROM orders GROUP BY 2),
      t AS (SELECT rel, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1),
      r AS (SELECT rel, k, n,
                   row_number() OVER (PARTITION BY rel
                                      ORDER BY n DESC, k) AS rk
            FROM c)
      SELECT r.rel, CAST(r.rk AS BIGINT) AS rank, r.k AS key_val,
             CAST(r.n AS BIGINT) AS n,
             CAST(r.n * 1000000 // t.total AS BIGINT) AS share_ppm,
             t.total
      FROM r JOIN t USING (rel) WHERE r.rk <= 5
      ORDER BY 1, 2""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val fams = Seq(
        ("events.user_id", "events", "user_id"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("orders.o_custkey", "orders", "o_custkey"))
      val counts = fams.map { case (rel, tbl, key) =>
        Tables.load(spark, dir, tbl)
          .groupBy(col(key).cast("long").as("k"))
          .agg(count(lit(1)).as("n"))
          .select(lit(rel).as("rel"), col("k"), col("n"))
      }.reduce(_ union _)
      val totals = counts.groupBy(col("rel")).agg(sum(col("n")).as("total"))
      counts
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("rel"))
            .orderBy(col("n").desc, col("k"))))
        .filter(col("rank") <= 5)
        .join(broadcast(totals), "rel")
        .select(col("rel"), col("rank").cast("long").as("rank"),
          col("k").as("key_val"), col("n"),
          expr("n * 1000000 div total").as("share_ppm"), col("total"))
        .orderBy(col("rel"), col("rank"))
    },

    // ---- per-label embedding drift across training epochs ------------------
    // Model-ops monitoring: split the embedding snapshots into two
    // "epochs" (vec_id parity stands in for snapshot version) and
    // measure, per label, the cosine between the two epoch CENTROIDS —
    // the drift alarm that catches a class whose representation moved.
    // Centroid cosine = sum-vector cosine (the 1/n cancels), so the
    // aggregation is exact scaled-integer sums (round(x·1000) per
    // component — deterministic across engines, unlike a float sum
    // whose value depends on reduction order); only the final
    // norm/divide runs in doubles, on bit-identical integer inputs.
    //
    // Scale shape: one (label, epoch, dim) partial agg over an
    // exploded scan — map-side combinable, output O(labels × dims);
    // the cosine join runs on that metadata-sized table.
    Q("p126_embedding_drift", Some("""
      WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        vec_id % 2 AS e, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      c AS (SELECT vec_id, label, e,
                   unnest(generate_series(1, len(v))) AS j, unnest(v) AS x
            FROM v),
      s AS (SELECT label, e, j,
                   CAST(SUM(CAST(round(x * 1000) AS BIGINT)) AS BIGINT) AS s
            FROM c GROUP BY 1, 2, 3),
      n AS (SELECT label, e, CAST(COUNT(*) AS BIGINT) AS n_vecs
            FROM v GROUP BY 1, 2),
      d AS (SELECT s0.label,
                   CAST(SUM(s0.s * s1.s) AS BIGINT) AS dot,
                   CAST(SUM(s0.s * s0.s) AS BIGINT) AS nrm0,
                   CAST(SUM(s1.s * s1.s) AS BIGINT) AS nrm1
            FROM s s0 JOIN s s1 ON s0.label = s1.label AND s0.j = s1.j
            WHERE s0.e = 0 AND s1.e = 1 GROUP BY 1)
      SELECT d.label, n0.n_vecs AS n_vecs_e0, n1.n_vecs AS n_vecs_e1,
             d.dot, d.nrm0, d.nrm1,
             round(CAST(d.dot AS DOUBLE) / sqrt(CAST(d.nrm0 AS DOUBLE))
                   / sqrt(CAST(d.nrm1 AS DOUBLE)), 6) AS centroid_cos
      FROM d JOIN n n0 ON n0.label = d.label AND n0.e = 0
             JOIN n n1 ON n1.label = d.label AND n1.e = 1
      ORDER BY d.label""")) { (spark, dir) =>
      val v = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          (col("vec_id") % 2).as("e"),
          col("embedding").cast("array<double>").as("v"))
      val s = v.select(col("label"), col("e"),
          posexplode(col("v")).as(Seq("j", "x")))
        .groupBy(col("label"), col("e"), col("j"))
        .agg(sum(round(col("x") * 1000, 0).cast("long")).as("s"))
      val n = v.groupBy(col("label"), col("e"))
        .agg(count(lit(1)).as("n_vecs"))
      val d = s.filter(col("e") === 0)
        .select(col("label"), col("j"), col("s").as("s0"))
        .join(s.filter(col("e") === 1)
          .select(col("label"), col("j"), col("s").as("s1")),
          Seq("label", "j"))
        .groupBy(col("label"))
        .agg(sum(col("s0") * col("s1")).as("dot"),
          sum(col("s0") * col("s0")).as("nrm0"),
          sum(col("s1") * col("s1")).as("nrm1"))
      d.join(broadcast(n.filter(col("e") === 0)
          .select(col("label"), col("n_vecs").as("n_vecs_e0"))), "label")
        .join(broadcast(n.filter(col("e") === 1)
          .select(col("label"), col("n_vecs").as("n_vecs_e1"))), "label")
        .select(col("label"), col("n_vecs_e0"), col("n_vecs_e1"),
          col("dot"), col("nrm0"), col("nrm1"),
          round(col("dot").cast("double")
            / sqrt(col("nrm0").cast("double"))
            / sqrt(col("nrm1").cast("double")), 6).as("centroid_cos"))
        .orderBy(col("label"))
    },

    // ---- degree assortativity of the near-dup graph ------------------------
    // The p105 triangle census's companion diagnostic: Pearson
    // correlation of endpoint degrees over the (symmetrized) near-dup
    // edges. Positive r = dup clusters link big-to-big (crawl
    // families); strongly negative r = hub-and-spoke boilerplate
    // (one template linking everything) — a different failure mode
    // than low transitivity, and the number that says WHICH. All
    // moment sums are exact integers on the bounded pair graph; only
    // the final normalization runs in doubles on those exact inputs.
    // By edge symmetry Σx = Σy and Σx² = Σy², so one pair of sums
    // serves both margins.
    //
    // Scale shape: edges are the shared banded p09 spairs (df-capped,
    // never all-pairs); degrees are one node-keyed agg; the moment
    // rollup is a single 1-row reduce. No data-sized window, no
    // collect.
    Q("p127_degree_assortativity", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      esym AS (SELECT a AS u, b AS v FROM spairs
               UNION ALL SELECT b, a FROM spairs),
      deg AS (SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS d
              FROM esym GROUP BY 1),
      ed AS (SELECT du.d AS x, dv.d AS y
             FROM esym e JOIN deg du ON du.n = e.u
                         JOIN deg dv ON dv.n = e.v),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM ed)
      SELECT n AS n_edges, sx, sxx, sxy,
             round(CAST(n * sxy - sx * sx AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS assort_r
      FROM m""")) { (spark, dir) =>
      val spairs = SharedStages.spairs(spark, dir)
        .select(col("a"), col("b"))
      val esym = spairs.select(col("a").as("u"), col("b").as("v"))
        .union(spairs.select(col("b").as("u"), col("a").as("v")))
      val deg = esym.groupBy(col("u").as("n")).agg(count(lit(1)).as("d"))
      esym
        .join(deg.select(col("n").as("u"), col("d").as("x")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("y")), "v")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n").as("n_edges"), col("sx"), col("sxx"), col("sxy"),
          round((col("n") * col("sxy") - col("sx") * col("sx"))
            .cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6).as("assort_r"))
    },

    // ---- tokenizer vocabulary coverage curve -------------------------------
    // The sizing table behind every "how big should the vocab be"
    // decision: rank token types by corpus frequency and report, for
    // vocab budgets 100 / 1 000 / 10 000, how much of the RUNNING TEXT
    // a top-k vocabulary covers (Zipf in practice: the top 100 types
    // usually cover half the stream). Exact integers end to end.
    //
    // Scale shape: the corpus-sized tokenize collapses to the
    // vocabulary-bounded frequency table in one map-side-combinable
    // agg (Heaps' law caps it); the rank window and budget probe run
    // on THAT table, never on the token stream.
    Q("p128_vocab_coverage", Some(s"""
      WITH t AS (SELECT unnest($wsSql) AS tok FROM documents),
      f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                     CAST(COUNT(*) AS BIGINT) AS n_types FROM f),
      r AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rk
            FROM f),
      v(vocab_size) AS (VALUES (100), (1000), (10000))
      SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size, t.n_types, t.total,
             CAST(SUM(CASE WHEN r.rk <= v.vocab_size THEN r.n ELSE 0 END)
               AS BIGINT) AS n_covered,
             CAST(SUM(CASE WHEN r.rk <= v.vocab_size THEN r.n ELSE 0 END)
                  * 1000000 // t.total AS BIGINT) AS coverage_ppm
      FROM r CROSS JOIN v CROSS JOIN tot t
      GROUP BY 1, 2, 3 ORDER BY 1""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.loadSpread(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val tot = f.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_types"))
      val r = f.withColumn("rk",
        row_number().over(Window.orderBy(col("n").desc, col("tok"))))
      val v = spark.range(0, 3)
        .select(pow(lit(10), col("id") + 2).cast("long").as("vocab_size"))
      r.crossJoin(broadcast(v)).crossJoin(broadcast(tot))
        .groupBy(col("vocab_size"), col("n_types"), col("total"))
        .agg(sum(when(col("rk") <= col("vocab_size"), col("n"))
          .otherwise(0L)).as("n_covered"))
        .select(col("vocab_size"), col("n_types"), col("total"),
          col("n_covered"),
          expr("n_covered * 1000000 div total").as("coverage_ppm"))
        .orderBy(col("vocab_size"))
    },

    // ---- k-NN hubness census -----------------------------------------------
    // The ANN-quality pathology check: a "hub" vector appears in
    // everyone's top-k list (a known curse-of-dimensionality failure
    // that silently wrecks retrieval diversity). Over the fixed
    // 20-query panel (the p103 convention), count how many top-5
    // lists each corpus vector occupies. Scaled-integer dots
    // (round(x·1e6)) keep ranking deterministic across engines.
    //
    // Scale shape: ONE partial-agg pass computes every (query, vec)
    // dot against the broadcast panel; per-query top-5 uses the
    // bounded TopN kernel (map-side partials of ≤ n pairs — never a
    // corpus-sized window partition); the census is a count over the
    // 100-row top table.
    Q("p129_ann_hubness", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      q AS (SELECT vec_id AS qid, j, ri AS qi FROM c WHERE vec_id < 20),
      d AS (SELECT q.qid, c.vec_id AS vid, SUM(q.qi * c.ri) AS dot
            FROM c JOIN q ON q.j = c.j AND c.vec_id != q.qid GROUP BY 1, 2),
      top AS (SELECT qid, vid FROM
                (SELECT qid, vid, row_number() OVER (PARTITION BY qid
                   ORDER BY dot DESC, vid) AS rk FROM d)
              WHERE rk <= 5)
      SELECT vid AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM top GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import graft.functions.TopN
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val c = emb.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val q = c.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("j"), col("ri").as("qi"))
      c.join(broadcast(q), "j")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("qi") * col("ri")).as("dot"))
        // top-5 by dot desc, ties to smaller vid = min over (-dot, vid)
        .groupBy(col("qid"))
        .agg(TopN.minTopN(-col("dot"), col("vec_id"), 5).as("top"))
        .select(explode(col("top.id")).as("vec_id"))
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_lists"))
        .orderBy(col("vec_id"))
    },

    // ---- dataset card rollup -----------------------------------------------
    // The per-source summary a dataset card publishes: doc and token
    // counts, corpus share, mean doc length, language census with the
    // dominant language and its share. Exact integers (mean length in
    // tokens-per-1000-docs form; shares in ppm); the dominant-language
    // argmax is a struct-extremum aggregate with the (n, lang)
    // tie-break mirrored as a ranked window in the oracle.
    //
    // Scale shape: two keyed partial aggs ((source, lang) then
    // source) plus one corpus-total broadcast — the output is catalog
    // metadata, O(|sources|).
    Q("p130_dataset_card", Some(s"""
      WITH d AS (SELECT source, lang, CAST(len($wsSql) AS BIGINT) AS n
                 FROM documents),
      sl AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(n) AS BIGINT) AS n_toks
             FROM d GROUP BY 1, 2),
      s AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_langs
            FROM sl GROUP BY 1),
      dom AS (SELECT source, lang AS top_lang, n_docs AS top_lang_docs FROM
                (SELECT sl.*, row_number() OVER (PARTITION BY source
                   ORDER BY n_docs DESC, lang DESC) AS rk FROM sl)
              WHERE rk = 1),
      tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens FROM s)
      SELECT s.source, s.n_docs, s.n_tokens,
             CAST(s.n_tokens * 1000000 // t.corpus_tokens AS BIGINT)
               AS token_share_ppm,
             CAST(s.n_tokens * 1000 // s.n_docs AS BIGINT)
               AS mean_len_milli,
             s.n_langs, dom.top_lang,
             CAST(dom.top_lang_docs * 1000000 // s.n_docs AS BIGINT)
               AS top_lang_share_ppm
      FROM s JOIN dom USING (source) CROSS JOIN tot t
      ORDER BY s.source""")) { (spark, dir) =>
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("source"), col("lang"),
          TextOps.tokenCount(col("text")).as("n"))
      val sl = d.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_toks"))
      val s = sl.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          count(lit(1)).as("n_langs"))
      // dominant language: max over (n_docs, lang) — more docs wins,
      // lexicographically LARGER lang breaks ties (struct max), the
      // exact mirror of the oracle's ORDER BY n_docs DESC, lang DESC
      val dom = sl.groupBy(col("source"))
        .agg(max(struct(col("n_docs"), col("lang"))).as("m"))
        .select(col("source"), col("m.lang").as("top_lang"),
          col("m.n_docs").as("top_lang_docs"))
      val tot = s.agg(sum(col("n_tokens")).as("corpus_tokens"))
      s.join(broadcast(dom), "source").crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("n_tokens * 1000000 div corpus_tokens")
            .as("token_share_ppm"),
          expr("n_tokens * 1000 div n_docs").as("mean_len_milli"),
          col("n_langs"), col("top_lang"),
          expr("top_lang_docs * 1000000 div n_docs")
            .as("top_lang_share_ppm"))
        .orderBy(col("source"))
    },

    // ---- k-anonymity audit over quasi-identifiers --------------------------
    // The privacy-side sibling of the p109 PII redaction: group the
    // customer table by the quasi-identifier pair (market segment,
    // nation) and measure re-identification exposure — how many
    // QI groups and rows sit below anonymity thresholds k ∈ {5, 20}.
    // The report is the bucketed group-size histogram every release
    // review reads: a group of size 1 is an individual in the clear.
    //
    // Scale shape: one QI-keyed partial agg collapses the table to
    // O(|QI combinations|) group sizes; the bucket rollup runs on
    // that metadata table. No row leaves the executor un-aggregated.
    Q("p131_k_anonymity", Some("""
      WITH g AS (SELECT c_mktsegment AS seg, CAST(c_nationkey AS BIGINT)
                        AS nat, CAST(COUNT(*) AS BIGINT) AS n
                 FROM customer GROUP BY 1, 2),
      b AS (SELECT CASE WHEN n < 5 THEN 'k_lt_5'
                        WHEN n < 20 THEN 'k_5_to_19'
                        ELSE 'k_ge_20' END AS bucket, n
            FROM g)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MIN(n) AS BIGINT) AS min_group,
             CAST(MAX(n) AS BIGINT) AS max_group
      FROM b GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val g = Tables.load(spark, dir, "customer")
        .groupBy(col("c_mktsegment").as("seg"),
          col("c_nationkey").cast("long").as("nat"))
        .agg(count(lit(1)).as("n"))
      g.select(when(col("n") < 5, "k_lt_5")
          .when(col("n") < 20, "k_5_to_19")
          .otherwise("k_ge_20").as("bucket"), col("n"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_rows"),
          min(col("n")).as("min_group"), max(col("n")).as("max_group"))
        .orderBy(col("bucket"))
    },

    // ---- equi-depth histogram (CBO statistics collection) ------------------
    // The statistics pass a cost-based optimizer runs over a fact
    // column: 10 equi-depth buckets of l_extendedprice via ntile over
    // the total (value, rowkey) order — deterministic in both engines
    // (ties split by the unique key, exactly the p118 decile
    // convention). Per bucket: row count, exact [lo, hi] bounds, and
    // distinct-value count — the selectivity table a 100 TB join
    // planner consults before choosing broadcast vs shuffle.
    //
    // Scale shape: the rank is ONE total-order window (at production
    // scale this runs on a sampled scan — the SHAPE is identical);
    // the per-bucket rollup is a 10-group partial agg.
    Q("p132_equidepth_histogram", Some("""
      WITH v AS (SELECT l_orderkey, l_linenumber,
                        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                 FROM lineitem),
      n AS (SELECT cents,
                   ntile(10) OVER (ORDER BY cents, l_orderkey, l_linenumber)
                     AS bucket
            FROM v)
      SELECT CAST(bucket AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(cents) AS BIGINT) AS lo_cents,
             CAST(MAX(cents) AS BIGINT) AS hi_cents,
             CAST(COUNT(DISTINCT cents) AS BIGINT) AS n_distinct
      FROM n GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      // round, not truncate: DuckDB's double→BIGINT cast rounds while
      // Spark's truncates — an explicit round on both sides is the
      // only portable cents conversion
      val v = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      v.withColumn("bucket", ntile(10).over(
          Window.orderBy(col("cents"), col("l_orderkey"),
            col("l_linenumber"))))
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_rows"), min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"),
          countDistinct(col("cents")).as("n_distinct"))
        .orderBy(col("bucket"))
    },

    // ---- freshness-decayed replay-sampling manifest ------------------------
    // Continual-pretraining data mixing: when replaying an event
    // stream into training, fresh data outweighs stale data by a
    // half-life decay. Weights stay EXACT integers by making the
    // decay a bit shift: weight_ppm = 1_000_000 >> (age_days / 30) —
    // a halving per 30 days that both engines compute identically
    // (shift capped at 40: older than ~3 years rounds to zero, a
    // defined truncation). The manifest allocates a 10 000-sample
    // budget per event type proportional to decayed mass — the
    // sampler downstream just reads quotas.
    //
    // Scale shape: age anchors on the global max event day (one 1-row
    // broadcast); everything else is a single (type)-keyed partial
    // agg of integer weights in the scan stage.
    Q("p133_freshness_quota", Some("""
      WITH b AS (SELECT CAST(max(date_trunc('day', ts)) AS DATE) AS anchor
                 FROM events),
      w AS (SELECT e.event_type,
                   CAST(1000000 >> least(40, date_diff('day',
                     CAST(date_trunc('day', e.ts) AS DATE), b.anchor) // 30)
                     AS BIGINT) AS wt
            FROM events e CROSS JOIN b),
      m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(wt) AS BIGINT) AS mass
            FROM w GROUP BY 1),
      t AS (SELECT CAST(SUM(mass) AS BIGINT) AS total FROM m)
      SELECT m.event_type, m.n_events, m.mass,
             CAST(m.mass * 10000 // t.total AS BIGINT) AS quota
      FROM m CROSS JOIN t ORDER BY 1""")) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .select(col("event_type"),
          date_trunc("DAY", col("ts")).cast("date").as("d"))
      val anchor = ev.agg(max(col("d")).as("anchor"))
      val m = ev.crossJoin(broadcast(anchor))
        .select(col("event_type"),
          expr("shiftright(1000000L, CAST(least(40, " +
            "datediff(anchor, d) div 30) AS INT))").as("wt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("wt")).as("mass"))
      m.crossJoin(broadcast(m.agg(sum(col("mass")).as("total"))))
        .select(col("event_type"), col("n_events"), col("mass"),
          expr("mass * 10000 div total").as("quota"))
        .orderBy(col("event_type"))
    },

    // ---- join-cardinality estimate vs truth --------------------------------
    // The System-R textbook estimator every CBO still runs:
    // |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) under the uniformity +
    // containment assumptions — here computed EXACTLY (integer
    // counts, exact NDVs) next to the TRUE join cardinality, with the
    // signed error in ppm. Two key pairs: the clean FK edge
    // (orders⋈lineitem, where containment holds and the estimate is
    // nearly exact) and the skewed semi-accidental edge
    // (customer⋈events on user id, where uniformity breaks) — the
    // table that teaches WHEN to trust the estimator.
    //
    // Scale shape: counts and NDVs are per-table partial aggs; the
    // true cardinality is Σ_k cntA(k)·cntB(k) over the two COUNT
    // tables joined on the key — never the materialized join itself.
    Q("p134_join_card_estimate", Some("""
      WITH oa AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv
                  FROM orders),
      lb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv
             FROM lineitem),
      ol AS (SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS actual FROM
               (SELECT o_orderkey AS k, COUNT(*) AS n FROM orders
                GROUP BY 1) a
               JOIN (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem
                     GROUP BY 1) b USING (k)),
      ca AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS ndv
             FROM customer),
      eb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv
             FROM events),
      ce AS (SELECT CAST(SUM(a.n * b.n) AS BIGINT) AS actual FROM
               (SELECT c_custkey AS k, COUNT(*) AS n FROM customer
                GROUP BY 1) a
               JOIN (SELECT user_id AS k, COUNT(*) AS n FROM events
                     GROUP BY 1) b USING (k)),
      r AS (
        SELECT 'orders_x_lineitem' AS pair, oa.n AS n_left, lb.n AS n_right,
               oa.ndv AS ndv_left, lb.ndv AS ndv_right,
               CAST(oa.n * lb.n // greatest(oa.ndv, lb.ndv) AS BIGINT)
                 AS est, ol.actual
        FROM oa, lb, ol
        UNION ALL
        SELECT 'customer_x_events', ca.n, eb.n, ca.ndv, eb.ndv,
               CAST(ca.n * eb.n // greatest(ca.ndv, eb.ndv) AS BIGINT),
               ce.actual
        FROM ca, eb, ce)
      SELECT pair, n_left, n_right, ndv_left, ndv_right, est, actual,
             CAST((est - actual) * 1000000 // actual AS BIGINT)
               AS signed_err_ppm
      FROM r ORDER BY 1""")) { (spark, dir) =>
      def stats(tbl: String, key: String) = {
        val t = Tables.load(spark, dir, tbl)
        (t.agg(count(lit(1)).as("n"),
          countDistinct(col(key)).as("ndv")),
          t.groupBy(col(key).as("k")).agg(count(lit(1)).as("n")))
      }
      def pairRow(name: String, a: (org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame), b: (org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame)) = {
        val actual = a._2.join(b._2.select(col("k"),
            col("n").as("nb")), "k")
          .agg(sum(col("n") * col("nb")).as("actual"))
        a._1.select(col("n").as("n_left"), col("ndv").as("ndv_left"))
          .crossJoin(b._1.select(col("n").as("n_right"),
            col("ndv").as("ndv_right")))
          .crossJoin(actual)
          .select(lit(name).as("pair"), col("n_left"), col("n_right"),
            col("ndv_left"), col("ndv_right"),
            expr("n_left * n_right div greatest(ndv_left, ndv_right)")
              .as("est"), col("actual"))
      }
      pairRow("orders_x_lineitem",
          stats("orders", "o_orderkey"), stats("lineitem", "l_orderkey"))
        .union(pairRow("customer_x_events",
          stats("customer", "c_custkey"), stats("events", "user_id")))
        .select(col("*"),
          expr("(est - actual) * 1000000 div actual").as("signed_err_ppm"))
        .orderBy(col("pair"))
    },

    // ---- arrival-order lateness profile (watermark sizing) -----------------
    // The measurement that tells you WHAT WATERMARK TO CONFIGURE:
    // replay the stream in arrival order and compute each event's
    // lateness = how far its event time lags the max event time
    // already seen — exactly the quantity a streaming watermark
    // trades off against state size. The fixture stream is ts-ordered
    // (zero lateness), so a deterministic at-least-once replay tail
    // is WELDED on (the p114 convention): every event_id % 97 == 0
    // event is redelivered after the entire original stream, in id
    // order — late by the whole remaining span, spreading the
    // histogram across its buckets. Reported as the on-time/late
    // histogram with exact microsecond bounds.
    // The running max is the SAME two-phase distributed scan as
    // ShardOps (per-bucket partial maxes → exclusive bucket prefix
    // over the O(#buckets) table → within-bucket windows); the oracle
    // runs the naive single-partition global window and the hash
    // match is the equivalence proof.
    Q("p135_lateness_profile", Some("""
      WITH mx AS (SELECT CAST(max(event_id) + 1 AS BIGINT) AS m FROM events),
      e AS (SELECT CAST(event_id AS BIGINT) AS seq,
                   CAST(epoch_us(ts) AS BIGINT) AS us FROM events
            UNION ALL
            SELECT mx.m + event_id, CAST(epoch_us(ts) AS BIGINT)
            FROM events CROSS JOIN mx WHERE event_id % 97 = 0),
      r AS (SELECT seq, us,
                   max(us) OVER (ORDER BY seq
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS seen
            FROM e),
      l AS (SELECT seq,
                   greatest(0, coalesce(seen - us, 0)) AS late_us
            FROM r),
      b AS (SELECT CASE WHEN late_us = 0 THEN '0_on_time'
                        WHEN late_us <= 60000000 THEN '1_under_1m'
                        WHEN late_us <= 300000000 THEN '2_under_5m'
                        WHEN late_us <= 1800000000 THEN '3_under_30m'
                        ELSE '4_over_30m' END AS bucket, late_us
            FROM l)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(MAX(late_us) AS BIGINT) AS max_late_us,
             CAST(SUM(late_us) AS BIGINT) AS sum_late_us
      FROM b GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val bucketWidth = 4096L
      val base = Tables.load(spark, dir, "events")
        .select(col("event_id").cast("long").as("event_id"),
          unix_micros(col("ts")).as("us"))
      val mx = base.agg((max(col("event_id")) + 1).as("m"))
      val replay = base.filter(col("event_id") % 97 === 0)
        .crossJoin(broadcast(mx))
        .select((col("m") + col("event_id")).as("seq"), col("us"))
      val e = base.select(col("event_id").as("seq"), col("us"))
        .union(replay)
        .withColumn("__bk", expr(s"seq div $bucketWidth"))
      // two-phase exclusive running max (the ShardOps pattern with
      // max instead of sum): bucket partial maxes → exclusive prefix
      // max over the bucket metadata table → per-bucket windows
      val offs = e.groupBy(col("__bk")).agg(max(col("us")).as("__bmax"))
        .withColumn("__prev", max(col("__bmax")).over(
          Window.orderBy(col("__bk"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("__bk"), col("__prev"))
      val inBucket = Window.partitionBy(col("__bk"))
        .orderBy(col("seq"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.join(broadcast(offs), "__bk")
        .withColumn("seen",
          greatest(coalesce(max(col("us")).over(inBucket), lit(Long.MinValue)),
            coalesce(col("__prev"), lit(Long.MinValue))))
        .withColumn("late_us",
          when(col("seen") === Long.MinValue, 0L)
            .otherwise(greatest(lit(0L), col("seen") - col("us"))))
        .select(
          when(col("late_us") === 0, "0_on_time")
            .when(col("late_us") <= 60000000L, "1_under_1m")
            .when(col("late_us") <= 300000000L, "2_under_5m")
            .when(col("late_us") <= 1800000000L, "3_under_30m")
            .otherwise("4_over_30m").as("bucket"),
          col("late_us"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_events"),
          max(col("late_us")).as("max_late_us"),
          sum(col("late_us")).as("sum_late_us"))
        .orderBy(col("bucket"))
    },

    // ---- salted skew join, equivalence-proven ------------------------------
    // The hot-key defense spelled out as a plan: the skewed fact side
    // (events.user_id — p125 shows its hitters) gets a deterministic
    // salt (event_id % 8); the dim side is exploded ×8 so every
    // (key, salt) pair finds its partner; the join key becomes
    // (user_id, salt), splitting each hot key's row mass over 8
    // reducers. The oracle runs the PLAIN join — the hash match is
    // the proof that salting is semantics-preserving, which is the
    // entire point of the technique. Money stays exact (cents via
    // round before any aggregation).
    //
    // Scale shape: the dim explode costs ×8 of the SMALL side; the
    // fact side's per-reducer ceiling drops ×8. At 100 TB this is
    // the difference between one straggler task and a balanced
    // stage (AQE's skew split does this adaptively; the salt is the
    // static form that also works pre-AQE and for stateful sinks).
    Q("p136_salted_join", Some("""
      WITH j AS (SELECT c.c_mktsegment AS seg,
                        CAST(round(e.value * 100) AS BIGINT) AS cents
                 FROM events e JOIN customer c ON e.user_id = c.c_custkey)
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM j GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val salts = 8
      val ev = Tables.load(spark, dir, "events")
        .select(col("user_id"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          pmod(col("event_id"), lit(salts)).as("salt"))
      val cust = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
        .crossJoin(spark.range(0, salts).select(col("id").as("salt")))
      ev.join(cust, Seq("user_id", "salt"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("seg"))
    },

    // ---- data-quality expectations suite -----------------------------------
    // The release gate a 100 TB ingest runs before anything trains on
    // it: a fixed battery of expectations, one verdict row each —
    // uniqueness (duplicate customer keys), referential integrity
    // (lineitem orphans vs orders), range validity (negative event
    // values), completeness (empty documents), and freshness span
    // (event stream covers > 0 days). n_violations + pass flag per
    // check; the suite output is fixed-size whatever the data volume.
    //
    // Scale shape: every check is one partial agg or one left-anti
    // probe (the orphan check builds its verdict from the count
    // tables, not a materialized join); the union is 5 rows.
    Q("p137_dq_expectations", Some("""
      SELECT * FROM (
        SELECT 'customer_key_unique' AS expectation,
               CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
                 AS n_violations
        FROM customer
        UNION ALL
        SELECT 'lineitem_fk_orders',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                 AS BIGINT)
        UNION ALL
        SELECT 'event_value_nonneg',
               CAST((SELECT count(*) FROM events WHERE value < 0) AS BIGINT)
        UNION ALL
        SELECT 'document_nonempty',
               CAST((SELECT count(*) FROM documents
                     WHERE text IS NULL OR length(text) = 0) AS BIGINT)
        UNION ALL
        SELECT 'event_span_positive',
               CAST((SELECT CASE WHEN date_diff('day',
                       CAST(min(date_trunc('day', ts)) AS DATE),
                       CAST(max(date_trunc('day', ts)) AS DATE)) > 0
                     THEN 0 ELSE 1 END FROM events) AS BIGINT))
      ORDER BY 1""")) { (spark, dir) =>
      val cust = Tables.load(spark, dir, "customer")
      val li = Tables.load(spark, dir, "lineitem")
      val ord = Tables.load(spark, dir, "orders")
      val ev = Tables.load(spark, dir, "events")
      val docs = Tables.load(spark, dir, "documents")
      val uniq = cust.agg((count(lit(1)) - countDistinct(col("c_custkey")))
        .as("n_violations"))
        .select(lit("customer_key_unique").as("expectation"),
          col("n_violations"))
      val orphans = li.select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("lineitem_fk_orders").as("expectation"),
          col("n_violations"))
      val nonneg = ev.filter(col("value") < 0)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("event_value_nonneg").as("expectation"),
          col("n_violations"))
      val nonempty = docs
        .filter(col("text").isNull || length(col("text")) === 0)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("document_nonempty").as("expectation"),
          col("n_violations"))
      val span = ev
        .agg(datediff(max(date_trunc("DAY", col("ts")).cast("date")),
          min(date_trunc("DAY", col("ts")).cast("date"))).as("d"))
        .select(lit("event_span_positive").as("expectation"),
          when(col("d") > 0, 0L).otherwise(1L).as("n_violations"))
      uniq.union(orphans).union(nonneg).union(nonempty).union(span)
        .orderBy(col("expectation"))
    },

    // ---- zone-map pruning advisor ------------------------------------------
    // WHY sort keys matter at 100 TB, measured: chunk the lineitem
    // scan into 4096-row "files" two ways — natural (orderkey) layout
    // vs laid out by ship date — compute each chunk's [min, max] ship
    // date (exactly the zone map / parquet row-group stats a reader
    // consults), and count how many chunks a one-month predicate can
    // skip under each layout. The sorted layout's pruned fraction IS
    // the I/O a sort-on-write buys; the natural layout's ~zero is
    // what it costs to skip that sort. Rank for the sorted layout via
    // the same two-phase-equivalent ntile convention (deterministic
    // (key, rowkey) total order).
    //
    // Scale shape: one pass computes chunk ids for both layouts, one
    // (layout, chunk) partial agg builds the zone maps, the verdict
    // is a count over the O(#chunks) metadata table.
    Q("p138_zonemap_advisor", Some("""
      WITH v AS (SELECT l_orderkey, l_linenumber,
                        CAST(epoch_us(l_shipdate) AS BIGINT) AS sd
                 FROM lineitem),
      nat AS (SELECT sd,
                     (row_number() OVER (ORDER BY l_orderkey, l_linenumber)
                       - 1) // 4096 AS chunk
              FROM v),
      srt AS (SELECT sd,
                     (row_number() OVER (ORDER BY sd, l_orderkey,
                        l_linenumber) - 1) // 4096 AS chunk
              FROM v),
      z AS (SELECT 'natural' AS layout, chunk, min(sd) AS lo, max(sd) AS hi
            FROM nat GROUP BY 2
            UNION ALL
            SELECT 'shipdate_sorted', chunk, min(sd), max(sd)
            FROM srt GROUP BY 2),
      p AS (SELECT layout,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN hi < epoch_us(TIMESTAMP '1995-06-01')
                                   OR lo >= epoch_us(TIMESTAMP '1995-07-01')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
            FROM z GROUP BY 1)
      SELECT layout, n_chunks, n_pruned,
             CAST(n_pruned * 1000000 // n_chunks AS BIGINT) AS pruned_ppm
      FROM p ORDER BY 1""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      // l_shipdate reads as TIMESTAMP_NTZ; route through the session-UTC
      // TimestampType so unix_micros matches the oracle's epoch_us
      val v = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          unix_micros(col("l_shipdate")
            .cast(org.apache.spark.sql.types.TimestampType)).as("sd"))
      def chunks(ord: Seq[org.apache.spark.sql.Column], layout: String) =
        v.withColumn("chunk",
            ((row_number().over(Window.orderBy(ord: _*)) - 1) / 4096)
              .cast("long"))
          .groupBy(col("chunk"))
          .agg(min(col("sd")).as("lo"), max(col("sd")).as("hi"))
          .select(lit(layout).as("layout"), col("lo"), col("hi"))
      val lo = unix_micros(to_timestamp(lit("1995-06-01")))
      val hi = unix_micros(to_timestamp(lit("1995-07-01")))
      chunks(Seq(col("l_orderkey"), col("l_linenumber")), "natural")
        .union(chunks(Seq(col("sd"), col("l_orderkey"),
          col("l_linenumber")), "shipdate_sorted"))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("hi") < lo || col("lo") >= hi, 1L).otherwise(0L))
            .as("n_pruned"))
        .select(col("layout"), col("n_chunks"), col("n_pruned"),
          expr("n_pruned * 1000000 div n_chunks").as("pruned_ppm"))
        .orderBy(col("layout"))
    },

    // ---- rendezvous-hash shard rebalance matrix ----------------------------
    // WHY stateful shards use rendezvous (highest-random-weight)
    // hashing instead of `key mod n`, measured: assign every doc to
    // its max-weight shard among 8, then again among 9, and cross-
    // tabulate. Rendezvous moves only the docs whose NEW shard wins
    // their weight race — ~1/9 of the corpus, all INTO shard 8 —
    // while mod-hash would reshuffle ~8/9 of everything. The moved
    // row count per (old, new) cell is the state-migration bill a
    // resharding actually pays. Weights are portable h60 hashes;
    // argmax tie-break toward the larger shard id (struct max),
    // mirrored as a ranked window in the oracle.
    //
    // Scale shape: per doc, a 9-way weight comparison in the scan
    // stage (a fixed-size explode, no data-sized join); one
    // (old, new)-keyed partial agg to the O(shards²) matrix.
    Q("p140_rendezvous_rebalance", Some(s"""
      WITH s AS (SELECT doc_id, unnest(generate_series(0, 8)) AS sh
                 FROM documents),
      w AS (SELECT doc_id, sh,
                   ${Portable.h60Sql(
        "concat('shard:', CAST(sh AS VARCHAR), ':', CAST(doc_id AS VARCHAR))")}
                     AS wt
            FROM s),
      o AS (SELECT doc_id, sh AS old_shard FROM
              (SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
                 ORDER BY wt DESC, sh DESC) AS rk FROM w WHERE sh < 8)
            WHERE rk = 1),
      n AS (SELECT doc_id, sh AS new_shard FROM
              (SELECT doc_id, sh, row_number() OVER (PARTITION BY doc_id
                 ORDER BY wt DESC, sh DESC) AS rk FROM w)
            WHERE rk = 1)
      SELECT o.old_shard, n.new_shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(CASE WHEN o.old_shard <> n.new_shard THEN 1 ELSE 0 END
               AS BIGINT) AS moved
      FROM o JOIN n USING (doc_id)
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (spark, dir) =>
      val w = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"))
        .crossJoin(broadcast(spark.range(0, 9).select(col("id").as("sh"))))
        .select(col("doc_id"), col("sh"),
          Portable.h60(concat(lit("shard:"), col("sh").cast("string"),
            lit(":"), col("doc_id").cast("string"))).as("wt"))
      // argmax by (weight, shard) struct max — larger shard wins ties,
      // the oracle's ORDER BY wt DESC, sh DESC
      val o = w.filter(col("sh") < 8).groupBy(col("doc_id"))
        .agg(max(struct(col("wt"), col("sh"))).as("m"))
        .select(col("doc_id"), col("m.sh").as("old_shard"))
      val n = w.groupBy(col("doc_id"))
        .agg(max(struct(col("wt"), col("sh"))).as("m"))
        .select(col("doc_id"), col("m.sh").as("new_shard"))
      o.join(n, "doc_id")
        .groupBy(col("old_shard"), col("new_shard"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("old_shard"), col("new_shard"), col("n_docs"),
          when(col("old_shard") =!= col("new_shard"), 1L).otherwise(0L)
            .as("moved"))
        .orderBy(col("old_shard"), col("new_shard"))
    },

    // ---- funnel time-to-convert, exact percentiles -------------------------
    // The latency distribution behind the p66 funnel: per user, the
    // gap between the FIRST view and the first purchase strictly
    // after it; per market segment, the exact median and p90 of that
    // gap. Order statistics stay exact integers via explicit ranks on
    // the (gap, user) total order — median = the two middle ranks
    // SUMMED (the p113 doubled trick, no halving, no floats), p90 =
    // the type-1 quantile at rank ceil(9n/10). No percentile_approx:
    // at this grain the user table is the small side and exactness is
    // what the oracle can pin.
    //
    // Scale shape: the event stream collapses to per-user firsts in
    // one user-keyed agg (map-side combinable conditional mins); the
    // rank windows run over the USER-sized gap table partitioned by
    // segment, not over events.
    Q("p141_time_to_convert", Some("""
      WITH f AS (SELECT user_id,
                        min(CASE WHEN event_type = 'view'
                                 THEN epoch_us(ts) END) AS first_view
                 FROM events GROUP BY 1),
      p AS (SELECT e.user_id,
                   CAST(min(epoch_us(e.ts)) - any_value(f.first_view)
                     AS BIGINT) AS gap_us
            FROM events e JOIN f ON f.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND f.first_view IS NOT NULL
              AND epoch_us(e.ts) > f.first_view
            GROUP BY 1),
      g AS (SELECT c.c_mktsegment AS seg, p.user_id, p.gap_us
            FROM p JOIN customer c ON c.c_custkey = p.user_id),
      r AS (SELECT seg, gap_us,
                   row_number() OVER (PARTITION BY seg
                     ORDER BY gap_us, user_id) AS rk,
                   count(*) OVER (PARTITION BY seg) AS n
            FROM g)
      SELECT seg, CAST(max(n) AS BIGINT) AS n_converted,
             CAST(sum(CASE WHEN rk = (n + 1) // 2 THEN gap_us ELSE 0 END)
                  + sum(CASE WHEN rk = n // 2 + 1 THEN gap_us ELSE 0 END)
               AS BIGINT) AS med2_us,
             CAST(sum(CASE WHEN rk = (9 * n + 9) // 10
                           THEN gap_us ELSE 0 END) AS BIGINT)
               AS p90_us
      FROM r GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val us = unix_micros(col("ts"))
      val f = Tables.load(spark, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", us)).as("first_view"))
        .filter(col("first_view").isNotNull)
      val p = Tables.load(spark, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), us.as("pus"))
        .join(f, "user_id")
        .filter(col("pus") > col("first_view"))
        .groupBy(col("user_id"))
        .agg((min(col("pus")) - first(col("first_view"))).as("gap_us"))
      val g = p.join(Tables.load(spark, dir, "customer")
          .select(col("c_custkey").as("user_id"),
            col("c_mktsegment").as("seg")), "user_id")
      val wS = Window.partitionBy(col("seg"))
      val r = g.withColumn("rk", row_number().over(
          wS.orderBy(col("gap_us"), col("user_id"))))
        .withColumn("n", count(lit(1)).over(wS))
      r.groupBy(col("seg"))
        .agg(max(col("n")).cast("long").as("n_converted"),
          // two separate middle-rank terms so an odd group DOUBLES its
          // single middle value (the p113 med2 convention); div, not /
          // (Spark's / on integers yields doubles)
          (sum(when(col("rk") === expr("(n + 1) div 2"), col("gap_us"))
            .otherwise(0L))
            + sum(when(col("rk") === expr("n div 2 + 1"), col("gap_us"))
              .otherwise(0L))).as("med2_us"),
          sum(when(col("rk") === expr("(n * 9 + 9) div 10"), col("gap_us"))
            .otherwise(0L)).as("p90_us"))
        .orderBy(col("seg"))
    },

    // ---- right-to-erasure deletion cascade ---------------------------------
    // The GDPR/CCPA ops query: given a deletion request list (every
    // customer with c_custkey % 37 == 5 plays the requesters), size
    // the cascade across the schema — orders held by those customers,
    // line items of those orders, events keyed by their user id — and
    // prove the post-delete referential closure (zero would-be
    // orphans). One row per table: rows to delete and the fraction of
    // the table in ppm; the bill and blast radius a deletion pipeline
    // reports BEFORE it runs.
    //
    // Scale shape: the request list is a broadcast left-semi probe
    // into each fact table (never a materialized join); the two-hop
    // cascade (lineitem) probes the already-shrunk orders key set.
    Q("p142_deletion_cascade", Some("""
      WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 37 = 5),
      o AS (SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM del)),
      r AS (
        SELECT 'customer' AS tbl,
               CAST((SELECT count(*) FROM del) AS BIGINT) AS n_delete,
               CAST((SELECT count(*) FROM customer) AS BIGINT) AS n_total
        UNION ALL
        SELECT 'orders', CAST((SELECT count(*) FROM o) AS BIGINT),
               CAST((SELECT count(*) FROM orders) AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_orderkey IN (SELECT o_orderkey FROM o))
                 AS BIGINT),
               CAST((SELECT count(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'events',
               CAST((SELECT count(*) FROM events
                     WHERE user_id IN (SELECT c_custkey FROM del))
                 AS BIGINT),
               CAST((SELECT count(*) FROM events) AS BIGINT))
      SELECT tbl, n_delete, n_total,
             CAST(n_delete * 1000000 // n_total AS BIGINT) AS share_ppm
      FROM r ORDER BY tbl""")) { (spark, dir) =>
      val del = Tables.load(spark, dir, "customer")
        .filter(col("c_custkey") % 37 === 5).select(col("c_custkey"))
      val orders = Tables.load(spark, dir, "orders")
      val o = orders.join(broadcast(del),
        orders("o_custkey") === del("c_custkey"), "left_semi")
        .select(col("o_orderkey"))
      def row(tbl: String, toDelete: org.apache.spark.sql.DataFrame,
              total: org.apache.spark.sql.DataFrame) =
        toDelete.agg(count(lit(1)).as("n_delete"))
          .crossJoin(total.agg(count(lit(1)).as("n_total")))
          .select(lit(tbl).as("tbl"), col("n_delete"), col("n_total"))
      val li = Tables.load(spark, dir, "lineitem")
      val ev = Tables.load(spark, dir, "events")
      row("customer", del, Tables.load(spark, dir, "customer"))
        .union(row("orders", o, orders))
        .union(row("lineitem",
          li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"),
            "left_semi"), li))
        .union(row("events",
          ev.join(broadcast(del), ev("user_id") === del("c_custkey"),
            "left_semi"), ev))
        .select(col("tbl"), col("n_delete"), col("n_total"),
          expr("n_delete * 1000000 div n_total").as("share_ppm"))
        .orderBy(col("tbl"))
    },

    // ---- point-in-time-correct feature join (feature-store read) -----------
    // THE training-serving-skew guard: enrich each event with the
    // customer order-priority that was in effect AT THE EVENT'S OWN
    // TIME, read from the p65/p104 SCD2 history — never the current
    // value (future leakage) and never a random version. Interval
    // containment valid_from <= t < valid_to against the per-customer
    // history; events before a customer's first version correctly get
    // the 'none' feature. Rolled up per (priority) census so the
    // output is bounded.
    //
    // Scale shape: the history build is one o_custkey partitioning
    // (p65's plan); the enrich is a custkey equi-join with the
    // interval predicate as a residual filter — per-key version fan-
    // out is bounded by change count, so the join is keyed, never a
    // range cross. Event times quantize to epoch-us integers.
    Q("p143_pit_feature_join", Some("""
      WITH o AS (SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
                 FROM orders),
      f AS (SELECT *, CASE WHEN lag(o_orderpriority) OVER w IS NULL
                             OR lag(o_orderpriority) OVER w <> o_orderpriority
                           THEN 1 ELSE 0 END AS chg
            FROM o WINDOW w AS (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)),
      i AS (SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS island
            FROM f),
      g AS (SELECT o_custkey, CAST(island AS BIGINT) AS island,
                   min(o_orderpriority) AS priority,
                   CAST(epoch_us(min(o_orderdate)) AS BIGINT) AS vf
            FROM i GROUP BY 1, 2),
      h AS (SELECT o_custkey, priority, vf,
                   lead(vf) OVER (PARTITION BY o_custkey ORDER BY island)
                     AS vt
            FROM g),
      e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
      j AS (SELECT e.user_id, e.t, h.priority
            FROM e LEFT JOIN h ON h.o_custkey = e.user_id
                   AND h.vf <= e.t AND (h.vt IS NULL OR h.vt > e.t))
      SELECT coalesce(priority, 'none') AS feature_priority,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM j GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wi = Window.partitionBy(col("o_custkey")).orderBy(col("island"))
      val chg = when(lag(col("o_orderpriority"), 1).over(w).isNull
        || lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"),
        1).otherwise(0)
      val hist = Tables.load(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate"), col("o_orderkey"))
        .withColumn("chg", chg)
        .withColumn("island", sum(col("chg")).over(w).cast("long"))
        .groupBy(col("o_custkey"), col("island"))
        .agg(min(col("o_orderpriority")).as("priority"),
          unix_micros(min(col("o_orderdate"))
            .cast(org.apache.spark.sql.types.TimestampType)).as("vf"))
        .select(col("o_custkey"), col("priority"), col("vf"),
          lead(col("vf"), 1).over(wi).as("vt"))
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("t"))
      e.join(hist,
          hist("o_custkey") === e("user_id") && hist("vf") <= e("t")
            && (hist("vt").isNull || hist("vt") > e("t")), "left")
        .groupBy(coalesce(col("priority"), lit("none"))
          .as("feature_priority"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("feature_priority"))
    },

    // ---- importance reweighting toward a target mixture --------------------
    // Data mixing for training: the corpus's language distribution is
    // whatever the crawl dealt; training wants a TARGET mixture
    // (uniform over languages here). Per-language importance weight =
    // target_share / actual_share in MILLI units (clamped at 10× —
    // the standard truncated-importance-sampling variance guard,
    // mirrored exactly), plus a corpus-level '_all' row carrying the
    // effective sample size ESS = (Σw)²/Σw². Weights and the ESS
    // numerator/denominator sums are exact integers (milli, not ppm,
    // keeps every product far inside int64 at any corpus size); the
    // single final ESS division runs in doubles on those exact sums
    // and rounds to an integer doc count.
    //
    // Scale shape: the language histogram is one partial agg; the
    // O(langs) weight table broadcasts; the '_all' sums are one more
    // reduce over that table. Nothing data-sized moves.
    Q("p144_importance_reweight", Some("""
      WITH h AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
                 FROM documents GROUP BY 1),
      t AS (SELECT CAST(count(*) AS BIGINT) AS total,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents),
      w AS (SELECT h.lang, h.n,
                   least(CAST(t.total * 1000 // (t.n_langs * h.n)
                     AS BIGINT), 10000) AS w_milli
            FROM h CROSS JOIN t),
      a AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
                   CAST(SUM(n * w_milli) AS BIGINT) AS mass,
                   CAST(SUM(n * w_milli * w_milli) AS BIGINT) AS m2
            FROM w)
      SELECT lang, n, w_milli, CAST(n * w_milli AS BIGINT) AS mass
      FROM w
      UNION ALL
      SELECT '_all', n, CAST(round(CAST(mass AS DOUBLE) * CAST(mass AS DOUBLE)
               / CAST(m2 AS DOUBLE)) AS BIGINT), mass
      FROM a
      ORDER BY lang""")) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val h = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val t = docs.agg(count(lit(1)).as("total"),
        countDistinct(col("lang")).as("n_langs"))
      val w = h.crossJoin(broadcast(t))
        .select(col("lang"), col("n"),
          least(expr("total * 1000 div (n_langs * n)"),
            lit(10000L)).as("w_milli"))
      val all = w.agg(sum(col("n")).as("n"),
          sum(col("n") * col("w_milli")).as("mass"),
          sum(col("n") * col("w_milli") * col("w_milli")).as("m2"))
        // ESS rides in the w_milli column of the '_all' row (the p121
        // '_all' convention): one double division on exact int sums
        .select(lit("_all").as("lang"), col("n"),
          round(col("mass").cast("double") * col("mass").cast("double")
            / col("m2").cast("double"), 0).cast("long").as("w_milli"),
          col("mass"))
      w.select(col("lang"), col("n"), col("w_milli"),
          (col("n") * col("w_milli")).as("mass"))
        .union(all)
        .orderBy(col("lang"))
    },

    // ---- two-stage retrieval with rank-agreement audit ---------------------
    // The production serving shape for embeddings: a CHEAP first stage
    // (dot over the first 16 matryoshka dims — the p97 convention)
    // retrieves top-20 candidates per query; the EXPENSIVE second
    // stage (full-dim exact dot, standing in for a cross-encoder)
    // reranks only those 20. The audit metric is Kendall's tau
    // between the two orderings on the candidate set — exact integer
    // concordant-minus-discordant over the 190 candidate pairs — plus
    // whether the stages agree on the winner. Low tau per query =
    // the cheap stage is a bad router for that query.
    //
    // Scale shape: stage 1 is the one broadcast-panel partial-agg
    // pass every ANN entry uses; stage 2 touches 20 rows per query;
    // the tau self-join is 20×20 per query — candidate-bounded,
    // corpus-independent.
    Q("p145_two_stage_rerank", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      q AS (SELECT vec_id AS qid, j, ri AS qi FROM c WHERE vec_id < 20),
      d1 AS (SELECT q.qid, c.vec_id AS vid, SUM(q.qi * c.ri) AS dot16
             FROM c JOIN q ON q.j = c.j AND c.vec_id != q.qid
             WHERE c.j < 16 GROUP BY 1, 2),
      cand AS (SELECT qid, vid, dot16,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY dot16 DESC, vid) AS r1
               FROM d1 QUALIFY r1 <= 20),
      d2 AS (SELECT cand.qid, cand.vid, cand.r1,
                    SUM(q.qi * c.ri) AS dotf
             FROM cand JOIN c ON c.vec_id = cand.vid
                       JOIN q ON q.qid = cand.qid AND q.j = c.j
             GROUP BY 1, 2, 3),
      rr AS (SELECT qid, vid, r1,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY dotf DESC, vid) AS r2
             FROM d2),
      tau AS (SELECT a.qid,
                     CAST(SUM(CASE WHEN (a.r1 - b.r1) * (a.r2 - b.r2) > 0
                                   THEN 1 ELSE -1 END) AS BIGINT) AS tau_num
              FROM rr a JOIN rr b ON a.qid = b.qid AND a.vid < b.vid
              GROUP BY 1),
      top AS (SELECT qid,
                     max(CASE WHEN r1 = 1 THEN vid END) AS stage1_top,
                     max(CASE WHEN r2 = 1 THEN vid END) AS stage2_top
              FROM rr GROUP BY 1)
      SELECT t.qid, top.stage1_top, top.stage2_top,
             CAST(CASE WHEN top.stage1_top = top.stage2_top
                       THEN 1 ELSE 0 END AS BIGINT) AS top1_agree,
             t.tau_num, CAST(190 AS BIGINT) AS tau_den
      FROM tau t JOIN top USING (qid) ORDER BY t.qid""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val c = emb.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
        .localCheckpoint()
      val q = c.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("j"), col("ri").as("qi"))
      val cand = c.where(col("j") < 16)
        .join(broadcast(q.where(col("j") < 16)), "j")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("qi") * col("ri")).as("dot16"))
        .withColumn("r1", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("dot16").desc, col("vec_id"))))
        .filter(col("r1") <= 20)
      val rr = cand.join(c, "vec_id")
        .join(broadcast(q), Seq("qid", "j"))
        .groupBy(col("qid"), col("vec_id"), col("r1"))
        .agg(sum(col("qi") * col("ri")).as("dotf"))
        .withColumn("r2", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("dotf").desc, col("vec_id"))))
        .select(col("qid"), col("vec_id").as("vid"), col("r1"), col("r2"))
        .localCheckpoint()
      val tau = rr.select(col("qid"), col("vid").as("va"),
          col("r1").as("r1a"), col("r2").as("r2a"))
        .join(rr.select(col("qid"), col("vid").as("vb"),
          col("r1").as("r1b"), col("r2").as("r2b")), "qid")
        .filter(col("va") < col("vb"))
        .groupBy(col("qid"))
        .agg(sum(when((col("r1a") - col("r1b"))
            * (col("r2a") - col("r2b")) > 0, 1L).otherwise(-1L))
          .as("tau_num"))
      val top = rr.groupBy(col("qid"))
        .agg(max(when(col("r1") === 1, col("vid"))).as("stage1_top"),
          max(when(col("r2") === 1, col("vid"))).as("stage2_top"))
      tau.join(top, "qid")
        .select(col("qid"), col("stage1_top"), col("stage2_top"),
          when(col("stage1_top") === col("stage2_top"), 1L).otherwise(0L)
            .as("top1_agree"),
          col("tau_num"), lit(190L).as("tau_den"))
        .orderBy(col("qid"))
    },

    // ---- calendar densify + last-observation-carried-forward ---------------
    // The feature-pipeline resample: a 20-user panel's daily spend is
    // densified onto the full calendar (missing days become rows) and
    // gap-filled by LOCF — the fill every "daily feature as of day d"
    // table needs so downstream joins never see holes. Exact cents;
    // filled flag marks carried rows; days before a user's first
    // observation stay 0 ('no history yet' ≠ 'carried 0').
    //
    // Scale shape: the observed grid is one (user, day) partial agg
    // of the event scan; the calendar is a broadcast cross of the
    // panel × the O(days) spine; LOCF is a per-user window ordered by
    // day — partition-parallel across users, never a global window.
    Q("p146_locf_densify", Some("""
      WITH pe AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events WHERE user_id < 20),
      ob AS (SELECT user_id, d, CAST(SUM(cents) AS BIGINT) AS spend
             FROM pe GROUP BY 1, 2),
      b AS (SELECT min(d) AS lo, max(d) AS hi FROM ob),
      u AS (SELECT DISTINCT user_id FROM pe),
      cal AS (SELECT u.user_id,
                     CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))
                       AS DATE) AS d
              FROM u, b),
      g AS (SELECT cal.user_id, cal.d, ob.spend
            FROM cal LEFT JOIN ob USING (user_id, d)),
      f AS (SELECT user_id, d, spend,
                   last_value(spend IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS locf
            FROM g)
      SELECT user_id, CAST(d AS VARCHAR) AS day,
             CAST(coalesce(locf, 0) AS BIGINT) AS spend_cents,
             CAST(CASE WHEN spend IS NULL AND locf IS NOT NULL
                       THEN 1 ELSE 0 END AS BIGINT) AS filled
      FROM f ORDER BY user_id, day""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val pe = Tables.load(spark, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"),
          date_trunc("DAY", col("ts")).cast("date").as("d"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val ob = pe.groupBy(col("user_id"), col("d"))
        .agg(sum(col("cents")).as("spend"))
      val b = ob.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      val cal = pe.select(col("user_id")).distinct()
        .crossJoin(broadcast(b))
        .select(col("user_id"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      val wU = Window.partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(ob, Seq("user_id", "d"), "left")
        .withColumn("locf", last(col("spend"), ignoreNulls = true).over(wU))
        .select(col("user_id"), col("d").cast("string").as("day"),
          coalesce(col("locf"), lit(0L)).as("spend_cents"),
          when(col("spend").isNull && col("locf").isNotNull, 1L)
            .otherwise(0L).as("filled"))
        .orderBy(col("user_id"), col("day"))
    },

    // ---- sliding-window rate-limit audit (event-time RANGE frames) ---------
    // Abuse/quota detection at event time: each user's PEAK events in
    // any trailing 1-hour window, found with a RANGE frame over epoch
    // microseconds (count of rows within [t−1h, t] at every event) —
    // the event-time sliding count that tumbling windows miss when a
    // burst straddles a boundary. Users whose peak exceeds the quota
    // are the report; exact integers throughout.
    //
    // Scale shape: one user-partitioned window ordered by time —
    // partition-parallel, state bounded by the frame; the verdict
    // rollup is a user-keyed agg of the windowed scan. No self-join
    // (the naive events×events interval join this replaces).
    Q("p147_rate_limit_audit", Some("""
      WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us
                 FROM events),
      w AS (SELECT user_id, us,
                   count(*) OVER (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
                     AS in_hour
            FROM e),
      p AS (SELECT user_id, CAST(max(in_hour) AS BIGINT) AS peak_1h,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM w GROUP BY 1)
      SELECT user_id, peak_1h, n_events
      FROM p WHERE peak_1h >= 3 ORDER BY user_id""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val wT = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3599999999L, 0)
      e.withColumn("in_hour", count(lit(1)).over(wT))
        .groupBy(col("user_id"))
        .agg(max(col("in_hour")).as("peak_1h"),
          count(lit(1)).as("n_events"))
        .filter(col("peak_1h") >= 3)
        .orderBy(col("user_id"))
    },

    // ---- n-gram novelty histogram (memorization-risk census) ---------------
    // The pretraining-dedup complement at SUB-document grain: a doc
    // whose 5-grams mostly appear in ≥3 other docs is boilerplate the
    // model will memorize even if no whole-document dup fired. Per
    // doc: distinct 5-grams, how many are corpus-common (df ≥ 4
    // including self), novelty ppm — rolled up as a per-source decile
    // histogram so the output stays catalog-sized and the per-source
    // contrast (which crawl is template farms?) is the readable fact.
    //
    // Scale shape: one distinct (doc, gram) collapse, one gram-df
    // partial agg, one broadcast-back join keyed by gram (df table is
    // Heaps-bounded), one (source, decile) rollup.
    Q("p148_ngram_novelty", Some(s"""
      WITH w AS (SELECT doc_id, source, $wsSql AS ws FROM documents),
      g AS (SELECT DISTINCT doc_id, source,
                   unnest(${TextSql.shingles("ws", 5)}) AS gm
            FROM w),
      df AS (SELECT gm, COUNT(*) AS df FROM g GROUP BY 1),
      d AS (SELECT g.doc_id, g.source,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN df.df >= 4 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_common
            FROM g JOIN df USING (gm) GROUP BY 1, 2),
      v AS (SELECT source,
                   (n_grams - n_common) * 1000000 // n_grams AS nov
            FROM d WHERE n_grams > 0)
      SELECT source, CAST(least(nov // 100000, 9) AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM v GROUP BY 1, 2 ORDER BY 1, 2""")) { (spark, dir) =>
      val g = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(TextOps.shingles(col("text"), 5)).as("gm"))
        .distinct()
        .localCheckpoint()
      val df = g.groupBy(col("gm")).agg(count(lit(1)).as("df"))
      g.join(df, "gm")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") >= 4, 1L).otherwise(0L)).as("n_common"))
        .filter(col("n_grams") > 0)
        .select(col("source"),
          expr("(n_grams - n_common) * 1000000 div n_grams").as("nov"))
        .groupBy(col("source"),
          least(expr("nov div 100000"), lit(9L)).as("decile"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("decile"))
    },

    // ---- seasonal (day-of-week) baseline residuals -------------------------
    // The p117 anomaly gate's seasonal sibling: traffic has a weekly
    // rhythm, so a Monday is judged against the MEDIAN of Mondays
    // (per event type), not a trailing window that mixes weekdays
    // with weekends. Baseline = exact per-(type, dow) median of daily
    // counts on the DENSIFIED calendar (missing days count 0) via the
    // doubled-order-statistic trick; a day is flagged when its count
    // is ≥2× or ≤½× its dow baseline — ratios kept exact by
    // cross-multiplying in integers (4c vs 2·med2 and 8c vs med2),
    // never dividing.
    //
    // Scale shape: the event stream collapses to the O(types × days)
    // grid first (the p117 shape); the median rank windows run per
    // (type, dow) over ~days/7 rows each; the verdict joins grid to
    // the O(types × 7) baseline table.
    Q("p149_seasonal_residual", Some("""
      WITH c AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE)
                        AS day, CAST(count(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
      t AS (SELECT DISTINCT event_type FROM events),
      g AS (SELECT t.event_type,
                   CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))
                     AS DATE) AS day
            FROM t, b),
      d AS (SELECT g.event_type, g.day, isodow(g.day) AS dow,
                   coalesce(c.c, 0) AS c
            FROM g LEFT JOIN c USING (event_type, day)),
      r AS (SELECT event_type, dow, c,
                   row_number() OVER (PARTITION BY event_type, dow
                     ORDER BY c, day) AS rk,
                   count(*) OVER (PARTITION BY event_type, dow) AS n
            FROM d),
      m AS (SELECT event_type, dow,
                   CAST(sum(CASE WHEN rk = (n + 1) // 2 THEN c ELSE 0 END)
                        + sum(CASE WHEN rk = n // 2 + 1 THEN c ELSE 0 END)
                     AS BIGINT) AS med2
            FROM r GROUP BY 1, 2)
      SELECT d.event_type, CAST(d.day AS VARCHAR) AS day,
             CAST(d.dow AS BIGINT) AS dow, d.c, m.med2,
             CAST(CASE WHEN 4 * d.c > 2 * m.med2
                         OR (d.c > 0 AND 8 * d.c < m.med2)
                         OR (d.c = 0 AND m.med2 > 0)
                       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      FROM d JOIN m USING (event_type, dow)
      ORDER BY 1, 2""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(spark, dir, "events")
      val c = ev.groupBy(col("event_type"),
          date_trunc("DAY", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val b = c.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val d = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(b))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
        .join(c, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          dayofweek(col("day")).as("sundow"), // Spark: 1=Sunday
          coalesce(col("c"), lit(0L)).as("c"))
        // ISO dow (1=Monday..7=Sunday) to match DuckDB's isodow
        .withColumn("dow",
          when(col("sundow") === 1, 7L).otherwise(col("sundow") - 1))
      val wP = Window.partitionBy(col("event_type"), col("dow"))
      val r = d.withColumn("rk", row_number().over(
          wP.orderBy(col("c"), col("day"))))
        .withColumn("n", count(lit(1)).over(wP))
      val m = r.groupBy(col("event_type"), col("dow"))
        .agg((sum(when(col("rk") === expr("(n + 1) div 2"), col("c"))
          .otherwise(0L))
          + sum(when(col("rk") === expr("n div 2 + 1"), col("c"))
            .otherwise(0L))).as("med2"))
      d.join(m, Seq("event_type", "dow"))
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("dow"), col("c"), col("med2"),
          when(lit(4) * col("c") > lit(2) * col("med2")
              || (col("c") > 0 && lit(8) * col("c") < col("med2"))
              || (col("c") === 0 && col("med2") > 0), 1L)
            .otherwise(0L).as("is_anomaly"))
        .orderBy(col("event_type"), col("day"))
    },

    // ---- label-noise detection via bucket-local kNN voting -----------------
    // The training-label audit: a vector whose 5 nearest neighbors
    // (inside its 8-bit SRP-LSH bucket — the p26 blocking key, so the
    // vote NEVER goes all-pairs) majority-vote a DIFFERENT label is a
    // suspected mislabel. Scaled-integer dots rank neighbors; the
    // majority is a (votes desc, label asc) extremum; vectors in
    // singleton buckets abstain (reported, not flagged). Output per
    // label: population, voted, flagged, flag ppm — the table that
    // says WHICH class's labels to re-audit.
    //
    // Scale shape: one bucket-forming shuffle (the p26 plan), bucket-
    // local pair gen bounded by the 200-member cap, one vote rollup
    // keyed by vector, one label-keyed census. Corpus² never appears.
    Q("p150_label_noise_knn", Some {
      val planes = graft.ops.SimilarityOps.srpHyperplanes(8, 64)
      val bucketSql = planes.zipWithIndex.map { case (h, j) =>
        val arr = h.map(x => if (x > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""
      WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      b AS (SELECT vec_id, label, v, $bucketSql AS bk FROM v),
      bc AS (SELECT * FROM b
             QUALIFY COUNT(*) OVER (PARTITION BY bk) BETWEEN 2 AND 200),
      cx AS (SELECT vec_id, bk, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM bc),
      c AS (SELECT vec_id, bk, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      d AS (SELECT a.vec_id AS x, b2.vec_id AS y,
                   SUM(a.ri * b2.ri) AS dot
            FROM c a JOIN c b2 ON a.bk = b2.bk AND a.j = b2.j
                     AND a.vec_id <> b2.vec_id
            GROUP BY 1, 2),
      nn AS (SELECT x, y FROM
               (SELECT x, y, row_number() OVER (PARTITION BY x
                  ORDER BY dot DESC, y) AS rk FROM d)
             WHERE rk <= 5),
      vote AS (SELECT nn.x, vy.label AS nlab, COUNT(*) AS n
               FROM nn JOIN v vy ON vy.vec_id = nn.y GROUP BY 1, 2),
      maj AS (SELECT x, nlab AS maj_label FROM
                (SELECT x, nlab, row_number() OVER (PARTITION BY x
                   ORDER BY n DESC, nlab) AS rk FROM vote)
              WHERE rk = 1),
      verdict AS (SELECT v.label,
                         CAST(COUNT(*) AS BIGINT) AS n_vecs,
                         CAST(SUM(CASE WHEN maj.x IS NOT NULL
                                       THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_voted,
                         CAST(SUM(CASE WHEN maj.maj_label IS NOT NULL
                                         AND maj.maj_label <> v.label
                                       THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_flagged
                  FROM v LEFT JOIN maj ON maj.x = v.vec_id
                  GROUP BY 1)
      SELECT label, n_vecs, n_voted, n_flagged,
             CAST(CASE WHEN n_voted = 0 THEN 0
                       ELSE n_flagged * 1000000 // n_voted END AS BIGINT)
               AS flag_ppm
      FROM verdict ORDER BY label"""
    }) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.ops.SimilarityOps
      val planes = SimilarityOps.srpHyperplanes(8, 64)
      val v = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
      val b = v.withColumn("bk", SimilarityOps.srpBucket(col("v"), planes))
      val bc = b.withColumn("bn", count(lit(1))
          .over(Window.partitionBy(col("bk"))))
        .filter(col("bn").between(2, 200))
      val c = bc.select(col("vec_id"), col("bk"),
          posexplode(col("v")).as(Seq("j", "x")))
        .select(col("vec_id"), col("bk"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
        .localCheckpoint()
      val nn = c.select(col("bk"), col("j"), col("vec_id").as("x"),
          col("ri").as("rx"))
        .join(c.select(col("bk"), col("j"), col("vec_id").as("y"),
          col("ri").as("ry")), Seq("bk", "j"))
        .filter(col("x") =!= col("y"))
        .groupBy(col("x"), col("y"))
        .agg(sum(col("rx") * col("ry")).as("dot"))
        // bucket-bounded top-5: min over (-dot, y), the TopN kernel
        .groupBy(col("x"))
        .agg(graft.functions.TopN.minTopN(-col("dot"), col("y"), 5)
          .as("top"))
        .select(col("x"), explode(col("top.id")).as("y"))
      val maj = nn.join(v.select(col("vec_id").as("y"),
          col("label").as("nlab")), "y")
        .groupBy(col("x"), col("nlab"))
        .agg(count(lit(1)).as("n"))
        // majority: most votes, ties to the SMALLER label = max over
        // (n, -nlab), mirroring ORDER BY n DESC, nlab
        .groupBy(col("x"))
        .agg(max(struct(col("n"), (-col("nlab")).as("neg"))).as("m"))
        .select(col("x"), (-col("m.neg")).as("maj_label"))
      v.join(maj.select(col("x").as("vec_id"), col("maj_label")),
          Seq("vec_id"), "left")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("maj_label").isNotNull, 1L).otherwise(0L))
            .as("n_voted"),
          sum(when(col("maj_label").isNotNull
            && col("maj_label") =!= col("label"), 1L).otherwise(0L))
            .as("n_flagged"))
        .select(col("label"), col("n_vecs"), col("n_voted"),
          col("n_flagged"),
          expr("CASE WHEN n_voted = 0 THEN 0L " +
            "ELSE n_flagged * 1000000 div n_voted END").as("flag_ppm"))
        .orderBy(col("label"))
    },

    // ---- exact tie-adjusted AUC of the quality model -----------------------
    // The p118 calibration table's single-number summary: AUC of the
    // p82 linear score against the held-out length label, computed
    // EXACTLY — AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻) with
    // ties given half credit via midranks, all in integers by the
    // doubling trick: 2·midrank = 2·rank() + tie_count − 1 (rank()
    // and a per-score count, both windows on the total order), so
    // auc_ppm = (Σ2mid − n⁺(n⁺+1))·10⁶ // (2·n⁺·n⁻) with zero
    // floating point. No sampling, no approximation — the oracle can
    // pin every digit.
    //
    // Scale shape: scores come from the broadcast-vocab join (p82's
    // plan); the rank windows run over the total score order (the
    // documented statistics shape — sampled at production size); the
    // final moment rollup is one row.
    Q("p151_auc_exact", Some(s"""
      WITH w(tok, wt) AS (VALUES ${Pipeline6.qualityWeights
        .map { case (t, wt) => s"('$t', $wt)" }.mkString(", ")}),
      tk AS (SELECT doc_id, unnest($wsSql) AS tok FROM documents),
      hs AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS hit_sum
             FROM tk JOIN w USING (tok) GROUP BY doc_id),
      sc AS (SELECT d.doc_id,
                    coalesce(hs.hit_sum, 0) + ${Pipeline6.qualityBias}
                      AS score,
                    CASE WHEN d.n_chars >= 64 THEN 1 ELSE 0 END AS pos
             FROM documents d LEFT JOIN hs ON d.doc_id = hs.doc_id),
      r AS (SELECT pos, score,
                   rank() OVER (ORDER BY score) AS rk,
                   count(*) OVER (PARTITION BY score) AS tc
            FROM sc),
      m AS (SELECT CAST(SUM(CASE WHEN pos = 1
                                 THEN 2 * rk + tc - 1 ELSE 0 END)
                     AS BIGINT) AS s2mid,
                   CAST(SUM(pos) AS BIGINT) AS np,
                   CAST(SUM(1 - pos) AS BIGINT) AS nn
            FROM r)
      SELECT np AS n_pos, nn AS n_neg, s2mid,
             CAST((s2mid - np * (np + 1)) * 1000000 // (2 * np * nn)
               AS BIGINT) AS auc_ppm
      FROM m""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.loadSpread(spark, dir, "documents")
      val weights = {
        import spark.implicits._
        broadcast(Pipeline6.qualityWeights.toDF("tok", "wt"))
      }
      val hs = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .join(weights, "tok")
        .groupBy(col("doc_id")).agg(sum(col("wt")).as("hit_sum"))
      val sc = docs.select(col("doc_id"), col("n_chars"))
        .join(hs, Seq("doc_id"), "left")
        .select(
          (coalesce(col("hit_sum"), lit(0L)) + Pipeline6.qualityBias)
            .as("score"),
          when(col("n_chars") >= 64, 1L).otherwise(0L).as("pos"))
      val r = sc
        .withColumn("rk", rank().over(Window.orderBy(col("score"))))
        .withColumn("tc", count(lit(1))
          .over(Window.partitionBy(col("score"))))
      r.agg(
          sum(when(col("pos") === 1, lit(2) * col("rk") + col("tc") - 1)
            .otherwise(0L)).as("s2mid"),
          sum(col("pos")).as("np"),
          sum(lit(1) - col("pos")).as("nn"))
        .select(col("np").as("n_pos"), col("nn").as("n_neg"), col("s2mid"),
          expr("(s2mid - np * (np + 1)) * 1000000 div (2 * np * nn)")
            .as("auc_ppm"))
    },

    // ---- rolling-window distinct via HLL register merges -------------------
    // WHY sketches exist at 100 TB: rolling 7-day distinct users,
    // exactly, means re-touching 7 days of raw events per output day;
    // with per-day HLL register tables it is a bucket-keyed window MAX
    // over the last 7 days' registers — sketch merges, no re-scan.
    // Per calendar day (densified — an absent day is an empty sketch):
    // exact daily distinct, HLL daily estimate, exact rolling-7d
    // distinct, HLL rolling estimate from MERGED registers, both
    // errors in ppm. Same m=256 integer kernel as p121 (bucket = top
    // 8 h60 bits, quantized harmonic mean, exact rational α₂₅₆) PLUS
    // the standard linear-counting switch for the low-load regime
    // daily grains live in — lc(V) = round(256·ln(256/V)) embedded as
    // the SAME literal table in both engines (they never run ln, so
    // libm ulp differences can't split the hash). Measured ≤2% error
    // vs ~90% raw-HLL bias at this daily cardinality.
    // The exact rolling reference is computed the bounded way: each
    // (user, day) contributes to ≤7 grid days via a fixed explode —
    // never a per-day rescan of events.
    //
    // Scale shape: registers are O(days × 256) rows built by one
    // map-side-combinable max; the rolling merge is a per-bucket
    // ROWS-6-PRECEDING window over that metadata grid. The exact
    // references exist only for the harness — production keeps the
    // sketches and drops the raw scan, which is the point.
    Q("p153_rolling_hll", Some(s"""
      WITH ud AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('day', ts) AS DATE) AS day
                  FROM events),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
      days AS (SELECT CAST(unnest(generate_series(b.lo, b.hi,
                        INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      h AS (SELECT day, ${Portable.h60Sql(
        "concat('hll:', CAST(user_id AS VARCHAR))")} AS h FROM ud),
      rho AS (SELECT day, h // 4503599627370496 AS bucket,
                     CASE WHEN h % 4503599627370496 = 0 THEN 53
                          ELSE 53 - length(bin(h % 4503599627370496))
                     END AS r
              FROM h),
      m AS (SELECT day, bucket, CAST(max(r) AS BIGINT) AS reg
            FROM rho GROUP BY 1, 2),
      bk AS (SELECT unnest(generate_series(0, 255)) AS bucket),
      grid AS (SELECT d.day, bk.bucket, coalesce(m.reg, 0) AS reg
               FROM days d CROSS JOIN bk
               LEFT JOIN m ON m.day = d.day AND m.bucket = bk.bucket),
      roll AS (SELECT day, bucket,
                      max(reg) OVER (PARTITION BY bucket ORDER BY day
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                        AS reg7,
                      reg
               FROM grid),
      lcv(v, e) AS (VALUES ${lcTable.map { case (v, e) => s"($v, $e)" }
        .mkString(", ")}),
      sums AS (SELECT day,
                      CAST(sum(CASE WHEN reg <= 20
                        THEN CAST(1 AS BIGINT) << (20 - reg)
                        ELSE 0 END) AS BIGINT) AS dd,
                      CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS z,
                      CAST(sum(CASE WHEN reg7 <= 20
                        THEN CAST(1 AS BIGINT) << (20 - reg7)
                        ELSE 0 END) AS BIGINT) AS dd7,
                      CAST(sum(CASE WHEN reg7 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS z7
               FROM roll GROUP BY 1),
      est AS (SELECT s.day,
                     CAST(CASE WHEN s.z > 0
                            AND 126892437938372608 // (2570790 * s.dd) <= 640
                          THEN l1.e
                          ELSE 126892437938372608 // (2570790 * s.dd)
                     END AS BIGINT) AS est_day,
                     CAST(CASE WHEN s.z7 > 0
                            AND 126892437938372608 // (2570790 * s.dd7) <= 640
                          THEN l7.e
                          ELSE 126892437938372608 // (2570790 * s.dd7)
                     END AS BIGINT) AS est_7d
              FROM sums s LEFT JOIN lcv l1 ON l1.v = s.z
                          LEFT JOIN lcv l7 ON l7.v = s.z7),
      exd AS (SELECT day, CAST(count(*) AS BIGINT) AS n_day
              FROM ud GROUP BY 1),
      sp AS (SELECT user_id, day + CAST(i AS INTEGER) AS gday
             FROM ud, (SELECT unnest(generate_series(0, 6)) AS i)),
      ex7 AS (SELECT gday AS day,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_7d
              FROM sp JOIN days ON days.day = sp.gday GROUP BY 1)
      SELECT CAST(d.day AS VARCHAR) AS day,
             coalesce(exd.n_day, 0) AS n_day, est.est_day,
             ex7.n_7d, est.est_7d,
             CAST(abs(est.est_7d - ex7.n_7d) * 1000000 // ex7.n_7d
               AS BIGINT) AS err_7d_ppm
      FROM days d JOIN est ON est.day = d.day
           LEFT JOIN exd ON exd.day = d.day
           JOIN ex7 ON ex7.day = d.day
      ORDER BY 1""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      // single-division estimate 126892437938372608 // (2570790·ΣD),
      // exactly the p121 constant (α₂₅₆ as 1846528/2570790, ·m²·2^20)
      val ud = Tables.load(spark, dir, "events")
        .select(col("user_id"),
          date_trunc("DAY", col("ts")).cast("date").as("day"))
        .distinct().localCheckpoint()
      val b = ud.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val days = b.select(explode(
        expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val m = ud
        .select(col("day"),
          Portable.h60(concat(lit("hll:"), col("user_id").cast("string")))
            .as("h"))
        .select(col("day"), expr("h div 4503599627370496").as("bucket"),
          when(col("h") % 4503599627370496L === 0, 53L)
            .otherwise(lit(53L) - length(bin(col("h") % 4503599627370496L)))
            .as("r"))
        .groupBy(col("day"), col("bucket")).agg(max(col("r")).as("reg"))
      val grid = days
        .crossJoin(broadcast(
          spark.range(0, 256).select(col("id").as("bucket"))))
        .join(m, Seq("day", "bucket"), "left")
        .select(col("day"), col("bucket"),
          coalesce(col("reg"), lit(0L)).as("reg"))
      val roll = grid.withColumn("reg7",
        max(col("reg")).over(Window.partitionBy(col("bucket"))
          .orderBy(col("day")).rowsBetween(-6, 0)))
      val lcv = {
        import spark.implicits._
        broadcast(lcTable.toDF("v", "e"))
      }
      val est = roll.groupBy(col("day"))
        .agg(
          sum(when(col("reg") <= 20,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - reg AS INT))"))
            .otherwise(0L)).as("dd"),
          sum(when(col("reg") === 0, 1L).otherwise(0L)).as("z"),
          sum(when(col("reg7") <= 20,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - reg7 AS INT))"))
            .otherwise(0L)).as("dd7"),
          sum(when(col("reg7") === 0, 1L).otherwise(0L)).as("z7"))
        .join(lcv.select(col("v").as("z"), col("e").as("e1")), Seq("z"),
          "left")
        .join(lcv.select(col("v").as("z7"), col("e").as("e7")), Seq("z7"),
          "left")
        .select(col("day"),
          expr("CASE WHEN z > 0 AND " +
            "126892437938372608L div (2570790 * dd) <= 640 THEN e1 " +
            "ELSE 126892437938372608L div (2570790 * dd) END")
            .as("est_day"),
          expr("CASE WHEN z7 > 0 AND " +
            "126892437938372608L div (2570790 * dd7) <= 640 THEN e7 " +
            "ELSE 126892437938372608L div (2570790 * dd7) END")
            .as("est_7d"))
      val exd = ud.groupBy(col("day")).agg(count(lit(1)).as("n_day"))
      val ex7 = ud
        .crossJoin(broadcast(spark.range(0, 7).select(col("id").as("i"))))
        .select(col("user_id"), expr("date_add(day, CAST(i AS INT))")
          .as("day"))
        .join(days, "day")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("n_7d"))
      days.join(est, "day").join(exd, Seq("day"), "left").join(ex7, "day")
        .select(col("day").cast("string").as("day"),
          coalesce(col("n_day"), lit(0L)).as("n_day"), col("est_day"),
          col("n_7d"), col("est_7d"),
          expr("abs(est_7d - n_7d) * 1000000 div n_7d").as("err_7d_ppm"))
        .orderBy(col("day"))
    },

    // ---- STREAMING ingest dedup (the p122 path as a file stream) -----------
    // The same verdicts as batch p122, produced by the streaming
    // deployment shape: arriving documents are a file stream, each
    // micro-batch screened against the static standing corpus inside
    // `foreachBatch` (per-batch batch semantics — the production
    // pattern for ingest dedup, since a verdict depends only on the
    // corpus, not on batching). The oracle is the SAME SQL text as
    // p122: the hash match is the batch≡stream equivalence proof,
    // the p83/p107 pattern applied to the dedup path.
    Q("p152_stream_ingest_dedup", Some(incrementalDedupOracle)) {
      (spark, dir) =>
        val root = sinkDir(s"p152_${Integer.toHexString(dir.hashCode)}") +
          s"/${System.nanoTime()}"
        graft.streaming.StreamingOps.dedupIngest(spark, dir, root)
          .select(col("doc_id"), col("n_dups"),
            col("min_hamming").cast("long").as("min_hamming"),
            col("is_dup"))
          .orderBy(col("doc_id"))
    }
  )
}
