package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Portable, TextOps}

/** Round-11 pipeline entries: HITS hubs/authorities completing the
  * graph family, a language-ID confusion census against the declared
  * label, successor-diversity phrase boundaries, a per-language
  * tokenizer-fertility rollup, an integer-exact Johnson–Lindenstrauss
  * projection fidelity harness, and a discrete-geometric noisy-count
  * release (the DP mechanism shape, deterministic for the oracle).
  */
object Pipeline17 {

  private val wsSql = TextSql.ws

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix (16×64), fixed
    * at build time from md5 parity so the Spark side and the DuckDB
    * oracle inline the SAME literals — no cross-engine hashing in the
    * projection hot path, and the planes are reproducible fleet-wide
    * the way [[graft.ops.SimilarityOps.srpHyperplanes]] planes are.
    */
  private[graft] val JlSigns: Seq[Seq[Int]] = (0 until 16).map { j =>
    (0 until 64).map { d =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$j:$d".getBytes("UTF-8"))
      if ((md(0) & 1) == 0) 1 else -1
    }
  }

  val all: Seq[Q] = Seq(

    // ---- HITS hubs/authorities over the source graph -----------------------
    // The graph family's missing classic (PageRank p63, harmonic p210,
    // k-core p116 ship): Kleinberg's HITS separates "hub" sources
    // (whose docs near-duplicate INTO many others — aggregator/mirror
    // behavior) from "authorities" (near-duplicated FROM — origin
    // content), which is exactly the asymmetry a dedup-provenance
    // investigation needs and PageRank's single score can't show.
    // Directed edges: near-dup pair (a, b), a < b, orients
    // source(a) → source(b); two mutual-reinforcement rounds with
    // MAX-normalization in exact integer ppm (no L2 norm, no floats —
    // every engine agrees bit-for-bit).
    //
    // Scale shape: pairs come off the SharedStages capture; after the
    // source-level aggregation the graph is |sources|² bounded — the
    // iteration is broadcast-sized metadata regardless of corpus.
    Q("p254_hits_scores", Some(s"""
      WITH ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      src AS (SELECT doc_id, source FROM documents),
      e0 AS (SELECT sa.source AS s, sb.source AS t FROM spairs
             JOIN src sa ON spairs.a = sa.doc_id
             JOIN src sb ON spairs.b = sb.doc_id
             WHERE sa.source <> sb.source),
      e AS (SELECT s, t, CAST(COUNT(*) AS BIGINT) AS w FROM e0 GROUP BY 1, 2),
      nodes AS (SELECT DISTINCT source AS node FROM documents),
      a1r AS (SELECT t AS node, CAST(SUM(w) * 1000000 AS BIGINT) AS v
              FROM e GROUP BY 1),
      a1m AS (SELECT greatest(max(v), 1) AS m FROM a1r),
      a1 AS (SELECT n.node,
                    CAST(COALESCE(a1r.v, 0) * 1000000 // a1m.m AS BIGINT) AS a
             FROM nodes n LEFT JOIN a1r ON n.node = a1r.node CROSS JOIN a1m),
      h1r AS (SELECT e.s AS node, CAST(SUM(e.w * a1.a) AS BIGINT) AS v
              FROM e JOIN a1 ON e.t = a1.node GROUP BY 1),
      h1m AS (SELECT greatest(max(v), 1) AS m FROM h1r),
      h1 AS (SELECT n.node,
                    CAST(COALESCE(h1r.v, 0) * 1000000 // h1m.m AS BIGINT) AS h
             FROM nodes n LEFT JOIN h1r ON n.node = h1r.node CROSS JOIN h1m),
      a2r AS (SELECT e.t AS node, CAST(SUM(e.w * h1.h) AS BIGINT) AS v
              FROM e JOIN h1 ON e.s = h1.node GROUP BY 1),
      a2m AS (SELECT greatest(max(v), 1) AS m FROM a2r),
      a2 AS (SELECT n.node,
                    CAST(COALESCE(a2r.v, 0) * 1000000 // a2m.m AS BIGINT) AS a
             FROM nodes n LEFT JOIN a2r ON n.node = a2r.node CROSS JOIN a2m),
      h2r AS (SELECT e.s AS node, CAST(SUM(e.w * a2.a) AS BIGINT) AS v
              FROM e JOIN a2 ON e.t = a2.node GROUP BY 1),
      h2m AS (SELECT greatest(max(v), 1) AS m FROM h2r),
      h2 AS (SELECT n.node,
                    CAST(COALESCE(h2r.v, 0) * 1000000 // h2m.m AS BIGINT) AS h
             FROM nodes n LEFT JOIN h2r ON n.node = h2r.node CROSS JOIN h2m)
      SELECT h2.node AS source, h2.h AS hub_ppm, a2.a AS auth_ppm
      FROM h2 JOIN a2 ON h2.node = a2.node
      ORDER BY auth_ppm DESC, hub_ppm DESC, source""")) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents")
      val pairs = SharedStages.spairs(spark, dir)
      val src = docs.select(col("doc_id"), col("source"))
      val e = pairs
        .join(src.select(col("doc_id").as("a"), col("source").as("s")), "a")
        .join(src.select(col("doc_id").as("b"), col("source").as("t")), "b")
        .filter(col("s") =!= col("t"))
        .groupBy(col("s"), col("t")).agg(count(lit(1)).as("w"))
        .localCheckpoint() // |sources|²-bounded; reused by all 4 steps
      val nodes = docs.select(col("source").as("node")).distinct()
        .localCheckpoint()
      // MAX-normalize to exact integer ppm (absent nodes -> 0)
      def norm(raw: DataFrame, out: String): DataFrame = {
        val m = raw.agg(greatest(max(col("v")), lit(1L)).as("m"))
        nodes.join(raw, Seq("node"), "left").crossJoin(broadcast(m))
          .select(col("node"),
            expr("coalesce(v, 0) * 1000000 div m").as(out))
      }
      val a1 = norm(e.groupBy(col("t").as("node"))
        .agg((sum(col("w")) * 1000000).as("v")), "a")
      val h1 = norm(e.join(a1.select(col("node").as("t"), col("a")), "t")
        .groupBy(col("s").as("node"))
        .agg(sum(col("w") * col("a")).as("v")), "h")
      val a2 = norm(e.join(h1.select(col("node").as("s"), col("h")), "s")
        .groupBy(col("t").as("node"))
        .agg(sum(col("w") * col("h")).as("v")), "a")
      val h2 = norm(e.join(a2.select(col("node").as("t"), col("a")), "t")
        .groupBy(col("s").as("node"))
        .agg(sum(col("w") * col("a")).as("v")), "h")
      h2.join(a2, "node")
        .select(col("node").as("source"), col("h").as("hub_ppm"),
          col("a").as("auth_ppm"))
        .orderBy(col("auth_ppm").desc, col("hub_ppm").desc, col("source"))
    },

    // ---- language-ID confusion census --------------------------------------
    // The lang-ID EVALUATION view p02 (detection only) doesn't give:
    // documents carry a DECLARED `lang` (the upstream crawler's claim)
    // and the census of declared × detected — with each cell's share
    // of its declared row in exact ppm — is the confusion matrix a
    // pipeline owner reads before trusting either label for mixture
    // control. Diagonal mass = agreement; off-diagonal rows show
    // which declared languages the n-gram profiles can't separate.
    //
    // Scale shape: detection is scan-stage arithmetic (the p02
    // kernels); the census is a ≤|langs|²+1 aggregate.
    Q("p255_lang_confusion", Some {
      val names = TextOps.langProfiles.map(_._1)
      val scoreSql = names.map(l =>
        s"CAST(${TextSql.langScore(wsSql, l)} AS BIGINT) AS s_$l")
        .mkString(", ")
      s"""
      WITH d AS (SELECT lang AS declared, $scoreSql FROM documents),
      x AS (SELECT declared,
                   ${TextSql.langCase(l => s"s_$l")} AS detected FROM d),
      c AS (SELECT declared, detected, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM x GROUP BY 1, 2),
      t AS (SELECT declared, CAST(SUM(n_docs) AS BIGINT) AS tot
            FROM c GROUP BY 1)
      SELECT c.declared, c.detected, c.n_docs,
             CAST(c.n_docs * 1000000 // t.tot AS BIGINT) AS share_ppm
      FROM c JOIN t USING (declared)
      ORDER BY declared, detected"""
    }) { (spark, dir) =>
      val c = Tables.loadSpread(spark, dir, "documents")
        .select(col("lang").as("declared"),
          TextOps.langId(col("text")).as("detected"))
        .groupBy(col("declared"), col("detected"))
        .agg(count(lit(1)).as("n_docs"))
      val t = c.groupBy(col("declared")).agg(sum(col("n_docs")).as("tot"))
      c.join(t, "declared")
        .select(col("declared"), col("detected"), col("n_docs"),
          expr("n_docs * 1000000 div tot").as("share_ppm"))
        .orderBy(col("declared"), col("detected"))
    },

    // ---- successor-diversity phrase boundaries ------------------------------
    // Unsupervised phrase-boundary detection by branching diversity
    // (the Harris / branching-entropy heuristic): inside a collocation
    // the next token is near-deterministic (low successor diversity);
    // at a phrase boundary anything can follow (high diversity). Per
    // context token: continuation count, distinct successors, and the
    // successor distribution's floor-log2 diversity in milli-bits —
    // the p161 bit-length quantization (length(bin(n // c)) − 1), so
    // the "entropy" is EXACT integers in both engines, no libm. PMI
    // (p61) scores pair association; this scores the cut points
    // between phrases — the other half of phrase extraction.
    //
    // Scale shape: one bigram explode in the scan stage; the census is
    // vocab-bounded (contexts are tokens, Heaps-bounded at scale).
    Q("p256_branching_diversity", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      bg AS (SELECT string_split(sh, ' ')[1] AS ctx,
                    string_split(sh, ' ')[2] AS nxt
             FROM (SELECT unnest(${TextSql.shingles("ws", 2)}) AS sh FROM w)),
      c AS (SELECT ctx, nxt, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY 1, 2),
      tot AS (SELECT ctx, CAST(SUM(c) AS BIGINT) AS n_cont,
                     CAST(COUNT(*) AS BIGINT) AS n_next
              FROM c GROUP BY 1),
      s AS (SELECT c.ctx,
                   CAST(SUM(c.c * (length(bin(t.n_cont // c.c)) - 1))
                     AS BIGINT) AS bits
            FROM c JOIN tot t USING (ctx) GROUP BY 1)
      SELECT t.ctx AS context, t.n_cont, t.n_next,
             CAST(s.bits * 1000 // t.n_cont AS BIGINT) AS div_millibits
      FROM tot t JOIN s ON s.ctx = t.ctx
      WHERE t.n_cont >= 5
      ORDER BY context""")) { (spark, dir) =>
      val bg = Tables.loadSpread(spark, dir, "documents")
        .select(explode(TextOps.shingles(col("text"), 2)).as("sh"))
        .select(split(col("sh"), " ").getItem(0).as("ctx"),
          split(col("sh"), " ").getItem(1).as("nxt"))
      val c = bg.groupBy(col("ctx"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val tot = c.groupBy(col("ctx"))
        .agg(sum(col("c")).as("n_cont"), count(lit(1)).as("n_next"))
      val s = c.join(tot, "ctx")
        .select(col("ctx"),
          (col("c") * (length(bin(expr("n_cont div c"))) - 1)).as("term"))
        .groupBy(col("ctx")).agg(sum(col("term")).as("bits"))
      tot.join(s, "ctx").where(col("n_cont") >= 5)
        .select(col("ctx").as("context"), col("n_cont"), col("n_next"),
          expr("bits * 1000 div n_cont").as("div_millibits"))
        .orderBy(col("context"))
    },

    // ---- tokenizer fertility census ----------------------------------------
    // The tokenizer-eval rollup every multilingual data report leads
    // with: per declared language, how many BPE-ish tokens a word
    // costs (fertility) and how many characters a word carries — the
    // two ratios that decide token-budget allocation across languages
    // (a high-fertility language consumes budget faster than its text
    // share suggests). Exact integer ppm; p01 reports the per-doc
    // stats, this is the per-LANGUAGE comparison view.
    //
    // Scale shape: pure scan-stage counting into a ≤|langs| aggregate.
    Q("p257_fertility_census", Some(s"""
      WITH d AS (SELECT lang,
                        CAST(len($wsSql) AS BIGINT) AS words,
                        CAST(len(regexp_extract_all(lower(text),
                          '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpeish,
                        CAST(length(text) AS BIGINT) AS chars
                 FROM documents)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(words) AS BIGINT) AS n_words,
             CAST(SUM(bpeish) AS BIGINT) AS n_bpeish,
             CAST(SUM(bpeish) * 1000000 // SUM(words) AS BIGINT)
               AS fertility_ppm,
             CAST(SUM(chars) * 1000000 // SUM(words) AS BIGINT)
               AS chars_per_word_ppm
      FROM d GROUP BY 1 ORDER BY lang""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(col("lang"),
          TextOps.tokenCount(col("text")).as("words"),
          TextOps.bpeishCount(col("text")).as("bpeish"),
          length(col("text")).cast("long").as("chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("words")).as("n_words"),
          sum(col("bpeish")).as("n_bpeish"),
          expr("sum(bpeish) * 1000000 div sum(words)").as("fertility_ppm"),
          expr("sum(chars) * 1000000 div sum(words)")
            .as("chars_per_word_ppm"))
        .orderBy(col("lang"))
    },

    // ---- Johnson–Lindenstrauss projection fidelity -------------------------
    // The dimensionality-reduction eval beside the matryoshka one
    // (p97 evaluates TRAINED nested prefixes; JL works on ANY
    // embedding): project 64 → 16 dims through the fixed ±1 sign
    // matrix and measure recall@10 of projected max-inner-product
    // retrieval against the full-dimension ground truth, per panel
    // query. Everything is EXACT integers: embeddings quantize to
    // 1e-4 fixed point (floor — identical in both engines), the
    // projection is an integer matrix-vector product, and ranking is
    // by integer dot with id tie-break — so the oracle hash-match
    // pins the whole pipeline, not a float approximation of it.
    //
    // Scale shape: the projection is one scan-stage kernel; ground
    // truth is panel×corpus by construction (an eval harness needs
    // exact GT — the p252 discipline) with a literal-bounded panel,
    // so it stays ONE corpus scan at any scale.
    Q("p258_jl_fidelity", Some {
      val signs = JlSigns.map(_.mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"""
      WITH v AS (SELECT vec_id,
                        [CAST(floor(x * 10000) AS BIGINT)
                         for x in CAST(embedding AS DOUBLE[])] AS q
                 FROM embeddings),
      sg AS (SELECT $signs AS s),
      p AS (SELECT vec_id,
                   [CAST(list_sum([s[j][d] * q[d]
                                   for d in generate_series(1, 64)])
                      AS BIGINT)
                    for j in generate_series(1, 16)] AS y
            FROM v CROSS JOIN sg),
      qs AS (SELECT v.vec_id AS query_id, v.q AS qq, p.y AS qy
             FROM v JOIN p ON v.vec_id = p.vec_id WHERE v.vec_id < 16),
      fd AS (SELECT qs.query_id, v.vec_id,
                    CAST(list_sum([qs.qq[d] * v.q[d]
                                   for d in generate_series(1, 64)])
                      AS BIGINT) AS dot
             FROM qs CROSS JOIN v WHERE v.vec_id <> qs.query_id),
      fr AS (SELECT query_id, vec_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY dot DESC, vec_id) AS rk
             FROM fd),
      pd AS (SELECT qs.query_id, p.vec_id,
                    CAST(list_sum([qs.qy[j] * p.y[j]
                                   for j in generate_series(1, 16)])
                      AS BIGINT) AS dot
             FROM qs CROSS JOIN p WHERE p.vec_id <> qs.query_id),
      pr AS (SELECT query_id, vec_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY dot DESC, vec_id) AS rk
             FROM pd),
      o AS (SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT query_id, vec_id FROM fr WHERE rk <= 10) f
            JOIN (SELECT query_id, vec_id FROM pr WHERE rk <= 10) pp
              ON f.query_id = pp.query_id AND f.vec_id = pp.vec_id
            GROUP BY 1)
      SELECT q.query_id, CAST(COALESCE(o.c, 0) AS BIGINT) AS recall10
      FROM (SELECT DISTINCT query_id FROM qs) q
      LEFT JOIN o USING (query_id)
      ORDER BY query_id"""
    }) { (spark, dir) =>
      val signsExpr = "array(" + JlSigns.map(r =>
        "array(" + r.mkString(", ") + ")").mkString(", ") + ")"
      val v = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(cast(embedding as array<double>), " +
            "x -> cast(floor(x * 10000) as bigint))").as("q"))
      val p = v.withColumn("y",
        expr(s"transform($signsExpr, row -> " +
          "aggregate(zip_with(row, q, (s, x) -> s * x), 0L, " +
          "(acc, t) -> acc + t))"))
        .localCheckpoint() // one projection pass feeds GT and probe
      val qs = p.where(col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), col("q").as("qq"),
          col("y").as("qy"))
      def ranked(dotted: DataFrame): DataFrame =
        dotted.withColumn("rk", row_number().over(
            Window.partitionBy(col("query_id"))
              .orderBy(col("dot").desc, col("vec_id"))))
          .where(col("rk") <= 10).select(col("query_id"), col("vec_id"))
      val fr = ranked(p.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          expr("aggregate(zip_with(qq, q, (a, b) -> a * b), 0L, " +
            "(acc, t) -> acc + t)").as("dot")))
      val pr = ranked(p.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          expr("aggregate(zip_with(qy, y, (a, b) -> a * b), 0L, " +
            "(acc, t) -> acc + t)").as("dot")))
      val o = fr.join(pr, Seq("query_id", "vec_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("c"))
      qs.select(col("query_id")).distinct()
        .join(o, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("c"), lit(0L)).as("recall10"))
        .orderBy(col("query_id"))
    },

    // ---- discrete-geometric noisy count release ----------------------------
    // The differential-privacy release MECHANISM in auditable form
    // (k-anonymity p131 suppresses; this perturbs): per-source doc
    // counts released with two-sided geometric noise — the discrete
    // Laplace that integer DP uses — where each geometric(1/2) draw
    // is the trailing-zero count of a portable 60-bit hash
    // (P[tz = k] = 2^-(k+1), exactly geometric), so the "randomness"
    // is a deterministic function of the source name: reproducible
    // fleet-wide, hash-checkable cross-engine, and honest about being
    // a FIXED-SEED release (a production deployment swaps the seed
    // per release epoch; the mechanism and its integer arithmetic are
    // what this entry pins). Release clamps at 0; the noise column
    // makes the audit view self-describing.
    //
    // Scale shape: a |sources|-sized aggregate; the hash draw is per
    // GROUP, not per row.
    // ---- dedup cluster density (chaining over-merge audit) -----------------
    // Single-link CC merges by CHAINS: A~B and B~C put A and C in one
    // cluster even when A and C are unrelated — the classic over-merge
    // failure of near-dup clustering. The audit is each cluster's edge
    // DENSITY (2e / s(s−1) in exact ppm): density 1e6 = clique = a true
    // duplicate family; low density = a chain the threshold should not
    // have merged. The census over size-class × density-band is the
    // one-screen answer to "is our clustering gluing strangers" —
    // p105's global transitivity says how much chaining exists, this
    // says WHERE it lands. Every pair edge is intra-cluster by CC
    // construction, so the edge count per cluster is one keyed join.
    //
    // Scale shape: labels and pairs are the SharedStages tables; one
    // join + two metadata-sized aggregates.
    Q("p260_cluster_density", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      esym AS (SELECT a AS u, b AS v FROM spairs
               UNION SELECT b, a FROM spairs),
      walk(u, v) AS (SELECT u, v FROM esym
                     UNION
                     SELECT wk.u, e.v FROM walk wk
                     JOIN esym e ON wk.v = e.u),
      lbl AS (SELECT u AS n, least(u, min(v)) AS cluster_id
              FROM walk GROUP BY u),
      sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS s
             FROM lbl GROUP BY 1),
      ec AS (SELECT l.cluster_id, CAST(COUNT(*) AS BIGINT) AS e
             FROM spairs p JOIN lbl l ON p.a = l.n GROUP BY 1),
      d AS (SELECT sz.cluster_id, s,
                   CAST(2 * COALESCE(e, 0) * 1000000 // (s * (s - 1))
                     AS BIGINT) AS density_ppm
            FROM sz LEFT JOIN ec USING (cluster_id)),
      c AS (SELECT CASE WHEN s < 4 THEN 's2_3'
                        WHEN s < 8 THEN 's4_7' ELSE 's8p' END AS size_class,
                   CAST(density_ppm // 100000 AS BIGINT) AS band, s
            FROM d)
      SELECT size_class, band, CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(SUM(s) AS BIGINT) AS n_docs
      FROM c GROUP BY 1, 2 ORDER BY size_class, band""")) { (spark, dir) =>
      val lbl = SharedStages.labels(spark, dir)
      val sp = SharedStages.spairs(spark, dir)
      val sz = lbl.groupBy(col("cluster_id")).agg(count(lit(1)).as("s"))
      val ec = sp
        .join(lbl.select(col("doc_id").as("a"), col("cluster_id")), "a")
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("e"))
      sz.join(ec, Seq("cluster_id"), "left")
        .select(col("s"),
          expr("2 * coalesce(e, 0) * 1000000 div (s * (s - 1))")
            .as("density_ppm"))
        .select(
          when(col("s") < 4, "s2_3").when(col("s") < 8, "s4_7")
            .otherwise("s8p").as("size_class"),
          expr("density_ppm div 100000").as("band"), col("s"))
        .groupBy(col("size_class"), col("band"))
        .agg(count(lit(1)).as("n_clusters"), sum(col("s")).as("n_docs"))
        .orderBy(col("size_class"), col("band"))
    },

    // ---- mutual k-NN census (reciprocal-match primitive) -------------------
    // Matching needs RECIPROCITY, not just proximity: u's nearest
    // neighbor means nothing if u is v's 200th — mutual top-k is the
    // robust edge set bitext mining and duplicate MATCHING build on
    // (one-directional kNN is the recall tool, p10). The candidate
    // block is (label, 8-bit SRP bucket) with p150's 2..200 member
    // cap: pair generation NEVER goes corpus² — a label is
    // corpus-linear, but a capped bucket is ≤200 members, and
    // over-full or singleton blocks abstain (REPORTED via
    // n_eligible, the no-silent-caps discipline; plane count is the
    // resolution knob you raise with the corpus, the member cap is
    // the hard bound). Within each block: exact integer dots over the
    // p258 1e-4 fixed-point quantization, top-3 per vector via the
    // TopN kernel (group-local, no global window) with id tie-break,
    // and a pair survives only if each endpoint ranks inside the
    // other's top-3. Census per label: vectors, cap-eligible
    // vectors, mutual pairs, and the strongest mutual pair.
    //
    // Scale shape: one bucket-forming shuffle (bucket computed
    // scan-side), block-local pair gen bounded by the 200-member cap
    // (≤ 200·n rows), a u-keyed top-3 rollup, a ≤3n reciprocity
    // self-join, and |labels|-sized census aggregates.
    Q("p261_mutual_knn", Some {
      val planes = graft.ops.SimilarityOps.srpHyperplanes(8, 64)
      val bucketSql = planes.zipWithIndex.map { case (h, j) =>
        // plane entries emitted VERBATIM so the oracle buckets with the
        // exact values SimilarityOps.srpBucket uses — if the generator
        // ever stops emitting ±1.0 the two engines still agree
        val arr = h.map(_.toString).mkString("[", ",", "]")
        s"CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                        [CAST(floor(x * 10000) AS BIGINT)
                         for x in CAST(embedding AS DOUBLE[])] AS q
                 FROM embeddings),
      bx AS (SELECT vec_id, label, q, $bucketSql AS bk FROM v),
      el AS (SELECT * FROM bx
             QUALIFY COUNT(*) OVER (PARTITION BY label, bk)
                     BETWEEN 2 AND 200),
      d AS (SELECT x.label, x.vec_id AS u, y.vec_id AS w,
                   CAST(list_sum([x.q[i] * y.q[i]
                                  for i in generate_series(1, 64)])
                     AS BIGINT) AS dot
            FROM el x JOIN el y
              ON x.label = y.label AND x.bk = y.bk
                 AND x.vec_id <> y.vec_id),
      r AS (SELECT label, u, w, dot,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY dot DESC, w) AS rk
            FROM d),
      t AS (SELECT label, u, w, dot FROM r WHERE rk <= 3),
      m AS (SELECT x.label, x.u AS a, x.w AS b, x.dot
            FROM t x JOIN t y ON x.u = y.w AND x.w = y.u AND x.u < x.w),
      nv AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
             FROM v GROUP BY 1),
      ne AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_eligible
             FROM el GROUP BY 1),
      nm AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_mutual
             FROM m GROUP BY 1),
      best AS (SELECT label, a, b, dot,
                      row_number() OVER (PARTITION BY label
                                         ORDER BY dot DESC, a, b) AS rk
               FROM m)
      SELECT CAST(nv.label AS BIGINT) AS label, nv.n_vecs,
             CAST(COALESCE(ne.n_eligible, 0) AS BIGINT) AS n_eligible,
             CAST(COALESCE(nm.n_mutual, 0) AS BIGINT) AS n_mutual,
             CAST(COALESCE(best.a, -1) AS BIGINT) AS best_a,
             CAST(COALESCE(best.b, -1) AS BIGINT) AS best_b,
             CAST(COALESCE(best.dot, 0) AS BIGINT) AS best_dot
      FROM nv LEFT JOIN ne USING (label)
      LEFT JOIN nm USING (label)
      LEFT JOIN (SELECT * FROM best WHERE rk = 1) best USING (label)
      ORDER BY label"""
    }) { (spark, dir) =>
      import graft.ops.SimilarityOps
      val planes = SimilarityOps.srpHyperplanes(8, 64)
      val v = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id"), col("label"),
          expr("transform(v, x -> cast(floor(x * 10000) as bigint))")
            .as("q"),
          SimilarityOps.srpBucket(col("v"), planes).as("bk"))
        .localCheckpoint() // quantize + bucket once
      val el = v.withColumn("bn", count(lit(1)).over(
          Window.partitionBy(col("label"), col("bk"))))
        .filter(col("bn").between(2, 200))
        .select(col("label"), col("bk"), col("vec_id"), col("q"))
        .localCheckpoint() // reread by both pair-join sides + census
      val d = el.select(col("label"), col("bk"), col("vec_id").as("u"),
          col("q").as("qu"))
        .join(el.select(col("label"), col("bk"), col("vec_id").as("w"),
          col("q").as("qw")), Seq("label", "bk"))
        .where(col("u") =!= col("w"))
        .select(col("label"), col("u"), col("w"),
          expr("aggregate(zip_with(qu, qw, (a, b) -> a * b), 0L, " +
            "(acc, t) -> acc + t)").as("dot"))
      // block-bounded top-3: min over (-dot, w) pairs, the TopN kernel
      val t = d.groupBy(col("label"), col("u"))
        .agg(graft.functions.TopN.minTopN(-col("dot"), col("w"), 3)
          .as("top"))
        .select(col("label"), col("u"), explode(col("top")).as("e"))
        .select(col("label"), col("u"), col("e.id").as("w"),
          (-col("e.h")).as("dot"))
        .localCheckpoint() // ≤3·n_eligible rows; self-joined below
      val m = t.as("x").join(t.as("y"),
          col("x.u") === col("y.w") && col("x.w") === col("y.u") &&
            col("x.u") < col("x.w"))
        .select(col("x.label").as("label"), col("x.u").as("a"),
          col("x.w").as("b"), col("x.dot").as("dot"))
        .localCheckpoint() // read by n_mutual census + best-pair rank
      val nv = v.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
      val ne = el.groupBy(col("label")).agg(count(lit(1)).as("n_eligible"))
      val nm = m.groupBy(col("label")).agg(count(lit(1)).as("n_mutual"))
      val best = m.withColumn("rk", row_number().over(
          Window.partitionBy(col("label"))
            .orderBy(col("dot").desc, col("a"), col("b"))))
        .where(col("rk") === 1)
        .select(col("label"), col("a"), col("b"), col("dot"))
      nv.join(ne, Seq("label"), "left").join(nm, Seq("label"), "left")
        .join(best, Seq("label"), "left")
        .select(col("label").cast("long").as("label"), col("n_vecs"),
          coalesce(col("n_eligible"), lit(0L)).as("n_eligible"),
          coalesce(col("n_mutual"), lit(0L)).as("n_mutual"),
          coalesce(col("a"), lit(-1L)).as("best_a"),
          coalesce(col("b"), lit(-1L)).as("best_b"),
          coalesce(col("dot"), lit(0L)).as("best_dot"))
        .orderBy(col("label"))
    },

    // ---- STREAMING quantile sketch state ------------------------------------
    // p62's decimal-bucket quantile sketch deployed as foreachBatch
    // state (StreamingOps.quantileBucketsIngest): micro-batches fold
    // (event_type, bucket) counts into one versioned state table, and
    // the estimates are read from BUCKETS alone. Bucket counts are
    // additive, so state after N batches ≡ the one-shot bucket table —
    // the oracle replays p62's exact bucket + conservative-rank
    // arithmetic over the raw events, and the hash match is the
    // batch ≡ stream proof (the p248 discipline, now for the sketch
    // family). State is O(types × buckets) at any stream volume.
    Q("p262_stream_quantiles", Some("""
      WITH tp AS (SELECT event_type,
                         CAST(round(value * 1000, 0) AS BIGINT) AS v
                  FROM events
                  WHERE CAST(round(value * 1000, 0) AS BIGINT) > 0),
      b AS (SELECT event_type, v,
                   CAST('1' || repeat('0', greatest(length(CAST(v AS VARCHAR)) - 2, 0))
                        AS BIGINT) AS g
            FROM tp),
      c AS (SELECT event_type, v - v % g AS lb, g, COUNT(*) AS cnt
            FROM b GROUP BY 1, 2, 3),
      n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tp GROUP BY 1),
      cum AS (SELECT event_type, lb, g,
                     SUM(cnt) OVER (PARTITION BY event_type ORDER BY lb) AS cum
              FROM c),
      r AS (SELECT cum.event_type, lb, g, cum, n.n
            FROM cum JOIN n USING (event_type)),
      est AS (SELECT event_type,
                     MIN(CASE WHEN cum >= (500000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p50_est,
                     MIN(CASE WHEN cum >= (900000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p90_est,
                     MIN(CASE WHEN cum >= (990000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p99_est
              FROM r GROUP BY 1)
      SELECT n.event_type, n.n,
             CAST(est.p50_est AS BIGINT) AS p50_est,
             CAST(est.p90_est AS BIGINT) AS p90_est,
             CAST(est.p99_est AS BIGINT) AS p99_est
      FROM n JOIN est USING (event_type)
      ORDER BY event_type""")) { (spark, dir) =>
      val root = sinkDir(s"p262_${Integer.toHexString(dir.hashCode)}") +
        s"/${System.nanoTime()}"
      val st = graft.streaming.StreamingOps
        .quantileBucketsIngest(spark, dir, root)
      val n = st.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
      val cum = st.withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("lb"))))
      def estAt(ppm: Long) = min(when(
        col("cum") >= expr(s"($ppm * n + 999999) div 1000000"),
        col("lb") + expr("g div 2")))
      cum.join(n, "event_type")
        .groupBy(col("event_type"))
        .agg(estAt(500000L).as("p50_est"), estAt(900000L).as("p90_est"),
          estAt(990000L).as("p99_est"))
        .join(n, "event_type")
        .select(col("event_type"), col("n"), col("p50_est"),
          col("p90_est"), col("p99_est"))
        .orderBy(col("event_type"))
    },

    Q("p259_dp_count_release", Some(s"""
      WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_true
                 FROM documents GROUP BY 1),
      u AS (SELECT source, n_true,
                   ${Portable.h60Sql("concat('dp1:', source)")} AS u1,
                   ${Portable.h60Sql("concat('dp2:', source)")} AS u2
            FROM s),
      g AS (SELECT source, n_true,
                   CAST(length(bin(u1 & (-u1))) - 1 AS BIGINT) AS g1,
                   CAST(length(bin(u2 & (-u2))) - 1 AS BIGINT) AS g2
            FROM u)
      SELECT source, n_true, CAST(g1 - g2 AS BIGINT) AS noise,
             CAST(greatest(n_true + g1 - g2, 0) AS BIGINT) AS released
      FROM g ORDER BY source""")) { (spark, dir) =>
      val s = Tables.load(spark, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_true"))
      s.withColumn("u1", Portable.h60(concat(lit("dp1:"), col("source"))))
        .withColumn("u2", Portable.h60(concat(lit("dp2:"), col("source"))))
        .withColumn("g1", (length(bin(expr("u1 & -u1"))) - 1).cast("long"))
        .withColumn("g2", (length(bin(expr("u2 & -u2"))) - 1).cast("long"))
        .select(col("source"), col("n_true"),
          (col("g1") - col("g2")).as("noise"),
          greatest(col("n_true") + col("g1") - col("g2"), lit(0L))
            .as("released"))
        .orderBy(col("source"))
    },

    // ---- STREAMING bitmap-index state ---------------------------------------
    // p166's (event_type, word) bitmap table deployed as foreachBatch
    // state (StreamingOps.bitmapIndexIngest): micro-batches OR their
    // (user, day)-bit deltas into one versioned state table, and the
    // pairwise intersection/union census reads STATE BITMAPS alone.
    // bit_or is IDEMPOTENT, so this fold proof is strictly stronger
    // than the additive cases (p248 counts, p262 buckets): the ingest
    // deliberately OVERLAPS its micro-batch slices (every idx%7==0 row
    // is delivered in all three batches — at-least-once redelivery),
    // and the oracle recomputes the one-shot bitmap from raw events —
    // the hash match proves state after N overlapping batches ≡
    // one-shot, which no additive fold survives. State is
    // |universe|/60 words per type at any stream volume.
    Q("p263_stream_bitmap_index", Some("""
      WITH d AS (SELECT DISTINCT event_type,
                        user_id * 512 + dayofyear(CAST(date_trunc('day', ts)
                          AS DATE)) AS idx
                 FROM events),
      b AS (SELECT event_type, idx // 60 AS w,
                   CAST(bit_or(1::BIGINT << CAST(idx % 60 AS INT))
                     AS BIGINT) AS bm
            FROM d GROUP BY 1, 2),
      nb AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_words,
                    CAST(SUM(bit_count(bm)) AS BIGINT) AS total_bits
             FROM b GROUP BY 1),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                       a.n_words AS n_words_a, b.n_words AS n_words_b,
                       a.total_bits AS tba, b.total_bits AS tbb
                FROM nb a, nb b WHERE a.event_type < b.event_type),
      bi AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
                    CAST(SUM(bit_count(x.bm & y.bm)) AS BIGINT) AS n_int,
                    CAST(SUM(bit_count(x.bm | y.bm)) AS BIGINT) AS u_m,
                    CAST(SUM(bit_count(x.bm)) AS BIGINT) AS m_a,
                    CAST(SUM(bit_count(y.bm)) AS BIGINT) AS m_b
             FROM b x JOIN b y ON x.w = y.w
               AND x.event_type < y.event_type
             GROUP BY 1, 2)
      SELECT p.type_a, p.type_b, p.n_words_a, p.n_words_b,
             coalesce(bi.n_int, 0) AS int_bitmap,
             coalesce(bi.u_m, 0) + (p.tba - coalesce(bi.m_a, 0))
               + (p.tbb - coalesce(bi.m_b, 0)) AS union_bitmap
      FROM pairs p
      LEFT JOIN bi ON bi.type_a = p.type_a AND bi.type_b = p.type_b
      ORDER BY 1, 2""")) { (spark, dir) =>
      val root = sinkDir(s"p263_${Integer.toHexString(dir.hashCode)}") +
        s"/${System.nanoTime()}"
      val st = graft.streaming.StreamingOps
        .bitmapIndexIngest(spark, dir, root)
        .localCheckpoint()
      val nb = st.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_words"),
          sum(expr("bit_count(bm)")).as("total_bits"))
      val pairs = nb.select(col("event_type").as("type_a"),
          col("n_words").as("n_words_a"), col("total_bits").as("tba"))
        .crossJoin(nb.select(col("event_type").as("type_b"),
          col("n_words").as("n_words_b"), col("total_bits").as("tbb")))
        .where(col("type_a") < col("type_b"))
      val bi = st.select(col("event_type").as("type_a"), col("w"),
          col("bm").as("bma"))
        .join(st.select(col("event_type").as("type_b"), col("w"),
          col("bm").as("bmb")), "w")
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(sum(expr("bit_count(bma & bmb)")).as("n_int"),
          sum(expr("bit_count(bma | bmb)")).as("u_m"),
          sum(expr("bit_count(bma)")).as("m_a"),
          sum(expr("bit_count(bmb)")).as("m_b"))
      pairs.join(broadcast(bi), Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("n_words_a"),
          col("n_words_b"),
          coalesce(col("n_int"), lit(0L)).as("int_bitmap"),
          (coalesce(col("u_m"), lit(0L))
            + (col("tba") - coalesce(col("m_a"), lit(0L)))
            + (col("tbb") - coalesce(col("m_b"), lit(0L))))
            .as("union_bitmap"))
        .orderBy(col("type_a"), col("type_b"))
    })
}
