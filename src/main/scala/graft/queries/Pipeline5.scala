package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{ClusterOps, LmOps, Portable, TextOps}

/** Training-data pipeline operators, part 5: corpus organization —
  * iterative k-means clustering over embeddings (the unsupervised step
  * that PRODUCES the IVF/domain labels earlier ops consume) and
  * per-stratum quota sampling (the domain-mix knob every data recipe
  * needs). Same integer-exact conventions as [[Pipeline3]]/[[Pipeline4]].
  */
object Pipeline5 {

  private val wsSql = TextSql.ws

  val all: Seq[Q] = Seq(

    // ---- iterative k-means (Lloyd) over embeddings -------------------------
    // One full Lloyd iteration (assign to the deterministic seed
    // centroids, recompute as integer means) followed by the final
    // assignment — the oracle mirrors the identical scaled-integer
    // arithmetic, so every per-vector cluster id and exact squared
    // distance hash-matches. See [[graft.ops.ClusterOps.kmeansLloyd]]
    // for the scale shape (broadcast assign, one (cluster, dim)
    // shuffle per M-step).
    Q("p56_kmeans_lloyd", Some("""
      WITH v AS (SELECT vec_id,
                        [CAST(round((x + 1.0) * 1000000, 0) AS DOUBLE)
                         for x in CAST(embedding AS DOUBLE[])] AS v
                 FROM embeddings),
      c0 AS (SELECT vec_id AS cid, v AS c FROM v ORDER BY vec_id LIMIT 8),
      a1 AS (SELECT v.vec_id, c0.cid,
                    CAST(list_dot_product(v.v, v.v)
                         - 2 * list_dot_product(v.v, c0.c)
                         + list_dot_product(c0.c, c0.c) AS BIGINT) AS d
             FROM v CROSS JOIN c0),
      s1 AS (SELECT vec_id, cid AS cluster
             FROM (SELECT vec_id, cid, d,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d, cid) AS rk
                   FROM a1) WHERE rk = 1),
      m AS (SELECT s1.cluster, j,
                   CAST(CAST(SUM(v.v[j]) AS BIGINT) // COUNT(*) AS DOUBLE) AS mj
            FROM s1 JOIN v USING (vec_id), generate_series(1, 64) t(j)
            GROUP BY cluster, j),
      c1 AS (SELECT cluster AS cid, list(mj ORDER BY j) AS c FROM m
             GROUP BY cluster),
      a2 AS (SELECT v.vec_id, c1.cid,
                    CAST(list_dot_product(v.v, v.v)
                         - 2 * list_dot_product(v.v, c1.c)
                         + list_dot_product(c1.c, c1.c) AS BIGINT) AS d
             FROM v CROSS JOIN c1)
      SELECT vec_id, cid AS cluster, d
      FROM (SELECT vec_id, cid, d,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d, cid) AS rk
            FROM a2) WHERE rk = 1
      ORDER BY vec_id""")) { (spark, dir) =>
      ClusterOps.kmeansLloyd(Tables.loadSpread(spark, dir, "embeddings"),
          "vec_id", "embedding", k = 8, iters = 1)
        .orderBy(col("vec_id"))
    },

    // ---- per-stratum quota sampling ----------------------------------------
    // The domain-mix sampler: rank documents inside each stratum
    // (detected language) by a salted portable hash and keep the first
    // `quota` — deterministic, fleet-reproducible, no rand(). The
    // Spark side aggregates with the bounded top-n kernel
    // ([[graft.functions.TopN]]): map-side partials carry at most
    // `quota` pairs per stratum, so the shuffle moves O(partitions x
    // strata x quota) rows, NOT the corpus — the shape that survives a
    // 100 TB stratum. The oracle is the equivalent ranked window.
    Q("p57_stratified_sample", Some {
      val names = TextOps.langProfiles.map(_._1)
      val scoreSql = names.map(l =>
        s"CAST(${TextSql.langScore(wsSql, l)} AS BIGINT) AS s_$l")
        .mkString(",\n             ")
      val hSql = Portable.h60Sql("concat('samp:', CAST(doc_id AS VARCHAR))")
      s"""
      WITH t AS (SELECT doc_id, ${TextSql.langCase(l => s"s_$l")} AS lang
                 FROM (SELECT doc_id, $scoreSql FROM documents) raw),
      r AS (SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY $hSql, doc_id) AS rk
            FROM t)
      SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
      FROM r WHERE rk <= 25
      ORDER BY lang, rk"""
    }) { (spark, dir) =>
      import graft.functions.TopN
      val h = Portable.h60(concat(lit("samp:"), col("doc_id").cast("string")))
      Tables.loadSpread(spark, dir, "documents")
        .select(TextOps.langId(col("text")).as("lang"),
          h.as("h"), col("doc_id"))
        .groupBy(col("lang"))
        .agg(TopN.minTopN(col("h"), col("doc_id"), 25).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("rk0", "p")))
        .select(col("lang"), (col("rk0") + 1).cast("long").as("rk"),
          col("p.id").as("doc_id"))
        .orderBy(col("lang"), col("rk"))
    },

    // ---- deterministic train/val/test split assignment ---------------------
    // The split every training corpus needs, as a pure row-local
    // expression: bucket = portable_hash('split:' || doc_id) mod 1000,
    // train < 900, val < 950, test otherwise. No rand(), no state — a
    // document lands in the SAME split on every engine, every rerun,
    // every cluster size, and membership is decidable per row in the
    // scan stage (a 100 TB corpus splits without any shuffle; the only
    // shuffle here is the tiny verification rollup).
    Q("p58_hash_split", Some {
      val hSql = Portable.h60Sql("concat('split:', CAST(doc_id AS VARCHAR))")
      s"""
      WITH t AS (SELECT doc_id, n_chars,
                        CASE WHEN $hSql % 1000 < 900 THEN 'train'
                             WHEN $hSql % 1000 < 950 THEN 'val'
                             ELSE 'test' END AS split
                 FROM documents)
      SELECT split, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             min(doc_id) AS first_id
      FROM t GROUP BY split
      ORDER BY split"""
    }) { (spark, dir) =>
      val b = Portable.h60(concat(lit("split:"), col("doc_id").cast("string"))) % 1000
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          when(b < 900, "train").when(b < 950, "val").otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_id"))
        .orderBy(col("split"))
    },

    // ---- corpus-statistics quality gate (percentile threshold) -------------
    // The "derive the cut from the corpus, then filter" pattern: the
    // per-language p90 document length is computed as a DISCRETE
    // percentile (an actual element — ceil(q*n)-th smallest, identical
    // semantics in Spark's percentile_disc and DuckDB's quantile_disc,
    // no interpolation to drift), then broadcast back and applied as a
    // scan-stage gate. Two aggregates, one broadcast — never a global
    // sort of the corpus.
    Q("p59_quality_gate", Some("""
      WITH t AS (SELECT lang,
                        CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS thr
                 FROM documents GROUP BY lang)
      SELECT d.lang, min(t.thr) AS thr,
             CAST(SUM(CASE WHEN d.n_chars >= t.thr THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept,
             COUNT(*) AS n_total
      FROM documents d JOIN t ON d.lang = t.lang
      GROUP BY d.lang
      ORDER BY d.lang""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val thr = docs.groupBy(col("lang")).agg(
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)")
          .cast("long").as("thr"))
      docs.join(broadcast(thr), "lang")
        .groupBy(col("lang"))
        .agg(min(col("thr")).as("thr"),
          sum(when(col("n_chars") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
          count(lit(1)).as("n_total"))
        .orderBy(col("lang"))
    },

    // ---- end-to-end ANN: train the coarse quantizer, then serve ------------
    // The full IVF pipeline composed from this library's own parts:
    // k-means (p56) trains the coarse quantizer, its cluster ids become
    // the IVF partition key, and the top-k search probes only each
    // query's own bucket (p11 shape). The oracle replays the identical
    // integer-exact training chain and then the bucket-scoped search —
    // pinning that training and serving agree cross-engine END TO END,
    // not just per stage.
    Q("p60_ivf_trained", Some("""
      WITH v AS (SELECT vec_id,
                        [CAST(round((x + 1.0) * 1000000, 0) AS DOUBLE)
                         for x in CAST(embedding AS DOUBLE[])] AS v
                 FROM embeddings),
      c0 AS (SELECT vec_id AS cid, v AS c FROM v ORDER BY vec_id LIMIT 8),
      a1 AS (SELECT v.vec_id, c0.cid,
                    CAST(list_dot_product(v.v, v.v)
                         - 2 * list_dot_product(v.v, c0.c)
                         + list_dot_product(c0.c, c0.c) AS BIGINT) AS d
             FROM v CROSS JOIN c0),
      s1 AS (SELECT vec_id, cid AS cluster
             FROM (SELECT vec_id, cid, d,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d, cid) AS rk
                   FROM a1) WHERE rk = 1),
      m AS (SELECT s1.cluster, j,
                   CAST(CAST(SUM(v.v[j]) AS BIGINT) // COUNT(*) AS DOUBLE) AS mj
            FROM s1 JOIN v USING (vec_id), generate_series(1, 64) t(j)
            GROUP BY cluster, j),
      c1 AS (SELECT cluster AS cid, list(mj ORDER BY j) AS c FROM m
             GROUP BY cluster),
      a2 AS (SELECT v.vec_id, c1.cid,
                    CAST(list_dot_product(v.v, v.v)
                         - 2 * list_dot_product(v.v, c1.c)
                         + list_dot_product(c1.c, c1.c) AS BIGINT) AS d
             FROM v CROSS JOIN c1),
      s2 AS (SELECT vec_id, cid AS cluster
             FROM (SELECT vec_id, cid, d,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY d, cid) AS rk
                   FROM a2) WHERE rk = 1),
      vv AS (SELECT e.vec_id, s2.cluster, CAST(e.embedding AS DOUBLE[]) AS v0
             FROM embeddings e JOIN s2 USING (vec_id)),
      q AS (SELECT vec_id AS query_id, cluster AS qc, v0 AS qv
            FROM vv WHERE vec_id < 20),
      s AS (SELECT query_id, vv.vec_id,
                   round(list_dot_product(qv, v0)
                     / sqrt(list_dot_product(qv, qv))
                     / sqrt(list_dot_product(v0, v0)), 6) AS sim
            FROM vv JOIN q ON vv.cluster = q.qc AND vv.vec_id <> q.query_id),
      r AS (SELECT query_id, vec_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rk
            FROM s)
      SELECT query_id, rk, vec_id, sim FROM r WHERE rk <= 5
      ORDER BY query_id, rk""")) { (spark, dir) =>
      import graft.ops.SimilarityOps
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val trained = ClusterOps.kmeansLloyd(emb, "vec_id", "embedding",
        k = 8, iters = 1).select(col("vec_id"), col("cluster"))
      val v = emb.join(trained, "vec_id")
      SimilarityOps.partitionedTopK(v, v.filter(col("vec_id") < 20),
          "vec_id", "embedding", "cluster", 5)
        .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- PMI collocation mining --------------------------------------------
    // Which adjacent token pairs co-occur far beyond chance — the
    // phrase-mining statistic behind tokenizer-vocabulary and
    // stop-phrase curation. One corpus shuffle (the pair-count
    // groupBy); unigram counts and both totals come back by broadcast.
    // The PMI double is evaluated in IDENTICAL operation order on both
    // engines and rounded to 6 (the q15 ln-determinism pattern).
    Q("p61_pmi_pairs", Some(s"""
      WITH w AS (SELECT $wsSql AS ws FROM documents),
      tok AS (SELECT unnest(ws) AS w FROM w),
      u AS (SELECT w, COUNT(*) AS n1 FROM tok GROUP BY w),
      ut AS (SELECT CAST(SUM(n1) AS BIGINT) AS nn FROM u),
      bgl AS (SELECT unnest(${TextSql.shingles("ws", 2)}) AS bg FROM w),
      b AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
                   COUNT(*) AS n_pair
            FROM bgl GROUP BY 1, 2),
      bt AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS mm FROM b)
      SELECT w1, w2, n_pair,
             round(ln((CAST(n_pair AS DOUBLE) * nn * nn)
                      / (CAST(mm AS DOUBLE) * ua.n1 * ub.n1)), 6) AS pmi
      FROM b
      JOIN u ua ON b.w1 = ua.w
      JOIN u ub ON b.w2 = ub.w
      CROSS JOIN ut CROSS JOIN bt
      WHERE n_pair >= 5
      ORDER BY pmi DESC, w1, w2
      LIMIT 40""")) { (spark, dir) =>
      LmOps.pmiPairs(Tables.loadSpread(spark, dir, "documents"), "text",
        minCount = 5, topK = 40)
    },

    // ---- mergeable decimal-bucket quantile sketch --------------------------
    // DDSketch-style relative-error quantiles as a native mergeable
    // aggregate ([[graft.functions.DqSketch]]): decimal digit-count
    // bins (exact integer math — no float log to disagree at bucket
    // boundaries), map-side partial maps of <=O(buckets) entries, so a
    // 100 TB column's p50/p90/p99 cost one scan — never a sort. The
    // oracle REPLAYS the identical bucket+rank arithmetic in SQL, and
    // the *_exact columns (engine-native discrete percentiles, the p59
    // pattern) ride along so an envelope escape is diagnosable, not an
    // opaque hash diff. The <=5% relative-error guarantee is asserted
    // in PipelineOpsSpec.
    Q("p62_dq_quantiles", Some("""
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
      n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(quantile_disc(v, 0.5) AS BIGINT) AS p50_exact,
                   CAST(quantile_disc(v, 0.9) AS BIGINT) AS p90_exact,
                   CAST(quantile_disc(v, 0.99) AS BIGINT) AS p99_exact
            FROM tp GROUP BY 1),
      cum AS (SELECT event_type, lb, g,
                     SUM(cnt) OVER (PARTITION BY event_type ORDER BY lb) AS cum
              FROM c),
      r AS (SELECT cum.event_type, lb, g, cum, n.n FROM cum JOIN n USING (event_type)),
      est AS (SELECT event_type,
                     MIN(CASE WHEN cum >= (500000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p50_est,
                     MIN(CASE WHEN cum >= (900000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p90_est,
                     MIN(CASE WHEN cum >= (990000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p99_est
              FROM r GROUP BY 1)
      SELECT n.event_type, n.n, est.p50_est, n.p50_exact,
             est.p90_est, n.p90_exact, est.p99_est, n.p99_exact
      FROM n JOIN est USING (event_type)
      ORDER BY event_type""")) { (spark, dir) =>
      import graft.functions.DqSketch
      Tables.loadSpread(spark, dir, "events")
        .select(col("event_type"),
          round(col("value") * 1000, 0).cast("long").as("v"))
        .filter(col("v") > 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          DqSketch.quantilesCol(col("v"), Seq(500000, 900000, 990000)).as("est"),
          // exact discrete percentiles ride along as the DIAGNOSTIC
          // column pair (they sort each group; production uses the
          // sketch alone — this query's point is proving est vs exact)
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
            .cast("long").as("p50_exact"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)")
            .cast("long").as("p90_exact"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY v)")
            .cast("long").as("p99_exact"))
        .select(col("event_type"), col("n"),
          col("est")(0).as("p50_est"), col("p50_exact"),
          col("est")(1).as("p90_est"), col("p90_exact"),
          col("est")(2).as("p99_est"), col("p99_exact"))
        .orderBy(col("event_type"))
    },

    // ---- PageRank source authority over the near-dup graph -----------------
    // Which sources are the CANONICAL origin of duplicated content:
    // cross-source SimHash near-dup pairs (the SHARED spairs definition
    // — p09/p29/p63 can never drift) become a weighted source->source
    // graph, and 3 rounds of damped PageRank (scaled-integer, floor
    // division — [[graft.ops.GraphOps.pageRank]]) rank the sources.
    // The oracle unrolls the identical integer fixpoint, so every rank
    // hash-matches. Per round: one join + one agg, both sized to the
    // GRAPH, not the corpus that produced it.
    Q("p63_source_rank", Some(s"""
      WITH ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      src AS (SELECT doc_id, source FROM documents),
      eraw AS (SELECT sa.source AS s, sb.source AS t FROM spairs
               JOIN src sa ON spairs.a = sa.doc_id
               JOIN src sb ON spairs.b = sb.doc_id
               WHERE sa.source <> sb.source),
      esym AS (SELECT s, t FROM eraw UNION ALL SELECT t AS s, s AS t FROM eraw),
      e AS (SELECT s, t, CAST(COUNT(*) AS BIGINT) AS w FROM esym GROUP BY 1, 2),
      ow AS (SELECT s, CAST(SUM(w) AS BIGINT) AS ow FROM e GROUP BY 1),
      nodes AS (SELECT DISTINCT source AS node FROM documents),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
      f1 AS (SELECT e.t AS node, CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inflow
             FROM e JOIN r0 r ON e.s = r.node JOIN ow o ON e.s = o.s GROUP BY 1),
      r1 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(f1.inflow, 0)) // 100
                                 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN f1 ON n.node = f1.node),
      f2 AS (SELECT e.t AS node, CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inflow
             FROM e JOIN r1 r ON e.s = r.node JOIN ow o ON e.s = o.s GROUP BY 1),
      r2 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(f2.inflow, 0)) // 100
                                 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN f2 ON n.node = f2.node),
      f3 AS (SELECT e.t AS node, CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inflow
             FROM e JOIN r2 r ON e.s = r.node JOIN ow o ON e.s = o.s GROUP BY 1),
      r3 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(f3.inflow, 0)) // 100
                                 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN f3 ON n.node = f3.node)
      SELECT node AS source, rank FROM r3
      ORDER BY rank DESC, source""")) { (spark, dir) =>
      import graft.ops.GraphOps
      // r20: pairs from the SharedStages materialized table (identical
      // by construction — see SharedStages.spairs); the private banded
      // pair pass cost ~2 s per bench pass. Plain load for the source
      // map: the join has no per-row work.
      val docs = Tables.load(spark, dir, "documents")
      val pairs = SharedStages.spairs(spark, dir)
      val src = docs.select(col("doc_id"), col("source"))
      val eraw = pairs
        .join(src.select(col("doc_id").as("a"), col("source").as("s")), "a")
        .join(src.select(col("doc_id").as("b"), col("source").as("t")), "b")
        .filter(col("s") =!= col("t"))
        .select(col("s"), col("t"))
      val esym = eraw.union(eraw.select(col("t"), col("s")))
      val edges = esym.groupBy(col("s"), col("t"))
        .agg(count(lit(1)).as("w"))
        .select(col("s").as("src"), col("t").as("dst"), col("w"))
      val nodes = docs.select(col("source").as("node")).distinct()
      GraphOps.pageRank(edges, nodes, iters = 3)
        .select(col("node").as("source"), col("rank"))
        .orderBy(col("rank").desc, col("source"))
    },

    // ---- kNN label propagation (pseudo-labeling) ---------------------------
    // The semi-supervised step every labeling pipeline needs: vectors
    // with held-out labels (vec_id % 5 = 0) take the MAJORITY label of
    // their 5 nearest labeled neighbours (cosine; ties -> smallest
    // label). Votes are integers, so the argmax is exact cross-engine;
    // the true label rides along so accuracy is diagnosable per row.
    // The argmax is a partial-agg-friendly struct-max, not a window.
    //
    // r15 reformulation: the original reused the p10 brute-force kernel,
    // but HERE the query side is a fifth OF THE CORPUS — the extended
    // quadratic-join lint (theta-only rule) flagged the O(n²/5) search.
    // Neighbours now come from the query's 4-bit SRP bucket with p12's
    // hard member cap (first 25 per bucket by vec_id, deterministic —
    // chosen to BIND at fixture scale so the BroadcastGuardSpec
    // doubled-corpus audit measures the plateau, not the ramp):
    // comparison volume ≤ 25·|queries| at any corpus, and the capped
    // candidate table (≤ 16·25 = 400 rows by construction) broadcasts;
    // beyond-cap members are observe-counted, never silently hidden. The
    // SRP plane values are emitted VERBATIM into the oracle so both
    // engines bucket bit-identically (the p261/p12 discipline).
    Q("p64_label_prop", Some {
      val planes = graft.ops.SimilarityOps.srpHyperplanes(4, 64)
      def bucketSql(vcol: String): String = planes.zipWithIndex.map {
        case (h, j) =>
          val arr = h.map(_.toString).mkString("[", ",", "]")
          s"CASE WHEN list_dot_product($vcol, $arr) >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""
      WITH v0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings WHERE vec_id % 5 <> 0),
      v1 AS (SELECT vec_id, label, v, ${bucketSql("v")} AS bk FROM v0),
      v AS (SELECT vec_id, label, v, bk
            FROM (SELECT *, row_number() OVER (PARTITION BY bk
                                               ORDER BY vec_id) AS mrk
                  FROM v1)
            WHERE mrk <= 25),
      q0 AS (SELECT vec_id AS query_id, label AS true_label,
                    CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id % 5 = 0),
      q AS (SELECT query_id, true_label, qv, ${bucketSql("qv")} AS qbk
            FROM q0),
      s AS (SELECT query_id, true_label, vec_id, label,
                   round(list_dot_product(qv, v)
                     / sqrt(list_dot_product(qv, qv))
                     / sqrt(list_dot_product(v, v)), 6) AS sim
            FROM v JOIN q ON v.bk = q.qbk),
      r AS (SELECT query_id, true_label, label,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rk
            FROM s),
      k AS (SELECT query_id, true_label, label, COUNT(*) AS votes
            FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
      p AS (SELECT query_id, true_label, label, votes,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY votes DESC, label) AS pr
            FROM k)
      SELECT query_id AS vec_id, label AS predicted, votes, true_label
      FROM p WHERE pr = 1
      ORDER BY vec_id"""
    }) { (spark, dir) =>
      import graft.ops.SimilarityOps
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val labeled = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val queries = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      val nn = SimilarityOps.srpCappedTopK(labeled, queries,
        "vec_id", "embedding", k = 5, planesK = 4, dim = 64, maxMembers = 25)
      nn.join(labeled.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
        .groupBy(col("query_id"))
        .agg(max(struct(col("votes"), (-col("label")).as("nl"))).as("s"))
        .join(queries.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), "query_id")
        .select(col("query_id").as("vec_id"),
          (-col("s.nl")).cast("int").as("predicted"),
          col("s.votes").as("votes"), col("true_label"))
        .orderBy(col("vec_id"))
    },

    // ---- SCD2 temporal dimension build (CDC compaction) --------------------
    // The change-data-capture pattern every metadata catalog needs:
    // each customer's order stream is run-length-compressed into
    // priority EPOCHS — valid_from = first date of a run of equal
    // priorities, valid_to = the next run's start (NULL while
    // current). Classic gaps-and-islands: a lag-change flag, a running
    // island id, one aggregate per island, one lead for the closing
    // date. Scale shape: everything windows/aggregates on ONE
    // partitioning (o_custkey) — a single shuffle end to end, range-
    // partitioned at cluster scale.
    Q("p65_scd2_history", Some("""
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
                   min(o_orderdate) AS valid_from,
                   COUNT(*) AS n_orders
            FROM i GROUP BY 1, 2)
      SELECT o_custkey, island, priority, valid_from,
             lead(valid_from) OVER (PARTITION BY o_custkey
                                    ORDER BY island) AS valid_to,
             n_orders
      FROM g
      ORDER BY o_custkey, island""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val chg = when(lag(col("o_orderpriority"), 1).over(w).isNull
        || lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"), 1)
        .otherwise(0)
      val wi = Window.partitionBy(col("o_custkey")).orderBy(col("island"))
      Tables.load(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate"), col("o_orderkey"))
        .withColumn("chg", chg)
        .withColumn("island", sum(col("chg")).over(w).cast("long"))
        .groupBy(col("o_custkey"), col("island"))
        .agg(min(col("o_orderpriority")).as("priority"),
          min(col("o_orderdate")).as("valid_from"),
          count(lit(1)).as("n_orders"))
        .select(col("o_custkey"), col("island"), col("priority"),
          col("valid_from"),
          lead(col("valid_from"), 1).over(wi).as("valid_to"),
          col("n_orders"))
        .orderBy(col("o_custkey"), col("island"))
    },

    // ---- ordered funnel progression ----------------------------------------
    // The event-sequence analysis every product/behavior dataset gets:
    // per user, the earliest view, the earliest click STRICTLY AFTER
    // that view, and the earliest purchase strictly after that click —
    // stage = how far the ordered funnel progressed (1..3). Three
    // aggregates and two joins, ALL keyed on user_id: one partitioning
    // end to end, no window over the raw stream, each stage's table
    // shrinks to one row per user before the next join.
    Q("p66_funnel", Some("""
      WITH e AS (SELECT user_id, event_type,
                        CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      v AS (SELECT user_id, min(sec) AS view_sec FROM e
            WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(sec) AS click_sec FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND sec > view_sec GROUP BY 1),
      p AS (SELECT e.user_id, min(sec) AS buy_sec FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND sec > click_sec GROUP BY 1)
      SELECT v.user_id,
             CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                       WHEN c.user_id IS NOT NULL THEN 2
                       ELSE 1 END AS INTEGER) AS stage,
             view_sec, click_sec, buy_sec
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      ORDER BY user_id""")) { (spark, dir) =>
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("sec")).as("view_sec"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("sec") > col("view_sec"))
        .groupBy(col("user_id")).agg(min(col("sec")).as("click_sec"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("sec") > col("click_sec"))
        .groupBy(col("user_id")).agg(min(col("sec")).as("buy_sec"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("buy_sec").isNotNull, 3)
            .when(col("click_sec").isNotNull, 2)
            .otherwise(1).cast("int").as("stage"),
          col("view_sec"), col("click_sec"), col("buy_sec"))
        .orderBy(col("user_id"))
    },

    // ---- asymmetric n-gram containment -------------------------------------
    // The quote/subset statistic symmetric Jaccard misses: a short
    // document fully quoted inside a long one has low Jaccard but
    // containment 1.0 — exactly the shape test-set decontamination
    // hunts. Same bounded inverted-index shuffles as p05 (shared
    // shingle CTE, maxDf skew cap); both directions emitted as exact
    // ppm integers so the oracle hash-matches.
    Q("p67_containment_pairs", Some(s"""
      WITH ${Pipeline.distinctShinglesCte},
      cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM ds GROUP BY doc_id),
      df AS (SELECT s, COUNT(*) AS df FROM ds GROUP BY s),
      capped AS (SELECT ds.doc_id, ds.s FROM ds JOIN df USING (s)
                 WHERE df.df <= 1000),
      pair AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
               FROM capped x JOIN capped y ON x.s = y.s AND x.doc_id < y.doc_id
               GROUP BY 1, 2)
      SELECT a, b, inter, ca.nsh AS na, cb.nsh AS nb,
             inter * 1000000 // ca.nsh AS cont_ab_ppm,
             inter * 1000000 // cb.nsh AS cont_ba_ppm
      FROM pair JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
      WHERE inter * 1000000 // ca.nsh >= 500000
         OR inter * 1000000 // cb.nsh >= 500000
      ORDER BY a, b""")) { (spark, dir) =>
      import graft.ops.DedupOps
      DedupOps.containmentPairs(Tables.loadSpread(spark, dir, "documents"),
          "doc_id", "text", minPpm = 500000, maxDf = 1000)
        .orderBy(col("a"), col("b"))
    },

    // ---- quality-policy survivor selection ---------------------------------
    // The survivor-policy knob on near-dup clustering: p42 keeps the
    // min-id member; real curation keeps the BEST one. Same shared
    // fixpoint (spairs -> recursive-CTE labels), then an argmax on the
    // p01 quality score — a partial-agg-friendly struct-max keyed by
    // (quality, -doc_id), NOT a window over the corpus; ties break to
    // the smaller id. Cost beyond p29: one label join + one agg.
    Q("p68_quality_survivor", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      ${Pipeline.clusterLabelsCte},
      qd AS (SELECT doc_id, ${TextSql.quality(wsSql)} AS q FROM documents),
      cl AS (SELECT qd.doc_id, coalesce(l.cluster_id, qd.doc_id) AS cluster_id,
                    qd.q
             FROM qd LEFT JOIN lbl l ON l.n = qd.doc_id),
      r AS (SELECT cluster_id, doc_id, q,
                   row_number() OVER (PARTITION BY cluster_id
                                      ORDER BY q DESC, doc_id) AS rk
            FROM cl),
      n AS (SELECT cluster_id, COUNT(*) AS n_members FROM cl GROUP BY 1)
      SELECT r.cluster_id, doc_id AS survivor_id, q AS survivor_quality,
             n.n_members
      FROM r JOIN n USING (cluster_id) WHERE rk = 1
      ORDER BY cluster_id""")) { (spark, dir) =>
      // r20: shared materialized pairs+labels (see p29) — the
      // standalone fixpoint rebuild cost ~5.6 s per bench pass; the
      // per-row qualityScore keeps the scan spread
      val docs = Tables.loadSpread(spark, dir, "documents")
      val cc = SharedStages.labels(spark, dir)
        .select(col("doc_id"), col("cluster_id").as("lbl"))
      docs.select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"))
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster_id"), col("q"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("q"), (-col("doc_id")).as("nid"))).as("s"))
        .select(col("cluster_id"), (-col("s.nid")).as("survivor_id"),
          col("s.q").as("survivor_quality"), col("n_members"))
        .orderBy(col("cluster_id"))
    },

    // ---- BM25 lexical retrieval --------------------------------------------
    // The retrieval side of corpus curation: score every document
    // against a fixed term query with BM25 (k1=1.2, b=0.75) and return
    // the top 20. Per-term contributions are PIVOTED into columns and
    // added in one fixed left-to-right expression — never a SUM over
    // doubles, whose accumulation order neither engine guarantees. The
    // only corpus shuffle is the (doc, term) tf aggregate (the term
    // filter prunes in the scan); df/N/avgdl are broadcast scalars.
    // ln/divide chains follow the proven q15 round-6 pattern.
    Q("p69_bm25", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM d),
      tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
      tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
             WHERE t IN ('hash', 'join', 'stream') GROUP BY 1, 2),
      df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      c AS (SELECT tf.doc_id, tf.t,
                   ln(1.0 + (CAST(n.n - df.df AS DOUBLE) + 0.5)
                            / (CAST(df.df AS DOUBLE) + 0.5))
                   * (CAST(tf.tf AS DOUBLE) * 2.2)
                   / (CAST(tf.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE) / n.avgdl)))
                     AS contrib
            FROM tf JOIN df USING (t) JOIN d USING (doc_id) CROSS JOIN n),
      p AS (SELECT doc_id,
                   coalesce(max(CASE WHEN t = 'hash' THEN contrib END), 0.0) AS c1,
                   coalesce(max(CASE WHEN t = 'join' THEN contrib END), 0.0) AS c2,
                   coalesce(max(CASE WHEN t = 'stream' THEN contrib END), 0.0) AS c3
            FROM c GROUP BY 1)
      SELECT doc_id, round(c1 + c2 + c3, 6) AS score
      FROM p ORDER BY score DESC, doc_id LIMIT 20""")) { (spark, dir) =>
      val terms = Seq("hash", "join", "stream")
      val w = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      val d = w.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      val n = d.agg(count(lit(1)).as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = w.select(col("doc_id"), explode(col("ws")).as("t"))
        .filter(col("t").isInCollection(terms))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val contrib = tf.join(broadcast(df), "t").join(d, "doc_id")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("t"),
          expr("ln(1.0D + (cast(n - df as double) + 0.5D) " +
            "/ (cast(df as double) + 0.5D)) " +
            "* (cast(tf as double) * 2.2D) " +
            "/ (cast(tf as double) " +
            "+ 1.2D * (0.25D + 0.75D * (cast(dl as double) / avgdl)))")
            .as("contrib"))
      contrib.groupBy(col("doc_id"))
        .agg(coalesce(max(when(col("t") === "hash", col("contrib"))), lit(0.0)).as("c1"),
          coalesce(max(when(col("t") === "join", col("contrib"))), lit(0.0)).as("c2"),
          coalesce(max(when(col("t") === "stream", col("contrib"))), lit(0.0)).as("c3"))
        .select(col("doc_id"),
          round(col("c1") + col("c2") + col("c3"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // ---- weighted priority sampling ----------------------------------------
    // The data-recipe upsampling knob, deterministic: priority =
    // portable_hash div weight (a weight-w document is w times as
    // likely to land a small key — the integer analog of A-ES
    // exponential sampling), sample = the 100 SMALLEST priorities,
    // taken by the bounded [[graft.functions.TopN]] kernel as ONE
    // global aggregate: map-side partials carry at most 100 pairs per
    // partition, so the sample of a 100 TB corpus moves O(partitions
    // x k) rows — never a global sort, no rand(), rerun-identical.
    // The kernel's (h, id) pair order IS the oracle's (pri, doc_id)
    // ranked window.
    Q("p70_weighted_sample", Some {
      val hSql = Portable.h60Sql("concat('wsamp:', CAST(doc_id AS VARCHAR))")
      s"""
      WITH t AS (SELECT doc_id, lang,
                        CASE WHEN lang = 'en' THEN 4 ELSE 1 END AS w,
                        $hSql // (CASE WHEN lang = 'en' THEN 4 ELSE 1 END) AS pri
                 FROM documents)
      SELECT CAST(row_number() OVER (ORDER BY pri, doc_id) AS BIGINT) AS rk,
             doc_id, lang, CAST(w AS BIGINT) AS w, pri
      FROM t ORDER BY pri, doc_id LIMIT 100"""
    }) { (spark, dir) =>
      import graft.functions.TopN
      val docs = Tables.loadSpread(spark, dir, "documents")
      val w = when(col("lang") === "en", 4L).otherwise(1L)
      val sample = docs
        .select(col("doc_id"),
          Portable.h60(concat(lit("wsamp:"), col("doc_id").cast("string"))).as("h"),
          w.as("w"))
        .select(col("doc_id"), expr("h div w").as("pri"))
        .agg(TopN.minTopN(col("pri"), col("doc_id"), 100).as("top"))
        .select(posexplode(col("top")).as(Seq("rk0", "p")))
        .select((col("rk0") + 1).cast("long").as("rk"),
          col("p.id").as("doc_id"), col("p.h").as("pri"))
      sample.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("rk"), col("doc_id"), col("lang"),
          when(col("lang") === "en", 4L).otherwise(1L).as("w"), col("pri"))
        .orderBy(col("rk"))
    },

    // ---- corpus snapshot diff (CDC between ingests) ------------------------
    // What changed between two corpus versions — the audit every
    // re-crawl needs before reprocessing: v2 is simulated from v1
    // (drop doc_id%97=0, mutate text for %10=0, add new ids for
    // %50=0), then ONE full-outer join on doc_id classifies every row
    // into added/removed/changed/unchanged by content hash. The report
    // aggregates per status. At 100 TB: one hash-partitioned shuffle;
    // downstream reprocessing reads only added+changed — the whole
    // point of diffing before recomputing.
    Q("p72_corpus_diff", Some("""
      WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents),
      v2 AS (SELECT doc_id,
                    md5(CASE WHEN doc_id % 10 = 0 THEN concat(text, ' v2')
                             ELSE text END) AS h
             FROM documents WHERE doc_id % 97 <> 0
             UNION ALL
             SELECT doc_id + 100000,
                    md5(concat('new doc ', CAST(doc_id AS VARCHAR)))
             FROM documents WHERE doc_id % 50 = 0),
      d AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
                   CASE WHEN v1.doc_id IS NULL THEN 'added'
                        WHEN v2.doc_id IS NULL THEN 'removed'
                        WHEN v1.h <> v2.h THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
      SELECT status, COUNT(*) AS n,
             min(doc_id) AS first_id, max(doc_id) AS last_id
      FROM d GROUP BY status
      ORDER BY status""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val v1 = docs.select(col("doc_id"), md5(col("text")).as("h"))
      val v2 = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h"))
        .union(docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            md5(concat(lit("new doc "), col("doc_id").cast("string"))).as("h")))
      // join on the alias-qualified columns: the dataframe-apply form
      // (v1("doc_id") === v2("doc_id")) on two frames derived from the
      // same source only resolves via Spark's ambiguous-self-join
      // auto-repair, which is fragile under failAmbiguousSelfJoin
      v1.as("a").join(v2.as("b"), col("a.doc_id") === col("b.doc_id"),
          "full_outer")
        .select(coalesce(col("a.doc_id"), col("b.doc_id")).as("doc_id"),
          when(col("a.doc_id").isNull, "added")
            .when(col("b.doc_id").isNull, "removed")
            .when(col("a.h") =!= col("b.h"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_id"),
          max(col("doc_id")).as("last_id"))
        .orderBy(col("status"))
    },

    // ---- incremental aggregate maintenance ---------------------------------
    // The aggregate-state-table pattern: each ingest reduces to a
    // per-key partial state (count, decimal sum, min/max), states from
    // separate ingests MERGE by re-aggregation, and finals derive from
    // the merged state — never from re-reading old ingests. The oracle
    // computes the same aggregates DIRECTLY over the full table, so
    // the hash match IS the associativity proof: two-phase
    // state-merge == one-shot aggregation, exactly. (Decimal sums make
    // the merge order-independent — the dsum convention.)
    Q("p73_incremental_agg", Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
             CAST(min(floor(epoch(ts))) AS BIGINT) AS first_sec,
             CAST(max(floor(epoch(ts))) AS BIGINT) AS last_sec
      FROM events GROUP BY event_type
      ORDER BY event_type""")) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          dec(col("value")).as("v"),
          floor(unix_timestamp(col("ts"))).cast("long").as("sec"))
      // two ingests, each reduced to its own partial-state table
      def state(f: org.apache.spark.sql.DataFrame) = f
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("sec")).as("mn"), max(col("sec")).as("mx"))
      val s1 = state(ev.filter(col("event_id") % 2 === 0))
      val s2 = state(ev.filter(col("event_id") % 2 =!= 0))
      // merge = re-aggregation of the union of states
      s1.union(s2)
        .groupBy(col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("s")).cast("double").as("sum_value"),
          min(col("mn")).as("first_sec"), max(col("mx")).as("last_sec"))
        .orderBy(col("event_type"))
    },

    // ---- curation DAG with materialized shared stages ----------------------
    // The production shape of the p29/p42/p63/p68 family: those entries
    // each rebuild the SAME simhash-pairs + connected-components
    // fixpoint because the bench harness runs them standalone — a real
    // curation pipeline computes the pair graph and the cluster labels
    // ONCE, materializes both, and derives every consumer from the
    // shared tables. This entry IS that DAG: spairs and labels are
    // written to parquet (the CC fixpoint even reads the materialized
    // pairs, so pair generation runs exactly once), then the dedup
    // rewrite (p42's shape), the quality-survivor selection (p68's) and
    // the PageRank source ranking (p63's) all derive from the two
    // parquet tables, unioned into one audit report keyed by
    // (section, k). One fixpoint + one pair scan instead of three of
    // each — the oracle is the same shared-CTE SQL the standalone
    // entries use, so the DAG refactor provably changes no results.
    Q("p75_curation_dag", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      ${Pipeline.clusterLabelsCte},
      qd AS (SELECT doc_id, source, CAST(len($wsSql) AS BIGINT) AS n_tokens,
                    ${TextSql.quality(wsSql)} AS q
             FROM documents),
      cl AS (SELECT qd.doc_id, coalesce(l.cluster_id, qd.doc_id) AS cluster_id,
                    qd.n_tokens, qd.q
             FROM qd LEFT JOIN lbl l ON l.n = qd.doc_id),
      rewrite AS (SELECT cluster_id AS survivor_id, COUNT(*) AS n_merged,
                         CAST(SUM(CASE WHEN doc_id <> cluster_id
                                       THEN n_tokens ELSE 0 END) AS BIGINT)
                           AS tokens_dropped
                  FROM cl GROUP BY cluster_id),
      sr AS (SELECT cluster_id, doc_id, q,
                    row_number() OVER (PARTITION BY cluster_id
                                       ORDER BY q DESC, doc_id) AS rk,
                    COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
             FROM cl),
      eraw AS (SELECT sa.source AS s, sb.source AS t FROM spairs
               JOIN qd sa ON spairs.a = sa.doc_id
               JOIN qd sb ON spairs.b = sb.doc_id
               WHERE sa.source <> sb.source),
      psym AS (SELECT s, t FROM eraw UNION ALL SELECT t AS s, s AS t FROM eraw),
      e AS (SELECT s, t, CAST(COUNT(*) AS BIGINT) AS w FROM psym GROUP BY 1, 2),
      ow AS (SELECT s, CAST(SUM(w) AS BIGINT) AS ow FROM e GROUP BY 1),
      nodes AS (SELECT DISTINCT source AS node FROM documents),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
      f1 AS (SELECT e.t AS node, CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inflow
             FROM e JOIN r0 r ON e.s = r.node JOIN ow o ON e.s = o.s GROUP BY 1),
      r1 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(f1.inflow, 0)) // 100
                                 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN f1 ON n.node = f1.node),
      f2 AS (SELECT e.t AS node, CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inflow
             FROM e JOIN r1 r ON e.s = r.node JOIN ow o ON e.s = o.s GROUP BY 1),
      r2 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(f2.inflow, 0)) // 100
                                 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN f2 ON n.node = f2.node),
      f3 AS (SELECT e.t AS node, CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inflow
             FROM e JOIN r2 r ON e.s = r.node JOIN ow o ON e.s = o.s GROUP BY 1),
      r3 AS (SELECT n.node, CAST(150000 + (85 * COALESCE(f3.inflow, 0)) // 100
                                 AS BIGINT) AS rank
             FROM nodes n LEFT JOIN f3 ON n.node = f3.node)
      SELECT 'rewrite' AS section, CAST(survivor_id AS VARCHAR) AS k,
             n_merged AS v1, tokens_dropped AS v2, CAST(NULL AS DOUBLE) AS v3
      FROM rewrite
      UNION ALL
      SELECT 'survivor', CAST(cluster_id AS VARCHAR), doc_id, n_members, q
      FROM sr WHERE rk = 1
      UNION ALL
      SELECT 'rank', node, rank, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
      FROM r3
      ORDER BY section, k""")) { (spark, dir) =>
      import graft.ops.GraphOps
      val docs = Tables.loadSpread(spark, dir, "documents")
      // ---- shared stages, materialized once per process --------------------
      // (SharedStages memoizes per fixture dir: the first DAG consumer
      // in the process pays for pair generation + the CC fixpoint,
      // every later consumer — p101's split, a bench re-pass — reads
      // the materialized parquet)
      val spairs = SharedStages.spairs(spark, dir)
      val labels = SharedStages.labels(spark, dir)
        .select(col("doc_id"), col("cluster_id").as("lbl"))
      // ---- consumers, all derived from the two parquet tables --------------
      val qd = docs.select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.qualityScore(col("text")).as("q"))
      val cl = qd.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster_id"),
          col("n_tokens"), col("q"))
      val rewrite = cl.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_merged"),
          sum(when(col("doc_id") =!= col("cluster_id"), col("n_tokens"))
            .otherwise(0L)).cast("long").as("tokens_dropped"))
        .select(lit("rewrite").as("section"),
          col("cluster_id").cast("string").as("k"),
          col("n_merged").as("v1"), col("tokens_dropped").as("v2"),
          lit(null).cast("double").as("v3"))
      val survivor = cl.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("q"), (-col("doc_id")).as("nid"))).as("s"))
        .select(lit("survivor").as("section"),
          col("cluster_id").cast("string").as("k"),
          (-col("s.nid")).as("v1"), col("n_members").as("v2"),
          col("s.q").as("v3"))
      val src = qd.select(col("doc_id"), col("source"))
      val eraw = spairs
        .join(src.select(col("doc_id").as("a"), col("source").as("s")), "a")
        .join(src.select(col("doc_id").as("b"), col("source").as("t")), "b")
        .filter(col("s") =!= col("t"))
        .select(col("s"), col("t"))
      val esym = eraw.union(eraw.select(col("t"), col("s")))
      val edges = esym.groupBy(col("s"), col("t"))
        .agg(count(lit(1)).as("w"))
        .select(col("s").as("src"), col("t").as("dst"), col("w"))
      val nodes = docs.select(col("source").as("node")).distinct()
      val rank = GraphOps.pageRank(edges, nodes, iters = 3)
        .select(lit("rank").as("section"), col("node").as("k"),
          col("rank").as("v1"), lit(null).cast("long").as("v2"),
          lit(null).cast("double").as("v3"))
      rewrite.union(survivor).union(rank)
        .orderBy(col("section"), col("k"))
    },

    // ---- multi-table SRP-LSH near-dup candidates ---------------------------
    // The production recall knob the single-table p26 documents but
    // can't turn: L independent k-bit SRP tables, a pair is a candidate
    // if it collides in ANY table, deduped before the vectors are
    // fetched. Recall compounds as 1-(1-p^k)^L at k-bit per-table
    // candidate volume — the measured lift over L=1 is pinned in
    // PipelineOpsSpec on the planted-cluster fixture; here the full
    // 4-table candidate set (every table's planes mirrored as literal
    // arrays) is oracle-checked pair for pair. Scale shape: explode
    // carries only (id, table, bucket); one (t, bk) equi-join; DISTINCT
    // pair dedup; vectors join back onto the shrunk candidate list.
    Q("p76_srp_multitable", Some {
      val (tables, k, dim) = (4, 8, 64)
      val tableSql = (0 until tables).map { t =>
        val planes = graft.ops.SimilarityOps.srpTablePlanes(t, k, dim)
        val bucketSql = planes.zipWithIndex.map { case (h, j) =>
          val arr = h.map(x => if (x > 0) "1.0" else "-1.0")
            .mkString("[", ",", "]")
          s"CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << j} ELSE 0 END"
        }.mkString(" + ")
        s"SELECT vec_id, $t AS t, $bucketSql AS bk FROM v"
      }.mkString(" UNION ALL ")
      s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      b AS ($tableSql),
      cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
               FROM b x JOIN b y
                 ON x.t = y.t AND x.bk = y.bk AND x.vec_id < y.vec_id),
      s AS (SELECT a, b,
                   round(list_dot_product(va.v, vb.v)
                     / sqrt(list_dot_product(va.v, va.v))
                     / sqrt(list_dot_product(vb.v, vb.v)), 6) AS sim
            FROM cand JOIN v va ON cand.a = va.vec_id
                      JOIN v vb ON cand.b = vb.vec_id)
      SELECT a, b, sim FROM s WHERE sim >= 0.25
      ORDER BY a, b"""
    }) { (spark, dir) =>
      import graft.ops.SimilarityOps
      SimilarityOps.srpMultiTablePairs(
          Tables.loadSpread(spark, dir, "embeddings"),
          "vec_id", "embedding", k = 8, minSim = 0.25, dim = 64, tables = 4)
        .orderBy(col("a"), col("b"))
    },

    // ---- sketch-state incremental maintenance ------------------------------
    // p73 for APPROXIMATE state: real 100 TB rollups maintain sketch
    // states per ingest, not just exact count/sum/min/max. Each ingest
    // reduces to its DqSketch bucket table (event_type, lb, cnt) — the
    // sketch's EXPLICIT state, materialized as rows with the same exact
    // decimal binning ([[graft.functions.DqSketch.bucketLb]], mirrored
    // here as integer string arithmetic) — states from separate ingests
    // merge by bucket-count addition, and the merged state finalizes
    // through the integer rank arithmetic. The SAME output row also
    // carries the one-shot [[graft.functions.DqSketchQuantiles]]
    // estimates (the TypedImperativeAggregate path over the full
    // table): the oracle computes one set of values, so the hash match
    // proves merged-two-ingest state == one-shot sketch BIT-FOR-BIT —
    // the mergeability contract, verified cross-engine. Scale shape:
    // per ingest one bounded (type, bucket) agg (<= ~90 buckets/decade
    // per type); the merge moves state rows, never data.
    Q("p77_sketch_merge", Some("""
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
                              THEN lb + g // 2 END) AS p50,
                     MIN(CASE WHEN cum >= (900000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p90,
                     MIN(CASE WHEN cum >= (990000 * n + 999999) // 1000000
                              THEN lb + g // 2 END) AS p99
              FROM r GROUP BY 1)
      SELECT est.event_type, n.n,
             est.p50 AS p50_merged, est.p90 AS p90_merged,
             est.p99 AS p99_merged,
             est.p50 AS p50_sketch, est.p90 AS p90_sketch,
             est.p99 AS p99_sketch
      FROM est JOIN n USING (event_type)
      ORDER BY event_type""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.DqSketch
      val tp = Tables.load(spark, dir, "events")
        .select(col("event_type"), col("event_id"),
          expr("CAST(round(value * 1000, 0) AS BIGINT)").as("v"))
        .filter(col("v") > 0)
      // the sketch's binning as a column expression (exact integer
      // string arithmetic — the p62 convention, no float log)
      val lb = col("v") - col("v") %
        expr("CAST('1' || repeat('0', greatest(length(CAST(v AS STRING)) - 2, 0)) AS BIGINT)")
      val binned = tp.withColumn("lb", lb)
      // two ingests, each reduced to its own sketch-state table
      def state(f: org.apache.spark.sql.DataFrame) = f
        .groupBy(col("event_type"), col("lb")).agg(count(lit(1)).as("cnt"))
      val s1 = state(binned.filter(col("event_id") % 2 === 0))
      val s2 = state(binned.filter(col("event_id") % 2 =!= 0))
      // state merge = bucket-count addition
      val merged = s1.union(s2)
        .groupBy(col("event_type"), col("lb")).agg(sum(col("cnt")).as("cnt"))
      // finalize the merged state: integer rank over cumulative counts
      val g = expr("CAST('1' || repeat('0', greatest(length(CAST(lb AS STRING)) - 2, 0)) AS BIGINT)")
      val w = Window.partitionBy(col("event_type")).orderBy(col("lb"))
      val cum = merged.withColumn("g", g)
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
      def estOf(ppm: Int) = min(
        when(col("cum") >= expr(s"(${ppm}L * n + 999999L) div 1000000L"),
          col("lb") + expr("g div 2")))
      val fromState = cum.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          estOf(500000).as("p50_merged"), estOf(900000).as("p90_merged"),
          estOf(990000).as("p99_merged"))
      // the one-shot sketch over the full table (TypedImperativeAggregate
      // partial-merge machinery) — must agree with the merged state
      val oneShot = tp.groupBy(col("event_type"))
        .agg(DqSketch.quantilesCol(col("v"), Seq(500000, 900000, 990000)).as("e"))
        .select(col("event_type"), col("e")(0).as("p50_sketch"),
          col("e")(1).as("p90_sketch"), col("e")(2).as("p99_sketch"))
      fromState.join(oneShot, "event_type").orderBy(col("event_type"))
    }
  )
}
