package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, Portable, SimilarityOps, TextOps}

/** Training-data pipeline operators as oracle-checked queries over the
  * `documents` / `embeddings` / `events` fixtures: text analysis
  * (token counting, quality scoring, language ID, fingerprinting),
  * deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash),
  * similarity search (brute-force and IVF-partitioned cosine top-k,
  * embedding near-dup), and event-stream shaping (tumbling windows,
  * sessionization).
  *
  * Every oracle is the *same formula* in DuckDB SQL over the portable
  * md5-derived hash (graft.ops.Portable), so the check is exact.
  */
object Pipeline {

  /** DuckDB: lowercased whitespace tokens of `documents.text` (shared
    * [[TextSql]] mirror — one definition repo-wide, so oracles can't drift).
    */
  private val wsSql = TextSql.ws

  /** DuckDB: 3-gram shingles over tokens `ws`. */
  private val shinglesSql = TextSql.shingles("ws", 3)

  /** DuckDB CTE producing (doc_id, s): distinct 3-gram shingles. */
  private[queries] val distinctShinglesCte =
    s"""w AS (SELECT doc_id, $wsSql AS ws FROM documents),
       sh AS (SELECT doc_id, unnest($shinglesSql) AS s FROM w),
       ds AS (SELECT DISTINCT doc_id, s FROM sh)"""

  private val k = 12 // minhash components
  private val rowsPerBand = 3 // → 4 bands

  /** DuckDB CTE chain computing the 64-bit SimHash signature + the four
    * 16-bit band keys per document — the exact mirror of
    * [[graft.ops.DedupOps.simhash64]]. DuckDB raises on `1::BIGINT << 63`,
    * so bit weights are emitted as literal constants (bit 63's weight is
    * Long.MinValue); the SUM runs in HUGEINT and is cast back to BIGINT.
    */
  private[queries] val simhash64Cte: String = {
    val bitw = (0 until 64)
      .map(b => s"($b, CAST(${1L << b} AS BIGINT), CAST(${1L << (b % 16)} AS BIGINT))")
      .mkString(", ")
    val qkCols = (0 until 4).map(q =>
      s"CAST(SUM(CASE WHEN s > 0 AND bit // 16 = $q THEN rw ELSE 0 END) AS BIGINT) AS qk$q")
      .mkString(",\n                  ")
    s"""w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      dw AS (SELECT doc_id, unnest(list_distinct(ws)) AS word FROM w),
      hs AS (SELECT doc_id, ${Portable.h32Sql("word")} AS h1,
                    ${Portable.h32sSql(1, "word")} AS h2 FROM dw),
      bitw(bit, bw, rw) AS (VALUES $bitw),
      bs AS (SELECT doc_id, bit,
                    SUM(CASE WHEN ((CASE WHEN bit < 32 THEN h1 ELSE h2 END)
                                   >> (bit % 32)) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM hs CROSS JOIN bitw GROUP BY doc_id, bit),
      sig AS (SELECT doc_id,
                  CAST(SUM(CASE WHEN s > 0 THEN bw ELSE 0 END) AS BIGINT) AS simhash,
                  $qkCols
              FROM bs JOIN bitw USING (bit) GROUP BY doc_id)"""
  }

  /** DuckDB recursive-CTE fixpoint over `spairs` producing
    * `lbl(n, cluster_id)` — the oracle mirror of
    * [[graft.ops.DedupOps.connectedComponents]]. ONE definition shared
    * by p29 (clusters) and p42 (rewrite), so a tie-break or cap change
    * cannot silently diverge the two.
    */
  private[queries] val clusterLabelsCte: String =
    """esym AS (SELECT a AS u, b AS v FROM spairs
               UNION SELECT b, a FROM spairs),
      walk(u, v) AS (SELECT u, v FROM esym
                     UNION
                     SELECT wk.u, e.v FROM walk wk JOIN esym e ON wk.v = e.u),
      lbl AS (SELECT u AS n, least(u, min(v)) AS cluster_id
              FROM walk GROUP BY u)"""

  /** DuckDB CTE chain (appended after [[simhash64Cte]]) producing
    * `spairs(a, b, hamming)` — the exact mirror of
    * [[graft.ops.DedupOps.simhashPairs]] (banded buckets, size cap,
    * any-surviving-bucket dedup). Shared by p09 and the p29/p42
    * clustering oracles so they can never drift.
    */
  private[queries] val simhashPairsCte: String = {
    val blockSelects = (0 until 4).map(q =>
      s"SELECT doc_id, $q AS q, qk$q AS qk FROM sig").mkString(" UNION ALL ")
    s"""blocks AS ($blockSelects),
      capped AS (SELECT * FROM blocks
                 QUALIFY COUNT(*) OVER (PARTITION BY q, qk) BETWEEN 2 AND 1000),
      spairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
                        bit_count(xor(sa.simhash, sb.simhash)) AS hamming
                 FROM capped x
                 JOIN capped y ON x.q = y.q AND x.qk = y.qk AND x.doc_id < y.doc_id
                 JOIN sig sa ON sa.doc_id = x.doc_id
                 JOIN sig sb ON sb.doc_id = y.doc_id
                 WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3)"""
  }

  val all: Seq[Q] = Seq(

    // ---- text statistics + quality score ---------------------------------
    Q("p01_text_stats", Some(s"""
      SELECT doc_id,
             CAST(len($wsSql) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpeish,
             round(CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
             round(CAST(${TextSql.stopHits(wsSql)} AS DOUBLE) / len($wsSql), 6) AS stop_ratio,
             ${TextSql.quality(wsSql)} AS quality
      FROM documents
      ORDER BY doc_id""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(
          col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.bpeishCount(col("text")).as("n_bpeish"),
          round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TextOps.stopwordRatio(col("text")), 6).as("stop_ratio"),
          TextOps.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    },

    // ---- language identification -----------------------------------------
    Q("p02_lang_id", Some {
      val names = TextOps.langProfiles.map(_._1)
      val scoreSql = names.map(l =>
        s"CAST(${TextSql.langScore(wsSql, l)} AS BIGINT) AS s_$l")
        .mkString(",\n             ")
      s"""
      SELECT doc_id, ${names.map(l => s"s_$l").mkString(", ")},
             ${TextSql.langCase(l => s"s_$l")} AS detected
      FROM (SELECT doc_id, $scoreSql FROM documents) t
      ORDER BY doc_id"""
    }) { (spark, dir) =>
      val toks = TextOps.tokens(col("text"))
      val scoreCols = TextOps.langProfiles.map { case (lang, words) =>
        size(filter(toks, t => t.isInCollection(words))).cast("long").as(s"s_$lang")
      }
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id") +: scoreCols :+
          TextOps.langId(col("text")).as("detected"): _*)
        .orderBy(col("doc_id"))
    },

    // ---- document fingerprint (content hash + min/max shingle hash) ------
    Q("p03_fingerprint", Some(s"""
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content,
             list_min(list_transform($shinglesSql, s -> ${Portable.h60Sql("s")})) AS min_h,
             list_max(list_transform($shinglesSql, s -> ${Portable.h60Sql("s")})) AS max_h
      FROM (SELECT doc_id, text, $wsSql AS ws FROM documents) t
      ORDER BY doc_id""")) { (spark, dir) =>
      val fp = TextOps.fingerprint(col("text"))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), fp.getField("content").as("content"),
          fp.getField("min_h").as("min_h"), fp.getField("max_h").as("max_h"))
        .orderBy(col("doc_id"))
    },

    // ---- exact dedup groups ----------------------------------------------
    Q("p04_exact_dedup", Some("""
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
             min(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY content_hash""")) { (spark, dir) =>
      DedupOps.exactGroups(Tables.loadSpread(spark, dir, "documents"), "doc_id", "text")
        .select(col("content_hash"), col("keep_id"), col("n_copies"))
        .orderBy(col("content_hash"))
    },

    // ---- n-gram Jaccard near-dup pairs (inverted-index join) -------------
    Q("p05_jaccard_pairs", Some(s"""
      WITH $distinctShinglesCte,
      cnt AS (SELECT doc_id, COUNT(*) AS nsh FROM ds GROUP BY doc_id),
      df AS (SELECT s, COUNT(*) AS df FROM ds GROUP BY s),
      capped AS (SELECT ds.doc_id, ds.s FROM ds JOIN df USING (s) WHERE df.df <= 1000),
      pair AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
               FROM capped x JOIN capped y ON x.s = y.s AND x.doc_id < y.doc_id
               GROUP BY 1, 2)
      SELECT a, b, inter,
             CAST(inter AS DOUBLE) / (ca.nsh + cb.nsh - inter) AS jac
      FROM pair JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
      WHERE CAST(inter AS DOUBLE) / (ca.nsh + cb.nsh - inter) >= 0.8
      ORDER BY a, b""")) { (spark, dir) =>
      DedupOps.jaccardPairs(Tables.loadSpread(spark, dir, "documents"),
          "doc_id", "text", minJaccard = 0.8, maxDf = 1000)
        .orderBy(col("a"), col("b"))
    },

    // ---- MinHash signatures ----------------------------------------------
    // (affine family over ONE md5 per shingle — see Portable.minhashJ)
    Q("p06_minhash_signatures", Some {
      val mins = (0 until k).map(j =>
        s"min(${Portable.minhashJSql(j, "h")}) AS m$j").mkString(",\n             ")
      s"""
      WITH $distinctShinglesCte,
      hs AS (SELECT doc_id, ${Portable.h32Sql("s")} AS h FROM ds)
      SELECT doc_id, $mins
      FROM hs GROUP BY doc_id ORDER BY doc_id"""
    }) { (spark, dir) =>
      DedupOps.minhashSignatures(Tables.loadSpread(spark, dir, "documents"),
          "doc_id", "text", k)
        .orderBy(col("doc_id"))
    },

    // ---- MinHash + LSH candidate pairs -----------------------------------
    Q("p07_lsh_candidates", Some {
      val mins = (0 until k).map(j =>
        s"min(${Portable.minhashJSql(j, Portable.h32Sql("s"))}) AS m$j").mkString(", ")
      val bandSelects = (0 until k / rowsPerBand).map { b =>
        val cols = (0 until rowsPerBand)
          .map(r => s"CAST(m${b * rowsPerBand + r} AS VARCHAR)").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cols)) AS bh FROM sig"
      }.mkString(" UNION ALL ")
      val eq = (0 until k)
        .map(j => s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""
      WITH $distinctShinglesCte,
      sig AS (SELECT doc_id, $mins FROM ds GROUP BY doc_id),
      band AS ($bandSelects),
      pair AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_bands
               FROM band x JOIN band y
                 ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
               GROUP BY 1, 2)
      SELECT a, b, n_bands, CAST($eq AS DOUBLE) / $k AS est_jaccard
      FROM pair JOIN sig sa ON sa.doc_id = a JOIN sig sb ON sb.doc_id = b
      ORDER BY a, b"""
    }) { (spark, dir) =>
      DedupOps.lshCandidates(Tables.loadSpread(spark, dir, "documents"),
          "doc_id", "text", k, rowsPerBand)
        .orderBy(col("a"), col("b"))
    },

    // ---- SimHash signatures (64-bit, Manku et al. width) ------------------
    Q("p08_simhash", Some(s"""
      WITH $simhash64Cte
      SELECT doc_id, simhash FROM sig ORDER BY doc_id""")) { (spark, dir) =>
      DedupOps.simhash64(Tables.loadSpread(spark, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))
    },

    // ---- SimHash near-dup pairs (pigeonhole band buckets, capped) ---------
    // a pair survives if ANY surviving (non-capped) bucket contains it —
    // DISTINCT over the capped candidates mirrors the Spark-side
    // pair-key aggregation exactly
    Q("p09_simhash_pairs", Some(s"""
      WITH $simhash64Cte,
      $simhashPairsCte
      SELECT a, b, hamming FROM spairs
      ORDER BY a, b""")) { (spark, dir) =>
      DedupOps.simhashPairs(Tables.loadSpread(spark, dir, "documents"),
          "doc_id", "text", maxHamming = 3, maxBucket = 1000)
        .orderBy(col("a"), col("b"))
    },

    // ---- SimHash near-dup clustering + survivor selection -----------------
    // pairs → connected components (distributed min-label propagation
    // with pointer jumping, graft.ops.DedupOps.connectedComponents) →
    // cluster id = min doc_id of the component; survivor = the min
    // itself. Docs with no near-dup are their own singleton cluster.
    // The oracle computes the same fixpoint with a recursive CTE over
    // the SHARED spairs definition (simhashPairsCte), so p09 and p29
    // can never drift.
    Q("p29_neardup_clusters", Some(s"""
      WITH RECURSIVE $simhash64Cte,
      $simhashPairsCte,
      $clusterLabelsCte
      SELECT d.doc_id,
             coalesce(l.cluster_id, d.doc_id) AS cluster_id,
             CASE WHEN coalesce(l.cluster_id, d.doc_id) = d.doc_id
                  THEN 1 ELSE 0 END AS is_survivor
      FROM documents d LEFT JOIN lbl l ON l.n = d.doc_id
      ORDER BY d.doc_id""")) { (spark, dir) =>
      // r20: pairs + CC labels come from the SharedStages materialized
      // tables (identical by construction — the ≤3 filter of the ≤8
      // capture IS a ≤3 generation, and labels are the CC over exactly
      // those pairs). The standalone fixpoint rebuild cost ~5.5 s per
      // bench pass for a result the process had already computed; the
      // oracle anchor is unchanged (same SQL text, hash must match).
      // Plain load (no spread): the assembly join has no per-row work.
      val docs = Tables.load(spark, dir, "documents")
      val cc = SharedStages.labels(spark, dir)
        .select(col("doc_id"), col("cluster_id").as("lbl"))
      docs.select(col("doc_id"))
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster_id"),
          when(coalesce(col("lbl"), col("doc_id")) === col("doc_id"), 1)
            .otherwise(0).as("is_survivor"))
        .orderBy(col("doc_id"))
    },

    // ---- dedup corpus rewrite (clusters applied) --------------------------
    // The step after p29: apply the cluster labels to the corpus —
    // keep one survivor per cluster, report how many docs merged into
    // it and how many tokens the rewrite dropped. This is the actual
    // deliverable of a near-dup pass (the rewritten corpus + an audit
    // of what was removed); the oracle extends the shared recursive-CTE
    // fixpoint, so pairs → clusters → rewrite can never drift apart.
    // Plan cost beyond p29: one broadcast-joinable label table against
    // the scan + one survivor-keyed agg.
    Q("p42_dedup_rewrite", Some(s"""
      WITH RECURSIVE $simhash64Cte,
      $simhashPairsCte,
      $clusterLabelsCte,
      cl AS (SELECT d.doc_id,
                    coalesce(l.cluster_id, d.doc_id) AS cluster_id,
                    CAST(len($wsSql) AS BIGINT) AS n_tokens
             FROM documents d LEFT JOIN lbl l ON l.n = d.doc_id)
      SELECT cluster_id AS survivor_id, COUNT(*) AS n_merged,
             CAST(SUM(CASE WHEN doc_id <> cluster_id THEN n_tokens ELSE 0 END)
               AS BIGINT) AS tokens_dropped
      FROM cl GROUP BY cluster_id
      ORDER BY survivor_id""")) { (spark, dir) =>
      // r20: shared materialized pairs+labels (see p29) — the rewrite
      // keeps its per-row tokenCount, so the scan stays spread
      val docs = Tables.loadSpread(spark, dir, "documents")
      val cc = SharedStages.labels(spark, dir)
        .select(col("doc_id"), col("cluster_id").as("lbl"))
      docs
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .join(cc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster_id"), col("n_tokens"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_merged"),
          sum(when(col("doc_id") =!= col("cluster_id"), col("n_tokens"))
            .otherwise(0L)).cast("long").as("tokens_dropped"))
        .select(col("cluster_id").as("survivor_id"),
          col("n_merged"), col("tokens_dropped"))
        .orderBy(col("survivor_id"))
    },

    // ---- brute-force cosine top-k (exact ANN baseline) --------------------
    Q("p10_knn_bruteforce", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 10),
      s AS (SELECT query_id, vec_id,
                   round(list_dot_product(qv, v)
                     / sqrt(list_dot_product(qv, qv))
                     / sqrt(list_dot_product(v, v)), 6) AS sim
            FROM v CROSS JOIN q WHERE vec_id <> query_id),
      r AS (SELECT query_id, vec_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rk
            FROM s)
      SELECT query_id, rk, vec_id, sim FROM r WHERE rk <= 5
      ORDER BY query_id, rk""")) { (spark, dir) =>
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5)
        .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- IVF-partitioned cosine top-k (bucket = cluster label) ------------
    Q("p11_knn_ivf", Some("""
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, label AS qlabel,
                   CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 20),
      s AS (SELECT query_id, vec_id,
                   round(list_dot_product(qv, v)
                     / sqrt(list_dot_product(qv, qv))
                     / sqrt(list_dot_product(v, v)), 6) AS sim
            FROM v JOIN q ON v.label = q.qlabel AND vec_id <> query_id),
      r AS (SELECT query_id, vec_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rk
            FROM s)
      SELECT query_id, rk, vec_id, sim FROM r WHERE rk <= 5
      ORDER BY query_id, rk""")) { (spark, dir) =>
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      SimilarityOps.partitionedTopK(emb, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding", "label", 5)
        .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- embedding near-dup pairs (capped blocks, never all-pairs) ---------
    // r14 reformulation: the original blocked on label ALONE — an
    // O(1)-cardinality key, so pair generation was O(corpus²/|labels|),
    // the exact p261 bug shape; the sharpened quadratic-join lint
    // (alias-resolving) caught it. Blocks are now (label, 8-bit SRP
    // bucket) with p150's hard member cap: over-full blocks abstain
    // (observe-reported, no-silent-caps), pair volume ≤ 200·n at any
    // corpus, and the SRP plane values are emitted VERBATIM into the
    // oracle so both engines bucket bit-identically (the p261
    // discipline).
    Q("p12_embedding_neardup", Some {
      val planes = graft.ops.SimilarityOps.srpHyperplanes(8, 64)
      val bucketSql = planes.zipWithIndex.map { case (h, j) =>
        val arr = h.map(_.toString).mkString("[", ",", "]")
        s"CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      b AS (SELECT vec_id, label, v, $bucketSql AS bk FROM v),
      m AS (SELECT label, bk, COUNT(*) AS n FROM b GROUP BY 1, 2),
      e AS (SELECT b.vec_id, b.label, b.v, b.bk
            FROM b JOIN m ON m.label = b.label AND m.bk = b.bk
            WHERE m.n BETWEEN 2 AND 200)
      SELECT x.vec_id AS a, y.vec_id AS b,
             round(list_dot_product(x.v, y.v)
               / sqrt(list_dot_product(x.v, x.v))
               / sqrt(list_dot_product(y.v, y.v)), 6) AS sim
      FROM e x JOIN e y ON x.label = y.label AND x.bk = y.bk
        AND x.vec_id < y.vec_id
      WHERE round(list_dot_product(x.v, y.v)
               / sqrt(list_dot_product(x.v, x.v))
               / sqrt(list_dot_product(y.v, y.v)), 6) >= 0.25
      ORDER BY a, b"""
    }) { (spark, dir) =>
      SimilarityOps.blockedNearDupPairs(
          Tables.loadSpread(spark, dir, "embeddings"),
          "vec_id", "embedding", "label", k = 8, dim = 64, minSim = 0.25)
        .orderBy(col("a"), col("b"))
    },

    // ---- tumbling-window event aggregation --------------------------------
    Q("p13_tumbling_window", Some("""
      SELECT (CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(ts)) AS BIGINT) % 900) AS bin_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bin_start, event_type""")) { (spark, dir) =>
      val ep = floor(unix_timestamp(col("ts"))).cast("long")
      Tables.load(spark, dir, "events")
        .groupBy((ep - ep % 900).as("bin_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bin_start"), col("event_type"))
    },

    // ---- gap-based sessionization (lag + cumulative sum) -------------------
    Q("p14_sessionize", Some("""
      WITH e AS (SELECT user_id, event_id,
                        CAST(floor(epoch(ts)) AS BIGINT) AS ep
                 FROM events),
      flagged AS (SELECT user_id, event_id, ep,
                         CASE WHEN lag(ep) OVER w IS NULL
                              OR ep - lag(ep) OVER w > 1800
                              THEN 1 ELSE 0 END AS new_sess
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)),
      sess AS (SELECT user_id, event_id, ep,
                      CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep, event_id
                                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
               FROM flagged)
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             min(ep) AS start_ep, max(ep) AS end_ep,
             max(ep) - min(ep) AS dur_s
      FROM sess GROUP BY user_id, sess_id
      ORDER BY user_id, sess_id""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("ep"))
        .withColumn("new_sess",
          when(lag(col("ep"), 1).over(w).isNull ||
            col("ep") - lag(col("ep"), 1).over(w) > 1800, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(wRun))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ep")).as("start_ep"),
          max(col("ep")).as("end_ep"), (max(col("ep")) - min(col("ep"))).as("dur_s"))
        .orderBy(col("user_id"), col("sess_id"))
    }
  )
}
