package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Portable, SimilarityOps, TextOps}

/** Training-data pipeline operators, part 2: deterministic hash
  * sampling, vocabulary building, PII-style redaction, and per-label
  * embedding centroids (the k-means/IVF training step).
  *
  * Like `Pipeline`, every oracle is the same formula in DuckDB SQL, so
  * checks are exact.
  */
object Pipeline2 {

  /** DuckDB: lowercased whitespace tokens (shared [[TextSql]] mirror). */
  private val wsSql = TextSql.ws

  val all: Seq[Q] = Seq(

    // ---- deterministic hash sampling ---------------------------------------
    // Sampling by a salted content-independent hash of the key: stable
    // under re-runs, engine-portable, and (unlike rand()) reproducible
    // across a 1000-executor fleet. 10% target rate.
    Q("p20_hash_sample", Some(s"""
      SELECT doc_id, source,
             ${Portable.h60Sql("concat('sample:', CAST(doc_id AS VARCHAR))")} % 100 AS bucket
      FROM documents
      WHERE ${Portable.h60Sql("concat('sample:', CAST(doc_id AS VARCHAR))")} % 100 < 10
      ORDER BY doc_id""")) { (spark, dir) =>
      val bucket = Portable.h60(concat(lit("sample:"),
        col("doc_id").cast("string"))) % 100
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"), bucket.as("bucket"))
        .filter(col("bucket") < 10)
        .orderBy(col("doc_id"))
    },

    // ---- vocabulary building (top-k tokens by document frequency) ----------
    // Distinct tokens per doc (set semantics), then ONE shuffle on token
    // with partial counts map-side; top-k via ORDER BY + LIMIT (Spark:
    // TakeOrderedAndProject — no global sort materialized).
    Q("p21_vocab_topk", Some(s"""
      WITH dw AS (SELECT DISTINCT doc_id, unnest($wsSql) AS token FROM documents)
      SELECT token, COUNT(*) AS df
      FROM dw GROUP BY token
      ORDER BY df DESC, token
      LIMIT 40""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token"))
        .limit(40)
    },

    // ---- PII-style redaction ------------------------------------------------
    // Digit runs → <NUM>, word@word → <EMAIL>-shaped masking; counts per
    // doc let the pipeline audit redaction volume. Pure map — no shuffle.
    Q("p22_redact", Some(raw"""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_num,
             CAST(len(regexp_extract_all(text, '\S+@\S+')) AS INTEGER) AS n_email,
             md5(regexp_replace(regexp_replace(text, '\S+@\S+', '<EMAIL>', 'g'),
                                '[0-9]+', '<NUM>', 'g')) AS redacted_md5
      FROM documents
      ORDER BY doc_id""")) { (spark, dir) =>
      val redacted = regexp_replace(
        regexp_replace(col("text"), "\\S+@\\S+", "<EMAIL>"),
        "[0-9]+", "<NUM>")
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"), lit("[0-9]+")).as("n_num"),
          regexp_count(col("text"), lit("\\S+@\\S+")).as("n_email"),
          md5(redacted).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },

    // ---- per-label embedding centroids (k-means / IVF training step) -------
    // posexplode → ONE shuffle on (label, dim); elements are rounded to
    // 6 decimals then summed through DECIMAL, so the mean is exact and
    // partition-order-proof (bit-identical on any cluster size).
    Q("p23_centroids", Some("""
      SELECT label, i,
             CAST(SUM(CAST(round(CAST(v[i] AS DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS c
      FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           generate_series(1, 64) t(i)
      GROUP BY label, i
      ORDER BY label, i""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("i0", "x")))
        .groupBy(col("label"), (col("i0") + 1).as("i"))
        .agg((sum(round(col("x"), 6).cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("c"))
        .orderBy(col("label"), col("i"))
    },

    // ---- TF-IDF top terms per document -------------------------------------
    // Classic training-data featurization. Scores use SCALED INTEGER
    // arithmetic (tf * 1e6 * N / df, floor division) instead of log-idf
    // so both engines agree bit-for-bit — no float rounding at the
    // ranking boundary. Plan: one shuffle for (doc, term) tf, one for
    // term df, broadcast-joined; top-5 via per-doc window. N comes from
    // a pre-pass count (two-pass, not a global window — the only shape
    // that scales past one partition).
    Q("p25_tfidf_topterms", Some(s"""
      WITH toks AS (SELECT doc_id, unnest($wsSql) AS term FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS n FROM documents),
      scored AS (SELECT doc_id, term,
                        CAST(tf * 1000000 * n.n // df.df AS BIGINT) AS score
                 FROM tf JOIN df USING (term) CROSS JOIN n),
      ranked AS (SELECT doc_id, term, score,
                        row_number() OVER (PARTITION BY doc_id
                                           ORDER BY score DESC, term) AS rk
                 FROM scored)
      SELECT doc_id, rk, term, score FROM ranked WHERE rk <= 5
      ORDER BY doc_id, rk""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.loadSpread(spark, dir, "documents")
      val nDocs = docs.count() // two-pass scalar, the scalable N source
      val tfRaw = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      // `tf` feeds both the df aggregation and the join; Spark does not
      // dedupe common subplans, so unmaterialized it would tokenize the
      // corpus TWICE (two full scans at 100 TB). localCheckpoint runs
      // the tf subtree once and both consumers read the materialized
      // partitions — the plan shows a ScanExistingRDD in place of the
      // second scan+explode+agg. (The agg+join shape itself is kept
      // because a count-over-window by term would buffer whole term
      // partitions — skew-fragile at 100 TB; production would swap
      // localCheckpoint for a reliable persist/checkpoint.)
      val tf = if (singlePass(spark, "graft.tfidf.singlePass")) tfRaw.localCheckpoint() else tfRaw
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      tf.join(broadcast(df), "term")
        .select(col("doc_id"), col("term"),
          expr(s"(tf * 1000000 * $nDocs) div df").cast("long").as("score"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("doc_id"), col("rk"), col("term"), col("score"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // ---- composite curation pipeline ---------------------------------------
    // The fused flow a real corpus build runs: quality gate → language
    // gate → exact dedup (keep min id) → deterministic hash sample.
    // Every stage is engine-portable, so the END-TO-END composition is
    // oracle-checked, not just the pieces. Plan: the two gates are
    // scan-stage codegen filters; dedup is the single content-hash
    // shuffle; the sample is a pure filter on the survivor id.
    Q("p28_curation_pipeline", Some {
      val names = TextOps.langProfiles.map(_._1)
      val scoreSql = names.map(l =>
        s"${TextSql.langScore("ws", l)} AS s_$l").mkString(", ")
      s"""
      WITH w AS (SELECT doc_id, text, $wsSql AS ws FROM documents),
      scored AS (SELECT doc_id, text, ${TextSql.quality("ws")} AS quality,
                        $scoreSql FROM w),
      kept AS (SELECT doc_id, text FROM scored
               WHERE quality >= 0.5
                 AND (${TextSql.langCase(l => s"s_$l")}) = 'en'),
      grp AS (SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS ch,
                     min(doc_id) AS doc_id, COUNT(*) AS n_copies
              FROM kept GROUP BY 1)
      SELECT doc_id, n_copies FROM grp
      WHERE ${Portable.h60Sql("concat('sample:', CAST(doc_id AS VARCHAR))")} % 100 < 50
      ORDER BY doc_id"""
    }) { (spark, dir) =>
      val kept = Tables.loadSpread(spark, dir, "documents")
        .filter(TextOps.qualityScore(col("text")) >= 0.5 &&
          TextOps.langId(col("text")) === "en")
      kept
        .groupBy(TextOps.contentHash(col("text")).as("ch"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .filter(Portable.h60(concat(lit("sample:"),
          col("doc_id").cast("string"))) % 100 < 50)
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    },

    // ---- SRP-LSH near-dup pairs (random-hyperplane bucketing) --------------
    // The label-free ANN path: the blocking key comes from the vectors
    // themselves via 8 deterministic ±1 hyperplanes (256 buckets). The
    // SAME literal hyperplanes are embedded in the oracle SQL, so the
    // check is exact — sign boundaries agree because both engines fold
    // the dot product in the same order.
    Q("p26_srp_neardup", Some {
      val planes = SimilarityOps.srpHyperplanes(8, 64)
      val bucketSql = planes.zipWithIndex.map { case (h, j) =>
        val arr = h.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
        s"CASE WHEN list_dot_product(v, $arr) >= 0 THEN ${1L << j} ELSE 0 END"
      }.mkString(" + ")
      s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      b AS (SELECT vec_id, v, $bucketSql AS bk FROM v)
      SELECT x.vec_id AS a, y.vec_id AS b,
             round(list_dot_product(x.v, y.v)
               / sqrt(list_dot_product(x.v, x.v))
               / sqrt(list_dot_product(y.v, y.v)), 6) AS sim
      FROM b x JOIN b y ON x.bk = y.bk AND x.vec_id < y.vec_id
      WHERE round(list_dot_product(x.v, y.v)
               / sqrt(list_dot_product(x.v, x.v))
               / sqrt(list_dot_product(y.v, y.v)), 6) >= 0.25
      ORDER BY a, b"""
    }) { (spark, dir) =>
      SimilarityOps.srpNearDupPairs(Tables.loadSpread(spark, dir, "embeddings"),
          "vec_id", "embedding", k = 8, minSim = 0.25, dim = 64)
        .orderBy(col("a"), col("b"))
    }
  )
}
