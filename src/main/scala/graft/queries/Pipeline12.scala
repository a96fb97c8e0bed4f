package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Portable, TextOps}

/** Round-8 pipeline entries, seventh batch: model-evaluation harness
  * ops (calibration, detector scoring, rater agreement) and the
  * portable HyperLogLog sketch.
  */
object Pipeline12 {

  private val wsSql = TextSql.ws

  /** p82's linear score as a reusable sub-plan: (doc_id, score). */
  private def qualityScore(spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val weights = broadcast(Pipeline6.qualityWeights.toDF("tok", "wt"))
    val s = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .join(weights, "tok")
      .groupBy(col("doc_id")).agg(sum(col("wt")).as("hit_sum"))
    docs.select(col("doc_id"))
      .join(s, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("hit_sum"), lit(0L)) + Pipeline6.qualityBias)
          .as("score"))
  }

  /** The p82 score as an oracle CTE fragment ending in `sc(doc_id, score)`. */
  private val scoreCte: String = s"""
      w(tok, wt) AS (VALUES ${Pipeline6.qualityWeights
    .map { case (t, w) => s"('$t', $w)" }.mkString(", ")}),
      tk AS (SELECT doc_id, unnest($wsSql) AS tok FROM documents),
      hs AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS hit_sum
             FROM tk JOIN w USING (tok) GROUP BY doc_id),
      sc AS (SELECT d.doc_id,
                    coalesce(hs.hit_sum, 0) + ${Pipeline6.qualityBias}
                      AS score
             FROM documents d LEFT JOIN hs ON d.doc_id = hs.doc_id)"""

  val all: Seq[Q] = Seq(

    // ---- quality-model calibration (reliability diagram) -------------------
    // The eval step between training a filter and trusting it: bucket
    // the corpus into score DECILES (ntile over the total (score,
    // doc_id) order — deterministic in both engines) and measure the
    // positive rate per bucket against a held-out label (here: the doc
    // is free of the 'dup' marker token). A calibrated score shows a
    // monotone positive-rate curve; the per-bucket score range and
    // pos_ppm are the reliability diagram's x and y in exact integers.
    //
    // Scale shape: scoring is the p82 broadcast-join plan; the global
    // ntile is ONE range-sort of (score, doc_id) pairs — an eval-set
    // op (eval sets are bounded), and at full scale the same diagram
    // falls out of a fixed score histogram instead.
    Q("p118_calibration", Some(s"""
      WITH $scoreCte,
      lb AS (SELECT d.doc_id,
                    CASE WHEN len(list_filter($wsSql, t -> t = 'dup')) = 0
                         THEN 1 ELSE 0 END AS pos
             FROM documents d),
      q AS (SELECT sc.doc_id, sc.score, lb.pos,
                   ntile(10) OVER (ORDER BY sc.score, sc.doc_id) AS decile
            FROM sc JOIN lb USING (doc_id))
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(score) AS BIGINT) AS min_score,
             CAST(max(score) AS BIGINT) AS max_score,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(pos) * 1000000 // count(*) AS BIGINT) AS pos_ppm
      FROM q GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val sc = qualityScore(spark, docs)
      val lb = docs.select(col("doc_id"),
        when(array_contains(TextOps.tokens(col("text")), "dup"), 0L)
          .otherwise(1L).as("pos"))
      sc.join(lb, "doc_id")
        .withColumn("decile",
          ntile(10).over(Window.orderBy(col("score"), col("doc_id")))
            .cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), min(col("score")).as("min_score"),
          max(col("score")).as("max_score"), sum(col("pos")).as("n_pos"))
        .select(col("decile"), col("n"), col("min_score"), col("max_score"),
          col("n_pos"), expr("n_pos * 1000000 div n").as("pos_ppm"))
        .orderBy(col("decile"))
    },

    // ---- near-dup detector evaluation vs Jaccard gold ----------------------
    // Detector scoring, the harness every dedup rollout needs: the
    // CHEAP simhash near-dup pair set (the prediction — one signature
    // per doc, banded buckets) scored against the EXPENSIVE 3-gram
    // Jaccard >= 0.8 pair set (the gold standard a production team
    // spot-computes on a sample before trusting the cheap detector
    // fleet-wide). TP/FP/FN from one full-outer join of the two
    // canonical (a < b) pair sets; precision_ppm / recall_ppm in
    // exact integers. The fixture has no md5-identical texts, so the
    // gold is genuinely fuzzy — exactly the regime the harness is for.
    //
    // Scale shape: gold pairs come from the p05 inverted-index join
    // (df-capped postings — no all-pairs product), predictions from
    // the p09 LSH-banded plan; the verdict join is keyed by the pair
    // itself. At 100 TB the gold runs on a sample; the SHAPE is the
    // same sparse pair-set reconciliation.
    Q("p119_dedup_eval", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      jsh AS (SELECT doc_id,
                     unnest(${TextSql.shingles("ws", 3)}) AS s
              FROM w),
      jds AS (SELECT DISTINCT doc_id, s FROM jsh),
      jcnt AS (SELECT doc_id, COUNT(*) AS nsh FROM jds GROUP BY doc_id),
      jdf AS (SELECT s, COUNT(*) AS df FROM jds GROUP BY s),
      jcap AS (SELECT jds.doc_id, jds.s FROM jds JOIN jdf USING (s)
               WHERE jdf.df <= 1000),
      jpair AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS inter
                FROM jcap x JOIN jcap y
                  ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2),
      tp AS (SELECT a, b FROM jpair
             JOIN jcnt ca ON ca.doc_id = a JOIN jcnt cb ON cb.doc_id = b
             WHERE CAST(inter AS DOUBLE) / (ca.nsh + cb.nsh - inter)
                     >= 0.8),
      j AS (SELECT p.a IS NOT NULL AS in_pred, t.a IS NOT NULL AS in_truth
            FROM spairs p FULL JOIN tp t ON p.a = t.a AND p.b = t.b)
      SELECT CAST(sum(CASE WHEN in_pred THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pred,
             CAST(sum(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT)
               AS n_truth,
             CAST(sum(CASE WHEN in_pred AND in_truth THEN 1 ELSE 0 END)
               AS BIGINT) AS tp,
             CAST(sum(CASE WHEN in_pred AND NOT in_truth THEN 1 ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN in_truth AND NOT in_pred THEN 1 ELSE 0 END)
               AS BIGINT) AS fn,
             CAST(CASE WHEN sum(CASE WHEN in_pred THEN 1 ELSE 0 END) = 0
                       THEN 0
                       ELSE sum(CASE WHEN in_pred AND in_truth
                                     THEN 1 ELSE 0 END) * 1000000
                            // sum(CASE WHEN in_pred THEN 1 ELSE 0 END)
                  END AS BIGINT) AS precision_ppm,
             CAST(CASE WHEN sum(CASE WHEN in_truth THEN 1 ELSE 0 END) = 0
                       THEN 0
                       ELSE sum(CASE WHEN in_pred AND in_truth
                                     THEN 1 ELSE 0 END) * 1000000
                            // sum(CASE WHEN in_truth THEN 1 ELSE 0 END)
                  END AS BIGINT) AS recall_ppm
      FROM j""")) { (spark, dir) =>
      import graft.ops.DedupOps
      val docs = Tables.loadSpread(spark, dir, "documents")
      // r20: the prediction side is the SharedStages materialized pair
      // table (identical by construction); only the Jaccard truth side
      // still pays its own inverted-index pass
      val pred = SharedStages.spairs(spark, dir)
        .select(col("a"), col("b"))
      val truth = DedupOps.jaccardPairs(docs, "doc_id", "text",
          minJaccard = 0.8, maxDf = 1000)
        .select(col("a"), col("b"))
      val j = pred.withColumn("in_pred", lit(true))
        .join(truth.withColumn("in_truth", lit(true)), Seq("a", "b"),
          "full_outer")
        .select(coalesce(col("in_pred"), lit(false)).as("in_pred"),
          coalesce(col("in_truth"), lit(false)).as("in_truth"))
      j.agg(
          sum(when(col("in_pred"), 1L).otherwise(0L)).as("n_pred"),
          sum(when(col("in_truth"), 1L).otherwise(0L)).as("n_truth"),
          sum(when(col("in_pred") && col("in_truth"), 1L).otherwise(0L))
            .as("tp"),
          sum(when(col("in_pred") && !col("in_truth"), 1L).otherwise(0L))
            .as("fp"),
          sum(when(col("in_truth") && !col("in_pred"), 1L).otherwise(0L))
            .as("fn"))
        .select(col("n_pred"), col("n_truth"), col("tp"), col("fp"),
          col("fn"),
          // zero-pair guard: Spark's div yields NULL on /0 while
          // DuckDB's // raises — a degenerate-but-defined 0 on both
          // sides keeps the engines aligned on an empty pair set
          expr("CASE WHEN n_pred = 0 THEN 0L " +
            "ELSE tp * 1000000 div n_pred END").as("precision_ppm"),
          expr("CASE WHEN n_truth = 0 THEN 0L " +
            "ELSE tp * 1000000 div n_truth END").as("recall_ppm"))
    },

    // ---- inter-rater agreement (Cohen's kappa) -----------------------------
    // Two independent keep/drop raters over the corpus — a cheap
    // length heuristic (n_chars >= 64) and the p82 linear model
    // (score > 0) — scored for chance-corrected agreement. kappa =
    // (N·(a+d) − X) / (N² − X) with X = (a+b)(a+c) + (c+d)(b+d), kept
    // in EXACT integers; the milli division truncates |num|·1000 by
    // the (positive) denominator and reapplies the sign, because
    // DuckDB's // floors while Spark's div truncates — identical only
    // away from negative operands, so the sign is factored out first.
    //
    // Scale shape: both raters are row-local or broadcast-join scores;
    // the whole statistic reduces through ONE four-cell confusion
    // aggregate. This is the agreement gate run before trusting a
    // cheap filter as a proxy for an expensive one.
    Q("p120_rater_agreement", Some(s"""
      WITH $scoreCte,
      r AS (SELECT d.doc_id,
                   CASE WHEN d.n_chars >= 64 THEN 1 ELSE 0 END AS ra,
                   CASE WHEN sc.score > 0 THEN 1 ELSE 0 END AS rb
            FROM documents d JOIN sc ON sc.doc_id = d.doc_id),
      cm AS (SELECT CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS a,
                    CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS b,
                    CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c,
                    CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS d
             FROM r),
      k AS (SELECT n, a, b, c, d,
                   n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d))
                     AS knum,
                   n * n - ((a + b) * (a + c) + (c + d) * (b + d)) AS kden
            FROM cm)
      SELECT n, a, b, c, d, knum, kden,
             CAST(CASE WHEN kden = 0 THEN 0
                       WHEN knum < 0 THEN -((-knum) * 1000 // kden)
                       ELSE knum * 1000 // kden END AS BIGINT)
               AS kappa_milli
      FROM k""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val r = docs.select(col("doc_id"),
          when(col("n_chars") >= 64, 1L).otherwise(0L).as("ra"))
        .join(qualityScore(spark, docs)
          .select(col("doc_id"),
            when(col("score") > 0, 1L).otherwise(0L).as("rb")), "doc_id")
      r.agg(count(lit(1)).as("n"),
          sum(when(col("ra") === 1 && col("rb") === 1, 1L).otherwise(0L))
            .as("a"),
          sum(when(col("ra") === 1 && col("rb") === 0, 1L).otherwise(0L))
            .as("b"),
          sum(when(col("ra") === 0 && col("rb") === 1, 1L).otherwise(0L))
            .as("c"),
          sum(when(col("ra") === 0 && col("rb") === 0, 1L).otherwise(0L))
            .as("d"))
        .withColumn("knum", expr(
          "n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d))"))
        .withColumn("kden", expr(
          "n * n - ((a + b) * (a + c) + (c + d) * (b + d))"))
        .select(col("n"), col("a"), col("b"), col("c"), col("d"),
          col("knum"), col("kden"),
          expr("""CASE WHEN kden = 0 THEN 0L
                       WHEN knum < 0 THEN -((-knum) * 1000 div kden)
                       ELSE knum * 1000 div kden END""").as("kappa_milli"))
    },

    // ---- portable HyperLogLog (mergeable distinct-count sketch) ------------
    // The third portable sketch (after the CMS and the Bloom): a
    // 256-register HLL over each source's token stream (standard
    // error 1.04/√256 = 6.5%), with the ENTIRE register state rebuilt
    // by the oracle — bucket = top 8 bits of h60, rho = leading-zero
    // rank of the low 52 bits read off length(bin(sub)) (exact in
    // both engines), register = max rho. The estimate keeps HLL's
    // harmonic mean in EXACT integers by quantizing each 2^−reg term
    // to 2^(20−reg) (terms past 2^20 drop — a defined,
    // engine-identical truncation), and α₂₅₆ = .7213/(1+1.079/256) is
    // carried as the exact rational 1846528/2570790, so est =
    // 1846528·256·2^20 / (2570790·ΣD) = 126892437938372608 //
    // (2570790·ΣD) in one trunc division. The '_all' row is computed
    // by MERGING the per-source register tables (max per bucket)
    // while the oracle computes it one-shot from the raw stream —
    // their hash equality is the cross-engine mergeability proof (the
    // p77 pattern). abs_err_ppm against the exact distinct count is
    // REPORTED here and ASSERTED against the m=256 standard-error
    // envelope in PortablePropertySpec.
    //
    // Scale shape: one map-side-combinable max per (source, bucket) —
    // 256 longs per group regardless of cardinality; merges are
    // elementwise max (commutative/idempotent). The exact distinct
    // alongside costs the real shuffle the sketch exists to avoid —
    // it is the measured reference, present only in the harness.
    Q("p121_portable_hll", Some(s"""
      WITH t AS (SELECT source, unnest($wsSql) AS tok FROM documents),
      h AS (SELECT source, tok,
                   ${Portable.h60Sql("concat('hll:', tok)")} AS h
            FROM t),
      rb AS (SELECT source, h // 4503599627370496 AS bucket,
                    h % 4503599627370496 AS sub
             FROM h),
      rho AS (SELECT source, bucket,
                     CASE WHEN sub = 0 THEN 53
                          ELSE 53 - length(bin(sub)) END AS r
              FROM rb),
      m AS MATERIALIZED (SELECT source, bucket, max(r) AS reg
                         FROM rho GROUP BY 1, 2),
      am AS (SELECT bucket, max(r) AS reg FROM rho GROUP BY 1),
      srcs AS (SELECT DISTINCT source FROM documents),
      bk AS (SELECT unnest(generate_series(0, 255)) AS bucket),
      regs AS MATERIALIZED (
        SELECT s.source, b.bucket, coalesce(m.reg, 0) AS reg
        FROM srcs s CROSS JOIN bk b
        LEFT JOIN m ON m.source = s.source AND m.bucket = b.bucket
        UNION ALL
        SELECT '_all', b.bucket, coalesce(am.reg, 0)
        FROM bk b LEFT JOIN am ON am.bucket = b.bucket),
      ex AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
             FROM t GROUP BY 1
             UNION ALL
             SELECT '_all', CAST(count(DISTINCT tok) AS BIGINT) FROM t),
      est AS (SELECT source,
                     sum(CASE WHEN reg <= 20
                              THEN CAST(1 AS BIGINT) << (20 - reg)
                              ELSE 0 END) AS dd,
                     CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_zero_regs,
                     bit_xor(${Portable.h60Sql(
        "concat(source, ':', CAST(bucket AS VARCHAR), ':', CAST(reg AS VARCHAR))")})
                       AS reg_xor
              FROM regs GROUP BY 1)
      SELECT e.source, x.n_exact,
             CAST(126892437938372608 // (2570790 * e.dd) AS BIGINT) AS est_hll,
             CAST(abs(126892437938372608 // (2570790 * e.dd) - x.n_exact)
               * 1000000 // x.n_exact AS BIGINT) AS abs_err_ppm,
             e.n_zero_regs, e.reg_xor
      FROM est e JOIN ex x USING (source) ORDER BY 1""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val t = docs.select(col("source"),
        explode(TextOps.tokens(col("text"))).as("tok")).localCheckpoint()
      val rho = t
        .select(col("source"),
          Portable.h60(concat(lit("hll:"), col("tok"))).as("h"))
        .select(col("source"), expr("h div 4503599627370496").as("bucket"),
          (col("h") % 4503599627370496L).as("sub"))
        .select(col("source"), col("bucket"),
          when(col("sub") === 0, 53L)
            .otherwise(lit(53L) - length(bin(col("sub")))).as("r"))
      val m = rho.groupBy(col("source"), col("bucket"))
        .agg(max(col("r")).as("reg")).localCheckpoint()
      val srcs = docs.select(col("source")).distinct()
      val bk = spark.range(0, 256).select(col("id").as("bucket"))
      val perSrc = srcs.crossJoin(broadcast(bk))
        .join(m, Seq("source", "bucket"), "left")
        .select(col("source"), col("bucket"),
          coalesce(col("reg"), lit(0L)).as("reg"))
      // '_all' is the MERGE of the per-source register tables — max per
      // bucket — while the oracle computes it one-shot from the raw
      // stream; equal states prove mergeability across engines
      val merged = perSrc.groupBy(col("bucket"))
        .agg(max(col("reg")).as("reg"))
        .select(lit("_all").as("source"), col("bucket"), col("reg"))
      val regs = perSrc.union(merged)
      val ex = t.groupBy(col("source"))
        .agg(countDistinct(col("tok")).as("n_exact"))
        .union(t.agg(countDistinct(col("tok")).as("n_exact"))
          .select(lit("_all").as("source"), col("n_exact")))
      val est = regs
        .withColumn("hx", Portable.h60(concat(col("source"), lit(":"),
          col("bucket").cast("string"), lit(":"), col("reg").cast("string"))))
        .groupBy(col("source"))
        .agg(sum(when(col("reg") <= 20,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - reg AS INT))"))
          .otherwise(0L)).as("dd"),
          sum(when(col("reg") === 0, 1L).otherwise(0L)).as("n_zero_regs"),
          expr("bit_xor(hx)").as("reg_xor"))
      est.join(ex, "source")
        .select(col("source"), col("n_exact"),
          expr("126892437938372608L div (2570790 * dd)").as("est_hll"),
          expr("abs(126892437938372608L div (2570790 * dd) - n_exact)" +
            " * 1000000 div n_exact").as("abs_err_ppm"),
          col("n_zero_regs"), col("reg_xor"))
        .orderBy(col("source"))
    }
  )
}
