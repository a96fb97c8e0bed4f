package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Portable, TextOps}

/** Round-9 pipeline entries, third batch: corpus-rewrite boilerplate
  * removal (the CCNet/RefinedWeb segment-df pass), probabilistic record
  * linkage (sorted-neighborhood blocking + Fellegi–Sunter log-odds),
  * distributed exact order statistics (the two-pass selection
  * algorithm), and cross-source score normalization by rank matching.
  */
object Pipeline15 {

  private val wsSql = TextSql.ws

  /** p176 segment width (tokens) and the df threshold above which a
    * segment counts as corpus boilerplate.
    */
  private val SegN = 8
  private val BoilerDf = 3

  /** p178 bucket width for the first (histogram) pass: cents div 2^16
    * keeps the fixture's price range in ~150 buckets — wide enough
    * that the histogram is metadata-sized, narrow enough that the
    * second pass touches a small slice of the scan.
    */
  private val SelBucket = 1L << 16


  /** ONE oracle for both faces of the KS drift census — the batch
    * entry (p187) and the streaming-state entry (p193): the exact
    * two-sample D over merged token-count CDFs per source pair.
    * Sharing the text makes the batch=stream equivalence inseparable.
    */
  private[queries] val ksOracle: String = s"""
      WITH d AS (SELECT source, CAST(len($wsSql) AS BIGINT) AS raw
                 FROM documents),
      v AS (SELECT source, raw, CAST(count(*) AS BIGINT) AS cnt
            FROM d GROUP BY 1, 2),
      sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      pr AS (SELECT a.source AS src1, b.source AS src2,
                    a.n AS n1, b.n AS n2
             FROM sz a JOIN sz b ON a.source < b.source),
      m AS (SELECT pr.src1, pr.src2, pr.n1, pr.n2, v.raw,
                   CASE WHEN v.source = pr.src1 THEN v.cnt ELSE 0 END AS c1,
                   CASE WHEN v.source = pr.src2 THEN v.cnt ELSE 0 END AS c2
            FROM pr JOIN v ON v.source = pr.src1 OR v.source = pr.src2),
      g AS (SELECT src1, src2, n1, n2, raw, sum(c1) AS c1, sum(c2) AS c2
            FROM m GROUP BY 1, 2, 3, 4, 5),
      w AS (SELECT src1, src2, n1, n2,
                   sum(c1) OVER (PARTITION BY src1, src2 ORDER BY raw
                     ROWS UNBOUNDED PRECEDING) AS f1,
                   sum(c2) OVER (PARTITION BY src1, src2 ORDER BY raw
                     ROWS UNBOUNDED PRECEDING) AS f2
            FROM g),
      k AS (SELECT src1, src2, n1, n2,
                   CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS dx
            FROM w GROUP BY 1, 2, 3, 4)
      SELECT src1, src2, n1, n2,
             CAST(dx * 1000000 // (n1 * n2) AS BIGINT) AS d_ppm,
             (dx * 1000 // (n1 * n2)) * (dx * 1000 // (n1 * n2)) * n1 * n2
               > 1844 * 1000 * (n1 + n2) AS reject
      FROM k ORDER BY src1, src2"""

  val all: Seq[Q] = firstQ ++ restQ

  private def firstQ: Seq[Q] = Seq(

    // ---- corpus boilerplate removal (segment-df rewrite) -------------------
    // The CCNet/RefinedWeb cleaning pass: hash every fixed-width text
    // segment (the fixture's stand-in for lines/paragraphs), count per
    // segment how many DISTINCT documents contain it, and REWRITE each
    // document with segments present in >= 3 docs removed — nav bars,
    // cookie banners, license footers vanish; unique prose stays. The
    // output is the per-doc rewrite audit: segment counts, removed
    // fraction in ppm, and the portable hash of the cleaned text (the
    // downstream exact-dedup key — cleaning FIRST is what lets exact
    // dedup catch docs that differed only in boilerplate).
    //
    // Scale shape: one segment pass over the scan (codegen kernel), one
    // seg-keyed map-side-combining df agg, one seg-keyed join back, one
    // doc-keyed rebuild. The rebuild's collect_list is bounded by doc
    // length (collect_list skips the NULLed-out boilerplate entries).
    // Nothing all-pairs, nothing driver-side; at 100 TB the df table is
    // the only corpus-wide state and it shrinks with the df>=3 skew cap
    // a production run would publish as a broadcast blocklist.
    Q("p176_segment_boilerplate", Some(s"""
      WITH ws AS (SELECT doc_id, $wsSql AS w FROM documents),
      s AS (SELECT doc_id, ${TextSql.segments("w", SegN)} AS segs FROM ws),
      e AS (SELECT doc_id, unnest(generate_series(1, len(segs))) AS i,
                   unnest(segs) AS seg FROM s),
      df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM e GROUP BY 1),
      j AS (SELECT e.doc_id, e.i, e.seg, df.df FROM e JOIN df USING (seg)),
      r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
                   CAST(sum(CASE WHEN df >= $BoilerDf THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_removed,
                   coalesce(string_agg(CASE WHEN df < $BoilerDf THEN seg END,
                     ' ' ORDER BY i), '') AS cleaned
            FROM j GROUP BY 1)
      SELECT d.doc_id,
             coalesce(r.n_segs, 0) AS n_segs,
             coalesce(r.n_removed, 0) AS n_removed,
             CAST(CASE WHEN coalesce(r.n_segs, 0) = 0 THEN 0
                  ELSE r.n_removed * 1000000 // r.n_segs END AS BIGINT)
               AS removed_ppm,
             ${Portable.h60Sql("coalesce(r.cleaned, '')")} AS clean_hash
      FROM documents d LEFT JOIN r USING (doc_id)
      ORDER BY d.doc_id""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val e = docs
        .select(col("doc_id"),
          posexplode(TextOps.segments(col("text"), SegN)).as(Seq("i", "seg")))
      val df = e.groupBy(col("seg"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val r = e.join(df, "seg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("df") >= BoilerDf, 1L).otherwise(0L)).as("n_removed"),
          array_join(
            transform(
              array_sort(collect_list(
                when(col("df") < BoilerDf, struct(col("i"), col("seg"))))),
              x => x.getField("seg")),
            " ").as("cleaned"))
      docs.select(col("doc_id")).join(r, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_segs"), lit(0L)).as("n_segs"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          when(coalesce(col("n_segs"), lit(0L)) === 0, 0L)
            .otherwise(expr("n_removed * 1000000 div n_segs"))
            .as("removed_ppm"),
          Portable.h60(coalesce(col("cleaned"), lit(""))).as("clean_hash"))
        .orderBy(col("doc_id"))
    },

    // ---- sorted-neighborhood record linkage (Fellegi–Sunter) ---------------
    // Probabilistic entity resolution across two record sets (customers
    // vs suppliers standing in for two ingest feeds): SORTED-
    // NEIGHBORHOOD blocking — order the union by the fuzzy blocking key
    // (account cents) and pair only records within rank distance 3 —
    // then the Fellegi–Sunter linkage score: each field comparison
    // (nation, key check digit, balance-within-$20) contributes a
    // fixed integer milli-log2-odds weight, agree = log2(m/u) > 0,
    // disagree = log2((1-m)/(1-u)) < 0 (weights stated from assumed
    // m/u, the standard bootstrap before EM refinement), and the total
    // classifies match / possible / nonmatch by threshold. Output is
    // the decision census with score extremes.
    //
    // Scale shape: the global rank is the documented total-order
    // statistics shape — at 100 TB the sort is range-partitioned and
    // each partition pairs internally, exchanging only a w-row boundary
    // strip with its neighbor (the whole point of SNM: candidate count
    // is w*n, never n²). Here the pairing is a rank-shifted EQUI-join
    // (explode d in 1..w, join on rn + d = rn), not a range join.
    Q("p177_record_linkage", Some("""
      WITH u AS (SELECT 'c' AS role, c_custkey AS k, c_nationkey AS nation,
                        c_custkey % 10 AS dig,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS cents
                 FROM customer
                 UNION ALL
                 SELECT 's', s_suppkey, s_nationkey, s_suppkey % 10,
                        CAST(round(s_acctbal * 100) AS BIGINT)
                 FROM supplier),
      r AS (SELECT *, row_number() OVER (ORDER BY cents, role, k) AS rn
            FROM u),
      p AS (SELECT a.nation AS na, b.nation AS nb, a.dig AS da, b.dig AS db,
                   a.cents AS xa, b.cents AS xb
            FROM r a JOIN r b
              ON b.rn - a.rn BETWEEN 1 AND 3 AND a.role <> b.role),
      s AS (SELECT (CASE WHEN na = nb THEN 1800 ELSE -400 END)
                 + (CASE WHEN da = db THEN 1200 ELSE -500 END)
                 + (CASE WHEN abs(xa - xb) <= 2000 THEN 900 ELSE -700 END)
                   AS score
            FROM p),
      d AS (SELECT CASE WHEN score >= 2500 THEN 'match'
                        WHEN score <= -500 THEN 'nonmatch'
                        ELSE 'possible' END AS decision,
                   score
            FROM s)
      SELECT decision, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(min(score) AS BIGINT) AS min_score,
             CAST(max(score) AS BIGINT) AS max_score,
             CAST(sum(score) AS BIGINT) AS sum_score
      FROM d GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import spark.implicits._
      val cust = Tables.load(spark, dir, "customer")
        .select(lit("c").as("role"), col("c_custkey").as("k"),
          col("c_nationkey").cast("long").as("nation"),
          (col("c_custkey") % 10).as("dig"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      val supp = Tables.load(spark, dir, "supplier")
        .select(lit("s").as("role"), col("s_suppkey").as("k"),
          col("s_nationkey").cast("long").as("nation"),
          (col("s_suppkey") % 10).as("dig"),
          expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("cents"))
      val r = cust.unionAll(supp)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("cents"), col("role"), col("k"))))
      val a = r.select(col("role").as("role_a"), col("nation").as("na"),
          col("dig").as("da"), col("cents").as("xa"), col("rn"))
        .withColumn("d", explode(lit(Array(1, 2, 3))))
        .withColumn("rn_b", col("rn") + col("d"))
      val b = r.select(col("role").as("role_b"), col("nation").as("nb"),
        col("dig").as("db"), col("cents").as("xb"), col("rn").as("rn_b"))
      val score =
        when(col("na") === col("nb"), 1800).otherwise(-400) +
          when(col("da") === col("db"), 1200).otherwise(-500) +
          when(abs(col("xa") - col("xb")) <= 2000, 900).otherwise(-700)
      a.join(b, "rn_b")
        .where(col("role_a") =!= col("role_b"))
        .select(score.as("score"))
        .select(when(col("score") >= 2500, "match")
          .when(col("score") <= -500, "nonmatch")
          .otherwise("possible").as("decision"), col("score"))
        .groupBy(col("decision"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("score")).cast("long").as("min_score"),
          max(col("score")).cast("long").as("max_score"),
          sum(col("score")).cast("long").as("sum_score"))
        .orderBy(col("decision"))
    },

    // ---- two-pass distributed exact selection (order statistics) -----------
    // The exact median of 100 TB, no sort: pass 1 histograms the cents
    // into 2^16-wide buckets (map-side-combining agg, metadata-sized
    // output); a cumulative walk over the histogram locates, for each
    // target rank k (p25/p50/p75, k = ceil(n*q/100), the lower
    // quantile), the ONE bucket containing the k-th smallest; pass 2
    // re-scans ONLY that bucket's rows (a pushed-down range predicate)
    // and finds the exact value by grouped-value cumulative counts —
    // never a global sort, never a data-sized window. The oracle
    // computes the same ranks by brute-force row_number, so the
    // equality IS the proof the two-pass selection is exact.
    //
    // Scale shape: pass 1 output is O(#buckets); the rank location
    // math runs on that metadata frame; pass 2 reads ~1/#buckets of
    // the data (with min/max zone maps: only the stripes whose range
    // intersects the bucket) and aggregates by distinct value before
    // the tiny cumulative window. This is the textbook two-phase
    // selection that replaces ORDER BY for exact percentiles at scale.
    Q("p178_twopass_quantiles", Some(s"""
      WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                 FROM lineitem),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      r AS (SELECT t.q AS pct, n.n AS n_rows,
                   CAST((n.n * t.q + 99) // 100 AS BIGINT) AS k
            FROM n, (VALUES (25), (50), (75)) AS t(q)),
      s AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c)
      SELECT r.pct, r.n_rows, r.k, s.cents AS value
      FROM r JOIN s ON s.rn = r.k ORDER BY r.pct""")) { (spark, dir) =>
      import spark.implicits._
      val c = Tables.load(spark, dir, "lineitem")
        .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .as("cents"))
      val hist = c.groupBy(expr(s"cents div $SelBucket").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      // the cumulative walk runs on the metadata-sized histogram only
      val wb = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("cnt")).over(wb))
        .withColumn("cum_before", col("cum") - col("cnt"))
      val n = hist.agg(sum(col("cnt")).as("n"))
      val ranks = Seq(25, 50, 75).toDF("pct")
        .crossJoin(broadcast(n))
        .withColumn("k", expr("(n * pct + 99) div 100"))
      val sel = ranks.join(broadcast(cum),
        col("cum_before") < col("k") && col("k") <= col("cum"))
        .select(col("pct"), col("n"), col("k"), col("bucket"),
          col("cum_before"))
      // pass 2: only the selected buckets' rows, grouped by value so the
      // final cumulative window runs over distinct values, not rows
      val g = c.join(broadcast(sel),
          expr(s"cents div $SelBucket") === col("bucket"))
        .groupBy(col("pct"), col("n"), col("k"), col("cum_before"),
          col("cents"))
        .agg(count(lit(1)).as("cnt2"))
      val wv = Window.partitionBy(col("pct")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cum2", sum(col("cnt2")).over(wv))
        .where(col("cum2") >= col("k") - col("cum_before")
          && col("cum2") - col("cnt2") < col("k") - col("cum_before"))
        .select(col("pct"), col("n").as("n_rows"), col("k"),
          col("cents").as("value"))
        .orderBy(col("pct"))
    },

    // ---- cross-source quantile normalization (rank matching) ---------------
    // Quality scores from different sources aren't comparable (one
    // crawler's "50 tokens" is another's boilerplate): quantile
    // normalization maps each source's score distribution onto the
    // GLOBAL distribution by rank — the i-th of n_s source docs gets
    // the value at the matching global rank 1 + (i-1)(N-1)/(n_s-1)
    // (integer floor; a singleton source maps to the global median).
    // After normalization every source's scores follow the same
    // distribution, so one global threshold curates all sources
    // without per-source bias — the microarray-normalization trick
    // applied to corpus curation.
    //
    // Scale shape: the global rank is the documented total-order
    // statistics shape (production: the global side is a quantile
    // sketch — this entry is its exact form, and the oracle equality
    // pins the exact semantics a sketch would approximate); the
    // per-source ranks partition by source; the rank-matching step is
    // one equi-join on the computed global index.
    Q("p179_quantile_normalize", Some(s"""
      WITH d AS (SELECT doc_id, source,
                        CAST(len($wsSql) AS BIGINT) AS raw
                 FROM documents),
      g AS (SELECT raw AS gval,
                   row_number() OVER (ORDER BY raw, doc_id) AS gi,
                   count(*) OVER () AS nn
            FROM d),
      s AS (SELECT doc_id, source, raw,
                   row_number() OVER (PARTITION BY source
                     ORDER BY raw, doc_id) AS si,
                   count(*) OVER (PARTITION BY source) AS ns
            FROM d),
      t AS (SELECT doc_id, source, raw,
                   CASE WHEN ns > 1
                        THEN 1 + ((si - 1) * (nn - 1)) // (ns - 1)
                        ELSE (nn + 1) // 2 END AS tgt
            FROM s, (SELECT DISTINCT nn FROM g) x)
      SELECT t.doc_id, t.source, t.raw, CAST(g.gval AS BIGINT) AS norm
      FROM t JOIN g ON g.gi = t.tgt
      ORDER BY t.doc_id""")) { (spark, dir) =>
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("raw"))
      val g = d.select(col("raw").as("gval"),
        row_number().over(Window.orderBy(col("raw"), col("doc_id")))
          .as("gi"))
      val nn = d.agg(count(lit(1)).as("nn"))
      val s = d
        .withColumn("si", row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("raw"), col("doc_id"))))
        .withColumn("ns", count(lit(1)).over(
          Window.partitionBy(col("source"))))
        .crossJoin(broadcast(nn))
        .withColumn("tgt", when(col("ns") > 1,
            lit(1) + expr("((si - 1) * (nn - 1)) div (ns - 1)"))
          .otherwise(expr("(nn + 1) div 2")))
      s.join(g, col("gi") === col("tgt"))
        .select(col("doc_id"), col("source"), col("raw"),
          col("gval").cast("long").as("norm"))
        .orderBy(col("doc_id"))
    },

    // ---- Unicode script-mix census / homoglyph spoof detection -------------
    // The multilingual-corpus triage pass: per doc, character counts by
    // script class (Latin, Cyrillic, digits), the dominant script, a
    // mixed-script flag, and the CONFUSABLE flag — some TOKEN mixes
    // Latin and Cyrillic letters, the homoglyph trick ('а' U+0430 for
    // 'a') that defeats naive blocklists and poisons tokenizers. The
    // fixture corpus is ASCII, so the query plants both failure modes
    // deterministically first (doc_id%7: in-word homoglyph swap;
    // doc_id%11: genuine appended Cyrillic words) — the planted docs
    // must separate: appended-Cyrillic is mixed but NOT confusable,
    // homoglyph-swapped is both.
    //
    // Scale shape: all classification is regex-class counting
    // (length minus class-stripped length) and a token-level exists()
    // — codegen string kernels in the scan stage, zero shuffle, zero
    // explode; output is doc-keyed.
    Q("p180_script_census", Some(s"""
      WITH m AS (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN replace(text, 'a', 'а')
                        WHEN doc_id % 11 = 0 THEN concat(text, ' код 42')
                        ELSE text END AS mut
                 FROM documents),
      c AS (SELECT doc_id, mut,
                   CAST(length(mut)
                     - length(regexp_replace(mut, '[a-z]', '', 'g'))
                     AS BIGINT) AS n_latin,
                   CAST(length(mut)
                     - length(regexp_replace(mut, '[а-яё]', '', 'g'))
                     AS BIGINT) AS n_cyr,
                   CAST(length(mut)
                     - length(regexp_replace(mut, '[0-9]', '', 'g'))
                     AS BIGINT) AS n_digit
            FROM m)
      SELECT doc_id, n_latin, n_cyr, n_digit,
             CASE WHEN n_latin >= n_cyr THEN 'latin' ELSE 'cyrillic' END
               AS dominant,
             n_latin > 0 AND n_cyr > 0 AS mixed,
             len(list_filter(string_split_regex(mut, '\\s+'),
               t -> regexp_matches(t, '[a-z]')
                 AND regexp_matches(t, '[а-яё]'))) > 0 AS confusable
      FROM c ORDER BY doc_id""")) { (spark, dir) =>
      val m = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, regexp_replace(col("text"), "a", "а"))
            .when(col("doc_id") % 11 === 0, concat(col("text"), lit(" код 42")))
            .otherwise(col("text")).as("mut"))
      def classCount(c: org.apache.spark.sql.Column, cls: String) =
        (length(c) - length(regexp_replace(c, cls, ""))).cast("long")
      m.select(col("doc_id"),
          classCount(col("mut"), "[a-z]").as("n_latin"),
          classCount(col("mut"), "[а-яё]").as("n_cyr"),
          classCount(col("mut"), "[0-9]").as("n_digit"),
          col("mut"))
        .select(col("doc_id"), col("n_latin"), col("n_cyr"), col("n_digit"),
          when(col("n_latin") >= col("n_cyr"), "latin").otherwise("cyrillic")
            .as("dominant"),
          (col("n_latin") > 0 && col("n_cyr") > 0).as("mixed"),
          exists(split(col("mut"), "\\s+"),
            t => t.rlike("[a-z]") && t.rlike("[а-яё]")).as("confusable"))
        .orderBy(col("doc_id"))
    },

    // ---- symmetric int8 vector quantization + reconstruction audit ---------
    // The embedding-compression step before ANN serving: per vector,
    // symmetric int8 quantization (scale = amax/127, q_i =
    // round(x_i·127/amax)) — 4× smaller than float32, the standard
    // serving format. Everything runs in the micro-int convention
    // (ri = round(x·1e6), the p88/p92/p97 contract) so both engines
    // do EXACT integer arithmetic: the round-half-up is the shifted
    // floor ((ri+amax)·254 + amax) div (2·amax) − 127 (nonnegative
    // dividends only — floor vs truncate never diverges), and the
    // reconstruction error per dimension is |127·ri − q_i·amax| with
    // NO division at all. Output per vector: amax, total/max error,
    // and the L1-relative error in ppm — the table that decides which
    // vectors are too quantization-fragile to serve from int8.
    //
    // Scale shape: one posexplode + a vec-keyed two-pass (amax agg,
    // then the quantize/error agg) — map-side combining both times,
    // never a matrix in driver memory; at 100 TB this is the same
    // shape as the p88 PQ encode pass.
    Q("p181_int8_quantize", Some("""
      WITH c AS (SELECT vec_id,
                        unnest(generate_series(1, len(embedding))) AS j,
                        CAST(round(unnest(CAST(embedding AS DOUBLE[]))
                          * 1000000) AS BIGINT) AS ri
                 FROM embeddings),
      a AS (SELECT vec_id, CAST(max(abs(ri)) AS BIGINT) AS amax
            FROM c GROUP BY 1),
      q AS (SELECT c.vec_id, a.amax, c.ri,
                   CASE WHEN a.amax = 0 THEN 0
                        ELSE ((c.ri + a.amax) * 254 + a.amax)
                             // (2 * a.amax) - 127 END AS qi
            FROM c JOIN a USING (vec_id)),
      e AS (SELECT vec_id, amax,
                   CAST(sum(abs(127 * ri - qi * amax)) AS BIGINT) AS sum_err,
                   CAST(max(abs(127 * ri - qi * amax)) AS BIGINT) AS max_err,
                   CAST(sum(abs(ri)) AS BIGINT) AS l1
            FROM q GROUP BY 1, 2)
      SELECT vec_id, amax, sum_err, max_err,
             CAST(CASE WHEN l1 = 0 THEN 0
                  ELSE sum_err * 1000000 // (127 * l1) END AS BIGINT)
               AS err_ppm
      FROM e ORDER BY vec_id""")) { (spark, dir) =>
      val c = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
        .select(col("vec_id"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val a = c.groupBy(col("vec_id")).agg(max(abs(col("ri"))).as("amax"))
      val q = c.join(a, "vec_id")
        .withColumn("qi", when(col("amax") === 0, 0L)
          .otherwise(expr("((ri + amax) * 254 + amax) div (2 * amax) - 127")))
      q.groupBy(col("vec_id"), col("amax"))
        .agg(sum(abs(lit(127) * col("ri") - col("qi") * col("amax")))
            .as("sum_err"),
          max(abs(lit(127) * col("ri") - col("qi") * col("amax")))
            .as("max_err"),
          sum(abs(col("ri"))).as("l1"))
        .select(col("vec_id"), col("amax"), col("sum_err"), col("max_err"),
          when(col("l1") === 0, 0L)
            .otherwise(expr("sum_err * 1000000 div (127 * l1)"))
            .as("err_ppm"))
        .orderBy(col("vec_id"))
    },

    // ---- CMS-guided two-phase exact heavy hitters --------------------------
    // The sketch-then-verify pattern that makes EXACT heavy hitters
    // affordable at 100 TB: phase 1 builds the portable 4×512
    // Count-Min sketch (ONE mergeable array per partition, p111's
    // aggregate) plus the total token count; phase 2 probes the
    // broadcast sketch PER TOKEN OCCURRENCE in the scan (4 md5s + a
    // least()) and ships ONLY occurrences whose estimate clears the
    // threshold into the exact count shuffle — the long tail (the
    // overwhelming mass of a token distribution) never shuffles and
    // never inflates map-side combiner state. CMS never
    // underestimates, so no true heavy hitter is pruned: the output
    // is EXACT, and the oracle — which rebuilds the identical counter
    // matrix in SQL and runs the same two phases — hash-matching is
    // the losslessness proof. est_slack = cms_est − exact is the
    // published collision overshoot per survivor.
    //
    // Scale shape: phase 1 state is O(depth·width) per partition;
    // phase 2's filter runs scan-side against a broadcast ~16 KB
    // array; the exact agg shuffles only candidate occurrences.
    Q("p182_hh_twophase", Some {
      val (depth, width) = (4, 512)
      val rr = (0 until depth).map(r => s"($r)").mkString(", ")
      s"""
      WITH t AS (SELECT unnest($wsSql) AS token FROM documents),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM t),
      cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c
              FROM t GROUP BY 1),
      rr(r) AS (VALUES $rr),
      cms AS (SELECT r,
                     ${Portable.h60Sql("concat(CAST(r AS VARCHAR), ':', token)")}
                       % $width AS slot,
                     CAST(sum(c) AS BIGINT) AS ctr
              FROM cnt, rr GROUP BY 1, 2),
      est AS (SELECT cnt.token, cnt.c, min(coalesce(cms.ctr, 0)) AS cms_est
              FROM cnt CROSS JOIN rr
              LEFT JOIN cms ON cms.r = rr.r
                AND cms.slot = ${Portable.h60Sql(
                  "concat(CAST(rr.r AS VARCHAR), ':', cnt.token)")} % $width
              GROUP BY 1, 2)
      SELECT e.token, e.c AS n, CAST(e.cms_est AS BIGINT) AS cms_est,
             CAST(e.cms_est - e.c AS BIGINT) AS est_slack
      FROM est e, tot
      WHERE e.cms_est >= tot.tot // 500 AND e.c >= tot.tot // 500
      ORDER BY n DESC, token"""
    }) { (spark, dir) =>
      import graft.functions.Cms
      val (depth, width) = (4, 512)
      val toks = Tables.loadSpread(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val sk = toks.agg(Cms.sketch(col("token"), depth, width).as("cms"),
        count(lit(1)).as("tot"))
      val est = (0 until depth).map(r =>
        element_at(col("cms"),
          (pmod(Portable.h60(concat(lit(s"$r:"), col("token"))), lit(width))
            + lit(r * width) + lit(1)).cast("int")))
        .reduce(least(_, _))
      toks.crossJoin(broadcast(sk))
        .withColumn("cms_est", est)
        .where(col("cms_est") >= expr("tot div 500"))
        .groupBy(col("token"), col("cms_est"), col("tot"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= expr("tot div 500"))
        .select(col("token"), col("n"), col("cms_est"),
          (col("cms_est") - col("n")).as("est_slack"))
        .orderBy(col("n").desc, col("token"))
    },

    // ---- incremental view maintenance for a join view (delta rules) --------
    // The materialized-view refresh algebra: for V = A ⋈ B aggregated,
    // applying inserts ΔA and ΔB costs Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪
    // ΔA⋈ΔB — three joins each sized by a DELTA, never a re-scan of
    // A⋈B. The query splits orders (key%5=0 = ΔA) and customers
    // (key%7=0 = ΔB), maintains the per-nation revenue view
    // incrementally, AND recomputes it from scratch in the same
    // query: the output carries both sums and the agree flag per
    // nation — self-proving, like p166's bitmap-vs-row audit. p73
    // maintains a single-table aggregate; this entry extends the
    // delta rules across a JOIN, the case where naive refresh
    // re-shuffles the whole fact table.
    //
    // Scale shape: the base view is maintained state (at 100 TB: a
    // nation-keyed table); each refresh shuffles only delta-sized
    // inputs — ΔA⋈B_old broadcasts B's join column, A_old⋈ΔB
    // broadcasts the ΔB keys, ΔA⋈ΔB is tiny×tiny.
    Q("p183_ivm_join_view", Some("""
      WITH a AS (SELECT o_orderkey, o_custkey,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
      b AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation
            FROM customer),
      ao AS (SELECT * FROM a WHERE o_orderkey % 5 <> 0),
      da AS (SELECT * FROM a WHERE o_orderkey % 5 = 0),
      bo AS (SELECT * FROM b WHERE c_custkey % 7 <> 0),
      db AS (SELECT * FROM b WHERE c_custkey % 7 = 0),
      base AS (SELECT nation, sum(cents) AS s FROM ao
               JOIN bo ON o_custkey = c_custkey GROUP BY 1),
      d1 AS (SELECT nation, sum(cents) AS s FROM da
             JOIN bo ON o_custkey = c_custkey GROUP BY 1),
      d2 AS (SELECT nation, sum(cents) AS s FROM ao
             JOIN db ON o_custkey = c_custkey GROUP BY 1),
      d3 AS (SELECT nation, sum(cents) AS s FROM da
             JOIN db ON o_custkey = c_custkey GROUP BY 1),
      ivm AS (SELECT nation, CAST(sum(s) AS BIGINT) AS ivm_cents FROM (
                SELECT * FROM base UNION ALL SELECT * FROM d1
                UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
              GROUP BY 1),
      fv AS (SELECT nation, CAST(sum(cents) AS BIGINT) AS full_cents
             FROM a JOIN b ON o_custkey = c_custkey GROUP BY 1)
      SELECT f.nation, f.full_cents, i.ivm_cents,
             f.full_cents = i.ivm_cents AS agree
      FROM fv f JOIN ivm i USING (nation)
      ORDER BY f.nation""")) { (spark, dir) =>
      val a = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val b = Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").cast("long")
          .as("nation"))
      val ao = a.where(col("o_orderkey") % 5 =!= 0)
      val da = a.where(col("o_orderkey") % 5 === 0)
      val bo = b.where(col("c_custkey") % 7 =!= 0)
      val db = b.where(col("c_custkey") % 7 === 0)
      def view(x: org.apache.spark.sql.DataFrame,
          y: org.apache.spark.sql.DataFrame) =
        x.join(y, col("o_custkey") === col("c_custkey"))
          .groupBy(col("nation")).agg(sum(col("cents")).as("s"))
      val ivm = view(ao, bo).unionAll(view(da, broadcast(bo)))
        .unionAll(view(ao, broadcast(db)))
        .unionAll(view(da, broadcast(db)))
        .groupBy(col("nation")).agg(sum(col("s")).as("ivm_cents"))
      val full = a.join(b, col("o_custkey") === col("c_custkey"))
        .groupBy(col("nation")).agg(sum(col("cents")).as("full_cents"))
      full.join(ivm, "nation")
        .select(col("nation"), col("full_cents"), col("ivm_cents"),
          (col("full_cents") === col("ivm_cents")).as("agree"))
        .orderBy(col("nation"))
    },

    // ---- xor replica digest / fleet integrity diff -------------------------
    // Replica verification for a 100 TB table in 16 numbers: per hash
    // bucket, the bit_xor of every row's portable content hash is an
    // order- and partitioning-independent digest (xor is commutative
    // and associative → map-side combine; ANY single-row difference
    // flips its bucket's digest). The query builds a second "replica"
    // with planted corruption (cents+1 where o_orderkey % 997 = 0) and
    // diffs the two digest vectors — exactly the cross-region
    // consistency check a fleet runs nightly without moving data: ship
    // 16 longs, not 10^9 rows, and re-sync only mismatched buckets.
    //
    // Scale shape: one scan per replica, map-side xor partials, output
    // is O(#buckets) metadata. The bucket count is the re-sync
    // granularity knob (production: 2^12+ buckets so a repair touches
    // 1/4096 of the table).
    Q("p184_replica_digest", Some(s"""
      WITH a AS (SELECT o_orderkey AS k,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                        o_orderstatus AS st FROM orders),
      b AS (SELECT k, CASE WHEN k % 997 = 0 THEN cents + 1 ELSE cents END
                   AS cents, st FROM a),
      ha AS (SELECT ${Portable.h60Sql("CAST(k AS VARCHAR)")} % 16 AS bucket,
                    ${Portable.h60Sql(
                      "concat(CAST(k AS VARCHAR), '|', CAST(cents AS VARCHAR), '|', st)")}
                      AS h, k FROM a),
      hb AS (SELECT ${Portable.h60Sql("CAST(k AS VARCHAR)")} % 16 AS bucket,
                    ${Portable.h60Sql(
                      "concat(CAST(k AS VARCHAR), '|', CAST(cents AS VARCHAR), '|', st)")}
                      AS h, k FROM b),
      da AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
                    CAST(sum(CASE WHEN k % 997 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_corrupt,
                    bit_xor(h) AS dig_a FROM ha GROUP BY 1),
      db AS (SELECT bucket, bit_xor(h) AS dig_b FROM hb GROUP BY 1)
      SELECT da.bucket, da.n_rows, da.n_corrupt,
             CAST(da.dig_a AS BIGINT) AS dig_a,
             CAST(db.dig_b AS BIGINT) AS dig_b,
             da.dig_a = db.dig_b AS agree
      FROM da JOIN db USING (bucket)
      ORDER BY da.bucket""")) { (spark, dir) =>
      val a = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          col("o_orderstatus").as("st"))
      val b = a.withColumn("cents",
        when(col("k") % 997 === 0, col("cents") + 1).otherwise(col("cents")))
      def digest(df: org.apache.spark.sql.DataFrame) = df
        .select(pmod(Portable.h60(col("k").cast("string")), lit(16))
            .as("bucket"),
          Portable.h60(concat_ws("|", col("k").cast("string"),
            col("cents").cast("string"), col("st"))).as("h"),
          col("k"))
      val da = digest(a).groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("k") % 997 === 0, 1L).otherwise(0L)).as("n_corrupt"),
          expr("bit_xor(h)").as("dig_a"))
      val db = digest(b).groupBy(col("bucket"))
        .agg(expr("bit_xor(h)").as("dig_b"))
      da.join(db, "bucket")
        .select(col("bucket"), col("n_rows"), col("n_corrupt"),
          col("dig_a"), col("dig_b"),
          (col("dig_a") === col("dig_b")).as("agree"))
        .orderBy(col("bucket"))
    },

    // ---- group-aware serpentine k-fold split -------------------------------
    // Leakage-safe cross-validation folds balanced by MASS, not count:
    // the unit of assignment is the exact-dup group (all byte-twins
    // land in one fold by construction — the leakage guarantee p101
    // gives by cluster hash), but instead of hashing groups to folds
    // (balanced only in expectation) the groups are ranked by token
    // mass and dealt in SERPENTINE order (0..k-1, k-1..0, ...) — the
    // deterministic near-LPT heuristic that bounds fold imbalance by
    // one group's mass per serpentine cycle. Output is the per-fold
    // census the trainer reads: group/doc counts and token mass.
    //
    // Scale shape: group rollup is one content-hash-keyed agg; the
    // rank is a window over GROUPS (corpus/dup-factor rows, the
    // documented total-order statistics shape — production uses a
    // range-partitioned sort); the deal is pure modular arithmetic on
    // the rank; the census is a k-row agg.
    Q("p185_group_kfold", Some(s"""
      WITH g AS (SELECT ${Portable.h60Sql(
                   raw"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')")}
                   AS gkey,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len($wsSql)) AS BIGINT) AS mass
            FROM documents GROUP BY 1),
      r AS (SELECT *, row_number() OVER (ORDER BY mass DESC, gkey) - 1
                   AS rk FROM g),
      f AS (SELECT *, CASE WHEN rk % 10 < 5 THEN rk % 10
                           ELSE 9 - rk % 10 END AS fold FROM r)
      SELECT CAST(fold AS BIGINT) AS fold,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(mass) AS BIGINT) AS mass
      FROM f GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val g = Tables.loadSpread(spark, dir, "documents")
        .select(Portable.h60(regexp_replace(trim(lower(col("text"))),
            "\\s+", " ")).as("gkey"),
          size(TextOps.tokens(col("text"))).cast("long").as("toks"))
        .groupBy(col("gkey"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("mass"))
      val r = g.withColumn("rk",
        row_number().over(Window.orderBy(col("mass").desc, col("gkey")))
          - 1)
      r.withColumn("fold",
          when(col("rk") % 10 < 5, col("rk") % 10)
            .otherwise(lit(9) - col("rk") % 10).cast("long"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_groups"), sum(col("n_docs")).as("n_docs"),
          sum(col("mass")).as("mass"))
        .orderBy(col("fold"))
    },

    // ---- seeded label propagation over the near-dup graph ------------------
    // Semi-supervised label spread: 20% of graph nodes carry a seed
    // class (doc_id%5=0 → class doc_id%3); three SYNCHRONOUS rounds
    // propagate labels to unlabeled neighbors by majority vote (ties →
    // smallest class), seeds stay clamped — the cheap transductive
    // classifier that turns a handful of human labels plus the dedup
    // pair graph into cluster-level labels (CC says "same family",
    // LPA says WHICH family). Unreached nodes report -1. Deterministic
    // because rounds are synchronous and the tie-break is total.
    //
    // Scale shape: pairs come from the SharedStages materialized table
    // (the p75/p101 amortization); each round is one edge-keyed join +
    // two bounded aggs — the vote argmax is a conditional struct
    // extremum, never a window. Three rounds = three bounded shuffles;
    // the oracle unrolls the SAME three rounds as CTEs, so the hash
    // match pins the synchronous-update semantics exactly.
    Q("p186_label_propagation", Some {
      def voteCte(prev: String, out: String): String =
        s"""v$out AS (SELECT e.u AS n, l.lbl AS cand,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM esym e JOIN $prev l ON l.n = e.v
           WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
      w$out AS (SELECT n, cand FROM (SELECT *, row_number() OVER (
                  PARTITION BY n ORDER BY cnt DESC, cand) AS rw FROM v$out)
                WHERE rw = 1),
      $out AS (SELECT l.n, coalesce(l.lbl, w.cand) AS lbl
               FROM $prev l LEFT JOIN w$out w ON w.n = l.n)"""
      s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      esym AS (SELECT a AS u, b AS v FROM spairs
               UNION ALL SELECT b, a FROM spairs),
      l0 AS (SELECT DISTINCT u AS n,
                    CASE WHEN u % 5 = 0 THEN u % 3 END AS lbl FROM esym),
      ${voteCte("l0", "l1")},
      ${voteCte("l1", "l2")},
      ${voteCte("l2", "l3")}
      SELECT n AS doc_id, CAST(coalesce(lbl, -1) AS BIGINT) AS label,
             n % 5 = 0 AS seeded
      FROM l3 ORDER BY n"""
    }) { (spark, dir) =>
      val sp = SharedStages.spairs(spark, dir)
      val esym = sp.select(col("a").as("u"), col("b").as("v"))
        .unionAll(sp.select(col("b"), col("a")))
        .localCheckpoint()
      val l0 = esym.select(col("u").as("n")).distinct()
        .withColumn("lbl", when(col("n") % 5 === 0, col("n") % 3))
      def round(lbls: org.apache.spark.sql.DataFrame) = {
        val votes = esym
          .join(lbls.where(col("lbl").isNotNull)
            .select(col("n").as("v"), col("lbl").as("nl")), "v")
          .groupBy(col("u"), col("nl"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("u"))
          .agg(max(struct(col("cnt"), (-col("nl")).as("neg"))).as("m"))
          .select(col("u").as("n"), (-col("m.neg")).as("vote"))
        lbls.join(votes, Seq("n"), "left")
          .select(col("n"), coalesce(col("lbl"), col("vote")).as("lbl"))
      }
      val l3 = round(round(round(l0)))
      l3.select(col("n").as("doc_id"),
          coalesce(col("lbl"), lit(-1L)).cast("long").as("label"),
          (col("n") % 5 === 0).as("seeded"))
        .orderBy(col("doc_id"))
    },

    // ---- exact two-sample Kolmogorov–Smirnov census ------------------------
    // Distribution drift between every source pair, exactly: D = max
    // |F1 − F2| over the merged token-count CDFs, computed in integer
    // cross-multiplied form |c1·n2 − c2·n1| so no engine ever divides
    // early. The α=0.05 decision uses the squared form of the
    // classical critical value D > c(α)·sqrt((n1+n2)/(n1·n2)) —
    // D_milli²·n1·n2 > c²·10³·(n1+n2) with c²(0.05)=1.844 embedded as
    // the precomputed 1844 milli-constant (the lc-table discipline: no
    // engine runs sqrt or log). p160's TV distance needs binning; KS
    // is bin-free and catches location shifts TV smears out.
    //
    // Scale shape: the per-(source, value) rollup is one agg; source
    // pairs are S² metadata rows (production: each source vs one
    // global reference = S rows); each pair's CDF walk is a window
    // over its own distinct VALUES, not rows. Outputs S(S−1)/2 rows.
    Q("p187_ks_census", Some(ksOracle)) { (spark, dir) =>
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("raw"))
      ksFromCounts(d.groupBy(col("source"), col("raw"))
        .agg(count(lit(1)).as("cnt")))
    },
    ksStreamEntry
  )

  /** The documents fixture schema, declared up front for file streams
    * (a stream source cannot infer).
    */
  private def docsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("lang",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("source",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_chars",
      org.apache.spark.sql.types.LongType)))

  /** `documents.parquet` as a file stream. The driver fixture ships it
    * as a single FILE (stream at the parent dir with a glob filter —
    * a file basePath is rejected), spec fixtures as a DIRECTORY of
    * part files (stream the directory itself — the glob filter would
    * match nothing). Detect and do the right one.
    */
  private def docsStream(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val p = new java.io.File(dir, "documents.parquet")
    val r = s.readStream.schema(docsSchema)
    if (p.isDirectory) r.parquet(p.getPath)
    else r.option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  // ---- STREAMING KS drift census (stateful per-(source,value) counts) ----
  // The p187 drift monitor as a streaming deployment: the per-
  // (source, token-count) frequency table is a STREAMING aggregation
  // (complete mode — the state the monitor keeps between micro-
  // batches), and the KS tail runs on the final state exactly as the
  // batch face does. The oracle is the SAME SQL text as p187: the
  // hash match is the batch≡stream equivalence proof (the p152/p163
  // discipline applied to drift monitoring).
  //
  // Scale shape: streaming state is one row per (source, distinct
  // value) — the CDF support, not the stream; the KS tail is the
  // p187 metadata computation.
  private def ksStreamEntry: Q =
    Q("p193_stream_ks", Some(ksOracle)) { (spark, dir) =>
      import graft.streaming.StreamingOps
      val v = StreamingOps.runToMemory(spark, mode = "complete") { s =>
        docsStream(s, dir)
          .select(col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("raw"))
          .groupBy(col("source"), col("raw"))
          .agg(count(lit(1)).as("cnt"))
      }
      ksFromCounts(v)
    }

  /** The KS computation from per-(source, value) counts onward —
    * shared by the batch (p187) and streaming (p193) faces.
    */
  private def ksFromCounts(
      v: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val sz = v.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
      val pr = sz.select(col("source").as("src1"), col("n").as("n1"))
        .join(sz.select(col("source").as("src2"), col("n").as("n2")),
          col("src1") < col("src2"))
      val m = broadcast(pr).join(v,
          col("source") === col("src1") || col("source") === col("src2"))
        .select(col("src1"), col("src2"), col("n1"), col("n2"), col("raw"),
          when(col("source") === col("src1"), col("cnt")).otherwise(0L)
            .as("c1"),
          when(col("source") === col("src2"), col("cnt")).otherwise(0L)
            .as("c2"))
      val g = m.groupBy(col("src1"), col("src2"), col("n1"), col("n2"),
          col("raw"))
        .agg(sum(col("c1")).as("c1"), sum(col("c2")).as("c2"))
      val wc = Window.partitionBy(col("src1"), col("src2"))
        .orderBy(col("raw"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val k = g
        .withColumn("f1", sum(col("c1")).over(wc))
        .withColumn("f2", sum(col("c2")).over(wc))
        .groupBy(col("src1"), col("src2"), col("n1"), col("n2"))
        .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1")))
          .as("dx"))
      k.select(col("src1"), col("src2"), col("n1"), col("n2"),
          expr("dx * 1000000 div (n1 * n2)").as("d_ppm"),
          (expr("(dx * 1000 div (n1 * n2)) * (dx * 1000 div (n1 * n2))")
            * col("n1") * col("n2")
            > lit(1844L) * 1000L * (col("n1") + col("n2"))).as("reject"))
        .orderBy(col("src1"), col("src2"))
  }

  private def restQ: Seq[Q] = Seq(

    // ---- shuffle-skew advisor (salt-factor recommendation) -----------------
    // The pre-flight check before any key-partitioned shuffle: the
    // per-key frequency profile of the join/agg key, reduced to the
    // decision numbers — hottest key's share, whether one partition
    // would exceed 2× the fair share at the session's 32 partitions,
    // and the RECOMMENDED salt factor ceil(top_cnt·P/N) (the spread
    // that brings the hot key back to fair share; 1 = no salting
    // needed). p136 proves the salted rewrite correct; this advisor
    // DECIDES when and how much to salt — together they close the
    // loop AQE's skew handling closes only for sort-merge joins.
    //
    // Scale shape: one map-side-combining key rollup, then single-row
    // extrema — the hottest key via conditional struct max, never a
    // sort. Output is one metadata row.
    Q("p188_skew_advisor", Some("""
      WITH k AS (SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS c
                 FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(c) AS BIGINT) AS top_cnt,
                   CAST(min(CASE WHEN c = (SELECT max(c) FROM k)
                            THEN key END) AS BIGINT) AS top_key
            FROM k)
      SELECT n_rows, n_keys, top_key, top_cnt,
             CAST(top_cnt * 1000000 // n_rows AS BIGINT) AS top_ppm,
             top_cnt > 2 * (n_rows // 32) AS skewed,
             CAST((top_cnt * 32 + n_rows - 1) // n_rows AS BIGINT)
               AS rec_salt
      FROM t""")) { (spark, dir) =>
      val k = Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_suppkey").as("key"))
        .agg(count(lit(1)).as("c"))
      k.agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(struct(col("c"), (-col("key")).as("nk"))).as("m"))
        .select(col("n_rows"), col("n_keys"),
          (-col("m.nk")).cast("long").as("top_key"),
          col("m.c").as("top_cnt"),
          expr("m.c * 1000000 div n_rows").as("top_ppm"),
          (col("m.c") > lit(2) * expr("n_rows div 32")).as("skewed"),
          expr("(m.c * 32 + n_rows - 1) div n_rows").as("rec_salt"))
    },

    // ---- weighted two-pass exact selection ---------------------------------
    // p178 with mass instead of count: the exact WEIGHTED median /
    // quartiles of price weighted by quantity — the "half the VOLUME
    // ships below this price" statistic, which is what a cost model
    // wants (the unweighted median over-weights small orders). Same
    // two-pass shape: bucket histogram now accumulates WEIGHT, the
    // cumulative walk locates each weighted rank k = ceil(W·q/100),
    // pass 2 touches one bucket and resolves by grouped-value weight
    // cumsum. The oracle brute-forces the weight prefix over all
    // values; hash equality again proves the selection exact.
    //
    // Scale shape: identical to p178 — O(#buckets) metadata between
    // two scans, second scan range-pruned to the selected buckets.
    Q("p189_weighted_quantiles", Some(s"""
      WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                          AS cents,
                        CAST(l_quantity AS BIGINT) AS w
                 FROM lineitem),
      n AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM c),
      r AS (SELECT t.q AS pct, n.tw,
                   CAST((n.tw * t.q + 99) // 100 AS BIGINT) AS k
            FROM n, (VALUES (25), (50), (75)) AS t(q)),
      s AS (SELECT cents, sum(w) OVER (ORDER BY cents
                     ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(w) OVER (ORDER BY cents
                     ROWS UNBOUNDED PRECEDING) - w AS cwb
            FROM (SELECT cents, CAST(sum(w) AS BIGINT) AS w FROM c
                  GROUP BY 1)),
      p AS (SELECT r.pct, r.tw, r.k, min(s.cents) AS value
            FROM r JOIN s ON s.cw >= r.k AND s.cwb < r.k
            GROUP BY 1, 2, 3)
      SELECT pct, tw AS total_weight, k, CAST(value AS BIGINT) AS value
      FROM p ORDER BY pct""")) { (spark, dir) =>
      import spark.implicits._
      val c = Tables.load(spark, dir, "lineitem")
        .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .as("cents"), col("l_quantity").cast("long").as("w"))
      val hist = c.groupBy(expr(s"cents div $SelBucket").as("bucket"))
        .agg(sum(col("w")).as("bw"))
      val wb = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("bw")).over(wb))
        .withColumn("cum_before", col("cum") - col("bw"))
      val n = hist.agg(sum(col("bw")).as("tw"))
      val ranks = Seq(25, 50, 75).toDF("pct")
        .crossJoin(broadcast(n))
        .withColumn("k", expr("(tw * pct + 99) div 100"))
      val sel = ranks.join(broadcast(cum),
          col("cum_before") < col("k") && col("k") <= col("cum"))
        .select(col("pct"), col("tw"), col("k"), col("bucket"),
          col("cum_before"))
      val g = c.join(broadcast(sel),
          expr(s"cents div $SelBucket") === col("bucket"))
        .groupBy(col("pct"), col("tw"), col("k"), col("cum_before"),
          col("cents"))
        .agg(sum(col("w")).as("vw"))
      val wv = Window.partitionBy(col("pct")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cw", sum(col("vw")).over(wv))
        .where(col("cw") >= col("k") - col("cum_before")
          && col("cw") - col("vw") < col("k") - col("cum_before"))
        .select(col("pct"), col("tw").as("total_weight"), col("k"),
          col("cents").as("value"))
        .orderBy(col("pct"))
    },

    // ---- bigram surprisal with backoff (train/eval split) ------------------
    // The stronger LM behind curriculum ordering: an integer-bits
    // bigram model TRAINED on doc_id%3≠0 docs scores the HELD-OUT
    // %3=0 docs — so unseen bigrams and OOV tokens actually occur
    // (scoring the training corpus with itself can never back off).
    // Per eval token: seen bigram → floor(log2(C(prev)/C(prev,cur)));
    // unseen bigram → unigram bits + 2 (the fixed backoff penalty);
    // OOV token → floor(log2(N)) + 4. All logs are the p161
    // length(bin(x))−1 integer kernel — no engine runs log. Output
    // per eval doc: token/backoff/OOV counts and mean millibits, the
    // curriculum key (low = easy/common, high = rare/novel).
    //
    // Scale shape: counts are two map-side-combining aggs over the
    // train scan; scoring is two keyed joins (bigram, unigram) against
    // the eval tokens — at 100 TB both count tables are bucketed
    // broadcast-or-shuffle joins, and prev-alignment is a per-doc
    // window (doc-bounded, never corpus-wide).
    Q("p190_bigram_surprisal", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      t AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos,
                   unnest(ws) AS tok FROM w),
      seq AS (SELECT doc_id, pos, tok,
                     lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS prev FROM t),
      tru AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM seq
              WHERE doc_id % 3 <> 0 GROUP BY 1),
      trb AS (SELECT prev, tok, CAST(count(*) AS BIGINT) AS cb FROM seq
              WHERE doc_id % 3 <> 0 AND prev IS NOT NULL GROUP BY 1, 2),
      n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM seq
            WHERE doc_id % 3 <> 0),
      ev AS (SELECT s.doc_id, s.pos, s.tok, s.prev,
                    u.cu, b.cb, pu.cu AS cp
             FROM seq s
             LEFT JOIN tru u ON u.tok = s.tok
             LEFT JOIN trb b ON b.prev = s.prev AND b.tok = s.tok
             LEFT JOIN tru pu ON pu.tok = s.prev
             WHERE s.doc_id % 3 = 0),
      sc AS (SELECT doc_id,
                    CASE WHEN cu IS NULL THEN 1 ELSE 0 END AS oov,
                    CASE WHEN prev IS NOT NULL AND cb IS NULL
                         THEN 1 ELSE 0 END AS backoff,
                    CASE
                      WHEN prev IS NOT NULL AND cb IS NOT NULL
                        THEN length(bin(cp // cb)) - 1
                      WHEN cu IS NULL
                        THEN length(bin((SELECT nt FROM n))) - 1 + 4
                      WHEN prev IS NULL
                        THEN length(bin((SELECT nt FROM n) // cu)) - 1
                      ELSE length(bin((SELECT nt FROM n) // cu)) - 1 + 2
                    END AS bits
             FROM ev)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(oov) AS BIGINT) AS n_oov,
             CAST(sum(backoff) AS BIGINT) AS n_backoff,
             CAST(sum(bits) AS BIGINT) AS total_bits,
             CAST(sum(bits) * 1000 // count(*) AS BIGINT)
               AS mean_millibits
      FROM sc GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val seq = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("prev", lag(col("tok"), 1).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      val train = seq.where(col("doc_id") % 3 =!= 0)
      val tru = train.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      val trb = train.where(col("prev").isNotNull)
        .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cb"))
      val n = train.agg(count(lit(1)).as("nt"))
      def ilog2(c: org.apache.spark.sql.Column) =
        (length(bin(c)) - 1).cast("long")
      val ev = seq.where(col("doc_id") % 3 === 0)
        .join(tru, Seq("tok"), "left")
        .join(trb, Seq("prev", "tok"), "left")
        .join(tru.select(col("tok").as("prev"), col("cu").as("cp")),
          Seq("prev"), "left")
        .crossJoin(broadcast(n))
      val bits =
        when(col("prev").isNotNull && col("cb").isNotNull,
          ilog2(expr("cp div cb")))
        .when(col("cu").isNull, ilog2(col("nt")) + 4)
        .when(col("prev").isNull, ilog2(expr("nt div cu")))
        .otherwise(ilog2(expr("nt div cu")) + 2)
      ev.select(col("doc_id"),
          when(col("cu").isNull, 1L).otherwise(0L).as("oov"),
          when(col("prev").isNotNull && col("cb").isNull, 1L).otherwise(0L)
            .as("backoff"),
          bits.as("bits"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("oov")).as("n_oov"),
          sum(col("backoff")).as("n_backoff"),
          sum(col("bits")).as("total_bits"),
          expr("sum(bits) * 1000 div count(1)").cast("long")
            .as("mean_millibits"))
        .orderBy(col("doc_id"))
    },

    // ---- STREAMING mergeable CMS (custom aggregate as stream state) --------
    // p111's portable Count-Min sketch driven by the STREAMING engine:
    // the per-source 4×256 counter matrix is built by the SAME
    // TypedImperativeAggregate, but as streaming-aggregation state —
    // each micro-batch's partials merge into the state store through
    // the aggregate's own serialize/merge path (elementwise add,
    // commutative, so micro-batch boundaries cannot change the state).
    // The probe tail and the oracle are p111's, verbatim: matching
    // hashes prove the custom sketch aggregate is micro-batch-
    // invariant, the last leg of the p77 mergeability story.
    //
    // Scale shape: streaming state is one 1 KB array per source
    // regardless of vocabulary; probes run on the final frame.
    Q("p191_stream_cms", Some(Pipeline10.cmsOracle)) { (spark, dir) =>
      import graft.functions.Cms
      import graft.streaming.StreamingOps
      val sk = StreamingOps.runToMemory(spark, mode = "complete") { s =>
        docsStream(s, dir)
          .select(col("source"),
            explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy(col("source"))
          .agg(Cms.sketch(col("term"), 4, 256).as("cms"))
      }
      val terms = Tables.loadSpread(spark, dir, "documents")
        .select(col("source"),
          explode(TextOps.tokens(col("text"))).as("term"))
      Pipeline10.cmsProbeOutput(sk, terms)
    },

    // ---- columnar encoding advisor (dict / RLE / plain) --------------------
    // The layout decision a parquet writer makes per column, surfaced
    // as a census: for each column of the fact table (in the stable
    // (orderkey, linenumber) row order a sorted write would produce),
    // the distinct-value ratio and the value-run profile, reduced to
    // the encoding recommendation — RLE when the mean run length
    // clears 4 (runs·4 ≤ n), dictionary when NDV ≤ 1% of rows, plain
    // otherwise. Complements p138's zone-map advisor (row-group
    // pruning) and p89's Z-order layout (clustering): together they
    // are the physical-design loop. One melt (×5 columns) feeds both
    // profiles; run detection is a lag-inequality per column. The
    // declared order tie-breaks on the value itself because the
    // fixture's (orderkey, linenumber) is not unique — equal-value
    // ties can't move run boundaries, so the order stays total AND
    // run-neutral.
    //
    // Scale shape: the melt is deliberate ×5 (like p106); each
    // column's run walk is a window over ITS rows in the declared
    // order (the documented total-order statistics shape — production
    // profiles per row group, which is exactly how parquet decides);
    // output is one row per column.
    Q("p192_encoding_advisor", Some {
      val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_shipdate")
      val melts = cols.map(c =>
        s"""SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v,
            l_orderkey AS ok, l_linenumber AS ln FROM lineitem""")
        .mkString(" UNION ALL ")
      s"""
      WITH m AS ($melts),
      w AS (SELECT col_name, v,
                   CASE WHEN lag(v) OVER (PARTITION BY col_name
                          ORDER BY ok, ln, v) IS DISTINCT FROM v
                        THEN 1 ELSE 0 END AS chg
            FROM m),
      s AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT v) AS BIGINT) AS ndv,
                   CAST(sum(chg) AS BIGINT) AS n_runs
            FROM w GROUP BY 1)
      SELECT col_name, n, ndv, n_runs,
             CAST(n * 1000 // n_runs AS BIGINT) AS avg_run_milli,
             CASE WHEN n_runs * 4 <= n THEN 'rle'
                  WHEN ndv * 100 <= n THEN 'dict'
                  ELSE 'plain' END AS recommendation
      FROM s ORDER BY col_name"""
    }) { (spark, dir) =>
      val cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_shipdate")
      val li = Tables.load(spark, dir, "lineitem")
      val m = cols.map(c => li.select(lit(c).as("col_name"),
          col(c).cast("string").as("v"), col("l_orderkey").as("ok"),
          col("l_linenumber").as("ln")))
        .reduce(_ unionAll _)
      val wr = Window.partitionBy(col("col_name"))
        .orderBy(col("ok"), col("ln"), col("v"))
      m.withColumn("chg",
          when(not(lag(col("v"), 1).over(wr) <=> col("v")), 1L)
            .otherwise(0L))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n"), countDistinct(col("v")).as("ndv"),
          sum(col("chg")).as("n_runs"))
        .select(col("col_name"), col("n"), col("ndv"), col("n_runs"),
          expr("n * 1000 div n_runs").as("avg_run_milli"),
          when(col("n_runs") * 4 <= col("n"), "rle")
            .when(col("ndv") * 100 <= col("n"), "dict")
            .otherwise("plain").as("recommendation"))
        .orderBy(col("col_name"))
    },

    // ---- Markov next-event prediction eval (train/eval split) --------------
    // The p156 transition model closed into an EVALUATED predictor:
    // transitions counted on train users (user_id%3≠0) yield the
    // argmax next-event per current event (ties → lexicographically
    // smaller); held-out users' actual transitions score it. Output
    // per current-event type: the prediction, eval volume, hits, and
    // accuracy ppm — the baseline any sequence model must beat, and
    // the same train/eval discipline as p190 (a model scored on its
    // own training stream can only flatter itself).
    //
    // Scale shape: transition counts are one map-side agg over lag
    // pairs (per-user windows, user-bounded); the predictor is an
    // |event-types|² metadata table; scoring is one broadcast join.
    Q("p194_markov_eval", Some("""
      WITH e AS (SELECT user_id, event_type, ts, event_id FROM events),
      seq AS (SELECT user_id, event_type AS cur,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
              FROM e),
      tr AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c FROM seq
             WHERE user_id % 3 <> 0 AND nxt IS NOT NULL GROUP BY 1, 2),
      pred AS (SELECT cur, nxt AS predicted FROM
                 (SELECT *, row_number() OVER (PARTITION BY cur
                    ORDER BY c DESC, nxt) AS rn FROM tr)
               WHERE rn = 1),
      ev AS (SELECT cur, nxt FROM seq
             WHERE user_id % 3 = 0 AND nxt IS NOT NULL)
      SELECT ev.cur, p.predicted,
             CAST(count(*) AS BIGINT) AS n_eval,
             CAST(sum(CASE WHEN ev.nxt = p.predicted THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit,
             CAST(sum(CASE WHEN ev.nxt = p.predicted THEN 1 ELSE 0 END)
               * 1000000 // count(*) AS BIGINT) AS acc_ppm
      FROM ev JOIN pred p USING (cur)
      GROUP BY 1, 2 ORDER BY 1""")) { (spark, dir) =>
      val seq = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type").as("cur"),
          lead(col("event_type"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))).as("nxt"))
      val tr = seq.where(col("user_id") % 3 =!= 0 && col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("c"))
      // lexicographic argmin at max count: a struct extremum can't
      // invert string order, so two steps — max count per cur, then
      // the min label among transitions at that count
      val pred = tr
        .groupBy(col("cur")).agg(max(col("c")).as("cmax"))
        .join(tr, Seq("cur"))
        .where(col("c") === col("cmax"))
        .groupBy(col("cur")).agg(min(col("nxt")).as("predicted"))
      seq.where(col("user_id") % 3 === 0 && col("nxt").isNotNull)
        .join(broadcast(pred), "cur")
        .groupBy(col("cur"), col("predicted"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("nxt") === col("predicted"), 1L).otherwise(0L))
            .as("n_hit"))
        .select(col("cur"), col("predicted"), col("n_eval"), col("n_hit"),
          expr("n_hit * 1000000 div n_eval").as("acc_ppm"))
        .orderBy(col("cur"))
    },

    // ---- retrieval metrics: MRR@5 / DCG@5 / nDCG@5 in exact integers -------
    // The eval harness for the ANN family (p10/p11/p26/p76): rank the
    // corpus per query by scaled-integer dot product (the p103
    // convention — exact cross-engine), mark relevance by label match,
    // and score the top-5 with the standard retrieval metrics — all in
    // integer fixed point: MRR as 1000//first_rel_rank, DCG with the
    // per-position 1/log2(pos+1) discounts EMBEDDED as precomputed
    // milli-constants (1000, 631, 500, 431, 387 — the lc-table
    // discipline, no engine runs log), ideal DCG from the query's true
    // relevant count, nDCG in ppm. This is what turns "we built ANN"
    // into "we can MEASURE ranking quality" — the eval every recall
    // tradeoff (IVF probes, LSH tables, PQ bits) is judged against.
    //
    // Scale shape: the panel is 10 queries broadcast; dots are ONE
    // partial-agg pass (p103's shape); the per-query rank is panel-
    // bounded; metrics are conditional aggregates over top-5 rows.
    Q("p195_retrieval_metrics", Some("""
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      q AS (SELECT vec_id AS qid, j, ri AS qi FROM c WHERE vec_id < 10),
      d AS (SELECT q.qid, c.vec_id AS vid, sum(q.qi * c.ri) AS dot
            FROM c JOIN q ON q.j = c.j AND c.vec_id != q.qid GROUP BY 1, 2),
      l AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
      j2 AS (SELECT d.qid, d.vid, d.dot,
                    CASE WHEN vl.label = ql.label THEN 1 ELSE 0 END AS rel
             FROM d JOIN l ql ON ql.vec_id = d.qid
                    JOIN l vl ON vl.vec_id = d.vid),
      rc AS (SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel_total
             FROM j2 GROUP BY 1),
      r AS (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY dot DESC, vid) AS rk FROM j2),
      disc(pos, dm) AS (VALUES (1, 1000), (2, 631), (3, 500), (4, 431),
                               (5, 387)),
      t5 AS (SELECT r.qid, r.rel, r.rk, disc.dm
             FROM r JOIN disc ON disc.pos = r.rk WHERE r.rk <= 5),
      agg AS (SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel5,
                     CAST(max(CASE WHEN rel = 1 THEN 1000 // rk
                              ELSE 0 END) AS BIGINT) AS mrr_milli,
                     CAST(sum(rel * dm) AS BIGINT) AS dcg_milli
              FROM t5 GROUP BY 1),
      ideal AS (SELECT rc.qid, CAST(sum(disc.dm) AS BIGINT) AS idcg_milli
                FROM rc JOIN disc
                  ON disc.pos <= least(5, rc.n_rel_total)
                GROUP BY 1)
      SELECT a.qid AS query_id, a.n_rel5, a.n_rel5 > 0 AS hit5,
             a.mrr_milli, a.dcg_milli,
             coalesce(i.idcg_milli, 0) AS idcg_milli,
             CAST(CASE WHEN coalesce(i.idcg_milli, 0) = 0 THEN 0
                  ELSE a.dcg_milli * 1000000 // i.idcg_milli END
               AS BIGINT) AS ndcg_ppm
      FROM agg a LEFT JOIN ideal i ON i.qid = a.qid
      ORDER BY a.qid""")) { (spark, dir) =>
      import spark.implicits._
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val c = emb.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val q = c.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("j"), col("ri").as("qi"))
      val labels = emb.select(col("vec_id"), col("label").cast("long"))
      val j2 = c.join(broadcast(q), "j")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("qi") * col("ri")).as("dot"))
        .join(broadcast(labels.select(col("vec_id").as("qid"),
          col("label").as("qlabel"))), "qid")
        .join(labels.select(col("vec_id"), col("label").as("vlabel")),
          "vec_id")
        .withColumn("rel",
          when(col("vlabel") === col("qlabel"), 1L).otherwise(0L))
      val rc = j2.groupBy(col("qid")).agg(sum(col("rel")).as("n_rel_total"))
      val r = j2.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dot").desc,
          col("vec_id"))))
      val disc = Seq((1, 1000), (2, 631), (3, 500), (4, 431), (5, 387))
        .toDF("pos", "dm")
      val agg = r.where(col("rk") <= 5)
        .join(broadcast(disc), col("pos") === col("rk"))
        .groupBy(col("qid"))
        .agg(sum(col("rel")).as("n_rel5"),
          max(when(col("rel") === 1, expr("1000 div rk")).otherwise(0L))
            .cast("long").as("mrr_milli"),
          sum(col("rel") * col("dm")).as("dcg_milli"))
      val ideal = rc.join(broadcast(disc),
          col("pos") <= least(lit(5), col("n_rel_total")))
        .groupBy(col("qid")).agg(sum(col("dm")).cast("long")
          .as("idcg_milli"))
      agg.join(ideal, Seq("qid"), "left")
        .select(col("qid").as("query_id"), col("n_rel5"),
          (col("n_rel5") > 0).as("hit5"), col("mrr_milli"),
          col("dcg_milli"),
          coalesce(col("idcg_milli"), lit(0L)).as("idcg_milli"),
          when(coalesce(col("idcg_milli"), lit(0L)) === 0, 0L)
            .otherwise(expr("dcg_milli * 1000000 div idcg_milli"))
            .as("ndcg_ppm"))
        .orderBy(col("query_id"))
    },

    // ---- near-dup operating curve over Hamming thresholds ------------------
    // Parameter selection for the dedup gate WITHOUT re-running it per
    // setting: compute each banded candidate pair's exact Hamming
    // distance ONCE (widened capture ≤ 8), then read the whole
    // operating curve — pairs captured and docs touched at every
    // threshold 0..8 — off two bounded histograms (per-distance pair
    // counts; per-doc MIN distance). The curve is what picks p09's
    // production threshold: the knee where pairs explode is visible in
    // one query instead of nine reruns.
    //
    // Scale shape: one banded pair pass (the p09 machinery, wider
    // capture); the curve derives from histograms of size ≤ 9 and
    // ≤ docs — prefix sums over metadata, not re-scans.
    Q("p196_hamming_curve", Some {
      val pairs8 = Pipeline.simhashPairsCte.replace("<= 3", "<= 8")
      val th = (0 to 8).map(t => s"($t)").mkString(", ")
      s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      $pairs8,
      ph AS (SELECT hamming, CAST(count(*) AS BIGINT) AS np
             FROM spairs GROUP BY 1),
      nodes AS (SELECT a AS n, hamming FROM spairs
                UNION ALL SELECT b, hamming FROM spairs),
      nh AS (SELECT n, min(hamming) AS mh FROM nodes GROUP BY 1),
      nhh AS (SELECT mh, CAST(count(*) AS BIGINT) AS nn FROM nh GROUP BY 1),
      t(th) AS (VALUES $th)
      SELECT t.th,
             CAST(coalesce((SELECT sum(np) FROM ph WHERE hamming <= t.th),
               0) AS BIGINT) AS n_pairs,
             CAST(coalesce((SELECT sum(nn) FROM nhh WHERE mh <= t.th),
               0) AS BIGINT) AS n_docs
      FROM t ORDER BY t.th"""
    }) { (spark, dir) =>
      import spark.implicits._
      // the full ≤ 8 SharedStages capture — the curve is histogram
      // algebra over the shared materialized pair table
      val pairs = SharedStages.spairsWide(spark, dir, 8)
      val ph = pairs.groupBy(col("hamming")).agg(count(lit(1)).as("np"))
      val nh = pairs.select(col("a").as("n"), col("hamming"))
        .unionAll(pairs.select(col("b"), col("hamming")))
        .groupBy(col("n")).agg(min(col("hamming")).as("mh"))
        .groupBy(col("mh")).agg(count(lit(1)).as("nn"))
      val t = (0 to 8).toDF("th")
      t.join(broadcast(ph), col("hamming") <= col("th"), "left")
        .groupBy(col("th"))
        .agg(coalesce(sum(col("np")), lit(0L)).as("n_pairs"))
        .join(t.join(broadcast(nh), col("mh") <= col("th"), "left")
          .groupBy(col("th"))
          .agg(coalesce(sum(col("nn")), lit(0L)).as("n_docs")), "th")
        .orderBy(col("th"))
    },

    // ---- REAL TFRecord shard build + salvage walk --------------------------
    // TensorFlow's native training-shard format, with REAL CRC32C
    // (JDK Castagnoli + TF's bit-rotate-and-offset masking): per doc a
    // 2-record shard (sample text + metadata record) is framed by the
    // graft.functions.TfRecord kernel and immediately salvage-walked —
    // length-CRC, bounds, and data-CRC verify per record, the first
    // failure keeps the valid prefix (the p164 tar posture, applied to
    // the length-framed format where a single flipped bit is INVISIBLE
    // without the checksum — exactly why TFRecord frames carry them).
    // Planted failure modes by doc: mode 1 truncates mid-frame (bounds
    // check catches), mode 2 flips a data-CRC bit (checksum catches).
    // The oracle recomputes every count from frame ALGEBRA (16 bytes +
    // payload per record) — it never parses bytes, so the hash match
    // proves the walk's arithmetic.
    //
    // Scale shape: build + walk are codegen-stage byte work per row,
    // zero shuffle; the census is one doc-keyed projection.
    Q("p197_tfrecord_shards", Some("""
      WITH d AS (SELECT doc_id, doc_id % 3 AS mode,
                        CAST(length(text) AS BIGINT) AS l1,
                        CAST(length(concat('meta:', CAST(doc_id AS VARCHAR)))
                          AS BIGINT) AS l2
                 FROM documents)
      SELECT doc_id, CAST(mode AS BIGINT) AS mode,
             CAST(CASE WHEN mode = 0 THEN 2 ELSE 1 END AS BIGINT)
               AS n_records,
             CAST(CASE WHEN mode = 0 THEN l1 + l2 ELSE l1 END AS BIGINT)
               AS payload_bytes,
             CAST(CASE WHEN mode = 1 THEN 28 + l1
                  ELSE 32 + l1 + l2 END AS BIGINT) AS blob_bytes,
             mode = 0 AS clean
      FROM d ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.TfRecord
      val w = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 3).as("mode"),
          TfRecord.walk(TfRecord.build(col("text"),
            concat(lit("meta:"), col("doc_id").cast("string")),
            (col("doc_id") % 3).cast("int"))).as("w"))
      w.select(col("doc_id"), col("mode"),
          col("w.n_records").as("n_records"),
          col("w.payload_bytes").as("payload_bytes"),
          col("w.blob_bytes").as("blob_bytes"),
          col("w.clean").as("clean"))
        .orderBy(col("doc_id"))
    },

    // ---- late-interaction (MaxSim) retrieval -------------------------------
    // ColBERT's scoring re-expressed relationally: each 64-dim vector
    // is treated as FOUR 16-dim sub-vectors (the multi-vector document
    // representation); score(q, d) = Σ over query sub-vectors of the
    // MAX dot against any document sub-vector — the late-interaction
    // sum-of-maxes that beats single-vector cosine on partial matches
    // (one strong sub-match counts even when the rest disagree).
    // Scaled-integer dots (the p103 convention) keep both engines
    // exact; top-3 per query by (score, vec_id).
    //
    // Scale shape: sub-dots are ONE partial agg keyed (qid, did,
    // qsub, dsub) — a 16× bounded fan-out over the component join,
    // panel side broadcast; the max and the sum are two further
    // bounded aggs; the rank is panel-bounded. Never a per-pair UDF
    // loop, never a matrix on the driver.
    Q("p198_maxsim_retrieval", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, (i - 1) // 16 AS sub, (i - 1) % 16 AS off,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      q AS (SELECT vec_id AS qid, sub AS qsub, off, ri AS qi
            FROM c WHERE vec_id < 10),
      sd AS (SELECT q.qid, c.vec_id AS did, q.qsub, c.sub AS dsub,
                    CAST(sum(q.qi * c.ri) AS BIGINT) AS dot
             FROM c JOIN q ON q.off = c.off AND c.vec_id != q.qid
             GROUP BY 1, 2, 3, 4),
      mx AS (SELECT qid, did, qsub, max(dot) AS m FROM sd
             GROUP BY 1, 2, 3),
      sc AS (SELECT qid, did, CAST(sum(m) AS BIGINT) AS maxsim FROM mx
             GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY maxsim DESC, did) AS rk FROM sc)
      SELECT qid AS query_id, CAST(rk AS BIGINT) AS rk, did AS vec_id,
             maxsim
      FROM r WHERE rk <= 3 ORDER BY query_id, rk""")) { (spark, dir) =>
      val c = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
        .select(col("vec_id"), expr("i div 16").as("sub"),
          (col("i") % 16).as("off"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val q = c.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("sub").as("qsub"),
          col("off"), col("ri").as("qi"))
      val sc = c.join(broadcast(q), "off")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id"), col("qsub"), col("sub"))
        .agg(sum(col("qi") * col("ri")).as("dot"))
        .groupBy(col("qid"), col("vec_id"), col("qsub"))
        .agg(max(col("dot")).as("m"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("m")).as("maxsim"))
      sc.withColumn("rk", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("maxsim").desc, col("vec_id"))))
        .where(col("rk") <= 3)
        .select(col("qid").as("query_id"), col("rk").cast("long").as("rk"),
          col("vec_id"), col("maxsim"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- near-dup pair evidence (dedup explainability) ---------------------
    // WHY did the gate pair these two docs? For every banded near-dup
    // pair, the shared-shingle evidence: how many 3-gram shingles the
    // two sides share, and the RAREST shared shingle (minimum corpus
    // df, ties → lexicographic) with its df — the single strongest
    // piece of evidence a reviewer reads first. Rare shared shingles
    // indicate genuine duplication; evidence limited to high-df
    // shingles marks boilerplate-driven pairs the p176 rewrite would
    // dissolve. The audit trail deduplication needs before anyone
    // deletes 100 TB of "duplicates".
    //
    // Scale shape: pairs come from the SharedStages materialized
    // table; the shingle inverted index is one pass + a df agg; the
    // evidence join is pair-keyed through the index (bounded by doc
    // shingle counts), and the argmin is a conditional struct
    // extremum — no window, no all-pairs.
    Q("p199_pair_evidence", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      sh AS (SELECT doc_id, unnest(list_distinct(
               ${TextSql.shingles(wsSql, 3)})) AS s FROM documents),
      df AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1),
      ev AS (SELECT p.a, p.b, sh1.s, df.df
             FROM spairs p
             JOIN sh sh1 ON sh1.doc_id = p.a
             JOIN sh sh2 ON sh2.doc_id = p.b AND sh2.s = sh1.s
             JOIN df ON df.s = sh1.s),
      ev2 AS (SELECT *, row_number() OVER (PARTITION BY a, b
                        ORDER BY df, s) AS rn FROM ev),
      agg AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_shared
              FROM ev GROUP BY 1, 2)
      SELECT agg.a, agg.b, agg.n_shared, e.s AS rare_shingle,
             CAST(e.df AS BIGINT) AS rare_df
      FROM agg JOIN ev2 e ON e.a = agg.a AND e.b = agg.b AND e.rn = 1
      ORDER BY 1, 2""")) { (spark, dir) =>
      // r20: materialized once — the shingle explosion fed THREE
      // differently-keyed shuffles (a-side join, (b,s)-side join, the
      // df aggregate), so the tokenize+shingle kernel ran three times;
      // one checkpoint runs it once
      val sh = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextOps.shingles(col("text"), 3)))
            .as("s"))
        .localCheckpoint()
      val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val pairs = SharedStages.spairs(spark, dir)
        .select(col("a"), col("b"))
      val ev = pairs
        .join(sh.select(col("doc_id").as("a"), col("s")), "a")
        .join(sh.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
        .join(df, "s")
      ev.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_shared"),
          min(struct(col("df"), col("s"))).as("m"))
        .select(col("a"), col("b"), col("n_shared"),
          col("m.s").as("rare_shingle"), col("m.df").as("rare_df"))
        .orderBy(col("a"), col("b"))
    },

    // ---- reproducible epoch shuffle + permutation distance -----------------
    // Training-data shuffling without an RNG: epoch e's order is the
    // rank of h60('e:' || doc_id) — bit-reproducible on any engine,
    // different per epoch, and rerunnable mid-training after a crash
    // (THE reason hash-ordered shuffles beat seeded Fisher–Yates in a
    // distributed loader: no state to checkpoint, any worker can
    // compute any slice). The census: the first-3 head of each
    // epoch's order (the spot check), plus Spearman's footrule
    // Σ|rank₀ − rank₁| and the max displacement between the two
    // epochs — the exact integer evidence that consecutive epochs are
    // genuinely decorrelated, not just rotated.
    //
    // Scale shape: ranks are the documented total-order statistics
    // shape (production: range-partition by the hash — the hash IS
    // uniform, so ranges balance by construction); the distance
    // metrics are one join on doc_id + one 1-row agg.
    Q("p200_epoch_shuffle", Some(s"""
      WITH r0 AS (SELECT doc_id, row_number() OVER (ORDER BY
                    ${Portable.h60Sql("concat('0:', CAST(doc_id AS VARCHAR))")},
                    doc_id) AS rk FROM documents),
      r1 AS (SELECT doc_id, row_number() OVER (ORDER BY
                    ${Portable.h60Sql("concat('1:', CAST(doc_id AS VARCHAR))")},
                    doc_id) AS rk FROM documents),
      j AS (SELECT r0.doc_id, r0.rk AS k0, r1.rk AS k1
            FROM r0 JOIN r1 USING (doc_id)),
      h0 AS (SELECT string_agg(CAST(doc_id AS VARCHAR), ','
               ORDER BY rk) AS h FROM r0 WHERE rk <= 3),
      h1 AS (SELECT string_agg(CAST(doc_id AS VARCHAR), ','
               ORDER BY rk) AS h FROM r1 WHERE rk <= 3)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(abs(k0 - k1)) AS BIGINT) AS footrule,
             CAST(max(abs(k0 - k1)) AS BIGINT) AS max_disp,
             (SELECT h FROM h0) AS head_epoch0,
             (SELECT h FROM h1) AS head_epoch1
      FROM j""")) { (spark, dir) =>
      val docs = Tables.load(spark, dir, "documents").select(col("doc_id"))
      def ranked(e: Int) = docs.withColumn("rk",
        row_number().over(Window.orderBy(
          Portable.h60(concat(lit(s"$e:"), col("doc_id").cast("string"))),
          col("doc_id"))))
      val r0 = ranked(0)
      val r1 = ranked(1)
      def head(r: org.apache.spark.sql.DataFrame) = r.where(col("rk") <= 3)
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rk"), col("doc_id")))),
          x => x.getField("doc_id").cast("string")), ",").as("h"))
      val j = r0.select(col("doc_id"), col("rk").as("k0"))
        .join(r1.select(col("doc_id"), col("rk").as("k1")), "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(abs(col("k0") - col("k1"))).cast("long").as("footrule"),
          max(abs(col("k0") - col("k1"))).cast("long").as("max_disp"))
      j.crossJoin(head(r0).select(col("h").as("head_epoch0")))
        .crossJoin(head(r1).select(col("h").as("head_epoch1")))
    },

    // ---- cluster medoid selection (most-central representative) ------------
    // p68 keeps the highest-QUALITY member of each near-dup cluster;
    // this entry keeps the most CENTRAL one — the medoid, the member
    // minimizing summed Hamming distance to its in-cluster pair
    // neighbors (ties → smaller id). Quality-survivor answers "which
    // copy is best written"; the medoid answers "which copy is the
    // canonical variant the others drifted from" — the right
    // representative when the cluster is one template with noisy
    // edits. Mean intra-pair distance (milli) per cluster is the
    // tightness diagnostic that separates true families from chains.
    //
    // Scale shape: pairs and labels come from the SharedStages
    // materialized tables; per-node distance sums are one union +
    // rollup over the BOUNDED pair list; the medoid is a conditional
    // struct extremum per cluster. Nothing rescans the corpus.
    Q("p201_cluster_medoid", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      ${Pipeline.clusterLabelsCte},
      pc AS (SELECT p.a, p.b, p.hamming, l.cluster_id
             FROM spairs p JOIN lbl l ON l.n = p.a),
      nodes AS (SELECT cluster_id, a AS n, hamming FROM pc
                UNION ALL SELECT cluster_id, b, hamming FROM pc),
      ns AS (SELECT cluster_id, n, CAST(sum(hamming) AS BIGINT) AS sh
             FROM nodes GROUP BY 1, 2),
      med AS (SELECT cluster_id, n AS medoid FROM
                (SELECT *, row_number() OVER (PARTITION BY cluster_id
                   ORDER BY sh, n) AS rn FROM ns)
              WHERE rn = 1),
      cs AS (SELECT cluster_id, CAST(count(DISTINCT n) AS BIGINT)
                      AS n_members
             FROM nodes GROUP BY 1),
      ps AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_pairs,
                    CAST(sum(hamming) AS BIGINT) AS sum_h
             FROM pc GROUP BY 1)
      SELECT cs.cluster_id, cs.n_members, med.medoid,
             ps.n_pairs,
             CAST(ps.sum_h * 1000 // ps.n_pairs AS BIGINT)
               AS mean_hamming_milli
      FROM cs JOIN med USING (cluster_id) JOIN ps USING (cluster_id)
      ORDER BY cs.cluster_id""")) { (spark, dir) =>
      val labels = SharedStages.labels(spark, dir)
      val pc = SharedStages.spairs(spark, dir)
        .join(labels.select(col("doc_id").as("a"), col("cluster_id")), "a")
      val nodes = pc.select(col("cluster_id"), col("a").as("n"),
          col("hamming"))
        .unionAll(pc.select(col("cluster_id"), col("b"), col("hamming")))
      val med = nodes.groupBy(col("cluster_id"), col("n"))
        .agg(sum(col("hamming")).as("sh"))
        .groupBy(col("cluster_id"))
        .agg(min(struct(col("sh"), col("n"))).as("m"))
        .select(col("cluster_id"), col("m.n").as("medoid"))
      val cs = nodes.groupBy(col("cluster_id"))
        .agg(countDistinct(col("n")).as("n_members"))
      val ps = pc.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("hamming")).as("sum_h"))
      cs.join(med, "cluster_id").join(ps, "cluster_id")
        .select(col("cluster_id"), col("n_members"), col("medoid"),
          col("n_pairs"),
          expr("sum_h * 1000 div n_pairs").as("mean_hamming_milli"))
        .orderBy(col("cluster_id"))
    },

    // ---- context-window truncation policy evaluation -----------------------
    // Which truncation strategy loses the least information when docs
    // exceed a 128-token context: HEAD (keep first 128), TAIL (keep
    // last 128), or MIDDLE-DROP (keep first+last 64 — the
    // lost-in-the-middle mitigation)? Information loss is IDF-
    // weighted: each occurrence carries 1e6//df integer information
    // value (rare tokens carry document identity; common tokens are
    // recoverable from context). One pass over token positions scores
    // all three policies: per policy, docs truncated, tokens dropped,
    // information dropped, and the loss in ppm of the corpus
    // information total — the number that picks the default
    // truncation for a training pipeline.
    //
    // Scale shape: positions come from the existing token explode;
    // the ×3 policy fan-out is a bounded literal explode; rarity is
    // one df agg joined back; everything rolls up map-side.
    Q("p202_truncation_policies", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      t AS (SELECT doc_id, len(ws) AS n,
                   unnest(generate_series(1, len(ws))) AS pos,
                   unnest(ws) AS tok FROM w),
      df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY 1),
      r AS (SELECT t.doc_id, t.n, t.pos, t.tok,
                   1000000 // df.df AS iv
            FROM t JOIN df USING (tok)),
      tot AS (SELECT CAST(sum(iv) AS BIGINT) AS info_total FROM r),
      pol AS (SELECT * FROM (VALUES ('head'), ('mid'), ('tail')) p(policy)),
      k AS (SELECT r.*, pol.policy,
                   CASE pol.policy
                     WHEN 'head' THEN r.pos <= 128
                     WHEN 'tail' THEN r.pos > r.n - 128
                     ELSE r.pos <= 64 OR r.pos > r.n - 64
                   END AS kept
            FROM r, pol)
      SELECT k.policy,
             CAST(count(DISTINCT CASE WHEN NOT kept THEN doc_id END)
               AS BIGINT) AS n_docs_cut,
             CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT)
               AS tokens_dropped,
             CAST(sum(CASE WHEN NOT kept THEN iv ELSE 0 END) AS BIGINT)
               AS info_dropped,
             CAST(sum(CASE WHEN NOT kept THEN iv ELSE 0 END) * 1000000
               // (SELECT info_total FROM tot) AS BIGINT)
               AS info_lost_ppm
      FROM k GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val t = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n"),
          posexplode(col("ws")).as(Seq("p0", "tok")))
        .withColumn("pos", col("p0") + 1)
      val df = t.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val r = t.join(df, "tok")
        .withColumn("iv", expr("1000000 div df"))
      val tot = r.agg(sum(col("iv")).as("info_total"))
      val k = r.withColumn("policy",
          explode(lit(Array("head", "mid", "tail"))))
        .withColumn("kept",
          when(col("policy") === "head", col("pos") <= 128)
            .when(col("policy") === "tail", col("pos") > col("n") - 128)
            .otherwise(col("pos") <= 64 || col("pos") > col("n") - 64))
      k.crossJoin(broadcast(tot))
        .groupBy(col("policy"), col("info_total"))
        .agg(
          countDistinct(when(!col("kept"), col("doc_id"))).as("n_docs_cut"),
          sum(when(!col("kept"), 1L).otherwise(0L)).as("tokens_dropped"),
          sum(when(!col("kept"), col("iv")).otherwise(0L))
            .as("info_dropped"))
        .select(col("policy"), col("n_docs_cut"), col("tokens_dropped"),
          col("info_dropped"),
          expr("info_dropped * 1000000 div info_total").as("info_lost_ppm"))
        .orderBy(col("policy"))
    },

    // ---- balanced range-partition splitter design --------------------------
    // The custom-range-partitioner boundary table: split the corpus
    // into 8 doc_id ranges carrying (as close as integer arithmetic
    // allows) EQUAL token mass — the layout that makes a downstream
    // per-range scan embarrassingly parallel even when document sizes
    // skew. Assignment is the exact weighted rule part =
    // (cum − 1)·8 // W over the doc_id-ordered mass prefix; output
    // per partition: its doc_id range, doc count, mass, and the
    // signed skew vs the ideal W/8 in ppm — the table a writer feeds
    // to repartitionByRange (and the proof the boundaries balance).
    //
    // Scale shape: the mass prefix is the documented total-order
    // statistics shape (production: two-phase per-bucket partials
    // like p135/p168 — or a sampled sketch, of which this is the
    // exact form); the census is an 8-row rollup.
    Q("p203_range_splitters", Some(s"""
      WITH d AS (SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS w
                 FROM documents),
      n AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM d),
      c AS (SELECT doc_id, w, sum(w) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum FROM d),
      p AS (SELECT doc_id, w,
                   CAST(CASE WHEN cum = 0 THEN 0
                        ELSE (cum - 1) * 8 // (SELECT tw FROM n) END
                     AS BIGINT) AS part
            FROM c)
      SELECT part, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(doc_id) AS BIGINT) AS lo,
             CAST(max(doc_id) AS BIGINT) AS hi,
             CAST(sum(w) AS BIGINT) AS mass,
             CAST(CASE WHEN sum(w) >= (SELECT tw FROM n) // 8
                  THEN (sum(w) - (SELECT tw FROM n) // 8) * 1000000
                       // ((SELECT tw FROM n) // 8)
                  ELSE -(((SELECT tw FROM n) // 8 - sum(w)) * 1000000
                       // ((SELECT tw FROM n) // 8)) END AS BIGINT)
               AS skew_ppm
      FROM p GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("w"))
      val n = d.agg(sum(col("w")).as("tw"))
      val c = d.withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      c.crossJoin(broadcast(n))
        .withColumn("part", when(col("cum") === 0, 0L)
          .otherwise(expr("(cum - 1) * 8 div tw")))
        .groupBy(col("part"), col("tw"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("lo"),
          max(col("doc_id")).as("hi"), sum(col("w")).as("mass"))
        .select(col("part"), col("n_docs"), col("lo"), col("hi"),
          col("mass"),
          when(col("mass") >= expr("tw div 8"),
            expr("(mass - tw div 8) * 1000000 div (tw div 8)"))
            .otherwise(-expr("(tw div 8 - mass) * 1000000 div (tw div 8)"))
            .as("skew_ppm"))
        .orderBy(col("part"))
    },

    // ---- dataset card (per-source corpus summary) --------------------------
    // The one-query dataset card: per source, the numbers a data
    // sheet publishes — document and token volume, language count,
    // the mean quality score in exact integer micros (summing
    // per-doc micro-ints keeps the mean order-independent; averaging
    // raw doubles would be partitioning-dependent), and the near-dup
    // exposure: how many of the source's docs sit in the corpus pair
    // graph, in ppm. The join of the curation facets (p01 quality,
    // p02 langs, p09 pairs) into the table a consumer reads FIRST.
    //
    // Scale shape: one doc-keyed pass for the per-doc facts; dup
    // membership is a semi-join against the SharedStages pair-graph
    // node list (no CC needed — membership IS being in a pair); the
    // card is a per-source rollup of bounded width.
    Q("p204_dataset_card", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      dup AS (SELECT DISTINCT n FROM
                (SELECT a AS n FROM spairs UNION ALL SELECT b FROM spairs)),
      d AS (SELECT doc_id, source, lang,
                   CAST(len($wsSql) AS BIGINT) AS toks,
                   CAST(round(${TextSql.quality(wsSql)} * 1000000)
                     AS BIGINT) AS qmicro,
                   CASE WHEN doc_id IN (SELECT n FROM dup)
                        THEN 1 ELSE 0 END AS is_dup
            FROM documents)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(qmicro) // count(*) AS BIGINT)
               AS mean_quality_micro,
             CAST(sum(is_dup) AS BIGINT) AS dup_docs,
             CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT)
               AS dup_ppm
      FROM d GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import graft.ops.TextOps
      val sp = SharedStages.spairs(spark, dir)
      val dup = sp.select(col("a").as("doc_id"))
        .unionAll(sp.select(col("b"))).distinct()
        .withColumn("is_dup", lit(1L))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("toks"),
          round(TextOps.qualityScore(col("text")) * 1000000, 0)
            .cast("long").as("qmicro"))
        .join(dup, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          expr("sum(qmicro) div count(1)").as("mean_quality_micro"),
          sum(col("is_dup")).as("dup_docs"),
          expr("sum(is_dup) * 1000000 div count(1)").as("dup_ppm"))
        .orderBy(col("source"))
    },

    // ---- integer Zipf fit over the token frequency spectrum ----------------
    // Does the corpus look like natural language? Zipf's law says
    // log(freq) falls linearly in log(rank) with slope ≈ −1; a
    // synthetic or template-heavy corpus bends away from it. The fit
    // is EXACT integer least squares over (floor(log2 rank),
    // floor(log2 freq)) — the p161 length(bin(x))−1 kernel supplies
    // both logs, the slope comes out in sign-split milli units (no
    // engine runs a float regression), and the spectrum head
    // (top token + its count) anchors the curve. The corpus-level
    // smoke alarm for generator drift in synthetic-data pipelines.
    //
    // Scale shape: the frequency table is one map-side agg; the rank
    // is a window over the VOCABULARY (the documented total-order
    // stats shape — Heaps' law keeps the vocab sublinear in corpus
    // size); the regression is a 1-row sum rollup.
    Q("p205_zipf_fit", Some(s"""
      WITH t AS (SELECT unnest($wsSql) AS tok FROM documents),
      f AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
      r AS (SELECT tok, c,
                   row_number() OVER (ORDER BY c DESC, tok) AS rk FROM f),
      xy AS (SELECT length(bin(rk)) - 1 AS x, length(bin(c)) - 1 AS y,
                    tok, c, rk FROM r),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   min(CASE WHEN rk = 1 THEN tok END) AS top_token,
                   CAST(max(CASE WHEN rk = 1 THEN c END) AS BIGINT)
                     AS top_freq
            FROM xy)
      SELECT n AS vocab, n_tokens, top_token, top_freq,
             CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                  WHEN n * sxy - sx * sy >= 0
                  THEN (n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx)
                  ELSE -((sx * sy - n * sxy) * 1000
                         // (n * sxx - sx * sx)) END AS BIGINT)
               AS slope_milli
      FROM s""")) { (spark, dir) =>
      val f = Tables.loadSpread(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val r = f.withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("tok"))))
      val xy = r.select((length(bin(col("rk"))) - 1).cast("long").as("x"),
        (length(bin(col("c"))) - 1).cast("long").as("y"),
        col("tok"), col("c"), col("rk"))
      xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("c")).as("n_tokens"),
          min(when(col("rk") === 1, col("tok"))).as("top_token"),
          max(when(col("rk") === 1, col("c"))).as("top_freq"))
        .select(col("n").as("vocab"), col("n_tokens"), col("top_token"),
          col("top_freq"),
          when(expr("n * sxx - sx * sx") === 0, 0L)
            .when(expr("n * sxy - sx * sy") >= 0,
              expr("(n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)"))
            .otherwise(-expr(
              "(sx * sy - n * sxy) * 1000 div (n * sxx - sx * sx)"))
            .as("slope_milli"))
    },

    // ---- KV prefix-cache sharing analysis ----------------------------------
    // How much serving/training compute would a prefix cache save?
    // For prefix lengths k ∈ {2, 4, 8, 16}, group documents by the
    // hash of their FIRST k tokens: groups with ≥ 2 members share a
    // KV-cache prefix, and every member past the first saves k
    // tokens of prefill. Per k: shared-prefix groups, docs covered,
    // and total tokens saved — the curve that decides whether
    // template-heavy corpora justify prefix-cache infrastructure
    // (and, inverted, a template-detection signal: high sharing at
    // k=16 means boilerplate openings the p176 rewrite should see).
    //
    // Scale shape: one token pass; the ×4 prefix fan-out is a
    // bounded literal explode over array slices (row-local); each k
    // is a key-grouped count — map-side combining, output is 4 rows.
    Q("p206_prefix_cache", Some {
      val ks = Seq(2, 4, 8, 16)
      val per = ks.map(k => s"""
        SELECT $k AS k, ${Portable.h60Sql(
          s"array_to_string(w[1:$k], ' ')")} AS pk
        FROM ws WHERE len(w) >= $k""").mkString(" UNION ALL ")
      s"""
      WITH ws AS (SELECT doc_id, $wsSql AS w FROM documents),
      pre AS ($per),
      g AS (SELECT k, pk, CAST(count(*) AS BIGINT) AS cnt
            FROM pre GROUP BY 1, 2),
      sh AS (SELECT k, CAST(count(*) AS BIGINT) AS n_shared_groups,
                    CAST(sum(cnt) AS BIGINT) AS docs_in_shared,
                    CAST(sum((cnt - 1) * k) AS BIGINT) AS tokens_saved
             FROM g WHERE cnt >= 2 GROUP BY 1)
      SELECT t.k, coalesce(sh.n_shared_groups, 0) AS n_shared_groups,
             coalesce(sh.docs_in_shared, 0) AS docs_in_shared,
             coalesce(sh.tokens_saved, 0) AS tokens_saved
      FROM (VALUES (2), (4), (8), (16)) t(k)
      LEFT JOIN sh ON sh.k = t.k
      ORDER BY t.k"""
    }) { (spark, dir) =>
      import spark.implicits._
      val ws = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      val pre = ws
        .withColumn("k", explode(lit(Array(2, 4, 8, 16))))
        .where(size(col("w")) >= col("k"))
        .select(col("k"),
          Portable.h60(array_join(slice(col("w"), lit(1), col("k")), " "))
            .as("pk"))
      val sh = pre.groupBy(col("k"), col("pk"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 2)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_shared_groups"),
          sum(col("cnt")).as("docs_in_shared"),
          sum((col("cnt") - 1) * col("k")).as("tokens_saved"))
      Seq(2, 4, 8, 16).toDF("k")
        .join(sh, Seq("k"), "left")
        .select(col("k"),
          coalesce(col("n_shared_groups"), lit(0L)).as("n_shared_groups"),
          coalesce(col("docs_in_shared"), lit(0L)).as("docs_in_shared"),
          coalesce(col("tokens_saved"), lit(0L)).as("tokens_saved"))
        .orderBy(col("k"))
    },

    // ---- curriculum mixing schedule (uniform → quality annealing) ----------
    // The 4-epoch data-mixing plan: epoch 0 samples sources UNIFORMLY
    // (exploration), epoch 3 proportional to QUALITY MASS (the p204
    // per-source quality micros), epochs between interpolate linearly
    // — the curriculum annealing a trainer follows from broad
    // coverage to concentrated quality. Each epoch's 10000-sample
    // budget is apportioned by p170's largest-remainder rule
    // (ties → source asc), so per-epoch allocations sum to EXACTLY
    // the budget — the invariant naive per-source rounding breaks.
    //
    // Scale shape: the per-source quality mass is one rollup; the
    // schedule math runs entirely on the S×4 metadata grid (windows
    // partitioned per epoch over S rows).
    Q("p208_curriculum_mixing", Some(s"""
      WITH q AS (SELECT source,
                   CAST(sum(round(${TextSql.quality(wsSql)} * 1000000))
                     AS BIGINT) AS qm
            FROM documents GROUP BY 1),
      t AS (SELECT CAST(sum(qm) AS BIGINT) AS tq,
                   CAST(count(*) AS BIGINT) AS s FROM q),
      w AS (SELECT q.source, e.e,
                   (3 - e.e) * (t.tq // t.s) + e.e * q.qm AS wt
            FROM q, t, (VALUES (0), (1), (2), (3)) e(e)),
      tw AS (SELECT e, CAST(sum(wt) AS BIGINT) AS sw FROM w GROUP BY 1),
      f AS (SELECT w.source, w.e, w.wt, tw.sw,
                   10000 * w.wt // tw.sw AS fl,
                   10000 * w.wt % tw.sw AS rem
            FROM w JOIN tw USING (e)),
      r AS (SELECT *, row_number() OVER (PARTITION BY e
                        ORDER BY rem DESC, source) AS rk,
                   10000 - sum(fl) OVER (PARTITION BY e) AS left_seats
            FROM f)
      SELECT CAST(e AS BIGINT) AS epoch, source,
             CAST(fl + CASE WHEN rk <= left_seats THEN 1 ELSE 0 END
               AS BIGINT) AS alloc
      FROM r ORDER BY epoch, source""")) { (spark, dir) =>
      import spark.implicits._
      import graft.ops.TextOps
      val q = Tables.loadSpread(spark, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(round(TextOps.qualityScore(col("text")) * 1000000, 0))
          .cast("long").as("qm"))
      val t = q.agg(sum(col("qm")).as("tq"), count(lit(1)).as("s"))
      val w = q.crossJoin(broadcast(t))
        .crossJoin(broadcast(Seq(0, 1, 2, 3).toDF("e")))
        .withColumn("wt",
          (lit(3) - col("e")) * expr("tq div s") + col("e") * col("qm"))
      val we = Window.partitionBy(col("e"))
      val r = w
        .withColumn("sw", sum(col("wt")).over(we))
        .withColumn("fl", expr("10000 * wt div sw"))
        .withColumn("rem", expr("10000 * wt % sw"))
        .withColumn("rk", row_number().over(
          we.orderBy(col("rem").desc, col("source"))))
        .withColumn("left_seats", lit(10000) - sum(col("fl")).over(we))
      r.select(col("e").cast("long").as("epoch"), col("source"),
          (col("fl") + when(col("rk") <= col("left_seats"), 1L)
            .otherwise(0L)).as("alloc"))
        .orderBy(col("epoch"), col("source"))
    },

    // ---- cluster template mining (segments shared by ALL members) ----------
    // What do a near-dup cluster's members have in COMMON? The
    // template: 8-token segments present in every member — the
    // boilerplate skeleton the variants were stamped from. Per
    // cluster: member count, distinct segments seen, and how many are
    // template (all-member) segments — full-template clusters are
    // byte-twins, zero-template clusters are hash-collision chains
    // worth re-reviewing. The cluster-level complement of p176's
    // corpus-level segment df (and the evidence p199 summarizes
    // per pair, lifted to the cluster).
    //
    // Scale shape: labels from SharedStages; one segment explode over
    // MEMBER docs only (semi-join prunes the corpus scan); the
    // all-member test is a (cluster, segment)-keyed distinct count
    // compared to the cluster size — bounded rollups throughout.
    Q("p209_template_mining", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      ${Pipeline.clusterLabelsCte},
      cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
             FROM lbl GROUP BY 1),
      seg AS (SELECT l.cluster_id, d.doc_id, unnest(list_distinct(
                ${TextSql.segments(wsSql, 8)})) AS seg
              FROM documents d JOIN lbl l ON l.n = d.doc_id),
      sc AS (SELECT cluster_id, seg,
                    CAST(count(DISTINCT doc_id) AS BIGINT) AS mc
             FROM seg GROUP BY 1, 2),
      agg AS (SELECT sc.cluster_id,
                     CAST(count(*) AS BIGINT) AS n_distinct_segs,
                     CAST(sum(CASE WHEN sc.mc = cs.n_members
                          THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_template_segs
              FROM sc JOIN cs USING (cluster_id) GROUP BY 1)
      SELECT cs.cluster_id, cs.n_members,
             coalesce(a.n_distinct_segs, 0) AS n_distinct_segs,
             coalesce(a.n_template_segs, 0) AS n_template_segs
      FROM cs LEFT JOIN agg a ON a.cluster_id = cs.cluster_id
      ORDER BY cs.cluster_id""")) { (spark, dir) =>
      val labels = SharedStages.labels(spark, dir)
      val cs = labels.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      val seg = Tables.loadSpread(spark, dir, "documents")
        .join(labels, "doc_id")
        .select(col("cluster_id"), col("doc_id"),
          explode(array_distinct(TextOps.segments(col("text"), SegN)))
            .as("seg"))
      val sc = seg.groupBy(col("cluster_id"), col("seg"))
        .agg(countDistinct(col("doc_id")).as("mc"))
      val agg = sc.join(cs, "cluster_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_distinct_segs"),
          sum(when(col("mc") === col("n_members"), 1L).otherwise(0L))
            .as("n_template_segs"))
      cs.join(agg, Seq("cluster_id"), "left")
        .select(col("cluster_id"), col("n_members"),
          coalesce(col("n_distinct_segs"), lit(0L)).as("n_distinct_segs"),
          coalesce(col("n_template_segs"), lit(0L)).as("n_template_segs"))
        .orderBy(col("cluster_id"))
    },

    // ---- truncated harmonic centrality (radius 3, bounded adjacency) -------
    // Which docs sit at the CENTER of the near-dup graph? Harmonic
    // centrality Σ 1/d, truncated at radius 3 (milli weights
    // 1000/500/333 — lc-table discipline). Near-dup graphs contain
    // near-CLIQUES (banded buckets), where materializing exact 2- and
    // 3-balls is quadratic in clique size — measured: 0.8 s → 21 s
    // under 10× data. So expansion runs over a BOUNDED adjacency: per
    // node, only the 64 smallest neighbor ids expand (deterministic,
    // mirrored bit-for-bit in the oracle via the same row_number cap;
    // the no-silent-caps discipline — d1 is still the EXACT degree,
    // d2/d3 are the bounded-expansion counts). Per-node candidate
    // work is ≤ 64² per round, independent of hub size — the
    // difference between a diagnostic that survives 100× and one
    // that melts on the first big cluster.
    //
    // Scale shape: three edge-keyed joins over the capped adjacency
    // with distinct + anti-join between rounds (the p116 bounded-
    // unrolling pattern); per-node rollups; every intermediate is
    // O(nodes × 64²) worst case.
    Q("p210_harmonic_centrality", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      e AS (SELECT a AS u, b AS v FROM spairs
            UNION SELECT b, a FROM spairs),
      f AS (SELECT u, v FROM e
            QUALIFY row_number() OVER (PARTITION BY u ORDER BY v) <= 64),
      h2 AS (SELECT DISTINCT a.u, b.v FROM f a JOIN f b ON b.u = a.v
             WHERE b.v <> a.u
               AND NOT EXISTS (SELECT 1 FROM e x
                               WHERE x.u = a.u AND x.v = b.v)),
      h2c AS (SELECT u, v FROM h2
              QUALIFY row_number() OVER (PARTITION BY u ORDER BY v) <= 64),
      h3 AS (SELECT DISTINCT a.u, b.v FROM h2c a JOIN f b ON b.u = a.v
             WHERE b.v <> a.u
               AND NOT EXISTS (SELECT 1 FROM e x
                               WHERE x.u = a.u AND x.v = b.v)
               AND NOT EXISTS (SELECT 1 FROM h2 y
                               WHERE y.u = a.u AND y.v = b.v)),
      c1 AS (SELECT u, CAST(count(*) AS BIGINT) AS d1 FROM e GROUP BY 1),
      c2 AS (SELECT u, CAST(count(*) AS BIGINT) AS d2 FROM h2 GROUP BY 1),
      c3 AS (SELECT u, CAST(count(*) AS BIGINT) AS d3 FROM h3 GROUP BY 1)
      SELECT c1.u AS doc_id, c1.d1,
             coalesce(c2.d2, 0) AS d2, coalesce(c3.d3, 0) AS d3,
             CAST(c1.d1 * 1000 + coalesce(c2.d2, 0) * 500
               + coalesce(c3.d3, 0) * 333 AS BIGINT) AS harmonic_milli
      FROM c1 LEFT JOIN c2 ON c2.u = c1.u LEFT JOIN c3 ON c3.u = c1.u
      ORDER BY doc_id""")) { (spark, dir) =>
      val sp = SharedStages.spairs(spark, dir)
      val e = sp.select(col("a").as("u"), col("b").as("v"))
        .unionAll(sp.select(col("b"), col("a"))).distinct()
        .localCheckpoint()
      def cap(h: org.apache.spark.sql.DataFrame) = h
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("u")).orderBy(col("v"))))
        .where(col("rn") <= 64).drop("rn")
      val f = cap(e).localCheckpoint()
      def expand(h: org.apache.spark.sql.DataFrame) = h.select(col("u"),
          col("v").as("m"))
        .join(f.select(col("u").as("m"), col("v").as("w")), "m")
        .where(col("w") =!= col("u"))
        .select(col("u"), col("w").as("v")).distinct()
      val h2 = expand(f).join(e, Seq("u", "v"), "left_anti")
        .localCheckpoint()
      val h3 = expand(cap(h2)).join(e, Seq("u", "v"), "left_anti")
        .join(h2, Seq("u", "v"), "left_anti")
      def cnt(h: org.apache.spark.sql.DataFrame, nm: String) =
        h.groupBy(col("u")).agg(count(lit(1)).as(nm))
      cnt(e, "d1")
        .join(cnt(h2, "d2"), Seq("u"), "left")
        .join(cnt(h3, "d3"), Seq("u"), "left")
        .select(col("u").as("doc_id"), col("d1"),
          coalesce(col("d2"), lit(0L)).as("d2"),
          coalesce(col("d3"), lit(0L)).as("d3"),
          (col("d1") * 1000 + coalesce(col("d2"), lit(0L)) * 500
            + coalesce(col("d3"), lit(0L)) * 333).as("harmonic_milli"))
        .orderBy(col("doc_id"))
    },

    // ---- CDC chunking parameter sweep --------------------------------------
    // The p196 one-pass-operating-curve pattern applied to
    // content-defined chunking: boundary modulus ∈ {16, 64, 256}
    // trades chunk granularity (small chunks → more dedup, more
    // per-chunk overhead) against index size. Per modulus, over the
    // p91 ad-footer corpus: chunk count, distinct chunks, mean chunk
    // length (milli), and the duplicated-byte fraction — the curve
    // that picks the production modulus from ONE query. Each doc is
    // chunked three times by the same codegen kernel (row-local);
    // nothing else triples.
    //
    // Scale shape: three kernel calls in the scan stage; per-modulus
    // chunk-keyed rollups; 3-row output.
    Q("p211_cdc_param_sweep", Some {
      def per(m: Int): String = s"""
        SELECT $m AS modulus, doc_id, chunk FROM (
          SELECT doc_id,
                 unnest([substr(payload, CAST(pos[k] + 1 AS INT),
                                CAST(pos[k+1] - pos[k] AS INT))
                         for k in generate_series(1, len(pos) - 1)]) AS chunk
          FROM (SELECT doc_id, payload,
                       list_prepend(CAST(0 AS BIGINT),
                         list_append(bs, n)) AS pos
                FROM (SELECT doc_id, payload,
                             CAST(length(payload) AS BIGINT) AS n,
                             [CAST(i AS BIGINT)
                              for i in generate_series(8, length(payload))
                              if ${graft.functions.Cdc.boundarySql(
                                "payload", 8, m)}] AS bs
                      FROM d)))
        WHERE length(chunk) > 0"""
      s"""
      WITH d AS (SELECT doc_id,
                        text || ' ' || repeat('ad unit for ' || source
                          || ' visit now ', 4) AS payload
                 FROM documents),
      c AS (${Seq(16, 64, 256).map(per).mkString(" UNION ALL ")}),
      g AS (SELECT modulus, chunk, CAST(count(*) AS BIGINT) AS occ,
                   CAST(length(chunk) AS BIGINT) AS clen
            FROM c GROUP BY 1, 2)
      SELECT CAST(modulus AS BIGINT) AS modulus,
             CAST(sum(occ) AS BIGINT) AS n_chunks,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(occ * clen) * 1000 // sum(occ) AS BIGINT)
               AS mean_len_milli,
             CAST(sum(CASE WHEN occ > 1 THEN occ * clen ELSE 0 END)
               * 1000000 // sum(occ * clen) AS BIGINT) AS dup_char_ppm
      FROM g GROUP BY 1 ORDER BY 1"""
    }) { (spark, dir) =>
      val payload = concat(col("text"), lit(" "),
        repeat(concat(lit("ad unit for "), col("source"),
          lit(" visit now ")), 4))
      val base = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), payload.as("payload"))
      val c = Seq(16, 64, 256).map(m =>
        base.select(lit(m).as("modulus"), col("doc_id"),
          explode(graft.functions.Cdc.chunks(col("payload"), 8, m))
            .as("chunk")))
        .reduce(_ unionAll _)
      c.groupBy(col("modulus"), col("chunk"))
        .agg(count(lit(1)).as("occ"))
        .withColumn("clen", length(col("chunk")).cast("long"))
        .groupBy(col("modulus"))
        .agg(sum(col("occ")).as("n_chunks"),
          count(lit(1)).as("n_distinct"),
          expr("sum(occ * clen) * 1000 div sum(occ)").as("mean_len_milli"),
          expr("sum(CASE WHEN occ > 1 THEN occ * clen ELSE 0 END)" +
            " * 1000000 div sum(occ * clen)").as("dup_char_ppm"))
        .select(col("modulus").cast("long").as("modulus"), col("n_chunks"),
          col("n_distinct"), col("mean_len_milli"), col("dup_char_ppm"))
        .orderBy(col("modulus"))
    },

    // ---- normalization-evasion census (hash-busting detector) --------------
    // Spam that defeats exact dedup by sprinkling punctuation: docs
    // that are IDENTICAL after aggressive normalization (lowercase,
    // strip every non-alphanumeric) but DISTINCT under the standard
    // p04 normalization (case/whitespace only). Each such group is a
    // hash-busting family the p04 gate misses and the p100
    // obfuscation gate should see; the census lists every family
    // with its size and raw-variant count — the feed for a
    // strip-then-rehash second dedup pass.
    //
    // Scale shape: two hash projections in the scan, one
    // aggressive-hash-keyed rollup; evasive families only (standard
    // groups collapse upstream) — output is attack-sized, not
    // corpus-sized.
    Q("p212_evasion_census", Some(s"""
      WITH corpus AS (SELECT doc_id, text FROM documents
                      UNION ALL
                      SELECT doc_id + 1000000 AS doc_id,
                             replace(text, ' ', ' . ') AS text
                      FROM documents WHERE doc_id % 50 = 0),
      d AS (SELECT doc_id,
                   ${Portable.h60Sql(
                     raw"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')")}
                     AS std_h,
                   ${Portable.h60Sql(
                     "regexp_replace(lower(text), '[^a-z0-9]', '', 'g')")}
                     AS agg_h
            FROM corpus),
      g AS (SELECT agg_h, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT std_h) AS BIGINT) AS n_raw_variants,
                   CAST(min(doc_id) AS BIGINT) AS min_doc
            FROM d GROUP BY 1)
      SELECT agg_h, n_docs, n_raw_variants, min_doc
      FROM g WHERE n_raw_variants >= 2
      ORDER BY agg_h""")) { (spark, dir) =>
      // sprinkled-twin plant: every 50th doc gains a punctuation-sprinkled
      // clone (agg-normal-identical, std-normal-distinct), so the census
      // has TEETH on the fixture — the raw corpus contains no accidental
      // evasive family and the unplanted entry returned 0 rows (a
      // vacuously-matching oracle). Same algebra on both sides; the
      // planted family count scales with the corpus (10 at sf0.01).
      val raw = Tables.loadSpread(spark, dir, "documents")
      val planted = raw.where(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          regexp_replace(col("text"), " ", " . ").as("text"))
      val d = raw.select(col("doc_id"), col("text")).unionAll(planted)
        .select(col("doc_id"),
          Portable.h60(regexp_replace(trim(lower(col("text"))),
            "\\s+", " ")).as("std_h"),
          Portable.h60(regexp_replace(lower(col("text")),
            "[^a-z0-9]", "")).as("agg_h"))
      d.groupBy(col("agg_h"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("std_h")).as("n_raw_variants"),
          min(col("doc_id")).as("min_doc"))
        .where(col("n_raw_variants") >= 2)
        .orderBy(col("agg_h"))
    },

    // ---- MinHash LSH band-layout operating curve ---------------------------
    // The (bands × rows) S-curve tuned from ONE signature pass: the
    // SAME 12 minhash components are re-bucketed under four layouts
    // (r ∈ {2,3,4,6} rows/band → 6/4/3/2 bands); per layout, the
    // candidate-pair count and how many candidates clear estimated
    // Jaccard ≥ 1/2 (6 of 12 components equal — exact, no float
    // threshold ambiguity). More bands → higher recall, lower
    // precision; the curve makes the tradeoff a table instead of
    // folklore. Complements p196 (the SimHash threshold curve) on
    // the MinHash side.
    //
    // Scale shape: signatures computed ONCE (one shingle pass); each
    // layout is a banded bucket shuffle over the same 12 longs; the
    // verdict per candidate reads the ride-along signatures — no
    // re-join, no exact-Jaccard pass.
    Q("p213_lsh_band_curve", Some {
      def cfg(r: Int): String = {
        val bandSelects = (0 until 12 / r).map { b =>
          val cols = (0 until r)
            .map(x => s"CAST(m${b * r + x} AS VARCHAR)").mkString(", ")
          s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cols)) AS bh " +
            "FROM sig"
        }.mkString(" UNION ALL ")
        val eq = (0 until 12)
          .map(j => s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""
        SELECT $r AS r, a, b, ($eq) AS eq
        FROM (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM ($bandSelects) x JOIN ($bandSelects) y
                ON x.band = y.band AND x.bh = y.bh
                AND x.doc_id < y.doc_id) p
        JOIN sig sa ON sa.doc_id = p.a JOIN sig sb ON sb.doc_id = p.b"""
      }
      val mins = (0 until 12).map(j =>
        s"min(${Portable.minhashJSql(j, Portable.h32Sql("s"))}) AS m$j")
        .mkString(", ")
      s"""
      WITH ${Pipeline.distinctShinglesCte},
      sig AS (SELECT doc_id, $mins FROM ds GROUP BY doc_id),
      c AS (${Seq(2, 3, 4, 6).map(cfg).mkString(" UNION ALL ")})
      SELECT CAST(12 // r AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
             CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN eq >= 6 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good,
             CAST(CASE WHEN count(*) = 0 THEN 0
                  ELSE sum(CASE WHEN eq >= 6 THEN 1 ELSE 0 END)
                       * 1000000 // count(*) END AS BIGINT)
               AS precision_ppm
      FROM c GROUP BY r ORDER BY rows_per_band"""
    }) { (spark, dir) =>
      import graft.ops.DedupOps
      val docs = Tables.loadSpread(spark, dir, "documents")
      val sig = DedupOps.minhashSignatures(docs, "doc_id", "text", 12)
        .localCheckpoint()
      val curves = Seq(2, 3, 4, 6).map { r =>
        val cand = DedupOps.lshCandidatesFromSignatures(sig, "doc_id", 12, r)
        cand.agg(count(lit(1)).as("n_candidates"),
            sum(when(col("est_jaccard") >= 0.5, 1L).otherwise(0L))
              .as("n_good"))
          .select(lit(12L / r).as("bands"), lit(r.toLong).as("rows_per_band"),
            col("n_candidates"), col("n_good"),
            when(col("n_candidates") === 0, 0L)
              .otherwise(expr("n_good * 1000000 div n_candidates"))
              .as("precision_ppm"))
      }
      // one checkpointed signature pass feeds all four band layouts,
      // exactly as the oracle's shared `sig` CTE does
      curves.reduce(_ unionAll _).orderBy(col("rows_per_band"))
    },

    // ---- bitext candidate mining (cross-language pairing) ------------------
    // The first pass of parallel-corpus construction: for every
    // non-English document, the best English partner by shared RARE
    // anchors (3-gram shingles with corpus df ≤ 8 — numbers, names,
    // code spans survive translation) subject to the Gale–Church length
    // gate (token ratio within [3/4, 4/3] in exact cross-multiplied
    // integers). Anchor blocking is the p05 inverted-index discipline
    // — df-capped so no anchor fans out corpus-wide; the best partner
    // is a conditional struct extremum (anchors desc, id asc).
    //
    // Scale shape: one distinct-token pass + df agg; the pair join
    // goes through the capped anchor index (bounded buckets); the
    // argmax is per-xx-doc. Never a cross-language cartesian.
    Q("p214_bitext_candidates", Some(s"""
      WITH w AS (SELECT doc_id, lang, $wsSql AS ws FROM documents),
      n AS (SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS nt FROM w),
      t AS (SELECT doc_id, unnest(list_distinct(
              ${TextSql.shingles("ws", 3)})) AS tok FROM w),
      df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY 1),
      anch AS (SELECT t.doc_id, t.tok FROM t JOIN df USING (tok)
               WHERE df.df <= 8),
      xx AS (SELECT a.doc_id, a.tok, n.lang, n.nt FROM anch a
             JOIN n ON n.doc_id = a.doc_id WHERE n.lang <> 'en'),
      en AS (SELECT a.doc_id AS en_id, a.tok, n.nt AS en_nt FROM anch a
             JOIN n ON n.doc_id = a.doc_id WHERE n.lang = 'en'),
      p AS (SELECT xx.doc_id, xx.lang, xx.nt, en.en_id, en.en_nt,
                   CAST(count(*) AS BIGINT) AS n_anchors
            FROM xx JOIN en USING (tok)
            WHERE en.en_nt * 4 >= xx.nt * 3 AND en.en_nt * 3 <= xx.nt * 4
            GROUP BY 1, 2, 3, 4, 5),
      best AS (SELECT doc_id, lang, nt, en_id, en_nt, n_anchors FROM
                 (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY n_anchors DESC, en_id) AS rn FROM p)
               WHERE rn = 1)
      SELECT doc_id, lang, en_id AS best_en, n_anchors,
             CAST(en_nt * 1000 // nt AS BIGINT) AS len_ratio_milli
      FROM best ORDER BY doc_id""")) { (spark, dir) =>
      val w = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"),
          TextOps.tokens(col("text")).as("ws"))
      val n = w.select(col("doc_id"), col("lang"),
        size(col("ws")).cast("long").as("nt"))
      val t = w.select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(col("text"), 3)))
          .as("tok"))
      val df = t.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val anch = t.join(df.where(col("df") <= 8), "tok")
      val xx = anch.join(n.where(col("lang") =!= "en"), "doc_id")
      val en = anch.select(col("doc_id").as("en_id"), col("tok"))
        .join(n.where(col("lang") === "en")
          .select(col("doc_id").as("en_id"), col("nt").as("en_nt")),
          "en_id")
      val p = xx.join(en, "tok")
        .where(col("en_nt") * 4 >= col("nt") * 3
          && col("en_nt") * 3 <= col("nt") * 4)
        .groupBy(col("doc_id"), col("lang"), col("nt"), col("en_id"),
          col("en_nt"))
        .agg(count(lit(1)).as("n_anchors"))
      p.groupBy(col("doc_id"), col("lang"), col("nt"))
        .agg(max(struct(col("n_anchors"), (-col("en_id")).as("ne"),
          col("en_nt").as("ent"))).as("m"))
        .select(col("doc_id"), col("lang"), (-col("m.ne")).as("best_en"),
          col("m.n_anchors").as("n_anchors"),
          expr("m.ent * 1000 div nt").as("len_ratio_milli"))
        .orderBy(col("doc_id"))
    },

    // ---- referential-integrity audit across the catalog --------------------
    // The nightly FK sweep: for each declared parent-child
    // relationship (orders→customer, lineitem→orders,
    // embeddings→documents), the
    // orphan census — child rows whose parent key does not exist —
    // plus the reverse coverage gap (parents with no children: not a
    // violation, but the signal an asset pipeline half-ran). Clean
    // fixtures produce all-zero orphan rows; the SPEC plants orphans
    // to prove the detector. The audit every multi-asset 100 TB lake
    // runs before publishing a snapshot.
    //
    // Scale shape: each relationship is one left-anti (orphans) and
    // one right-side anti (childless) — both key-only joins on
    // pruned single-column scans; output is 4 metadata rows.
    Q("p215_referential_audit", Some("""
      WITH r1 AS (SELECT 'orders->customer' AS rel,
                    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_child,
                    (SELECT CAST(count(*) AS BIGINT) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = o.o_custkey)) AS n_orphans,
                    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_parents,
                    (SELECT CAST(count(*) AS BIGINT) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey)) AS n_childless),
      r2 AS (SELECT 'lineitem->orders',
                    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
                    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_orderkey = l.l_orderkey)),
                    (SELECT CAST(count(*) AS BIGINT) FROM orders),
                    (SELECT CAST(count(*) AS BIGINT) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey))),
      r3 AS (SELECT 'embeddings->documents',
                    (SELECT CAST(count(*) AS BIGINT) FROM embeddings),
                    (SELECT CAST(count(*) AS BIGINT) FROM embeddings e
                     WHERE NOT EXISTS (SELECT 1 FROM documents d
                       WHERE d.doc_id = e.vec_id)),
                    (SELECT CAST(count(*) AS BIGINT) FROM documents),
                    (SELECT CAST(count(*) AS BIGINT) FROM documents d
                     WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                       WHERE e.vec_id = d.doc_id)))
      SELECT rel, n_child, n_orphans,
             CAST(CASE WHEN n_child = 0 THEN 0
                  ELSE n_orphans * 1000000 // n_child END AS BIGINT)
               AS orphan_ppm,
             n_parents, n_childless
      FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
            UNION ALL SELECT * FROM r3)
      ORDER BY rel""")) { (spark, dir) =>
      import spark.implicits._
      def audit(relName: String, child: org.apache.spark.sql.DataFrame,
          ck: String, parent: org.apache.spark.sql.DataFrame,
          pk: String) = {
        val orphans = child.join(parent,
          child(ck) === parent(pk), "left_anti").count()
        val childless = parent.join(child,
          child(ck) === parent(pk), "left_anti").count()
        val nc = child.count()
        (relName, nc, orphans,
          if (nc == 0) 0L else orphans * 1000000L / nc,
          parent.count(), childless)
      }
      // driver-side: 4 counts per relationship — each a distributed
      // anti-join reduced to ONE number (the documented 1-row-read
      // pattern); the audit table itself is metadata-sized
      val orders = Tables.load(spark, dir, "orders")
      val cust = Tables.load(spark, dir, "customer")
      val li = Tables.load(spark, dir, "lineitem")
      val emb = Tables.load(spark, dir, "embeddings")
      val docs = Tables.load(spark, dir, "documents")
      Seq(
        audit("orders->customer", orders, "o_custkey", cust, "c_custkey"),
        audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        audit("embeddings->documents", emb, "vec_id", docs, "doc_id"))
        .toDF("rel", "n_child", "n_orphans", "orphan_ppm", "n_parents",
          "n_childless")
        .orderBy(col("rel"))
    },

    // ---- embedding outlier score (capped-panel 3-NN distance) --------------
    // The mislabel/garbage detector for the vector corpus: per IVF
    // cell (= label), every vector's distance to its 3rd-nearest
    // PANEL member — vectors far from even their closest cell-mates
    // are dirty. The panel is the p210 lesson applied from the start:
    // the 32 smallest vec_ids per cell serve as candidate neighbors
    // (deterministic, oracle-mirrored), so the distance computation
    // is |cell|×32 — never the |cell|² all-pairs that melts at 10×.
    // Distances are exact micro²-integers via |u|²+|v|²−2u·v with
    // scaled-integer dots. Output: each cell's WORST member (max
    // 3NN-distance, ties → smaller id) — the review queue.
    //
    // Scale shape: norms are one per-vector agg; dots are one
    // (label, j)-keyed partial agg against the broadcast panel;
    // per-vector 3rd-smallest is a size-capped sorted-array extract,
    // the cell argmax a struct extremum.
    Q("p216_embedding_outliers", Some("""
      WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cx AS (SELECT vec_id, label,
                    unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, label, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      pn AS (SELECT vec_id, label FROM v
             QUALIFY row_number() OVER (PARTITION BY label
               ORDER BY vec_id) <= 32),
      nrm AS (SELECT vec_id, CAST(sum(ri * ri) AS BIGINT) AS n2
              FROM c GROUP BY 1),
      d AS (SELECT a.vec_id, a.label, p.vec_id AS pid,
                   CAST(sum(a.ri * b.ri) AS BIGINT) AS dot
            FROM c a JOIN pn p ON p.label = a.label
            JOIN c b ON b.vec_id = p.vec_id AND b.j = a.j
            WHERE p.vec_id <> a.vec_id
            GROUP BY 1, 2, 3),
      dist AS (SELECT d.vec_id, d.label,
                      na.n2 + nb.n2 - 2 * d.dot AS d2
               FROM d JOIN nrm na ON na.vec_id = d.vec_id
                      JOIN nrm nb ON nb.vec_id = d.pid),
      k3 AS (SELECT vec_id, label, d2 FROM
               (SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY d2, label) AS rn FROM dist)
             WHERE rn = 3),
      w AS (SELECT label, vec_id, d2 FROM
              (SELECT *, row_number() OVER (PARTITION BY label
                 ORDER BY d2 DESC, vec_id) AS rw FROM k3)
            WHERE rw = 1)
      SELECT label, vec_id AS worst_vec, CAST(d2 AS BIGINT) AS knn3_d2
      FROM w ORDER BY label""")) { (spark, dir) =>
      val v = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding").cast("array<double>").as("v"))
      val c = v.select(col("vec_id"), col("label"),
          posexplode(col("v")).as(Seq("j", "x")))
        .select(col("vec_id"), col("label"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val pn = v.withColumn("rn", row_number().over(
          Window.partitionBy(col("label")).orderBy(col("vec_id"))))
        .where(col("rn") <= 32)
        .select(col("vec_id").as("pid"), col("label").as("plabel"))
        .localCheckpoint() // break lineage off v before rejoining c

      val nrm = c.groupBy(col("vec_id"))
        .agg(sum(col("ri") * col("ri")).as("n2"))
      val pc = c.join(broadcast(pn), col("vec_id") === col("pid"))
        .select(col("pid"), col("plabel"), col("j").as("pj"),
          col("ri").as("pri"))
        .localCheckpoint() // break lineage: pc joins back against c
      val d = c.join(broadcast(pc),
          col("label") === col("plabel") && col("j") === col("pj")
            && col("vec_id") =!= col("pid"))
        .groupBy(col("vec_id"), col("label"), col("pid"))
        .agg(sum(col("ri") * col("pri")).as("dot"))
      // Panel-side norms: only panel members can appear as `pid`, so
      // restrict the corpus-sized norm table to the O(labels×32) panel
      // BEFORE broadcasting — the semi join itself broadcasts the tiny
      // panel id list, so the build side here is provably panel-sized.
      val pnb = nrm.select(col("vec_id").as("pid"), col("n2").as("nb"))
        .join(broadcast(pn.select(col("pid"))), Seq("pid"), "left_semi")
      val dist = d
        .join(nrm.select(col("vec_id"), col("n2").as("na")), "vec_id")
        .join(broadcast(pnb), "pid")
        .select(col("vec_id"), col("label"),
          (col("na") + col("nb") - lit(2) * col("dot")).as("d2"))
      val k3 = dist.withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("d2"), col("label"))))
        .where(col("rn") === 3)
      k3.withColumn("rw", row_number().over(
          Window.partitionBy(col("label"))
            .orderBy(col("d2").desc, col("vec_id"))))
        .where(col("rw") === 1)
        .select(col("label"), col("vec_id").as("worst_vec"),
          col("d2").as("knn3_d2"))
        .orderBy(col("label"))
    },

    // ---- exact integer autocorrelation of the daily event series -----------
    // Is the event stream periodic? The lag-1 and lag-7
    // autocorrelation of the daily event counts, computed EXACTLY:
    // scale the centered series by n (n·x_t − S is an integer), so
    // r = Σ(n·x_t − S)(n·x_{t+l} − S) / Σ(n·x_t − S)² needs no float
    // anywhere — the milli result divides once, sign-split so
    // floor-vs-truncate cannot diverge. Missing days count as zero
    // via the p153 day-grid expansion (silently skipping them would
    // fake periodicity). The seasonality detector behind p149's
    // residual decomposition.
    //
    // Scale shape: the day series is a bounded aggregate of the
    // stream; the lag join is day-keyed on the metadata-sized grid;
    // the sums are 1-row rollups.
    Q("p217_autocorr", Some("""
      WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS x
                 FROM events GROUP BY 1),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
      days AS (SELECT b.lo + CAST(u.i AS INTEGER) AS day FROM b,
                 (SELECT unnest(generate_series(0,
                    (SELECT CAST(hi - lo AS BIGINT) FROM b))) AS i) u),
      g AS (SELECT d.day, coalesce(e.x, 0) AS x
            FROM days d LEFT JOIN e ON e.day = d.day),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx FROM g),
      cz AS (SELECT g.day, g.x * s.n - s.sx AS z FROM g, s),
      den AS (SELECT CAST(sum(z * z) AS BIGINT) AS den FROM cz),
      l(lag) AS (VALUES (1), (7)),
      num AS (SELECT l.lag,
                     CAST(sum(a.z * b.z) AS BIGINT) AS num,
                     CAST(count(*) AS BIGINT) AS n_pairs
              FROM l, cz a, cz b
              WHERE b.day = a.day + l.lag
              GROUP BY 1)
      SELECT CAST(num.lag AS BIGINT) AS lag, s.n AS n_days, num.n_pairs,
             CAST(CASE WHEN den.den = 0 THEN 0
                  WHEN num.num >= 0 THEN num.num * 1000 // den.den
                  ELSE -((-num.num) * 1000 // den.den) END AS BIGINT)
               AS r_milli
      FROM num, den, s ORDER BY lag""")) { (spark, dir) =>
      import spark.implicits._
      val e = Tables.load(spark, dir, "events")
        .groupBy(date_trunc("DAY", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val b = e.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val days = b.select(explode(
        expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val g = days.join(e, Seq("day"), "left")
        .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
        .localCheckpoint()
      val s = g.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      val cz = g.crossJoin(broadcast(s))
        .select(col("day"), (col("x") * col("n") - col("sx")).as("z"),
          col("n"))
      val den = cz.agg(sum(col("z") * col("z")).as("den"))
      val lags = Seq(1, 7).toDF("lag")
      val shifted = cz.select(col("day"), col("z").as("zb"))
      val num = cz.crossJoin(broadcast(lags))
        .withColumn("tday", expr("date_add(day, lag)"))
        .join(shifted.select(col("day").as("tday"), col("zb")), "tday")
        .groupBy(col("lag"), col("n"))
        .agg(sum(col("z") * col("zb")).as("num"),
          count(lit(1)).as("n_pairs"))
      num.crossJoin(broadcast(den))
        .select(col("lag").cast("long").as("lag"),
          col("n").as("n_days"), col("n_pairs"),
          when(col("den") === 0, 0L)
            .when(col("num") >= 0, expr("num * 1000 div den"))
            .otherwise(-expr("(-num) * 1000 div den")).as("r_milli"))
        .orderBy(col("lag"))
    },

    // ---- shuffle-fairness audit (exact Spearman vs quality) ----------------
    // Is the epoch shuffle secretly a curriculum? The p200 hash order
    // must be UNCORRELATED with quality — a biased loader trains on
    // easy docs first and nobody notices. Exact integer Spearman
    // between the epoch-0 shuffle rank and the quality rank (both
    // tie-broken by doc_id, so both are permutations): ρ = 1 −
    // 6Σd²/(n(n²−1)), emitted in sign-split milli with zero floats.
    // |ρ| near 0 certifies the shuffle; the same audit pointed at a
    // DELIBERATE curriculum order (p161's surprisal sort) should show
    // |ρ| near 1000 — both directions pinned in the spec.
    //
    // Scale shape: two total-order ranks (the documented statistics
    // shape), one doc-keyed join, a 1-row sum. n(n²−1) fits int64 to
    // ~2 M docs; beyond that the production form buckets ranks first
    // (the same two-phase split as p135).
    Q("p218_shuffle_fairness", Some(s"""
      WITH q AS (SELECT doc_id,
                   CAST(round(${TextSql.quality(wsSql)} * 1000000)
                     AS BIGINT) AS qm
            FROM documents),
      r0 AS (SELECT doc_id, row_number() OVER (ORDER BY
                    ${Portable.h60Sql("concat('0:', CAST(doc_id AS VARCHAR))")},
                    doc_id) AS rs FROM documents),
      rq AS (SELECT doc_id, row_number() OVER (ORDER BY qm, doc_id) AS rq
             FROM q),
      j AS (SELECT r0.doc_id, r0.rs, rq.rq FROM r0 JOIN rq USING (doc_id)),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum((rs - rq) * (rs - rq)) AS BIGINT) AS sd2
            FROM j)
      SELECT n AS n_docs, sd2 AS sum_d2,
             CAST(CASE WHEN n < 2 THEN 0
                  WHEN n * (n * n - 1) - 6 * sd2 >= 0
                  THEN (n * (n * n - 1) - 6 * sd2) * 1000
                       // (n * (n * n - 1))
                  ELSE -((6 * sd2 - n * (n * n - 1)) * 1000
                       // (n * (n * n - 1))) END AS BIGINT) AS rho_milli
      FROM s""")) { (spark, dir) =>
      import graft.ops.TextOps
      val docs = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityScore(col("text")) * 1000000, 0)
            .cast("long").as("qm"))
      val r0 = docs.withColumn("rs", row_number().over(Window.orderBy(
        Portable.h60(concat(lit("0:"), col("doc_id").cast("string"))),
        col("doc_id"))))
      val rq = docs.withColumn("rq", row_number().over(
        Window.orderBy(col("qm"), col("doc_id"))))
      r0.select(col("doc_id"), col("rs"))
        .join(rq.select(col("doc_id"), col("rq")), "doc_id")
        .agg(count(lit(1)).as("n"),
          sum((col("rs") - col("rq")) * (col("rs") - col("rq")))
            .cast("long").as("sd2"))
        .select(col("n").as("n_docs"), col("sd2").as("sum_d2"),
          when(col("n") < 2, 0L)
            .when(expr("n * (n * n - 1) - 6 * sd2") >= 0,
              expr("(n * (n * n - 1) - 6 * sd2) * 1000" +
                " div (n * (n * n - 1))"))
            .otherwise(-expr("(6 * sd2 - n * (n * n - 1)) * 1000" +
              " div (n * (n * n - 1))")).as("rho_milli"))
    },

    // ---- dedup budget report (what deduplication costs per source) ---------
    // The number a data owner asks first: how many of MY tokens does
    // dedup delete? Per source: docs and tokens before, docs and
    // tokens after survivor selection (cluster members lose to the
    // min-id canonical — membership from the SharedStages labels,
    // singletons survive by construction), and the removed fractions
    // in ppm. The per-source bill for the p29/p68 pipeline — the
    // report that turns "dedup helps" into a negotiation each source
    // team can audit.
    //
    // Scale shape: one doc-keyed pass for tokens; survivor status is
    // a broadcast-sized labels join + a min-per-cluster extremum;
    // the report is a per-source rollup.
    Q("p219_dedup_budget", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      ${Pipeline.clusterLabelsCte},
      keep AS (SELECT cluster_id, min(n) AS keeper FROM lbl GROUP BY 1),
      d AS (SELECT doc_id, source, CAST(len($wsSql) AS BIGINT) AS toks,
                   CASE WHEN l.n IS NULL THEN 1
                        WHEN k.keeper = doc_id THEN 1 ELSE 0 END AS kept
            FROM documents
            LEFT JOIN lbl l ON l.n = doc_id
            LEFT JOIN keep k ON k.cluster_id = l.cluster_id)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens,
             CAST(sum(kept) AS BIGINT) AS kept_docs,
             CAST(sum(CASE WHEN kept = 1 THEN toks ELSE 0 END) AS BIGINT)
               AS kept_tokens,
             CAST(sum(1 - kept) * 1000000 // count(*) AS BIGINT)
               AS doc_removed_ppm,
             CAST(CASE WHEN sum(toks) = 0 THEN 0
                  ELSE sum(CASE WHEN kept = 0 THEN toks ELSE 0 END)
                       * 1000000 // sum(toks) END AS BIGINT)
               AS token_removed_ppm
      FROM d GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import graft.ops.TextOps
      val labels = SharedStages.labels(spark, dir)
      val keep = labels.groupBy(col("cluster_id"))
        .agg(min(col("doc_id")).as("keeper"))
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("toks"))
        .join(labels, Seq("doc_id"), "left")
        .join(keep, Seq("cluster_id"), "left")
        .withColumn("kept",
          when(col("cluster_id").isNull, 1L)
            .when(col("keeper") === col("doc_id"), 1L).otherwise(0L))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          sum(col("kept")).as("kept_docs"),
          sum(when(col("kept") === 1, col("toks")).otherwise(0L))
            .as("kept_tokens"),
          expr("sum(1 - kept) * 1000000 div count(1)")
            .as("doc_removed_ppm"),
          expr("CASE WHEN sum(toks) = 0 THEN 0 ELSE " +
            "sum(CASE WHEN kept = 0 THEN toks ELSE 0 END) * 1000000" +
            " div sum(toks) END").as("token_removed_ppm"))
        .orderBy(col("source"))
    },

    // ---- longest shared token span per near-dup pair -----------------------
    // The strongest dedup evidence of all: the LONGEST contiguous
    // token run two paired docs share. Computed without alignment
    // DP: shared 3-shingles carry their positions on both sides;
    // matches on the same DIAGONAL (i − j constant) that sit at
    // CONSECUTIVE positions form one run (the p171 gaps-and-islands
    // key, i − row_number, applied per (pair, diagonal)); the longest
    // island + 2 is the span length in tokens. A span near min(len)
    // is wholesale copying; a short span with many scattered matches
    // is template noise — p199 counts the evidence, this entry
    // measures its contiguity.
    //
    // Scale shape: pairs from SharedStages; position pairs flow
    // through the shingle inverted index (bounded by doc shingle
    // counts); islands are per-(pair, diagonal) windows — bounded by
    // the pair's match count, never corpus-wide.
    Q("p220_longest_shared_span", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      ww AS (SELECT doc_id, $wsSql AS ws FROM documents),
      sh AS (SELECT doc_id,
                    unnest(generate_series(1, greatest(len(ws) - 2, 0)))
                      AS i,
                    unnest(CASE WHEN len(ws) >= 3 THEN
                      [array_to_string(ws[k:k+2], ' ')
                       for k in generate_series(1, len(ws) - 2)]
                      ELSE [] END) AS s
             FROM ww),
      m AS (SELECT p.a, p.b, sa.i AS ia, sb.i AS ib
            FROM spairs p
            JOIN sh sa ON sa.doc_id = p.a
            JOIN sh sb ON sb.doc_id = p.b AND sb.s = sa.s),
      g AS (SELECT a, b, ia - ib AS diag, ia,
                   ia - row_number() OVER (PARTITION BY a, b, ia - ib
                     ORDER BY ia) AS grp
            FROM (SELECT DISTINCT a, b, ia, ib FROM m)),
      runs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS run_len
               FROM g GROUP BY a, b, diag, grp),
      best AS (SELECT a, b, CAST(max(run_len) AS BIGINT) AS max_run,
                      CAST(count(*) AS BIGINT) AS n_runs
               FROM runs GROUP BY 1, 2)
      SELECT a, b, max_run + 2 AS span_tokens, n_runs
      FROM best ORDER BY a, b""")) { (spark, dir) =>
      import graft.ops.TextOps
      // r20: materialized once — the positional shingle stream fed two
      // differently-keyed joins (a side, (b,s) side), running the
      // kernel twice; one checkpoint runs it once
      val sh = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.shingles(col("text"), 3)).as(Seq("i0", "s")))
        .select(col("doc_id"), (col("i0") + 1).as("i"), col("s"))
        .localCheckpoint()
      val pairs = SharedStages.spairs(spark, dir)
        .select(col("a"), col("b"))
      val m = pairs
        .join(sh.select(col("doc_id").as("a"), col("i").as("ia"),
          col("s")), "a")
        .join(sh.select(col("doc_id").as("b"), col("i").as("ib"),
          col("s")), Seq("b", "s"))
        .select(col("a"), col("b"), col("ia"), col("ib")).distinct()
      val g = m.withColumn("diag", col("ia") - col("ib"))
        .withColumn("grp", col("ia") - row_number().over(
          Window.partitionBy(col("a"), col("b"), col("diag"))
            .orderBy(col("ia"))))
      g.groupBy(col("a"), col("b"), col("diag"), col("grp"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("a"), col("b"))
        .agg(max(col("run_len")).as("max_run"),
          count(lit(1)).as("n_runs"))
        .select(col("a"), col("b"), (col("max_run") + 2).as("span_tokens"),
          col("n_runs"))
        .orderBy(col("a"), col("b"))
    },

    // ---- hybrid retrieval via Reciprocal Rank Fusion -----------------------
    // The modern retrieval stack in one query: a LEXICAL leg (distinct
    // -token overlap with the query doc, the integer core of BM25
    // matching) and a SEMANTIC leg (scaled-integer dot ranking, the
    // p103 convention) each produce a top-20 list per query; RRF fuses
    // them with score = Σ 1e6//(60+rank) — the fusion that needs no
    // score calibration between legs, which is exactly why it's the
    // default in hybrid search. Integer throughout; per fused hit the
    // leg-membership flags show WHERE the evidence came from. Top-5
    // fused per query.
    //
    // Scale shape: the lexical leg flows through the token inverted
    // index with the query panel broadcast; the semantic leg is the
    // one-pass component join; ranks are panel-bounded windows; the
    // fusion is a (query, doc)-keyed rollup of two 20-row lists.
    Q("p221_hybrid_rrf", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      t AS (SELECT doc_id, unnest(list_distinct(ws)) AS tok FROM w),
      qt AS (SELECT doc_id AS qid, tok FROM t WHERE doc_id < 5),
      lex AS (SELECT qt.qid, t.doc_id, CAST(count(*) AS BIGINT) AS ov
              FROM qt JOIN t ON t.tok = qt.tok AND t.doc_id <> qt.qid
              GROUP BY 1, 2),
      lrk AS (SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
                ORDER BY ov DESC, doc_id) AS rk FROM lex),
      v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      q AS (SELECT vec_id AS qid, j, ri AS qi FROM c WHERE vec_id < 5),
      d AS (SELECT q.qid, c.vec_id AS doc_id, sum(q.qi * c.ri) AS dot
            FROM c JOIN q ON q.j = c.j AND c.vec_id != q.qid
            GROUP BY 1, 2),
      ark AS (SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
                ORDER BY dot DESC, doc_id) AS rk FROM d),
      u AS (SELECT qid, doc_id, 1000000 // (60 + rk) AS pts,
                   1 AS lexf, 0 AS annf
            FROM lrk WHERE rk <= 20
            UNION ALL
            SELECT qid, doc_id, 1000000 // (60 + rk), 0, 1
            FROM ark WHERE rk <= 20),
      f AS (SELECT qid, doc_id, CAST(sum(pts) AS BIGINT) AS rrf,
                   CAST(max(lexf) AS BIGINT) AS in_lex,
                   CAST(max(annf) AS BIGINT) AS in_ann
            FROM u GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY rrf DESC, doc_id) AS frank FROM f)
      SELECT qid AS query_id, CAST(frank AS BIGINT) AS frank, doc_id,
             rrf, in_lex = 1 AS in_lex, in_ann = 1 AS in_ann
      FROM r WHERE frank <= 5 ORDER BY query_id, frank""")) { (spark, dir) =>
      import graft.ops.TextOps
      val t = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      val qt = t.where(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("tok"))
      val lrk = t.join(broadcast(qt), "tok")
        .where(col("doc_id") =!= col("qid"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(count(lit(1)).as("ov"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("ov").desc, col("doc_id"))))
        .where(col("rk") <= 20)
      val c = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val q = c.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("j"), col("ri").as("qi"))
      val ark = c.join(broadcast(q), "j")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id").as("doc_id"))
        .agg(sum(col("qi") * col("ri")).as("dot"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("dot").desc, col("doc_id"))))
        .where(col("rk") <= 20)
      val u = lrk.select(col("qid"), col("doc_id"),
          expr("1000000 div (60 + rk)").as("pts"),
          lit(1).as("lexf"), lit(0).as("annf"))
        .unionAll(ark.select(col("qid"), col("doc_id"),
          expr("1000000 div (60 + rk)"), lit(0), lit(1)))
      u.groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("pts")).as("rrf"),
          max(col("lexf")).cast("long").as("in_lex"),
          max(col("annf")).cast("long").as("in_ann"))
        .withColumn("frank", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(col("rrf").desc, col("doc_id"))))
        .where(col("frank") <= 5)
        .select(col("qid").as("query_id"),
          col("frank").cast("long").as("frank"), col("doc_id"),
          col("rrf"), (col("in_lex") === 1).as("in_lex"),
          (col("in_ann") === 1).as("in_ann"))
        .orderBy(col("query_id"), col("frank"))
    },

    // ---- digest-guided corruption repair (Merkle localization) -------------
    // p184 DETECTS a corrupt replica in 16 numbers; this entry
    // LOCATES the damage: the bucket digests that disagree name the
    // buckets to re-scan, and only those buckets' rows are compared
    // hash-by-hash to emit the exact corrupted keys — the two-level
    // Merkle walk that turns "replicas differ" into "re-sync THESE
    // rows" while reading 1/16th of the table (production: 2^12+
    // buckets → 1/4096). The re-scan's bucket predicate is the
    // pushdown the layout was designed for.
    //
    // Scale shape: digests are map-side xor partials; the bad-bucket
    // list broadcasts; the repair scan filters to flagged buckets
    // BEFORE the row-hash compare join.
    Q("p222_digest_repair", Some(s"""
      WITH a AS (SELECT o_orderkey AS k,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                        o_orderstatus AS st FROM orders),
      b AS (SELECT k, CASE WHEN k % 997 = 0 THEN cents + 1 ELSE cents END
                   AS cents, st FROM a),
      ha AS (SELECT ${Portable.h60Sql("CAST(k AS VARCHAR)")} % 16 AS bucket,
                    ${Portable.h60Sql(
                      "concat(CAST(k AS VARCHAR), '|', CAST(cents AS VARCHAR), '|', st)")}
                      AS h, k FROM a),
      hb AS (SELECT ${Portable.h60Sql("CAST(k AS VARCHAR)")} % 16 AS bucket,
                    ${Portable.h60Sql(
                      "concat(CAST(k AS VARCHAR), '|', CAST(cents AS VARCHAR), '|', st)")}
                      AS h, k FROM b),
      da AS (SELECT bucket, bit_xor(h) AS dig FROM ha GROUP BY 1),
      db AS (SELECT bucket, bit_xor(h) AS dig FROM hb GROUP BY 1),
      bad AS (SELECT da.bucket FROM da JOIN db USING (bucket)
              WHERE da.dig <> db.dig),
      rep AS (SELECT ha.k, ha.bucket FROM ha
              JOIN hb ON hb.k = ha.k
              WHERE ha.bucket IN (SELECT bucket FROM bad)
                AND ha.h <> hb.h)
      SELECT k, CAST(bucket AS BIGINT) AS bucket,
             (SELECT CAST(count(*) AS BIGINT) FROM bad) AS n_bad_buckets
      FROM rep ORDER BY k""")) { (spark, dir) =>
      val a = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          col("o_orderstatus").as("st"))
      val b = a.withColumn("cents",
        when(col("k") % 997 === 0, col("cents") + 1).otherwise(col("cents")))
      def hashed(df: org.apache.spark.sql.DataFrame, hn: String) = df
        .select(pmod(Portable.h60(col("k").cast("string")), lit(16))
            .as("bucket"),
          Portable.h60(concat_ws("|", col("k").cast("string"),
            col("cents").cast("string"), col("st"))).as(hn),
          col("k"))
      // r21: ha/hb each feed TWO consumers (the bucket digest agg and
      // the repair scan) and hb additionally nests a's scan — inlined,
      // the orders table was scanned 12× with the md5 row hash
      // recomputed per scan (plans/r21/p222_*_before.txt). One
      // materialization each = 2 scans total; production-shaped too:
      // the row-hash table IS the Merkle leaf level a replica stores,
      // computed once per sync round, not per probe.
      val ha = hashed(a, "h_a").localCheckpoint()
      val hb = hashed(b, "h_b").localCheckpoint()
      val bad = ha.groupBy(col("bucket"))
        .agg(expr("bit_xor(h_a)").as("dig_a"))
        .join(hb.groupBy(col("bucket"))
          .agg(expr("bit_xor(h_b)").as("dig_b")), "bucket")
        .where(col("dig_a") =!= col("dig_b"))
        .select(col("bucket"))
      val nBad = bad.agg(count(lit(1)).as("n_bad_buckets"))
      ha.join(broadcast(bad), "bucket") // repair scan: flagged buckets only
        .join(hb.select(col("k"), col("h_b")), "k")
        .where(col("h_a") =!= col("h_b"))
        .crossJoin(broadcast(nBad))
        .select(col("k"), col("bucket").cast("long").as("bucket"),
          col("n_bad_buckets"))
        .orderBy(col("k"))
    },

    // ---- per-document salient terms (forward-index compaction) -------------
    // The doc → keywords summary a search/labeling UI shows: each
    // doc's top-3 terms by integer salience tf · floor(log2(N/df))
    // (term frequency × the p161 integer IDF — no float tf-idf
    // anywhere), ties → lexicographic. The forward index compacted
    // to 3 terms/doc is ALSO the cheap doc-similarity key a triage
    // tool joins on when full shingling is overkill.
    //
    // Scale shape: one (doc, term) tf agg + a broadcast df join; the
    // top-3 is a window partitioned BY DOC (doc-vocabulary-bounded,
    // never a global sort).
    Q("p223_salient_terms", Some(s"""
      WITH t AS (SELECT doc_id, unnest($wsSql) AS term FROM documents),
      tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             FROM t GROUP BY 1, 2),
      df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             FROM t GROUP BY 1),
      n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM t),
      s AS (SELECT tf.doc_id, tf.term,
                   tf.tf * (length(bin((SELECT n FROM n) // df.df)) - 1)
                     AS sal
            FROM tf JOIN df USING (term)),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY sal DESC, term) AS rk FROM s)
      SELECT doc_id, CAST(rk AS BIGINT) AS rk, term,
             CAST(sal AS BIGINT) AS salience
      FROM r WHERE rk <= 3 AND sal > 0
      ORDER BY doc_id, rk""")) { (spark, dir) =>
      import graft.ops.TextOps
      val t = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text")))
          .as("term"))
      val tf = t.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = t.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = t.agg(countDistinct(col("doc_id")).as("n"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("sal",
          col("tf") * (length(bin(expr("n div df"))) - 1).cast("long"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("sal").desc, col("term"))))
        .where(col("rk") <= 3 && col("sal") > 0)
        .select(col("doc_id"), col("rk").cast("long").as("rk"),
          col("term"), col("sal").as("salience"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // ---- incremental maintenance of the signature asset --------------------
    // The dedup pipeline's signatures are a MAINTAINED TABLE, not a
    // per-run computation: when docs change (here: doc_id%7 gets an
    // appended edit), only the TOUCHED rows re-hash and splice into
    // the standing signature table — the p73/p183 IVM discipline
    // applied to the minhash asset. The proof is self-carried by the
    // p184 trick: the spliced table and a from-scratch recompute are
    // digested per hash bucket (xor of row-content hashes) and every
    // bucket must agree — the output IS the maintenance-correctness
    // certificate, plus the touched-row accounting that shows the
    // incremental path did 1/7th of the hashing.
    //
    // Scale shape: the splice is one anti-join (standing minus
    // touched) + union (touched re-hash); digests are map-side xor
    // partials; output is 16 metadata rows.
    Q("p224_signature_ivm", Some {
      val mins = (0 until 12).map(j =>
        s"min(${Portable.minhashJSql(j, Portable.h32Sql("s"))}) AS m$j")
        .mkString(", ")
      val sigCat = (0 until 12).map(j => s"CAST(m$j AS VARCHAR)")
        .mkString("concat_ws('|', CAST(doc_id AS VARCHAR), ", ", ", ")")
      s"""
      WITH base AS (SELECT doc_id,
                      CASE WHEN doc_id % 7 = 0
                           THEN text || ' edited revision marker'
                           ELSE text END AS text
                    FROM documents),
      ws0 AS (SELECT doc_id, ${TextSql.ws} AS ws FROM base),
      ds AS (SELECT doc_id, unnest(list_distinct(
               ${TextSql.shingles("ws", 3)})) AS s FROM ws0),
      sig AS (SELECT doc_id, $mins FROM ds GROUP BY doc_id),
      h AS (SELECT doc_id,
                   ${Portable.h60Sql("CAST(doc_id AS VARCHAR)")} % 16
                     AS bucket,
                   ${Portable.h60Sql(sigCat)} AS rh
            FROM sig)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(bit_xor(rh) AS BIGINT) AS digest,
             CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS touched
      FROM h GROUP BY 1 ORDER BY 1"""
    }) { (spark, dir) =>
      import graft.ops.{DedupOps, TextOps}
      val docs = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      // standing signatures: the PRE-EDIT asset (computed once here;
      // in production a table on the shared store)
      val standing = DedupOps.minhashSignatures(docs, "doc_id", "text", 12)
      // the edit arrives: only %7 docs change
      val edited = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" edited revision marker")).as("text"))
      val touched = DedupOps.minhashSignatures(edited, "doc_id", "text", 12)
      // SPLICE: standing minus touched ids, plus the re-hashed rows —
      // the incremental path hashes 1/7th of the corpus
      val spliced = standing.join(edited.select(col("doc_id")),
          Seq("doc_id"), "left_anti")
        .unionByName(touched)
      val sigCat = concat_ws("|",
        (col("doc_id").cast("string") +:
          (0 until 12).map(j => col(s"m$j").cast("string"))): _*)
      spliced
        .select(col("doc_id"),
          pmod(Portable.h60(col("doc_id").cast("string")), lit(16))
            .as("bucket"),
          Portable.h60(sigCat).as("rh"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(rh)").as("digest"),
          sum(when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
            .as("touched"))
        .orderBy(col("bucket"))
    },

    // ---- edge support census (truss-ness of the pair graph) ----------------
    // How LOAD-BEARING is each near-dup edge? Its support = the
    // number of common neighbors (triangles through it). Support-0
    // edges are chain links — the likeliest false positives, since
    // real duplicate families close triangles (if a~b and b~c are
    // true dups, a~c should be too); the census of weak edges is the
    // review queue BEFORE transitive CC merges whole chains. The
    // per-edge refinement of p105's global triangle count, and the
    // edge-level complement of p199's content evidence.
    //
    // Scale shape: adjacency capped at 64 like p210 (support counts
    // are then lower bounds on hubs — documented); one wedge join +
    // one edge-keyed rollup, all bounded by cap × degree.
    Q("p225_edge_support", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      e AS (SELECT a, b FROM spairs),
      sym AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
      f AS (SELECT u, v FROM sym
            QUALIFY row_number() OVER (PARTITION BY u ORDER BY v) <= 64),
      tri AS (SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS support
              FROM e JOIN f fa ON fa.u = e.a
                     JOIN f fb ON fb.u = e.b AND fb.v = fa.v
              GROUP BY 1, 2),
      s AS (SELECT e.a, e.b, coalesce(t.support, 0) AS support
            FROM e LEFT JOIN tri t ON t.a = e.a AND t.b = e.b)
      SELECT CAST(support AS BIGINT) AS support,
             CAST(count(*) AS BIGINT) AS n_edges
      FROM s GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val e = SharedStages.spairs(spark, dir).select(col("a"), col("b"))
        .localCheckpoint()
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b"), col("a"))).distinct()
      val f = sym.withColumn("rn", row_number().over(
          Window.partitionBy(col("u")).orderBy(col("v"))))
        .where(col("rn") <= 64).drop("rn").localCheckpoint()
      val tri = e
        .join(f.select(col("u").as("a"), col("v").as("w")), "a")
        .join(f.select(col("u").as("b"), col("v").as("w")), Seq("b", "w"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("support"))
      e.join(tri, Seq("a", "b"), "left")
        .select(coalesce(col("support"), lit(0L)).as("support"))
        .groupBy(col("support"))
        .agg(count(lit(1)).as("n_edges"))
        .orderBy(col("support"))
    },

    // ---- quality-vs-duplication curve (decile monotonicity audit) ----------
    // The assumption every curation pipeline rests on — lower-quality
    // docs duplicate more — made measurable: docs are cut into 10
    // quality deciles (exact integer micro-quality ranks, ntile), and
    // each decile reports its pair-graph membership rate in ppm plus
    // an INVERSION flag (dup rate rose vs the previous decile — the
    // places the assumption breaks). Many inversions mean quality
    // and duplication decouple in this corpus and the p68 survivor
    // rule needs both signals, not one.
    //
    // Scale shape: quality is scan-stage; the decile cut is one
    // total-order ntile (the documented stats shape); dup membership
    // is the p204 semi-join; the curve is a 10-row rollup + lag.
    Q("p226_quality_dup_curve", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      dup AS (SELECT DISTINCT n FROM
                (SELECT a AS n FROM spairs UNION ALL SELECT b FROM spairs)),
      d AS (SELECT doc_id,
                   CAST(round(${TextSql.quality(wsSql)} * 1000000)
                     AS BIGINT) AS qm,
                   CASE WHEN doc_id IN (SELECT n FROM dup)
                        THEN 1 ELSE 0 END AS is_dup
            FROM documents),
      t AS (SELECT *, ntile(10) OVER (ORDER BY qm, doc_id) AS decile
            FROM d),
      g AS (SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT)
                     AS dup_ppm
            FROM t GROUP BY 1)
      SELECT decile, n_docs, dup_ppm,
             coalesce(dup_ppm > lag(dup_ppm) OVER (ORDER BY decile),
               FALSE) AS inversion
      FROM g ORDER BY decile""")) { (spark, dir) =>
      import graft.ops.TextOps
      val sp = SharedStages.spairs(spark, dir)
      val dup = sp.select(col("a").as("doc_id"))
        .unionAll(sp.select(col("b"))).distinct()
        .withColumn("is_dup", lit(1L))
      val g = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityScore(col("text")) * 1000000, 0)
            .cast("long").as("qm"))
        .join(dup, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
        .withColumn("decile", ntile(10).over(
          Window.orderBy(col("qm"), col("doc_id"))).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(is_dup) * 1000000 div count(1)").as("dup_ppm"))
      g.withColumn("inversion",
          coalesce(col("dup_ppm") > lag(col("dup_ppm"), 1).over(
            Window.orderBy(col("decile"))), lit(false)))
        .orderBy(col("decile"))
    },

    // ---- single-link dendrogram profile (CC per Hamming threshold) ---------
    // Hierarchical agglomerative clustering, distributed: single-link
    // clustering at threshold t IS connected components over edges of
    // weight ≤ t, so running the bounded CC fold on the ≤4-capture
    // pair set filtered at t ∈ 0..4 reads the whole DENDROGRAM
    // profile — components, clustered docs, and the largest family at
    // every cut — without ever building a dendrogram structure. The
    // t where the largest component explodes is the over-merge point
    // the production threshold must stay under; p196 counts pairs per
    // threshold, this entry shows what those pairs MERGE into.
    //
    // Scale shape: one banded pair pass (≤4 capture); per threshold a
    // bounded min-label CC fold over the FILTERED pairs (5 bounded
    // fixpoints over strictly shrinking edge sets); per-threshold
    // 3-number rollups.
    Q("p227_dendrogram_profile", Some {
      def level(t: Int): String = {
        s"""
        SELECT $t AS th,
               CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_components,
               CAST(count(*) AS BIGINT) AS n_clustered_docs,
               CAST(coalesce(max(cnt), 0) AS BIGINT) AS largest
        FROM (SELECT l.cluster_id, count(*) OVER (PARTITION BY l.cluster_id)
                       AS cnt
              FROM lbl$t l)"""
      }
      def lblCte(t: Int): String =
        s"""e$t AS (SELECT a, b FROM spairs WHERE hamming <= $t),
        esym$t AS (SELECT a AS u, b AS v FROM e$t
                   UNION SELECT b, a FROM e$t),
        walk$t(u, v) AS (SELECT u, v FROM esym$t
                         UNION
                         SELECT wk.u, e.v FROM walk$t wk
                         JOIN esym$t e ON wk.v = e.u),
        lbl$t AS (SELECT u AS n, least(u, min(v)) AS cluster_id
                  FROM walk$t GROUP BY u)"""
      s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte.replace("<= 3", "<= 4")},
      ${(0 to 4).map(lblCte).mkString(",\n")}
      ${(0 to 4).map(level).mkString(" UNION ALL ")}
      ORDER BY th"""
    }) { (spark, dir) =>
      import graft.ops.DedupOps
      // the ≤ 4 slice of the SharedStages ≤ 8 capture: no private
      // banded pair pass — one parquet scan with a pushed hamming
      // filter, shared with p75/p101/p196 and every other consumer
      val pairs = SharedStages.spairsWide(spark, dir, 4)
      // ONE fixpoint for all five cuts (round-11; was one fixpoint +
      // four sequential delta folds): single-link clusters at
      // threshold t ARE connected components over edges with
      // hamming ≤ t, and the cuts are nested, so each pair is
      // replicated to every threshold it participates in — a bounded
      // ×(5−h) ≤ ×5 blowup of the PAIR table, never the corpus — and
      // the node key is lifted to the composite doc_id·8 + th. One CC
      // fixpoint over the lifted graph labels all five cuts at once:
      // wall-clock pays a single fixpoint at the t=4 diameter instead
      // of five sequential fixpoint floors (in-suite 5.9 s → 1.5 s at
      // sf0.001). Every node of a lifted component shares its th, so
      // the min-composite label decodes back to the per-cut min-doc
      // label: lbl div 8 — exactly the oracle's per-threshold CC.
      val lifted = pairs
        .select(col("a"), col("b"),
          explode(sequence(col("hamming").cast("long"), lit(4L))).as("th"))
        .select((col("a") * 8 + col("th")).as("a"),
          (col("b") * 8 + col("th")).as("b"))
      val lab = DedupOps.connectedComponents(lifted)
        .select((col("n") % 8).as("th"), expr("lbl div 8").as("cluster_id"))
      val agg = lab.groupBy(col("th"), col("cluster_id"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("th"))
        .agg(count(lit(1)).as("n_components"),
          sum(col("cnt")).as("n_clustered_docs"),
          max(col("cnt")).as("largest"))
      // every threshold emits a row even when no pairs survive its cut
      spark.range(0, 5).select(col("id").as("th"))
        .join(agg, Seq("th"), "left")
        .select(col("th"),
          coalesce(col("n_components"), lit(0L)).as("n_components"),
          coalesce(col("n_clustered_docs"), lit(0L)).as("n_clustered_docs"),
          coalesce(col("largest"), lit(0L)).as("largest"))
        .orderBy(col("th"))
    },

    // ---- nearest-event join (bidirectional as-of with tolerance) -----------
    // q33's as-of join looks only BACKWARD; sensor fusion and session
    // stitching need the NEAREST event either direction (pandas
    // merge_asof direction='nearest'): for every purchase, the
    // closest click of the same user within ±1 h, ties → the earlier
    // (backward) click. Composed as a backward running-max and a
    // forward running-min carry over the user's ordered stream (two
    // O(events) windows — no per-row range scan, no raw-stream
    // self-join), then ONE user+timestamp join recovers the click id
    // (min id on timestamp ties).
    //
    // Scale shape: two per-user ordered windows + a user-keyed join
    // against the (user, us)-grouped click table.
    Q("p228_nearest_join", Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                        CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
      w AS (SELECT *,
              max(CASE WHEN event_type = 'click' THEN us END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS back_us,
              min(CASE WHEN event_type = 'click' THEN us END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                AS fwd_us
            FROM e),
      p AS (SELECT user_id, event_id, us,
              CASE WHEN back_us IS NOT NULL AND us - back_us <= 3600000000
                   THEN us - back_us END AS bd,
              CASE WHEN fwd_us IS NOT NULL AND fwd_us - us <= 3600000000
                   THEN fwd_us - us END AS fd,
              back_us, fwd_us
            FROM w WHERE event_type = 'purchase'),
      sel AS (SELECT user_id, event_id, us,
                CASE WHEN bd IS NOT NULL AND (fd IS NULL OR bd <= fd)
                     THEN back_us ELSE fwd_us END AS cus,
                CASE WHEN bd IS NOT NULL AND (fd IS NULL OR bd <= fd)
                     THEN bd ELSE fd END AS gap_us
              FROM p WHERE bd IS NOT NULL OR fd IS NOT NULL),
      ck AS (SELECT user_id, us AS cus, CAST(min(event_id) AS BIGINT)
                      AS click_id
             FROM e WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT sel.user_id, sel.event_id AS purchase_id, ck.click_id,
             CAST(sel.gap_us AS BIGINT) AS gap_us
      FROM sel JOIN ck ON ck.user_id = sel.user_id AND ck.cus = sel.cus
      ORDER BY sel.user_id, purchase_id""")) { (spark, dir) =>
      val wb = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wf = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val clickUs = when(col("event_type") === "click", col("us"))
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .localCheckpoint()
      val sel = e
        .withColumn("back_us", max(clickUs).over(wb))
        .withColumn("fwd_us", min(clickUs).over(wf))
        .where(col("event_type") === "purchase")
        .withColumn("bd", when(col("back_us").isNotNull
          && col("us") - col("back_us") <= 3600000000L,
          col("us") - col("back_us")))
        .withColumn("fd", when(col("fwd_us").isNotNull
          && col("fwd_us") - col("us") <= 3600000000L,
          col("fwd_us") - col("us")))
        .where(col("bd").isNotNull || col("fd").isNotNull)
        .withColumn("back_wins",
          col("bd").isNotNull && (col("fd").isNull || col("bd") <= col("fd")))
        .select(col("user_id"), col("event_id"), 
          when(col("back_wins"), col("back_us")).otherwise(col("fwd_us"))
            .as("cus"),
          when(col("back_wins"), col("bd")).otherwise(col("fd"))
            .as("gap_us"))
      val ck = e.where(col("event_type") === "click")
        .groupBy(col("user_id"), col("us").as("cus"))
        .agg(min(col("event_id")).as("click_id"))
      sel.join(ck, Seq("user_id", "cus"))
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("click_id"), col("gap_us"))
        .orderBy(col("user_id"), col("purchase_id"))
    },

    // ---- int8 retrieval fidelity (quantization impact, end to end) ---------
    // Does p181's int8 quantization change what retrieval RETURNS?
    // Per query: the top-5 by full-precision integer dots vs the
    // top-5 by dots over the QUANTIZED vectors (q_i ∈ [−127,127]
    // from the p181 shifted-floor rule, query side kept full — the
    // asymmetric scoring serving actually uses), then the overlap
    // count and whether the #1 result survived. Both rankings are
    // exact integer; the oracle replays the quantization and both
    // rankings, so the fidelity numbers are bit-pinned — the
    // measured answer to "can we serve int8", per query, not on
    // average.
    //
    // Scale shape: one component pass computes both dot kinds
    // simultaneously (the quantized component rides next to the full
    // one); two panel-bounded rank windows; a per-query overlap
    // rollup.
    Q("p229_int8_fidelity", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      am AS (SELECT vec_id, CAST(max(abs(ri)) AS BIGINT) AS amax
             FROM c GROUP BY 1),
      qz AS (SELECT c.vec_id, c.j,
                    CASE WHEN am.amax = 0 THEN 0
                         ELSE ((c.ri + am.amax) * 254 + am.amax)
                              // (2 * am.amax) - 127 END AS qi,
                    am.amax
             FROM c JOIN am USING (vec_id)),
      q AS (SELECT vec_id AS qid, j, ri AS qri FROM c WHERE vec_id < 10),
      d AS (SELECT q.qid, c.vec_id AS did,
                   CAST(sum(q.qri * c.ri) AS BIGINT) AS fdot,
                   CAST(sum(q.qri * z.qi) AS BIGINT) AS qdot
            FROM c JOIN qz z ON z.vec_id = c.vec_id AND z.j = c.j
                   JOIN q ON q.j = c.j AND c.vec_id != q.qid
            GROUP BY 1, 2),
      fr AS (SELECT qid, did, row_number() OVER (PARTITION BY qid
               ORDER BY fdot DESC, did) AS rk FROM d),
      qr AS (SELECT qid, did, row_number() OVER (PARTITION BY qid
               ORDER BY qdot DESC, did) AS rk FROM d),
      f5 AS (SELECT qid, did, rk FROM fr WHERE rk <= 5),
      q5 AS (SELECT qid, did, rk FROM qr WHERE rk <= 5),
      ov AS (SELECT f5.qid, CAST(count(*) AS BIGINT) AS n_overlap
             FROM f5 JOIN q5 ON q5.qid = f5.qid AND q5.did = f5.did
             GROUP BY 1),
      t1 AS (SELECT f5.qid,
                    max(CASE WHEN q5.rk = 1 THEN 1 ELSE 0 END) AS top1_kept
             FROM f5 LEFT JOIN q5 ON q5.qid = f5.qid AND q5.did = f5.did
             WHERE f5.rk = 1 GROUP BY 1)
      SELECT ov.qid AS query_id, ov.n_overlap,
             t1.top1_kept = 1 AS top1_kept
      FROM ov JOIN t1 ON t1.qid = ov.qid
      ORDER BY query_id""")) { (spark, dir) =>
      val c = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
        .localCheckpoint()
      val am = c.groupBy(col("vec_id")).agg(max(abs(col("ri"))).as("amax"))
      val qz = c.join(am, "vec_id")
        .select(col("vec_id").as("zv"), col("j").as("zj"),
          when(col("amax") === 0, 0L)
            .otherwise(expr("((ri + amax) * 254 + amax) div (2 * amax)" +
              " - 127")).as("qi"))
        .localCheckpoint() // break lineage before rejoining c
      val q = c.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("j"), col("ri").as("qri"))
      val d = c.join(qz,
          col("vec_id") === col("zv") && col("j") === col("zj"))
        .select(col("vec_id"), col("j"), col("ri"), col("qi"))
        .join(broadcast(q), "j")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id").as("did"))
        .agg(sum(col("qri") * col("ri")).as("fdot"),
          sum(col("qri") * col("qi")).as("qdot"))
        .localCheckpoint()
      def top5(ord: org.apache.spark.sql.Column) = d
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(ord, col("did"))))
        .where(col("rk") <= 5)
      val f5 = top5(col("fdot").desc)
      val q5 = top5(col("qdot").desc)
        .select(col("qid"), col("did"), col("rk").as("qrk"))
      val ov = f5.join(q5, Seq("qid", "did"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_overlap"))
      val t1 = f5.where(col("rk") === 1)
        .join(q5.where(col("qrk") === 1), Seq("qid", "did"), "left")
        .groupBy(col("qid"))
        .agg(max(when(col("qrk").isNotNull, 1).otherwise(0)).as("k"))
      ov.join(t1, "qid")
        .select(col("qid").as("query_id"), col("n_overlap"),
          (col("k") === 1).as("top1_kept"))
        .orderBy(col("query_id"))
    },

    // ---- padding-waste planner (length bucketing for batch shapes) ---------
    // The GPU batch-shape decision: pad every doc to the global max
    // (one batch shape, maximal waste) or to power-of-two length
    // buckets (pad-to-bucket-max)? Per bucket: docs, real tokens,
    // padded slots, waste ppm — plus the single global-max row for
    // comparison. The table that justifies length bucketing in a
    // training dataloader, in exact integers (waste = Σ(bucket_max −
    // len) against Σbucket_max slots).
    //
    // Scale shape: bucket = bit_length of the token count (scan-
    // stage); per-bucket maxima and sums are one rollup; the global
    // row is a 1-row agg unioned on.
    Q("p230_padding_waste", Some(s"""
      WITH d AS (SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS n
                 FROM documents WHERE len($wsSql) > 0),
      b AS (SELECT doc_id, n, CAST(length(bin(n)) AS BIGINT) AS bucket,
                   CAST((CAST(1 AS BIGINT) << CAST(length(bin(n)) AS INT))
                     - 1 AS BIGINT) AS cap
            FROM d),
      per AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n) AS BIGINT) AS real_tokens,
                     CAST(max(cap) AS BIGINT) AS pad_to,
                     CAST(count(*) * max(cap) - sum(n) AS BIGINT)
                       AS padding,
                     CAST((count(*) * max(cap) - sum(n)) * 1000000
                       // (count(*) * max(cap)) AS BIGINT) AS waste_ppm
              FROM b GROUP BY 1),
      gall AS (SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
                      CAST(sum(n) AS BIGINT), CAST(max(n) AS BIGINT),
                      CAST(count(*) * max(n) - sum(n) AS BIGINT),
                      CAST((count(*) * max(n) - sum(n)) * 1000000
                        // (count(*) * max(n)) AS BIGINT)
               FROM d)
      SELECT * FROM per UNION ALL SELECT * FROM gall
      ORDER BY bucket""")) { (spark, dir) =>
      import graft.ops.TextOps
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n"))
        .where(col("n") > 0)
      val b = d
        .withColumn("bucket", length(bin(col("n"))).cast("long"))
        .withColumn("cap",
          expr("shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n)) AS INT))")
            - 1)
      val per = b.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("real_tokens"),
          max(col("cap")).as("pad_to"),
          (count(lit(1)) * max(col("cap")) - sum(col("n"))).as("padding"),
          expr("(count(1) * max(cap) - sum(n)) * 1000000" +
            " div (count(1) * max(cap))").as("waste_ppm"))
      val glob = d.agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("real_tokens"), max(col("n")).as("pad_to"),
          (count(lit(1)) * max(col("n")) - sum(col("n"))).as("padding"),
          expr("(count(1) * max(n) - sum(n)) * 1000000" +
            " div (count(1) * max(n))").as("waste_ppm"))
        .select(lit(-1L).as("bucket"), col("n_docs"), col("real_tokens"),
          col("pad_to"), col("padding"), col("waste_ppm"))
      per.unionByName(glob).orderBy(col("bucket"))
    },

    // ---- dedup canary probe (pipeline self-test via injected twins) --------
    // The end-to-end health check a production dedup DAG runs every
    // cycle: INJECT synthetic canary families with known structure
    // (per source: two byte-twins built from the source name — the
    // pipeline has never seen them), run the REAL banded pipeline
    // over corpus ∪ canaries, and report per family whether its pair
    // was recovered. A canary miss means a regression somewhere in
    // tokenize→shingle→simhash→band→pair — caught by the probe, not
    // by a user. Output: per source, the expected and found canary
    // pairs and the recovered flag; real-corpus pairs are untouched
    // (canary ids live above 10^9).
    //
    // Scale shape: canaries are a tiny generated frame unioned onto
    // the scan; the pipeline is the standard banded pass; the probe
    // rollup filters to canary ids only.
    Q("p231_canary_probe", Some {
      val base = 1000000000L
      s"""
      WITH RECURSIVE srcs AS (SELECT DISTINCT source FROM documents),
      canary AS (SELECT $base + 2 * row_number() OVER (ORDER BY source)
                          AS doc_id,
                        source,
                        'canary probe family for ' || source
                          || ' alpha beta gamma delta' AS text
                 FROM srcs
                 UNION ALL
                 SELECT $base + 2 * row_number() OVER (ORDER BY source) + 1,
                        source,
                        'canary probe family for ' || source
                          || ' alpha beta gamma delta'
                 FROM srcs),
      docs2 AS (SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id, text FROM canary),
      ${Pipeline.simhash64Cte.replace("FROM documents", "FROM docs2")},
      ${Pipeline.simhashPairsCte},
      cp AS (SELECT a, b FROM spairs
             WHERE a >= $base AND b >= $base),
      fam AS (SELECT source, min(doc_id) AS lo, max(doc_id) AS hi
              FROM canary GROUP BY 1)
      SELECT fam.source, 1 AS expected_pairs,
             CAST(count(cp.a) AS BIGINT) AS found_pairs,
             count(cp.a) = 1 AS recovered
      FROM fam LEFT JOIN cp ON cp.a = fam.lo AND cp.b = fam.hi
      GROUP BY 1 ORDER BY 1"""
    }) { (spark, dir) =>
      import graft.ops.DedupOps
      val base = 1000000000L
      val srcs = Tables.load(spark, dir, "documents")
        .select(col("source")).distinct()
        .withColumn("fid", row_number().over(Window.orderBy(col("source")))
          .cast("long"))
      val canary = srcs.select(col("source"), col("fid"),
          explode(lit(Array(0, 1))).as("off"))
        .select(col("source"),
          (lit(base) + lit(2) * col("fid") + col("off")).as("doc_id"),
          concat(lit("canary probe family for "), col("source"),
            lit(" alpha beta gamma delta")).as("text"))
      val docs2 = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .unionByName(canary.select(col("doc_id"), col("text")))
      val pairs = DedupOps.simhashPairs(docs2, "doc_id", "text",
          maxHamming = 3, maxBucket = 1000)
        .where(col("a") >= base && col("b") >= base)
      val fam = canary.groupBy(col("source"))
        .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      fam.join(pairs,
          col("a") === col("lo") && col("b") === col("hi"), "left")
        .groupBy(col("source"))
        .agg(count(col("a")).as("found_pairs"))
        .select(col("source"), lit(1).as("expected_pairs"),
          col("found_pairs"), (col("found_pairs") === 1).as("recovered"))
        .orderBy(col("source"))
    },

    // ---- hash uniformity audit (chi-squared over 64 buckets) ---------------
    // Every balance claim in this library — p184's digest buckets,
    // p200's shuffle, p203's range design — rests on h60 being
    // uniform. This entry AUDITS it: doc ids hash into 64 buckets,
    // and the exact-integer chi-squared statistic Σ(64·oᵢ − N)² /
    // (64·N) (the multiply-through form — no fractional expected
    // counts) is compared against the precomputed χ²(63, 0.99)
    // critical value 92.01 embedded as 92010 milli (the lc-table
    // discipline). A failing audit here would invalidate half the
    // scale arguments above — which is exactly why it's a standing
    // query, not a one-off notebook check.
    //
    // Scale shape: one map-side bucket rollup joined onto the 64-row
    // grid; the statistic is a 1-row sum.
    Q("p232_hash_uniformity", Some(s"""
      WITH h AS (SELECT ${Portable.h60Sql("CAST(doc_id AS VARCHAR)")} % 64
                   AS bucket
                 FROM documents),
      o AS (SELECT bucket, CAST(count(*) AS BIGINT) AS o FROM h
            GROUP BY 1),
      grid AS (SELECT unnest(generate_series(0, 63)) AS bucket),
      g AS (SELECT grid.bucket, coalesce(o.o, 0) AS o
            FROM grid LEFT JOIN o ON o.bucket = grid.bucket),
      n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM g),
      x AS (SELECT CAST(sum((64 * g.o - n.n) * (64 * g.o - n.n))
                     AS BIGINT) AS xs, n.n
            FROM g, n GROUP BY n.n)
      SELECT n AS n_rows, CAST(64 AS BIGINT) AS n_buckets,
             CAST(xs * 1000 // (64 * n) AS BIGINT) AS chi2_milli,
             xs * 1000 // (64 * n) <= 92010 AS uniform_ok
      FROM x""")) { (spark, dir) =>
      import spark.implicits._
      val o = Tables.load(spark, dir, "documents")
        .select(pmod(Portable.h60(col("doc_id").cast("string")), lit(64))
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("o"))
      val g = spark.range(0, 64).select(col("id").as("bucket"))
        .join(o, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("o"), lit(0L)).as("o"))
      val n = g.agg(sum(col("o")).as("n"))
      g.crossJoin(broadcast(n))
        .agg(sum((lit(64) * col("o") - col("n"))
          * (lit(64) * col("o") - col("n"))).as("xs"),
          first(col("n")).as("n"))
        .select(col("n").as("n_rows"), lit(64L).as("n_buckets"),
          expr("xs * 1000 div (64 * n)").as("chi2_milli"),
          (expr("xs * 1000 div (64 * n)") <= 92010L).as("uniform_ok"))
    },

    // ---- source scorecard (Borda rank fusion) ------------------------------
    // One defensible ordering over sources from three incomparable
    // metrics: mean quality (higher better), dup exposure (lower
    // better), and token-length drift from the corpus mean (lower
    // better — the location term of p187's distribution drift). Each
    // metric contributes a RANK (ties → source name), Borda sums the
    // ranks, and the final ordering is the fused scorecard — rank
    // fusion needs no cross-metric calibration, same reason p221
    // fuses retrieval legs with RRF. The table a curation review
    // starts from when sources are argued over.
    //
    // Scale shape: one per-source rollup; three S-row rank windows;
    // a metadata-sized fuse.
    Q("p233_source_scorecard", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      dup AS (SELECT DISTINCT n FROM
                (SELECT a AS n FROM spairs UNION ALL SELECT b FROM spairs)),
      d AS (SELECT doc_id, source,
                   CAST(len($wsSql) AS BIGINT) AS toks,
                   CAST(round(${TextSql.quality(wsSql)} * 1000000)
                     AS BIGINT) AS qm,
                   CASE WHEN doc_id IN (SELECT n FROM dup)
                        THEN 1 ELSE 0 END AS is_dup
            FROM documents),
      gm AS (SELECT CAST(sum(toks) * 1000 // count(*) AS BIGINT)
                      AS gmean_milli FROM d),
      s AS (SELECT source,
                   CAST(sum(qm) // count(*) AS BIGINT) AS q_micro,
                   CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT)
                     AS dup_ppm,
                   abs(CAST(sum(toks) * 1000 // count(*) AS BIGINT)
                     - (SELECT gmean_milli FROM gm)) AS drift_milli
            FROM d GROUP BY 1),
      r AS (SELECT source, q_micro, dup_ppm, drift_milli,
                   row_number() OVER (ORDER BY q_micro DESC, source)
                     AS r_quality,
                   row_number() OVER (ORDER BY dup_ppm, source) AS r_dup,
                   row_number() OVER (ORDER BY drift_milli, source)
                     AS r_drift
            FROM s)
      SELECT source, CAST(r_quality AS BIGINT) AS r_quality,
             CAST(r_dup AS BIGINT) AS r_dup,
             CAST(r_drift AS BIGINT) AS r_drift,
             CAST(r_quality + r_dup + r_drift AS BIGINT) AS borda,
             CAST(row_number() OVER (ORDER BY r_quality + r_dup + r_drift,
               source) AS BIGINT) AS final_rank
      FROM r ORDER BY final_rank""")) { (spark, dir) =>
      import graft.ops.TextOps
      val sp = SharedStages.spairs(spark, dir)
      val dup = sp.select(col("a").as("doc_id"))
        .unionAll(sp.select(col("b"))).distinct()
        .withColumn("is_dup", lit(1L))
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("toks"),
          round(TextOps.qualityScore(col("text")) * 1000000, 0)
            .cast("long").as("qm"))
        .join(dup, Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
      val gm = d.agg(expr("sum(toks) * 1000 div count(1)")
        .as("gmean_milli"))
      val s = d.groupBy(col("source"))
        .agg(expr("sum(qm) div count(1)").as("q_micro"),
          expr("sum(is_dup) * 1000000 div count(1)").as("dup_ppm"),
          expr("sum(toks) * 1000 div count(1)").as("smean_milli"))
        .crossJoin(broadcast(gm))
        .withColumn("drift_milli",
          abs(col("smean_milli") - col("gmean_milli")))
      val r = s
        .withColumn("r_quality", row_number().over(
          Window.orderBy(col("q_micro").desc, col("source"))).cast("long"))
        .withColumn("r_dup", row_number().over(
          Window.orderBy(col("dup_ppm"), col("source"))).cast("long"))
        .withColumn("r_drift", row_number().over(
          Window.orderBy(col("drift_milli"), col("source"))).cast("long"))
        .withColumn("borda", col("r_quality") + col("r_dup")
          + col("r_drift"))
      r.withColumn("final_rank", row_number().over(
          Window.orderBy(col("borda"), col("source"))).cast("long"))
        .select(col("source"), col("r_quality"), col("r_dup"),
          col("r_drift"), col("borda"), col("final_rank"))
        .orderBy(col("final_rank"))
    },

    // ---- Theil–Sen robust trend of the daily event series ------------------
    // The trend estimator outliers can't drag: the MEDIAN of all
    // pairwise slopes (x_j − x_i)/(j − i) over the daily counts —
    // one spiky day corrupts the least-squares slope but moves the
    // slope MEDIAN barely at all. Slopes are sign-split milli
    // integers; the median is the exact k-th smallest by rank over
    // the bounded pair multiset (days², metadata-sized — 60 days is
    // 1 770 slopes, never a data-scale object). Missing days count
    // as zero via the p217 day grid.
    //
    // Scale shape: the day series is a bounded rollup; the pair
    // explosion and the rank are days²-bounded metadata.
    Q("p234_theilsen_trend", Some("""
      WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS x
                 FROM events GROUP BY 1),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
      days AS (SELECT b.lo + CAST(u.i AS INTEGER) AS day,
                      CAST(u.i AS BIGINT) AS t
               FROM b, (SELECT unnest(generate_series(0,
                  (SELECT CAST(hi - lo AS BIGINT) FROM b))) AS i) u),
      g AS (SELECT d.t, coalesce(e.x, 0) AS x
            FROM days d LEFT JOIN e ON e.day = d.day),
      p AS (SELECT a.t AS i, b.t AS j, a.x AS xi, b.x AS xj,
                   CASE WHEN b.x >= a.x
                        THEN (b.x - a.x) * 1000 // (b.t - a.t)
                        ELSE -((a.x - b.x) * 1000 // (b.t - a.t)) END
                     AS slope_milli
            FROM g a, g b WHERE b.t > a.t),
      r AS (SELECT slope_milli, row_number() OVER (ORDER BY slope_milli)
                     AS rk, count(*) OVER () AS m
            FROM p)
      SELECT CAST((SELECT count(*) FROM g) AS BIGINT) AS n_days,
             CAST(m AS BIGINT) AS n_pairs,
             CAST(slope_milli AS BIGINT) AS median_slope_milli
      FROM r WHERE rk = (m + 1) // 2""")) { (spark, dir) =>
      val e = Tables.load(spark, dir, "events")
        .groupBy(date_trunc("DAY", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val b = e.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val days = b.select(explode(
          expr("sequence(lo, hi, interval 1 day)")).as("day"))
        .withColumn("t", (row_number().over(Window.orderBy(col("day")))
          - 1).cast("long"))
      val g = days.join(e, Seq("day"), "left")
        .select(col("t"), coalesce(col("x"), lit(0L)).as("x"))
        .localCheckpoint()
      val p = g.select(col("t").as("i"), col("x").as("xi"))
        .join(g.select(col("t").as("j"), col("x").as("xj")),
          col("j") > col("i"))
        .select(when(col("xj") >= col("xi"),
            expr("(xj - xi) * 1000 div (j - i)"))
          .otherwise(-expr("(xi - xj) * 1000 div (j - i)"))
          .as("slope_milli"))
      val nDays = g.count()
      val r = p.withColumn("rk", row_number().over(
          Window.orderBy(col("slope_milli"))))
        .withColumn("m", count(lit(1)).over(
          Window.partitionBy()))
      r.where(col("rk") === expr("(m + 1) div 2"))
        .select(lit(nDays).as("n_days"), col("m").as("n_pairs"),
          col("slope_milli").as("median_slope_milli"))
    },

    // ---- Markov stationary mix (exact-integer power iteration) -------------
    // Where does user behavior SETTLE? The stationary distribution of
    // p156's event-type chain, by eight unrolled power-iteration
    // rounds in EXACT integer arithmetic: transition rows are ppm
    // integers that sum to exactly 1e6 per state (p170's largest-
    // remainder applied per row), and each round's π·P product —
    // exact 1e12-unit integers — is renormalized back to a 1e6-sum
    // ppm vector by the SAME largest-remainder rule. No floats, no
    // drifting mass: every intermediate vector sums to exactly one.
    // Output: the settled mix per state plus the last round's
    // movement (the convergence evidence). The iterative-linear-
    // algebra shape (PageRank's little sibling) with the exactness
    // discipline the rest of the library runs on.
    //
    // Scale shape: states are event types — the chain is metadata;
    // eight bounded rounds of (join + rollup + rank) over S rows.
    // (A billion-state chain would shard the vector by state key;
    // the per-round shape is unchanged.)
    Q("p235_stationary_mix", Some {
      def hamilton(src: String, out: String, part: String): String = {
        val pb = if (part.isEmpty) "" else s"PARTITION BY $part "
        val pbc = if (part.isEmpty) "" else s"PARTITION BY $part"
        s"""f$out AS MATERIALIZED (SELECT *, 1000000 * w // tw AS fl,
                   1000000 * w % tw AS rem FROM $src),
        $out AS MATERIALIZED (SELECT ${if (part.isEmpty) "" else s"$part, "}s,
                   CAST(fl + CASE WHEN row_number() OVER (${pb}ORDER BY
                     rem DESC, s) <= 1000000 - sum(fl) OVER ($pbc)
                     THEN 1 ELSE 0 END AS BIGINT) AS pi
                 FROM f$out)"""
      }
      def round(r: Int): String = s"""
        m$r AS MATERIALIZED (SELECT p.nxt AS s,
                  CAST(sum(pi${r - 1}.pi * p.ppm) AS BIGINT) AS w
                FROM p JOIN pi${r - 1} ON pi${r - 1}.s = p.cur
                GROUP BY 1),
        mt$r AS MATERIALIZED (SELECT m$r.*,
                   (SELECT CAST(sum(w) AS BIGINT) FROM m$r)
                   AS tw FROM m$r),
        ${hamilton(s"mt$r", s"pi$r", "")}"""
      s"""
      WITH seq AS MATERIALIZED (SELECT user_id, event_type AS cur,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
                   FROM events),
      tr AS MATERIALIZED (SELECT cur, nxt, CAST(count(*) AS BIGINT)
               AS cnt FROM seq
             WHERE nxt IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT cur, CAST(sum(cnt) AS BIGINT) AS tw FROM tr
              GROUP BY 1),
      trw AS (SELECT tr.cur, tr.nxt AS s, tr.cnt AS w, tot.tw
              FROM tr JOIN tot USING (cur)),
      ${hamilton("trw", "pr", "cur")},
      p AS MATERIALIZED (SELECT cur, s AS nxt, pi AS ppm FROM pr),
      st AS (SELECT DISTINCT cur AS s FROM tr),
      c0 AS (SELECT s, count(*) OVER () AS k,
                    row_number() OVER (ORDER BY s) AS rn FROM st),
      pi0 AS (SELECT s, CAST(1000000 // k
                + CASE WHEN rn <= 1000000 % k THEN 1 ELSE 0 END
                AS BIGINT) AS pi FROM c0),
      ${(1 to 8).map(round).mkString(",\n")}
      SELECT pi8.s AS state, pi8.pi AS pi_ppm, pi7.pi AS prev_ppm,
             CAST(abs(pi8.pi - pi7.pi) AS BIGINT) AS delta_ppm,
             (SELECT max(abs(a.pi - b.pi)) FROM pi8 a
              JOIN pi7 b ON b.s = a.s) <= 1000 AS converged
      FROM pi8 JOIN pi7 ON pi7.s = pi8.s
      ORDER BY state"""
    }) { (spark, dir) =>
      import org.apache.spark.sql.DataFrame
      // exact largest-remainder renormalization of (s, w) to a
      // 1e6-sum ppm vector — the p170 rule as a reusable step
      def hamilton(m: DataFrame): DataFrame = {
        val t = m.agg(sum(col("w")).as("tw"))
        m.crossJoin(broadcast(t))
          .withColumn("fl", expr("1000000 * w div tw"))
          .withColumn("rem", expr("1000000 * w % tw"))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("rem").desc, col("s"))))
          .withColumn("left_seats",
            lit(1000000L) - sum(col("fl")).over(Window.partitionBy()))
          .select(col("s"),
            (col("fl") + when(col("rn") <= col("left_seats"), 1L)
              .otherwise(0L)).as("pi"))
      }
      val seq = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type").as("cur"),
          lead(col("event_type"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))).as("nxt"))
        .where(col("nxt").isNotNull)
      val tr = seq.groupBy(col("cur"), col("nxt"))
        .agg(count(lit(1)).as("cnt"))
      val tot = tr.groupBy(col("cur")).agg(sum(col("cnt")).as("tw"))
      // per-cur exact ppm rows (p170 within each cur)
      val p = tr.join(tot, "cur")
        .withColumn("fl", expr("1000000 * cnt div tw"))
        .withColumn("rem", expr("1000000 * cnt % tw"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("cur"))
            .orderBy(col("rem").desc, col("nxt"))))
        .withColumn("left_seats", lit(1000000L)
          - sum(col("fl")).over(Window.partitionBy(col("cur"))))
        .select(col("cur"), col("nxt"),
          (col("fl") + when(col("rn") <= col("left_seats"), 1L)
            .otherwise(0L)).as("ppm"))
        .localCheckpoint()
      val st = tr.select(col("cur").as("s")).distinct()
      val pi0 = st
        .withColumn("k", count(lit(1)).over(Window.partitionBy()))
        .withColumn("rn", row_number().over(Window.orderBy(col("s"))))
        .select(col("s"), (expr("1000000 div k")
          + when(col("rn") <= expr("1000000 % k"), 1L).otherwise(0L))
          .as("pi"))
      var pis = List(pi0.localCheckpoint())
      for (r <- 1 to 8) {
        val prev = pis.head
        val m = p.join(prev.select(col("s").as("cur"), col("pi")), "cur")
          .groupBy(col("nxt").as("s"))
          .agg(sum(col("pi") * col("ppm")).as("w"))
        // per-round checkpoint is LOAD-BEARING here: hamilton evaluates
        // its input twice (crossJoin with its own 1-row aggregate), so
        // chaining k unmaterialized rounds re-evaluates the prefix 2^k
        // times (r20 measured the every-3rd-round variant at 23 s vs
        // 3 s — reverted)
        pis = hamilton(m).localCheckpoint() :: pis
      }
      val pi8 = pis.head
      val pi7 = pis(1)
      val conv = pi8.join(pi7.select(col("s"), col("pi").as("pp")), "s")
        .agg(max(abs(col("pi") - col("pp"))).as("mx"))
      pi8.join(pi7.select(col("s"), col("pi").as("prev_ppm")), "s")
        .crossJoin(broadcast(conv))
        .select(col("s").as("state"), col("pi").as("pi_ppm"),
          col("prev_ppm"),
          abs(col("pi") - col("prev_ppm")).as("delta_ppm"),
          (col("mx") <= 1000).as("converged"))
        .orderBy(col("state"))
    }
  )
}
