package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ops.{Portable, TextOps}

/** Round-8 pipeline entries, second batch: BPE tokenizer application,
  * product-quantization ANN compression, Z-order storage layout, and
  * link-graph extraction — the serving/layout side of the curation
  * stack (p46 trains BPE merge candidates, p35/p60 cover scalar
  * quantization and IVF; these add the apply/compress/cluster steps a
  * 100 TB pipeline runs after training).
  */
object Pipeline7 {

  private val wsSql = TextSql.ws

  /** The fixed learned BPE merge list for p87, in rank order. Single
    * source of truth: the Spark expression chain AND the DuckDB oracle
    * SQL are both generated from this Seq, so the two sides cannot
    * drift. Ranks cascade deliberately (th→the, sc+an→scan,
    * at+ch→atch→batch, sp+ar+k→spark) to exercise merges whose inputs
    * are themselves merge outputs — the property that makes BPE
    * application inherently sequential in rank order.
    */
  private[graft] val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "a" -> "n", "i" -> "n", "e" -> "r",
    "s" -> "c", "sc" -> "an", "o" -> "w", "a" -> "t", "c" -> "h",
    "at" -> "ch", "b" -> "atch", "j" -> "o", "jo" -> "in",
    "a" -> "r", "s" -> "p", "sp" -> "ar", "spar" -> "k")

  /** Spark-side BPE encode of one word column: wrap every character in
    * parentheses — "(b)(a)(t)" — then apply each merge in rank order as
    * a literal replace of "(a)(b)" with "(ab)". The parenthesis framing
    * is what makes a plain string replace a CORRECT symbol-pair merge:
    * adjacent matches share no characters (unlike space-separated
    * symbols, where "a b a b" leaves the second pair unmerged after the
    * first replace consumes the shared space), and a pair pattern can
    * never match across a symbol boundary ("(ba)(c)" does not contain
    * "(a)(c)").
    */
  private[graft] def bpeEncode(w: Column): Column =
    bpeMerges.foldLeft(regexp_replace(w, "(.)", "($1)")) {
      case (e, (a, b)) =>
        call_function("replace", e, lit(s"($a)($b)"), lit(s"($a$b)"))
    }

  /** DuckDB mirror of [[bpeEncode]], generated from the same merge list. */
  private[graft] def bpeEncodeSql(w: String): String =
    bpeMerges.foldLeft(raw"regexp_replace($w, '(.)', '(\1)', 'g')") {
      case (e, (a, b)) => s"replace($e, '($a)($b)', '($a$b)')"
    }

  val all: Seq[Q] = Seq(

    // ---- BPE tokenizer application (the serving side of p46) ---------------
    // p46 counts merge CANDIDATES (one training step); this applies a
    // learned merge list in rank order to every document — the encode
    // pass a training pipeline runs over the full corpus to produce
    // token ids/counts. Scale shape: the entire encode is a row-local
    // expression chain (char wrap + 18 literal replaces) inside
    // whole-stage codegen — the scan IS the tokenizer, zero shuffle,
    // no UDF; the merge table is plan-time constant (vocab-sized,
    // exactly what production bakes into the job). The md5 of the full
    // encoded symbol stream makes the oracle verify every merge
    // application bit-for-bit, not just the counts.
    Q("p87_bpe_apply", Some(s"""
      WITH t AS (SELECT doc_id,
                        array_to_string(list_transform($wsSql,
                          w -> ${bpeEncodeSql("w")}), ' ') AS enc,
                        CAST(len($wsSql) AS BIGINT) AS n_words,
                        CAST(length(replace(lower(text), ' ', '')) AS BIGINT) AS n_chars
                 FROM documents)
      SELECT doc_id, n_words, n_chars,
             CAST(length(enc) - length(replace(enc, '(', '')) AS BIGINT) AS n_sym,
             md5(enc) AS enc_md5
      FROM t ORDER BY doc_id""")) { (spark, dir) =>
      val enc = concat_ws(" ",
        transform(TextOps.tokens(col("text")), w => bpeEncode(w)))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), enc.as("enc"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_words"),
          length(call_function("replace", lower(col("text")), lit(" "), lit("")))
            .cast("long").as("n_chars"))
        .select(col("doc_id"), col("n_words"), col("n_chars"),
          (length(col("enc")) -
            length(call_function("replace", col("enc"), lit("("), lit(""))))
            .cast("long").as("n_sym"),
          md5(col("enc")).as("enc_md5"))
        .orderBy(col("doc_id"))
    },

    // ---- product quantization encode + ADC top-k ---------------------------
    // The 100 TB embedding-serving compression path the ANN stack
    // (p10/p11/p26/p60) was missing: split the 64-dim vector into 8
    // subspaces of 8 dims, quantize each subvector to a 4-bit code
    // against a 16-entry per-subspace codebook (here seeded from a
    // deterministic hash-ranked sample of the corpus — the k-means++
    // init; p56's trained variant plugs into the same shape), then
    // answer a query by ASYMMETRIC DISTANCE COMPUTATION: one 8×16
    // distance table per query, approx distance = 8 table lookups per
    // vector. 64 floats → 8 nibbles is the 16× memory cut that lets a
    // 100 TB embedding corpus serve from RAM. All arithmetic in integer
    // micro-units (p35's convention) so codes, ADC and exact distances
    // are bit-exact cross-engine.
    //
    // Scale shape: codebook = 128 rows, broadcast everywhere; encode is
    // ONE shuffle of (vec, sub, code) partial distances with map-side
    // combine, argmin = struct-min aggregate (NOT a window); the
    // distance table is query-local; top-k = orderBy+limit →
    // TakeOrderedAndProject (O(partitions×k) movement). The only
    // window is the row_number over the 16-row seed sample — the
    // documented broadcast-scalar exception.
    Q("p88_pq_adc", Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, (i-1) // 8 AS sub, (i-1) % 8 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      seeds AS (SELECT vec_id, rn - 1 AS code FROM
                  (SELECT vec_id, row_number() OVER (ORDER BY
                     ${Portable.h60Sql("concat('pq:', CAST(vec_id AS VARCHAR))")},
                     vec_id) AS rn
                   FROM embeddings) WHERE rn <= 16),
      cb AS (SELECT s.code, c.sub, c.j, c.ri AS cv
             FROM seeds s JOIN c ON c.vec_id = s.vec_id),
      d AS (SELECT c.vec_id, c.sub, cb.code,
                   SUM((c.ri - cb.cv) * (c.ri - cb.cv)) AS d
            FROM c JOIN cb ON cb.sub = c.sub AND cb.j = c.j
            GROUP BY 1, 2, 3),
      enc AS (SELECT vec_id, sub, code FROM
                (SELECT vec_id, sub, code, row_number() OVER
                   (PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM d)
              WHERE rn = 1),
      q AS (SELECT sub, j, ri AS qri FROM c WHERE vec_id = 0),
      dt AS (SELECT cb.sub, cb.code,
                    SUM((q.qri - cb.cv) * (q.qri - cb.cv)) AS qd
             FROM cb JOIN q ON q.sub = cb.sub AND q.j = cb.j GROUP BY 1, 2),
      adc AS (SELECT e.vec_id, CAST(SUM(dt.qd) AS BIGINT) AS adc_dist
              FROM enc e JOIN dt ON dt.sub = e.sub AND dt.code = e.code
              GROUP BY 1),
      ex AS (SELECT c.vec_id, CAST(SUM((c.ri - q.qri) * (c.ri - q.qri)) AS BIGINT) AS exact_dist
             FROM c JOIN q ON q.sub = c.sub AND q.j = c.j GROUP BY 1)
      SELECT adc.vec_id, adc.adc_dist, ex.exact_dist
      FROM adc JOIN ex ON ex.vec_id = adc.vec_id
      ORDER BY adc.adc_dist, adc.vec_id LIMIT 10""")) { (spark, dir) =>
      import graft.ops.SimilarityOps._
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val c = pqComponents(emb, "vec_id", "embedding", subDim = 8)
      val cb = pqSeedCodebook(emb, "vec_id", "embedding",
        subDim = 8, ks = 16, salt = "pq")
      pqAdcTopK(pqEncode(c, cb), cb, c, queryId = 0L, k = 10)
    },

    // ---- Z-order (Morton) layout clustering + data-skipping evidence -------
    // The storage-layout op a 100 TB table needs BEFORE any scan
    // optimization can bite: interleave the bits of two normalized
    // scan-predicate columns into a 32-bit Morton code, range-bucket on
    // it, and report per-bucket bounding boxes — the min/max file
    // statistics a writer would persist. The `pruned` column is the
    // point: for a 10%×10% query box, a ONE-dimensional sort key (the
    // z-code) skips most buckets on BOTH dimensions — what plain
    // sorting by either column alone cannot do. In production the
    // buckets are `repartitionByRange($"z")` write partitions and the
    // bbox table is the parquet footer min/max; this entry computes
    // exactly those statistics.
    //
    // Scale shape: the z-code is a row-local bit expression in the scan
    // stage (whole-stage codegen, generated from one Scala loop for
    // both engines); global min/max = a 1-row agg broadcast back; the
    // bucket rollup is one partial-aggregated 64-key shuffle. Nothing
    // is ordered globally — range-bucketing replaces the global sort.
    Q("p89_zorder_layout", Some(s"""
      WITH t AS (SELECT CAST(l_partkey AS BIGINT) AS x,
                        CAST(l_suppkey AS BIGINT) AS y FROM lineitem),
      g AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1 FROM t),
      n AS (SELECT x, y,
                   (x - x0) * 65535 // greatest(x1 - x0, 1) AS xn,
                   (y - y0) * 65535 // greatest(y1 - y0, 1) AS yn FROM t, g),
      z AS (SELECT x, y, ${mortonSql("xn", "yn")} AS z FROM n),
      b AS (SELECT z >> 26 AS bucket, CAST(count(*) AS BIGINT) AS n,
                   min(x) AS x_min, max(x) AS x_max,
                   min(y) AS y_min, max(y) AS y_max
            FROM z GROUP BY 1),
      q AS (SELECT x0 + (x1 - x0) * 45 // 100 AS qx1,
                   x0 + (x1 - x0) * 55 // 100 AS qx2,
                   y0 + (y1 - y0) * 45 // 100 AS qy1,
                   y0 + (y1 - y0) * 55 // 100 AS qy2 FROM g)
      SELECT bucket, n, x_min, x_max, y_min, y_max,
             (x_max - x_min + 1) * (y_max - y_min + 1) AS bbox_area,
             NOT (x_max >= qx1 AND x_min <= qx2
                  AND y_max >= qy1 AND y_min <= qy2) AS pruned
      FROM b, q ORDER BY bucket""")) { (spark, dir) =>
      val t = Tables.loadSpread(spark, dir, "lineitem")
        .select(col("l_partkey").cast("long").as("x"),
          col("l_suppkey").cast("long").as("y"))
      val g = t.agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      val n = t.crossJoin(broadcast(g))
        .withColumn("xn", expr("(x - x0) * 65535 div greatest(x1 - x0, 1)"))
        .withColumn("yn", expr("(y - y0) * 65535 div greatest(y1 - y0, 1)"))
      val b = n.select(col("x"), col("y"), morton(col("xn"), col("yn")).as("z"))
        .groupBy(shiftright(col("z"), 26).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      val q = g.select(
        expr("x0 + (x1 - x0) * 45 div 100").as("qx1"),
        expr("x0 + (x1 - x0) * 55 div 100").as("qx2"),
        expr("y0 + (y1 - y0) * 45 div 100").as("qy1"),
        expr("y0 + (y1 - y0) * 55 div 100").as("qy2"))
      b.crossJoin(broadcast(q))
        .select(col("bucket"), col("n"),
          col("x_min"), col("x_max"), col("y_min"), col("y_max"),
          ((col("x_max") - col("x_min") + 1) *
            (col("y_max") - col("y_min") + 1)).as("bbox_area"),
          (!(col("x_max") >= col("qx1") && col("x_min") <= col("qx2") &&
            col("y_max") >= col("qy1") && col("y_min") <= col("qy2"))).as("pruned"))
        .orderBy(col("bucket"))
    },

    // ---- link-graph extraction from HTML → domain in-link rollup -----------
    // The crawl-graph op between p85 (boilerplate strip) and p63
    // (PageRank): documents are wrapped in HTML carrying 1–3 <a href>
    // links whose targets derive arithmetically from doc fields; the
    // ENGINE recovers the edge list the hard way — regexp_extract_all
    // over the markup, then parse_url HOST per href — while the oracle
    // computes the same targets arithmetically (the p84/p85 synthesized-
    // input pattern: the parse chain is what is under test). The rollup
    // is the domain-level in-link table (total inlinks, distinct
    // linking domains, self-links) that seeds every authority signal.
    //
    // Scale shape: href extraction + host parse are row-local regex
    // chains in the scan stage; the only shuffle is the rollup keyed by
    // destination domain (domains ≪ docs, so the result is broadcast-
    // sized — same property p86 exploits); p63's PageRank consumes this
    // edge list unchanged.
    Q("p90_link_graph", Some("""
      WITH d AS (SELECT doc_id, source, CAST(substr(source, 4) AS INT) AS si,
                        doc_id % 3 + 1 AS k FROM documents),
      e0 AS (SELECT source, si, doc_id,
                    unnest(generate_series(0, k - 1)) AS i FROM d),
      e AS (SELECT source || '.example.com' AS src_dom,
                   'src' || CAST((si * 7 + doc_id + i * 13) % 20 AS VARCHAR)
                     || '.example.com' AS dst_dom
            FROM e0)
      SELECT dst_dom, CAST(count(*) AS BIGINT) AS n_inlinks,
             CAST(count(DISTINCT src_dom) AS BIGINT) AS n_src_domains,
             CAST(sum(CASE WHEN dst_dom = src_dom THEN 1 ELSE 0 END) AS BIGINT) AS n_self
      FROM e GROUP BY dst_dom ORDER BY dst_dom""")) { (spark, dir) =>
      val si = expr("substr(source, 4)").cast("int")
      val k = col("doc_id") % 3 + 1
      val links = concat_ws("", transform(sequence(lit(0L), k - 1), i =>
        concat(lit("<a href=\"http://src"),
          ((si * 7 + col("doc_id") + i * 13) % 20).cast("string"),
          lit(".example.com/p"),
          ((col("doc_id") * 31 + i) % 50).cast("string"),
          lit("?ref=1\">x</a>"))))
      val html = concat(lit("<html><body>"), links, col("text"),
        lit("</body></html>"))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("source"),
          explode(regexp_extract_all(html, lit("<a href=\"([^\"]+)\""), lit(1)))
            .as("href"))
        .select(concat(col("source"), lit(".example.com")).as("src_dom"),
          parse_url(col("href"), lit("HOST")).as("dst_dom"))
        .groupBy(col("dst_dom"))
        .agg(count(lit(1)).as("n_inlinks"),
          countDistinct(col("src_dom")).as("n_src_domains"),
          sum(when(col("dst_dom") === col("src_dom"), 1L).otherwise(0L)).as("n_self"))
        .orderBy(col("dst_dom"))
    }
  )

  /** 16-bit × 16-bit Morton interleave as a Column expression; x gets
    * the odd bit positions, y the even. Generated by the same loop as
    * [[mortonSql]] so the two engines cannot drift.
    */
  private[graft] def morton(xn: Column, yn: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      acc.bitwiseOR(shiftleft(shiftright(xn, b).bitwiseAND(lit(1L)), 2 * b + 1))
        .bitwiseOR(shiftleft(shiftright(yn, b).bitwiseAND(lit(1L)), 2 * b))
    }

  /** DuckDB mirror of [[morton]]. */
  private def mortonSql(xn: String, yn: String): String =
    (0 until 16).map(b =>
      s"((($xn >> $b) & 1) << ${2 * b + 1}) | ((($yn >> $b) & 1) << ${2 * b})")
      .mkString("(", " | ", ")")
}
