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
    },

    // ---- content-defined chunking (CDC) cross-doc dedup --------------------
    // Storage-layer dedup below the token level: split each payload at
    // positions where the trailing 8-char window hash ≡ 0 (mod 64) —
    // LBFS-style window-hash CDC, expected chunk ≈ 64 chars — then
    // measure how much of every document is made of chunks shared with
    // other documents. The fixture welds a per-source boilerplate
    // footer onto each doc: CDC re-synchronizes on the identical
    // suffix no matter how long the preceding text is (the property
    // fixed-size blocking lacks — proven in PipelineOpsSpec), so the
    // footer chunks dedup across every doc of the source while the
    // body stays unique. p33 dedups token segments; this dedups BYTES,
    // the level a 100 TB object store actually bills.
    //
    // Scale shape: chunking is ONE static kernel call per row inside
    // whole-stage codegen (graft.functions.Cdc — a rolling code-point
    // window hash, no per-character explode, no interpreted
    // per-position lambda); the only shuffles
    // are the chunk-keyed partial-agg count and the chunk-keyed join
    // (production keys both on the 60-bit chunk hash for constant-width
    // exchange; the string key here keeps the oracle 1:1).
    Q("p91_cdc_chunks", Some(s"""
      WITH d AS (SELECT doc_id,
                        text || ' ' || repeat('ad unit for ' || source || ' visit now ', 4) AS payload
                 FROM documents),
      b AS (SELECT doc_id, payload, CAST(length(payload) AS BIGINT) AS n,
                   [CAST(i AS BIGINT) for i in generate_series(8, length(payload))
                    if ${graft.functions.Cdc.boundarySql("payload", 8, 64)}] AS bs
            FROM d),
      p AS (SELECT doc_id, payload,
                   list_prepend(CAST(0 AS BIGINT), list_append(bs, n)) AS pos FROM b),
      c0 AS (SELECT doc_id,
                    unnest([substr(payload, CAST(pos[k] + 1 AS INT),
                                   CAST(pos[k+1] - pos[k] AS INT))
                            for k in generate_series(1, len(pos) - 1)]) AS chunk
             FROM p),
      c AS (SELECT doc_id, chunk FROM c0 WHERE length(chunk) > 0),
      g AS (SELECT chunk, count(DISTINCT doc_id) AS n_docs FROM c GROUP BY 1),
      j AS (SELECT c.doc_id, length(c.chunk) AS clen, g.n_docs
            FROM c JOIN g ON g.chunk = c.chunk)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(clen) AS BIGINT) AS n_chars,
             CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             CAST(sum(CASE WHEN n_docs > 1 THEN clen ELSE 0 END) * 1000000
                  // sum(clen) AS BIGINT) AS dup_char_ppm
      FROM j GROUP BY doc_id ORDER BY doc_id""")) { (spark, dir) =>
      val payload = concat(col("text"), lit(" "),
        repeat(concat(lit("ad unit for "), col("source"), lit(" visit now ")), 4))
      val c = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.cdcChunks(payload, window = 8, modulus = 64)).as("chunk"))
      val g = c.groupBy(col("chunk"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      c.join(g, "chunk")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(length(col("chunk"))).cast("long").as("n_chars"),
          sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"),
          expr("sum(CASE WHEN n_docs > 1 THEN length(chunk) ELSE 0 END) * 1000000" +
            " div sum(length(chunk))").as("dup_char_ppm"))
        .orderBy(col("doc_id"))
    },

    // ---- incremental IVF maintenance + drift detection ---------------------
    // What keeps a 100 TB ANN index alive between retrains: new
    // embedding batches are assigned to the EXISTING coarse centroids
    // (touching only the delta — the corpus's bucket counts are
    // materialized index metadata), and the batch's bucket-occupancy
    // profile is compared against the index's to decide when the
    // centroids have gone stale. Fixture: vec_id % 10 == 0 is the
    // arriving delta, the rest is the indexed base; 8 centroids are
    // hash-seeded from the BASE only (p56's trained centroids plug into
    // the same shape). Assignment reuses the p88 PQ kernels with ONE
    // 64-dim subspace — IVF coarse assignment IS product quantization
    // with m=1. skew_milli = |base share − delta share| per bucket in
    // exact thousandths; its max is the retrain trigger.
    //
    // Scale shape: centroid table = 8 rows broadcast; assignment = one
    // partial-agg shuffle of (vec, code) distances + struct-min argmin;
    // the drift rollup is 8 rows crossed with a broadcast 1-row total.
    Q("p92_ivf_incremental", Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, (i-1) AS j, CAST(round(x * 1000000) AS BIGINT) AS ri
            FROM cx),
      seeds AS (SELECT vec_id, rn - 1 AS code FROM
                  (SELECT vec_id, row_number() OVER (ORDER BY
                     ${Portable.h60Sql("concat('ivfinc:', CAST(vec_id AS VARCHAR))")},
                     vec_id) AS rn
                   FROM embeddings WHERE vec_id % 10 != 0) WHERE rn <= 8),
      cb AS (SELECT s.code, c.j, c.ri AS cv
             FROM seeds s JOIN c ON c.vec_id = s.vec_id),
      d AS (SELECT c.vec_id, cb.code, SUM((c.ri - cb.cv) * (c.ri - cb.cv)) AS d
            FROM c JOIN cb ON cb.j = c.j GROUP BY 1, 2),
      asg AS (SELECT vec_id, code AS bucket FROM
                (SELECT vec_id, code, row_number() OVER
                   (PARTITION BY vec_id ORDER BY d, code) AS rn FROM d)
              WHERE rn = 1),
      g AS (SELECT bucket,
                   CAST(sum(CASE WHEN vec_id % 10 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
                   CAST(sum(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta
            FROM asg GROUP BY 1),
      t AS (SELECT sum(n_base) AS tb, sum(n_delta) AS td FROM g)
      SELECT bucket, n_base, n_delta,
             CAST(n_base * 1000 // tb AS BIGINT) AS base_milli,
             CAST(n_delta * 1000 // td AS BIGINT) AS delta_milli,
             CAST(abs(n_base * 1000 // tb - n_delta * 1000 // td) AS BIGINT) AS skew_milli
      FROM g, t ORDER BY bucket""")) { (spark, dir) =>
      import graft.ops.SimilarityOps._
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 10 =!= 0)
      val c = pqComponents(emb, "vec_id", "embedding", subDim = 64)
      val cb = pqSeedCodebook(base, "vec_id", "embedding",
        subDim = 64, ks = 8, salt = "ivfinc")
      val g = pqEncode(c, cb)
        .select(col("vec_id"), col("code").as("bucket"))
        .groupBy(col("bucket"))
        .agg(sum(when(col("vec_id") % 10 =!= 0, 1L).otherwise(0L)).as("n_base"),
          sum(when(col("vec_id") % 10 === 0, 1L).otherwise(0L)).as("n_delta"))
      val t = g.agg(sum(col("n_base")).as("tb"), sum(col("n_delta")).as("td"))
      g.crossJoin(broadcast(t))
        .select(col("bucket"), col("n_base"), col("n_delta"),
          expr("n_base * 1000 div tb").as("base_milli"),
          expr("n_delta * 1000 div td").as("delta_milli"),
          expr("abs(n_base * 1000 div tb - n_delta * 1000 div td)").as("skew_milli"))
        .orderBy(col("bucket"))
    },

    // ---- training-mixture epoch planner ------------------------------------
    // The step between corpus statistics and the data loader: given
    // per-source token inventories and mixture weights, allocate a
    // global token budget (half the corpus here) proportionally to
    // weight×inventory, convert each source's allocation into an epoch
    // (repeat) factor in exact milli-epochs, cap repetition at 4
    // epochs (the over-sampling guard every published mixture applies),
    // and account the deficit the cap leaves unfilled. p34 gates
    // DOWN-sampling to a target share; this plans UP-sampling — how
    // many times a scarce high-weight source is repeated per pass.
    //
    // Scale shape: one partial-agg rollup to sources (broadcast-sized
    // by construction), a 1-row total crossed back, then row-local
    // integer arithmetic. The planner output IS the broadcast table
    // p94's manifest materialization consumes.
    Q("p93_epoch_plan", Some(s"""
      WITH d AS (SELECT source, CAST(substr(source, 4) AS INT) AS si,
                        CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(sum(len($wsSql)) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY 1, 2),
      w AS (SELECT source, n_docs, n_tokens,
                   CAST(1 + (si * 3) % 5 AS BIGINT) AS weight FROM d),
      t AS (SELECT sum(n_tokens) // 2 AS budget,
                   sum(n_tokens * weight) AS tw FROM w)
      SELECT source, n_docs, n_tokens, weight,
             CAST(budget * (n_tokens * weight) // tw AS BIGINT) AS target_tokens,
             CAST(budget * (n_tokens * weight) // tw * 1000 // n_tokens AS BIGINT) AS epochs_milli,
             CAST(least(budget * (n_tokens * weight) // tw * 1000 // n_tokens,
                        4000) AS BIGINT) AS epochs_capped_milli,
             CAST(least(budget * (n_tokens * weight) // tw, 4 * n_tokens) AS BIGINT) AS realized_tokens,
             CAST(budget * (n_tokens * weight) // tw
                  - least(budget * (n_tokens * weight) // tw, 4 * n_tokens) AS BIGINT) AS deficit_tokens
      FROM w, t ORDER BY source""")) { (spark, dir) =>
      val w = Tables.loadSpread(spark, dir, "documents")
        .select(col("source"), expr("CAST(substr(source, 4) AS INT)").as("si"),
          TextOps.tokenCount(col("text")).as("n_tok"))
        .groupBy(col("source"), col("si"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("weight", (lit(1) + (col("si") * 3) % 5).cast("long"))
      val t = w.agg((sum(col("n_tokens")) / 2).cast("long").as("budget"),
        sum(col("n_tokens") * col("weight")).as("tw"))
      w.crossJoin(broadcast(t))
        .withColumn("target_tokens", expr("budget * (n_tokens * weight) div tw"))
        .withColumn("epochs_milli", expr("target_tokens * 1000 div n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
          col("target_tokens"), col("epochs_milli"),
          least(col("epochs_milli"), lit(4000L)).as("epochs_capped_milli"),
          least(col("target_tokens"), expr("4 * n_tokens")).as("realized_tokens"),
          (col("target_tokens") -
            least(col("target_tokens"), expr("4 * n_tokens"))).as("deficit_tokens"))
        .orderBy(col("source"))
    },

    // ---- upsampling manifest materialization -------------------------------
    // Turning an epoch plan into the thing the data loader reads: every
    // document receives floor(rate) whole copies plus one more iff its
    // salted hash falls under the fractional remainder — deterministic
    // Bernoulli rounding, so the manifest is bit-reproducible on any
    // cluster and NEVER uses rand(). The copies are MATERIALIZED
    // (posexplode of a sequence — the corpus×epochs row multiplication
    // a real loader pays) and then rolled back up per source to prove
    // the realized rate lands within one per-mille quantum of the plan.
    //
    // Scale shape: the explode multiplies rows by the epoch factor —
    // exactly the blowup the training job itself reads, sized by the
    // plan's cap (≤4×); rates are row-local arithmetic on the source
    // index (p93's broadcast plan table in production); one rollup
    // shuffle keyed by source.
    Q("p94_upsample_manifest", Some(s"""
      WITH d AS (SELECT doc_id, source, CAST(substr(source, 4) AS INT) AS si
                 FROM documents),
      r AS (SELECT doc_id, source,
                   CAST(250 + (si * 997) % 3500 AS BIGINT) AS rate_milli,
                   CASE WHEN ${Portable.h60Sql("concat('ep:', CAST(doc_id AS VARCHAR))")}
                          % 1000 < (250 + (si * 997) % 3500) % 1000
                        THEN 1 ELSE 0 END AS bump FROM d),
      m AS (SELECT doc_id, source, rate_milli, bump,
                   unnest(generate_series(1, rate_milli // 1000 + bump)) AS copy_idx
            FROM r),
      s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM d GROUP BY 1),
      g AS (SELECT source, min(rate_milli) AS rate_milli,
                   CAST(count(*) AS BIGINT) AS n_manifest,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_in,
                   CAST(sum(CASE WHEN copy_idx = 1 THEN bump ELSE 0 END) AS BIGINT) AS n_bumped
            FROM m GROUP BY source)
      SELECT g.source, g.rate_milli, g.n_manifest, g.n_docs_in, g.n_bumped,
             CAST(g.n_manifest * 1000 // s.n_src AS BIGINT) AS realized_milli
      FROM g JOIN s ON s.source = g.source ORDER BY g.source""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          expr("CAST(substr(source, 4) AS INT)").as("si"))
      val r = docs
        .withColumn("rate_milli", (lit(250) + (col("si") * 997) % 3500).cast("long"))
        .withColumn("bump",
          when(Portable.h60(concat(lit("ep:"), col("doc_id").cast("string")))
            % 1000 < col("rate_milli") % 1000, 1L).otherwise(0L))
      // Spark's sequence() steps DOWNWARD when start > stop, so a
      // zero-copy doc (rate < 1000, no bump) must explode an empty
      // array, not sequence(1, 0) = [1, 0]
      val copies = expr("rate_milli div 1000") + col("bump")
      val m = r.select(col("doc_id"), col("source"), col("rate_milli"), col("bump"),
        explode(when(copies >= 1, sequence(lit(1L), copies))
          .otherwise(array().cast("array<bigint>"))).as("copy_idx"))
      val perSource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      m.groupBy(col("source"))
        .agg(min(col("rate_milli")).as("rate_milli"),
          count(lit(1)).as("n_manifest"),
          countDistinct(col("doc_id")).as("n_docs_in"),
          sum(when(col("copy_idx") === 1, col("bump")).otherwise(0L)).as("n_bumped"))
        .join(broadcast(perSource), "source")
        .withColumn("realized_milli", expr("n_manifest * 1000 div n_src"))
        .select(col("source"), col("rate_milli"), col("n_manifest"),
          col("n_docs_in"), col("n_bumped"), col("realized_milli"))
        .orderBy(col("source"))
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
