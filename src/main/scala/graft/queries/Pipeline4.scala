package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Training-data pipeline operators, part 4: tokenizer-training and
  * language-model-statistics steps — the character-pair frequency count
  * that drives a BPE merge iteration, and per-document bigram
  * conditional-probability scoring against corpus-wide n-gram counts
  * (the integer-exact core of perplexity-style quality filtering).
  *
  * Same conventions as [[Pipeline3]]: all ratios are scaled integers
  * (ppm via floor division) so every oracle is bit-exact cross-engine.
  */
object Pipeline4 {

  private val wsSql = TextSql.ws
  private def shinglesSql(ws: String, n: Int): String = TextSql.shingles(ws, n)

  val all: Seq[Q] = Seq(

    // ---- BPE merge-candidate pair frequencies ------------------------------
    // One iteration of byte-pair-encoding tokenizer training: count
    // adjacent CHARACTER pairs inside every word occurrence across the
    // corpus and rank the merge candidates. Plan shape: the char-pair
    // fan-out is a row-local generator (explode of a transform over the
    // word — no join, no per-char shuffle); the only shuffle is the
    // pair-count aggregate, whose keyspace is bounded by the alphabet
    // squared (≤ a few thousand keys at ANY corpus size) — partial
    // map-side aggregation collapses the fan-out before it moves, so
    // the operator scales with the scan, not with corpus size.
    Q("p46_bpe_pairs", Some(s"""
      WITH w AS (SELECT unnest($wsSql) AS w FROM documents),
      p AS (SELECT unnest([w[i:i+1] for i in generate_series(1, length(w)-1)]) AS pair
            FROM w WHERE length(w) >= 2)
      SELECT pair, COUNT(*) AS n
      FROM p GROUP BY pair
      ORDER BY n DESC, pair
      LIMIT 32""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(32)
    },

    // ---- bigram-LM document scoring ----------------------------------------
    // Perplexity-style quality signal without floats — see
    // [[graft.ops.LmOps.bigramLm]] for the shape. The hot-key joins are
    // SALTED (AQE's skew split provably can't fire on a join whose
    // build side aggregates above its shuffle — PipelineOpsSpec); the
    // salting is oracle-proven result-identical here.
    Q("p47_bigram_lm", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      bg AS (SELECT doc_id, unnest(${shinglesSql("ws", 2)}) AS bg FROM w),
      c2 AS (SELECT bg, COUNT(*) AS n2 FROM bg GROUP BY bg),
      c1 AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS n1
             FROM bg GROUP BY 1),
      j AS (SELECT b.doc_id, c2.n2 * 1000000 // c1.n1 AS cond_ppm
            FROM bg b JOIN c2 USING (bg)
            JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w1)
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(cond_ppm) // COUNT(*) AS BIGINT) AS avg_cond_ppm
      FROM j GROUP BY doc_id
      ORDER BY doc_id""")) { (spark, dir) =>
      graft.ops.LmOps.bigramLm(Tables.loadSpread(spark, dir, "documents"),
          "doc_id", "text",
          singlePass = singlePass(spark, "graft.bigramlm.singlePass"))
        .orderBy(col("doc_id"))
    },

    // ---- incremental ingest dedup ------------------------------------------
    // The shape every CONTINUOUSLY-growing corpus needs: a new batch of
    // documents (fixture split doc_id % 10 >= 8) deduped against the
    // already-ingested corpus (the other 80%) AND within itself. Each
    // new doc is classified: dup of an existing doc, dup of an earlier
    // new doc, or kept. Plan shape: the existing side reduces to
    // DISTINCT hashes (never full rows — at 100 TB the ingested corpus
    // is only ever touched as its hash index); one shuffle join on the
    // hash + one first-per-hash aggregate over the SMALL new batch. The
    // existing-hash side is NOT broadcast: it grows with the corpus,
    // while the join key is a fixed-width md5 — exactly the economics
    // of a hash-index lookup.
    Q("p48_incremental_dedup", Some(raw"""
      WITH h AS (SELECT doc_id,
                        md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS ch
                 FROM documents),
      old AS (SELECT DISTINCT ch FROM h WHERE doc_id % 10 < 8),
      new AS (SELECT doc_id, ch FROM h WHERE doc_id % 10 >= 8),
      firsts AS (SELECT ch, min(doc_id) AS keep_id FROM new GROUP BY ch)
      SELECT n.doc_id, n.ch,
             CASE WHEN o.ch IS NOT NULL THEN 'dup_existing'
                  WHEN n.doc_id <> f.keep_id THEN 'dup_new'
                  ELSE 'kept' END AS status
      FROM new n
      LEFT JOIN old o USING (ch)
      JOIN firsts f USING (ch)
      ORDER BY n.doc_id""")) { (spark, dir) =>
      val h = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.contentHash(col("text")).as("ch"))
      val old = h.filter(col("doc_id") % 10 < 8).select(col("ch")).distinct()
        .withColumn("in_old", lit(1))
      val fresh = h.filter(col("doc_id") % 10 >= 8)
      val firsts = fresh.groupBy(col("ch")).agg(min(col("doc_id")).as("keep_id"))
      fresh.join(old, Seq("ch"), "left")
        .join(firsts, "ch")
        .select(col("doc_id"), col("ch"),
          when(col("in_old").isNotNull, "dup_existing")
            .when(col("doc_id") =!= col("keep_id"), "dup_new")
            .otherwise("kept").as("status"))
        .orderBy(col("doc_id"))
    },

    // ---- banded interval join (nested-loop → equi-join rewrite) ------------
    // Same semantics as p24's batch oracle (clicks ⋈ same-user purchases
    // in the preceding 30 min) but executed as the SCALABLE batch
    // rewrite: time-band bucketing turns the non-equi interval condition
    // into a hash equi-join on (user, band) — one bounded shuffle
    // instead of a per-key nested loop. The oracle is the plain interval
    // join, proving the rewrite lossless (band edges included).
    Q("p49_banded_interval_join", Some("""
      SELECT c.event_id AS click_id, p.event_id AS buy_id,
             CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
             CAST(epoch_us(p.ts) AS BIGINT) AS buy_us
      FROM events c JOIN events p
        ON c.event_type = 'click' AND p.event_type = 'purchase'
       AND c.user_id = p.user_id
       AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
      ORDER BY click_id, buy_id""")) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("us").as("click_us"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          col("us").as("buy_us"))
      graft.ops.JoinPatterns.bandedIntervalJoin(
          clicks, buys, "user_id", "click_us", "buy_us", 30L * 60 * 1000000)
        .select(col("click_id"), col("buy_id"), col("click_us"), col("buy_us"))
        .orderBy(col("click_id"), col("buy_id"))
    },

    // ---- salted skew join --------------------------------------------------
    // lineitem keyed on l_returnflag — 3 distinct values, the worst
    // skew a shuffle join can see (every row of a flag in ONE task).
    // The salted rewrite spreads each hot key over 8 salt partitions
    // and replicates the 3-row dim ×8; the oracle is the plain join,
    // proving bit-identical results. This is the manual fallback for
    // single-giant-key skew that AQE's partition splitting can't fix.
    Q("p50_salted_skew_join", Some("""
      WITH dim(flag, weight) AS (VALUES ('A', 2), ('N', 3), ('R', 5))
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * weight) AS DOUBLE)
               AS weighted_qty
      FROM lineitem JOIN dim ON l_returnflag = flag
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")) { (spark, dir) =>
      import spark.implicits._
      val dim = Seq(("A", 2L), ("N", 3L), ("R", 5L)).toDF("l_returnflag", "weight")
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"))
      graft.ops.JoinPatterns.saltedJoin(li, dim, "l_returnflag",
          col("l_orderkey"), salts = 8)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity")) * col("weight")).cast("double")
            .as("weighted_qty"))
        .orderBy(col("l_returnflag"))
    },

    // ---- Count-Min-Sketch heavy hitters (error-envelope oracle) ------------
    // The sketch path for vocabulary top-k when the exact corpus-wide
    // (token, count) aggregate is the thing you're trying to AVOID:
    // Spark's count_min_sketch aggregate (DuckDB has no analog) builds
    // one mergeable ~KB sketch in a single pass; point queries then
    // bound each frequency. Verified q36-style: exact top-20 counts
    // (which DuckDB reproduces) plus a `within_bound` flag proving
    // est ∈ [exact, exact + eps·N] — CMS point estimates can only
    // overshoot, by at most eps·N at the chosen confidence; seed fixed
    // → deterministic. The 1-row sketch collect is the aggregate's
    // scalar result (production broadcasts it to probe distributed).
    Q("p51_cms_topk", Some(s"""
      WITH t AS (SELECT unnest($wsSql) AS token FROM documents),
      c AS (SELECT token, COUNT(*) AS exact FROM t GROUP BY token)
      SELECT token, exact, TRUE AS within_bound
      FROM c ORDER BY exact DESC, token LIMIT 20""")) { (spark, dir) =>
      val toksRaw = Tables.loadSpread(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val toks = if (singlePass(spark, "graft.cms.singlePass"))
        toksRaw.localCheckpoint() else toksRaw
      val row = toks.agg(
        expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("total")).collect()(0)
      val probe = new CmsProbe(row.getAs[Array[Byte]](0),
        row.getLong(1) / 1000) // eps·N with eps = 0.001
      val probeUdf = udf((t: String, exact: Long) => probe.ok(t, exact))
      toks.groupBy(col("token")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("token")).limit(20)
        .withColumn("within_bound", probeUdf(col("token"), col("exact")))
    },

    // ---- sliding (overlapping) windows -------------------------------------
    // The hopping-window aggregate (30 min width, 15 min slide) via
    // Spark's native window() with a slide duration — each event lands
    // in exactly width/slide = 2 windows. The oracle expands the same
    // 2-window membership arithmetically (bin and bin−slide), so the
    // overlap semantics are pinned cross-engine. Completes the window
    // triad next to p13 (tumbling) and p14 (session).
    Q("p52_sliding_window", Some("""
      WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                        event_type, value FROM events)
      SELECT sec - sec % 900 - k * 900 AS bin_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM e, (VALUES (0), (1)) AS o(k)
      GROUP BY 1, 2
      ORDER BY bin_start, event_type""")) { (spark, dir) =>
      Tables.load(spark, dir, "events")
        .groupBy(window(col("ts"), "30 minutes", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("bin_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("bin_start"), col("event_type"))
    }
  )
}

/** Serializable CMS point-query probe for p51: the sketch bytes ship in
  * the task closure, deserialized once per executor (transient lazy).
  */
class CmsProbe(bytes: Array[Byte], bound: Long) extends Serializable {
  @transient private lazy val cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  def ok(token: String, exact: Long): Boolean = {
    val est = cms.estimateCount(token)
    est >= exact && est <= exact + bound
  }

  /** Raw point estimate — exposed so the envelope spec can report the
    * actual (exact, est, bound) triple when the 0.99-confidence bound
    * escapes, instead of surfacing as an opaque oracle hash diff.
    */
  def estimate(token: String): Long = cms.estimateCount(token)
}
