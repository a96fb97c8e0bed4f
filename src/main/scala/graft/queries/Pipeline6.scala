package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Round-8 pipeline entries: character-level quality statistics and
  * sparse linear-model quality classification — the two filter
  * families (heuristic signals + learned-model inference) a 100 TB
  * curation pass runs over every document.
  */
object Pipeline6 {

  private val wsSql = TextSql.ws

  /** The fixed sparse model for p82: signed integer weights over token
    * unigrams (fastText-style bag-of-words linear classifier, the
    * standard web-quality filter shape) plus a bias. One definition so
    * the Spark side and the oracle SQL can never drift.
    */
  private[queries] val qualityWeights: Seq[(String, Long)] = Seq(
    "fast" -> 3L, "spark" -> 2L, "query" -> 1L, "vector" -> 1L,
    "slow" -> -4L, "dup" -> -3L, "scan" -> -1L, "the" -> -1L)
  private[queries] val qualityBias = 5L

  val all: Seq[Q] = Seq(

    // ---- character-diversity quality signals -------------------------------
    // ccnet/Gopher-style gibberish detection needs the per-document
    // character distribution; the naive Spark formulation explodes one
    // row PER CHARACTER (a ~5000× shuffle-row multiplier at 100 TB)
    // into a (doc, char) aggregate. graft.functions.CharStats computes
    // the exact integer sufficient statistics — class counts, distinct
    // characters, and the Σc·(c−1) collision count (unnormalized
    // Simpson index, the hashable stand-in for entropy) — in ONE
    // code-point pass per row inside whole-stage codegen: the scan IS
    // the histogram, zero shuffle, while the oracle builds the same
    // numbers from an actual per-character explode + aggregate.
    Q("p81_char_stats", Some("""
      WITH i AS (SELECT doc_id, text,
                        unnest(generate_series(1, length(text))) AS i
                 FROM documents),
      g AS (SELECT doc_id, substr(text, i, 1) AS ch,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM i GROUP BY doc_id, ch),
      dc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
                    CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS collision
             FROM g GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(length(d.text) AS BIGINT) AS n_chars,
             CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
             CAST(length(regexp_replace(d.text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
             CAST(length(regexp_replace(d.text, '[^\s]', '', 'g')) AS BIGINT) AS n_ws,
             CAST(length(d.text)
                  - length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
                  - length(regexp_replace(d.text, '[^0-9]', '', 'g'))
                  - length(regexp_replace(d.text, '[^\s]', '', 'g')) AS BIGINT) AS n_other,
             coalesce(dc.n_distinct, 0) AS n_distinct,
             coalesce(dc.collision, 0) AS collision
      FROM documents d LEFT JOIN dc ON d.doc_id = dc.doc_id
      ORDER BY d.doc_id""")) { (spark, dir) =>
      import graft.functions.CharStats
      val st = CharStats.stats(col("text"))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          st.getItem(0).as("n_chars"), st.getItem(1).as("n_alpha"),
          st.getItem(2).as("n_digit"), st.getItem(3).as("n_ws"),
          st.getItem(4).as("n_other"), st.getItem(5).as("n_distinct"),
          st.getItem(6).as("collision"))
        .orderBy(col("doc_id"))
    },

    // ---- sparse linear-model quality classification ------------------------
    // Learned-filter inference over every document: a bag-of-words
    // linear model (signed integer weights + bias, the fastText
    // web-quality shape) scored corpus-wide. Plan shape for 100 TB:
    // the model is a TABLE joined by broadcast — NOT a giant CASE
    // expression (a real vocab is 10⁵–10⁷ terms; codegen'd
    // expressions don't scale there, broadcast hash joins do). The
    // inner join prunes every out-of-vocab token MAP-SIDE, so the only
    // shuffle is the per-doc partial-aggregated weight sum — exploded
    // rows never move unless they hit the vocab. Docs with zero vocab
    // hits survive via the left join back to the corpus (bias-only
    // score): a filter must emit a verdict for EVERY document.
    Q("p82_quality_model", Some(s"""
      WITH w(tok, wt) AS (VALUES ${qualityWeights
        .map { case (t, w) => s"('$t', $w)" }.mkString(", ")}),
      t AS (SELECT doc_id, unnest($wsSql) AS tok FROM documents),
      s AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS hit_sum,
                   CAST(count(*) AS BIGINT) AS hits
            FROM t JOIN w USING (tok) GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(s.hits, 0) AS vocab_hits,
             coalesce(s.hit_sum, 0) + $qualityBias AS score,
             coalesce(s.hit_sum, 0) + $qualityBias > 0 AS keep
      FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
      ORDER BY d.doc_id""")) { (spark, dir) =>
      val spark2 = spark
      import spark2.implicits._
      val weights = broadcast(
        qualityWeights.toDF("tok", "wt").hint("broadcast"))
      val docs = Tables.loadSpread(spark, dir, "documents")
      val scores = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .join(weights, "tok") // inner: out-of-vocab tokens pruned map-side
        .groupBy(col("doc_id"))
        .agg(sum(col("wt")).as("hit_sum"), count(lit(1)).as("hits"))
      docs.select(col("doc_id"))
        .join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("hits"), lit(0L)).as("vocab_hits"),
          (coalesce(col("hit_sum"), lit(0L)) + qualityBias).as("score"),
          (coalesce(col("hit_sum"), lit(0L)) + qualityBias > 0).as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- URL normalization + registered-domain extraction ------------------
    // The first key a crawl pipeline derives: canonical URL (casefold
    // scheme/host, drop the fragment, strip tracking parameters) and
    // the registered domain for per-site aggregation. The fixture
    // synthesizes a messy URL per document (mixed-case scheme/host, a
    // utm_/ref-polluted query string, a fragment) from (doc_id,
    // source); the engine must PARSE it — Spark's parse_url for
    // host/path/query, higher-order filter over the split query
    // string for the tracking strip — while the oracle computes the
    // canonical form arithmetically from the same derivation. Any
    // parse or normalization drift fails the hash. All row-local
    // expressions in the scan stage: URL canonicalization at 100 TB
    // is free, the dedup it enables is the win.
    Q("p84_url_normalize", Some("""
      SELECT doc_id,
             'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/a/' || CAST(doc_id AS VARCHAR)
               || '?id=' || CAST(doc_id AS VARCHAR) AS norm_url,
             source || '-' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com' AS host,
             'example.com' AS registered_domain,
             '/a/' || CAST(doc_id AS VARCHAR) AS path
      FROM documents ORDER BY doc_id""")) { (spark, dir) =>
      // the messy synthesized URL the pipeline receives
      val raw = concat(lit("HTTPS://"), upper(col("source")), lit("-"),
        col("doc_id") % 7, lit(".Example.COM/a/"), col("doc_id"),
        lit("?utm_source=feed&ref="), col("doc_id") % 3,
        lit("&id="), col("doc_id"), lit("#sec"), col("doc_id") % 5)
      val host = lower(parse_url(raw, lit("HOST")))
      val path = parse_url(raw, lit("PATH"))
      // tracking strip: drop utm_* and ref= params, keep the rest
      val cleanQuery = array_join(
        filter(split(parse_url(raw, lit("QUERY")), "&"),
          p => !p.startsWith("utm_") && !p.startsWith("ref=")), "&")
      // registered domain = last two labels of the host (public-suffix
      // lists refine this at production; the shape is the same slice)
      val labels = split(host, "\\.")
      val regDomain = concat_ws(".",
        element_at(labels, -2), element_at(labels, -1))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://"), host, path,
            when(length(cleanQuery) > 0, concat(lit("?"), cleanQuery))
              .otherwise(lit(""))).as("norm_url"),
          host.as("host"), regDomain.as("registered_domain"),
          path.as("path"))
        .orderBy(col("doc_id"))
    },

    // ---- HTML boilerplate stripping ----------------------------------------
    // What stands between a crawl and a text corpus: drop script/style
    // blocks and comments, strip tags, recover the title and the
    // visible text. The fixture wraps each document's text in a
    // structurally-real page (head with title + style, a heading, the
    // text in a paragraph, a trailing script and comment); the engine
    // recovers title and clean text by PARSING with the regex chain
    // every real pipeline uses (non-greedy block removal BEFORE tag
    // removal — tag-stripping first would leak script bodies into the
    // text), while the oracle computes both arithmetically from the
    // construction. Row-local scan-stage expressions — codegen'd
    // regexes, zero shuffle.
    Q("p85_html_strip", Some("""
      SELECT doc_id,
             'T' || CAST(doc_id AS VARCHAR) AS title,
             'Hello' || chr(10) || text AS clean,
             CAST(length(text) + 6 AS BIGINT) AS n_clean
      FROM documents ORDER BY doc_id""")) { (spark, dir) =>
      val html = concat(
        lit("<html><head><title>T"), col("doc_id"),
        lit("</title><style>p{color:red}</style></head>"),
        lit("<body><h1>Hello</h1>\n<p>"), col("text"),
        lit("</p><script>var x=1;</script><!-- crawler note --></body></html>"))
      val title = regexp_extract(html, "<title>(.*?)</title>", 1)
      // block elements first (script/style/comments swallow their
      // bodies), then tags; the fixture text is newline-free so the
      // non-greedy dot never needs DOTALL
      val noBlocks = regexp_replace(regexp_replace(html,
        "<(script|style)>.*?</\\1>", ""), "<!--.*?-->", "")
      val stripped = trim(regexp_replace(noBlocks, "<[^>]*>", ""))
      Tables.loadSpread(spark, dir, "documents")
        .withColumn("title", title).withColumn("stripped", stripped)
        // the title text also survives tag-stripping at the head of
        // the clean stream; slice it off (it is reported separately)
        .withColumn("clean", col("stripped")
          .substr(length(col("title")) + 1, length(col("stripped"))))
        .select(col("doc_id"), col("title"), col("clean"),
          length(col("clean")).cast("long").as("n_clean"))
        .orderBy(col("doc_id"))
    },

    // ---- domain-level quality gating (blocklist derivation) ----------------
    // Site-level filtering, the coarse sibling of p82's per-document
    // model: aggregate quality signals PER SOURCE (docs, mean token
    // count, short-doc share in exact ppm), derive the blocklist
    // (short-share above threshold), and report how much of the corpus
    // each verdict removes. Scale shape: one partial-aggregated
    // per-source rollup (sources ≪ docs — the result is broadcast-
    // sized by construction, which is exactly why production filters
    // at the domain level first), all verdicts derived from the
    // rollup with row-local expressions. The doc-level filter this
    // blocklist drives is a broadcast anti-join — no second corpus
    // shuffle.
    Q("p86_domain_gate", Some("""
      WITH d AS (SELECT source, len(string_split_regex(lower(text), '\s+')) AS n_tok
                 FROM documents),
      s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) // count(*) AS mean_tokens,
                   CAST(sum(CASE WHEN n_tok < 120 THEN 1 ELSE 0 END) * 1000000
                        // count(*) AS BIGINT) AS short_ppm
            FROM d GROUP BY source)
      SELECT source, n_docs, mean_tokens, short_ppm,
             short_ppm > 500000 AS blocked,
             CASE WHEN short_ppm > 500000 THEN n_docs ELSE 0 END AS docs_dropped
      FROM s ORDER BY source""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(col("source"), TextOps.tokenCount(col("text")).as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(when(col("n_tok") < 120, 1L).otherwise(0L)).as("n_short"))
        .select(col("source"), col("n_docs"),
          expr("sum_tok div n_docs").as("mean_tokens"),
          expr("n_short * 1000000 div n_docs").as("short_ppm"))
        .withColumn("blocked", col("short_ppm") > 500000)
        .withColumn("docs_dropped",
          when(col("blocked"), col("n_docs")).otherwise(0L))
        .orderBy(col("source"))
    }
  )
}
