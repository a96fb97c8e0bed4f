package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Round-8 pipeline entries, fourth batch: behavioral cohorts,
  * contrastive-training pair mining, and point-in-time snapshot reads —
  * the analysis/serving consumers of the event stream, the embedding
  * corpus, and the SCD2 history built upstream.
  */
object Pipeline9 {

  /** p104 snapshot dates — single source of truth for both engines. */
  private val asofDates = Seq("1993-06-01", "1995-06-01", "1997-06-01")

  val all: Seq[Q] = Seq(

    // ---- cohort retention matrix -------------------------------------------
    // The standard product/behavior table: users are cohorted by first
    // active day and each later active day counts toward
    // (cohort, day_offset) — the retention curve per cohort, with the
    // rate in exact per-mille. Aggregation-by-construction (no window
    // over the raw stream): the (user, day) activity set collapses
    // first, the first-seen day is a user-keyed agg, the matrix a
    // cohort-keyed agg.
    //
    // Scale shape: two shuffles keyed user_id (distinct + first-seen)
    // and one keyed cohort; output is bounded by cohorts × offsets, not
    // events. At 100 TB the (user, day) distinct is the map-side-
    // combining workhorse — it collapses the event stream before
    // anything else runs.
    Q("p102_cohort_retention", Some("""
      WITH e AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
                 FROM events),
      f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1),
      r AS (SELECT f.cohort,
                   CAST(date_diff('day', f.cohort, e.d) AS BIGINT) AS day_offset,
                   CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
            FROM e JOIN f USING (user_id) GROUP BY 1, 2),
      s AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
            FROM f GROUP BY 1)
      SELECT CAST(r.cohort AS VARCHAR) AS cohort, r.day_offset, r.n_active,
             s.cohort_size,
             CAST(r.n_active * 1000 // s.cohort_size AS BIGINT)
               AS retained_milli
      FROM r JOIN s USING (cohort) ORDER BY 1, 2""")) { (spark, dir) =>
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"),
          date_trunc("DAY", col("ts")).cast("date").as("d")).distinct()
      val first = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
      val size = first.groupBy(col("cohort"))
        .agg(count(lit(1)).as("cohort_size"))
      e.join(first, "user_id")
        .groupBy(col("cohort"),
          datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(size), "cohort")
        .select(col("cohort").cast("string").as("cohort"), col("day_offset"),
          col("n_active"), col("cohort_size"),
          expr("n_active * 1000 div cohort_size").as("retained_milli"))
        .orderBy(col("cohort"), col("day_offset"))
    },

    // ---- contrastive hard-negative / easy-positive pair mining -------------
    // The training-pair step of embedding finetuning: for each query in
    // a fixed panel, the HARDEST negative (highest dot product among
    // other-label vectors — the confusable the model must push away)
    // and the EASIEST positive (lowest dot among same-label vectors —
    // the far member it must pull in). margin = easy_pos − hard_neg in
    // exact micro²-units; a negative margin marks the violated triplets
    // a trainer batches first. Scaled-integer dots (round(x·1e6), the
    // p88/p92/p97 convention), ties toward the smaller vec_id.
    //
    // Scale shape: the 20-query panel is fixed-size and broadcast; ONE
    // partial-agg pass over corpus components computes every dot; label
    // attachment is a key join against the (id, label) table; both
    // argmax and argmin are conditional struct-extrema aggregates —
    // never a window over the corpus.
    Q("p103_hard_negatives", Some("""
      WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      q AS (SELECT vec_id AS qid, j, ri AS qi FROM c WHERE vec_id < 20),
      d AS (SELECT q.qid, c.vec_id AS vid, sum(q.qi * c.ri) AS dot
            FROM c JOIN q ON q.j = c.j AND c.vec_id != q.qid GROUP BY 1, 2),
      l AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
      j AS (SELECT d.qid, ql.label AS qlabel, d.vid, vl.label AS vlabel,
                   CAST(d.dot AS BIGINT) AS dot
            FROM d JOIN l ql ON ql.vec_id = d.qid
                   JOIN l vl ON vl.vec_id = d.vid),
      hn AS (SELECT qid, vid AS hard_neg_id, dot AS hard_neg_dot FROM
               (SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY dot DESC, vid) AS rn FROM j WHERE vlabel != qlabel)
             WHERE rn = 1),
      ep AS (SELECT qid, vid AS easy_pos_id, dot AS easy_pos_dot FROM
               (SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY dot, vid) AS rn FROM j WHERE vlabel = qlabel)
             WHERE rn = 1)
      SELECT DISTINCT j.qid, j.qlabel, hn.hard_neg_id, hn.hard_neg_dot,
             ep.easy_pos_id, ep.easy_pos_dot,
             ep.easy_pos_dot - hn.hard_neg_dot AS margin
      FROM j JOIN hn USING (qid) JOIN ep USING (qid)
      ORDER BY j.qid""")) { (spark, dir) =>
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val c = emb.select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
        .select(col("vec_id"), col("j"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val q = c.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("j"), col("ri").as("qi"))
      val labels = emb.select(col("vec_id"), col("label").cast("long"))
      val d = c.join(broadcast(q), "j")
        .where(col("qid") =!= col("vec_id"))
        .groupBy(col("qid"), col("vec_id"))
        .agg(sum(col("qi") * col("ri")).as("dot"))
        .join(broadcast(labels.select(col("vec_id").as("qid"),
          col("label").as("qlabel"))), "qid")
        .join(labels.select(col("vec_id"), col("label").as("vlabel")),
          "vec_id")
      d.groupBy(col("qid"), col("qlabel"))
        .agg(
          max(when(col("vlabel") =!= col("qlabel"),
            struct(col("dot"), (-col("vec_id")).as("nv")))).as("hn"),
          min(when(col("vlabel") === col("qlabel"),
            struct(col("dot"), col("vec_id").as("v")))).as("ep"))
        .select(col("qid"), col("qlabel"),
          (-col("hn.nv")).as("hard_neg_id"), col("hn.dot").as("hard_neg_dot"),
          col("ep.v").as("easy_pos_id"), col("ep.dot").as("easy_pos_dot"),
          (col("ep.dot") - col("hn.dot")).as("margin"))
        .orderBy(col("qid"))
    },

    // ---- point-in-time snapshot read over the SCD2 history -----------------
    // Time travel over the p65 change history: for each snapshot date,
    // the census of customers by their THEN-effective order priority —
    // interval containment (valid_from <= d < valid_to, NULL valid_to =
    // still current) against a broadcast panel of snapshot dates, three
    // versions reconstructed in ONE pass over the history. Customers
    // whose history starts after a snapshot date correctly don't exist
    // in that snapshot.
    //
    // Scale shape: the history build is p65's single o_custkey
    // partitioning; the snapshot panel is a 3-row broadcast nested-loop
    // join (the documented broadcast-tiny-frame exception); the census
    // is one (date, priority)-keyed partial agg of bounded width.
    Q("p104_asof_snapshot", Some(s"""
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
                   min(o_orderdate) AS valid_from
            FROM i GROUP BY 1, 2),
      h AS (SELECT o_custkey, priority, valid_from,
                   lead(valid_from) OVER (PARTITION BY o_custkey
                                          ORDER BY island) AS valid_to
            FROM g),
      dt(asof_date) AS (VALUES ${asofDates.map(d => s"(DATE '$d')").mkString(", ")})
      SELECT CAST(dt.asof_date AS VARCHAR) AS asof_date, h.priority,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM h JOIN dt ON h.valid_from <= dt.asof_date
                    AND (h.valid_to IS NULL OR h.valid_to > dt.asof_date)
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wi = Window.partitionBy(col("o_custkey")).orderBy(col("island"))
      val chg = when(lag(col("o_orderpriority"), 1).over(w).isNull
        || lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"), 1)
        .otherwise(0)
      val hist = Tables.load(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate"), col("o_orderkey"))
        .withColumn("chg", chg)
        .withColumn("island", sum(col("chg")).over(w).cast("long"))
        .groupBy(col("o_custkey"), col("island"))
        .agg(min(col("o_orderpriority")).as("priority"),
          min(col("o_orderdate")).as("valid_from"))
        .select(col("o_custkey"), col("island"), col("priority"),
          col("valid_from"),
          lead(col("valid_from"), 1).over(wi).as("valid_to"))
      val dates = asofDates.map(Tuple1(_)).toDF("s")
        .select(to_date(col("s")).as("asof_date"))
      hist.join(broadcast(dates),
          col("valid_from") <= col("asof_date")
            && (col("valid_to").isNull || col("valid_to") > col("asof_date")))
        .groupBy(col("asof_date").cast("string").as("asof_date"),
          col("priority"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("asof_date"), col("priority"))
    },

    // ---- triangle count + transitivity of the near-dup graph ---------------
    // Graph-shape forensics on the dedup pair graph: triangles vs open
    // wedges (transitivity) separates tight duplicate cliques from
    // star-shaped template hubs — the diagnostic that tells you whether
    // CC clusters are real families or one boilerplate page linking
    // everything. Exact integer transitivity in per-mille.
    //
    // Scale shape: edges are the shared bounded p09 spairs (banded,
    // capped — never all-pairs). Triangles use the ORIENTATION trick:
    // edges point low→high in the (degree, id) total order, wedges are
    // an oriented-adjacency self-join on the source, closed by ONE
    // keyed (v,w) join against oriented edges. ANY total order counts
    // each triangle exactly once — so the oracle's simple id-order
    // triple join must produce the SAME count the degree-ordered Spark
    // plan does (that equality is itself evidence the orientation is
    // correct), while degree-ordering bounds the wedge fan-out by
    // out-degree ≤ O(√m) instead of a hub's full degree. Wedge total =
    // Σ d(d−1)/2 is a degree-table aggregate, never materialized.
    Q("p105_dup_triangles", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      e AS (SELECT a, b FROM spairs),
      deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d FROM
                (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
              GROUP BY 1),
      tri AS (SELECT count(*) AS t FROM e e1
              JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
              JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
      wed AS (SELECT sum(d * (d - 1) // 2) AS w FROM deg)
      SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
             CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
             CAST(wed.w AS BIGINT) AS n_wedges,
             CAST(tri.t AS BIGINT) AS n_triangles,
             CAST(3 * tri.t * 1000 // wed.w AS BIGINT) AS transitivity_milli
      FROM tri, wed""")) { (spark, dir) =>
      // pairs come from the SharedStages materialized table (p75's
      // convention — graph forensics consume the published pair graph;
      // only the dedup anchors p29/p42/p68 rebuild the fixpoint)
      val e = SharedStages.spairs(spark, dir)
        .select(col("a"), col("b")).localCheckpoint()
      val deg = e.select(col("a").as("n"))
        .union(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      // orient every edge low→high in the (degree, id) total order:
      // out-degree is bounded by O(sqrt(m)) so the wedge self-join
      // cannot blow up on a hub, and any total order counts each
      // triangle exactly once (the oracle uses plain id order — equal
      // counts prove it)
      val withOrd = e
        .join(deg.select(col("n").as("a"), struct(col("d"), col("n")).as("oa")), "a")
        .join(deg.select(col("n").as("b"), struct(col("d"), col("n")).as("ob")), "b")
      // r20: materialized once — the oriented-edge subtree (e ⋈ deg ⋈
      // deg) fed THREE consumers (w1, w2, the triangle-closing probe)
      // and was re-evaluated per consumer; one graph-sized checkpoint
      // replaces three agg+join chains (before-plan: 10 exchanges under
      // nested reuse; after: the oe tree evaluates once)
      val oe = withOrd.select(
        when(col("oa") < col("ob"), col("a")).otherwise(col("b")).as("src"),
        when(col("oa") < col("ob"), col("b")).otherwise(col("a")).as("dst"),
        when(col("oa") < col("ob"), col("ob")).otherwise(col("oa")).as("odst"))
        .localCheckpoint()
      val w1 = oe.select(col("src"), col("dst").as("v"), col("odst").as("ov"))
      val w2 = oe.select(col("src"), col("dst").as("w"), col("odst").as("ow"))
      val wedges = w1.join(w2, "src").where(col("ov") < col("ow"))
      val tri = wedges.join(oe.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w")).agg(count(lit(1)).as("t"))
      val stats = deg.agg(count(lit(1)).as("n_nodes"),
        (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      stats.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
          col("t").as("n_triangles"),
          expr("3 * t * 1000 div n_wedges").as("transitivity_milli"))
    },

    // ---- one-pass column profiler (dataset card statistics) ----------------
    // The profile block of a dataset card: per column — row count, null
    // count, exact distinct count, lexicographic min/max of the string
    // form. Computed by MELTING the table ((column_name, value) rows
    // via stack) so ALL columns profile through ONE shuffle keyed by
    // column name, instead of k independent jobs or k count-distinct
    // expansions of one aggregate. Values compare as strings so every
    // column type rides one schema — deterministic in both engines
    // (doubles are excluded: their string forms are engine-defined).
    //
    // Scale shape: the melt is a row-local ×k scan-stage explosion
    // feeding one partial agg; at 100 TB swap countDistinct for
    // approx_count_distinct (same plan shape) — exact here so the
    // oracle can check it. Per-column-name skew is bounded: exactly k
    // equal-size key groups.
    Q("p106_column_profile", Some {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
      val melted = cols.map(c =>
        s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS val FROM lineitem")
        .mkString(" UNION ALL ")
      s"""
      WITH m AS ($melted)
      SELECT column_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
             min(val) AS min_val, max(val) AS max_val
      FROM m GROUP BY 1 ORDER BY 1"""
    }) { (spark, dir) =>
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
      val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
      Tables.load(spark, dir, "lineitem")
        .select(expr(s"stack(${cols.length}, $stackArgs)")
          .as(Seq("column_name", "val")))
        .groupBy(col("column_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col("val")).as("n_distinct"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"))
        .orderBy(col("column_name"))
    },

    // ---- schema-evolution read (mergeSchema over drifted batches) ----------
    // What every long-lived lake hits: an early ingest batch wrote
    // (doc_id, source, n_chars), a later one (doc_id, source, lang) —
    // the columns drifted. The read unifies them via Spark's
    // `mergeSchema` parquet option: the union schema comes back with
    // NULL fill for each batch's missing columns, no rewrite of old
    // files. The oracle reconstructs the same union from the base
    // table arithmetically.
    //
    // Scale shape: schema merge is footer-only work (file schemas
    // union at planning, data is never rewritten or shuffled); the
    // scan stays a plain pruned parquet scan. The write here is the
    // fixture setup, partitioned like any sink.
    Q("p108_schema_evolution", Some("""
      SELECT doc_id, source,
             CASE WHEN doc_id < 250 THEN CAST(n_chars AS BIGINT) END AS n_chars,
             CASE WHEN doc_id >= 250 THEN lang END AS lang
      FROM documents ORDER BY doc_id""")) { (spark, dir) =>
      val root = sinkDir(s"p108_evo_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
      val docs = Tables.load(spark, dir, "documents")
      docs.where(col("doc_id") < 250)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$root/batch1")
      docs.where(col("doc_id") >= 250)
        .select(col("doc_id"), col("source"), col("lang"))
        .write.mode("overwrite").parquet(s"$root/batch2")
      spark.read.option("mergeSchema", "true")
        .parquet(s"$root/batch1", s"$root/batch2")
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // ---- PII detection + redaction accounting ------------------------------
    // The scrub pass a corpus takes before anything trains on it:
    // e-mail and phone patterns are counted and replaced with typed
    // placeholder tokens, and the audit reports — per source — how
    // many of each PII kind were removed, how many documents were
    // touched, and an order-independent content digest (bit_xor of the
    // per-doc h60) of the REDACTED corpus, the checksum a downstream
    // consumer pins. The fixture welds synthetic PII onto doc_id
    // mod-classes (the p100 convention), so expected counts are
    // deterministic and nonzero. RE2-safe patterns only (the oracle
    // engine has no backreferences/lookahead).
    //
    // Scale shape: detection and redaction are row-local regex work in
    // the scan stage; the audit is ONE source-keyed partial agg; the
    // digest is a commutative aggregate, so partitioning never affects
    // it.
    Q("p109_pii_redact", Some {
      val email = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
      val phone = "555-[0-9][0-9][0-9][0-9]"
      s"""
      WITH d AS (SELECT doc_id, source, text
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                || '@example.com now' ELSE '' END
                   || CASE WHEN doc_id % 9 = 0
                           THEN ' call 555-' ||
                                CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END
                   AS payload FROM documents),
      r AS (SELECT doc_id, source,
                   CAST(len(regexp_extract_all(payload, '$email')) AS BIGINT)
                     AS n_email,
                   CAST(len(regexp_extract_all(payload, '$phone')) AS BIGINT)
                     AS n_phone,
                   regexp_replace(regexp_replace(payload, '$email', '[EMAIL]',
                     'g'), '$phone', '[PHONE]', 'g') AS redacted
            FROM d)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_email) AS BIGINT) AS n_emails,
             CAST(sum(n_phone) AS BIGINT) AS n_phones,
             CAST(sum(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_docs_touched,
             bit_xor(${graft.ops.Portable.h60Sql("redacted")}) AS content_xor
      FROM r GROUP BY source ORDER BY source"""
    }) { (spark, dir) =>
      val email = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
      val phone = "555-[0-9][0-9][0-9][0-9]"
      val payload = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 9 === 0,
          concat(lit(" call 555-"),
            (lit(1000) + col("doc_id") % 9000).cast("string")))
          .otherwise(lit("")))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"), payload.as("payload"))
        .select(col("doc_id"), col("source"),
          size(regexp_extract_all(col("payload"), lit(email), lit(0)))
            .cast("long").as("n_email"),
          size(regexp_extract_all(col("payload"), lit(phone), lit(0)))
            .cast("long").as("n_phone"),
          graft.ops.Portable.h60(
            regexp_replace(regexp_replace(col("payload"), email, "[EMAIL]"),
              phone, "[PHONE]")).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("n_emails"),
          sum(col("n_phone")).as("n_phones"),
          sum(when(col("n_email") + col("n_phone") > 0, 1L).otherwise(0L))
            .as("n_docs_touched"),
          expr("bit_xor(h)").as("content_xor"))
        .orderBy(col("source"))
    }
  )
}
