package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Portable, TextOps}
import graft.functions.TopN

/** Round-9 pipeline entries, second batch: sketch-based corpus
  * fingerprints (winnowing minimizers, KMV distinct sketches with set
  * algebra), behavioral sequence modeling (Markov transitions), and the
  * position-level duplicated-span census that whole-doc and
  * distinct-gram dedup both miss.
  */
object Pipeline14 {

  private val wsSql = TextSql.ws

  /** KMV sketch size (p155). SE ~ 1/sqrt(k-2) ~ 12.7% at k=64. */
  private val KmvK = 64

  /** ONE oracle for both faces of incremental cluster maintenance —
    * the batch fold (p162) and the stateful streaming fold (p163).
    * Full-recompute CC over old-pairs ∪ new-edges; sharing the text
    * makes the two entries' equivalence claims inseparable.
    */
  private val incrementalCcOracle: String = {
    def bands(pred: String): String =
      (0 until 4).map(q =>
        s"SELECT doc_id, $q AS q, qk$q AS qk FROM sig WHERE $pred")
        .mkString(" UNION ALL ")
    s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      cb AS (${bands("doc_id % 3 <> 0")}),
      ib AS (${bands("doc_id % 3 = 0")}),
      oldcap AS (SELECT * FROM cb
                 QUALIFY COUNT(*) OVER (PARTITION BY q, qk)
                   BETWEEN 2 AND 1000),
      old_pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                    FROM oldcap x JOIN oldcap y
                      ON x.q = y.q AND x.qk = y.qk AND x.doc_id < y.doc_id
                    JOIN sig sa ON sa.doc_id = x.doc_id
                    JOIN sig sb ON sb.doc_id = y.doc_id
                    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3),
      exb AS (SELECT * FROM cb
              QUALIFY COUNT(*) OVER (PARTITION BY q, qk) <= 1000),
      new_pairs AS (SELECT DISTINCT i.doc_id AS a, e.doc_id AS b
                    FROM ib i JOIN exb e ON i.q = e.q AND i.qk = e.qk
                    JOIN sig si ON si.doc_id = i.doc_id
                    JOIN sig se ON se.doc_id = e.doc_id
                    WHERE bit_count(xor(si.simhash, se.simhash)) <= 3),
      edges AS (SELECT a, b FROM old_pairs
                UNION SELECT a, b FROM new_pairs),
      esym AS (SELECT a AS u, b AS v FROM edges
               UNION SELECT b, a FROM edges),
      walk(u, v) AS (SELECT u, v FROM esym
                     UNION
                     SELECT wk.u, e.v FROM walk wk
                     JOIN esym e ON wk.v = e.u),
      lbl AS (SELECT u AS n, least(u, min(v)) AS cluster_id
              FROM walk GROUP BY u),
      aff AS (SELECT DISTINCT cluster_id FROM lbl WHERE n % 3 = 0),
      members AS (SELECT n AS doc_id, cluster_id FROM lbl
                  WHERE cluster_id IN (SELECT cluster_id FROM aff)
                  UNION ALL
                  SELECT d.doc_id, d.doc_id FROM documents d
                  WHERE d.doc_id % 3 = 0
                    AND d.doc_id NOT IN (SELECT n FROM lbl))
      SELECT doc_id, cluster_id,
             CASE WHEN doc_id % 3 = 0 THEN 'in' ELSE 'corpus' END AS role
      FROM members ORDER BY doc_id"""
  }

  /** h60 hash-space size: hashes are uniform in [0, 2^60). */
  private val HashSpace = 1L << 60

  val all: Seq[Q] = Seq(

    // ---- winnowing minimizer fingerprints ----------------------------------
    // The MOSS/sourmash document sketch: hash every 5-gram, slide a
    // w=8 window over the positions, keep each window's MINIMUM hash.
    // Any two documents sharing a sufficiently long substring are
    // GUARANTEED to share a minimizer (winnowing's coverage theorem) —
    // unlike MinHash, which is probabilistic per-pair. Sketch size is
    // ~2n/(w+1) positions, so the corpus-wide minimizer index is ~20%
    // of the gram index p148 builds. Docs with fewer than 8 grams fall
    // back to one whole-doc window (the standard short-doc rule);
    // gram-less docs (<5 tokens) carry an empty sketch.
    //
    // Per doc: sketch size, how many sketch members are shared with at
    // least one other doc, and the shared fraction in ppm — the
    // retrieval-time "how much of this doc is findable elsewhere".
    //
    // Scale shape: gram hash + window min run inside the per-doc
    // partition (bounded by doc length, never corpus-sized); the
    // minimizer-df table is the sketch union (~corpus/4.5 grams);
    // the final rollup is doc-keyed. Nothing all-pairs, nothing
    // driver-side.
    Q("p154_winnow_minimizers", Some(s"""
      WITH w AS (SELECT doc_id, ${TextSql.shingles(wsSql, 5)} AS sh
                 FROM documents),
      g AS (SELECT doc_id, unnest(generate_series(1, len(sh))) AS pos,
                   unnest(sh) AS gm FROM w),
      h AS (SELECT doc_id, pos, ${Portable.h60Sql("gm")} AS h FROM g),
      wm AS (SELECT doc_id, pos,
                    min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin,
                    COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
             FROM h),
      sk AS (SELECT DISTINCT doc_id, wmin
             FROM wm WHERE pos <= greatest(n_grams - 7, 1)),
      mdf AS (SELECT wmin, CAST(COUNT(*) AS BIGINT) AS df
              FROM sk GROUP BY 1),
      st AS (SELECT sk.doc_id,
                    CAST(COUNT(*) AS BIGINT) AS sketch_size,
                    CAST(SUM(CASE WHEN mdf.df >= 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_shared
             FROM sk JOIN mdf USING (wmin) GROUP BY 1)
      SELECT d.doc_id,
             coalesce(st.sketch_size, 0) AS sketch_size,
             coalesce(st.n_shared, 0) AS n_shared,
             CAST(CASE WHEN coalesce(st.sketch_size, 0) = 0 THEN 0
                  ELSE st.n_shared * 1000000 // st.sketch_size END AS BIGINT)
               AS shared_ppm
      FROM documents d LEFT JOIN st USING (doc_id)
      ORDER BY d.doc_id""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val h = docs
        .select(col("doc_id"),
          posexplode(TextOps.shingles(col("text"), 5)).as(Seq("p0", "gm")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"),
          Portable.h60(col("gm")).as("h"))
      val winMin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(0, 7)
      val winDoc = Window.partitionBy(col("doc_id"))
      val sk = h
        .select(col("doc_id"), col("pos"),
          min(col("h")).over(winMin).as("wmin"),
          count(lit(1)).over(winDoc).as("n_grams"))
        .where(col("pos") <= greatest(col("n_grams") - 7, lit(1L)))
        .select(col("doc_id"), col("wmin")).distinct()
      val mdf = sk.groupBy(col("wmin")).agg(count(lit(1)).as("df"))
      val st = sk.join(mdf, "wmin")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("sketch_size"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      docs.select(col("doc_id")).join(st, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("sketch_size"), lit(0L)).as("sketch_size"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          when(coalesce(col("sketch_size"), lit(0L)) === 0, 0L)
            .otherwise(expr("n_shared * 1000000 div sketch_size"))
            .cast("long").as("shared_ppm"))
        .orderBy(col("doc_id"))
    },

    // ---- KMV distinct sketches with set algebra ----------------------------
    // The k-minimum-values sketch: per event type, keep the 64 SMALLEST
    // portable hashes of its distinct users; the k-th smallest estimates
    // the distinct count as (k-1)·|H|/h_k, and — the property HLL does
    // NOT have — two sketches MERGE into a sketch of the union while
    // preserving the members, so intersections fall out too: of the
    // merged top-k, the fraction present in BOTH input sketches is a
    // Jaccard estimate, and est_int = c·est_union/k. All arithmetic is
    // BIGINT (|H|//h_k FIRST, then ×63 — the other order overflows
    // int64 and DuckDB would silently promote to HUGEINT while Spark
    // wrapped); estimates land next to their exact counterparts with
    // the union error in ppm, so the ±1/sqrt(k-2) envelope is visible
    // per pair.
    //
    // The sketched universe is per-type ACTIVE USER-DAYS (user_id,
    // day) — the engagement unit whose per-type sets genuinely
    // partially overlap (every user fires every type eventually, so
    // plain distinct-users would make all five sets identical and the
    // set algebra vacuous).
    //
    // Scale shape: the Spark side computes each sketch with the bounded
    // MinTopNPairs TypedImperativeAggregate — O(k) state per type,
    // map-side partials, O(partitions·k) shuffled. The oracle computes
    // the same sketch the naive way (rank window over all distinct
    // user-days per type); the hash match is the bounded-kernel ≡
    // window equivalence proof, the p135 pattern. The exact-
    // intersection table is a (user, day)-keyed self-join with fan-out
    // bounded by types² = 25.
    Q("p155_kmv_sketch", Some(s"""
      WITH d AS (SELECT DISTINCT event_type, user_id,
                        CAST(date_trunc('day', ts) AS DATE) AS day
                 FROM events),
      h AS (SELECT event_type,
                   ${Portable.h60Sql(
                     "concat(CAST(user_id AS VARCHAR), ':', CAST(day AS VARCHAR))")} AS h
            FROM d),
      r AS (SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                     AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n_exact
            FROM h),
      sk AS (SELECT event_type, CAST(max(n_exact) AS BIGINT) AS exact_n,
                    list(h ORDER BY h) AS vals
             FROM r WHERE rn <= $KmvK GROUP BY 1),
      i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS exact_int
            FROM d a JOIN d b USING (user_id, day)
            WHERE a.event_type < b.event_type GROUP BY 1, 2),
      p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                   a.exact_n AS exact_a, b.exact_n AS exact_b,
                   a.vals AS av, b.vals AS bv,
                   (list_sort(list_distinct(list_concat(a.vals, b.vals))))
                     [1:$KmvK] AS mg
            FROM sk a, sk b WHERE a.event_type < b.event_type),
      e AS (SELECT type_a, type_b, exact_a, exact_b,
                   CAST(CASE WHEN len(av) = $KmvK
                        THEN ${KmvK - 1} * ($HashSpace // av[$KmvK])
                        ELSE exact_a END AS BIGINT) AS est_a,
                   CAST(CASE WHEN len(bv) = $KmvK
                        THEN ${KmvK - 1} * ($HashSpace // bv[$KmvK])
                        ELSE exact_b END AS BIGINT) AS est_b,
                   CAST(CASE WHEN len(mg) = $KmvK
                        THEN ${KmvK - 1} * ($HashSpace // mg[$KmvK])
                        ELSE len(mg) END AS BIGINT) AS est_union,
                   CAST(len(list_filter(mg, v -> list_contains(av, v)
                        AND list_contains(bv, v))) AS BIGINT) AS c,
                   len(mg) AS mglen
            FROM p)
      SELECT e.type_a, e.type_b, exact_a, est_a, exact_b, est_b,
             exact_a + exact_b - coalesce(i.exact_int, 0) AS exact_union,
             est_union,
             coalesce(i.exact_int, 0) AS exact_int,
             CAST(CASE WHEN mglen = $KmvK THEN c * est_union // $KmvK
                  ELSE c END AS BIGINT) AS est_int,
             CAST(abs(est_union - (exact_a + exact_b
                    - coalesce(i.exact_int, 0))) * 1000000
                  // (exact_a + exact_b - coalesce(i.exact_int, 0))
               AS BIGINT) AS union_err_ppm
      FROM e LEFT JOIN i USING (type_a, type_b)
      ORDER BY 1, 2""")) { (spark, dir) =>
      val d = Tables.load(spark, dir, "events")
        .select(col("event_type"), col("user_id"),
          date_trunc("DAY", col("ts")).cast("date").as("day"))
        .distinct()
        .localCheckpoint()
      val h = d.select(col("event_type"),
        Portable.h60(concat(col("user_id").cast("string"), lit(":"),
          col("day").cast("string"))).as("h"))
      val sk = h.groupBy(col("event_type"))
        .agg(TopN.minTopN(col("h"), col("h"), KmvK).as("top"),
          count(lit(1)).as("exact_n"))
        .select(col("event_type"), col("exact_n"),
          expr("transform(top, x -> x.h)").as("vals"))
      val skA = sk.select(col("event_type").as("type_a"),
        col("exact_n").as("exact_a"), col("vals").as("av"))
      val skB = sk.select(col("event_type").as("type_b"),
        col("exact_n").as("exact_b"), col("vals").as("bv"))
      val dA = d.select(col("event_type").as("type_a"), col("user_id"),
        col("day"))
      val dB = d.select(col("event_type").as("type_b"), col("user_id"),
        col("day"))
      val exactInt = dA.join(dB, Seq("user_id", "day"))
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("exact_int"))
      val est = skA.crossJoin(skB)
        .where(col("type_a") < col("type_b"))
        .withColumn("mg",
          expr(s"slice(array_sort(array_distinct(concat(av, bv))), 1, $KmvK)"))
        .select(col("type_a"), col("type_b"), col("exact_a"), col("exact_b"),
          expr(s"""CAST(CASE WHEN size(av) = $KmvK
            THEN ${KmvK - 1} * ($HashSpace div element_at(av, $KmvK))
            ELSE exact_a END AS BIGINT)""").as("est_a"),
          expr(s"""CAST(CASE WHEN size(bv) = $KmvK
            THEN ${KmvK - 1} * ($HashSpace div element_at(bv, $KmvK))
            ELSE exact_b END AS BIGINT)""").as("est_b"),
          expr(s"""CAST(CASE WHEN size(mg) = $KmvK
            THEN ${KmvK - 1} * ($HashSpace div element_at(mg, $KmvK))
            ELSE size(mg) END AS BIGINT)""").as("est_union"),
          expr(s"""CAST(size(filter(mg, v -> array_contains(av, v)
            AND array_contains(bv, v))) AS BIGINT)""").as("c"),
          size(col("mg")).cast("long").as("mglen"))
      est.join(broadcast(exactInt), Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("exact_a"), col("est_a"),
          col("exact_b"), col("est_b"),
          (col("exact_a") + col("exact_b")
            - coalesce(col("exact_int"), lit(0L))).as("exact_union"),
          col("est_union"),
          coalesce(col("exact_int"), lit(0L)).as("exact_int"),
          expr(s"""CAST(CASE WHEN mglen = $KmvK
            THEN c * est_union div $KmvK ELSE c END AS BIGINT)""")
            .as("est_int"),
          expr("""CAST(abs(est_union - (exact_a + exact_b
              - coalesce(exact_int, 0))) * 1000000
            div (exact_a + exact_b - coalesce(exact_int, 0)) AS BIGINT)""")
            .as("union_err_ppm"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // ---- Markov event-transition matrix ------------------------------------
    // The behavioral-sequence model: per user, order events by time and
    // count (from → to) transitions; per from-state, the transition
    // probability in exact ppm and a flag marking the argmax next
    // event (ties toward the lexicographically smaller type — the same
    // deterministic tie rule every argmax entry uses). This is the
    // one-step Markov chain a product team reads for "what follows a
    // signup", and the baseline a sequence model must beat.
    //
    // Scale shape: the lag window runs per user (bounded by per-user
    // event count, never corpus-wide); transitions collapse to the
    // O(types²) matrix map-side; the from-state totals join is
    // broadcast-sized. Output is types² ≤ 25 rows at any volume.
    Q("p156_markov_transitions", Some("""
      WITH t AS (SELECT user_id, event_type AS to_ev,
                        lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS from_ev
                 FROM events),
      c AS (SELECT from_ev, to_ev, CAST(COUNT(*) AS BIGINT) AS n
            FROM t WHERE from_ev IS NOT NULL GROUP BY 1, 2),
      f AS (SELECT from_ev, CAST(SUM(n) AS BIGINT) AS n_from
            FROM c GROUP BY 1)
      SELECT c.from_ev, c.to_ev, c.n, f.n_from,
             CAST(c.n * 1000000 // f.n_from AS BIGINT) AS p_ppm,
             CAST(CASE WHEN row_number() OVER (PARTITION BY c.from_ev
                    ORDER BY c.n DESC, c.to_ev) = 1
                  THEN 1 ELSE 0 END AS BIGINT) AS is_top
      FROM c JOIN f USING (from_ev)
      ORDER BY 1, 2""")) { (spark, dir) =>
      val winSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type").as("to_ev"),
          lag(col("event_type"), 1).over(winSeq).as("from_ev"))
        .where(col("from_ev").isNotNull)
        .groupBy(col("from_ev"), col("to_ev"))
        .agg(count(lit(1)).as("n"))
      val tot = tr.groupBy(col("from_ev")).agg(sum(col("n")).as("n_from"))
      val winTop = Window.partitionBy(col("from_ev"))
        .orderBy(col("n").desc, col("to_ev"))
      tr.join(broadcast(tot), "from_ev")
        .select(col("from_ev"), col("to_ev"), col("n"), col("n_from"),
          expr("n * 1000000 div n_from").cast("long").as("p_ppm"),
          when(row_number().over(winTop) === 1, 1L).otherwise(0L)
            .as("is_top"))
        .orderBy(col("from_ev"), col("to_ev"))
    },

    // ---- duplicated-span coverage (position-level dedup census) ------------
    // The exact-substring view of duplication (Lee et al.'s
    // "Deduplicating Training Data" granularity): a token POSITION is
    // duplicated when some 10-gram covering it also appears in another
    // document. Distinct-gram fractions (p148) over-count interleaved
    // repeats and under-count long runs; this entry computes the true
    // covered-token count per doc by interval-union sweep — per doc,
    // order duplicated gram positions, and each contributes
    // max(0, end − max(running_prev_end, start−1)) tokens, the classic
    // merge-overlapping-intervals recurrence as a window aggregate.
    //
    // Scale shape: the gram-df table is Heaps-bounded and df ≥ 2
    // filters it further; the sweep window is per-doc (bounded by doc
    // length); output is one row per doc. The quadratic all-pairs
    // substring comparison never exists — df membership IS the
    // duplication oracle.
    Q("p157_dup_span_coverage", Some(s"""
      WITH w AS (SELECT doc_id, source, $wsSql AS ws FROM documents),
      g AS (SELECT doc_id, unnest(generate_series(1, len(sh))) AS pos,
                   unnest(sh) AS gm
            FROM (SELECT doc_id, ${TextSql.shingles("ws", 10)} AS sh
                  FROM w)),
      df AS (SELECT gm, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1),
      dup AS (SELECT g.doc_id, g.pos, g.pos + 9 AS e
              FROM g JOIN df USING (gm) WHERE df.df >= 2),
      sweep AS (SELECT doc_id, pos, e,
                       max(e) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS prev_e
                FROM dup),
      cov AS (SELECT doc_id,
                     CAST(SUM(greatest(0, e - greatest(coalesce(prev_e, 0),
                       pos - 1))) AS BIGINT) AS covered
              FROM sweep GROUP BY 1)
      SELECT w.doc_id, w.source,
             CAST(len(w.ws) AS BIGINT) AS n_tokens,
             coalesce(cov.covered, 0) AS covered_tokens,
             CAST(CASE WHEN len(w.ws) = 0 THEN 0
                  ELSE coalesce(cov.covered, 0) * 1000000 // len(w.ws)
                  END AS BIGINT) AS coverage_ppm
      FROM w LEFT JOIN cov USING (doc_id)
      ORDER BY w.doc_id""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val base = docs.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      val g = docs
        .select(col("doc_id"),
          posexplode(TextOps.shingles(col("text"), 10)).as(Seq("p0", "gm")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("gm"))
        .localCheckpoint()
      val gdf = g.select(col("doc_id"), col("gm")).distinct()
        .groupBy(col("gm")).agg(count(lit(1)).as("df"))
      val winPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cov = g.join(gdf.where(col("df") >= 2), "gm")
        .select(col("doc_id"), col("pos"), (col("pos") + 9).as("e"))
        .withColumn("prev_e", max(col("e")).over(winPrev))
        .select(col("doc_id"),
          greatest(lit(0L), col("e")
            - greatest(coalesce(col("prev_e"), lit(0L)), col("pos") - 1))
            .as("c"))
        .groupBy(col("doc_id")).agg(sum(col("c")).as("covered"))
      base.join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          coalesce(col("covered"), lit(0L)).as("covered_tokens"),
          when(col("n_tokens") === 0, 0L)
            .otherwise(expr(
              "coalesce(covered, 0) * 1000000 div n_tokens"))
            .cast("long").as("coverage_ppm"))
        .orderBy(col("doc_id"))
    },

    // ---- market-basket item-item similarity --------------------------------
    // The co-occurrence recommender baseline: orders are baskets, and
    // for every part the top-3 most-similar parts by cosine over the
    // binary basket-membership vectors. cos²(a,b) = co²/(na·nb) stays
    // in EXACT integer ppm — reporting cos² instead of cos avoids the
    // sqrt that would put engine libm in the hash path (ranking is
    // unchanged: x² is monotone on nonnegatives). co ≥ 2 trims the
    // long co=1 noise tail before any window runs.
    //
    // Scale shape: pair generation is a basket-keyed self-join with
    // fan-out bounded by basket-size² (TPC-H baskets are ~4 items);
    // the co table is (a, b)-keyed; the top-3 window partitions by
    // item over its co≥2 neighbor list — popularity-bounded, never
    // corpus-sized. na/nb attach via a parts-sized broadcast join.
    Q("p158_basket_similarity", Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                 FROM lineitem),
      n AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS nb FROM b GROUP BY 1),
      co AS (SELECT x.pk AS a, y.pk AS b, CAST(COUNT(*) AS BIGINT) AS co
             FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      sym AS (SELECT a AS item, b AS neighbor, co FROM co
              UNION ALL SELECT b, a, co FROM co),
      s AS (SELECT sym.item, sym.neighbor, sym.co,
                   ni.nb AS n_item, nn.nb AS n_neighbor,
                   CAST(sym.co * sym.co * 1000000 // (ni.nb * nn.nb)
                     AS BIGINT) AS cos2_ppm
            FROM sym JOIN n ni ON ni.pk = sym.item
                     JOIN n nn ON nn.pk = sym.neighbor),
      r AS (SELECT *, row_number() OVER (PARTITION BY item
                 ORDER BY cos2_ppm DESC, neighbor) AS rk FROM s)
      SELECT item, CAST(rk AS BIGINT) AS rk, neighbor, co,
             n_item, n_neighbor, cos2_ppm
      FROM r WHERE rk <= 3 ORDER BY item, rk""")) { (spark, dir) =>
      val b = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val n = b.groupBy(col("pk")).agg(count(lit(1)).as("nb"))
      val co = b.select(col("ok"), col("pk").as("a"))
        .join(b.select(col("ok"), col("pk").as("b")), "ok")
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("co"))
        .where(col("co") >= 2)
      val sym = co.select(col("a").as("item"), col("b").as("neighbor"),
          col("co"))
        .unionAll(co.select(col("b").as("item"), col("a").as("neighbor"),
          col("co")))
      val s = sym
        .join(broadcast(n.select(col("pk").as("item"),
          col("nb").as("n_item"))), "item")
        .join(broadcast(n.select(col("pk").as("neighbor"),
          col("nb").as("n_neighbor"))), "neighbor")
        .withColumn("cos2_ppm",
          expr("co * co * 1000000 div (n_item * n_neighbor)").cast("long"))
      val winTop = Window.partitionBy(col("item"))
        .orderBy(col("cos2_ppm").desc, col("neighbor"))
      s.withColumn("rk", row_number().over(winTop).cast("long"))
        .where(col("rk") <= 3)
        .select(col("item"), col("rk"), col("neighbor"), col("co"),
          col("n_item"), col("n_neighbor"), col("cos2_ppm"))
        .orderBy(col("item"), col("rk"))
    },

    // ---- A/B experiment readout with exact chi-squared gate ----------------
    // The experimentation-platform primitive: users split into variants
    // by a deterministic hash rule (parity here), per event type the
    // user-grain conversion rates, the lift, and a 2×2 chi-squared
    // independence test at alpha = 0.05 — decided by EXACT
    // cross-multiplication, never a float: significant iff
    // 1000·N·(ad−bc)² > 3841·(a+b)(c+d)(a+c)(b+d), both sides in
    // 128-bit integers (Spark DECIMAL(38,0), oracle HUGEINT — verified
    // to share floor-division semantics for nonnegative operands), so
    // the same verdict comes back at ANY user count up to ~1e9 where
    // 38 digits saturate. chi2_milli = the statistic ×1000, floor-
    // divided exactly.
    //
    // Scale shape: events collapse to the distinct (user, type) grid
    // map-side; user-variant totals are one distinct-user agg; the
    // 2×2 per type is an O(types) metadata table. Nothing data-sized
    // crosses the driver.
    Q("p159_ab_chi2", Some("""
      WITH u AS (SELECT DISTINCT user_id, user_id % 2 AS variant
                 FROM events),
      tot AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n FROM u
              GROUP BY 1),
      c AS (SELECT DISTINCT e.event_type, e.user_id, u.variant
            FROM events e JOIN u USING (user_id)),
      k AS (SELECT event_type,
                   CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                     AS BIGINT) AS k0,
                   CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS k1
            FROM c GROUP BY 1),
      g AS (SELECT k.event_type, t0.n AS n0, k.k0, t1.n AS n1, k.k1
            FROM k, (SELECT n FROM tot WHERE variant = 0) t0,
                    (SELECT n FROM tot WHERE variant = 1) t1),
      x AS (SELECT event_type, n0, k0, n1, k1,
                   CAST(k0 AS HUGEINT) * (n1 - k1)
                     - CAST(k1 AS HUGEINT) * (n0 - k0) AS det,
                   CAST(n0 AS HUGEINT) * n1 * (k0 + k1)
                     * (n0 + n1 - k0 - k1) AS den
            FROM g)
      SELECT event_type, n0, k0, n1, k1,
             CAST(k0 * 1000000 // n0 AS BIGINT) AS rate0_ppm,
             CAST(k1 * 1000000 // n1 AS BIGINT) AS rate1_ppm,
             CAST(k1 * 1000000 // n1 - k0 * 1000000 // n0 AS BIGINT)
               AS lift_ppm,
             CAST(CASE WHEN den = 0 THEN 0
                  ELSE 1000 * (n0 + n1) * det * det // den
                  END AS BIGINT) AS chi2_milli,
             CAST(CASE WHEN den = 0 THEN 0
                  WHEN 1000 * (n0 + n1) * det * det > 3841 * den THEN 1
                  ELSE 0 END AS BIGINT) AS significant
      FROM x ORDER BY event_type""")) { (spark, dir) =>
      val u = Tables.load(spark, dir, "events")
        .select(col("user_id"), (col("user_id") % 2).as("variant"))
        .distinct()
      val tot = u.groupBy(col("variant")).agg(count(lit(1)).as("n"))
      val n0 = tot.where(col("variant") === 0)
        .select(col("n").as("n0"))
      val n1 = tot.where(col("variant") === 1)
        .select(col("n").as("n1"))
      val k = Tables.load(spark, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .join(u, "user_id")
        .groupBy(col("event_type"))
        .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("k0"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("k1"))
      val d38 = "DECIMAL(38,0)"
      k.crossJoin(broadcast(n0)).crossJoin(broadcast(n1))
        .withColumn("det", expr(
          s"CAST(k0 AS $d38) * (n1 - k1) - CAST(k1 AS $d38) * (n0 - k0)"))
        .withColumn("den", expr(
          s"CAST(n0 AS $d38) * n1 * (k0 + k1) * (n0 + n1 - k0 - k1)"))
        .select(col("event_type"), col("n0"), col("k0"), col("n1"),
          col("k1"),
          expr("k0 * 1000000 div n0").cast("long").as("rate0_ppm"),
          expr("k1 * 1000000 div n1").cast("long").as("rate1_ppm"),
          expr("k1 * 1000000 div n1 - k0 * 1000000 div n0").cast("long")
            .as("lift_ppm"),
          expr("""CAST(CASE WHEN den = 0 THEN 0
              ELSE 1000 * (n0 + n1) * det * det div den
              END AS BIGINT)""").as("chi2_milli"),
          expr("""CAST(CASE WHEN den = 0 THEN 0
              WHEN 1000 * (n0 + n1) * det * det > 3841 * den THEN 1
              ELSE 0 END AS BIGINT)""").as("significant"))
        .orderBy(col("event_type"))
    },

    // ---- per-source length-distribution drift (total-variation) ------------
    // The distribution-shift monitor a corpus pipeline runs per
    // ingest source: each source's token-length histogram over 16
    // fixed-width buckets against the whole-corpus baseline, compared
    // by total-variation distance TV = ½·Σ|p_d − q_d|. Shares are
    // floored to ppm FIRST and the TV computed over ppm integers —
    // bounded ≤ 10⁶ at any corpus size, so the arithmetic never
    // outgrows BIGINT no matter the scale (the ≤ n_buckets-ppm floor
    // bias is deterministic and identical in both engines). Also
    // reports the worst bucket (argmax deviation, ties toward the
    // smaller bucket) — WHERE the drift lives, not just how much.
    //
    // Scale shape: one doc-grain scan collapses to the O(sources × 16)
    // grid map-side; everything after runs on that metadata table.
    Q("p160_source_drift_tv", Some(s"""
      WITH d AS (SELECT source, least(len($wsSql) // 8, 15) AS b
                 FROM documents),
      s AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS n_sb
            FROM d GROUP BY 1, 2),
      ns AS (SELECT source, CAST(SUM(n_sb) AS BIGINT) AS n_s
             FROM s GROUP BY 1),
      c AS (SELECT b, CAST(SUM(n_sb) AS BIGINT) AS n_b FROM s GROUP BY 1),
      n AS (SELECT CAST(SUM(n_sb) AS BIGINT) AS n_tot FROM s),
      grid AS (SELECT ns.source, c.b,
                      coalesce(s.n_sb, 0) AS n_sb, ns.n_s, c.n_b, n.n_tot
               FROM ns CROSS JOIN c CROSS JOIN n
               LEFT JOIN s ON s.source = ns.source AND s.b = c.b),
      dev AS (SELECT source, b, n_s,
                     abs(n_sb * 1000000 // n_s - n_b * 1000000 // n_tot)
                       AS dev_ppm
              FROM grid),
      tv AS (SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
                    CAST(SUM(dev_ppm) // 2 AS BIGINT) AS tv_ppm
             FROM dev GROUP BY 1),
      w AS (SELECT source, CAST(b AS BIGINT) AS worst_bucket,
                   CAST(dev_ppm AS BIGINT) AS worst_dev_ppm
            FROM dev QUALIFY row_number() OVER (PARTITION BY source
              ORDER BY dev_ppm DESC, b) = 1)
      SELECT source, n_docs, tv_ppm, worst_bucket, worst_dev_ppm
      FROM tv JOIN w USING (source) ORDER BY source""")) { (spark, dir) =>
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .select(col("source"), expr("least(n_tok div 8, 15)").as("b"))
      val s = d.groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("n_sb"))
      val ns = s.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
      val c = s.groupBy(col("b")).agg(sum(col("n_sb")).as("n_b"))
      val nTot = s.agg(sum(col("n_sb")).as("n_tot"))
      val grid = ns.crossJoin(broadcast(c)).crossJoin(broadcast(nTot))
        .join(s, Seq("source", "b"), "left")
        .select(col("source"), col("b"), col("n_s"), col("n_b"),
          col("n_tot"), coalesce(col("n_sb"), lit(0L)).as("n_sb"))
      val dev = grid.select(col("source"), col("b"), col("n_s"),
        abs(expr("n_sb * 1000000 div n_s")
          - expr("n_b * 1000000 div n_tot")).as("dev_ppm"))
      val tv = dev.groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"),
          expr("sum(dev_ppm) div 2").cast("long").as("tv_ppm"))
      val winWorst = Window.partitionBy(col("source"))
        .orderBy(col("dev_ppm").desc, col("b"))
      val w = dev.withColumn("rk", row_number().over(winWorst))
        .where(col("rk") === 1)
        .select(col("source"), col("b").cast("long").as("worst_bucket"),
          col("dev_ppm").cast("long").as("worst_dev_ppm"))
      tv.join(w, "source")
        .select(col("source"), col("n_docs"), col("tv_ppm"),
          col("worst_bucket"), col("worst_dev_ppm"))
        .orderBy(col("source"))
    },

    // ---- integer-log2 unigram surprisal ------------------------------------
    // The perplexity-proxy quality score with ZERO floating point: per
    // token occurrence, surprisal = floor(log2(N/count)) bits, read off
    // as length(bin(N div count)) − 1 — the bit-length trick p121 uses
    // for HLL rho, exact and identical in both engines (no libm ln in
    // the hash path). Rare-vocab documents score high (novel or noisy),
    // boilerplate scores low; mean milli-bits per doc is the corpus-
    // relative compressibility estimate a unigram coder would achieve,
    // floor-quantized.
    //
    // Scale shape: the token-count table is Heaps-bounded (vocab, not
    // corpus, sized) and joins back against the token stream keyed by
    // token; N is a 1-row broadcast. One scan, one vocab shuffle, one
    // doc-keyed rollup.
    Q("p161_unigram_surprisal", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
      c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
      s AS (SELECT t.doc_id,
                   CAST(length(bin(n.n_total // c.c)) - 1 AS BIGINT) AS bits
            FROM t JOIN c USING (tok) CROSS JOIN n)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(bits) AS BIGINT) AS total_bits,
             CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT) AS mean_millibits
      FROM s GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val t = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      val c = t.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val n = t.agg(count(lit(1)).as("n_total"))
      t.join(c, "tok").crossJoin(broadcast(n))
        .select(col("doc_id"),
          (length(bin(expr("n_total div c"))) - 1).cast("long").as("bits"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("total_bits"),
          expr("sum(bits) * 1000 div count(1)").cast("long")
            .as("mean_millibits"))
        .orderBy(col("doc_id"))
    },

    // ---- incremental connected-component maintenance -----------------------
    // The ingest-time continuation of the dedup DAG: the standing
    // corpus (doc_id % 3 ≠ 0) has MATERIALIZED near-dup labels
    // (SharedStages.corpusLabels — in production a bucketed table); a
    // new batch arrives and its screening edges (p122's banded
    // incoming→corpus probes) must be folded into the clustering
    // WITHOUT rerunning the corpus fixpoint. The fold is the classic
    // label-contraction: map each new edge's corpus endpoint to its
    // old label, run CC on the contracted graph — whose size is
    // bounded by the BATCH, not the corpus — and relabel only the
    // touched components via one broadcast-sized remap join. The
    // oracle recomputes CC from scratch over old-pairs ∪ new-edges;
    // the hash match is the incremental ≡ full-recompute proof.
    //
    // Output: every doc in a component containing ≥1 incoming doc
    // (incoming singletons as their own cluster), with the cluster id
    // = min doc_id of the merged component — identical under both
    // computations by construction of min-label contraction.
    //
    // Scale shape: old labels are a parquet scan; new edges are the
    // |batch|×bucket-width banded join; the contracted CC fixpoint
    // runs on O(|batch|) nodes; the remap join fans out only into the
    // touched components. The corpus×corpus term exists only in the
    // oracle.
    Q("p162_incremental_cc", Some(incrementalCcOracle)) { (spark, dir) =>
      import graft.ops.DedupOps
      val docs = Tables.loadSpread(spark, dir, "documents")
      val inc = docs.where(col("doc_id") % 3 === 0)
      // materialized standing-corpus state (parquet scan after the
      // first consumer in the process)
      val oldr = SharedStages.corpusLabels(spark, dir)
        .select(col("n").as("doc"), col("lbl").as("old_lbl"))
      val newE = DedupOps.incrementalPairsPreBanded(
          SharedStages.corpusBands(spark, dir), inc, "doc_id", "text")
        .select(col("in_id"), col("ex_id"))
      // contract: corpus endpoint → its old component label (or itself
      // when unlabeled); the CC that follows runs on batch-bounded nodes
      val contracted = newE
        .join(oldr.select(col("doc").as("ex_id"), col("old_lbl")),
          Seq("ex_id"), "left")
        .select(col("in_id").as("a"),
          coalesce(col("old_lbl"), col("ex_id")).as("b"))
      val cc2 = DedupOps.connectedComponents(contracted)
        .select(col("n").as("node"), col("lbl").as("new_lbl"))
      // incoming members of merged components
      val ccIn = cc2.where(col("node") % 3 === 0)
        .select(col("node").as("doc_id"), col("new_lbl").as("cluster_id"))
      // corpus side: a label node expands to its whole old component
      // (which includes itself); an unlabeled corpus node stands alone
      val exp = cc2.where(col("node") % 3 =!= 0)
        .join(oldr, cc2("node") === oldr("old_lbl"), "left")
        .select(coalesce(col("doc"), col("node")).as("doc_id"),
          col("new_lbl").as("cluster_id"))
      // incoming docs with no screening hit: singleton clusters
      val inSolo = inc.select(col("doc_id"))
        .join(ccIn.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster_id"))
      ccIn.unionAll(exp).unionAll(inSolo)
        .select(col("doc_id"), col("cluster_id"),
          when(col("doc_id") % 3 === 0, "in").otherwise("corpus")
            .as("role"))
        .orderBy(col("doc_id"))
    },

    // ---- STREAMING incremental CC maintenance ------------------------------
    // p162's fold deployed as a stateful stream: incoming docs arrive
    // over SEVERAL micro-batches (pre-split source, maxFilesPerTrigger
    // = 1) and foreachBatch folds each batch's screening edges into
    // versioned remap/inassign state tables — the production shape of
    // "keep the corpus dedup clustering current as data lands". The
    // oracle is the SAME SQL text as p162 (full recompute over the
    // union graph), so the hash match proves the per-batch folds
    // COMPOSE: state after N batches ≡ one-shot CC, independent of the
    // batch split — min-label contraction is associative.
    Q("p163_stream_incremental_cc", Some(incrementalCcOracle)) {
      (spark, dir) =>
        val root = sinkDir(s"p163_${Integer.toHexString(dir.hashCode)}") +
          s"/${System.nanoTime()}"
        graft.streaming.StreamingOps.incrementalCcIngest(spark, dir, root)
          .orderBy(col("doc_id"))
    },

    // ---- greedy max-coverage corpus selection ------------------------------
    // Submodular data selection (facility location / max-coverage):
    // pick k = 5 documents greedily maximizing NEWLY covered distinct
    // 5-grams — the classic (1 − 1/e)-approximate core-set builder a
    // curation pipeline runs to seed a diverse subset. Ties break
    // toward the smaller doc_id. Per pick: rank, the marginal gain,
    // and the cumulative coverage in exact ppm of the corpus gram
    // universe.
    //
    // Scale shape: greedy is inherently k sequential rounds; each
    // round is ONE anti-join against the covered-gram table (Heaps-
    // bounded, checkpointed) + one map-side-combined per-doc count,
    // and the driver reads exactly ONE row (the argmax) — the p99 BPE
    // bounded-driver-read pattern, k=5 rows total. The oracle unrolls
    // the SAME five rounds as materialized CTEs (the p116 discipline:
    // the trajectory is checked, not just the final set).
    Q("p165_greedy_coverage", Some {
      val k = 5
      val rounds = (1 to k).map { i =>
        s"""r$i AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain
             FROM g WHERE doc_id NOT IN (SELECT doc_id FROM picked${i - 1})
               AND gm NOT IN (SELECT gm FROM cov${i - 1})
             GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
           cov$i AS (SELECT gm FROM cov${i - 1}
                     UNION SELECT g.gm FROM g JOIN r$i USING (doc_id)),
           picked$i AS (SELECT doc_id FROM picked${i - 1}
                        UNION SELECT doc_id FROM r$i),
           sel$i AS (SELECT $i AS rk, doc_id, gain FROM r$i)"""
      }.mkString(",\n      ")
      val union = (1 to k).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      s"""
      WITH w AS (SELECT doc_id, ${TextSql.shingles(TextSql.ws, 5)} AS sh
                 FROM documents),
      g AS (SELECT DISTINCT doc_id, unnest(sh) AS gm FROM w),
      tot AS (SELECT CAST(COUNT(DISTINCT gm) AS BIGINT) AS t FROM g),
      cov0 AS (SELECT gm FROM g WHERE false),
      picked0 AS (SELECT doc_id FROM g WHERE false),
      $rounds,
      sel AS ($union)
      SELECT CAST(rk AS BIGINT) AS rk, doc_id, gain,
             CAST(SUM(gain) OVER (ORDER BY rk) AS BIGINT) AS cum_covered,
             CAST(SUM(gain) OVER (ORDER BY rk) * 1000000 // t AS BIGINT)
               AS cum_ppm
      FROM sel CROSS JOIN tot ORDER BY rk"""
    }) { (spark, dir) =>
      val g = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.shingles(col("text"), 5)).as("gm"))
        .distinct().localCheckpoint()
      // bounded driver reads: the gram-universe size (1 row) and one
      // argmax row per greedy round — k + 1 single-row actions total
      val tot = g.agg(countDistinct(col("gm"))).first().getLong(0)
      var covered = g.select(col("gm")).where(lit(false))
      var picked = Set.empty[Long]
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var cum = 0L
      var rk = 1
      var exhausted = false
      while (rk <= 5 && !exhausted) {
        val win = g.where(!col("doc_id").isInCollection(picked))
          .join(covered, Seq("gm"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id"))
          .limit(1).collect()
        // every candidate at gain 0 → the universe is covered; the
        // oracle's round-i CTE is empty too, so both sides stop short
        if (win.isEmpty) exhausted = true
        else {
          val (id, gain) = (win(0).getLong(0), win(0).getLong(1))
          picked += id
          cum += gain
          sel += ((rk.toLong, id, gain))
          // r20: no per-round distinct — left_anti semantics are
          // unchanged under duplicate gm values (g is per-doc distinct
          // already; only cross-pick repeats occur), so the per-round
          // dedup shuffle of the growing covered set was pure overhead.
          // r21 growth guard (VERDICT r20 #5): without ANY dedup the
          // checkpointed table grows by the full per-pick gram slice
          // each round — monotonically fattening the probe side at
          // many-pick scale — so compact it every 8th pick. Cadence 8
          // bounds the duplication at 8 slices for a many-pick
          // deployment while THIS entry (k pinned at 5 by the declared
          // query) never pays: firing the compaction inside the k=5
          // loop was measured at +0.95 s/run at sf0.1 for zero
          // semantic effect (duplication is already ≤ 5 bounded slices).
          val grown = covered
            .unionAll(g.where(col("doc_id") === id).select(col("gm")))
          covered = (if (rk % 8 == 0) grown.distinct() else grown)
            .localCheckpoint()
          rk += 1
        }
      }
      import spark.implicits._
      var acc = 0L
      sel.toSeq.map { case (rk, id, gain) =>
        acc += gain
        (rk, id, gain, acc, acc * 1000000L / tot)
      }.toDF("rk", "doc_id", "gain", "cum_covered", "cum_ppm")
        .orderBy(col("rk"))
    },

    // ---- bitmap-index set intersection -------------------------------------
    // The warehouse bitmap-join: per event type, the active (user, day)
    // universe packed into 60-bit words (idx = user·512 + dayofyear;
    // 60 not 64 because DuckDB raises on 1::BIGINT << 63, the simhash
    // lesson) via a map-side bit_or aggregate; pairwise intersection /
    // union cardinalities then cost ONE word-keyed join + bit_count —
    // a 60× compression of the row-level join. The row-level counts
    // are computed in the SAME query and emitted next to the bitmap
    // counts: the output carries its own exactness proof (agree = 1),
    // and the oracle hash-pins both paths.
    //
    // Scale shape: bitmap tables are |universe|/60 words per type,
    // bit_or collapses map-side, the pair joins co-partition on the
    // word key. The row-level path exists only as the in-query proof.
    Q("p166_bitmap_index", Some("""
      WITH d AS (SELECT DISTINCT event_type,
                        user_id * 512 + dayofyear(CAST(date_trunc('day', ts)
                          AS DATE)) AS idx
                 FROM events),
      b AS (SELECT event_type, idx // 60 AS w,
                   CAST(bit_or(1::BIGINT << CAST(idx % 60 AS INT))
                     AS BIGINT) AS bm
            FROM d GROUP BY 1, 2),
      nb AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_words,
                    CAST(SUM(bit_count(bm)) AS BIGINT) AS total_bits
             FROM b GROUP BY 1),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
                FROM nb a, nb b WHERE a.event_type < b.event_type),
      -- union over an INNER word join misses words present on one side
      -- only: add back each side's unmatched bits from the per-type
      -- bitmap totals (all quantities bitmap-derived)
      bi AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
                    CAST(SUM(bit_count(x.bm & y.bm)) AS BIGINT) AS n_int,
                    CAST(SUM(bit_count(x.bm | y.bm)) AS BIGINT) AS u_m,
                    CAST(SUM(bit_count(x.bm)) AS BIGINT) AS m_a,
                    CAST(SUM(bit_count(y.bm)) AS BIGINT) AS m_b
             FROM b x JOIN b y ON x.w = y.w
               AND x.event_type < y.event_type
             GROUP BY 1, 2),
      ri AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                    CAST(COUNT(*) AS BIGINT) AS n_int_rows
             FROM d a JOIN d b USING (idx)
             WHERE a.event_type < b.event_type GROUP BY 1, 2),
      rn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
             FROM d GROUP BY 1)
      SELECT p.type_a, p.type_b,
             na.n_words AS n_words_a, nbb.n_words AS n_words_b,
             coalesce(bi.n_int, 0) AS int_bitmap,
             coalesce(ri.n_int_rows, 0) AS int_rows,
             coalesce(bi.u_m, 0) + (na.total_bits - coalesce(bi.m_a, 0))
               + (nbb.total_bits - coalesce(bi.m_b, 0)) AS union_bitmap,
             ra.n + rb.n - coalesce(ri.n_int_rows, 0) AS union_rows,
             CAST(CASE WHEN coalesce(bi.n_int, 0)
                         = coalesce(ri.n_int_rows, 0)
                   AND coalesce(bi.u_m, 0)
                         + (na.total_bits - coalesce(bi.m_a, 0))
                         + (nbb.total_bits - coalesce(bi.m_b, 0))
                         = ra.n + rb.n - coalesce(ri.n_int_rows, 0)
                  THEN 1 ELSE 0 END AS BIGINT) AS agree
      FROM pairs p
      JOIN nb na ON na.event_type = p.type_a
      JOIN nb nbb ON nbb.event_type = p.type_b
      JOIN rn ra ON ra.event_type = p.type_a
      JOIN rn rb ON rb.event_type = p.type_b
      LEFT JOIN bi ON bi.type_a = p.type_a AND bi.type_b = p.type_b
      LEFT JOIN ri ON ri.type_a = p.type_a AND ri.type_b = p.type_b
      ORDER BY 1, 2""")) { (spark, dir) =>
      val d = Tables.load(spark, dir, "events")
        .select(col("event_type"),
          (col("user_id") * 512
            + dayofyear(date_trunc("DAY", col("ts")).cast("date")))
            .as("idx"))
        .distinct()
        .localCheckpoint()
      val b = d.groupBy(col("event_type"), expr("idx div 60").as("w"))
        .agg(expr("CAST(bit_or(shiftleft(1L, CAST(idx % 60 AS INT))) " +
          "AS BIGINT)").as("bm"))
      val nb = b.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_words"),
          sum(expr("bit_count(bm)")).as("total_bits"))
      val rn = d.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val pairs = nb.select(col("event_type").as("type_a"),
          col("n_words").as("n_words_a"), col("total_bits").as("tba"))
        .crossJoin(nb.select(col("event_type").as("type_b"),
          col("n_words").as("n_words_b"), col("total_bits").as("tbb")))
        .where(col("type_a") < col("type_b"))
      val bi = b.select(col("event_type").as("type_a"), col("w"),
          col("bm").as("bma"))
        .join(b.select(col("event_type").as("type_b"), col("w"),
          col("bm").as("bmb")), "w")
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(sum(expr("bit_count(bma & bmb)")).as("n_int"),
          sum(expr("bit_count(bma | bmb)")).as("u_m"),
          sum(expr("bit_count(bma)")).as("m_a"),
          sum(expr("bit_count(bmb)")).as("m_b"))
      val ri = d.select(col("event_type").as("type_a"), col("idx"))
        .join(d.select(col("event_type").as("type_b"), col("idx")), "idx")
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_int_rows"))
      pairs
        .join(broadcast(rn.select(col("event_type").as("type_a"),
          col("n").as("na"))), "type_a")
        .join(broadcast(rn.select(col("event_type").as("type_b"),
          col("n").as("nb"))), "type_b")
        .join(broadcast(bi), Seq("type_a", "type_b"), "left")
        .join(broadcast(ri), Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("n_words_a"),
          col("n_words_b"),
          coalesce(col("n_int"), lit(0L)).as("int_bitmap"),
          coalesce(col("n_int_rows"), lit(0L)).as("int_rows"),
          (coalesce(col("u_m"), lit(0L))
            + (col("tba") - coalesce(col("m_a"), lit(0L)))
            + (col("tbb") - coalesce(col("m_b"), lit(0L))))
            .as("union_bitmap"),
          (col("na") + col("nb") - coalesce(col("n_int_rows"), lit(0L)))
            .as("union_rows"))
        .withColumn("agree",
          when(col("int_bitmap") === col("int_rows")
            && col("union_bitmap") === col("union_rows"), 1L)
            .otherwise(0L))
        .orderBy(col("type_a"), col("type_b"))
    },

    // ---- fuzzy join via deletion-neighborhood blocking ---------------------
    // The entity-resolution primitive: names within Levenshtein
    // distance 1 found WITHOUT an all-pairs scan. Every name emits its
    // len+1 deletion variants (drop each position, plus the name
    // itself); any two names at distance ≤ 1 — substitution, insert,
    // or delete — provably share a key, so the candidate set is the
    // union of per-key buckets, verified by an exact levenshtein only
    // on candidates (both engines run the same textbook DP, so the
    // distances hash-match). Per customer: how many distance-≤1
    // neighbors exist — the merge-candidate census a dedup queue
    // consumes.
    //
    // Scale shape: keys per name = O(len); bucket widths are
    // data-bounded (a key matches only names one edit from a fixed
    // string); the verify step touches candidates, never the n²
    // pairs. The classic blocking-join deployment.
    Q("p167_fuzzy_join", Some("""
      WITH n AS (SELECT c_custkey AS id, c_name AS s FROM customer),
      k AS (SELECT id, s, unnest(list_append(
                   [substr(s, 1, i - 1) || substr(s, i + 1, length(s))
                    for i in generate_series(1, length(s))], s)) AS key
            FROM n),
      cand AS (SELECT DISTINCT a.id AS ida, a.s AS sa,
                      b.id AS idb, b.s AS sb
               FROM k a JOIN k b ON a.key = b.key AND a.id < b.id),
      hits AS (SELECT ida, idb FROM cand WHERE levenshtein(sa, sb) <= 1),
      sym AS (SELECT ida AS id, idb AS nb FROM hits
              UNION ALL SELECT idb, ida FROM hits)
      SELECT n.id AS c_custkey,
             CAST(coalesce(c.n_nb, 0) AS BIGINT) AS n_neighbors
      FROM n LEFT JOIN (SELECT id, COUNT(*) AS n_nb FROM sym GROUP BY 1) c
        ON c.id = n.id
      ORDER BY 1""")) { (spark, dir) =>
      val n = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("s"))
      val k = n.select(col("id"), col("s"),
        explode(expr("""concat(
            transform(sequence(1, length(s)),
              i -> concat(substring(s, 1, i - 1),
                          substring(s, i + 1, length(s)))),
            array(s))""")).as("key"))
      val cand = k.select(col("id").as("ida"), col("s").as("sa"),
          col("key"))
        .join(k.select(col("id").as("idb"), col("s").as("sb"),
          col("key")), "key")
        .where(col("ida") < col("idb"))
        .select(col("ida"), col("sa"), col("idb"), col("sb"))
        .distinct()
      val hits = cand.where(levenshtein(col("sa"), col("sb")) <= 1)
        .select(col("ida"), col("idb"))
      val sym = hits.select(col("ida").as("id"))
        .unionAll(hits.select(col("idb").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("n_nb"))
      n.select(col("id")).join(sym, Seq("id"), "left")
        .select(col("id").as("c_custkey"),
          coalesce(col("n_nb"), lit(0L)).as("n_neighbors"))
        .orderBy(col("c_custkey"))
    },

    // ---- Pareto frontier (skyline) -----------------------------------------
    // The non-dominated set over (activity, spend): a user is on the
    // frontier iff no other user has ≥ events AND ≥ cents with one
    // strict — the multi-objective "best customers" query relational
    // engines lack as a primitive. Over DISTINCT (n, c) points sorted
    // (n DESC, c DESC), a point survives iff its c strictly exceeds
    // the running max of all preceding c — one pass, no pairwise
    // dominance join.
    //
    // Scale shape: the running max is the p135 two-phase split:
    // per-n-bucket partial maxes → exclusive prefix over the
    // O(distinct n) metadata table → per-bucket windows. The oracle
    // runs the naive single-window form; the hash match is the
    // two-phase ≡ naive equivalence proof. Users collapse to the
    // distinct point set before anything orders.
    Q("p168_pareto_frontier", Some("""
      WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS c
                 FROM events GROUP BY 1),
      p AS (SELECT DISTINCT n, c FROM u),
      r AS (SELECT n, c,
                   max(c) OVER (ORDER BY n DESC, c DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS pm
            FROM p),
      f AS (SELECT n, c FROM r WHERE pm IS NULL OR c > pm)
      SELECT u.user_id, u.n AS n_events, u.c AS cents
      FROM u JOIN f USING (n, c) ORDER BY u.user_id""")) { (spark, dir) =>
      val u = Tables.load(spark, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      val p = u.select(col("n"), col("c")).distinct()
      // two-phase running max: bucket = the n value itself (the
      // metadata table is O(distinct n)); exclusive prefix over
      // buckets in n-DESC order, then per-bucket c-DESC windows
      val offs = p.groupBy(col("n")).agg(max(col("c")).as("bmax"))
        .withColumn("prev", max(col("bmax")).over(
          Window.orderBy(col("n").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("n"), col("prev"))
      val inBucket = Window.partitionBy(col("n")).orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val f = p.join(broadcast(offs), "n")
        .withColumn("pm",
          greatest(coalesce(max(col("c")).over(inBucket),
            lit(Long.MinValue)),
            coalesce(col("prev"), lit(Long.MinValue))))
        .where(col("pm") === Long.MinValue || col("c") > col("pm"))
        .select(col("n"), col("c"))
      u.join(f, Seq("n", "c"))
        .select(col("user_id"), col("n").as("n_events"),
          col("c").as("cents"))
        .orderBy(col("user_id"))
    },

    // ---- Benford first-digit audit -----------------------------------------
    // The forensic-accounting screen: natural multiplicative data
    // follows Benford's law (P(d) = log10(1+1/d)); fabricated or
    // truncated feeds don't. Expected shares are PRE-COMPUTED ppm
    // literals embedded identically in both engines (the p153
    // lc-table discipline — no engine runs log10), and the first
    // significant digit is read off the EXACT-cents integer's decimal
    // string, so no float formatting difference can split the hash.
    //
    // Scale shape: one scan collapses to 9 digit rows map-side;
    // everything downstream is a constants join.
    Q("p169_benford_audit", Some {
      val exp = (1 to 9).map(d =>
        s"($d, ${math.round(1e6 * math.log10(1.0 + 1.0 / d))})")
        .mkString(", ")
      s"""
      WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                        AS cents FROM orders),
      d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit FROM c WHERE cents > 0),
      o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
            GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM o),
      e(digit, exp_ppm) AS (VALUES $exp)
      SELECT e.digit, coalesce(o.n, 0) AS n,
             CAST(coalesce(o.n, 0) * 1000000 // t.tot AS BIGINT)
               AS obs_ppm,
             CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
             CAST(abs(coalesce(o.n, 0) * 1000000 // t.tot - e.exp_ppm)
               AS BIGINT) AS dev_ppm
      FROM e LEFT JOIN o USING (digit) CROSS JOIN t
      ORDER BY e.digit"""
    }) { (spark, dir) =>
      val expRows = (1 to 9).map(d =>
        (d.toLong, math.round(1e6 * math.log10(1.0 + 1.0 / d))))
      import spark.implicits._
      val e = expRows.toDF("digit", "exp_ppm")
      val o = Tables.load(spark, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)")
          .as("cents"))
        .where(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val t = o.agg(sum(col("n")).as("tot"))
      broadcast(e).join(o, Seq("digit"), "left").crossJoin(broadcast(t))
        .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
          expr("coalesce(n, 0) * 1000000 div tot").cast("long")
            .as("obs_ppm"),
          col("exp_ppm"),
          abs(expr("coalesce(n, 0) * 1000000 div tot")
            - col("exp_ppm")).cast("long").as("dev_ppm"))
        .orderBy(col("digit"))
    },

    // ---- largest-remainder (Hamilton) sample apportionment -----------------
    // The exact way to split a fixed 10000-sample budget across
    // sources proportionally to token mass: floor quotas first
    // (B·w div W), then the leftover R = B − Σfloor seats go one each
    // to the R largest remainders (B·w mod W), ties toward the
    // lexicographically smaller source. Unlike per-source rounding,
    // the allocations sum to EXACTLY B by construction — the
    // invariant a downstream loader depends on — and everything is
    // integer arithmetic, so both engines agree digit-for-digit.
    //
    // Scale shape: token mass collapses per source map-side; the
    // apportionment runs on the O(sources) metadata table.
    Q("p170_sample_apportionment", Some(s"""
      WITH w AS (SELECT source, CAST(SUM(len($wsSql)) AS BIGINT) AS tokens
                 FROM documents GROUP BY 1),
      t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS wt FROM w),
      q AS (SELECT source, tokens,
                   CAST(10000 * tokens // t.wt AS BIGINT) AS fl,
                   CAST(10000 * tokens % t.wt AS BIGINT) AS rem
            FROM w CROSS JOIN t),
      s AS (SELECT CAST(10000 - SUM(fl) AS BIGINT) AS r FROM q),
      rk AS (SELECT source, tokens, fl,
                    row_number() OVER (ORDER BY rem DESC, source) AS rn
             FROM q)
      SELECT rk.source, rk.tokens, rk.fl AS floor_alloc,
             CAST(CASE WHEN rk.rn <= s.r THEN 1 ELSE 0 END AS BIGINT)
               AS extra,
             rk.fl + CASE WHEN rk.rn <= s.r THEN 1 ELSE 0 END
               AS final_alloc
      FROM rk CROSS JOIN s ORDER BY rk.source""")) { (spark, dir) =>
      val w = Tables.loadSpread(spark, dir, "documents")
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("tokens"))
      val t = w.agg(sum(col("tokens")).as("wt"))
      val q = w.crossJoin(broadcast(t))
        .select(col("source"), col("tokens"),
          expr("10000 * tokens div wt").cast("long").as("fl"),
          expr("10000 * tokens % wt").cast("long").as("rem"))
      val s = q.agg((lit(10000L) - sum(col("fl"))).as("r"))
      val rk = q.withColumn("rn",
        row_number().over(Window.orderBy(col("rem").desc, col("source"))))
      rk.crossJoin(broadcast(s))
        .select(col("source"), col("tokens"), col("fl").as("floor_alloc"),
          when(col("rn") <= col("r"), 1L).otherwise(0L).as("extra"),
          (col("fl") + when(col("rn") <= col("r"), 1L).otherwise(0L))
            .as("final_alloc"))
        .orderBy(col("source"))
    },

    // ---- gaps and islands (sequence-completeness audit) --------------------
    // The classic delivery-completeness check: per user, contiguous
    // runs of event_ids ("islands") found by the id − dense-rank
    // grouping trick — consecutive ids share a group key, one window
    // + one agg, no self-join. Per user: island count, the longest
    // run, and the missing-id volume inside the user's [min, max]
    // span — the holes an at-least-once pipeline must reconcile.
    //
    // Scale shape: the rank window partitions per user (bounded);
    // islands collapse map-side to the per-user summary.
    Q("p171_gaps_islands", Some("""
      WITH e AS (SELECT DISTINCT user_id, event_id FROM events),
      g AS (SELECT user_id, event_id,
                   event_id - row_number() OVER (PARTITION BY user_id
                     ORDER BY event_id) AS grp
            FROM e),
      i AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(event_id) AS lo, MAX(event_id) AS hi
            FROM g GROUP BY 1, 2)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
             CAST(MAX(len) AS BIGINT) AS longest_island,
             CAST(SUM(len) AS BIGINT) AS n_present,
             CAST(MAX(hi) - MIN(lo) + 1 - SUM(len) AS BIGINT)
               AS n_missing
      FROM i GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id")).distinct()
      val winSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      val i = e
        .withColumn("grp",
          col("event_id") - row_number().over(winSeq))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("event_id")).as("lo"),
          max(col("event_id")).as("hi"))
      i.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          max(col("len")).as("longest_island"),
          sum(col("len")).as("n_present"),
          (max(col("hi")) - min(col("lo")) + 1 - sum(col("len")))
            .as("n_missing"))
        .orderBy(col("user_id"))
    },

    // ---- strict ordered-pattern funnel (MATCH_RECOGNIZE replacement) -------
    // The sequence-pattern operator Spark lacks as SQL: count, per
    // user, COMPLETED view → click → purchase chains where each step
    // follows the previous STRICTLY and within 1 hour. Instead of a
    // per-event backward search (quadratic) the state is CARRIED
    // forward by two running-max windows: at every event, the latest
    // prior view; a click within the timeout stamps a chain time; the
    // latest prior chain time then validates purchases — the standard
    // way to compile a fixed linear pattern into O(events) window
    // algebra (the p115 last-touch carry, chained twice). p66 keeps
    // the one-chain-per-user earliest progression; this entry counts
    // EVERY completion under per-step timeouts.
    //
    // Scale shape: both carries are per-user frames over the arrival
    // order; the rollup is user-keyed. No self-join, no pattern
    // automaton state beyond two carried columns.
    Q("p172_pattern_funnel", Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                        CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
      w AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_view
            FROM e),
      x AS (SELECT *, CASE WHEN event_type = 'click'
                        AND last_view IS NOT NULL
                        AND us - last_view <= 3600000000
                      THEN us END AS ab_us
            FROM w),
      y AS (SELECT *, max(ab_us)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_chain
            FROM x)
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                    AND last_chain IS NOT NULL
                    AND us - last_chain <= 3600000000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_funnels
      FROM y GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val winSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      e.withColumn("last_view",
          max(when(col("event_type") === "view", col("us"))).over(winSeq))
        .withColumn("ab_us",
          when(col("event_type") === "click"
            && col("last_view").isNotNull
            && col("us") - col("last_view") <= 3600000000L, col("us")))
        .withColumn("last_chain", max(col("ab_us")).over(winSeq))
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase"
            && col("last_chain").isNotNull
            && col("us") - col("last_chain") <= 3600000000L, 1L)
          .otherwise(0L)).as("n_funnels"))
        .orderBy(col("user_id"))
    },

    // ---- functional-dependency discovery -----------------------------------
    // The data-profiling pass a catalog runs on an unfamiliar table:
    // for every directed column pair (A → B) of orders, does A
    // determine B? A group of A violates when it sees >1 distinct B;
    // the census reports group counts and violating-group counts per
    // pair (o_orderkey → * must all hold — it is the key; o_custkey →
    // * must not — customers place many orders). One grouped
    // aggregate per determinant column computes all its dependents'
    // distinct counts in a single pass, so the whole 30-pair census
    // is |columns| scans, not |pairs|.
    //
    // Scale shape: per determinant one map-side-combining groupBy;
    // the violation rollup runs on the group table. Output is the
    // O(cols²) metadata census.
    Q("p173_fd_discovery", Some {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "cents", "o_orderdate", "o_orderpriority")
      val per = cols.map { a =>
        val deps = cols.filterNot(_ == a)
        val aggs = deps.map(b => s"COUNT(DISTINCT $b) AS nd_$b")
          .mkString(", ")
        val unions = deps.map(b =>
          s"""SELECT '$a' AS det_col, '$b' AS dep_col,
              CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(CASE WHEN nd_$b > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violating,
              CAST(CASE WHEN SUM(CASE WHEN nd_$b > 1 THEN 1 ELSE 0 END)
                   = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
          FROM g_$a""").mkString(" UNION ALL ")
        (s"g_$a AS (SELECT $a, $aggs FROM o GROUP BY $a)", unions)
      }
      s"""
      WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                        o_orderdate, o_orderpriority
                 FROM orders),
      ${per.map(_._1).mkString(",\n      ")}
      ${per.map(_._2).mkString(" UNION ALL ")}
      ORDER BY 1, 2"""
    }) { (spark, dir) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "cents", "o_orderdate", "o_orderpriority")
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          col("o_orderdate"), col("o_orderpriority"))
      val parts = cols.flatMap { a =>
        val deps = cols.filterNot(_ == a)
        val g = o.groupBy(col(a))
          .agg(countDistinct(col(deps.head)).as(s"nd_${deps.head}"),
            deps.tail.map(b => countDistinct(col(b)).as(s"nd_$b")): _*)
        deps.map { b =>
          g.agg(count(lit(1)).as("n_groups"),
              sum(when(col(s"nd_$b") > 1, 1L).otherwise(0L))
                .as("n_violating"))
            .select(lit(a).as("det_col"), lit(b).as("dep_col"),
              col("n_groups"), col("n_violating"),
              when(col("n_violating") === 0, 1L).otherwise(0L)
                .as("holds"))
        }
      }
      parts.reduce(_ unionAll _)
        .orderBy(col("det_col"), col("dep_col"))
    },

    // ---- multi-model attribution with exact credit splitting ---------------
    // Marketing attribution compared across models in ONE pass: each
    // purchase distributes EXACTLY 1e6 credit units over the view /
    // click touches in its trailing 7-day window (strictly before) —
    // first-touch (earliest gets all), last-touch (latest gets all,
    // the p115 model), and linear (proportional by touch count, the
    // ±1 floor leftover going to the channel of the most recent touch
    // — the p170 largest-remainder discipline, so every purchase's
    // credits sum to exactly 1e6 under every model). Touch identity
    // rides inside the window as the integer us·8 + code·2, so the
    // frame min/max IS the first/last-touch argreduce — no join back,
    // deterministic even under timestamp ties. No-touch purchases
    // credit 'direct'.
    //
    // Scale shape: three RANGE-frame windows per user over arrival
    // order (the only shuffle is the user key); the model×channel
    // rollup is a metadata table. No purchases×touches self-join.
    Q("p174_attribution_models", Some("""
      WITH e AS (SELECT user_id, event_id, event_type,
                        CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
      t AS (SELECT *, CASE WHEN event_type = 'view' THEN us * 8
                           WHEN event_type = 'click' THEN us * 8 + 2
                      END AS code FROM e),
      w AS (SELECT *,
              min(code) OVER fr AS first_code,
              max(code) OVER fr AS last_code,
              SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                OVER fr AS nv,
              SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                OVER fr AS nc
            FROM t
            WINDOW fr AS (PARTITION BY user_id ORDER BY us
              RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
      p AS (SELECT coalesce(nv, 0) AS nv, coalesce(nc, 0) AS nc,
                   CASE WHEN first_code IS NULL THEN 'direct'
                        WHEN first_code % 8 = 0 THEN 'view'
                        ELSE 'click' END AS first_ch,
                   CASE WHEN last_code IS NULL THEN 'direct'
                        WHEN last_code % 8 = 0 THEN 'view'
                        ELSE 'click' END AS last_ch
            FROM w WHERE event_type = 'purchase'),
      l AS (SELECT nv, nc, first_ch, last_ch,
                   CASE WHEN nv + nc = 0 THEN 0
                        ELSE 1000000 * nv // (nv + nc) END AS lv,
                   CASE WHEN nv + nc = 0 THEN 0
                        ELSE 1000000 * nc // (nv + nc) END AS lc
            FROM p),
      u AS (SELECT 'first_touch' AS model, first_ch AS channel,
                   CAST(1000000 AS BIGINT) AS credit FROM l
            UNION ALL
            SELECT 'last_touch', last_ch, 1000000 FROM l
            UNION ALL
            SELECT 'linear', 'direct',
                   CASE WHEN nv + nc = 0 THEN 1000000 ELSE 0 END FROM l
            UNION ALL
            SELECT 'linear', 'view',
                   lv + CASE WHEN last_ch = 'view'
                        THEN 1000000 - lv - lc ELSE 0 END FROM l
            UNION ALL
            SELECT 'linear', 'click',
                   lc + CASE WHEN last_ch = 'click'
                        THEN 1000000 - lv - lc ELSE 0 END FROM l)
      SELECT model, channel, CAST(SUM(credit) AS BIGINT) AS credit,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM u WHERE credit > 0
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (spark, dir) =>
      val fr = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-604800000000L, -1L)
      val t = Tables.load(spark, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("code",
          when(col("event_type") === "view", col("us") * 8)
            .when(col("event_type") === "click", col("us") * 8 + 2))
      def ch(c: org.apache.spark.sql.Column) =
        when(c.isNull, "direct")
          .when(c % 8 === 0, "view").otherwise("click")
      val p = t
        .withColumn("first_code", min(col("code")).over(fr))
        .withColumn("last_code", max(col("code")).over(fr))
        .withColumn("nv", coalesce(sum(
          when(col("event_type") === "view", 1L).otherwise(0L)).over(fr),
          lit(0L)))
        .withColumn("nc", coalesce(sum(
          when(col("event_type") === "click", 1L).otherwise(0L)).over(fr),
          lit(0L)))
        .where(col("event_type") === "purchase")
        .select(col("nv"), col("nc"),
          ch(col("first_code")).as("first_ch"),
          ch(col("last_code")).as("last_ch"))
        .withColumn("lv", when(col("nv") + col("nc") === 0, 0L)
          .otherwise(expr("1000000 * nv div (nv + nc)")))
        .withColumn("lc", when(col("nv") + col("nc") === 0, 0L)
          .otherwise(expr("1000000 * nc div (nv + nc)")))
      val u = p.select(lit("first_touch").as("model"),
          col("first_ch").as("channel"), lit(1000000L).as("credit"))
        .unionAll(p.select(lit("last_touch"), col("last_ch"),
          lit(1000000L)))
        .unionAll(p.select(lit("linear"), lit("direct"),
          when(col("nv") + col("nc") === 0, 1000000L).otherwise(0L)))
        .unionAll(p.select(lit("linear"), lit("view"),
          col("lv") + when(col("last_ch") === "view",
            lit(1000000L) - col("lv") - col("lc")).otherwise(0L)))
        .unionAll(p.select(lit("linear"), lit("click"),
          col("lc") + when(col("last_ch") === "click",
            lit(1000000L) - col("lv") - col("lc")).otherwise(0L)))
      u.where(col("credit") > 0)
        .groupBy(col("model"), col("channel"))
        .agg(sum(col("credit")).as("credit"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("model"), col("channel"))
    },

    // ---- hash-seeded subsample stability diagnostic ------------------------
    // Uncertainty quantification with NO randomness: 32 deterministic
    // half-samples of orders (membership = h60('b:' || key) parity, a
    // different salt per replicate) each yield an exact milli-cent
    // mean; the spread of the 32 means is the subsample-stability
    // interval a bootstrap would estimate, reproducible bit-for-bit
    // on any engine. Computed in ONE pass as 64 conditional aggregates
    // — never a ×32 row fan-out — then the order statistics of the
    // 32-long means array (2nd / 16th / 31st = the ~5/50/95 points).
    //
    // Scale shape: one map-side-combining aggregate over the scan;
    // everything after runs on a 1-row frame.
    Q("p175_subsample_stability", Some {
      val b = 32
      val aggs = (0 until b).map(i =>
        s"""CAST(SUM(CASE WHEN ${Portable.h60Sql(
             s"concat('$i:', CAST(o_orderkey AS VARCHAR))")} % 2 = 0
               THEN cents END) AS BIGINT) AS s$i,
            CAST(SUM(CASE WHEN ${Portable.h60Sql(
             s"concat('$i:', CAST(o_orderkey AS VARCHAR))")} % 2 = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS c$i""").mkString(",\n")
      val means = (0 until b).map(i =>
        s"CASE WHEN c$i = 0 THEN 0 ELSE 1000 * s$i // c$i END")
        .mkString(", ")
      s"""
      WITH o AS (SELECT o_orderkey,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders),
      a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(cents) AS BIGINT) AS tot,
                   $aggs
            FROM o),
      m AS (SELECT n_rows, CAST(1000 * tot // n_rows AS BIGINT)
                     AS mean_milli,
                   list_sort([$means]) AS ms
            FROM a)
      SELECT n_rows, mean_milli,
             CAST(ms[1] AS BIGINT) AS sub_min,
             CAST(ms[2] AS BIGINT) AS sub_p05,
             CAST(ms[16] AS BIGINT) AS sub_med,
             CAST(ms[31] AS BIGINT) AS sub_p95,
             CAST(ms[$b] AS BIGINT) AS sub_max,
             CAST((ms[$b] - ms[1]) * 1000000 // mean_milli AS BIGINT)
               AS spread_ppm
      FROM m"""
    }) { (spark, dir) =>
      val b = 32
      val o = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val inRep = (0 until b).map(i =>
        Portable.h60(concat(lit(s"$i:"),
          col("o_orderkey").cast("string"))) % 2 === 0)
      val aggExprs =
        Seq(count(lit(1)).as("n_rows"), sum(col("cents")).as("tot")) ++
          (0 until b).flatMap(i => Seq(
            sum(when(inRep(i), col("cents"))).as(s"s$i"),
            sum(when(inRep(i), 1L).otherwise(0L)).as(s"c$i")))
      val meansExpr = (0 until b).map(i =>
        s"CASE WHEN c$i = 0 THEN 0L ELSE 1000 * s$i div c$i END")
        .mkString("array_sort(array(", ", ", "))")
      o.agg(aggExprs.head, aggExprs.tail: _*)
        .withColumn("mean_milli", expr("1000 * tot div n_rows"))
        .withColumn("ms", expr(meansExpr))
        .select(col("n_rows"), col("mean_milli"),
          expr("element_at(ms, 1)").as("sub_min"),
          expr("element_at(ms, 2)").as("sub_p05"),
          expr("element_at(ms, 16)").as("sub_med"),
          expr("element_at(ms, 31)").as("sub_p95"),
          expr(s"element_at(ms, $b)").as("sub_max"),
          expr(s"CAST((element_at(ms, $b) - element_at(ms, 1)) * 1000000" +
            s" div mean_milli AS BIGINT)").as("spread_ppm"))
    }
  )
}
