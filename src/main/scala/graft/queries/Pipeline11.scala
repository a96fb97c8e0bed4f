package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Portable

/** Round-8 pipeline entries, sixth batch: join-pruning membership
  * filters, robust statistics, and ingest hygiene.
  */
object Pipeline11 {

  val all: Seq[Q] = Seq(

    // ---- portable Bloom-filter join pruning --------------------------------
    // The shuffle-saving membership filter a distributed engine ships
    // from a join's build side to its probe side (Spark injects the
    // same structure as a runtime bloom filter): a 16384-bit / 3-hash
    // bloom over the DISTINCT purchase (user, day) keys, probed by the
    // click/view key stream BEFORE the join. No false negatives (every
    // member passes), measured false positives (pass − member) — the
    // rows a real pre-shuffle filter would carry needlessly, and the
    // ONLY error a bloom prune can make, which the join itself then
    // discards. Because the hash family is the portable md5 h60, the
    // ORACLE REBUILDS THE IDENTICAL BITSET in SQL: popcount and every
    // per-key verdict match bit-for-bit.
    //
    // Scale shape: the build side collapses map-side (one 256-word
    // array per partition, merged by bitwise OR — idempotent, so
    // retries/partitioning can't change the state); the finished
    // filter is a ONE-ROW frame the probe crossJoins (broadcast) and
    // tests with codegen'd bit arithmetic in the scan stage. At 100 TB
    // the pruned fraction (1 − n_pass/n_keys) is shuffle volume saved.
    Q("p112_bloom_prune", Some(s"""
      WITH pk AS (SELECT DISTINCT concat(CAST(user_id AS VARCHAR), ':',
                         CAST(CAST(ts AS DATE) AS VARCHAR)) AS key
                  FROM events WHERE event_type = 'purchase'),
      rr(r) AS (VALUES (0), (1), (2)),
      bits AS (SELECT DISTINCT
                 ${Portable.h60Sql("concat(CAST(rr.r AS VARCHAR), ':', pk.key)")}
                   % 16384 AS slot
               FROM pk, rr),
      probe AS (SELECT DISTINCT event_type,
                       concat(CAST(user_id AS VARCHAR), ':',
                         CAST(CAST(ts AS DATE) AS VARCHAR)) AS key
                FROM events WHERE event_type IN ('click', 'view')),
      ps AS (SELECT p.event_type, p.key, rr.r,
                    ${Portable.h60Sql("concat(CAST(rr.r AS VARCHAR), ':', p.key)")}
                      % 16384 AS slot
             FROM probe p, rr),
      pass AS (SELECT event_type, key,
                      CASE WHEN count(b.slot) = 3 THEN 1 ELSE 0 END AS pass
               FROM ps LEFT JOIN bits b ON b.slot = ps.slot
               GROUP BY 1, 2),
      mem AS (SELECT p.event_type, p.key,
                     CASE WHEN pk.key IS NULL THEN 0 ELSE 1 END AS member
              FROM probe p LEFT JOIN pk ON pk.key = p.key)
      SELECT p.event_type,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(p.pass) AS BIGINT) AS n_pass,
             CAST(sum(m.member) AS BIGINT) AS n_member,
             CAST(sum(CASE WHEN p.pass = 1 AND m.member = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
             (SELECT CAST(count(*) AS BIGINT) FROM pk) AS n_build_keys,
             (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_set_bits
      FROM pass p JOIN mem m ON m.event_type = p.event_type AND m.key = p.key
      GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      import graft.functions.PBloom
      val ev = Tables.loadSpread(spark, dir, "events")
      def key = concat(col("user_id").cast("string"), lit(":"),
        col("ts").cast("date").cast("string"))
      val pk = ev.where(col("event_type") === "purchase")
        .select(key.as("key")).distinct().localCheckpoint()
      val bloomRow = pk.agg(PBloom.sketch(col("key"), 3, 16384).as("bloom"),
        count(lit(1)).as("n_build_keys"))
      val probe = ev.where(col("event_type").isin("click", "view"))
        .select(col("event_type"), key.as("key")).distinct()
      val tested = probe.crossJoin(broadcast(bloomRow))
        .withColumn("pass", PBloom.mightContain(col("bloom"), col("key"),
          k = 3, bits = 16384))
        .withColumn("n_set_bits", PBloom.popCount(col("bloom")))
      tested.join(pk.select(col("key"), lit(1L).as("member_")),
          Seq("key"), "left")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(coalesce(col("member_"), lit(0L))).as("n_member"),
          sum(when(col("pass") && col("member_").isNull, 1L).otherwise(0L))
            .as("n_false_pos"),
          max(col("n_build_keys")).as("n_build_keys"),
          max(col("n_set_bits")).as("n_set_bits"))
        .orderBy(col("event_type"))
    },

    // ---- exact median/MAD robust outlier detection -------------------------
    // The robust per-group outlier gate (|x − median| > 3·MAD) that
    // survives the contaminated distributions a mean/stddev z-score is
    // wrecked by — the median and MAD are themselves 50%-breakdown.
    // All arithmetic is integer-exact in milli-units via the DOUBLED
    // order-statistic trick: med2 = x_⌈n/2⌉ + x_⌊n/2+1⌋ (twice the
    // median, always integer), per-row deviation D = |2v − med2|
    // (twice the true deviation), mad4 = D's doubled median (4×MAD),
    // and the gate |v − med| > 3·MAD becomes 4·D > 3·mad4 — no
    // halving, no floats, both engines bit-equal.
    //
    // Scale shape: exact order statistics cost ONE sort per group
    // (row_number window), twice — the price of exactness; groups are
    // the handful of event types, each sort fully parallel within its
    // partition. The approximate path at 100 TB swaps row_number for
    // percentile_approx with the SAME downstream algebra.
    Q("p113_robust_mad", Some("""
      WITH v AS (SELECT event_type,
                        CAST(round(value * 1000, 0) AS BIGINT) AS v
                 FROM events),
      r AS (SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type ORDER BY v)
                     AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM v),
      med AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN v ELSE 0 END)
                        + sum(CASE WHEN rn = (n + 2) // 2 THEN v ELSE 0 END)
                       AS BIGINT) AS med2
              FROM r GROUP BY 1),
      d AS (SELECT r.event_type, abs(2 * r.v - m.med2) AS dd, m.med2, m.n
            FROM r JOIN med m USING (event_type)),
      dr AS (SELECT event_type, dd, n,
                    row_number() OVER (PARTITION BY event_type ORDER BY dd)
                      AS rn
             FROM d),
      mad AS (SELECT event_type,
                     CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN dd ELSE 0 END)
                        + sum(CASE WHEN rn = (n + 2) // 2 THEN dd ELSE 0 END)
                       AS BIGINT) AS mad4
              FROM dr GROUP BY 1)
      SELECT d.event_type, CAST(max(d.n) AS BIGINT) AS n,
             max(d.med2) AS med2_milli, max(mad.mad4) AS mad4_milli,
             CAST(sum(CASE WHEN 4 * d.dd > 3 * mad.mad4
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             CAST(sum(CASE WHEN 4 * d.dd > 3 * mad.mad4
                           THEN 1 ELSE 0 END) * 1000000 // max(d.n)
               AS BIGINT) AS outlier_ppm
      FROM d JOIN mad USING (event_type)
      GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val v = Tables.loadSpread(spark, dir, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 1000, 0) AS BIGINT)").as("v"))
      val w = Window.partitionBy(col("event_type"))
      val r = v
        .withColumn("rn", row_number().over(w.orderBy(col("v"))))
        .withColumn("n", count(lit(1)).over(w))
      val med = r.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          (sum(when(expr("rn = (n + 1) div 2"), col("v")).otherwise(0L))
            + sum(when(expr("rn = (n + 2) div 2"), col("v")).otherwise(0L)))
            .as("med2"))
      val d = r.join(broadcast(med.select(col("event_type"), col("med2"))),
          "event_type")
        .select(col("event_type"), abs(lit(2) * col("v") - col("med2"))
          .as("dd"))
      val dr = d
        .withColumn("rn", row_number().over(w.orderBy(col("dd"))))
        .withColumn("n", count(lit(1)).over(w))
      val mad = dr.groupBy(col("event_type"))
        .agg((sum(when(expr("rn = (n + 1) div 2"), col("dd")).otherwise(0L))
          + sum(when(expr("rn = (n + 2) div 2"), col("dd")).otherwise(0L)))
          .as("mad4"))
      d.join(broadcast(mad), "event_type")
        .join(broadcast(med.select(col("event_type"), col("n"),
          col("med2"))), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          max(col("med2")).as("med2_milli"),
          max(col("mad4")).as("mad4_milli"),
          sum(when(expr("4 * dd > 3 * mad4"), 1L).otherwise(0L))
            .as("n_outliers"))
        .select(col("event_type"), col("n"), col("med2_milli"),
          col("mad4_milli"), col("n_outliers"),
          expr("n_outliers * 1000000 div n").as("outlier_ppm"))
        .orderBy(col("event_type"))
    },

    // ---- ingest replay deduplication (keep-first by arrival) ---------------
    // At-least-once delivery means the SAME event arrives again from a
    // retried ingest batch — possibly with a skewed clock, so the
    // replay can even claim an EARLIER timestamp. The dedup contract
    // is keep-first by (observed time, ingest id): one aggregate
    // `min(struct(us, ingest, …))` per event_id — a partial-agg
    // (map-side combine) shape, NOT a window sort, so it scales as a
    // plain keyed reduction. The fixture welds a replay of every 7th
    // event (+2 min; every 14th −2 min, the skewed clock) and the
    // order-independent bit_xor(h60(id:us)) digest of the KEPT rows
    // proves exactly which copy survived — the skewed replays MUST win
    // their pair, the late ones must lose.
    //
    // Scale shape: one shuffle keyed by event_id (the natural dedup
    // key), partials combine map-side; the per-type audit is a second
    // bounded agg. This is the batch analog of streaming
    // dropDuplicatesWithinWatermark (StreamingSpec exercises the
    // stateful side).
    Q("p114_replay_dedup", Some(s"""
      WITH raw AS (
        SELECT event_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
               0 AS ingest
        FROM events
        UNION ALL
        SELECT event_id, event_type,
               CAST(epoch_us(ts) AS BIGINT)
                 + CASE WHEN event_id % 14 = 0 THEN -120000000
                        ELSE 120000000 END AS us,
               1 AS ingest
        FROM events WHERE event_id % 7 = 0),
      kept AS (SELECT event_id, event_type, us FROM
                 (SELECT raw.*, row_number() OVER
                    (PARTITION BY event_id ORDER BY us, ingest) AS rn
                  FROM raw)
               WHERE rn = 1),
      rawc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw
               FROM raw GROUP BY 1)
      SELECT k.event_type, rawc.n_raw,
             CAST(count(*) AS BIGINT) AS n_unique,
             CAST(rawc.n_raw - count(*) AS BIGINT) AS n_dropped,
             bit_xor(${Portable.h60Sql(
        "concat(CAST(k.event_id AS VARCHAR), ':', CAST(k.us AS VARCHAR))")})
               AS kept_xor
      FROM kept k JOIN rawc ON rawc.event_type = k.event_type
      GROUP BY 1, 2 ORDER BY 1""")) { (spark, dir) =>
      val ev = Tables.loadSpread(spark, dir, "events")
      val base = ev.select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), lit(0).as("ingest"))
      val replay = ev.where(col("event_id") % 7 === 0)
        .select(col("event_id"), col("event_type"),
          (unix_micros(col("ts"))
            + when(col("event_id") % 14 === 0, -120000000L)
              .otherwise(120000000L)).as("us"),
          lit(1).as("ingest"))
      val raw = base.unionAll(replay)
      val kept = raw.groupBy(col("event_id"))
        .agg(min(struct(col("us"), col("ingest"), col("event_type")))
          .as("m"))
        .select(col("event_id"), col("m.event_type").as("event_type"),
          col("m.us").as("us"))
      val rawc = raw.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_raw"))
      kept
        .withColumn("h", Portable.h60(concat(
          col("event_id").cast("string"), lit(":"), col("us").cast("string"))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique"), expr("bit_xor(h)").as("kept_xor"))
        .join(broadcast(rawc), "event_type")
        .select(col("event_type"), col("n_raw"), col("n_unique"),
          (col("n_raw") - col("n_unique")).as("n_dropped"), col("kept_xor"))
        .orderBy(col("event_type"))
    },

    // ---- last-touch marketing attribution ----------------------------------
    // The revenue-attribution rollup every growth pipeline runs: each
    // purchase credits the user's most recent PRECEDING click/view
    // within a 7-day lookback, else 'direct'. The carry-forward is two
    // last(..., ignoreNulls) windows over (ts, event_id) order with an
    // UNBOUNDED-PRECEDING→1-PRECEDING frame — identical null pattern,
    // so both values come from the SAME touch row; strict precedence
    // (same-instant purchases can't self-attribute) falls out of the
    // frame's −1 bound, and the deterministic (us, event_id) tie-break
    // makes the answer partition-invariant.
    //
    // Scale shape: ONE shuffle keyed by user_id (the natural session
    // key), one sort per user partition, then a bounded channel
    // rollup. No self-join of purchases×touches — the window carries
    // the last touch in O(events) instead of O(purchases·touches).
    Q("p115_attribution", Some("""
      WITH ev AS (SELECT event_id, user_id, event_type,
                         CAST(epoch_us(ts) AS BIGINT) AS us,
                         CAST(round(value * 1000, 0) AS BIGINT) AS v
                  FROM events),
      w AS (SELECT user_id, event_id, event_type, us, v,
                   last_value(CASE WHEN event_type IN ('click', 'view')
                                   THEN us END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS t_us,
                   last_value(CASE WHEN event_type IN ('click', 'view')
                                   THEN event_type END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS t_ch
            FROM ev),
      p AS (SELECT CASE WHEN t_us IS NOT NULL
                         AND us - t_us <= 604800000000
                        THEN t_ch ELSE 'direct' END AS channel, v
            FROM w WHERE event_type = 'purchase')
      SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(v) AS BIGINT) AS revenue_milli
      FROM p GROUP BY 1 ORDER BY 1""")) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(round(value * 1000, 0) AS BIGINT)").as("v"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = col("event_type").isin("click", "view")
      val attributed = ev
        .withColumn("t_us", last(when(touch, col("us")), ignoreNulls = true)
          .over(w))
        .withColumn("t_ch",
          last(when(touch, col("event_type")), ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .select(when(col("t_us").isNotNull
            && col("us") - col("t_us") <= 604800000000L, col("t_ch"))
          .otherwise("direct").as("channel"), col("v"))
      attributed.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("v"))
          .as("revenue_milli"))
        .orderBy(col("channel"))
    },

    // ---- bounded k-core peeling of the near-dup graph ----------------------
    // Template farms and boilerplate mills show up as DENSE near-dup
    // regions; the 2-core strips the harmless tree-like fringe (docs
    // with a single accidental match) and keeps exactly the cyclic
    // cores worth auditing. Four unrolled peel rounds: each round
    // removes every node whose CURRENT degree < 2 (including nodes
    // orphaned by the previous round — degree computed by LEFT join
    // from the active set, so zero-degree nodes are caught), then
    // induces the subgraph. removed_round = the round a doc fell, 0 =
    // survived all four (the fixpoint cores on this fixture).
    //
    // Scale shape: the standard distributed k-core schedule — per
    // round ONE degree aggregation + two leftsemi joins, lineage cut
    // by localCheckpoint so the loop's plan stays O(1) deep. The
    // oracle unrolls the SAME four rounds as chained CTEs, proving the
    // trajectory, not just the final set.
    Q("p116_kcore", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      e0 AS MATERIALIZED (SELECT a, b FROM spairs),
      a0 AS (SELECT DISTINCT n FROM
               (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)),
      g1 AS (SELECT n, count(*) AS d FROM
               (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
             GROUP BY 1),
      d1 AS MATERIALIZED (SELECT a0.n, coalesce(g1.d, 0) AS d
             FROM a0 LEFT JOIN g1 USING (n)),
      r1 AS (SELECT n FROM d1 WHERE d < 2),
      a1 AS MATERIALIZED (SELECT n FROM d1 WHERE d >= 2),
      e1 AS MATERIALIZED (SELECT a, b FROM e0
             WHERE a IN (SELECT n FROM a1) AND b IN (SELECT n FROM a1)),
      g2 AS (SELECT n, count(*) AS d FROM
               (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1)
             GROUP BY 1),
      d2 AS MATERIALIZED (SELECT a1.n, coalesce(g2.d, 0) AS d
             FROM a1 LEFT JOIN g2 USING (n)),
      r2 AS (SELECT n FROM d2 WHERE d < 2),
      a2 AS MATERIALIZED (SELECT n FROM d2 WHERE d >= 2),
      e2 AS MATERIALIZED (SELECT a, b FROM e1
             WHERE a IN (SELECT n FROM a2) AND b IN (SELECT n FROM a2)),
      g3 AS (SELECT n, count(*) AS d FROM
               (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2)
             GROUP BY 1),
      d3 AS MATERIALIZED (SELECT a2.n, coalesce(g3.d, 0) AS d
             FROM a2 LEFT JOIN g3 USING (n)),
      r3 AS (SELECT n FROM d3 WHERE d < 2),
      a3 AS MATERIALIZED (SELECT n FROM d3 WHERE d >= 2),
      e3 AS MATERIALIZED (SELECT a, b FROM e2
             WHERE a IN (SELECT n FROM a3) AND b IN (SELECT n FROM a3)),
      g4 AS (SELECT n, count(*) AS d FROM
               (SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3)
             GROUP BY 1),
      d4 AS MATERIALIZED (SELECT a3.n, coalesce(g4.d, 0) AS d
             FROM a3 LEFT JOIN g4 USING (n)),
      r4 AS (SELECT n FROM d4 WHERE d < 2),
      a4 AS (SELECT n FROM d4 WHERE d >= 2)
      SELECT n AS doc_id, removed_round FROM (
        SELECT n, CAST(1 AS BIGINT) AS removed_round FROM r1
        UNION ALL SELECT n, CAST(2 AS BIGINT) FROM r2
        UNION ALL SELECT n, CAST(3 AS BIGINT) FROM r3
        UNION ALL SELECT n, CAST(4 AS BIGINT) FROM r4
        UNION ALL SELECT n, CAST(0 AS BIGINT) FROM a4)
      ORDER BY doc_id""")) { (spark, dir) =>
      // SharedStages pairs (the p75 convention): the k-core peel is a
      // pair-graph consumer, not a dedup anchor — no fixpoint rebuild
      var edges = SharedStages.spairs(spark, dir)
        .select(col("a"), col("b")).localCheckpoint()
      var active = edges.select(col("a").as("n"))
        .union(edges.select(col("b").as("n"))).distinct()
      val removedRounds = Seq.newBuilder[org.apache.spark.sql.DataFrame]
      for (r <- 1 to 4) {
        val deg = edges.select(col("a").as("n"))
          .union(edges.select(col("b").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("d"))
        val d = active.join(deg, Seq("n"), "left")
          .withColumn("d", coalesce(col("d"), lit(0L)))
        // r20: no checkpoint on the per-round removed set — it is read
        // once by the final union and its lineage is one agg+join over
        // the checkpointed edges/active of this round (4 fewer jobs)
        removedRounds += d.where(col("d") < 2)
          .select(col("n"), lit(r.toLong).as("removed_round"))
        active = d.where(col("d") >= 2).select(col("n")).localCheckpoint()
        edges = edges
          .join(active.select(col("n").as("a")), Seq("a"), "leftsemi")
          .join(active.select(col("n").as("b")), Seq("b"), "leftsemi")
          .select(col("a"), col("b")).localCheckpoint()
      }
      (removedRounds.result() :+
          active.select(col("n"), lit(0L).as("removed_round")))
        .reduce(_ union _)
        .select(col("n").as("doc_id"), col("removed_round"))
        .orderBy(col("doc_id"))
    },

    // ---- daily ingest-volume anomaly detection -----------------------------
    // The ops alarm over an ingest feed: per (event type, day) counts
    // on a DENSIFIED calendar grid (missing days count 0 — exactly the
    // anomaly a sparse grid would hide), flagged when the day deviates
    // from its trailing 7-day window by more than 2σ. The z² gate is
    // EXACT integer algebra: (7c − s)² > 4·(7ss − s²) multiplies the
    // float z-score test through by 49·var — no sqrt, no doubles, both
    // engines bit-equal. Warm-up days (n_win < 7) are reported but
    // never flagged.
    //
    // Scale shape: the event stream collapses to the O(types × days)
    // count grid FIRST (one partial-agg shuffle); the window runs on
    // the tiny grid, never over raw events. The calendar densify is a
    // broadcast cross of distinct types × one global min/max row.
    Q("p117_ingest_anomaly", Some("""
      WITH c AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                        CAST(count(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM c),
      t AS (SELECT DISTINCT event_type FROM events),
      g AS (SELECT t.event_type,
                   CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE) AS day
            FROM t, b),
      d AS (SELECT g.event_type, g.day, coalesce(c.c, 0) AS c
            FROM g LEFT JOIN c USING (event_type, day)),
      w AS (SELECT event_type, day, c,
                   count(*) OVER win AS n_win,
                   coalesce(sum(c) OVER win, 0) AS s7,
                   coalesce(sum(c * c) OVER win, 0) AS ss7
            FROM d WINDOW win AS
              (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT event_type, CAST(day AS VARCHAR) AS day, c,
             CAST(n_win AS BIGINT) AS n_win,
             CAST(s7 AS BIGINT) AS s7, CAST(ss7 AS BIGINT) AS ss7,
             CAST(CASE WHEN n_win = 7
                        AND (7 * c - s7) * (7 * c - s7)
                            > 4 * (7 * ss7 - s7 * s7)
                       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      FROM w ORDER BY 1, 2""")) { (spark, dir) =>
      val ev = Tables.load(spark, dir, "events")
      val c = ev.groupBy(col("event_type"),
          date_trunc("DAY", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val b = c.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val t = ev.select(col("event_type")).distinct()
      val g = t.crossJoin(broadcast(b))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val d = g.join(c, Seq("event_type", "day"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val win = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      d.select(col("event_type"), col("day").cast("string").as("day"),
          col("c"),
          count(lit(1)).over(win).as("n_win"),
          coalesce(sum(col("c")).over(win), lit(0L)).as("s7"),
          coalesce(sum(col("c") * col("c")).over(win), lit(0L)).as("ss7"))
        .withColumn("is_anomaly",
          when(col("n_win") === 7
            && (lit(7) * col("c") - col("s7"))
               * (lit(7) * col("c") - col("s7"))
               > lit(4) * (lit(7) * col("ss7") - col("s7") * col("s7")),
            1L).otherwise(0L))
        .orderBy(col("event_type"), col("day"))
    }
  )
}
