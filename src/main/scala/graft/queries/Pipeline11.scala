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
    }
  )
}
