package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Structured-Streaming entries of the driver contract: each runs a
  * bounded stream (AvailableNow over the fixture parquet) to completion
  * into a memory sink, so the result is deterministic and oracle-
  * checkable against the equivalent batch SQL in DuckDB.
  */
object StreamingQ {

  val all: Seq[Q] = Seq(

    // ---- streaming tumbling-window aggregation (watermark + window) ------
    Q("p15_stream_tumbling", Some("""
      SELECT (CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(ts)) AS BIGINT) % 900) AS bin_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bin_start, event_type""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "complete") { s =>
          StreamingOps.tumblingAgg(StreamingOps.eventsStream(s, dir)) }
        .orderBy(col("bin_start"), col("event_type"))
    },

    // ---- streaming sliding (hopping) window aggregation -------------------
    // The overlapping-window shape under a watermark: each event lands
    // in width/slide = 2 window states. The oracle expands the same
    // 2-window membership arithmetically (bin and bin - slide) — p52's
    // batch oracle, now driven through the streaming engine.
    Q("p53_stream_sliding", Some("""
      WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                        event_type, value FROM events)
      SELECT sec - sec % 900 - k * 900 AS bin_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM e, (VALUES (0), (1)) AS o(k)
      GROUP BY 1, 2
      ORDER BY bin_start, event_type""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "complete") { s =>
          StreamingOps.slidingAgg(StreamingOps.eventsStream(s, dir)) }
        .orderBy(col("bin_start"), col("event_type"))
    },

    // ---- streaming sessionization (native session_window state merge) ----
    // Spark session semantics: a gap of EXACTLY the window closes the
    // session (intervals [t, t+gap) merge only when they overlap), hence
    // `>= gap` in the oracle's lag test; session end = last event + gap.
    Q("p16_stream_sessionize", Some("""
      WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
      flagged AS (SELECT user_id, us,
                         CASE WHEN lag(us) OVER w IS NULL
                              OR us - lag(us) OVER w >= 1800000000
                              THEN 1 ELSE 0 END AS new_sess
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      sess AS (SELECT user_id, us,
                      SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                                          ROWS UNBOUNDED PRECEDING) AS sid
               FROM flagged)
      SELECT user_id, min(us) AS start_us,
             max(us) + 1800000000 AS end_us,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, start_us""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "complete") { s =>
          StreamingOps.sessionAgg(StreamingOps.eventsStream(s, dir)) }
        .orderBy(col("user_id"), col("start_us"))
    },

    // ---- stream-stream interval join (SymmetricHashJoinExec analog) ------
    // Inner joins emit matches as both sides arrive (append mode), so a
    // bounded AvailableNow run yields the complete, deterministic match
    // set — the batch interval join is the exact oracle.
    Q("p24_stream_join", Some("""
      SELECT c.event_id AS click_id, p.event_id AS buy_id,
             CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
             CAST(epoch_us(p.ts) AS BIGINT) AS buy_us
      FROM events c JOIN events p
        ON c.event_type = 'click' AND p.event_type = 'purchase'
       AND c.user_id = p.user_id
       AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
      ORDER BY click_id, buy_id""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "append") { s =>
          StreamingOps.clickPurchaseJoin(StreamingOps.eventsStream(s, dir)) }
        .orderBy(col("click_id"), col("buy_id"))
    },

    // ---- streaming exact-dedup group counts ------------------------------
    Q("p17_stream_dedup", Some("""
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
             min(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY content_hash""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "complete") { s =>
          val docs = s.readStream
            .schema(Tables.load(s, dir, "documents").schema)
            .option("pathGlobFilter", "documents.parquet").parquet(dir)
          StreamingOps.dedupGroups(docs, "doc_id", "text") }
        .orderBy(col("content_hash"))
    },

    // ---- custom-state operator (flatMapGroupsWithState) ------------------
    // Per-user high-water-mark alerts: a row whenever a user's value
    // strictly exceeds everything they produced before, with their
    // running event count — semantics no built-in stateful op
    // expresses (state = custom (count, max) per key). The batch
    // oracle is the equivalent prefix-max window; equality rests on
    // the documented single-micro-batch fixture contract (p24's).
    Q("p38_stream_hwm", Some("""
      WITH e AS (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us,
                        CAST(value AS DOUBLE) AS v FROM events),
      w AS (SELECT user_id, event_id, v,
                   row_number() OVER (PARTITION BY user_id ORDER BY us, event_id)
                     AS running_n,
                   max(v) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_max
            FROM e)
      SELECT user_id, event_id, CAST(running_n AS BIGINT) AS running_n,
             v AS value
      FROM w WHERE prev_max IS NULL OR v > prev_max
      ORDER BY user_id, running_n""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "append") { s =>
          StreamingOps.highWaterAlerts(StreamingOps.eventsStream(s, dir)) }
        .orderBy(col("user_id"), col("running_n"))
    },

    // ---- stream-static enrichment join -----------------------------------
    // The dimension-enrichment shape: events stream, customer dimension
    // broadcast per micro-batch (NO join state), tiny stateful agg on
    // top. Complete mode because the aggregate keyspace (segments) is
    // bounded; the batch join+GROUP BY is the exact oracle.
    Q("p44_stream_enrich", Some("""
      SELECT c_mktsegment, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "complete") { s =>
          StreamingOps.segmentRevenue(StreamingOps.eventsStream(s, dir),
            Tables.load(s, dir, "customer")) }
        .orderBy(col("c_mktsegment"))
    },

    // ---- watermark-bounded streaming dedup (dropDuplicatesWithinWatermark)
    // First event per (user, type, minute) key with key state expiring
    // at the watermark. The surviving ROW per key is arrival-order
    // dependent, so the checked result is per-key counts rolled up by
    // type — each key contributes exactly one survivor, making the
    // batch COUNT(DISTINCT key) the exact oracle.
    Q("p45_stream_dedup_wm", Some("""
      SELECT event_type,
             COUNT(DISTINCT (user_id, date_trunc('minute', ts))) AS n_first
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "append") { s =>
          StreamingOps.minuteDedup(StreamingOps.eventsStream(s, dir)) }
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_first"))
        .orderBy(col("event_type"))
    },

    // ---- arbitrary-state v2 (transformWithState + MapState, RocksDB) -----
    // Per-user event-type counters in a RocksDB-backed MapState — the
    // Spark 4 state-v2 API (typed Value/List/Map state + TTL + timers)
    // that supersedes flatMapGroupsWithState's single state object.
    // With the bounded single-batch fixture the final update per
    // (user, type) is the total count, so the batch GROUP BY is the
    // exact oracle.
    Q("p41_stream_state_v2", Some("""
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY user_id, event_type
      ORDER BY user_id, event_type""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "update",
          providerOverride = Some(
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) {
          s => StreamingOps.eventTypeCounts(StreamingOps.eventsStream(s, dir)) }
        .orderBy(col("user_id"), col("event_type"))
    },

    // ---- foreachBatch idempotent MERGE upsert sink ------------------------
    // The streaming-writes-a-serving-table pattern: each micro-batch
    // is aggregated per key and MERGEd into a versioned parquet target
    // (additive columns sum across batches; "latest" columns take the
    // deterministic (ts, event_id) struct-max), with batchId tracking
    // making re-delivered batches no-ops — the exactly-once recipe
    // Delta's MERGE formalizes. With the bounded fixture the final
    // target equals the batch aggregate, which IS the oracle; the
    // multi-batch split, version accumulation, and idempotent
    // re-delivery are pinned by StreamingSpec.
    Q("p83_stream_upsert", Some("""
      WITH last AS (SELECT user_id, ts, event_type, event_id,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
                    FROM events),
      agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
              FROM events GROUP BY user_id)
      SELECT a.user_id, a.n_events, a.sum_value,
             CAST(epoch_us(l.ts) AS BIGINT) AS last_ts,
             l.event_type AS last_type
      FROM agg a JOIN last l ON a.user_id = l.user_id AND l.rn = 1
      ORDER BY a.user_id""")) { (spark, dir) =>
      StreamingOps.upsertEvents(spark, dir, sinkDir("p83_upsert"))
        .orderBy(col("user_id"))
    },

    // ---- LEFT-SEMI stream-stream interval join (p107) --------------------
    // The streaming EXISTS: each click emits at most once when a
    // qualifying same-user purchase in the preceding 30 minutes is
    // seen; no purchase columns leak. Fourth stream-stream mode after
    // inner (p24), left-outer and full-outer (StreamingSpec) — and the
    // one a funnel gate actually wants (did a conversion follow?
    // yes/no, not the cross product of all matches).
    Q("p107_stream_semi_join", Some("""
      SELECT c.event_id AS click_id, c.user_id AS c_user,
             CAST(epoch_us(c.ts) AS BIGINT) AS click_us
      FROM events c
      WHERE c.event_type = 'click' AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
          AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts)
      ORDER BY click_id""")) { (spark, dir) =>
      StreamingOps.runToMemory(spark, mode = "append") { s =>
          StreamingOps.clickPurchaseSemiJoin(StreamingOps.eventsStream(s, dir)) }
        .orderBy(col("click_id"))
    }
  )
}
