package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.2 relational inventory, part 3: as-of join, date_bin,
  * linear-regression aggregates, approximate aggregates (HLL /
  * quantile sketch — verified against an error-envelope oracle),
  * and the DDL/sink path (CTAS + INSERT INTO + read-back).
  */
object Relational3 {

  val all: Seq[Q] = Seq(

    // ---- as-of join (latest purchase at-or-before each click) ------------
    // Spark has no ASOF JOIN operator; the scalable formulation is the
    // union + running-last trick: one shuffle by user_id, no join
    // explosion — each row carries the latest preceding right-side ts.
    // (DuckDB oracle uses its native ASOF LEFT JOIN.)
    Q("q33_asof_join", Some("""
      SELECT c.event_id,
             CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
             CAST(epoch_us(p.ts) AS BIGINT) AS buy_us
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY c.event_id""")) { (spark, dir) =>
      val e = Tables.load(spark, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
          col("event_id"), col("event_type"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("tsu"), col("event_id"), lit(1).as("side"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tsu"), lit(null).cast("long").as("event_id"),
          lit(0).as("side"))
      // side=0 sorts first → a purchase at the exact click ts is visible
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(buys)
        .withColumn("buy_us",
          last(when(col("side") === 0, col("tsu")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("tsu").as("click_us"), col("buy_us"))
        .orderBy(col("event_id"))
    },

    // ---- date_bin: arbitrary-width time bucketing ------------------------
    // (SURVEY §2.2 flags DF38's date_bin as a gap in Spark: closed with
    // epoch arithmetic, emitting timestamp_ntz so both engines agree.)
    Q("q34_date_bin", Some("""
      SELECT make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
               - ((CAST(floor(epoch(ts)) AS BIGINT) - 300) % 1200)) * 1000000) AS bin,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY bin
      ORDER BY bin""")) { (spark, dir) =>
      val ep = floor(unix_timestamp(col("ts"))).cast("long")
      // 20-minute bins anchored at an origin offset of +5 minutes,
      // date_bin(INTERVAL 20 min, ts, origin '...00:05:00') semantics
      val bin = timestamp_seconds(ep - ((ep - 300) % 1200)).cast("timestamp_ntz")
      Tables.load(spark, dir, "events")
        .groupBy(bin.as("bin"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bin"))
    },

    // ---- linear-regression aggregate family ------------------------------
    Q("q35_regr_family", Some("""
      SELECT l_returnflag,
             regr_count(l_extendedprice, l_quantity) AS n,
             round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
             round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             round(regr_avgx(l_extendedprice, l_quantity), 4) AS ax,
             round(regr_avgy(l_extendedprice, l_quantity), 2) AS ay
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("ax"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 2).as("ay"))
        .orderBy(col("l_returnflag"))
    },

    // ---- approximate aggregates (HLL++ / quantile sketch) ----------------
    // Sketch VALUES are engine-specific, so the oracle checks the error
    // ENVELOPE instead: Spark emits the exact figures plus booleans
    // asserting each sketch landed inside its documented bound (HLL++
    // rsd 0.05 → |acd−exact|/exact ≤ 0.15 ≈ 3σ; percentile_approx
    // accuracy 1000 → rank error ≤ 1/1000, checked against the exact
    // quantiles at q∓0.002 computed in the same engine). DuckDB states
    // the exact figures and literal TRUE — any sketch outside its bound
    // hash-mismatches and turns the row red.
    // (ok flags are INT 1/0, not BOOLEAN — every proven driver compare
    // path uses ints; booleans would be a novel comparator surface)
    Q("q36_approx_aggs", Some("""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS n_exact,
             1 AS acd_ok, 1 AS p50_ok, 1 AS p95_ok
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey")).as("acd"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50"),
          percentile_approx(col("o_totalprice"), lit(0.95), lit(1000)).as("p95"),
          // ±0.01 quantile margin: the sketch's rank error is ≤ 1/1000,
          // but the exact interpolated percentile at q±ε can cross a
          // value gap on small groups — 0.01 keeps the envelope several
          // rank positions wide even for a few-hundred-row group
          expr("percentile(o_totalprice, 0.49)").as("p50_lo"),
          expr("percentile(o_totalprice, 0.51)").as("p50_hi"),
          expr("percentile(o_totalprice, 0.94)").as("p95_lo"),
          expr("percentile(o_totalprice, 0.96)").as("p95_hi"))
        .select(
          col("o_orderstatus"),
          col("n_exact"),
          (abs(col("acd") - col("n_exact")).cast("double") / col("n_exact")
            <= 0.15).cast("int").as("acd_ok"),
          col("p50").between(col("p50_lo"), col("p50_hi")).cast("int").as("p50_ok"),
          col("p95").between(col("p95_lo"), col("p95_hi")).cast("int").as("p95_ok"))
        .orderBy(col("o_orderstatus"))
    },

    // ---- DDL + sink path: CTAS from VALUES, INSERT INTO, read back -------
    // DROP + CTAS keeps the query idempotent (bench runs it twice; the
    // v1 session catalog has no REPLACE TABLE).
    Q("q37_ctas_insert", Some("""
      SELECT band, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi
      FROM (VALUES
        ('lo', 0.0, 100000.0), ('mid', 100000.0, 300000.0),
        ('hi', 300000.0, 1e9), ('xl', 1e9, 1e12),
        ('xxl', 1e12, 1e15)) b(band, lo, hi)
      ORDER BY band""")) { (spark, dir) =>
      val tbl = s"graft_q37_bands_$runToken"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      // the in-memory catalog is per-JVM but the warehouse dir persists:
      // a stale location from an earlier session would fail the CTAS
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tbl)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      // the File-based exit hook can only clean local paths; a remote
      // warehouse (hdfs://…) must not map onto a same-named local dir
      val uri = loc.toUri
      if (uri.getScheme == null || uri.getScheme == "file")
        cleanupAtExit(uri.getPath)
      // bare x.y literals parse as DECIMAL in both engines — cast the
      // CTAS schema to DOUBLE so inserts of 1e12 don't overflow it
      spark.sql(s"""CREATE TABLE $tbl USING parquet AS
        SELECT band, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi
        FROM VALUES
          ('lo', 0.0, 100000.0), ('mid', 100000.0, 300000.0),
          ('hi', 300000.0, 1e9) AS b(band, lo, hi)""")
      spark.sql(s"""INSERT INTO $tbl VALUES
        ('xl', CAST(1e9 AS DOUBLE), CAST(1e12 AS DOUBLE)),
        ('xxl', CAST(1e12 AS DOUBLE), CAST(1e15 AS DOUBLE))""")
      spark.sql(s"SELECT band, lo, hi FROM $tbl ORDER BY band")
    }
  )
}
