package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.2 relational inventory, part 2: grouping sets/rollup/cube,
  * predicates (CASE/CAST/LIKE/IN/IS DISTINCT FROM), scalar function
  * families (string, math, date/time, regex, hash/encoding, JSON,
  * conditional, array), outer/anti/cross/range joins, subqueries, CTEs,
  * statistical aggregates, window frames (lag/lead/ntile/frames),
  * explode/unnest, LIMIT/OFFSET.
  */
object Relational2 {

  val all: Seq[Q] = Seq(

    // ---- ROLLUP + grouping() ---------------------------------------------
    Q("q11_rollup", Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("g_flag"), col("g_status"), col("n"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---- CUBE -------------------------------------------------------------
    Q("q12_cube", Some("""
      SELECT o_orderstatus, o_orderpriority,
             COUNT(*) AS n,
             CAST(grouping(o_orderstatus) AS BIGINT) AS g_s,
             CAST(grouping(o_orderpriority) AS BIGINT) AS g_p
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("long").as("g_s"),
          grouping(col("o_orderpriority")).cast("long").as("g_p"))
        .orderBy(col("g_s"), col("g_p"),
          col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // ---- CASE / TRY_CAST / LIKE / ILIKE / IN / IS DISTINCT FROM ----------
    Q("q13_predicates", Some("""
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 300000 THEN 'big'
                  WHEN o_totalprice > 150000 THEN 'mid'
                  ELSE 'small' END AS bucket,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
             TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast,
             o_orderpriority LIKE '%URGENT' AS is_urgent,
             o_orderstatus ILIKE 'f' AS is_f,
             o_orderstatus IN ('F', 'O') AS in_set,
             o_orderstatus IS DISTINCT FROM 'F' AS not_f,
             o_totalprice BETWEEN 100000 AND 200000 AS in_band
      FROM orders
      WHERE o_orderkey <= 1000
      ORDER BY o_orderkey""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("small").as("bucket"),
          floor(col("o_totalprice")).cast("long").as("price_floor"),
          col("o_orderstatus").try_cast("int").as("bad_cast"),
          col("o_orderpriority").like("%URGENT").as("is_urgent"),
          col("o_orderstatus").ilike("f").as("is_f"),
          col("o_orderstatus").isin("F", "O").as("in_set"),
          !(col("o_orderstatus") <=> lit("F")) as "not_f",
          col("o_totalprice").between(100000, 200000).as("in_band"))
        .orderBy(col("o_orderkey"))
    },

    // ---- string function family ------------------------------------------
    Q("q14_string_functions", Some("""
      SELECT p_partkey,
             upper(p_name) AS uname,
             substr(p_name, 1, 8) AS prefix8,
             CAST(length(p_name) AS BIGINT) AS name_len,
             concat_ws('-', p_brand, p_type) AS brand_type,
             replace(p_type, ' ', '_') AS type_us,
             reverse(p_brand) AS brand_rev,
             lpad(p_brand, 12, '*') AS brand_pad,
             split_part(p_type, ' ', 1) AS type_w1,
             left(p_name, 3) AS l3,
             right(p_name, 3) AS r3,
             translate(p_brand, '#', '@') AS brand_at,
             levenshtein(p_brand, 'Brand#11') AS lev,
             ascii(p_brand) AS first_code,
             strpos(p_name, 'a') AS a_pos,
             starts_with(p_type, 'STANDARD') AS std,
             ends_with(p_type, 'STEEL') AS steel,
             CAST(repeat(p_brand, 2) AS VARCHAR) AS brand2,
             trim(concat(' ', p_brand, ' ')) AS trimmed,
             trim(concat('xx', p_brand, 'xx'), 'x') AS btrimmed
      FROM part
      ORDER BY p_partkey""")) { (spark, dir) =>
      Tables.load(spark, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 8).as("prefix8"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"),
          reverse(col("p_brand")).as("brand_rev"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_w1"),
          substring(col("p_name"), 1, 3).as("l3"),
          expr("right(p_name, 3)").as("r3"),
          translate(col("p_brand"), "#", "@").as("brand_at"),
          levenshtein(col("p_brand"), lit("Brand#11")).as("lev"),
          ascii(col("p_brand")).as("first_code"),
          instr(col("p_name"), "a").as("a_pos"),
          col("p_type").startsWith("STANDARD").as("std"),
          col("p_type").endsWith("STEEL").as("steel"),
          repeat(col("p_brand"), 2).as("brand2"),
          trim(concat(lit(" "), col("p_brand"), lit(" "))).as("trimmed"),
          trim(concat(lit("xx"), col("p_brand"), lit("xx")), "x").as("btrimmed"))
        .orderBy(col("p_partkey"))
    },

    // ---- math function family ---------------------------------------------
    Q("q15_math_functions", Some("""
      SELECT l_orderkey, l_linenumber,
             round(sqrt(l_quantity), 6) AS sq,
             round(ln(l_extendedprice), 6) AS lnp,
             round(log10(l_extendedprice), 6) AS lgp,
             round(exp(l_discount), 6) AS ex,
             abs(-l_quantity) AS absq,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ceilp,
             CAST(floor(l_extendedprice) AS BIGINT) AS floorp,
             round(pow(l_quantity, 2), 6) AS pw,
             l_orderkey % 7 AS m7,
             greatest(l_quantity, l_discount * 100) AS gr,
             least(l_quantity, l_discount * 100) AS le,
             round(atan2(l_quantity, 3.0), 6) AS at2,
             round(sin(l_discount), 6) AS sn,
             round(cos(l_discount), 6) AS cs,
             round(cbrt(l_quantity), 6) AS cb,
             round(degrees(l_discount), 6) AS dg,
             round(radians(l_quantity), 6) AS rd,
             round(pi(), 6) AS cpi,
             CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn
      FROM lineitem
      WHERE l_orderkey <= 200
      ORDER BY l_orderkey, l_linenumber""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lnp"),
          round(log10(col("l_extendedprice")), 6).as("lgp"),
          round(exp(col("l_discount")), 6).as("ex"),
          abs(-col("l_quantity")).as("absq"),
          ceil(col("l_extendedprice")).cast("long").as("ceilp"),
          floor(col("l_extendedprice")).cast("long").as("floorp"),
          round(pow(col("l_quantity"), 2), 6).as("pw"),
          (col("l_orderkey") % 7).as("m7"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_quantity"), col("l_discount") * 100).as("le"),
          round(atan2(col("l_quantity"), lit(3.0)), 6).as("at2"),
          round(sin(col("l_discount")), 6).as("sn"),
          round(cos(col("l_discount")), 6).as("cs"),
          round(cbrt(col("l_quantity")), 6).as("cb"),
          round(degrees(col("l_discount")), 6).as("dg"),
          round(radians(col("l_quantity")), 6).as("rd"),
          round(lit(math.Pi), 6).as("cpi"),
          signum(col("l_discount") - 0.05).cast("double").as("sgn"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- date/time function family -----------------------------------------
    Q("q16_datetime_functions", Some("""
      SELECT event_id,
             CAST(year(ts) AS BIGINT) AS y,
             CAST(month(ts) AS BIGINT) AS mo,
             CAST(day(ts) AS BIGINT) AS d,
             CAST(hour(ts) AS BIGINT) AS h,
             CAST(minute(ts) AS BIGINT) AS mi,
             CAST(isodow(ts) AS BIGINT) AS dw,
             CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day_start,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
             CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             make_timestamp((CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) % 900) * 1000000) AS bin15m,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER) AS days_in,
             CAST(CAST(ts AS DATE) + 7 AS VARCHAR) AS plus_week,
             CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
             CAST(make_date(2024, CAST(month(ts) AS INTEGER), 1) AS VARCHAR) AS month_start,
             strftime(ts, '%Y-%m-%d %H') AS fmt
      FROM events
      WHERE event_id < 300
      ORDER BY event_id""")) { (spark, dir) =>
      val ep = floor(unix_timestamp(col("ts"))).cast("long")
      Tables.load(spark, dir, "events")
        .filter(col("event_id") < 300)
        .select(
          col("event_id"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("mo"),
          dayofmonth(col("ts")).cast("long").as("d"),
          hour(col("ts")).cast("long").as("h"),
          minute(col("ts")).cast("long").as("mi"),
          (weekday(col("ts")) + 1).cast("long").as("dw"),
          date_trunc("day", col("ts")).cast("date").cast("string").as("day_start"),
          col("ts").cast("date").cast("string").as("dt"),
          ep.as("ep"),
          // timestamp_ntz: DuckDB make_timestamp is a naive timestamp; a
          // Spark TIMESTAMP_LTZ lands in parquet as isAdjustedToUTC=true,
          // which DuckDB reads as TIMESTAMPTZ → schema mismatch (r1).
          timestamp_seconds(ep - ep % 900).cast("timestamp_ntz").as("bin15m"),
          datediff(col("ts").cast("date"), lit(java.sql.Date.valueOf("2024-01-01")))
            .cast("int").as("days_in"),
          date_add(col("ts").cast("date"), 7).cast("string").as("plus_week"),
          last_day(col("ts").cast("date")).cast("string").as("month_end"),
          make_date(lit(2024), month(col("ts")).cast("int"), lit(1)).cast("string").as("month_start"),
          date_format(col("ts"), "yyyy-MM-dd HH").as("fmt"))
        .orderBy(col("event_id"))
    },

    // ---- FULL OUTER join + CTE + COALESCE ---------------------------------
    Q("q17_full_outer_cte", Some("""
      WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS nc
                 FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
           s AS (SELECT s_nationkey AS nk, COUNT(*) AS ns
                 FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
      SELECT COALESCE(c.nk, s.nk) AS nk, c.nc AS nc, s.ns AS ns
      FROM c FULL OUTER JOIN s ON c.nk = s.nk
      ORDER BY nk""")) { (spark, dir) =>
      val c = Tables.load(spark, dir, "customer")
        .filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("nc"))
      val s = Tables.load(spark, dir, "supplier")
        .filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("ns"))
      c.join(s, col("cnk") === col("snk"), "full_outer")
        .select(coalesce(col("cnk"), col("snk")).as("nk"), col("nc"), col("ns"))
        .orderBy(col("nk"))
    },

    // ---- LEFT OUTER join with null counting --------------------------------
    Q("q18_left_outer", Some("""
      SELECT n.n_name,
             COUNT(c.c_custkey) AS n_rich
      FROM nation n LEFT JOIN customer c
        ON n.n_nationkey = c.c_nationkey AND c.c_acctbal > 9500
      GROUP BY n.n_name
      ORDER BY n.n_name""")) { (spark, dir) =>
      val n = Tables.load(spark, dir, "nation")
      val c = Tables.load(spark, dir, "customer").filter(col("c_acctbal") > 9500)
      n.join(c, col("n_nationkey") === col("c_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_rich"))
        .orderBy(col("n_name"))
    },

    // ---- anti join (NOT EXISTS) --------------------------------------------
    // Customers with no Q1-1995 order: the date window keeps the anti-join
    // NON-VACUOUS on the fixture (every customer has orders overall, so the
    // unwindowed NOT EXISTS returned 0 rows and its oracle row had no
    // teeth) — 100 rows at sf0.001, 1036 at sf0.01. The windowed predicate
    // pushes into the build side BEFORE the anti-join, so the filtered
    // orders scan stays the small side at any SF.
    Q("q19_anti_join", Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= DATE '1995-01-01'
                          AND o_orderdate < DATE '1995-04-01')
      ORDER BY c_custkey""")) { (spark, dir) =>
      val c = Tables.load(spark, dir, "customer")
      val o = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("date") &&
          col("o_orderdate") < lit("1995-04-01").cast("date"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---- cross join ---------------------------------------------------------
    Q("q20_cross_join", Some("""
      SELECT r1.r_name AS a, r2.r_name AS b
      FROM region r1 CROSS JOIN region r2
      ORDER BY a, b""")) { (spark, dir) =>
      val r1 = Tables.load(spark, dir, "region").select(col("r_name").as("a"))
      val r2 = Tables.load(spark, dir, "region").select(col("r_name").as("b"))
      r1.crossJoin(r2).orderBy(col("a"), col("b"))
    },

    // ---- non-equi (range/theta) join over a VALUES list --------------------
    Q("q21_range_join_values", Some("""
      SELECT b.band, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders o
      JOIN (VALUES ('lo', 0.0, 100000.0),
                   ('mid', 100000.0, 300000.0),
                   ('hi', 300000.0, 1e9)) b(band, lo, hi)
        ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
      GROUP BY b.band
      ORDER BY b.band""")) { (spark, dir) =>
      import spark.implicits._
      val bands = Seq(("lo", 0.0, 100000.0), ("mid", 100000.0, 300000.0),
        ("hi", 300000.0, 1e9)).toDF("band", "lo", "hi")
      Tables.load(spark, dir, "orders")
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("band"))
    },

    // ---- uncorrelated scalar subquery ---------------------------------------
    Q("q22_scalar_subquery", Some("""
      SELECT o_orderstatus, COUNT(*) AS n
      FROM orders
      WHERE o_totalprice > (SELECT 1.5 * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")) { (spark, dir) =>
      registered(spark, dir).sql("""
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > (SELECT 1.5 * CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    },

    // ---- correlated scalar subquery ------------------------------------------
    Q("q23_correlated_subquery", Some("""
      SELECT s_suppkey, s_name,
             (SELECT COUNT(*) FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49) AS n_big
      FROM supplier
      ORDER BY s_suppkey""")) { (spark, dir) =>
      registered(spark, dir).sql("""
        SELECT s_suppkey, s_name,
               (SELECT COUNT(*) FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 49) AS n_big
        FROM supplier
        ORDER BY s_suppkey""")
    },

    // ---- statistical aggregates ----------------------------------------------
    Q("q24_stats_aggregates", Some("""
      SELECT o_orderstatus,
             round(stddev_samp(o_totalprice), 2) AS sd_samp,
             round(stddev_pop(o_totalprice), 2) AS sd_pop,
             round(var_samp(o_totalprice), 0) AS v_samp,
             round(corr(o_totalprice, o_custkey), 6) AS c_pc,
             round(covar_samp(o_totalprice, o_custkey), 0) AS cv,
             CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS med,
             min(o_totalprice) AS mn, max(o_totalprice) AS mx
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(stddev_samp(col("o_totalprice")), 2).as("sd_samp"),
          round(stddev_pop(col("o_totalprice")), 2).as("sd_pop"),
          round(var_samp(col("o_totalprice")), 0).as("v_samp"),
          round(corr(col("o_totalprice"), col("o_custkey")), 6).as("c_pc"),
          round(covar_samp(col("o_totalprice"), col("o_custkey")), 0).as("cv"),
          expr("percentile(o_totalprice, 0.5)").cast("double").as("med"),
          min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
        .orderBy(col("o_orderstatus"))
    },

    // ---- ordered array_agg / string concat agg / bool + bit aggregates -------
    Q("q25_collect_aggregates", Some("""
      SELECT n_regionkey,
             array_to_string(list_sort(list(n_name)), ',') AS names,
             bool_and(n_nationkey >= 0) AS all_nonneg,
             bool_or(n_nationkey > 20) AS any_gt20,
             bit_and(n_nationkey) AS band,
             bit_or(n_nationkey) AS bor,
             bit_xor(n_nationkey) AS bxor
      FROM nation
      GROUP BY n_regionkey
      ORDER BY n_regionkey""")) { (spark, dir) =>
      Tables.load(spark, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(sort_array(collect_list(col("n_name"))), ",").as("names"),
          bool_and(col("n_nationkey") >= 0).as("all_nonneg"),
          bool_or(col("n_nationkey") > 20).as("any_gt20"),
          bit_and(col("n_nationkey")).as("band"),
          bit_or(col("n_nationkey")).as("bor"),
          bit_xor(col("n_nationkey")).as("bxor"))
        .orderBy(col("n_regionkey"))
    },

    // ---- UNNEST / explode + re-aggregate --------------------------------------
    Q("q26_explode_words", Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part) t
      GROUP BY word
      ORDER BY n DESC, word""")) { (spark, dir) =>
      Tables.load(spark, dir, "part")
        .select(explode(split(col("p_type"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
    },

    // ---- array function family -------------------------------------------------
    Q("q27_array_functions", Some("""
      SELECT p_partkey,
             array_to_string(list_sort(string_split(p_type, ' ')), '|') AS sorted_words,
             CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
             list_contains(string_split(p_type, ' '), 'BRASS') AS has_brass,
             string_split(p_type, ' ')[1] AS first_word,
             array_to_string(list_slice(string_split(p_type, ' '), 1, 2), '|') AS first_two,
             array_to_string(generate_series(1, p_size % 3 + 1), ',') AS seq_str,
             array_to_string(list_distinct(string_split(p_brand, '#')), '~') AS brand_parts,
             array_to_string(list_reverse_sort(string_split(p_type, ' ')), '|') AS rsorted
      FROM part
      ORDER BY p_partkey""")) { (spark, dir) =>
      val words = split(col("p_type"), " ")
      Tables.load(spark, dir, "part")
        .select(
          col("p_partkey"),
          array_join(sort_array(words), "|").as("sorted_words"),
          size(split(col("p_name"), " ")).cast("long").as("n_words"),
          array_contains(words, "BRASS").as("has_brass"),
          element_at(words, 1).as("first_word"),
          array_join(slice(words, 1, 2), "|").as("first_two"),
          array_join(sequence(lit(1), col("p_size") % 3 + 1), ",").as("seq_str"),
          array_join(array_sort(array_distinct(split(col("p_brand"), "#"))), "~").as("brand_parts"),
          array_join(sort_array(words, asc = false), "|").as("rsorted"))
        .orderBy(col("p_partkey"))
    },

    // ---- hash / encoding functions ----------------------------------------------
    Q("q28_hash_encoding", Some("""
      SELECT c_custkey,
             md5(c_name) AS h_md5,
             sha256(c_name) AS h_sha256,
             lower(hex(c_name)) AS h_hex,
             base64(CAST(c_name AS BLOB)) AS h_b64
      FROM customer
      WHERE c_custkey <= 200
      ORDER BY c_custkey""")) { (spark, dir) =>
      Tables.load(spark, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(
          col("c_custkey"),
          md5(col("c_name")).as("h_md5"),
          sha2(col("c_name"), 256).as("h_sha256"),
          lower(hex(col("c_name"))).as("h_hex"),
          base64(col("c_name").cast("binary")).as("h_b64"))
        .orderBy(col("c_custkey"))
    },

    // ---- regex family --------------------------------------------------------------
    Q("q29_regex_functions", Some("""
      SELECT doc_id,
             regexp_replace(substr(text, 1, 100), '[aeiou]', '*', 'g') AS starred,
             regexp_extract(substr(text, 1, 100), '([a-z]{5,})', 1) AS long_word,
             regexp_matches(substr(text, 1, 100), 'data|query') AS mentions_data
      FROM documents
      ORDER BY doc_id""")) { (spark, dir) =>
      val head = substring(col("text"), 1, 100)
      Tables.load(spark, dir, "documents")
        .select(
          col("doc_id"),
          regexp_replace(head, "[aeiou]", "*").as("starred"),
          regexp_extract(head, "([a-z]{5,})", 1).as("long_word"),
          head.rlike("data|query").as("mentions_data"))
        .orderBy(col("doc_id"))
    },

    // ---- JSON access + conditional functions -----------------------------------------
    Q("q30_json_conditional", Some("""
      SELECT event_id,
             json_extract_string(props, '$.k') AS k,
             coalesce(nullif(event_type, 'view'), 'hidden') AS masked,
             ifnull(try_cast(event_type AS INTEGER), -1) AS et_int,
             CASE WHEN value IS NULL THEN 'null' ELSE 'set' END AS has_value,
             CASE WHEN nullif(event_type, 'click') IS NOT NULL
                  THEN 'other' ELSE 'click' END AS click_flag
      FROM events
      WHERE event_id < 300
      ORDER BY event_id""")) { (spark, dir) =>
      Tables.load(spark, dir, "events")
        .filter(col("event_id") < 300)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k"),
          coalesce(nullif(col("event_type"), lit("view")), lit("hidden")).as("masked"),
          expr("ifnull(try_cast(event_type AS INT), -1)").as("et_int"),
          when(col("value").isNull, "null").otherwise("set").as("has_value"),
          nvl2(nullif(col("event_type"), lit("click")), lit("other"), lit("click")).as("click_flag"))
        .orderBy(col("event_id"))
    },

    // ---- window frames: lag/lead/ntile/percent_rank/cume_dist/nth/running ----------
    Q("q31_window_frames", Some("""
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w_run AS DOUBLE) AS running,
             lag(o_orderkey, 1) OVER w AS prev_ok,
             lead(o_orderkey, 1) OVER w AS next_ok,
             first_value(o_orderkey) OVER w_run AS first_ok,
             nth_value(o_orderkey, 2) OVER w_run AS second_ok,
             ntile(4) OVER w AS quartile,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
               (PARTITION BY o_custkey ORDER BY CAST(FLOOR(o_totalprice) AS BIGINT)
                RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_sum
      FROM orders
      WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey""")) { (spark, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wRange = Window.partitionBy(col("o_custkey"))
        .orderBy(floor(col("o_totalprice")).cast("long"))
        .rangeBetween(-50000, Window.currentRow)
      Tables.load(spark, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(wRun).cast("double").as("running"),
          lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
          lead(col("o_orderkey"), 1).over(w).as("next_ok"),
          first(col("o_orderkey")).over(wRun).as("first_ok"),
          nth_value(col("o_orderkey"), 2).over(wRun).as("second_ok"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          sum(dec(col("o_totalprice"))).over(wRange).cast("double").as("nearby_sum"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- LIMIT + OFFSET ------------------------------------------------------------
    Q("q32_limit_offset", Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_orderkey
      LIMIT 20 OFFSET 10""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(10)
        .limit(20)
    }
  )
}
