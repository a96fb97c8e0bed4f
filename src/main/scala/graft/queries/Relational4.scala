package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 inventory, part 4 — sources/sinks and reshaping:
  * CSV and JSON write/read-back with schema inference, hive-partitioned
  * parquet write + partition-pruned read, CREATE VIEW, pivot/unpivot,
  * series generation (`range`/`sequence` ↔ DuckDB `generate_series`),
  * struct/map construction + access, and interval arithmetic.
  *
  * Sink queries write under java.io.tmpdir (the fixture dirs are
  * read-only) and read their own output back, so the oracle checks the
  * full write→infer→read→aggregate loop against the original table.
  */
object Relational4 {

  private def sink(sub: String): String = sinkDir(sub)

  val all: Seq[Q] = Seq(

    // ---- CSV sink + schema-inferred source -------------------------------
    // Double→string→double is exact (shortest-roundtrip printing), so the
    // decimal-exact aggregate must hash-match the original table's.
    Q("q38_csv_roundtrip", Some("""
      SELECT l_returnflag, l_linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 5000
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")) { (spark, dir) =>
      val out = sink("q38_csv")
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_orderkey") < 5000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"))
        .write.mode("overwrite").option("header", "true").csv(out)
      spark.read.option("header", "true").option("inferSchema", "true").csv(out)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- JSON-lines sink + schema-inferred source ------------------------
    Q("q39_json_roundtrip", Some("""
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
             min(o_orderpriority) AS min_prio
      FROM orders
      WHERE o_orderkey < 20000
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")) { (spark, dir) =>
      val out = sink("q39_json")
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") < 20000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("overwrite").json(out)
      spark.read.json(out)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderpriority")).as("min_prio"))
        .orderBy(col("o_orderstatus"))
    },

    // ---- hive-partitioned parquet sink + pruned read ---------------------
    // The read-back filter hits only the o_orderstatus=F directory —
    // partition pruning, the on-disk layout a 100 TB table would use
    // (verified via PartitionFilters in SinksSpec).
    Q("q40_partitioned_pruning", Some("""
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderstatus = 'F'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")) { (spark, dir) =>
      val out = sink("q40_part")
      Tables.load(spark, dir, "orders")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
      spark.read.parquet(out)
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- CREATE VIEW + query through it ----------------------------------
    Q("q41_views", Some("""
      SELECT n_name, COUNT(*) AS n_cust
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > 0
      GROUP BY n_name
      ORDER BY n_name""")) { (spark, dir) =>
      val s = registered(spark, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_q41_pos AS
               SELECT * FROM customer WHERE c_acctbal > 0""")
      s.sql("""SELECT n_name, COUNT(*) AS n_cust
               FROM graft_q41_pos JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name
               ORDER BY n_name""")
    },

    // ---- pivot (wide from long) ------------------------------------------
    Q("q42_pivot", Some("""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_linestatus = 'F'
               THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS f_qty,
             CAST(SUM(CASE WHEN l_linestatus = 'O'
               THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS o_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
        .withColumnRenamed("F", "f_qty")
        .withColumnRenamed("O", "o_qty")
        .orderBy(col("l_returnflag"))
    },

    // ---- unpivot (long from wide) -----------------------------------------
    Q("q43_unpivot", Some("""
      WITH agg AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, val FROM (
        SELECT l_returnflag, 'qty' AS metric, qty AS val FROM agg
        UNION ALL
        SELECT l_returnflag, 'price' AS metric, price AS val FROM agg)
      ORDER BY l_returnflag, metric""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice")).as("price"))
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("price")),
          "metric", "val")
        .orderBy(col("l_returnflag"), col("metric"))
    },

    // ---- series generation: range table + per-row sequence ----------------
    Q("q44_generate_series", Some("""
      WITH ids AS (SELECT unnest(generate_series(1, 200)) AS id),
      ij AS (SELECT id, unnest(generate_series(1, id)) AS j FROM ids)
      SELECT id, CAST(SUM(j) AS BIGINT) AS tri
      FROM ij
      GROUP BY id
      ORDER BY id""")) { (spark, dir) =>
      spark.range(1, 201)
        .select(col("id"), explode(sequence(lit(1L), col("id"))).as("j"))
        .groupBy(col("id"))
        .agg(sum(col("j")).as("tri"))
        .orderBy(col("id"))
    },

    // ---- struct / map construction and access -----------------------------
    // Oracle states the equivalent scalar values directly — the check is
    // that Spark's struct/map round-trips reproduce them.
    Q("q45_struct_map", Some("""
      SELECT o_orderkey,
             o_orderstatus AS st_status,
             o_totalprice AS st_price,
             o_orderpriority AS m_prio,
             2 AS n_keys,
             'prio,status' AS keys_sorted
      FROM orders
      WHERE o_orderkey < 1000
      ORDER BY o_orderkey""")) { (spark, dir) =>
      val st = struct(col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"))
      val m = map(lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority"))
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"), st.as("st"), m.as("m"))
        .select(
          col("o_orderkey"),
          col("st").getField("status").as("st_status"),
          col("st").getField("price").as("st_price"),
          element_at(col("m"), "prio").as("m_prio"),
          size(col("m")).as("n_keys"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"))
        .orderBy(col("o_orderkey"))
    },

    // ---- interval arithmetic ----------------------------------------------
    // DATE ± INTERVAL result types diverge between engines (Spark: DATE or
    // TIMESTAMP_LTZ depending on the interval class; DuckDB: naive
    // TIMESTAMP), so every derived column is normalized to VARCHAR /
    // BIGINT on BOTH sides (the q16 recipe) — the check is the interval
    // arithmetic, not the engine-native carrier type.
    Q("q46_interval_arith", Some("""
      SELECT o_orderkey,
             CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3m,
             CAST(CAST(o_orderdate - INTERVAL 45 DAY AS DATE) AS VARCHAR) AS minus_45d,
             CAST(CAST(date_trunc('month', o_orderdate)
                  + INTERVAL 1 MONTH - INTERVAL 1 DAY AS DATE) AS VARCHAR) AS month_end,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS BIGINT) AS days_to_2025
      FROM orders
      WHERE o_orderkey < 1000
      ORDER BY o_orderkey""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTH"))
            .cast("date").cast("string").as("plus_3m"),
          (col("o_orderdate") - expr("INTERVAL 45 DAY"))
            .cast("date").cast("string").as("minus_45d"),
          (date_trunc("month", col("o_orderdate")) + expr("INTERVAL 1 MONTH")
            - expr("INTERVAL 1 DAY")).cast("date").cast("string").as("month_end"),
          datediff(lit(java.sql.Date.valueOf("2025-01-01")),
            col("o_orderdate").cast("date")).cast("long").as("days_to_2025"))
        .orderBy(col("o_orderkey"))
    }
  )
}
