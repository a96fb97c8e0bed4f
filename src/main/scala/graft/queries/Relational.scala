package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.2 relational inventory, part 1: scans, projection/filter,
  * aggregation, joins, windows, sort/top-k, set ops, distinct aggregates.
  *
  * Every query is declared through the DataFrame API (Catalyst plans the
  * physical strategy) with a DuckDB oracle carrying identical column names
  * and a total ORDER BY so the driver's hash compare is deterministic.
  * Double aggregates go through exact DECIMAL arithmetic (see
  * [[graft.queries.dec]]) so results are independent of partitioning.
  */
object Relational {

  val all: Seq[Q] = Seq(

    // ---- aggregation: hash agg, partial/final, multiple aggregates ------
    Q("q01_pricing_summary", Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= DATE '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Date.valueOf("2001-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- projection + filter with parquet pushdown ----------------------
    Q("q02_filter_projection", Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= DATE '2000-01-01' AND l_shipdate < DATE '2000-02-01'
        AND l_quantity > 45
      ORDER BY l_orderkey, l_linenumber""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Date.valueOf("2000-01-01")) &&
                col("l_shipdate") <  lit(java.sql.Date.valueOf("2000-02-01")) &&
                col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape) ----------------------
    Q("q03_shipping_priority", Some("""
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
             o_orderdate, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")) { (spark, dir) =>
      val c = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") < lit(java.sql.Date.valueOf("1998-03-15")))
      val l = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit(java.sql.Date.valueOf("1998-03-15")))
      // No broadcast hint on customer: it grows with sf, so the
      // build-side choice belongs to AQE's runtime size estimate —
      // it still broadcasts at any scale where broadcasting is right.
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- left-semi join (EXISTS rewrite) ---------------------------------
    Q("q04_order_priority_exists", Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= DATE '1999-01-01' AND o_orderdate < DATE '1999-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")) { (spark, dir) =>
      val o = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1999-01-01")) &&
                col("o_orderdate") <  lit(java.sql.Date.valueOf("1999-04-01")))
      val l = Tables.load(spark, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- 6-way join, dims broadcast (TPC-H Q5 shape) ---------------------
    Q("q05_local_supplier_volume", Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")) { (spark, dir) =>
      val c = Tables.load(spark, dir, "customer")
      val o = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
                col("o_orderdate") <  lit(java.sql.Date.valueOf("1998-01-01")))
      val l = Tables.load(spark, dir, "lineitem")
      val s = Tables.load(spark, dir, "supplier")
      val n = Tables.load(spark, dir, "nation")
      val r = Tables.load(spark, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
                            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- selective scalar aggregate (TPC-H Q6 shape) ---------------------
    Q("q06_forecast_revenue", Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")) { (spark, dir) =>
      Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Date.valueOf("1997-01-01")) &&
                col("l_shipdate") <  lit(java.sql.Date.valueOf("1998-01-01")) &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },

    // ---- window functions: row_number / rank / dense_rank ----------------
    Q("q07_window_rank", Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber, rn, rnk
      FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
                   ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
                   RANK() OVER (PARTITION BY l_suppkey
                                ORDER BY CAST(l_quantity AS DECIMAL(12,2)) DESC) AS rnk
            FROM lineitem) t
      WHERE rn <= 3
      ORDER BY l_suppkey, rn""")) { (spark, dir) =>
      val byShip = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val byQty = Window.partitionBy(col("l_suppkey"))
        .orderBy(dec(col("l_quantity")).desc)
      Tables.load(spark, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(byShip).as("rn"),
          rank().over(byQty).as("rnk"))
        .filter(col("rn") <= 3)
        .orderBy(col("l_suppkey"), col("rn"))
    },

    // ---- global sort + limit → TakeOrderedAndProject ---------------------
    Q("q08_topk_orders", Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- set operations: UNION / INTERSECT / EXCEPT ----------------------
    Q("q09_set_operations", Some("""
      SELECT op, nk FROM (
        SELECT 'union' AS op, nk FROM
          (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier) u
        UNION ALL
        SELECT 'intersect' AS op, nk FROM
          (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier) i
        UNION ALL
        SELECT 'except' AS op, nk FROM
          (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier) e
      ) t ORDER BY op, nk""")) { (spark, dir) =>
      val c = Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nk"))
      val s = Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nk"))
      val u = c.union(s).distinct().select(lit("union").as("op"), col("nk"))
      val i = c.intersect(s).select(lit("intersect").as("op"), col("nk"))
      val e = c.except(s).select(lit("except").as("op"), col("nk"))
      u.unionAll(i).unionAll(e).orderBy(col("op"), col("nk"))
    },

    // ---- DISTINCT + multiple COUNT(DISTINCT) ------------------------------
    Q("q10_distinct_aggregates", Some("""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS n_cust,
             COUNT(DISTINCT o_orderpriority) AS n_prio,
             COUNT(*) AS n
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")) { (spark, dir) =>
      Tables.load(spark, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }
  )
}
