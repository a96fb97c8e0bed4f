package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** The two join rewrites a 100 TB engine needs when neither side fits
  * in a broadcast: time-band bucketing (interval join → equi-join) and
  * key salting (skewed equi-join → uniformly partitioned join).
  *
  * Both rewrites are RESULT-IDENTICAL to the naive join — the queries
  * that use them (p49, p50) oracle-check against the plain-join SQL,
  * which is the strongest possible proof the rewrite is lossless.
  */
object JoinPatterns {

  /** Interval join `r.ts ∈ [l.ts - window, l.ts]` on an equality key,
    * rewritten to an equi-join on (key, time band).
    *
    * The naive formulation is a nested-loop (non-equi) join — O(n·m)
    * per key and un-shuffleable. With band width = the window length,
    * a LEFT row's interval spans EXACTLY two bands
    * (`floor(ts/w) - 1` and `floor(ts/w)`), and a RIGHT row lives in
    * exactly one, so duplicating only the left side ×2 makes the join a
    * plain hash equi-join on (key, band) — one bounded shuffle, AQE-
    * replannable, skew-splittable. A right row appears in one band →
    * no dedup pass is needed.
    *
    * Inputs carry (key, ts-microseconds, payload...); `leftTs`/`rightTs`
    * name the timestamp columns, `windowUs` the interval length.
    */
  def bandedIntervalJoin(left: DataFrame, right: DataFrame,
                         key: String, leftTs: String, rightTs: String,
                         windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(!(left.columns ++ right.columns).contains("__band"),
      "bandedIntervalJoin reserves the __band column name")
    val w = lit(windowUs)
    // exact integer FLOOR division ((a - pmod(a,w)) div w): float
    // `floor(a/w)` would be ulp-fragile near band edges, and bare `div`
    // truncates toward zero — wrong band for pre-epoch (negative)
    // timestamps. Subtracting the non-negative pmod makes the numerator
    // an exact multiple of w, so integer div IS floor, for any sign.
    // Built with the Column API (Catalyst IntegralDivide = SQL `div`),
    // not a SQL string, so backtick-needing column names can't break it.
    def band(ts: String): Column = {
      val n = col(ts) - pmod(col(ts), w)
      GraftSql.column(IntegralDivide(
        GraftSql.expression(n), GraftSql.expression(w)))
    }
    val lb = left.withColumn("__band",
      explode(array(band(leftTs) - 1, band(leftTs))))
    val rb = right.withColumn("__band", band(rightTs))
    lb.join(rb, Seq(key, "__band"))
      .filter(col(rightTs) >= col(leftTs) - w && col(rightTs) <= col(leftTs))
      .drop("__band")
  }

  /** Equi-join with a salted key: the left (large, skewed) side gets a
    * deterministic salt in [0, salts), the right side is replicated
    * once per salt value, and the join key becomes (key, salt) — a hot
    * key's rows now land on `salts` partitions instead of one.
    *
    * This is the manual fallback for the skew AQE can't fix: a
    * SINGLE-key hot spot where even a split shuffle partition holds one
    * giant group. Replication cost is `salts × |right|` rows — chosen
    * when the right side is too big to broadcast outright but small
    * enough to replicate a few times (the window between broadcast and
    * plain shuffle). `saltExpr` must be deterministic (reruns/retries
    * must re-salt identically); pass e.g. `pmod(col("id"), lit(salts))`.
    * A NULL salt coalesces to bucket 0 — the row still joins (identical
    * to the plain key-join), it just isn't spread.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltExpr: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!(left.columns ++ right.columns).contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val ls = left.withColumn("__salt",
      coalesce(pmod(saltExpr, lit(salts)), lit(0)).cast("int"))
    val rs = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // shuffle_hash pins the shuffle-join path: at fixture size the
    // replicated right side would auto-broadcast, which silently skips
    // the very partitioning this operator exists to demonstrate
    ls.join(rs.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
