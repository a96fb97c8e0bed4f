package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** One declared engine query: a Spark implementation plus (when SQL-
    * expressible) a DuckDB oracle with IDENTICAL column names and row order.
    * Keeping both sides in one value prevents the maps from drifting.
    */
  final case class Q(
      name: String,
      oracle: Option[String])(
      val run: (SparkSession, String) => DataFrame)

  /** Money/quantity columns in the fixtures are exact 2-decimal values
    * (verified against the parquet data), so summing through DECIMAL is
    * lossless AND order-independent — the only way a Spark aggregate can
    * hash-match a DuckDB oracle bit-for-bit regardless of partitioning.
    * Final cast back to DOUBLE so both engines emit the same schema.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact, order-independent SUM of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact AVG: decimal sum divided by count, both engines do the same
    * final double division.
    */
  def davg(c: Column): Column =
    (sum(dec(c)).cast("double") / count(c)).cast("double")

  /** `l_extendedprice * (1 - l_discount)` in exact decimal arithmetic. */
  def discPrice(price: Column, disc: Column): Column =
    dec(price) * (lit(1).cast(DecimalType(3, 0)) - dec(disc))

  def registered(spark: SparkSession, dir: String): SparkSession = {
    Tables.register(spark, dir)
    spark
  }

  /** Per-JVM-unique sink root: two concurrent bench/verify runs on one
    * host must never clobber each other's sink data mid-read, so every
    * sink path (and derived table name) carries the process id.
    */
  lazy val runToken: String = ProcessHandle.current().pid().toString

  def sinkDir(sub: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_sink_$runToken/$sub"
}
