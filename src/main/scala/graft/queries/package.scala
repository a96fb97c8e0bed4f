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

  /** Conf-gated single-pass materialization flag (default ON): only an
    * explicit "false" (any case) disables — a typo'd value must not
    * throw from String.toBoolean inside query construction.
    */
  def singlePass(spark: SparkSession, key: String): Boolean =
    !spark.conf.getOption(key).exists(_.trim.equalsIgnoreCase("false"))

  def registered(spark: SparkSession, dir: String): SparkSession = {
    Tables.register(spark, dir)
    spark
  }

  /** Per-JVM-unique sink root: two concurrent bench/verify runs on one
    * host must never clobber each other's sink data mid-read, so every
    * sink path (and derived table name) carries the process id. A
    * shutdown hook removes everything registered here, so repeated runs
    * don't accumulate per-pid garbage in tmp/warehouse dirs.
    */
  lazy val runToken: String = ProcessHandle.current().pid().toString

  private lazy val cleanupPaths = {
    val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      paths.forEach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(p))
      }))
    paths
  }

  /** Register a path for recursive deletion at JVM exit. */
  def cleanupAtExit(path: String): Unit = { cleanupPaths.add(path): Unit }

  def sinkDir(sub: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_sink_$runToken"
    cleanupAtExit(root)
    s"$root/$sub"
  }
}

package queries {

  import graft.ops.TextOps

  /** Shared DuckDB mirrors of the TextOps formulas, built in ONE place so
    * the oracles of every query using them (p01, p02, p28, …) can never
    * drift from each other when `TextOps` changes.
    */
  private[queries] object TextSql {

    private def inList(words: Seq[String]): String =
      words.map(w => s"'$w'").mkString(",")

    /** Mirror of [[TextOps.tokens]] over `documents.text`. */
    val ws: String = raw"string_split_regex(lower(text), '\s+')"

    /** Mirror of [[TextOps.shingles]] over a token-list expression. */
    def shingles(ws: String, n: Int): String =
      s"CASE WHEN len($ws) >= $n THEN [array_to_string($ws[i:i+${n - 1}], ' ') " +
        s"for i in generate_series(1, len($ws)-${n - 1})] ELSE [] END"

    /** Mirror of [[TextOps.segments]] over a token-list expression. */
    def segments(ws: String, n: Int): String =
      s"CASE WHEN len($ws) >= $n THEN [array_to_string($ws[(i*$n+1):(i*$n+$n)], ' ') " +
        s"for i in generate_series(0, len($ws)//$n - 1)] ELSE [] END"

    /** Mirror of [[TextOps.stopwordRatio]]'s hit count over `ws`. */
    def stopHits(ws: String): String =
      s"len(list_filter($ws, t -> t IN (${inList(TextOps.stopwords)})))"

    /** Mirror of [[TextOps.qualityScore]]: `ws` is the token-list
      * expression, `text` the raw source column it was derived from
      * (the punct term reads the raw text, not the tokens).
      */
    def quality(ws: String, text: String = "text"): String =
      s"round(0.4 * least(1.0, CAST(len($ws) AS DOUBLE) / 50.0)" +
        s" + 0.3 * (1.0 - CAST(length(regexp_replace(lower($text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length($text))" +
        s" + 0.3 * least(1.0, CAST(${stopHits(ws)} AS DOUBLE) / len($ws) * 5.0), 6)"

    /** Mirror of one language's profile-hit count ([[TextOps.langId]]). */
    def langScore(ws: String, lang: String): String = {
      val words = TextOps.langProfiles.find(_._1 == lang).get._2
      s"len(list_filter($ws, t -> t IN (${inList(words)})))"
    }

    /** Mirror of [[TextOps.langId]]'s pick-the-max CASE, over per-language
      * score expressions produced by `score` (ties break in profile order).
      */
    def langCase(score: String => String): String = {
      val names = TextOps.langProfiles.map(_._1)
      val m = s"greatest(${names.map(score).mkString(",")})"
      val whens = names.map(l => s"WHEN ${score(l)} = $m THEN '$l'").mkString(" ")
      s"CASE WHEN $m = 0 THEN 'und' $whens ELSE 'und' END"
    }
  }
}
