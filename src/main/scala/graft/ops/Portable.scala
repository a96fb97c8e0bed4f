package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Every dedup / fingerprint operator in this library is defined over a
  * hash that can be computed bit-identically by any engine with `md5`
  * (Spark, DuckDB, Trino, ...), so results are reproducible across the
  * fleet and verifiable against an external oracle. We deliberately do
  * NOT use `xxhash64`/`hash` — those are engine-private.
  *
  * `h60` = first 15 hex chars of md5 as a non-negative 60-bit integer.
  * 60 bits keeps the value inside a signed 64-bit long in every engine
  * while leaving collision probability ~2^-30 per pair — negligible for
  * dedup purposes even at 100 TB (birthday bound ~2^30 distinct keys
  * per *equal-hash* false positive).
  *
  * Salted variants (`h60s`) give k independent hash families for
  * MinHash from the single md5 primitive: h_j(x) = h60(j || ':' || x).
  */
object Portable {

  /** 60-bit portable hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Salted portable hash: the j-th independent hash family. */
  def h60s(salt: Int, c: Column): Column =
    h60(concat(lit(salt.toString), lit(":"), c))

  /** DuckDB SQL mirror of [[h60]] over SQL expression `e`. */
  def h60Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB SQL mirror of [[h60s]]. */
  def h60sSql(salt: Int, e: String): String =
    h60Sql(s"concat('$salt:', $e)")
}
