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

  // --- affine MinHash family over a single md5 -----------------------------
  //
  // k independent hash families from ONE md5 per value: h32(x) is the first
  // 8 hex chars of md5 as a 32-bit integer, then m_j(x) = (a_j*h + b_j) mod P
  // (the classic universal family). One md5 + k integer ops replaces k md5s
  // — the dominant cost of MinHash signatures at scale. All arithmetic stays
  // under 2^62 (a_j < 2^30, h < 2^32) so Spark and DuckDB BIGINTs agree
  // bit-for-bit.

  /** 32-bit portable hash (first 8 hex chars of md5), in [0, 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL mirror of [[h32]]. */
  def h32Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** Salted 32-bit portable hash: the j-th independent 32-bit family
    * (used to extend per-token randomness past 32 bits, e.g. the upper
    * half of a 64-bit SimHash).
    */
  def h32s(salt: Int, c: Column): Column =
    h32(concat(lit(salt.toString), lit(":"), c))

  /** DuckDB SQL mirror of [[h32s]]. */
  def h32sSql(salt: Int, e: String): String =
    h32Sql(s"concat('$salt:', $e)")

  /** Prime modulus of the affine family (largest prime below 2^32). */
  val MinhashP: Long = 4294967291L

  /** Deterministic multipliers (odd, < 2^30 — keeps a*h+b < 2^62). */
  def aCoef(j: Int): Long = ((2654435761L * (j + 1)) % (1L << 30)) | 1L

  /** Deterministic offsets in [0, P). */
  def bCoef(j: Int): Long = (2246822519L * (j + 1)) % MinhashP

  /** j-th affine minhash of a precomputed [[h32]] column. */
  def minhashJ(j: Int, h: Column): Column =
    (lit(aCoef(j)) * h + lit(bCoef(j))) % lit(MinhashP)

  /** DuckDB SQL mirror of [[minhashJ]] over SQL expression `e` (= h32). */
  def minhashJSql(j: Int, e: String): String =
    s"((${aCoef(j)} * $e + ${bCoef(j)}) % $MinhashP)"
}
