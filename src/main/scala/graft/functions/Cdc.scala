package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a document at every code-point
  * position whose trailing `window`-char polynomial hash is ≡ 0
  * (mod `modulus`) — LBFS-style window-hash CDC, the storage-dedup
  * primitive (expected chunk length = `modulus`). Because boundaries
  * depend only on local content, two payloads sharing a long suffix
  * re-synchronize to identical chunks after at most one window of
  * divergence regardless of prefix — the property fixed-size blocking
  * lacks, and the reason object stores dedup with CDC.
  *
  * The window hash is `Σ cp(c_k) · (131^(w-1-k) mod modulus)` over the
  * trailing `w` code points — exact small-integer arithmetic that the
  * DuckDB oracle mirrors as an unrolled `unicode(substr(...))` sum
  * (see [[Cdc.boundarySql]]), generated from the same weights so the
  * two engines cannot drift. Characters are Unicode code points
  * (surrogate pairs count once), matching DuckDB's code-point
  * `substr`/`unicode`.
  *
  * Why a kernel and not a higher-order `filter(sequence(...))`:
  * per-position lambdas run interpreted per element (~len evaluations
  * per row of a non-codegen expression tree); this is ONE static call
  * per row inside whole-stage codegen — the scan is the chunker.
  */
object Cdc {

  /** Column API: `array<string>` of chunks; NULL in → NULL out,
    * empty string → empty array. Chunks concatenate back to the input.
    */
  def chunks(text: Column, window: Int, modulus: Int): Column =
    GraftSql.column(CdcChunksExpr(GraftSql.expression(text), window, modulus))

  /** `131^(w-1-k) mod modulus` for k = 0..w-1 (weight of the oldest
    * window position first). 131 has multiplicative order 16 mod 64,
    * so the weights spread over the residues a power-of-two modulus
    * can see.
    */
  def weights(window: Int, modulus: Int): Array[Long] = {
    val w = new Array[Long](window)
    var p = 1L
    var k = window - 1
    while (k >= 0) { w(k) = p; p = p * 131 % modulus; k -= 1 }
    w
  }

  /** DuckDB mirror of the boundary predicate at 1-based code-point
    * position `i` of column `payload`: the same unrolled weighted sum.
    */
  def boundarySql(payload: String, window: Int, modulus: Int): String = {
    val terms = weights(window, modulus).zipWithIndex.map { case (wt, k) =>
      s"unicode(substr($payload, i-${window - 1 - k}, 1)) * $wt"
    }
    s"(${terms.mkString(" + ")}) % $modulus = 0"
  }

  /** One-pass chunker. Static so generated code calls it directly. */
  def chunksData(t: UTF8String, window: Int, modulus: Int): GenericArrayData = {
    val s = t.toString
    val wts = weights(window, modulus)
    val cps = new Array[Long](window) // circular buffer of code points
    val out = new java.util.ArrayList[UTF8String]()
    var nCp = 0       // code points consumed
    var start = 0     // java-char index of current chunk start
    var i = 0         // java-char index
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      cps(nCp % window) = cp.toLong
      nCp += 1
      if (nCp >= window) {
        // weighted sum over the trailing window, oldest position first
        var h = 0L
        var k = 0
        while (k < window) {
          h += cps((nCp + k) % window) * wts(k)
          k += 1
        }
        if (h % modulus == 0 && i > start) {
          out.add(UTF8String.fromString(s.substring(start, i)))
          start = i
        }
      }
    }
    if (start < s.length) out.add(UTF8String.fromString(s.substring(start)))
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}

/** One-pass content-defined chunking of a document into
  * `array<string>` — see [[Cdc]].
  */
case class CdcChunksExpr(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType =>
      if (window >= 1 && modulus >= 2) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires window >= 1 and modulus >= 2")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Cdc.chunksData(input.asInstanceOf[UTF8String], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.Cdc.chunksData($t, $window, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
