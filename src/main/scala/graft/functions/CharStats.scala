package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-level statistics of a document — the
  * exact-integer formulation of the character-diversity /
  * gibberish-detection quality signals (ccnet/Gopher-style filters
  * flag documents whose character distribution is too concentrated or
  * too punctuation-heavy). Entropy itself is `-Σ p ln p` — float, so
  * not cross-engine hashable; the kernel instead emits the exact
  * integer sufficient statistics: per-class counts, the distinct
  * character count, and the collision count `Σ c·(c−1)` (the
  * unnormalized Simpson index — a monotone proxy for 2-Rényi entropy,
  * and exactly comparable across engines).
  *
  * Why a kernel and not `explode(split(text, ''))`: exploding 100 TB
  * of text into one row PER CHARACTER multiplies the shuffle-input
  * row count by ~5000× before a (doc, char) aggregate. This is one
  * static call per row inside whole-stage codegen — the scan IS the
  * histogram pass, zero shuffle.
  *
  * Character = Unicode code point (surrogate pairs count once),
  * matching DuckDB's code-point `length`/`substr`. Classes are
  * explicit ASCII ranges mirrored by the oracle's regexes:
  * alpha `[A-Za-z]`, digit `[0-9]`, whitespace `\s`
  * (`isWhitespace`), everything else `other`.
  */
object CharStats {

  /** Column API: `array<long>` of [n_chars, n_alpha, n_digit, n_ws,
    * n_other, n_distinct, collision]; NULL in → NULL out.
    */
  def stats(text: Column): Column =
    GraftSql.column(CharStatsExpr(GraftSql.expression(text)))

  /** The 7 statistics in one code-point pass. Static so generated
    * code calls it directly.
    */
  def statsData(t: UTF8String): GenericArrayData = {
    val s = t.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var nChars = 0L; var alpha = 0L; var digit = 0L; var ws = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      nChars += 1
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) alpha += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      else if (Character.isWhitespace(cp)) ws += 1
      counts.merge(cp, 1L, _ + _)
    }
    var collision = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); collision += c * (c - 1) }
    new GenericArrayData(Array(nChars, alpha, digit, ws,
      nChars - alpha - digit - ws, counts.size.toLong, collision))
  }
}

/** One-pass per-document character statistics: `array<long>` of
  * [n_chars, n_alpha, n_digit, n_ws, n_other, n_distinct, collision].
  */
case class CharStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharStats.statsData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.CharStats.statsData($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
