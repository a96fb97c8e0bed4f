package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, CollationFactory, CollationSupport, GenericArrayData}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, BinaryType => _, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text kernels for the hot tokenize→n-gram path.
  *
  * Why these exist: the Column-level formulation
  * `transform(sequence(...), i -> concat_ws(" ", element_at(w, i), ...))`
  * re-evaluates the WHOLE `w = split(lower(text))` subtree once per
  * produced element — higher-order lambdas are interpreted (never
  * codegen'd) and interpreted eval does no common-subexpression
  * caching, so a 250-token document pays ~250 full split+lower passes
  * per row. Thread dumps of multi-second per-pass stalls at sf0.1
  * showed every executor inside `StringSplit.nullSafeEval` under
  * `ConcatWs.eval`. These kernels split ONCE per row and assemble the
  * n-grams from the token array — O(len) instead of O(len²) — and the
  * single static call stays inside whole-stage codegen.
  *
  * Exactness: lowercase goes through the same
  * `CollationSupport.Lower.exec` dispatch (collation id + the
  * `spark.sql.icu.caseMappings.enabled` conf) as the built-in
  * `lower()`, and tokenization through
  * the same `UTF8String.split(pattern, -1)` as `split(text, '\\s+')` —
  * so outputs are bit-identical to the Column formulation they
  * replace (the DuckDB oracle mirrors in TextSql are unchanged).
  */
object TextKernels {

  private val WS = UTF8String.fromString("\\s+")
  private val SPACE = UTF8String.fromString(" ")

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  private def toks(text: UTF8String, useICU: Boolean): Array[UTF8String] =
    CollationSupport.Lower.exec(text,
      CollationFactory.UTF8_BINARY_COLLATION_ID, useICU).split(WS, -1)

  /** Overlapping n-grams over whitespace tokens of `lower(text)`;
    * empty array when under n tokens or text is NULL (matching
    * `CASE WHEN len >= n THEN ... ELSE [] END`).
    */
  def shingles(text: UTF8String, n: Int, useICU: Boolean): ArrayData = {
    if (text == null) return EMPTY
    val w = toks(text, useICU)
    val m = w.length - n + 1
    if (m <= 0) return EMPTY
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(SPACE, w.slice(i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping n-token segments (no partial tail); empty array
    * when under n tokens or text is NULL.
    */
  def segments(text: UTF8String, n: Int, useICU: Boolean): ArrayData = {
    if (text == null) return EMPTY
    val w = toks(text, useICU)
    val m = w.length / n
    if (m <= 0) return EMPTY
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(SPACE, w.slice(i * n, i * n + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def shinglesCol(text: Column, n: Int): Column =
    GraftSql.column(ShinglesExpr(GraftSql.expression(text), n))

  def segmentsCol(text: Column, n: Int): Column =
    GraftSql.column(SegmentsExpr(GraftSql.expression(text), n))
}

/** Base for the two kernels: STRING → non-null ARRAY<STRING>, NULL in →
  * empty array out (the semantics of the Column formulation replaced).
  */
abstract class TextKernelExpr extends UnaryExpression {

  def n: Int

  /** The static kernel invoked — must match `kernelName`. */
  def kernel(text: UTF8String): ArrayData
  def kernelName: String

  /** Same lazily-read conf dispatch as the built-in `Lower` (it chooses
    * ICU vs JVM case mappings from `spark.sql.icu.caseMappings.enabled`)
    * — hardcoding one branch would silently diverge from `lower()` in
    * the same query when the conf is flipped.
    */
  protected lazy val useICU: Boolean =
    SQLConf.get.getConf(SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: SQL callers write graft_shingles(NULL, 2) like any
    // builtin — a null input is the null-text case (empty array out)
    case StringType | org.apache.spark.sql.types.NullType if n >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    kernel(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    if (child.dataType == org.apache.spark.sql.types.NullType) {
      // a NULL-typed child has no usable generated value — emit the
      // null-text case directly
      val call = s"graft.functions.TextKernels.$kernelName(null, $n, $useICU)"
      ev.copy(
        code = code"""
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call;
          """,
        isNull = FalseLiteral)
    } else {
      val c = child.genCode(ctx)
      val call = s"graft.functions.TextKernels.$kernelName(" +
        s"${c.isNull} ? null : ${c.value}, $n, $useICU)"
      ev.copy(
        code = code"""
          ${c.code}
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $call;
          """,
        isNull = FalseLiteral)
    }
  }
}

case class ShinglesExpr(child: Expression, n: Int) extends TextKernelExpr {
  override def prettyName: String = "graft_shingles"
  override def kernelName: String = "shingles"
  override def kernel(text: UTF8String): ArrayData =
    TextKernels.shingles(text, n, useICU)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SegmentsExpr(child: Expression, n: Int) extends TextKernelExpr {
  override def prettyName: String = "graft_segments"
  override def kernelName: String = "segments"
  override def kernel(text: UTF8String): ArrayData =
    TextKernels.segments(text, n, useICU)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
