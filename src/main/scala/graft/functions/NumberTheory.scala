package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static integer kernels for [[GcdExpr]]/[[LcmExpr]] — top-level object
  * so whole-stage codegen can emit one static call
  * (`graft.functions.NumberTheory.gcd(a, b)`).
  *
  * Semantics mirror DataFusion 38's `gcd`/`lcm` (reachable in the
  * reference via ctx.sql, SURVEY.md §2.2 math family; Spark has no
  * built-in): result is non-negative, `gcd(0,0) = 0`, `lcm(x,0) = 0`,
  * and overflow (|Long.Min| or an lcm past 2^63) raises rather than
  * wrapping silently.
  */
object NumberTheory {

  def gcd(a: Long, b: Long): Long = {
    var x = a
    var y = b
    while (y != 0L) { val t = x % y; x = y; y = t }
    // |Long.MinValue| is unrepresentable → absExact raises (DF38 errors
    // on the same input rather than returning a negative gcd)
    Math.absExact(x)
  }

  def lcm(a: Long, b: Long): Long =
    if (a == 0L || b == 0L) 0L
    else Math.absExact(Math.multiplyExact(a / gcd(a, b), b))

  /** Column-API entry points (DotProduct.dot convention). */
  def gcdCol(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(GcdExpr(
      org.apache.spark.sql.GraftSql.expression(a),
      org.apache.spark.sql.GraftSql.expression(b)))

  def lcmCol(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(LcmExpr(
      org.apache.spark.sql.GraftSql.expression(a),
      org.apache.spark.sql.GraftSql.expression(b)))
}

/** Shared shape of the two binary integer kernels: BIGINT in/out,
  * null-safe, codegen via one static call. `ImplicitCastInputTypes`
  * lets the analyzer widen narrower integer arguments (INT/SMALLINT
  * literals in SQL) to BIGINT — matching DataFusion 38's gcd/lcm, which
  * accept any integer type via coercion.
  */
abstract class NumberTheoryExpr extends BinaryExpression with ImplicitCastInputTypes {

  /** Static method on [[NumberTheory]] — must match the kernel name. */
  protected def kernelName: String

  override def dataType: DataType = LongType

  // inferred result type: AbstractDataType is private[sql], unnameable here
  override def inputTypes = Seq(LongType, LongType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NumberTheory.$kernelName($a, $b)")
}

/** Greatest common divisor of two BIGINTs (DF38 `gcd`). */
case class GcdExpr(left: Expression, right: Expression) extends NumberTheoryExpr {
  override def prettyName: String = "graft_gcd"
  override protected def kernelName: String = "gcd"
  override def nullSafeEval(a: Any, b: Any): Any =
    NumberTheory.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GcdExpr =
    copy(left = newLeft, right = newRight)
}

/** Least common multiple of two BIGINTs (DF38 `lcm`). */
case class LcmExpr(left: Expression, right: Expression) extends NumberTheoryExpr {
  override def prettyName: String = "graft_lcm"
  override protected def kernelName: String = "lcm"
  override def nullSafeEval(a: Any, b: Any): Any =
    NumberTheory.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcmExpr =
    copy(left = newLeft, right = newRight)
}
