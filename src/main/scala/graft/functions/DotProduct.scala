package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: sequential-fold dot product of two
  * `array<double>` columns.
  *
  * The hot loop of every similarity operator (SURVEY.md §7 M5). A
  * lambda-based formulation (`aggregate(zip_with(a, b, _ * _), ...)`)
  * is interpreted per element (HigherOrderFunction is CodegenFallback);
  * this expression participates in whole-stage codegen, emitting a tight
  * primitive `double` loop — ~100× less per-element overhead, which is
  * the difference between a scan-bound and a CPU-bound ANN pass at
  * 100 TB.
  *
  * The fold order (s += x(i)*y(i), left to right, from +0.0) is exactly
  * the order of the lambda formulation and of DuckDB's
  * `list_dot_product`, so results stay bit-identical across engines.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  // reject anything but array<double> at ANALYSIS time — an uncast
  // array<float> would otherwise read garbage through getDouble
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>) arguments, " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  // a null ELEMENT nulls the whole product — the lambda formulation's
  // semantics (x*NULL = NULL → sum NULL). The check is emitted only when
  // the input type admits null elements, so the common non-null case
  // keeps the tight primitive loop. Falls back to true on a mistyped
  // tree: `nullable` can be consulted before checkInputDataTypes has
  // surfaced the friendly error, and must not throw there.
  private def elementsNullable: Boolean =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
      case _ => true
    }

  override def nullable: Boolean = super.nullable || elementsNullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val nullCheck = if (elementsNullable)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point: `dot(a, b)` over `array<double>`. */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(DotProduct(GraftSql.expression(a), GraftSql.expression(b)))
}
