package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** DataFusion's array-introspection scalars Spark lacks natively
  * (reference surface: DF38 `array_ndims` / `array_dims`; Spark ships
  * `size`/`cardinality` but nothing that sees NESTING). Both are
  * type-directed:
  *
  *  - `graft_array_ndims(a)` — the nesting depth of the array TYPE
  *    (array<int> → 1, array<array<int>> → 2, …): a compile-time
  *    constant, so the expression is foldable and disappears into a
  *    literal during optimization — zero runtime cost.
  *  - `graft_array_dims(a)` — the extent along each nesting level
  *    ([len, len of first child, …], the DF/Postgres convention of
  *    descending first children), which IS data-dependent.
  */
object ArrayIntrospect {

  def ndims(c: Column): Column =
    GraftSql.column(ArrayNdimsExpr(GraftSql.expression(c)))

  def dims(c: Column): Column =
    GraftSql.column(ArrayDimsExpr(GraftSql.expression(c)))

  private[functions] def depthOf(t: DataType): Int = t match {
    case ArrayType(e, _) => 1 + depthOf(e)
    case _ => 0
  }
}

/** Nesting depth of the child's array type — a foldable constant, so
  * ConstantFolding replaces it with a literal before codegen. */
case class ArrayNdimsExpr(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def prettyName: String = "graft_array_ndims"

  private lazy val depth = ArrayIntrospect.depthOf(child.dataType)

  override def eval(input: InternalRow): Any = depth

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-level extents, descending first children (DF/Postgres style). */
case class ArrayDimsExpr(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_dims"

  override def nullSafeEval(input: Any): Any = {
    val out = Array.newBuilder[Int]
    var cur: Any = input
    var t: DataType = child.dataType
    var go = true
    while (go) (t, cur) match {
      case (ArrayType(e, _), a: ArrayData) =>
        out += a.numElements()
        if (a.numElements() == 0) go = false
        else { cur = a.get(0, e); t = e; go = e.isInstanceOf[ArrayType] && cur != null }
      case _ => go = false
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
