package graft.ddl

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{FunctionError, ScalarBatchFunction}

/** Catalyst expression invoking an engine-registered scalar function —
  * the Spark analog of the reference's `WasmFunctionWrapper::invoke`
  * (wasmedge_factory/src/udf.rs:82-115): declared return type, fixed arity,
  * always volatile (`Volatility::Volatile`, udf.rs:54 → `deterministic =
  * false` here, so Catalyst never constant-folds or reorders the call),
  * guest errors surfaced as "[<Lang> Invocation] msg" and traps as
  * "[<Lang> Invocation Panic] msg" (udf.rs:95,111-113).
  */
case class EngineFunctionInvoke(
    children: Seq[Expression],
    functionName: String,
    langTag: String,
    fn: ScalarBatchFunction,
    dataType: DataType)
  extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = functionName

  override def eval(input: InternalRow): Any = {
    val args = children.map(c =>
      EngineFunctionInvoke.fromCatalyst(c.eval(input), c.dataType))
    val out =
      try fn(args)
      catch EngineFunctionInvoke.errorMapping(langTag)
    EngineFunctionInvoke.toCatalyst(out, dataType)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object EngineFunctionInvoke {

  /** Error mapping of the reference's invoke (udf.rs:95,111-113): a guest
    * [[FunctionError]] → "[Lang Invocation] msg", any other throw →
    * "[Lang Invocation Panic] msg". Shared by the row-wise eval above and
    * the batch operator ([[graft.plans.BatchProjectExec]]).
    */
  def errorMapping(langTag: String): PartialFunction[Throwable, Nothing] = {
    case FunctionError(msg) =>
      throw new SparkException(s"[$langTag Invocation] $msg")
    case e: SparkException => throw e
    case scala.util.control.NonFatal(e) =>
      throw new SparkException(s"[$langTag Invocation Panic] ${e.getMessage}")
  }

  def fromCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: UTF8String, StringType) => s.toString
    case (a: ArrayData, ArrayType(et, _)) =>
      a.toObjectArray(et).map(fromCatalyst(_, et)).toSeq
    case (other, _) => other
  }

  def toCatalyst(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (seq: Seq[_], ArrayType(et, _)) =>
      ArrayData.toArrayData(seq.map(toCatalyst(_, et)).toArray)
    case (m: MapData, _) => m
    case (other, _) => other
  }
}
