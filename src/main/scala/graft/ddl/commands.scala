package graft.ddl

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.DataType

import graft.functions.ModuleRegistry

/** Session-global catalog of engine-created functions: name → (module path,
  * language), needed so `DROP FUNCTION` can release the module refcount —
  * the teardown half of the reference's lifecycle (lib.rs:347-372).
  */
object EngineFunctionCatalog {
  private val fns = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  def put(name: String, modulePath: String, lang: String): Unit =
    fns.put(name.toLowerCase, (modulePath, lang))
  def get(name: String): Option[(String, String)] =
    Option(fns.get(name.toLowerCase))
  def remove(name: String): Option[(String, String)] =
    Option(fns.remove(name.toLowerCase))
  def contains(name: String): Boolean = fns.containsKey(name.toLowerCase)
}

/** `CREATE FUNCTION name(argTypes) RETURNS type LANGUAGE lang AS
  * 'module!fn'` — the rebuild of `WasmFunctionFactory::create`
  * (wasmedge_factory/src/lib.rs:31-65): validate the locator, acquire the
  * (cached) module, wrap the named function with declared signature and
  * volatile semantics, and register it in the session function registry.
  */
case class CreateEngineFunctionCommand(
    name: String,
    argTypes: Seq[DataType],
    returnType: DataType,
    language: String,
    locator: String,
    orReplace: Boolean)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (modulePath, methodName) = ModuleRegistry.parseLocator(locator)
    val module = ModuleRegistry.acquire(modulePath)
    val fn = module.functions.getOrElse(methodName, {
      ModuleRegistry.release(modulePath)
      throw new IllegalArgumentException(
        s"function '$methodName' not found in module '$modulePath'")
    })
    // release the ref held by a previous definition of the same name
    EngineFunctionCatalog.remove(name).foreach { case (prev, _) =>
      ModuleRegistry.release(ModuleRegistry.parseLocator(prev)._1)
    }
    val langTag = language.toLowerCase.capitalize
    val arity = argTypes.length
    val builder = (children: Seq[Expression]) => {
      if (children.length != arity)
        throw new IllegalArgumentException(
          s"function $name expects $arity arguments, got ${children.length}")
      // coerce inputs to the declared signature — the reference registers
      // Signature::exact so DataFusion casts arguments to the declared
      // types before invoke (udf.rs:54; DDL types lib.rs:39-46)
      // (children may still be unresolved here; identity casts are later
      // removed by Catalyst's SimplifyCasts)
      val coerced = children.zip(argTypes).map { case (c, dt) => Cast(c, dt) }
      EngineFunctionInvoke(coerced, name, langTag, fn, returnType)
    }
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name.toLowerCase),
      new ExpressionInfo("graft.ddl.EngineFunctionInvoke", name),
      builder)
    EngineFunctionCatalog.put(name, locator, language)
    Nil
  }
}

/** `DROP FUNCTION name` for engine-created functions: deregister + release
  * the module refcount (reference: lib.rs:347-357, eviction lib.rs:359-372).
  */
case class DropEngineFunctionCommand(name: String, ifExists: Boolean)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    EngineFunctionCatalog.remove(name) match {
      case Some((locator, _)) =>
        spark.sessionState.functionRegistry
          .dropFunction(FunctionIdentifier(name.toLowerCase))
        ModuleRegistry.release(ModuleRegistry.parseLocator(locator)._1)
      case None if ifExists => // no-op
      case None =>
        throw new IllegalArgumentException(s"engine function not found: $name")
    }
    Nil
  }
}
