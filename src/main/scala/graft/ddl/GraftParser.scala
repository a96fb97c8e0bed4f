package graft.ddl

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating SQL parser that intercepts the engine's function DDL —
  * the Spark analog of registering a `FunctionFactory` on the session
  * (reference: wasmedge_factory/examples/wasaffi.rs:10; DDL shape
  * README.md:84-88). Everything else passes through to Spark's parser,
  * the way the reference inherits the whole DataFusion dialect.
  *
  *   CREATE [OR REPLACE] FUNCTION name(TYPE, …) RETURNS TYPE
  *     LANGUAGE lang AS 'module!fn'
  *   DROP FUNCTION [IF EXISTS] name
  *
  * DROP FUNCTION only binds to names created by this DDL; other drops
  * fall through to Spark so catalog UDFs keep their semantics.
  */
class GraftParser(delegate: ParserInterface) extends ParserInterface {

  private val createRe =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?FUNCTION\s+([A-Za-z_][\w]*)\s*\(([^)]*)\)\s+RETURNS\s+(.+?)\s+LANGUAGE\s+([A-Za-z_][\w]*)\s+AS\s+'([^']*)'\s*;?\s*$""".r
  private val dropRe =
    """(?is)^\s*DROP\s+FUNCTION\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w]*)\s*;?\s*$""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case createRe(orReplace, name, argList, retType, lang, locator) =>
      val argTypes = argList.split(",").map(_.trim).filter(_.nonEmpty)
        .map(parseArgType).toSeq
      CreateEngineFunctionCommand(
        name, argTypes, delegate.parseDataType(retType), lang, locator,
        orReplace = orReplace != null)
    case dropRe(ifExists, name) if EngineFunctionCatalog.contains(name) =>
      DropEngineFunctionCommand(name, ifExists = ifExists != null)
    case _ => delegate.parsePlan(sqlText)
  }

  /** Arg may be `DOUBLE` or `argname DOUBLE` — the reference collects only
    * the types (wasmedge_factory/src/lib.rs:39-46). */
  private def parseArgType(arg: String): DataType = {
    val parts = arg.split("\\s+", 2)
    val typeStr = if (parts.length == 2) parts(1) else parts(0)
    delegate.parseDataType(typeStr)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
