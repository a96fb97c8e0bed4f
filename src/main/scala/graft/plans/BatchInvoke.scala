package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import graft.ddl.EngineFunctionInvoke

/** Batch-at-a-time execution of engine UDFs — the faithful mapping of the
  * reference's `WasmFunctionWrapper::invoke` granularity
  * (wasmedge_factory/src/udf.rs:82-115): per input batch, pack whole
  * argument COLUMNS, make ONE call into the guest function, take the
  * result column. The row-wise `CodegenFallback` eval on
  * [[graft.ddl.EngineFunctionInvoke]] remains the fallback for
  * non-projection call sites (e.g. a UDF inside a WHERE clause), with
  * identical per-row semantics.
  *
  * Planning: [[BatchInvokeStrategy]] intercepts any `Project` whose list
  * contains an engine UDF and plans [[BatchProjectExec]] instead of the
  * stock projection. The strategy runs only at physical planning, so
  * every Catalyst optimization (pushdown, pruning, collapse) has already
  * applied to the standard `Project` node — nothing is hidden from the
  * optimizer.
  */
object BatchInvokeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Project(list, child)
        if list.exists(_.exists(_.isInstanceOf[EngineFunctionInvoke])) =>
      BatchProjectExec(list, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Projection that evaluates each engine-UDF occurrence once per
  * `batchSize`-row batch (8192 = the reference engine's batch unit).
  *
  * Execution per batch mirrors udf.rs:82-115 stage by stage: buffer the
  * batch (the reference copies each batch across the host↔guest IPC
  * boundary, README.md:76 — buffering is the cost of batch semantics on
  * a row-oriented engine too), evaluate argument expressions into
  * columns, ONE `applyBatch` call per UDF occurrence (nested calls run
  * innermost-first, each its own batch call, matching DataFusion's
  * bottom-up projection eval), then a codegen'd `UnsafeProjection`
  * produces the output rows with UDF results read from appended slots.
  */
case class BatchProjectExec(projectList: Seq[NamedExpression], child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = projectList.map(_.toAttribute)
  // pure projection: row set and order are unchanged
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  private val batchSize = 8192

  /** One evaluation round: UDF occurrences whose arguments are already
    * invoke-free (bound to the current input schema), plus the slot
    * attributes their results occupy.
    */
  private case class Round(
      invokes: Seq[EngineFunctionInvoke],
      slotAttrs: Seq[Attribute])

  /** Symbolic plan of the batch evaluation, computed once: peel
    * innermost UDF occurrences round by round, rebinding the remaining
    * expressions against the input schema extended with result slots,
    * until the projection is invoke-free.
    */
  private def planRounds(): (Seq[Round], Seq[Expression], Seq[Attribute]) = {
    val rounds = ArrayBuffer[Round]()
    var attrs: Seq[Attribute] = child.output
    var exprs: Seq[Expression] = projectList
    def containsInvoke(e: Expression): Boolean =
      e.exists(_.isInstanceOf[EngineFunctionInvoke])
    while (exprs.exists(containsInvoke)) {
      // innermost occurrences, deduped by reference identity: volatile
      // UDFs must not be merged by structural equality (udf.rs:54)
      val slotOf = new java.util.IdentityHashMap[EngineFunctionInvoke, Integer]()
      val leaves = ArrayBuffer[EngineFunctionInvoke]()
      exprs.foreach(_.foreach {
        case e: EngineFunctionInvoke
            if !e.children.exists(containsInvoke) && !slotOf.containsKey(e) =>
          slotOf.put(e, leaves.length)
          leaves += e
        case _ => ()
      })
      val bound = leaves.map(inv => inv.copy(children =
        inv.children.map(BindReferences.bindReference(_, attrs)))).toSeq
      val slotAttrs = leaves.zipWithIndex.map { case (inv, j) =>
        AttributeReference(s"_batch_slot_${rounds.length}_$j",
          inv.dataType, nullable = true)()
      }.toSeq
      def replace(e: Expression): Expression = e match {
        case inv: EngineFunctionInvoke if slotOf.containsKey(inv) =>
          slotAttrs(slotOf.get(inv))
        case other => other.mapChildren(replace)
      }
      exprs = exprs.map(replace)
      attrs = attrs ++ slotAttrs
      rounds += Round(bound, slotAttrs)
    }
    (rounds.toSeq, exprs, attrs)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val (rounds, finalExprs, finalAttrs) = planRounds()
    val size = batchSize
    child.execute().mapPartitions({ iter =>
      // codegen'd output projection, compiled once per partition
      val proj = UnsafeProjection.create(finalExprs, finalAttrs)
      iter.grouped(size).flatMap { group =>
        // buffer the batch (child iterators reuse row objects)
        var rows: Array[InternalRow] = group.iterator.map(_.copy()).toArray
        val n = rows.length
        rounds.foreach { round =>
          val results: Array[Array[Any]] = round.invokes.map { inv =>
            val argCols = inv.children.toIndexedSeq.map { c =>
              val col = new Array[Any](n)
              var i = 0
              while (i < n) {
                col(i) = EngineFunctionInvoke.fromCatalyst(c.eval(rows(i)), c.dataType)
                i += 1
              }
              col
            }
            // THE batch boundary: one guest call for the whole batch
            val out =
              try inv.fn.applyBatch(argCols, n)
              catch EngineFunctionInvoke.errorMapping(inv.langTag)
            val conv = new Array[Any](n)
            var i = 0
            while (i < n) {
              conv(i) = EngineFunctionInvoke.toCatalyst(out(i), inv.dataType)
              i += 1
            }
            conv
          }.toArray
          rows = rows.zipWithIndex.map { case (r, i) =>
            val extra = InternalRow.fromSeq(results.indices.map(j => results(j)(i)))
            new JoinedRow(r, extra): InternalRow
          }
        }
        rows.iterator.map(proj)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
