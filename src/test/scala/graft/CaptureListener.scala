package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime-metric capture listener shared by the guard specs
  * (BroadcastGuardSpec, ShuffleVolumeSpec).
  *
  * Registered via the STATIC conf `spark.sql.queryExecutionListeners`
  * rather than `listenerManager.register`: the streaming entries run
  * their micro-batches on `spark.newSession()` interiors (and the
  * stream engine's own session clones), whose fresh
  * ExecutionListenerManagers never see a listener registered on the
  * spec session — the round-10 registration shape silently exempted
  * every foreachBatch interior job from the broadcast audit. A
  * conf-loaded listener class is instantiated by EVERY descendant
  * session and reports into the shared global queues here, so interior
  * actions are first-class audit subjects. (The positive control in
  * BroadcastGuardSpec proves a corpus-sized broadcast inside a
  * foreachBatch on a newSession is actually caught.)
  */
class CaptureListener extends QueryExecutionListener {
  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    CaptureListener.executions.incrementAndGet()
    qe.executedPlan.collectWithSubqueries {
      case b: BroadcastExchangeExec =>
        val tabs = b.collectWithSubqueries { case f: FileSourceScanExec =>
          f.relation.location.rootPaths
            .map(_.getName.stripSuffix(".parquet")).toSeq
        }.flatten.toSet
        CaptureListener.broadcasts.add(
          CaptureListener.Cap(b.metrics("numOutputRows").value, tabs))
    }
    val shufs = qe.executedPlan.collectWithSubqueries {
      case s: ShuffleExchangeExec =>
        (s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L),
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L))
    }
    if (shufs.nonEmpty)
      CaptureListener.shuffles.add(CaptureListener.Shuf(
        shufs.size, shufs.map(_._1).sum, shufs.map(_._2).sum))
    ()
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = ()
}

object CaptureListener {
  /** One observed broadcast build: runtime output rows + the fixture
    * tables its subtree scanned (empty when lineage was cut by a
    * checkpoint). */
  case class Cap(rows: Long, tables: Set[String])

  /** One observed execution's shuffle totals: exchange node count,
    * records written, bytes written. */
  case class Shuf(exchanges: Int, records: Long, bytes: Long)

  val broadcasts = new ConcurrentLinkedQueue[Cap]()
  val shuffles = new ConcurrentLinkedQueue[Shuf]()
  val executions = new AtomicLong(0L)

  def clear(): Unit = {
    broadcasts.clear(); shuffles.clear(); executions.set(0L)
  }
}
