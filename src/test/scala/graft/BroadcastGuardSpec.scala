package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.GraftListenerFlush
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tables

/** The broadcast guard: no hinted `broadcast()` build side may scale
  * with the corpus. The p216 lesson (round 9) generalized so the bug
  * class cannot recur at any of the repo's broadcast sites:
  *
  *  1. every declared entry runs with ONLY hinted broadcasts physical
  *     (`autoBroadcastJoinThreshold = -1`, AQE off — Spark's own
  *     size-based broadcasts are adaptive by definition and need no
  *     audit), and a QueryExecutionListener captures the runtime
  *     `numOutputRows` of every BroadcastExchangeExec — including the
  *     ones inside eager `localCheckpoint` jobs, which a final-plan
  *     walk would miss;
  *  2. entries whose captured broadcasts touch the doc/embedding
  *     corpora (or have lineage broken by a checkpoint) re-run on a
  *     DOUBLED corpus fixture, and the max broadcast build size must
  *     not grow with it — panels, sketches, vocab and metadata tables
  *     are all corpus-size-invariant (duplicated content adds no new
  *     groups/vocab/quantiles), so growth ⇒ a corpus-sized build side
  *     that OOMs the driver at 100 TB.
  *
  * This measures the 100 TB invariant directly instead of pattern-
  * matching plan shapes: the round-9 p216 bug (a corpus-wide norm
  * table broadcast where only panel members could match) was an
  * AGGREGATE over a full scan — a "no full-table scan under a
  * broadcast" check would have passed it; a 500→1000-row build under
  * corpus×2 fails loudly.
  */
class BroadcastGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private val corpusTables = Set("documents", "embeddings")
  /** Broadcasts below this are metadata noise (cut points, panels of
    * constants, 1-row aggregates) — ignored by the growth audit. */
  private val MinAuditRows = 64L

  private case class Cap(rows: Long, tables: Set[String])
  private val captured = new ConcurrentLinkedQueue[Cap]()

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      qe.executedPlan.collectWithSubqueries {
        case b: BroadcastExchangeExec =>
          val tabs = b.collectWithSubqueries { case f: FileSourceScanExec =>
            f.relation.location.rootPaths
              .map(_.getName.stripSuffix(".parquet")).toSeq
          }.flatten.toSet
          captured.add(Cap(b.metrics("numOutputRows").value, tabs))
      }
      ()
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("broadcast-guard")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.listenerManager.register(listener)
    s
  }

  override def afterAll(): Unit = spark.stop()

  /** Run one entry and return every hinted-broadcast build observed. */
  private def audit(name: String, dir: String): Seq[Cap] = {
    captured.clear()
    SparkEntry.queries(name)(spark, dir).collect()
    GraftListenerFlush.flush(spark.sparkContext)
    captured.asScala.toList
  }

  /** sf0.001 with documents+embeddings doubled (ids shifted past the
    * originals), everything else byte-copied. Duplicate CONTENT on
    * purpose: dedup groups, vocab, quantile cuts, panels and sketches
    * all stay fixed, so any broadcast that grows is corpus-sized.
    */
  private lazy val doubledDir: String = {
    val out = Files.createTempDirectory("graft_dbl_corpus").toString
    val shift = 1000000000L
    Tables.names.foreach { n =>
      if (corpusTables(n)) {
        val df = spark.read.parquet(s"$sfDir/$n.parquet")
        val id = if (n == "documents") "doc_id" else "vec_id"
        df.unionAll(df.withColumn(id, col(id) + shift))
          .coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
      } else {
        Files.copy(Paths.get(s"$sfDir/$n.parquet"),
          Paths.get(s"$out/$n.parquet"), StandardCopyOption.REPLACE_EXISTING)
      }
    }
    out
  }

  test("p216 broadcast build sides are panel-bounded, never corpus-sized") {
    val caps = audit("p216_embedding_outliers", sfDir)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.count()
    val panel = emb.withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("vec_id"))))
      .where(col("rn") <= 32).count()
    assert(caps.nonEmpty, "expected hinted broadcasts in p216")
    // every build side is the id/norm panel (== panel rows), the panel
    // coordinate table (panel × 64 dims), or smaller metadata — the
    // round-9 bug (corpus-sized norm broadcast) cannot reappear
    caps.foreach { c =>
      assert(c.rows == panel || c.rows == panel * 64 || c.rows < panel,
        s"broadcast build rows ${c.rows} is neither panel ($panel), " +
          s"panel coords (${panel * 64}), nor sub-panel metadata " +
          s"(corpus=$corpus)")
    }
    assert(caps.exists(_.rows == panel),
      "expected the panel-bounded norm broadcast")
  }

  test("no hinted broadcast scales with a doubled doc/embedding corpus") {
    val entries = SparkEntry.queries.keys.toSeq.sorted
    val base = entries.map { n =>
      n -> (try audit(n, sfDir) catch {
        case e: Exception => fail(s"$n failed under the audit session: $e")
      })
    }.toMap
    // candidates: any sizeable build that scans the corpora, or whose
    // lineage a checkpoint broke (empty scan set — can't prove it is
    // NOT corpus-derived, so measure it)
    val candidates = entries.filter { n =>
      base(n).exists(c => c.rows >= MinAuditRows &&
        (c.tables.isEmpty || c.tables.exists(corpusTables)))
    }
    info(s"${entries.size} entries audited; " +
      s"${candidates.size} corpus-broadcast candidates re-run at 2x")
    val offenders = candidates.flatMap { n =>
      val m1 = base(n).map(_.rows).max
      val m2 = audit(n, doubledDir) match {
        case Nil => 0L
        case caps => caps.map(_.rows).max
      }
      // corpus-size-invariant builds stay flat; 1.5x + slack tolerates
      // df-threshold jitter without admitting a linear term
      if (m2 > m1 * 3 / 2 + MinAuditRows)
        Some(s"$n: max broadcast build $m1 -> $m2 rows under corpus x2")
      else None
    }
    assert(offenders.isEmpty,
      "corpus-scaling broadcast build sides:\n" + offenders.mkString("\n"))
  }
}
