package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tables

/** Standing sweep for the r11 p261 bug class: a row-level self-join keyed
  * ONLY on O(1)-cardinality fixture columns with no cap/panel on either
  * side — O(corpus²/|blocks|), invisible at sf0.01, fatal at 100 TB.
  * See [[QuadraticJoinLint]] for the rule. The sweep lints the OPTIMIZED
  * logical plan of every declared entry; the negative test proves the
  * exact pre-fix p261 shape trips it.
  */
class QuadraticJoinLintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  /** Entries allowed to keep a both-sides-unbounded low-card-key join,
    * each with the reason the lint cannot see. EMPTY at pin time
    * (round 14): every declared entry passes the rule outright. Add a
    * name here ONLY with a comment proving the join is metadata-sized
    * in a way the boundedness heuristic misses. */
  private val allowlist: Map[String, String] = Map.empty

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("quadratic-join-lint")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("no declared entry joins unbounded row-level inputs on " +
    "O(1)-cardinality fixture keys alone") {
    val flagged = QuadraticJoinLint.sweep(spark, sfDir,
      SparkEntry.queries.keys.toSeq.sorted)
    val unexplained = flagged.view.filterKeys(!allowlist.contains(_)).toMap
    assert(unexplained.isEmpty,
      s"quadratic-join lint flagged: ${unexplained.mkString("; ")} — " +
        "block the pair generation on a key whose cardinality grows with " +
        "the corpus (or cap block membership) instead of allowlisting")
    // an allowlist entry that no longer trips is stale — prune it
    val stale = allowlist.keySet -- flagged.keySet
    assert(stale.isEmpty, s"stale allowlist entries: $stale")
  }

  test("the pre-fix p261 shape (label-only self-join, no cap) trips the " +
    "lint; the fixed (label, bucket) blocking passes") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
    // EXACTLY the r11 bug: all pairs within each of the O(1) label blocks
    val preFix = emb.join(emb.withColumnRenamed("vec_id", "vec_id2"), "label")
      .where(col("vec_id") < col("vec_id2"))
    val hits = QuadraticJoinLint.lint(preFix.queryExecution.optimizedPlan)
    assert(hits.nonEmpty, "lint must flag the pre-fix p261 shape")
    assert(hits.head.keys == Seq("label=label"))

    // the r12 fix shape: a derived bucket key joins beside label — the
    // key set is no longer all-low-card, so the blocks scale with data
    val bucketed = emb.withColumn("bucket", pmod(col("vec_id"), lit(256)))
    val postFix = bucketed.join(
      bucketed.withColumnRenamed("vec_id", "vec_id2"),
      Seq("label", "bucket"))
      .where(col("vec_id") < col("vec_id2"))
    assert(QuadraticJoinLint.lint(postFix.queryExecution.optimizedPlan).isEmpty)

    // a bounded side makes a label-only join corpus-linear: not flagged
    val census = emb.groupBy("label").agg(count("*").as("n"))
    assert(QuadraticJoinLint.lint(
      emb.join(census, "label").queryExecution.optimizedPlan).isEmpty)

    // semi-joins emit at most the probe side: not flagged
    assert(QuadraticJoinLint.lint(
      emb.join(emb, Seq("label"), "left_semi").queryExecution.optimizedPlan)
      .isEmpty)
  }
}
