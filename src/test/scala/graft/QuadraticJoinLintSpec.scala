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
    * each with the reason the lint cannot see. Add a name here ONLY
    * with a comment proving the join is bounded in a way the
    * heuristic misses. (The alias-resolving sharpening of this lint
    * caught p12's label-only all-pairs blocking — the p261 bug shape,
    * shipped in round 3, latent for 11 rounds — which was FIXED, not
    * allowlisted: it now blocks on (label, SRP bucket) with the
    * member cap.) */
  private val allowlist: Map[String, String] = Map(
    // probe side is the ≤20-row literal panel `vec_id < 20`: the join
    // is panel × label-block (corpus-LINEAR, the IVF probe shape);
    // boundedness-by-selective-filter is exactly what the heuristic
    // cannot cost
    "p11_knn_ivf" -> "probe side literal-bounded (vec_id < 20 panel)")

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

    // RENAMING the fixture key must not evade the lint: the alias chain
    // resolves back to `label`
    val renamed = emb.select(col("vec_id"), col("label").as("grp"))
    val evasion = renamed
      .join(renamed.withColumnRenamed("vec_id", "vec_id2"), "grp")
      .where(col("vec_id") < col("vec_id2"))
    val evHits = QuadraticJoinLint.lint(evasion.queryExecution.optimizedPlan)
    assert(evHits.nonEmpty, "rename evasion must still trip the lint")
    assert(evHits.head.keys == Seq("label=label"))
  }
}
