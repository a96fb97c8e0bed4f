package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.{FunctionModule, ModuleRegistry, ScalarBatchFunction}

/** Distinct module for the lifecycle test — must not share a cache key with
  * the 'builtin' module used elsewhere in the suite. */
class LifecycleTestModule extends FunctionModule {
  override def functions: Map[String, ScalarBatchFunction] = Map(
    "pow" -> { args =>
      (args(0), args(1)) match {
        case (a: java.lang.Double, b: java.lang.Double) =>
          java.lang.Double.valueOf(math.pow(a, b))
        case _ => null
      }
    })
}

/** Non-DOUBLE functions — proves the declared-type marshalling is
  * generic (the reference's IPC layer carries the full Arrow type
  * system even though its demo only exercises Float64; SURVEY §1.1). */
class TypesTestModule extends FunctionModule {
  override def functions: Map[String, ScalarBatchFunction] = Map(
    // array<double> → double
    "vsum" -> { args =>
      args(0) match {
        case xs: Seq[_] =>
          java.lang.Double.valueOf(
            xs.map { case d: java.lang.Double => d.doubleValue; case _ => 0.0 }.sum)
        case _ => null
      }
    },
    // string → string (null-in → null-out)
    "shout" -> { args =>
      args(0) match {
        case s: String => s.toUpperCase + "!"
        case _ => null
      }
    })
}

/** Counts `applyBatch` calls — proves the engine invokes the guest once
  * per BATCH (udf.rs:82-115 granularity), not once per row. */
class BatchCountModule extends FunctionModule {
  override def functions: Map[String, ScalarBatchFunction] = Map(
    "ident" -> new ScalarBatchFunction {
      override def apply(args: Seq[Any]): Any = args(0)
      override def applyBatch(cols: IndexedSeq[Array[Any]], n: Int): Array[Any] = {
        BatchCountModule.calls.incrementAndGet()
        Array.tabulate(n)(cols(0))
      }
    })
}
object BatchCountModule {
  val calls = new java.util.concurrent.atomic.AtomicInteger()
}

/** Reference-parity golden tests — mirrors the e2e tests in
  * wasmedge_factory/src/lib.rs:174-375 and the README golden output
  * (README.md:99-108): SQL in, exact table out, exact error strings,
  * module-cache lifecycle.
  */
class EngineDdlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val engine = Engine.local(4)

  override def beforeAll(): Unit = {
    val spark = engine.spark
    import spark.implicits._
    // the reference's only table: 4 rows of DOUBLE a, b (lib.rs:179-183)
    engine.registerTable("t",
      Seq((2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (5.0, 5.1)).toDF("a", "b"))
  }

  override def afterAll(): Unit = engine.spark.stop()

  test("create function + invoke matches the reference golden output") {
    engine.sql(
      "CREATE FUNCTION f1(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'builtin!pow'")
    val rows = engine.sql("select a, b, f1(a,b) as f from t order by a").collect()
    // golden: lib.rs:199-210 / README.md:99-108
    assert(rows === Array(
      Row(2.0, 2.0, 4.0),
      Row(3.0, 3.0, 27.0),
      Row(4.0, 4.0, 256.0),
      Row(5.0, 5.1, 3670.684197150057)))
    engine.sql("DROP FUNCTION f1")
  }

  test("UDF projections run batch-at-a-time (udf.rs:82-115): one guest " +
    "call per 8192-row batch, planned as BatchProjectExec") {
    val spark = engine.spark
    spark.range(0, 10000, 1, 1) // ONE partition → ceil(10000/8192) = 2 batches
      .selectExpr("cast(id as double) as a")
      .createOrReplaceTempView("graft_batch_t")
    engine.sql(
      "CREATE FUNCTION fb(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'graft.BatchCountModule!ident'")
    val df = engine.sql("select fb(a) as v from graft_batch_t")
    assert(df.queryExecution.executedPlan.toString.contains("BatchProject"),
      "engine UDF projection must plan the batch operator")
    BatchCountModule.calls.set(0)
    // VALUES must survive batching — a row-reuse bug would collapse every
    // batch to copies of its last row and still pass a count assertion
    val got = df.collect().map(_.getDouble(0)).sorted
    assert(got.length == 10000 && got.sameElements((0 until 10000).map(_.toDouble)),
      "batch path must preserve per-row values")
    assert(BatchCountModule.calls.get() == 2,
      s"expected 2 batch calls for 10000 rows, got ${BatchCountModule.calls.get()}")
    // nested calls evaluate innermost-first, each its own batch call
    BatchCountModule.calls.set(0)
    val nested = engine.sql("select fb(fb(a)) as v from graft_batch_t")
      .agg(sum(col("v"))).head.getDouble(0)
    assert(nested == (0 until 10000).map(_.toDouble).sum)
    assert(BatchCountModule.calls.get() == 4,
      s"expected 4 batch calls for nested invoke, got ${BatchCountModule.calls.get()}")
    // a guarded call keeps row-wise semantics: the guest must NOT be
    // invoked for rows the guard excludes (here the error fn is guarded)
    engine.sql(
      "CREATE FUNCTION ferr2(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'builtin!f_return_error'")
    val guarded = engine.sql(
      "select case when a < 0 then ferr2(a) else a end as v from graft_batch_t")
    assert(guarded.agg(sum(col("v"))).head.getDouble(0)
      == (0 until 10000).map(_.toDouble).sum)
    // MIXED projection: the hoistable fb plans BatchProjectExec while the
    // guarded ferr2 stays row-wise INSIDE it — both semantics at once
    BatchCountModule.calls.set(0)
    val mixed = engine.sql("""
      select fb(a) as v,
             case when a < 0 then ferr2(a) else a end as w
      from graft_batch_t""")
    assert(mixed.queryExecution.executedPlan.toString.contains("BatchProject"))
    val sums = mixed.agg(sum(col("v")), sum(col("w"))).head
    val expect = (0 until 10000).map(_.toDouble).sum
    assert(sums.getDouble(0) == expect && sums.getDouble(1) == expect)
    assert(BatchCountModule.calls.get() == 2,
      "only the unguarded call may be batched")
    engine.sql("DROP FUNCTION ferr2")
    engine.sql("DROP FUNCTION fb")
  }

  test("marshalling is type-generic: ARRAY<DOUBLE> and STRING signatures") {
    val spark = engine.spark
    import spark.implicits._
    engine.registerTable("graft_types_t",
      Seq((Seq(1.0, 2.5), "ok"), (Seq(4.0), "go"))
        .toDF("xs", "s"))
    engine.sql(
      "CREATE FUNCTION vsum(ARRAY<DOUBLE>) RETURNS DOUBLE LANGUAGE WASM AS 'graft.TypesTestModule!vsum'")
    engine.sql(
      "CREATE FUNCTION shout(STRING) RETURNS STRING LANGUAGE WASM AS 'graft.TypesTestModule!shout'")
    val rows = engine
      .sql("select vsum(xs) as v, shout(s) as w from graft_types_t order by v")
      .collect()
    assert(rows === Array(Row(3.5, "OK!"), Row(4.0, "GO!")))
    // null propagation through the string path
    assert(engine.sql("select shout(CAST(NULL AS STRING)) as w").head.isNullAt(0))
    engine.sql("DROP FUNCTION vsum")
    engine.sql("DROP FUNCTION shout")
  }

  test("scalar literal arguments (lib.rs:298-306, 333-342)") {
    engine.sql(
      "CREATE FUNCTION fs(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'builtin!pow'")
    assert(engine.sql("select fs(2.0, 2.0) as v").collect() === Array(Row(4.0)))
    assert(engine.sql("select fs(1.0, 1.0) as v").collect() === Array(Row(1.0)))
    engine.sql("DROP FUNCTION fs")
  }

  test("null-in → null-out (wasm_function/src/lib.rs:43-46)") {
    engine.sql(
      "CREATE FUNCTION fn_null(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'builtin!pow'")
    val rows = engine.sql(
      "select fn_null(cast(null as double), 2.0) as v").collect()
    assert(rows === Array(Row(null)))
    engine.sql("DROP FUNCTION fn_null")
  }

  test("guest error surfaces as [Wasm Invocation] (lib.rs:215-238)") {
    engine.sql(
      "CREATE FUNCTION f_err() RETURNS DOUBLE LANGUAGE WASM AS 'builtin!f_return_error'")
    val e = intercept[Exception] { engine.sql("select f_err() as v from t").collect() }
    assert(exceptionChain(e).exists(
      _.getMessage.contains("[Wasm Invocation] wasm function returned error")))
    engine.sql("DROP FUNCTION f_err")
  }

  test("guest engine error string (lib.rs:240-263)") {
    engine.sql(
      "CREATE FUNCTION f_err2() RETURNS DOUBLE LANGUAGE WASM AS 'builtin!f_return_arrow_error'")
    val e = intercept[Exception] { engine.sql("select f_err2() as v from t").collect() }
    assert(exceptionChain(e).exists(
      _.getMessage.contains("[Wasm Invocation] Divide by zero error")))
    engine.sql("DROP FUNCTION f_err2")
  }

  test("trap surfaces as [Wasm Invocation Panic] (lib.rs:265-308)") {
    engine.sql(
      "CREATE FUNCTION f_p() RETURNS DOUBLE LANGUAGE WASM AS 'builtin!f_panic'")
    val e = intercept[Exception] { engine.sql("select f_p() as v from t").collect() }
    assert(exceptionChain(e).exists(
      _.getMessage.contains("[Wasm Invocation Panic] unreachable")))
    engine.sql("DROP FUNCTION f_p")
    // the reference asserts the session still answers the full golden
    // query AFTER the trap (lib.rs:298-306) — recovery proven HERE, in
    // the same test, so it cannot be lost to test-order shuffling
    engine.sql(
      "CREATE FUNCTION f1r(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'builtin!pow'")
    val rows = engine.sql("select a, b, f1r(a,b) as f from t order by a").collect()
    assert(rows === Array(
      Row(2.0, 2.0, 4.0),
      Row(3.0, 3.0, 27.0),
      Row(4.0, 4.0, 256.0),
      Row(5.0, 5.1, 3670.684197150057)))
    engine.sql("DROP FUNCTION f1r")
  }

  test("bad locator '!method' rejected (lib.rs:102-109,172)") {
    val e = intercept[Exception] {
      engine.sql(
        "CREATE FUNCTION fbad(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS '!pow'")
    }
    assert(exceptionChain(e).exists(
      _.getMessage.contains("should be 'module!method'")))
  }

  test("module cache lifecycle: shared module, drop to zero (lib.rs:310-375)") {
    // a module path not used by any other test, so the delta is exact
    val m = "graft.LifecycleTestModule"
    val before = ModuleRegistry.cachedModuleCount
    engine.sql(
      s"CREATE FUNCTION lf1(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE JVM AS '$m!pow'")
    engine.sql(
      s"CREATE FUNCTION lf2(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE JVM AS '$m!pow'")
    assert(ModuleRegistry.cachedModuleCount === before + 1) // one VM, two fns
    engine.sql("DROP FUNCTION lf1")
    assert(ModuleRegistry.cachedModuleCount === before + 1)
    engine.sql("DROP FUNCTION lf2")
    assert(ModuleRegistry.cachedModuleCount === before) // evicted at zero refs
  }

  test("JVM class module loading (the FunctionFactory SPI is pluggable)") {
    engine.sql(
      "CREATE FUNCTION jf(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE JVM AS 'graft.functions.BuiltinModule!pow'")
    assert(engine.sql("select jf(3.0, 2.0) as v").collect() === Array(Row(9.0)))
    engine.sql("DROP FUNCTION jf")
  }

  test("non-engine SQL falls through to Spark's parser untouched") {
    assert(engine.sql("select 1 + 1 as v").collect() === Array(Row(2)))
  }

  test("native kernels are SQL-callable through the extensions") {
    assert(engine.sql("SELECT graft_shingles('A b c d', 2) AS s")
      .collect().head.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(engine.sql("SELECT graft_segments('a b c d e', 2) AS s")
      .collect().head.getSeq[String](0) == Seq("a b", "c d"))
    assert(engine.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0) == 11.0)
    // any plan-time-constant INT works as the field/n argument
    assert(engine.sql("SELECT graft_wav_meta(CAST('x' AS BINARY), 1 + 1) AS f")
      .collect().head.isNullAt(0)) // folded constant accepted; bytes unparseable
    val err = intercept[Exception](
      engine.sql("SELECT graft_shingles('a b', CAST(NULL AS INT))").collect())
    assert(exceptionChain(err).exists(_.getMessage.contains("non-NULL INT")))
    assert(engine.sql("SELECT graft_image_dims(CAST('nope' AS BINARY)) AS d")
      .collect().head.isNullAt(0))
    // NULL literal arguments are legal SQL, like every builtin
    assert(engine.sql("SELECT graft_shingles(NULL, 2) AS s")
      .collect().head.getSeq[String](0).isEmpty)
    assert(engine.sql("SELECT graft_image_dims(NULL) AS d")
      .collect().head.isNullAt(0))
    assert(engine.sql("SELECT graft_wav_meta(NULL, 1) AS r")
      .collect().head.isNullAt(0))
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
}
