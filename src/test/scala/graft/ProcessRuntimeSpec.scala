package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.{FunctionModule, ModuleRegistry, ProcessClient, ScalarBatchFunction}

/** Guest module that kills its own process mid-call — drives the
  * kill-the-child trap path (the analog of a WASM guest trapping hard
  * enough to take the sandbox down; the reference's VM survives traps,
  * lib.rs:298-306, so the engine must survive a dead guest PROCESS too). */
class KillServerModule extends FunctionModule {
  override def functions: Map[String, ScalarBatchFunction] = Map(
    "die" -> { _ => sys.exit(3) },
    "hang" -> { _ => Thread.sleep(600000); null },
    "pow" -> { args =>
      (args(0), args(1)) match {
        case (a: java.lang.Double, b: java.lang.Double) =>
          java.lang.Double.valueOf(math.pow(a, b))
        case _ => null
      }
    })
}

/** Out-of-process function runtime — proves the one capability the in-JVM
  * module registry substitutes (SURVEY §7.4): REAL host↔guest marshalling.
  * Every batch crosses a process boundary as Arrow IPC bytes
  * (udf.rs:82-115 granularity), both reference error strings survive the
  * crossing (udf.rs:95,111-113), and the engine session survives a guest
  * that dies mid-call (lib.rs:298-306).
  */
class ProcessRuntimeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val engine = Engine.local(4)

  override def beforeAll(): Unit = {
    val spark = engine.spark
    import spark.implicits._
    // the reference's table (lib.rs:179-183)
    engine.registerTable("pt",
      Seq((2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (5.0, 5.1)).toDF("a", "b"))
  }

  override def afterAll(): Unit = engine.spark.stop()

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("golden pow runs through the guest subprocess; DROP kills it " +
    "(lifecycle lib.rs:344-372)") {
    engine.sql(
      "CREATE FUNCTION pp1(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:builtin!pow'")
    engine.sql(
      "CREATE FUNCTION pp2(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:builtin!pow'")
    assert(ProcessClient.isRunning("builtin"), "guest process must be up after CREATE")
    // golden output (lib.rs:199-210 / README.md:99-108) across the boundary
    val rows = engine.sql("select a, b, pp1(a,b) as f from pt order by a").collect()
    assert(rows === Array(
      Row(2.0, 2.0, 4.0),
      Row(3.0, 3.0, 27.0),
      Row(4.0, 4.0, 256.0),
      Row(5.0, 5.1, 3670.684197150057)))
    val before = ModuleRegistry.cachedModuleCount
    engine.sql("DROP FUNCTION pp1")
    assert(ProcessClient.isRunning("builtin"), "shared guest survives first DROP")
    engine.sql("DROP FUNCTION pp2")
    assert(ModuleRegistry.cachedModuleCount === before - 1)
    assert(!ProcessClient.isRunning("builtin"),
      "guest process must be killed when the module refcount hits zero")
  }

  test("one Arrow IPC round-trip per 8192-row batch (udf.rs:82-115 " +
    "granularity across the process boundary)") {
    val spark = engine.spark
    spark.range(0, 10000, 1, 1) // ONE partition → ceil(10000/8192) = 2 batches
      .selectExpr("cast(id as double) as a")
      .createOrReplaceTempView("proc_batch_t")
    engine.sql(
      "CREATE FUNCTION ppb(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.KillServerModule!pow'")
    // wrong arity caught parent-side at analysis, before any crossing
    val arity = intercept[Exception] {
      engine.sql("select ppb(a, 1.0) as v from proc_batch_t").collect()
    }
    assert(exceptionChain(arity).exists(_.getMessage.contains("expects 1 arguments")))
    engine.sql("DROP FUNCTION ppb")
    engine.sql(
      "CREATE FUNCTION ppb2(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.KillServerModule!pow'")
    val df2 = engine.sql("select ppb2(a, 1.0) as v from proc_batch_t")
    assert(df2.queryExecution.executedPlan.toString.contains("BatchProject"),
      "proc UDF projection must plan the batch operator")
    val base = ProcessClient.roundTrips.get()
    val got = df2.collect().map(_.getDouble(0)).sorted
    assert(got.length == 10000 && got.sameElements((0 until 10000).map(_.toDouble)),
      "values must survive the Arrow IPC round-trip per batch")
    assert(ProcessClient.roundTrips.get() - base == 2,
      s"expected 2 IPC round-trips for 10000 rows, got ${ProcessClient.roundTrips.get() - base}")
    engine.sql("DROP FUNCTION ppb2")
  }

  test("guest error crosses the boundary as [Wasm Invocation] (udf.rs:111-113)") {
    engine.sql(
      "CREATE FUNCTION pge() RETURNS DOUBLE LANGUAGE WASM AS 'proc:builtin!f_return_error'")
    val e = intercept[Exception] { engine.sql("select pge() as v from pt").collect() }
    assert(exceptionChain(e).exists(
      _.getMessage.contains("[Wasm Invocation] wasm function returned error")))
    engine.sql("DROP FUNCTION pge")
  }

  test("guest throw crosses the boundary as [Wasm Invocation Panic] (udf.rs:95)") {
    engine.sql(
      "CREATE FUNCTION pgp() RETURNS DOUBLE LANGUAGE WASM AS 'proc:builtin!f_panic'")
    val e = intercept[Exception] { engine.sql("select pgp() as v from pt").collect() }
    assert(exceptionChain(e).exists(
      _.getMessage.contains("[Wasm Invocation Panic] unreachable")))
    // guest process survives an ordinary guest throw — same VM, next query fine
    engine.sql(
      "CREATE FUNCTION pgr(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:builtin!pow'")
    assert(engine.sql("select pgr(2.0, 3.0) as v").collect() === Array(Row(8.0)))
    engine.sql("DROP FUNCTION pgp")
    engine.sql("DROP FUNCTION pgr")
  }

  test("guest process dying mid-call is a trap; the session survives and " +
    "the next call respawns (lib.rs:298-306)") {
    engine.sql(
      "CREATE FUNCTION pkill(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.KillServerModule!die'")
    engine.sql(
      "CREATE FUNCTION palive(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.KillServerModule!pow'")
    val e = intercept[Exception] { engine.sql("select pkill(a) as v from pt").collect() }
    assert(exceptionChain(e).exists(m =>
      m.getMessage.contains("[Wasm Invocation Panic]") &&
        m.getMessage.contains("guest process died")))
    assert(!ProcessClient.isRunning("graft.KillServerModule"),
      "dead guest must be evicted from the client registry")
    // recovery: the same registered function respawns a fresh guest
    assert(engine.sql("select palive(5.0, 5.1) as v").collect()
      === Array(Row(3670.684197150057)))
    assert(ProcessClient.isRunning("graft.KillServerModule"))
    engine.sql("DROP FUNCTION pkill")
    engine.sql("DROP FUNCTION palive")
  }

  test("marshalling is type-generic across the boundary: ARRAY<DOUBLE> " +
    "and STRING vectors in the IPC stream") {
    val spark = engine.spark
    import spark.implicits._
    engine.registerTable("proc_types_t",
      Seq((Seq(1.0, 2.5), "ok"), (Seq(4.0), "go")).toDF("xs", "s"))
    engine.sql(
      "CREATE FUNCTION pvsum(ARRAY<DOUBLE>) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.TypesTestModule!vsum'")
    engine.sql(
      "CREATE FUNCTION pshout(STRING) RETURNS STRING LANGUAGE WASM AS 'proc:graft.TypesTestModule!shout'")
    val rows = engine
      .sql("select pvsum(xs) as v, pshout(s) as w from proc_types_t order by v")
      .collect()
    assert(rows === Array(Row(3.5, "OK!"), Row(4.0, "GO!")))
    // nulls cross as Arrow validity bits (null-in → null-out)
    assert(engine.sql("select pshout(CAST(NULL AS STRING)) as w").head.isNullAt(0))
    assert(engine.sql("select pvsum(CAST(NULL AS ARRAY<DOUBLE>)) as v").head.isNullAt(0))
    engine.sql("DROP FUNCTION pvsum")
    engine.sql("DROP FUNCTION pshout")
  }

  test("concurrent tasks share one guest safely: calls serialize on the " +
    "client (the reference's per-module VM mutex) with values intact") {
    val spark = engine.spark
    // 8 partitions on a 4-core session → concurrent tasks racing the
    // single guest process; every batch must come back bit-exact
    spark.range(0, 80000, 1, 8)
      .selectExpr("cast(id % 91 as double) as a")
      .createOrReplaceTempView("proc_conc_t")
    engine.sql(
      "CREATE FUNCTION pcc(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:builtin!pow'")
    val got = engine.sql(
      "select sum(v) as s from (select pcc(a, 2.0) as v from proc_conc_t)")
      .head.getDouble(0)
    val want = (0 until 80000).map(i => math.pow(i % 91, 2.0)).sum
    assert(got == want, "interleaved IPC round-trips must not mix batches")
    engine.sql("DROP FUNCTION pcc")
  }

  test("bad module / bad method fail at CREATE time, like the factory " +
    "(lib.rs:111-132)") {
    val e1 = intercept[Exception] {
      engine.sql(
        "CREATE FUNCTION pbad(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.NoSuchModule!f'")
    }
    assert(exceptionChain(e1).exists(_.getMessage.contains("module not found")))
    val e2 = intercept[Exception] {
      engine.sql(
        "CREATE FUNCTION pbad2(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:builtin!nope'")
    }
    assert(exceptionChain(e2).exists(
      _.getMessage.contains("function 'nope' not found in module 'proc:builtin'")))
  }

  test("a guest that hangs mid-call hits the bounded read deadline: the " +
    "task gets an error, the guest is destroyed, the next call respawns") {
    // CREATE under the DEFAULT deadline: the guest JVM's cold spawn +
    // status byte happen at CREATE, and on a cold/loaded host that can
    // legitimately exceed a short probe timeout. The 1500 ms deadline is
    // scoped to the hanging SELECT only — the behavior under test.
    engine.sql(
      "CREATE FUNCTION phang(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.KillServerModule!hang'")
    sys.props("graft.proc.readTimeoutMs") = "1500"
    try {
      val e = intercept[Exception] {
        engine.sql("select phang(a) from pt").collect()
      }
      assert(exceptionChain(e).exists(t =>
        Option(t.getMessage).exists(_.contains("timeout"))),
        s"expected a bounded-timeout error, got: ${exceptionChain(e).map(_.getMessage)}")
      assert(!ProcessClient.isRunning("graft.KillServerModule"),
        "hung guest must be destroyed, not left blocking")
      // same module respawns and serves — under the DEFAULT deadline:
      // the 1500 ms probe timeout is for the hang above, and a guest-JVM
      // cold spawn under full-suite host load can legitimately exceed it
      sys.props.remove("graft.proc.readTimeoutMs")
      engine.sql(
        "CREATE FUNCTION pp_hangcheck(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'proc:graft.KillServerModule!pow'")
      val got = engine.sql(
        "select sum(v) as s from (select pp_hangcheck(a, 2.0) as v from pt)")
        .head.getDouble(0)
      assert(got === 2.0 * 2 + 3.0 * 3 + 4.0 * 4 + 5.0 * 5)
      engine.sql("DROP FUNCTION phang")
      engine.sql("DROP FUNCTION pp_hangcheck")
    } finally sys.props.remove("graft.proc.readTimeoutMs")
  }

  test("a module that fails to load answers the INVOKE path with the real " +
    "error, not a broken-pipe 'guest died' (drained-request discipline)") {
    // bypass the CREATE-time LIST handshake: first contact is a large
    // OpInvoke frame, the shape an executor-side lazy spawn produces
    val cols = IndexedSeq(Array.fill[Any](8192)(1.0))
    val e = intercept[Exception] {
      graft.functions.ProcessClient.invoke("graft.NoSuchModule", "f", cols, 8192)
    }
    assert(exceptionChain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("module not found"))),
      s"real module-load error must surface, got: ${exceptionChain(e).map(_.getMessage)}")
  }
}
