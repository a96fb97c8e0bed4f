package graft.examples

import graft.Engine

/** End-to-end example reproducing the reference's entry point
  * (wasmedge_factory/examples/wasaffi.rs:9-29): register a 4-row table,
  * attach a function through the engine DDL, query it, drop it.
  * Run: `sbt "runMain graft.examples.WasaffiParity"`.
  */
object WasaffiParity {
  def main(args: Array[String]): Unit = {
    val engine = Engine.local(4)
    val spark = engine.spark
    import spark.implicits._

    engine.registerTable("t",
      Seq((2.0, 2.0), (3.0, 3.0), (4.0, 4.0), (5.0, 5.1)).toDF("a", "b"))

    // the reference's EXACT statement shape (examples/wasaffi.rs:18-25),
    // against its ACTUAL prebuilt guest artifact when present — the
    // module runs as real WASM bytecode in the from-scratch interpreter;
    // falls back to the in-JVM builtin module elsewhere
    val locator = graft.functions.WasmRuntime.powLocator
    println(s"binding f1 to: $locator")
    engine.sql(
      s"CREATE FUNCTION f1(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS '$locator'")
    engine.sql("select a, b, f1(a,b) from t").show()

    // error-path probes (reference tests lib.rs:215-308)
    probe("bad locator") {
      engine.sql("CREATE FUNCTION bad(DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS '!x'")
    }
    probe("wrong arity") { engine.sql("select f1(1.0) from t").collect() }

    engine.sql("DROP FUNCTION f1")
    probe("dropped function") { engine.sql("select f1(1.0,1.0) from t").collect() }
    println(s"module cache after drop: " +
      graft.functions.ModuleRegistry.cachedModuleCount)
    spark.stop()
  }

  private def probe(label: String)(body: => Any): Unit =
    try { body; println(s"PROBE $label => no error (UNEXPECTED)") }
    catch { case e: Exception =>
      println(s"PROBE $label => ${e.getMessage.linesIterator.next()}")
    }
}
