package graft

/** Dev micro-benchmark: cost of REAL WASM execution per batch.
  * Same pow() projection over N rows through the in-JVM module (zero-copy
  * native Scala), and through the reference's actual wasm artifact
  * interpreted by functions/WasmInterpreter (Arrow IPC + bindgen protocol
  * + bytecode dispatch per 8192-row batch). Run:
  *   sbt "Test/runMain graft.WasmBoundaryBench [nRows]"
  */
object WasmBoundaryBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val wasmPath = "/root/reference/wasm_function.wasm"
    val engine = Engine.local(8)
    val spark = engine.spark
    spark.range(0, n, 1, 8).selectExpr("cast(id % 97 as double) as a")
      .createOrReplaceTempView("bt")
    engine.sql(
      "CREATE FUNCTION bj(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS 'builtin!pow'")
    engine.sql(
      s"CREATE FUNCTION bw(DOUBLE, DOUBLE) RETURNS DOUBLE LANGUAGE WASM AS '$wasmPath!f1'")
    def time(fn: String): Double = {
      val t0 = System.nanoTime()
      engine.sql(
        s"select sum(v) as s from (select $fn(a, 1.5) as v from bt)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    time("bj"); time("bw") // warm codegen + module decode
    val jvm = (1 to 3).map(_ => time("bj")).min
    val wasm = (1 to 3).map(_ => time("bw")).min
    val batches = math.ceil(n / 8192.0).toLong
    println(f"rows=$n batches=$batches in-jvm=$jvm%.3fs wasm=$wasm%.3fs " +
      f"overhead/batch=${(wasm - jvm) / batches * 1000}%.2fms " +
      f"rows/sec-wasm=${n / wasm}%.0f")
    spark.stop()
  }
}
