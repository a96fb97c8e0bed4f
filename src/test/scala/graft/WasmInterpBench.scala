package graft

import graft.functions.{ArrowBatchCodec, WasmRuntime}

/** Dev micro-benchmark: pure interpreter throughput, no Spark in the loop.
  * One 8192-row bindgen round-trip per iteration against the real artifact;
  * prints best-of-N ms/batch and rows/s. Run:
  *   sbt "Test/runMain graft.WasmInterpBench [batches]"
  */
object WasmInterpBench {
  def main(args: Array[String]): Unit = {
    val wasmPath = "/root/reference/wasm_function.wasm"
    val iters = args.headOption.map(_.toInt).getOrElse(200)
    val n = 8192
    val a = Array.tabulate[Any](n)(i => (i % 97).toDouble)
    val b = Array.fill[Any](n)(1.5)
    val payload = ArrowBatchCodec.encode(IndexedSeq(a, b), n)
    def round(k: Int): Double = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < k) { WasmRuntime.invokeBindgen(wasmPath, "f1", payload); i += 1 }
      (System.nanoTime() - t0) / 1e6 / k
    }
    round(20) // warm JIT
    val best = (1 to 5).map(_ => round(iters / 5)).min
    println(f"batch=$n best=$best%.3f ms/batch rows/s=${n / best * 1000}%.0f")
  }
}
