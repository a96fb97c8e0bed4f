package graft.functions

/** Dev probe: PowWasm JIT eligibility mask + 8192-row batch wall time
  * (best-of-12). r17 measurement: pow/log2/exp2/vmask/rows compiled,
  * 1.25 ms/batch = 6.55 M rows/s at the bindgen boundary.
  * Usage: sbt "Test/runMain graft.functions.PowJitProbe" */
object PowJitProbe {
  def main(args: Array[String]): Unit = {
    val m = WasmModule.parse(PowWasm.bytes)
    println("jit mask: " + (if (m.jit == null) "null" else m.jit._2.toSeq))
    val as = Array.tabulate[Any](8192)(i => (i % 7).toDouble: Any)
    val bs = Array.fill[Any](8192)(2.0)
    val payload = ArrowBatchCodec.encode(IndexedSeq(as, bs), 8192)
    var best = Long.MaxValue
    for (_ <- 1 to 12) {
      val t0 = System.nanoTime()
      val r = WasmRuntime.invokeBindgen(PowWasm.path, "f1", payload)
      val dt = System.nanoTime() - t0
      if (dt < best) best = dt
      assert(r.length > 0)
    }
    println(f"pow 8192-row batch best=${best / 1e6}%.2f ms (${8192 / (best / 1e9) / 1e6}%.2f M rows/s)")
  }
}
