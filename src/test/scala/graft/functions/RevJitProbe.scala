package graft.functions

/** Dev probe: EchoWasm rev JIT eligibility + 8192-row batch wall time.
  * r17: the split-out xform kernel compiles — 113 ms/batch interpreted
  * (the copy loop) dropped to 2.1 ms compiled (54x).
  * Usage: sbt "Test/runMain graft.functions.RevJitProbe" */
object RevJitProbe {
  def main(args: Array[String]): Unit = {
    val m = WasmModule.parse(EchoWasm.bytes)
    val jit = m.jit
    println("jit mask: " + (if (jit == null) "null" else jit._2.toSeq))
    val big: Array[Any] = Array.tabulate(8192)(i => ("row" + i) * (1 + i % 5): Any)
    val payload = ArrowBatchCodec.encode(IndexedSeq(big), 8192)
    var best = Long.MaxValue
    for (_ <- 1 to 10) {
      val t0 = System.nanoTime()
      val r = WasmRuntime.invokeBindgen(EchoWasm.path, "rev", payload)
      val dt = System.nanoTime() - t0
      if (dt < best) best = dt
      assert(r.length == payload.length)
    }
    println(f"rev 8192-row batch best=${best / 1e6}%.1f ms")
  }
}
