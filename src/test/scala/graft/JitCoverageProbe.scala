package graft.functions

/** Dev probe: JIT eligibility coverage over the real reference artifact
  * (and the two from-scratch guests) — run after eligibility changes to
  * record how much of each module compiles and why the rest doesn't.
  *
  * Reason model (r18, aligned with the actual eligibility pipeline —
  * memory.grow COMPILES since r17; there are NO transitive demotions
  * since the r18 compiled→interpreted direct-call bridge, so only two
  * reasons remain):
  *  - `frame`: fails the static frame bounds (arity > 32, local slots
  *    ≥ 250, or op count ≥ 12000);
  *  - `emit-bailout`: passed the bounds but the emitter bailed (the
  *    65000-byte JVM Code cap). Callers of either kind compile anyway
  *    and bridge the call through the instance.
  *
  *   sbt "Test/runMain graft.functions.JitCoverageProbe"
  */
object JitCoverageProbe {
  def main(args: Array[String]): Unit = {
    def report(name: String, bytes: Array[Byte]): Unit = {
      val m = WasmModule.parse(bytes)
      val n = m.funcs.length
      val jit = m.jit
      val compiled = if (jit == null) 0 else jit._2.count(identity)
      var frame = 0; var emitBail = 0
      val selfOk = Array.tabulate(n) { i =>
        val f = m.funcs(i)
        val slots = 3 + 2 * (f.nparams + f.nlocals + f.maxStack) + 2
        f.nparams <= 32 && slots < 250 && f.ops.length < 12000
      }
      var i = 0
      while (i < n) {
        if (!(jit != null && jit._2(i))) {
          if (!selfOk(i)) frame += 1 else emitBail += 1
        }
        i += 1
      }
      println(f"$name%-22s funcs=$n%5d compiled=$compiled%5d " +
        f"(${100.0 * compiled / math.max(n, 1)}%5.1f%%)  uncompiled by: " +
        f"frame=$frame emit-bailout=$emitBail")
    }
    val ref = new java.io.File("/root/reference/wasm_function.wasm")
    if (ref.isFile)
      report("reference artifact", java.nio.file.Files.readAllBytes(ref.toPath))
    report("PowWasm (vendored)", PowWasm.bytes)
    report("EchoWasm", EchoWasm.bytes)
    report("SatWasm", SatWasm.bytes)
    // SimdWasm's v128 function interprets BY DESIGN (usesSimd) — 3/4
    // compiled is this guest's full frontier, not residue
    report("SimdWasm", SimdWasm.bytes)
  }
}
