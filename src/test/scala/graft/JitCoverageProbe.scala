package graft.functions

/** Dev probe: JIT eligibility coverage over the real reference artifact
  * (and the two from-scratch guests) — run after eligibility changes to
  * record how much of each module compiles and why the rest doesn't.
  * r17 globals support: global.get/set compile as laload/lastore on the
  * instance's shared array, unlocking the wasm-bindgen shadow-stack-
  * pointer idiom (global 0 bumped/restored per frame).
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
      // why the rest doesn't compile: count per reason (call_indirect
      // compiles since r17 — only grow and frame bounds disqualify
      // directly, everything else is transitive)
      var grow = 0; var frame = 0; var calls = 0
      var i = 0
      while (i < n) {
        if (jit == null || !jit._2(i)) {
          val f = m.funcs(i)
          val slots = 3 + 2 * (f.nparams + f.nlocals + f.maxStack) + 2
          if (f.ops.contains(0x40)) grow += 1
          else if (f.nparams > 8 || slots >= 250 || f.ops.length >= 12000) frame += 1
          else calls += 1 // transitively: calls something ineligible
        }
        i += 1
      }
      println(f"$name%-22s funcs=$n%5d compiled=$compiled%5d " +
        f"(${100.0 * compiled / math.max(n, 1)}%5.1f%%)  uncompiled by: " +
        f"memory.grow=$grow frame=$frame transitive=$calls")
    }
    val ref = new java.io.File("/root/reference/wasm_function.wasm")
    if (ref.isFile)
      report("reference artifact", java.nio.file.Files.readAllBytes(ref.toPath))
    report("PowWasm (vendored)", PowWasm.bytes)
    report("EchoWasm", EchoWasm.bytes)
  }
}
