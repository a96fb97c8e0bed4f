package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Artifact-wide randomized differential sweep: with 96.9% of the
  * reference artifact compiling (r17: globals, call_indirect, and
  * memory.grow all compile), the equivalence argument should not rest
  * on the pow lattice alone — this spec drives EVERY compiled function
  * of a numeric scalar signature with fixed corner values plus random
  * bit patterns, through a jit-enabled and a jit-suppressed module
  * decoded from the same bytes, and requires bit-identical results
  * (NaN-ness for float returns, payloads excepted per the wasm spec).
  * Functions whose interpreted run traps or exhausts the probe fuel on
  * an input are skipped for that input (random bits routinely trip
  * real guardrails — the point here is agreement on completed runs;
  * trap-message agreement is pinned by WasmJitSpec's dedicated lanes).
  */
class WasmJitDifferentialSpec extends AnyFunSuite {

  private val wasmPath = "/root/reference/wasm_function.wasm"
  private def artifactPresent = new java.io.File(wasmPath).isFile

  test("every compiled numeric-scalar function of the REAL artifact " +
    "agrees bit-for-bit with the interpreter on corners + random bit " +
    "patterns (the whole 96.9% frontier, not just the pow kernel)") {
    assume(artifactPresent && WasmJit.enabled)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(wasmPath))
    val jm = WasmModule.parse(bytes)
    val im = WasmModule.parse(bytes)
    val forced = im.jit
    if (forced != null) java.util.Arrays.fill(forced._2, false)
    assert(jm.jit != null)
    val mask = jm.jit._2
    val F64 = 0x7C; val I64 = 0x7E; val I32 = 0x7F
    val scalar = Set(F64, I64, I32)
    val cands = jm.funcs.indices.filter { i =>
      val (ps, rs) = jm.typeOf(i)
      mask(i) && rs.length == 1 && scalar(rs(0)) &&
        ps.nonEmpty && ps.length <= 2 && ps.forall(scalar)
    }
    assert(cands.size > 200,
      s"the compiled frontier should include hundreds of scalar fns, got ${cands.size}")
    val corners = Array(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      java.lang.Double.doubleToRawLongBits(1.5),
      java.lang.Double.doubleToRawLongBits(-2.25),
      java.lang.Double.doubleToRawLongBits(Double.NaN),
      java.lang.Double.doubleToRawLongBits(Double.PositiveInfinity))
    val rnd = new java.util.Random(1234)
    var compared = 0L
    var skippedTrap = 0L
    for (fi <- cands) {
      val nparams = jm.typeOf(fi)._1.length
      val floatRet = jm.typeOf(fi)._2(0) == F64
      val vectors: Seq[Array[Long]] =
        corners.take(6).map(v => Array.fill(nparams)(v)).toSeq ++
          (1 to 6).map(_ => Array.fill(nparams)(rnd.nextLong())) ++
          Seq(Array.tabulate(nparams)(k => corners(k % corners.length)))
      for (args <- vectors) {
        // interpreted first, modest fuel: random bits routinely hit real
        // guardrails (traps, giant loops) — skip those inputs
        val ii = new WasmInstance(im)
        ii.setFuel(500000)
        val ir = try Some(ii.callForTest(fi, args.clone()))
                 catch {
                   case _: WasmTrap => skippedTrap += 1; None
                   case _: StackOverflowError => skippedTrap += 1; None
                 }
        ir.foreach { iv =>
          val ji = new WasmInstance(jm)
          val jv = ji.callForTest(fi, args.clone())
          if (floatRet) {
            val (jd, id) = (java.lang.Double.longBitsToDouble(jv),
              java.lang.Double.longBitsToDouble(iv))
            if (jd.isNaN || id.isNaN)
              assert(jd.isNaN && id.isNaN,
                s"fn $fi(${args.toSeq}): NaN-ness differs")
            else assert(jv === iv,
              s"fn $fi(${args.toSeq}): compiled $jd != interpreted $id")
          } else assert(jv === iv,
            s"fn $fi(${args.toSeq}): compiled $jv != interpreted $iv")
          compared += 1
        }
      }
    }
    info(s"compared $compared completed runs across ${cands.size} compiled " +
      s"functions ($skippedTrap trapped/fuel-capped inputs skipped)")
    assert(compared > 1000, s"sweep must actually compare, got $compared")
  }
}
