package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The fifth from-scratch artifact ([[SimdWasm]]) — the r19 proof that
  * the opt-in SIMD v128 core carries a REAL vectorized guest end to
  * end: decode-level opcode-surface assertions, vector-lane ≡ scalar ≡
  * host-math agreement (every elementary op correctly rounded), the
  * full bindgen IPC round-trip with NULL/validity and odd-tail
  * boundaries, the guest's shape-guard Err lanes, parse-level
  * truncation/bitflip fuzz, and the CREATE FUNCTION engine path.
  */
class SimdWasmSpec extends AnyFunSuite {

  /** host ground truth — the same correctly-rounded elementary ops. */
  private def expected(x: Double): Double =
    math.sqrt(math.abs(x)) * 0.5 + x * x

  private def callVmag(xs: Array[Any]): Array[Any] = {
    val payload = ArrowBatchCodec.encode(IndexedSeq(xs), xs.length)
    val reply = WasmRuntime.invokeBindgen(SimdWasm.path, "vmag", payload)
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === xs.length)
    cols(0)
  }

  test("the artifact genuinely uses the v128 surface: decoded bodies " +
    "contain v128.load/store, f64x2 mul/sqrt/add, splat, v128.and, a " +
    "v128 LOCAL (2-slot mapping), and the raw binary carries 0xFD") {
    val m = WasmModule.parse(SimdWasm.bytes)
    assert(m.udfExports === Seq("vmag"))
    val allOps = m.funcs.flatMap(_.ops).toSet
    assert(allOps.contains(0x300), "v128.load must be present")
    assert(allOps.contains(0x30B), "v128.store must be present")
    assert(allOps.contains(0x3F2), "f64x2.mul must be present")
    assert(allOps.contains(0x3EF), "f64x2.sqrt must be present")
    assert(allOps.contains(0x3F0), "f64x2.add must be present")
    assert(allOps.contains(0x314), "f64x2.splat must be present")
    assert(allOps.contains(0x34E), "v128.and must be present")
    assert(allOps.contains(0x500) && allOps.contains(0x502),
      "the v128 local must be read and tee'd")
    // vrows (func 3) holds the pair in a v128 local: 2 i32 + 2 slots
    assert(m.funcs(3).nlocals === 4, "v128 local takes two slots")
    assert(m.funcs(3).usesSimd && !m.funcs(2).usesSimd)
  }

  test("JIT split: the SIMD function interprets, everything else " +
    "compiles and BRIDGES the call to it (callers of a scalar-typed " +
    "SIMD callee stay compiled)") {
    assume(WasmJit.enabled)
    val m = WasmModule.parse(SimdWasm.bytes)
    val jit = m.jit
    assert(jit != null)
    // 0 allocate, 1 shim, 2 scalar kernel, 3 vrows (SIMD)
    assert(jit._2.toSeq === Seq(true, true, true, false),
      s"only the v128 function should interpret: ${jit._2.toSeq}")
  }

  test("scalar kernel ≡ host math over specials and a random sweep — " +
    "and the VECTOR path through the bindgen walk agrees bit-for-bit " +
    "(|x| via the sign-clear mask ≡ f64.abs)") {
    val specials = Array(0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.7, -2.7,
      1e300, -1e300, 1e-300, -1e-300, Double.MinPositiveValue,
      123456789.999, -123456789.999, 4.9e9, -4.9e9)
    val r = new java.util.Random(29)
    val sweep = specials ++ Array.fill(400)(
      math.exp(r.nextGaussian() * 12) * (if (r.nextBoolean()) 1 else -1))
    val m = WasmModule.parse(SimdWasm.bytes)
    sweep.foreach { x =>
      val bits = java.lang.Double.doubleToRawLongBits(x)
      val got = java.lang.Double.longBitsToDouble(
        new WasmInstance(m).callForTest(2, Array(bits)))
      assert(java.lang.Double.doubleToRawLongBits(got) ===
        java.lang.Double.doubleToRawLongBits(expected(x)),
        s"scalar vmag($x): $got != ${expected(x)}")
    }
    // vector path: even count ⇒ pure v128 loop; odd ⇒ loop + scalar tail
    for (n <- Seq(2, 7, 64)) {
      val xs = Array.tabulate[Any](n)(i => sweep(i % sweep.length))
      val out = callVmag(xs)
      out.indices.foreach { i =>
        val want = expected(sweep(i % sweep.length))
        assert(java.lang.Double.doubleToRawLongBits(
          out(i).asInstanceOf[Double]) ===
          java.lang.Double.doubleToRawLongBits(want), s"n=$n row $i")
      }
    }
  }

  test("validity boundaries: 1/8/9/16/17 rows with interleaved NULLs " +
    "(null rows pass through the copied bitmap, data slot zeroed), an " +
    "all-null batch, and the odd-count scalar TAIL row") {
    for (n <- Seq(1, 8, 9, 16, 17)) {
      val xs = Array.tabulate[Any](n)(i =>
        if (i % 3 == 0) null else (i - n / 2) * 1000.5)
      val out = callVmag(xs)
      out.zipWithIndex.foreach { case (v, i) =>
        if (i % 3 == 0) assert(v == null, s"n=$n row $i")
        else {
          val want = expected((i - n / 2) * 1000.5)
          assert(v === want, s"n=$n row $i")
        }
      }
    }
    assert(callVmag(Array[Any](null, null, null)).toSeq
      === Seq(null, null, null))
  }

  test("batch scale: 8192 rows in one guest call, exact everywhere " +
    "(4096 vector iterations)") {
    val xs = Array.tabulate[Any](8192)(i => (i - 4096) * 3.25)
    val out = callVmag(xs)
    out.indices.foreach { i =>
      assert(out(i) === expected((i - 4096) * 3.25), s"row $i")
    }
  }

  test("wrong-shape payloads return the guest's bindgen Err, never " +
    "garbage") {
    intercept[FunctionError] {
      WasmRuntime.invokeBindgen(SimdWasm.path, "vmag", "garbage".getBytes)
    }
    val str = ArrowBatchCodec.encode(IndexedSeq(Array[Any]("a", "b")), 2)
    val e = intercept[FunctionError] {
      WasmRuntime.invokeBindgen(SimdWasm.path, "vmag", str)
    }
    assert(e.msg === "vmag: unexpected batch shape")
    val two = ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](1.0, 2.0), Array[Any](3.0, 4.0)), 2)
    val e2 = intercept[FunctionError] {
      WasmRuntime.invokeBindgen(SimdWasm.path, "vmag", two)
    }
    assert(e2.msg === "vmag: unexpected batch shape")
  }

  test("truncation + bitflip fuzz over the artifact bytes: parse either " +
    "succeeds or throws the clean WasmParseException (incl. the 0xFD " +
    "decode paths) — never a raw index/size error") {
    val bytes = SimdWasm.bytes
    (0 until bytes.length).foreach { k =>
      try { WasmModule.parse(java.util.Arrays.copyOf(bytes, k)); () }
      catch { case _: WasmModule.WasmParseException => () }
    }
    val r = new java.util.Random(17)
    (0 until 400).foreach { _ =>
      val mut = bytes.clone()
      val at = r.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << r.nextInt(8))).toByte
      try { WasmModule.parse(mut); () }
      catch { case _: WasmModule.WasmParseException => () }
    }
  }

  test("q67's path: CREATE FUNCTION over the SIMD artifact answers the " +
    "vmag query shape exactly, then DROP tears down") {
    val engine = graft.Engine.local(2)
    try {
      val spark = engine.spark
      import spark.implicits._
      engine.registerTable("simdq67",
        (0 until 33).map { i =>
          val x: java.lang.Double =
            if (i % 6 == 0) null else (i - 16) * 7.25
          (i.toLong, x)
        }.toDF("k", "x"))
      engine.sql("CREATE FUNCTION vendored_vmag(DOUBLE) RETURNS DOUBLE " +
        s"LANGUAGE WASM AS '${SimdWasm.path}!vmag'")
      val rows = engine.sql(
        "select k, vendored_vmag(x) as v from simdq67 order by k").collect()
      rows.foreach { r =>
        val k = r.getLong(0).toInt
        if (k % 6 == 0) assert(r.isNullAt(1), s"k=$k")
        else assert(r.getDouble(1) === expected((k - 16) * 7.25), s"k=$k")
      }
      engine.sql("DROP FUNCTION vendored_vmag")
    } finally engine.spark.stop()
  }
}
