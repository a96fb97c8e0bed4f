package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The vendored from-scratch pow artifact ([[PowWasm]]): q63's real-
  * bytecode path with the reference checkout ABSENT. Pins the kernel's
  * contract (C99 specials exact incl. the two Math.pow divergences,
  * integer exponents exact, transcendental ≤ 1e-12 relative), the
  * guest-side f64 IPC parse + fresh-reply construction with NULL
  * propagation, and the end-to-end engine path q63 takes.
  */
class PowWasmSpec extends AnyFunSuite {

  private def callPow(as: Array[Double], bs: Array[Double]): Array[Any] = {
    val payload = ArrowBatchCodec.encode(IndexedSeq(
      as.map(x => x: Any), bs.map(x => x: Any)), as.length)
    val reply = WasmRuntime.invokeBindgen(PowWasm.path, "f1", payload)
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === as.length)
    cols(0)
  }

  test("golden reference table through the vendored artifact: integer " +
    "exponents EXACT, the 5.1 transcendental within 1e-12 relative " +
    "(bit-exact libm stays the real artifact's contract)") {
    val g = callPow(Array(2.0, 3.0, 4.0, 5.0), Array(2.0, 3.0, 4.0, 5.1))
    assert(g(0) === 4.0 && g(1) === 27.0 && g(2) === 256.0)
    val v = g(3).asInstanceOf[Double]
    assert(math.abs(v - 3670.684197150057) <= 3670.0 * 1e-12, s"got $v")
  }

  test("C99 pow contract over the IEEE edge lattice: specials EXACT " +
    "(incl. pow(1,NaN)=1 and pow(-1,±inf)=1, where Math.pow returns " +
    "NaN), integer exponents within 2 ulps, transcendental within " +
    "1e-12 relative") {
    val specials = Array(0.0, -0.0, 1.0, -1.0, 2.0, -2.0, 0.5, -0.5,
      2.5, -2.5, 3.0, -3.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN, Double.MinPositiveValue,
      -Double.MinPositiveValue, 2.2250738585072014e-308,
      Double.MaxValue, -Double.MaxValue, 1e300, -1e300, 1e-300,
      0.1, -0.1, 7.5, 1.0000000000000002)
    val pairs = for (a <- specials; b <- specials) yield (a, b)
    def expected(a: Double, b: Double): Double =
      if (b == 0.0) 1.0
      else if (a == 1.0) 1.0
      else if (a == -1.0 && b.isInfinite) 1.0
      else Math.pow(a, b)
    val got = callPow(pairs.map(_._1), pairs.map(_._2))
    pairs.indices.foreach { i =>
      val (a, b) = pairs(i)
      val e = expected(a, b)
      val v = got(i).asInstanceOf[Double]
      if (e.isNaN) assert(v.isNaN, s"pow($a,$b): want NaN got $v")
      else if (e.isInfinite || e == 0.0 || e == 1.0)
        assert(java.lang.Double.doubleToLongBits(v) ===
          java.lang.Double.doubleToLongBits(e), s"pow($a,$b): $v vs $e")
      else if (b == Math.rint(b)) {
        val ulps = math.abs(java.lang.Double.doubleToLongBits(v) -
          java.lang.Double.doubleToLongBits(e))
        assert(ulps <= 2, s"pow($a,$b): $v vs $e = $ulps ulps")
      } else assert(math.abs(v - e) <= math.abs(e) * 1e-12,
        s"pow($a,$b): $v vs $e")
    }
  }

  test("transcendental sweep: 2000 random (base, exponent) pairs stay " +
    "within 1e-12 relative of Math.pow") {
    val r = new java.util.Random(5)
    val as = Array.fill(2000)(math.exp(r.nextGaussian() * 3))
    val bs = Array.fill(2000)(r.nextGaussian() * 4 + 0.5)
    val got = callPow(as, bs)
    var checked = 0
    got.indices.foreach { i =>
      val e = Math.pow(as(i), bs(i))
      if (!e.isInfinite && e != 0.0) {
        val v = got(i).asInstanceOf[Double]
        assert(math.abs(v - e) <= math.abs(e) * 1e-12,
          s"pow(${as(i)},${bs(i)}): $v vs $e")
        checked += 1
      }
    }
    assert(checked > 1500)
  }

  test("NULL propagation through the guest-built reply: the output " +
    "validity is the AND of the input bitmaps, null count patched") {
    val payload = ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](2.0, null, 4.0, null, 5.0),
      Array[Any](3.0, 2.0, null, null, 2.0)), 5)
    val reply = WasmRuntime.invokeBindgen(PowWasm.path, "f1", payload)
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === 5)
    assert(cols(0).toSeq === Seq(8.0, null, null, null, 25.0))
  }

  test("validity-bitmap boundaries: 8 rows (exact byte), 9 rows " +
    "(straddles), and an ALL-NULL batch all round-trip with correct " +
    "null counts through the guest-patched metadata") {
    for (n <- Seq(8, 9, 16, 17)) {
      val as = Array.tabulate[Any](n)(i => if (i % 3 == 0) null else i.toDouble)
      val bs = Array.fill[Any](n)(2.0)
      val payload = ArrowBatchCodec.encode(IndexedSeq(as, bs), n)
      val reply = WasmRuntime.invokeBindgen(PowWasm.path, "f1", payload)
      val (cols, got) = ArrowBatchCodec.decode(reply)
      assert(got === n)
      cols(0).zipWithIndex.foreach { case (v, i) =>
        if (i % 3 == 0) assert(v == null, s"n=$n row $i")
        else assert(v === i.toDouble * i, s"n=$n row $i")
      }
    }
    val allNull = ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](null, null, null), Array[Any](1.0, 2.0, 3.0)), 3)
    val (c, n) = ArrowBatchCodec.decode(
      WasmRuntime.invokeBindgen(PowWasm.path, "f1", allNull))
    assert(n === 3 && c(0).toSeq === Seq(null, null, null))
  }

  test("batch scale: 8192 rows through the guest IPC walk, exact on " +
    "the q63 shape (integer bases, exponent 2)") {
    val as = Array.tabulate(8192)(i => (i % 7).toDouble)
    val bs = Array.fill(8192)(2.0)
    val got = callPow(as, bs)
    got.indices.foreach(i => assert(got(i) === as(i) * as(i), s"row $i"))
  }

  test("wrong-shape payloads return the guest's bindgen Err, never " +
    "garbage: raw bytes and a string batch both rejected") {
    intercept[FunctionError] {
      WasmRuntime.invokeBindgen(PowWasm.path, "f1", "garbage".getBytes)
    }
    val str = ArrowBatchCodec.encode(IndexedSeq(Array[Any]("a", "b")), 2)
    val e = intercept[FunctionError] {
      WasmRuntime.invokeBindgen(PowWasm.path, "f1", str)
    }
    assert(e.msg === "f1: unexpected batch shape")
  }

  test("q63's path runs REAL bytecode with the reference checkout " +
    "absent: CREATE FUNCTION over the vendored artifact answers q63's " +
    "query shape exactly (and the pure pow/log2/exp2 kernels are " +
    "JIT-eligible leaves)") {
    val m = WasmModule.parse(PowWasm.bytes)
    assert(m.udfExports === Seq("f1"))
    if (WasmJit.enabled) {
      val jit = m.jit
      assert(jit != null, "the pure kernels must keep the module compiled")
      // since r17 (globals + memory.grow compile through the instance)
      // the WHOLE guest runs as JVM bytecode: the allocator, the shim,
      // and the pow/log2/exp2/vmask/rows kernels — pin ALL of it
      assert(jit._2.count(identity) === jit._2.length,
        s"every PowWasm function should compile: ${jit._2.toSeq}")
    }
    val engine = graft.Engine.local(2)
    try {
      val spark = engine.spark
      import spark.implicits._
      engine.registerTable("powq63",
        (0 until 100).map(i => (i.toLong, (i % 7).toDouble)).toDF("k", "a"))
      engine.sql("CREATE FUNCTION vendored_pow(DOUBLE, DOUBLE) RETURNS DOUBLE " +
        s"LANGUAGE WASM AS '${PowWasm.path}!f1'")
      val rows = engine.sql(
        "select k, vendored_pow(a, cast(2.0 as double)) as p from powq63 order by k")
        .collect()
      rows.foreach { r =>
        val k = r.getLong(0)
        assert(r.getDouble(1) === math.pow((k % 7).toDouble, 2.0))
      }
      engine.sql("DROP FUNCTION vendored_pow")
    } finally engine.spark.stop()
  }
}
