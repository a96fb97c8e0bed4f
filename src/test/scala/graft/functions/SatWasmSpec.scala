package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The fourth from-scratch artifact ([[SatWasm]]) — the r18 proof that
  * the widened runtime surface (if/else structured control + 0xFC
  * saturating-trunc/bulk-memory) carries a REAL stock-toolchain-shaped
  * guest end to end, not just hand-picked unit bodies: decode-level
  * opcode-surface assertions, compiled ≡ interpreted twins over the
  * kernel lattice, the full bindgen IPC round-trip with NULL/validity
  * boundaries, the guest's shape-guard Err lanes, parse-level
  * truncation/bitflip fuzz, and the CREATE FUNCTION engine path.
  */
class SatWasmSpec extends AnyFunSuite {

  /** trunc_sat_f64_s ground truth: Java's double→long narrowing IS the
    * spec'd behavior (NaN→0, saturate at the bounds, trunc toward 0). */
  private def expected(x: Double): Long = x.toLong

  private def callSat(xs: Array[Any]): Array[Any] = {
    val payload = ArrowBatchCodec.encode(IndexedSeq(xs), xs.length)
    val reply = WasmRuntime.invokeBindgen(SatWasm.path, "sat", payload)
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === xs.length)
    cols(0)
  }

  test("the artifact genuinely uses the r18 opcode surface: decoded " +
    "bodies contain trunc_sat (0xFC 6), memory.copy, memory.fill, and " +
    "the binary parses at all only because if/else decodes now") {
    val m = WasmModule.parse(SatWasm.bytes)
    assert(m.udfExports === Seq("sat"))
    val allOps = m.funcs.flatMap(_.ops).toSet
    assert(allOps.contains(0x206), "i64.trunc_sat_f64_s must be present")
    assert(allOps.contains(0x20A), "memory.copy must be present")
    assert(allOps.contains(0x20B), "memory.fill must be present")
    // the raw binary carries the literal if/else + 0xFC encodings (the
    // kernel opens with `local.get 0; local.get 0; f64.ne; if (result
    // i64)` = 20 00 20 00 62 04 7E)
    val bytes = SatWasm.bytes
    val ifSeq = Array[Byte](0x20, 0x00, 0x20, 0x00, 0x62, 0x04, 0x7E)
    assert(bytes.sliding(ifSeq.length).exists(_.sameElements(ifSeq)),
      "the kernel's value-carrying if must appear verbatim in the binary")
  }

  test("every SatWasm function is JIT-eligible and compiles — if/else " +
    "(desugared to the jump model) and the 0xFC ops run as JVM bytecode") {
    assume(WasmJit.enabled)
    val m = WasmModule.parse(SatWasm.bytes)
    val jit = m.jit
    assert(jit != null)
    assert(jit._2.count(identity) === jit._2.length,
      s"every SatWasm function should compile: ${jit._2.toSeq}")
  }

  test("kernel lattice, compiled vs interpreted twins: bit-identical " +
    "trunc-sat over specials and a random sweep") {
    assume(WasmJit.enabled)
    val jm = WasmModule.parse(SatWasm.bytes)
    val im = WasmModule.parse(SatWasm.bytes)
    val forced = im.jit
    if (forced != null) java.util.Arrays.fill(forced._2, false)
    val specials = Array(0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.7, -2.7,
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      9.223372036854776e18, -9.223372036854776e18,
      9.223372036854775e18, -9.223372036854775e18, 1e300, -1e300,
      4.611686018427388e18, Double.MaxValue, -Double.MaxValue,
      Double.MinPositiveValue, 1e-300, 123456789.999, -123456789.999)
    val r = new java.util.Random(7)
    val sweep = specials ++ Array.fill(500)(
      math.exp(r.nextGaussian() * 20) * (if (r.nextBoolean()) 1 else -1))
    sweep.foreach { x =>
      val bits = java.lang.Double.doubleToRawLongBits(x)
      val jr = new WasmInstance(jm).callForTest(2, Array(bits))
      val ir = new WasmInstance(im).callForTest(2, Array(bits))
      assert(jr === ir, s"sat($x): compiled $jr != interpreted $ir")
      assert(jr === expected(x), s"sat($x): got $jr want ${expected(x)}")
    }
  }

  test("end-to-end bindgen round-trip: null/NaN/±inf/±saturating/" +
    "fractional lanes — NULLs pass through the copied validity bitmap") {
    val xs = Array[Any](1.5, -2.7, null, Double.NaN, 1e300, -1e300,
      9.223372036854776e18, -9.223372036854776e18, 0.0, -0.0,
      123456789.999, null, Double.PositiveInfinity, Double.NegativeInfinity)
    val out = callSat(xs)
    xs.indices.foreach { i =>
      xs(i) match {
        case null => assert(out(i) == null, s"row $i must stay NULL")
        case d: Double => assert(out(i) === expected(d), s"row $i ($d)")
      }
    }
  }

  test("validity-bitmap boundaries: 8/9/16/17 rows and an all-null batch " +
    "round-trip with correct null counts through the guest-patched " +
    "metadata (memory.copy'd bitmap + memory.fill'd pad)") {
    for (n <- Seq(1, 8, 9, 16, 17)) {
      val xs = Array.tabulate[Any](n)(i =>
        if (i % 3 == 0) null else i * 1000.5)
      val out = callSat(xs)
      out.zipWithIndex.foreach { case (v, i) =>
        if (i % 3 == 0) assert(v == null, s"n=$n row $i")
        else assert(v === (i * 1000.5).toLong, s"n=$n row $i")
      }
    }
    val allNull = callSat(Array[Any](null, null, null))
    assert(allNull.toSeq === Seq(null, null, null))
  }

  test("batch scale: 8192 rows in one guest call, exact everywhere") {
    val xs = Array.tabulate[Any](8192)(i =>
      (i - 4096) * 2.25e15) // spans both saturation regions and in-range
    val out = callSat(xs)
    out.indices.foreach { i =>
      assert(out(i) === expected((i - 4096) * 2.25e15), s"row $i")
    }
  }

  test("wrong-shape payloads return the guest's bindgen Err, never " +
    "garbage: raw bytes, a string batch, and a TWO-column f64 batch " +
    "(PowWasm's shape) all rejected with the exact message") {
    intercept[FunctionError] {
      WasmRuntime.invokeBindgen(SatWasm.path, "sat", "garbage".getBytes)
    }
    val str = ArrowBatchCodec.encode(IndexedSeq(Array[Any]("a", "b")), 2)
    val e = intercept[FunctionError] {
      WasmRuntime.invokeBindgen(SatWasm.path, "sat", str)
    }
    assert(e.msg === "sat: unexpected batch shape")
    val two = ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](1.0, 2.0), Array[Any](3.0, 4.0)), 2)
    val e2 = intercept[FunctionError] {
      WasmRuntime.invokeBindgen(SatWasm.path, "sat", two)
    }
    assert(e2.msg === "sat: unexpected batch shape")
  }

  test("truncation + bitflip fuzz over the artifact bytes: parse either " +
    "succeeds or throws the clean WasmParseException — never a raw " +
    "index/size error (the CREATE-time contract, incl. the new 0x04/" +
    "0x05/0xFC decode paths)") {
    val bytes = SatWasm.bytes
    // every truncation point (the artifact is small enough to sweep all)
    (0 until bytes.length).foreach { k =>
      try { WasmModule.parse(java.util.Arrays.copyOf(bytes, k)); () }
      catch { case _: WasmModule.WasmParseException => () }
    }
    val r = new java.util.Random(11)
    (0 until 400).foreach { _ =>
      val mut = bytes.clone()
      val at = r.nextInt(mut.length)
      mut(at) = (mut(at) ^ (1 << r.nextInt(8))).toByte
      try { WasmModule.parse(mut); () }
      catch { case _: WasmModule.WasmParseException => () }
    }
  }

  test("q66's path: CREATE FUNCTION over the artifact answers the " +
    "piecewise trunc-sat query shape exactly, then DROP tears down") {
    val engine = graft.Engine.local(2)
    try {
      val spark = engine.spark
      import spark.implicits._
      engine.registerTable("satq66",
        (0 until 64).map { i =>
          val x: java.lang.Double = (i % 8) match {
            case 0 => null
            case 1 => i * 3.7e17
            case 2 => -i * 3.7e17
            case 3 => Double.NaN
            case 4 => i / 7.0
            case 5 => -i / 7.0
            case 6 => Double.PositiveInfinity
            case _ => Double.NegativeInfinity
          }
          (i.toLong, x)
        }.toDF("k", "x"))
      engine.sql("CREATE FUNCTION vendored_sat(DOUBLE) RETURNS BIGINT " +
        s"LANGUAGE WASM AS '${SatWasm.path}!sat'")
      val rows = engine.sql(
        "select k, vendored_sat(x) as s from satq66 order by k").collect()
      rows.foreach { r =>
        val k = r.getLong(0).toInt
        if (k % 8 == 0) assert(r.isNullAt(1), s"k=$k")
        else {
          val x: Double = (k % 8) match {
            case 1 => k * 3.7e17
            case 2 => -k * 3.7e17
            case 3 => Double.NaN
            case 4 => k / 7.0
            case 5 => -k / 7.0
            case 6 => Double.PositiveInfinity
            case _ => Double.NegativeInfinity
          }
          assert(r.getLong(1) === expected(x), s"k=$k x=$x")
        }
      }
      engine.sql("DROP FUNCTION vendored_sat")
    } finally engine.spark.stop()
  }
}
