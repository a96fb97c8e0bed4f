package graft.functions

/** A from-scratch `pow` guest artifact — the vendored replacement for
  * the reference checkout's prebuilt `wasm_function.wasm`, so the q63
  * path runs REAL WASM BYTECODE on any machine (r16 verdict: the
  * `/root/reference/...` constant was this environment's coupling; the
  * reference's binary is deliberately NOT copied — this module is
  * assembled from the public core binary grammar like [[EchoWasm]],
  * with pow implemented in bytecode from the C99 semantics).
  *
  * Exports `allocate` and `__wasm_udf_f1` speaking the wasmedge-bindgen
  * ABI. The shim parses the host's (f64, f64) Arrow IPC batch inside
  * the guest (stream-framing walk + the fixed record-batch offsets the
  * two-f64-column schema produces, guarded like [[EchoWasm]]'s `rev`),
  * computes per row, and CONSTRUCTS a fresh one-f64-column reply batch
  * from an embedded template (patched row count / buffer lengths /
  * null count), propagating NULLs as the AND of the input validity
  * bitmaps — the reference guest's arrow-kernel behavior.
  *
  * The pow KERNEL's contract (PowWasmSpec):
  *  - C99 annex-F specials EXACT, including the two spec-level
  *    divergences from `Math.pow` the real artifact exhibits
  *    (pow(1, NaN) = 1 and pow(-1, ±inf) = 1);
  *  - integer exponents (|y| < 2^62) by square-and-multiply: exact
  *    whenever the result is exactly representable (covers every q63
  *    oracle input), ≤ a few ulps otherwise, with zero/inf/sign
  *    semantics falling out of IEEE multiplication itself;
  *  - non-integer finite exponents via exp2(y·log2(x)) with atanh/exp
  *    series (~1e-13 relative): close, NOT bit-identical to libm —
  *    callers needing the artifact's exact libm bits gate on the
  *    reference checkout being present (WasmRuntimeSpec's lattice).
  */
object PowWasm {

  // ---- little assembler (structured-control-free: the interpreter's
  // MVP surface has no if/else — block/br_if/select like the artifact)
  private def uleb(v: Long): Seq[Byte] = {
    var x = v; val out = Seq.newBuilder[Byte]; var more = true
    while (more) {
      val b = (x & 0x7f).toInt; x >>>= 7
      if (x == 0) { out += b.toByte; more = false } else out += (b | 0x80).toByte
    }
    out.result()
  }
  private def sleb(v: Long): Seq[Byte] = {
    var x = v; val out = Seq.newBuilder[Byte]; var more = true
    while (more) {
      val b = (x & 0x7f).toInt; x >>= 7
      if ((x == 0 && (b & 0x40) == 0) || (x == -1 && (b & 0x40) != 0)) {
        out += b.toByte; more = false
      } else out += (b | 0x80).toByte
    }
    out.result()
  }
  private def section(id: Int, body: Seq[Byte]): Seq[Byte] =
    id.toByte +: (uleb(body.length.toLong) ++ body)
  private def b(xs: Int*): Seq[Byte] = xs.map(_.toByte)

  private final class Asm {
    private val out = Seq.newBuilder[Byte]
    def raw(xs: Int*): Unit = out ++= xs.map(_.toByte)
    def lg(i: Int): Unit = raw(0x20, i)
    def ls(i: Int): Unit = raw(0x21, i)
    def ci(v: Long): Unit = { raw(0x41); out ++= sleb(v) }
    def cl(v: Long): Unit = { raw(0x42); out ++= sleb(v) }
    def cf(v: Double): Unit = {
      raw(0x44)
      val bits = java.lang.Double.doubleToRawLongBits(v)
      out ++= (0 until 8).map(k => ((bits >> (8 * k)) & 0xFF).toByte)
    }
    def ld32(off: Int): Unit = { raw(0x28, 0x00); out ++= uleb(off.toLong) }
    def ldf(off: Int): Unit = { raw(0x2B, 0x00); out ++= uleb(off.toLong) }
    def ld8(off: Int): Unit = { raw(0x2D, 0x00); out ++= uleb(off.toLong) }
    def st32(off: Int): Unit = { raw(0x36, 0x00); out ++= uleb(off.toLong) }
    def st64(off: Int): Unit = { raw(0x37, 0x00); out ++= uleb(off.toLong) }
    def stf(off: Int): Unit = { raw(0x39, 0x00); out ++= uleb(off.toLong) }
    def st8(off: Int): Unit = { raw(0x3A, 0x00); out ++= uleb(off.toLong) }
    def call(i: Int): Unit = { raw(0x10); out ++= uleb(i.toLong) }
    def block(): Unit = raw(0x02, 0x40)
    def loop(): Unit = raw(0x03, 0x40)
    def end(): Unit = raw(0x0B)
    def brIf(d: Int): Unit = { raw(0x0D); out ++= uleb(d.toLong) }
    def br(d: Int): Unit = { raw(0x0C); out ++= uleb(d.toLong) }
    def ret(): Unit = raw(0x0F)
    def sel(): Unit = raw(0x1B)
    def result: Seq[Byte] = out.result()
  }

  private val MsgBytes = "f1: unexpected batch shape".getBytes("UTF-8")
  private val MsgOff = 8

  /** Reply-stream template: the full prefix (schema message + record
    * batch metadata, 296 bytes) of a one-f64-column IPC stream as this
    * JVM's Arrow writer produces it; the guest patches row count and
    * buffer/body lengths and appends the body + end-of-stream marker. */
  private lazy val template: Array[Byte] = {
    val enc = ArrowBatchCodec.encode(
      IndexedSeq(Array[Any](9.0, 16.0, 25.0)), 3)
    def le32(p: Int): Int = (enc(p) & 0xFF) | ((enc(p + 1) & 0xFF) << 8) |
      ((enc(p + 2) & 0xFF) << 16) | ((enc(p + 3) & 0xFF) << 24)
    // the guest patches FIXED offsets inside this prefix — fail LOUDLY
    // at assembly if a different Arrow writer ever changes the layout,
    // instead of emitting silently-corrupt replies
    require(enc.length == 336 && le32(0) == -1 && le32(4) == 144 &&
      le32(152) == -1 && le32(156) == 136,
      s"Arrow writer layout changed (len=${enc.length}): PowWasm's " +
        "reply template offsets no longer hold")
    java.util.Arrays.copyOf(enc, 296)
  }
  private val TemplateOff = 64
  // heap base: template ends at 64 + 296 = 360
  private val HeapBase = 360

  lazy val bytes: Array[Byte] = {
    // types: 0 (i32)->i32, 1 (i32,i32)->i32, 2 (f64,f64)->f64,
    // 3 (f64)->f64, 4 (i32 x7)->i32 (vmask), 5 (i32 x4)->i32 (rows)
    val typeSec = section(1, b(0x06,
      0x60, 0x01, 0x7F, 0x01, 0x7F,
      0x60, 0x02, 0x7F, 0x7F, 0x01, 0x7F,
      0x60, 0x02, 0x7C, 0x7C, 0x01, 0x7C,
      0x60, 0x01, 0x7C, 0x01, 0x7C,
      0x60, 0x07, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x7F, 0x01, 0x7F,
      0x60, 0x04, 0x7F, 0x7F, 0x7F, 0x7F, 0x01, 0x7F))
    // funcs: 0 allocate, 1 shim, 2 pow, 3 log2, 4 exp2, 5 vmask, 6 rows
    val funcSec = section(3, b(0x07, 0x00, 0x01, 0x02, 0x03, 0x03, 0x04, 0x05))
    val memSec = section(5, b(0x01, 0x00, 0x01))
    val globalSec = section(6,
      b(0x01, 0x7F, 0x01, 0x41) ++ sleb(HeapBase.toLong) ++ b(0x0B))
    def export(name: String, idx: Int): Seq[Byte] = {
      val nb = name.getBytes("UTF-8")
      uleb(nb.length.toLong) ++ nb.toSeq ++ b(0x00) ++ uleb(idx.toLong)
    }
    val exportSec = section(7,
      b(0x02) ++ export("allocate", 0) ++ export("__wasm_udf_f1", 1))
    def body(locals: Seq[Byte], code: Seq[Byte]): Seq[Byte] = {
      val fb = locals ++ code
      uleb(fb.length.toLong) ++ fb
    }
    val codeSec = section(10, b(0x07) ++
      body(b(0x01, 0x02, 0x7F), allocateCode) ++
      body(b(0x01, 0x14, 0x7F), shimCode) ++      // 20 i32 locals
      body(b(0x02, 0x02, 0x7C, 0x01, 0x7E), powCode) ++ // 2 f64 + 1 i64
      body(b(0x02, 0x04, 0x7C, 0x01, 0x7E), log2Code) ++ // 4 f64 + 1 i64
      body(b(0x02, 0x02, 0x7C, 0x01, 0x7E), exp2Code) ++
      body(b(0x01, 0x04, 0x7F), vmaskCode) ++     // 4 i32 locals
      body(b(0x01, 0x01, 0x7F), rowsCode)         // 1 i32 local
    )
    val dataSec = section(11, b(0x02) ++
      (b(0x00, 0x41) ++ sleb(MsgOff.toLong) ++ b(0x0B) ++
        uleb(MsgBytes.length.toLong) ++ MsgBytes.toSeq) ++
      (b(0x00, 0x41) ++ sleb(TemplateOff.toLong) ++ b(0x0B) ++
        uleb(template.length.toLong) ++ template.toSeq))
    (Seq[Byte](0, 'a', 's', 'm', 1, 0, 0, 0) ++
      typeSec ++ funcSec ++ memSec ++ globalSec ++ exportSec ++ codeSec ++
      dataSec).toArray
  }

  /** allocate(len): bump + align-8 with a br_if-guarded grow (the
    * EchoWasm allocator verbatim — same public recipe). */
  private def allocateCode: Seq[Byte] =
    b(0x23, 0x00, 0x21, 0x01, 0x20, 0x01, 0x20, 0x00,
      0x6A, 0x41, 0x07, 0x6A, 0x41, 0x78, 0x71, 0x24, 0x00, 0x23, 0x00) ++
      b(0x41) ++ sleb(65535) ++
      b(0x6A, 0x41, 0x10, 0x76, 0x21, 0x02,
        0x02, 0x40, 0x20, 0x02, 0x3F, 0x00, 0x4D, 0x0D, 0x00,
        0x20, 0x02, 0x3F, 0x00, 0x6B, 0x40, 0x00, 0x1A, 0x0B,
        0x20, 0x01, 0x0B)

  /** __wasm_udf_f1(pairs, n): parse the 2×f64 input batch, compute pow
    * per row, construct the 1×f64 reply from the template.
    * Locals: 2 inp, 3 inl, 4 meta, 5 body, 6 n, 7 out, 8 vbytes,
    * 9 vpad, 10 j, 11 tmp, 12 ob, 13 nulls, 14 total, 15 bodyLen,
    * 16 v0off, 17 v0len, 18 v1off, 19 v1len, 20 d0off, 21 d1off. */
  private def shimCode: Seq[Byte] = {
    val a = new Asm
    import a._
    def errRet(): Unit = {
      ci(13); call(0); ls(11)
      lg(11); ci(1); st8(0)
      lg(11); ci(MsgOff.toLong); st32(1)
      lg(11); ci(MsgBytes.length.toLong); st32(5)
      lg(11); ret()
    }
    def check(expected: Long)(loadIt: => Unit): Unit = {
      block(); loadIt; ci(expected); raw(0x46); brIf(0); errRet(); end()
    }
    lg(0); ld32(0); ls(2)
    lg(0); ld32(4); ls(3)
    check(-1L) { lg(2); ld32(0) }           // stream magic
    check(192L) { lg(2); ld32(4) }          // the 2×f64 schema message
    check(-1L) { lg(2); ld32(200) }         // msg1 magic (8 + 192)
    check(184L) { lg(2); ld32(204) }        // msg1 length
    lg(2); ci(208); raw(0x6A); ls(4)        // meta = inp + 208
    lg(2); ci(392); raw(0x6A); ls(5)        // body = inp + 208 + 184
    check(0x14L) { lg(4); ld32(0) }         // flatbuffer root offset
    check(4L) { lg(4); ld32(76) }           // exactly 4 buffers
    lg(4); ld32(64); ls(6)                  // n
    lg(4); ld32(80); ls(16)                 // c0 validity off
    lg(4); ld32(88); ls(17)                 // c0 validity len
    lg(4); ld32(96); ls(20)                 // c0 data off
    lg(4); ld32(112); ls(18)                // c1 validity off
    lg(4); ld32(120); ls(19)                // c1 validity len
    lg(4); ld32(128); ls(21)                // c1 data off
    // output geometry
    lg(6); ci(7); raw(0x6A); ci(3); raw(0x75); ls(8)        // vbytes = (n+7)>>3 (shr_s ok, n≥0)
    lg(8); ci(7); raw(0x6A); ci(-8); raw(0x71); ls(9)       // vpad = (vbytes+7) & ~7
    lg(9); lg(6); ci(3); raw(0x74); raw(0x6A); ls(15)       // bodyLen = vpad + 8n
    lg(15); ci(304); raw(0x6A); ls(14)                      // total = 296 + bodyLen + 8
    lg(14); call(0); ls(7)                                  // out = allocate(total)
    // copy the 296-byte template prefix (8-byte chunks; 296 % 8 == 0)
    ci(0); ls(10)
    block(); loop()
    lg(10); ci(296); raw(0x4F); brIf(1)                     // j >= 296
    lg(7); lg(10); raw(0x6A)
    ci(TemplateOff.toLong); lg(10); raw(0x6A); raw(0x29, 0x00, 0x00)
    raw(0x37, 0x00, 0x00)
    lg(10); ci(8); raw(0x6A); ls(10)
    br(0); end(); end()
    // patch the record-batch metadata (meta1 abs = out + 160)
    lg(7); lg(15); raw(0xAC); st64(160 + 24)                // bodyLength
    lg(7); lg(6); raw(0xAC); st64(160 + 64)                 // row count
    lg(7); lg(8); raw(0xAC); st64(160 + 88)                 // validity len
    lg(7); lg(9); raw(0xAC); st64(160 + 96)                 // data off
    lg(7); lg(6); ci(3); raw(0x74); raw(0xAC); st64(160 + 104) // data len
    lg(7); lg(6); raw(0xAC); st64(160 + 120)                // node length
    lg(7); ci(296); raw(0x6A); ls(12)                       // ob = out + 296
    // validity bytes + null count: the PURE vmask kernel — split out of
    // the shim so it is JIT-ELIGIBLE (no allocator global, no calls)
    lg(12)
    lg(5); lg(16); raw(0x6A)                                // va0 abs
    lg(17)
    lg(5); lg(18); raw(0x6A)                                // va1 abs
    lg(19)
    lg(9)                                                   // vpad
    lg(6)                                                   // n
    call(5); ls(13)
    lg(7); lg(13); raw(0xAC); st64(160 + 128)               // null count
    // data rows: the PURE rows kernel calling the (compiled) pow —
    // per-row work runs as a fully compiled chain
    lg(12); lg(9); raw(0x6A)                                // dataOut abs
    lg(5); lg(20); raw(0x6A)                                // d0 abs
    lg(5); lg(21); raw(0x6A)                                // d1 abs
    lg(6)
    call(6); raw(0x1A)
    // end-of-stream marker after the body
    lg(12); lg(15); raw(0x6A); ci(-1); st32(0)
    lg(12); lg(15); raw(0x6A); ci(0); st32(4)
    // bindgen record
    ci(12); call(0); ls(11)
    lg(11); lg(7); st32(0)
    lg(11); ci(21); st32(4)
    lg(11); lg(14); st32(8)
    ci(13); call(0); ls(10)
    lg(10); ci(0); st8(0)
    lg(10); lg(11); st32(1)
    lg(10); ci(1); st32(5)
    lg(10)
    end()
    a.result
  }

  /** pow(a, b) — C99 semantics; locals: 2 result(f64), 3 base(f64),
    * 4 e(i64). */
  private def powCode: Seq[Byte] = {
    val a = new Asm
    import a._
    val Inf = Double.PositiveInfinity
    def retIf(value: => Unit)(cond: => Unit): Unit = {
      block(); cond; raw(0x45); brIf(0); value; ret(); end()
    }
    // pow(x, ±0) = 1 (any x, incl. NaN); pow(1, y) = 1 (any y, incl NaN)
    retIf { cf(1.0) } { lg(1); cf(0.0); raw(0x61) }
    retIf { cf(1.0) } { lg(0); cf(1.0); raw(0x61) }
    // NaN propagation (after the two C99 NaN-eating cases above)
    retIf { lg(1) } { lg(1); lg(1); raw(0x62) }
    retIf { lg(0) } { lg(0); lg(0); raw(0x62) }
    // integer exponents, |b| < 2^62: square-and-multiply — IEEE
    // multiplication supplies the zero/inf/sign edge semantics exactly
    block()
    lg(1); raw(0x9D); lg(1); raw(0x61)                      // trunc(b) == b
    lg(1); raw(0x99); cf(4.611686018427388e18); raw(0x63)   // |b| < 2^62
    raw(0x71); raw(0x45); brIf(0)
    lg(1); raw(0x99); raw(0xB0); ls(4)                      // e = |b| as i64
    cf(1.0); ls(2)
    lg(0); ls(3)
    block(); loop()
    lg(4); raw(0x50); brIf(1)                               // e == 0
    lg(2); lg(3); raw(0xA2)
    lg(2)
    lg(4); cl(1); raw(0x83); cl(0); raw(0x52)               // (e & 1) != 0
    sel(); ls(2)
    lg(3); lg(3); raw(0xA2); ls(3)
    lg(4); cl(1); raw(0x88); ls(4)
    br(0); end(); end()
    cf(1.0); lg(2); raw(0xA3)                               // 1/result
    lg(2)
    lg(1); cf(0.0); raw(0x63)                               // b < 0
    sel(); ret()
    end()
    // b = ±inf or |b| ≥ 2^62 (all such values are even integers or inf;
    // pow(-1, ±inf) = 1 per C99)
    block()
    lg(1); raw(0x99); cf(4.611686018427388e18); raw(0x66)   // |b| >= 2^62
    raw(0x45); brIf(0)
    retIf { cf(1.0) } { lg(0); raw(0x99); cf(1.0); raw(0x61) } // |a| == 1
    cf(Inf); cf(0.0)
    lg(0); raw(0x99); cf(1.0); raw(0x64)                    // |a| > 1
    lg(1); cf(0.0); raw(0x64)                               // b > 0
    raw(0x46)                                               // same sign story
    sel(); ret()
    end()
    // b finite non-integer from here. a = ±inf → magnitude rule, sign +
    block()
    lg(0); raw(0x99); cf(Inf); raw(0x61); raw(0x45); brIf(0)
    cf(Inf); cf(0.0); lg(1); cf(0.0); raw(0x64); sel(); ret()
    end()
    // a = ±0 → +0 for b > 0, +inf for b < 0
    block()
    lg(0); cf(0.0); raw(0x61); raw(0x45); brIf(0)
    cf(0.0); cf(Inf); lg(1); cf(0.0); raw(0x64); sel(); ret()
    end()
    // a < 0 with non-integer b → NaN
    retIf { cf(Double.NaN) } { lg(0); cf(0.0); raw(0x63) }
    // general positive base: exp2(b * log2(a))
    lg(1); lg(0); call(3); raw(0xA2); call(4)
    end()
    a.result
  }

  /** log2(x), x > 0 finite — exponent extraction + atanh series.
    * Locals: 1 m(f64), 2 k(f64), 3 s(f64), 4 z(f64), 5 bits(i64). */
  private def log2Code: Seq[Byte] = {
    val a = new Asm
    import a._
    cf(0.0); ls(2)
    // subnormal rescue: x < DBL_MIN → x *= 2^54, k = -54
    block()
    lg(0); cf(2.2250738585072014e-308); raw(0x66); brIf(0)
    lg(0); cf(1.8014398509481984e16); raw(0xA2); ls(0)
    cf(-54.0); ls(2)
    end()
    lg(0); raw(0xBD); ls(5)
    // k += (bits >>> 52) - 1023
    lg(2)
    lg(5); cl(52); raw(0x88); cl(1023); raw(0x7D); raw(0xB9)
    raw(0xA0); ls(2)
    // m = mantissa with exponent forced to 0 → [1, 2)
    lg(5); cl(0x000FFFFFFFFFFFFFL); raw(0x83)
    cl(0x3FF0000000000000L); raw(0x84); raw(0xBF); ls(1)
    // fold the upper half: m > sqrt(2) → m/2, k+1  (s stays small)
    block()
    lg(1); cf(1.4142135623730951); raw(0x65); brIf(0)
    lg(1); cf(0.5); raw(0xA2); ls(1)
    lg(2); cf(1.0); raw(0xA0); ls(2)
    end()
    // s = (m-1)/(m+1); z = s²
    lg(1); cf(1.0); raw(0xA1); lg(1); cf(1.0); raw(0xA0); raw(0xA3); ls(3)
    lg(3); lg(3); raw(0xA2); ls(4)
    // ln(m)/(2s) = 1 + z/3 + z²/5 + … (Horner to z⁹/19); then
    // log2(x) = k + s · S · (2/ln2)
    lg(2)
    lg(3)
    cf(1.0 / 19)
    Seq(1.0 / 17, 1.0 / 15, 1.0 / 13, 1.0 / 11, 1.0 / 9,
      1.0 / 7, 1.0 / 5, 1.0 / 3, 1.0).foreach { c =>
      lg(4); raw(0xA2); cf(c); raw(0xA0)
    }
    raw(0xA2)                                   // s * S
    cf(2.8853900817779268); raw(0xA2)           // * 2/ln2
    raw(0xA0)                                   // + k
    end()
    a.result
  }

  /** exp2(y), y finite — integer/fraction split + exp series.
    * Locals: 1 n(f64), 2 t(f64), 3 ni(i64). */
  private def exp2Code: Seq[Byte] = {
    val a = new Asm
    import a._
    def retIf(value: => Unit)(cond: => Unit): Unit = {
      block(); cond; raw(0x45); brIf(0); value; ret(); end()
    }
    retIf { cf(Double.PositiveInfinity) } { lg(0); cf(1025.0); raw(0x66) }
    retIf { cf(0.0) } { lg(0); cf(-1075.0); raw(0x65) }
    lg(0); raw(0x9E); ls(1)                     // n = nearest(y)
    lg(0); lg(1); raw(0xA1)
    cf(0.6931471805599453); raw(0xA2); ls(2)    // t = (y-n)·ln2, |t| ≤ 0.347
    // e^t: 1 + t(1 + t/2(1 + t/3(…(1 + t/14)…)))
    cf(1.0)
    (14 to 1 by -1).foreach { k =>
      lg(2); raw(0xA2); cf(1.0 / k); raw(0xA2); cf(1.0); raw(0xA0)
    }
    lg(1); raw(0xB0); ls(3)                     // ni
    // normal scale: ni ≥ -1022 → p · 2^ni via exponent-field bits
    block()
    lg(3); cl(-1022); raw(0x53); brIf(0)
    lg(3); cl(1023); raw(0x7C); cl(52); raw(0x86); raw(0xBF); raw(0xA2)
    ret()
    end()
    // subnormal: p · 2^(ni+1074) (normal) · 2^-1074 (one extra rounding);
    // exponent-field bits = (ni + 1074) + 1023 = ni + 2097
    lg(3); cl(2097); raw(0x7C); cl(52); raw(0x86); raw(0xBF); raw(0xA2)
    cf(java.lang.Double.MIN_VALUE); raw(0xA2)
    end()
    a.result
  }

  /** vmask(ob, va0, v0len, va1, v1len, vpad, n) → null count: writes
    * the output validity bytes (AND of the input bitmaps; absent ⇒
    * all-valid; zero past the real bytes) and counts nulls over the n
    * real bits. Pure (no globals, no calls) — JIT-eligible, so the
    * per-batch bitmap work runs compiled. Locals: 7 j, 8 v, 9 nulls,
    * 10 vbytes. */
  private def vmaskCode: Seq[Byte] = {
    val a = new Asm
    import a._
    lg(6); ci(7); raw(0x6A); ci(3); raw(0x75); ls(10)       // vbytes
    ci(0); ls(9)
    ci(0); ls(7)
    block(); loop()
    lg(7); lg(5); raw(0x4F); brIf(1)                        // j >= vpad
    ci(255); ls(8)
    block()
    lg(7); lg(2); raw(0x4F); brIf(0)                        // j >= v0len
    lg(8); lg(1); lg(7); raw(0x6A); ld8(0); raw(0x71); ls(8)
    end()
    block()
    lg(7); lg(4); raw(0x4F); brIf(0)                        // j >= v1len
    lg(8); lg(3); lg(7); raw(0x6A); ld8(0); raw(0x71); ls(8)
    end()
    block()
    lg(7); lg(10); raw(0x48); brIf(0)                       // j < vbytes
    ci(0); ls(8)                                            // padding byte
    end()
    lg(0); lg(7); raw(0x6A); lg(8); st8(0)
    block()
    lg(7); lg(10); raw(0x4F); brIf(0)                       // only j < vbytes
    lg(9)
    lg(8); ci(-1); raw(0x73)                                // ~v
    ci(1)
    lg(6); lg(7); ci(3); raw(0x74); raw(0x6B)               // n-8j
    ci(8)
    lg(6); lg(7); ci(3); raw(0x74); raw(0x6B); ci(8); raw(0x48)
    sel()                                                   // bitsHere
    raw(0x74); ci(1); raw(0x6B)                             // mask
    raw(0x71); raw(0x69)                                    // & ; popcnt
    raw(0x6A); ls(9)
    end()
    lg(7); ci(1); raw(0x6A); ls(7)
    br(0); end(); end()
    lg(9)
    end()
    a.result
  }

  /** rows(dataOut, d0, d1, n) → 0: the per-row pow loop over absolute
    * pointers. Pure except the call to the eligible pow kernel — the
    * whole per-row chain compiles. Local: 4 i. */
  private def rowsCode: Seq[Byte] = {
    val a = new Asm
    import a._
    ci(0); ls(4)
    block(); loop()
    lg(4); lg(3); raw(0x4F); brIf(1)                        // i >= n
    lg(0); lg(4); ci(3); raw(0x74); raw(0x6A)               // dst
    lg(1); lg(4); ci(3); raw(0x74); raw(0x6A); ldf(0)
    lg(2); lg(4); ci(3); raw(0x74); raw(0x6A); ldf(0)
    call(2)
    stf(0)
    lg(4); ci(1); raw(0x6A); ls(4)
    br(0); end(); end()
    ci(0)
    end()
    a.result
  }

  /** Path of the artifact on local disk, written once per JVM. */
  lazy val path: String = {
    val f = java.nio.file.Files.createTempFile("graft_pow", ".wasm")
    java.nio.file.Files.write(f, bytes)
    f.toFile.deleteOnExit()
    f.toAbsolutePath.toString
  }
}
