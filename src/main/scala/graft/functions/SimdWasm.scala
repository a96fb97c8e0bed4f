package graft.functions

/** The FIFTH from-scratch guest artifact (r19) — built with the opt-in
  * SIMD surface a performance-minded guest author enables (`-C
  * target-feature=+simd128` in rustc terms), proving the r19 v128 core
  * end to end through `CREATE FUNCTION` + the Arrow IPC wire:
  *
  *  - the hot loop processes TWO f64 rows per iteration with v128 ops:
  *    `v128.load` → lane math → `v128.store`;
  *  - `f64x2.mul/add/sqrt`, `f64x2.splat`, and `|x|` via `v128.and`
  *    with a `v128.const` sign-clear mask (bit-identical to `f64.abs`);
  *  - a v128 LOCAL holds the loaded pair across the lane computation
  *    (the decode-time 2-slot local mapping);
  *  - an odd row count falls through to a SCALAR tail using the plain
  *    f64 ops — every elementary op is correctly rounded, so vector
  *    lanes ≡ scalar ≡ the SQL oracle bit-for-bit.
  *
  * ABI: identical to [[PowWasm]]/[[SatWasm]] — exports `allocate` and
  * `__wasm_udf_vmag` speaking the wasmedge-bindgen protocol
  * (wasmedge_factory/src/udf.rs:89-115 is the host contract), parsing a
  * one-f64-column Arrow IPC batch and constructing a one-f64-column
  * reply from an embedded template. Semantics of `vmag(x)`:
  * `sqrt(|x|) * 0.5 + x * x`, NULLs passed through the validity bitmap
  * — the q67 oracle states the same expression in SQL.
  */
object SimdWasm {

  // ---- little assembler (the SatWasm recipe + the r19 SIMD surface) ----
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
    def lt(i: Int): Unit = raw(0x22, i)
    def ci(v: Long): Unit = { raw(0x41); out ++= sleb(v) }
    def cf(v: Double): Unit = {
      raw(0x44)
      val bits = java.lang.Double.doubleToRawLongBits(v)
      out ++= (0 until 8).map(k => ((bits >> (8 * k)) & 0xFF).toByte)
    }
    def cl(v: Long): Unit = { raw(0x42); out ++= sleb(v) }
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
    def ifv(bt: Int): Unit = raw(0x04, bt)
    def els(): Unit = raw(0x05)
    def memCopy(): Unit = raw(0xFC, 0x0A, 0x00, 0x00)
    def memFill(): Unit = raw(0xFC, 0x0B, 0x00)
    // r19 SIMD surface
    private def simd(sub: Int): Unit = { raw(0xFD); out ++= uleb(sub.toLong) }
    def vLoad(off: Int): Unit = { simd(0); raw(0x00); out ++= uleb(off.toLong) }
    def vStore(off: Int): Unit = { simd(11); raw(0x00); out ++= uleb(off.toLong) }
    def vConst(lo: Long, hi: Long): Unit = {
      simd(12)
      out ++= (0 until 8).map(k => ((lo >> (8 * k)) & 0xFF).toByte)
      out ++= (0 until 8).map(k => ((hi >> (8 * k)) & 0xFF).toByte)
    }
    def f64x2Splat(): Unit = simd(20)
    def vAnd(): Unit = simd(78)
    def f64x2Add(): Unit = simd(240)
    def f64x2Mul(): Unit = simd(242)
    def f64x2Sqrt(): Unit = simd(239)
    def result: Seq[Byte] = out.result()
  }

  private val MsgBytes = "vmag: unexpected batch shape".getBytes("UTF-8")
  private val MsgOff = 8

  /** Reply-stream template: the full prefix (schema message + record
    * batch metadata, 296 bytes) of a one-f64-column IPC stream —
    * PowWasm's template, with the same loud layout guard. */
  private lazy val template: Array[Byte] = {
    val enc = ArrowBatchCodec.encode(IndexedSeq(Array[Any](9.0, 16.0, 25.0)), 3)
    def le32(p: Int): Int = (enc(p) & 0xFF) | ((enc(p + 1) & 0xFF) << 8) |
      ((enc(p + 2) & 0xFF) << 16) | ((enc(p + 3) & 0xFF) << 24)
    require(enc.length == 336 && le32(0) == -1 && le32(4) == 144 &&
      le32(152) == -1 && le32(156) == 136 && le32(160) == 0x14 &&
      le32(160 + 76) == 2,
      s"Arrow writer layout changed (len=${enc.length}): SimdWasm's " +
        "reply template offsets no longer hold")
    java.util.Arrays.copyOf(enc, 296)
  }
  private val TemplateOff = 64
  private val HeapBase = 360

  lazy val bytes: Array[Byte] = {
    // types: 0 (i32)->i32 allocate, 1 (i32,i32)->i32 shim,
    // 2 (f64)->f64 scalar kernel, 3 (i32 x4)->i32 vrows
    val typeSec = section(1, b(0x04,
      0x60, 0x01, 0x7F, 0x01, 0x7F,
      0x60, 0x02, 0x7F, 0x7F, 0x01, 0x7F,
      0x60, 0x01, 0x7C, 0x01, 0x7C,
      0x60, 0x04, 0x7F, 0x7F, 0x7F, 0x7F, 0x01, 0x7F))
    val funcSec = section(3, b(0x04, 0x00, 0x01, 0x02, 0x03))
    val memSec = section(5, b(0x01, 0x00, 0x01))
    val globalSec = section(6,
      b(0x01, 0x7F, 0x01, 0x41) ++ sleb(HeapBase.toLong) ++ b(0x0B))
    def export(name: String, idx: Int): Seq[Byte] = {
      val nb = name.getBytes("UTF-8")
      uleb(nb.length.toLong) ++ nb.toSeq ++ b(0x00) ++ uleb(idx.toLong)
    }
    val exportSec = section(7,
      b(0x02) ++ export("allocate", 0) ++ export("__wasm_udf_vmag", 1))
    def body(locals: Seq[Byte], code: Seq[Byte]): Seq[Byte] = {
      val fb = locals ++ code
      uleb(fb.length.toLong) ++ fb
    }
    val codeSec = section(10, b(0x04) ++
      body(b(0x01, 0x02, 0x7F), allocateCode) ++
      body(b(0x01, 0x10, 0x7F), shimCode) ++  // 16 i32 locals
      body(b(0x00), kernCode) ++              // no locals
      // vrows: 2 i32 locals (i, nulls) + ONE v128 local (the pair)
      body(b(0x02, 0x02, 0x7F, 0x01, 0x7B), vrowsCode))
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
    * PowWasm/EchoWasm/SatWasm allocator verbatim). */
  private def allocateCode: Seq[Byte] =
    b(0x23, 0x00, 0x21, 0x01, 0x20, 0x01, 0x20, 0x00,
      0x6A, 0x41, 0x07, 0x6A, 0x41, 0x78, 0x71, 0x24, 0x00, 0x23, 0x00) ++
      b(0x41) ++ sleb(65535) ++
      b(0x6A, 0x41, 0x10, 0x76, 0x21, 0x02,
        0x02, 0x40, 0x20, 0x02, 0x3F, 0x00, 0x4D, 0x0D, 0x00,
        0x20, 0x02, 0x3F, 0x00, 0x6B, 0x40, 0x00, 0x1A, 0x0B,
        0x20, 0x01, 0x0B)

  /** __wasm_udf_vmag(pairs, n): parse the 1×f64 input batch, compute
    * per valid row, construct the 1×f64 reply from the template — the
    * SatWasm shim with an f64 output template (same fixed offsets:
    * both replies are single-primitive-column streams).
    * Locals: 2 inp, 4 meta, 5 body, 6 n, 7 out, 8 vbytes, 9 vpad,
    * 10 tmp, 11 ob, 12 nulls, 13 total, 14 bodyLen, 15 vlen,
    * 16 voff, 17 doff. */
  private def shimCode: Seq[Byte] = {
    val a = new Asm
    import a._
    def errRet(): Unit = {
      ci(13); call(0); ls(10)
      lg(10); ci(1); st8(0)
      lg(10); ci(MsgOff.toLong); st32(1)
      lg(10); ci(MsgBytes.length.toLong); st32(5)
      lg(10); ret()
    }
    def check(expected: Long)(loadIt: => Unit): Unit = {
      block(); loadIt; ci(expected); raw(0x46); brIf(0); errRet(); end()
    }
    lg(0); ld32(0); ls(2)            // inp
    check(-1L) { lg(2); ld32(0) }    // stream magic
    check(144L) { lg(2); ld32(4) }   // the 1×f64 schema message
    check(-1L) { lg(2); ld32(152) }  // msg1 magic
    check(136L) { lg(2); ld32(156) } // msg1 length
    lg(2); ci(160); raw(0x6A); ls(4) // meta = inp + 160
    lg(2); ci(296); raw(0x6A); ls(5) // body = inp + 296
    check(0x14L) { lg(4); ld32(0) }  // flatbuffer root offset
    check(2L) { lg(4); ld32(76) }    // exactly 2 buffers
    lg(4); ld32(64); ls(6)           // n
    lg(4); ld32(80); ls(16)          // validity off
    lg(4); ld32(88); ls(15)          // validity len
    lg(4); ld32(96); ls(17)          // data off
    // output geometry
    lg(6); ci(7); raw(0x6A); ci(3); raw(0x75); ls(8)  // vbytes
    lg(8); ci(7); raw(0x6A); ci(-8); raw(0x71); ls(9) // vpad
    lg(9); lg(6); ci(3); raw(0x74); raw(0x6A); ls(14) // bodyLen
    lg(14); ci(304); raw(0x6A); ls(13)                // total
    lg(13); call(0); ls(7)                            // out
    lg(7); ci(TemplateOff.toLong); ci(296); memCopy() // template prefix
    lg(7); lg(14); raw(0xAC); st64(160 + 24)          // bodyLength
    lg(7); lg(6); raw(0xAC); st64(160 + 64)           // row count
    lg(7); lg(8); raw(0xAC); st64(160 + 88)           // validity len
    lg(7); lg(9); raw(0xAC); st64(160 + 96)           // data off
    lg(7); lg(6); ci(3); raw(0x74); raw(0xAC); st64(160 + 104) // data len
    lg(7); lg(6); raw(0xAC); st64(160 + 120)          // node length
    lg(7); ci(296); raw(0x6A); ls(11)                 // ob = out + 296
    lg(11); ci(0); lg(9); memFill()                   // zero validity pad
    lg(15); raw(0x45)
    ifv(0x40)
    lg(11); ci(0xFF); lg(8); memFill()                // absent ⇒ all-valid
    els()
    lg(11)
    lg(5); lg(16); raw(0x6A)
    lg(15); lg(8); lg(15); lg(8); raw(0x49); sel()
    memCopy()
    end()
    // per-row work: vrows(vab=ob, dataOut=ob+vpad, dIn=body+doff, n)
    lg(11)
    lg(11); lg(9); raw(0x6A)
    lg(5); lg(17); raw(0x6A)
    lg(6)
    call(3); ls(12)
    lg(7); lg(12); raw(0xAC); st64(160 + 128)         // null count
    lg(11); lg(14); raw(0x6A); ci(-1); st32(0)        // EOS marker
    lg(11); lg(14); raw(0x6A); ci(0); st32(4)
    ci(12); call(0); ls(10)
    lg(10); lg(7); st32(0)
    lg(10); ci(21); st32(4)
    lg(10); lg(13); st32(8)
    ci(13); call(0); ls(2)
    lg(2); ci(0); st8(0)
    lg(2); lg(10); st32(1)
    lg(2); ci(1); st32(5)
    lg(2)
    end()
    a.result
  }

  /** vmag(x: f64) -> f64 = sqrt(|x|) * 0.5 + x * x — the SCALAR twin of
    * the vector lanes (every elementary op is correctly rounded, so the
    * tail row matches the lanes bit-for-bit). */
  private def kernCode: Seq[Byte] = {
    val a = new Asm
    import a._
    lg(0); raw(0x99); raw(0x9F)      // sqrt(|x|)
    cf(0.5); raw(0xA2)               // * 0.5
    lg(0); lg(0); raw(0xA2)          // x * x
    raw(0xA0)                        // +
    end()
    a.result
  }

  /** vrows(vab, dataOut, dIn, n) -> null count. The VECTOR pass computes
    * two rows per iteration through v128 lanes (a v128 LOCAL carries the
    * loaded pair); an odd tail row goes through the scalar kernel; the
    * validity pass zeroes null rows and counts them.
    * Locals: 4 i, 5 nulls, 6 the v128 pair. */
  private def vrowsCode: Seq[Byte] = {
    val a = new Asm
    import a._
    val SignClear = 0x7FFFFFFFFFFFFFFFL
    ci(0); ls(4); ci(0); ls(5)
    // ---- vector pass: while (i + 2 <= n) ----
    block(); loop()
    lg(4); ci(2); raw(0x6A); lg(3); raw(0x4A); brIf(1)  // i+2 > n ⇒ out
    // dst addr FIRST (under the value for v128.store)
    lg(1); lg(4); ci(3); raw(0x74); raw(0x6A)
    // X = v128.load(dIn + 8i), kept in the v128 local
    lg(2); lg(4); ci(3); raw(0x74); raw(0x6A); vLoad(0)
    lt(6)                                                // tee pair
    // sqrt(|X|) * splat(0.5)
    vConst(SignClear, SignClear); vAnd(); f64x2Sqrt()
    cf(0.5); f64x2Splat(); f64x2Mul()
    // + X * X
    lg(6); lg(6)
    f64x2Mul()
    f64x2Add()
    vStore(0)
    lg(4); ci(2); raw(0x6A); ls(4)
    br(0); end(); end()
    // ---- scalar tail (n odd): one row through the scalar kernel ----
    lg(4); lg(3); raw(0x48)                              // i < n ?
    ifv(0x40)
    lg(1); lg(4); ci(3); raw(0x74); raw(0x6A)
    lg(2); lg(4); ci(3); raw(0x74); raw(0x6A); ldf(0)
    call(2)
    stf(0)
    end()
    // ---- validity pass: zero null rows, count them ----
    ci(0); ls(4)
    block(); loop()
    lg(4); lg(3); raw(0x4F); brIf(1)                     // i >= n
    lg(0); lg(4); ci(3); raw(0x76); raw(0x6A); ld8(0)
    lg(4); ci(7); raw(0x71); raw(0x76)
    ci(1); raw(0x71)
    raw(0x45)                                            // invalid?
    ifv(0x40)
    lg(1); lg(4); ci(3); raw(0x74); raw(0x6A)
    cl(0L); st64(0)
    lg(5); ci(1); raw(0x6A); ls(5)
    end()
    lg(4); ci(1); raw(0x6A); ls(4)
    br(0); end(); end()
    lg(5)
    end()
    a.result
  }

  /** Path of the artifact on local disk, written once per JVM. */
  lazy val path: String = {
    val f = java.nio.file.Files.createTempFile("graft_simd", ".wasm")
    java.nio.file.Files.write(f, bytes)
    f.toFile.deleteOnExit()
    f.toAbsolutePath.toString
  }
}
