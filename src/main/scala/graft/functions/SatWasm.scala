package graft.functions

/** The FOURTH from-scratch guest artifact (r18) — built to prove the
  * widened runtime surface on a real guest, not hand-picked unit bodies:
  * where [[PowWasm]]/[[EchoWasm]] are deliberately structured like the
  * reference's LLVM output (br-based control only, no 0xFC ops), SatWasm
  * uses the idioms a STOCK rustc/clang toolchain emits and the r17
  * runtime rejected at CREATE:
  *
  *  - if/else structured control (0x04/0x05) — nested and value-carrying
  *    in the `sat` kernel, statement-form in the shim's validity logic,
  *    and per-row inside the hot loop (valid → compute, null → zero);
  *  - `i64.trunc_sat_f64_s` (0xFC 6) on the kernel's in-range path;
  *  - `memory.copy` (0xFC 10) for the reply-template prefix and the
  *    validity-bitmap passthrough (replacing PowWasm's 8-byte-chunk
  *    copy loop);
  *  - `memory.fill` (0xFC 11) for validity-pad zeroing and the
  *    absent-bitmap all-valid case.
  *
  * ABI: identical to [[PowWasm]] — exports `allocate` and
  * `__wasm_udf_sat` speaking the wasmedge-bindgen protocol
  * (wasmedge_factory/src/udf.rs:89-115 is the host contract), parsing a
  * one-f64-column Arrow IPC batch and constructing a one-i64-column
  * reply from an embedded template. Semantics of `sat(x)`: exactly
  * `i64.trunc_sat_f64_s` (NaN→0, saturate at i64 bounds, trunc toward
  * zero) with NULLs passed through the validity bitmap — the q66 oracle
  * states the same piecewise definition in SQL.
  */
object SatWasm {

  // ---- little assembler (the PowWasm/EchoWasm public-grammar recipe,
  // plus the r18 surface: if/else + 0xFC encodings) ----
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
    def st8(off: Int): Unit = { raw(0x3A, 0x00); out ++= uleb(off.toLong) }
    def call(i: Int): Unit = { raw(0x10); out ++= uleb(i.toLong) }
    def block(): Unit = raw(0x02, 0x40)
    def loop(): Unit = raw(0x03, 0x40)
    def end(): Unit = raw(0x0B)
    def brIf(d: Int): Unit = { raw(0x0D); out ++= uleb(d.toLong) }
    def br(d: Int): Unit = { raw(0x0C); out ++= uleb(d.toLong) }
    def ret(): Unit = raw(0x0F)
    def sel(): Unit = raw(0x1B)
    // r18 surface
    def ifv(bt: Int): Unit = raw(0x04, bt) // 0x40 void, 0x7E i64, ...
    def els(): Unit = raw(0x05)
    def memCopy(): Unit = raw(0xFC, 0x0A, 0x00, 0x00)
    def memFill(): Unit = raw(0xFC, 0x0B, 0x00)
    def truncSatS64(): Unit = raw(0xFC, 0x06)
    def result: Seq[Byte] = out.result()
  }

  private val MsgBytes = "sat: unexpected batch shape".getBytes("UTF-8")
  private val MsgOff = 8

  /** Reply-stream template: the full prefix (schema message + record
    * batch metadata, 296 bytes) of a one-INT64-column IPC stream as this
    * JVM's Arrow writer produces it; the guest patches row count /
    * buffer lengths / null count and appends the body + EOS marker.
    * Same loud layout guard as PowWasm's template. */
  private lazy val template: Array[Byte] = {
    val enc = ArrowBatchCodec.encode(IndexedSeq(Array[Any](9L, 16L, 25L)), 3)
    def le32(p: Int): Int = (enc(p) & 0xFF) | ((enc(p + 1) & 0xFF) << 8) |
      ((enc(p + 2) & 0xFF) << 16) | ((enc(p + 3) & 0xFF) << 24)
    require(enc.length == 336 && le32(0) == -1 && le32(4) == 144 &&
      le32(152) == -1 && le32(156) == 136 && le32(160) == 0x14 &&
      le32(160 + 76) == 2,
      s"Arrow writer layout changed (len=${enc.length}): SatWasm's " +
        "reply template offsets no longer hold")
    java.util.Arrays.copyOf(enc, 296)
  }
  private val TemplateOff = 64
  // heap base: template ends at 64 + 296 = 360
  private val HeapBase = 360

  lazy val bytes: Array[Byte] = {
    // types: 0 (i32)->i32 allocate, 1 (i32,i32)->i32 shim,
    // 2 (f64)->i64 sat kernel, 3 (i32 x4)->i32 rows
    val typeSec = section(1, b(0x04,
      0x60, 0x01, 0x7F, 0x01, 0x7F,
      0x60, 0x02, 0x7F, 0x7F, 0x01, 0x7F,
      0x60, 0x01, 0x7C, 0x01, 0x7E,
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
      b(0x02) ++ export("allocate", 0) ++ export("__wasm_udf_sat", 1))
    def body(locals: Seq[Byte], code: Seq[Byte]): Seq[Byte] = {
      val fb = locals ++ code
      uleb(fb.length.toLong) ++ fb
    }
    val codeSec = section(10, b(0x04) ++
      body(b(0x01, 0x02, 0x7F), allocateCode) ++
      body(b(0x01, 0x10, 0x7F), shimCode) ++ // 16 i32 locals
      body(b(0x00), satCode) ++              // no locals
      body(b(0x01, 0x02, 0x7F), rowsCode))   // 2 i32 locals
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
    * EchoWasm/PowWasm allocator verbatim — same public recipe). */
  private def allocateCode: Seq[Byte] =
    b(0x23, 0x00, 0x21, 0x01, 0x20, 0x01, 0x20, 0x00,
      0x6A, 0x41, 0x07, 0x6A, 0x41, 0x78, 0x71, 0x24, 0x00, 0x23, 0x00) ++
      b(0x41) ++ sleb(65535) ++
      b(0x6A, 0x41, 0x10, 0x76, 0x21, 0x02,
        0x02, 0x40, 0x20, 0x02, 0x3F, 0x00, 0x4D, 0x0D, 0x00,
        0x20, 0x02, 0x3F, 0x00, 0x6B, 0x40, 0x00, 0x1A, 0x0B,
        0x20, 0x01, 0x0B)

  /** __wasm_udf_sat(pairs, n): parse the 1×f64 input batch, trunc-sat
    * per valid row, construct the 1×i64 reply from the template.
    * Locals: 2 inp, 3 tmp2, 4 meta, 5 body, 6 n, 7 out, 8 vbytes,
    * 9 vpad, 10 tmp, 11 ob, 12 nulls, 13 total, 14 bodyLen,
    * 15 vlen, 16 voff, 17 doff. */
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
    lg(0); ld32(0); ls(2)           // inp
    check(-1L) { lg(2); ld32(0) }   // stream magic
    check(144L) { lg(2); ld32(4) }  // the 1×f64 schema message
    check(-1L) { lg(2); ld32(152) } // msg1 magic (8 + 144)
    check(136L) { lg(2); ld32(156) } // msg1 length
    lg(2); ci(160); raw(0x6A); ls(4) // meta = inp + 160
    lg(2); ci(296); raw(0x6A); ls(5) // body = inp + 160 + 136
    check(0x14L) { lg(4); ld32(0) }  // flatbuffer root offset
    check(2L) { lg(4); ld32(76) }    // exactly 2 buffers
    lg(4); ld32(64); ls(6)           // n
    lg(4); ld32(80); ls(16)          // validity off
    lg(4); ld32(88); ls(15)          // validity len
    lg(4); ld32(96); ls(17)          // data off
    // output geometry
    lg(6); ci(7); raw(0x6A); ci(3); raw(0x75); ls(8)  // vbytes = (n+7)>>3
    lg(8); ci(7); raw(0x6A); ci(-8); raw(0x71); ls(9) // vpad = (vbytes+7) & ~7
    lg(9); lg(6); ci(3); raw(0x74); raw(0x6A); ls(14) // bodyLen = vpad + 8n
    lg(14); ci(304); raw(0x6A); ls(13)                // total = 296 + bodyLen + 8
    lg(13); call(0); ls(7)                            // out = allocate(total)
    // copy the 296-byte template prefix — ONE memory.copy, the op this
    // guest exists to prove (PowWasm does this with an 8-byte-chunk loop)
    lg(7); ci(TemplateOff.toLong); ci(296); memCopy()
    // patch the record-batch metadata (meta abs = out + 160)
    lg(7); lg(14); raw(0xAC); st64(160 + 24)          // bodyLength
    lg(7); lg(6); raw(0xAC); st64(160 + 64)           // row count
    lg(7); lg(8); raw(0xAC); st64(160 + 88)           // validity len
    lg(7); lg(9); raw(0xAC); st64(160 + 96)           // data off
    lg(7); lg(6); ci(3); raw(0x74); raw(0xAC); st64(160 + 104) // data len
    lg(7); lg(6); raw(0xAC); st64(160 + 120)          // node length
    lg(7); ci(296); raw(0x6A); ls(11)                 // ob = out + 296
    // validity region: zero the pad bytes, then the source bits —
    // statement-form if/else + memory.fill/copy doing real work
    lg(11); ci(0); lg(9); memFill()
    lg(15); raw(0x45)                                 // vlen == 0?
    ifv(0x40)
    lg(11); ci(0xFF); lg(8); memFill()                // absent ⇒ all-valid
    els()
    lg(11)
    lg(5); lg(16); raw(0x6A)                          // src = body + voff
    lg(15); lg(8); lg(15); lg(8); raw(0x49); sel()    // min(vlen, vbytes)
    memCopy()                                         // bitmap passthrough
    end()
    // per-row work: rows(vab=ob, dataOut=ob+vpad, dIn=body+doff, n) → nulls
    lg(11)
    lg(11); lg(9); raw(0x6A)
    lg(5); lg(17); raw(0x6A)
    lg(6)
    call(3); ls(12)
    lg(7); lg(12); raw(0xAC); st64(160 + 128)         // null count
    // end-of-stream marker after the body
    lg(11); lg(14); raw(0x6A); ci(-1); st32(0)
    lg(11); lg(14); raw(0x6A); ci(0); st32(4)
    // bindgen record
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

  /** sat(x: f64) -> i64 = i64.trunc_sat_f64_s, written as NESTED
    * value-carrying if/else over the piecewise definition (the branches
    * and the 0xFC op agree by construction — SatWasmSpec pins it against
    * the interpreter/JIT twins and the q66 oracle states it in SQL). */
  private def satCode: Seq[Byte] = {
    val a = new Asm
    import a._
    lg(0); lg(0); raw(0x62)                 // x != x ⇒ NaN
    ifv(0x7E)
    cl(0L)
    els()
    lg(0); cf(9.223372036854776e18); raw(0x66) // x >= 2^63
    ifv(0x7E)
    cl(Long.MaxValue)
    els()
    lg(0); cf(-9.223372036854776e18); raw(0x65) // x <= -2^63
    ifv(0x7E)
    cl(Long.MinValue)
    els()
    lg(0); truncSatS64()                    // in-range: plain trunc
    end()
    end()
    end()
    end()
    a.result
  }

  /** rows(vab, dataOut, dIn, n) -> null count: per-row if/else on the
    * validity bit — valid rows compute sat(), null rows store 0 and
    * count. Locals: 4 i, 5 nulls. */
  private def rowsCode: Seq[Byte] = {
    val a = new Asm
    import a._
    ci(0); ls(4); ci(0); ls(5)
    block(); loop()
    lg(4); lg(3); raw(0x4F); brIf(1)                  // i >= n
    lg(0); lg(4); ci(3); raw(0x76); raw(0x6A); ld8(0) // validity byte
    lg(4); ci(7); raw(0x71); raw(0x76)                // >> (i & 7)
    ci(1); raw(0x71)                                  // & 1
    ifv(0x40)
    lg(1); lg(4); ci(3); raw(0x74); raw(0x6A)         // dst
    lg(2); lg(4); ci(3); raw(0x74); raw(0x6A); ldf(0) // x
    call(2)                                           // sat(x)
    st64(0)
    els()
    lg(1); lg(4); ci(3); raw(0x74); raw(0x6A)
    cl(0L); st64(0)
    lg(5); ci(1); raw(0x6A); ls(5)                    // nulls += 1
    end()
    lg(4); ci(1); raw(0x6A); ls(4)
    br(0); end(); end()
    lg(5)
    end()
    a.result
  }

  /** Path of the artifact on local disk, written once per JVM. */
  lazy val path: String = {
    val f = java.nio.file.Files.createTempFile("graft_sat", ".wasm")
    java.nio.file.Files.write(f, bytes)
    f.toFile.deleteOnExit()
    f.toAbsolutePath.toString
  }
}
