package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** From-scratch JPEG (ITU-T T.81) decoder — BASELINE (SOF0/SOF1) and,
  * since r19, PROGRESSIVE (SOF2) — the last codec in the lineage that
  * still leaned on a JDK library (r17 verdict "What's missing" #2: PNG
  * inflate, gzip, zstd, BMP, WAV are all from-scratch; JPEG pixel
  * decode was ImageIO-backed). Implemented purely from the public spec:
  *
  *  - marker walk (SOI, APPn/COM skip, DQT 8/16-bit, DHT, SOF0/1/2,
  *    DRI, SOS, EOI); arithmetic coding and lossless → NULL;
  *  - canonical Huffman decode per Annex C/F (mincode/maxcode/valptr),
  *    DC difference coding with EXTEND, AC run-length with ZRL and EOB;
  *  - the entropy bitstream's 0xFF 0x00 byte stuffing and RSTn restart
  *    markers (DC predictors + bit buffer reset per F.2.1.3.1);
  *  - PROGRESSIVE scans per Annex G.1.2: spectral selection (per-band
  *    single-component AC scans with EOBn run coding) and successive
  *    approximation (DC first/refine at point transform Al, AC
  *    first/refine with correction bits), interleaved and single-
  *    component DC scans, restarts resetting predictors + EOB runs;
  *    coefficients accumulate across scans and dequant+IDCT run once
  *    at EOI (a progressive image larger than [[maxPixels]]/4 is
  *    rejected — the coefficient buffer is the decoder's only
  *    whole-image allocation, and the bound keeps it ≤ ~50 MB);
  *  - dequantization in zigzag order, separable double-precision IDCT
  *    (A.3.3 — DC-only blocks decode EXACTLY under it, the property the
  *    p273/p274 construction-algebra oracles rely on);
  *  - 1-component grayscale and 3-component YCbCr with sampling factors
  *    1-2 (4:4:4 / 4:2:2 / 4:2:0 and the transposed variants), JFIF
  *    full-range YCbCr→RGB.
  *
  * Tolerant-parse contract (mid-crawl truncation is data, not an
  * error): returns NULL — never throws — on anything that is not a
  * complete supported baseline JPEG. ImageIO remains only as the TEST
  * ground truth (MultimodalSpec pins this decoder against it with a
  * pixel tolerance — IDCT rounding is implementation-defined, which is
  * exactly why the oracle-checked entry uses DC-only construction where
  * every conforming IDCT is exact).
  */
object Jpeg {

  /** Largest accepted w*h (same guard rationale as [[Png.maxPixels]]). */
  val maxPixels: Long = 1L << 24

  // zigzag index -> natural (row-major) index
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: c(u) * cos((2x+1) u pi / 16) / 2, per A.3.3
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu * math.cos((2 * x + 1) * u * math.Pi / 16.0) * 0.5
  }

  /** Canonical Huffman table in decode form (Annex F.2.2.3). */
  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private final class Corrupt extends RuntimeException { override def fillInStackTrace(): Throwable = this }
  private def fail(): Nothing = throw new Corrupt

  /** Entropy-segment bit reader with 0xFF-stuffing and restart support. */
  private final class Bits(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    /** true when positioned at a marker (0xFF xx, xx != 0) */
    def atMarker: Boolean =
      pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF && b(pos + 1) != 0
    def markerByte: Int = b(pos + 1) & 0xFF
    def skipMarker(): Unit = { pos += 2; acc = 0; nbits = 0 }
    /** Consume a stuffed 0xFF 0x00 pad pair left by an encoder whose
      * 1-fill pad bits completed a 0xFF byte right before a marker
      * (legal in conforming streams; libjpeg skips it the same way).
      * At most one such pair can precede a marker. */
    def skipStuffedPad(): Unit =
      if (pos + 1 < b.length && (b(pos) & 0xFF) == 0xFF && b(pos + 1) == 0) {
        pos += 2; acc = 0; nbits = 0
      }
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) fail()
        val v = b(pos) & 0xFF
        if (v == 0xFF) {
          if (pos + 1 >= b.length) fail()
          if (b(pos + 1) == 0) pos += 2 // stuffed 0xFF
          else fail() // marker mid-symbol: truncated scan
        } else pos += 1
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.values(h.valPtr(l) + code - h.minCode(l)) & 0xFF
        code = (code << 1) | bit()
        l += 1
      }
      fail()
    }
  }

  /** EXTEND per F.2.2.1: map an s-bit magnitude to its signed value. */
  @inline private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Separable double-precision IDCT (A.3.3) of one dequantized block
    * (`coef`, natural order) into `plane` at (px, py); `tmp` is a
    * caller-provided 64-slot scratch. Shared by the baseline streaming
    * path and the progressive finish pass. */
  private def idctToPlane(coef: Array[Double], tmp: Array[Double],
      plane: Array[Byte], pw: Int, px: Int, py: Int): Unit = {
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cos(u)(x) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += Cos(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        val px8 = math.rint(acc + 128.0)
        val clamped = if (px8 < 0) 0 else if (px8 > 255) 255 else px8.toInt
        plane((py + y) * pw + (px + x)) = clamped.toByte
        x += 1
      }
      y += 1
    }
  }

  /** Full decode to `(w, h, rgb)` — rgb row-major top-down, 3 bytes per
    * pixel (gray replicated) — or null. Package-visible so specs can pin
    * exact pixels against ImageIO. */
  private[graft] def decodeRgb(b: Array[Byte]): (Int, Int, Array[Byte]) =
    try decode0(b) catch {
      case _: Corrupt => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }

  private def decode0(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null // SOI
    var i = 2
    val quant = new Array[Array[Int]](4) // zigzag order
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var w = 0; var h = 0
    var ncomp = 0
    // per component: id, hi, vi, tq; scan: dc table, ac table
    val compId = new Array[Int](3); val compH = new Array[Int](3)
    val compV = new Array[Int](3); val compQ = new Array[Int](3)
    val compDc = new Array[Int](3); val compAc = new Array[Int](3)
    var restartInterval = 0
    var sofSeen = false
    var scanStart = -1
    // progressive (SOF2) state: coefficients accumulate across scans in
    // ZIGZAG order as raw ints; dequant + IDCT run once at EOI
    var progressive = false
    var eoiSeen = false
    var pCoefs: Array[Array[Int]] = null
    var pMcusX = 0; var pMcusY = 0
    var pHmax = 0; var pVmax = 0
    val pBpl = new Array[Int](3) // full (MCU-padded) blocks per line
    val pBlines = new Array[Int](3)

    def be16(p: Int): Int = {
      if (p + 2 > b.length) fail()
      ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
    }

    /** One progressive scan (Annex G.1.2): updates pCoefs from the
      * entropy data starting at `entStart`, returns the position of the
      * next marker. */
    def progScan(scanComp: Array[Int], ss: Int, se: Int, ah: Int,
        al: Int, entStart: Int): Int = {
      val isDc = ss == 0
      if (isDc && se != 0) fail()
      if (!isDc && (scanComp.length != 1 || se < ss || se > 63)) fail()
      if (ah != 0 && al != ah - 1) fail() // successive approx steps by 1
      if (al > 13) fail()
      if (isDc && ah == 0)
        scanComp.foreach(c => if (dcTab(compDc(c)) == null) fail())
      if (!isDc && acTab(compAc(scanComp(0))) == null) fail()
      val bits = new Bits(b, entStart)
      val pred = new Array[Int](ncomp)
      var eobrun = 0
      val p1 = 1 << al
      val m1 = -1 << al
      def refineBit(pc: Array[Int], idx: Int): Unit =
        if (bits.bit() != 0 && (pc(idx) & p1) == 0) {
          if (pc(idx) >= 0) pc(idx) += p1 else pc(idx) += m1
        }
      def dcFirst(c: Int, pc: Array[Int], base: Int): Unit = {
        val t = bits.decode(dcTab(compDc(c)))
        if (t > 11) fail()
        pred(c) += extend(bits.bits(t), t)
        pc(base) = pred(c) << al
      }
      def dcRefine(pc: Array[Int], base: Int): Unit =
        if (bits.bit() != 0) pc(base) |= p1
      def acFirst(c: Int, pc: Array[Int], base: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = bits.decode(acTab(compAc(c)))
          val r = (rs >> 4) & 0xF; val sb = rs & 0xF
          if (sb == 0) {
            if (r == 15) k += 16 // ZRL
            else { // EOBn: run = 2^r + extra bits, current block included
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += bits.bits(r)
              done = true
            }
          } else {
            k += r
            if (k > se) fail()
            pc(base + k) = extend(bits.bits(sb), sb) << al
            k += 1
          }
        }
      }
      def acRefine(c: Int, pc: Array[Int], base: Int): Unit = {
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val rs = bits.decode(acTab(compAc(c)))
            var r = (rs >> 4) & 0xF; val sb = rs & 0xF
            var insert = 0
            if (sb == 0) {
              if (r != 15) { // EOBn: rest of this block refines below
                eobrun = 1 << r
                if (r > 0) eobrun += bits.bits(r)
                done = true
              }
              // r == 15 (ZRL): skip 16 zero-history slots below
            } else {
              if (sb != 1) fail() // refinement codes magnitude 1 only
              insert = if (bits.bit() != 0) p1 else m1
            }
            if (!done) {
              var placed = false
              while (k <= se && !placed) {
                val idx = base + k
                if (pc(idx) != 0) refineBit(pc, idx)
                else if (r == 0) {
                  if (insert != 0) pc(idx) = insert
                  placed = true
                } else r -= 1
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) { // correction bits for the block's remainder
          while (k <= se) {
            val idx = base + k
            if (pc(idx) != 0) refineBit(pc, idx)
            k += 1
          }
          eobrun -= 1
        }
      }
      // scan geometry: >1 component = interleaved over the FRAME MCU
      // grid; a single-component scan walks the component's own ceil
      // raster (A.2.3) — its padded columns/rows stay untouched
      val interleaved = scanComp.length > 1
      val c0 = scanComp(0)
      val bwS = if (interleaved) pMcusX
        else ((w * compH(c0) + pHmax * 8 - 1) / (pHmax * 8))
      val bhS = if (interleaved) pMcusY
        else ((h * compV(c0) + pVmax * 8 - 1) / (pVmax * 8))
      val totalUnits = bwS * bhS
      var unit = 0
      while (unit < totalUnits) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          bits.skipStuffedPad()
          if (!bits.atMarker) fail()
          val m = bits.markerByte
          if (m < 0xD0 || m > 0xD7) fail()
          bits.skipMarker()
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }
        if (interleaved) {
          val mx = unit % bwS; val my = unit / bwS
          var sIdx = 0
          while (sIdx < scanComp.length) {
            val c = scanComp(sIdx)
            val pc = pCoefs(c)
            var by = 0
            while (by < compV(c)) {
              var bx = 0
              while (bx < compH(c)) {
                val base =
                  ((my * compV(c) + by) * pBpl(c) + mx * compH(c) + bx) * 64
                if (ah == 0) dcFirst(c, pc, base) else dcRefine(pc, base)
                bx += 1
              }
              by += 1
            }
            sIdx += 1
          }
        } else {
          val bx = unit % bwS; val by = unit / bwS
          val base = (by * pBpl(c0) + bx) * 64
          val pc = pCoefs(c0)
          if (isDc) {
            if (ah == 0) dcFirst(c0, pc, base) else dcRefine(pc, base)
          } else {
            if (ah == 0) acFirst(c0, pc, base) else acRefine(c0, pc, base)
          }
        }
        unit += 1
      }
      bits.skipStuffedPad()
      bits.pos
    }

    while (scanStart < 0 && !eoiSeen) {
      // expect a marker; tolerate fill bytes
      if (i + 2 > b.length) return null
      if ((b(i) & 0xFF) != 0xFF) return null
      while (i < b.length && (b(i) & 0xFF) == 0xFF) i += 1
      if (i >= b.length) return null
      val marker = b(i) & 0xFF; i += 1
      marker match {
        case 0xD8 => () // stray SOI
        case 0xD9 => // EOI: ends a progressive frame; premature otherwise
          if (progressive && pCoefs != null) eoiSeen = true
          else return null
        case 0xDB => // DQT
          val len = be16(i); val end = i + len
          if (len < 2 || end > b.length) return null
          var p = i + 2
          while (p < end) {
            val pq = (b(p) & 0xF0) >> 4; val tq = b(p) & 0x0F
            if (tq > 3 || pq > 1) return null
            p += 1
            val q = new Array[Int](64)
            var k = 0
            while (k < 64) {
              if (pq == 1) {
                // bound against the DQT segment end, not just the blob —
                // a short segment must not read the next marker's bytes
                if (p + 2 > end) return null
                q(k) = be16(p); p += 2
              }
              else { if (p >= end) return null; q(k) = b(p) & 0xFF; p += 1 }
              if (q(k) == 0) return null
              k += 1
            }
            quant(tq) = q
          }
          i = end
        case 0xC4 => // DHT
          val len = be16(i); val end = i + len
          if (len < 2 || end > b.length) return null
          var p = i + 2
          while (p < end) {
            val tc = (b(p) & 0xF0) >> 4; val th = b(p) & 0x0F
            if (tc > 1 || th > 3) return null
            p += 1
            if (p + 16 > end) return null
            val counts = Array.tabulate(16)(k => b(p + k) & 0xFF)
            p += 16
            val total = counts.sum
            if (total > 256 || p + total > end) return null
            val vals = java.util.Arrays.copyOfRange(b, p, p + total)
            p += total
            val t = new Huff(counts, vals)
            if (tc == 0) dcTab(th) = t else acTab(th) = t
          }
          i = end
        case 0xC0 | 0xC1 | 0xC2 => // SOF0 baseline / SOF1 extended
          // sequential (same decode) / SOF2 progressive (r19)
          val len = be16(i); val end = i + len
          if (len < 8 || end > b.length || sofSeen) return null
          if ((b(i + 2) & 0xFF) != 8) return null // precision
          progressive = marker == 0xC2
          h = be16(i + 3); w = be16(i + 5)
          ncomp = b(i + 7) & 0xFF
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return null
          // the progressive coefficient buffer is the decoder's only
          // whole-image allocation (4 B/coefficient/component) — bound
          // it separately so a dimension bomb cannot force ~200 MB
          if (progressive && w.toLong * h > maxPixels / 4) return null
          if (ncomp != 1 && ncomp != 3) return null
          if (len != 8 + 3 * ncomp) return null
          var c = 0
          while (c < ncomp) {
            compId(c) = b(i + 8 + 3 * c) & 0xFF
            val hv = b(i + 9 + 3 * c) & 0xFF
            compH(c) = (hv >> 4) & 0xF; compV(c) = hv & 0xF
            compQ(c) = b(i + 10 + 3 * c) & 0xFF
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              return null // factors 1-2 cover 4:4:4 / 4:2:2 / 4:2:0
            if (compQ(c) > 3) return null
            c += 1
          }
          sofSeen = true
          i = end
        case m if m >= 0xC3 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          return null // lossless / differential / arithmetic: unsupported
        case 0xDD => // DRI
          val len = be16(i)
          if (len != 4 || i + 4 > b.length) return null
          restartInterval = be16(i + 2)
          i += len
        case 0xDA => // SOS
          if (!sofSeen) return null
          val len = be16(i); val end = i + len
          if (end > b.length) return null
          val ns = b(i + 2) & 0xFF
          if (progressive) {
            // progressive: 1..ncomp components per scan; decode the
            // scan's entropy data NOW and continue the marker walk
            if (ns < 1 || ns > ncomp || len != 6 + 2 * ns) return null
            if (pCoefs == null) {
              // frame geometry, latched at the first scan: single-
              // component frames normalize factors like the baseline
              // path so the MCU grid degenerates to the block raster
              if (ncomp == 1) { compH(0) = 1; compV(0) = 1 }
              pHmax = (0 until ncomp).map(compH).max
              pVmax = (0 until ncomp).map(compV).max
              pMcusX = (w + 8 * pHmax - 1) / (8 * pHmax)
              pMcusY = (h + 8 * pVmax - 1) / (8 * pVmax)
              var c = 0
              while (c < ncomp) {
                pBpl(c) = pMcusX * compH(c)
                pBlines(c) = pMcusY * compV(c)
                c += 1
              }
              pCoefs = Array.tabulate(ncomp)(c =>
                new Array[Int](pBpl(c) * pBlines(c) * 64))
            }
            val scanComp = new Array[Int](ns)
            var s = 0
            while (s < ns) {
              val cs = b(i + 3 + 2 * s) & 0xFF
              val c = compId.indexOf(cs)
              if (c < 0 || c >= ncomp) return null
              scanComp(s) = c
              val tt = b(i + 4 + 2 * s) & 0xFF
              compDc(c) = (tt >> 4) & 0xF; compAc(c) = tt & 0xF
              if (compDc(c) > 3 || compAc(c) > 3) return null
              s += 1
            }
            val ss = b(i + 3 + 2 * ns) & 0xFF
            val se = b(i + 4 + 2 * ns) & 0xFF
            val ahal = b(i + 5 + 2 * ns) & 0xFF
            i = progScan(scanComp, ss, se, (ahal >> 4) & 0xF, ahal & 0xF, end)
          } else {
            if (ns != ncomp || len != 6 + 2 * ns) return null
            var s = 0
            while (s < ns) {
              val cs = b(i + 3 + 2 * s) & 0xFF
              val c = compId.indexOf(cs)
              if (c < 0 || c >= ncomp) return null
              val tt = b(i + 4 + 2 * s) & 0xFF
              compDc(c) = (tt >> 4) & 0xF; compAc(c) = tt & 0xF
              if (compDc(c) > 3 || compAc(c) > 3) return null
              s += 1
            }
            // Ss=0, Se=63, AhAl=0 for baseline
            if ((b(i + 3 + 2 * ns) & 0xFF) != 0 ||
                (b(i + 4 + 2 * ns) & 0xFF) != 63) return null
            scanStart = end
          }
        case m if (m >= 0xE0 && m <= 0xEF) || m == 0xFE => // APPn / COM
          val len = be16(i)
          if (len < 2 || i + len > b.length) return null
          i += len
        case 0x01 => () // TEM, standalone
        case m if m >= 0xD0 && m <= 0xD7 => () // stray RST, standalone
        case _ =>
          val len = be16(i)
          if (len < 2 || i + len > b.length) return null
          i += len
      }
    }

    // validate the tables the finish needs (progressive scans validated
    // their own Huffman tables per scan)
    var c = 0
    while (c < ncomp) {
      if (quant(compQ(c)) == null) return null
      if (!progressive && (dcTab(compDc(c)) == null ||
          acTab(compAc(c)) == null)) return null
      c += 1
    }
    // a single-component scan is always NON-interleaved (T.81 A.2.3):
    // the MCU is one data unit and sampling factors do not subsample a
    // component against itself — normalize them so the MCU walk below
    // (written for the interleaved case) degenerates to a plain raster
    // of ceil(w/8) x ceil(h/8) blocks
    if (ncomp == 1) { compH(0) = 1; compV(0) = 1 }
    val hmax = (0 until ncomp).map(compH).max
    val vmax = (0 until ncomp).map(compV).max
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component planes at their own resolution
    val planeW = Array.tabulate(ncomp)(c => mcusX * 8 * compH(c))
    val planeH = Array.tabulate(ncomp)(c => mcusY * 8 * compV(c))
    val planes = Array.tabulate(ncomp)(c => new Array[Byte](planeW(c) * planeH(c)))

    if (progressive) {
      // finish pass: dequantize the accumulated coefficients (zigzag
      // ints) and IDCT every block of every component's padded grid
      val coefD = new Array[Double](64)
      val tmpD = new Array[Double](64)
      var c2 = 0
      while (c2 < ncomp) {
        val q = quant(compQ(c2))
        val pc = pCoefs(c2)
        val plane = planes(c2); val pw = planeW(c2)
        var by = 0
        while (by < pBlines(c2)) {
          var bx = 0
          while (bx < pBpl(c2)) {
            val base = (by * pBpl(c2) + bx) * 64
            java.util.Arrays.fill(coefD, 0.0)
            var k = 0
            while (k < 64) {
              val v = pc(base + k)
              if (v != 0) coefD(Zigzag(k)) = v.toDouble * q(k)
              k += 1
            }
            idctToPlane(coefD, tmpD, plane, pw, bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
        c2 += 1
      }
      return colorConvert(w, h, ncomp, planes, planeW, hmax, vmax,
        compH, compV)
    }

    val bits = new Bits(b, scanStart)
    val pred = new Array[Int](ncomp)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)

    def decodeBlock(c: Int, px: Int, py: Int): Unit = {
      java.util.Arrays.fill(coef, 0.0)
      val q = quant(compQ(c))
      // DC
      val t = bits.decode(dcTab(compDc(c)))
      if (t > 11) fail()
      val diff = extend(bits.bits(t), t)
      pred(c) += diff
      coef(0) = pred(c).toDouble * q(0)
      // AC
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = bits.decode(acTab(compAc(c)))
        val r = (rs >> 4) & 0xF; val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 else eob = true // ZRL / EOB
        } else {
          k += r
          if (k > 63) fail()
          coef(Zigzag(k)) = extend(bits.bits(s), s).toDouble * q(k)
          k += 1
        }
      }
      idctToPlane(coef, tmp, planes(c), planeW(c), px, py)
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // expect RSTn (cyclic), reset predictors + bit alignment;
        // a stuffed 0xFF 0x00 produced by the pad bits may sit between
        // the entropy data and the marker — consume it first
        bits.skipStuffedPad()
        if (!bits.atMarker) fail()
        val m = bits.markerByte
        if (m < 0xD0 || m > 0xD7) fail()
        bits.skipMarker()
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c2 = 0
      while (c2 < ncomp) {
        var by = 0
        while (by < compV(c2)) {
          var bx = 0
          while (bx < compH(c2)) {
            decodeBlock(c2, (mx * compH(c2) + bx) * 8, (my * compV(c2) + by) * 8)
            bx += 1
          }
          by += 1
        }
        c2 += 1
      }
      mcu += 1
    }

    colorConvert(w, h, ncomp, planes, planeW, hmax, vmax, compH, compV)
  }

  /** Crop the decoded planes to (w, h) and convert to packed RGB —
    * gray replicated for 1-component frames, JFIF full-range
    * YCbCr→RGB with nearest-sample chroma upsampling for 3. Shared by
    * the baseline and progressive paths. */
  private def colorConvert(w: Int, h: Int, ncomp: Int,
      planes: Array[Array[Byte]], planeW: Array[Int], hmax: Int,
      vmax: Int, compH: Array[Int],
      compV: Array[Int]): (Int, Int, Array[Byte]) = {
    val rgb = new Array[Byte](w * h * 3)
    if (ncomp == 1) {
      val plane = planes(0); val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = plane(y * pw + x)
          val p = (y * w + x) * 3
          rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // nearest-sample chroma upsampling: comp pixel at
          // (x * hi / hmax, y * vi / vmax)
          def sample(c: Int): Int = {
            val sx = x * compH(c) / hmax
            val sy = y * compV(c) / vmax
            planes(c)(sy * planeW(c) + sx) & 0xFF
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def cl(d: Double): Byte = {
            val r = math.rint(d)
            (if (r < 0) 0 else if (r > 255) 255 else r.toInt).toByte
          }
          val p = (y * w + x) * 3
          rgb(p) = cl(yy + 1.402 * cr)
          rgb(p + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(p + 2) = cl(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    (w, h, rgb)
  }

  // -----------------------------------------------------------------------
  // deterministic DC-only grayscale encoder — the construction side of the
  // p273 oracle algebra: with an all-ones quant table, block (bx,by) set
  // flat to value v encodes DC coefficient (v-128)*8, and EVERY conforming
  // IDCT decodes it back to exactly v (A.3.3 is exact on DC-only blocks).
  // Emits a fully standard baseline stream: DQT, SOF0, the Annex K.3.1
  // typical luminance Huffman tables, optional DRI + cyclic RSTn markers,
  // 0xFF byte stuffing — so the decoder's marker/Huffman/restart machinery
  // is genuinely exercised, not a toy subset.
  // -----------------------------------------------------------------------

  /** Annex K.3.1 typical luminance DC table (public spec). */
  private val StdDcCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals: Array[Byte] =
    Array.tabulate[Byte](12)(_.toByte)
  /** Annex K.3.2 typical luminance AC table (counts + the value list). */
  private val StdAcCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val StdAcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA).map(_.toByte)

  /** (code, length) per symbol from canonical counts/values. */
  private def encTable(counts: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < counts(l - 1)) {
        out(vals(k) & 0xFF) = (code, l)
        code += 1; k += 1; c += 1
      }
      code <<= 1
      l += 1
    }
    out
  }
  private lazy val DcEnc = encTable(StdDcCounts, StdDcVals)
  private lazy val AcEnc = encTable(StdAcCounts, StdAcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = {
      if (n > 0) {
        acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1) // pad with 1s
        out.write(acc & 0xFF)
        if ((acc & 0xFF) == 0xFF) out.write(0)
        acc = 0; n = 0
      }
    }
  }

  /** Encode a grayscale baseline JPEG whose 8×8 block (bx, by) is FLAT
    * at `grid(by)(bx)` (values 0-255), quant all-ones, standard Annex K
    * tables, restart markers every `restart` MCUs (0 = none). Image is
    * (8*cols) × (8*rows). Decoding it — with ANY conforming IDCT — gives
    * back the grid exactly. */
  private[graft] def encodeFlatBlocks(grid: Array[Array[Int]],
                                      restart: Int = 0): Array[Byte] = {
    val rows = grid.length
    val cols = grid(0).length
    val w = cols * 8; val h = rows * 8
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xFF); out.write(mk) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8) // SOI
    m(0xDB); be16(2 + 1 + 64); out.write(0x00) // DQT: 8-bit, id 0
    (0 until 64).foreach(_ => out.write(1))
    m(0xC0); be16(8 + 3); out.write(8); be16(h); be16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // comp 1, 1x1, q0
    def dht(tc: Int, counts: Array[Int], vals: Array[Byte]): Unit = {
      m(0xC4); be16(2 + 1 + 16 + vals.length); out.write((tc << 4) | 0)
      counts.foreach(out.write)
      out.write(vals)
    }
    dht(0, StdDcCounts, StdDcVals)
    dht(1, StdAcCounts, StdAcVals)
    if (restart > 0) { m(0xDD); be16(4); be16(restart) }
    m(0xDA); be16(6 + 2); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    var bw = new BitWriter(out)
    var pred = 0
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < rows) {
      var bx = 0
      while (bx < cols) {
        if (restart > 0 && mcu > 0 && mcu % restart == 0) {
          bw.flush()
          m(0xD0 + (rst & 7)); rst += 1
          bw = new BitWriter(out)
          pred = 0
        }
        val v = grid(by)(bx)
        val dc = (v - 128) * 8 // quant 1: dequantized DC, flat block = v
        val diff = dc - pred
        pred = dc
        // category + magnitude bits per F.1.2.1.1 / EXTEND inverse
        var s = 0
        var mag = math.abs(diff)
        while (mag > 0) { s += 1; mag >>= 1 }
        val (code, len) = DcEnc(s)
        bw.put(code, len)
        if (s > 0) {
          val bitsVal = if (diff >= 0) diff else diff + (1 << s) - 1
          bw.put(bitsVal, s)
        }
        val (eobC, eobL) = AcEnc(0x00) // EOB: all AC zero
        bw.put(eobC, eobL)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    m(0xD9) // EOI
    out.toByteArray
  }

  /** Custom AC table holding EOB and the EOBn run symbols 0x00..0xE0 —
    * the Annex K baseline table has no EOBn codes (they only occur in
    * progressive streams), so the construction encoder defines its own
    * canonical table: 15 symbols, all 4-bit codes. */
  private val ProgAcCounts =
    Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val ProgAcVals: Array[Byte] =
    Array.tabulate[Byte](15)(i => (i << 4).toByte)
  private lazy val ProgAcEnc = encTable(ProgAcCounts, ProgAcVals)

  /** Encode a grayscale PROGRESSIVE (SOF2) JPEG whose 8×8 block
    * (bx, by) is FLAT at `grid(by)(bx)` — the p274 construction
    * algebra. Four scans exercise the whole Annex G surface a DC-only
    * image can reach: DC first at point transform Al=1, AC first over
    * the full 1..63 band (pure EOBn runs — the custom table above),
    * DC refinement carrying the REAL low bit (quant[0]=8 makes the
    * quantized DC = v-128, so bit 0 varies), and AC refinement (EOBn
    * runs again). Optional DRI + cyclic RSTn per scan. Decoding with
    * ANY conforming IDCT gives back the grid exactly (dequantized DC
    * is (v-128)*8, the DC-only exactness algebra of [[encodeFlatBlocks]]). */
  private[graft] def encodeFlatBlocksProgressive(grid: Array[Array[Int]],
      restart: Int = 0): Array[Byte] = {
    val rows = grid.length
    val cols = grid(0).length
    val w = cols * 8; val h = rows * 8
    val n = rows * cols
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xFF); out.write(mk) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def d(i: Int): Int = grid(i / cols)(i % cols) - 128 // quantized DC (q=8)
    m(0xD8) // SOI
    m(0xDB); be16(2 + 1 + 64); out.write(0x00) // DQT: 8-bit, id 0
    out.write(8) // q[0] = 8: quantized DC = v-128 (low bit survives)
    (1 until 64).foreach(_ => out.write(1))
    m(0xC2); be16(8 + 3); out.write(8); be16(h); be16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // comp 1, 1x1, q0
    def dht(tc: Int, counts: Array[Int], vals: Array[Byte]): Unit = {
      m(0xC4); be16(2 + 1 + 16 + vals.length); out.write((tc << 4) | 0)
      counts.foreach(out.write)
      out.write(vals)
    }
    dht(0, StdDcCounts, StdDcVals)
    dht(1, ProgAcCounts, ProgAcVals)
    if (restart > 0) { m(0xDD); be16(4); be16(restart) }
    def sos(ss: Int, se: Int, ahal: Int): Unit = {
      m(0xDA); be16(6 + 2); out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write(ahal)
    }
    /** AC scan over 1..63 carrying zero coefficients: EOBn runs, split
      * at restart boundaries (an EOB run may not span a restart). */
    def emitEobRuns(): Unit = {
      var bw = new BitWriter(out)
      var i = 0; var rst = 0
      while (i < n) {
        if (restart > 0 && i > 0 && i % restart == 0) {
          bw.flush(); m(0xD0 + (rst & 7)); rst += 1
          bw = new BitWriter(out)
        }
        val segEnd =
          if (restart > 0) math.min(n, i + restart - (i % restart)) else n
        var run = segEnd - i
        if (run > 32767) run = 32767
        val r = 31 - Integer.numberOfLeadingZeros(run)
        val (code, len) = ProgAcEnc(r << 4)
        bw.put(code, len)
        if (r > 0) bw.put(run - (1 << r), r)
        i += run
      }
      bw.flush()
    }
    // scan 1: DC first, Al = 1 — diffs of the arithmetic-shifted value
    sos(0, 0, 0x01)
    locally {
      var bw = new BitWriter(out)
      var pred = 0; var rst = 0
      var i = 0
      while (i < n) {
        if (restart > 0 && i > 0 && i % restart == 0) {
          bw.flush(); m(0xD0 + (rst & 7)); rst += 1
          bw = new BitWriter(out); pred = 0
        }
        val sh = d(i) >> 1
        val diff = sh - pred
        pred = sh
        var s = 0
        var mag = math.abs(diff)
        while (mag > 0) { s += 1; mag >>= 1 }
        val (code, len) = DcEnc(s)
        bw.put(code, len)
        if (s > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        i += 1
      }
      bw.flush()
    }
    // scan 2: AC first 1..63, Al = 0 — all zero: pure EOB runs
    sos(1, 63, 0x00)
    emitEobRuns()
    // scan 3: DC refinement Ah=1 Al=0 — one raw bit per block (bit 0)
    sos(0, 0, 0x10)
    locally {
      var bw = new BitWriter(out)
      var rst = 0
      var i = 0
      while (i < n) {
        if (restart > 0 && i > 0 && i % restart == 0) {
          bw.flush(); m(0xD0 + (rst & 7)); rst += 1
          bw = new BitWriter(out)
        }
        bw.put(d(i) & 1, 1)
        i += 1
      }
      bw.flush()
    }
    // scan 4: AC refinement 1..63 Ah=1 Al=0 — EOB runs (no new values,
    // no nonzero history → zero correction bits)
    sos(1, 63, 0x10)
    emitEobRuns()
    m(0xD9) // EOI
    out.toByteArray
  }

  /** p274 fixture: a deterministic DC-only PROGRESSIVE JPEG per doc id
    * — grid (1 + id%3) rows × (1 + id%4) cols of flat blocks, value
    * (id*29 + by*8 + bx*7) % 256, restart interval 2 when id%5 == 0;
    * damage lanes: truncation (%13 == 4) and a stream whose EOI is cut
    * off (%11 == 7 — a progressive frame is only complete at EOI, so
    * the tolerant parse must yield NULL, not a partial render). */
  def progFixture(docId: Long): Array[Byte] = {
    val cols = (1 + docId % 4).toInt
    val rows = (1 + docId % 3).toInt
    val grid = Array.tabulate(rows, cols)((by, bx) =>
      ((docId * 29 + by * 8 + bx * 7) % 256).toInt)
    val restart = if (docId % 5 == 0) 2 else 0
    val full = encodeFlatBlocksProgressive(grid, restart)
    if (docId % 13 == 4) java.util.Arrays.copyOf(full, full.length / 2)
    else if (docId % 11 == 7) java.util.Arrays.copyOf(full, full.length - 2)
    else full
  }

  /** p273 fixture: a deterministic DC-only baseline JPEG per doc id —
    * grid (1 + id%3) rows × (1 + id%4) cols of flat blocks, value
    * (id*31 + by*8 + bx*5) % 256, restart interval 2 when id%5 == 0 (so
    * the RSTn machinery runs on real lanes); damage lanes: truncation
    * (%13 == 4) and the SOF marker flipped to progressive SOF2
    * (%17 == 6) — both must decode to NULL, never throw. The oracle
    * recomputes the same grid algebra in SQL: every conforming IDCT is
    * exact on DC-only blocks, so the match is exact, not tolerant. */
  def flatFixture(docId: Long): Array[Byte] = {
    val cols = (1 + docId % 4).toInt
    val rows = (1 + docId % 3).toInt
    val grid = Array.tabulate(rows, cols)((by, bx) =>
      ((docId * 31 + by * 8 + bx * 5) % 256).toInt)
    val restart = if (docId % 5 == 0) 2 else 0
    val full = encodeFlatBlocks(grid, restart)
    if (docId % 13 == 4) java.util.Arrays.copyOf(full, full.length / 2)
    else if (docId % 17 == 6) {
      val mut = full.clone()
      var i = 2
      var done = false
      while (!done && i + 1 < mut.length) {
        if ((mut(i) & 0xFF) == 0xFF && (mut(i + 1) & 0xFF) == 0xC0) {
          mut(i + 1) = 0xC2.toByte; done = true
        }
        i += 1
      }
      mut
    } else full
  }

  /** One-pass decode + channel features, shape-compatible with
    * [[Png.channelStatsData]]: `[w, h, sum_r, sum_g, sum_b, h0..h3]`
    * (hk = red-channel pixels with `r >> 6 == k`), or null. */
  def channelStatsData(b: Array[Byte]): GenericArrayData = {
    val px = decodeRgb(b)
    if (px == null) return null
    val (w, h, rgb) = px
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](4)
    var p = 0
    val n = w * h
    var i = 0
    while (i < n) {
      val r = rgb(p) & 0xff
      sr += r
      sg += rgb(p + 1) & 0xff
      sb += rgb(p + 2) & 0xff
      hist(r >> 6) += 1L
      p += 3
      i += 1
    }
    new GenericArrayData(Array(w.toLong, h.toLong, sr, sg, sb,
      hist(0), hist(1), hist(2), hist(3)))
  }
}

/** `array<long>` [w, h, sum_r, sum_g, sum_b, h0..h3] of a baseline JPEG
  * (grayscale or YCbCr, factors 1-2) — REAL from-scratch Huffman +
  * dequant + IDCT + color convert in the scan stage — or NULL. */
case class JpegChannelStatsExpr(child: Expression)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_jpeg_channel_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Jpeg.channelStatsData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.Jpeg.channelStatsData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegChannelStats {
  /** Column API for [[JpegChannelStatsExpr]]. */
  def apply(blob: Column): Column =
    GraftSql.column(JpegChannelStatsExpr(GraftSql.expression(blob)))
}

/** BINARY: [[Jpeg.flatFixture]] — the p273 DC-only construction fixture
  * (deterministic per doc id, damage lanes included), evaluated in the
  * scan stage so fixture bytes never ship through a shuffle. */
case class JpegFlatFixtureExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_jpeg_flat_fixture"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Jpeg.flatFixture(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.Jpeg.flatFixture($id);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegFlatFixture {
  /** Column API for [[JpegFlatFixtureExpr]]. */
  def apply(docId: Column): Column =
    GraftSql.column(JpegFlatFixtureExpr(GraftSql.expression(docId)))
}

/** `binary` deterministic DC-only PROGRESSIVE (SOF2) JPEG per doc id —
  * the construction side of the p274 oracle (see [[Jpeg.progFixture]]). */
case class JpegProgFixtureExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_jpeg_prog_fixture"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Jpeg.progFixture(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.Jpeg.progFixture($id);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JpegProgFixture {
  /** Column API for [[JpegProgFixtureExpr]]. */
  def apply(docId: Column): Column =
    GraftSql.column(JpegProgFixtureExpr(GraftSql.expression(docId)))
}
