package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Perceptual image hash (pHash) over a decoded bitmap — image
  * NEAR-duplicate detection, the visual analogue of SimHash: two
  * re-encodes, slight crops or brightness tweaks of the same picture
  * land within a few bits, unrelated pictures ~32 bits apart. The
  * classic DCT construction (Zauner 2010, "Implementation and
  * Benchmarking of Perceptual Image Hash Functions"):
  *
  *   gray → resample to 16×16 (nearest neighbour, the [[Bmp]] index
  *   math) → 2-D DCT-II → keep the 8×8 low-frequency block → drop the
  *   DC term → threshold the 63 coefficients at their median → 63-bit
  *   signature (packed to one long, bit index u·8+v).
  *
  * All arithmetic is EXACT-INTEGER and engine-portable: the cosine
  * basis is pre-rounded to 1e4-scaled integers (the same literal
  * table is embedded in the DuckDB oracle, so both engines share it
  * bit-for-bit), luma = (299·R + 587·G + 114·B) / 1000 in integers,
  * and the median is the ordinal 32nd-smallest — no float anywhere,
  * which is what makes a cross-engine hash compare possible at all.
  *
  * One scan-stage expression per blob: the pixel matrix never
  * explodes into rows (the p55 discipline — megapixel payloads stay
  * inside the kernel; only the 1-long hash reaches the plan).
  */
object Phash {

  /** Resampled edge (16×16) and the DCT block edge (8×8). */
  final val N = 16
  final val K = 8

  /** C(u, x) = round(10000·cos(π·(2x+1)·u / 32)) — the 1e4-scaled
    * DCT-II basis, u ∈ [0, 8), x ∈ [0, 16). */
  val Ct: Array[Array[Long]] = Array.tabulate(K, N) { (u, x) =>
    math.round(10000.0 * math.cos(math.Pi * (2 * x + 1) * u / (2 * N)))
  }

  def phash(blob: Column): Column =
    GraftSql.column(PhashExpr(GraftSql.expression(blob)))

  /** 63-bit DCT hash of a BMP blob (null on malformed input). */
  def phashData(b: Array[Byte]): Any = {
    val hdr = Bmp.header(b)
    if (hdr == null) return null
    val off = hdr(0); val w = hdr(1); val h = hdr(2)
    // gray 16×16 via nearest-neighbour source indexing
    val g = new Array[Long](N * N)
    var y = 0
    while (y < N) {
      val sy = y * h / N
      var x = 0
      while (x < N) {
        val sx = x * w / N
        val p = Bmp.pixel(b, off, w, h, sx, sy) // packed 0xRRGGBB
        val r = (p >> 16) & 0xff
        val gg = (p >> 8) & 0xff
        val bb = p & 0xff
        g(y * N + x) = (299L * r + 587L * gg + 114L * bb) / 1000L
        x += 1
      }
      y += 1
    }
    // 8×8 low-frequency block of the 2-D DCT (row pass then col pass)
    val rowT = new Array[Long](N * K) // rowT(y*K+u) = Σ_x g(y,x)·C(u,x)
    y = 0
    while (y < N) {
      var u = 0
      while (u < K) {
        var s = 0L
        var x = 0
        while (x < N) { s += g(y * N + x) * Ct(u)(x); x += 1 }
        rowT(y * K + u) = s
        u += 1
      }
      y += 1
    }
    val f = new Array[Long](K * K)
    var u = 0
    while (u < K) {
      var v = 0
      while (v < K) {
        var s = 0L
        var yy = 0
        while (yy < N) { s += rowT(yy * K + u) * Ct(v)(yy); yy += 1 }
        f(u * K + v) = s
        v += 1
      }
      u += 1
    }
    // median (ordinal 32nd-smallest) of the 63 non-DC coefficients
    val nz = java.util.Arrays.copyOfRange(f, 1, K * K)
    java.util.Arrays.sort(nz)
    val m = nz(31)
    var packed = 0L
    var idx = 1
    while (idx < K * K) {
      if (f(idx) > m)
        packed += (if (idx == 63) Long.MinValue else 1L << idx)
      idx += 1
    }
    packed
  }
}

case class PhashExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_phash"

  override def nullSafeEval(input: Any): Any =
    Phash.phashData(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
