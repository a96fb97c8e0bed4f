package graft.functions

import java.util.zip.Inflater

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL pixel decode of a COMPRESSED codec — 8-bit RGB PNG — with zero
  * external dependencies: the JVM ships the zlib inflate the format
  * needs (`java.util.zip.Inflater`). This closes the compressed-codec
  * gap the BMP kernels ([[Bmp]]) could not: chunk walk (IHDR → IDAT* →
  * IEND, multi-IDAT streams concatenated), zlib inflate of the pixel
  * stream, and per-row UNFILTERING of all five PNG filter types (None /
  * Sub / Up / Average / Paeth) with exact byte arithmetic. JPEG decode
  * is real via JDK ImageIO ([[graft.ops.MultimodalOps.decodePixelsReal]]
  * — spec-pinned, since JPEG IDCT rounding is implementation-defined);
  * this kernel exists where bit-exact cross-engine decode is possible.
  *
  * Tolerant-parse contract (mid-crawl truncation is data, not an
  * error): returns NULL — never throws — on anything that is not a
  * complete 8-bit color-type-2 non-interlaced PNG; chunk CRCs and the
  * zlib adler32 trailer are not verified (raw inflate), matching the
  * be-liberal-in-what-you-accept posture of a corpus pass.
  */
object Png {

  /** Largest accepted w*h (same guard rationale as [[BmpResampleExpr]]). */
  val maxPixels: Long = 1L << 24

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** One-pass decode + channel features:
    * `[w, h, sum_r, sum_g, sum_b, h0, h1, h2, h3]` (hk = red-channel
    * pixels with `r >> 6 == k`), or null when not decodable.
    */
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

  /** Full decode to `(w, h, rgb)` — rgb row-major top-down, 3 bytes per
    * pixel — or null. Package-visible so specs can pin exact pixels.
    */
  private[graft] def decodeRgb(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (b == null || b.length < 8) return null
    var s = 0
    while (s < 8) { if (b(s) != signature(s)) return null; s += 1 }
    var i = 8
    var w = 0; var h = 0
    var haveIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || len > b.length - i - 8) return null // truncated chunk
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (haveIhdr || len != 13) return null
          w = be32(b, i + 8).toInt
          h = be32(b, i + 12).toInt
          val depth = b(i + 16); val color = b(i + 17)
          val interlace = b(i + 20)
          // 8-bit RGB, no interlace — the shape this kernel decodes
          if (depth != 8 || color != 2 || interlace != 0) return null
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return null
          haveIhdr = true
        case "IDAT" =>
          if (!haveIhdr) return null
          idat.write(b, i + 8, len.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped (CRC not verified)
      }
      i += 8 + len.toInt + 4
    }
    if (!haveIhdr) return null
    val raw = idat.toByteArray
    // zlib wrapper: 2-byte header (reject FDICT — no preset dicts in
    // PNG), then raw-inflate; the adler32 trailer is not verified
    if (raw.length < 3 || (raw(1) & 0x20) != 0) return null
    val stride = 1 + w * 3
    val expected = h * stride
    val out = new Array[Byte](expected)
    val inf = new Inflater(true)
    try {
      inf.setInput(raw, 2, raw.length - 2)
      var got = 0
      var stalled = false
      while (got < expected && !inf.finished() && !stalled) {
        val n = inf.inflate(out, got, expected - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        got += n
      }
      if (got != expected) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // unfilter in place: recon(x) = filt(x) + predictor(a, b, c), bpp 3
    val rgb = new Array[Byte](w * h * 3)
    val rowBytes = w * 3
    var y = 0
    while (y < h) {
      val ft = out(y * stride) & 0xff
      if (ft > 4) return null
      var x = 0
      while (x < rowBytes) {
        val filt = out(y * stride + 1 + x) & 0xff
        val a = if (x >= 3) rgb(y * rowBytes + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * rowBytes + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) rgb((y - 1) * rowBytes + x - 3) & 0xff else 0
        val recon = ft match {
          case 0 => filt
          case 1 => filt + a
          case 2 => filt + up
          case 3 => filt + ((a + up) >> 1)
          case 4 => // Paeth predictor
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            filt + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        rgb(y * rowBytes + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }
}

/** `array<long>` [w, h, sum_r, sum_g, sum_b, h0..h3] of an 8-bit RGB
  * PNG — REAL inflate + unfilter in the scan stage — or NULL.
  */
case class PngChannelStatsExpr(child: Expression)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_png_channel_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Png.channelStatsData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.Png.channelStatsData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngChannelStats {
  /** Column API for [[PngChannelStatsExpr]]. */
  def apply(blob: Column): Column =
    GraftSql.column(PngChannelStatsExpr(GraftSql.expression(blob)))
}
