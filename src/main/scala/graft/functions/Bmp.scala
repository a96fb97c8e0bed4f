package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL pixel math over uncompressed 24-bpp BMP payloads — no codec
  * library needed, because the format IS raw bytes: a 14-byte file
  * header, a 40-byte BITMAPINFOHEADER, then bottom-up rows of B,G,R
  * bytes each padded to 4. That makes resize (nearest-neighbour
  * resample) and channel features exact integer byte math, runnable in
  * the scan stage of a 100 TB corpus pass as native codegen'd
  * expressions — the same byte-walk skill as [[ImageDims]]/[[WavMeta]],
  * now applied to pixels, not just headers. PNG pixel decode is also
  * real ([[Png]] — JVM zlib inflate); only JPEG remains stubbed in
  * [[graft.ops.MultimodalOps]].
  *
  * All parsers return NULL (never throw) on anything that is not a
  * complete uncompressed bottom-up 24-bpp BMP — mid-crawl truncation is
  * data, not an error.
  */
object Bmp {

  /** Column API: packed `(width << 32) | height`, NULL when not a
    * parseable uncompressed 24-bpp BMP.
    */
  def dims(blob: Column): Column =
    GraftSql.column(BmpDimsExpr(GraftSql.expression(blob)))

  /** Column API: nearest-neighbour resample to (w2, h2); an
    * `array<int>` of w2*h2 packed `(r << 16) | (g << 8) | b` pixels in
    * row-major (top-down) order, NULL when unparseable.
    */
  def resample(blob: Column, w2: Int, h2: Int): Column =
    GraftSql.column(BmpResampleExpr(GraftSql.expression(blob), w2, h2))

  /** Column API: one-pass channel features — `array<long>` of
    * [sum_r, sum_g, sum_b, h0, h1, h2, h3] where hk counts red-channel
    * pixels with `r >> 6 == k` (a 4-bin histogram). NULL when
    * unparseable.
    */
  def channelStats(blob: Column): Column =
    GraftSql.column(BmpChannelStatsExpr(GraftSql.expression(blob)))

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Header parse: returns `(pixelOffset, width, height)` or null.
    * Accepts only what the pixel kernels can process losslessly:
    * BITMAPINFOHEADER (size 40), 1 plane, 24 bpp, BI_RGB (no
    * compression), positive (bottom-up) height, and a payload long
    * enough to hold every declared pixel row.
    */
  private[functions] def header(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B' || b(1) != 'M') return null
    val offset = le32(b, 10)
    if (le32(b, 14) != 40L) return null // BITMAPINFOHEADER only
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (le16(b, 26) != 1 || le16(b, 28) != 24) return null
    if (le32(b, 30) != 0L) return null // BI_RGB
    // bounded dims: the row-size math below must not overflow Int
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (offset < 54 || offset + rowSize * h > b.length) return null
    Array(offset.toInt, w.toInt, h.toInt)
  }

  /** `(width << 32) | height`, or -1 when not parseable. Static so the
    * generated code calls it directly (stays in whole-stage codegen).
    */
  def parseDims(b: Array[Byte]): Long = {
    val hd = header(b)
    if (hd == null) -1L else (hd(1).toLong << 32) | hd(2).toLong
  }

  /** Packed pixel at image coordinates (x, y), y = 0 at the TOP — the
    * file stores rows bottom-up, so file row is `h - 1 - y`.
    */
  @inline private[functions] def pixel(b: Array[Byte], offset: Int, w: Int, h: Int,
                            x: Int, y: Int): Int = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val p = offset + (h - 1 - y) * rowSize + x * 3
    val blue = b(p) & 0xff
    val green = b(p + 1) & 0xff
    val red = b(p + 2) & 0xff
    (red << 16) | (green << 8) | blue
  }

  /** Nearest-neighbour resample to (w2, h2): output pixel (x2, y2)
    * reads source pixel (x2*w/w2, y2*h/h2) — exact integer floor
    * division, mirrored by the DuckDB oracle. Returns Catalyst array
    * data (row-major top-down) or null.
    */
  def resampleData(b: Array[Byte], w2: Int, h2: Int): GenericArrayData = {
    val hd = header(b)
    if (hd == null || w2 <= 0 || h2 <= 0 ||
      w2.toLong * h2 > BmpResampleExpr.maxPixels) return null
    val offset = hd(0); val w = hd(1); val h = hd(2)
    val out = new Array[Int](w2 * h2)
    var y2 = 0
    while (y2 < h2) {
      val sy = (y2.toLong * h / h2).toInt
      var x2 = 0
      while (x2 < w2) {
        val sx = (x2.toLong * w / w2).toInt
        out(y2 * w2 + x2) = pixel(b, offset, w, h, sx, sy)
        x2 += 1
      }
      y2 += 1
    }
    new GenericArrayData(out)
  }

  /** One pass over every pixel: per-channel sums plus a 4-bin red
    * histogram — [sum_r, sum_g, sum_b, h0, h1, h2, h3], or null.
    */
  def channelStatsData(b: Array[Byte]): GenericArrayData = {
    val hd = header(b)
    if (hd == null) return null
    val offset = hd(0); val w = hd(1); val h = hd(2)
    val rowSize = ((w * 3 + 3) / 4) * 4
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](4)
    var y = 0
    while (y < h) {
      var p = offset + y * rowSize // channel order in the file: B, G, R
      var x = 0
      while (x < w) {
        sb += b(p) & 0xff
        sg += b(p + 1) & 0xff
        val r = b(p + 2) & 0xff
        sr += r
        hist(r >> 6) += 1L
        x += 1
        p += 3
      }
      y += 1
    }
    new GenericArrayData(Array(sr, sg, sb, hist(0), hist(1), hist(2), hist(3)))
  }
}

/** Shared type check: BINARY (or a NULL literal) in. */
trait BmpInputCheck { self: UnaryExpression =>
  def prettyName: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }
}

/** `(width << 32) | height` of an uncompressed 24-bpp BMP, NULL
  * otherwise — same packed-primitive convention as [[ImageDimsExpr]].
  */
case class BmpDimsExpr(child: Expression)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bmp_dims"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val packed = Bmp.parseDims(input.asInstanceOf[Array[Byte]])
    if (packed < 0) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val packed = ctx.freshName("packed")
      s"""
         |long $packed = graft.functions.Bmp.parseDims($bytes);
         |if ($packed < 0) { ${ev.isNull} = true; } else { ${ev.value} = $packed; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-neighbour resample of a BMP payload to a fixed (w2, h2)
  * thumbnail grid: `array<int>` of packed RGB pixels, NULL when the
  * payload is not a parseable BMP.
  */
case class BmpResampleExpr(child: Expression, w2: Int, h2: Int)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bmp_resample"
  override def nullable: Boolean = true

  // The NULL-never-throw contract covers the PAYLOAD; the target grid is
  // the caller's request and a bad one fails analysis loudly. The pixel
  // cap keeps the per-row output array bounded (2^24 ints = 64 MB) —
  // past that, w2*h2 would overflow Int or OOM an executor.
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (w2 <= 0 || h2 <= 0 || w2.toLong * h2 > BmpResampleExpr.maxPixels)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName target grid must satisfy 1 <= w*h <= " +
          s"${BmpResampleExpr.maxPixels}, got ${w2}x$h2")
    else base
  }

  override def nullSafeEval(input: Any): Any =
    Bmp.resampleData(input.asInstanceOf[Array[Byte]], w2, h2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.Bmp.resampleData($bytes, $w2, $h2);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BmpResampleExpr {
  /** Largest allowed w2*h2 output grid (64 MB of packed ints per row). */
  val maxPixels: Long = 1L << 24
}

/** One-pass channel sums + 4-bin red histogram of a BMP payload:
  * `array<long>` [sum_r, sum_g, sum_b, h0, h1, h2, h3], NULL when the
  * payload is not a parseable BMP.
  */
case class BmpChannelStatsExpr(child: Expression)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bmp_channel_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Bmp.channelStatsData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.Bmp.channelStatsData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
