package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: REAL image-header parse of a binary
  * payload — PNG IHDR width/height and a JPEG marker-segment walk to
  * the SOF frame header. No codec library involved: dimensions are
  * plain byte reads from the container structure, so this runs in the
  * scan stage of a 100 TB corpus pass exactly like any other pruning
  * expression (the pixel DECODE remains the documented stub in
  * [[graft.ops.MultimodalOps]] — that genuinely needs a codec).
  *
  * Returns `(width << 32) | height` as a long, or NULL when the bytes
  * are not a parseable PNG/JPEG — so one nullable primitive carries
  * both dims through codegen without a struct allocation per row.
  */
case class ImageDimsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_image_dims"

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: a NULL literal argument is legal SQL; null in → null out
    case BinaryType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val packed = ImageDims.parse(input.asInstanceOf[Array[Byte]])
    if (packed < 0) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val packed = ctx.freshName("packed")
      s"""
         |long $packed = graft.functions.ImageDims.parse($bytes);
         |if ($packed < 0) { ${ev.isNull} = true; } else { ${ev.value} = $packed; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDims {

  /** Column-API entry point: packed `(width << 32) | height`, NULL when
    * not a parseable PNG/JPEG.
    */
  def dims(blob: Column): Column =
    GraftSql.column(ImageDimsExpr(GraftSql.expression(blob)))

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** `(width << 32) | height`, or -1 when the payload is not a
    * parseable PNG or JPEG. Called from both interpreted eval and the
    * generated code (static call — stays inside whole-stage codegen).
    *
    * PNG: 8-byte signature, then the IHDR chunk (4-byte length, "IHDR",
    * 4-byte big-endian width, 4-byte big-endian height) — the spec
    * requires IHDR first, so dims sit at fixed offsets 16/20.
    *
    * JPEG: SOI (FFD8), then marker segments, each FF-marker [2-byte
    * big-endian length incl. itself]. Dimensions live in the start-of-
    * frame header (SOF0-15 minus DHT C4 / DAC CC): precision byte, then
    * 2-byte height, 2-byte width. Standalone markers (TEM, RSTn) carry
    * no length; fill FF bytes before a marker are legal padding. The
    * walk stops at SOS/EOI — a frame header always precedes the scan.
    */
  def parse(b: Array[Byte]): Long = {
    if (b == null || b.length < 4) return -1L
    // ---- PNG ----
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w <= 0 || h <= 0) return -1L
      return (w << 32) | h
    }
    // ---- JPEG ----
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return -1L
    var pos = 2
    while (pos + 1 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return -1L // desync: not at a marker
      // skip fill bytes (consecutive FFs pad to the marker byte)
      while (pos + 1 < b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length) return -1L
      val marker = b(pos + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return -1L // EOI / SOS: no SOF seen
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // standalone marker, no length field
      } else {
        if (pos + 3 >= b.length) return -1L
        val len = be16(b, pos + 2)
        if (len < 2) return -1L
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (pos + 8 >= b.length || len < 7) return -1L
          val h = be16(b, pos + 5).toLong // after length(2) + precision(1)
          val w = be16(b, pos + 7).toLong
          if (w <= 0 || h <= 0) return -1L
          return (w << 32) | h
        }
        pos += 2 + len
      }
    }
    -1L
  }
}
