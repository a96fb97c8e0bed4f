package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL ISO-BMFF (MP4) metadata box walk — the video face of the
  * codec-shape kernels ([[Bmp]] pixels, [[Png]] inflate, [[Wav]] PCM):
  * no codec library, because MP4 STRUCTURE is plain big-endian boxes
  * ([size:4][fourcc:4][payload]); movie timescale/duration live in
  * `moov/mvhd` and per-track dimensions in `moov/trak/tkhd` as 16.16
  * fixed point. Frame DECODE (H.264 etc.) would need a real decoder
  * and stays stubbed ([[graft.ops.MultimodalOps.sampleFramesStub]]);
  * the box walk — what a 100 TB video-corpus manifest pass actually
  * runs — is exact byte math in the scan stage.
  *
  * Total function over untrusted payloads: every malformed shape
  * (truncation, lying sizes, missing boxes, v1 64-bit headers, box
  * bombs) returns NULL, never throws — the same posture as every
  * kernel here (reference: wasmedge_factory/src/udf.rs:82-115 maps
  * guest failures to NULL-safe errors rather than crashes).
  */
object Mp4 {

  /** Column API: `array<long>` of
    * [timescale, duration, n_tracks, max_width_px, max_height_px];
    * NULL when the payload is not a parseable v0 MP4 with one moov.
    */
  def meta(blob: Column): Column =
    GraftSql.column(Mp4MetaExpr(GraftSql.expression(blob)))

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private final val MOOV = 0x6d6f6f76L
  private final val MVHD = 0x6d766864L
  private final val TRAK = 0x7472616bL
  private final val TKHD = 0x746b6864L

  /** Bounded child-box scan: invokes `f(type, payloadStart, payloadEnd)`
    * for each well-formed box in [from, to); returns false on any
    * malformed size (out of bounds, < 8, overflow) or more than
    * `maxBoxes` boxes (box-bomb guard — a lying size field must yield
    * NULL, not a spin).
    */
  private def walk(b: Array[Byte], from: Int, to: Int, maxBoxes: Int)(
      f: (Long, Int, Int) => Boolean): Boolean = {
    var i = from
    var n = 0
    while (i < to) {
      if (i + 8 > to) return false
      val size = be32(b, i)
      if (size < 8 || i + size > to) return false
      n += 1
      if (n > maxBoxes) return false
      if (!f(be32(b, i + 4), i + 8, i + size.toInt)) return false
      i += size.toInt
    }
    true
  }

  /** [timescale, duration, n_tracks, max_w_px, max_h_px] or null. */
  def metaData(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 16) return null
    var timescale = -1L; var duration = -1L
    var nTracks = 0L; var maxW = 0L; var maxH = 0L
    val ok = walk(b, 0, b.length, 64) { (typ, s, e) =>
      if (typ != MOOV) true
      else walk(b, s, e, 64) { (ct, cs, ce) =>
        if (ct == MVHD) {
          // v0 payload: ver/flags, ctime, mtime, timescale, duration
          if (ce - cs < 20 || b(cs) != 0) false
          else { timescale = be32(b, cs + 12); duration = be32(b, cs + 16); true }
        } else if (ct == TRAK) {
          nTracks += 1
          walk(b, cs, ce, 64) { (tt, ts, te) =>
            if (tt == TKHD) {
              // v0 payload: …, width/height as 16.16 at offsets 76/80
              if (te - ts < 84 || b(ts) != 0) false
              else {
                maxW = math.max(maxW, be32(b, ts + 76) >> 16)
                maxH = math.max(maxH, be32(b, ts + 80) >> 16)
                true
              }
            } else true
          }
        } else true
      }
    }
    if (!ok || timescale <= 0) null
    else new GenericArrayData(Array(timescale, duration, nTracks, maxW, maxH))
  }
}

/** [[Mp4.metaData]] as a native codegen'd scan-stage expression. */
case class Mp4MetaExpr(child: Expression)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_mp4_meta"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp4.metaData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.Mp4.metaData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
