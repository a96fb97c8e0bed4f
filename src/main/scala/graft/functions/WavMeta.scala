package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: REAL RIFF/WAVE header parse of a binary
  * payload — the audio analog of [[ImageDimsExpr]]. No codec library
  * involved: the fields are plain little-endian byte reads from the
  * container's chunk list, so audio-metadata extraction runs in the
  * scan stage of a 100 TB corpus pass like any other pruning
  * expression (PCM sample DECODE stays the documented stub in
  * [[graft.ops.MultimodalOps]]).
  *
  * `field` selects which header value to return ([[WavMeta.CHANNELS]],
  * [[WavMeta.SAMPLE_RATE]], [[WavMeta.BITS]], [[WavMeta.DATA_SIZE]]);
  * NULL when the bytes are not a parseable WAV or the field's chunk is
  * absent. One nullable primitive long per field keeps the parse inside
  * whole-stage codegen with no per-row struct allocation.
  */
case class WavMetaExpr(child: Expression, field: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_wav_meta"

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: a NULL literal argument is legal SQL; null in → null out
    case BinaryType | org.apache.spark.sql.types.NullType
        if field >= 0 && field <= 3 => TypeCheckResult.TypeCheckSuccess
    case BinaryType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName field must be 0..3, got $field")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = WavMeta.parse(input.asInstanceOf[Array[Byte]], field)
    if (v < 0) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val v = ctx.freshName("wavField")
      // `field` is a plan-time constant — inlined into the generated
      // source, so the parse stays a static call inside codegen
      s"""
         |long $v = graft.functions.WavMeta.parse($bytes, $field);
         |if ($v < 0) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavMeta {

  val CHANNELS = 0
  val SAMPLE_RATE = 1
  val BITS = 2
  val DATA_SIZE = 3

  /** Column-API entry points. */
  def channels(blob: Column): Column = field(blob, CHANNELS)
  def sampleRate(blob: Column): Column = field(blob, SAMPLE_RATE)
  def bits(blob: Column): Column = field(blob, BITS)
  def dataSize(blob: Column): Column = field(blob, DATA_SIZE)

  private def field(blob: Column, f: Int): Column =
    GraftSql.column(WavMetaExpr(GraftSql.expression(blob), f))

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)

  private def fourCC(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private final val RIFF = 0x52494646 // "RIFF"
  private final val WAVE = 0x57415645 // "WAVE"
  private final val FMT = 0x666d7420 // "fmt "
  private final val DATA = 0x64617461 // "data"

  /** The requested header field, or -1 when the payload is not a
    * parseable WAV or the field's chunk is missing. Called from both
    * interpreted eval and the generated code (static call — stays
    * inside whole-stage codegen).
    *
    * Container walk: "RIFF" + LE32 riff-size + "WAVE", then a chunk
    * list of fourCC + LE32 size + payload, each chunk padded to an even
    * offset. Channels / sample rate / bit depth sit at fixed offsets in
    * the "fmt " chunk (≥16 payload bytes); DATA_SIZE is the "data"
    * chunk's declared size — readable even when the payload itself is
    * truncated (common mid-stream), so the walk never requires the
    * audio bytes to be present.
    */
  def parse(b: Array[Byte], field: Int): Long = {
    if (b.length < 12 || fourCC(b, 0) != RIFF || fourCC(b, 8) != WAVE) return -1L
    var pos = 12L
    var channels = -1L
    var rate = -1L
    var bits = -1L
    var dataSize = -1L
    while (pos + 8 <= b.length) {
      val p = pos.toInt
      val id = fourCC(b, p)
      val size = le32(b, p + 4)
      if (id == FMT && size >= 16 && pos + 8 + 16 <= b.length) {
        channels = le16(b, p + 10)
        rate = le32(b, p + 12)
        bits = le16(b, p + 22)
      } else if (id == DATA) {
        dataSize = size
      }
      pos += 8 + size + (size & 1) // chunks are padded to even offsets
    }
    field match {
      case CHANNELS => channels
      case SAMPLE_RATE => rate
      case BITS => bits
      case DATA_SIZE => dataSize
      case _ => -1L
    }
  }
}
