package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL TFRecord shard build + salvage walk — the other container
  * format of large-scale training data (TensorFlow's native shard
  * layout; 100 TB text/example corpora ship as TFRecord files). Each
  * record is:
  *
  *   uint64 LE  length
  *   uint32 LE  masked CRC32C of the 8 length bytes
  *   byte[length] data
  *   uint32 LE  masked CRC32C of the data
  *
  * with mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8 (mod 2^32) —
  * the exact masking TensorFlow applies so CRCs stored inside CRC'd
  * streams don't self-cancel. The CRCs are REAL (JDK CRC32C, the same
  * Castagnoli polynomial), so the walk's verification is the actual
  * integrity check a loader performs, not a stub.
  *
  * The walk is a SALVAGE walk (the [[Tar]] posture): records are
  * consumed while length-CRC, bounds, and data-CRC all verify; the
  * first failure stops the walk and the valid prefix is kept. A
  * record-bomb cap bounds the loop on lying blobs.
  */
object TfRecord {

  private final val MaxRecords = 64

  /** Column API: build a 2-record shard from two payload strings.
    * `mode` 0 = well-formed; 1 = truncated 12 bytes into the second
    * record's frame (mid-write cut); 2 = second record's data-CRC
    * corrupted (bit-rot).
    */
  def build(payload1: Column, payload2: Column, mode: Column): Column =
    GraftSql.column(TfRecordBuildExpr(GraftSql.expression(payload1),
      GraftSql.expression(payload2), GraftSql.expression(mode)))

  /** Column API: salvage walk →
    * struct(n_records, payload_bytes, blob_bytes, clean) — `clean`
    * means the walk consumed the blob exactly with every CRC green.
    */
  def walk(blob: Column): Column =
    GraftSql.column(TfRecordWalkExpr(GraftSql.expression(blob)))

  val walkType: StructType = StructType(Seq(
    StructField("n_records", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("blob_bytes", LongType, nullable = false),
    StructField("clean", BooleanType, nullable = false)))

  /** TensorFlow's masked CRC32C over `b[off, off+len)`. */
  private def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val v = c.getValue.toInt // low 32 bits
    ((v >>> 15) | (v << 17)) + 0xa282ead8
  }

  private def putIntLE(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = v.toByte
    b(at + 1) = (v >>> 8).toByte
    b(at + 2) = (v >>> 16).toByte
    b(at + 3) = (v >>> 24).toByte
  }

  private def putLongLE(b: Array[Byte], at: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(at + i) = (v >>> (8 * i)).toByte; i += 1 }
  }

  private def readIntLE(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)

  private def readLongLE(b: Array[Byte], at: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(at + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** One framed record: 8 length + 4 lengthCRC + data + 4 dataCRC. */
  private def frame(data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16 + data.length)
    putLongLE(out, 0, data.length.toLong)
    putIntLE(out, 8, maskedCrc(out, 0, 8))
    System.arraycopy(data, 0, out, 12, data.length)
    putIntLE(out, 12 + data.length, maskedCrc(data, 0, data.length))
    out
  }

  def buildBytes(p1: Array[Byte], p2: Array[Byte], mode: Int): Array[Byte] = {
    val f1 = frame(p1)
    val f2 = frame(p2)
    val full = new Array[Byte](f1.length + f2.length)
    System.arraycopy(f1, 0, full, 0, f1.length)
    System.arraycopy(f2, 0, full, f1.length, f2.length)
    mode match {
      case 1 => java.util.Arrays.copyOf(full, f1.length + 12)
      case 2 => // flip a bit in record 2's data CRC (the last 4 bytes)
        full(full.length - 2) = (full(full.length - 2) ^ 0x40).toByte
        full
      case _ => full
    }
  }

  /** (n_records, payload_bytes, blob_bytes, clean) — never throws; a
    * malformed frame stops the walk with the salvaged prefix counted.
    */
  def walkData(b: Array[Byte]): InternalRow = {
    var i = 0
    var n = 0L
    var payload = 0L
    var bad = false
    while (!bad && i + 12 <= b.length && n < MaxRecords) {
      val len = readLongLE(b, i)
      if (readIntLE(b, i + 8) != maskedCrc(b, i, 8)) bad = true
      else if (len < 0 || len > Int.MaxValue ||
        i + 16 + len > b.length) bad = true
      else if (readIntLE(b, i + 12 + len.toInt) !=
        maskedCrc(b, i + 12, len.toInt)) bad = true
      else {
        n += 1
        payload += len
        i += 16 + len.toInt
      }
    }
    // a >MaxRecords blob already fails `i == b.length` (the loop guard
    // stopped the walk early), so no separate record-cap conjunct
    val clean = !bad && i == b.length
    InternalRow(n, payload, b.length.toLong, clean)
  }
}

case class TfRecordBuildExpr(p1: Expression, p2: Expression,
    mode: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(p1, p2, mode)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfrecord_build"

  override def eval(input: InternalRow): Any = {
    val a = p1.eval(input)
    val b = p2.eval(input)
    val m = mode.eval(input)
    if (a == null || b == null || m == null) null
    else TfRecord.buildBytes(
      a.toString.getBytes(StandardCharsets.UTF_8),
      b.toString.getBytes(StandardCharsets.UTF_8),
      m.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(p1 = newChildren(0), p2 = newChildren(1), mode = newChildren(2))
}

case class TfRecordWalkExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TfRecord.walkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tfrecord_walk"

  override def nullSafeEval(input: Any): Any =
    TfRecord.walkData(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
