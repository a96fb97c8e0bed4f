package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** REAL ZIP shard build + central-directory salvage walk — the last
  * archive container in the codec family (gzip / tar / TFRecord / MP4
  * already ship): crawled corpora and dataset drops arrive as ZIPs,
  * and a loader's integrity pass is exactly this walk. Entries are
  * STORED (method 0) with REAL CRC-32s (JDK `CRC32`, the zlib
  * polynomial), so verification is the actual check, not a stub.
  *
  * Layout per the PKWARE APPNOTE: per entry a 30-byte local header +
  * name + data; then the central directory (46 bytes + name per
  * entry); then the 22-byte end-of-central-directory record. The walk
  * is authoritative-index-first with salvage fallback:
  *
  *  - EOCD present → walk the CENTRAL directory (the authoritative
  *    index), cross-check each entry's local header signature and
  *    name, and verify the data CRC; `clean` additionally requires
  *    every entry valid and the directory to account for the blob
  *    exactly (cd offset + cd size + 22 == length).
  *  - EOCD missing (interrupted upload — the most common real-world
  *    break) → forward-walk local headers from offset 0, CRC-checking
  *    each; everything recoverable is counted, `clean` stays false
  *    because the authoritative index is gone.
  *
  * A 64-entry bomb cap bounds both walks on lying blobs (the [[Tar]]
  * / [[TfRecord]] posture: never throw, never loop unbounded).
  */
object Zip {

  private final val MaxEntries = 64
  private final val Name1 = "a.txt"
  private final val Name2 = "m.txt"

  /** Column API: build a 2-entry stored ZIP from two payload strings.
    * `mode` 0 = well-formed; 1 = local entries only (EOCD + central
    * directory lost mid-write); 2 = first entry's data corrupted by a
    * single flipped bit (CRC catches it).
    */
  def build(payload1: Column, payload2: Column, mode: Column): Column =
    GraftSql.column(ZipBuildExpr(GraftSql.expression(payload1),
      GraftSql.expression(payload2), GraftSql.expression(mode)))

  /** Column API: salvage walk → struct(n_entries, n_valid,
    * payload_bytes, blob_bytes, has_central, clean).
    */
  def walk(blob: Column): Column =
    GraftSql.column(ZipWalkExpr(GraftSql.expression(blob)))

  val walkType: StructType = StructType(Seq(
    StructField("n_entries", LongType, nullable = false),
    StructField("n_valid", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("blob_bytes", LongType, nullable = false),
    StructField("has_central", BooleanType, nullable = false),
    StructField("clean", BooleanType, nullable = false)))

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue.toInt
  }

  private def wr16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
  }

  private def wr32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }

  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def rd32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** One local header + name + stored data at `off`; returns bytes
    * written. */
  private def putLocal(out: Array[Byte], off: Int, name: Array[Byte],
                       data: Array[Byte], crc: Int): Int = {
    wr32(out, off, 0x04034b50)
    wr16(out, off + 4, 20) // version needed
    // flags, method (stored), time, date all zero
    wr32(out, off + 14, crc)
    wr32(out, off + 18, data.length)
    wr32(out, off + 22, data.length)
    wr16(out, off + 26, name.length)
    System.arraycopy(name, 0, out, off + 30, name.length)
    System.arraycopy(data, 0, out, off + 30 + name.length, data.length)
    30 + name.length + data.length
  }

  private def putCentral(out: Array[Byte], off: Int, name: Array[Byte],
                         dataLen: Int, crc: Int, lhOfs: Int): Int = {
    wr32(out, off, 0x02014b50)
    wr16(out, off + 4, 20) // version made by
    wr16(out, off + 6, 20) // version needed
    wr32(out, off + 16, crc)
    wr32(out, off + 20, dataLen)
    wr32(out, off + 24, dataLen)
    wr16(out, off + 28, name.length)
    wr32(out, off + 42, lhOfs)
    System.arraycopy(name, 0, out, off + 46, name.length)
    46 + name.length
  }

  def buildBytes(p1: Array[Byte], p2: Array[Byte], mode: Int): Array[Byte] = {
    val n1 = Name1.getBytes(StandardCharsets.US_ASCII)
    val n2 = Name2.getBytes(StandardCharsets.US_ASCII)
    val localLen = 30 + n1.length + p1.length + 30 + n2.length + p2.length
    val cdLen = 46 + n1.length + 46 + n2.length
    val full = localLen + cdLen + 22
    val out = new Array[Byte](if (mode == 1) localLen else full)
    val c1 = crc32(p1, 0, p1.length)
    val c2 = crc32(p2, 0, p2.length)
    val w1 = putLocal(out, 0, n1, p1, c1)
    putLocal(out, w1, n2, p2, c2)
    if (mode != 1) {
      val cd1 = putCentral(out, localLen, n1, p1.length, c1, 0)
      putCentral(out, localLen + cd1, n2, p2.length, c2, w1)
      val eocd = localLen + cdLen
      wr32(out, eocd, 0x06054b50)
      wr16(out, eocd + 8, 2)  // entries on disk
      wr16(out, eocd + 10, 2) // entries total
      wr32(out, eocd + 12, cdLen)
      wr32(out, eocd + 16, localLen)
    }
    if (mode == 2) {
      if (p1.length > 0) {
        // flip one DATA bit of entry 1 — sizes unchanged, CRC catches it
        out(30 + n1.length) = (out(30 + n1.length) ^ 0x40).toByte
      } else {
        // empty payload has no data byte to flip; corrupt entry 1's
        // CENTRAL-record CRC instead (the walk verifies data against
        // the central CRC) so mode 2 keeps the n_valid=1 invariant
        out(localLen + 16) = (out(localLen + 16) ^ 0x40).toByte
      }
    }
    out
  }

  /** Parse one entry from its central record at `c`; returns
    * (recordBytes, usize, valid) or null on a malformed record. */
  private def checkCentral(b: Array[Byte], c: Int): (Int, Long, Boolean) = {
    if (c + 46 > b.length || rd32(b, c) != 0x02014b50L) null
    else {
      val crc = rd32(b, c + 16)
      val csize = rd32(b, c + 20)
      val usize = rd32(b, c + 24)
      val nameLen = rd16(b, c + 28)
      val extraLen = rd16(b, c + 30)
      val commentLen = rd16(b, c + 32)
      val lhOfs = rd32(b, c + 42)
      val rec = 46 + nameLen + extraLen + commentLen
      if (c + rec > b.length) null
      else {
        // cross-check the local header: signature, same name, data in
        // bounds, stored CRC matches a REAL CRC32 of the data
        val lh = lhOfs.toInt
        val valid = lhOfs + 30 <= b.length && rd32(b, lh) == 0x04034b50L && {
          val lhName = rd16(b, lh + 26)
          val lhExtra = rd16(b, lh + 28)
          val dataOfs = lh + 30 + lhName + lhExtra
          // bound dataOfs BEFORE touching name bytes or data: a central
          // record may point its lhOfs within 30 bytes of the blob end
          // with a matching signature, and the salvage contract is
          // never-throw, so every read below needs this fence first
          // (lhName == nameLen makes the name compare covered by it too)
          lhName == nameLen && dataOfs + csize <= b.length && csize == usize &&
            (0 until nameLen).forall(i => b(lh + 30 + i) == b(c + 46 + i)) &&
            (crc32(b, dataOfs, csize.toInt) & 0xffffffffL) == crc
        }
        (rec, usize, valid)
      }
    }
  }

  def walkData(b: Array[Byte]): InternalRow = {
    // EOCD: backward scan over the last 22+64 bytes (empty comment in
    // this builder; the cap bounds scans of lying blobs)
    var eocd = -1
    var i = b.length - 22
    val stop = math.max(0, b.length - 22 - 64)
    while (eocd < 0 && i >= stop) {
      if (rd32(b, i) == 0x06054b50L) eocd = i
      else i -= 1
    }
    var n = 0L
    var valid = 0L
    var payload = 0L
    var clean = false
    if (eocd >= 0) {
      val nEntries = rd16(b, eocd + 10)
      val cdSize = rd32(b, eocd + 12)
      val cdOfs = rd32(b, eocd + 16)
      var c = cdOfs.toInt
      var bad = cdOfs + cdSize > eocd
      var k = 0
      while (!bad && k < nEntries && k < MaxEntries) {
        checkCentral(b, c) match {
          case null => bad = true
          case (rec, usize, ok) =>
            n += 1
            payload += usize
            if (ok) valid += 1
            c += rec
        }
        k += 1
      }
      // clean = authoritative index present, every entry verified, and
      // the directory accounts for the blob exactly
      clean = !bad && n == nEntries && valid == n &&
        cdOfs + cdSize + 22 == b.length && c == eocd
      InternalRow(n, valid, payload, b.length.toLong, true, clean)
    } else {
      // salvage: forward local-header walk over whatever survived
      var p = 0
      var go = true
      while (go && n < MaxEntries && p + 30 <= b.length &&
          rd32(b, p) == 0x04034b50L) {
        val crc = rd32(b, p + 14)
        val csize = rd32(b, p + 18)
        val usize = rd32(b, p + 22)
        val nameLen = rd16(b, p + 26)
        val extraLen = rd16(b, p + 28)
        val dataOfs = p + 30 + nameLen + extraLen
        if (csize != usize || dataOfs + csize > b.length) go = false
        else {
          n += 1
          payload += usize
          if ((crc32(b, dataOfs, csize.toInt) & 0xffffffffL) == crc)
            valid += 1
          p = (dataOfs + csize).toInt
        }
      }
      InternalRow(n, valid, payload, b.length.toLong, false, false)
    }
  }
}

case class ZipBuildExpr(p1: Expression, p2: Expression, mode: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(p1, p2, mode)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_build"

  override def eval(input: InternalRow): Any = {
    val a = p1.eval(input)
    val b = p2.eval(input)
    val m = mode.eval(input)
    if (a == null || b == null || m == null) null
    else Zip.buildBytes(
      a.toString.getBytes(StandardCharsets.UTF_8),
      b.toString.getBytes(StandardCharsets.UTF_8),
      m.asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(p1 = newChildren(0), p2 = newChildren(1), mode = newChildren(2))
}

case class ZipWalkExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Zip.walkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_walk"

  override def nullSafeEval(input: Any): Any =
    Zip.walkData(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
