package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL POSIX ustar (tar) shard build + walk — the container format of
  * WebDataset-style multimodal training shards (a 100 TB image/audio
  * corpus ships as tar files of (sample, metadata) member pairs; the
  * loader's first pass is exactly this header walk). Structure is
  * plain 512-byte blocks: a header with NUL-padded name, octal size
  * and a byte-sum checksum, then ceil(size/512) payload blocks, then
  * a 1024-zero trailer — all exact byte math in the scan stage, no
  * library.
  *
  * The walk is a SALVAGE walk, the production posture for mid-crawl
  * truncations: members are consumed while headers verify (magic +
  * checksum + in-bounds size); the first malformed header stops the
  * walk and the valid prefix is kept — never a throw, never all-or-
  * nothing. A member-bomb cap bounds the loop on lying archives.
  */
object Tar {

  private final val Block = 512
  private final val MaxMembers = 64

  /** Column API: build a deterministic 2-member ustar archive.
    * `mode` 0 = well-formed; 1 = truncated 256 bytes into the second
    * member's header (mid-crawl cut); 2 = second member's checksum
    * corrupted (bit-rot). Payload strings are written as UTF-8.
    */
  def build(name1: Column, payload1: Column, name2: Column,
            payload2: Column, mode: Column): Column =
    GraftSql.column(TarBuildExpr(GraftSql.expression(name1),
      GraftSql.expression(payload1), GraftSql.expression(name2),
      GraftSql.expression(payload2), GraftSql.expression(mode)))

  /** Column API: salvage walk →
    * struct(n_members, payload_bytes, archive_bytes, trailer_ok).
    */
  def walk(blob: Column): Column =
    GraftSql.column(TarWalkExpr(GraftSql.expression(blob)))

  private def octal(x: Long, digits: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(x)
    val out = new Array[Byte](digits + 1)
    val pad = digits - s.length
    var i = 0
    while (i < digits) {
      out(i) = if (i < pad) '0'.toByte else s.charAt(i - pad).toByte
      i += 1
    }
    out(digits) = 0 // NUL terminator
    out
  }

  private def putAscii(b: Array[Byte], at: Int, s: String): Unit = {
    val bytes = s.getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(bytes, 0, b, at, bytes.length)
  }

  /** One 512-byte ustar header (POSIX magic "ustar\0" + version 00). */
  private def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    System.arraycopy(nameBytes, 0, h, 0, math.min(nameBytes.length, 100))
    System.arraycopy(octal(420, 7), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 7), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 7), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 11), 0, h, 124, 12)
    System.arraycopy(octal(0, 11), 0, h, 136, 12) // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0' // typeflag: regular file
    putAscii(h, 257, "ustar")
    h(263) = '0'; h(264) = '0' // version
    putAscii(h, 265, "graft") // uname
    putAscii(h, 297, "graft") // gname
    System.arraycopy(octal(0, 7), 0, h, 329, 8) // devmajor
    System.arraycopy(octal(0, 7), 0, h, 337, 8) // devminor
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    val ck = new Array[Byte](8)
    System.arraycopy(octal(sum, 6), 0, ck, 0, 7)
    ck(7) = ' '.toByte
    System.arraycopy(ck, 0, h, 148, 8)
    h
  }

  private def padded(n: Int): Int = ((n + Block - 1) / Block) * Block

  def buildBytes(name1: String, p1: Array[Byte], name2: String,
                 p2: Array[Byte], mode: Int): Array[Byte] = {
    val m1 = Block + padded(p1.length)
    val m2 = Block + padded(p2.length)
    val full = new Array[Byte](m1 + m2 + 2 * Block)
    System.arraycopy(header(name1, p1.length), 0, full, 0, Block)
    System.arraycopy(p1, 0, full, Block, p1.length)
    System.arraycopy(header(name2, p2.length), 0, full, m1, Block)
    System.arraycopy(p2, 0, full, m1 + Block, p2.length)
    // trailer stays all-zero
    mode match {
      case 1 => java.util.Arrays.copyOf(full, m1 + 256)
      // non-octal byte in the LAST checksum digit: the parsed value
      // becomes floor(sum/8) ≠ sum for every nonempty header (the
      // first digit is a leading zero, so corrupting IT would leave
      // the parsed value unchanged)
      case 2 => full(148 + m1 + 5) = 'Z'.toByte; full
      case _ => full
    }
  }

  /** (n_members, payload_bytes, archive_bytes, trailer_ok) — never
    * null, never throws: a malformed header stops the walk with the
    * salvaged prefix counted.
    */
  def walkData(b: Array[Byte]): InternalRow = {
    var i = 0
    var n = 0L
    var payload = 0L
    var trailerOk = 0L
    var stop = false
    while (!stop && i + Block <= b.length && n <= MaxMembers) {
      var allZero = true
      var j = i
      while (allZero && j < i + Block) {
        if (b(j) != 0) allZero = false
        j += 1
      }
      if (allZero) {
        // trailer = two zero blocks, then optionally more zero padding
        // (GNU/python tars pad the archive to a 10240-byte record; the
        // padding is part of a well-formed close)
        var z2 = i + 2 * Block <= b.length
        j = i + Block
        while (z2 && j < b.length) { if (b(j) != 0) z2 = false; j += 1 }
        trailerOk = if (z2) 1L else 0L
        stop = true
      } else if (n == MaxMembers) {
        stop = true // member bomb: salvage what verified, no trailer
      } else {
        // magic + checksum + size must all verify
        val magicOk = b(i + 257) == 'u' && b(i + 258) == 's' &&
          b(i + 259) == 't' && b(i + 260) == 'a' && b(i + 261) == 'r'
        var sum = 0L
        j = i
        while (j < i + Block) {
          sum += (if (j >= i + 148 && j < i + 156) ' '.toByte
                  else b(j)) & 0xff
          j += 1
        }
        var stored = 0L
        var anyDigit = false
        j = i + 148
        while (j < i + 156 && b(j) != 0 && b(j) != ' ') {
          if (b(j) >= '0' && b(j) <= '7') {
            stored = stored * 8 + (b(j) - '0'); anyDigit = true
          }
          j += 1
        }
        var size = 0L
        j = i + 124
        while (j < i + 136 && b(j) != 0 && b(j) != ' ') {
          if (b(j) >= '0' && b(j) <= '7') size = size * 8 + (b(j) - '0')
          j += 1
        }
        val end = i.toLong + Block + padded(size.toInt)
        if (!magicOk || !anyDigit || stored != sum || size < 0 ||
          size > Int.MaxValue - Block || end > b.length) {
          stop = true
        } else {
          n += 1
          payload += size
          i = end.toInt
        }
      }
    }
    InternalRow(n, payload, b.length.toLong, trailerOk)
  }

  val walkType: StructType = StructType(Seq(
    StructField("n_members", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("archive_bytes", LongType, nullable = false),
    StructField("trailer_ok", LongType, nullable = false)))
}

/** Build expression: (name1, payload1, name2, payload2, mode) → binary.
  * CodegenFallback: construction runs once per row and is dominated by
  * the byte copies, not the dispatch.
  */
case class TarBuildExpr(n1: Expression, p1: Expression, n2: Expression,
                        p2: Expression, mode: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(n1, p1, n2, p2, mode)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_build"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    Tar.buildBytes(
      vs(0).asInstanceOf[UTF8String].toString,
      vs(1).asInstanceOf[UTF8String].getBytes,
      vs(2).asInstanceOf[UTF8String].toString,
      vs(3).asInstanceOf[UTF8String].getBytes,
      vs(4).asInstanceOf[Number].intValue())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(n1 = newChildren(0), p1 = newChildren(1), n2 = newChildren(2),
      p2 = newChildren(3), mode = newChildren(4))
}

/** Salvage walk expression: binary → struct(n_members, payload_bytes,
  * archive_bytes, trailer_ok).
  */
case class TarWalkExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Tar.walkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_walk"

  override def nullSafeEval(input: Any): Any =
    Tar.walkData(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
