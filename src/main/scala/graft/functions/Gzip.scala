package graft.functions

import java.util.zip.Inflater

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, NullType}

/** REAL gzip (RFC 1952) member decode of a binary payload — the
  * compressed-TEXT sibling of [[Png]]'s compressed-image decode, and
  * the shape of the first thing any crawl pipeline does to a fetched
  * page: strip the gzip framing and inflate the body. The header walk
  * handles the real-world flag set (FEXTRA / FNAME / FCOMMENT /
  * FHCRC skipping), the body is the JVM's real zlib inflate in raw
  * mode, and the CRC32/ISIZE trailer is deliberately NOT verified —
  * mid-crawl members are routinely truncated after the deflate stream
  * and the bytes already inflated are still data.
  *
  * Returns the decoded bytes, composing with every built-in binary /
  * string function downstream (`length`, `md5`, `cast to string`,
  * tokenizers) — decode is an expression in the scan stage, not an
  * operator, so a 100 TB decompress-and-tokenize pass is one
  * whole-stage-codegen'd scan with zero shuffle.
  *
  * NULL (never throw) on anything that is not a gzip member with a
  * well-formed deflate body; a [[maxBytes]] output cap turns
  * decompression bombs into NULLs instead of executor OOMs (the
  * [[Png.maxPixels]] posture applied to unbounded text).
  */
object Gzip {

  /** Hard cap on decoded size per payload: 64 MiB. Crawl bodies past
    * this are either bombs or not documents; a cluster pass wants them
    * dropped (NULL → filterable, countable via observe), not OOMing.
    */
  val maxBytes: Int = 64 << 20

  /** Column API: decoded bytes of a gzip member, or NULL. */
  def inflate(blob: Column): Column =
    GraftSql.column(GzipInflateExpr(GraftSql.expression(blob)))

  /** Column API: salvage-concatenation of CONSECUTIVE gzip members —
    * the Common Crawl shard layout (each WARC record gzipped as its own
    * member, members back to back). Decodes members while they verify,
    * stops at the first malformed/truncated one keeping the valid
    * prefix; NULL only when not even the first member decodes.
    */
  def inflateMembers(blob: Column): Column =
    GraftSql.column(GzipMembersExpr(GraftSql.expression(blob)))

  /** Member-count cap for the concatenated-member walk: a lying shard
    * cannot spin the loop. */
  val maxMembersPerShard: Int = 65536

  private final val FHCRC = 2
  private final val FEXTRA = 4
  private final val FNAME = 8
  private final val FCOMMENT = 16

  /** Decoded bytes or null. Header: magic 1F 8B, CM 8 (deflate), FLG,
    * 4-byte MTIME + XFL + OS (skipped), then the optional fields in
    * RFC order — FEXTRA (LE16 length + bytes), FNAME and FCOMMENT
    * (zero-terminated), FHCRC (2 bytes) — then the raw deflate
    * stream. Static so generated code calls it directly.
    */
  def inflateData(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 11) return null
    if ((b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b || b(2) != 8) return null
    val flg = b(3) & 0xff
    if ((flg & 0xe0) != 0) return null // reserved flag bits must be zero
    var i = 10
    if ((flg & FEXTRA) != 0) {
      if (i + 2 > b.length) return null
      val xlen = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      i += 2 + xlen
      if (i > b.length) return null
    }
    if ((flg & FNAME) != 0) {
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return null
      i += 1
    }
    if ((flg & FCOMMENT) != 0) {
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return null
      i += 1
    }
    if ((flg & FHCRC) != 0) {
      i += 2
      if (i > b.length) return null
    }
    if (i >= b.length) return null
    // raw inflate with doubling buffer, hard-capped at maxBytes
    val inf = new Inflater(true)
    try {
      inf.setInput(b, i, b.length - i)
      var out = new Array[Byte](math.min(maxBytes, math.max(256, (b.length - i) * 4)))
      var got = 0
      var stalled = false
      while (!inf.finished() && !stalled) {
        if (got == out.length) {
          if (out.length >= maxBytes) return null // decompression bomb
          val next = new Array[Byte](math.min(maxBytes, out.length * 2))
          System.arraycopy(out, 0, next, 0, got)
          out = next
        }
        val n = inf.inflate(out, got, out.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        got += n
      }
      if (!inf.finished()) return null // truncated deflate stream
      java.util.Arrays.copyOf(out, got)
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** One member starting at `start`: (decoded bytes, total bytes
    * consumed incl. the 8-byte trailer — clamped at end-of-buffer for a
    * final member with a cut trailer), or null when the member does not
    * verify. Same header walk and tolerant-trailer posture as
    * [[inflateData]], generalized to an offset so members can
    * concatenate (Common Crawl's record-per-member layout).
    */
  private def memberAt(b: Array[Byte], start: Int,
                       capLeft: Int): (Array[Byte], Int) = {
    if (b.length - start < 11) return null
    if ((b(start) & 0xff) != 0x1f || (b(start + 1) & 0xff) != 0x8b ||
      b(start + 2) != 8) return null
    val flg = b(start + 3) & 0xff
    if ((flg & 0xe0) != 0) return null
    var i = start + 10
    if ((flg & FEXTRA) != 0) {
      if (i + 2 > b.length) return null
      val xlen = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      i += 2 + xlen
      if (i > b.length) return null
    }
    if ((flg & FNAME) != 0) {
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return null
      i += 1
    }
    if ((flg & FCOMMENT) != 0) {
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) return null
      i += 1
    }
    if ((flg & FHCRC) != 0) {
      i += 2
      if (i > b.length) return null
    }
    if (i >= b.length) return null
    val inf = new Inflater(true)
    try {
      inf.setInput(b, i, b.length - i)
      var out = new Array[Byte](math.min(capLeft, math.max(256, (b.length - i) * 4)))
      var got = 0
      var stalled = false
      while (!inf.finished() && !stalled) {
        if (got == out.length) {
          if (out.length >= capLeft) return null // decompression bomb
          val next = new Array[Byte](math.min(capLeft, out.length * 2))
          System.arraycopy(out, 0, next, 0, got)
          out = next
        }
        val n = inf.inflate(out, got, out.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        got += n
      }
      if (!inf.finished()) return null // truncated deflate stream
      val consumed = math.min(b.length - start,
        (i - start) + inf.getBytesRead.toInt + 8)
      (java.util.Arrays.copyOf(out, got), consumed)
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** Salvage walk over concatenated members; static so generated code
    * calls it directly. */
  def inflateMembersData(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    var members = 0
    var halted = false
    while (!halted && off < b.length && members < maxMembersPerShard) {
      memberAt(b, off, maxBytes - out.size()) match {
        case null => halted = true
        case (bytes, consumed) =>
          out.write(bytes, 0, bytes.length)
          off += consumed
          members += 1
      }
    }
    if (members == 0) null else out.toByteArray
  }
}

/** Salvage-concatenated decode of consecutive gzip members (the Common
  * Crawl shard layout), NULL when not even the first member decodes.
  */
case class GzipMembersExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gunzip_members"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Gzip.inflateMembersData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |byte[] $arr = graft.functions.Gzip.inflateMembersData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decoded bytes of a gzip (RFC 1952) member, NULL when the payload is
  * not one (or inflates past [[Gzip.maxBytes]]).
  */
case class GzipInflateExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gunzip"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Gzip.inflateData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |byte[] $arr = graft.functions.Gzip.inflateData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
