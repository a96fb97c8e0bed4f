package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** UTF-8 validity census over raw bytes — the first gate of a text
  * ingest path: crawled "UTF-8" routinely carries overlong encodings
  * (the classic smuggling vector — an overlong '/' slips past byte-
  * level path filters), stray continuation bytes from mid-character
  * truncation, surrogate code points from CESU-8 transcoders, and
  * out-of-range leads. A loader that trusts `CAST(bytes AS STRING)`
  * inherits whatever its runtime's replacement policy is; this walk
  * COUNTS the damage classes instead, so routing and alerting can be
  * policy (RFC 3629 rules):
  *
  *   - 1..4-byte sequences with exact continuation counts;
  *   - overlong: any C0/C1 lead, 3-byte below U+0800, 4-byte below
  *     U+10000 — counted separately (n_overlong), because overlong is
  *     a SECURITY class, not random bit-rot;
  *   - invalid: stray continuation, F5..FF lead, surrogate code
  *     points U+D800..DFFF, 4-byte above U+10FFFF, or a broken
  *     continuation mid-sequence (n_invalid; resync = skip the lead
  *     byte, the standard replacement-character policy);
  *   - truncated: the blob ENDS mid-sequence — flagged, not counted
  *     as invalid (an interrupted write, not corrupt content).
  *
  * A sequence rejected as overlong consumes its lead AND its valid
  * continuation bytes (they were part of the attempted character); a
  * sequence rejected for a broken continuation consumes only the lead
  * and resyncs at the offending byte.
  */
object Utf8Walk {

  def walk(blob: Column): Column =
    GraftSql.column(Utf8WalkExpr(GraftSql.expression(blob)))

  val walkType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_invalid", LongType, nullable = false),
    StructField("n_overlong", LongType, nullable = false),
    StructField("truncated", BooleanType, nullable = false)))

  def walkData(b: Array[Byte]): InternalRow = {
    var i = 0
    var chars = 0L
    var invalid = 0L
    var overlong = 0L
    var truncated = false
    def cont(k: Int): Boolean =
      i + k < b.length && (b(i + k) & 0xc0) == 0x80
    while (i < b.length) {
      val lead = b(i) & 0xff
      if (lead < 0x80) { chars += 1; i += 1 }
      else if (lead < 0xc0) { invalid += 1; i += 1 } // stray continuation
      else if (lead < 0xe0) {
        // 2-byte; C0/C1 can only encode < U+0080 = overlong by definition
        if (i + 1 >= b.length) { truncated = true; i = b.length }
        else if (!cont(1)) { invalid += 1; i += 1 }
        else if (lead < 0xc2) { overlong += 1; i += 2 }
        else { chars += 1; i += 2 }
      } else if (lead < 0xf0) {
        if (i + 2 >= b.length) {
          // fewer than 2 continuation bytes left: truncated only if
          // everything still present is a valid continuation (the
          // sequence was CUT); otherwise it is plain corruption
          if (i + 1 >= b.length || cont(1)) { truncated = true; i = b.length }
          else { invalid += 1; i += 1 }
        } else if (!cont(1) || !cont(2)) { invalid += 1; i += 1 }
        else {
          val cp = ((lead & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) |
            (b(i + 2) & 0x3f)
          if (cp < 0x800) overlong += 1
          else if (cp >= 0xd800 && cp <= 0xdfff) invalid += 1 // surrogate
          else chars += 1
          i += 3
        }
      } else if (lead < 0xf5) {
        if (i + 3 >= b.length) {
          val ok = (i + 1 >= b.length || cont(1)) &&
            (i + 2 >= b.length || cont(2))
          if (ok) { truncated = true; i = b.length }
          else { invalid += 1; i += 1 }
        } else if (!cont(1) || !cont(2) || !cont(3)) { invalid += 1; i += 1 }
        else {
          val cp = ((lead & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
            ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
          if (cp < 0x10000) overlong += 1
          else if (cp > 0x10ffff) invalid += 1
          else chars += 1
          i += 4
        }
      } else { invalid += 1; i += 1 } // F5..FF can never appear
    }
    InternalRow(b.length.toLong, chars, invalid, overlong, truncated)
  }
}

case class Utf8WalkExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Utf8Walk.walkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_utf8_walk"

  override def nullSafeEval(input: Any): Any =
    Utf8Walk.walkData(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
