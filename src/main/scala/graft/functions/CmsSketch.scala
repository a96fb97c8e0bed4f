package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Count-Min Sketch over a string column — the heavy-hitter /
  * point-frequency summary a 100 TB rollup maintains instead of exact
  * per-key counts. `depth` independent hash rows × `width` counters;
  * estimate(x) = min over rows of counter[r][h_r(x)] — always an
  * OVERestimate (collisions only add), within `2n/width` of truth with
  * probability `1 − 2^−depth`.
  *
  * The hash family is the [[graft.ops.Portable]] md5 construction
  * (`h60(r || ':' || x) mod width`) — deliberately NOT an engine-
  * private hash, so the ENTIRE sketch state is reproducible by any
  * engine with md5: the DuckDB oracle rebuilds the identical counter
  * matrix in SQL and the estimates hash-match bit-for-bit (p111).
  *
  * Scale shape: a `TypedImperativeAggregate` → map-side partial
  * aggregation; each partition reduces to one depth×width counter
  * array per group before the shuffle, partials merge by elementwise
  * addition (commutative/associative — partitioning cannot change the
  * result). State is O(depth·width) regardless of key cardinality.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_sketch"

  /** The full row-major counter matrix, `depth × width` longs. */
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (depth < 1 || width < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires depth >= 1 and width >= 2")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + Cms.slot(r, s, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(depth * width)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren(0))
}

object Cms {

  /** Driver/executor-side mirror of [[graft.ops.Portable.h60]]: the
    * value of the first 15 hex chars of md5 as a non-negative long.
    */
  def h60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // 16 hex chars read; drop the last nibble to keep 15
  }

  /** Hash-row `r`'s slot for item `s`. */
  def slot(r: Int, s: String, width: Int): Int =
    (h60Local(s"$r:$s") % width).toInt

  /** Column API: the row-major `depth × width` CMS counter matrix of a
    * string column as `array<bigint>`. NULLs are skipped.
    */
  def sketch(v: Column, depth: Int, width: Int): Column =
    GraftSql.column(CmsSketchAgg(
      GraftSql.expression(v), depth, width).toAggregateExpression())
}
