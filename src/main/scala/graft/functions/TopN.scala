package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-n: the n smallest `(key, id)` pairs, ordered
  * lexicographically — a native `TypedImperativeAggregate`, so Spark
  * runs it with MAP-SIDE PARTIAL AGGREGATION: each partition reduces to
  * at most ~n pairs per group before the shuffle, and partials merge
  * associatively. This is what a ranked window over the same group
  * cannot do — a window shuffles EVERY row of the 100 TB stratum to
  * one task; this kernel moves O(partitions x n).
  *
  * State is an ArrayBuffer compacted to the n smallest whenever it
  * exceeds 4n, so buffer memory is O(n) regardless of input size.
  */
case class MinTopNPairs(
    key: Expression,
    id: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_min_top_n"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    // n <= 0 must fail analysis: compact()/eval() would otherwise
    // silently empty every group. Checked here (not only in the Column
    // API) so the SQL registration path errors identically.
    if (n <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n > 0, got $n")
    else if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT) arguments, got " +
        children.map(_.dataType.catalogString).mkString(", "))

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  private def compact(buf: ArrayBuffer[(Long, Long)]): Unit =
    if (buf.length > 4 * n) {
      val kept = buf.sorted.take(n)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[(Long, Long)],
                      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    // null key or id: the pair is unrankable — skipped, like a window's
    // NULLS LAST falling past the quota
    if (kv != null && iv != null) {
      buf += ((kv.asInstanceOf[Long], iv.asInstanceOf[Long]))
      compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
                     other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.sorted.take(n)
      .map { case (h, i) => InternalRow(h, i) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val kept = if (buf.length > n) buf.sorted.take(n) else buf
    out.writeInt(kept.length)
    kept.foreach { case (h, i) => out.writeLong(h); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val len = in.readInt()
    val buf = new ArrayBuffer[(Long, Long)](len)
    (0 until len).foreach(_ => buf += ((in.readLong(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinTopNPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinTopNPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinTopNPairs =
    copy(key = newChildren(0), id = newChildren(1))
}

object TopN {

  /** Column API: the n smallest `(h, id)` pairs of the group as
    * `array<struct<h: bigint, id: bigint>>` in ascending order.
    */
  def minTopN(h: Column, id: Column, n: Int): Column = {
    require(n > 0, s"n must be positive, got $n")
    GraftSql.column(MinTopNPairs(
      GraftSql.expression(h.cast("long")),
      GraftSql.expression(id.cast("long")), n).toAggregateExpression())
  }
}
