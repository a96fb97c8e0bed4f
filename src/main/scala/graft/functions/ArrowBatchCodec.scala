package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels

import scala.collection.JavaConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.util.Text

/** Arrow IPC (de)serialization of one function-invocation batch — the real
  * marshalling layer of the reference's host↔guest boundary: the engine
  * packs each input batch of argument columns into Arrow IPC bytes, hands
  * them across the sandbox boundary, and unpacks the returned column
  * (wasmedge_factory/src/udf.rs:82-115 — `pack` the args, one guest call,
  * unpack the result; full copy both ways, reference README.md:76).
  *
  * One batch = one self-contained Arrow IPC stream (schema + a single
  * record batch). Types are inferred from the runtime values the engine's
  * invoke layer produces ([[graft.ddl.EngineFunctionInvoke.fromCatalyst]]):
  * Double/Float/Long/Int/Boolean, String, binary, and lists of
  * Double/Long/String — the vector set the guest SDK in the reference
  * understands (wasm_function/src/lib.rs:26 takes `&[ArrayRef]`, any Arrow
  * type). An all-null column travels as an all-null Float8 vector: no
  * value crosses, so the physical type is immaterial.
  */
object ArrowBatchCodec {

  /** One allocator per JVM (parent and guest process each have their own);
    * every encode/decode closes its vectors so the allocator stays empty
    * between calls. */
  lazy val allocator: RootAllocator = new RootAllocator()

  def encode(cols: IndexedSeq[Array[Any]], n: Int): Array[Byte] = {
    val vectors: Seq[FieldVector] = cols.zipWithIndex.map { case (col, ci) =>
      buildVector(s"c$ci", col, n)
    }
    val root =
      if (vectors.isEmpty)
        new VectorSchemaRoot(
          new org.apache.arrow.vector.types.pojo.Schema(
            java.util.Collections.emptyList()),
          java.util.Collections.emptyList[FieldVector](), n)
      else VectorSchemaRoot.of(vectors: _*)
    try {
      root.setRowCount(n)
      val out = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
      try { writer.start(); writer.writeBatch(); writer.end() }
      finally writer.close()
      out.toByteArray
    } finally root.close()
  }

  /** @return (columns, rowCount) */
  def decode(bytes: Array[Byte]): (IndexedSeq[Array[Any]], Int) = {
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val hasBatch = reader.loadNextBatch()
      val root = reader.getVectorSchemaRoot
      val n = if (hasBatch) root.getRowCount else 0
      val cols = root.getFieldVectors.asScala.toIndexedSeq.map { v =>
        Array.tabulate[Any](n)(i =>
          if (v.isNull(i)) null else fromArrow(v.getObject(i)))
      }
      (cols, n)
    } finally reader.close()
  }

  private def fromArrow(v: Any): Any = v match {
    case t: Text => t.toString
    case l: java.util.List[_] => l.asScala.toVector.map {
      case null => null
      case t: Text => t.toString
      case other => other
    }
    case other => other
  }


  private def mismatch(name: String, expected: String, got: Any): Nothing =
    throw new IllegalArgumentException(
      s"column $name: expected $expected for arrow marshalling but found " +
        got.getClass.getName + " — mixed-type output columns corrupt data")

  private def buildVector(name: String, col: Array[Any], n: Int): FieldVector = {
    val sample = col.find(_ != null).orNull
    sample match {
      case null | _: java.lang.Double =>
        val v = new Float8Vector(name, allocator)
        v.allocateNew(n)
        var i = 0
        while (i < n) {
          col(i) match {
            case d: java.lang.Double => v.setSafe(i, d.doubleValue)
            case null => () // stays null
            case other => mismatch(name, "Double", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case _: java.lang.Float =>
        val v = new Float4Vector(name, allocator)
        v.allocateNew(n)
        var i = 0
        while (i < n) {
          col(i) match {
            case f: java.lang.Float => v.setSafe(i, f.floatValue)
            case null => ()
            case other => mismatch(name, "Float", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case _: java.lang.Long =>
        val v = new BigIntVector(name, allocator)
        v.allocateNew(n)
        var i = 0
        while (i < n) {
          col(i) match {
            case l: java.lang.Long => v.setSafe(i, l.longValue)
            case null => ()
            case other => mismatch(name, "Long", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case _: java.lang.Integer =>
        val v = new IntVector(name, allocator)
        v.allocateNew(n)
        var i = 0
        while (i < n) {
          col(i) match {
            case x: java.lang.Integer => v.setSafe(i, x.intValue)
            case null => ()
            case other => mismatch(name, "Integer", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case _: java.lang.Boolean =>
        val v = new BitVector(name, allocator)
        v.allocateNew(n)
        var i = 0
        while (i < n) {
          col(i) match {
            case b: java.lang.Boolean => v.setSafe(i, if (b) 1 else 0)
            case null => ()
            case other => mismatch(name, "Boolean", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case _: String =>
        val v = new VarCharVector(name, allocator)
        v.allocateNew()
        var i = 0
        while (i < n) {
          col(i) match {
            case s: String => v.setSafe(i, s.getBytes("UTF-8"))
            case null => ()
            case other => mismatch(name, "String", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case _: Array[Byte] =>
        val v = new VarBinaryVector(name, allocator)
        v.allocateNew()
        var i = 0
        while (i < n) {
          col(i) match {
            case b: Array[Byte] => v.setSafe(i, b)
            case null => ()
            case other => mismatch(name, "Array[Byte]", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case _: Seq[_] =>
        val v = ListVector.empty(name, allocator)
        val w = v.getWriter
        var i = 0
        while (i < n) {
          col(i) match {
            case xs: Seq[_] =>
              w.setPosition(i)
              w.startList()
              xs.foreach {
                case d: java.lang.Double => w.float8().writeFloat8(d.doubleValue)
                case l: java.lang.Long => w.bigInt().writeBigInt(l.longValue)
                case x: java.lang.Integer => w.integer().writeInt(x.intValue)
                case s: String =>
                  val b = s.getBytes("UTF-8")
                  val buf = allocator.buffer(b.length.toLong)
                  try { buf.setBytes(0, b); w.varChar().writeVarChar(0, b.length, buf) }
                  finally buf.close()
                case other => throw new IllegalArgumentException(
                  "unsupported list element for arrow marshalling: " +
                    (if (other == null) "null" else other.getClass.getName))
              }
              w.endList()
            case null => () // null list stays null
            case other => mismatch(name, "Seq", other)
          }
          i += 1
        }
        v.setValueCount(n); v
      case other => throw new IllegalArgumentException(
        s"unsupported type for arrow marshalling: ${other.getClass.getName}")
    }
  }
}
