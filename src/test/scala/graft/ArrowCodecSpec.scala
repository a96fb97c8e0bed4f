package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrowBatchCodec

/** Unit coverage for the Arrow IPC batch codec under every supported
  * vector type and null pattern — the wire format of the `proc:`
  * host↔guest boundary (ProcessRuntimeSpec covers it end-to-end; this
  * pins the codec in isolation so a marshalling regression localizes).
  */
class ArrowCodecSpec extends AnyFunSuite {

  private def roundTrip(cols: IndexedSeq[Array[Any]], n: Int) =
    ArrowBatchCodec.decode(ArrowBatchCodec.encode(cols, n))

  test("every supported type round-trips with interleaved nulls") {
    val n = 5
    val cols: IndexedSeq[Array[Any]] = IndexedSeq(
      Array[Any](1.5, null, -3.25, 0.0, Double.MaxValue),
      Array[Any](1.5f, null, -3.25f, 0.0f, 7.5f),
      Array[Any](1L, null, Long.MinValue, Long.MaxValue, 0L),
      Array[Any](7, null, Int.MinValue, Int.MaxValue, 0),
      Array[Any](true, null, false, true, false),
      Array[Any]("a", null, "", "utf8 ✓ ému", "z" * 100),
      Array[Any](Array[Byte](1, 2, 3), null, Array.emptyByteArray,
        Array[Byte](-1), Array[Byte](0)),
      Array[Any](Seq(1.0, 2.0), null, Seq.empty[Double], Seq(-1.5), Seq(9.0)))
    val (out, m) = roundTrip(cols, n)
    assert(m == n && out.length == cols.length)
    // exact value + null-position equality per column (binary/seq by content)
    for (c <- cols.indices; i <- 0 until n) (cols(c)(i), out(c)(i)) match {
      case (null, got) => assert(got == null, s"col $c row $i")
      case (want: Array[Byte], got: Array[Byte]) =>
        assert(want.sameElements(got), s"col $c row $i")
      case (want: Seq[_], got: Seq[_]) =>
        assert(want == got, s"col $c row $i")
      case (want, got) => assert(want == got, s"col $c row $i")
    }
  }

  test("degenerate batches: all-null column, zero columns, zero rows") {
    // all-null column: no value crosses, physical type immaterial
    val (nulls, n1) = roundTrip(IndexedSeq(Array[Any](null, null, null)), 3)
    assert(n1 == 3 && nulls(0).forall(_ == null))
    // zero-arg function batch: row count must still survive
    val (empty, n2) = roundTrip(IndexedSeq.empty, 4)
    assert(n2 == 4 && empty.isEmpty)
    // zero-row batch
    val (zr, n3) = roundTrip(IndexedSeq(Array.empty[Any]), 0)
    assert(n3 == 0 && zr(0).isEmpty)
  }

  test("long and string list elements round-trip") {
    val cols: IndexedSeq[Array[Any]] = IndexedSeq(
      Array[Any](Seq(1L, 2L, 3L), Seq.empty[Long], null),
      Array[Any](Seq("x", "y"), Seq("a b", ""), Seq("solo")))
    val (out, _) = roundTrip(cols, 3)
    assert(out(0)(0) == Seq(1L, 2L, 3L) && out(0)(1) == Seq.empty &&
      out(0)(2) == null)
    assert(out(1)(0) == Seq("x", "y") && out(1)(1) == Seq("a b", "") &&
      out(1)(2) == Seq("solo"))
  }

  test("unsupported types fail loudly (→ the panic path), not silently") {
    val e = intercept[IllegalArgumentException] {
      ArrowBatchCodec.encode(
        IndexedSeq(Array[Any](new java.math.BigDecimal("1.5"))), 1)
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("a type-mismatched non-null cell fails loudly instead of silently " +
    "encoding null (mixed Double/Long output column)") {
    val e = intercept[IllegalArgumentException] {
      ArrowBatchCodec.encode(IndexedSeq(Array[Any](1.5, 2L, 3.5)), 3)
    }
    assert(e.getMessage.contains("mixed-type"))
    // same guard on list columns
    val e2 = intercept[IllegalArgumentException] {
      ArrowBatchCodec.encode(IndexedSeq(Array[Any](Seq(1.0), "not a list")), 2)
    }
    assert(e2.getMessage.contains("mixed-type"))
  }

  test("allocator leaks nothing across round-trips") {
    val before = ArrowBatchCodec.allocator.getAllocatedMemory
    (1 to 50).foreach { _ =>
      roundTrip(IndexedSeq(Array[Any](1.0, 2.0), Array[Any]("a", "b")), 2)
    }
    assert(ArrowBatchCodec.allocator.getAllocatedMemory == before,
      "every encode/decode must close its vectors")
  }
}
