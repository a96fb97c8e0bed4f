package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrowBatchCodec, EchoWasm, WasmModule, WasmRuntime}

/** The second real `.wasm` artifact (functions/EchoWasm — assembled from
  * the public binary grammar, the reference guest recipe's shape): the
  * STRING and ARRAY Arrow-IPC marshalling paths run through genuine WASM
  * bytecode, where the prebuilt reference artifact only carries f64
  * (q63/WasmRuntimeSpec). Also pins interpreter surface the reference
  * artifact exercises only lightly: mutable-global bump allocation,
  * memory.size/grow behind a br_if guard, unaligned i32 stores.
  */
class EchoWasmSpec extends AnyFunSuite {

  test("artifact decodes: MVP surface, three exports, one mutable global") {
    val m = WasmModule.parse(EchoWasm.bytes)
    assert(m.udfExports.toSet === Set("echo", "rev"))
    assert(m.exportedFunc("allocate") === 0)
  }

  test("STRING batch — with a null and non-ASCII — echoes byte-exact " +
    "through real bytecode (the identity function for any column type)") {
    val payload = ArrowBatchCodec.encode(IndexedSeq(
      Array[Any]("hello", "wörld", null, "")), 4)
    val reply = WasmRuntime.invokeBindgen(EchoWasm.path, "echo", payload)
    assert(java.util.Arrays.equals(payload, reply))
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === 4)
    assert(cols(0).toSeq === Seq("hello", "wörld", null, ""))
  }

  test("ARRAY<DOUBLE> batch echoes byte-exact through real bytecode") {
    val payload = ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](Seq(1.0, 2.0, -0.5), Seq.empty[Double], Seq(3.5))), 3)
    val reply = WasmRuntime.invokeBindgen(EchoWasm.path, "echo", payload)
    assert(java.util.Arrays.equals(payload, reply))
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === 3)
    assert(cols(0)(0).asInstanceOf[Seq[Double]] === Seq(1.0, 2.0, -0.5))
  }

  test("a multi-page payload forces the guest's br_if-guarded " +
    "memory.grow path and still round-trips byte-exact") {
    val big = ArrowBatchCodec.encode(IndexedSeq(
      Array.fill[Any](4000)("x" * 80)), 4000)
    assert(big.length > 5 * 65536, "payload must span multiple pages")
    val reply = WasmRuntime.invokeBindgen(EchoWasm.path, "echo", big)
    assert(java.util.Arrays.equals(big, reply))
  }

  // ---- r17: the TRANSFORMING guest — computes and writes a FRESH batch ----

  test("rev guest COMPUTES over string bytes and constructs a fresh " +
    "output batch through real bytecode: per-row byte reversal, " +
    "byte-exact vs the host-side reverse (incl. empty strings and a " +
    "null row); the output bytes are NOT the input bytes") {
    val vals: Array[Any] = Array("hello", "x", "", null, "world!!", "ab")
    val payload = ArrowBatchCodec.encode(IndexedSeq(vals), vals.length)
    val reply = WasmRuntime.invokeBindgen(EchoWasm.path, "rev", payload)
    assert(!java.util.Arrays.equals(payload, reply),
      "a transforming guest must not return the input bytes")
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === vals.length)
    assert(cols(0).toSeq === Seq("olleh", "x", "", null, "!!dlrow", "ba"))
  }

  test("rev at batch scale: 8192 rows reverse byte-exact; the guest's " +
    "IPC walk holds at the engine's real batch size") {
    val big: Array[Any] =
      Array.tabulate(8192)(i => ("row" + i) * (1 + i % 5): Any)
    val payload = ArrowBatchCodec.encode(IndexedSeq(big), 8192)
    val reply = WasmRuntime.invokeBindgen(EchoWasm.path, "rev", payload)
    val (cols, n) = ArrowBatchCodec.decode(reply)
    assert(n === 8192)
    cols(0).zip(big).zipWithIndex.foreach { case ((g, o), i) =>
      assert(g == o.asInstanceOf[String].reverse, s"row $i")
    }
  }

  test("rev shape guard: a payload that is not the single-utf8-column " +
    "IPC shape returns the guest's bindgen Err (the reference's " +
    "shape-specific-guest failure mode), never garbage") {
    val e = intercept[graft.functions.FunctionError] {
      WasmRuntime.invokeBindgen(EchoWasm.path, "rev", "garbage".getBytes)
    }
    assert(e.msg === "rev: unexpected batch shape")
    // a DOUBLE batch is the wrong shape too: schema metadata differs,
    // the fixed-offset guards must catch it
    val dbl = ArrowBatchCodec.encode(IndexedSeq(Array[Any](1.0, 2.0)), 2)
    intercept[graft.functions.FunctionError] {
      WasmRuntime.invokeBindgen(EchoWasm.path, "rev", dbl)
    }
  }
}
