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

  test("artifact decodes: MVP surface, two exports, one mutable global") {
    val m = WasmModule.parse(EchoWasm.bytes)
    assert(m.udfExports === Seq("echo"))
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
}
