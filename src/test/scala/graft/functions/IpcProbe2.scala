package graft.functions

/** Dev probe: dumps the Arrow IPC wire layout (stream framing, record-
  * batch metadata bytes, body) for the (f64, f64) input and single-f64
  * reply schemas — the derivation record for [[PowWasm]]'s fixed-offset
  * guest-side parse and reply template (n at meta+64, buffer metas at
  * 80..136, metaLens 192/184 and 144/136). Re-run after any Arrow
  * upgrade; PowWasm's template also asserts the layout at assembly.
  * Usage: sbt "Test/runMain graft.functions.IpcProbe2"
  */
object IpcProbe2 {
  def hex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString(" ")
  def dump(tag: String, enc: Array[Byte]): Unit = {
    println(s"--- $tag total=${enc.length}")
    var i = 0; var msg = 0
    while (i + 8 <= enc.length && msg < 2) {
      val mlen = java.nio.ByteBuffer.wrap(enc, i + 4, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      if (mlen == 0) { i += 8 } else {
        println(s"  msg$msg at $i metaLen=$mlen")
        if (msg == 1 || true) println("   meta: " + hex(java.util.Arrays.copyOfRange(enc, i + 8, i + 8 + mlen)))
        i = i + 8 + mlen; msg += 1
      }
    }
    println("   body at " + i + ": " + hex(java.util.Arrays.copyOfRange(enc, i, math.min(enc.length, i + 96))))
  }
  def main(args: Array[String]): Unit = {
    dump("2xf64 3rows", ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](1.0, 2.0, 3.0), Array[Any](4.0, 5.0, 6.0)), 3))
    dump("2xf64 2rows+null", ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](1.0, null), Array[Any](4.0, 5.0)), 2))
    dump("1xf64 3rows", ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](9.0, 16.0, 25.0)), 3))
    dump("1xf64 2rows+null", ArrowBatchCodec.encode(IndexedSeq(
      Array[Any](9.0, null)), 2))
    dump("1xf64 0rows", ArrowBatchCodec.encode(IndexedSeq(
      Array.empty[Any]), 0))
  }
}
