package graft.functions

/** Dev probe: single-thread ZstdDecode throughput on 8 MiB of word-
  * salad text vs zstd-jni's native decode, best-of-8.
  * Usage: sbt "Test/runMain graft.functions.ZstdThroughput"
  */
object ZstdThroughput {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(1)
    val words = Array("data", "pipeline", "spark", "decode", "zstd", "the", "and", "of", "crawl", "warc")
    val sb = new StringBuilder
    while (sb.length < (8 << 20)) { sb.append(words(rnd.nextInt(words.length))).append(' ') }
    val data = sb.toString.getBytes
    val comp = com.github.luben.zstd.Zstd.compress(data, 3)
    println(s"in=${data.length} comp=${comp.length}")
    var best = Long.MaxValue
    for (_ <- 1 to 8) {
      val t0 = System.nanoTime()
      val g = ZstdDecode.decompressData(comp)
      val dt = System.nanoTime() - t0
      assert(g.length == data.length)
      if (dt < best) best = dt
    }
    println(f"best=${best / 1e6}%.1f ms  ${data.length / (best / 1e9) / 1e6}%.1f MB/s decode")
    // compare with jni for context
    var bestJ = Long.MaxValue
    for (_ <- 1 to 8) {
      val t0 = System.nanoTime()
      val g = com.github.luben.zstd.Zstd.decompress(comp, data.length)
      val dt = System.nanoTime() - t0
      assert(g.length == data.length)
      if (dt < bestJ) bestJ = dt
    }
    println(f"jni  =${bestJ / 1e6}%.1f ms  ${data.length / (bestJ / 1e9) / 1e6}%.1f MB/s")
  }
}
