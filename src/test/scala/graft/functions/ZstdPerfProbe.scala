package graft.functions

/** Dev probe: ZstdDecode throughput by data shape (text = Huffman+
  * sequence heavy, mixed = match-dominated, random = raw blocks) and
  * level, best-of-10 — the measurement loop behind the r17 bit-reader
  * optimizations. Usage: sbt "Test/runMain graft.functions.ZstdPerfProbe"
  */
object ZstdPerfProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(1)
    def bench(tag: String, data: Array[Byte], lvl: Int): Unit = {
      val comp = com.github.luben.zstd.Zstd.compress(data, lvl)
      var best = Long.MaxValue
      for (_ <- 1 to 10) {
        val t0 = System.nanoTime()
        val g = ZstdDecode.decompressData(comp)
        val dt = System.nanoTime() - t0
        assert(g.length == data.length)
        if (dt < best) best = dt
      }
      println(f"$tag%-14s lvl=$lvl%2d ${data.length / (best / 1e9) / 1e6}%7.1f MB/s (comp ratio ${data.length.toDouble/comp.length}%5.1f)")
    }
    val words = Array("data", "pipeline", "spark", "decode", "zstd", "the", "and", "of", "crawl", "warc")
    val sb = new StringBuilder
    while (sb.length < (8 << 20)) { sb.append(words(rnd.nextInt(words.length))).append(' ') }
    val english = sb.toString.getBytes
    val mixed = (0 until (8 << 20)).map(i => ((i * 31 + (i >> 5)) % 17 + 'a').toByte).toArray
    val rand = { val a = new Array[Byte](8 << 20); rnd.nextBytes(a); a }
    bench("english", english, 3); bench("english", english, 19)
    bench("mixed", mixed, 3); bench("rand", rand, 3)
  }
}
