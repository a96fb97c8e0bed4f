package graft.functions
object ModeProbe {
  def main(args: Array[String]): Unit = {
    val mc = ZstdDecode.modeCounters
    def tryShape(tag: String, data: Array[Byte], lvl: Int): Unit = {
      (0 until mc.length()).foreach(i => mc.set(i, 0))
      val comp = com.github.luben.zstd.Zstd.compress(data, lvl)
      ZstdDecode.decompressData(comp)
      println(f"$tag%-28s lvl=$lvl%2d ofRepeat=${mc.get(11)} wDirect=${mc.get(18)} (litC=${mc.get(2)} tless=${mc.get(3)})")
    }
    val r = new java.util.Random(4)
    // 4-symbol random for direct weights
    val sym4 = Array.fill[Byte](2000)("abcd"(r.nextInt(4)).toByte)
    val sym4big = Array.fill[Byte](60000)("abcd"(r.nextInt(4)).toByte)
    val sym8 = Array.fill[Byte](3000)("abcdefgh"(r.nextInt(8)).toByte)
    for (lvl <- Seq(1, 3, 9, 19)) { tryShape("sym4-2k", sym4, lvl); tryShape("sym8-3k", sym8, lvl); tryShape("sym4-60k", sym4big, lvl) }
    // of:repeat hunting: homogeneous multi-block
    val words = Array("data", "pipeline", "spark", "the", "and")
    def eng(n: Int) = { val sb = new StringBuilder; val rr = new java.util.Random(3)
      while (sb.length < n) sb.append(words(rr.nextInt(words.length))).append(' '); sb.toString.getBytes }
    for (lvl <- Seq(3, 6, 12, 16, 19, 22)) tryShape("eng-2M", eng(2 << 20), lvl)
    val big = { val a = new Array[Byte](2 << 20); r.nextBytes(a); for (i <- a.indices) a(i) = (a(i) % 5).toByte; a }
    for (lvl <- Seq(6, 12, 17)) tryShape("low5-2M", big, lvl)
    val per = ("abcdefghij" * 80000).getBytes
    for (lvl <- Seq(6, 12, 19)) tryShape("periodic-800k", per, lvl)
    // direct-weight hunting: tiny alphabets / skew / strategies
    for (k <- Seq(2, 3, 5, 6, 12, 24)) {
      val d = Array.fill[Byte](4000)(('a' + r.nextInt(k)).toByte)
      for (lvl <- Seq(1, 3, 19)) tryShape(s"sym$k-4k", d, lvl)
    }
    val skew = Array.fill[Byte](4000)(if (r.nextInt(100) < 90) 'a'.toByte else ('b' + r.nextInt(20)).toByte)
    for (lvl <- Seq(1, 3, 19)) tryShape("skew90-4k", skew, lvl)
  }
}
