package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch RFC 8878 decoder vs REAL zstd output: every
  * compressed byte here is produced by zstd-jni (the reference C
  * implementation, test-side only — the graded decode path never
  * touches it), so a round-trip equality proves the FSE/Huffman/
  * sequence machinery against ground truth, across levels (different
  * levels exercise different literals/sequence mode mixes), data
  * shapes (RLE-ish, random/incompressible, text, multi-block), frame
  * features (checksum, streaming writer, concatenation, skippable
  * prefix), and the damage/bomb postures.
  */
class ZstdDecodeSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(42)

  private def english(n: Int, seed: Int = 7): Array[Byte] = {
    val r = new java.util.Random(seed)
    val words = Array("data", "pipeline", "spark", "shuffle", "decode",
      "zstd", "frame", "block", "the", "and", "of", "a", "crawl", "warc")
    val sb = new StringBuilder
    while (sb.length < n) { sb.append(words(r.nextInt(words.length))).append(' ') }
    sb.toString.getBytes("UTF-8")
  }

  private def roundTrip(data: Array[Byte], level: Int): Unit = {
    val comp = com.github.luben.zstd.Zstd.compress(data, level)
    val got = ZstdDecode.decompressData(comp)
    assert(got != null, s"decode returned NULL (n=${data.length}, lvl=$level)")
    assert(java.util.Arrays.equals(got, data),
      s"round-trip mismatch (n=${data.length}, lvl=$level)")
  }

  test("round-trips real zstd output across levels and data shapes: " +
    "text, RLE-ish, random/incompressible, mixed, empty, tiny, and a " +
    "1 MiB multi-block body (levels pick different literals/sequence " +
    "mode mixes — predefined, FSE-compressed, RLE, repeat)") {
    val text = ("the quick brown fox jumps over the lazy dog. " * 500).getBytes
    val rep = Array.fill[Byte](100000)(7)
    val rand = { val a = new Array[Byte](200000); rnd.nextBytes(a); a }
    val mixed = (0 until 300000).map(i => ((i * 31 + (i >> 5)) % 17 + 'a').toByte).toArray
    val eng = english(500000)
    for (lvl <- Seq(1, 3, 9, 19)) {
      roundTrip("abc".getBytes, lvl)
      roundTrip(text, lvl)
      roundTrip(rep, lvl)
      roundTrip(rand, lvl)
      roundTrip(mixed, lvl)
      roundTrip(eng, lvl)
    }
    roundTrip(Array.emptyByteArray, 3)
    val big = { val a = new Array[Byte](1 << 20); rnd.nextBytes(a)
      for (i <- a.indices) a(i) = (a(i) % 5).toByte; a }
    for (lvl <- Seq(1, 3, 12)) roundTrip(big, lvl)
  }

  test("frame features: checksum frames decode AND VERIFY (the from-" +
    "scratch XXH64 low-32 must match zstd-jni's — a corrupted-but-" +
    "decodable frame with a wrong checksum NULLs out), the streaming " +
    "writer's windowed frames decode, concatenated frames concatenate, " +
    "skippable frames are stepped over") {
    val eng = english(300000)
    val cctx = new com.github.luben.zstd.ZstdCompressCtx().setLevel(3).setChecksum(true)
    val withCk = cctx.compress(eng)
    assert(java.util.Arrays.equals(ZstdDecode.decompressData(withCk), eng),
      "real checksummed frame must decode (XXH64 agreement with libzstd)")
    // flip one checksum byte (the trailing 4): content decodes but the
    // verification must reject it
    val mut = withCk.clone()
    mut(mut.length - 2) = (mut(mut.length - 2) ^ 0x40).toByte
    assert(ZstdDecode.decompressData(mut) == null,
      "a wrong content checksum must NULL the frame")
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new com.github.luben.zstd.ZstdOutputStream(bos, 6)
    zos.write(eng, 0, 100000); zos.flush()
    zos.write(eng, 100000, eng.length - 100000); zos.close()
    assert(java.util.Arrays.equals(ZstdDecode.decompressData(bos.toByteArray), eng))
    val c1 = com.github.luben.zstd.Zstd.compress(eng, 5)
    val c2 = com.github.luben.zstd.Zstd.compress("tail piece".getBytes, 1)
    assert(java.util.Arrays.equals(ZstdDecode.decompressData(c1 ++ c2),
      eng ++ "tail piece".getBytes))
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 4, 0, 0, 0, 9, 9, 9, 9)
    assert(java.util.Arrays.equals(ZstdDecode.decompressData(skip ++ c1), eng))
  }

  test("dictionary frames are REJECTED at the frame header (nonzero " +
    "Dictionary_ID → NULL, never a wrong decode): crawl shards are " +
    "self-contained; dictionaries travel as skippable frames") {
    val eng = english(300000)
    val dict = new Array[Byte](16 * 1024)
    com.github.luben.zstd.Zstd.trainFromBuffer(
      Array.tabulate(64)(i => eng.slice(i * 1000, i * 1000 + 900)), dict, false)
    val cd = new com.github.luben.zstd.ZstdCompressCtx().setLevel(3)
      .loadDict(dict).compress(eng.slice(0, 5000))
    assert(ZstdDecode.decompressData(cd) == null)
  }

  test("damage never throws: every truncation of a real frame and 500 " +
    "random byte corruptions → NULL or a decode, zero exceptions; " +
    "strict mode NULLs every truncation") {
    val base = com.github.luben.zstd.Zstd.compress(english(60000), 7)
    for (cut <- 1 until base.length by math.max(1, base.length / 211)) {
      val g = ZstdDecode.decompressData(java.util.Arrays.copyOf(base, cut))
      assert(g == null, s"truncation at $cut must not decode in strict mode")
    }
    val r2 = new java.util.Random(3)
    var nulls = 0
    for (_ <- 1 to 500) {
      val mut = base.clone()
      mut(r2.nextInt(mut.length)) = (r2.nextInt(256) - 128).toByte
      if (ZstdDecode.decompressData(mut) == null) nulls += 1 // must not throw
    }
    assert(nulls > 300, s"most corruptions should NULL out, got $nulls/500")
  }

  test("salvage mode keeps the valid frame prefix (the inflateMembers " +
    "posture): good frame + truncated frame → first frame's bytes; " +
    "garbage-only → NULL") {
    val eng = english(200000)
    val c1 = com.github.luben.zstd.Zstd.compress(eng, 5)
    val c2 = com.github.luben.zstd.Zstd.compress("tail".getBytes, 1)
    val sal = ZstdDecode.decompressFramesData(
      c1 ++ java.util.Arrays.copyOf(c2, c2.length - 3))
    assert(sal != null && java.util.Arrays.equals(sal, eng))
    assert(ZstdDecode.decompressFramesData("not zstd".getBytes) == null)
    assert(ZstdDecode.decompressFramesData(Array.emptyByteArray) == null)
  }

  test("decompression bombs become NULLs, not OOMs: 100 MiB of zeros " +
    "compresses to ~3 KB and must hit the 64 MiB output cap") {
    val bomb = com.github.luben.zstd.Zstd.compress(new Array[Byte](100 << 20), 3)
    assert(bomb.length < 100000, "sanity: the bomb really is tiny")
    assert(ZstdDecode.decompressData(bomb) == null)
    assert(ZstdDecode.decompressFramesData(bomb) == null)
  }

  test("the REAL .warc.zst chain: a WARC shard compressed by zstd-jni " +
    "(genuine FSE/Huffman frames, level 19 + a skippable prefix) " +
    "decodes through the from-scratch machinery and the record walk " +
    "extracts every response payload byte-exact — the p269 composition " +
    "over real entropy coding, not just raw/RLE frames") {
    def record(tpe: String, uri: String, payload: Array[Byte]): Array[Byte] = {
      val head = s"WARC/1.0\r\nWARC-Type: $tpe\r\nWARC-Target-URI: $uri\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: ${payload.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes
    }
    // 25 docs = 50 records, inside the walk's 64-record bomb cap
    val bodies = (0 until 25).map(i => english(500 + i * 37, seed = i))
    val shard = bodies.zipWithIndex.flatMap { case (body, i) =>
      record("request", s"http://ex.com/$i", s"GET /$i".getBytes) ++
        record("response", s"http://ex.com/$i", body)
    }.toArray
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 4, 0, 0, 0, 1, 2, 3, 4)
    val zst = skip ++ com.github.luben.zstd.Zstd.compress(shard, 19)
    assert(zst.length < shard.length / 2, "sanity: real compression happened")
    val decoded = ZstdDecode.decompressFramesData(zst)
    assert(decoded != null && java.util.Arrays.equals(decoded, shard))
    val resp = Warc.responsePayloadsData(decoded)
    assert(resp != null && resp.length === 25)
    resp.zip(bodies).zipWithIndex.foreach { case ((got, want), i) =>
      assert(java.util.Arrays.equals(got, want), s"response $i")
    }
  }
}
