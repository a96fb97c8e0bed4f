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

  test("MODE COVERAGE is proven, not assumed: across this spec's real-" +
    "zstd corpus the decoder visits every literals type (raw/RLE/" +
    "compressed/treeless), every sequence symbol mode (predefined/RLE/" +
    "FSE-compressed/repeat) for LL and ML, both literal stream layouts, " +
    "and both Huffman weight encodings — so a path zstd-jni stopped " +
    "emitting would be caught here instead of silently going untested") {
    val mc = ZstdDecode.modeCounters
    (0 until mc.length()).foreach(i => mc.set(i, 0))
    // the corpus: the main round-trip shapes at all levels + streaming
    val text = ("the quick brown fox jumps over the lazy dog. " * 500).getBytes
    val rep = Array.fill[Byte](100000)(7)
    val rand = { val a = new Array[Byte](200000); new java.util.Random(1).nextBytes(a); a }
    val mixed = (0 until 300000).map(i => ((i * 31 + (i >> 5)) % 17 + 'a').toByte).toArray
    val eng = english(500000)
    // shapes targeting the rarer encoder choices:
    // all-same-byte literals between matches → RLE literals
    val rleLit = {
      val r = new java.util.Random(9)
      val sb = new StringBuilder
      while (sb.length < 200000) {
        sb.append("a" * (1 + r.nextInt(6))).append("thequickbrownfox")
      }
      sb.toString.getBytes
    }
    // perfectly periodic → one offset/match-length per block (RLE modes)
    val periodic = ("abcdefgh" * 40000).getBytes
    // 1 MiB low-entropy → multi-block with table reuse (repeat modes)
    val big = { val a = new Array[Byte](1 << 20)
      new java.util.Random(2).nextBytes(a)
      for (i <- a.indices) a(i) = (a(i) % 5).toByte; a }
    // tiny input → one-or-two-sequence blocks → RLE symbol modes for
    // offsets/match-lengths (found empirically: big shapes never do)
    val tiny = "aaaaabbbbbcccccdddddaaaaabbbbbcccccxyz".getBytes
    for (lvl <- Seq(1, 3, 9, 19);
         d <- Seq(text, rep, rand, mixed, eng, rleLit, periodic, big, tiny))
      roundTrip(d, lvl)
    // homogeneous 2 MiB (5-word vocabulary) at level 16: the encoder
    // reuses the previous block's OFFSET table (repeat mode) — found
    // empirically; no smaller/lower-level shape in this corpus does
    val eng5 = {
      val words = Array("data", "pipeline", "spark", "the", "and")
      val rr = new java.util.Random(3)
      val sb = new StringBuilder
      while (sb.length < (2 << 20)) sb.append(words(rr.nextInt(words.length))).append(' ')
      sb.toString.getBytes
    }
    roundTrip(eng5, 16)
    // the one path REAL encoders never emit: direct (4-bit) Huffman
    // weights — libzstd always FSE-compresses the weight vector. Cover
    // it with a hand-derived frame (RFC 8878 §4.2.1): 3-symbol canonical
    // table over {A,B,C}, weights [2,1] + derived last weight 1
    // (maxBits 2: A→'1', B→'00', C→'01'), literals "ABCAAB" in a
    // single-stream compressed-literals block with zero sequences.
    val direct: Array[Byte] = {
      val weights = new Array[Byte](34)
      weights(32) = 0x02          // w[64]=0 | w[65]('A')=2
      weights(33) = 0x10          // w[66]('B')=1 | pad
      (Array[Int](0x28, 0xB5, 0x2F, 0xFD,  // magic
        0x20, 0x06,                        // FHD single-segment, FCS=6
        0x4D, 0x01, 0x00,                  // block: size 41, compressed, last
        0x62, 0x40, 0x09,                  // literals hdr: type2 fmt0 regen6 comp37
        0xC2) ++                           // hv = 127 + 67 symbols → DIRECT
        weights.map(_.toInt & 0xFF) ++
        Array[Int](0x1C, 0x03,             // huffman stream (sentinel bit 9)
          0x00)                            // zero sequences
      ).map(_.toByte)
    }
    val gotDirect = ZstdDecode.decompressData(direct)
    assert(gotDirect != null && new String(gotDirect, "US-ASCII") == "ABCAAB",
      s"hand-derived direct-weights frame: got ${if (gotDirect == null) "null"
        else new String(gotDirect, "US-ASCII")}")
    val names = Seq(
      "lit:raw", "lit:rle", "lit:compressed", "lit:treeless",
      "ll:predef", "ll:rle", "ll:fse", "ll:repeat",
      "of:predef", "of:rle", "of:fse", "of:repeat",
      "ml:predef", "ml:rle", "ml:fse", "ml:repeat",
      "huf:1stream", "huf:4stream", "weights:direct", "weights:fse")
    val counts = names.indices.map(i => names(i) -> mc.get(i))
    info(counts.map { case (n, c) => s"$n=$c" }.mkString(" "))
    names.indices.foreach { i =>
      assert(mc.get(i) > 0, s"decode path ${names(i)} never exercised " +
        "by the real-zstd corpus — add a data shape that reaches it")
    }
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
