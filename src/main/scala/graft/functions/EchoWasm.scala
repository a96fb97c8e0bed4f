package graft.functions

/** A second real `.wasm` guest artifact, emitted from scratch (no Rust
  * toolchain resolves offline), following the reference's guest recipe
  * (wasm_function/src/lib.rs + the `export_udf_function!` shim,
  * wasm_udf/src/lib.rs:51-67): it exports `allocate` and a
  * `__wasm_udf_echo` function speaking the exact wasmedge-bindgen return
  * protocol [[WasmRuntime]] drives — [flag u8][ptr][len] with one
  * `(ptr, type=21, len)` u8-array record.
  *
  * `echo` returns the input batch's IPC bytes unchanged (zero-copy inside
  * the guest: the record points straight at the host-written payload), so
  * it is the identity function for ANY column type — which is exactly the
  * point: it drives the STRING and ARRAY Arrow-IPC marshalling through
  * real WASM bytecode end-to-end (q63/WasmRuntimeSpec cover only the f64
  * path of the prebuilt reference artifact). The module also exercises
  * interpreter surface the reference artifact touches only lightly:
  * a mutable global (the bump-allocator heap pointer), `memory.size` /
  * `memory.grow` with a br_if-guarded grow path, and unaligned i32 stores
  * (the +1/+5 result-struct offsets).
  *
  * Bytes are assembled directly from the public core binary grammar
  * (https://webassembly.github.io/spec/core/binary/) and written to a
  * per-JVM temp file so `CREATE FUNCTION … LANGUAGE WASM AS '<path>!echo'`
  * loads it through the same factory path as any artifact.
  */
object EchoWasm {

  private def uleb(v: Long): Seq[Byte] = {
    var x = v; val out = Seq.newBuilder[Byte]
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt; x >>>= 7
      if (x == 0) { out += b.toByte; more = false }
      else out += (b | 0x80).toByte
    }
    out.result()
  }
  private def sleb(v: Long): Seq[Byte] = {
    var x = v; val out = Seq.newBuilder[Byte]
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt; x >>= 7
      if ((x == 0 && (b & 0x40) == 0) || (x == -1 && (b & 0x40) != 0)) {
        out += b.toByte; more = false
      } else out += (b | 0x80).toByte
    }
    out.result()
  }
  private def section(id: Int, body: Seq[Byte]): Seq[Byte] =
    id.toByte +: (uleb(body.length.toLong) ++ body)
  private def b(xs: Int*): Seq[Byte] = xs.map(_.toByte)

  /** The assembled module. */
  lazy val bytes: Array[Byte] = {
    // types: 0 = (i32)->i32 (allocate), 1 = (i32,i32)->i32 (udf)
    val typeSec = section(1, b(0x02,
      0x60, 0x01, 0x7F, 0x01, 0x7F,
      0x60, 0x02, 0x7F, 0x7F, 0x01, 0x7F))
    val funcSec = section(3, b(0x02, 0x00, 0x01))
    val memSec = section(5, b(0x01, 0x00, 0x01)) // min 1 page
    // global 0: mutable i32 heap pointer, init 8 (0 stays unused so a
    // returned pointer is never falsy)
    val globalSec = section(6, b(0x01, 0x7F, 0x01, 0x41) ++ sleb(8) ++ b(0x0B))
    def export(name: String, idx: Int): Seq[Byte] = {
      val nb = name.getBytes("UTF-8")
      uleb(nb.length.toLong) ++ nb.toSeq ++ b(0x00) ++ uleb(idx.toLong)
    }
    val exportSec = section(7,
      b(0x02) ++ export("allocate", 0) ++ export("__wasm_udf_echo", 1))

    // allocate(len): bump + align-8, grow memory if the new heap top
    // passes the current page count (br_if-guarded — LLVM-style, no if)
    val allocate: Seq[Byte] =
      b(0x01, 0x02, 0x7F) ++ // locals: 2 × i32 (ret, pages)
        b(0x23, 0x00,        // global.get heap
          0x21, 0x01,        // local.set ret
          0x20, 0x01,        // local.get ret
          0x20, 0x00,        // local.get len
          0x6A,              // i32.add
          0x41, 0x07, 0x6A,  // + 7
          0x41, 0x78, 0x71,  // & -8
          0x24, 0x00,        // global.set heap
          0x23, 0x00) ++     // global.get heap
        b(0x41) ++ sleb(65535) ++
        b(0x6A,              // + 65535
          0x41, 0x10, 0x76,  // >>> 16 → pages needed
          0x21, 0x02,        // local.set pages
          0x02, 0x40,        //   block
          0x20, 0x02,        //     local.get pages
          0x3F, 0x00,        //     memory.size
          0x4D,              //     i32.le_u
          0x0D, 0x00,        //     br_if 0 (enough memory)
          0x20, 0x02,        //     local.get pages
          0x3F, 0x00,        //     memory.size
          0x6B,              //     i32.sub
          0x40, 0x00,        //     memory.grow
          0x1A,              //     drop
          0x0B,              //   end
          0x20, 0x01,        // local.get ret
          0x0B)              // end

    // __wasm_udf_echo(pairs_ptr, n): read the (ptr,len) of param 0 and
    // return it as the single u8-array record — the identity batch
    val echo: Seq[Byte] =
      b(0x01, 0x04, 0x7F) ++ // locals: 4 × i32 (inp, inl, rec, rp)
        b(0x20, 0x00, 0x28, 0x02, 0x00, 0x21, 0x02, // inp = load(p)
          0x20, 0x00, 0x28, 0x02, 0x04, 0x21, 0x03, // inl = load(p+4)
          0x41, 0x0C, 0x10, 0x00, 0x21, 0x04,       // rec = allocate(12)
          0x20, 0x04, 0x20, 0x02, 0x36, 0x02, 0x00, // rec[0] = inp
          0x20, 0x04, 0x41, 0x15, 0x36, 0x02, 0x04, // rec[4] = 21 (u8 array)
          0x20, 0x04, 0x20, 0x03, 0x36, 0x02, 0x08, // rec[8] = inl
          0x41, 0x0D, 0x10, 0x00, 0x21, 0x05,       // rp = allocate(13)
          0x20, 0x05, 0x41, 0x00, 0x3A, 0x00, 0x00, // rp[0] = flag 0
          0x20, 0x05, 0x20, 0x04, 0x36, 0x00, 0x01, // rp[1] = rec (unaligned)
          0x20, 0x05, 0x41, 0x01, 0x36, 0x00, 0x05, // rp[5] = 1 record
          0x20, 0x05,                               // return rp
          0x0B)
    def body(code: Seq[Byte]): Seq[Byte] = uleb(code.length.toLong) ++ code
    val codeSec = section(10, b(0x02) ++ body(allocate) ++ body(echo))

    (Seq[Byte](0, 'a', 's', 'm', 1, 0, 0, 0) ++
      typeSec ++ funcSec ++ memSec ++ globalSec ++ exportSec ++ codeSec).toArray
  }

  /** Path of the artifact on local disk, written once per JVM. */
  lazy val path: String = {
    val f = java.nio.file.Files.createTempFile("graft_echo", ".wasm")
    java.nio.file.Files.write(f, bytes)
    f.toFile.deleteOnExit()
    f.toAbsolutePath.toString
  }
}
