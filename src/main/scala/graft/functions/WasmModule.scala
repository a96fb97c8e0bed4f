package graft.functions

/** From-scratch wasm32 binary-format parser and pre-decoder.
  *
  * Loads the reference's actual guest artifact
  * (`/root/reference/wasm_function.wasm`, built from
  * wasm_function/src/lib.rs by `export_udf_function!` —
  * wasm_udf/src/lib.rs:51-67) so its `__wasm_udf_*` functions can run as
  * real WASM bytecode inside [[WasmInterpreter]]. Implemented purely from
  * the public WebAssembly core binary spec
  * (https://webassembly.github.io/spec/core/binary/); no WASM runtime is
  * resolvable offline (build.sbt constraint), so this IS the runtime.
  *
  * Scope: the MVP instruction set + sign-extension ops — verified by a full
  * static decode of the reference artifact to be its exact opcode surface
  * (no SIMD, no bulk-memory/saturating 0xFC ops, and — an LLVM artifact —
  * no if/else, only br-based control flow; tools/wasmproto/wasmdec.py).
  * Unknown opcodes fail at LOAD time, not invoke time, so an incompatible
  * module is rejected at `CREATE FUNCTION`, matching the reference factory
  * (wasmedge_factory/src/lib.rs:111-132).
  *
  * Decoding strategy: structured control (block/loop/end/br*) is resolved
  * ONCE at load time into direct jumps. WASM validation guarantees a static
  * operand-stack height at every instruction, so each branch is precomputed
  * as (target instruction, operand height to unwind to, carried arity) and
  * the interpreter needs no runtime control stack — the dispatch loop is a
  * flat array walk.
  */
object WasmModule {

  final class WasmParseException(msg: String) extends RuntimeException(msg)

  /** One decoded function body with branches resolved to jumps. */
  final class WasmFunc(
      val typeId: Int,          // canonical signature id (for call_indirect)
      val nparams: Int,
      val nlocals: Int,         // extra locals beyond params
      val hasResult: Boolean,
      val ops: Array[Int],      // opcode per instruction
      val argL: Array[Long],    // const value / local idx / call idx / packed br target
      val argM: Array[Int],     // memory offset / br-table index
      val brTables: Array[Array[Long]],
      val maxStack: Int)        // static max operand height

  /** Packed branch target: jump lands at (target+1); operand stack truncates
    * to `height`, carrying `arity` (0|1) top values. */
  @inline def packTarget(target: Int, height: Int, arity: Int): Long =
    (target.toLong & 0xFFFFFFFFL) | (height.toLong << 32) | (arity.toLong << 62)

  def parse(bytes: Array[Byte]): WasmModule = new WasmModule(bytes)

  def parseFile(path: String): WasmModule = {
    val f = new java.io.File(path)
    if (!f.isFile)
      throw new WasmParseException(s"wasm module not found: '$path'")
    parse(java.nio.file.Files.readAllBytes(f.toPath))
  }
}

final class WasmModule private (bytes: Array[Byte]) {
  import WasmModule._

  // ---- raw section payloads -------------------------------------------
  private var pos = 0
  private def u8(): Int = { val b = bytes(pos) & 0xFF; pos += 1; b }
  private def u32(): Int = {
    var r = 0; var s = 0; var b = 0
    do { b = u8(); r |= (b & 0x7F) << s; s += 7 } while ((b & 0x80) != 0)
    r
  }
  private def s32leb(): Int = {
    var r = 0; var s = 0; var b = 0
    do { b = u8(); r |= (b & 0x7F) << s; s += 7 } while ((b & 0x80) != 0)
    if (s < 32 && (b & 0x40) != 0) r |= -1 << s
    r
  }
  private def s64leb(): Long = {
    var r = 0L; var s = 0; var b = 0
    do { b = u8(); r |= (b & 0x7FL) << s; s += 7 } while ((b & 0x80) != 0)
    if (s < 64 && (b & 0x40) != 0) r |= -1L << s
    r
  }
  private def rawName(): String = {
    val n = u32(); val s = new String(bytes, pos, n, "UTF-8"); pos += n; s
  }

  // parsed structures
  /** (param value types, result value types) per type index */
  private var types: Array[(Array[Int], Array[Int])] = Array.empty
  /** canonical id per type index (structural equality) */
  private var canonTypeId: Array[Int] = Array.empty
  private[functions] var funcTypeIdx: Array[Int] = Array.empty
  private[functions] var table: Array[Int] = Array.empty // -1 = null entry
  private[functions] var memPagesMin: Int = 0
  /** (valtype, mutable, init bits) */
  private[functions] var globalsInit: Array[Long] = Array.empty
  private[functions] var exports: Map[String, (Int, Int)] = Map.empty
  /** single active data segment model: (offset, bytes) list */
  private[functions] var dataSegs: List[(Int, Array[Byte])] = Nil
  private[functions] var funcs: Array[WasmFunc] = Array.empty

  require(bytes.length >= 8 &&
    bytes(0) == 0 && bytes(1) == 'a' && bytes(2) == 's' && bytes(3) == 'm' &&
    bytes(4) == 1 && bytes(5) == 0 && bytes(6) == 0 && bytes(7) == 0,
    "not a wasm v1 binary")
  pos = 8
  private val codeOffsets = scala.collection.mutable.ArrayBuffer.empty[(Array[Int], Int, Int)]
  while (pos < bytes.length) {
    val sid = u8(); val len = u32(); val end = pos + len
    sid match {
      case 1 => // types
        types = Array.fill(u32()) {
          if (u8() != 0x60) throw new WasmParseException("bad functype")
          val ps = Array.fill(u32())(u8())
          val rs = Array.fill(u32())(u8())
          if (rs.length > 1) throw new WasmParseException("multi-value not supported")
          (ps, rs)
        }
        val canon = scala.collection.mutable.LinkedHashMap.empty[String, Int]
        canonTypeId = types.map { case (ps, rs) =>
          val key = ps.mkString(",") + "->" + rs.mkString(",")
          canon.getOrElseUpdate(key, canon.size)
        }
      case 2 =>
        if (u32() != 0) throw new WasmParseException(
          "imports not supported (reference artifact is import-free)")
      case 3 => funcTypeIdx = Array.fill(u32())(u32())
      case 4 =>
        val n = u32()
        if (n > 0) {
          u8() // elemtype (funcref)
          val flags = u8(); val mn = u32(); if ((flags & 1) != 0) u32()
          table = Array.fill(mn)(-1)
        }
      case 5 =>
        val n = u32()
        if (n > 0) {
          val flags = u8(); memPagesMin = u32(); if ((flags & 1) != 0) u32()
        }
      case 6 =>
        globalsInit = Array.fill(u32()) {
          u8(); u8() // valtype, mutability (value representation is uniform)
          val v = (u8(): @annotation.switch) match {
            case 0x41 => s32leb().toLong & 0xFFFFFFFFL
            case 0x42 => s64leb()
            case 0x43 => { val b = java.lang.Float.floatToRawIntBits(
              java.lang.Float.intBitsToFloat(readF32Bits())).toLong & 0xFFFFFFFFL; b }
            case 0x44 => readF64Bits()
            case other => throw new WasmParseException(s"global init op $other")
          }
          if (u8() != 0x0B) throw new WasmParseException("bad global init end")
          v
        }
      case 7 =>
        exports = Seq.fill(u32()) {
          val nm = rawName(); val k = u8(); val idx = u32(); nm -> (k, idx)
        }.toMap
      case 9 =>
        for (_ <- 0 until u32()) {
          if (u32() != 0) throw new WasmParseException("elem flags unsupported")
          if (u8() != 0x41) throw new WasmParseException("elem offset op")
          val off = s32leb()
          if (u8() != 0x0B) throw new WasmParseException("elem offset end")
          val n = u32()
          var i = 0
          while (i < n) { table(off + i) = u32(); i += 1 }
        }
      case 10 =>
        val n = u32()
        for (_ <- 0 until n) {
          val sz = u32(); val bodyEnd = pos + sz
          val locals = scala.collection.mutable.ArrayBuffer.empty[Int]
          for (_ <- 0 until u32()) {
            val cnt = u32(); val t = u8()
            var i = 0; while (i < cnt) { locals += t; i += 1 }
          }
          codeOffsets += ((locals.toArray, pos, bodyEnd))
          pos = bodyEnd
        }
      case 11 =>
        for (_ <- 0 until u32()) {
          val flags = u32()
          if (flags == 0) {
            if (u8() != 0x41) throw new WasmParseException("data offset op")
            val off = s32leb()
            if (u8() != 0x0B) throw new WasmParseException("data offset end")
            val n = u32()
            val seg = new Array[Byte](n)
            System.arraycopy(bytes, pos, seg, 0, n); pos += n
            dataSegs = (off, seg) :: dataSegs
          } else if (flags == 1) { // passive segment: skip (unused without bulk ops)
            val n = u32(); pos += n
          } else throw new WasmParseException("data flags unsupported")
        }
      case _ => () // custom / other sections ignored
    }
    pos = end
  }
  funcs = Array.tabulate(codeOffsets.length) { i =>
    val (locals, s, e) = codeOffsets(i)
    decodeBody(i, locals, s, e)
  }

  private def readF32Bits(): Int = {
    val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8) |
      ((bytes(pos + 2) & 0xFF) << 16) | ((bytes(pos + 3) & 0xFF) << 24)
    pos += 4; v
  }
  private def readF64Bits(): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
    pos += 8; v
  }

  def typeOf(fidx: Int): (Array[Int], Array[Int]) = types(funcTypeIdx(fidx))
  def canonOf(typeIdx: Int): Int = canonTypeId(typeIdx)
  def funcCanon(fidx: Int): Int = canonTypeId(funcTypeIdx(fidx))

  /** Exported `__wasm_udf_*` function names, stripped of the prefix — the
    * names `CREATE FUNCTION … AS 'file.wasm!name'` binds (the reference
    * wrapper prepends the prefix the same way, udf.rs:52). */
  def udfExports: Seq[String] =
    exports.keys.toSeq.filter(_.startsWith("__wasm_udf_"))
      .map(_.stripPrefix("__wasm_udf_")).sorted

  def exportedFunc(name: String): Int = exports.get(name) match {
    case Some((0, idx)) => idx
    case _ => throw new WasmParseException(s"no exported function '$name'")
  }

  // ---- body decode: resolve structured control to jumps ----------------

  /** Per-opcode operand-stack delta for the fixed-arity ops; call/call_
    * indirect/br_table/select handled explicitly. */
  private def decodeBody(fidx: Int, localTypes: Array[Int], start: Int, bodyEnd: Int): WasmFunc = {
    val (ps, rs) = typeOf(fidx)
    val ops = scala.collection.mutable.ArrayBuffer.empty[Int]
    val argL = scala.collection.mutable.ArrayBuffer.empty[Long]
    val argM = scala.collection.mutable.ArrayBuffer.empty[Int]
    val brTables = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]

    // open-block bookkeeping
    final case class OpenBlock(isLoop: Boolean, entryHeight: Int, arity: Int,
        startIp: Int, var fixups: List[(Int, Int)]) // (opIdx, brTableSlot or -1)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[OpenBlock]
    blocks += OpenBlock(isLoop = false, 0, rs.length, -1, Nil) // function frame
    var height = 0
    var maxH = 0
    var dead = false
    var deadDepth = 0

    pos = start
    def emit(op: Int, l: Long, m: Int, delta: Int): Unit = {
      ops += op; argL += l; argM += m
      if (!dead) {
        height += delta
        if (height > maxH) maxH = height
        if (height < 0) throw new WasmParseException(s"stack underflow f$fidx")
      }
    }
    /** resolve a br depth to a packed target (block targets fixed up at end) */
    def resolveBr(depth: Int, opIdx: Int, tableSlot: Int): Long = {
      val blk = blocks(blocks.length - 1 - depth)
      if (blk.isLoop) packTarget(blk.startIp, blk.entryHeight, 0)
      else { blk.fixups = (opIdx, tableSlot) :: blk.fixups; 0L }
    }
    def enterDead(): Unit = { if (!dead) { dead = true; deadDepth = blocks.length } }

    while (pos < bodyEnd) {
      val op = u8()
      (op: @annotation.switch) match {
        case 0x00 => emit(op, 0, 0, 0); enterDead()
        case 0x01 => emit(op, 0, 0, 0)
        case 0x02 | 0x03 =>
          val bt = bytes(pos) & 0xFF
          val arity = if (bt == 0x40) { pos += 1; 0 }
            else if (bt == 0x7F || bt == 0x7E || bt == 0x7D || bt == 0x7C) { pos += 1; 1 }
            else throw new WasmParseException("type-index blocktype unsupported")
          blocks += OpenBlock(op == 0x03, if (dead) -1 else height, arity, ops.length, Nil)
          emit(0x01, 0, 0, 0) // block/loop headers execute as nops
        case 0x0B => // end
          val blk = blocks.remove(blocks.length - 1)
          val endIp = ops.length
          val isFuncEnd = blocks.isEmpty
          emit(if (isFuncEnd) 0x0F else 0x01, 0, 0, 0) // func end = return
          // fix up forward brs to this block; jump convention is "land at
          // target, executing target+1 next", so a br to the function frame
          // targets endIp-1 to EXECUTE the return op at endIp
          blk.fixups.foreach { case (idx, slot) =>
            val packed = packTarget(if (isFuncEnd) endIp - 1 else endIp,
              math.max(blk.entryHeight, 0), blk.arity)
            if (slot < 0) argL(idx) = packed else brTables(argM(idx))(slot) = packed
          }
          if (dead && blocks.length < deadDepth) dead = false
          if (!dead && blk.entryHeight >= 0) height = blk.entryHeight + blk.arity
          if (height > maxH) maxH = height
        case 0x0C =>
          val d = u32(); val opIdx = ops.length
          emit(op, 0, 0, 0)
          if (!dead) argL(opIdx) = resolveBr(d, opIdx, -1)
          enterDead()
        case 0x0D =>
          val d = u32(); val opIdx = ops.length
          emit(op, 0, 0, -1)
          if (!dead) argL(opIdx) = resolveBr(d, opIdx, -1)
        case 0x0E =>
          val n = u32()
          val depths = Array.fill(n + 1)(u32())
          val opIdx = ops.length
          val tbl = new Array[Long](n + 1)
          brTables += tbl
          emit(op, 0, brTables.length - 1, -1)
          if (!dead) {
            var s = 0
            while (s <= n) { tbl(s) = resolveBr(depths(s), opIdx, s); s += 1 }
          }
          enterDead()
        case 0x0F => emit(op, 0, 0, 0); enterDead()
        case 0x10 =>
          val callee = u32()
          val (cp, cr) = typeOf(callee)
          emit(op, callee.toLong, 0, cr.length - cp.length)
        case 0x11 =>
          val typeIdx = u32(); u8() // table byte
          val (cp, cr) = types(typeIdx)
          emit(op, cp.length.toLong | (cr.length.toLong << 32), canonTypeId(typeIdx),
            cr.length - cp.length - 1)
        case 0x1A => emit(op, 0, 0, -1)
        case 0x1B => emit(op, 0, 0, -2)
        case 0x20 => emit(op, u32().toLong, 0, 1)
        case 0x21 => emit(op, u32().toLong, 0, -1)
        case 0x22 => emit(op, u32().toLong, 0, 0)
        case 0x23 => emit(op, u32().toLong, 0, 1)
        case 0x24 => emit(op, u32().toLong, 0, -1)
        case _ if op >= 0x28 && op <= 0x35 => // loads
          u32(); val off = u32(); emit(op, 0, off, 0)
        case _ if op >= 0x36 && op <= 0x3E => // stores
          u32(); val off = u32(); emit(op, 0, off, -2)
        case 0x3F => u8(); emit(op, 0, 0, 1)
        case 0x40 => u8(); emit(op, 0, 0, 0)
        case 0x41 => emit(op, s32leb().toLong & 0xFFFFFFFFL, 0, 1)
        case 0x42 => emit(op, s64leb(), 0, 1)
        case 0x43 => emit(op, readF32Bits().toLong & 0xFFFFFFFFL, 0, 1)
        case 0x44 => emit(op, readF64Bits(), 0, 1)
        case _ if op >= 0x45 && op <= 0xC4 =>
          // numeric ops: unary tests (eqz) and conversions keep height,
          // comparisons and binops consume one
          val delta = op match {
            case 0x45 | 0x50 => 0 // eqz
            case c if c >= 0x46 && c <= 0x66 => -1 // comparisons
            case c if (c >= 0x6A && c <= 0x78) || (c >= 0x7C && c <= 0x8A) => -1 // int binops
            case c if (c >= 0x92 && c <= 0x98) || (c >= 0xA0 && c <= 0xA6) => -1 // float binops
            case _ => 0 // clz..popcnt, float unops, conversions, reinterprets, extends
          }
          emit(op, 0, 0, delta)
        case other => throw new WasmParseException(
          f"unsupported opcode 0x$other%02x in func $fidx (offset $pos)")
      }
    }
    if (blocks.nonEmpty) throw new WasmParseException(s"unbalanced blocks in f$fidx")

    new WasmFunc(canonTypeId(funcTypeIdx(fidx)), ps.length, localTypes.length,
      rs.length == 1, ops.toArray, argL.toArray, argM.toArray,
      brTables.toArray, maxH + 1)
  }
}
