package graft.functions

/** Wasm → JVM-bytecode compiler for ELIGIBLE leaf functions — the "2×
  * path" named in round 16's interpreter work: the measured cost of the
  * interpreter is dispatch, not allocation, so the fix is to remove
  * dispatch entirely for the hot guest kernels (the reference artifact's
  * `pow` and its scalbn helper) by translating their already-decoded,
  * branch-resolved bodies ([[WasmModule.WasmFunc]]) into JVM bytecode
  * that HotSpot then compiles to native code.
  *
  * Design:
  *  - every wasm value stays a raw-bits `long` (the interpreter's model);
  *    each STATIC operand-stack slot maps to a fixed JVM `long` local, so
  *    the emitted body is straight-line register code — no operand-stack
  *    simulation, no dispatch loop;
  *  - numeric ops call tiny [[WasmJitRt]] statics that mirror the
  *    interpreter arms EXACTLY (C2 inlines them), so compiled ≡
  *    interpreted by construction — and [[WasmJitSpec]] checks it
  *    empirically (pow edge lattice, hand-assembled modules, traps);
  *  - resolved branches become `goto_w` (+ carried-value register moves);
  *    backward edges decrement a per-call budget local so a runaway
  *    compiled loop traps like the interpreter's fuel guard;
  *  - class files are emitted by hand (no bytecode library resolves
  *    offline) at version 49.0, where the classic verifier applies and no
  *    StackMapTable is required.
  *
  * Eligibility (fixpoint): a function qualifies when its ops avoid
  * `memory.grow`, every direct call targets another eligible function,
  * and the frame fits byte-addressable JVM local slots. GLOBALS
  * compile (r17): the instance's shared globals
  * array is threaded through every compiled frame (`[J` parameter
  * next to the memory), and `global.get`/`global.set` become a raw
  * `laload`/`lastore` — so the wasm-bindgen shadow-stack-pointer
  * idiom (global 0 bumped on entry, restored on exit), which
  * disqualified most of the reference artifact's mid-tier functions,
  * now compiles, and mutations stay visible across mixed
  * compiled/interpreted execution because both sides share the ONE
  * array. CALL_INDIRECT compiles (r17) as a bridge: the table lookup,
  * null check, and canonical-signature check run on the instance
  * (`WasmJitRt.callIndirect` → `WasmInstance.indirectFromJit`), and
  * the target re-enters through the instance's call path at the saved
  * jit base — so an interpreted target gets a correctly-placed frame,
  * a compiled target re-dispatches to its fast path, and indirect
  * recursion passes the interpreter's depth-4096 guard on every hop.
  * Because a bridge target MAY grow (replace) the linear memory, a
  * compiled frame refreshes its memory local after any call into the
  * `mayGrow` set (reaches a call_indirect); grow-free kernels keep a
  * loop-invariant array reference. Ineligible functions (direct
  * `memory.grow`, over-bound frames, their transitive callers) keep
  * running in the interpreter;
  * the hook in `WasmInstance.call` is per-function, so mixed execution
  * composes at ordinary call boundaries. Disable with
  * `-Dgraft.wasm.jit=off`.
  */
object WasmJit {

  /** Per-call backward-branch budget (the compiled analog of fuel). */
  val BranchBudget: Int = 1 << 28

  def enabled: Boolean =
    !"off".equalsIgnoreCase(System.getProperty("graft.wasm.jit", "on"))

  // ---------------------------------------------------------------------
  // constant pool builder
  // ---------------------------------------------------------------------
  private final class Cp {
    private val buf = new java.io.ByteArrayOutputStream()
    private val out = new java.io.DataOutputStream(buf)
    private var next = 1
    private val utf8s = collection.mutable.Map[String, Int]()
    private val classes = collection.mutable.Map[String, Int]()
    private val longs = collection.mutable.Map[Long, Int]()
    private val ints = collection.mutable.Map[Int, Int]()
    private val nats = collection.mutable.Map[(String, String), Int]()
    private val mrefs = collection.mutable.Map[(String, String, String), Int]()

    def utf8(s: String): Int = utf8s.getOrElseUpdate(s, {
      out.writeByte(1); out.writeUTF(s); val i = next; next += 1; i
    })
    def cls(internal: String): Int = classes.getOrElseUpdate(internal, {
      val n = utf8(internal)
      out.writeByte(7); out.writeShort(n); val i = next; next += 1; i
    })
    def long(v: Long): Int = longs.getOrElseUpdate(v, {
      out.writeByte(5); out.writeLong(v); val i = next; next += 2; i
    })
    def int(v: Int): Int = ints.getOrElseUpdate(v, {
      out.writeByte(3); out.writeInt(v); val i = next; next += 1; i
    })
    private def nat(name: String, desc: String): Int =
      nats.getOrElseUpdate((name, desc), {
        val n = utf8(name); val d = utf8(desc)
        out.writeByte(12); out.writeShort(n); out.writeShort(d)
        val i = next; next += 1; i
      })
    def methodref(owner: String, name: String, desc: String): Int =
      mrefs.getOrElseUpdate((owner, name, desc), {
        val c = cls(owner); val n = nat(name, desc)
        out.writeByte(10); out.writeShort(c); out.writeShort(n)
        val i = next; next += 1; i
      })
    def count: Int = next
    def bytes: Array[Byte] = buf.toByteArray
  }

  // ---------------------------------------------------------------------
  // code buffer with branch fixups
  // ---------------------------------------------------------------------
  private final class Code {
    private var arr = new Array[Byte](4096)
    var len = 0
    def ensure(n: Int): Unit =
      if (len + n > arr.length) arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, len + n))
    def u1(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
    def u2(v: Int): Unit = { u1(v >> 8); u1(v) }
    def u4(v: Int): Unit = { u2(v >> 16); u2(v & 0xFFFF) }
    def patchU4(pos: Int, v: Int): Unit = {
      arr(pos) = (v >> 24).toByte; arr(pos + 1) = (v >> 16).toByte
      arr(pos + 2) = (v >> 8).toByte; arr(pos + 3) = v.toByte
    }
    def patchU2(pos: Int, v: Int): Unit = {
      arr(pos) = (v >> 8).toByte; arr(pos + 1) = v.toByte
    }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  // ---------------------------------------------------------------------
  // eligibility — no opcode is forbidden anymore (r17: globals,
  // call_indirect, and memory.grow all compile); only frame bounds and
  // an emitter bail-out (unknown opcode → demote) disqualify directly
  // ---------------------------------------------------------------------

  /** Per-function frame bounds + arity. Returns (eligible, guarded).
    * r18: there is NO call fixpoint anymore — a caller of an ineligible
    * function compiles anyway and BRIDGES the call through the instance
    * ([[WasmJitRt.callDirect]]), so an over-bound frame or a late emit
    * bail-out no longer demotes its transitive callers (r17's 60-function
    * residue). `guarded` marks the eligible functions NOT provably
    * acyclic over COMPILED-ONLY direct calls — those compile WITH a
    * recursion-depth guard ([[WasmJitRt.recEnter]]/`recLeave`, trap at
    * the interpreter's 4096); a cycle that passes through a BRIDGED
    * (interpreted) callee needs no compiled guard, because every pass
    * through the bridge increments the interpreter's own depth. */
  private[functions] def eligibleSet(m: WasmModule): (Array[Boolean], Array[Boolean]) = {
    val n = m.funcs.length
    val ok = Array.tabulate(n) { i =>
      val f = m.funcs(i)
      val slots = 3 + 2 * (f.nparams + f.nlocals + f.maxStack) + 2
      // arity cap 32 (r19, was 8): a direct call pushes 3 + 2*nparams
      // JVM stack slots, covered by the declared max-stack below; the
      // JVM's own bound is 127 long params (255 arg slots)
      // SIMD (v128) functions are interpreter-only (r19): the emitter
      // has no cases for the 0x300-family ops and a 2-slot result does
      // not fit the single-long call convention
      f.nparams <= 32 && slots < 250 && f.ops.length < 12000 && !f.usesSimd
    }
    (ok, guardedSet(m, ok))
  }

  /** Callee-first acyclicity peeling over the compiled-only call graph:
    * a function is proven once every direct callee is proven or BRIDGED
    * (not in `ok` — the interpreter's depth guard covers cycles through
    * it); a self-call can never prove itself, mutual compiled cycles
    * never peel. Whatever stays unproven gets the depth guard. */
  private def guardedSet(m: WasmModule, ok: Array[Boolean]): Array[Boolean] = {
    val n = m.funcs.length
    val acyc = new Array[Boolean](n)
    var progressed = true
    while (progressed) {
      progressed = false
      var i = 0
      while (i < n) {
        if (ok(i) && !acyc(i)) {
          val f = m.funcs(i)
          var allDone = true
          var j = 0
          while (j < f.ops.length && allDone) {
            if (f.ops(j) == 0x10) {
              val callee = f.argL(j).toInt
              if (ok(callee) && !acyc(callee)) allDone = false
            }
            j += 1
          }
          if (allDone) { acyc(i) = true; progressed = true }
        }
        i += 1
      }
    }
    Array.tabulate(n)(i => ok(i) && !acyc(i))
  }

  // ---------------------------------------------------------------------
  // per-function compilation
  // ---------------------------------------------------------------------
  private val RtOwner = "graft/functions/WasmJitRt"
  private val InstDesc = "Lgraft/functions/WasmInstance;"

  /** Static pre-instruction operand heights (−1 = unreachable). */
  private def heights(m: WasmModule, f: WasmModule.WasmFunc): Array[Int] = {
    val n = f.ops.length
    val h = Array.fill(n + 1)(-1)
    h(0) = 0
    // branch targets seed the height after the landing point
    def seed(packed: Long): Unit = {
      val t = (packed & 0xFFFFFFFFL).toInt
      val th = ((packed >> 32) & 0x3FFFFFFF).toInt
      val ar = ((packed >>> 62) & 3).toInt
      if (t + 1 <= n) h(t + 1) = th + ar
    }
    var i = 0
    while (i < n) {
      f.ops(i) match {
        case 0x0C | 0x0D => seed(f.argL(i))
        case 0x0E => f.brTables(f.argM(i)).foreach(seed)
        case _ => ()
      }
      i += 1
    }
    i = 0
    while (i < n) {
      if (h(i) >= 0) {
        val cur = h(i)
        val next = f.ops(i) match {
          case 0x00 | 0x0C | 0x0E | 0x0F => -2 // unconditional exit
          case 0x01 | 0x22 | 0x102 => cur + (if (f.ops(i) == 0x102) 1 else 0)
          case 0x20 | 0x41 | 0x42 | 0x43 | 0x44 | 0x3F | 0x23 => cur + 1
          case 0x100 | 0x101 => cur + 2
          case 0x21 | 0x0D | 0x1A | 0x24 => cur - 1
          case 0x1B => cur - 2
          case op if op >= 0x28 && op <= 0x35 => cur // load: 1 in, 1 out
          case op if op >= 0x36 && op <= 0x3E => cur - 2
          case 0x10 =>
            val cf = m.funcs(f.argL(i).toInt)
            cur - cf.nparams + (if (cf.hasResult) 1 else 0)
          case 0x11 => // pops elem idx + nparams, pushes nresults
            val np = (f.argL(i) & 0xFFFFFFFFL).toInt
            val nr = (f.argL(i) >>> 32).toInt
            cur - 1 - np + nr
          case 0x45 | 0x50 => cur
          case op if op >= 0x46 && op <= 0x66 => cur - 1
          case op if (op >= 0x6A && op <= 0x78) || (op >= 0x7C && op <= 0x8A) => cur - 1
          case op if (op >= 0x92 && op <= 0x98) || (op >= 0xA0 && op <= 0xA6) => cur - 1
          case 0x20A | 0x20B => cur - 3 // memory.copy / memory.fill (r18)
          case _ => cur // unops / conversions / sat-trunc (0x200-0x207)
        }
        if (next >= 0 && h(i + 1) < 0) h(i + 1) = next
      }
      i += 1
    }
    h
  }

  /** Which functions can REPLACE the memory array under a compiled
    * frame: anything whose call graph reaches a direct `memory.grow`
    * (0x40 — compiles through the instance with a refresh) or a
    * `call_indirect` (0x11 — the bridge target may grow). Compiled
    * code refreshes its memory local only after calls into this set —
    * the grow-free hot kernels keep a loop-invariant array reference
    * C2 can reason about. */
  private def mayGrowSet(m: WasmModule): Array[Boolean] = {
    val n = m.funcs.length
    val grow = Array.tabulate(n)(i =>
      m.funcs(i).ops.contains(0x11) || m.funcs(i).ops.contains(0x40))
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < n) {
        if (!grow(i)) {
          val f = m.funcs(i)
          var j = 0
          while (j < f.ops.length && !grow(i)) {
            if (f.ops(j) == 0x10 && grow(f.argL(j).toInt)) {
              grow(i) = true; changed = true
            }
            j += 1
          }
        }
        i += 1
      }
    }
    grow
  }

  private final class FnEmitter(cp: Cp, m: WasmModule, owner: String,
                                fidx: Int, mask: Array[Boolean],
                                guarded: Boolean, mayGrow: Array[Boolean],
                                // CHUNK mode (r19): emit ops [chunkStart,
                                // chunkEnd) as a resumable segment method
                                // over a long[] frame — see emitChunked
                                chunkStart: Int = -1, chunkEnd: Int = -1,
                                chunkEntries: Array[Int] = null) {
    private val f = m.funcs(fidx)
    private val h = heights(m, f)
    private val chunked = chunkStart >= 0
    // slot 0 = mem ([B), slot 1 = globals ([J), slot 2 = the instance
    // (the call_indirect bridge + memory refresh), longs from slot 3;
    // chunk methods add slot 3 = the long[] frame, slot 4 = the entry
    // op index, longs from slot 5
    private val frameBase = if (chunked) 5 else 3
    private val stackBase = frameBase + 2 * (f.nparams + f.nlocals)
    private val budgetSlot = stackBase + 2 * f.maxStack
    val maxLocals: Int = budgetSlot + 1
    private val totalSlots = f.nparams + f.nlocals + f.maxStack
    private val code = new Code
    private val jvmOff = new Array[Int](f.ops.length + 1)
    /** (patch position, absolute position of branch opcode, target op) */
    private val fixups = collection.mutable.ArrayBuffer[(Int, Int, Int)]()

    private def localSlot(i: Int) = frameBase + 2 * i
    private def slot(height: Int) = stackBase + 2 * height

    private def lload(s: Int): Unit =
      if (s <= 3) code.u1(0x1E + s) else { code.u1(0x16); code.u1(s) }
    private def lstore(s: Int): Unit =
      if (s <= 3) code.u1(0x3F + s) else { code.u1(0x37); code.u1(s) }
    private def ldc2(v: Long): Unit = { code.u1(0x14); code.u2(cp.long(v)) }
    private def pushInt(v: Int): Unit =
      if (v >= -1 && v <= 5) code.u1(0x03 + v)
      else if (v >= Byte.MinValue && v <= Byte.MaxValue) { code.u1(0x10); code.u1(v) }
      else if (v >= Short.MinValue && v <= Short.MaxValue) { code.u1(0x11); code.u2(v) }
      else { code.u1(0x13); code.u2(cp.int(v)) }
    private def invokestatic(name: String, desc: String, ownerCls: String = RtOwner): Unit = {
      code.u1(0xB8); code.u2(cp.methodref(ownerCls, name, desc))
    }
    /** Reload the memory local after any call: an indirect target may
      * have grown (replaced) the instance's array. One field read —
      * C2-inlined, invisible next to the call itself. */
    private def refreshMem(): Unit = {
      code.u1(0x2C) // inst
      invokestatic("memOf", "(" + InstDesc + ")[B")
      code.u1(0x4B) // astore_0
    }
    private def gotoW(targetOp: Int): Unit = {
      if (chunked && (targetOp < chunkStart || targetOp >= chunkEnd)) {
        // cross-chunk branch: spill the frame and return the op index
        // to continue at — the driver re-enters the owning chunk there
        spillFrame()
        pushInt(targetOp)
        code.u1(0xAC) // ireturn
        return
      }
      val at = code.len
      code.u1(0xC8)
      fixups += ((code.len, at, targetOp))
      code.u4(0)
    }

    /** chunk mode: copy every frame slot back to the long[] (local 3). */
    private def spillFrame(): Unit = {
      var s = 0
      while (s < totalSlots) {
        code.u1(0x2D) // aload_3 (fr)
        pushInt(s)
        lload(frameBase + 2 * s)
        code.u1(0x50) // lastore
        s += 1
      }
    }

    /** chunk mode: load every frame slot from the long[] (local 3). */
    private def reloadFrame(): Unit = {
      var s = 0
      while (s < totalSlots) {
        code.u1(0x2D) // aload_3 (fr)
        pushInt(s)
        code.u1(0x2F) // laload
        lstore(frameBase + 2 * s)
        s += 1
      }
    }

    /** budget check on a backward edge: iinc, iload, ifgt skip, trap */
    private def budgetCheck(): Unit = {
      code.u1(0x84); code.u1(budgetSlot); code.u1(0xFF) // iinc slot, -1
      code.u1(0x15); code.u1(budgetSlot)                // iload
      code.u1(0x9D); code.u2(3 + 3 + 1)                 // ifgt past trap+pop2
      invokestatic("trapBudget", "()J")
      code.u1(0x58)                                     // pop2
    }

    /** carried-value move + jump for a packed branch target. */
    private def jump(packed: Long, carrySrcHeight: Int, curOp: Int): Unit = {
      val t = (packed & 0xFFFFFFFFL).toInt
      val th = ((packed >> 32) & 0x3FFFFFFF).toInt
      val ar = ((packed >>> 62) & 3).toInt
      if (t + 1 <= curOp) {
        if (chunked) // emitChunked only accepts forward-only functions
          throw new IllegalStateException("backward branch in chunk mode")
        budgetCheck()
      }
      if (ar == 1 && carrySrcHeight != th) {
        lload(slot(carrySrcHeight)); lstore(slot(th))
      }
      gotoW(t + 1)
    }

    def emit(): Array[Byte] = {
      if (chunked) return emitChunkBody()
      // zero non-param wasm locals (spec semantics) AND every stack slot
      // (the classic verifier types a register pair at merge points as
      // the MEET over all paths — an entry path that never wrote a
      // loop-carried slot would poison it, so all pairs start as long 0)
      var z = f.nparams
      while (z < f.nparams + f.nlocals) {
        code.u1(0x09); lstore(localSlot(z)); z += 1 // lconst_0
      }
      z = 0
      while (z < f.maxStack) { code.u1(0x09); lstore(slot(z)); z += 1 }
      // budget init
      pushInt(BranchBudget)
      code.u1(0x36); code.u1(budgetSlot) // istore
      // recursion-depth guard for functions on (or reaching) call cycles:
      // one counter bump at entry, trap at the interpreter's 4096 — the
      // provably-acyclic hot leaves skip this entirely
      if (guarded) invokestatic("recEnter", "()V")
      var i = 0
      while (i < f.ops.length) {
        jvmOff(i) = code.len
        val hh = h(i)
        if (hh >= 0) emitOp(i, hh)
        i += 1
      }
      jvmOff(f.ops.length) = code.len
      // terminal safety net (bodies end with the decoded return op)
      if (guarded) invokestatic("recLeave", "()V")
      code.u1(0x09); code.u1(0xAD) // lconst_0; lreturn
      // the JVM caps a method's Code at 65535 bytes — a wasm body under
      // the op-count bound can still emit past it (wide slots, call
      // marshalling); bail out and let compile() demote this function
      // (and, via the post-pass fixpoint, its compiled callers)
      if (code.len > 65000)
        throw new IllegalStateException(s"emitted code ${code.len} > 65000")
      fixups.foreach { case (patchPos, opPos, targetOp) =>
        code.patchU4(patchPos, jvmOff(targetOp) - opPos)
      }
      code.bytes
    }

    /** One chunk of a SPLIT function (r19): ops [chunkStart, chunkEnd)
      * over a long[] frame. Signature ([B [J inst [J I)I — the trailing
      * int is the entry op index, the return is the next op index to
      * continue at (−1 = wasm return, result in fr[0]). The prologue
      * reloads every frame slot (which also satisfies the classic
      * verifier's merge typing), then dispatches on the entry index. */
    private def emitChunkBody(): Array[Byte] = {
      reloadFrame()
      // entry dispatch: lookupswitch over the chunk's entry points
      code.u1(0x15); code.u1(4) // iload 4 (entry)
      val entries = chunkEntries.sorted
      val opPos = code.len
      code.u1(0xAB) // lookupswitch
      while (code.len % 4 != 0) code.u1(0)
      val defPatch = code.len; code.u4(0)
      code.u4(entries.length)
      val pairPatch = code.len
      entries.foreach { e => code.u4(e); code.u4(0) }
      // stubs: one goto_w per entry (fixed up via jvmOff)
      val stubAt = new Array[Int](entries.length)
      var s = 0
      while (s < entries.length) {
        stubAt(s) = code.len
        gotoW(entries(s))
        s += 1
      }
      // default: an unknown entry is a driver bug — trap loudly
      val defAt = code.len
      invokestatic("trapUnreachable", "()J")
      code.u1(0x58); pushInt(-1); code.u1(0xAC)
      code.patchU4(defPatch, defAt - opPos)
      entries.indices.foreach { k =>
        code.patchU4(pairPatch + 8 * k + 4, stubAt(k) - opPos)
      }
      var i = chunkStart
      while (i < chunkEnd) {
        jvmOff(i) = code.len
        val hh = h(i)
        if (hh >= 0) emitOp(i, hh)
        i += 1
      }
      // fallthrough off the chunk end: hand the next op to the driver
      spillFrame()
      pushInt(chunkEnd)
      code.u1(0xAC)
      if (code.len > 65000)
        throw new IllegalStateException(s"chunk code ${code.len} > 65000")
      fixups.foreach { case (patchPos, atPos, targetOp) =>
        code.patchU4(patchPos, jvmOff(targetOp) - atPos)
      }
      code.bytes
    }

    private def emitOp(i: Int, hh: Int): Unit = f.ops(i) match {
      case 0x01 => ()
      case 0x20 => lload(localSlot(f.argL(i).toInt)); lstore(slot(hh))
      case 0x21 => lload(slot(hh - 1)); lstore(localSlot(f.argL(i).toInt))
      case 0x22 => lload(slot(hh - 1)); lstore(localSlot(f.argL(i).toInt))
      case 0x41 | 0x42 | 0x43 | 0x44 => ldc2(f.argL(i)); lstore(slot(hh))
      case 0x100 =>
        lload(localSlot((f.argL(i) & 0xFFFFFFFFL).toInt)); lstore(slot(hh))
        lload(localSlot((f.argL(i) >>> 32).toInt)); lstore(slot(hh + 1))
      case 0x101 =>
        lload(localSlot(f.argM(i))); lstore(slot(hh))
        ldc2(f.argL(i)); lstore(slot(hh + 1))
      case 0x102 =>
        lload(slot(hh - 1)); lstore(localSlot(f.argM(i)))
        lload(localSlot(f.argL(i).toInt)); lstore(slot(hh))
      case 0x1A => ()
      case 0x1B => // select: keep (h-3) when cond != 0 else move (h-2)
        lload(slot(hh - 1)); code.u1(0x09); code.u1(0x94) // lconst_0; lcmp
        val moveLen = {
          val s1 = slot(hh - 2); val s2 = slot(hh - 3)
          (if (s1 <= 3) 1 else 2) + (if (s2 <= 3) 1 else 2)
        }
        code.u1(0x9A); code.u2(3 + moveLen) // ifne past the move
        lload(slot(hh - 2)); lstore(slot(hh - 3))
      case op if op >= 0x28 && op <= 0x35 =>
        code.u1(0x2A) // aload_0 (mem)
        lload(slot(hh - 1)); pushInt(f.argM(i))
        invokestatic(f"ld_${op}%02X", "([BJI)J"); lstore(slot(hh - 1))
      case op if op >= 0x36 && op <= 0x3E =>
        code.u1(0x2A)
        lload(slot(hh - 2)); lload(slot(hh - 1)); pushInt(f.argM(i))
        invokestatic(f"st_${op}%02X", "([BJJI)V")
      case 0x3F => code.u1(0x2A); invokestatic("memSize", "([B)J"); lstore(slot(hh))
      case 0x40 => // memory.grow: the instance replaces its array; refresh
        code.u1(0x2C) // inst
        lload(slot(hh - 1))
        invokestatic("grow", "(" + InstDesc + "J)J")
        lstore(slot(hh - 1))
        refreshMem()
      case 0x23 => // global.get: raw laload from the shared globals array
        code.u1(0x2B) // aload_1 (globals)
        pushInt(f.argL(i).toInt)
        code.u1(0x2F) // laload
        lstore(slot(hh))
      case 0x24 => // global.set: raw lastore into the shared globals array
        code.u1(0x2B) // aload_1 (globals)
        pushInt(f.argL(i).toInt)
        lload(slot(hh - 1))
        code.u1(0x50) // lastore
      case 0x0C => jump(f.argL(i), hh - 1, i)
      case 0x0D =>
        lload(slot(hh - 1)); code.u1(0x09); code.u1(0x94) // cond; lconst_0; lcmp
        val ifPos = code.len
        code.u1(0x99); code.u2(0) // ifeq placeholder: skip the branch block
        jump(f.argL(i), hh - 2, i)
        // patch ifeq (relative to its own opcode); in-place patches never
        // shift code, so fixups recorded inside the block stay valid
        code.patchU2(ifPos + 1, code.len - ifPos)
      case 0x0E =>
        lload(slot(hh - 1)); code.u1(0x88) // l2i
        val tbl = f.brTables(f.argM(i))
        val ncases = tbl.length - 1
        val opPos = code.len
        code.u1(0xAA) // tableswitch
        while (code.len % 4 != 0) code.u1(0)
        val defPatch = code.len; code.u4(0)
        code.u4(0); code.u4(math.max(ncases - 1, 0)) // low, high
        val casePatch = code.len
        var c = 0
        while (c < math.max(ncases, 1)) { code.u4(0); c += 1 }
        // stubs: one per table entry (cases 0..n-1 then default = entry n)
        val stubAt = new Array[Int](tbl.length)
        var e = 0
        while (e < tbl.length) {
          stubAt(e) = code.len
          jump(tbl(e), hh - 2, i)
          e += 1
        }
        code.patchU4(defPatch, stubAt(tbl.length - 1) - opPos)
        c = 0
        while (c < math.max(ncases, 1)) {
          val target = if (ncases == 0) tbl.length - 1 else c
          code.patchU4(casePatch + 4 * c, stubAt(target) - opPos)
          c += 1
        }
      case 0x0F =>
        if (chunked) {
          // chunk return: result (if any) to fr[0], signal -1 to the
          // driver (recLeave is the DRIVER's job — once per call)
          if (f.hasResult) {
            code.u1(0x2D) // aload_3 (fr)
            pushInt(0)
            lload(slot(hh - 1))
            code.u1(0x50) // lastore
          }
          pushInt(-1)
          code.u1(0xAC) // ireturn
        } else {
          if (f.hasResult) lload(slot(hh - 1)) else code.u1(0x09)
          if (guarded) invokestatic("recLeave", "()V")
          code.u1(0xAD)
        }
      case 0x00 => invokestatic("trapUnreachable", "()J"); code.u1(0x58)
      case 0x10 =>
        val callee = f.argL(i).toInt
        val cf = m.funcs(callee)
        if (mask(callee)) {
          code.u1(0x2A) // mem
          code.u1(0x2B) // globals
          code.u1(0x2C) // inst
          var k = 0
          while (k < cf.nparams) { lload(slot(hh - cf.nparams + k)); k += 1 }
          invokestatic(s"f$callee",
            "([B[J" + InstDesc + "J" * cf.nparams + ")J", owner)
          if (cf.hasResult) lstore(slot(hh - cf.nparams)) else code.u1(0x58)
        } else {
          // r18 bridge: the callee interprets (over-bound frame or emit
          // bail-out) — args array through the instance's re-entry, the
          // same shape as the call_indirect bridge; the caller stays
          // compiled instead of demoting transitively
          code.u1(0x2C) // inst
          pushInt(callee)
          pushInt(cf.nparams)
          code.u1(0xBC); code.u1(11) // newarray long
          var k = 0
          while (k < cf.nparams) {
            code.u1(0x59) // dup (array ref)
            pushInt(k)
            lload(slot(hh - cf.nparams + k))
            code.u1(0x50) // lastore
            k += 1
          }
          invokestatic("callDirect", "(" + InstDesc + "I[J)J")
          if (cf.hasResult) lstore(slot(hh - cf.nparams)) else code.u1(0x58)
        }
        if (mayGrow(callee)) refreshMem()
      case 0x11 =>
        // compiled call_indirect: table/null/signature checks and the
        // re-entry run on the instance (WasmJitRt.callIndirect) — the
        // target may be interpreted or compiled, either way correct
        val np = (f.argL(i) & 0xFFFFFFFFL).toInt
        val nr = (f.argL(i) >>> 32).toInt
        code.u1(0x2C) // inst
        pushInt(f.argM(i)) // canonical type id
        lload(slot(hh - 1)) // element index
        pushInt(np)
        code.u1(0xBC); code.u1(11) // newarray long
        var k = 0
        while (k < np) {
          code.u1(0x59) // dup (array ref)
          pushInt(k)
          lload(slot(hh - 1 - np + k))
          code.u1(0x50) // lastore
          k += 1
        }
        invokestatic("callIndirect", "(" + InstDesc + "IJ[J)J")
        if (nr == 1) lstore(slot(hh - 1 - np)) else code.u1(0x58)
        refreshMem()
      case 0x45 | 0x50 | 0x67 | 0x68 | 0x69 | 0x79 | 0x7A | 0x7B =>
        unary(f.ops(i), hh)
      case op if op >= 0x8B && op <= 0x91 => unary(op, hh)
      case op if op >= 0x99 && op <= 0x9F => unary(op, hh)
      case op if op >= 0xA7 && op <= 0xC4 => unary(op, hh)
      case op if op >= 0x46 && op <= 0x66 => binary(op, hh)
      case op if (op >= 0x6A && op <= 0x78) || (op >= 0x7C && op <= 0x8A) =>
        binary(op, hh)
      case op if (op >= 0x92 && op <= 0x98) || (op >= 0xA0 && op <= 0xA6) =>
        binary(op, hh)
      case op if op >= 0x200 && op <= 0x207 => unary(op, hh) // sat-trunc (r18)
      case 0x20A => // memory.copy: pops dst/src/n; never grows — no refresh
        code.u1(0x2A) // mem
        lload(slot(hh - 3)); lload(slot(hh - 2)); lload(slot(hh - 1))
        invokestatic("memCopy", "([BJJJ)V")
      case 0x20B => // memory.fill: pops dst/value/n
        code.u1(0x2A)
        lload(slot(hh - 3)); lload(slot(hh - 2)); lload(slot(hh - 1))
        invokestatic("memFill", "([BJJJ)V")
      case other =>
        throw new IllegalStateException(f"unjittable opcode 0x$other%02x")
    }

    private def unary(op: Int, hh: Int): Unit = {
      lload(slot(hh - 1)); invokestatic(f"op_${op}%02X", "(J)J")
      lstore(slot(hh - 1))
    }
    private def binary(op: Int, hh: Int): Unit = {
      lload(slot(hh - 2)); lload(slot(hh - 1))
      invokestatic(f"op_${op}%02X", "(JJ)J")
      lstore(slot(hh - 2))
    }
  }

  // ---------------------------------------------------------------------
  // method splitting (r19): a function whose straight-line emission busts
  // the JVM's 65 KB Code cap compiles as K resumable CHUNK methods over a
  // long[] frame plus a driver loop, PROVIDED its control flow is
  // forward-only (no loops — the reference artifact's one bailout is a
  // giant branch-web formatter with zero backward edges). Chunk
  // boundaries are nudged to the least-crossed positions; cross-chunk
  // branches spill the frame and return the continuation op index.
  // ---------------------------------------------------------------------

  /** Emit the split form of function `fidx`: chunk methods
    * `f{fidx}_c{k}` + a driver named `f{fidx}` with the STANDARD
    * signature (so callers and the dispatcher are unchanged). Returns
    * null when the function has backward branches (not splittable). */
  private def emitChunked(cp: Cp, m: WasmModule, name: String, fidx: Int,
      mask: Array[Boolean], guarded: Boolean, mayGrow: Array[Boolean])
      : List[(Int, Int, Int, Array[Byte], Int, Int)] = {
    val f = m.funcs(fidx)
    val n = f.ops.length
    val edges = collection.mutable.ArrayBuffer[(Int, Int)]() // (src, dst op)
    var i = 0
    while (i < n) {
      f.ops(i) match {
        case 0x0C | 0x0D =>
          val d = (f.argL(i) & 0xFFFFFFFFL).toInt + 1
          if (d <= i) return null // backward: not splittable
          edges += ((i, d))
        case 0x0E =>
          var s = 0
          val tbl = f.brTables(f.argM(i))
          while (s < tbl.length) {
            val d = (tbl(s) & 0xFFFFFFFFL).toInt + 1
            if (d <= i) return null
            edges += ((i, d))
            s += 1
          }
        case _ => ()
      }
      i += 1
    }
    // ~2600 ops/chunk keeps each emitted body well under the cap;
    // boundaries settle on the least-crossed position within ±400
    val nChunks = math.max(2, (n + 2599) / 2600)
    if (n < 2 * nChunks) return null
    val bounds = new Array[Int](nChunks + 1)
    bounds(nChunks) = n
    var k = 1
    while (k < nChunks) {
      val nominal = (n.toLong * k / nChunks).toInt
      var best = nominal; var bestC = Int.MaxValue
      var p = math.max(bounds(k - 1) + 1, nominal - 400)
      val hi = math.min(n - 1, nominal + 400)
      while (p <= hi) {
        var c = 0
        edges.foreach { case (s, d) => if (s < p && d > p) c += 1 }
        if (c < bestC) { bestC = c; best = p }
        p += 1
      }
      bounds(k) = best
      k += 1
    }
    val out = collection.mutable.ListBuffer[(Int, Int, Int, Array[Byte], Int, Int)]()
    k = 0
    while (k < nChunks) {
      val cs = bounds(k); val ce = bounds(k + 1)
      val entries = (cs +: edges.collect {
        case (s, d) if (s < cs || s >= ce) && d >= cs && d < ce => d
      }.toSeq).distinct.toArray
      val em = new FnEmitter(cp, m, name, fidx, mask, guarded, mayGrow,
        chunkStart = cs, chunkEnd = ce, chunkEntries = entries)
      out += ((0x0008 | 0x0002, cp.utf8(s"f${fidx}_c$k"),
        cp.utf8("([B[J" + InstDesc + "[JI)I"), em.emit(), 72, em.maxLocals))
      k += 1
    }
    // ---- driver: fr = new long[slots]; loop chunks until ip < 0 ----
    val drv = new Code
    def pushI(v: Int): Unit =
      if (v >= -1 && v <= 5) drv.u1(0x03 + v)
      else if (v >= Byte.MinValue && v <= Byte.MaxValue) { drv.u1(0x10); drv.u1(v) }
      else if (v >= Short.MinValue && v <= Short.MaxValue) { drv.u1(0x11); drv.u2(v) }
      else { drv.u1(0x13); drv.u2(cp.int(v)) }
    val totalSlots = f.nparams + f.nlocals + f.maxStack
    val frL = 3 + 2 * f.nparams
    val ipL = frL + 1
    pushI(totalSlots)
    drv.u1(0xBC); drv.u1(11) // newarray long (zero-filled: wasm locals)
    drv.u1(0x3A); drv.u1(frL) // astore fr
    var a = 0
    while (a < f.nparams) {
      drv.u1(0x19); drv.u1(frL) // aload fr
      pushI(a)
      drv.u1(0x16); drv.u1(3 + 2 * a) // lload arg
      drv.u1(0x50) // lastore
      a += 1
    }
    if (guarded) { drv.u1(0xB8); drv.u2(cp.methodref(RtOwner, "recEnter", "()V")) }
    pushI(0)
    drv.u1(0x36); drv.u1(ipL) // istore ip
    val loopStart = drv.len
    val donePatches = collection.mutable.ArrayBuffer[Int]()
    drv.u1(0x15); drv.u1(ipL) // iload ip
    drv.u1(0x9B); donePatches += drv.len; drv.u2(0) // iflt done
    drv.u1(0x15); drv.u1(ipL)
    pushI(n)
    drv.u1(0xA2); donePatches += drv.len; drv.u2(0) // if_icmpge done
    // a chunk's call may have grown (replaced) the memory — refresh
    drv.u1(0x2C) // aload_2 (inst)
    drv.u1(0xB8); drv.u2(cp.methodref(RtOwner, "memOf", "(" + InstDesc + ")[B"))
    drv.u1(0x4B) // astore_0
    // chunk dispatch by ip range, then loop
    val callPatches = collection.mutable.ArrayBuffer[(Int, Int)]() // (patchPos, chunk)
    k = 0
    while (k < nChunks - 1) {
      drv.u1(0x15); drv.u1(ipL)
      pushI(bounds(k + 1))
      drv.u1(0xA1); callPatches += ((drv.len, k)); drv.u2(0) // if_icmplt call_k
      k += 1
    }
    val callAt = new Array[Int](nChunks)
    val loopPatches = collection.mutable.ArrayBuffer[Int]()
    k = nChunks - 1
    while (k >= 0) { // last chunk first (the dispatch falls through to it)
      callAt(k) = drv.len
      drv.u1(0x2A); drv.u1(0x2B); drv.u1(0x2C) // mem, globals, inst
      drv.u1(0x19); drv.u1(frL)
      drv.u1(0x15); drv.u1(ipL)
      drv.u1(0xB8); drv.u2(cp.methodref(name, s"f${fidx}_c$k",
        "([B[J" + InstDesc + "[JI)I"))
      drv.u1(0x36); drv.u1(ipL)
      drv.u1(0xA7); loopPatches += drv.len; drv.u2(0) // goto loopStart
      k -= 1
    }
    callPatches.foreach { case (pos, ck) =>
      drv.patchU2(pos, callAt(ck) - (pos - 1))
    }
    loopPatches.foreach(pos => drv.patchU2(pos, loopStart - (pos - 1)))
    val doneAt = drv.len
    donePatches.foreach(pos => drv.patchU2(pos, doneAt - (pos - 1)))
    if (guarded) { drv.u1(0xB8); drv.u2(cp.methodref(RtOwner, "recLeave", "()V")) }
    if (f.hasResult) {
      drv.u1(0x19); drv.u1(frL)
      pushI(0)
      drv.u1(0x2F) // laload
    } else drv.u1(0x09) // lconst_0
    drv.u1(0xAD) // lreturn
    out += ((0x0008 | 0x0002, cp.utf8(s"f$fidx"),
      cp.utf8("([B[J" + InstDesc + "J" * f.nparams + ")J"),
      drv.bytes, 72, ipL + 1))
    out.toList
  }

  // ---------------------------------------------------------------------
  // class assembly
  // ---------------------------------------------------------------------
  private val counter = new java.util.concurrent.atomic.AtomicInteger()

  /** Compile the module's eligible functions; null when disabled or none. */
  def compile(m: WasmModule): (CompiledModule, Array[Boolean]) = {
    if (!enabled) return null
    val (mask, _) = eligibleSet(m)
    if (!mask.exists(identity)) return null
    val mayGrow = mayGrowSet(m)
    val name = s"graft/functions/WasmLeaf$$${counter.incrementAndGet()}"
    // Emit with restart-on-bailout: a function whose emitted Code busts
    // the JVM's 65535-byte method cap demotes ONLY ITSELF — the whole
    // class is rebuilt so its already-emitted callers re-emit with the
    // interpreter bridge for it (r18; previously a late bail-out demoted
    // every transitive caller). Converges fast: the mask only shrinks,
    // and in practice every bail-out is found in the first pass.
    var cp: Cp = null
    val methods = collection.mutable.ArrayBuffer[(Int, Int, Int, Array[Byte], Int, Int)]()
    // (accessFlags, nameIdx, descIdx, code, maxStack, maxLocals)
    var stable = false
    while (!stable) {
      stable = true
      cp = new Cp
      methods.clear()
      val guarded = guardedSet(m, mask)
      var fi = 0
      while (fi < mask.length) {
        if (mask(fi)) {
          try {
            val em = new FnEmitter(cp, m, name, fi, mask, guarded(fi), mayGrow)
            val codeB = em.emit()
            val f = m.funcs(fi)
            methods += ((0x0008 | 0x0002, cp.utf8(s"f$fi"),
              cp.utf8("([B[J" + InstDesc + "J" * f.nparams + ")J"),
              // declared max stack covers the deepest transient use: a
              // direct call to a 32-arity callee (3 + 2*32) + margin
              codeB, 72, em.maxLocals))
          } catch {
            case _: IllegalStateException =>
              // emit bail-out (65 KB Code cap): try the r19 METHOD SPLIT
              // — chunk methods + a driver keeping the standard f$fi
              // name, so the function stays in the mask and its callers
              // are untouched; functions with backward branches demote
              val split =
                try emitChunked(cp, m, name, fi, mask, guarded(fi), mayGrow)
                catch { case _: IllegalStateException => null }
              if (split != null) methods ++= split
              else { mask(fi) = false; stable = false }
          }
        }
        fi += 1
      }
      if (!mask.exists(identity)) return null
    }
    // dispatcher:
    // call(int fidx, byte[] mem, long[] globals, WasmInstance inst, long[] args)
    val disp = new Code
    val eligible = mask.zipWithIndex.filter(_._1).map(_._2)
    if (eligible.isEmpty) return null
    disp.u1(0x1B) // iload_1 (fidx)
    val opPos = disp.len
    disp.u1(0xAB) // lookupswitch
    while (disp.len % 4 != 0) disp.u1(0)
    val defPatch = disp.len; disp.u4(0)
    disp.u4(eligible.length)
    val pairPatch = disp.len
    eligible.foreach { fidx => disp.u4(fidx); disp.u4(0) }
    val stubAt = collection.mutable.Map[Int, Int]()
    eligible.foreach { fidx =>
      stubAt(fidx) = disp.len
      val f = m.funcs(fidx)
      disp.u1(0x2C) // aload_2 (mem)
      disp.u1(0x2D) // aload_3 (globals)
      disp.u1(0x19); disp.u1(4) // aload 4 (inst)
      var k = 0
      while (k < f.nparams) {
        disp.u1(0x19); disp.u1(5) // aload 5 (args)
        if (k <= 5) disp.u1(0x03 + k) else { disp.u1(0x10); disp.u1(k) }
        disp.u1(0x2F) // laload
        k += 1
      }
      disp.u1(0xB8); disp.u2(cp.methodref(name, s"f$fidx",
        "([B[J" + InstDesc + "J" * f.nparams + ")J"))
      disp.u1(0xAD) // lreturn
    }
    val defStub = disp.len
    disp.u1(0xB8); disp.u2(cp.methodref(RtOwner, "trapUnreachable", "()J"))
    disp.u1(0xAD)
    disp.patchU4(defPatch, defStub - opPos)
    eligible.zipWithIndex.foreach { case (fidx, idx) =>
      disp.patchU4(pairPatch + 8 * idx + 4, stubAt(fidx) - opPos)
    }
    methods += ((0x0001, cp.utf8("call"),
      cp.utf8("(I[B[J" + InstDesc + "[J)J"), disp.bytes, 72, 6))
    // constructor
    val init = new Code
    init.u1(0x2A); init.u1(0xB7)
    init.u2(cp.methodref("java/lang/Object", "<init>", "()V"))
    init.u1(0xB1)
    methods += ((0x0001, cp.utf8("<init>"), cp.utf8("()V"), init.bytes, 1, 1))

    val thisCls = cp.cls(name)
    val superCls = cp.cls("java/lang/Object")
    val ifaceCls = cp.cls("graft/functions/CompiledModule")
    val codeAttr = cp.utf8("Code")

    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(0xCAFEBABE)
    d.writeShort(0) // minor
    d.writeShort(49) // major: classic verifier, no StackMapTable
    d.writeShort(cp.count)
    d.write(cp.bytes)
    d.writeShort(0x0021) // public super
    d.writeShort(thisCls); d.writeShort(superCls)
    d.writeShort(1); d.writeShort(ifaceCls)
    d.writeShort(0) // fields
    d.writeShort(methods.length)
    methods.foreach { case (acc, nIdx, dIdx, codeB, maxStack, maxLocals) =>
      d.writeShort(acc); d.writeShort(nIdx); d.writeShort(dIdx)
      d.writeShort(1) // one attribute: Code
      d.writeShort(codeAttr)
      d.writeInt(12 + codeB.length)
      d.writeShort(maxStack); d.writeShort(maxLocals)
      d.writeInt(codeB.length); d.write(codeB)
      d.writeShort(0) // exception table
      d.writeShort(0) // code attributes
    }
    d.writeShort(0) // class attributes
    // HIDDEN class (JEP 371), not defineClass: a hidden class is
    // unloadable once the CompiledModule instance is unreachable, so
    // cycling artifacts (CREATE → DROP → CREATE …) cannot leak classes —
    // the same lifecycle posture as the decode-cache eviction on last
    // DROP. Self-references (fn→fn invokestatic) resolve to the hidden
    // class itself per the JEP.
    // a LinkageError here (VerifyError et al.) means the emitter produced
    // a class the JVM rejects — a compiler bug, not a guest bug. Demote
    // the whole module to the interpreter (bit-identical semantics by
    // construction) instead of crashing CREATE FUNCTION (r19, from the
    // dead-if poison incident: the failure mode should be perf-only)
    try {
      val cls = java.lang.invoke.MethodHandles.lookup()
        .defineHiddenClass(out.toByteArray, false).lookupClass()
      val inst = cls.getDeclaredConstructor().newInstance()
        .asInstanceOf[CompiledModule]
      (inst, mask)
    } catch {
      case _: LinkageError => null
    }
  }
}

/** Interface the generated per-module class implements. */
trait CompiledModule {
  def call(fidx: Int, mem: Array[Byte], globals: Array[Long],
           inst: WasmInstance, args: Array[Long]): Long
}
