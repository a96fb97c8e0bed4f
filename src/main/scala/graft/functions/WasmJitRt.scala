package graft.functions

/** Static runtime helpers for [[WasmJit]]-compiled functions.
  *
  * Each helper mirrors ONE interpreter arm of [[WasmInstance]] exactly
  * (same uniform long value model: i32 zero-extended in the low 32 bits,
  * floats as raw IEEE bits), so a compiled function is semantically
  * equivalent to the interpreted one by construction — the equivalence
  * spec (WasmJitSpec) checks it empirically over the pow edge lattice and
  * the hand-assembled interpreter-spec modules. Helpers are tiny static
  * methods: C2 inlines them into the caller, so a compiled body JITs to
  * straight-line native arithmetic with no dispatch.
  *
  * Memory access bounds-checks against the passed array and throws
  * [[WasmTrap]] exactly like `WasmInstance.checkAddr`. `memory.grow`
  * compiles through the instance ([[grow]]) and replaces the backing
  * array, as can an indirect-call target — so compiled code refreshes
  * its memory local through [[memOf]] after any grow or call, and the
  * array reference it holds is valid between those points.
  */
object WasmJitRt {
  import WasmInstance.{M32, b2l, truncD, u64ToDouble, d2u64}

  /** Live memory array: compiled frames re-read it after any call,
    * because an indirect target may have grown (and thus replaced) it. */
  def memOf(inst: WasmInstance): Array[Byte] = inst.memNow

  /** The compiled call_indirect (r17): table/null/signature checks and
    * re-entry happen on the instance (the target may be interpreted OR
    * compiled — the instance's call path re-dispatches either way). */
  def callIndirect(inst: WasmInstance, canon: Int, elem: Long,
                   args: Array[Long]): Long =
    inst.indirectFromJit(canon, elem, args)

  /** The compiled memory.grow (r17): the instance replaces its array;
    * the compiled caller refreshes its memory local right after. */
  def grow(inst: WasmInstance, delta: Long): Long = inst.growFromJit(delta)

  /** Compiled → interpreted DIRECT call (r18): a caller of an
    * uncompiled function bridges through the instance instead of being
    * demoted — the interpreter runs the callee at the saved jit base. */
  def callDirect(inst: WasmInstance, fidx: Int, args: Array[Long]): Long =
    inst.directFromJit(fidx, args)

  @inline private def d(v: Long): Double = java.lang.Double.longBitsToDouble(v)
  @inline private def dl(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)
  @inline private def f(v: Long): Float = java.lang.Float.intBitsToFloat(v.toInt)
  @inline private def fl(v: Float): Long =
    java.lang.Float.floatToRawIntBits(v).toLong & M32

  @inline private def addr(mem: Array[Byte], base: Long, off: Int, sz: Int): Int = {
    val a = (base & M32) + (off.toLong & M32)
    if (a + sz > mem.length) throw WasmTrap(s"oob memory access @$a+$sz")
    a.toInt
  }

  // ---- memory loads (opcodes 0x28-0x35) --------------------------------
  def ld_28(mem: Array[Byte], base: Long, off: Int): Long = {
    val a = addr(mem, base, off, 4)
    ((mem(a) & 0xFFL)) | ((mem(a + 1) & 0xFFL) << 8) |
      ((mem(a + 2) & 0xFFL) << 16) | ((mem(a + 3) & 0xFFL) << 24)
  }
  def ld_29(mem: Array[Byte], base: Long, off: Int): Long = {
    val a = addr(mem, base, off, 8)
    var v = 0L; var i = 0
    while (i < 8) { v |= (mem(a + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }
  def ld_2A(mem: Array[Byte], base: Long, off: Int): Long = ld_28(mem, base, off)
  def ld_2B(mem: Array[Byte], base: Long, off: Int): Long = ld_29(mem, base, off)
  def ld_2C(mem: Array[Byte], base: Long, off: Int): Long =
    mem(addr(mem, base, off, 1)).toLong & M32
  def ld_2D(mem: Array[Byte], base: Long, off: Int): Long =
    (mem(addr(mem, base, off, 1)) & 0xFF).toLong
  def ld_2E(mem: Array[Byte], base: Long, off: Int): Long = {
    val a = addr(mem, base, off, 2)
    (((mem(a) & 0xFF) | ((mem(a + 1) & 0xFF) << 8)).toShort).toLong & M32
  }
  def ld_2F(mem: Array[Byte], base: Long, off: Int): Long = {
    val a = addr(mem, base, off, 2)
    ((mem(a) & 0xFFL)) | ((mem(a + 1) & 0xFFL) << 8)
  }
  def ld_30(mem: Array[Byte], base: Long, off: Int): Long =
    mem(addr(mem, base, off, 1)).toLong
  def ld_31(mem: Array[Byte], base: Long, off: Int): Long =
    (mem(addr(mem, base, off, 1)) & 0xFF).toLong
  def ld_32(mem: Array[Byte], base: Long, off: Int): Long = {
    val a = addr(mem, base, off, 2)
    (((mem(a) & 0xFF) | ((mem(a + 1) & 0xFF) << 8)).toShort).toLong
  }
  def ld_33(mem: Array[Byte], base: Long, off: Int): Long = ld_2F(mem, base, off)
  def ld_34(mem: Array[Byte], base: Long, off: Int): Long = {
    val a = addr(mem, base, off, 4)
    (((mem(a) & 0xFF) | ((mem(a + 1) & 0xFF) << 8) | ((mem(a + 2) & 0xFF) << 16) |
      ((mem(a + 3) & 0xFF) << 24)).toInt).toLong
  }
  def ld_35(mem: Array[Byte], base: Long, off: Int): Long = ld_28(mem, base, off)

  // ---- memory stores (0x36-0x3E); memory.size (0x3F) -------------------
  def st_36(mem: Array[Byte], base: Long, v: Long, off: Int): Unit = {
    val a = addr(mem, base, off, 4)
    mem(a) = v.toByte; mem(a + 1) = (v >> 8).toByte
    mem(a + 2) = (v >> 16).toByte; mem(a + 3) = (v >> 24).toByte
  }
  def st_37(mem: Array[Byte], base: Long, v: Long, off: Int): Unit = {
    val a = addr(mem, base, off, 8)
    var i = 0
    while (i < 8) { mem(a + i) = (v >> (8 * i)).toByte; i += 1 }
  }
  def st_38(mem: Array[Byte], base: Long, v: Long, off: Int): Unit =
    st_36(mem, base, v, off)
  def st_39(mem: Array[Byte], base: Long, v: Long, off: Int): Unit =
    st_37(mem, base, v, off)
  def st_3A(mem: Array[Byte], base: Long, v: Long, off: Int): Unit =
    mem(addr(mem, base, off, 1)) = v.toByte
  def st_3B(mem: Array[Byte], base: Long, v: Long, off: Int): Unit = {
    val a = addr(mem, base, off, 2)
    mem(a) = v.toByte; mem(a + 1) = (v >> 8).toByte
  }
  def st_3C(mem: Array[Byte], base: Long, v: Long, off: Int): Unit =
    st_3A(mem, base, v, off)
  def st_3D(mem: Array[Byte], base: Long, v: Long, off: Int): Unit =
    st_3B(mem, base, v, off)
  def st_3E(mem: Array[Byte], base: Long, v: Long, off: Int): Unit =
    st_36(mem, base, v, off)
  def memSize(mem: Array[Byte]): Long = (mem.length / WasmInstance.PageSize).toLong

  // ---- unary ops (one long in, one long out) ---------------------------
  def op_45(a: Long): Long = b2l((a & M32) == 0)
  def op_50(a: Long): Long = b2l(a == 0L)
  def op_67(a: Long): Long = Integer.numberOfLeadingZeros(a.toInt).toLong
  def op_68(a: Long): Long = Integer.numberOfTrailingZeros(a.toInt).toLong
  def op_69(a: Long): Long = Integer.bitCount(a.toInt).toLong
  def op_79(a: Long): Long = java.lang.Long.numberOfLeadingZeros(a).toLong
  def op_7A(a: Long): Long = java.lang.Long.numberOfTrailingZeros(a).toLong
  def op_7B(a: Long): Long = java.lang.Long.bitCount(a).toLong
  def op_8B(a: Long): Long = fl(math.abs(f(a)))
  def op_8C(a: Long): Long = fl(-f(a))
  def op_8D(a: Long): Long = fl(math.ceil(f(a).toDouble).toFloat)
  def op_8E(a: Long): Long = fl(math.floor(f(a).toDouble).toFloat)
  def op_8F(a: Long): Long = fl(truncD(f(a).toDouble).toFloat)
  def op_90(a: Long): Long = fl(math.rint(f(a).toDouble).toFloat)
  def op_91(a: Long): Long = fl(math.sqrt(f(a).toDouble).toFloat)
  def op_99(a: Long): Long = dl(math.abs(d(a)))
  def op_9A(a: Long): Long = dl(-d(a))
  def op_9B(a: Long): Long = dl(math.ceil(d(a)))
  def op_9C(a: Long): Long = dl(math.floor(d(a)))
  def op_9D(a: Long): Long = dl(truncD(d(a)))
  def op_9E(a: Long): Long = dl(math.rint(d(a)))
  def op_9F(a: Long): Long = dl(math.sqrt(d(a)))
  def op_A7(a: Long): Long = a & M32
  def op_A8(a: Long): Long = {
    val v = f(a).toDouble
    if (v.isNaN || v >= 2147483648.0 || v <= -2147483649.0) throw WasmTrap("invalid f32->i32")
    v.toInt.toLong & M32
  }
  def op_A9(a: Long): Long = {
    val v = f(a).toDouble
    if (v.isNaN || v >= 4294967296.0 || v <= -1.0) throw WasmTrap("invalid f32->u32")
    v.toLong & M32
  }
  def op_AA(a: Long): Long = {
    val v = d(a)
    if (v.isNaN || v >= 2147483648.0 || v <= -2147483649.0) throw WasmTrap("invalid f64->i32")
    v.toInt.toLong & M32
  }
  def op_AB(a: Long): Long = {
    val v = d(a)
    if (v.isNaN || v >= 4294967296.0 || v <= -1.0) throw WasmTrap("invalid f64->u32")
    v.toLong & M32
  }
  def op_AC(a: Long): Long = a.toInt.toLong
  def op_AD(a: Long): Long = a & M32
  def op_AE(a: Long): Long = {
    val v = f(a).toDouble
    if (v.isNaN || v >= 9.223372036854776e18 || v < -9.223372036854776e18) throw WasmTrap("invalid f32->i64")
    v.toLong
  }
  def op_AF(a: Long): Long = {
    val v = f(a).toDouble
    if (v.isNaN || v >= 1.8446744073709552e19 || v <= -1.0) throw WasmTrap("invalid f32->u64")
    d2u64(v)
  }
  def op_B0(a: Long): Long = {
    val v = d(a)
    if (v.isNaN || v >= 9.223372036854776e18 || v < -9.223372036854776e18) throw WasmTrap("invalid f64->i64")
    v.toLong
  }
  def op_B1(a: Long): Long = {
    val v = d(a)
    if (v.isNaN || v >= 1.8446744073709552e19 || v <= -1.0) throw WasmTrap("invalid f64->u64")
    d2u64(v)
  }
  def op_B2(a: Long): Long = fl(a.toInt.toFloat)
  def op_B3(a: Long): Long = fl((a & M32).toFloat)
  def op_B4(a: Long): Long = fl(a.toFloat)
  def op_B5(a: Long): Long = fl(u64ToDouble(a).toFloat)
  def op_B6(a: Long): Long = fl(d(a).toFloat)
  def op_B7(a: Long): Long = dl(a.toInt.toDouble)
  def op_B8(a: Long): Long = dl((a & M32).toDouble)
  def op_B9(a: Long): Long = dl(a.toDouble)
  def op_BA(a: Long): Long = dl(u64ToDouble(a))
  def op_BB(a: Long): Long = dl(f(a).toDouble)
  def op_BC(a: Long): Long = a // reinterprets: raw-bit identities
  def op_BD(a: Long): Long = a
  def op_BE(a: Long): Long = a
  def op_BF(a: Long): Long = a
  // ---- 0xFC saturating truncations (r18) — the interpreter arms verbatim:
  // Java narrowing is the spec'd signed behavior, satU32/satU64 shared ----
  def op_200(a: Long): Long = f(a).toDouble.toInt.toLong & M32
  def op_201(a: Long): Long = WasmInstance.satU32(f(a).toDouble)
  def op_202(a: Long): Long = d(a).toInt.toLong & M32
  def op_203(a: Long): Long = WasmInstance.satU32(d(a))
  def op_204(a: Long): Long = f(a).toDouble.toLong
  def op_205(a: Long): Long = WasmInstance.satU64(f(a).toDouble)
  def op_206(a: Long): Long = d(a).toLong
  def op_207(a: Long): Long = WasmInstance.satU64(d(a))

  // ---- 0xFC bulk memory (r18): memmove-semantics copy (arraycopy on a
  // single array behaves as-if buffered), fill; same trap strings as the
  // interpreter arms ----
  def memCopy(mem: Array[Byte], dstL: Long, srcL: Long, nL: Long): Unit = {
    val dst = dstL & M32; val src = srcL & M32; val n = nL & M32
    if (dst + n > mem.length || src + n > mem.length)
      throw WasmTrap(s"oob memory.copy @$dst/$src+$n")
    System.arraycopy(mem, src.toInt, mem, dst.toInt, n.toInt)
  }
  def memFill(mem: Array[Byte], dstL: Long, vL: Long, nL: Long): Unit = {
    val dst = dstL & M32; val n = nL & M32
    if (dst + n > mem.length) throw WasmTrap(s"oob memory.fill @$dst+$n")
    java.util.Arrays.fill(mem, dst.toInt, (dst + n).toInt, vL.toByte)
  }

  def op_C0(a: Long): Long = a.toByte.toLong & M32
  def op_C1(a: Long): Long = a.toShort.toLong & M32
  def op_C2(a: Long): Long = a.toByte.toLong
  def op_C3(a: Long): Long = a.toShort.toLong
  def op_C4(a: Long): Long = a.toInt.toLong

  // ---- binary ops (two longs in, one long out) -------------------------
  def op_46(a: Long, b: Long): Long = b2l((a & M32) == (b & M32))
  def op_47(a: Long, b: Long): Long = b2l((a & M32) != (b & M32))
  def op_48(a: Long, b: Long): Long = b2l(a.toInt < b.toInt)
  def op_49(a: Long, b: Long): Long = b2l((a & M32) < (b & M32))
  def op_4A(a: Long, b: Long): Long = b2l(a.toInt > b.toInt)
  def op_4B(a: Long, b: Long): Long = b2l((a & M32) > (b & M32))
  def op_4C(a: Long, b: Long): Long = b2l(a.toInt <= b.toInt)
  def op_4D(a: Long, b: Long): Long = b2l((a & M32) <= (b & M32))
  def op_4E(a: Long, b: Long): Long = b2l(a.toInt >= b.toInt)
  def op_4F(a: Long, b: Long): Long = b2l((a & M32) >= (b & M32))
  def op_51(a: Long, b: Long): Long = b2l(a == b)
  def op_52(a: Long, b: Long): Long = b2l(a != b)
  def op_53(a: Long, b: Long): Long = b2l(a < b)
  def op_54(a: Long, b: Long): Long = b2l(java.lang.Long.compareUnsigned(a, b) < 0)
  def op_55(a: Long, b: Long): Long = b2l(a > b)
  def op_56(a: Long, b: Long): Long = b2l(java.lang.Long.compareUnsigned(a, b) > 0)
  def op_57(a: Long, b: Long): Long = b2l(a <= b)
  def op_58(a: Long, b: Long): Long = b2l(java.lang.Long.compareUnsigned(a, b) <= 0)
  def op_59(a: Long, b: Long): Long = b2l(a >= b)
  def op_5A(a: Long, b: Long): Long = b2l(java.lang.Long.compareUnsigned(a, b) >= 0)
  def op_5B(a: Long, b: Long): Long = b2l(f(a) == f(b))
  def op_5C(a: Long, b: Long): Long = b2l(f(a) != f(b))
  def op_5D(a: Long, b: Long): Long = b2l(f(a) < f(b))
  def op_5E(a: Long, b: Long): Long = b2l(f(a) > f(b))
  def op_5F(a: Long, b: Long): Long = b2l(f(a) <= f(b))
  def op_60(a: Long, b: Long): Long = b2l(f(a) >= f(b))
  def op_61(a: Long, b: Long): Long = b2l(d(a) == d(b))
  def op_62(a: Long, b: Long): Long = b2l(d(a) != d(b))
  def op_63(a: Long, b: Long): Long = b2l(d(a) < d(b))
  def op_64(a: Long, b: Long): Long = b2l(d(a) > d(b))
  def op_65(a: Long, b: Long): Long = b2l(d(a) <= d(b))
  def op_66(a: Long, b: Long): Long = b2l(d(a) >= d(b))
  def op_6A(a: Long, b: Long): Long = (a + b) & M32
  def op_6B(a: Long, b: Long): Long = (a - b) & M32
  def op_6C(a: Long, b: Long): Long = (a.toInt * b.toInt).toLong & M32
  def op_6D(a: Long, b: Long): Long = {
    val x = a.toInt; val y = b.toInt
    if (y == 0) throw WasmTrap("integer divide by zero")
    if (x == Int.MinValue && y == -1) throw WasmTrap("integer overflow")
    (x / y).toLong & M32
  }
  def op_6E(a: Long, b: Long): Long = {
    if (b.toInt == 0) throw WasmTrap("integer divide by zero")
    Integer.divideUnsigned(a.toInt, b.toInt).toLong & M32
  }
  def op_6F(a: Long, b: Long): Long = {
    if (b.toInt == 0) throw WasmTrap("integer divide by zero")
    (a.toInt % b.toInt).toLong & M32
  }
  def op_70(a: Long, b: Long): Long = {
    if (b.toInt == 0) throw WasmTrap("integer divide by zero")
    Integer.remainderUnsigned(a.toInt, b.toInt).toLong & M32
  }
  def op_71(a: Long, b: Long): Long = (a & b) & M32
  def op_72(a: Long, b: Long): Long = (a | b) & M32
  def op_73(a: Long, b: Long): Long = (a ^ b) & M32
  def op_74(a: Long, b: Long): Long = (a.toInt << b.toInt).toLong & M32
  def op_75(a: Long, b: Long): Long = (a.toInt >> b.toInt).toLong & M32
  def op_76(a: Long, b: Long): Long = (a.toInt >>> b.toInt).toLong & M32
  def op_77(a: Long, b: Long): Long = Integer.rotateLeft(a.toInt, b.toInt).toLong & M32
  def op_78(a: Long, b: Long): Long = Integer.rotateRight(a.toInt, b.toInt).toLong & M32
  def op_7C(a: Long, b: Long): Long = a + b
  def op_7D(a: Long, b: Long): Long = a - b
  def op_7E(a: Long, b: Long): Long = a * b
  def op_7F(a: Long, b: Long): Long = {
    if (b == 0) throw WasmTrap("integer divide by zero")
    if (a == Long.MinValue && b == -1L) throw WasmTrap("integer overflow")
    a / b
  }
  def op_80(a: Long, b: Long): Long = {
    if (b == 0) throw WasmTrap("integer divide by zero")
    java.lang.Long.divideUnsigned(a, b)
  }
  def op_81(a: Long, b: Long): Long = {
    if (b == 0) throw WasmTrap("integer divide by zero")
    a % b
  }
  def op_82(a: Long, b: Long): Long = {
    if (b == 0) throw WasmTrap("integer divide by zero")
    java.lang.Long.remainderUnsigned(a, b)
  }
  def op_83(a: Long, b: Long): Long = a & b
  def op_84(a: Long, b: Long): Long = a | b
  def op_85(a: Long, b: Long): Long = a ^ b
  def op_86(a: Long, b: Long): Long = a << b
  def op_87(a: Long, b: Long): Long = a >> b
  def op_88(a: Long, b: Long): Long = a >>> b
  def op_89(a: Long, b: Long): Long = java.lang.Long.rotateLeft(a, b.toInt)
  def op_8A(a: Long, b: Long): Long = java.lang.Long.rotateRight(a, b.toInt)
  def op_92(a: Long, b: Long): Long = fl(f(a) + f(b))
  def op_93(a: Long, b: Long): Long = fl(f(a) - f(b))
  def op_94(a: Long, b: Long): Long = fl(f(a) * f(b))
  def op_95(a: Long, b: Long): Long = fl(f(a) / f(b))
  def op_96(a: Long, b: Long): Long = fl(math.min(f(a), f(b)))
  def op_97(a: Long, b: Long): Long = fl(math.max(f(a), f(b)))
  def op_98(a: Long, b: Long): Long = fl(math.copySign(f(a), f(b)))
  def op_A0(a: Long, b: Long): Long = dl(d(a) + d(b))
  def op_A1(a: Long, b: Long): Long = dl(d(a) - d(b))
  def op_A2(a: Long, b: Long): Long = dl(d(a) * d(b))
  def op_A3(a: Long, b: Long): Long = dl(d(a) / d(b))
  def op_A4(a: Long, b: Long): Long = dl(math.min(d(a), d(b)))
  def op_A5(a: Long, b: Long): Long = dl(math.max(d(a), d(b)))
  def op_A6(a: Long, b: Long): Long = dl(math.copySign(d(a), d(b)))

  // ---- traps from compiled control flow --------------------------------
  def trapUnreachable(): Long = throw WasmTrap("unreachable executed (compiled)")
  def trapBudget(): Long = throw WasmTrap("instruction budget exhausted")

  // ---- recursion-depth guard (cycle-reaching compiled functions only) --
  // Compiled calls are raw JVM invokestatics, so recursion needs its own
  // analog of the interpreter's depth-4096 trap. Only functions on (or
  // reaching) a call cycle carry the guard — every loop around a cycle
  // passes ≥1 guarded entry, so runaway recursion traps deterministically
  // with the interpreter's message; acyclic hot leaves pay nothing. The
  // counter is reset at each host entry (WasmInstance.invoke/callForTest),
  // healing any residue a trap's unwind leaves behind.
  private val recDepth = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](1))
  def recEnter(): Unit = {
    val d = recDepth.get()
    d(0) += 1
    if (d(0) > 4096) { d(0) = 0; throw WasmTrap("call depth exceeded") }
  }
  def recLeave(): Unit = recDepth.get()(0) -= 1
  def recReset(): Unit = recDepth.get()(0) = 0
}
