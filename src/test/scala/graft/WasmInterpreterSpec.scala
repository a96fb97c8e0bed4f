package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{WasmInstance, WasmModule, WasmTrap}

/** The wasm32 interpreter proven as an INTERPRETER, not a one-artifact
  * hack: tiny modules are hand-assembled here from the public binary
  * grammar (no toolchain in the container) and executed, pinning the
  * core-spec semantics the reference artifact exercises only
  * implicitly — trap conditions (div-by-zero, signed-overflow, OOB,
  * null/ill-typed indirect calls, unreachable), value-carrying blocks,
  * br_table dispatch, loops, memory.grow, two's-complement corners,
  * float rounding (nearest = banker's), unsigned compares/divides, and
  * the fuel guard that turns a runaway guest loop into a trap.
  */
class WasmInterpreterSpec extends AnyFunSuite {

  // ---- minimal assembler (LEB128 + section framing) ----------------------

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
  private def vec(items: Seq[Seq[Byte]]): Seq[Byte] =
    uleb(items.length.toLong) ++ items.flatten

  /** One-type, N-function module. Each function: (params, results,
    * locals, body bytes incl. end). All functions share one signature
    * per entry; exports every function as f0, f1, ... */
  private def module(
      types: Seq[(Seq[Int], Seq[Int])],
      funcs: Seq[(Int, Seq[Int], Seq[Byte])], // (typeIdx, localTypes, body)
      table: Option[Seq[Int]] = None,
      memPages: Int = 0): WasmModule = {
    val typeSec = section(1, vec(types.map { case (ps, rs) =>
      0x60.toByte +: (vec(ps.map(p => Seq(p.toByte))) ++
        vec(rs.map(r => Seq(r.toByte))))
    }))
    val funcSec = section(3, vec(funcs.map(f => uleb(f._1.toLong))))
    val tableSec = table.map(t => section(4,
      vec(Seq(Seq(0x70.toByte, 0x00.toByte) ++ uleb(t.length.toLong)))))
      .getOrElse(Nil)
    val memSec = if (memPages > 0)
      section(5, vec(Seq(0x00.toByte +: uleb(memPages.toLong)))) else Nil
    val exportSec = section(7, vec(funcs.indices.map { i =>
      val name = s"f$i".getBytes("UTF-8").toSeq
      uleb(name.length.toLong) ++ name ++ Seq(0x00.toByte) ++ uleb(i.toLong)
    }))
    val elemSec = table.map(t => section(9, vec(Seq(
      uleb(0) ++ Seq(0x41.toByte) ++ sleb(0) ++ Seq(0x0b.toByte) ++
        vec(t.map(fi => uleb(fi.toLong))))))).getOrElse(Nil)
    val codeSec = section(10, vec(funcs.map { case (_, locals, body) =>
      val localDecl = vec(locals.map(t => uleb(1) ++ Seq(t.toByte)))
      val fb = localDecl ++ body
      uleb(fb.length.toLong) ++ fb
    }))
    val bytes = Seq[Byte](0, 'a', 's', 'm', 1, 0, 0, 0) ++
      typeSec ++ funcSec ++ tableSec ++ memSec ++ exportSec ++ elemSec ++ codeSec
    WasmModule.parse(bytes.toArray)
  }

  private val I32 = 0x7F
  private val I64 = 0x7E
  private val F64 = 0x7C
  private def b(xs: Int*): Seq[Byte] = xs.map(_.toByte)

  private def run1(ps: Seq[Int], rs: Seq[Int], body: Seq[Byte],
      locals: Seq[Int] = Nil, memPages: Int = 0)(args: Long*): Option[Long] = {
    val m = module(Seq((ps, rs)), Seq((0, locals, body)), memPages = memPages)
    new WasmInstance(m).invoke("f0", args: _*)
  }

  test("arithmetic/two's-complement corners: signed/unsigned div & rem, " +
    "shifts, rotates, clz/ctz/popcnt, sign extension") {
    // (a, b) -> a / b signed
    val divS = b(0x20, 0, 0x20, 1, 0x6D, 0x0B)
    assert(run1(Seq(I32, I32), Seq(I32), divS)(7, -2L & 0xFFFFFFFFL)
      === Some((-3L) & 0xFFFFFFFFL)) // trunc toward zero
    // unsigned div: 0xFFFFFFFE / 2 = 0x7FFFFFFF
    val divU = b(0x20, 0, 0x20, 1, 0x6E, 0x0B)
    assert(run1(Seq(I32, I32), Seq(I32), divU)(0xFFFFFFFEL, 2) === Some(0x7FFFFFFFL))
    // rem_s: -7 % 2 = -1 (sign of dividend); MinValue % -1 = 0 (no trap)
    val remS = b(0x20, 0, 0x20, 1, 0x6F, 0x0B)
    assert(run1(Seq(I32, I32), Seq(I32), remS)((-7L) & 0xFFFFFFFFL, 2)
      === Some((-1L) & 0xFFFFFFFFL))
    assert(run1(Seq(I32, I32), Seq(I32), remS)(0x80000000L, (-1L) & 0xFFFFFFFFL)
      === Some(0L))
    // shl wraps shift count mod 32: 1 << 33 == 2
    val shl = b(0x20, 0, 0x20, 1, 0x74, 0x0B)
    assert(run1(Seq(I32, I32), Seq(I32), shl)(1, 33) === Some(2L))
    // shr_s keeps sign: -8 >> 1 = -4
    val shrS = b(0x20, 0, 0x20, 1, 0x75, 0x0B)
    assert(run1(Seq(I32, I32), Seq(I32), shrS)((-8L) & 0xFFFFFFFFL, 1)
      === Some((-4L) & 0xFFFFFFFFL))
    // rotl(0x80000001, 1) = 3
    val rotl = b(0x20, 0, 0x20, 1, 0x77, 0x0B)
    assert(run1(Seq(I32, I32), Seq(I32), rotl)(0x80000001L, 1) === Some(3L))
    // clz/ctz/popcnt of 0x00F0F000
    assert(run1(Seq(I32), Seq(I32), b(0x20, 0, 0x67, 0x0B))(0x00F0F000L) === Some(8L))
    assert(run1(Seq(I32), Seq(I32), b(0x20, 0, 0x68, 0x0B))(0x00F0F000L) === Some(12L))
    assert(run1(Seq(I32), Seq(I32), b(0x20, 0, 0x69, 0x0B))(0x00F0F000L) === Some(8L))
    // i32.extend8_s(0x80) = -128
    assert(run1(Seq(I32), Seq(I32), b(0x20, 0, 0xC0, 0x0B))(0x80L)
      === Some((-128L) & 0xFFFFFFFFL))
    // i64 unsigned compare: 0xFFFF... > 1 unsigned (lt_u false)
    val ltU64 = b(0x20, 0, 0x20, 1, 0x54, 0x0B)
    assert(run1(Seq(I64, I64), Seq(I32), ltU64)(-1L, 1L) === Some(0L))
    assert(run1(Seq(I64, I64), Seq(I32), ltU64)(1L, -1L) === Some(1L))
  }

  test("float semantics: nearest is banker's rounding, trunc toward zero, " +
    "copysign, u64->f64") {
    def f64bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    def asD(r: Option[Long]) = java.lang.Double.longBitsToDouble(r.get)
    // f64.nearest(2.5) = 2.0, nearest(3.5) = 4.0, nearest(-2.5) = -2.0
    val nearest = b(0x20, 0, 0x9E, 0x0B)
    assert(asD(run1(Seq(F64), Seq(F64), nearest)(f64bits(2.5))) === 2.0)
    assert(asD(run1(Seq(F64), Seq(F64), nearest)(f64bits(3.5))) === 4.0)
    assert(asD(run1(Seq(F64), Seq(F64), nearest)(f64bits(-2.5))) === -2.0)
    // f64.trunc(-3.7) = -3.0
    assert(asD(run1(Seq(F64), Seq(F64), b(0x20, 0, 0x9D, 0x0B))(f64bits(-3.7))) === -3.0)
    // copysign(3.0, -0.0) = -3.0
    val cps = b(0x20, 0, 0x20, 1, 0xA6, 0x0B)
    assert(asD(run1(Seq(F64, F64), Seq(F64), cps)(f64bits(3.0), f64bits(-0.0))) === -3.0)
    // f64.convert_i64_u(-1) = 2^64 as double
    assert(asD(run1(Seq(I64), Seq(F64), b(0x20, 0, 0xBA, 0x0B))(-1L))
      === 1.8446744073709552E19)
  }

  test("traps: div-by-zero, signed overflow, OOB access, unreachable, " +
    "trunc of NaN") {
    val divS = b(0x20, 0, 0x20, 1, 0x6D, 0x0B)
    val t1 = intercept[WasmTrap] { run1(Seq(I32, I32), Seq(I32), divS)(1, 0) }
    assert(t1.msg.contains("divide by zero"))
    val t2 = intercept[WasmTrap] {
      run1(Seq(I32, I32), Seq(I32), divS)(0x80000000L, (-1L) & 0xFFFFFFFFL)
    }
    assert(t2.msg.contains("overflow"))
    // i32.load at 65533 of a 1-page memory: 4 bytes cross the boundary
    val load = b(0x20, 0, 0x28, 0x02, 0x00, 0x0B)
    assert(run1(Seq(I32), Seq(I32), load, memPages = 1)(65532L) === Some(0L))
    val t3 = intercept[WasmTrap] {
      run1(Seq(I32), Seq(I32), load, memPages = 1)(65533L)
    }
    assert(t3.msg.contains("oob"))
    val t4 = intercept[WasmTrap] { run1(Seq(), Seq(), b(0x00, 0x0B))() }
    assert(t4.msg.contains("unreachable"))
    // i32.trunc_f64_s(NaN) traps
    val trunc = b(0x20, 0, 0xAA, 0x0B)
    intercept[WasmTrap] {
      run1(Seq(F64), Seq(I32), trunc)(
        java.lang.Double.doubleToRawLongBits(Double.NaN))
    }
  }

  test("memory.grow/size and store/load across the grown region") {
    // grow by param pages, store 0xAB at 70000, load16_u back + size
    val body = b(
      0x20, 0, 0x40, 0x00, 0x1A, // memory.grow(param), drop old size
      0x41) ++ sleb(70000) ++ b(0x41) ++ sleb(0xAB) ++ b(0x36, 0x02, 0x00) ++ // i32.store
      b(0x41) ++ sleb(70000) ++ b(0x28, 0x02, 0x00, // i32.load
      0x3F, 0x00, 0x6A, 0x0B) // + memory.size
    assert(run1(Seq(I32), Seq(I32), body, memPages = 1)(1L) === Some(0xABL + 2L))
    // without the grow, the same store traps
    val noGrow = b(0x41) ++ sleb(70000) ++ b(0x41) ++ sleb(0xAB) ++
      b(0x36, 0x02, 0x00, 0x41, 0x00, 0x0B)
    intercept[WasmTrap] { run1(Seq(), Seq(I32), noGrow, memPages = 1)() }
  }

  test("control flow: loop sum, value-carrying block br, br_table dispatch") {
    // sum 1..n with a loop: locals = (i, acc)
    val sum = b(
      0x02, 0x40, // block
      0x03, 0x40, // loop
      0x20, 1, 0x20, 0, 0x4F, 0x0D, 1, // if i >= n break
      0x20, 1, 0x41, 1, 0x6A, 0x21, 1, // i += 1
      0x20, 2, 0x20, 1, 0x6A, 0x21, 2, // acc += i
      0x0C, 0, // continue
      0x0B, 0x0B, // end loop, end block
      0x20, 2, 0x0B) // return acc
    assert(run1(Seq(I32), Seq(I32), sum, locals = Seq(I32, I32))(10L) === Some(55L))
    // value-carrying block: block (result i32) with a br that carries 42
    // past dead code (the two bt!=void blocks in the artifact use this)
    val carrying = b(
      0x02, 0x7F, // block (result i32)
      0x41) ++ sleb(42) ++ b(
      0x0C, 0, // br 0 carrying 42
      0x41) ++ sleb(7) ++ b( // dead
      0x0B,
      0x41) ++ sleb(1) ++ b(0x6A, 0x0B) // +1 after the block
    assert(run1(Seq(), Seq(I32), carrying)() === Some(43L))
    // br_table: 0 -> 10, 1 -> 20, default -> 30
    val table = b(
      0x02, 0x40, 0x02, 0x40, 0x02, 0x40,
      0x20, 0, 0x0E, 2, 0, 1, 2, // br_table [0 1] default 2
      0x0B, // end inner
      0x41) ++ sleb(10) ++ b(0x0F, 0x0B, // -> 10
      0x41) ++ sleb(20) ++ b(0x0F, 0x0B, // -> 20
      0x41) ++ sleb(30) ++ b(0x0F, 0x0B)
    // body layout: innermost block returns via the first arm
    val m = module(Seq((Seq(I32), Seq(I32)))
      , Seq((0, Nil, table)))
    val inst = new WasmInstance(m)
    assert(inst.invoke("f0", 0L) === Some(10L))
    assert(new WasmInstance(m).invoke("f0", 1L) === Some(20L))
    assert(new WasmInstance(m).invoke("f0", 5L) === Some(30L))
  }

  test("call_indirect: dispatch by table index, null entry and signature " +
    "mismatch trap") {
    // f1: () -> i32 returns 11; f2: () -> i32 returns 22; f3(i32)->i32 id
    // f0(i) = call_indirect[type ()->i32](table[i])
    val t0 = (Seq(I32), Seq(I32)) // f0, f3
    val t1 = (Seq.empty[Int], Seq(I32)) // f1, f2
    val f0 = b(0x20, 0, 0x11, 1, 0x00, 0x0B) // call_indirect type 1
    val f1 = b(0x41) ++ sleb(11) ++ b(0x0B)
    val f2 = b(0x41) ++ sleb(22) ++ b(0x0B)
    val f3 = b(0x20, 0, 0x0B)
    // table: [f1, f2, f3] at 0,1,2; entry 3 exists but is null
    val m = module(Seq(t0, t1),
      Seq((0, Nil, f0), (1, Nil, f1), (1, Nil, f2), (0, Nil, f3)),
      table = Some(Seq(1, 2, 3)))
    // the assembler writes table size == elem count; extend: use index 2 = f3
    assert(new WasmInstance(m).invoke("f0", 0L) === Some(11L))
    assert(new WasmInstance(m).invoke("f0", 1L) === Some(22L))
    // f3 has a DIFFERENT canonical signature -> trap
    val t = intercept[WasmTrap] { new WasmInstance(m).invoke("f0", 2L) }
    assert(t.msg.contains("signature mismatch"))
    val oob = intercept[WasmTrap] { new WasmInstance(m).invoke("f0", 9L) }
    assert(oob.msg.contains("table"))
  }

  test("fuel guard: a runaway infinite loop becomes a trap, not a hang") {
    val spin = b(0x03, 0x40, 0x0C, 0, 0x0B, 0x0B)
    val m = module(Seq((Seq.empty[Int], Seq.empty[Int])), Seq((0, Nil, spin)))
    val inst = new WasmInstance(m)
    inst.setFuel(100000)
    val t = intercept[WasmTrap] { inst.invoke("f0") }
    assert(t.msg.contains("budget"))
  }

  test("if/else structured control (r18): value-carrying, nested, no-else, " +
    "dead-then revive at else, if inside a loop — the stock-toolchain " +
    "control idiom the r17 surface rejected now EXECUTES") {
    // (func (param i32) (result i32) local.get 0 if(result i32) i32.const 1
    //  else i32.const 2 end end) — the exact body the r17 surface rejected
    val basic = b(0x20, 0, 0x04, 0x7F, 0x41, 1, 0x05, 0x41, 2, 0x0B, 0x0B)
    assert(run1(Seq(I32), Seq(I32), basic)(1L) === Some(1L))
    assert(run1(Seq(I32), Seq(I32), basic)(0L) === Some(2L))
    assert(run1(Seq(I32), Seq(I32), basic)(0xFFFFFFFFL) === Some(1L)) // any nonzero
    // value-carrying f64 arms: if x != 0 then 2.5 else -7.0
    val fsel = b(0x20, 0, 0x04, 0x7C,
      0x44, 0, 0, 0, 0, 0, 0, 0x04, 0x40, // f64.const 2.5
      0x05, 0x44, 0, 0, 0, 0, 0, 0, 0x1C, 0xC0, // f64.const -7.0
      0x0B, 0x0B)
    assert(run1(Seq(I32), Seq(F64), fsel)(3L)
      === Some(java.lang.Double.doubleToRawLongBits(2.5)))
    assert(run1(Seq(I32), Seq(F64), fsel)(0L)
      === Some(java.lang.Double.doubleToRawLongBits(-7.0)))
    // nested: if a then (if b then 10 else 20) else 30
    val nested = b(0x20, 0, 0x04, 0x7F,
      0x20, 1, 0x04, 0x7F, 0x41, 10, 0x05, 0x41, 20, 0x0B,
      0x05, 0x41, 30, 0x0B, 0x0B)
    assert(run1(Seq(I32, I32), Seq(I32), nested)(1L, 1L) === Some(10L))
    assert(run1(Seq(I32, I32), Seq(I32), nested)(1L, 0L) === Some(20L))
    assert(run1(Seq(I32, I32), Seq(I32), nested)(0L, 9L) === Some(30L))
    // if WITHOUT else (arity 0): local set only on the taken path
    val noElse = b(0x41, 5, 0x21, 1,
      0x20, 0, 0x04, 0x40, 0x41, 42, 0x21, 1, 0x0B,
      0x20, 1, 0x0B)
    assert(run1(Seq(I32), Seq(I32), noElse, locals = Seq(I32))(1L) === Some(42L))
    assert(run1(Seq(I32), Seq(I32), noElse, locals = Seq(I32))(0L) === Some(5L))
    // then arm ends DEAD (return) — the else arm must revive and run
    val deadThen = b(0x20, 0, 0x04, 0x7F, 0x41, 11, 0x0F,
      0x05, 0x41, 22, 0x0B, 0x0B)
    assert(run1(Seq(I32), Seq(I32), deadThen)(1L) === Some(11L))
    assert(run1(Seq(I32), Seq(I32), deadThen)(0L) === Some(22L))
    // if driving a loop exit: sum 1..n with an if-based break
    // loop: i += 1; acc += i; if (i >= n) break out of the block
    val loopIf = b(
      0x02, 0x40, 0x03, 0x40,
      0x20, 1, 0x41, 1, 0x6A, 0x21, 1, // i += 1
      0x20, 2, 0x20, 1, 0x6A, 0x21, 2, // acc += i
      0x20, 1, 0x20, 0, 0x4E, // i >= n
      0x04, 0x40, 0x0C, 2, 0x0B, // if: br out of the outer block
      0x0C, 0, 0x0B, 0x0B,
      0x20, 2, 0x0B)
    assert(run1(Seq(I32), Seq(I32), loopIf, locals = Seq(I32, I32))(10L)
      === Some(55L))
  }

  test("0xFC saturating truncations (r18): all 8 forms over NaN/inf/bound " +
    "corners — non-trapping where the 0xA8-0xB1 family traps") {
    val F32 = 0x7D
    def f64c(d: Double): Seq[Byte] = {
      val bits = java.lang.Double.doubleToRawLongBits(d)
      b(0x44) ++ (0 until 8).map(k => ((bits >> (8 * k)) & 0xFF).toByte)
    }
    def sat1(sub: Int, rt: Int, x: Double): Long = {
      val body = f64c(x) ++ b(0xFC, sub, 0x0B)
      run1(Nil, Seq(rt), body)().get
    }
    // i32.trunc_sat_f64_s (0xFC 2)
    assert(sat1(2, I32, 3.9) === 3L)
    assert(sat1(2, I32, -3.9) === ((-3L) & 0xFFFFFFFFL))
    assert(sat1(2, I32, Double.NaN) === 0L)
    assert(sat1(2, I32, 1e300) === 0x7FFFFFFFL)
    assert(sat1(2, I32, -1e300) === 0x80000000L)
    // i32.trunc_sat_f64_u (0xFC 3)
    assert(sat1(3, I32, -0.5) === 0L) // fractional negatives trunc to 0
    assert(sat1(3, I32, -7.0) === 0L)
    assert(sat1(3, I32, 5e9) === 0xFFFFFFFFL) // ≥ 2^32 saturates
    assert(sat1(3, I32, 4.2e9) === 4200000000L) // in u32 range: exact
    assert(sat1(3, I32, 3000000000.0) === 3000000000L)
    assert(sat1(3, I32, Double.NaN) === 0L)
    // i64.trunc_sat_f64_s (0xFC 6)
    assert(sat1(6, I64, 1e300) === Long.MaxValue)
    assert(sat1(6, I64, -1e300) === Long.MinValue)
    assert(sat1(6, I64, Double.NaN) === 0L)
    assert(sat1(6, I64, -123.99) === -123L)
    // i64.trunc_sat_f64_u (0xFC 7)
    assert(sat1(7, I64, 2e19) === -1L) // u64 max
    assert(sat1(7, I64, 1e19) === java.lang.Long.parseUnsignedLong("10000000000000000000"))
    assert(sat1(7, I64, -5.0) === 0L)
    assert(sat1(7, I64, Double.NaN) === 0L)
    // f32-source forms (0xFC 0/1/4/5) via a f64→f32 demote in the body
    def sat32(sub: Int, rt: Int, x: Double): Long = {
      val body = f64c(x) ++ b(0xB6, 0xFC, sub, 0x0B) // f32.demote_f64 first
      run1(Nil, Seq(rt), body)().get
    }
    assert(sat32(0, I32, 2.9) === 2L)
    assert(sat32(0, I32, 1e30) === 0x7FFFFFFFL)
    assert(sat32(0, I32, Double.NaN) === 0L)
    assert(sat32(1, I32, -1e30) === 0L)
    assert(sat32(1, I32, 1e10) === 0xFFFFFFFFL)
    assert(sat32(4, I64, -1e30) === Long.MinValue)
    assert(sat32(5, I64, 1e30) === -1L)
    // the TRAPPING family is untouched: 0xAA on NaN still traps
    val trap = intercept[WasmTrap] {
      run1(Nil, Seq(I32), f64c(Double.NaN) ++ b(0xAA, 0x0B))()
    }
    assert(trap.msg.contains("invalid"))
  }

  test("0xFC memory.copy / memory.fill (r18): overlap-safe memmove " +
    "semantics, fill, zero-length at the boundary, OOB traps") {
    // store a marker i64, copy 4 bytes 0→2 (overlapping forward), read back
    val copyBody = b(0x41, 0) ++ b(0x42) ++ sleb(0x0807060504030201L) ++
      b(0x37, 0x03, 0x00) ++
      b(0x41, 2, 0x41, 0, 0x41, 4, 0xFC, 10, 0x00, 0x00) ++
      b(0x41, 0, 0x29, 0x03, 0x00, 0x0B)
    assert(run1(Nil, Seq(I64), copyBody, memPages = 1)()
      === Some(0x0807040302010201L))
    // backward overlap: copy 4 bytes 2→0
    val copyBack = b(0x41, 0) ++ b(0x42) ++ sleb(0x0807060504030201L) ++
      b(0x37, 0x03, 0x00) ++
      b(0x41, 0, 0x41, 2, 0x41, 4, 0xFC, 10, 0x00, 0x00) ++
      b(0x41, 0, 0x29, 0x03, 0x00, 0x0B)
    assert(run1(Nil, Seq(I64), copyBack, memPages = 1)()
      === Some(0x0807060506050403L))
    // fill [3, 7) with 0xAB and read the i64 at 0
    val fillBody = b(0x41, 3, 0x41) ++ sleb(0xABL) ++ b(0x41, 4, 0xFC, 11, 0x00) ++
      b(0x41, 0, 0x29, 0x03, 0x00, 0x0B)
    assert(run1(Nil, Seq(I64), fillBody, memPages = 1)()
      === Some(0x00ABABABAB000000L))
    // zero-length copy AT the memory end is legal (spec): no trap
    val zeroAtEnd = b(0x41) ++ sleb(65536L) ++ b(0x41, 0, 0x41, 0,
      0xFC, 10, 0x00, 0x00, 0x41, 7, 0x0B)
    assert(run1(Nil, Seq(I32), zeroAtEnd, memPages = 1)() === Some(7L))
    // OOB copy and fill trap with the op named
    val oobCopy = b(0x41, 0, 0x41) ++ sleb(65530L) ++ b(0x41, 16,
      0xFC, 10, 0x00, 0x00, 0x41, 0, 0x0B)
    val t1 = intercept[WasmTrap] { run1(Nil, Seq(I32), oobCopy, memPages = 1)() }
    assert(t1.msg.contains("memory.copy"))
    val oobFill = b(0x41) ++ sleb(65530L) ++ b(0x41, 0, 0x41, 16,
      0xFC, 11, 0x00, 0x41, 0, 0x0B)
    val t2 = intercept[WasmTrap] { run1(Nil, Seq(I32), oobFill, memPages = 1)() }
    assert(t2.msg.contains("memory.fill"))
  }

  test("an artifact using a STILL-unsupported instruction class fails at " +
    "LOAD time with the class NAMED — CREATE-statement surface, not a " +
    "bare hex byte (r19: the SIMD v128 core and typed select moved " +
    "INSIDE the surface; i8x16/i16x8 lanes, shuffle, memory.init, " +
    "reference types remain outside)") {
    // 0xFD SIMD: the v128 core is INSIDE the surface since r19; the
    // i8x16/i16x8/f32x4 lane families remain named rejections
    val simd = b(0xFD, 13, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
      13, 14, 15, 0x1A, 0x0B) // i8x16.shuffle
    val e = intercept[WasmModule.WasmParseException] {
      module(Seq((Seq.empty[Int], Seq(I32))), Seq((0, Nil, simd)))
    }
    assert(e.getMessage.contains("shuffle"), e.getMessage)
    val i8splat = b(0x41, 1, 0xFD, 15, 0x1A, 0x1A, 0x41, 1, 0x0B) // i8x16.splat
    val e1b = intercept[WasmModule.WasmParseException] {
      module(Seq((Seq.empty[Int], Seq(I32))), Seq((0, Nil, i8splat)))
    }
    assert(e1b.getMessage.contains("i8x16"), e1b.getMessage)
    // 0xFC 8 = memory.init needs passive segments — named rejection
    val mi = b(0x41, 0, 0x41, 0, 0x41, 0, 0xFC, 8, 0x00, 0x00, 0x0B)
    val e2 = intercept[WasmModule.WasmParseException] {
      module(Seq((Seq.empty[Int], Seq.empty[Int])), Seq((0, Nil, mi)))
    }
    assert(e2.getMessage.contains("memory.init"))
    // reference types (0xD0 ref.null) — still a named rejection
    // (typed select 0x1C moved INSIDE the surface with the r19 SIMD core)
    val rn = b(0xD0, 0x70, 0x1A, 0x41, 1, 0x0B)
    val e3 = intercept[WasmModule.WasmParseException] {
      module(Seq((Seq.empty[Int], Seq(I32))), Seq((0, Nil, rn)))
    }
    assert(e3.getMessage.contains("reference types"))
    // a dangling else still fails structurally
    val badElse = b(0x41, 1, 0x05, 0x0B)
    val e4 = intercept[WasmModule.WasmParseException] {
      module(Seq((Seq.empty[Int], Seq(I32))), Seq((0, Nil, badElse)))
    }
    assert(e4.getMessage.contains("else without open if"))
  }

  test("module-level guards: arity mismatch, unknown export, call-depth cap") {
    val id = b(0x20, 0, 0x0B)
    val m = module(Seq((Seq(I32), Seq(I32))), Seq((0, Nil, id)))
    intercept[WasmTrap] { new WasmInstance(m).invoke("f0") } // 0 args
    intercept[Exception] { new WasmInstance(m).invoke("nope", 1L) }
    // self-recursive function with no base case: call-depth trap
    val rec = b(0x20, 0, 0x10, 0, 0x0B) // f0(x) = f0(x)
    val mr = module(Seq((Seq(I32), Seq(I32))), Seq((0, Nil, rec)))
    val t = intercept[WasmTrap] { new WasmInstance(mr).invoke("f0", 1L) }
    assert(t.msg.contains("depth") || t.msg.contains("stack"))
  }

  // ---- SIMD v128 core (r19) ----------------------------------------------

  private val V128 = 0x7B
  private def fd(sub: Int): Seq[Byte] = Seq(0xFD.toByte) ++ uleb(sub.toLong)
  private def dbits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
  private def dval(l: Long): Double = java.lang.Double.longBitsToDouble(l)
  private def cf64(v: Double): Seq[Byte] =
    b(0x44) ++ (0 until 8).map(k => ((dbits(v) >> (8 * k)) & 0xFF).toByte)

  test("SIMD f64x2: load/store/splat/mul/sqrt/add round-trip through " +
    "linear memory — lanes computed exactly like the scalar ops") {
    // f0(a, b) = (a + sqrt(2a)) + (b + sqrt(2b)), all via v128 lanes;
    // v128.store takes [addr, vec] — the address is pushed first
    val body2 =
      b(0x41, 0) ++ b(0x20, 0) ++ b(0x39, 0x03, 0) ++  // store a @0
      b(0x41, 8) ++ b(0x20, 1) ++ b(0x39, 0x03, 0) ++  // store b @8
      b(0x41, 16) ++                                   // dst addr
      (b(0x41, 0) ++ fd(0) ++ b(0x00, 0x00)) ++        // X = v128.load @0
      (cf64(2.0) ++ fd(20)) ++                         // splat 2
      fd(242) ++ fd(239) ++                            // sqrt(2X)
      (b(0x41, 0) ++ fd(0) ++ b(0x00, 0x00)) ++ fd(240) ++ // + X
      fd(11) ++ b(0x00, 0x00) ++                       // v128.store @16
      b(0x41, 16, 0x2B, 0x03, 0) ++                    // f64.load @16
      b(0x41, 24, 0x2B, 0x03, 0) ++                    // f64.load @24
      b(0xA0, 0x0B)                                    // f64.add, end
    for ((a, bv) <- Seq((1.5, 3.25), (0.0, 9.0), (7.0, 0.125))) {
      val got = run1(Seq(F64, F64), Seq(F64), body2, memPages = 1)(
        dbits(a), dbits(bv)).map(dval)
      val want = (a + math.sqrt(2 * a)) + (bv + math.sqrt(2 * bv))
      assert(got === Some(want), s"($a, $bv): $got != $want")
    }
  }

  test("SIMD i32x4: splat/add/mul/min/max/shifts/compares/bitmask/" +
    "all_true and extract/replace lanes agree with scalar arithmetic") {
    def k32(v: Int): Seq[Byte] = b(0x41) ++ sleb(v.toLong)
    // v = (replace_lane2(splat(x), 100) * splat(2)) + splat(1), held in
    // a v128 LOCAL (decode-time 2-slot mapping); sum its 4 lanes
    val body2 =
      (b(0x20, 0) ++ fd(17) ++
        (k32(100) ++ fd(28) ++ b(2)) ++
        (k32(2) ++ fd(17)) ++ fd(181) ++
        (k32(1) ++ fd(17)) ++ fd(174) ++
        b(0x21, 1)) ++                             // local.set v (v128)
      (b(0x20, 1) ++ fd(27) ++ b(0)) ++            // extract 0
      (b(0x20, 1) ++ fd(27) ++ b(1) ++ b(0x6A)) ++ // + extract 1
      (b(0x20, 1) ++ fd(27) ++ b(2) ++ b(0x6A)) ++
      (b(0x20, 1) ++ fd(27) ++ b(3) ++ b(0x6A)) ++
      b(0x0B)
    for (x <- Seq(0L, 5L, -3L & 0xFFFFFFFFL)) {
      val xi = x.toInt
      val lanes = Array(xi, xi, 100, xi).map(v => v * 2 + 1)
      val want = (lanes.sum.toLong) & 0xFFFFFFFFL
      assert(run1(Seq(I32), Seq(I32), body2, locals = Seq(V128))(x)
        === Some(want), s"x=$xi")
    }
    // compares + bitmask + all_true + shifts: f1(a,b) packs
    // [bitmask(splat(a) < [b,b,b,b]), all_true, (a << 1) lane0 of shl]
    val cmpBody =
      (b(0x20, 0) ++ fd(17)) ++ (b(0x20, 1) ++ fd(17)) ++
      fd(57) ++                                    // lt_s lanewise
      b(0x21, 2) ++
      (b(0x20, 2) ++ fd(164)) ++                   // bitmask → 0 or 15
      (b(0x20, 2) ++ fd(163) ++ b(0x41, 16, 0x6C)) ++ // all_true*16
      b(0x6A) ++
      ((b(0x20, 0) ++ fd(17)) ++ b(0x41, 1) ++ fd(171) ++
        fd(27) ++ b(0) ++ b(0x41, 5, 0x74)) ++     // (a<<1) << 5
      b(0x6A, 0x0B)
    def cmpWant(a: Int, bv: Int): Long = {
      val m = if (a < bv) 15L else 0L
      val at = if (a < bv) 16L else 0L
      ((m + at + ((a << 1) << 5)) & 0xFFFFFFFFL)
    }
    for ((a, bv) <- Seq((1, 2), (5, -7), (-2, -1)))
      assert(run1(Seq(I32, I32), Seq(I32), cmpBody,
        locals = Seq(V128))(a.toLong & 0xFFFFFFFFL, bv.toLong & 0xFFFFFFFFL)
        === Some(cmpWant(a, bv)), s"($a,$bv)")
  }

  test("SIMD v128 control-flow integration: v128.const, value-carrying " +
    "BLOCK returning v128 (branch arity 2), drop of a v128, 2-slot " +
    "select, bitselect/not/and/or/xor/andnot, i64x2 + conversions") {
    // f0(c) -> i64:
    //   v = block(result v128) { v128.const [7, 9]; br 0 }
    //   w = select(v128.const [1,2], v128.const [3,4], c)  (c!=0 → [1,2])
    //   drop v128.const [5,6]
    //   u = bitselect(v, w, v128.const [lo ones, 0])
    //   return extract0(u) + extract1(u)     (i64x2)
    def cv128(lo: Long, hi: Long): Seq[Byte] =
      fd(12) ++ (0 until 8).map(k => ((lo >> (8 * k)) & 0xFF).toByte) ++
        (0 until 8).map(k => ((hi >> (8 * k)) & 0xFF).toByte)
    val body2 =
      (b(0x02, V128) ++ cv128(7, 9) ++ b(0x0C, 0, 0x0B)) ++
      (cv128(1, 2) ++ cv128(3, 4) ++ b(0x20, 0) ++ b(0x1B)) ++
      (cv128(5, 6) ++ b(0x1A)) ++
      cv128(-1L, 0L) ++ fd(82) ++
      b(0x21, 1) ++
      (b(0x20, 1) ++ fd(29) ++ b(0)) ++
      (b(0x20, 1) ++ fd(29) ++ b(1)) ++
      b(0x7C, 0x0B)
    // c != 0: select → [1,2]; bitselect(v=[7,9], w=[1,2], mask=[ones,0])
    //   → [7 (from v), 2 (from w)] → 9
    assert(run1(Seq(I32), Seq(I64), body2, locals = Seq(V128))(1L)
      === Some(9L))
    // c == 0: select → [3,4]; bitselect → [7, 4] → 11
    assert(run1(Seq(I32), Seq(I64), body2, locals = Seq(V128))(0L)
      === Some(11L))
    // typed select (0x1C) — v128 needs it per strict validation
    val tsBody =
      (cv128(10, 20) ++ cv128(30, 40) ++ b(0x20, 0) ++
        b(0x1C, 0x01, V128)) ++
      b(0x21, 1) ++
      (b(0x20, 1) ++ fd(29) ++ b(0)) ++
      (b(0x20, 1) ++ fd(29) ++ b(1)) ++
      b(0x7C, 0x0B)
    assert(run1(Seq(I32), Seq(I64), tsBody, locals = Seq(V128))(1L)
      === Some(30L))
    assert(run1(Seq(I32), Seq(I64), tsBody, locals = Seq(V128))(0L)
      === Some(70L))
    // i64x2 arithmetic + trunc_sat/convert lanes
    // f1(a: f64) = extract0(trunc_sat_f64x2_s_zero(splat(a) * splat(2)))
    //              + extract1(i64x2 shl([a as i64x2 splat of 3], 2))
    val conv =
      (b(0x20, 0) ++ fd(20)) ++ (cf64(2.0) ++ fd(20)) ++ fd(242) ++
      fd(252) ++                                    // i32x4.trunc_sat_s_zero
      fd(27) ++ b(0) ++                             // i32 lane 0
      b(0xAC) ++                                    // i64.extend_i32_s
      ((b(0x42, 3) ++ fd(18)) ++ b(0x41, 2) ++ fd(203) ++
        fd(29) ++ b(1)) ++                          // (3 << 2) lane1
      b(0x7C, 0x0B)
    for (a <- Seq(1.7, -2.9, 1e12))
      assert(run1(Seq(F64), Seq(I64), conv)(dbits(a))
        === Some((a * 2).toInt.toLong + 12L), s"a=$a")
  }

  test("SIMD v128 block-result DROP (r20 ADVICE fix): a block/if whose " +
    "result type is v128 marks the merged 2-slot value at end, so a " +
    "following untyped drop pops both slots instead of desyncing") {
    def cv128(lo: Long, hi: Long): Seq[Byte] =
      fd(12) ++ (0 until 8).map(k => ((lo >> (8 * k)) & 0xFF).toByte) ++
        (0 until 8).map(k => ((hi >> (8 * k)) & 0xFF).toByte)
    // f(c) -> i64: i64.const 5; block(result v128){ v128.const } end;
    // drop; i64.const 37; add — a 1-slot drop would leave half the
    // vector on the stack and return garbage
    val body =
      b(0x42, 5) ++
      (b(0x02, V128) ++ cv128(7, 9) ++ b(0x0B)) ++
      b(0x1A) ++
      b(0x42, 37) ++ b(0x7C, 0x0B)
    assert(run1(Seq(I32), Seq(I64), body)(0L) === Some(42L))
    // same through an if/else merge carrying v128
    val bodyIf =
      b(0x42, 5) ++
      (b(0x20, 0) ++ b(0x04, V128) ++ cv128(1, 2) ++ b(0x05) ++
        cv128(3, 4) ++ b(0x0B)) ++
      b(0x1A) ++
      b(0x42, 37) ++ b(0x7C, 0x0B)
    assert(run1(Seq(I32), Seq(I64), bodyIf)(1L) === Some(42L))
    assert(run1(Seq(I32), Seq(I64), bodyIf)(0L) === Some(42L))
  }

  test("SIMD f32x4 (r19): splat/extract/replace/compares/abs/neg/sqrt/" +
    "add/sub/mul/div/min/max and the i32x4<->f32x4 conversions agree " +
    "with scalar float arithmetic lane-for-lane") {
    val F32 = 0x7D
    def fb(v: Float): Long =
      java.lang.Float.floatToRawIntBits(v).toLong & 0xFFFFFFFFL
    def fv(l: Long): Float = java.lang.Float.intBitsToFloat(l.toInt)
    // f0(a, b) = lane0(sqrt(|splat(a)|) * splat(b)) + lane3(splat(a) /
    //            replace_lane3(splat(b), 2.0f)) — f32 result
    val body =
      (b(0x20, 0) ++ fd(19)) ++ fd(224) ++ fd(227) ++  // sqrt(|splat(a)|)
      (b(0x20, 1) ++ fd(19)) ++ fd(230) ++             // * splat(b)
      fd(31) ++ b(0) ++                                 // lane 0
      ((b(0x20, 0) ++ fd(19)) ++
        (b(0x20, 1) ++ fd(19)) ++
        (b(0x43) ++ Seq[Byte](0, 0, 0, 0x40)) ++        // 2.0f
        fd(32) ++ b(3) ++                               // replace lane 3
        fd(231) ++                                      // div
        fd(31) ++ b(3)) ++                              // lane 3
      b(0x92, 0x0B)                                     // f32.add
    for ((a, bv) <- Seq((4.0f, 3.0f), (-9.0f, 0.5f), (2.25f, -1.5f))) {
      val got = run1(Seq(F32, F32), Seq(F32), body)(fb(a), fb(bv)).map(fv)
      val want = (math.sqrt(math.abs(a).toDouble).toFloat * bv) + (a / 2.0f)
      assert(got === Some(want), s"($a, $bv): $got != $want")
    }
    // compares + min/max + conversions: f1(x) =
    //   bitmask-free check via i32x4 lanes of (splat(x) < splat(1.5f))
    //   + trunc_sat lane0 of splat(x * 4)  (scalar pre-mul)
    val conv =
      ((b(0x20, 0) ++ fd(19)) ++
        (b(0x43) ++ Seq[Byte](0, 0, 0xC0.toByte, 0x3F)) ++ fd(19) ++ // 1.5f
        fd(65) ++                                       // f32x4.eq? no: 65=eq
        fd(27) ++ b(1)) ++                              // i32 lane 1 (mask)
      ((b(0x20, 0) ++ fd(19)) ++
        (b(0x43) ++ Seq[Byte](0, 0, 0x80.toByte, 0x40)) ++ fd(19) ++ // 4.0f
        fd(230) ++                                      // mul
        fd(248) ++                                      // trunc_sat_s
        fd(27) ++ b(2)) ++                              // lane 2
      b(0x6A, 0x0B)                                     // i32.add
    for (x <- Seq(1.5f, -2.75f, 7.1f)) {
      val eqMask = if (x == 1.5f) 0xFFFFFFFFL else 0L
      val want = (eqMask + (x * 4.0f).toInt.toLong) & 0xFFFFFFFFL
      assert(run1(Seq(F32), Seq(I32), conv)(fb(x)) === Some(want), s"x=$x")
    }
  }

  test("SIMD memory shapes (r19): load_splat / extending loads / " +
    "load_zero / load_lane / store_lane and the vector round ops agree " +
    "with scalar arithmetic") {
    // f0(): seed memory bytes 0..15 = 1..16, then:
    //  a = i64x2 lane1 of load8x8_s @0           (bytes 5..8 sign-ext 16-bit)
    //  b = lane0 of load16_splat @2              (0x0403 repeated)
    //  c = lane1 of load64_zero @0               (must be 0)
    //  d = store8_lane(lane 9) of load8_splat @4 → read back byte @40
    val seed: Seq[Byte] = {
      val s = Seq.newBuilder[Byte]
      for (k <- 0 until 16)
        s ++= (b(0x41) ++ sleb(k)) ++ (b(0x41) ++ sleb(k + 1)) ++ b(0x3A, 0x00, 0x00)
      s.result()
    }
    val body = seed ++
      // a: load8x8_s @0 → i16 lanes [1..8]; lane 5 (hi word idx) via
      // i32x4.extract of the packed half: use i64x2.extract lane1
      (b(0x41, 0) ++ fd(1) ++ b(0x00, 0x00) ++ fd(29) ++ b(1)) ++
      // b: load16_splat @2 → lanes 0x0403; i32x4.extract lane 2
      (b(0x41, 2) ++ fd(8) ++ b(0x00, 0x00) ++ fd(27) ++ b(2) ++ b(0xAC)) ++
      b(0x7C) ++
      // c: load64_zero @0 lane1 = 0
      (b(0x41, 0) ++ fd(93) ++ b(0x00, 0x00) ++ fd(29) ++ b(1)) ++
      b(0x7C) ++
      // d: store8_lane lane 9 of load8_splat @4 at addr 40, read back
      (b(0x41, 40) ++
        (b(0x41, 4) ++ fd(7) ++ b(0x00, 0x00)) ++
        fd(88) ++ b(0x00, 0x00, 9) ++
        b(0x41, 40, 0x2D, 0x00, 0x00) ++ b(0xAC)) ++
      b(0x7C, 0x0B)
    // bytes 1..8 → i16 lanes [1..8]; i64 lane1 = lanes 5-8 packed:
    val aWant = 5L | (6L << 16) | (7L << 32) | (8L << 48)
    val bWant = 0x04030403L // each 32-bit lane holds TWO 16-bit copies
    val dWant = 5L // byte @4 is 5; splat stores 5 everywhere
    assert(run1(Seq.empty, Seq(I64), body, memPages = 1)()
      === Some(aWant + bWant + 0L + dWant))
    // extending load signedness: byte 0x80 at addr 0 → load8x8_s lane0
    // = -128 (as 16-bit), _u = 128
    val sgn =
      (b(0x41, 0, 0x41) ++ sleb(0x80) ++ b(0x3A, 0x00, 0x00)) ++
      (b(0x41, 0) ++ fd(1) ++ b(0x00, 0x00) ++ fd(29) ++ b(0) ++
        b(0x42) ++ sleb(0xFFFF) ++ b(0x83)) ++ // & 0xFFFF: lane0 16 bits
      (b(0x41, 0) ++ fd(2) ++ b(0x00, 0x00) ++ fd(29) ++ b(0) ++
        b(0x42) ++ sleb(0xFFFF) ++ b(0x83)) ++
      b(0x7C, 0x0B)
    assert(run1(Seq.empty, Seq(I64), sgn, memPages = 1)()
      === Some((0xFF80L + 0x0080L)))
    // vector rounds: f64x2 lanes of nearest(2.5, 3.5) = (2, 4) —
    // banker's, exactly the scalar 0x9E semantics
    val rnd =
      (cf64(2.5) ++ fd(20)) ++ cf64(3.5) ++ fd(34) ++ b(1) ++ // [2.5, 3.5]
      fd(148) ++                                              // f64x2.nearest
      b(0x21, 0) ++                                           // v128 local 0
      (b(0x20, 0) ++ fd(33) ++ b(0) ++ b(0xB0)) ++            // lane0 → i64
      (b(0x20, 0) ++ fd(33) ++ b(1) ++ b(0xB0)) ++
      b(0x7C, 0x0B)
    assert(run1(Seq.empty, Seq(I64), rnd, locals = Seq(V128), memPages = 1)()
      === Some(6L)) // 2 + 4
    // f32x4.floor on [-1.5f lanes]
    val fl =
      (b(0x43) ++ Seq[Byte](0, 0, 0xC0.toByte, 0xBF.toByte)) ++ fd(19) ++ // -1.5f
      fd(104) ++                                              // f32x4.floor
      fd(31) ++ b(2) ++                                       // lane 2
      b(0x0B)
    val got = run1(Seq.empty, Seq(0x7D), fl, memPages = 1)()
    assert(got.map(v => java.lang.Float.intBitsToFloat(v.toInt))
      === Some(-2.0f))
  }
}
