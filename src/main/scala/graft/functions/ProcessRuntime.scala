package graft.functions

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FileOutputStream, IOException, PrintStream}
import java.util.concurrent.atomic.AtomicLong

/** Out-of-process function runtime — the faithful analog of the reference's
  * sandboxed WASM execution (wasmedge_factory/src/udf.rs:82-115 +
  * wasm_udf/src/lib.rs:31-43): the engine never runs guest code in its own
  * address space. Each `'proc:module!fn'` locator binds to a guest JVM
  * SUBPROCESS hosting the module; every 8192-row batch crosses the process
  * boundary as Arrow IPC bytes over stdin/stdout — a full copy both ways,
  * exactly the marshalling cost the reference documents (README.md:76).
  *
  * Error surface matches udf.rs:95,111-113 across the boundary: a guest
  * [[FunctionError]] travels back as a GUEST-ERROR frame and re-throws as
  * `FunctionError` parent-side ("[Wasm Invocation] msg"); any other guest
  * throw — or the guest process dying mid-call — is a trap
  * ("[Wasm Invocation Panic] msg"). A dead guest is evicted from the client
  * registry so the next call spawns a fresh process, matching the
  * reference's session-survives-a-trap behavior (lib.rs:298-306).
  *
  * Concurrency: one guest process per module path per JVM, calls serialized
  * on the client — the reference holds its WasmEdge VM behind a mutex the
  * same way (one VM instance per module, lib.rs:79-100). On a cluster each
  * executor JVM lazily spawns its own guest; `DROP FUNCTION` tears down the
  * driver-side guest via the module-cache eviction hook, executor-side
  * guests die with their executor.
  */
object ProcessRuntime {

  /** Wire protocol opcodes/status (one byte each). */
  private[functions] val OpList: Int = 0
  private[functions] val OpInvoke: Int = 1
  private[functions] val StOk: Int = 0
  private[functions] val StGuestError: Int = 1
  private[functions] val StPanic: Int = 2
}

/** A `FunctionModule` whose functions execute in a guest subprocess.
  * Constructed by [[ModuleRegistry.acquire]] for `proc:`-scheme paths; the
  * constructor performs the LIST handshake so a bad inner module fails at
  * `CREATE FUNCTION` time, like the reference factory (lib.rs:111-132).
  */
final class ProcessFunctionModule(val innerPath: String)
    extends FunctionModule with AutoCloseable {

  override val functions: Map[String, ScalarBatchFunction] =
    ProcessClient.listFunctions(innerPath)
      .map(name => name -> ProcessScalarFunction(innerPath, name))
      .toMap

  /** Module-cache eviction hook: kill the guest process (DROP FUNCTION
    * teardown — the reference frees the VM at refcount zero,
    * lib.rs:344-372). */
  override def close(): Unit = ProcessClient.shutdown(innerPath)
}

/** Executor-side stub for one guest function: holds only the (module, fn)
  * address; the process client is looked up (or spawned) lazily in
  * whichever JVM the task runs in.
  */
final case class ProcessScalarFunction(modulePath: String, fnName: String)
    extends ScalarBatchFunction {

  override def apply(args: Seq[Any]): Any = {
    val cols = args.toIndexedSeq.map(a => Array[Any](a))
    applyBatch(cols, 1)(0)
  }

  /** THE boundary crossing: one Arrow IPC round-trip per input batch. */
  override def applyBatch(cols: IndexedSeq[Array[Any]], n: Int): Array[Any] =
    ProcessClient.invoke(modulePath, fnName, cols, n)
}

/** Per-JVM registry of guest processes, keyed by module path. */
object ProcessClient {

  /** Parent-side count of INVOKE round-trips — observability for the
    * batch-granularity spec (the analog of counting guest calls inside the
    * reference's VM). */
  val roundTrips = new AtomicLong()

  /** Bounded guest-read deadline (ms); override for tests via system
    * property. Generous default: the cost of a hung guest is a killed
    * subprocess + respawn, never a stuck executor task. */
  def readTimeoutMs: Long =
    sys.props.get("graft.proc.readTimeoutMs").map(_.toLong).getOrElse(120000L)

  private final class Client(val modulePath: String) {
    import ProcessRuntime._

    private val process: Process = {
      val javaBin = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
      // Arrow's netty allocator needs java.nio opened on JDK 17+ (the same
      // opens the parent JVM runs with, build.sbt jdk17AddOpens)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx512m", "-cp", sys.props("java.class.path"),
        "graft.functions.FunctionServer", modulePath)).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT) // guest logs → our stderr
      pb.start()
    }
    private val toGuest = new DataOutputStream(
      new BufferedOutputStream(process.getOutputStream))
    private val fromGuest = new DataInputStream(
      new BufferedInputStream(process.getInputStream))

    def alive: Boolean = process.isAlive

    def destroy(): Unit = {
      process.destroyForcibly()
      process.waitFor()
    }

    /** Deadline-bounded exact read: a guest that hangs during startup or
      * mid-call becomes a bounded IOException (which evicts + respawns)
      * instead of blocking the invoking Spark task forever — blocking
      * reads never produce the IOException `destroyForcibly` needs. */
    private def readExact(n: Int, what: String): Array[Byte] = {
      val timeoutMs = ProcessClient.readTimeoutMs
      val start = System.nanoTime()
      val deadline = start + timeoutMs * 1000000L
      val buf = new Array[Byte](n)
      var got = 0
      while (got < n) {
        val avail = fromGuest.available()
        if (avail > 0) {
          val r = fromGuest.read(buf, got, math.min(avail, n - got))
          if (r < 0) throw new IOException(s"guest closed stream mid-$what")
          got += r
        } else if (!process.isAlive) {
          // pipe may still hold the tail after death; a direct read settles it
          val r = fromGuest.read(buf, got, n - got)
          if (r <= 0) throw new IOException(s"guest process died during $what")
          got += r
        } else {
          val now = System.nanoTime()
          if (now > deadline) {
            destroy()
            throw new IOException(
              s"guest read timeout (${timeoutMs} ms) waiting for $what")
          }
          // spin briefly (guest replies are sub-ms away in steady state),
          // then back off to 0.2 ms sleeps
          if (now - start < 2000000L) Thread.onSpinWait()
          else Thread.sleep(0, 200000)
        }
      }
      buf
    }

    private def readStatus(): Int = readExact(1, "status byte")(0) & 0xFF
    private def readInt(what: String): Int =
      java.nio.ByteBuffer.wrap(readExact(4, what)).getInt
    private def readUtf(what: String): String = {
      val lenBytes = readExact(2, what)
      val len = ((lenBytes(0) & 0xFF) << 8) | (lenBytes(1) & 0xFF)
      val body = readExact(len, what)
      val framed = new Array[Byte](len + 2)
      System.arraycopy(lenBytes, 0, framed, 0, 2)
      System.arraycopy(body, 0, framed, 2, len)
      new DataInputStream(new java.io.ByteArrayInputStream(framed)).readUTF()
    }

    /** Any parse failure mid-frame leaves the byte stream desynchronized —
      * widen it to IOException so the caller evicts + respawns the guest
      * (a FunctionError / panic frame read to completion is a CLEAN state
      * and passes through untouched). */
    private def protocol[T](body: => T): T =
      try body
      catch {
        case e @ (_: FunctionError | _: IOException) => throw e
        case scala.util.control.NonFatal(e) =>
          throw new IOException(s"guest protocol failure mid-frame: $e", e)
      }

    def list(): Seq[String] = synchronized {
      protocol {
        toGuest.writeByte(OpList); toGuest.flush()
        val st = readStatus()
        if (st != StOk)
          throw new IllegalArgumentException(readUtf("error message"))
        Seq.fill(readInt("function count"))(readUtf("function name"))
      }
    }

    def invoke(fnName: String, cols: IndexedSeq[Array[Any]], n: Int): Array[Any] =
      synchronized {
        val req = ArrowBatchCodec.encode(cols, n)
        val frame: Either[String, Array[Byte]] = protocol {
          toGuest.writeByte(OpInvoke)
          toGuest.writeUTF(fnName)
          toGuest.writeInt(req.length)
          toGuest.write(req)
          toGuest.flush()
          roundTrips.incrementAndGet()
          readStatus() match {
            case StOk =>
              val len = readInt("frame length")
              if (len < 0) throw new IOException(s"bad frame length from guest: $len")
              Right(readExact(len, "result frame"))
            case StGuestError => throw FunctionError(readUtf("guest error"))
            case StPanic => Left(readUtf("panic message"))
            case other =>
              throw new IOException(s"bad status byte from guest: $other")
          }
        }
        frame match {
          case Right(bytes) =>
            // the frame is fully consumed: an Arrow decode failure here is a
            // clean-stream error, not a desync — no eviction needed
            val (outCols, _) = ArrowBatchCodec.decode(bytes)
            if (outCols.isEmpty) new Array[Any](n) else outCols(0)
          case Left(panicMsg) => throw new RuntimeException(panicMsg)
        }
      }
  }

  private val clients = new java.util.HashMap[String, Client]()

  sys.addShutdownHook {
    clients.synchronized {
      clients.values.forEach(_.destroy())
      clients.clear()
    }
  }

  private def clientFor(modulePath: String): Client = clients.synchronized {
    val existing = clients.get(modulePath)
    if (existing != null && existing.alive) existing
    else {
      if (existing != null) { existing.destroy(); clients.remove(modulePath) }
      val c = new Client(modulePath)
      clients.put(modulePath, c)
      c
    }
  }

  /** Guest process running? (lifecycle observability for specs) */
  def isRunning(modulePath: String): Boolean = clients.synchronized {
    val c = clients.get(modulePath)
    c != null && c.alive
  }

  def listFunctions(modulePath: String): Seq[String] = {
    val c = clientFor(modulePath)
    try c.list()
    catch {
      case e: IOException =>
        evict(c)
        throw new IllegalArgumentException(
          s"guest process for module '$modulePath' failed to start: ${e.getMessage}")
    }
  }

  def invoke(modulePath: String, fnName: String,
      cols: IndexedSeq[Array[Any]], n: Int): Array[Any] = {
    val c = clientFor(modulePath)
    try c.invoke(fnName, cols, n)
    catch {
      // the guest died mid-call (EOF/broken pipe): a trap, udf.rs:95 —
      // evict so the next call respawns (session survives, lib.rs:298-306)
      case e: IOException =>
        evict(c)
        throw new RuntimeException(
          s"guest process died during invocation of '$fnName': ${e.getMessage}")
    }
  }

  def shutdown(modulePath: String): Unit = clients.synchronized {
    val c = clients.remove(modulePath)
    if (c != null) c.destroy()
  }

  private def evict(c: Client): Unit = clients.synchronized {
    c.destroy()
    if (clients.get(c.modulePath) eq c) clients.remove(c.modulePath)
  }
}

/** Guest-process main — the analog of the reference's WASM guest runtime
  * (wasm_udf/src/lib.rs:31-43): loop forever reading one Arrow IPC batch
  * per request from stdin, running the named module function over the
  * whole batch, writing the result column back as Arrow IPC on stdout.
  * Guest `FunctionError` → GUEST-ERROR frame; any other throw → PANIC
  * frame (the parent maps them to the reference's two error strings).
  */
object FunctionServer {
  import ProcessRuntime._

  def main(args: Array[String]): Unit = {
    // claim the protocol channel FIRST: anything else printing to stdout
    // (library warnings, module init) is rerouted to stderr so it cannot
    // corrupt the frame stream
    val proto = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(java.io.FileDescriptor.out)))
    System.setOut(new PrintStream(new FileOutputStream(java.io.FileDescriptor.err)))
    val in = new DataInputStream(new BufferedInputStream(System.in))

    val modulePath = args(0)
    require(!modulePath.startsWith("proc:"), "nested proc: modules not allowed")
    val module =
      try ModuleRegistry.acquire(modulePath)
      catch {
        case e: Throwable =>
          // fail every request with the real module-load message, DRAINING
          // each request fully first: an OpInvoke arrives with a large
          // Arrow frame, and exiting before consuming it would EPIPE the
          // parent's buffered write, masking this error with a generic
          // "guest process died"
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          var op = readOp(in)
          while (op >= 0) {
            try {
              if (op == OpInvoke) {
                in.readUTF()
                var left = in.readInt()
                // drain by READING: skip() on a pipe-backed stream seeks and
                // throws ESPIPE once the buffer is exhausted
                val scratch = new Array[Byte](64 * 1024)
                while (left > 0) {
                  val r = in.read(scratch, 0, math.min(left, scratch.length))
                  if (r < 0) return
                  left -= r
                }
              }
            } catch { case _: IOException => return }
            proto.writeByte(StGuestError)
            proto.writeUTF(msg)
            proto.flush()
            op = readOp(in)
          }
          return
      }

    var op = readOp(in)
    while (op >= 0) {
      op match {
        case OpList =>
          proto.writeByte(StOk)
          val names = module.functions.keys.toSeq.sorted
          proto.writeInt(names.length)
          names.foreach(proto.writeUTF)
        case OpInvoke =>
          val fnName = in.readUTF()
          val bytes = new Array[Byte](in.readInt())
          in.readFully(bytes)
          try {
            val fn = module.functions.getOrElse(fnName,
              throw FunctionError(s"function '$fnName' not found in module '$modulePath'"))
            val (cols, n) = ArrowBatchCodec.decode(bytes)
            val out = fn.applyBatch(cols, n)
            val resp = ArrowBatchCodec.encode(IndexedSeq(out.asInstanceOf[Array[Any]]), out.length)
            proto.writeByte(StOk)
            proto.writeInt(resp.length)
            proto.write(resp)
          } catch {
            case FunctionError(msg) =>
              proto.writeByte(StGuestError); proto.writeUTF(msg)
            case e: Throwable =>
              proto.writeByte(StPanic)
              proto.writeUTF(Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        case other =>
          proto.writeByte(StPanic); proto.writeUTF(s"bad opcode: $other")
      }
      proto.flush()
      op = readOp(in)
    }
  }

  /** -1 on clean EOF (parent closed stdin / died) → guest exits. */
  private def readOp(in: DataInputStream): Int =
    try in.readUnsignedByte()
    catch { case _: IOException => -1 }
}
