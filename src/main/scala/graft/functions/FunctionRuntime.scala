package graft.functions

/** Pluggable function-runtime SPI — the Spark-native rebuild of the
  * reference's WASM function factory (wasmedge_factory/src/lib.rs:31-65).
  *
  * The reference loads `.wasm` modules into a cached WasmEdge VM and binds
  * `'module!fn'` locators to DataFusion scalar UDFs. No WASM runtime is
  * resolvable offline (see README), so the JVM-native substitution keeps the
  * DDL surface (`CREATE FUNCTION … LANGUAGE WASM AS 'module!fn'`) and the
  * cache/lifecycle semantics but binds `module` to either a registered
  * built-in module or a JVM class implementing [[FunctionModule]].
  */

/** One scalar function inside a module — analog of a guest UDF exported via
  * `export_udf_function!` (reference: wasm_udf/src/lib.rs:51-67). Receives
  * already-evaluated argument values for one row; null handling is the
  * function body's responsibility, matching the reference where nullability
  * is advisory and nulls flow to the UDF (wasm_function/src/lib.rs:43-46).
  */
trait ScalarBatchFunction extends Serializable {
  /** @throws FunctionError for a guest-level error (reference: guest `Err`,
    *         surfaced as "[Wasm Invocation] msg", udf.rs:111-113);
    *         any other exception is a trap/panic
    *         ("[Wasm Invocation Panic] msg", udf.rs:95). */
  def apply(args: Seq[Any]): Any

  /** Batch entry point — the faithful analog of the guest signature
    * `fn(&[ArrayRef]) -> Result<ArrayRef, E>` (wasm_function/src/lib.rs:26):
    * whole argument columns in, one result column out, ONE call per input
    * batch (engine side: udf.rs:82-115, one IPC round-trip per batch).
    * Default falls back to row-wise [[apply]]; column-oriented modules
    * override it to process vectors directly.
    */
  def applyBatch(cols: IndexedSeq[Array[Any]], n: Int): Array[Any] =
    Array.tabulate(n)(i => apply(cols.map(_(i))))
}

/** Guest-level error — maps to the reference's `Err(String)` return. */
final case class FunctionError(msg: String) extends RuntimeException(msg)

/** A named collection of functions — the analog of one `.wasm` file.
  * JVM classes implementing this trait (with a no-arg constructor) can be
  * loaded by fully-qualified class name, the way the reference loads a
  * module from a filesystem path (wasmedge_factory/src/lib.rs:111-132).
  */
trait FunctionModule extends Serializable {
  def functions: Map[String, ScalarBatchFunction]
}

/** Refcounted per-path module cache — the reference keeps one VM per module
  * path in a weak-valued map so the VM is freed when the last UDF using it
  * is dropped (wasmedge_factory/src/lib.rs:20,79-100, proven lib.rs:344-372).
  * JVM GC makes weak values awkward to test deterministically, so this uses
  * explicit refcounts decremented by `DROP FUNCTION`, with identical
  * observable lifecycle (cache size 1 while two functions share a module,
  * 0 after both are dropped).
  */
object ModuleRegistry {
  private final class Entry(val module: FunctionModule, var refs: Int)

  private val cache = new java.util.HashMap[String, Entry]()
  /** Named module factories (the "project root" lookup analog, lib.rs:113-121). */
  private val loaders = new java.util.HashMap[String, () => FunctionModule]()

  registerLoader("builtin", () => new BuiltinModule)

  def registerLoader(name: String, loader: () => FunctionModule): Unit =
    synchronized { loaders.put(name, loader) }

  /** Split a `'module!method'` locator, rejecting empty parts — semantics of
    * the reference's `wasm_module_function` (lib.rs:102-109, test lib.rs:172).
    */
  def parseLocator(locator: String): (String, String) = {
    val idx = locator.indexOf('!')
    if (idx <= 0 || idx == locator.length - 1)
      throw new IllegalArgumentException(
        s"function locator should be 'module!method', got: '$locator'")
    (locator.substring(0, idx), locator.substring(idx + 1))
  }

  /** Load (or ref) a module by path: a `proc:` scheme spawning an
    * out-of-process guest (the sandboxed-execution analog, see
    * [[ProcessFunctionModule]]), a registered loader name, else a JVM
    * class name implementing [[FunctionModule]].
    */
  def acquire(path: String): FunctionModule = synchronized {
    val e = cache.get(path)
    if (e != null) { e.refs += 1; e.module }
    else {
      val module =
        if (path.startsWith("proc:"))
          new ProcessFunctionModule(path.stripPrefix("proc:"))
        else if (path.endsWith(".wasm"))
          // a real .wasm artifact, run by the from-scratch interpreter —
          // the reference's own module-path load (lib.rs:111-132)
          new WasmFunctionModule(path)
        else if (loaders.containsKey(path)) loaders.get(path)()
        else {
          val cls =
            try Class.forName(path)
            catch {
              case _: ClassNotFoundException =>
                throw new IllegalArgumentException(s"module not found: '$path'")
            }
          if (!classOf[FunctionModule].isAssignableFrom(cls))
            throw new IllegalArgumentException(
              s"module class '$path' does not implement graft.functions.FunctionModule")
          cls.getDeclaredConstructor().newInstance().asInstanceOf[FunctionModule]
        }
      cache.put(path, new Entry(module, 1))
      module
    }
  }

  /** Release one reference; evict at zero (DROP FUNCTION teardown,
    * reference lifecycle lib.rs:344-372 / udf.rs:118-122). */
  def release(path: String): Unit = synchronized {
    val e = cache.get(path)
    if (e != null) {
      e.refs -= 1
      if (e.refs <= 0) {
        cache.remove(path)
        // free the VM at refcount zero (lib.rs:359-372); for proc: modules
        // this kills the guest subprocess
        e.module match {
          case c: AutoCloseable => c.close()
          case _ => ()
        }
      }
    }
  }

  /** Number of cached modules — exposed for lifecycle tests, matching the
    * reference's cache-size assertions (lib.rs:344-345,359-372). */
  def cachedModuleCount: Int = synchronized { cache.size }
}
