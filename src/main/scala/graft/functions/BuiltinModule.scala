package graft.functions

/** The demo function module — parity with the reference's example guest
  * crate (wasm_function/src/lib.rs:16-62): `f1` = element-wise pow with
  * null-in→null-out, plus the two error-path demos and the panic demo.
  */
class BuiltinModule extends FunctionModule {

  override def functions: Map[String, ScalarBatchFunction] = Map(
    // wasm_function/src/lib.rs:26-53 — pow over two DOUBLE columns,
    // NULL if either side NULL (lib.rs:43-46)
    "pow" -> { args =>
      (args(0), args(1)) match {
        case (a: java.lang.Double, b: java.lang.Double) =>
          java.lang.Double.valueOf(math.pow(a, b))
        case _ => null
      }
    },
    // wasm_function/src/lib.rs:55-57 — guest returns Err(String)
    "f_return_error" -> { _ =>
      throw FunctionError("wasm function returned error")
    },
    // wasm_function/src/lib.rs:60-62 — guest returns an engine-level error
    "f_return_arrow_error" -> { _ =>
      throw FunctionError("Divide by zero error")
    },
    // wasm_function/src/lib.rs (f_panic, test lib.rs:265-308) — a trap
    "f_panic" -> { _ =>
      throw new IllegalStateException("unreachable")
    }
  )
}
