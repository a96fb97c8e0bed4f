package graft.functions

/** The demo function module — parity with the reference's example guest
  * crate (wasm_function/src/lib.rs:16-62): `f1` = element-wise pow with
  * null-in→null-out, plus the two error-path demos and the panic demo.
  */
class BuiltinModule extends FunctionModule {

  override def functions: Map[String, ScalarBatchFunction] = Map(
    // wasm_function/src/lib.rs:26-53 — pow over two DOUBLE columns,
    // NULL if either side NULL (lib.rs:43-46). Overrides the batch entry
    // point to process whole columns, exactly the guest's
    // `fn(&[ArrayRef]) -> ArrayRef` shape.
    "pow" -> new ScalarBatchFunction {
      private def one(a: Any, b: Any): Any = (a, b) match {
        case (x: java.lang.Double, y: java.lang.Double) =>
          java.lang.Double.valueOf(math.pow(x, y))
        case _ => null
      }
      override def apply(args: Seq[Any]): Any = one(args(0), args(1))
      override def applyBatch(cols: IndexedSeq[Array[Any]], n: Int): Array[Any] = {
        val (base, exp) = (cols(0), cols(1))
        Array.tabulate(n)(i => one(base(i), exp(i)))
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
