package graft.functions

/** Dev probe (r19): branch-web analysis of the artifact's one former
  * emit-bailout function — reports forward/backward edge counts and the
  * least-crossed cut positions the method splitter would pick. Usage:
  * sbt "Test/runMain graft.functions.CutProbe"
  */
object CutProbe {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/wasm_function.wasm"))
    val m = WasmModule.parse(bytes)
    val f = m.funcs(142)
    val n = f.ops.length
    val edges = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < n) {
      f.ops(i) match {
        case 0x0C | 0x0D =>
          edges += ((i, (f.argL(i) & 0xFFFFFFFFL).toInt + 1))
        case 0x0E =>
          f.brTables(f.argM(i)).foreach(t =>
            edges += ((i, (t & 0xFFFFFFFFL).toInt + 1)))
        case _ => ()
      }
      i += 1
    }
    // crossing edges at p: src < p && dst > p (forward only)
    def crossing(p: Int) = edges.count { case (s, d) => s < p && d > p }
    // find min-crossing positions near thirds
    for (center <- Seq(n / 3, 2 * n / 3)) {
      var best = -1; var bestC = Int.MaxValue
      for (p <- (center - 1000) to (center + 1000)) {
        val c = crossing(p)
        if (c < bestC) { bestC = c; best = p }
      }
      println(s"near $center: best cut $best with $bestC crossing edges")
      // also report target heights of crossing edges
      val hs = edges.filter { case (s, d) => s < best && d > best }
        .map { case (s, d) =>
          val t = f.ops.indices // heights not accessible; skip
          d
        }
      println(s"  crossing targets distinct: ${hs.distinct.length}")
    }
    // how many distinct TARGETS total (entries needed per chunk)
    println(s"distinct branch targets: ${edges.map(_._2).distinct.length}")
  }
}
