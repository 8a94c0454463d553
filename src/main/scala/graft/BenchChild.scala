package graft

/** One pipeline timing in an ISOLATED JVM (spawned by Bench): args =
  * cores, pagesPath. Prints "CHILD_SECS <t>" for the parent to parse. */
object BenchChild {
  def main(args: Array[String]): Unit = {
    val cp = args(0).toInt
    val path = args(1)
    val s = Bench.session(cp)
    try {
      Bench.pipeline(s, path) // warm-up
      val t0 = System.nanoTime()
      Bench.pipeline(s, path)
      println(f"CHILD_SECS ${(System.nanoTime() - t0) / 1e9}%.6f")
    } finally s.stop()
  }
}
