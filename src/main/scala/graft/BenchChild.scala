package graft

/** One pipeline timing in an ISOLATED JVM (spawned by Bench): args =
  * cores, pagesPath. Prints "CHILD_SECS <t>" for the parent to parse.
  *
  * An optional third arg sets the timed rep count; the child reports
  * the MIN over reps. The parent asks for two reps on FULL high-level
  * samples only: contention on this host flaps on a seconds scale and
  * only ever INFLATES the high side (no turbo headroom with all cores
  * busy), so per-sample min-of-two halves each sample's flap exposure —
  * the same one-sided-noise rationale as the parent's min-over-samples
  * estimator. Lows (symmetric noise, median-handled) and gate minis
  * (cost-sensitive) stay single-rep.
  */
object BenchChild {
  def main(args: Array[String]): Unit = {
    val cp = args(0).toInt
    val path = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val s = Bench.session(cp)
    try {
      Bench.pipeline(s, path) // warm-up (codegen, parquet footer cache)
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.pipeline(s, path)
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"CHILD_SECS $t%.6f")
    } finally s.stop()
  }
}
