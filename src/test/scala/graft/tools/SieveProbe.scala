package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for the q114 sieveFixpoint path. */
object SieveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("sieveprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.StackQueries.G
    import graft.sources.RasterStack
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SIEVEPROBE $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.SparkEntry.entry(spark).count()
    graft.plans.Caches.flush()

    val av = graft.operators.Clump.avalanche31(
      col("row") * G.width.toLong + col("col"))
    val px = RasterStack.grid(spark, G).withColumn("cat",
      when(av % lit(89L) === 0L, lit(null)).otherwise(av % lit(4L)))
    // warm pass so JIT/codegen is paid once (bench-session conditions)
    t("clump warm") {
      println("  " + graft.operators.Clump.clump(px, "cat", G).count())
    }
    graft.plans.Caches.flush()
    val labeled = t("clump materialize") {
      val l = graft.plans.Caches.track(graft.operators.Clump.clump(px, "cat", G))
      println("  " + l.count()); l
    }
    val sieved = t("sieveFixpoint build (reg0+edges0+probe+kernel)") {
      graft.operators.Clump.sieveFixpoint(labeled, "cat", minPix = 6, rounds = 3)
    }
    t("final count") { println("  " + sieved.count()) }
    t("second count (all persisted)") { println("  " + sieved.count()) }
    graft.plans.Caches.flush()
    spark.stop()
  }
}
