package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for the sieveFixpoint loop (q114). */
object SieveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .appName("sieveprobe").getOrCreate()
    import graft.queries.StackQueries.G
    import graft.sources.RasterStack
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val av = graft.operators.Clump.avalanche31(col("row") * G.width.toLong + col("col"))
    val px = RasterStack.grid(spark, G).withColumn("cat",
      when(av % lit(89L) === 0L, lit(null)).otherwise(av % lit(4L)))
    val labeled = t("clump") {
      val l = graft.operators.Clump.clump(px, "cat", G)
      println(s"labeled rows=${l.count()}")
      l
    }
    val out = t("sieveFixpoint build+run") {
      val o = graft.operators.Clump.sieveFixpoint(labeled, "cat", minPix = 6, rounds = 3)
      println(s"out rows=${o.count()}")
      o
    }
    t("final collect sample") { println(out.limit(5).collect().length) }
    spark.stop()
  }
}
