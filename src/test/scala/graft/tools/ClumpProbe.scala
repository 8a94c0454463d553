package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for the q96 clump path. */
object ClumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("clumpprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.StackQueries.G
    import graft.sources.RasterStack
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CLUMPPROBE $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm up like Bench
    graft.SparkEntry.entry(spark).count()
    graft.plans.Caches.flush()

    val av = graft.operators.Clump.avalanche31(col("row") * G.width.toLong + col("col"))
    val px = RasterStack.grid(spark, G).withColumn("cat", av % lit(4L))
    t("grid count") { println(s"  rows=${px.count()}") }

    val hOrd = Window.partitionBy("row").orderBy("col")
    val vOrd = Window.partitionBy("col").orderBy("row")
    val hw = hOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevOk = lag(col("cat"), 1).over(hOrd) === col("cat") &&
      lag(col("col"), 1).over(hOrd) === col("col") - 1L
    val base = graft.plans.Caches.track(px
      .withColumn("__id", col("row") * G.width.toLong + col("col"))
      .withColumn("__run",
        max(when(!coalesce(prevOk, lit(false)), col("__id"))).over(hw)))
    t("base materialize (run-length window)") { println(s"  rows=${base.count()}") }
    val e = base
      .withColumn("__prun", lag(col("__run"), 1).over(vOrd))
      .withColumn("__pcat", lag(col("cat"), 1).over(vOrd))
      .withColumn("__prow", lag(col("row"), 1).over(vOrd))
      .where(col("__pcat") === col("cat") &&
        col("__prow") === col("row") - 1L &&
        col("__prun") =!= col("__run"))
      .select(col("__prun").as("id_a"), col("__run").as("id_b"))
    t("edges count") { println(s"  edges=${e.count()}") }
    val comp = t("components") {
      val c = graft.operators.Dedup.components(e, "id_a", "id_b")
      println(s"  comp rows=${c.count()}"); c
    }
    t("final join + count") {
      val out = base.join(comp.withColumnRenamed("id", "__run"), Seq("__run"), "left")
        .withColumn("component", coalesce(col("component"), col("__run")))
      println(s"  out=${out.count()}")
    }
    graft.plans.Caches.flush()
    t("full clump end-to-end (2nd pass, warm)") {
      val full = graft.operators.Clump.clump(px, "cat", G)
      println(s"  out=${full.count()}")
    }
    spark.stop()
  }
}
