package graft.tools
/** Scratch: force the distributed accumulation paths on the sf0.1 DEM
  * and print round counts (GRAFT_COMP_DEBUG) + wall seconds. */
object FlowProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("flow-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val g = graft.core.GridMeta.TestGrid
    val px = graft.sources.RasterStack.stack(spark, g).select("row", "col", "b1")
    for (scheme <- Seq("doubling", "wave")) {
      val t0 = System.nanoTime()
      val n = graft.operators.Flow.accumulation(px, "b1", g,
        localCells = 0L, scheme = scheme).count()
      println(f"FLOW_PROBE $scheme rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      graft.plans.Caches.flush()
    }
    spark.stop()
  }
}
