package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for the bench sf1 section's three shapes. */
object Sf1Probe {
  def main(args: Array[String]): Unit = {
    val s0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .appName("sf1probe").getOrCreate()
    s0.sparkContext.setLogLevel("WARN")
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SF1PROBE $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val bigG = graft.core.GridMeta.northUp(-120.0, -60.0, 120.0, 60.0,
      width = 1546, height = 1401)
    time("clump 2.166M px") {
      val av = graft.operators.Clump.avalanche31(
        col("row") * bigG.width.toLong + col("col"))
      val px = graft.sources.RasterStack.grid(s0, bigG)
        .withColumn("cat", av % lit(4L))
      println(s"  rows=${graft.operators.Clump.clump(px, "cat", bigG).count()}")
    }
    graft.plans.Caches.flush()
    val docsPath = "/tmp/graft_sf1_docs"
    if (!new java.io.File(docsPath + "/_SUCCESS").exists()) {
      val wordCols = (0 until 54).map(i =>
        concat(lit("w"), pmod(col("id") * 53L + lit(i.toLong * 17L), lit(5000L))))
      s0.range(0, 50000, 1, 32).select(col("id").as("doc_id"),
        concat_ws(" ", wordCols: _*).as("text"))
        .write.mode("overwrite").parquet(docsPath)
    }
    time("jaccard 55k docs") {
      val d = s0.read.parquet(docsPath)
      val corpus = d.unionByName(d.where(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
        .withColumn("text", concat(col("text"), lit(" graft dup marker"))))
      println(s"  pairs=${graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text", w = 3, threshold = 0.4).count()}")
    }
    graft.plans.Caches.flush()
    val evPath = "/tmp/graft_sf1_events"
    if (!new java.io.File(evPath + "/_SUCCESS").exists()) {
      s0.range(0, 1000000, 1, 32).select(col("id").as("event_id"),
        timestamp_seconds(lit(1704067200L) +
          pmod(col("id") * 92173L, lit(25920000L))).as("ts"))
        .write.mode("overwrite").parquet(evPath)
    }
    time("corr pairs 1M events") {
      println(s"  pairs=${graft.streaming.StreamTiles.correlatedPairsStream(s0.read.parquet(evPath), "ts", "event_id", res = 3).count()}")
    }
    s0.stop()
  }
}
