package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test scope, not shipped): per-phase timing of q63's
  * filterPointsDist pipeline — edges build vs components loop. */
object CompBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .appName("comp-bench")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count(); graft.plans.Caches.flush()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pages = graft.sources.Pages.withIdPoint(
      graft.sources.Pages.fromDocuments(spark, dir), "doc_id")
    val minDist = 5.0
    val res = math.max(0, math.min(28,
      (math.log(180.0 / minDist) / math.log(2.0)).floor.toInt))
    val pts = pages.select(col("doc_id").cast("long").as("id"),
      col("lon").as("__lon"), col("lat").as("__lat"))
    val probes = pts
      .withColumn("__cell", graft.functions.cell_encode(col("__lon"), col("__lat"), res))
      .withColumn("cellkey", explode(array_distinct(graft.functions.cell_disk(col("__cell"), 1))))
      .select(col("cellkey"), col("id").as("id_a"),
        col("__lon").as("__lon_a"), col("__lat").as("__lat_a"))
    val targets = pts
      .select(graft.functions.cell_encode(col("__lon"), col("__lat"), res).as("cellkey"),
        col("id").as("id_b"), col("__lon").as("__lon_b"), col("__lat").as("__lat_b"))
    val dx = col("__lon_a") - col("__lon_b")
    val dy = col("__lat_a") - col("__lat_b")
    val edges = probes.join(targets, Seq("cellkey"))
      .where(col("id_a") < col("id_b") && dx * dx + dy * dy < lit(minDist * minDist))
      .select("id_a", "id_b").distinct()
    val n = t("edges-build-count") { edges.count() }
    println(s"edges rows=$n")
    val comp = t("components-total") {
      val c = graft.operators.Dedup.components(edges, "id_a", "id_b")
      c.count(); c
    }
    t("final-agg") {
      val labeled = pts.join(comp, Seq("id"), "left_outer")
        .withColumn("component", coalesce(col("component"), col("id")))
      println("clusters=" + labeled.groupBy(col("component"))
        .agg(min(col("id"))).count())
    }
    spark.stop()
  }
}
