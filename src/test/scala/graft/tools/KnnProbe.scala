package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for the kNN starting-resolution pick (q21). */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("knnprobe").getOrCreate()
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"KNNPROBE $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pages = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        graft.sources.Pages.lonSql("doc_id") + " AS lon",
        graft.sources.Pages.latSql("doc_id") + " AS lat")
    val probes = pages.select(col("doc_id").as("pid"), col("lon").as("plon"), col("lat").as("plat"))
    val train = pages.where(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("tid"), col("lon").as("tlon"), col("lat").as("tlat"),
        (col("doc_id") % 23L).cast("double").as("y"))
    println(s"KNNPROBE train n=${train.count()}")
    val auto = t("autoRes")(graft.operators.KNN.autoRes(train, "tlon", "tlat"))
    println(s"KNNPROBE autoRes=$auto")
    for (thr <- Seq("128", "128", "100000000", "100000000", "128")) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      t(s"join res=$auto thr=$thr") {
        val out = graft.operators.KNN.join(probes, "pid", "plon", "plat",
          train, "tlon", "tlat", "tid", 5, auto)
        println(s"  rows=${out.count()}")
      }
      graft.plans.Caches.flush()
    }
    spark.stop()
  }
}
