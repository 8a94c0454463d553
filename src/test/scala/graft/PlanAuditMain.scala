package graft

import org.apache.spark.sql.functions._

/** Ad-hoc plan printer for the round's new operators (not a test). */
object PlanAuditMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Window") || l.contains("Generate") || l.contains("Aggregate"))
        .map(_.take(150)).mkString("\n"))
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pages = graft.sources.Pages.withIdPoint(
      graft.sources.Pages.fromDocuments(spark, "/root/testdata/sf0.001"), "doc_id")
    // round-4 rewrites: every top-k should be ObjectHashAggregate, no Window
    show("kNN join (top_k agg)", graft.operators.KNN.join(
      pages.select(col("doc_id").as("pid"), col("lon").as("plon"), col("lat").as("plat")),
      "pid", "plon", "plat",
      pages.where(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("tid"), col("lon").as("tlon"), col("lat").as("tlat")),
      "tlon", "tlat", "tid", 5, 4))
    show("ann lsh (top_k agg + native kernels)", graft.operators.Similarity.lshTopK(
      vecs, "vec_id", "embedding", col("vec_id") % 25 === 0, 10, 4, 64, 3))
    show("sampleStrata (one agg)", graft.queries.StackQueries.stack(spark)
      .sampleStrata(graft.sources.RasterStack.strata(spark, graft.core.GridMeta.TestGrid), 20, 11))
    show("jaccard (MinHashSig + shingle-id verify)", graft.operators.Dedup.jaccardPairs(
      docs.select("doc_id", "text"), "doc_id", "text", threshold = 0.4))
    show("pip rings (native ray cast)", {
      import spark.implicits._
      val polys = Seq((1, Seq(Seq(-60.0, 40.0, 40.0, -60.0)), Seq(Seq(-40.0, -40.0, 40.0, 40.0))))
        .toDF("poly_id", "xss", "yss")
      graft.operators.SpatialJoin.pipJoinTableRings(pages, "lon", "lat", polys, "poly_id", 4)
    })
    graft.plans.Caches.flush()
    spark.stop()
  }
}
