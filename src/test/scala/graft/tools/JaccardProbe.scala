package graft.tools

import org.apache.spark.sql.functions._

/** Scratch (test scope): phase timing of the q33 jaccard pipeline. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.SparkSpec.session
    graft.SparkEntry.entry(spark).count(); graft.plans.Caches.flush()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val corpus = d.unionByName(d.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" graft dup marker"))))
    t("reps-count") {
      println(graft.operators.Dedup.representatives(corpus, "doc_id", "text").count())
    }
    t("projection-materialize") {
      val proj = graft.operators.Dedup.representatives(corpus, "doc_id", "text")
        .select(col("id"), graft.operators.Dedup.shingleIdsCol(col("text"), 3).as("sh"),
          graft.operators.Dedup.minhashSignature(col("text"), 3).as("sig")).persist()
      println(proj.count())
      proj.unpersist(false)
    }
    t("full-jaccard") {
      println(graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text",
        w = 3, threshold = 0.4).count())
    }
    graft.plans.Caches.flush()
    t("full-jaccard-2nd") {
      println(graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text",
        w = 3, threshold = 0.4).count())
    }
    graft.plans.Caches.flush()
    spark.stop()
  }
}
