package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Checkpoint, Skew}

class CheckpointSpec extends AnyFunSuite with SparkSpec {

  test("stage computes once, resumes on re-run, recomputes on fingerprint change") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    var computes = 0
    def compute = { computes += 1; (1 to 100).toDF("v") }
    val fp1 = Checkpoint.fingerprint("inputs-v1", "op-v1")

    val s1 = Checkpoint.stage(spark, root, "stage_a", fp1)(compute)
    assert(!s1.resumed && computes === 1)
    assert(s1.df.count() === 100)

    val s2 = Checkpoint.stage(spark, root, "stage_a", fp1)(compute)
    assert(s2.resumed && computes === 1) // resumed, no recompute
    assert(s2.df.count() === 100)

    val fp2 = Checkpoint.fingerprint("inputs-v1", "op-v2")
    val s3 = Checkpoint.stage(spark, root, "stage_a", fp2)(compute)
    assert(!s3.resumed && computes === 2) // fingerprint changed -> recompute
  }

  test("lineage + metrics tables written per stage") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    val fp = Checkpoint.fingerprint("x")
    Checkpoint.stage(spark, root, "s", fp)((1 to 1000).toDF("v").repartition(4))
    val lineage = spark.read.parquet(s"$root/s__lineage")
    assert(lineage.columns.toSeq === Seq("partition_id", "n_rows"))
    assert(lineage.agg(sum(col("n_rows"))).collect()(0).getLong(0) === 1000L)
    val metrics = spark.read.parquet(s"$root/s__metrics")
    val m = metrics.collect()(0)
    assert(m.getAs[Long]("n_rows") === 1000L)
    assert(m.getAs[String]("fingerprint") === fp)
  }
}

class SkewSpec extends AnyFunSuite with SparkSpec {

  test("north pipeline kill-resume: completed stage reused from snapshot (compute NOT re-run), lost stage recomputed") {
    import graft.functions._
    import graft.operators.SpatialJoin
    import graft.sources.{Fixtures, Pages}
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_e2e").toString
    val pages = Pages.withIdPoint(Pages.fromDocuments(spark, sf("")), "doc_id")
    def stage1 = SpatialJoin.assign(pages, col("lon"), col("lat"), Fixtures.Polys)
      .withColumn("cell", cell_encode(col("lon"), col("lat"), 12))
      .select("doc_id", "poly_id", "cell")
    def stage2(in: org.apache.spark.sql.DataFrame) =
      in.groupBy("poly_id").agg(count(lit(1)).as("n"))
    val fp1 = Checkpoint.fingerprint("assign", sf(""), "v1")
    val fp2 = Checkpoint.fingerprint("rollup", fp1, "v1")

    val s1 = Checkpoint.stage(spark, root, "assign", fp1)(stage1)
    val s2 = Checkpoint.stage(spark, root, "rollup", fp2)(stage2(s1.df))
    assert(!s1.resumed && !s2.resumed)
    val expected = s2.df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // simulated crash between the stages: the rollup snapshot is lost
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rm(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(java.nio.file.Paths.get(root, "rollup"))

    // stage 1 must resume from its snapshot WITHOUT invoking compute
    val s1b = Checkpoint.stage(spark, root, "assign", fp1)(
      fail("resume must not recompute a completed stage"))
    assert(s1b.resumed)
    val s2b = Checkpoint.stage(spark, root, "rollup", fp2)(stage2(s1b.df))
    assert(!s2b.resumed)
    assert(s2b.df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap === expected)
  }

  test("saltJoin matches plain join exactly while spreading hot keys") {
    import spark.implicits._
    // hot key 1 (10k rows), cold keys
    val big = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
      .union(spark.range(100).select((col("id") + 10L).as("k"), col("id").as("v")))
    val small = Seq((1L, "hot"), (11L, "cold"), (12L, "cold2")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum(col("v"))).collect()(0)
    val salted = Skew.saltJoin(big, small, Seq("k"), spread = col("v"), salts = 8)
      .agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(plain === salted)
  }

  test("salt spreads a hot key over all buckets") {
    import spark.implicits._
    val df = spark.range(10000).select(Skew.salt(col("id"), 8).as("s"))
    val buckets = df.groupBy("s").count().collect()
    assert(buckets.length === 8)
    assert(buckets.map(_.getLong(1)).min > 500) // roughly even
  }
}
