package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Polygon, PolygonSet}
import graft.operators.{Points, StackIO}
import graft.queries.StackQueries

class IOSpec extends AnyFunSuite with SparkSpec {

  lazy val st = StackQueries.stack(spark).select(Seq("b1", "b2"))

  test("write/read round-trip: nodata sentinel materializes and re-masks (tests/test_write.py analogue)") {
    val path = java.nio.file.Files.createTempDirectory("graft_write").toString + "/stack"
    StackIO.write(st, path, dtype = "int")
    val back = StackIO.read(spark, path, st.meta, st.layers, StackIO.nodataFor("int"))
    // identical valid counts and values after round trip
    val before = st.df.agg(count(col("b1")), sum(col("b1")), count(col("b2"))).collect()(0)
    val after = back.df.agg(count(col("b1")), sum(col("b1")), count(col("b2"))).collect()(0)
    assert(before === after)
    // layout is tile-partitioned (partition pruning surface)
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("tile=")))
  }

  test("bucketed layout: append join of two bucketed stacks plans with ZERO Exchange") {
    val G = StackQueries.G
    val full = StackQueries.stack(spark)
    val a = full.select(Seq("b1", "b2"))
    val b = full.select(Seq("b4", "b7"))
    StackIO.writeBucketed(a, "graft_bucket_a", buckets = 8)
    StackIO.writeBucketed(b, "graft_bucket_b", buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
      val ra = StackIO.readBucketed(spark, "graft_bucket_a", G, a.layers)
      val rb = StackIO.readBucketed(spark, "graft_bucket_b", G, b.layers)
      val joined = ra.append(rb)
      val plan = joined.df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(600))
      assert(joined.df.count() === G.cells)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("IVF corpus bucketed by list id: probe join plans with NO corpus-side Exchange") {
    import org.apache.spark.sql.functions.{array_min, array_position, expr}
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = vecs
      .withColumn("__sc", graft.operators.Similarity.ivfScores(col("embedding"), 16, 64))
      .withColumn("cell", expr("array_position(__sc, array_min(__sc))"))
      .select("cell", "vec_id", "embedding")
    corpus.write.mode("overwrite").format("parquet")
      .bucketBy(8, "cell").sortBy("cell").saveAsTable("graft_ivf_corpus")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val stored = spark.table("graft_ivf_corpus")
      val probes = vecs.where(col("vec_id") % 25 === 0)
        .withColumn("__sc", graft.operators.Similarity.ivfScores(col("embedding"), 16, 64))
        .withColumn("cell", expr("array_position(__sc, array_min(__sc))"))
        .select(col("cell"), col("vec_id").as("query_id"))
      val joined = probes.join(stored, Seq("cell"))
      val plan = joined.queryExecution.executedPlan.toString
      // exactly ONE Exchange (the probe side); the bucketed corpus side
      // is already hash-distributed on its list id and must not shuffle
      assert(plan.contains("graft_ivf_corpus"))
      assert(plan.linesIterator.count(_.contains("Exchange")) === 1, plan.take(900))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_ivf_corpus")
    }
  }

  test("head/tail windows (raster.py:625-635)") {
    assert(StackIO.head(st).count() === 200)
    assert(StackIO.tail(st).count() === 200)
    val h = StackIO.head(st).select("row", "col").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h.head === ((0L, 0L)))
    assert(h.forall { case (r, c) => r < 10 && c < 20 })
  }

  test("toLocal caps at maxPixels via strided decimation (raster.py:2104-2160)") {
    val rows = StackIO.toLocal(st, maxPixels = 5000)
    assert(rows.length <= 5000 && rows.length > 1000)
  }

  test("random point in polygon: deterministic, contained (vector.py:42-61)") {
    val p = Polygon(0, Array((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (5.0, 5.0), (0.0, 10.0)))
    val (x, y) = Points.randomPointInPolygon(p, seed = 42)
    assert(p.contains(x, y))
    assert(Points.randomPointInPolygon(p, 42) === ((x, y)))
    assert(Points.randomPointInPolygon(p, 43) !== ((x, y)))
  }

  test("filter_points exact: complete-linkage semantics (vector.py:7-39)") {
    // two tight clusters + one loner
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.1, 0.0), (3L, 0.0, 0.1), // cluster A
      (10L, 5.0, 5.0), (11L, 5.1, 5.0),               // cluster B
      (20L, 9.0, 9.0))                                 // loner
    val keptFirst = Points.filterPointsExact(pts, minDist = 0.5, keep = "first")
    assert(keptFirst.sorted === Seq(1L, 10L, 20L))
    val keptLast = Points.filterPointsExact(pts, minDist = 0.5, keep = "last")
    assert(keptLast.sorted === Seq(3L, 11L, 20L))
    // complete linkage: chain 0 -.4- .4 -.4- .8: max pairwise 0.8 > 0.5 -> NOT merged into one
    val chain = Seq((1L, 0.0, 0.0), (2L, 0.4, 0.0), (3L, 0.8, 0.0))
    assert(Points.filterPointsExact(chain, minDist = 0.5).size === 2)
  }

  test("filter_points distributed: equals the exact path on sparse layouts, links chains (documented divergence)") {
    import spark.implicits._
    // sparse: cluster diameters < minDist, gaps > minDist -> single
    // linkage == complete linkage == the reference semantics
    val sparse = Seq((1L, 0.0, 0.0), (3L, 0.3, 0.1), (2L, 0.2, 0.2),
      (10L, 5.0, 5.0), (11L, 5.1, 5.2), (20L, -8.0, 3.0))
    val exact = Points.filterPointsExact(sparse, minDist = 0.5, keep = "first")
    val dist = Points.filterPointsDist(sparse.toDF("id", "lon", "lat"),
        "id", "lon", "lat", minDist = 0.5)
      .collect().map(_.getLong(0)).toSeq
    assert(dist.sorted === exact.sorted)
    // keep = "last" mirrors the reference's keep parameter
    val distLast = Points.filterPointsDist(sparse.toDF("id", "lon", "lat"),
        "id", "lon", "lat", minDist = 0.5, keep = "last")
      .collect().map(_.getLong(0)).toSeq
    assert(distLast.sorted === Points.filterPointsExact(sparse, 0.5, "last").sorted)
    // dense chain: single linkage merges transitively (1 survivor),
    // complete linkage keeps 2 — the documented divergence direction
    val chain = Seq((1L, 0.0, 0.0), (2L, 0.4, 0.0), (3L, 0.8, 0.0))
    val chainGot = Points.filterPointsDist(chain.toDF("id", "lon", "lat"),
      "id", "lon", "lat", minDist = 0.5).collect()
    assert(chainGot.map(_.getLong(0)).toSeq === Seq(1L))
    assert(chainGot.head.getLong(1) === 3L) // n_points carries cluster size
    assert(Points.filterPointsExact(chain, minDist = 0.5).size === 2)
    // cross-cell-boundary pairs are found (the cell-snap path's miss case)
    val border = Seq((1L, -0.01, 0.0), (2L, 0.01, 0.0), (3L, 40.0, 40.0))
    val borderKeep = Points.filterPointsDist(border.toDF("id", "lon", "lat"),
      "id", "lon", "lat", minDist = 0.5).collect().map(_.getLong(0)).sorted
    assert(borderKeep === Array(1L, 3L))
    // skew audit: a cell stuffed past the threshold is reported
    val hot = (0L until 50L).map(i => (i, 10.0 + i * 1e-6, 10.0)) :+ (99L, -100.0, -40.0)
    val audited = Points.hotCells(hot.toDF("id", "lon", "lat"),
      "id", "lon", "lat", minDist = 0.5, threshold = 10L).collect()
    assert(audited.length === 1 && audited.head.getLong(1) === 50L)
  }

  test("filter_points cell-snap keeps min id per cell, never two points in one cell") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 10.0), (2L, 10.001, 10.001), (3L, 50.0, -20.0))
      .toDF("id", "lon", "lat")
    val kept = Points.filterPointsCellSnap(df, "id", "lon", "lat", minDistDeg = 0.1)
      .collect().map(r => r.getLong(1)).sorted
    assert(kept === Array(1L, 3L))
  }
}
