package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{CellIndex, Polygon, PolygonSet, StablePoint}
import graft.functions._
import graft.operators.SpatialJoin
import graft.sources.{Fixtures, Pages}

class SpatialJoinSpec extends AnyFunSuite with SparkSpec {

  lazy val pages = Pages.withGrid(Pages.fromDocuments(spark, sf("")), "doc_id", SparkEntry.G).cache()

  test("broadcast R-tree assign matches driver-side scalar evaluation") {
    val got = SpatialJoin.assign(pages, col("lon"), col("lat"), Fixtures.Polys)
      .select("doc_id", "poly_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (id, pid) =>
      val (lon, lat) = (StablePoint.lonFromId(id), StablePoint.latFromId(id))
      assert(pid === Fixtures.Polys.winner(lon, lat), s"doc $id")
    }
    assert(got.values.toSet.size > 2, "fixture should hit several polygons")
  }

  test("cover-cells pipJoin (last-wins) ≡ broadcast R-tree assign — two physical paths, one answer") {
    val a = SpatialJoin.assign(pages, col("lon"), col("lat"), Fixtures.Polys)
      .where(col("poly_id") =!= -1).select("doc_id", "poly_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = SpatialJoin.pipJoinLastWins(pages, "lon", "lat", Fixtures.Polys, SparkEntry.Res, Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
  }

  test("pipJoin with concave polygons matches scalar reference") {
    val tri = Polygon(0, Array((-50.0, -20.0), (10.0, -20.0), (-20.0, 40.0)))
    val concave = Polygon(1, Array((20.0, -30.0), (80.0, -30.0), (80.0, 30.0), (50.0, 0.0), (20.0, 30.0)))
    val set = PolygonSet(IndexedSeq(tri, concave))
    val got = SpatialJoin.pipJoin(pages, "lon", "lat", set, 8)
      .select("doc_id", "poly_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exp = pages.select("doc_id", "lon", "lat").collect().flatMap { r =>
      set.containingIds(r.getDouble(1), r.getDouble(2)).map(pid => (r.getLong(0), pid))
    }.toSet
    assert(got === exp)
    assert(exp.nonEmpty)
  }

  test("pipJoinTable (polygon layer as DATA) ≡ pipJoin, concave shapes included") {
    import spark.implicits._
    val tri = Polygon(0, Array((-50.0, -20.0), (10.0, -20.0), (-20.0, 40.0)))
    val concave = Polygon(1, Array((20.0, -30.0), (80.0, -30.0), (80.0, 30.0), (50.0, 0.0), (20.0, 30.0)))
    val set = PolygonSet(IndexedSeq(tri, concave))
    val polysDf = Seq(tri, concave).map(p =>
      (p.id, p.shell.map(_._1).toSeq, p.shell.map(_._2).toSeq)).toDF("poly_id", "xs", "ys")
    val got = SpatialJoin.pipJoinTable(pages, "lon", "lat", polysDf, "poly_id", 8)
      .select("doc_id", "poly_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exp = SpatialJoin.pipJoin(pages, "lon", "lat", set, 8)
      .select("doc_id", "poly_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("pipJoinTableRings: donut + multipolygon ≡ scalar Polygon.contains with holes") {
    import spark.implicits._
    val donut = Polygon(100,
      Array((-60.0, -40.0), (40.0, -40.0), (40.0, 40.0), (-60.0, 40.0)),
      Array(Array((-20.0, -10.0), (10.0, -10.0), (10.0, 20.0), (-20.0, 20.0))))
    val shellA = Polygon(101, Array((50.0, -30.0), (90.0, -30.0), (90.0, 10.0), (50.0, 10.0)))
    val shellB = Polygon(101, Array((-120.0, 10.0), (-80.0, 10.0), (-80.0, 50.0), (-120.0, 50.0)))
    val polysDf = Seq(
      (100, (Seq(donut.shell.toSeq) ++ donut.holes.map(_.toSeq)).map(_.map(_._1)),
            (Seq(donut.shell.toSeq) ++ donut.holes.map(_.toSeq)).map(_.map(_._2))),
      (101, Seq(shellA.shell.toSeq.map(_._1), shellB.shell.toSeq.map(_._1)),
            Seq(shellA.shell.toSeq.map(_._2), shellB.shell.toSeq.map(_._2))))
      .toDF("poly_id", "xss", "yss")
    val got = SpatialJoin.pipJoinTableRings(pages, "lon", "lat", polysDf, "poly_id", 4)
      .select("doc_id", "poly_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exp = pages.select("doc_id", "lon", "lat").collect().flatMap { r =>
      val (id, x, y) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      Seq(
        if (donut.contains(x, y)) Some((id, 100)) else None,
        if (shellA.contains(x, y) || shellB.contains(x, y)) Some((id, 101)) else None
      ).flatten
    }.toSet
    assert(got === exp)
    // fixture sanity: the hole and the second shell both matter
    assert(exp.exists(_._2 == 100) && exp.exists(_._2 == 101))
  }

  test("GeoJSON source: FeatureCollection of Polygon-with-hole + MultiPolygon -> rings table -> PIP") {
    import spark.implicits._
    val gj =
      """{"type": "FeatureCollection", "features": [
        | {"type": "Feature", "properties": {"id": 100, "name": "donut"},
        |  "geometry": {"type": "Polygon", "coordinates":
        |   [[[-60.0,-40.0],[40.0,-40.0],[40.0,40.0],[-60.0,40.0],[-60.0,-40.0]],
        |    [[-20.0,-10.0],[10.0,-10.0],[10.0,20.0],[-20.0,20.0],[-20.0,-10.0]]]}},
        | {"type": "Feature", "properties": {"id": 101},
        |  "geometry": {"type": "MultiPolygon", "coordinates":
        |   [[[[50.0,-30.0],[90.0,-30.0],[90.0,10.0],[50.0,10.0],[50.0,-30.0]]],
        |    [[[-120.0,10.0],[-80.0,10.0],[-80.0,50.0],[-120.0,50.0],[-120.0,10.0]]]]}},
        | {"type": "Feature", "properties": {},
        |  "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}}
        |]}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_geojson_")
    val file = dir.resolve("layer.geojson")
    java.nio.file.Files.write(file, gj.getBytes("UTF-8"))
    try {
      val polys = graft.sources.GeoJson.readPolygons(spark, file.toString)
      val rows = polys.collect()
      assert(rows.map(_.getInt(0)).sorted === Array(100, 101)) // Point filtered
      assert(rows.find(_.getInt(0) == 100).get.getSeq[Seq[Double]](1).size === 2) // 2 rings
      assert(rows.find(_.getInt(0) == 101).get.getSeq[Seq[Double]](1).size === 2) // 2 shells
      // end-to-end: PIP against probe points, scalar containment oracle
      val probes = Seq((1L, -40.0, 30.0), (2L, -5.0, 5.0), (3L, 70.0, 0.0),
        (4L, -100.0, 30.0), (5L, 170.0, -80.0)).toDF("id", "lon", "lat")
      val got = SpatialJoin.pipJoinTableRings(probes, "lon", "lat", polys, "poly_id", 4)
        .select("id", "poly_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      // probe 1 in the donut shell, 2 in its hole (excluded), 3 in shell A,
      // 4 in shell B, 5 nowhere
      assert(got === Set((1L, 100), (3L, 101), (4L, 101)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("pipJoinTable boundary encoding: full-extent polygon, lon-180/pole probes, no duplicate pairs") {
    import spark.implicits._
    // full-extent rectangle: its bbox cover spans ix 0..n and iy 0..n —
    // wrap/clamp must meet probes whose encoding wraps (lon 180 -> ix 0)
    // or clamps (lat 90 -> iy n-1), and the distinct must keep the
    // duplicated wrap cell from doubling candidate pairs
    val world = Seq((7, Seq(-180.0, 180.0, 180.0, -180.0), Seq(-90.0, -90.0, 90.0, 90.0)))
      .toDF("poly_id", "xs", "ys")
    val probes = Seq((1L, 180.0, 10.0), (2L, -180.0, 10.0), (3L, 0.0, 90.0),
      (4L, 0.0, -90.0), (5L, 25.0, 25.0)).toDF("id", "lon", "lat")
    val rows = SpatialJoin.pipJoinTable(probes, "lon", "lat", world, "poly_id", 3)
      .select("id", "poly_id").collect().map(r => r.getLong(0)).toSeq
    // every probe matched by containment must appear EXACTLY once; the
    // scalar even-odd ray cast is the semantics oracle per probe
    val poly = graft.core.Polygon(7,
      Array((-180.0, -90.0), (180.0, -90.0), (180.0, 90.0), (-180.0, 90.0)))
    val exp = Seq((1L, 180.0, 10.0), (2L, -180.0, 10.0), (3L, 0.0, 90.0),
      (4L, 0.0, -90.0), (5L, 25.0, 25.0))
      .filter { case (_, x, y) => poly.contains(x, y) }.map(_._1)
    assert(rows.sorted === exp.sorted)
    assert(rows.distinct.size === rows.size, s"duplicate candidate pairs: $rows")
    assert(rows.contains(5L))
  }

  test("cell_encode expression ≡ CellIndex.encode (codegen path)") {
    val got = pages.select(col("lon"), col("lat"), cell_encode(col("lon"), col("lat"), 12))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === CellIndex.encode(r.getDouble(0), r.getDouble(1), 12))
    }
  }

  test("url_lon/url_lat expressions ≡ StablePoint.fromUrl") {
    val got = pages.select(col("url"), url_lon(col("url")), url_lat(col("url"))).collect()
    got.foreach { r =>
      val (lon, lat) = StablePoint.fromUrl(r.getString(0))
      assert(r.getDouble(1) === lon && r.getDouble(2) === lat)
    }
  }

  test("cell_disk explode yields gridDisk") {
    val row = pages.select(explode(cell_disk(cell_encode(col("lon"), col("lat"), 10), 1)))
      .limit(9).collect()
    assert(row.length === 9)
  }

  test("flagship entry() returns rows and preserves text bytes through the pipeline") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
    // byte-identity invariant: text md5 unchanged vs raw documents read
    val raw = spark.read.parquet(s"${sf("")}/documents.parquet")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
    val piped = SpatialJoin.assign(
        Pages.withGrid(Pages.fromDocuments(spark, sf("")), "doc_id", SparkEntry.G),
        col("lon"), col("lat"), Fixtures.Polys)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("m2"))
    assert(raw.join(piped, "doc_id").where(col("m") =!= col("m2")).count() === 0)
  }

  test("probeOuterBroadcast: broadcast-only plan (no shuffle join), probe-outer semantics") {
    import graft.operators.{Extract, Stack}
    val st = Stack(graft.sources.RasterStack.stack(spark, SparkEntry.G).drop("x", "y"),
      SparkEntry.G, graft.sources.RasterStack.NcBands.map(_.name))
    // probes: some in-bounds, some out-of-bounds (must survive with null layers)
    val probes = pages.select(col("doc_id"), col("lon"), col("lat"))
    val out = Extract.xy(st, probes, "lon", "lat")
    val expected = Extract.xy(st, probes, "lon", "lat", broadcastProbes = false)
    // identical result to the plain left-outer shuffle join (Row equality
    // handles the null layers an anti-join would mis-compare)
    val cols = (Seq("doc_id", "row", "col") ++ st.layers).map(col)
    assert(out.select(cols: _*).collect().toSet === expected.select(cols: _*).collect().toSet)
    // plan: the pixel side streams through BroadcastHashJoins only —
    // Spark cannot build the preserved side of an outer join, so the
    // round-1 broadcast hint on right_outer silently degraded to shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan.take(800))
  }
}

/**
 * GeoJSON point/line readers + the strict-id contract (ADVICE r4) and
 * the distributed lines-table rasterizer (Extract.linesFrom ≡
 * Extract.lines on the same geometry).
 */
class GeoJsonVectorSpec extends AnyFunSuite with SparkSpec {

  private def write(name: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gj_")
    val f = dir.resolve(name)
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("readLines: LineString + MultiLineString parts, feature ids carried") {
    val gj =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":7},"geometry":{"type":"LineString",
        | "coordinates":[[-10.5,2.25],[14.25,8.5]]}},
        |{"type":"Feature","properties":{"id":9},"geometry":{"type":"MultiLineString",
        | "coordinates":[[[0.5,0.5],[3.5,0.5]],[[5.5,5.5],[5.5,9.5],[7.5,9.5]]]}},
        |{"type":"Feature","properties":{"id":1},"geometry":{"type":"Point","coordinates":[1.0,2.0]}}
        |]}""".stripMargin
    val got = graft.sources.GeoJson.readLines(spark, write("l.geojson", gj)).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1), r.getSeq[Double](2)))
    assert(got.map(_._1).sorted === Array(7, 9, 9)) // MultiLineString -> 2 parts, same id
    val bend = got.filter(_._1 == 9).find(_._2.length == 3).get
    assert(bend._2 === Seq(5.5, 5.5, 7.5) && bend._3 === Seq(5.5, 9.5, 9.5))
  }

  test("linesFrom(table) ≡ lines(driver geometries) on the fixture layer") {
    val g = graft.core.GridMeta.TestGrid
    val st = graft.operators.Stack(
      graft.sources.RasterStack.stack(spark, g).drop("x", "y"), g,
      graft.sources.RasterStack.NcBands.map(_.name))
    val fromFile = graft.operators.Extract.linesFrom(st,
        graft.sources.GeoJson.readLines(spark, Fixtures.linesGeoJsonFile()))
      .select("row", "col", "line_id", "b1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.get(3))).toSet
    val fromDriver = graft.operators.Extract.lines(st, Fixtures.Lines)
      .select("row", "col", "line_id", "b1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.get(3))).toSet
    assert(fromFile === fromDriver)
    assert(fromFile.nonEmpty)
  }

  test("readPoints: Point + MultiPoint, strict ids") {
    val gj =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":3},"geometry":{"type":"Point","coordinates":[1.5,-2.25]}},
        |{"type":"Feature","properties":{"id":4},"geometry":{"type":"MultiPoint","coordinates":[[0.5,0.5],[9.5,3.5]]}}
        |]}""".stripMargin
    val got = graft.sources.GeoJson.readPoints(spark, write("p.geojson", gj)).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got === Set((3, 1.5, -2.25), (4, 0.5, 0.5), (4, 9.5, 3.5)))
  }

  test("strict id contract: a feature missing the id property RAISES; positional mode works") {
    val gj =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":3},"geometry":{"type":"Point","coordinates":[1.5,2.5]}},
        |{"type":"Feature","properties":{"name":"x"},"geometry":{"type":"Point","coordinates":[3.5,4.5]}}
        |]}""".stripMargin
    val path = write("bad.geojson", gj)
    val ex = intercept[Exception] {
      graft.sources.GeoJson.readPoints(spark, path).collect()
    }
    assert(ex.getMessage.contains("missing or non-integer") ||
      Option(ex.getCause).exists(_.getMessage.contains("missing or non-integer")))
    val pos = graft.sources.GeoJson.readPoints(spark, path, idProperty = None).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(pos === Set((0, 1.5), (1, 3.5))) // positional ids
  }
}

/** Distributed rings-table rasterizer ≡ the driver-geometry rasterizer. */
class PolyTableSpec extends AnyFunSuite with SparkSpec {
  test("polyTable(GeoJSON rings) ≡ Rasterize(driver PolygonSet) on the rect layer") {
    val g = graft.core.GridMeta.TestGrid
    val fromFile = graft.operators.Rasterize.polyTable(
        graft.sources.GeoJson.readPolygons(spark, Fixtures.polysGeoJsonFile()), g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fromDriver = graft.operators.Rasterize(spark, Fixtures.Polys, g, allTouched = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fromFile === fromDriver)
    assert(fromFile.nonEmpty)
  }

  test("polyTable: holes subtract (even-odd across rings)") {
    import spark.implicits._
    val g = graft.core.GridMeta.northUp(0.0, 0.0, 10.0, 10.0, width = 20, height = 20)
    // donut: shell 1..9, hole 3..7 (closed rings like GeoJSON)
    val rings = Seq((5,
      Seq(Seq(1.1, 8.9, 8.9, 1.1, 1.1), Seq(3.1, 6.9, 6.9, 3.1, 3.1)),
      Seq(Seq(1.1, 1.1, 8.9, 8.9, 1.1), Seq(3.1, 3.1, 6.9, 6.9, 3.1))))
      .toDF("poly_id", "xss", "yss")
    val cells = graft.operators.Rasterize.polyTable(rings, g, allTouched = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // pixel centers: (row, col) center = (0.5*(col+0.5), 10-0.5*(row+0.5))
    def center(r: Long, c: Long) = (g.x(r, c), g.y(r, c))
    val shellPoly = graft.core.Polygon(5,
      Array((1.1, 1.1), (8.9, 1.1), (8.9, 8.9), (1.1, 8.9)),
      Array(Array((3.1, 3.1), (6.9, 3.1), (6.9, 6.9), (3.1, 6.9))))
    for (r <- 0L until 20L; c <- 0L until 20L) {
      val (x, y) = center(r, c)
      assert(cells.contains((r, c)) === shellPoly.contains(x, y), s"($r,$c) center ($x,$y)")
    }
  }
}

/** Malformed-geometry guard: bad coordinates RAISE, never silently drop. */
class GeoJsonMalformedSpec extends AnyFunSuite with SparkSpec {
  test("malformed Point coordinates raise instead of dropping") {
    val gj =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":1},"geometry":{"type":"Point","coordinates":"oops"}}
        |]}""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_gj_bad")
    val f = dir.resolve("bad.geojson")
    java.nio.file.Files.write(f, gj.getBytes("UTF-8"))
    val ex = intercept[Exception] {
      graft.sources.GeoJson.readPoints(spark, f.toString).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("malformed coordinates")), msgs(ex).mkString(" | "))
  }
}
