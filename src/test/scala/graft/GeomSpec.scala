package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Geom

/** Geometry properties vs a same-fold-order scalar twin. */
class GeomSpec extends AnyFunSuite with SparkSpec {

  private def scalarProps(xss: Seq[Seq[Double]], yss: Seq[Seq[Double]])
  : (Double, Option[Double], Option[Double]) = {
    var a2 = 0.0; var cxn = 0.0; var cyn = 0.0
    for ((xs, ys) <- xss.zip(yss); i <- 0 until xs.size - 1) {
      val cr = xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
      a2 += cr
      cxn += (xs(i) + xs(i + 1)) * cr
      cyn += (ys(i) + ys(i + 1)) * cr
    }
    (a2 / 2.0,
      if (a2 != 0.0) Some(cxn / (3.0 * a2)) else None,
      if (a2 != 0.0) Some(cyn / (3.0 * a2)) else None)
  }

  private def run(rows: Seq[(Int, Seq[Seq[Double]], Seq[Seq[Double]])]) = {
    import spark.implicits._
    Geom.properties(rows.toDF("poly_id", "xss", "yss"))
      .select("poly_id", "area", "cx", "cy", "xmin", "ymin", "xmax", "ymax")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("donut and multipolygon: area/centroid/bounds match the scalar twin") {
    val donut = (100,
      Seq(Seq(-60.0, 40.0, 40.0, -60.0, -60.0), Seq(-20.0, -20.0, 10.0, 10.0, -20.0)),
      Seq(Seq(-40.0, -40.0, 40.0, 40.0, -40.0), Seq(-10.0, 20.0, 20.0, -10.0, -10.0)))
    val multi = (101,
      Seq(Seq(0.0, 2.0, 2.0, 0.0, 0.0), Seq(10.0, 14.0, 14.0, 10.0, 10.0)),
      Seq(Seq(0.0, 0.0, 2.0, 2.0, 0.0), Seq(0.0, 0.0, 4.0, 4.0, 0.0)))
    val got = run(Seq(donut, multi))
    // known answers: shell 100x80 minus 30x30 hole; 2x2 + 4x4 squares
    assert(got(100).getDouble(1) === 7100.0)
    assert(got(101).getDouble(1) === 20.0)
    for ((id, xss, yss) <- Seq(donut, multi)) {
      val (a, cx, cy) = scalarProps(xss, yss)
      val r = got(id)
      assert(r.getDouble(1) === a, s"$id area")
      assert(r.getDouble(2) === cx.get, s"$id cx")
      assert(r.getDouble(3) === cy.get, s"$id cy")
      assert(r.getDouble(4) === xss.flatten.min && r.getDouble(6) === xss.flatten.max)
      assert(r.getDouble(5) === yss.flatten.min && r.getDouble(7) === yss.flatten.max)
    }
  }

  test("fractional coordinates follow the same sequential fold order") {
    val frac = (7,
      Seq(Seq(0.1, 2.3, 1.7, 0.1)),
      Seq(Seq(0.2, 0.4, 3.3, 0.2)))
    val got = run(Seq(frac))(7)
    val (a, cx, cy) = scalarProps(frac._2, frac._3)
    assert(got.getDouble(1) === a)
    assert(got.getDouble(2) === cx.get && got.getDouble(3) === cy.get)
  }

  test("haversine: known distance + Column == scalar shared-Ar twin") {
    import spark.implicits._
    import graft.operators.Utm
    // Paris -> London great-circle is ~343.5 km
    val pl = Geom.haversine[Double](2.35, 48.85, -0.13, 51.51)(Utm.DblAr)
    assert(math.abs(pl - 343.5e3) < 2.0e3, s"got $pl")
    // antipodal pole: composed atan2 yields pi, no 0-division
    val anti = Geom.haversine[Double](0.0, 0.0, 180.0, 0.0)(Utm.DblAr)
    assert(math.abs(anti - math.Pi * 6371008.8) < 1.0, s"got $anti")
    val pts = Seq((0L, 10.0, 20.0), (1L, -120.0, -60.0), (2L, 179.9, 89.9))
    val dCol = Geom.haversine[org.apache.spark.sql.Column](
      org.apache.spark.sql.functions.col("lon"),
      org.apache.spark.sql.functions.col("lat"),
      org.apache.spark.sql.functions.lit(2.5),
      org.apache.spark.sql.functions.lit(48.9))(Utm.ColAr)
    val got = pts.toDF("id", "lon", "lat")
      .select(org.apache.spark.sql.functions.col("id"), dCol.as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, lon, lat) <- pts)
      assert(got(id) === Geom.haversine[Double](lon, lat, 2.5, 48.9)(Utm.DblAr), id)
  }

  test("properties compose with the GeoJSON file path (rings round-trip)") {
    // a donut feature written as GeoJSON (closed RFC-oriented rings),
    // parsed by readPolygons, fed to properties — the gdf.area path
    val donutJson =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":7},"geometry":{"type":"Polygon",
        | "coordinates":[[[-60,-40],[40,-40],[40,40],[-60,40],[-60,-40]],
        |                [[-20,-10],[-20,20],[10,20],[10,-10],[-20,-10]]]}}]}"""
        .stripMargin.replace("\n", "")
    val p = java.nio.file.Files.createTempFile("graft_geomspec", ".geojson")
    java.nio.file.Files.write(p, donutJson.getBytes("UTF-8"))
    val polys = graft.sources.GeoJson.readPolygons(spark, p.toString)
    val r = Geom.properties(polys)
      .select("poly_id", "area", "xmin", "ymax").collect().head
    assert(r.getInt(0) === 7)
    assert(r.getDouble(1) === 7100.0) // 100x80 shell minus 30x30 hole
    assert(r.getDouble(2) === -60.0 && r.getDouble(3) === 40.0)
  }

  test("zero-area geometry: NULL centroid, finite bounds") {
    val line = (9, Seq(Seq(1.0, 5.0, 1.0)), Seq(Seq(2.0, 2.0, 2.0)))
    val r = run(Seq(line))(9)
    assert(r.getDouble(1) === 0.0)
    assert(r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(4) === 1.0 && r.getDouble(6) === 5.0)
  }

  test("EMPTY ring list survives (sequence(1,0) descends, ADVICE r5)") {
    // one degenerate feature (zero rings) among normal rows must not
    // crash the job — area 0, NULL centroid and bounds
    val empty = (11, Seq.empty[Seq[Double]], Seq.empty[Seq[Double]])
    val square = (12, Seq(Seq(0.0, 2.0, 2.0, 0.0, 0.0)),
      Seq(Seq(0.0, 0.0, 2.0, 2.0, 0.0)))
    val got = run(Seq(empty, square))
    assert(got(11).getDouble(1) === 0.0)
    assert(got(11).isNullAt(2) && got(11).isNullAt(4))
    assert(got(12).getDouble(1) === 4.0)
  }

  test("haversine near-antipode: 1-a < 0 by an ulp clamps, never NaN") {
    import graft.operators.Utm
    // exact antipode of (17.3, 42.1): a lands within an ulp of 1.0
    val d = Geom.haversine[Double](17.3, 42.1, -162.7, -42.1)(Utm.DblAr)
    assert(!d.isNaN && math.abs(d - math.Pi * 6371008.8) < 1.0, s"got $d")
    // scan a band of near-antipodal pairs: clamped chain is NaN-free
    for (eps <- Seq(0.0, 1e-13, 1e-10, 1e-7)) {
      val v = Geom.haversine[Double](0.0, 30.0, 180.0 - eps, -30.0)(Utm.DblAr)
      assert(!v.isNaN, s"eps=$eps")
    }
  }
}
