package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Datum, Epsg, Tmerc, Utm, Warp}

/**
 * Generic-TM kernel + EPSG registry (reference raster.py:1711-1866
 * accepts any pyproj CRS; tests/test_tocrs.py:22-37):
 *  - the projection half is pinned against the PUBLIC worked example in
 *    the OS "A guide to coordinate systems in Great Britain" (Annexe C:
 *    Caister water tower, OSGB36 geodetic -> National Grid) — no proj
 *    database exists offline, so a published constant is the anchor;
 *  - the datum half (ECEF + Helmert + Bowring) is pinned by round-trip
 *    identities and by the known ~100 m OSGB36<->WGS84 separation;
 *  - registry dispatch covers the UTM zone arithmetic, every data row,
 *    and the unknown-code error contract.
 */
class CrsRegistrySpec extends AnyFunSuite {

  // OS guide Annexe C worked example (public document):
  // phi = 52 39' 27.2531" N, lam = 1 43' 4.5177" E (OSGB36)
  // -> E 651409.903, N 313177.270 on the National Grid.
  private val CaisterLat = 52.0 + 39.0 / 60.0 + 27.2531 / 3600.0
  private val CaisterLon = 1.0 + 43.0 / 60.0 + 4.5177 / 3600.0

  test("BNG projection half matches the published OS worked example to 1 mm") {
    val (e, n) = Tmerc.fwdEN(CaisterLon, CaisterLat,
      Tmerc.Osgb36NationalGrid)(Utm.DblAr)
    assert(math.abs(e - 651409.903) < 1e-3, s"easting $e")
    assert(math.abs(n - 313177.270) < 1e-3, s"northing $n")
  }

  test("TM natural origin maps to the false origin exactly") {
    val (e, n) = Tmerc.fwdEN(-2.0, 49.0, Tmerc.Osgb36NationalGrid)(Utm.DblAr)
    assert(math.abs(e - 400000.0) < 1e-6)
    assert(math.abs(n - (-100000.0)) < 1e-6)
    val (e2, n2) = Tmerc.fwdEN(173.0, 0.0, Tmerc.Nztm2000)(Utm.DblAr)
    assert(math.abs(e2 - 1600000.0) < 1e-6)
    assert(math.abs(n2 - 10000000.0) < 1e-6)
  }

  test("generic TM on WGS84 degenerates to the UTM kernel") {
    val utm31 = Tmerc.Params(Tmerc.WGS84, 0.0, 3.0, Utm.K0, 500000.0, 0.0)
    for ((lon, lat) <- Seq((2.1, 43.7), (5.9, 30.2), (0.4, 53.9))) {
      val (e1, n1) = Tmerc.fwdEN(lon, lat, utm31)(Utm.DblAr)
      val (e2, n2) = Utm.fwdEN(lon, lat, 31, north = true)(Utm.DblAr)
      assert(math.abs(e1 - e2) < 1e-6 && math.abs(n1 - n2) < 1e-6)
    }
  }

  test("EPSG:27700 full chain round-trips E/N across the BNG domain") {
    val crs = Epsg.toLonLat(27700) // (E,N) -> WGS84
    val fwd = crs.inverse
    for (e <- Seq(100000.0, 300000.0, 530000.0, 655000.0);
         n <- Seq(-50000.0, 180000.0, 500000.0, 1000000.0)) {
      val (lon, lat) = crs.toSourcePt(e, n)
      val (e2, n2) = fwd.toSourcePt(lon, lat)
      // Helmert inverse-by-negation error ~ |t|*s + |t|*rot ~ 1 cm
      assert(math.abs(e2 - e) < 2e-2 && math.abs(n2 - n) < 2e-2,
        s"($e,$n) -> ($lon,$lat) -> ($e2,$n2)")
    }
  }

  test("EPSG:27700 datum shift is applied (OSGB36 vs WGS84 ~ 50-150 m)") {
    val withShift = Epsg.fromLonLat(27700)
    val noShift = Epsg.LonLatToTmerc(Tmerc.Osgb36NationalGrid, None, "x")
    val (e1, n1) = withShift.toSourcePt(-0.1276, 51.5074) // London, WGS84
    val (e2, n2) = noShift.toSourcePt(-0.1276, 51.5074)
    val d = math.hypot(e1 - e2, n1 - n2)
    assert(d > 50.0 && d < 150.0, s"datum separation $d m")
  }

  test("EPSG:2193 NZTM2000 round-trips and sits in the published domain") {
    val crs = Epsg.toLonLat(2193)
    // Wellington, WGS84 ~ (174.7762 E, -41.2865 S): NZTM easting is
    // ~1.74-1.76 Mm, northing ~5.42-5.44 Mm (public atlas values)
    val (e, n) = crs.inverse.toSourcePt(174.7762, -41.2865)
    assert(e > 1.70e6 && e < 1.80e6, s"easting $e")
    assert(n > 5.40e6 && n < 5.47e6, s"northing $n")
    val (lon, lat) = crs.toSourcePt(e, n)
    assert(math.abs(lon - 174.7762) < 1e-8 && math.abs(lat + 41.2865) < 1e-8)
  }

  test("registry dispatch: UTM zone arithmetic + data rows + error") {
    assert(Epsg.toLonLat(32631) == Warp.UtmToLonLat(31, north = true))
    assert(Epsg.toLonLat(32733) == Warp.UtmToLonLat(33, north = false))
    assert(Epsg.toLonLat(3857) == Warp.MercatorToLonLat)
    assert(Epsg.toLonLat(4326) == Warp.Identity)
    Seq(2154, 5070, 3413, 27700, 2193).foreach(c => Epsg.toLonLat(c))
    val ex = intercept[IllegalArgumentException](Epsg.toLonLat(99999))
    assert(ex.getMessage.contains("99999"))
  }

  test("Bowring inverse is exact against toEcef round-trip on both ellipsoids") {
    for (ell <- Seq(Tmerc.WGS84, Tmerc.Airy1830);
         (lon, lat) <- Seq((-6.2, 49.9), (1.8, 60.8), (-0.0005, 51.4778),
                           (179.99, -41.0), (-179.99, 70.5))) {
      val (x, y, z) = Datum.toEcef[Double](lon, lat, ell)(Utm.DblAr)
      val (lon2, lat2) = Datum.toGeodetic[Double](x, y, z, ell)(Utm.DblAr)
      assert(math.abs(lon2 - lon) < 1e-11, s"$ell $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"$ell $lat -> $lat2")
    }
  }

  test("Helmert inverse composes to identity within the |t|*s cross terms") {
    val h = Datum.Osgb36ToWgs84
    val (x, y, z) = (3980000.0, -10000.0, 4970000.0)
    val (x1, y1, z1) = Datum.shift[Double](h, x, y, z)(Utm.DblAr)
    val (x2, y2, z2) = Datum.shift[Double](h.inverse, x1, y1, z1)(Utm.DblAr)
    // negation inverse keeps the |t|*s (~11 mm) and |t|*rot cross terms
    assert(math.abs(x2 - x) < 2e-2 && math.abs(y2 - y) < 2e-2 &&
      math.abs(z2 - z) < 2e-2)
  }

  test("inverse TM round-trips lon/lat over the NZTM domain (antimeridian side)") {
    val p = Tmerc.Nztm2000
    for ((lon, lat) <- Seq((166.5, -46.9), (174.8, -41.3), (178.5, -37.7))) {
      val (e, n) = Tmerc.fwdEN(lon, lat, p)(Utm.DblAr)
      val (lon2, lat2) = Tmerc.invLonLat(e, n, p)(Utm.DblAr)
      // order-n^3 Krueger truncation at 5.5 deg from the central meridian
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8)
    }
  }
}
