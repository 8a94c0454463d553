package graft.operators

/**
 * Geodetic datum shift: 7-parameter Helmert (Bursa-Wolf,
 * position-vector rotation convention) through geocentric ECEF
 * coordinates — the piece that separates a projection-only `to_crs`
 * (UTM/NZTM on WGS84-equivalent datums) from the national grids on
 * legacy datums the reference reaches via pyproj (reference
 * raster.py:1711-1866): EPSG:27700 sits on OSGB36, whose published
 * transformation to WGS84 is exactly this Helmert.
 *
 * Public textbook math (OS "A guide to coordinate systems in Great
 * Britain", Annexe B; Snyder/EPSG guidance note 7-2):
 *   geodetic -> ECEF  : nu = a/sqrt(1 - e^2 sin^2 phi);
 *                       X = nu cos phi cos lam, Y = nu cos phi sin lam,
 *                       Z = nu (1 - e^2) sin phi            (h = 0)
 *   Helmert (pos-vec) : X' = t + (1+s)[x - rz y + ry z, ...]
 *   ECEF -> geodetic  : Bowring's one-shot formula,
 *                       theta = atan2(Z a, p b),
 *                       phi = atan((Z + e'^2 b sin^3 theta)
 *                                  / (p - e^2 a cos^3 theta)),
 *                       lam = atan2(Y, X)
 * Bowring is closed-form (sub-mm at h = 0), so the whole chain stays
 * inside the [[Utm.Ar]] typeclass: Column / Double / SQL instances
 * share IEEE op order by construction, atan2 composes from
 * [[PolarStereo.atan2F]] (identical branch text in every instance).
 */
object Datum {
  import Utm.Ar
  import Tmerc.Ellipsoid

  private val DegPerRad = 180.0 / math.Pi
  private val RadPerDeg = math.Pi / 180.0
  private val AsToRad = math.Pi / (180.0 * 3600.0)

  /** 7-param Helmert, position-vector convention: translations in
    * meters, scale in ppm, rotations in arc-seconds. */
  final case class Helmert(txM: Double, tyM: Double, tzM: Double,
                           sPpm: Double, rxAs: Double, ryAs: Double,
                           rzAs: Double) {
    val scale: Double = 1.0 + sPpm * 1e-6
    val rx: Double = rxAs * AsToRad
    val ry: Double = ryAs * AsToRad
    val rz: Double = rzAs * AsToRad
    /** Standard small-angle inverse (negate all seven): exact to the
      * ppm^2 / rotation^2 cross terms, i.e. sub-millimeter — the EPSG
      * reversibility convention for Bursa-Wolf. */
    def inverse: Helmert = Helmert(-txM, -tyM, -tzM, -sPpm, -rxAs, -ryAs, -rzAs)
  }

  /** OSGB36 -> WGS84 (the inverse of the published WGS84 -> OSGB36
    * national standard parameters tx=-446.448 ty=+125.157 tz=-542.060
    * s=+20.4894ppm rx=-0.1502" ry=-0.2470" rz=-0.8421"). */
  val Osgb36ToWgs84: Helmert =
    Helmert(446.448, -125.157, 542.060, -20.4894, 0.1502, 0.2470, 0.8421)

  /** Geodetic (lon, lat) degrees at h=0 on `ell` -> ECEF meters. */
  def toEcef[T](lon: T, lat: T, ell: Ellipsoid)(implicit F: Ar[T]): (T, T, T) = {
    val phi = F.mul(lat, F.lit(RadPerDeg))
    val lam = F.mul(lon, F.lit(RadPerDeg))
    val s = F.sin(phi)
    val nu = F.div(F.lit(ell.a),
      F.sqrt(F.sub(F.lit(1.0), F.mul(F.lit(ell.e2), F.mul(s, s)))))
    val nc = F.mul(nu, F.cos(phi))
    (F.mul(nc, F.cos(lam)), F.mul(nc, F.sin(lam)),
      F.mul(F.mul(nu, F.lit(1.0 - ell.e2)), s))
  }

  /** Apply the Helmert (position-vector): X' = t + (1+s) R X. */
  def shift[T](h: Helmert, x: T, y: T, z: T)(implicit F: Ar[T]): (T, T, T) = {
    def sc(v: T): T = F.mul(F.lit(h.scale), v)
    (F.add(F.lit(h.txM), sc(F.add(F.sub(x, F.mul(F.lit(h.rz), y)), F.mul(F.lit(h.ry), z)))),
      F.add(F.lit(h.tyM), sc(F.sub(F.add(F.mul(F.lit(h.rz), x), y), F.mul(F.lit(h.rx), z)))),
      F.add(F.lit(h.tzM), sc(F.add(F.sub(F.mul(F.lit(h.rx), y), F.mul(F.lit(h.ry), x)), z))))
  }

  /** ECEF meters -> geodetic (lon, lat) degrees on `ell` (Bowring). */
  def toGeodetic[T](x: T, y: T, z: T, ell: Ellipsoid)(implicit F: Ar[T]): (T, T) = {
    val p = F.sqrt(F.add(F.mul(x, x), F.mul(y, y)))
    val theta = PolarStereo.atan2F(F.mul(z, F.lit(ell.a)), F.mul(p, F.lit(ell.b)))
    val st = F.sin(theta); val ct = F.cos(theta)
    val st3 = F.mul(F.mul(st, st), st); val ct3 = F.mul(F.mul(ct, ct), ct)
    val phi = F.atan(F.div(
      F.add(z, F.mul(F.lit(ell.ep2 * ell.b), st3)),
      F.sub(p, F.mul(F.lit(ell.e2 * ell.a), ct3))))
    val lam = PolarStereo.atan2F(y, x)
    (F.mul(lam, F.lit(DegPerRad)), F.mul(phi, F.lit(DegPerRad)))
  }

  /** Full geodetic datum hop: (lon, lat) on `from` -> (lon, lat) on
    * `to` through ECEF + Helmert. */
  def geodeticShift[T](lon: T, lat: T, from: Ellipsoid, h: Helmert,
                       to: Ellipsoid)(implicit F: Ar[T]): (T, T) = {
    val (x, y, z) = toEcef(lon, lat, from)
    val (x2, y2, z2) = shift(h, x, y, z)
    toGeodetic(x2, y2, z2, to)
  }
}
