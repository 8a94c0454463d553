package graft.operators

/**
 * Polar Stereographic (variant B, north aspect) on an ellipsoid — the
 * THIRD projected-CRS family the reference reaches through pyproj
 * `to_crs` (reference raster.py:1711-1866): polar grids like NSIDC Sea
 * Ice Polar Stereographic North (EPSG:3413) and Antarctic EPSG:3031.
 * Public textbook math: Snyder, "Map Projections — A Working Manual"
 * (USGS PP 1395), eqs 21-2..21-4 / 15-9 (forward) and 20-18/7-9
 * (inverse).
 *
 * Same [[Utm.Ar]] typeclass discipline as UTM/LCC: one generic series,
 * Column/Double/SQL instances share IEEE op order by construction. The
 * inverse needs the FULL-QUADRANT longitude (a polar grid spans every
 * longitude), so atan2 composes from the `gt` conditional + ATAN with
 * identical branch text in every instance; the fixed-point latitude is
 * Snyder 7-9 unrolled 5x exactly like [[Lcc]].
 *
 * South aspect is the standard negation (Snyder p.161: phi -> -phi,
 * lambda -> -lambda, y -> -y); only the north aspect ships because the
 * fixture pins one real EPSG and the negation adds no new math.
 */
object PolarStereo {
  import Utm.Ar

  /** North-polar stereographic: standard parallel `latTsDeg` (where
    * scale is true), central meridian `lon0Deg` (down the -y axis),
    * false origin, ellipsoid. Cone constants are driver doubles
    * interpolated as literals into every instance. */
  final case class Params(latTsDeg: Double, lon0Deg: Double,
                          falseE: Double, falseN: Double,
                          majorA: Double, invFlat: Double) {
    private val rad = math.Pi / 180.0
    val e2: Double = { val f = 1.0 / invFlat; f * (2.0 - f) }
    val e: Double = math.sqrt(e2)
    val halfE: Double = e / 2.0
    private def mOf(phiDeg: Double): Double = {
      val s = math.sin(phiDeg * rad)
      math.cos(phiDeg * rad) / math.sqrt(1.0 - e2 * s * s)
    }
    private def tOf(phiDeg: Double): Double = {
      val phi = phiDeg * rad; val s = math.sin(phi); val es = e * s
      ((1.0 - s) / math.cos(phi)) * math.exp(halfE * math.log((1.0 + es) / (1.0 - es)))
    }
    /** rho = scaleK * t(phi) (Snyder 21-32: a * m_ts / t_ts). */
    val scaleK: Double = majorA * mOf(latTsDeg) / tOf(latTsDeg)
  }

  /** NSIDC Sea Ice Polar Stereographic North (EPSG:3413), WGS84:
    * true at 70 N, central meridian 45 W. */
  val Epsg3413: Params = Params(
    latTsDeg = 70.0, lon0Deg = -45.0, falseE = 0.0, falseN = 0.0,
    majorA = 6378137.0, invFlat = 298.257223563)

  private val DegPerRad = 180.0 / math.Pi
  private val RadPerDeg = math.Pi / 180.0
  private val HalfPi = math.Pi / 2.0
  private val Pi = math.Pi

  /** atan2(a, b) = angle of point (b, a) — composed from `gt` + ATAN
    * with lazy identical-text branches, so engine and oracle agree by
    * construction on every quadrant and axis (neither engine's libm
    * atan2 is used; the 0/0 pole case maps to 0 deterministically). */
  private[operators] def atan2F[T](a: T, b: T)(implicit F: Ar[T]): T = {
    val q = F.atan(F.div(a, b))
    F.gt(b, F.lit(0.0), q,
      F.gt(F.lit(0.0), b, // b < 0
        F.gt(F.lit(0.0), a, F.sub(q, F.lit(Pi)), F.add(q, F.lit(Pi))), // a<0 | a>=0
        // b == 0
        F.gt(a, F.lit(0.0), F.lit(HalfPi),
          F.gt(F.lit(0.0), a, F.lit(-HalfPi), F.lit(0.0)))))
  }

  /**
   * Forward: (lon, lat) degrees -> (easting, northing) meters (Snyder
   * 21-2/21-3 north aspect: x = rho sin(theta), y = -rho cos(theta)).
   */
  def fwdEN[T](lon: T, lat: T, p: Params)(implicit F: Ar[T]): (T, T) = {
    val t = Lcc.tF(F.mul(lat, F.lit(RadPerDeg)), p.e, p.halfE)
    val rho = F.mul(F.lit(p.scaleK), t)
    val theta = F.mul(F.sub(lon, F.lit(p.lon0Deg)), F.lit(RadPerDeg))
    (F.add(F.lit(p.falseE), F.mul(rho, F.sin(theta))),
      F.sub(F.lit(p.falseN), F.mul(rho, F.cos(theta))))
  }

  /**
   * Inverse: (easting, northing) meters -> (lon, lat) degrees. The
   * longitude comes from the full-quadrant atan2 (theta = atan2(x',
   * -y')), wrapped into (-180, 180]; latitude via Snyder 7-9 iterated
   * 5x from chi = pi/2 - 2 atan(t').
   */
  def invLonLat[T](eCol: T, nCol: T, p: Params)(implicit F: Ar[T]): (T, T) = {
    val xp = F.sub(eCol, F.lit(p.falseE))
    val yp = F.sub(nCol, F.lit(p.falseN))
    val rho = F.sqrt(F.add(F.mul(xp, xp), F.mul(yp, yp)))
    val tp = F.div(rho, F.lit(p.scaleK))
    val lonRaw = F.add(F.lit(p.lon0Deg),
      F.mul(atan2F(xp, F.neg(yp)), F.lit(DegPerRad)))
    // wrap into (-180, 180] so warps probe a lon/lat grid directly:
    // lonRaw <= -180 (incl. the exact antipode) -> +360, > 180 -> -360
    val lon = F.gt(lonRaw, F.lit(-180.0),
      F.gt(lonRaw, F.lit(180.0), F.sub(lonRaw, F.lit(360.0)), lonRaw),
      F.add(lonRaw, F.lit(360.0)))
    def step(phi: T): T = {
      val es = F.mul(F.lit(p.e), F.sin(phi))
      F.sub(F.lit(HalfPi), F.mul(F.lit(2.0), F.atan(F.mul(tp,
        F.exp(F.mul(F.lit(p.halfE),
          F.ln(F.div(F.sub(F.lit(1.0), es), F.add(F.lit(1.0), es)))))))))
    }
    val phi0 = F.sub(F.lit(HalfPi), F.mul(F.lit(2.0), F.atan(tp)))
    val phi = (1 to 5).foldLeft(phi0)((acc, _) => step(acc))
    (lon, F.mul(phi, F.lit(DegPerRad)))
  }
}
