package graft.operators

/**
 * Albers Equal-Area Conic on an ellipsoid — the EQUAL-AREA projected
 * family the reference reaches through pyproj `to_crs` (reference
 * raster.py:1711-1866; tests/test_tocrs.py:22-37 warp to arbitrary
 * EPSG codes): the USGS/NLCD CONUS grid (EPSG:5070) and most national
 * land-cover products are Albers. Unlike UTM/LCC/PolarStereo (all
 * conformal), Albers preserves AREA — the property raster aggregation
 * pipelines (pixel counts -> hectares) depend on. Public textbook
 * math: Snyder, "Map Projections — A Working Manual" (USGS PP 1395),
 * eqs 14-1..14-6 + 3-12 (forward) and 14-8..14-11 + 3-16 (inverse).
 *
 * Same [[Utm.Ar]] typeclass discipline as the other families: the
 * transform is written ONCE over generic arithmetic and instantiated
 * as Catalyst Columns (engine), Doubles (driver grid derivation) and
 * SQL text (the DuckDB twin), so both engines evaluate the IDENTICAL
 * IEEE op order. Composites reduce to the verified primitive set:
 *   asin(z) = atan(z / sqrt(1 - z*z))
 * The inverse latitude is the CLOSED-FORM authalic-latitude series
 * (Snyder 3-18): phi = beta + c2 sin(2 beta) + c4 sin(4 beta) +
 * c6 sin(6 beta) with beta = asin(q/qp). Closed form is load-bearing
 * here, not just elegant: the Newton alternative (3-16) references
 * phi ~11 times per step, so a 5x unroll explodes the shared
 * expression TEXT combinatorially (~11^5 copies) in every instance —
 * janino OOMs and the SQL twin would be megabytes. The series
 * references beta only 4 times (measured worst round-trip over CONUS:
 * 1.4e-8 deg ~ 1.5 mm, the same truncation PROJ uses).
 *
 * Domain: points strictly inside the cone (y' = rho0 - (N - FN) > 0),
 * true for any CONUS-style window; theta' = ATAN(x'/y') relies on it
 * (the full-quadrant composed atan2 lives in [[PolarStereo]]; Albers
 * national grids never span the cone apex).
 */
object Albers {
  import Utm.Ar

  /**
   * A 2SP Albers conic: standard parallels `phi1Deg`/`phi2Deg`, origin
   * (`lat0Deg`, `lon0Deg`), false easting/northing, ellipsoid. The
   * cone constants (n, C, rho0) are plain doubles computed once on the
   * driver and interpolated as LITERALS into every instance.
   */
  final case class Params(lat0Deg: Double, lon0Deg: Double,
                          phi1Deg: Double, phi2Deg: Double,
                          falseE: Double, falseN: Double,
                          majorA: Double, invFlat: Double) {
    private val rad = math.Pi / 180.0
    val e2: Double = { val f = 1.0 / invFlat; f * (2.0 - f) }
    val e: Double = math.sqrt(e2)
    /** 1/(2e) — the log-term coefficient in q (Snyder 3-12). */
    val inv2E: Double = 1.0 / (2.0 * e)

    private def mOf(phiDeg: Double): Double = {
      val s = math.sin(phiDeg * rad)
      math.cos(phiDeg * rad) / math.sqrt(1.0 - e2 * s * s)
    }
    private def qOf(phiDeg: Double): Double = {
      val s = math.sin(phiDeg * rad)
      (1.0 - e2) * (s / (1.0 - e2 * s * s) -
        inv2E * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    /** Cone constant (Snyder 14-6). */
    val n: Double = {
      val m1 = mOf(phi1Deg); val m2 = mOf(phi2Deg)
      (m1 * m1 - m2 * m2) / (qOf(phi2Deg) - qOf(phi1Deg))
    }
    /** C (Snyder 14-5). */
    val bigC: Double = { val m1 = mOf(phi1Deg); m1 * m1 + n * qOf(phi1Deg) }
    /** rho at the latitude of origin (Snyder 14-3a). */
    val rho0: Double = majorA * math.sqrt(bigC - n * qOf(lat0Deg)) / n
    /** q at the pole (Snyder 3-12 at phi = pi/2). */
    val qPole: Double =
      (1.0 - e2) * (1.0 / (1.0 - e2) - inv2E * math.log((1.0 - e) / (1.0 + e)))
    /** Authalic series coefficients (Snyder 3-18). */
    val c2: Double = e2 / 3.0 + 31.0 * e2 * e2 / 180.0 + 517.0 * e2 * e2 * e2 / 5040.0
    val c4: Double = 23.0 * e2 * e2 / 360.0 + 251.0 * e2 * e2 * e2 / 3780.0
    val c6: Double = 761.0 * e2 * e2 * e2 / 45360.0
  }

  /** NAD83 / Conus Albers (EPSG:5070), GRS80 — the USGS/NLCD national
    * grid; the origin (96 W, 23 N) maps exactly to (0, 0) m, which
    * AlbersSpec pins. */
  val Conus: Params = Params(
    lat0Deg = 23.0, lon0Deg = -96.0, phi1Deg = 29.5, phi2Deg = 45.5,
    falseE = 0.0, falseN = 0.0,
    majorA = 6378137.0, invFlat = 298.257222101)

  private val DegPerRad = 180.0 / math.Pi
  private val RadPerDeg = math.Pi / 180.0

  /** q(phi) (Snyder 3-12) over the typeclass — phi in radians. */
  private def qF[T](phi: T, p: Params)(implicit F: Ar[T]): T = {
    val s = F.sin(phi)
    val es = F.mul(F.lit(p.e), s)
    F.mul(F.lit(1.0 - p.e2),
      F.sub(F.div(s, F.sub(F.lit(1.0), F.mul(es, es))),
        F.mul(F.lit(p.inv2E),
          F.ln(F.div(F.sub(F.lit(1.0), es), F.add(F.lit(1.0), es))))))
  }

  /**
   * Forward Albers: (lon, lat) degrees -> (easting, northing) meters
   * (Snyder 14-1..14-4). srcToTarget for the pooling kernels and the
   * defaultTarget bounds projection.
   */
  def fwdEN[T](lon: T, lat: T, p: Params)(implicit F: Ar[T]): (T, T) = {
    val q = qF(F.mul(lat, F.lit(RadPerDeg)), p)
    val rho = F.mul(F.lit(p.majorA / p.n),
      F.sqrt(F.sub(F.lit(p.bigC), F.mul(F.lit(p.n), q))))
    val theta = F.mul(F.lit(p.n),
      F.mul(F.sub(lon, F.lit(p.lon0Deg)), F.lit(RadPerDeg)))
    (F.add(F.lit(p.falseE), F.mul(rho, F.sin(theta))),
      F.add(F.lit(p.falseN), F.sub(F.lit(p.rho0), F.mul(rho, F.cos(theta)))))
  }

  /**
   * Inverse Albers: (easting, northing) meters -> (lon, lat) degrees
   * (Snyder 14-8..14-11; latitude via the closed-form authalic series
   * 3-18, asin composed from ATAN/SQRT). The per-pixel direction of a
   * nearest/interp warp ONTO an Albers grid.
   */
  def invLonLat[T](eCol: T, nCol: T, p: Params)(implicit F: Ar[T]): (T, T) = {
    val xp = F.sub(eCol, F.lit(p.falseE))
    val yp = F.sub(F.lit(p.rho0), F.sub(nCol, F.lit(p.falseN)))
    val rho = F.sqrt(F.add(F.mul(xp, xp), F.mul(yp, yp)))
    val lon = F.add(F.lit(p.lon0Deg),
      F.mul(F.div(F.atan(F.div(xp, yp)), F.lit(p.n)), F.lit(DegPerRad)))
    // q' = (C - rho^2 n^2 / a^2) / n (Snyder 14-19 rearranged), then
    // x = q'/qp; beta = asin(x) = atan(x / sqrt(1 - x^2))
    val rhoNa = F.mul(rho, F.lit(p.n / p.majorA))
    val q = F.div(F.sub(F.lit(p.bigC), F.mul(rhoNa, rhoNa)), F.lit(p.n))
    val x = F.mul(q, F.lit(1.0 / p.qPole))
    val beta = F.atan(F.div(x, F.sqrt(F.sub(F.lit(1.0), F.mul(x, x)))))
    val phi = F.add(F.add(beta,
      F.mul(F.lit(p.c2), F.sin(F.mul(F.lit(2.0), beta)))),
      F.add(F.mul(F.lit(p.c4), F.sin(F.mul(F.lit(4.0), beta))),
        F.mul(F.lit(p.c6), F.sin(F.mul(F.lit(6.0), beta)))))
    (lon, F.mul(phi, F.lit(DegPerRad)))
  }
}
