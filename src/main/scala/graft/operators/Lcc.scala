package graft.operators

/**
 * Lambert Conformal Conic (2SP) on an ellipsoid — the second great
 * projected-CRS family the reference reaches through pyproj `to_crs`
 * (reference raster.py:1711-1866; tests/test_tocrs.py:22-37 warps to
 * arbitrary EPSG codes): national grids like RGF93 / Lambert-93
 * (EPSG:2154) and the US State Plane zones are LCC. Public textbook
 * math: Snyder, "Map Projections — A Working Manual" (USGS PP 1395),
 * eqs 14-1..15-11 (forward) and 7-9/14-9..15-11 (inverse).
 *
 * ORACLE DISCIPLINE (the q68 pattern): the transform is written ONCE
 * over the [[Utm.Ar]] arithmetic typeclass and instantiated as Catalyst
 * Columns (engine), Doubles (driver grid derivation) and SQL text (the
 * DuckDB twin), so both engines evaluate the IDENTICAL IEEE op order.
 * Composites reduce to the bit-verified primitive set (+ - * /, EXP,
 * LN, ATAN, SIN, COS, SQRT):
 *   tan(pi/4 - phi/2)           = (1 - sin phi) / cos phi
 *   z^p                         = exp(p * ln z)        (z > 0)
 * The inverse latitude is Snyder 7-9 iterated a FIXED 5 times (an
 * unrolled identical tree in every instance — no convergence-dependent
 * branching), which converges to < 1e-12 rad for |phi| < 89 deg.
 *
 * Domain: points strictly inside the cone (y' = rho0 - (N - FN) > 0)
 * and away from the poles — true for any national-grid window; the
 * theta' = ATAN(x'/y') form relies on it (no ATAN2 in the verified
 * primitive set).
 */
object Lcc {
  import Utm.Ar

  /**
   * A 2SP Lambert conic: standard parallels `phi1Deg`/`phi2Deg`, origin
   * (`lat0Deg`, `lon0Deg`), false easting/northing, ellipsoid
   * (`majorA`, inverse flattening `invFlat`). The cone constants
   * (n, a*F, rho0) are plain doubles computed once on the driver and
   * interpolated as LITERALS into every instance — identical in engine
   * and oracle by construction.
   */
  final case class Params(lat0Deg: Double, lon0Deg: Double,
                          phi1Deg: Double, phi2Deg: Double,
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
    /** Cone constant (Snyder 15-8). */
    val n: Double = math.log(mOf(phi1Deg) / mOf(phi2Deg)) / math.log(tOf(phi1Deg) / tOf(phi2Deg))
    /** a * F (Snyder 15-10 scaled by the semi-major axis). */
    val aF: Double = majorA * mOf(phi1Deg) / (n * math.exp(n * math.log(tOf(phi1Deg))))
    /** rho at the latitude of origin (Snyder 15-7a). */
    val rho0: Double = aF * math.exp(n * math.log(tOf(lat0Deg)))
  }

  /** RGF93 / Lambert-93 (EPSG:2154), GRS80 ellipsoid — the French
    * national grid; the origin (3 E, 46.5 N) maps exactly to
    * (700000, 6600000) m, which LccSpec pins. */
  val Lambert93: Params = Params(
    lat0Deg = 46.5, lon0Deg = 3.0, phi1Deg = 49.0, phi2Deg = 44.0,
    falseE = 700000.0, falseN = 6600000.0,
    majorA = 6378137.0, invFlat = 298.257222101)

  private val DegPerRad = 180.0 / math.Pi
  private val RadPerDeg = math.Pi / 180.0
  private val HalfPi = math.Pi / 2.0

  /** t(phi) (Snyder 15-9) over the typeclass — phi in radians. Shared
    * with [[PolarStereo]] (same conformal-latitude function). */
  private[operators] def tF[T](phi: T, e: Double, halfE: Double)(implicit F: Ar[T]): T = {
    val s = F.sin(phi)
    val es = F.mul(F.lit(e), s)
    F.mul(F.div(F.sub(F.lit(1.0), s), F.cos(phi)),
      F.exp(F.mul(F.lit(halfE),
        F.ln(F.div(F.add(F.lit(1.0), es), F.sub(F.lit(1.0), es))))))
  }
  private def tF[T](phi: T, p: Params)(implicit F: Ar[T]): T = tF(phi, p.e, p.halfE)

  /**
   * Forward LCC: (lon, lat) degrees -> (easting, northing) meters
   * (Snyder 14-1/14-2/15-7). srcToTarget for the pooling kernels and
   * the defaultTarget bounds projection.
   */
  def fwdEN[T](lon: T, lat: T, p: Params)(implicit F: Ar[T]): (T, T) = {
    val t = tF(F.mul(lat, F.lit(RadPerDeg)), p)
    val rho = F.mul(F.lit(p.aF), F.exp(F.mul(F.lit(p.n), F.ln(t))))
    val theta = F.mul(F.lit(p.n),
      F.mul(F.sub(lon, F.lit(p.lon0Deg)), F.lit(RadPerDeg)))
    (F.add(F.lit(p.falseE), F.mul(rho, F.sin(theta))),
      F.add(F.lit(p.falseN), F.sub(F.lit(p.rho0), F.mul(rho, F.cos(theta)))))
  }

  /**
   * Inverse LCC: (easting, northing) meters -> (lon, lat) degrees
   * (Snyder 14-9..14-11, 15-11; latitude via 7-9 iterated 5x). The
   * per-pixel direction of a nearest/interp warp ONTO an LCC grid.
   */
  def invLonLat[T](eCol: T, nCol: T, p: Params)(implicit F: Ar[T]): (T, T) = {
    val xp = F.sub(eCol, F.lit(p.falseE))
    val yp = F.sub(F.lit(p.rho0), F.sub(nCol, F.lit(p.falseN)))
    val rho = F.sqrt(F.add(F.mul(xp, xp), F.mul(yp, yp)))
    val tp = F.exp(F.mul(F.lit(1.0 / p.n), F.ln(F.div(rho, F.lit(p.aF)))))
    val lon = F.add(F.lit(p.lon0Deg),
      F.mul(F.div(F.atan(F.div(xp, yp)), F.lit(p.n)), F.lit(DegPerRad)))
    // Snyder 7-9: phi = pi/2 - 2 atan(t' * ((1 - e sin phi)/(1 + e sin phi))^(e/2))
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
