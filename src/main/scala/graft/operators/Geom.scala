package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Vector geometry properties over the rings table `(poly_id, xss,
 * yss)` ([[graft.sources.GeoJson.readPolygons]] output): signed
 * shoelace area, area-weighted centroid, and bounds — the geopandas
 * `gdf.area` / `gdf.centroid` / `gdf.total_bounds` surface the
 * reference leans on for extent math (raster.py:2436-2517 consumes
 * gdf geometry; `to_crs` target derivation uses layer bounds).
 *
 * Conventions: rings must be CLOSED (first vertex repeated — the
 * GeoJSON wire form, which `readPolygons` preserves) and oriented per
 * RFC 7946 (exterior CCW, holes CW), so hole rings contribute
 * negative signed area and the per-polygon sum is shell − holes with
 * no containment analysis. MultiPolygon rows (several shells in one
 * ring list) sum their parts, matching geopandas' per-feature area.
 *
 * Scale + exactness: everything is per-row Column arithmetic over the
 * ring arrays — no join, no shuffle, no driver geometry; a 10M-feature
 * layer computes in one projection. The shoelace folds are SEQUENTIAL
 * left folds (Spark's `aggregate` HOF) in vertex order; with integral
 * vertex coordinates every term and partial sum is exact, so results
 * are order-free and the oracle can use plain SUMs (the q71
 * integral-weights discipline). Fractional layers remain correct but
 * order-sensitive in the last ulp — divergence documented rather than
 * quantized away.
 */
object Geom {

  /**
   * Haversine great-circle distance in meters (mean-Earth radius) —
   * the geodesic companion to the planar `GeoDistTransformer`
   * (transformers.py:286-355 is planar on projected coordinates; on
   * geographic CRSs the geodesic is what a user actually wants).
   * Written once over [[Utm.Ar]]; the arc angle uses the composed
   * full-quadrant [[PolarStereo.atan2F]] (atan2(√a, √(1−a))) rather
   * than asin, so the antipodal pole a=1 yields π/2 through the CASE
   * chain instead of a 0-division (DuckDB returns NULL for x/0.0, not
   * IEEE ∞). Radians replay Spark's `Math.toRadians` op order
   * (deg / 180 · π). SIN/COS carry DuckDB's 1-ulp variance, so
   * oracle-facing outputs ship quantized (q108: floor(d·1e3) mm).
   */
  def haversine[T](lon1: T, lat1: T, lon2: T, lat2: T,
                   radius: Double = 6371008.8)
                  (implicit F: Utm.Ar[T]): T = {
    def rad(x: T): T = F.mul(F.div(x, F.lit(180.0)), F.lit(math.Pi))
    val phi1 = rad(lat1); val phi2 = rad(lat2)
    val sp = F.sin(F.div(F.sub(phi2, phi1), F.lit(2.0)))
    val sl = F.sin(F.div(F.sub(rad(lon2), rad(lon1)), F.lit(2.0)))
    val a = F.add(F.mul(sp, sp),
      F.mul(F.mul(F.cos(phi1), F.cos(phi2)), F.mul(sl, sl)))
    // Near-antipodal pairs can push a past 1.0 by an ulp; 1−a then goes
    // negative, where Spark's sqrt yields NaN but DuckDB's THROWS
    // (OutOfRangeException) — clamp through the shared chain so both
    // engines land on atan2(√a, 0) = π/2 (gt(x,0,x,0) ≡ max(x,0)).
    val oneMinusA = F.sub(F.lit(1.0), a)
    val clamped = F.gt(oneMinusA, F.lit(0.0), oneMinusA, F.lit(0.0))
    F.mul(F.lit(2.0 * radius),
      PolarStereo.atan2F(F.sqrt(a), F.sqrt(clamped)))
  }

  /** Per-ring fold of `term(i)` over the closing-exclusive edge list
    * (i = 1..n-1, 1-based), 0.0 for degenerate (< 2 vertex) rings. */
  private def ringFold(xs: Column, ys: Column)
                      (term: (Column, Column, Column, Column) => Column): Column =
    when(size(xs) >= 2,
      aggregate(sequence(lit(1), size(xs) - 1), lit(0.0), (acc, i) =>
        acc + term(element_at(xs, i), element_at(ys, i),
          element_at(xs, i + 1), element_at(ys, i + 1))))
      .otherwise(lit(0.0))

  /**
   * Adds `area`, `cx`, `cy`, `xmin`, `ymin`, `xmax`, `ymax`.
   * `area` = Σ_rings shoelace/2 (holes negative by orientation);
   * centroid = Σ (v_i + v_{i+1})·cross_i / (6·area), NULL for
   * zero-area geometries; bounds ignore orientation.
   */
  def properties(polys: DataFrame): DataFrame = {
    // Spark's sequence(1, 0) DESCENDS ([1,0]), so an EMPTY ring list
    // would feed element_at(xss, 0) — a runtime error that kills the
    // whole job on one degenerate geometry. Guard like ringFold does.
    def overRings(term: (Column, Column, Column, Column) => Column): Column =
      when(size(col("xss")) >= 1,
        aggregate(
          transform(sequence(lit(1), size(col("xss"))), ri =>
            ringFold(element_at(col("xss"), ri), element_at(col("yss"), ri))(term)),
          lit(0.0), (a, b) => a + b))
        .otherwise(lit(0.0))
    val a2 = overRings((x1, y1, x2, y2) => x1 * y2 - x2 * y1)
    val cxn = overRings((x1, y1, x2, y2) => (x1 + x2) * (x1 * y2 - x2 * y1))
    val cyn = overRings((x1, y1, x2, y2) => (y1 + y2) * (x1 * y2 - x2 * y1))
    polys.withColumn("__a2", a2)
      .withColumn("area", col("__a2") / 2.0)
      .withColumn("cx", when(col("__a2") =!= 0.0, cxn / (lit(3.0) * col("__a2"))))
      .withColumn("cy", when(col("__a2") =!= 0.0, cyn / (lit(3.0) * col("__a2"))))
      .withColumn("xmin", array_min(flatten(col("xss"))))
      .withColumn("ymin", array_min(flatten(col("yss"))))
      .withColumn("xmax", array_max(flatten(col("xss"))))
      .withColumn("ymax", array_max(flatten(col("yss"))))
      .drop("__a2")
  }
}
