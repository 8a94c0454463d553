package graft.sources

import graft.core.{Polygon, PolygonSet, Polyline}

/**
 * Deterministic vector fixtures (FIXTURES.md §2): a small polygon layer
 * in lon/lat space mirroring the reference's 34-polygon nc fixture in
 * spirit — overlapping rectangles so the LAST-WINS tie-break is
 * exercised. Rectangles because the SQL oracle can evaluate containment
 * exactly; arbitrary polygons are covered by ScalaTest golden suites.
 *
 * Edge values are deliberately "generic" decimals: no hash-derived point
 * coordinate can land exactly on an edge, so open-vs-closed boundary
 * conventions cannot cause Spark/oracle divergence.
 */
object Fixtures {

  final case class Rect(id: Int, xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                        label: String)

  val Rects: IndexedSeq[Rect] = IndexedSeq(
    Rect(0, -110.3, -50.7, -60.1, -10.3, "forest"),
    Rect(1, -70.9, -30.2, -20.3, 20.7, "water"),   // overlaps 0 and 2
    Rect(2, -30.1, -10.9, 30.3, 40.1, "urban"),
    Rect(3, 10.7, -55.3, 70.9, 5.1, "crop"),       // overlaps 2
    Rect(4, 50.3, 0.7, 110.1, 50.9, "barren"),     // overlaps 3
    Rect(5, -15.9, 42.3, 55.7, 58.1, "snow"),
    Rect(6, 80.3, -58.7, 118.9, -20.1, "shrub"),
    Rect(7, -118.7, 25.3, -75.1, 57.9, "wetland"))

  val Polys: PolygonSet = PolygonSet(
    Rects.map(r => Polygon.rect(r.id, r.xmin, r.ymin, r.xmax, r.ymax)))

  /** Strict-interior SQL containment for rect `r` on columns (lon, lat). */
  def rectSql(r: Rect, lon: String = "lon", lat: String = "lat"): String =
    s"($lon > ${r.xmin} AND $lon < ${r.xmax} AND $lat > ${r.ymin} AND $lat < ${r.ymax})"

  /** SQL for the last-wins containing polygon id (-1 if none). */
  def winnerSql(lon: String = "lon", lat: String = "lat"): String =
    Rects.map(r => s"CASE WHEN ${rectSql(r, lon, lat)} THEN ${r.id} ELSE -1 END")
      .mkString("GREATEST(", ", ", ")")

  /**
   * Deterministic open-polyline layer for line extraction (reference
   * tests/test_extract.py:97 extracts along nc LineStrings): mixed
   * slopes — diagonal, multi-vertex bend, horizontal, vertical, one
   * exiting the grid (out-of-bounds cells must be clipped), one steep.
   * "Generic" decimals keep endpoints off exact cell boundaries.
   */
  val Lines: IndexedSeq[Polyline] = IndexedSeq(
    Polyline(0, IndexedSeq((-100.3, -50.7), (-20.1, 10.3))),
    Polyline(1, IndexedSeq((-10.7, 55.1), (30.3, -20.9), (80.1, 5.3))),
    Polyline(2, IndexedSeq((-60.3, 22.7), (40.9, 22.7))),
    Polyline(3, IndexedSeq((95.1, -58.3), (95.1, 40.7))),
    Polyline(4, IndexedSeq((100.3, 30.1), (140.7, 55.9))),
    Polyline(5, IndexedSeq((-115.9, 58.3), (-110.1, -59.1))))

  /** Inline VALUES relation of the line SEGMENTS (consecutive pairs). */
  def lineSegmentsValuesSql: String = {
    import OracleLit.d
    val rows = Lines.flatMap(l => l.segments.map { case (x0, y0, x1, y1) =>
      s"(${l.id}, ${d(x0)}, ${d(y0)}, ${d(x1)}, ${d(y1)})"
    })
    rows.mkString("(SELECT * FROM (VALUES ", ", ", ") AS t(line_id, x0, y0, x1, y1))")
  }

  /**
   * Deterministic point layer for the vector-FILE point-extraction path
   * (GeoJson.readPoints -> Extract.xy): in-bounds, out-of-bounds (the
   * null-layer outer-join contract) and a MultiPoint feature. "Generic"
   * decimals keep points off pixel edges.
   */
  val Points: IndexedSeq[(Int, Double, Double)] = IndexedSeq(
    (0, -100.3, -50.7), (1, -20.1, 10.3), (2, 30.7, 55.1), (3, 80.9, -20.3),
    (4, 119.1, 59.3), (5, -140.7, 10.1) /* out of bounds */, (6, 0.3, -70.9) /* oob */,
    (7, 95.1, 40.7), (8, -60.3, 22.7), (9, 15.9, -42.3))

  /** Inline VALUES relation of the point layer. */
  def pointsValuesSql: String = {
    import OracleLit.d
    Points.map { case (id, x, y) => s"($id, ${d(x)}, ${d(y)})" }
      .mkString("(SELECT * FROM (VALUES ", ", ", ") AS t(point_id, x, y))")
  }

  /**
   * The [[Lines]] layer as a GeoJSON FeatureCollection (LineString
   * features carrying an `id` property), written once per JVM to a
   * deterministic temp file — the vector-FILE fixture for
   * `GeoJson.readLines`. Double.toString round-trips exactly through
   * JSON, so the parsed coordinates are bit-identical to [[Lines]] and
   * the q41 oracle replays unchanged.
   */
  def linesGeoJsonFile(): String = writeOnce("graft_fixture_lines.geojson", {
    val feats = Lines.map { l =>
      val coords = l.pts.map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")
      s"""{"type":"Feature","properties":{"id":${l.id}},"geometry":{"type":"LineString","coordinates":$coords}}"""
    }
    s"""{"type":"FeatureCollection","features":[${feats.mkString(",")}]}"""
  })

  /** The [[Points]] layer as GeoJSON: points 0-7 as Point features, 8-9
    * folded into ONE MultiPoint-per-id pair to exercise the MultiPoint
    * explode (each still a distinct feature id). */
  def pointsGeoJsonFile(): String = writeOnce("graft_fixture_points.geojson", {
    val feats = Points.map { case (id, x, y) =>
      if (id < 8)
        s"""{"type":"Feature","properties":{"id":$id},"geometry":{"type":"Point","coordinates":[$x,$y]}}"""
      else
        s"""{"type":"Feature","properties":{"id":$id},"geometry":{"type":"MultiPoint","coordinates":[[$x,$y]]}}"""
    }
    s"""{"type":"FeatureCollection","features":[${feats.mkString(",")}]}"""
  })

  /** The [[Rects]] polygon layer as GeoJSON (closed rings, `id`
    * property) — the vector-FILE fixture for `GeoJson.readPolygons`
    * feeding `Rasterize.polyTable`; coordinates round-trip bit-exactly
    * so the q18 oracle replays unchanged. */
  def polysGeoJsonFile(): String = writeOnce("graft_fixture_polys.geojson", {
    val feats = Rects.map { r =>
      val ring = Seq((r.xmin, r.ymin), (r.xmax, r.ymin), (r.xmax, r.ymax),
        (r.xmin, r.ymax), (r.xmin, r.ymin))
        .map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")
      s"""{"type":"Feature","properties":{"id":${r.id}},"geometry":{"type":"Polygon","coordinates":[$ring]}}"""
    }
    s"""{"type":"FeatureCollection","features":[${feats.mkString(",")}]}"""
  })

  private def writeOnce(name: String, content: => String): String = {
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), name)
    val bytes = content.getBytes("UTF-8")
    if (!java.nio.file.Files.exists(p) ||
        !java.util.Arrays.equals(java.nio.file.Files.readAllBytes(p), bytes))
      java.nio.file.Files.write(p, bytes)
    p.toString
  }

  /** Inline VALUES relation of the rect layer for join-shaped oracles. */
  def rectsValuesSql: String =
    Rects.map(r => s"(${r.id}, ${r.xmin}, ${r.ymin}, ${r.xmax}, ${r.ymax}, '${r.label}')")
      .mkString(
        "(SELECT * FROM (VALUES ",
        ", ",
        ") AS t(poly_id, xmin, ymin, xmax, ymax, label))")
}
