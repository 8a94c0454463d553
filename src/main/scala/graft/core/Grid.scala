package graft.core

/**
 * Georeferencing of a raster grid: affine transform + shape + CRS.
 *
 * Mirrors the reference's `Raster.meta` georeferencing
 * (reference: pyspatialml/raster.py:435-442, bounds raster.py:358-365,
 * resolution raster.py:353-356). The transform follows the GDAL/rasterio
 * affine convention:
 *
 *   x = a*col + b*row + c
 *   y = d*col + e*row + f
 *
 * with north-up rasters having b = d = 0, a = +xres, e = -yres,
 * (c, f) = top-left corner of pixel (0, 0).
 *
 * This is a tiny broadcast-able value object — grid georeferencing is
 * driver-side metadata, never per-row data (SURVEY.md §1.4).
 */
final case class GridMeta(
    a: Double, b: Double, c: Double,
    d: Double, e: Double, f: Double,
    width: Int, height: Int,
    crs: String = "EPSG:4326") {

  require(width > 0 && height > 0, s"bad grid shape ${height}x$width")

  /** Pixel count of the full grid. */
  def cells: Long = width.toLong * height.toLong

  /** World x of the CENTER of pixel (row, col) — rasterio `xy(offset='center')`. */
  def x(row: Long, col: Long): Double = a * (col + 0.5) + b * (row + 0.5) + c

  /** World y of the CENTER of pixel (row, col). */
  def y(row: Long, col: Long): Double = d * (col + 0.5) + e * (row + 0.5) + f

  private lazy val det = a * e - b * d

  /**
   * Inverse affine with FLOOR semantics — the contract of
   * `rasterio.transform.rowcol` used by every extraction join
   * (reference: raster.py:2351). Points exactly on a pixel's
   * left/top edge belong to that pixel.
   */
  def col(xw: Double, yw: Double): Long = {
    val cf = (e * (xw - c) - b * (yw - f)) / det
    math.floor(cf).toLong
  }
  def row(xw: Double, yw: Double): Long = {
    val rf = (-d * (xw - c) + a * (yw - f)) / det
    math.floor(rf).toLong
  }

  def inBounds(row: Long, col: Long): Boolean =
    row >= 0 && row < height && col >= 0 && col < width

  /** (xmin, ymin, xmax, ymax) — reference raster.py:358-365. */
  def bounds: (Double, Double, Double, Double) = {
    val corners = Seq((0L, 0L), (0L, width.toLong), (height.toLong, 0L), (height.toLong, width.toLong))
      .map { case (r, cc) => (a * cc + b * r + c, d * cc + e * r + f) }
    (corners.map(_._1).min, corners.map(_._2).min, corners.map(_._1).max, corners.map(_._2).max)
  }

  /** Resolution (|a|, |e|) — reference raster.py:353-356. */
  def resolution: (Double, Double) = (math.abs(a), math.abs(e))

  /**
   * Transform of a cropped window starting at (rowOff, colOff) —
   * reference crop recomputes the transform the same way
   * (raster.py:1664-1672).
   */
  def windowed(rowOff: Long, colOff: Long, h: Int, w: Int): GridMeta =
    copy(c = a * colOff + b * rowOff + c, f = d * colOff + e * rowOff + f, width = w, height = h)

  /**
   * Transform after decimation to (outHeight, outWidth) —
   * reference aggregate recomputes the same way (raster.py:1947-1954).
   */
  def scaledTo(outHeight: Int, outWidth: Int): GridMeta =
    copy(
      a = a * width.toDouble / outWidth, e = e * height.toDouble / outHeight,
      b = b * height.toDouble / outHeight, d = d * width.toDouble / outWidth,
      width = outWidth, height = outHeight)
}

object GridMeta {
  /** Standard north-up grid from bounds. */
  def northUp(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
              width: Int, height: Int, crs: String = "EPSG:4326"): GridMeta =
    GridMeta(
      a = (xmax - xmin) / width, b = 0.0, c = xmin,
      d = 0.0, e = -(ymax - ymin) / height, f = ymax,
      width = width, height = height, crs = crs)

  /**
   * The default test grid mirroring the reference's nc Landsat fixture
   * shape 443 rows x 489 cols (FIXTURES.md §1), placed on a world
   * sub-extent so that hash-derived page points fall mostly (not
   * entirely) in bounds — out-of-bounds probes exercise the
   * null-preserving outer-join path (reference raster.py:2355-2367).
   */
  val TestGrid: GridMeta = northUp(-120.0, -60.0, 120.0, 60.0, width = 489, height = 443)
}

/**
 * Tile math replicating the reference's block/window generator
 * (reference raster.py:673-698): tiles of (th x tw) pixels covering the
 * grid row-major with edge clipping. `tileId` is the partition unit —
 * the Spark analogue of the reference's out-of-core execution window.
 */
object Tiles {
  /** Number of tiles per row of the tile grid. */
  def tilesPerRow(width: Int, tw: Int): Int = (width + tw - 1) / tw

  /** Tile id of pixel (row, col), row-major over the tile grid. */
  def tileId(row: Long, col: Long, width: Int, th: Int, tw: Int): Long =
    (row / th) * tilesPerRow(width, tw) + (col / tw)

  /** All tile windows (rowOff, colOff, h, w) covering the grid, edge-clipped. */
  def windows(height: Int, width: Int, th: Int, tw: Int): Seq[(Int, Int, Int, Int)] =
    for {
      r <- 0 until height by th
      c <- 0 until width by tw
    } yield (r, c, math.min(th, height - r), math.min(tw, width - c))
}
