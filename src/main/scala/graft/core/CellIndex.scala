package graft.core

/**
 * Deterministic hierarchical spatial cell index (H3/S2-style, quadtree
 * flavour) over lon/lat.
 *
 * At resolution r (0..28) the lon axis is split into 2^r columns and the
 * lat axis into 2^r rows; a cell id packs (res, ix, iy) into one Long:
 *
 *   cell = (res << 58) | (ix << 29) | iy
 *
 * Properties (the ones the engine relies on):
 *  - hierarchical: parent(cell) halves ix and iy (exact containment);
 *  - locality: cells sharing a parent share high bits, so range scans
 *    over sorted cell ids touch spatially-adjacent data;
 *  - constant-time neighbor expansion `gridDisk(cell, k)` with lon wrap,
 *    the primitive behind the two-stage kNN join (SURVEY.md §2.3).
 *
 * Divergence from true H3: cells are lat/lon quadtree rectangles, not
 * hexagons — the reference has no cell index at all (its analogue is the
 * block/window generator, pyspatialml/raster.py:673-698), so the contract
 * here is "deterministic hierarchical cell with neighbor expansion", not
 * H3 bit-compatibility.
 *
 * All methods are static-forwarder friendly (object without companion
 * class) so Catalyst codegen can call them directly from generated Java.
 */
object CellIndex {
  val MaxRes = 28
  private val IyBits = 29
  private val IxShift = 29
  private val ResShift = 58
  private val CoordMask = (1L << 29) - 1

  /** Number of cells per axis at resolution res. */
  def axisCells(res: Int): Long = 1L << res

  /** Clamped lon -> column index at res. Lon outside [-180,180) wraps. */
  def lonToIx(lon: Double, res: Int): Long = {
    val n = 1L << res
    val t = (lon + 180.0) / 360.0 * n
    val ix = math.floor(t).toLong
    if (ix < 0) ((ix % n) + n) % n else if (ix >= n) ix % n else ix
  }

  /** Clamped lat -> row index at res (lat clamped to the poles). */
  def latToIy(lat: Double, res: Int): Long = {
    val n = 1L << res
    val t = (lat + 90.0) / 180.0 * n
    val iy = math.floor(t).toLong
    if (iy < 0) 0L else if (iy >= n) n - 1 else iy
  }

  def pack(res: Int, ix: Long, iy: Long): Long =
    (res.toLong << ResShift) | (ix << IxShift) | iy

  /** The batched-encode kernel: (lon, lat, res) -> cell id. */
  def encode(lon: Double, lat: Double, res: Int): Long =
    pack(res, lonToIx(lon, res), latToIy(lat, res))

  def res(cell: Long): Int = ((cell >>> ResShift) & 0x1f).toInt
  def ix(cell: Long): Long = (cell >>> IxShift) & CoordMask
  def iy(cell: Long): Long = cell & CoordMask

  /** Center lon/lat of a cell. */
  def lon(cell: Long): Double = {
    val n = 1L << res(cell)
    (ix(cell) + 0.5) / n * 360.0 - 180.0
  }
  def lat(cell: Long): Double = {
    val n = 1L << res(cell)
    (iy(cell) + 0.5) / n * 180.0 - 90.0
  }

  /** Parent at res-1 (exact containment). */
  def parent(cell: Long): Long = {
    val r = res(cell)
    require(r > 0, "res-0 cell has no parent")
    pack(r - 1, ix(cell) >> 1, iy(cell) >> 1)
  }

  /** Ancestor at an arbitrary coarser resolution. */
  def parentAt(cell: Long, targetRes: Int): Long = {
    val r = res(cell)
    require(targetRes <= r, s"target res $targetRes finer than cell res $r")
    val shift = r - targetRes
    pack(targetRes, ix(cell) >> shift, iy(cell) >> shift)
  }

  /** The 4 children at res+1. */
  def children(cell: Long): Array[Long] = {
    val r = res(cell); val cx = ix(cell) << 1; val cy = iy(cell) << 1
    Array(pack(r + 1, cx, cy), pack(r + 1, cx + 1, cy),
          pack(r + 1, cx, cy + 1), pack(r + 1, cx + 1, cy + 1))
  }

  /**
   * All cells within Chebyshev distance k of `cell` (the (2k+1)^2 block),
   * wrapping in lon, clamping in lat. Deterministic order: row-major.
   * This is the ring-expansion primitive of the kNN join
   * (SURVEY.md §2.3 KNNTransformer mapping).
   */
  def gridDisk(cell: Long, k: Int): Array[Long] = {
    val r = res(cell); val n = 1L << r
    val cx = ix(cell); val cy = iy(cell)
    val out = Array.newBuilder[Long]
    var dy = -k
    while (dy <= k) {
      val yy = cy + dy
      if (yy >= 0 && yy < n) {
        var dx = -k
        while (dx <= k) {
          val xx = ((cx + dx) % n + n) % n
          out += pack(r, xx, yy)
          dx += 1
        }
      }
      dy += 1
    }
    out.result()
  }

  /** Width of one cell in degrees lon at res (the ring in-radius bound in x). */
  def cellWidthDeg(res: Int): Double = 360.0 / (1L << res)
  /** Height of one cell in degrees lat at res. */
  def cellHeightDeg(res: Int): Double = 180.0 / (1L << res)
}
