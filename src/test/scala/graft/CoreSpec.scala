package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class CoreSpec extends AnyFunSuite {

  val g = GridMeta.TestGrid
  // deterministic property sampling (no scalacheck dep in the offline cache)
  def rng = new scala.util.Random(42)

  test("affine: pixel-center xy maps back to the same (row, col) — floor semantics") {
    val r0 = rng
    (1 to 500).foreach { _ =>
      val r = r0.nextInt(g.height).toLong; val c = r0.nextInt(g.width).toLong
      val (x, y) = (g.x(r, c), g.y(r, c))
      assert(g.row(x, y) === r)
      assert(g.col(x, y) === c)
    }
  }

  test("affine: points exactly on a pixel's left/top edge belong to that pixel") {
    val x = g.a * 10 + g.c // x of col boundary 10; rowcol floor semantics (raster.py:2351)
    assert(g.col(x, 0.0) === 10L)
  }

  test("windowed transform preserves world coordinates of window pixels") {
    val w = g.windowed(100, 50, 40, 30)
    assert(math.abs(w.x(0, 0) - g.x(100, 50)) < 1e-9)
    assert(math.abs(w.y(39, 29) - g.y(139, 79)) < 1e-9)
  }

  test("cell encode round-trip: center re-encodes to same cell; ix matches floor formula") {
    val r0 = rng
    (1 to 500).foreach { _ =>
      val lon = r0.nextDouble() * 360.0 - 180.0
      val lat = r0.nextDouble() * 180.0 - 90.0
      val res = r0.nextInt(29)
      val cell = CellIndex.encode(lon, lat, res)
      assert(CellIndex.res(cell) === res)
      assert(CellIndex.encode(CellIndex.lon(cell), CellIndex.lat(cell), res) === cell)
      val n = 1L << res
      assert(CellIndex.ix(cell) === math.min(math.floor((lon + 180.0) / 360.0 * n).toLong, n - 1))
    }
  }

  test("parent containment: parentAt(encode(p, r1), r2) == encode(p, r2) for r2 <= r1") {
    val r0 = rng
    (1 to 500).foreach { _ =>
      val lon = r0.nextDouble() * 360.0 - 180.0
      val lat = r0.nextDouble() * 180.0 - 90.0
      val r1 = r0.nextInt(29); val r2 = r0.nextInt(r1 + 1)
      assert(CellIndex.parentAt(CellIndex.encode(lon, lat, r1), r2) ===
        CellIndex.encode(lon, lat, r2))
    }
  }

  test("children are exactly the res+1 cells whose parent is the cell") {
    val cell = CellIndex.encode(12.3, 45.6, 7)
    assert(CellIndex.children(cell).length === 4)
    CellIndex.children(cell).foreach(ch => assert(CellIndex.parent(ch) === cell))
  }

  test("gridDisk(cell, 0) is the cell itself; k=1 has 9 adjacent cells") {
    val cell = CellIndex.encode(12.3, 45.6, 10)
    assert(CellIndex.gridDisk(cell, 0).toSeq === Seq(cell))
    val disk = CellIndex.gridDisk(cell, 1)
    assert(disk.length === 9)
    assert(disk.contains(cell))
    disk.foreach(d => assert(math.abs(CellIndex.iy(d) - CellIndex.iy(cell)) <= 1))
  }

  test("gridDisk wraps in lon at the antimeridian") {
    val cell = CellIndex.pack(4, 0, 8) // western edge at res 4 (16 cells per axis)
    val disk = CellIndex.gridDisk(cell, 1)
    assert(disk.exists(d => CellIndex.ix(d) === 15L)) // wrapped to eastern edge
    assert(disk.length === 9)
  }

  test("gridDisk clamps in lat at the poles") {
    val cell = CellIndex.pack(4, 8, 0) // southern edge
    assert(CellIndex.gridDisk(cell, 1).length === 6)
  }

  test("stable points: full-range mixing even for tiny ids") {
    val pts = (0L until 500L).map(i => (StablePoint.lonFromId(i), StablePoint.latFromId(i)))
    assert(pts.map(_._1).min < -150 && pts.map(_._1).max > 150)
    assert(pts.map(_._2).min < -75 && pts.map(_._2).max > 75)
    assert(StablePoint.lonFromId(42) === StablePoint.lonFromId(42))
  }

  test("url points: deterministic, in range, distinct for distinct urls") {
    val (lon, lat) = StablePoint.fromUrl("https://example.com/a")
    assert(lon >= -180.0 && lon < 180.0 && lat >= -90.0 && lat < 90.0)
    assert(StablePoint.fromUrl("https://example.com/a") === ((lon, lat)))
    assert(StablePoint.fromUrl("https://example.com/b") !== ((lon, lat)))
  }

  test("tile windows cover the grid exactly once, edge-clipped (raster.py:673-698)") {
    val ws = Tiles.windows(443, 489, 64, 64)
    assert(ws.map { case (_, _, h, w) => h.toLong * w }.sum === 443L * 489L)
    assert(Tiles.tileId(442L, 488L, 489, 64, 64) === ws.length - 1)
    assert(Tiles.tileId(0L, 0L, 489, 64, 64) === 0L)
  }
}
