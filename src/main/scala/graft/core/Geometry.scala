package graft.core

/**
 * Minimal planar geometry for the vector side of the engine: polygons
 * with holes, point-in-polygon, covering-cell enumeration, rasterization
 * (pixel-center fill + all-touched boundary traversal) and an STR-packed
 * R-tree for the broadcast PIP index.
 *
 * Semantics mirror the reference's use of `rasterio.features.rasterize`
 * (reference raster.py:2435-2455): polygons select pixels whose CENTER is
 * inside; `allTouched = true` additionally selects every pixel touched by
 * the boundary; overlapping geometries resolve LAST-GEOMETRY-WINS
 * (rasterize burns in order, later overwrites — raster.py:2442-2448).
 */
final case class Polygon(id: Int, shell: Array[(Double, Double)],
                         holes: Array[Array[(Double, Double)]] = Array.empty) {

  lazy val bbox: (Double, Double, Double, Double) = {
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = Double.MinValue; var ymax = Double.MinValue
    shell.foreach { case (x, y) =>
      if (x < xmin) xmin = x; if (x > xmax) xmax = x
      if (y < ymin) ymin = y; if (y > ymax) ymax = y
    }
    (xmin, ymin, xmax, ymax)
  }

  /** Even-odd ray-cast point-in-polygon (holes subtract). */
  def contains(x: Double, y: Double): Boolean = {
    val (bx0, by0, bx1, by1) = bbox
    if (x < bx0 || x > bx1 || y < by0 || y > by1) return false
    var inside = ringContains(shell, x, y)
    var h = 0
    while (inside && h < holes.length) {
      if (ringContains(holes(h), x, y)) inside = false
      h += 1
    }
    inside
  }

  private def ringContains(ring: Array[(Double, Double)], x: Double, y: Double): Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** All rings (shell + holes), for boundary traversal. */
  def rings: Iterator[Array[(Double, Double)]] = Iterator(shell) ++ holes.iterator
}

object Polygon {
  /** Axis-aligned rectangle polygon (the oracle-SQL-friendly shape). */
  def rect(id: Int, xmin: Double, ymin: Double, xmax: Double, ymax: Double): Polygon =
    Polygon(id, Array((xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)))
}

/**
 * Open polyline (LineString) — the reference's line-geometry extraction
 * input (raster.py:2435-2455 rasterizes LineStrings with
 * all_touched=True; golden shape tests/test_extract.py:97). Unlike a
 * Polygon ring, the vertex chain is NOT closed: segments run between
 * consecutive points only.
 */
final case class Polyline(id: Int, pts: IndexedSeq[(Double, Double)]) {
  require(pts.length >= 2, "a polyline needs at least 2 points")
  /** Consecutive (x0, y0, x1, y1) segments — no closing edge. */
  def segments: Iterator[(Double, Double, Double, Double)] =
    pts.iterator.sliding(2).withPartial(false).map { s => (s(0)._1, s(0)._2, s(1)._1, s(1)._2) }
}

/**
 * Immutable broadcastable polygon layer with a lazily-built STR-packed
 * R-tree — the "broadcast R-tree per partition" of the north star: the
 * set ships with the serialized plan, and the tree is built once per
 * executor JVM on first use (@transient lazy).
 */
final case class PolygonSet(polys: IndexedSeq[Polygon]) extends Serializable {

  @transient private lazy val tree: RTree = RTree.build(
    polys.map(p => (p.bbox, p)))

  /** Ids of polygons containing (x, y), ascending. */
  def containingIds(x: Double, y: Double): Array[Int] =
    tree.query(x, y).filter(_.contains(x, y)).map(_.id).sorted

  /** True if any polygon contains the point (mask / semi-join predicate). */
  def containsAny(x: Double, y: Double): Boolean = tree.winner(x, y) != -1

  /**
   * Last-wins winner: the MAX polygon id containing the point, or -1.
   * Allocation-free tree walk — this runs once per ROW inside
   * WholeStageCodegen on the 100TB path, so no per-call garbage.
   */
  def winner(x: Double, y: Double): Int = tree.winner(x, y)

  // id -> position map: polygon ids need NOT be 0..n-1 positions — a user
  // layer with non-contiguous ids must refine against the right polygon
  @transient private lazy val byId: Map[Int, Polygon] =
    polys.map(p => p.id -> p).toMap

  /** Exact refine for a specific candidate id. */
  def contains(id: Int, x: Double, y: Double): Boolean = byId(id).contains(x, y)

  /**
   * (cellId, polyId) covering pairs at a resolution — the equi-join
   * prejoin that replaces rasterize at scale (SURVEY.md §2.3): polygon
   * bbox -> covering cells (explodable), refined downstream by exact PIP.
   */
  def coverCells(res: Int): Seq[(Long, Int)] =
    polys.flatMap { p =>
      val (x0, y0, x1, y1) = p.bbox
      val ix0 = CellIndex.lonToIx(x0, res); val ix1 = CellIndex.lonToIx(math.nextDown(x1), res)
      val iy0 = CellIndex.latToIy(y0, res); val iy1 = CellIndex.latToIy(math.nextDown(y1), res)
      for {
        ix <- ix0 to ix1
        iy <- iy0 to iy1
      } yield (CellIndex.pack(res, ix, iy), p.id)
    }
}

/** Simple STR-packed static R-tree over (bbox, value) pairs. */
final class RTree private (nodes: Array[RTree.Node]) extends Serializable {
  def query(x: Double, y: Double): Array[Polygon] = {
    val out = Array.newBuilder[Polygon]
    def visit(n: RTree.Node): Unit = {
      if (x >= n.x0 && x <= n.x1 && y >= n.y0 && y <= n.y1) n match {
        case l: RTree.Leaf => out += l.value
        case b: RTree.Branch => b.children.foreach(visit)
      }
    }
    nodes.foreach(visit)
    out.result()
  }

  /** Allocation-free: max id of a containing polygon, or -1. */
  def winner(x: Double, y: Double): Int = {
    var best = -1
    def visit(n: RTree.Node): Unit = {
      if (x >= n.x0 && x <= n.x1 && y >= n.y0 && y <= n.y1) n match {
        case l: RTree.Leaf =>
          if (l.value.id > best && l.value.contains(x, y)) best = l.value.id
        case b: RTree.Branch =>
          var i = 0
          while (i < b.children.length) { visit(b.children(i)); i += 1 }
      }
    }
    var i = 0
    while (i < nodes.length) { visit(nodes(i)); i += 1 }
    best
  }
}

object RTree {
  sealed abstract class Node extends Serializable {
    def x0: Double; def y0: Double; def x1: Double; def y1: Double
  }
  final case class Leaf(x0: Double, y0: Double, x1: Double, y1: Double, value: Polygon) extends Node
  final case class Branch(x0: Double, y0: Double, x1: Double, y1: Double, children: Array[Node]) extends Node

  private val Fanout = 8

  def build(items: Seq[((Double, Double, Double, Double), Polygon)]): RTree = {
    val leaves: Array[Node] = items.map { case ((x0, y0, x1, y1), v) => Leaf(x0, y0, x1, y1, v) }.toArray
    var level: Array[Node] = strPack(leaves)
    while (level.length > Fanout) level = strPack(level)
    new RTree(level)
  }

  /** Sort-Tile-Recursive packing: sort by x-center, slice, sort slices by y-center, group. */
  private def strPack(nodes: Array[Node]): Array[Node] = {
    if (nodes.length <= Fanout) return nodes
    val sortedX = nodes.sortBy(n => (n.x0 + n.x1) / 2)
    val sliceCount = math.ceil(math.sqrt(nodes.length.toDouble / Fanout)).toInt.max(1)
    val sliceSize = math.ceil(nodes.length.toDouble / sliceCount).toInt
    sortedX.grouped(sliceSize).flatMap { slice =>
      slice.sortBy(n => (n.y0 + n.y1) / 2).grouped(Fanout).map { grp =>
        Branch(grp.map(_.x0).min, grp.map(_.y0).min, grp.map(_.x1).max, grp.map(_.y1).max, grp)
      }
    }.toArray
  }
}
