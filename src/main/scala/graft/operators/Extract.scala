package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GridMeta, PolygonSet}
import graft.functions._

/**
 * Extraction joins (the #1 reference workflow, SURVEY.md §2.3).
 */
object Extract {

  /**
   * extract_xy / extract_vector(points): probe coordinates -> (row, col)
   * by inverse affine with floor semantics, LEFT-OUTER join against the
   * stack — out-of-bounds probes yield null layers, duplicate probes
   * (two points in one pixel) are preserved, probe identity (
   * `geometry_idx`) is carried (reference raster.py:2300-2391,
   * extract_by_chunk raster.py:2510-2530). Spark's hash join replaces
   * the reference's hand-rolled block-partitioned chunk loop.
   */
  def xy(stack: Stack, probes: DataFrame, xCol: String, yCol: String,
         broadcastProbes: Boolean = true): DataFrame = {
    val p = probes
      .withColumn("row", grid_row(col(xCol), col(yCol), stack.meta))
      .withColumn("col", grid_col(col(xCol), col(yCol), stack.meta))
    // Build side = the PROBES (usually the small side): stream the pixel
    // table once via the outer-preserving broadcast union below. With
    // broadcastProbes=false (both sides big) Spark plans a shuffle join
    // on (row, col) — co-partitioned when the stack is tile-bucketed.
    if (broadcastProbes)
      probeOuterBroadcast(stack.df, p, Seq("row", "col"), stack.layers)
    else p.join(stack.df, Seq("row", "col"), "left_outer")
  }

  /**
   * Probe-outer join that actually broadcasts the probes. Spark cannot
   * build the PRESERVED (probe) side of an outer join — a broadcast hint
   * on `probes` in a right/left-outer join is silently dropped
   * (HintErrorLogger) and degrades to a shuffle of the big side. The
   * outer-preserving plan is: INNER `big ⋈ broadcast(probes)` (streams
   * the big table, zero shuffle) unioned with the unmatched probes
   * carrying typed null layers. The inner result is probe-sized (grid
   * keys are unique in the pixel table), so it is persisted and the
   * matched-key set for the anti join is derived from it — the big table
   * is scanned exactly once.
   */
  def probeOuterBroadcast(big: DataFrame, probes: DataFrame, keys: Seq[String],
                          layerCols: Seq[String]): DataFrame = {
    val inner = graft.plans.Caches.track(big.join(broadcast(probes), keys))
    // no distinct: the anti join only probes key PRESENCE, duplicate
    // build keys are harmless — and the dedup cost an exchange plus two
    // aggregation passes over the probe-sized inner result
    val matched = inner.select(keys.map(col): _*)
    val nulls = layerCols.map(n => lit(null).cast(big.schema(n).dataType).as(n))
    val remainder = probes.join(broadcast(matched), keys, "left_anti")
    val probeCols = probes.columns.toIndexedSeq.map(col)
    inner.select(probeCols ++ layerCols.map(col): _*)
      .unionByName(remainder.select(probeCols ++ nulls: _*))
  }

  /**
   * extract_raster: labelled-pixel raster (aligned grid) INNER equi-join
   * on (row, col) (reference raster.py:2474-2508). With tile/cell
   * bucketed storage both sides are co-partitioned — shuffle-free.
   */
  def raster(stack: Stack, labels: DataFrame): DataFrame =
    labels.where(col("value").isNotNull).join(stack.df, Seq("row", "col"))

  /**
   * extract_vector(polygons): rasterize-then-join (reference
   * raster.py:2435-2455) — geometries burn onto the grid, overlap
   * tie-break LAST-GEOMETRY-WINS, then an inner join gathers the layer
   * values. Output carries (row, col, poly_id, layers...).
   *
   * Default allTouched = true matches the reference: its rasterize call
   * ALWAYS passes all_touched=True (raster.py:2442-2448), i.e. center
   * fill PLUS every pixel the boundary passes through. allTouched=false
   * gives the bare pixel-center rule (rasterio's default burn).
   */
  def vector(stack: Stack, polys: PolygonSet, allTouched: Boolean = true): DataFrame =
    Rasterize(stack.df.sparkSession, polys, stack.meta, allTouched).join(stack.df, Seq("row", "col"))

  /**
   * extract_vector(LineStrings): supercover-rasterize each open polyline
   * (the reference rasterizes lines with all_touched=True,
   * raster.py:2442-2448; golden tests/test_extract.py:97), last-wins on
   * overlap, inner-join the stack. Output carries (row, col, line_id,
   * layers...).
   */
  def lines(stack: Stack, ls: Seq[graft.core.Polyline]): DataFrame =
    Rasterize.lines(stack.df.sparkSession, ls, stack.meta).join(stack.df, Seq("row", "col"))

  /**
   * extract_vector(LineStrings) from a TABLE of polylines — the
   * vector-FILE path ([[graft.sources.GeoJson.readLines]] feeds this):
   * same semantics as [[lines]], but the geometries stay distributed
   * (`linesTable` walks each row's segments in its task — no driver
   * geometry list, so a million-line layer never collects).
   */
  def linesFrom(stack: Stack, linesDf: DataFrame): DataFrame =
    Rasterize.linesTable(linesDf, stack.meta).join(stack.df, Seq("row", "col"))

  /**
   * extract_vector(polygons) from a rings TABLE — the vector-FILE path
   * ([[graft.sources.GeoJson.readPolygons]] feeds this): same semantics
   * as [[vector]] (all_touched default, last-wins), geometries stay
   * distributed ([[Rasterize.polyTable]]).
   */
  def vectorFrom(stack: Stack, polysDf: DataFrame,
                 allTouched: Boolean = true): DataFrame =
    Rasterize.polyTable(polysDf, stack.meta, allTouched).join(stack.df, Seq("row", "col"))
}

/**
 * Distributed rasterization — the engine's replacement for
 * `rasterio.features.rasterize` (reference raster.py:2442-2448):
 * one task per polygon (layers are small relative to pixels; the pixel
 * side never materializes globally), scanline fill in O(rows x vertices),
 * Amanatides-Woo supercover for boundaries when `allTouched`.
 * Last-wins = max(poly_id) per pixel, matching rasterize burn order.
 */
object Rasterize {

  def apply(spark: SparkSession, polys: PolygonSet, meta: GridMeta,
            allTouched: Boolean): DataFrame = {
    import spark.implicits._
    require(meta.b == 0.0 && meta.d == 0.0, "rasterize requires a north-up grid")
    require(polys.polys.map(_.id).distinct.size == polys.polys.size,
      "duplicate polygon ids: later burns would silently be dropped")
    // O(1) id lookup in the task closure (the whole layer ships with the
    // serialized closure either way — layers are small relative to pixels)
    val byId = polys.polys.map(p => p.id -> p).toMap
    val ids = spark.createDataset(polys.polys.map(_.id))
      .repartition(math.min(polys.polys.size, 32))
    val burned = ids.flatMap { id =>
      val p = byId(id)
      val fill = scanlineFill(p, meta)
      val touched = if (allTouched) boundary(p, meta) else Iterator.empty
      (fill ++ touched).map { case (r, c) => (r, c, id) }
    }.toDF("row", "col", "poly_id")
    burned.groupBy("row", "col").agg(max(col("poly_id")).as("poly_id"))
  }

  /**
   * Supercover rasterization of open polylines — one task per line,
   * Amanatides-Woo walk per segment (all-touched), last-wins max(id).
   */
  def lines(spark: SparkSession, ls: Seq[graft.core.Polyline], meta: GridMeta): DataFrame = {
    import spark.implicits._
    require(meta.b == 0.0 && meta.d == 0.0, "rasterize requires a north-up grid")
    require(ls.map(_.id).distinct.size == ls.size,
      "duplicate polyline ids: later burns would silently be dropped")
    val byId = ls.map(l => l.id -> l).toMap
    val ids = spark.createDataset(ls.map(_.id))
      .repartition(math.min(math.max(ls.size, 1), 32))
    val burned = ids.flatMap { id =>
      val l = byId(id)
      l.segments.flatMap { case (x0, y0, x1, y1) => segment(x0, y0, x1, y1, meta) }
        .map { case (r, c) => (r, c, id) }
    }.toDF("row", "col", "line_id")
    burned.groupBy("row", "col").agg(max(col("line_id")).as("line_id"))
  }

  /**
   * Rasterization of a polygon RINGS TABLE `(poly_id, xss, yss)` — the
   * distributed path for vector-file layers
   * ([[graft.sources.GeoJson.readPolygons]] feeds this): each row's
   * rings (shell + holes, even-odd) scanline-fill and boundary-walk
   * inside its own task, identical kernels to [[apply]]; last-wins
   * max(id) per pixel in one hash-agg shuffle. GeoJSON's duplicated
   * closing vertex contributes a zero-length edge (no crossing, no new
   * boundary cell) — harmless, kept as-is.
   */
  def polyTable(polysDf: DataFrame, meta: GridMeta,
                allTouched: Boolean = true): DataFrame = {
    require(meta.b == 0.0 && meta.d == 0.0, "rasterize requires a north-up grid")
    val spark = polysDf.sparkSession
    import spark.implicits._
    polysDf.select(col("poly_id").cast("int"),
        col("xss").cast("array<array<double>>"), col("yss").cast("array<array<double>>"))
      .as[(Int, Seq[Seq[Double]], Seq[Seq[Double]])]
      .flatMap { case (id, xss, yss) =>
        val rings = xss.zip(yss).map { case (xs, ys) => xs.zip(ys).toArray }
        require(rings.nonEmpty && rings.head.length >= 3,
          s"polygon $id has no valid shell ring (${rings.map(_.length).mkString(",")} vertices)")
        val p = graft.core.Polygon(id, rings.head, rings.tail.toArray)
        val fill = scanlineFill(p, meta)
        val touched = if (allTouched) boundary(p, meta) else Iterator.empty
        (fill ++ touched).map { case (r, c) => (r, c, id) }
      }.toDF("row", "col", "poly_id")
      .groupBy("row", "col").agg(max(col("poly_id")).as("poly_id"))
  }

  /**
   * Supercover rasterization of a polyline TABLE `(line_id, xs, ys)` —
   * the distributed path for vector-file layers
   * ([[graft.sources.GeoJson.readLines]]): each row's segments walk
   * inside its own task (Amanatides-Woo, identical to [[lines]]),
   * last-wins max(id) per pixel in one hash-agg shuffle with map-side
   * partials. The layer never materializes on the driver.
   */
  def linesTable(linesDf: DataFrame, meta: GridMeta): DataFrame = {
    require(meta.b == 0.0 && meta.d == 0.0, "rasterize requires a north-up grid")
    val spark = linesDf.sparkSession
    import spark.implicits._
    linesDf.select(col("line_id").cast("int"),
        col("xs").cast("array<double>"), col("ys").cast("array<double>"))
      .as[(Int, Seq[Double], Seq[Double])]
      .flatMap { case (id, xs, ys) =>
        (0 until math.min(xs.length, ys.length) - 1).iterator.flatMap(i =>
          segment(xs(i), ys(i), xs(i + 1), ys(i + 1), meta))
          .map { case (r, c) => (r, c, id) }
      }.toDF("row", "col", "line_id")
      .groupBy("row", "col").agg(max(col("line_id")).as("line_id"))
  }

  /** Pixels whose CENTER is inside the polygon (even-odd over all rings). */
  private[operators] def scanlineFill(p: graft.core.Polygon, meta: GridMeta)
      : Iterator[(Long, Long)] = {
    val (bx0, by0, bx1, by1) = p.bbox
    val r0 = math.max(meta.row(bx0, by1), 0L)
    val r1 = math.min(meta.row(bx1, by0), meta.height - 1L)
    (r0 to r1).iterator.flatMap { r =>
      val yc = meta.y(r, 0)
      // x-intersections of all ring edges with the horizontal line y = yc,
      // half-open vertex rule (y_i <= y < y_j) for consistent even-odd parity
      val xs = p.rings.flatMap { ring =>
        var acc = List.empty[Double]
        var i = 0
        var j = ring.length - 1
        while (i < ring.length) {
          val (xi, yi) = ring(i); val (xj, yj) = ring(j)
          if ((yi > yc) != (yj > yc)) acc ::= (xj - xi) * (yc - yi) / (yj - yi) + xi
          j = i; i += 1
        }
        acc
      }.toArray.sorted
      // fill between pairs: centers with xlo < xc < xhi
      xs.grouped(2).withFilter(_.length == 2).flatMap { case Array(xlo, xhi) =>
        // first col whose center > xlo ... last col whose center < xhi
        val cLo = math.max(math.ceil((xlo - meta.c) / meta.a - 0.5).toLong, 0L)
        val cHi = math.min(math.floor((xhi - meta.c) / meta.a - 0.5 - 1e-12).toLong, meta.width - 1L)
        (cLo to cHi).iterator.collect {
          case c if {
            val xc = meta.x(r, c)
            xc > xlo && xc < xhi // exact guard against ceil/floor edge rounding
          } => (r, c)
        }
      }
    }
  }

  /** Supercover (all-touched) pixels of the polygon boundary — Amanatides-Woo. */
  private[operators] def boundary(p: graft.core.Polygon, meta: GridMeta)
      : Iterator[(Long, Long)] =
    p.rings.flatMap { ring =>
      ring.indices.iterator.flatMap { i =>
        val (x0, y0) = ring(i)
        val (x1, y1) = ring((i + 1) % ring.length)
        segment(x0, y0, x1, y1, meta)
      }
    }

  /** All in-bounds pixels a segment touches (grid traversal). */
  private[operators] def segment(x0: Double, y0: Double, x1: Double, y1: Double,
                                 meta: GridMeta): Iterator[(Long, Long)] = {
    // continuous grid coordinates (col-space gx, row-space gy)
    val gx0 = (x0 - meta.c) / meta.a; val gy0 = (y0 - meta.f) / meta.e
    val gx1 = (x1 - meta.c) / meta.a; val gy1 = (y1 - meta.f) / meta.e
    var cx = math.floor(gx0).toLong; var cy = math.floor(gy0).toLong
    val ex = math.floor(gx1).toLong; val ey = math.floor(gy1).toLong
    val dx = gx1 - gx0; val dy = gy1 - gy0
    val stepX = if (dx > 0) 1L else if (dx < 0) -1L else 0L
    val stepY = if (dy > 0) 1L else if (dy < 0) -1L else 0L
    var tMaxX = if (stepX == 0) Double.PositiveInfinity
      else ((if (stepX > 0) cx + 1 else cx).toDouble - gx0) / dx
    var tMaxY = if (stepY == 0) Double.PositiveInfinity
      else ((if (stepY > 0) cy + 1 else cy).toDouble - gy0) / dy
    val tDeltaX = if (stepX == 0) Double.PositiveInfinity else math.abs(1.0 / dx)
    val tDeltaY = if (stepY == 0) Double.PositiveInfinity else math.abs(1.0 / dy)
    val out = Vector.newBuilder[(Long, Long)]
    val maxSteps = math.abs(ex - cx) + math.abs(ey - cy) + 2
    var steps = 0L
    var continue = true
    while (continue) {
      out += ((cy, cx)) // (row, col)
      if ((cx == ex && cy == ey) || steps > maxSteps) continue = false
      else if (tMaxX < tMaxY) { cx += stepX; tMaxX += tDeltaX }
      else { cy += stepY; tMaxY += tDeltaY }
      steps += 1
    }
    out.result().iterator.filter { case (r, c) =>
      r >= 0 && r < meta.height && c >= 0 && c < meta.width
    }
  }
}
