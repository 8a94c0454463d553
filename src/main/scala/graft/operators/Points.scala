package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Polygon, PolygonSet}

/**
 * Point utilities from the reference's vector module (vector.py).
 */
object Points {

  /**
   * Deterministic random point inside a polygon (vector.py:42-61):
   * seeded LCG rejection sampling in the bbox, loop until contained.
   * Runs driver-side per polygon (the reference's usage shape: one point
   * per call).
   */
  def randomPointInPolygon(p: Polygon, seed: Long): (Double, Double) = {
    val (x0, y0, x1, y1) = p.bbox
    var s = seed
    def next(): Double = {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      ((s >>> 11).toDouble / (1L << 53).toDouble)
    }
    var tries = 0
    while (tries < 100000) {
      val x = x0 + next() * (x1 - x0)
      val y = y0 + next() * (y1 - y0)
      if (p.contains(x, y)) return (x, y)
      tries += 1
    }
    throw new IllegalStateException(s"no interior point found for polygon ${p.id}")
  }

  /**
   * filter_points (vector.py:7-39): drop points closer than `minDist`.
   *
   * Two implementations:
   *  - [[filterPointsExact]]: complete-linkage hierarchical clustering
   *    with the reference's exact semantics (keep first/last per
   *    cluster). Inherently sequential -> driver-side, for small layers
   *    (the reference's own scale: its fixtures have <= 1000 points).
   *  - [[filterPointsCellSnap]]: the distributed approximation — snap to
   *    cells of ~minDist and keep one point per cell (documented
   *    divergence, SURVEY.md §2.3): scales to any size, may keep pairs
   *    up to 2*minDist apart across cell borders and drops points the
   *    exact algorithm would keep within dense clusters.
   */
  def filterPointsExact(points: Seq[(Long, Double, Double)], minDist: Double,
                        keep: String = "first"): Seq[Long] = {
    // complete-linkage agglomerative clustering, threshold = minDist
    var clusters = points.map(p => Vector(p)).toBuffer
    def linkDist(a: Vector[(Long, Double, Double)], b: Vector[(Long, Double, Double)]): Double =
      (for { p <- a; q <- b } yield math.hypot(p._2 - q._2, p._3 - q._3)).max
    var merged = true
    while (merged) {
      merged = false
      var best = (Double.MaxValue, -1, -1)
      for (i <- clusters.indices; j <- (i + 1) until clusters.size) {
        val d = linkDist(clusters(i), clusters(j))
        if (d < best._1) best = (d, i, j)
      }
      if (best._1 < minDist) {
        val (_, i, j) = best
        clusters(i) = clusters(i) ++ clusters(j)
        clusters.remove(j)
        merged = true
      }
    }
    clusters.map { c =>
      val sorted = c.sortBy(_._1)
      if (keep == "first") sorted.head._1 else sorted.last._1
    }.toSeq
  }

  /** Distributed cell-snap point thinning (one row kept per cell of ~minDist). */
  def filterPointsCellSnap(df: DataFrame, idCol: String, lonCol: String, latCol: String,
                           minDistDeg: Double): DataFrame = {
    val res = math.max(0, math.min(28,
      (math.log(360.0 / minDistDeg) / math.log(2.0)).floor.toInt))
    df.withColumn("__cell", graft.functions.cell_encode(col(lonCol), col(latCol), res))
      .groupBy(col("__cell").as("cell"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_points"))
  }

  /**
   * Distributed EXACT-distance point thinning without the driver-side
   * size cap of [[filterPointsExact]]: candidate pairs come from a
   * cell-disk equi-join at a resolution whose cell height >= `minDist`
   * (any pair closer than minDist is then within Chebyshev distance 1
   * in cells), exact Euclidean-degree distance verifies each candidate,
   * and [[Dedup.components]] clusters the surviving edges — i.e.
   * SINGLE-linkage clustering at threshold minDist, keeping the
   * smallest (`keep = "first"`) or largest (`"last"`) id per cluster;
   * untouched points keep themselves.
   *
   * DOCUMENTED DIVERGENCE (same class as [[filterPointsCellSnap]]'s):
   * the reference's complete-linkage (vector.py:7-39) only merges
   * clusters whose FARTHEST members are within minDist; single linkage
   * merges transitive chains, so it can thin a dense chain harder. On
   * sparse layouts (inter-cluster gaps > minDist, cluster diameters <
   * minDist) the two agree exactly — spec-asserted.
   *
   * Scale shape: one cell-keyed candidate join (bounded 3x3 disk per
   * probe), one exact-distance filter, then the components loop (one
   * vertex-keyed hash-agg per round). Returns (keep_id, n_points) per
   * cluster.
   */
  /** Candidate-cell resolution for `minDist` (cell height >= minDist). */
  private def distRes(minDist: Double): Int = math.max(0, math.min(28,
    (math.log(180.0 / minDist) / math.log(2.0)).floor.toInt))

  /**
   * Audit for [[filterPointsDist]]'s skew hazard (the `hotBands`
   * discipline): cells at the candidate resolution holding more than
   * `threshold` points — each contributes O(n_points^2) candidate
   * pairs to one join key. The operator takes no silent cap (thinning
   * must see every close pair to be exact); a hot cell here means the
   * data is locally denser than the minDist scale and AQE skew-split
   * carries the join — run this beside the operator when that matters.
   */
  def hotCells(df: DataFrame, idCol: String, lonCol: String, latCol: String,
               minDist: Double, threshold: Long = 65536L): DataFrame =
    df.select(graft.functions.cell_encode(col(lonCol), col(latCol), distRes(minDist)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n_points"))
      .where(col("n_points") > threshold)

  def filterPointsDist(df: DataFrame, idCol: String, lonCol: String, latCol: String,
                       minDist: Double, keep: String = "first",
                       checkpointDir: Option[String] = None): DataFrame = {
    require(keep == "first" || keep == "last", s"keep must be first|last, got '$keep'")
    val res = distRes(minDist)
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(lonCol).as("__lon"), col(latCol).as("__lat"))
    val probes = pts
      .withColumn("__cell", graft.functions.cell_encode(col("__lon"), col("__lat"), res))
      .withColumn("cellkey", explode(array_distinct(
        graft.functions.cell_disk(col("__cell"), 1))))
      .select(col("cellkey"), col("id").as("id_a"),
        col("__lon").as("__lon_a"), col("__lat").as("__lat_a"))
    val targets = pts
      .select(graft.functions.cell_encode(col("__lon"), col("__lat"), res).as("cellkey"),
        col("id").as("id_b"), col("__lon").as("__lon_b"), col("__lat").as("__lat_b"))
    val dx = col("__lon_a") - col("__lon_b")
    val dy = col("__lat_a") - col("__lat_b")
    val edges = probes.join(targets, Seq("cellkey"))
      .where(col("id_a") < col("id_b") &&
        dx * dx + dy * dy < lit(minDist * minDist))
      .select("id_a", "id_b").distinct()
    val comp = Dedup.components(edges, "id_a", "id_b", checkpointDir)
    val labeled = pts.join(comp, Seq("id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("id")))
    val keepAgg = if (keep == "first") min(col("id")) else max(col("id"))
    labeled.groupBy(col("component"))
      .agg(keepAgg.as("keep_id"), count(lit(1)).as("n_points"))
      .select("keep_id", "n_points")
  }
}
