package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CellIndex
import graft.functions._

/**
 * Exact k-nearest-neighbor join with the north star's cell-neighbor
 * ring-expansion (reference KNNTransformer, transformers.py:10-283):
 *
 *  each LEVEL — pending probes explode their 3x3 cell disk at the
 *  current resolution and equi-join training points on cell id (shuffle
 *  keyed by cell id — the training set is never broadcast or
 *  cross-joined). Per probe, rank candidates by (dist, trainId).
 *
 *  a probe's top-k is EXACT iff it found >= k candidates AND its kth
 *  distance fits inside the disk's planar safety margin (distance from
 *  the probe to the disk edge). Unresolved probes retry TWO resolution
 *  levels coarser (cell side x4, disk span x4) — the ring-widening the
 *  SURVEY §2.3 plan calls for. At res 0 the disk is the whole world, so
 *  every probe resolves: exactness is guaranteed in <= ceil(res/2)+1
 *  rounds with only cell-keyed shuffles, no matter how large the
 *  training table is (the round-1 full-train broadcast fallback OOMs a
 *  real cluster once train exceeds executor memory).
 *
 * Metric: planar Euclidean on (lon, lat) — matches the reference's
 * minkowski(p=2) on projected coordinates. Ranking ties break by
 * trainId, making results deterministic and oracle-reproducible.
 */
object KNN {

  /**
   * Raster proximity (gdal_proximity analogue): for every probe pixel,
   * the exact Euclidean distance to — and the id of — the nearest
   * feature cell. A thin k=1 view over [[join]], so it inherits the
   * exact ring-widening cell search (bounded 3×3 disks, bounded-heap
   * candidate ranking, no crossJoin at any scale); ties break to the
   * smallest feature id via the (dist, id) heap order.
   */
  def proximity(px: DataFrame, pixId: String, xCol: String, yCol: String,
                features: DataFrame, fx: String, fy: String, fid: String,
                res: Int): DataFrame =
    join(px, pixId, xCol, yCol, features, fx, fy, fid, k = 1, res)
      .select(px.columns.map(col) :+ col("__dist").as("dist") :+
        col(fid).as("near_id"): _*)

  /**
   * Density-derived starting resolution (round 6): pick the finest
   * level whose EXPECTED 3x3-disk candidate count is ~`target`, from
   * one bounded stats pass over train (count + bbox — 5 values to the
   * driver). Starting too fine costs widening rounds (each a fixed
   * multi-job ladder step); too coarse floods every probe's heap with
   * candidates. Result is res-invariant — [[join]] is exact at ANY
   * starting level — so this is purely a round-count/cost lever.
   *
   * Model: train uniform over its bbox -> expected disk candidates at
   * res r = 9 * density * cellW(r) * cellH(r)
   *       = 9 * (n / bboxArea) * 360 * 180 / 4^r.
   *
   * `target` trades the two costs: measured on the world-spread q21
   * fixture (715 train / 5000 probes, 32 cores), target=4096 resolved
   * to res 0 — ONE join key, every candidate pair through a single
   * task, 13 s — while target=256 resolves to res 2 (16 keys, one
   * round, margin still safe): 4.3 s vs 15.5 s at the old fixed res 4
   * (which paid widening retries). Too-small targets over-resolve and
   * pay ladder rounds; too-large ones serialize the candidate join.
   */
  def autoRes(train: DataFrame, tLon: String, tLat: String,
              target: Long = 256L): Int = {
    val r = train.agg(count(lit(1)),
      min(col(tLon).cast("double")), max(col(tLon).cast("double")),
      min(col(tLat).cast("double")), max(col(tLat).cast("double"))).head()
    val n = r.getLong(0)
    // all-NULL coordinates also fall back (rows exist but min/max are
    // NULL — getDouble would NPE); res 0 keeps the join correct-empty
    if (n == 0 || r.isNullAt(1)) return 0
    val w = math.max(r.getDouble(2) - r.getDouble(1), 1e-9)
    val h = math.max(r.getDouble(4) - r.getDouble(3), 1e-9)
    val ratio = 9.0 * (n / (w * h)) * 360.0 * 180.0 / math.max(target, 1L).toDouble
    val res = math.round(math.log(math.max(ratio, 1.0)) / math.log(4.0)).toInt
    math.min(math.max(res, 0), CellIndex.MaxRes)
  }

  /**
   * Returns one row per (probe, neighbor): probe columns + `__rank`,
   * `__dist`, and all train columns. Exact top-k per probe.
   */
  def join(probes: DataFrame, probeId: String, pLon: String, pLat: String,
           train: DataFrame, tLon: String, tLat: String, tId: String,
           k: Int, res: Int): DataFrame = {
    val dist = sqrt(
      (col(pLon) - col(tLon)) * (col(pLon) - col(tLon)) +
      (col(pLat) - col(tLat)) * (col(pLat) - col(tLat)))
    val probeCols = probes.columns.toSeq
    val trainPayload = train.columns.toSeq.filter(_ != tId)

    /**
     * One level: per-probe bounded top-k + exactness flag, ONE row per
     * probe (`__top` ascending (dist, trainId, ...payload) array).
     * The round-3 formulation ranked with three windows (row_number /
     * count / max), which shuffles EVERY candidate pair to its probe's
     * task and sorts there; the [[graft.functions.top_k]] aggregate
     * runs in ObjectHashAggregate with map-side partials — each mapper
     * ships at most k candidates per probe and nothing ever sorts the
     * full candidate set.
     */
    def stage(pending: DataFrame, resL: Int): DataFrame = {
      val cw = CellIndex.cellWidthDeg(resL)
      val ch = CellIndex.cellHeightDeg(resL)
      val n = 1L << resL
      // EXPLODE THE TRAIN SIDE, not the probes: probe p matches train t
      // iff t's cell lies in p's 3x3 disk, and the disk relation is
      // symmetric (d ∈ disk(c) ⇔ c ∈ disk(d) for the ±1 wrap-around
      // square), so exploding train's disk against the probe's OWN cell
      // yields the identical candidate pair set while multiplying the
      // (bounded) train relation x9 instead of the probe corpus — at
      // scale the probe side is the 100 TB side and never explodes
      // (guide §3.3: explode the small side of a join).
      // array_distinct: gridDisk wraps in lon, so at coarse levels
      // (n <= 3 cells across) the 3x3 disk repeats cells — duplicates
      // would double-count candidates and corrupt ranks
      val t = train.withColumn("__tcell", explode(array_distinct(
        cell_disk(cell_encode(col(tLon), col(tLat), resL), 1))))
      val p = pending
        .withColumn("__cell", cell_encode(col(pLon), col(pLat), resL))
        .withColumn("__tcell", col("__cell"))
      // Build-side choice is explicit: when the exploded train relation's
      // optimizer estimate fits a broadcast comfortably, hint it — the
      // static estimates here (two subtrees of the same tiny source) are
      // too close for the planner to reliably pick the side that keeps
      // the PROBE relation streaming (a mis-pick serializes the whole
      // candidate expansion through the train scan's partitioning). Big
      // train falls through to the planner's shuffle join, as before.
      val tSmall = t.queryExecution.optimizedPlan.stats.sizeInBytes <=
        (8L << 20)
      val cand = (if (tSmall) p.join(broadcast(t), Seq("__tcell"))
                  else p.join(t, Seq("__tcell"))).withColumn("__dist", dist)
      // (dist, trainId) lead the struct: the heap's lexicographic order
      // is the ranking order, trainId the unique deterministic breaker
      val item = struct((col("__dist").as("__dist") +: col(tId).as(tId) +:
        trainPayload.map(c => col(c).as(c))): _*)
      val agged = cand.groupBy(probeCols.map(col): _*)
        .agg(top_k(item, k).as("__top"), count(lit(1)).as("__n"))
      // planar distance from the probe to the edge of its 3x3 disk: the
      // disk spans [ (ix-1)*cw, (ix+2)*cw ) x [ (iy-1)*ch, (iy+2)*ch );
      // world-clipped edges are unbounded (no training point lies beyond)
      val ix = fdiv(floor((col(pLon) + 180.0) / cw), 1L) // floor as long
      val iy = fdiv(floor((col(pLat) + 90.0) / ch), 1L)
      val lonIn = col(pLon) + 180.0
      val latIn = col(pLat) + 90.0
      val margin = least(
        when(ix - 1 < 0, lit(Double.PositiveInfinity)).otherwise(lonIn - (ix - 1).cast("double") * cw),
        when(ix + 2 > n, lit(Double.PositiveInfinity)).otherwise((ix + 2).cast("double") * cw - lonIn),
        when(iy - 1 < 0, lit(Double.PositiveInfinity)).otherwise(latIn - (iy - 1).cast("double") * ch),
        when(iy + 2 > n, lit(Double.PositiveInfinity)).otherwise((iy + 2).cast("double") * ch - latIn))
      agged
        .withColumn("__kth", element_at(col("__top"), size(col("__top"))).getField("__dist"))
        .withColumn("__safe",
          // at res 0 the single world cell IS the disk -> always exact
          if (resL == 0) lit(true) else col("__n") >= k && col("__kth") <= margin)
    }

    /** Explode a safe level frame back to one row per (probe, rank). */
    def expand(safe: DataFrame): DataFrame =
      safe.select(probeCols.map(col) :+ posexplode(col("__top")): _*)
        .withColumn("__rank", col("pos") + 1)
        .select(probeCols.map(col) ++ Seq(col("__rank"), col("col").getField("__dist").as("__dist"),
          col("col").getField(tId).as(tId)) ++
          trainPayload.map(c => col("col").getField(c).as(c)): _*)

    // Scan parallelism floor: a probe relation read from one small file
    // (or any source with fewer splits than cores) would serialize the
    // candidate expansion + partial top-k through its scan tasks. One
    // cheap hash repartition on the unique probe id fixes the fan-out;
    // sources already wider than the session's parallelism pass through
    // untouched (scale-adaptive: defaultParallelism, never a constant).
    val parallel = probes.sparkSession.sparkContext.defaultParallelism
    val pending0 =
      if (probes.queryExecution.toRdd.getNumPartitions < parallel)
        probes.repartition(parallel, col(probeId))
      else probes
    var pending = pending0
    var resL = res
    val acc = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var done = false
    while (!done) {
      // persisted: the level frame (ONE row per probe) feeds BOTH the
      // output branch and the next level's pending anti join. Tracked
      // in Caches so a long session releases the level frames.
      val marked = graft.plans.Caches.track(stage(pending, resL))
      acc += expand(marked.where(col("__safe")))
      if (resL == 0) done = true
      else {
        val safeIds = marked.where(col("__safe")).select(col(probeId))
        // probes with ZERO candidates at this level have no marked rows
        // and stay pending via the anti join
        pending = graft.plans.Caches.track(pending.join(safeIds, Seq(probeId), "left_anti"))
        if (pending.isEmpty) done = true else resL = math.max(0, resL - 2)
      }
    }
    acc.reduce(_ unionByName _)
  }

  /**
   * Feature aggregation over the k neighbors (transformers.py:182-283):
   * weighted mean of `yCol` — uniform or inverse-distance weights; any
   * ZERO-distance neighbor short-circuits to the average of the
   * coincident neighbors (sklearn/reference semantics).
   */
  def meanFeature(knn: DataFrame, probeId: String, yCol: String,
                  weighting: String = "distance", out: String = "knn_y"): DataFrame = {
    val grouped = knn.groupBy(col(probeId))
    weighting match {
      case "uniform" => grouped.agg(avg(col(yCol)).as(out))
      case "distance" =>
        grouped.agg(
          (sum(when(col("__dist") === 0.0, col(yCol)))).as("__zsum"),
          count(when(col("__dist") === 0.0, 1)).as("__zn"),
          // zero-distance rows excluded here (ANSI divide-by-zero); the
          // __zn branch takes over when any exist
          sum(when(col("__dist") =!= 0.0, col(yCol) / col("__dist"))).as("__wsum"),
          sum(when(col("__dist") =!= 0.0, lit(1.0) / col("__dist"))).as("__wtot"))
          .withColumn(out,
            when(col("__zn") > 0, col("__zsum") / col("__zn"))
              .otherwise(col("__wsum") / col("__wtot")))
          .drop("__zsum", "__zn", "__wsum", "__wtot")
    }
  }

  /**
   * CALLABLE weighting — the engine analogue of the reference's
   * weights-callable surface (transformers.py:235-283 passes `weights`
   * straight to sklearn's KNeighborsRegressor, which accepts a callable
   * mapping the neighbor-distance array to weights): `weight` maps the
   * distance Column to a weight Column, pure Column arithmetic, so a
   * user kernel (gaussian `d => exp(-d*d/h2)`, tricube, rank-free
   * integer weights...) stays inside WholeStageCodegen — no UDF.
   * Weighted mean = sum(w*y)/sum(w) per probe, one hash-agg shuffle
   * with map-side partials. The weight function owns the zero-distance
   * policy (the built-in "distance" mode's exact-hit rule lives in
   * [[meanFeature]]); oracle-exactness requires integral weights (sums
   * of floats are combine-order-dependent — q71 uses floor weights).
   */
  def meanFeatureWith(knn: DataFrame, probeId: String, yCol: String,
                      weight: Column => Column, out: String = "knn_y"): DataFrame = {
    val w = weight(col("__dist"))
    knn.groupBy(col(probeId))
      .agg(sum(w * col(yCol)).as("__wsum"), sum(w).as("__wtot"))
      .withColumn(out, col("__wsum") / col("__wtot"))
      .drop("__wsum", "__wtot")
  }

  /** [[modeFeature]] with a callable vote weight (same contract as
    * [[meanFeatureWith]]). */
  def modeFeatureWith(knn: DataFrame, probeId: String, yCol: String,
                      weight: Column => Column, out: String = "knn_y"): DataFrame = {
    val votes = knn.groupBy(col(probeId), col(yCol))
      .agg(sum(weight(col("__dist"))).as("__votes"))
    votes.groupBy(col(probeId))
      .agg(top_k(struct((-col("__votes")).as("__nv"), col(yCol).as(yCol)), 1).as("__top"))
      .select(col(probeId), element_at(col("__top"), 1).getField(yCol).as(out))
  }

  /**
   * Weighted MODE of a categorical `yCol` over the k neighbors; ties
   * break toward the smallest category (scipy.stats.mode semantics the
   * reference inherits).
   */
  def modeFeature(knn: DataFrame, probeId: String, yCol: String,
                  weighting: String = "uniform", out: String = "knn_y"): DataFrame = {
    val wcol = weighting match {
      case "uniform" => lit(1.0)
      case "distance" => when(col("__dist") === 0.0, lit(1e18)).otherwise(lit(1.0) / col("__dist"))
    }
    val votes = knn.groupBy(col(probeId), col(yCol)).agg(sum(wcol).as("__votes"))
    // top-1 under (votes DESC, category ASC) via the bounded-heap
    // aggregate — hash agg with partials, no rank window
    votes.groupBy(col(probeId))
      .agg(top_k(struct((-col("__votes")).as("__nv"), col(yCol).as(yCol)), 1).as("__top"))
      .select(col(probeId), element_at(col("__top"), 1).getField(yCol).as(out))
  }

  /**
   * GeoDistTransformer (transformers.py:286-355): distance columns from
   * each row to m reference points (tiny broadcast refs folded into
   * literal columns), optional log.
   */
  def geoDist(df: DataFrame, xCol: String, yCol: String,
              refs: Seq[(Double, Double)], log: Boolean = false): DataFrame =
    refs.zipWithIndex.foldLeft(df) { case (d, ((rx, ry), i)) =>
      val dist = dist_to(col(xCol), col(yCol), rx, ry)
      d.withColumn(s"geodist_$i", if (log) org.apache.spark.sql.functions.log(dist) else dist)
    }

  /** Candidate-cell resolution whose cell HEIGHT covers `radius`
    * degrees (the [[Points]] thinning rule): a 3×3 disk at this level
    * then contains every point within `radius` of a cell center. */
  def radiusRes(radius: Double): Int = math.max(0, math.min(28,
    (math.log(180.0 / radius) / math.log(2.0)).floor.toInt))

  /**
   * Inverse-distance-weighted gridding (gdal_grid `invdist` analogue):
   * scattered observations interpolate onto the raster grid `g` —
   * every cell center averages the observations within `radius`,
   * weighted by 1/(d² + smooth) (gdal's smoothing keeps the weight
   * finite when an observation sits ON a center). Cells with no
   * observation in range stay NULL (nodata), like gdal.
   *
   * Scale shape: observations bucket to cover cells ONCE; each grid
   * cell explodes its 3×3 cell disk at [[radiusRes]] (cell height ≥
   * radius, so the disk covers the search circle) into a cell-keyed
   * equi-join — never a crossJoin, shuffles keyed by cell id exactly
   * like [[join]]. One (row, col) hash-agg finishes.
   *
   * Exactness: weights quantize to LONGs — `floor(scale / (d² +
   * smooth))` — and observation values are integral by the engine's
   * raster convention, so numerator and denominator are ORDER-FREE
   * integer sums in any engine and the one final division is
   * deterministic. `scale`=1e9 with `smooth`=0.01 bounds a weight at
   * 1e11, leaving ~10⁷ × max|v| of Σ-headroom in the LONG.
   */
  def idw(points: DataFrame, xCol: String, yCol: String, vCol: String,
          g: graft.core.GridMeta, radius: Double,
          smooth: Double = 0.01, scale: Double = 1.0e9): DataFrame = {
    val spark = points.sparkSession
    val res = radiusRes(radius)
    val obs = points.select(
      cell_encode(col(xCol), col(yCol), res).as("cellkey"),
      col(xCol).as("__px"), col(yCol).as("__py"),
      col(vCol).cast("long").as("__v"))
    val cells = graft.sources.RasterStack.grid(spark, g)
      .withColumn("__x", grid_x(col("row"), col("col"), g))
      .withColumn("__y", grid_y(col("row"), col("col"), g))
    val probes = cells
      .withColumn("cellkey", explode(array_distinct(
        cell_disk(cell_encode(col("__x"), col("__y"), res), 1))))
    val dx = col("__x") - col("__px")
    val dy = col("__y") - col("__py")
    val d2 = dx * dx + dy * dy
    val wq = floor(lit(scale) / (d2 + lit(smooth))).cast("long")
    val hits = probes.join(obs, Seq("cellkey"))
      .where(d2 <= lit(radius * radius))
      .groupBy(col("row"), col("col"))
      .agg(count(lit(1)).as("n_obs"), sum(wq).as("wsum"),
        sum(wq * col("__v")).as("num"))
    cells.select("row", "col")
      .join(hits, Seq("row", "col"), "left_outer")
      .select(col("row"), col("col"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("wsum"),
        (col("num").cast("double") / col("wsum").cast("double")).as("idw"))
  }

  /** SQL twin of [[idw]] — brute-force over the (small) oracle grid:
    * same distance, gate, quantized weights and single division. */
  def idwSql(ptsRel: String, gridRel: String, xExpr: String, yExpr: String,
             radius: Double, smooth: Double = 0.01,
             scale: Double = 1.0e9): String = {
    val sc = graft.sources.OracleLit.d(scale)
    val sm = graft.sources.OracleLit.d(smooth)
    val r2 = graft.sources.OracleLit.d(radius * radius)
    s"""WITH cg AS (SELECT row, col, $xExpr AS x, $yExpr AS y FROM $gridRel),
       |hits AS (
       |  SELECT cg.row, cg.col, COUNT(*) AS n_obs,
       |    CAST(SUM(CAST(FLOOR($sc / (((cg.x - p.px) * (cg.x - p.px) +
       |      (cg.y - p.py) * (cg.y - p.py)) + $sm)) AS BIGINT)) AS BIGINT) AS wsum,
       |    CAST(SUM(CAST(FLOOR($sc / (((cg.x - p.px) * (cg.x - p.px) +
       |      (cg.y - p.py) * (cg.y - p.py)) + $sm)) AS BIGINT) * p.v) AS BIGINT) AS num
       |  FROM cg JOIN $ptsRel p
       |    ON ((cg.x - p.px) * (cg.x - p.px) + (cg.y - p.py) * (cg.y - p.py)) <= $r2
       |  GROUP BY 1, 2)
       |SELECT cg.row, cg.col, COALESCE(h.n_obs, 0) AS n_obs, h.wsum,
       |  CAST(h.num AS DOUBLE) / CAST(h.wsum AS DOUBLE) AS idw
       |FROM cg LEFT JOIN hits h ON h.row = cg.row AND h.col = cg.col""".stripMargin
  }
}
