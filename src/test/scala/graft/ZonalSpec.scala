package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Zonal

/** Zonal statistics vs a driver-side twin: per-zone count/sum/mean/
  * min/max with per-band nulls and a NULL (unassigned) zone. */
class ZonalSpec extends AnyFunSuite with SparkSpec {

  test("stats equal the scalar twin; NULL zones dropped; nulls skipped per band") {
    import spark.implicits._
    val rows = Seq(
      // (zone, b1, b2)
      (Some(1), Some(10.0), Some(1.0)),
      (Some(1), Some(20.0), None),
      (Some(1), None, Some(3.0)),
      (Some(2), Some(5.0), Some(7.0)),
      (None, Some(99.0), Some(99.0)), // unassigned pixel: dropped
      (Some(3), None, None))          // zone with all-null bands
    val df = rows.toDF("zone", "b1", "b2")
    val got = Zonal.stats(df, "zone", Seq("b1", "b2"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet === Set(1, 2, 3))
    val z1 = got(1)
    assert(z1.getLong(1) === 2L)            // b1_cnt
    assert(z1.getLong(2) === 30L)           // b1_sum
    assert(z1.getDouble(3) === 15.0)        // b1_mean
    assert(z1.getDouble(4) === 10.0 && z1.getDouble(5) === 20.0)
    assert(z1.getLong(6) === 2L && z1.getLong(7) === 4L) // b2: cnt, sum
    assert(z1.getDouble(8) === 2.0)
    val z3 = got(3)
    assert(z3.getLong(1) === 0L && z3.isNullAt(2) && z3.isNullAt(3))
    assert(z3.isNullAt(4) && z3.isNullAt(5))
  }

  test("quantiles equal the linear-interpolation twin") {
    import spark.implicits._
    val df = Seq((1, 1.0), (1, 2.0), (1, 3.0), (1, 10.0),
                 (2, 5.0), (2, 7.0)).toDF("zone", "b1")
    val got = Zonal.quantiles(df, "zone", Seq("b1"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    def q(vs: Seq[Double], p: Double): Double = {
      val pos = p * (vs.size - 1)
      val lo = pos.toInt
      if (lo == vs.size - 1) vs(lo)
      else vs(lo) + (pos - lo) * (vs(lo + 1) - vs(lo))
    }
    val v1 = Seq(1.0, 2.0, 3.0, 10.0)
    assert(got(1) === ((q(v1, 0.5), q(v1, 0.25), q(v1, 0.75))))
    assert(got(2) === ((6.0, 5.5, 6.5)))
  }

  test("proximity: nearest-feature distance equals brute force with id tie-break") {
    import spark.implicits._
    // 12x12 degree patch, features on a sparse lattice
    val px = (for { r <- 0 until 12; c <- 0 until 12 }
      yield (r.toLong * 12 + c, r.toLong, c.toLong, c - 6.0, r - 6.0))
      .toDF("pix", "prow", "pcol", "x", "y")
    val feats = (for { r <- 0 until 12; c <- 0 until 12
                       if (r * 5 + c * 3) % 11 == 0 }
      yield (r.toLong * 12 + c, c - 6.0, r - 6.0)).toDF("fid", "fx", "fy")
    val got = graft.operators.KNN.proximity(
      px, "pix", "x", "y", feats, "fx", "fy", "fid", res = 5)
      .select("pix", "dist", "near_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    graft.plans.Caches.flush()
    val fs = (for { r <- 0 until 12; c <- 0 until 12
                    if (r * 5 + c * 3) % 11 == 0 }
      yield (r.toLong * 12 + c, c - 6.0, r - 6.0))
    assert(got.size === 144)
    for (r <- 0 until 12; c <- 0 until 12) {
      val (x, y) = (c - 6.0, r - 6.0)
      val best = fs.map { case (fid, fx, fy) =>
        (math.sqrt((x - fx) * (x - fx) + (y - fy) * (y - fy)), fid)
      }.min // (dist, id) lexicographic = engine heap order
      assert(got(r.toLong * 12 + c) === ((best._1, best._2)), s"($r,$c)")
    }
  }

  test("idw gridding equals brute force (quantized weights, nodata cells NULL)") {
    import spark.implicits._
    import graft.core.GridMeta
    // 8x8 1-degree grid over [0,8)^2; observations clustered lower-left
    // so some cells are out of the 2.5-degree radius -> NULL idw
    val g = GridMeta.northUp(0.0, 0.0, 8.0, 8.0, width = 8, height = 8)
    val pts = Seq((0.7, 0.9, 5L), (1.3, 2.1, 11L), (2.9, 0.4, 2L),
      (3.5, 3.5, 22L), (0.1, 3.9, 7L))
    val got = graft.operators.KNN.idw(
        pts.toDF("px", "py", "v").withColumn("v", col("v").cast("double")),
        "px", "py", "v", g, radius = 2.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    graft.plans.Caches.flush()
    assert(got.size === 64)
    var sawNull = false
    for (r <- 0 until 8; c <- 0 until 8) {
      val x = 0.5 + c; val y = 8.0 - (0.5 + r) // north-up centers
      val hits = pts.map { case (px, py, v) =>
        val d2 = (x - px) * (x - px) + (y - py) * (y - py)
        (d2, v)
      }.filter(_._1 <= 2.5 * 2.5)
      val (n, ws, idw) = got((r.toLong, c.toLong))
      assert(n === hits.size.toLong, s"($r,$c) n_obs")
      if (hits.isEmpty) { assert(ws.isEmpty && idw.isEmpty); sawNull = true }
      else {
        val wqs = hits.map { case (d2, v) =>
          (math.floor(1.0e9 / (d2 + 0.01)).toLong, v) }
        assert(ws === Some(wqs.map(_._1).sum), s"($r,$c) wsum")
        assert(idw === Some(wqs.map(p => p._1 * p._2).sum.toDouble /
          wqs.map(_._1).sum.toDouble), s"($r,$c) idw")
      }
    }
    assert(sawNull, "fixture must exercise out-of-range (nodata) cells")
  }

  test("idw plan: cell-keyed equi-join only — no cartesian, no nested loop") {
    import spark.implicits._
    import graft.core.GridMeta
    val g = GridMeta.northUp(0.0, 0.0, 8.0, 8.0, width = 8, height = 8)
    val pts = Seq((0.7, 0.9, 5.0)).toDF("px", "py", "v")
    val plan = graft.operators.KNN.idw(pts, "px", "py", "v", g, radius = 2.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "idw must stay a cell-keyed equi-join:\n" + plan.take(800))
  }

  test("plan is one hash aggregate: no sort, no window, no join") {
    import spark.implicits._
    val df = Seq((1, 2.0)).toDF("zone", "b1")
    val plan = Zonal.stats(df, "zone", Seq("b1"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(300))
    assert(!plan.contains("SortAggregate") && !plan.contains("Window") &&
      !plan.contains("Join"), plan.take(500))
  }
}
