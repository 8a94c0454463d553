package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Contour

/** Marching-squares segments vs a driver-side scalar twin (same table,
  * same shared-Ar interpolation — the spec proves the distributed
  * plumbing: window gather, case dispatch, explode emission). */
class ContourSpec extends AnyFunSuite with SparkSpec {

  private val H = 9
  private val W = 11
  // reuse the FocalSpec surface: values 0..28 with a nodata stripe
  private def valueAt(r: Int, c: Int): Option[Long] =
    if ((r * 3 + c * 5) % 13 == 0) None else Some(((r * 17 + c * 7) % 29).toLong)

  private def scalarSegments(level: Double): Seq[(Int, Int, Int, Double, Double, Double, Double)] = {
    import graft.operators.Utm.DblAr
    val out = Seq.newBuilder[(Int, Int, Int, Double, Double, Double, Double)]
    for (r <- 0 until H - 1; c <- 0 until W - 1) {
      val cs = Seq(valueAt(r, c), valueAt(r, c + 1),
        valueAt(r + 1, c + 1), valueAt(r + 1, c))
      if (cs.forall(_.isDefined)) {
        val Seq(z1, z2, z3, z4) = cs.map(_.get)
        def in(z: Long) = z.toDouble >= level
        val bits = (if (in(z1)) 8 else 0) + (if (in(z2)) 4 else 0) +
          (if (in(z3)) 2 else 0) + (if (in(z4)) 1 else 0)
        val cin = (z1 + z2 + z3 + z4).toDouble >= 4.0 * level
        val tOf: Map[Int, Double] = Map(
          0 -> (z1, z2), 1 -> (z2, z3), 2 -> (z4, z3), 3 -> (z1, z4))
          .collect { case (e, (za, zb)) if in(za) != in(zb) =>
            e -> Contour.interp[Double](level, za.toDouble, zb.toDouble)(DblAr)
          }
        Contour.Segs.toMap.get(bits).foreach { case (inS, outS) =>
          val segs = if (cin) inS else outS
          segs.zipWithIndex.foreach { case ((ea, eb), i) =>
            val (ax, ay) = Contour.endpoint[Double](ea, r.toDouble, c.toDouble, tOf)(DblAr)
            val (bx, by) = Contour.endpoint[Double](eb, r.toDouble, c.toDouble, tOf)(DblAr)
            out += ((r, c, i, ax, ay, bx, by))
          }
        }
      }
    }
    out.result()
  }

  private def run(level: Double): Seq[(Int, Int, Int, Double, Double, Double, Double)] = {
    import spark.implicits._
    val px = (for { r <- 0 until H; c <- 0 until W }
      yield (r.toLong, c.toLong, valueAt(r, c).map(_.toDouble)))
      .toDF("row", "col", "b1")
    Contour.segments(px, "b1", level)
      .collect().map(x => (x.getLong(0).toInt, x.getLong(1).toInt,
        x.getLong(2).toInt, x.getDouble(3), x.getDouble(4),
        x.getDouble(5), x.getDouble(6))).toSeq
  }

  test("segments equal the scalar twin bit-for-bit at a generic level") {
    val lvl = 13.5
    val got = run(lvl).sortBy(s => (s._1, s._2, s._3))
    val want = scalarSegments(lvl).sortBy(s => (s._1, s._2, s._3))
    assert(got === want)
    assert(got.nonEmpty)
    // both saddle variants and a 2-segment cell must occur somewhere in
    // the sweep below, or the table is undertested — checked there
  }

  test("level sweep exercises every case id incl. both saddle variants") {
    val seen = scala.collection.mutable.Set.empty[Int]
    var twoSeg = false
    for (lvl <- Seq(3.5, 7.5, 13.5, 20.5, 24.5)) {
      val got = run(lvl).sortBy(s => (s._1, s._2, s._3))
      val want = scalarSegments(lvl).sortBy(s => (s._1, s._2, s._3))
      assert(got === want, s"level $lvl")
      // recover case ids from the scalar pass for coverage accounting
      for (r <- 0 until H - 1; c <- 0 until W - 1) {
        val cs = Seq(valueAt(r, c), valueAt(r, c + 1),
          valueAt(r + 1, c + 1), valueAt(r + 1, c))
        if (cs.forall(_.isDefined)) {
          val Seq(z1, z2, z3, z4) = cs.map(_.get)
          def in(z: Long) = z.toDouble >= lvl
          val bits = (if (in(z1)) 8 else 0) + (if (in(z2)) 4 else 0) +
            (if (in(z3)) 2 else 0) + (if (in(z4)) 1 else 0)
          seen += bits
          if (bits == 5 || bits == 10) twoSeg = true
        }
      }
    }
    assert(seen.intersect((1 to 14).toSet).size >= 12,
      s"level sweep covered too few cases: ${seen.toSeq.sorted}")
    assert(twoSeg, "no saddle cell in the sweep")
  }

  test("endpoints lie on the iso level (geometric sanity)") {
    val lvl = 13.5
    // interpolated endpoint coordinates must be strictly inside the
    // crossed edge (t in (0,1)): integral corners, fractional level
    for ((r, c, _, ax, ay, bx, by) <- run(lvl)) {
      for ((x, y) <- Seq((ax, ay), (bx, by))) {
        assert(x >= c && x <= c + 1 && y >= r && y <= r + 1,
          s"endpoint ($x,$y) escapes cell ($r,$c)")
        // every endpoint sits ON an edge: one coordinate integral, and
        // (fractional level, integral corners) makes the other strictly
        // interior — t in (0,1)
        val onVEdge = x == x.floor && (x == c || x == c + 1)
        val onHEdge = y == y.floor && (y == r || y == r + 1)
        assert(onVEdge || onHEdge, s"endpoint ($x,$y) not on an edge of ($r,$c)")
        if (onVEdge && !onHEdge) assert(y > r && y < r + 1)
        if (onHEdge && !onVEdge) assert(x > c && x < c + 1)
      }
    }
  }
}
