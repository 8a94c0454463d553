package graft

import org.apache.spark.sql.functions._
import graft.functions.{one_hot, one_hot_auto}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GridMeta, Polygon, PolygonSet}
import graft.operators.{Extract, Naming, Predict, Rasterize, Stack}
import graft.queries.StackQueries
import graft.sources.{Fixtures, RasterStack}

class StackSpec extends AnyFunSuite with SparkSpec {

  lazy val st: Stack = StackQueries.stack(spark)
  val G: GridMeta = StackQueries.G

  test("naming: sanitize + dedup mirror the reference (_make_name / _fix_names)") {
    assert(Naming.sanitize("my layer.1-x") === "my_layer_1_x")
    assert(Naming.sanitize("7band") === "x7band")
    assert(Naming.dedup(Seq("a", "b", "a", "a")) === Seq("a", "b", "a_1", "a_2"))
    assert(Naming.dedup(Seq("a", "a_1", "a")) === Seq("a", "a_1", "a_2"))
  }

  test("select/drop/iloc/rename keep schema and layer list consistent") {
    val s2 = st.select(Seq("b1", "b4"))
    assert(s2.layers === Seq("b1", "b4"))
    assert(s2.df.columns.toSeq === Seq("row", "col", "b1", "b4"))
    val s3 = st.drop(Seq("b2"))
    assert(s3.layers === Seq("b1", "b3", "b4", "b5", "b7"))
    assert(st.iloc(Seq(0, 5)).layers === Seq("b1", "b7"))
    val s4 = st.rename(Map("b1" -> "blue band"))
    assert(s4.layers.head === "blue_band")
    intercept[IllegalArgumentException](st.select(Seq("nope")))
  }

  test("append dedups names with _1 suffixes and zip-joins on (row,col)") {
    val ap = st.select(Seq("b1")).append(st.select(Seq("b1", "b2")))
    assert(ap.layers === Seq("b1", "b1_1", "b2"))
    // aligned zip: b1 == b1_1 everywhere
    assert(ap.df.where(!(col("b1") <=> col("b1_1"))).count() === 0)
    assert(ap.df.count() === G.cells)
  }

  test("withLayer replaces in place") {
    val s2 = st.withLayer("b1", col("b1") * 2.0)
    assert(s2.layers === st.layers)
    assert(s2.df.where(col("row") === 7 && col("col") === 7).select("b1").collect()(0).getDouble(0)
      === st.df.where(col("row") === 7 && col("col") === 7).select("b1").collect()(0).getDouble(0) * 2.0)
  }

  test("crop: window pixel count matches the bounds window; transform rebased") {
    val c = st.crop(-30.7, -20.3, 40.9, 25.1)
    assert(c.df.count() === c.meta.cells)
    assert(c.meta.width < G.width && c.meta.height < G.height)
    // world coordinate of pixel (0,0) in crop == original pixel at window offset
    val r0 = math.max(G.row(-30.7, 25.1), 0L)
    val c0 = math.max(G.col(-30.7, 25.1), 0L)
    assert(math.abs(c.meta.x(0, 0) - G.x(r0, c0)) < 1e-9)
  }

  test("mask + mask(invert) partition the valid set (tests/test_mask.py analogue)") {
    val total = st.df.agg(count(col("b1"))).collect()(0).getLong(0)
    val in = st.mask(Fixtures.Polys).df.agg(count(col("b1"))).collect()(0).getLong(0)
    val out = st.mask(Fixtures.Polys, invert = true).df.agg(count(col("b1"))).collect()(0).getLong(0)
    assert(in + out === total)
    assert(in > 0 && out > 0)
  }

  test("mask and rasterize honor polygon HOLES (donut: hole pixels excluded)") {
    import graft.core.{Polygon, PolygonSet}
    val donut = Polygon(0,
      Array((-60.0, -40.0), (40.0, -40.0), (40.0, 40.0), (-60.0, 40.0)),
      Array(Array((-20.0, -10.0), (10.0, -10.0), (10.0, 20.0), (-20.0, 20.0))))
    val set = PolygonSet(IndexedSeq(donut))
    val masked = st.mask(set, cropToShapes = false)
    def b1At(lon: Double, lat: Double): Option[Double] = {
      val r = masked.df.where(col("row") === G.row(lon, lat) && col("col") === G.col(lon, lat))
        .select("b1").collect()
      if (r.isEmpty || r(0).isNullAt(0)) None else Some(r(0).getDouble(0))
    }
    assert(b1At(-40.0, 30.0).isDefined, "shell interior must survive the mask")
    assert(b1At(-5.0, 5.0).isEmpty, "hole interior must be masked out")
    assert(b1At(100.0, -50.0).isEmpty, "outside must be masked out")
    // center-fill rasterization excludes the hole's interior pixels too
    val filled = graft.operators.Rasterize(spark, set, G, allTouched = false)
      .select("row", "col").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filled.contains((G.row(-40.0, 30.0), G.col(-40.0, 30.0))))
    assert(!filled.contains((G.row(-5.0, 5.0), G.col(-5.0, 5.0))))
  }

  test("intersect: valid count equals pixels where NO layer is null (tests/test_intersect.py analogue)") {
    val i = st.intersect
    val c1 = i.df.agg(count(col("b1"))).collect()(0).getLong(0)
    val expected = st.df.where(st.layers.map(col(_).isNotNull).reduce(_ && _)).count()
    assert(c1 === expected)
    // all layers share the valid count after intersect
    val c7 = i.df.agg(count(col("b7"))).collect()(0).getLong(0)
    assert(c7 === c1)
  }

  test("aggregate: output grid shape + scaled transform (raster.py:1868-1979)") {
    val a = st.aggregate(16, 20, "avg")
    assert(a.df.count() === 16L * 20L)
    assert(math.abs(a.meta.a - G.a * G.width / 20.0) < 1e-12)
  }

  test("scale: standardized layers have ~0 mean and ~1 std") {
    val sc = st.select(Seq("b1")).scale()
    val r = sc.df.agg(avg(col("b1")), stddev_pop(col("b1"))).collect()(0)
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }

  test("sample: n valid rows, deterministic across runs (raster.py:2196-2243 contract)") {
    val s1 = st.sample(50, seed = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s2 = st.sample(50, seed = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(s1 === s2)
    assert(s1.size === 50)
    val s3 = st.sample(50, seed = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(s1 !== s3)
  }

  test("stratified sample: exactly `size` per stratum (raster.py:2244-2287)") {
    val s = st.sampleStrata(RasterStack.strata(spark, G), 10, seed = 5)
    val counts = s.groupBy("stratum").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set(0, 1, 2, 3, 4, 5))
    assert(counts.values.forall(_ === 10L))
  }

  test("stratified sample with replacement: `size` draws per stratum, deterministic, valid pixels only") {
    val s = st.sampleStrataWithReplacement(RasterStack.strata(spark, G), 15, seed = 3)
    val counts = s.groupBy("stratum").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set(0, 1, 2, 3, 4, 5))
    assert(counts.values.forall(_ === 15L)) // draws, not distinct rows
    // deterministic across plans
    val again = st.sampleStrataWithReplacement(RasterStack.strata(spark, G), 15, seed = 3)
    assert(s.select("row", "col", "stratum", "draw_idx").collect().toSet ===
      again.select("row", "col", "stratum", "draw_idx").collect().toSet)
    // all drawn pixels have every layer valid
    assert(s.where(st.layers.map(col(_).isNull).reduce(_ || _)).count() === 0)
  }

  test("aggregate nearest: center-lattice pick, broadcast probe, matches scalar decimation") {
    val a = st.aggregate(25, 30, "nearest")
    assert(a.meta.height === 25 && a.meta.width === 30)
    val got = a.df.select("row", "col", "b1").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size === 750)
    val src = st.df.select("row", "col", "b1").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val (h, w) = (st.meta.height.toLong, st.meta.width.toLong)
    for (or <- 0L until 25L; oc <- 0L until 30L) {
      val sr = (2 * or * h + h) / (2 * 25); val sc = (2 * oc * w + w) / (2 * 30)
      assert(got((or, oc)) === src((sr, sc)), s"out ($or,$oc) <- src ($sr,$sc)")
    }
    // the lattice probe must broadcast (source streamed, never shuffled)
    val plan = a.df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"), plan.take(600))
  }

  test("sampleStrataWithReplacement: one bounded top_k aggregate, no window") {
    val s = st.sampleStrataWithReplacement(RasterStack.strata(spark, G), 15, seed = 3)
    val opt = s.queryExecution.optimizedPlan.toString
    val phys = s.queryExecution.executedPlan.toString
    // the stratum prefix is the bounded-heap aggregate (map-side
    // partials, ≤ 8·size rows per stratum per mapper); draws are
    // element_at lookups — no rank window, no survivor/deficiency joins
    assert(opt.contains("bounded_top_k"), opt.take(800))
    assert(!opt.contains("Window"), opt.take(800))
    assert(phys.contains("ObjectHashAggregate"), phys.take(800))
  }

  test("predict constants: dict overrides a feature, unknown key errors (_prediction.py:5-58)") {
    val m = Predict.LinearModel(Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0), 0.0)
    val d = Predict.predict(st.df, st.layers, m, constantsMap = Map("b1" -> 99.0))
      .where(col("b2").isNotNull && col("b3").isNotNull && col("b4").isNotNull &&
             col("b5").isNotNull && col("b7").isNotNull && col("b1").isNotNull)
    assert(d.select("pred_raw_0").distinct().collect().map(_.getDouble(0)).toSeq === Seq(99.0))
    intercept[IllegalArgumentException] {
      Predict.predict(st.df, st.layers, m, constantsMap = Map("nope" -> 1.0))
    }
  }

  test("extract lines (all_touched supercover): golden row count frozen + boundary superset of fixtures") {
    // boundary-only extraction = the reference's line extraction
    // (tests/test_extract.py:97 asserts an exact count; ours is frozen
    // from the deterministic fixture the same way)
    val lines = Rasterize(spark, Fixtures.Polys, G, allTouched = true)
    val n = lines.count()
    assert(n === 132242L, s"golden extract row count drifted: $n")
    // all-touched must be a superset of the centre-rule fill for rects
    val fill = Rasterize(spark, Fixtures.Polys, G, allTouched = false)
    assert(fill.join(lines, Seq("row", "col"), "left_anti").count() === 0)
  }

  test("extract_vector(polygons) golden: frozen row count + per-band means (extracted_pixels.txt analogue)") {
    // the reference asserts GRASS-extracted row counts and per-band means
    // (tests/test_extract.py:63-87); ours are frozen from the
    // deterministic fixture the same way
    val ex = Extract.vector(st, Fixtures.Polys, allTouched = false) // frozen center-fill kernel; default (all-touched) is oracle-checked by q18
    val r = ex.agg(
      count(lit(1)).as("n"),
      sum(col("b1")).as("s1"), count(col("b1")).as("c1"),
      sum(col("b7")).as("s7"), count(col("b7")).as("c7")).collect()(0)
    assert(r.getLong(0) === 130735L, "row count drifted")
    val meanB1 = r.getDouble(1) / r.getLong(2)
    val meanB7 = r.getDouble(3) / r.getLong(4)
    assert(math.abs(meanB1 - 127.50250205215634) < 1e-9, s"b1 mean drifted: $meanB1")
    assert(math.abs(meanB7 - 113.00512245751675) < 1e-9, s"b7 mean drifted: $meanB7")
  }

  test("extract lines: supercover along open polylines, oob cells clipped, axis-aligned shapes") {
    val ex = Extract.lines(st, Fixtures.Lines)
    assert(ex.count() > 0)
    assert(ex.where(col("row") < 0 || col("row") >= G.height ||
      col("col") < 0 || col("col") >= G.width).count() === 0)
    // horizontal L2 walks exactly one row; vertical L3 exactly one col
    assert(ex.where(col("line_id") === 2).select("row").distinct().count() === 1L)
    assert(ex.where(col("line_id") === 3).select("col").distinct().count() === 1L)
    // L4 exits the grid at x=120: its cells stop at the right edge
    assert(ex.where(col("line_id") === 4).count() > 0)
  }

  test("applyBatch: black-box batch iterator equals the declared-Column apply (NDVI)") {
    import spark.implicits._
    val declared = Predict.applyColumns(st.df,
      Seq("ndvi" -> when(col("b4") + col("b3") =!= 0.0, (col("b4") - col("b3")) / (col("b4") + col("b3")))),
      maskOn = Seq("b3", "b4"))
      .select("row", "col", "ndvi").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val batched = Predict.applyBatch(st.df, Seq("b3", "b4"), batchSize = 1000) { b =>
      (0 until b.size).iterator.map { i =>
        val b3 = b.features(0)(i); val b4 = b.features(1)(i)
        val v = if (b3.isNaN || b4.isNaN || b4 + b3 == 0.0) None else Some((b4 - b3) / (b4 + b3))
        (b.rows(i), b.cols(i), v)
      }
    }.collect().map { case (r, c, v) => (r, c) -> v }.toMap
    assert(batched === declared)
  }

  test("alter(fitted standard scaler) equals scale() bit-for-bit") {
    val st2 = st.select(Seq("b1", "b2"))
    val stats = st2.stats.collect()(0)
    def ms(n: String) = {
      val c = stats.getAs[Long](s"${n}_count").toDouble
      val s = stats.getAs[Double](s"${n}_sum"); val ss = stats.getAs[Double](s"${n}_sumsq")
      (s / c, math.sqrt((ss - s * s / c) / c))
    }
    val (m1, d1) = ms("b1"); val (m2, d2) = ms("b2")
    val alt = Predict.alter(st2, Predict.FittedStandardScaler(Array(m1, m2), Array(d1, d2)))
    val cols = Seq("row", "col", "b1", "b2").map(col)
    assert(alt.df.select(cols: _*).collect().toSet === st2.scale().df.select(cols: _*).collect().toSet)
  }

  test("one_hot_auto discovers categories like np.unique (preprocessing.py:35-38)") {
    val d = RasterStack.strata(spark, G)
    val auto = d.select(Seq(col("row"), col("col")) ++ one_hot_auto(d, "stratum", "stratum"): _*)
    val exp = d.select(Seq(col("row"), col("col")) ++
      one_hot(col("stratum"), "stratum", Seq(0L, 1L, 2L, 3L, 4L, 5L)): _*)
    assert(auto.columns.toSeq === exp.columns.toSeq)
    assert(auto.exceptAll(exp).count() === 0 && exp.exceptAll(auto).count() === 0)
  }

  test("mask(cropToShapes) trims the grid to the union extent (reference crop=True)") {
    val m = st.mask(Fixtures.Polys, cropToShapes = true)
    assert(m.meta.width < G.width && m.meta.height < G.height)
    assert(m.df.count() === m.meta.cells)
    // valid count unchanged by the crop (all inside-pixels are within the union bbox)
    val cropped = m.df.agg(count(col("b1"))).collect()(0).getLong(0)
    val uncropped = st.mask(Fixtures.Polys).df.agg(count(col("b1"))).collect()(0).getLong(0)
    assert(cropped === uncropped)
  }

  test("aggregate median/mode resampling modes") {
    val med = st.aggregate(16, 20, "median")
    assert(med.df.count() === 320)
    val mo = st.aggregate(16, 20, "mode")
    assert(mo.df.count() === 320)
    assert(mo.df.where(col("b1").isNotNull).count() > 0)
  }

  test("rasterize matches scalar center-in-polygon for a concave polygon") {
    val p = Polygon(0, Array((-50.0, -20.0), (10.0, -20.0), (10.0, 30.0), (-20.0, 5.0), (-50.0, 30.0)))
    val set = PolygonSet(IndexedSeq(p))
    val got = Rasterize(spark, set, G, allTouched = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // scalar reference: test every pixel center in the bbox
    val exp = (for {
      r <- 0L until G.height.toLong
      c <- 0L until G.width.toLong
      if p.contains(G.x(r, c), G.y(r, c))
    } yield (r, c)).toSet
    assert(got === exp)
    assert(exp.nonEmpty)
  }
}
