package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

import graft.core.GridMeta

/**
 * Column-function facade of the engine — the `org.apache.spark.sql.functions`
 * analogue for spatial/tiling primitives. Everything here returns plain
 * `Column`s built from codegen-friendly expressions, so queries composed
 * from these stay inside WholeStageCodegen.
 */
package object functions {

  private def col2(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def expr0(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftBridge.expression(c)

  /**
   * Integer FLOOR division on long columns (Spark's `Column./` is always
   * double division; SQL engines' `//` is floor division — this matches
   * the latter for negatives too).
   */
  def fdiv(a: Column, b: Long): Column = {
    val q = a.cast("long")
    val r = (q % b + b) % b // nonneg remainder -> (q - r) is an exact multiple of b
    col2(org.apache.spark.sql.catalyst.expressions.IntegralDivide(expr0(q - r), expr0(lit(b))))
  }

  /** Integral (truncating) division of two long columns — equals floor
    * division for NONNEGATIVE operands. Spark's `Column./` is double
    * division, which silently corrupts quotients of longs above 2^53. */
  def idiv(a: Column, b: Column): Column =
    col2(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expr0(a.cast("long")), expr0(b.cast("long"))))

  /** Hierarchical cell id of (lon, lat) at resolution res — Catalyst-native, codegen'd. */
  def cell_encode(lon: Column, lat: Column, res: Int): Column =
    col2(CellEncode(expr0(lon), expr0(lat), expr0(lit(res))))

  /** Ancestor cell at a coarser resolution. */
  def cell_parent(cell: Column, res: Int): Column =
    col2(CellParentAt(expr0(cell), expr0(lit(res))))

  /** Array of neighbor cells within Chebyshev distance k (for explode-based expansion). */
  def cell_disk(cell: Column, k: Int): Column =
    col2(CellDisk(expr0(cell), expr0(lit(k))))

  /** Page-derived point geometry from a stable 64-bit url hash. */
  def url_lon(url: Column): Column = col2(UrlLon(expr0(url)))
  def url_lat(url: Column): Column = col2(UrlLat(expr0(url)))

  /** Rolling polynomial document fingerprint (codegen'd single byte scan). */
  def text_fingerprint(text: Column): Column = col2(TextFingerprint(expr0(text)))

  /** Gopher-style repetition stats array (codegen'd single byte scan):
    * [n_words, n_distinct_words, max_word_count,
    *  n_bigrams, n_distinct_bigrams, max_bigram_count]. */
  def repetition_stats(text: Column): Column = col2(RepetitionStats(expr0(text)))

  /**
   * Bounded-heap top-k AGGREGATE: the k smallest `sortStruct` values
   * per group as an ascending array — the scale-safe replacement for
   * `row_number() OVER (PARTITION BY g ORDER BY ...) <= k` (which
   * shuffles and sorts EVERY candidate row per group): runs in
   * ObjectHashAggregate with map-side partials, so each mapper ships at
   * most k rows per group and no full per-group sort happens. Put a
   * unique tie-breaker in the struct for deterministic results.
   */
  def top_k(sortStruct: Column, k: Int): Column =
    col2(BoundedTopK(expr0(sortStruct), k).toAggregateExpression())

  // ---------------------------------------------------------------------
  // Affine grid arithmetic — pure built-in functions (already codegen'd),
  // floor semantics of rasterio.transform.rowcol (reference raster.py:2351).
  // North-up fast path avoids the full 2x2 inverse.
  // ---------------------------------------------------------------------

  /** World x/y -> grid column, FLOOR semantics. */
  def grid_col(x: Column, y: Column, g: GridMeta): Column =
    if (g.b == 0.0 && g.d == 0.0) floor((x - lit(g.c)) / lit(g.a)).cast("long")
    else {
      val det = g.a * g.e - g.b * g.d
      floor((lit(g.e) * (x - lit(g.c)) - lit(g.b) * (y - lit(g.f))) / lit(det)).cast("long")
    }

  /** World x/y -> grid row, FLOOR semantics. */
  def grid_row(x: Column, y: Column, g: GridMeta): Column =
    if (g.b == 0.0 && g.d == 0.0) floor((y - lit(g.f)) / lit(g.e)).cast("long")
    else {
      val det = g.a * g.e - g.b * g.d
      floor((lit(-g.d) * (x - lit(g.c)) + lit(g.a) * (y - lit(g.f))) / lit(det)).cast("long")
    }

  /** Grid (row, col) -> world x/y of the pixel CENTER. */
  def grid_x(row: Column, col: Column, g: GridMeta): Column =
    lit(g.a) * (col.cast("double") + lit(0.5)) + lit(g.b) * (row.cast("double") + lit(0.5)) + lit(g.c)
  def grid_y(row: Column, col: Column, g: GridMeta): Column =
    lit(g.d) * (col.cast("double") + lit(0.5)) + lit(g.e) * (row.cast("double") + lit(0.5)) + lit(g.f)

  /** In-bounds predicate for a (row, col) pair. */
  def in_bounds(row: Column, col: Column, g: GridMeta): Column =
    row >= 0L && row < g.height.toLong && col >= 0L && col < g.width.toLong

  /**
   * FRACTIONAL grid position of a world point relative to pixel
   * CENTERS (the interpolating warps' sampling coordinate: integer
   * values sit exactly on centers). North-up grids keep the historic
   * `(x - c) / a - 0.5` operation order (the warp oracles replay that
   * text exactly); rotated/sheared grids go through the full inverse
   * affine — the hazard this closes: the warp kernels used the
   * north-up shortcut UNCONDITIONALLY, silently mis-sampling any
   * b/d != 0 source grid.
   */
  def grid_colf(x: Column, y: Column, g: GridMeta): Column =
    if (g.b == 0.0 && g.d == 0.0) (x - lit(g.c)) / lit(g.a) - lit(0.5)
    else {
      val det = g.a * g.e - g.b * g.d
      (lit(g.e) * (x - lit(g.c)) - lit(g.b) * (y - lit(g.f))) / lit(det) - lit(0.5)
    }
  def grid_rowf(x: Column, y: Column, g: GridMeta): Column =
    if (g.b == 0.0 && g.d == 0.0) (y - lit(g.f)) / lit(g.e) - lit(0.5)
    else {
      val det = g.a * g.e - g.b * g.d
      (lit(-g.d) * (x - lit(g.c)) + lit(g.a) * (y - lit(g.f))) / lit(det) - lit(0.5)
    }

  /**
   * Tile id of pixel (row, col) for (th x tw) tiles, row-major with edge
   * clipping — the partition unit, Spark analogue of the reference's
   * block/window generator (reference raster.py:673-698).
   */
  def tile_id(row: Column, col: Column, g: GridMeta, th: Int, tw: Int): Column = {
    val tpr = graft.core.Tiles.tilesPerRow(g.width, tw)
    fdiv(row, th.toLong) * tpr + fdiv(col, tw.toLong)
  }

  // ---------------------------------------------------------------------
  // Mask (validity-set) algebra — np.ma mask ≙ SQL NULL
  // (reference rasterlayer.py:241-284, SURVEY.md §2.7).
  // ---------------------------------------------------------------------

  /** `a & b`: keep a where BOTH valid (mask intersection). */
  def mask_and(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null)).otherwise(a)

  /** `a | b`: fill gaps in a with b (mask union). */
  def mask_or(a: Column, b: Column): Column = coalesce(a, b)

  /** `a ^ b`: valid where exactly one is valid (mask symmetric difference). */
  def mask_xor(a: Column, b: Column): Column =
    when(a.isNotNull && b.isNotNull, lit(null)).otherwise(coalesce(a, b))

  // ---------------------------------------------------------------------
  // Feature generators (reference preprocessing.py / transformers.py).
  // ---------------------------------------------------------------------

  /** One-hot columns for the given categories (preprocessing.py:10-65). */
  def one_hot(c: Column, name: String, categories: Seq[Any]): Seq[Column] =
    categories.map(v =>
      when(c.isNull, lit(null)).otherwise(when(c === lit(v), 1).otherwise(0))
        .as(s"${name}_cat_$v"))

  /**
   * one_hot with AUTO category discovery — the reference's np.unique over
   * the layer (preprocessing.py:35-38): one distinct() aggregation
   * (map-side partial, tiny result) collected to the driver, then the
   * plain [[one_hot]] projection. Null categories are excluded (the
   * reference one-hots the valid data).
   */
  def one_hot_auto(df: org.apache.spark.sql.DataFrame, column: String, name: String): Seq[Column] = {
    val cats = df.select(col(column)).where(col(column).isNotNull).distinct()
      .collect().map(_.getAs[Number](0).longValue).sorted.toSeq
    one_hot(col(column), name, cats)
  }

  /** Rotated coordinate features x + tan(theta)*y for n angles in [0, 180) (preprocessing.py:114-157). */
  def rotated_coords(x: Column, y: Column, nAngles: Int): Seq[Column] = {
    (0 until nAngles).map { i =>
      val theta = math.Pi * i / nAngles
      (x + lit(math.tan(theta)) * y).as(s"angle_${i + 1}")
    }
  }

  /** Euclidean distance to a fixed reference point (preprocessing.py:207-239, transformers.py:286-355). */
  def dist_to(x: Column, y: Column, refX: Double, refY: Double): Column =
    sqrt((x - lit(refX)) * (x - lit(refX)) + (y - lit(refY)) * (y - lit(refY)))

  /** Aspect (degrees) -> easting/northing components (transformers.py:358-429). */
  def aspect_easting(deg: Column): Column = sin(radians(deg))
  def aspect_northing(deg: Column): Column = cos(radians(deg))
  /** Inverse: components -> degrees in [0, 360). */
  def aspect_degrees(easting: Column, northing: Column): Column =
    (degrees(atan2(easting, northing)) + lit(360.0)) % lit(360.0)

  // ---------------------------------------------------------------------
  // Deterministic seeded per-row hash for sampling (SURVEY.md §2.6) —
  // pure 63-bit-safe integer arithmetic, so the identical formula is
  // computable by the SQL oracle (no xxhash64 dependence).
  // ---------------------------------------------------------------------
  def sample_hash(key: Column, seed: Long): Column = {
    // Two LCG rounds; every intermediate stays < 2^63 for keys < 2^32,
    // so engines that ERROR on bigint overflow (the oracle) agree with
    // Spark's wrap-free result bit-for-bit.
    val r1 = (key.cast("long") * lit(1103515245L) + lit(seed % 2147483648L)) % lit(2147483648L)
    (r1 * lit(69069L) + lit(12345L)) % lit(2147483648L)
  }

  /**
   * Deterministic train/val/test assignment — the split step of a
   * training-data pipeline, reproducible across runs/engines and stable
   * under repartitioning because it keys on the RECORD ID, never on
   * partition or row position. Uses the avalanching hash (LCGs are
   * affine in the key, so sequential ids would stripe the splits;
   * [[graft.operators.Clump.avalanche31]] documents the failure).
   * `cuts` are cumulative percentages, e.g. Seq(80, 90) -> 0=train
   * (80%), 1=val (10%), 2=test (10%).
   */
  def split_assign(key: Column, cuts: Seq[Int], seed: Long): Column = {
    require(cuts.nonEmpty && cuts.head > 0 && cuts.last < 100 &&
      cuts.sliding(2).forall(p => p.size < 2 || p(0) < p(1)),
      s"cuts must be STRICTLY ascending in (0,100): $cuts")
    // fold the key into avalanche31's documented 31-bit-safe domain
    // FIRST: feeding a raw 64-bit id overflows its first multiply
    // (Spark wraps silently -> negative bucket -> everything lands in
    // split 0; DuckDB errors), so the mask is a correctness gate, not
    // hygiene. pmod keeps negatives in range in both engines.
    val folded = pmod(key.cast("long") + lit(seed), lit(2147483648L))
    val bucket = graft.operators.Clump.avalanche31(folded) % lit(100L)
    cuts.zipWithIndex.foldRight(lit(cuts.size.toLong)) { case ((cut, i), els) =>
      when(bucket < cut, i.toLong).otherwise(els)
    }
  }

  /** SQL twin of [[split_assign]] (the same pmod fold — DuckDB `%` is
    * sign-preserving like Spark's, so the double-mod spells pmod). */
  def split_assign_sql(key: String, cuts: Seq[Int], seed: Long): String = {
    val folded = s"((($key + $seed) % 2147483648 + 2147483648) % 2147483648)"
    val bucket = graft.operators.Clump.avalanche31Sql(folded) + " % 100"
    cuts.zipWithIndex.foldRight(s"CAST(${cuts.size} AS BIGINT)") {
      case ((cut, i), els) =>
        s"(CASE WHEN ($bucket) < $cut THEN CAST($i AS BIGINT) ELSE $els END)"
    }
  }
}
