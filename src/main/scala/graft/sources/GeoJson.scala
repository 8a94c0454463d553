package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * GeoJSON vector source — the engine's analogue of the reference
 * loading vector layers through geopandas (`gpd.read_file`, used by
 * every `extract_vector`/`mask` example): reads a FeatureCollection
 * into the tabular shapes the geometry operators consume, covering the
 * reference's full `extract_vector` geometry dispatch
 * (raster.py:2436-2458 branches on Polygon / Point / LineString):
 *
 *  - [[readPolygons]] -> rings table `(poly_id, xss, yss)` for
 *    [[graft.operators.SpatialJoin.pipJoinTableRings]] / rasterize;
 *  - [[readPoints]]   -> `(point_id, x, y)` probes for
 *    [[graft.operators.Extract.xy]] (one row per point; MultiPoint
 *    explodes);
 *  - [[readLines]]    -> `(line_id, xs, ys)` polylines for
 *    [[graft.operators.Rasterize.linesTable]] (one row per LineString
 *    part; MultiLineString explodes, keeping the feature id).
 *
 * Spark-first: the `coordinates` field is declared STRING in the read
 * schema (Spark's JSON reader captures the raw nested-array text), then
 * `from_json` parses it per geometry type. All Column arithmetic, no
 * driver-side JSON walking, so a 10M-feature layer parses distributed.
 *
 * GeoJSON closes polygon rings by repeating the first vertex; the
 * duplicate closing vertex is harmless to the even-odd fold (a
 * zero-length segment contributes no crossing) and is kept as-is.
 *
 * Feature ids: with `idProperty = Some(p)` (the default, `"id"`) EVERY
 * matching feature must carry an integer-castable `p` property — a
 * missing or non-numeric id RAISES instead of silently falling back to
 * the feature position (a mixed collection could collide explicit ids
 * with positional ones — ADVICE r4). Pass `idProperty = None` for
 * purely positional ids.
 */
object GeoJson {

  /** Read schema: features' geometry coordinates captured as raw text. */
  private val Schema = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", StringType))))))))))

  /** Exploded features: (fidx, f) rows. */
  private def features(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(Schema).json(path)
      .select(posexplode(col("features"))).toDF("fidx", "f")

  /** Loud-failure guard: a matching feature whose coordinates text did
    * not parse into the expected nesting (from_json -> NULL) RAISES
    * instead of silently dropping the geometry. */
  private def parsedOrRaise(parsed: Column, what: String): Column =
    when(parsed.isNotNull, parsed)
      .otherwise(raise_error(concat(
        lit(s"GeoJSON $what feature at position "), col("fidx").cast("string"),
        lit(" has malformed coordinates"))))

  /** Feature id column under the strict-or-positional contract above. */
  private def featureId(idProperty: Option[String]): Column = idProperty match {
    case Some(p) =>
      val pid = element_at(col("f.properties"), p).cast("int")
      coalesce(pid, raise_error(concat(
        lit(s"GeoJSON feature at position "), col("fidx").cast("string"),
        lit(s" has a missing or non-integer '$p' property; pass idProperty=None for positional ids")))
        .cast("int"))
    case None => col("fidx").cast("int")
  }

  /**
   * Polygon/MultiPolygon features of `path` as a rings table
   * `(poly_id, xss: array<array<double>>, yss: ...)` — one row per
   * feature, every ring (shells + holes) carried. Other geometry types
   * are filtered out (points/lines have their own readers below).
   */
  def readPolygons(spark: SparkSession, path: String,
                   idProperty: Option[String] = Some("id")): DataFrame = {
    val gt = col("f.geometry.type")
    val coords = col("f.geometry.coordinates")
    val rings = when(gt === "Polygon",
        from_json(coords, ArrayType(ArrayType(ArrayType(DoubleType)))))
      .when(gt === "MultiPolygon",
        flatten(from_json(coords, ArrayType(ArrayType(ArrayType(ArrayType(DoubleType)))))))
    val ok = parsedOrRaise(rings, "polygon")
    features(spark, path).where(gt.isin("Polygon", "MultiPolygon"))
      .select(
        featureId(idProperty).as("poly_id"),
        transform(ok, ring => transform(ring, v => element_at(v, 1))).as("xss"),
        transform(ok, ring => transform(ring, v => element_at(v, 2))).as("yss"))
  }

  /**
   * Point/MultiPoint features of `path` as probe rows `(point_id, x, y)`
   * — one row per point (MultiPoint explodes, keeping the feature id),
   * ready for `Extract.xy(stack, probes, "x", "y")`.
   */
  def readPoints(spark: SparkSession, path: String,
                 idProperty: Option[String] = Some("id")): DataFrame = {
    val gt = col("f.geometry.type")
    val coords = col("f.geometry.coordinates")
    // guards sit INSIDE the branches: array(null) is not null, so a
    // wrapped malformed parse would sneak past an outer check
    val pts = when(gt === "Point",
        array(parsedOrRaise(from_json(coords, ArrayType(DoubleType)), "point")))
      .when(gt === "MultiPoint",
        parsedOrRaise(from_json(coords, ArrayType(ArrayType(DoubleType))), "point"))
    features(spark, path).where(gt.isin("Point", "MultiPoint"))
      .select(featureId(idProperty).as("point_id"),
        explode(pts).as("__pt"))
      .select(col("point_id"),
        element_at(col("__pt"), 1).as("x"), element_at(col("__pt"), 2).as("y"))
  }

  /**
   * LineString/MultiLineString features of `path` as polylines
   * `(line_id, xs: array<double>, ys: array<double>)` — one row per
   * LineString part (MultiLineString explodes, keeping the feature id:
   * rasterize burns are last-wins by id, so parts of one feature merge).
   */
  def readLines(spark: SparkSession, path: String,
                idProperty: Option[String] = Some("id")): DataFrame = {
    val gt = col("f.geometry.type")
    val coords = col("f.geometry.coordinates")
    // inner guards: see readPoints
    val parts = when(gt === "LineString",
        array(parsedOrRaise(from_json(coords, ArrayType(ArrayType(DoubleType))), "line")))
      .when(gt === "MultiLineString",
        parsedOrRaise(from_json(coords, ArrayType(ArrayType(ArrayType(DoubleType)))), "line"))
    features(spark, path).where(gt.isin("LineString", "MultiLineString"))
      .select(featureId(idProperty).as("line_id"),
        explode(parts).as("__part"))
      .select(col("line_id"),
        transform(col("__part"), v => element_at(v, 1)).as("xs"),
        transform(col("__part"), v => element_at(v, 2)).as("ys"))
  }
}
