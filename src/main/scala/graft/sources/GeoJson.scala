package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * GeoJSON vector source — the engine's analogue of the reference
 * loading vector layers through geopandas (`gpd.read_file`, used by
 * every `extract_vector`/`mask` example): reads a FeatureCollection of
 * Polygon / MultiPolygon features into the rings-table shape
 * [[graft.operators.SpatialJoin.pipJoinTableRings]] consumes —
 * `(poly_id, xss: array<array<double>>, yss: array<array<double>>)`,
 * one row per feature, every ring (shells + holes) carried.
 *
 * Spark-first: the `coordinates` field is declared STRING in the read
 * schema (Spark's JSON reader captures the raw nested-array text), then
 * `from_json` parses it per geometry type — Polygon rings are
 * `array<array<array<double>>>`, MultiPolygon adds one nesting level
 * and flattens. All Column arithmetic, no driver-side JSON walking, so
 * a 10M-feature layer parses distributed.
 *
 * GeoJSON closes rings by repeating the first vertex; the duplicate
 * closing vertex is harmless to the even-odd fold (a zero-length
 * segment contributes no crossing) and is kept as-is.
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

  /**
   * Polygon/MultiPolygon features of `path` as a rings table. The id
   * comes from `properties[idProperty]` when present (cast to int),
   * else the feature's position in the collection. Other geometry
   * types are filtered out (points/lines have their own operators).
   */
  def readPolygons(spark: SparkSession, path: String,
                   idProperty: String = "id"): DataFrame = {
    val fc = spark.read.option("multiLine", "true").schema(Schema).json(path)
    val feats = fc.select(posexplode(col("features"))).toDF("fidx", "f")
    val gt = col("f.geometry.type")
    val coords = col("f.geometry.coordinates")
    val rings = when(gt === "Polygon",
        from_json(coords, ArrayType(ArrayType(ArrayType(DoubleType)))))
      .when(gt === "MultiPolygon",
        flatten(from_json(coords, ArrayType(ArrayType(ArrayType(ArrayType(DoubleType)))))))
    feats.where(gt.isin("Polygon", "MultiPolygon"))
      .select(
        coalesce(element_at(col("f.properties"), idProperty).cast("int"),
          col("fidx").cast("int")).as("poly_id"),
        transform(rings, ring => transform(ring, v => element_at(v, 1))).as("xss"),
        transform(rings, ring => transform(ring, v => element_at(v, 2))).as("yss"))
  }
}
