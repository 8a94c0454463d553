package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GridMeta
import graft.functions._

/**
 * Stack sources/sinks (reference raster.py:786-843, rasterlayer.py:379-431,
 * raster.py:625-635, raster.py:2104-2160).
 */
object StackIO {

  /** dtype -> nodata sentinel = minimum of the dtype (reference _utils.py:5-23). */
  def nodataFor(dtype: String): Double = dtype match {
    case "tinyint" => Byte.MinValue.toDouble
    case "smallint" => Short.MinValue.toDouble
    case "int" => Int.MinValue.toDouble
    case "bigint" => Long.MinValue.toDouble
    case "float" => Float.MinValue.toDouble // np.finfo(float32).min
    case "double" => Double.MinValue
    case other => throw new IllegalArgumentException(s"unsupported raster dtype $other")
  }

  /**
   * Sink: masked (NULL) pixels materialize as the nodata sentinel, layer
   * values coerce to the requested dtype (reference write semantics:
   * na.fill(nodata) + dtype cast, raster.py:827-840). Layout is
   * PARTITIONED BY TILE — the Iceberg-style layout that makes crop/mask
   * row/col predicates prune partitions at the source.
   */
  def write(stack: Stack, path: String, dtype: String = "double",
            nodata: Option[Double] = None, tileH: Int = 64, tileW: Int = 64): Unit = {
    val nd = nodata.getOrElse(nodataFor(dtype))
    val coerced = stack.layers.foldLeft(stack.df) { (d, n) =>
      d.withColumn(n, coalesce(col(n), lit(nd)).cast(dtype))
    }
    coerced
      .withColumn("tile", tile_id(col("row"), col("col"), stack.meta, tileH, tileW))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("tile")
      .parquet(path)
  }

  /**
   * BUCKETED sink — the co-location layout behind every "shuffle-free
   * when tile-bucketed" claim in this engine: rows hash-bucket by
   * (row, col) — the equi-join key of append / extract_raster /
   * extract_xy — and sort within buckets, so joins between two such
   * tables plan with ZERO Exchange on either side (asserted in IOSpec).
   * `bucketBy` requires a catalog table; at 100 TB this is the
   * Iceberg-bucketed-table analogue of the same layout contract.
   */
  def writeBucketed(stack: Stack, table: String, buckets: Int = 64): Unit =
    stack.df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "row", "col").sortBy("row", "col")
      .format("parquet").saveAsTable(table)

  /** Read a bucketed stack back (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String, meta: GridMeta,
                   layers: Seq[String]): Stack =
    Stack(spark.table(table), meta, layers)

  /**
   * Source: read a written stack back, converting nodata sentinels to
   * NULL (mask) — the reference's masked read (raster.py:758-775).
   */
  def read(spark: SparkSession, path: String, meta: GridMeta, layers: Seq[String],
           nodata: Double): Stack = {
    val df = spark.read.parquet(path)
    val masked = layers.foldLeft(df) { (d, n) =>
      d.withColumn(n, when(col(n).cast("double") === nodata, lit(null))
        .otherwise(col(n).cast("double")))
    }
    Stack(masked.drop("tile"), meta, layers)
  }

  /** head/tail: first/last pixels in row-major order (raster.py:625-635). */
  def head(stack: Stack, nRows: Int = 10, nCols: Int = 20): DataFrame =
    stack.df.where(col("row") < nRows && col("col") < nCols)
      .orderBy("row", "col")

  def tail(stack: Stack, nRows: Int = 10, nCols: Int = 20): DataFrame =
    stack.df.where(col("row") >= stack.meta.height - nRows &&
        col("col") >= stack.meta.width - nCols)
      .orderBy("row", "col")

  /**
   * to_pandas analogue (raster.py:2104-2160): coordinates + layer values,
   * optionally down-sampled to at most maxPixels, as a LOCAL array.
   */
  def toLocal(stack: Stack, maxPixels: Long = 10000): Array[org.apache.spark.sql.Row] = {
    val total = stack.meta.cells
    val base = stack.df
      .withColumn("x", grid_x(col("row"), col("col"), stack.meta))
      .withColumn("y", grid_y(col("row"), col("col"), stack.meta))
    val sampled = if (total <= maxPixels) base
      else {
        val stride = math.ceil(math.sqrt(total.toDouble / maxPixels)).toLong
        base.where(col("row") % stride === 0L && col("col") % stride === 0L)
      }
    sampled.collect()
  }
}
