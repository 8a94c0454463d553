package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.GridMeta
import graft.functions._

/**
 * Synthetic raster stack mirroring the reference's nc Landsat fixture
 * (6 bands, 443x489 — FIXTURES.md §1): band values are deterministic
 * integer functions of (row, col) with a per-band ~3% NULL mask, so any
 * per-pixel golden is computable analytically — both in ScalaTest and in
 * the DuckDB oracle (plain arithmetic).
 */
object RasterStack {

  /** b = (row*p + col*q) % m, NULL where (row*13 + col*7 + k*29) % 97 < 3. */
  final case class BandDef(name: String, p: Int, q: Int, m: Int, k: Int)

  /** The 6-band nc-mirror stack (names match the reference's b1..b5,b7). */
  val NcBands: Seq[BandDef] = Seq(
    BandDef("b1", 7, 13, 256, 1), BandDef("b2", 3, 5, 199, 2),
    BandDef("b3", 17, 11, 251, 3), BandDef("b4", 29, 23, 241, 4),
    BandDef("b5", 31, 37, 233, 5), BandDef("b7", 41, 43, 227, 7))

  def bandValue(row: Column, col: Column, b: BandDef): Column =
    when((row * 13L + col * 7L + b.k * 29L) % 97L < 3L, lit(null))
      .otherwise(((row * b.p.toLong + col * b.q.toLong) % b.m.toLong).cast("double"))
      .as(b.name)

  /** SQL twin of [[bandValue]] for the oracle (r/c are SQL expressions). */
  def bandSql(r: String, c: String, b: BandDef): String =
    s"CASE WHEN ($r * 13 + $c * 7 + ${b.k} * 29) % 97 < 3 THEN NULL " +
      s"ELSE CAST(($r * ${b.p} + $c * ${b.q}) % ${b.m} AS DOUBLE) END"

  /** Scalar twin of [[bandValue]] — lets driver-side trainers (Cart)
    * synthesize the identical sample with no Spark session. */
  def bandScalar(row: Long, col: Long, b: BandDef): Option[Double] =
    if ((row * 13L + col * 7L + b.k * 29L) % 97L < 3L) None
    else Some(((row * b.p + col * b.q) % b.m).toDouble)

  /** The bare pixel grid: one row per pixel, (row, col). */
  def grid(spark: SparkSession, g: GridMeta): DataFrame =
    spark.range(g.cells)
      .withColumn("row", fdiv(col("id"), g.width.toLong))
      .withColumn("col", col("id") % g.width.toLong)
      .drop("id")

  /** SQL twin: pixel grid from DuckDB's range() table function. */
  def gridSql(g: GridMeta): String =
    s"(SELECT CAST(range // ${g.width} AS BIGINT) AS row, " +
      s"CAST(range % ${g.width} AS BIGINT) AS col FROM range(${g.cells}))"

  /** Full stack: (row, col, x, y, b1..b7) on grid g. */
  def stack(spark: SparkSession, g: GridMeta, bands: Seq[BandDef] = NcBands): DataFrame = {
    val base = grid(spark, g)
      .withColumn("x", grid_x(col("row"), col("col"), g))
      .withColumn("y", grid_y(col("row"), col("col"), g))
    bands.foldLeft(base)((df, b) => df.withColumn(b.name, bandValue(col("row"), col("col"), b)))
  }

  /** SQL twins of the pixel-center coordinates. */
  def xSql(g: GridMeta, c: String = "col"): String =
    s"(${OracleLit.d(g.a)} * (CAST($c AS DOUBLE) + 0.5) + ${OracleLit.d(g.c)})"
  def ySql(g: GridMeta, r: String = "row"): String =
    s"(${OracleLit.d(g.e)} * (CAST($r AS DOUBLE) + 0.5) + ${OracleLit.d(g.f)})"

  /**
   * Sparse labelled-pixel raster for extract_raster (FIXTURES.md §2
   * `labels`): non-null label on a deterministic subset of pixels.
   * label = (row*5 + col*3) % 7 where (row*11 + col*29) % 53 == 0.
   */
  def labels(spark: SparkSession, g: GridMeta): DataFrame =
    grid(spark, g)
      .where((col("row") * 11L + col("col") * 29L) % 53L === 0L)
      .withColumn("value", ((col("row") * 5L + col("col") * 3L) % 7L).cast("double"))

  def labelsSqlWhere(r: String = "row", c: String = "col"): String =
    s"($r * 11 + $c * 29) % 53 = 0"
  def labelsSqlValue(r: String = "row", c: String = "col"): String =
    s"CAST(($r * 5 + $c * 3) % 7 AS DOUBLE)"

  /**
   * Category strata raster for stratified sampling (FIXTURES.md §2
   * `strata`): 6 contiguous vertical bands.
   */
  def strata(spark: SparkSession, g: GridMeta): DataFrame =
    grid(spark, g).withColumn("stratum", fdiv(col("col") * 6L, g.width.toLong).cast("int"))

  def strataSql(g: GridMeta, c: String = "col"): String =
    s"CAST($c * 6 // ${g.width} AS INT)"
}
