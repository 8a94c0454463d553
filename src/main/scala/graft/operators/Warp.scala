package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GridMeta
import graft.functions._

/**
 * to_crs re-gridding (reference raster.py:1711-1866): inverse-warp as a
 * join — generate the TARGET grid, map each target pixel center back to
 * source-world coordinates through a pluggable CRS transform, take the
 * NEAREST source pixel (floor rowcol, the reference default resampling,
 * tests/test_tocrs.py), and left-join the source stack.
 *
 * CRS math is pluggable ([[CrsTransform]]); the fixture transform is
 * affine (a linear pseudo-CRS), which keeps the oracle SQL-expressible.
 * Real geodetic transforms slot in as additional CrsTransforms without
 * touching the join shape.
 */
object Warp {

  /** Maps TARGET-world (x, y) columns to SOURCE-world coordinates. */
  trait CrsTransform extends Serializable {
    def sourceX(x: Column, y: Column): Column
    def sourceY(x: Column, y: Column): Column
  }

  /** Affine pseudo-CRS: sx = a*x + b*y + c, sy = d*x + e*y + f. */
  final case class AffineCrs(a: Double, b: Double, c: Double,
                             d: Double, e: Double, f: Double) extends CrsTransform {
    override def sourceX(x: Column, y: Column): Column = lit(a) * x + lit(b) * y + lit(c)
    override def sourceY(x: Column, y: Column): Column = lit(d) * x + lit(e) * y + lit(f)
    def sxSql(x: String, y: String): String = {
      import graft.sources.OracleLit.d2
      s"(${d2(a)} * $x + ${d2(b)} * $y + ${d2(c)})"
    }
    def sySql(x: String, y: String): String = {
      import graft.sources.OracleLit.d2
      s"(${d2(d)} * $x + ${d2(e)} * $y + ${d2(f)})"
    }
  }

  /** Identity (same CRS, new grid) — pure resample. */
  case object Identity extends CrsTransform {
    override def sourceX(x: Column, y: Column): Column = x
    override def sourceY(x: Column, y: Column): Column = y
  }

  /**
   * Nearest-neighbor warp of `stack` onto `target`. Returns a Stack on
   * the target grid. The join is a plain equi-join on source (row, col)
   * — shuffle-free probe side when the source stack is bucketed by tile.
   */
  def nearest(stack: Stack, target: GridMeta, crs: CrsTransform): Stack = {
    val spark = stack.df.sparkSession
    val tgt = graft.sources.RasterStack.grid(spark, target)
      .withColumn("__tx", grid_x(col("row"), col("col"), target))
      .withColumn("__ty", grid_y(col("row"), col("col"), target))
    val probed = tgt
      .withColumn("__sx", crs.sourceX(col("__tx"), col("__ty")))
      .withColumn("__sy", crs.sourceY(col("__tx"), col("__ty")))
      .withColumn("__srow", grid_row(col("__sx"), col("__sy"), stack.meta))
      .withColumn("__scol", grid_col(col("__sx"), col("__sy"), stack.meta))
    val src = stack.df.select(
      (Seq(col("row").as("__srow"), col("col").as("__scol")) ++ stack.layers.map(col)): _*)
    val joined = probed.join(src, Seq("__srow", "__scol"), "left_outer")
      .drop("__tx", "__ty", "__sx", "__sy", "__srow", "__scol")
    Stack(joined, target, stack.layers)
  }
}
