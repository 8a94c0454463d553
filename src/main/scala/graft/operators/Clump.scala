package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.core.GridMeta

/**
 * Raster clump: label 4-connected (rook) regions of equal categorical
 * value — the gdal `clump` / region-group analogue a classification
 * post-pass feeds into sieve filters and zonal rollups (the reference
 * reaches region labeling through scipy.ndimage on driver arrays;
 * here it is a distributed operator).
 *
 * Scale design: adjacency is NOT a self-join — each rook edge is a
 * window `lag` along its own grid line (partition by row order by
 * col, and the transpose), so edge construction is two hash shuffles
 * of the pixel relation with O(1) per-pixel work, the same separable
 * discipline as [[Focal]]. Labeling is [[Dedup.components]] (hash-min
 * with graph contraction, O(log diameter) rounds, FS-checkpointable);
 * pixels with no same-category neighbor never enter the component
 * loop and get their own id back via one left join.
 *
 * Null semantics: a NULL category never matches (`===` is
 * null-rejecting), so nodata pixels form singleton clumps — the
 * conservative contract matching [[Focal]]'s border behavior.
 */
object Clump {

  private val hOrd = Window.partitionBy("row").orderBy("col")
  private val vOrd = Window.partitionBy("col").orderBy("row")

  /**
   * 31-bit avalanche hash (two xor-shift-multiply rounds + final
   * fold, Wang-style): every intermediate stays in [0, 2^58), so the
   * identical integer chain is computable by the SQL oracle with no
   * overflow wrap. Unlike the affine [[graft.functions.sample_hash]]
   * LCG, neighbor keys decorrelate — required for percolation-style
   * categorical fixtures (an LCG's `hash(k+1) − hash(k)` is constant,
   * which makes grid-adjacent categories pathologically structured).
   */
  def avalanche31(k: Column): Column = {
    def round(x: Column): Column =
      (shiftright(x, 16).bitwiseXOR(x) * lit(73244475L)) % lit(2147483648L)
    val x2 = round(round(k.cast("long")))
    shiftright(x2, 16).bitwiseXOR(x2)
  }

  /** SQL twin of [[avalanche31]] (DuckDB `xor()` + `>>`). */
  def avalanche31Sql(k: String): String = {
    def round(x: String): String =
      s"((xor(($x) >> 16, $x) * 73244475) % 2147483648)"
    val x2 = round(round(k))
    s"xor(($x2) >> 16, $x2)"
  }

  /**
   * Label 4-connected equal-`cat` regions of a DENSE pixel relation
   * (one row per (row, col); `cat` may be NULL = nodata). Returns the
   * input plus `component` = the smallest pixel id (row·width + col)
   * in the region. Adjacency is validated against the lagged
   * coordinate, so sparse relations (cropped/masked grids) also label
   * correctly — a gap in a grid line simply breaks the run.
   */
  def clump(px: DataFrame, catCol: String, g: GridMeta,
            checkpointDir: Option[String] = None): DataFrame = {
    val base = px.withColumn("__id",
      col("row") * g.width.toLong + col("col"))
    def edges(w: WindowSpec, runCoord: String): DataFrame = base
      .withColumn("__pid", lag(col("__id"), 1).over(w))
      .withColumn("__pcat", lag(col(catCol), 1).over(w))
      .withColumn("__pcoord", lag(col(runCoord), 1).over(w))
      .where(col("__pcat") === col(catCol) &&
        col("__pcoord") === col(runCoord) - 1L)
      .select(col("__pid").as("id_a"), col("__id").as("id_b"))
    val e = edges(hOrd, "col").unionByName(edges(vOrd, "row"))
    val comp = Dedup.components(e, "id_a", "id_b", checkpointDir)
      .withColumnRenamed("id", "__id")
    base.join(comp, Seq("__id"), "left")
      .withColumn("component", coalesce(col("component"), col("__id")))
      .drop("__id")
  }
}
