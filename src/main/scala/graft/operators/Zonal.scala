package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Zonal statistics: per-zone count/sum/mean/min/max over raster bands,
 * where the zone column is any categorical pixel labeling — a
 * rasterized polygon layer ([[Extract.vector]]), a [[Clump]]
 * component, or a classification band (the rasterstats
 * `zonal_stats` analogue; the reference reaches the same numbers by
 * extracting polygon pixels to a GeoDataFrame and aggregating in
 * pandas, pyspatialml raster.py:2436-2517 + user code).
 *
 * Scale design: ONE hash aggregation on the zone key with map-side
 * partial aggregation — no sort, no window, no driver collect. Band
 * values are integral doubles (the stack invariant), so sums
 * accumulate as LONG (order-free under any partitioning) and `mean`
 * is a single final double division — bit-identical in any engine.
 * Zone-key skew (one giant polygon) is absorbed by the map-side
 * partials: each mapper emits at most one row per zone.
 *
 * Null semantics: nodata band values are skipped per-band (`count`
 * counts non-null of THAT band); pixels with a NULL zone are dropped
 * (unassigned pixels belong to no zone).
 */
object Zonal {

  def stats(px: DataFrame, zoneCol: String, bands: Seq[String]): DataFrame = {
    val aggs = bands.flatMap { b =>
      val s = sum(col(b).cast("long"))
      val c = count(col(b))
      Seq(c.as(s"${b}_cnt"), s.as(s"${b}_sum"),
        (s.cast("double") / c.cast("double")).as(s"${b}_mean"),
        min(col(b)).as(s"${b}_min"), max(col(b)).as(s"${b}_max"))
    }
    px.where(col(zoneCol).isNotNull)
      .groupBy(col(zoneCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Per-zone exact quartiles (median/q1/q3) per band — Spark's exact
   * `percentile` aggregate (an ObjectHashAggregate whose per-group
   * state is a value→count histogram: bounded for integral-valued
   * bands regardless of zone size, so a giant zone costs memory
   * proportional to its DISTINCT values, not its pixels). Linear
   * interpolation on integral doubles is bit-reproducible (the q56
   * pooling precedent) — DuckDB `quantile_cont` matches exactly.
   */
  def quantiles(px: DataFrame, zoneCol: String, bands: Seq[String]): DataFrame = {
    val aggs = bands.flatMap { b => Seq(
      percentile(col(b), lit(0.5)).as(s"${b}_med"),
      percentile(col(b), lit(0.25)).as(s"${b}_q1"),
      percentile(col(b), lit(0.75)).as(s"${b}_q3")) }
    px.where(col(zoneCol).isNotNull)
      .groupBy(col(zoneCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** SQL twin of [[quantiles]]. */
  def quantilesSql(rel: String, zone: String, bands: Seq[String]): String = {
    val cols = bands.flatMap { b => Seq(
      s"quantile_cont($b, 0.5) AS ${b}_med",
      s"quantile_cont($b, 0.25) AS ${b}_q1",
      s"quantile_cont($b, 0.75) AS ${b}_q3") }
    s"""SELECT $zone, ${cols.mkString(", ")}
       |FROM $rel WHERE $zone IS NOT NULL GROUP BY $zone""".stripMargin
  }

  /** SQL twin over a pixel relation text (DuckDB `SUM(BIGINT)` returns
    * HUGEINT — re-cast before the double division so the op chain
    * matches the engine's long→double exactly). */
  def statsSql(rel: String, zone: String, bands: Seq[String]): String = {
    val cols = bands.flatMap { b =>
      val s = s"CAST(SUM(CAST($b AS BIGINT)) AS BIGINT)"
      Seq(s"COUNT($b) AS ${b}_cnt", s"$s AS ${b}_sum",
        s"CAST($s AS DOUBLE) / CAST(COUNT($b) AS DOUBLE) AS ${b}_mean",
        s"MIN($b) AS ${b}_min", s"MAX($b) AS ${b}_max")
    }
    s"""SELECT $zone, ${cols.mkString(", ")}
       |FROM $rel WHERE $zone IS NOT NULL GROUP BY $zone""".stripMargin
  }
}
