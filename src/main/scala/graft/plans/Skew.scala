package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew handling for hot cells (north rule: "salted
 * repartitioning and AQE skew-split for hot H3 cells").
 *
 * Two layers:
 *  - AQE skew-join splitting (config, [[aqeSkewConf]]) handles runtime
 *    skew transparently — always on in the engine's sessions;
 *  - [[saltJoin]] pre-splits known-hot join keys: the big side gets a
 *    deterministic salt in [0, salts), the small side replicates each
 *    row `salts` times, and the join key becomes (key..., salt) — a hot
 *    cell's rows spread over `salts` reducers instead of one.
 */
object Skew {

  /** Session configs that should accompany every large shuffle. */
  val aqeSkewConf: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true")

  /** Deterministic salt in [0, salts) from an arbitrary spread column. */
  def salt(spread: Column, salts: Int): Column = pmod(xxhash64(spread), lit(salts.toLong))

  /**
   * Salted equi-join: `big` join `small` on `keys`, with hot keys spread
   * over `salts` buckets. `spread` must be a big-side column (or
   * expression) that varies WITHIN a key group (e.g. the record id).
   */
  def saltJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
               spread: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    val b = big.withColumn("__salt", salt(spread, salts))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /**
   * Salted repartition: distribute rows of hot cells across `salts`
   * sub-buckets while keeping cell locality for everything else.
   */
  def saltedRepartition(df: DataFrame, cell: Column, spread: Column,
                        salts: Int, numPartitions: Int): DataFrame =
    df.repartition(numPartitions, cell, salt(spread, salts))
}
