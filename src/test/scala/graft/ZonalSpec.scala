package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Zonal

/** Zonal statistics vs a driver-side twin: per-zone count/sum/mean/
  * min/max with per-band nulls and a NULL (unassigned) zone. */
class ZonalSpec extends AnyFunSuite with SparkSpec {

  test("stats equal the scalar twin; NULL zones dropped; nulls skipped per band") {
    import spark.implicits._
    val rows = Seq(
      // (zone, b1, b2)
      (Some(1), Some(10.0), Some(1.0)),
      (Some(1), Some(20.0), None),
      (Some(1), None, Some(3.0)),
      (Some(2), Some(5.0), Some(7.0)),
      (None, Some(99.0), Some(99.0)), // unassigned pixel: dropped
      (Some(3), None, None))          // zone with all-null bands
    val df = rows.toDF("zone", "b1", "b2")
    val got = Zonal.stats(df, "zone", Seq("b1", "b2"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet === Set(1, 2, 3))
    val z1 = got(1)
    assert(z1.getLong(1) === 2L)            // b1_cnt
    assert(z1.getLong(2) === 30L)           // b1_sum
    assert(z1.getDouble(3) === 15.0)        // b1_mean
    assert(z1.getDouble(4) === 10.0 && z1.getDouble(5) === 20.0)
    assert(z1.getLong(6) === 2L && z1.getLong(7) === 4L) // b2: cnt, sum
    assert(z1.getDouble(8) === 2.0)
    val z3 = got(3)
    assert(z3.getLong(1) === 0L && z3.isNullAt(2) && z3.isNullAt(3))
    assert(z3.isNullAt(4) && z3.isNullAt(5))
  }

  test("plan is one hash aggregate: no sort, no window, no join") {
    import spark.implicits._
    val df = Seq((1, 2.0)).toDF("zone", "b1")
    val plan = Zonal.stats(df, "zone", Seq("b1"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan.take(300))
    assert(!plan.contains("SortAggregate") && !plan.contains("Window") &&
      !plan.contains("Join"), plan.take(500))
  }
}
