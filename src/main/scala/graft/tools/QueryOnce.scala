package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Run ONE SparkEntry query against a testdata dir and print its row
 * count + wall seconds — the focused plan-debug loop (a full Bench run
 * costs ~13 min; this answers "did the fix unstick q63 at sf0.1" in
 * one).
 *
 * Usage: sbt "runMain graft.tools.QueryOnce q63_filter_points_dist /root/testdata/sf0.1 [cpus]"
 */
object QueryOnce {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"graft-query-once-$name")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; have: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    // session warm-up exactly like Bench (codegen + parquet reader):
    // without it ad-hoc numbers run ~1.5x the official ones and are not
    // comparable (judge r4 measured q50 11.4 s cold vs 7.4 s official)
    graft.SparkEntry.entry(spark).count()
    graft.plans.Caches.flush()
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    graft.plans.Caches.flush()
    println(f"QUERY_ONCE $name rows=$n secs=$secs%.3f")
    spark.stop()
  }
}
