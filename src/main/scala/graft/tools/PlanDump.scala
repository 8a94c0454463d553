package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dump `.explain("formatted")` for one or more SparkEntry queries to
 * files — the plan evidence the optimization rounds commit under
 * `plans/rNN/<query>_{before,after}.txt`.
 *
 * Usage:
 *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> q1,q2,..."
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { prefix =>
      val (name, fn) = graft.SparkEntry.queries.toSeq.sortBy(_._1)
        .find(_._1.startsWith(prefix))
        .getOrElse(sys.error(s"unknown query '$prefix'"))
      val df = fn(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
      println(s"PLAN_DUMP wrote $p (${plan.length} chars)")
      graft.plans.Caches.flush()
    }
    spark.stop()
  }
}
