package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off plan-shape probe for the staged datum-chain warp (q112). */
object PlanProbe {
  def exprSize(df: DataFrame): Long =
    df.queryExecution.analyzed.collect {
      case p => p.expressions.map(e =>
        e.collect { case _ => 1L }.sum).sum
    }.sum

  def timed[A](label: String)(f: => A): A = {
    val t = System.nanoTime()
    val r = f
    println(s"$label: ${(System.nanoTime() - t) / 1e9}s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.planChangeLog.level", "error")
      .appName("planprobe").getOrCreate()
    import graft.queries.GeoQueries._
    import graft.sources.RasterStack

    val st = timed("stack built") {
      graft.operators.Stack(
        RasterStack.stack(spark, BngSrcG).drop("x", "y"), BngSrcG,
        RasterStack.NcBands.map(_.name)).select(Seq("b2", "b5"))
    }
    println(s"stack exprSize=${exprSize(st.df)}")

    val near = timed("nearest built") {
      graft.operators.Warp.nearest(st, BngG, BngCrs)
    }
    println(s"nearest exprSize=${exprSize(near.df)}")

    val fin = timed("final select built") {
      near.df.select("row", "col", "b2", "b5")
    }
    println(s"final exprSize=${exprSize(fin)}")
    timed("final optimized") {
      println(s"optimized size=${fin.queryExecution.optimizedPlan.treeString.length}")
    }
    timed("final count") { println(s"count=${fin.count()}") }
    spark.stop()
  }
}
