package graft

import org.apache.spark.sql.functions._

/** Ad-hoc plan printer for the round's new operators (not a test). */
object PlanAuditMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") ||
          l.contains("Window") || l.contains("Generate") || l.contains("Aggregate"))
        .map(_.take(150)).mkString("\n"))
    }
    val st = graft.queries.StackQueries.stack(spark)
    show("q51 aggregateNearest", st.aggregate(25, 30, "nearest").df)
    show("q52 cubic", graft.operators.Warp.cubic(
      st.select(Seq("b1", "b4")), graft.queries.GeoQueries.TargetG, graft.queries.GeoQueries.Crs).df)
    show("q53 mode", graft.operators.Warp.mode(
      st.select(Seq("b1", "b4")), graft.queries.GeoQueries.TargetG, graft.operators.Warp.Identity).df)
    show("q49 mercator nearest", graft.operators.Warp.nearest(
      st.select(Seq("b2", "b5")), graft.queries.GeoQueries.MercG, graft.operators.Warp.MercatorToLonLat).df)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    show("q50 jaccard boiler", graft.operators.Dedup.jaccardPairs(
      docs.select("doc_id", "text"), "doc_id", "text", threshold = 0.4))
    spark.stop()
  }
}
