package graft.tools

/** Scratch: run every query on sf0.001 and bracket janino compile
  * failures by query name (codegen errors log between the markers). */
object CodegenSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = graft.SparkSpec.session
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"QSTART $name"); System.err.flush()
      try fn(spark, dir).collect()
      catch { case e: Throwable => System.err.println(s"QFAIL $name ${e.getMessage.take(100)}") }
      finally graft.plans.Caches.flush()
      System.err.println(s"QEND $name"); System.err.flush()
    }
    spark.stop()
  }
}
