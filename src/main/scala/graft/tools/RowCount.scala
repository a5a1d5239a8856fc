package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print OUTPUT row counts of named registry queries at a
  * given data dir — separates output-driven scaling (a query whose
  * result set grows super-linearly with the input) from plan defects
  * when reading the sf0.1→sf1 slope table.
  *
  * Usage: runMain graft.tools.RowCount <sfDir> <q1,q2,...>
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.ivf.cells.skipWrite", "true")
    val show = sys.env.get("SPARK_GRAFT_SHOW").contains("1")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val c = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[rowcount] $n%-28s rows=$c%12d  $sec%8.2f s")
      if (show) df.show(10, truncate = false)
    }
    spark.stop()
  }
}
