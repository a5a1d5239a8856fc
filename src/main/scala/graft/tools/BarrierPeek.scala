package graft.tools

import org.apache.spark.sql.SparkSession

/** Disposable diagnostic: print the optimized count-shaped plan of a
  * barriered row to inspect where the evaluation barrier landed.
  */
object BarrierPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("gopher_repetition")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val opt = graft.queries.Queries.all(name)(spark, d)
      .groupBy().count().queryExecution.optimizedPlan.toString
    println("==== optimized ====")
    println(opt)
    spark.stop()
  }
}
