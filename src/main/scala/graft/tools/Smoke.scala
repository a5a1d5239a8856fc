package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: smoke-runs the flagship entry query (rows > 0, as the
  * driver does) and optionally prints a query's formatted plan:
  * runMain graft.tools.Smoke [queryName [sfDir]]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case None =>
        val df = graft.SparkEntry.entry(spark)
        println(s"entry schema: ${df.schema.simpleString}")
        println(s"entry rows: ${df.count()}")
      case Some(name) =>
        val d = args.lift(1).getOrElse("/root/testdata/sf0.01")
        val df = graft.SparkEntry.queries(name)(spark, d)
        df.explain("formatted")
        println(s"$name rows: ${df.count()}")
    }
    spark.stop()
  }
}
