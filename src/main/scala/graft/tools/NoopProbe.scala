package graft.tools
import org.apache.spark.sql.SparkSession
object NoopProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val d = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.mode("overwrite").format("noop").save()
      println(f"[noop] $name iter$i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val t0 = System.nanoTime()
    val c = graft.SparkEntry.queries(name)(spark, d).count()
    println(f"[cnt] $name count=$c ${(System.nanoTime()-t0)/1e9}%.3f s")
    spark.stop()
  }
}
