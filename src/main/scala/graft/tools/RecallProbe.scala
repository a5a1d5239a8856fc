package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Dev tool (PerfProbe's recall sibling): measure recall@5 of the
  * compressed ANN paths against in-plan exact top-k at a given scale
  * factor, across candidate-window depths — the measurement behind
  * each recall gate's (floor, rerankFactor) pair.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hit = exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      hit.toDouble / exact.count()
    }
    for (rf <- Seq(20, 40, 80, 160)) {
      val bq = recall(Similarity.bqTopK(e, q, "vec_id", "embedding",
        k = 5, nBits = 256, rerankFactor = rf))
      println(f"PROBE bq rf=$rf%-4d recall@5=$bq%.3f")
    }
    for (rf <- Seq(20, 40, 80)) {
      val sq = recall(Similarity.sq8TopK(e, q, "vec_id", "embedding",
        Similarity.sq8Calibrate(e, "embedding", 64),
        k = 5, rerankFactor = rf))
      println(f"PROBE sq8 rf=$rf%-4d recall@5=$sq%.3f")
    }
    val cbs = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m = 16, codesPerSub = 32)
    for (rf <- Seq(10, 20, 40, 80)) {
      val pq = recall(Similarity.pqTopK(cbs, e, q, "vec_id", "embedding",
        k = 5, rerankFactor = rf))
      println(f"PROBE pq rf=$rf%-4d recall@5=$pq%.3f")
    }
    spark.stop()
  }
}
