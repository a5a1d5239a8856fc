package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Recall VALUES for the three driver-visible recall-gate rows
  * (ivf_recall / ivfpq_recall / lsh_recall), replayed at an arbitrary
  * dataset dir — the r14 second-decade measurement the sf10 sweep
  * didn't take (it timed RUNTIME only; recall decay is the bug class
  * the sf1 gate caught once already). Parameters mirror the registry
  * rows exactly: ivf fixed 32 cells / nProbe 12 (cells FATTEN with n,
  * so recall holds by construction and cost is the serving ladder's
  * concern), lsh fixed 8-bit signatures (floor 0.25), ivfpq √n cells
  * with BOTH knobs scaled k/32 (the gate rule).
  */
object GateRecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val n = e.count()
    val q = e.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").cache()
    val nEx = exact.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count().toDouble / nEx

    val rIvf = recall(Similarity.ivfTopK(e, q, "vec_id", "embedding",
      k = 5, nCentroids = 32, nProbe = 12, nAssign = 2))
    println(f"[gaterecall] n=$n ivf_recall    recall=$rIvf%.3f floor=0.9")

    val rLsh = recall(Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5))
    println(f"[gaterecall] n=$n lsh_recall    recall=$rLsh%.3f floor=0.25")

    val kCells = math.max(32, math.round(
      32.0 * math.sqrt(n / 2000.0)).toInt)
    val scale = kCells / 32.0
    val cts = Similarity.trainCentroids(e, "vec_id", "embedding", kCells)
    val cbs = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m = 16, codesPerSub = 32)
    val np = math.max(14, math.ceil(14 * scale).toInt)
    val rf = math.max(20, math.ceil(20 * scale).toInt)
    val rPq = recall(Similarity.ivfPqTopK(cts, cbs, e, q, "vec_id",
      "embedding", k = 5, nProbe = np, nAssign = 2, rerankFactor = rf))
    println(f"[gaterecall] n=$n ivfpq_recall  recall=$rPq%.3f floor=0.9 " +
      f"(k=$kCells nProbe=$np rf=$rf)")
    spark.stop()
  }
}
