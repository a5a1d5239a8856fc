package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** One-off diagnostic: measured IVFADC recall at a dataset dir for a
  * sweep of nProbe values (the r13 sf1-gate follow-up on
  * ivfpq_recall). Not part of the driver contract.
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    val n = e.count()
    val k = math.max(32, math.round(32.0 * math.sqrt(n / 2000.0)).toInt)
    val cts = Similarity.trainCentroids(e, "vec_id", "embedding", k)
    val cbs = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m = 16, codesPerSub = 32)
    val q = e.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").cache()
    val nEx = exact.count()
    // arg forms: "23" sweeps rf ∈ {20, 60}; "26:64" probes one pair
    args.drop(1).foreach { a =>
      val (np, rfs) = a.split(':') match {
        case Array(n, r) => (n.toInt, Seq(r.toInt))
        case Array(n) => (n.toInt, Seq(20, 60))
      }
      for (rf <- rfs) {
        val approx = Similarity.ivfPqTopK(cts, cbs, e, q, "vec_id",
          "embedding", k = 5, nProbe = np, nAssign = 2,
          rerankFactor = rf)
        val hit = exact.join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count()
        println(f"[pqrecall] n=$n k=$k nProbe=$np rf=$rf " +
          f"recall=${hit.toDouble / nEx}%.3f")
      }
    }
    spark.stop()
  }
}
