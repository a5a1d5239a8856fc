package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Disposable stage bisect for the minhash-banded dedup family. */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[mhprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val pl = graft.ops.Dedup.plan05
    println(s"[mhprobe] plan05 width=${pl.signatureWidth} bands=${pl.bands}")
    val sets = docs.filter(size(split(col("text"), " ")) >= 3)
      .repartition(32)
      .select(col("doc_id"),
        GraftFunctions.hashedWordShingles(col("text"), 3).as("sh"))
    for (i <- 1 to 2)
      time(s"sets (shingle kernel) noop $i")(
        sets.write.format("noop").mode("overwrite").save())
    val banded = sets.select(col("doc_id"), posexplode(
        GraftFunctions.minhashBands(col("sh"), pl.signatureWidth, pl.bands)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    for (i <- 1 to 2)
      time(s"banded (sign+explode) noop $i")(
        banded.write.format("noop").mode("overwrite").save())
    val buckets = banded.groupBy(col("band_idx"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= 4096)
    for (i <- 1 to 2)
      time(s"buckets (shuffle+collect) noop $i")(
        buckets.write.format("noop").mode("overwrite").save())
    val cands = buckets.select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1), y ->
          |    struct(least(x, y) AS id_a, greatest(x, y) AS id_b))))"""
        .stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()
    for (i <- 1 to 2)
      time(s"cands (unfold+distinct) noop $i")(
        cands.write.format("noop").mode("overwrite").save())
    for (i <- 1 to 2)
      time(s"full minhashPairs count $i")(
        graft.ops.Dedup.minhashPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
