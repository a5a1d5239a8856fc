package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.GraftFunctions
import graft.ops.{Dedup, TextOps}

/** Dev-only stage timing for the LSH dedup family (not part of the
  * driver contract).
  */
object DebugLsh {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    val grams = docs.select(col("doc_id"),
      TextOps.charGrams(col("text"), 5).as("g"))
      .filter(size(col("g")) > 0)
    time("grams.count")(println(grams.count()))
    val banded = grams.select(col("doc_id"), posexplode(
      GraftFunctions.minhashBands(
        transform(col("g"), s => pmod(xxhash64(s), lit(TextOps.P))),
        128, 32)))
    time("banded.count")(println(banded.count()))
    val bandedRen = banded.withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val a = bandedRen.select(col("doc_id").as("id_a"),
      col("band_idx"), col("band_hash"))
    val b = bandedRen.select(col("doc_id").as("id_b"),
      col("band_idx"), col("band_hash"))
    val joined = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
    time("joined.count")(println(joined.count()))
    val cands = joined.select("id_a", "id_b").distinct()
    time("cands.count")(println(cands.count()))
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5, 5)
    time("full.count")(println(full.count()))

    val emb = Tables.embeddings(spark, d)
    val q = emb.select(col("vec_id"), Dedup.quantize(col("embedding")).as("q"))
    val ebanded = q.select(col("vec_id"), posexplode(
      GraftFunctions.hyperplaneBands(col("q"), 96, 4)))
    time("ebanded.count")(println(ebanded.count()))
    val er = ebanded.withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val ea = er.select(col("vec_id").as("id_a"), col("band_idx"), col("band_hash"))
    val eb = er.select(col("vec_id").as("id_b"), col("band_idx"), col("band_hash"))
    val ej = ea.join(eb, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
    time("ejoined.count")(println(ej.count()))
    val ec = ej.select("id_a", "id_b").distinct()
    time("ecands.count")(println(ec.count()))
    val efull = Dedup.embeddingPairs(emb, "vec_id", "embedding", 0.4)
    time("efull.count")(println(efull.count()))
    spark.stop()
  }
}
