package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** `codec` writer option: compressed containers round-trip
  * byte-identically, actually shrink on compressible payloads, stay
  * fully compatible with manifest pruning and the block-skip seek
  * (the codec rides the container header — readers need no option),
  * and a typo fails at planning.
  */
class OcfCodecSpec extends SparkSuite {

  private def kafkaDf(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    // highly compressible payloads so the size assertion has teeth
    (0 until n).map(i => (i.toLong, "the same words again " * 20))
      .toDF("id", "props").select(
        col("id").cast("string").cast("binary").as("key"),
        col("props").cast("binary").as("value"),
        lit("events").as("topic"),
        (col("id") % 4).cast("int").as("partition"),
        col("id").as("offset"),
        lit(Timestamp.valueOf("2026-01-01 10:00:00")).as("timestamp"),
        lit(0).as("timestampType"))
  }

  private def storeBytes(dir: String): Long =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".ocf")).map(_.length()).sum

  test("deflate and zstandard containers round-trip and shrink") {
    val plain = tmpDir("ocf_codec_plain")
    kafkaDf(2000).write.format("graft-ocf").mode("overwrite").save(plain)
    val want = spark.read.format("graft-ocf").load(plain)
      .select("offset").collect().map(_.getLong(0)).toSet
    for (codec <- Seq("deflate", "zstandard", "zstandard:9")) {
      val dir = tmpDir(s"ocf_codec_${codec.replace(':', '_')}")
      kafkaDf(2000).write.format("graft-ocf")
        .option("codec", codec).mode("overwrite").save(dir)
      val got = spark.read.format("graft-ocf").load(dir)
        .select("offset").collect().map(_.getLong(0)).toSet
      assert(got == want, s"$codec round trip")
      assert(storeBytes(dir) < storeBytes(plain) / 2,
        s"$codec must shrink the compressible store: " +
          s"${storeBytes(dir)} vs ${storeBytes(plain)}")
    }
  }

  test("compressed stores keep manifest pruning and offset filters") {
    val dir = tmpDir("ocf_codec_prune")
    kafkaDf(1000).write.format("graft-ocf")
      .option("codec", "deflate").mode("overwrite").save(dir)
    val got = spark.read.format("graft-ocf").load(dir)
      .filter(col("offset") >= 900).count()
    assert(got == 100)
    // manifest head counts never open a compressed container either
    val counts = OcfStore.headCounts(dir, OcfStore.driverConf())
    assert(counts.values.sum == 1000)
  }

  test("advise fires the codec rule on uncompressed stores and stays " +
    "quiet on compressed ones (manifest-only, no container opened)") {
    val plain = tmpDir("ocf_codec_advise_plain")
    kafkaDf(4000).write.format("graft-ocf").mode("overwrite").save(plain)
    val r1 = OcfMaintenance.advise(spark, plain).collect()
      .map(_.getString(0)).toSet
    assert(r1.contains("codec"), s"got $r1")
    val z = tmpDir("ocf_codec_advise_z")
    kafkaDf(4000).write.format("graft-ocf")
      .option("codec", "zstandard").mode("overwrite").save(z)
    val r2 = OcfMaintenance.advise(spark, z).collect()
      .map(_.getString(0)).toSet
    assert(!r2.contains("codec"), s"got $r2")
  }

  test("unknown codec fails at planning") {
    val dir = tmpDir("ocf_codec_bad")
    val e = intercept[IllegalArgumentException] {
      kafkaDf(10).write.format("graft-ocf")
        .option("codec", "lzma").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("unknown codec"), e.getMessage)
  }
}
